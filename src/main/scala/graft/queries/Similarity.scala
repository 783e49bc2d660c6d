package graft.queries

import graft.Fixtures
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Vector-similarity operators over `embeddings` (SURVEY.md §2B B-9).
  *
  * Two interchangeable cosine kernels, both codegen'd, no UDFs:
  * the higher-order-function composition below (`zip_with` product +
  * sequential `aggregate` fold, used by q_sim_cosine_pairs) and the
  * fused single-loop Catalyst expression `graft.functions.CosineSim`
  * (used by q_sim_knn / q_sim_ann_bucket). They accumulate in the
  * same index order, so results are bit-identical — FunctionsSpec
  * asserts it. Elements are cast float→double BEFORE multiplying so
  * both engines do the same double math (rule D2).
  *
  * Scale notes: all-pairs cosine is O(n²) and only sane on a bounded
  * candidate set (here: vec_id < 200 → 19,900 pairs evaluated via a
  * broadcast nested-loop join — the right plan, since one side is
  * tiny). The 100 TB path is NOT all-pairs: only same-bucket pairs
  * may be compared — see `q_sim_ann_bucket` below (hyperplane-sign
  * LSH bucketing), the token-bucketed near-dup join in TextOps
  * (`q_dedup_near`), and the banded MinHash join in Dedup
  * (`q_dedup_minhash`).
  */
object Similarity {

  /** Σ aᵢbᵢ as a sequential fold — deterministic summation order. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Full-corpus centroid assignment — the distributed k-means E-step
    * behind `q_emb_assign` (and SemDeDup's cluster scoping): every
    * vector goes to its nearest label-centroid by rounded cosine (tie
    * → label asc). Centroids and their norms are a tiny broadcast;
    * the corpus side is one map-side join keyed by dimension plus a
    * per-vector argmax window — linear in corpus size, the shape an
    * actual clustering iteration runs at 100 TB. Ranking happens on
    * the ROUNDED score so near-ties cannot order differently across
    * engines (the q_sim_ivf rule). Output: (vec_id, cluster,
    * score_x1e4), unordered.
    */
  def clusterAssign(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = embDouble(s, dir)
    val ex = e.select(col("vec_id"), posexplode(col("emb")).as(Seq("i", "x")))
    val centBase = e.select(col("label"), posexplode(col("emb")).as(Seq("i", "x")))
    // centroids quantized at 1e-6 with the scaled-floor form (NOT
    // round(), whose tie handling differs across engines): the raw
    // averages differ between engines in last ulps (summation order
    // over thousands of doubles), and every downstream score must
    // start from bit-identical centroid values
    val cent = centBase.groupBy("label", "i")
      .agg((floor(avg("x") * 1000000 + 0.5) / 1000000).as("c"))
    val vnorm = ex.groupBy("vec_id").agg(sqrt(sum(col("x") * col("x"))).as("vn"))
    val cnorm = cent.groupBy("label").agg(sqrt(sum(col("c") * col("c"))).as("cn"))
    // floor-scaled integer scores, NOT round(): chaining round(,6)
    // then round(,4) manufactures .xxxx5 ties where Spark (BigDecimal
    // half-up) and DuckDB (C math) split — the scaled-floor form is
    // one identical IEEE op sequence on both engines
    ex.join(broadcast(cent), "i")
      .groupBy("vec_id", "label").agg(sum(col("x") * col("c")).as("dot"))
      .join(vnorm, "vec_id").join(broadcast(cnorm), "label")
      // zero-norm guard: floor(NaN) long-casts on the Spark side but
      // errors in the oracle's CAST — keep NULL on both instead
      .select(col("vec_id"), col("label"),
        when(col("vn") * col("cn") > 0,
          floor(col("dot") / (col("vn") * col("cn")) * 10000 + 0.5))
          .as("score_x1e4"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("score_x1e4").desc, col("label"))))
      .filter(col("rk") === 1)
      .select(col("vec_id"), col("label").as("cluster"), col("score_x1e4"))
  }

  /** Embeddings with the float[] column cast to double[]. */
  def embDouble(s: SparkSession, dir: String): DataFrame =
    Fixtures.embeddings(s, dir)
      .select(col("vec_id"), col("label"),
              transform(col("embedding"), _.cast("double")).as("emb"))

  /** The `nprobe` nearest cell ids to query vec_id=0, by cosine against
    * per-label centroids (the label column is the coarse quantizer's
    * cell id). Argmax on the ROUNDED score, tie → smallest label, so
    * both engines pick the same cells deterministically. Centroids are
    * a tiny broadcast at any scale.
    */
  private[graft] def ivfTopCells(e: DataFrame, nprobe: Int): DataFrame = {
    val ex = e.select(col("vec_id"), col("label"),
      posexplode(col("emb")).as(Seq("i", "x")))
    ivfTopCellsFrom(ex, ex.groupBy("label", "i").agg(avg("x").as("c")), nprobe)
  }

  /** [[ivfTopCells]] over a caller-supplied exploded frame and raw
    * (un-quantized) centroid table — q_sim_ivf_pq passes the SAME
    * centroid aggregate it quantizes into the residual basis, so the
    * corpus-scale explode + (label, i) shuffle happens once per plan
    * (ReuseExchange) instead of once per consumer. Math unchanged.
    */
  private[graft] def ivfTopCellsFrom(ex: DataFrame, cent: DataFrame,
      nprobe: Int): DataFrame = {
    val qx = ex.filter(col("vec_id") === 0).select(col("i"), col("x").as("qx"))
    val qnorm = qx.agg(sqrt(sum(col("qx") * col("qx"))).as("qn"))
    cent.join(broadcast(qx), "i")
      .groupBy("label")
      .agg(sum(col("c") * col("qx")).as("dot"),
        sqrt(sum(col("c") * col("c"))).as("cn"))
      .crossJoin(broadcast(qnorm))
      .select(col("label"),
        round(col("dot") / (col("cn") * col("qn")), 6).as("score"))
      .orderBy(col("score").desc, col("label"))
      .limit(nprobe)
      .select(col("label").as("best_label"))
  }

  /** IVF probe: scan only the query's `nprobe` nearest cells for the
    * exact top-5 by cosine. Scan cost is nprobe/cells of the corpus;
    * recall is monotone in nprobe (CrossQuerySpec pins single ≤ multi
    * ≤ exhaustive).
    */
  private def ivfProbe(s: SparkSession, dir: String, nprobe: Int): DataFrame = {
    val e = embDouble(s, dir)
    val best = ivfTopCells(e, nprobe)
    val q = e.filter(col("vec_id") === 0).select(col("emb").as("qe"))
    e.filter(col("vec_id") =!= 0)
      .join(broadcast(best), col("label") === col("best_label"))
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(graft.functions.Funcs.cosineSim(col("emb"), col("qe")), 4)
          .as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(5)
  }

  val queries: Map[String, Q] = Map(
    "q_sim_cosine_pairs" -> ((s, dir) => {
      // Fused single-loop kernel per pair (round 19; the q_dedup_embed
      // device): the HOF form folded dot via aggregate(zip_with(...)),
      // materializing a 64-element intermediate array per pair before
      // the fold — [[graft.functions.CosineSim]] runs one codegen'd
      // loop over both arrays with no allocation, and FunctionsSpec
      // pins it bit-identical to the HOF composition (same index
      // order, same double math), so the rounded cosines — and the
      // oracle hash — are unchanged.
      val e = embDouble(s, dir).filter(col("vec_id") < 200)
      val a = e.select(col("vec_id").as("id1"), col("emb").as("ea"))
      val b = e.select(col("vec_id").as("id2"), col("emb").as("eb"))
      a.join(b, col("id1") < col("id2"))
        .select(col("id1"), col("id2"),
                round(graft.functions.Funcs.cosineSim(col("ea"), col("eb")), 4)
                  .as("cosine"))
        .orderBy(col("cosine").desc, col("id1"), col("id2"))
        .limit(10)
    }),

    // 5 nearest neighbors of vec_id=0, brute-force cosine. The query
    // vector is a 1-row broadcast so the scan side streams with no
    // shuffle; orderBy+limit lowers to TakeOrderedAndProject (per-
    // partition top-k, then a 5-row driver merge). This brute-force
    // shape IS the 100 TB baseline for one query vector — a full scan
    // with a broadcast probe; the bucketed variant (q_sim_ann_bucket)
    // cuts the scan to one candidate bucket.
    "q_sim_knn" -> ((s, dir) => {
      val e = embDouble(s, dir)
      val q = e.filter(col("vec_id") === 0).select(col("emb").as("qe"))
      e.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .select(col("vec_id"),
          round(graft.functions.Funcs.cosineSim(col("emb"), col("qe")), 4)
            .as("cosine"))
        .orderBy(col("cosine").desc, col("vec_id"))
        .limit(5)
    }),

    // Hard-negative mining — the contrastive-training data op: for
    // each query vector, the top-3 most-similar vectors whose LABEL
    // differs (similar-but-not-same-class = the gradient-rich
    // negatives). Queries broadcast against one linear corpus scan
    // (the kNN shape fanned out to a query batch); rank on the
    // ROUNDED score with vec_id tie-break so both engines pick
    // identical negatives. At 100 TB the query batch stays broadcast-
    // sized and the corpus side is one scan per batch — or the IVF
    // path above when the batch grows.
    "q_sim_hard_negatives" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val e = embDouble(s, dir)
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("label").as("q_label"),
                col("emb").as("qe"))
      e.crossJoin(broadcast(q))
        .filter(col("label") =!= col("q_label") && col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").as("neg_id"),
          round(graft.functions.Funcs.cosineSim(col("emb"), col("qe")), 4)
            .as("cosine"))
        .withColumn("rk", row_number().over(
          Window.partitionBy("q_id").orderBy(col("cosine").desc, col("neg_id"))))
        .filter(col("rk") <= 3)
        .select("q_id", "rk", "neg_id", "cosine")
        .orderBy("q_id", "rk")
    }),

    // Approximate kNN via hyperplane-sign LSH: bucket id = sign bits
    // of the first 4 dimensions (axis-aligned hyperplanes — a fixed,
    // data-independent quantizer both engines compute identically).
    // Only the query's OWN bucket is scanned: the bucket equi-join
    // prunes ~15/16 of the corpus before any cosine math, which is
    // the IVF/LSH trade (recall for scan cost). At scale, recall is
    // tuned with more tables (repeat with k bit-sets, union, distinct)
    // — same plan shape, still no all-pairs stage.
    "q_sim_ann_bucket" -> ((s, dir) => {
      val e = embDouble(s, dir)
      val bucket = (0 until 4).map { d =>
        when(element_at(col("emb"), d + 1) > 0.0, lit(1L << d)).otherwise(lit(0L))
      }.reduce(_ + _)
      val b = e.withColumn("bucket", bucket)
      val q = b.filter(col("vec_id") === 0)
        .select(col("bucket").as("qb"), col("emb").as("qe"))
      b.filter(col("vec_id") =!= 0)
        .join(broadcast(q), col("bucket") === col("qb"))
        .select(col("vec_id"),
          round(graft.functions.Funcs.cosineSim(col("emb"), col("qe")), 4)
            .as("cosine"))
        .orderBy(col("cosine").desc, col("vec_id"))
        .limit(5)
    }),

    // IVF-style approximate kNN: (1) per-label centroids (the label
    // column is the coarse quantizer's cell id — in a real IVF build
    // the cells come from k-means; the probe math is identical),
    // (2) the query picks its nearest centroid by cosine, (3) only
    // that one cell is scanned for the top-5. At 100 TB: centroids
    // are a tiny broadcast, cell assignment is a map-side lookup, and
    // the probe reads 1/cells of the corpus — this is the real
    // scan-cost/recall trade, with the exact bucket-choice math
    // oracle-checked. Shared machinery: `ivfTopCells`/`ivfProbe`.
    "q_sim_ivf" -> ((s, dir) => ivfProbe(s, dir, 1)),

    // IVF multi-probe (nprobe = 3): same coarse quantizer, but the
    // query scans its THREE nearest cells instead of one — the
    // standard recall/latency dial (recall is monotone in nprobe:
    // CrossQuerySpec pins mprobe's best hit ≥ single-probe's ≥ ...
    // ≤ exhaustive kNN's). Scan cost is nprobe/cells of the corpus.
    "q_sim_ivf_mprobe" -> ((s, dir) => ivfProbe(s, dir, 3)),

    // IVF + product quantization (the FAISS IVFPQ shape): residuals
    // vs the cell centroid are split into M=4 subspaces of 16 dims;
    // each subspace gets a K=4-entry codebook trained by 2-bit
    // sign-quadrant seeding plus ONE Lloyd (k-means) refinement step
    // — the real training loop, kept deterministic end to end;
    // vectors are ENCODED as their nearest codebook
    // entry per subspace (so 64 doubles compress to 4 2-bit codes);
    // the query probes its 3 nearest cells with ASYMMETRIC distance
    // (query residual vs codebook entry, a 4×4-entry lookup table per
    // cell) to shortlist 20 candidates, which are re-ranked EXACTLY
    // by cosine for the top-5. At 100 TB: the codebook is 4×4×16
    // doubles, the LUT is built once per query, encoding is map-side,
    // and only the 20-row shortlist ever touches full vectors.
    // Distances are floor-quantized (×1e6) with deterministic
    // tie-breaks so both engines pick identical codes and shortlists
    // (the q_emb_assign rule).
    "q_sim_ivf_pq" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val sub = 16 // subspace width: 64 dims → M = 4 subspaces
      val e = embDouble(s, dir)
      val ex = e.select(col("vec_id"), col("label"),
        posexplode(col("emb")).as(Seq("i", "x")))
      // ONE per-(label, i) centroid aggregate feeds both the coarse
      // probe (raw averages) and the residual basis (floor-quantized
      // projection of the SAME averages) — previously two separate
      // corpus-explode + shuffle passes; now the (label, i) exchange
      // canonicalizes identically under both consumers and
      // ReuseExchange materializes it once. Values are unchanged on
      // both paths: the probe used avg(x) and the basis used
      // floor(avg(x)·1e6 + 0.5)/1e6 before, and still do.
      val centRaw = ex.groupBy("label", "i").agg(avg("x").as("c"))
      val probed = ivfTopCellsFrom(ex, centRaw, 3)
      // residual basis: floor-quantized per-cell centroids, so both
      // engines subtract bit-identical values
      val cent = centRaw.select(col("label"), col("i"),
        (floor(col("c") * 1000000 + 0.5) / 1000000).as("c"))
      val res = ex.join(broadcast(probed), col("label") === col("best_label"))
        .filter(col("vec_id") =!= 0)
        .join(broadcast(cent), Seq("label", "i"))
        .select(col("vec_id"), col("label"),
          (col("i") / sub).cast("int").as("m"), (col("i") % sub).as("j"),
          (col("x") - col("c")).as("r"))
        // Residuals feed FIVE consumers (seed, both codebook M-steps,
        // both assignment E-steps): materialize once instead of
        // recomputing the explode+joins per consumer — at corpus scale
        // the training set is persisted state, not a view.
        .localCheckpoint()
        // One visible hash(vec_id) exchange on top of the checkpoint
        // (round 18): a checkpoint scan reports unknown partitioning,
        // so the three (vec_id, m) training windows below (seed pass +
        // two E-steps) each re-shuffled the residual frame — three
        // residual-scale exchanges per run. hash(vec_id) satisfies the
        // windows' (vec_id, m) clustering, the three exchange subtrees
        // canonicalize identically, and ReuseExchange materializes the
        // shuffle once; each window keeps only its local sort.
        .repartition(col("vec_id"))
      // trainer: 2-bit sign-quadrant seed per residual subvector
      // (signs of local dims 0 and 1), then ONE Lloyd refinement —
      // assign every subvector to its nearest seed-codebook entry and
      // recompute the means over that assignment. Both halves are the
      // standard k-means steps, kept deterministic by the same
      // floor-quantized distances/means and tie→code-asc rule as the
      // final encode, so DuckDB replays the training bit-identically.
      //
      // FLATTENED shape (round 11): codebooks ride WIDE — one row per
      // (m, j), one column per code — so the E-step needs no row
      // multiplication and no join back against a same-sized
      // assignment table: the four per-(vector, subspace) distances
      // fold as windowed sums over the residual frame itself, every
      // row learns its group's argmin code from one CASE (tie → code
      // asc, exactly the old rank rule), and the M-step groups the
      // SAME annotated frame. The old shape shuffled `res` against
      // the assignment twice and ranked through an extra window; this
      // one runs one (vec_id, m) window per pass. Quantization makes
      // the re-shaped double sums bit-stable (error ~1e-15 against a
      // 5e-7 rounding margin), so the DuckDB oracle still replays the
      // training identically.
      def wide(cbNarrow: DataFrame): DataFrame =
        cbNarrow.groupBy("m", "j").agg(
          max(when(col("code") === 0, col("v"))).as("v0"),
          max(when(col("code") === 1, col("v"))).as("v1"),
          max(when(col("code") === 2, col("v"))).as("v2"),
          max(when(col("code") === 3, col("v"))).as("v3"))
      val w = Window.partitionBy("vec_id", "m")
      // quantized L2 to one codebook column; an absent code (empty
      // cluster: its column is null at every j) sorts above every
      // real distance and is never chosen
      def qd(vc: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
        coalesce(
          floor(sum((col("r") - vc) * (col("r") - vc)).over(w) * 1000000 + 0.5),
          lit(Long.MaxValue))
      // the E-step / encoder: every residual row annotated with its
      // (vector, subspace) group's nearest code
      def annotated(cbNarrow: DataFrame): DataFrame = {
        val joined = res.join(broadcast(wide(cbNarrow)), Seq("m", "j"))
        val (d0, d1, d2, d3) =
          (qd(col("v0")), qd(col("v1")), qd(col("v2")), qd(col("v3")))
        joined.withColumn("code",
          when(d0 <= d1 && d0 <= d2 && d0 <= d3, 0)
            .when(d1 <= d2 && d1 <= d3, 1)
            .when(d2 <= d3, 2)
            .otherwise(3))
      }
      // the M-step: per-(m, code, j) floor-quantized mean residual
      def codebookOf(annot: DataFrame): DataFrame =
        annot.groupBy("m", "code", "j")
          .agg((floor(avg("r") * 1000000 + 0.5) / 1000000).as("v"))
      // seed codes fold as a windowed sum over the same frame
      // (nonzero terms only at local dims 0 and 1)
      val seeded = res.withColumn("code",
        sum(when(col("j") === 0 && col("r") > 0, 1).otherwise(0)
          + when(col("j") === 1 && col("r") > 0, 2).otherwise(0)).over(w))
      val cb0 = codebookOf(seeded)
      // Refined codebook (one Lloyd step), MATERIALIZED (round 18): cb
      // feeds both the encoder (`enc` below) and the query-side LUT,
      // and `enc` itself nests another E-step over cb — left as a view
      // the whole training chain (seed window → cb0 → E-step window →
      // M-step) was duplicated under every consumer and executed ~3×
      // per run (the r17 executed plan carried three separate
      // REPARTITION_BY_COL stages over the residual checkpoint, one
      // per copy). The codebook is M×K×sub = 4×4×16 rows of trained
      // model state — in a real IVFPQ build it is persisted once and
      // shipped to encoders, which is exactly what this 256-row
      // checkpoint does.
      val cb = codebookOf(annotated(cb0)).localCheckpoint()
      val enc = annotated(cb).filter(col("j") === 0)
        .select("vec_id", "label", "m", "code")
      // asymmetric-distance LUT: query residual (per probed cell) vs
      // each codebook entry
      val qx = ex.filter(col("vec_id") === 0).select(col("i"), col("x").as("qx"))
      val qres = cent.join(broadcast(probed), col("label") === col("best_label"))
        .join(broadcast(qx), "i")
        .select(col("label"),
          (col("i") / sub).cast("int").as("m"), (col("i") % sub).as("j"),
          (col("qx") - col("c")).as("qr"))
      val lut = qres.join(broadcast(cb), Seq("m", "j"))
        .groupBy("label", "m", "code")
        .agg(sum((col("qr") - col("v")) * (col("qr") - col("v"))).as("ld"))
      // shortlist by quantized ADC distance, then EXACT re-rank
      val short = enc.join(broadcast(lut), Seq("label", "m", "code"))
        .groupBy("vec_id")
        .agg(floor(sum(col("ld")) * 1000000 + 0.5).as("adist"))
        .orderBy(col("adist").asc, col("vec_id"))
        .limit(20)
      val q = e.filter(col("vec_id") === 0).select(col("emb").as("qe"))
      e.join(broadcast(short.select("vec_id")), "vec_id")
        .crossJoin(broadcast(q))
        .select(col("vec_id"),
          round(graft.functions.Funcs.cosineSim(col("emb"), col("qe")), 4)
            .as("cosine"))
        .orderBy(col("cosine").desc, col("vec_id"))
        .limit(5)
    }),

    // Full-corpus centroid assignment — the distributed k-means E-step:
    // every vector goes to its nearest label-centroid by rounded
    // cosine (tie → label asc). Centroids and their norms are a tiny
    // broadcast; the corpus side is one map-side join keyed by
    // dimension plus a per-vector argmax window — linear in corpus
    // size, the shape an actual clustering iteration runs at 100 TB.
    // Ranking happens on the ROUNDED score so near-ties cannot order
    // differently across engines (the q_sim_ivf rule).
    "q_emb_assign" -> ((s, dir) => clusterAssign(s, dir).orderBy("vec_id")),

    // Random-projection dimensionality reduction (Achlioptas-style
    // ±1 matrix): 64-dim embeddings → 8 projected coords. The matrix
    // is a pure integer function of (i, j) — parity of (37i + 101j)
    // mod 97 — so every engine and every executor materializes the
    // SAME matrix with zero coordination or broadcast state: the
    // coordination-free trick that makes the projection reproducible
    // across reruns and engines at any scale. Spark side folds each
    // output coord in ONE codegen'd `aggregate` pass over the vector
    // (no 64× explode, no shuffle); only the 8× j-expansion is
    // generated map-side. Linear in corpus — the 100 TB shape.
    "q_emb_project" -> ((s, dir) =>
      Fixtures.embeddings(s, dir)
        .select(col("vec_id"), explode(sequence(lit(0), lit(7))).as("j"),
          col("embedding"))
        .select(col("vec_id"), col("j"),
          expr("""round(aggregate(sequence(1, size(embedding)),
                 |cast(0.0 as double), (acc, i) -> acc +
                 |  cast(element_at(embedding, i) as double) *
                 |  (case when ((37*i + 101*j) % 97) % 2 = 0
                 |        then 1.0 else -1.0 end)), 4)""".stripMargin
            .replace("\n", " ")).as("p"))
        .orderBy("vec_id", "j")),

    // Symmetric int8 quantization of embeddings (the 4x memory
    // compression an ANN index at 100 TB actually ships): per vector,
    // scale = max|x|/127, code_i = floor(x_i/scale + 0.5). Both passes
    // are codegen'd `aggregate` folds over the array — no explode, no
    // shuffle, linear in corpus. Output pins the quantizer exactly:
    // `code_sum` is an INTEGER checksum of the codes (bit-identical on
    // any engine — integer arithmetic), `mean_abs_err` the
    // reconstruction error. Zero vectors quantize to all-zero codes.
    "q_emb_quantize" -> ((s, dir) =>
      Fixtures.embeddings(s, dir)
        .filter(col("vec_id") < 200)
        .select(col("vec_id"),
          expr("""aggregate(embedding, cast(0.0 as double),
                 |(m, x) -> greatest(m, abs(cast(x as double))))"""
            .stripMargin.replace("\n", " ")).as("mx"),
          col("embedding"))
        .select(col("vec_id"),
          round(col("mx") / 127.0, 6).as("scale"),
          expr("""CASE WHEN mx = 0.0 THEN CAST(0 AS BIGINT) ELSE
                 |aggregate(embedding, CAST(0 AS BIGINT), (a, x) ->
                 |  a + CAST(floor(CAST(x AS DOUBLE) / (mx / 127.0) + 0.5)
                 |           AS BIGINT)) END"""
            .stripMargin.replace("\n", " ")).as("code_sum"),
          expr("""round(CASE WHEN mx = 0.0 THEN 0.0 ELSE
                 |aggregate(embedding, CAST(0.0 AS DOUBLE), (a, x) ->
                 |  a + abs(CAST(x AS DOUBLE) -
                 |    floor(CAST(x AS DOUBLE) / (mx / 127.0) + 0.5) * (mx / 127.0)))
                 |/ size(embedding) END, 6)"""
            .stripMargin.replace("\n", " ")).as("mean_abs_err"))
        .orderBy("vec_id")),

    // Typed-Aggregator UDAF (SURVEY.md UDF/UDAF surface): exact
    // per-label centroid — partial buffers map-side, one shuffle keyed
    // by label, exploded to (label, dim) rows for the oracle compare.
    "q_agg_centroid" -> ((s, dir) => {
      val centroid = graft.functions.CentroidAgg.asUdaf
      embDouble(s, dir)
        .groupBy("label")
        .agg(centroid(col("emb")).as("c"))
        .select(col("label"), posexplode(col("c")).as(Seq("i", "v")))
        .select(col("label"), (col("i") + 1).as("dim"),
          round(col("v"), 4).as("centroid"))
        .orderBy("label", "dim")
    }))

  val oracle: Map[String, String] = Map(
    "q_emb_quantize" ->
      """WITH ex AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x
        |            FROM embeddings WHERE vec_id < 200),
        |mx AS (SELECT vec_id, max(abs(x)) AS m FROM ex GROUP BY vec_id)
        |SELECT ex.vec_id,
        |       round(m / 127.0, 6) AS scale,
        |       CASE WHEN m = 0 THEN CAST(0 AS BIGINT)
        |            ELSE CAST(sum(CAST(floor(x / (m / 127.0) + 0.5) AS BIGINT))
        |                      AS BIGINT) END AS code_sum,
        |       round(CASE WHEN m = 0 THEN 0.0
        |             ELSE sum(abs(x - floor(x / (m / 127.0) + 0.5) * (m / 127.0)))
        |                  / count(*) END, 6) AS mean_abs_err
        |FROM ex JOIN mx USING (vec_id)
        |GROUP BY ex.vec_id, m
        |ORDER BY ex.vec_id""".stripMargin,
    "q_emb_project" ->
      """WITH ex AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
        |                   generate_subscripts(embedding, 1) AS i
        |            FROM embeddings),
        |js AS (SELECT unnest(range(8)) AS j)
        |SELECT vec_id, j,
        |       round(sum(x * (CASE WHEN ((37*i + 101*j) % 97) % 2 = 0
        |                           THEN 1.0 ELSE -1.0 END)), 4) AS p
        |FROM ex CROSS JOIN js
        |GROUP BY vec_id, j ORDER BY vec_id, j""".stripMargin,
    "q_sim_ivf" ->
      """WITH ex AS (SELECT vec_id, label, CAST(unnest(embedding) AS DOUBLE) AS x,
        |                   generate_subscripts(embedding, 1) AS i
        |            FROM embeddings),
        |cent AS (SELECT label, i, avg(x) AS c FROM ex GROUP BY 1, 2),
        |qx AS (SELECT i, x AS qx FROM ex WHERE vec_id = 0),
        |qn AS (SELECT sqrt(sum(qx * qx)) AS qn FROM qx),
        |best AS (SELECT label FROM (
        |  SELECT label, round(sum(c * qx) / (sqrt(sum(c * c)) * any_value(qn.qn)), 6)
        |           AS score
        |  FROM cent JOIN qx USING (i), qn GROUP BY label)
        |  ORDER BY score DESC, label LIMIT 1),
        |d AS (SELECT e.vec_id, sum(e.x * qx.qx) AS dot, sqrt(sum(e.x * e.x)) AS na
        |      FROM ex e JOIN qx ON e.i = qx.i
        |      WHERE e.label = (SELECT label FROM best) AND e.vec_id <> 0
        |      GROUP BY 1)
        |SELECT vec_id, round(dot / (na * qn.qn), 4) AS cosine
        |FROM d, qn ORDER BY cosine DESC, vec_id LIMIT 5""".stripMargin,
    "q_sim_ivf_mprobe" ->
      """WITH ex AS (SELECT vec_id, label, CAST(unnest(embedding) AS DOUBLE) AS x,
        |                   generate_subscripts(embedding, 1) AS i
        |            FROM embeddings),
        |cent AS (SELECT label, i, avg(x) AS c FROM ex GROUP BY 1, 2),
        |qx AS (SELECT i, x AS qx FROM ex WHERE vec_id = 0),
        |qn AS (SELECT sqrt(sum(qx * qx)) AS qn FROM qx),
        |best AS (SELECT label FROM (
        |  SELECT label, round(sum(c * qx) / (sqrt(sum(c * c)) * any_value(qn.qn)), 6)
        |           AS score
        |  FROM cent JOIN qx USING (i), qn GROUP BY label)
        |  ORDER BY score DESC, label LIMIT 3),
        |d AS (SELECT e.vec_id, sum(e.x * qx.qx) AS dot, sqrt(sum(e.x * e.x)) AS na
        |      FROM ex e JOIN qx ON e.i = qx.i
        |      WHERE e.label IN (SELECT label FROM best) AND e.vec_id <> 0
        |      GROUP BY 1)
        |SELECT vec_id, round(dot / (na * qn.qn), 4) AS cosine
        |FROM d, qn ORDER BY cosine DESC, vec_id LIMIT 5""".stripMargin,
    "q_sim_ivf_pq" ->
      """WITH ex AS (SELECT vec_id, label, CAST(unnest(embedding) AS DOUBLE) AS x,
        |                   generate_subscripts(embedding, 1) AS i
        |            FROM embeddings),
        |cent AS (SELECT label, i, avg(x) AS c FROM ex GROUP BY 1, 2),
        |centq AS (SELECT label, i, floor(avg(x) * 1000000 + 0.5) / 1000000 AS c
        |          FROM ex GROUP BY 1, 2),
        |qx AS (SELECT i, x AS qx FROM ex WHERE vec_id = 0),
        |qn AS (SELECT sqrt(sum(qx * qx)) AS qn FROM qx),
        |probed AS (SELECT label FROM (
        |  SELECT label, round(sum(c * qx) / (sqrt(sum(c * c)) * any_value(qn.qn)), 6)
        |           AS score
        |  FROM cent JOIN qx USING (i), qn GROUP BY label)
        |  ORDER BY score DESC, label LIMIT 3),
        |res AS (SELECT e.vec_id, e.label,
        |               CAST(floor((e.i - 1) / 16) AS INT) AS m,
        |               (e.i - 1) % 16 AS j, e.x - cq.c AS r
        |        FROM ex e JOIN centq cq ON e.label = cq.label AND e.i = cq.i
        |        WHERE e.label IN (SELECT label FROM probed) AND e.vec_id <> 0),
        |seed AS (SELECT vec_id, m,
        |                sum(CASE WHEN j = 0 AND r > 0 THEN 1 ELSE 0 END
        |                  + CASE WHEN j = 1 AND r > 0 THEN 2 ELSE 0 END) AS code
        |         FROM res WHERE j < 2 GROUP BY 1, 2),
        |cb0 AS (SELECT r.m, seed.code, r.j,
        |               floor(avg(r.r) * 1000000 + 0.5) / 1000000 AS v
        |        FROM res r JOIN seed ON r.vec_id = seed.vec_id AND r.m = seed.m
        |        GROUP BY 1, 2, 3),
        |a1 AS (SELECT vec_id, m, code FROM (
        |  SELECT r.vec_id, r.m, cb0.code,
        |         row_number() OVER (PARTITION BY r.vec_id, r.m
        |           ORDER BY floor(sum((r.r - cb0.v) * (r.r - cb0.v)) * 1000000 + 0.5) ASC,
        |                    cb0.code ASC) AS rk
        |  FROM res r JOIN cb0 ON r.m = cb0.m AND r.j = cb0.j
        |  GROUP BY r.vec_id, r.m, cb0.code) WHERE rk = 1),
        |cb AS (SELECT r.m, a1.code, r.j,
        |              floor(avg(r.r) * 1000000 + 0.5) / 1000000 AS v
        |       FROM res r JOIN a1 ON r.vec_id = a1.vec_id AND r.m = a1.m
        |       GROUP BY 1, 2, 3),
        |enc AS (SELECT vec_id, label, m, code FROM (
        |  SELECT r.vec_id, r.label, r.m, cb.code,
        |         row_number() OVER (PARTITION BY r.vec_id, r.m
        |           ORDER BY floor(sum((r.r - cb.v) * (r.r - cb.v)) * 1000000 + 0.5) ASC,
        |                    cb.code ASC) AS rk
        |  FROM res r JOIN cb ON r.m = cb.m AND r.j = cb.j
        |  GROUP BY r.vec_id, r.label, r.m, cb.code) WHERE rk = 1),
        |qres AS (SELECT cq.label, CAST(floor((cq.i - 1) / 16) AS INT) AS m,
        |                (cq.i - 1) % 16 AS j, qx.qx - cq.c AS qr
        |         FROM centq cq JOIN qx ON cq.i = qx.i
        |         WHERE cq.label IN (SELECT label FROM probed)),
        |lut AS (SELECT q.label, q.m, cb.code,
        |               sum((q.qr - cb.v) * (q.qr - cb.v)) AS ld
        |        FROM qres q JOIN cb ON q.m = cb.m AND q.j = cb.j
        |        GROUP BY 1, 2, 3),
        |short AS (SELECT e.vec_id, floor(sum(l.ld) * 1000000 + 0.5) AS adist
        |          FROM enc e JOIN lut l
        |            ON e.label = l.label AND e.m = l.m AND e.code = l.code
        |          GROUP BY 1 ORDER BY adist ASC, vec_id ASC LIMIT 20),
        |d AS (SELECT e.vec_id, sum(e.x * qx.qx) AS dot, sqrt(sum(e.x * e.x)) AS na
        |      FROM ex e JOIN qx ON e.i = qx.i
        |      WHERE e.vec_id IN (SELECT vec_id FROM short)
        |      GROUP BY 1)
        |SELECT vec_id, round(dot / (na * qn.qn), 4) AS cosine
        |FROM d, qn ORDER BY cosine DESC, vec_id LIMIT 5""".stripMargin,
    "q_emb_assign" ->
      """WITH ex AS (SELECT vec_id, label, CAST(unnest(embedding) AS DOUBLE) AS x,
        |                   generate_subscripts(embedding, 1) AS i
        |            FROM embeddings),
        |cent AS (SELECT label, i, floor(avg(x) * 1000000 + 0.5) / 1000000 AS c
        |         FROM ex GROUP BY 1, 2),
        |vn AS (SELECT vec_id, sqrt(sum(x * x)) AS vn FROM ex GROUP BY 1),
        |cn AS (SELECT label, sqrt(sum(c * c)) AS cn FROM cent GROUP BY 1),
        |sc AS (SELECT e.vec_id, cent.label, sum(e.x * cent.c) AS dot
        |       FROM ex e JOIN cent ON e.i = cent.i GROUP BY 1, 2),
        |r AS (SELECT vec_id, label,
        |             CASE WHEN vn.vn * cn.cn > 0
        |                  THEN CAST(floor(dot / (vn.vn * cn.cn) * 10000 + 0.5)
        |                       AS BIGINT) END AS score_x1e4
        |      FROM sc JOIN vn USING (vec_id) JOIN cn USING (label))
        |SELECT vec_id, label AS cluster, score_x1e4 FROM (
        |  SELECT vec_id, label, score_x1e4,
        |         row_number() OVER (PARTITION BY vec_id
        |                            ORDER BY score_x1e4 DESC, label) AS rk
        |  FROM r) WHERE rk = 1 ORDER BY vec_id""".stripMargin,
    "q_agg_centroid" ->
      """SELECT label, i AS dim, round(avg(x), 4) AS centroid
        |FROM (SELECT label, CAST(unnest(embedding) AS DOUBLE) AS x,
        |             generate_subscripts(embedding, 1) AS i FROM embeddings)
        |GROUP BY 1, 2 ORDER BY label, dim""".stripMargin,
    "q_sim_cosine_pairs" ->
      """WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 200),
        |ex AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
        |              generate_subscripts(embedding, 1) AS i FROM e),
        |d AS (SELECT a.vec_id AS id1, b.vec_id AS id2, sum(a.x * b.x) AS dot
        |      FROM ex a JOIN ex b ON a.i = b.i AND a.vec_id < b.vec_id
        |      GROUP BY 1, 2),
        |n AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM ex GROUP BY 1)
        |SELECT id1, id2, round(dot / (na.nrm * nb.nrm), 4) AS cosine
        |FROM d JOIN n na ON d.id1 = na.vec_id JOIN n nb ON d.id2 = nb.vec_id
        |ORDER BY cosine DESC, id1, id2 LIMIT 10""".stripMargin,
    "q_sim_ann_bucket" ->
      """WITH ex AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
        |                   generate_subscripts(embedding, 1) AS i
        |            FROM embeddings),
        |bk AS (SELECT vec_id,
        |              CAST(sum(CASE WHEN x > 0 THEN
        |                       CAST(round(2 ** (i - 1)) AS BIGINT)
        |                       ELSE 0 END) AS BIGINT) AS bucket
        |       FROM ex WHERE i <= 4 GROUP BY 1),
        |q AS (SELECT bucket AS qb FROM bk WHERE vec_id = 0),
        |qx AS (SELECT x, i FROM ex WHERE vec_id = 0),
        |cand AS (SELECT b.vec_id FROM bk b, q
        |         WHERE b.bucket = q.qb AND b.vec_id <> 0),
        |d AS (SELECT e.vec_id, sum(e.x * qx.x) AS dot,
        |             sqrt(sum(e.x * e.x)) AS na
        |      FROM ex e JOIN cand USING (vec_id) JOIN qx ON e.i = qx.i
        |      GROUP BY 1),
        |nq AS (SELECT sqrt(sum(x * x)) AS nb FROM qx)
        |SELECT vec_id, round(dot / (na * nb), 4) AS cosine
        |FROM d, nq ORDER BY cosine DESC, vec_id LIMIT 5""".stripMargin,
    "q_sim_hard_negatives" ->
      """WITH q AS (SELECT vec_id AS q_id, label AS q_label,
        |                  CAST(unnest(embedding) AS DOUBLE) AS x,
        |                  generate_subscripts(embedding, 1) AS i
        |           FROM embeddings WHERE vec_id < 5),
        |ex AS (SELECT vec_id, label, CAST(unnest(embedding) AS DOUBLE) AS x,
        |              generate_subscripts(embedding, 1) AS i
        |       FROM embeddings),
        |d AS (SELECT q.q_id, ex.vec_id AS neg_id,
        |             sum(ex.x * q.x) AS dot, sqrt(sum(ex.x * ex.x)) AS na
        |      FROM ex JOIN q ON ex.i = q.i
        |       AND ex.label <> q.q_label AND ex.vec_id <> q.q_id
        |      GROUP BY 1, 2),
        |nq AS (SELECT q_id, sqrt(sum(x * x)) AS nb FROM q GROUP BY 1),
        |r AS (SELECT d.q_id, neg_id, round(dot / (na * nb), 4) AS cosine,
        |             row_number() OVER (PARTITION BY d.q_id
        |               ORDER BY round(dot / (na * nb), 4) DESC, neg_id) AS rk
        |      FROM d JOIN nq USING (q_id))
        |SELECT q_id, rk, neg_id, cosine FROM r WHERE rk <= 3
        |ORDER BY q_id, rk""".stripMargin,
    "q_sim_knn" ->
      """WITH q AS (SELECT CAST(unnest(embedding) AS DOUBLE) AS x,
        |                  generate_subscripts(embedding, 1) AS i
        |           FROM embeddings WHERE vec_id = 0),
        |ex AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
        |              generate_subscripts(embedding, 1) AS i
        |       FROM embeddings WHERE vec_id <> 0),
        |d AS (SELECT vec_id, sum(ex.x * q.x) AS dot,
        |             sqrt(sum(ex.x * ex.x)) AS na
        |      FROM ex JOIN q ON ex.i = q.i GROUP BY vec_id),
        |nq AS (SELECT sqrt(sum(x * x)) AS nb FROM q)
        |SELECT vec_id, round(dot / (na * nb), 4) AS cosine
        |FROM d, nq ORDER BY cosine DESC, vec_id LIMIT 5""".stripMargin)
}
