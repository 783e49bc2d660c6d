package graft.queries

import graft.Fixtures
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Near/exact-duplicate detection at corpus scale (SURVEY.md §2B B-9).
  *
  * Four strategies, each with the shuffle shape a 100 TB corpus needs:
  *
  *  - `q_dedup_fingerprint`: exact dedup keyed by sha2-256 of the text.
  *    The shuffle carries (32-byte fingerprint, doc_id) — NOT the
  *    document body — so shuffle width is constant per row regardless
  *    of document size. This is the scale-safe form of `q_dedup_exact`
  *    (TextOps.scala), which demonstrates the window-on-content shape.
  *  - `q_dedup_minhash`: MinHash + LSH banding. Signatures are minima
  *    of k affine hashes over token ids; docs meet ONLY inside a
  *    (band, band-signature) bucket, then candidates are verified with
  *    exact Jaccard. No all-pairs stage exists at any scale; cost is
  *    bounded by bucket occupancy (collision-heavy buckets = real
  *    near-dup clusters).
  *  - `q_dedup_simhash`: 16-bit SimHash with tf-weighted bit votes.
  *    Candidate pairs come from the pigeonhole principle: hamming ≤ 3
  *    over 4 chunks ⇒ at least one 4-bit chunk matches exactly, so
  *    candidates join on (chunk_idx, chunk_value) — again bucketed,
  *    never all-pairs.
  *  - `q_dedup_embed`: embedding-cosine near-dup over a bounded id
  *    range (all-pairs is only sane on a candidate set; the unbounded
  *    scale path is the bucketed ANN join in Similarity.scala
  *    `q_sim_ann_bucket`).
  *
  * Every hash here is an explicit affine formula over deterministic
  * token ids (md5-prefix integers), so the DuckDB oracle reproduces the
  * EXACT same signatures — the correctness check covers the hashing,
  * banding and verification math, not just the final filter.
  */
object Dedup {

  /** LSH band width for `q_dedup_semantic_lsh`:
    * r = clamp(0..8, ceil(log2(ceil(n / (k·200))))) — bands grow just
    * fast enough to hold ~200 vectors each. PURE INTEGER arithmetic
    * (ceil-division + bit length), because the oracle computes the
    * same r in SQL and a floating log2 at an exact power-of-two ratio
    * can flip ceil() by one ULP on one engine only, diverging the
    * whole key's output. Package-visible so a spec can pin the
    * boundary values directly.
    */
  private[graft] def bandBits(n: Long, k: Long): Int = {
    val denom = k * 200L
    // Empty corpus (n=0) or zero distinct labels (k=0 — countDistinct
    // ignores NULLs, so an all-NULL label column yields 0): one band,
    // same as the pre-integer code's degenerate r=0, instead of a /0.
    if (n == 0L || denom == 0L) return 0
    val q = (n + denom - 1L) / denom // ceil(n / (k*200)), exactly
    if (q <= 1L) 0
    else math.min(8, 64 - java.lang.Long.numberOfLeadingZeros(q - 1L))
  }

  private val P = 2147483647L // 2^31 - 1, Mersenne prime modulus

  /** (i, a, b) for minhash_i(tok) = (a·tokid + b) mod P; 12 hashes →
    * 6 bands × 2 rows. Mirrored literally in the oracle SQL.
    */
  private val MinhashParams: Seq[(Int, Long, Long)] = Seq(
    (0, 1103L, 12345L), (1, 5077L, 999L), (2, 9173L, 471L),
    (3, 7919L, 8191L), (4, 2663L, 30269L), (5, 4271L, 11213L),
    (6, 6619L, 257L), (7, 3541L, 49157L), (8, 7333L, 6007L),
    (9, 9901L, 331L), (10, 5683L, 7039L), (11, 8761L, 52361L))

  /** (bit, a, c) for bit-hash h_b(tok) = ((a·tokid + c) mod P) mod 2. */
  private val SimhashBits: Seq[(Int, Long, Long)] =
    (0 until 16).map { b =>
      (b, 3571L + 2L * 1009L * b, 1277L + 4057L * b)
    }

  /** Distinct (doc_id, tok) pairs for doc_id < 300. */
  private def tokSet(s: SparkSession, dir: String): DataFrame =
    Fixtures.documents(s, dir).filter(col("doc_id") < 300)
      .select(col("doc_id"),
        explode(array_distinct(split(col("text"), " "))).as("tok"))

  /** Distinct (doc_id, tok) pairs over the WHOLE corpus — the
    * full-scale variants' input.
    */
  private def tokSetAll(s: SparkSession, dir: String): DataFrame =
    Fixtures.documents(s, dir)
      .select(col("doc_id"),
        explode(array_distinct(split(col("text"), " "))).as("tok"))

  /** Token ids = 44-bit integers from the md5 prefix — a pure per-row
    * codegen'd expression, no vocabulary shuffle/window/broadcast
    * anywhere. A rank-based id needs a global sort of the distinct
    * vocabulary (an unpartitioned window — a single-task bottleneck at
    * web-corpus vocabulary sizes); the hash id costs one expression
    * per token and the oracle reproduces it bit-identically
    * (`('0x' || substring(md5(tok),1,11))::BIGINT`). 44 bits keeps
    * every affine-hash product (max multiplier 33841) inside int64
    * under ANSI arithmetic; hash collisions (~|V|²/2⁴⁵) only nudge
    * sketch quality, never cross-engine agreement, because both
    * engines compute the identical id.
    */
  private def withTokId(tok: DataFrame): DataFrame =
    tok.withColumn("tokid",
      conv(substring(md5(col("tok")), 1, 11), 16, 10).cast("long"))

  /** Full 12-minima signatures (doc_id, mh0..mh11) in ONE aggregation
    * pass (one agg column per hash — the shuffle carries (doc_id,
    * 12 longs), no ×12 row expansion through the exchange). Shared by
    * the batch pipeline here and the incremental ingestion probe
    * ([[graft.streaming.StreamOps.ingestNearDupBatch]]), which stores
    * these signatures in the connector as the corpus-side sketch.
    */
  private[graft] def minhashSigs(toks: DataFrame): DataFrame = {
    val sigCols = MinhashParams.map { case (i, a, b) =>
      min((col("tokid") * a + b) % P).as(s"mh$i")
    }
    toks.groupBy("doc_id").agg(sigCols.head, sigCols.tail: _*)
  }

  /** Band rows (doc_id, band, bkey) from signatures — assembled
    * map-side, 6 bands × 2 rows.
    */
  private[graft] def bandsOfSigs(sig: DataFrame): DataFrame = {
    val bandStructs = (0 until MinhashParams.size / 2).map { b =>
      struct(lit(b).as("band"),
        concat_ws(",", col(s"mh${2 * b}"), col(s"mh${2 * b + 1}")).as("bkey"))
    }
    sig.select(col("doc_id"), explode(array(bandStructs: _*)).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.bkey").as("bkey"))
  }

  /** Number of minhash functions (the signature-agreement verifier's
    * denominator).
    */
  private[graft] val minhashSize: Int = MinhashParams.size

  /** LSH band rows (doc_id, band, bkey) from token-id sets. */
  private def minhashBands(toks: DataFrame): DataFrame =
    bandsOfSigs(minhashSigs(toks))

  /** Bucket-STAR candidate edges over LSH bands: inside each
    * (band, signature) bucket, only (bucket-min doc, member) pairs —
    * ≤ bands-per-doc candidates per document, the bound that keeps a
    * bucket of k identical documents at O(k) candidates instead of
    * the clique's O(k²). Package-visible so DedupSkewSpec can pin the
    * linearity directly.
    */
  private[graft] def starCandidates(toks: DataFrame): DataFrame = {
    val bands = minhashBands(toks)
    val roots = bands.groupBy("band", "bkey").agg(min("doc_id").as("id1"))
    bands.join(roots, Seq("band", "bkey"))
      .filter(col("doc_id") > col("id1"))
      .select(col("id1"), col("doc_id").as("id2"))
      .distinct()
  }

  /** Candidate pairs for fuzzy (edit-distance ≤ 3) name matching:
    * blocks are (first char × length band of width 4). Edit distance
    * ≤ 3 implies |len1 − len2| ≤ 3, so a qualifying pair sits in the
    * same or an adjacent band; the probe side explodes to bands
    * {b−1, b, b+1} while the anchor keeps its single band, so every
    * qualifying pair is emitted EXACTLY once (the anchor band is one
    * value — no dedup pass). |len diff| ≤ 3 rides as an explicit join
    * predicate too, so even a hostile all-same-letter vocabulary
    * yields a narrow ±3-length diagonal, never a block clique.
    * Package-visible so DedupSkewSpec can pin both the linear
    * candidate bound and the exactly-once emission.
    */
  private[graft] def fuzzyCandidates(names: DataFrame): DataFrame = {
    val band = floor(length(col("p_name")) / 4)
    val a = names.select(col("p_name").as("name1"),
      substring(col("p_name"), 1, 1).as("blk1"),
      explode(array(band - 1, band, band + 1)).as("band"))
    val b = names.select(col("p_name").as("name2"),
      substring(col("p_name"), 1, 1).as("blk2"),
      band.as("band2"))
    a.join(b,
        col("blk1") === col("blk2") && col("band") === col("band2") &&
          abs(length(col("name1")) - length(col("name2"))) <= 3 &&
          col("name1") < col("name2"))
      .select("name1", "name2")
  }

  /** Token-id sets of an ad-hoc (doc_id, text) frame — the spec-side
    * entry into the minhash pipeline.
    */
  private[graft] def tokIds(docs: DataFrame): DataFrame =
    withTokId(docs.select(col("doc_id"),
      explode(array_distinct(split(col("text"), " "))).as("tok")))
      .select("doc_id", "tokid")

  /** MinHash + LSH banding, verified with exact Jaccard — shared by
    * `q_dedup_minhash` (emits the pairs) and `q_dedup_cluster`
    * (components over them). Candidates meet only inside a
    * (band, band-signature) bucket — full within-bucket pairs here
    * (the bounded demo); the full-corpus path uses
    * [[starCandidates]]'s linear bound instead.
    */
  private def minhashVerified(s: SparkSession, dir: String): DataFrame = {
    // One visible hash(doc_id) exchange under every toks consumer
    // (round 18): the explode + per-token md5 id derivation feeds the
    // signature aggregate AND both verify sides, and as a plain view
    // it re-executed under each — the identical repartition subtrees
    // canonicalize equal, so ReuseExchange materializes the tokenized
    // corpus once and the md5 pass runs once per query instead of 3×.
    // hash(doc_id) also pre-satisfies the signature groupBy and the
    // verify window/t1-join clustering.
    val toks = withTokId(tokSet(s, dir)).select("doc_id", "tokid")
      .repartition(col("doc_id"))
    val bands = minhashBands(toks)
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id1"), col("y.doc_id").as("id2"))
      .distinct()
    verifyJaccard(cand, toks)
  }

  /** Min-label connected components with PATH HALVING over verified
    * duplicate pairs (see `q_dedup_cluster` for the full invariant
    * argument): every doc labeled with its component's min doc_id,
    * O(log diameter) rounds, each round's frame localCheckpoint'd.
    */
  private def connectedComponents(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val edges = pairs.select(col("id1").as("a"), col("id2").as("b"))
      .unionAll(pairs.select(col("id2").as("a"), col("id1").as("b")))
      .localCheckpoint(true)
    // The fixpoint iterates ONLY the edge-involved vertices: an
    // isolated document is its own component by definition and its
    // label can never change, so carrying the full corpus through
    // every round would multiply each iteration's shuffle by
    // corpus/duplicate-graph — at 100 TB the dup graph is orders of
    // magnitude smaller than the corpus. Isolated docs rejoin at the
    // end via coalesce(comp, doc_id).
    //
    // Labels initialize at the ROUND-1 fixpoint state directly
    // (round 18): with identity labels, round 1's neighbor-min step
    // yields least(id, min neighbor id) and its path-halving step is a
    // no-op (every label still points at itself), so ONE grouped
    // aggregate over the edge list replaces what was a distinct + a
    // full round (two label joins + a checkpoint + a count). Same
    // per-round shuffle count from round 2 on; one fewer round always.
    var labels = edges
      .groupBy(col("a"))
      .agg(least(col("a"), min(col("b"))).as("comp"))
      .select(col("a").as("id"), col("comp"))
      .localCheckpoint(true)
    var changed = 1L
    // Convergence is diameter-bounded and path halving makes rounds
    // O(log diameter); 64 rounds covers any graph that fits on disk
    // (2^64 nodes). Exceeding the cap means a logic bug (labels
    // oscillating), and silent non-termination on a cluster is far
    // worse than a loud abort — so: loud abort.
    var rounds = 0
    while (changed > 0) {
      rounds += 1
      require(rounds <= 64,
        s"connectedComponents failed to converge after 64 rounds " +
          s"($changed labels still changing) — min-label fixpoint bug")
      val nbr = edges
        .join(labels.select(col("id").as("nid"), col("comp")),
          col("b") === col("nid"))
        .groupBy("a").agg(min("comp").as("nbrmin"))
      val stepped = labels.join(nbr, labels("id") === nbr("a"), "left")
        .select(labels("id").as("id"), labels("comp").as("prev"),
          least(labels("comp"), coalesce(col("nbrmin"), labels("comp"))).as("c1"))
      val next = stepped
        .join(labels.select(col("id").as("pid"), col("comp").as("pcomp")),
          stepped("c1") === col("pid"), "left")
        .select(col("id"), col("prev"),
          least(col("c1"), coalesce(col("pcomp"), col("c1"))).as("comp"))
        .localCheckpoint(true)
      changed = next.filter(col("comp") =!= col("prev")).count()
      labels = next.select("id", "comp")
    }
    docs.select(col("doc_id"))
      .join(labels.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("comp"), col("doc_id")).cast("long").as("cluster"))
      .orderBy("doc_id")
  }

  /** Exact-Jaccard verification of candidate (id1, id2) pairs; output
    * pairs with jaccard ≥ 0.6 (integer-exact threshold, rule D2).
    */
  private def verifyJaccard(cand: DataFrame, toks: DataFrame): DataFrame = {
    // Set sizes ride WITH the token rows (round 18): n is a window
    // count over doc_id annotated before the candidate joins and
    // folded out of the pair aggregate as min(n1)/min(n2) — n is
    // constant per document, so the min IS the size. The r17 shape
    // aggregated sizes separately and joined them back onto the pair
    // table twice: one grouped pass + two pair-scale join exchanges
    // more than this form, for identical integer (shared, n1, n2)
    // triples and therefore an identical verified-pair set.
    val tn = toks.withColumn("n", count(lit(1)).over(
      org.apache.spark.sql.expressions.Window.partitionBy("doc_id")))
    val t1 = tn.select(col("doc_id").as("id1"), col("tokid"), col("n").as("na"))
    val t2 = tn.select(col("doc_id").as("id2"), col("tokid"), col("n").as("nb"))
    cand.join(t1, "id1").join(t2, Seq("id2", "tokid"))
      .groupBy("id1", "id2").agg(count(lit(1)).as("shared"),
        min("na").as("n1"), min("nb").as("n2"))
      .filter(col("shared") * 10 >= (col("n1") + col("n2") - col("shared")) * 6)
      .select(col("id1"), col("id2"),
        round(col("shared") / (col("n1") + col("n2") - col("shared")), 4)
          .as("jaccard"))
      .orderBy("id1", "id2")
  }

  val queries: Map[String, Q] = Map(
    // Exact dedup keyed by content fingerprint: one narrow shuffle of
    // (sha256, doc_id); survivors are min(doc_id) per fingerprint.
    // sha2-256 collision probability is negligible at any corpus size,
    // which is why production dedup keys on the digest, not the text.
    "q_dedup_fingerprint" -> ((s, dir) =>
      Fixtures.documents(s, dir)
        .groupBy(sha2(col("text"), 256).as("fp"))
        .agg(min("doc_id").as("doc_id"), count(lit(1)).as("dup_cnt"))
        .select("doc_id", "dup_cnt")
        .orderBy("doc_id")),

    // PREFIX dedup — boilerplate/truncation duplicates share a head
    // even when tails differ (crawl mirrors, pagination cutoffs).
    // Same constant-shuffle-width shape as the fingerprint key: the
    // 32-byte prefix hash is the grouping key, never the text.
    "q_dedup_prefix" -> ((s, dir) =>
      Fixtures.documents(s, dir)
        .groupBy(sha2(substring(col("text"), 1, 200), 256).as("pfx"))
        .agg(min("doc_id").as("keeper"), count(lit(1)).as("n_docs"))
        .filter(col("n_docs") > 1)
        .select("keeper", "n_docs")
        .orderBy("keeper")),

    // Cross-source duplication matrix — which source pairs share
    // duplicated documents (mirror detection, and the contamination
    // rate between any two corpus slices). Keyed on the 200-char
    // PREFIX fingerprint (this corpus duplicates heads, not whole
    // bodies — see q_dedup_prefix); the self-join meets only inside
    // true duplicate groups, and output is one row per source pair.
    "q_dedup_crosssource" -> ((s, dir) => {
      val h = Fixtures.documents(s, dir)
        .select(sha2(substring(col("text"), 1, 200), 256).as("th"),
          col("source"), col("doc_id"))
      h.as("a").join(h.as("b"),
          col("a.th") === col("b.th") && col("a.doc_id") < col("b.doc_id"))
        .select(least(col("a.source"), col("b.source")).as("src_a"),
          greatest(col("a.source"), col("b.source")).as("src_b"))
        .groupBy("src_a", "src_b")
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy("src_a", "src_b")
    }),

    // INCREMENTAL dedup — the recurring-crawl shape: the corpus below
    // doc_id 400 is already deduplicated and summarized as a
    // fingerprint set; only the NEW batch hashes and joins against it
    // (left-anti on the 32-byte fingerprints — broadcast when small,
    // keyed shuffle otherwise), then dedups within itself by min
    // doc_id. At 100 TB the world is never re-deduplicated per crawl:
    // each increment costs new-batch-size work against a fingerprint
    // store, not corpus-size work.
    "q_dedup_incremental" -> ((s, dir) => {
      val docs = Fixtures.documents(s, dir)
      val baseFp = docs.filter(col("doc_id") < 400)
        .select(sha2(col("text"), 256).as("fp")).distinct()
      docs.filter(col("doc_id") >= 400)
        .withColumn("fp", sha2(col("text"), 256))
        .join(baseFp, Seq("fp"), "left_anti")
        .groupBy("fp")
        .agg(min("doc_id").as("doc_id"), count(lit(1)).as("batch_dups"))
        .select("doc_id", "batch_dups")
        .orderBy("doc_id")
    }),

    "q_dedup_minhash" -> ((s, dir) => minhashVerified(s, dir)),

    // Near-dup CLUSTERING — the step after pair detection: connected
    // components of the verified-pair graph, every doc labeled with
    // its component's min doc_id (survivor election per duplicate
    // CLUSTER, not per pair — A~B, B~C must retire both B and C even
    // if A~C was never a candidate pair). Min-label propagation with
    // PATH HALVING: each round a node takes the min over {its label,
    // its neighbors' labels, its label's own label} — the pointer-jump
    // through the label table cuts convergence from O(diameter) rounds
    // to O(log diameter), the move that matters when a 100 TB corpus
    // chains shallow dup clusters into long paths. Every label is
    // always a doc id inside the node's own component (invariant under
    // both steps), labels only decrease, and the unique fixpoint is
    // the component min — identical to the oracle's recursive-CTE
    // closure. Each round's frame is localCheckpoint'd so lineage
    // stays flat across iterations.
    "q_dedup_cluster" -> ((s, dir) => {
      // keyed shuffle joins on purpose inside the CC loop: labels is
      // corpus-sized (one row per doc), so broadcasting it would be
      // the 100 TB anti-pattern — AQE still downgrades to broadcast
      // when a side measures small at runtime
      connectedComponents(
        Fixtures.documents(s, dir).filter(col("doc_id") < 300),
        minhashVerified(s, dir).select("id1", "id2"))
    }),

    // FULL-corpus duplicate clustering — the q_dedup_cluster shape
    // without the candidate-set bound, made linear by BUCKET-STAR
    // edges: inside each LSH (band, signature) bucket, candidates are
    // only (bucket-min doc, member) — ≤ bands-per-doc edges per
    // document instead of the bucket's full clique, so a pathological
    // bucket of identical documents costs O(k) verified pairs, not
    // O(k²). Exact-Jaccard verification then keeps only real
    // duplicate edges, and path-halving CC closes the clusters: a
    // clique's members all share the same bucket, so the star (or a
    // chain of stars through shared members) connects exactly what
    // the full pair graph would — only a member whose star edge FAILS
    // verification while it genuinely matches some non-min member can
    // split, the deliberate recall/cost trade documented here (at
    // 100 TB the star bound is what makes full-corpus CC plannable).
    // The oracle builds the IDENTICAL star graph in recursive SQL, so
    // the semantics are pinned, not approximated.
    "q_dedup_cluster_full" -> ((s, dir) => {
      // shared hash(doc_id) exchange under every toks consumer — same
      // device (and rationale) as [[minhashVerified]]
      val toks = withTokId(tokSetAll(s, dir)).select("doc_id", "tokid")
        .repartition(col("doc_id"))
      connectedComponents(
        Fixtures.documents(s, dir),
        verifyJaccard(starCandidates(toks), toks).select("id1", "id2"))
    }),

    // CONTAINMENT detection — sub-document duplication: a short
    // document wholly inside a longer one (quote + boilerplate union,
    // excerpt pages) scores LOW symmetric Jaccard but containment
    // |A∩B| / min(|A|,|B|) near 1, so Jaccard dedup misses it by
    // construction. Same LSH-bucketed candidate set as
    // q_dedup_minhash — no all-pairs stage exists — with the
    // verification ratio swapped.
    "q_text_containment" -> ((s, dir) => {
      // shared hash(doc_id) exchange under every toks consumer — same
      // device (and rationale) as [[minhashVerified]]
      val toks = withTokId(tokSet(s, dir)).select("doc_id", "tokid")
        .repartition(col("doc_id"))
      val bands = minhashBands(toks)
      val cand = bands.as("x").join(bands.as("y"),
          col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("id1"), col("y.doc_id").as("id2"))
        .distinct()
      // same size-rides-with-tokens device as [[verifyJaccard]]: one
      // window count replaces the sizes aggregate + two pair joins
      val tn = toks.withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc_id")))
      val shared = cand
        .join(tn.as("a"), col("id1") === col("a.doc_id"))
        .join(tn.as("b"),
          col("id2") === col("b.doc_id") && col("a.tokid") === col("b.tokid"))
        .groupBy("id1", "id2").agg(count(lit(1)).as("shared"),
          min(col("a.n")).as("n1"), min(col("b.n")).as("n2"))
      shared
        .select(col("id1"), col("id2"),
          floor(col("shared") / least(col("n1"), col("n2")) * 10000 + 0.5)
            .as("cont_x1e4"))
        .filter(col("cont_x1e4") >= 8000)
        .orderBy("id1", "id2")
    }),

    "q_dedup_simhash" -> ((s, dir) => {
      import s.implicits._
      val docs = Fixtures.documents(s, dir).filter(col("doc_id") < 300)
      val tokAll = docs.select(col("doc_id"),
        explode(split(col("text"), " ")).as("tok"))
      val tf = withTokId(
          tokAll.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf")))
      // tf-weighted vote per bit, all 16 bits in ONE aggregation pass
      // (one sum column per bit) — the shuffle carries (doc_id, 16
      // longs) instead of 16× the token rows, and bit-assembly below
      // is pure map-side arithmetic, not a second shuffle.
      val voteCols = SimhashBits.map { case (b, sa, sc) =>
        sum(col("tf") *
          (((col("tokid") * sa + sc) % P % 2) * 2 - 1)).as(s"w$b")
      }
      val sh = tf.groupBy("doc_id").agg(voteCols.head, voteCols.tail: _*)
        .select(col("doc_id"),
          SimhashBits.map { case (b, _, _) =>
            when(col(s"w$b") > 0, lit(1L << b)).otherwise(lit(0L))
          }.reduce(_ + _).as("simhash"))
      // Pigeonhole candidates: hamming ≤ 3 ⇒ one of the 4 nibbles equal.
      val chunks = Seq((0, 1L), (1, 16L), (2, 256L), (3, 4096L)).toDF("c", "pw")
      val ch = sh.crossJoin(broadcast(chunks))
        .select(col("doc_id"), col("simhash"), col("c"),
          expr("(simhash div pw) % 16").as("cv"))
      ch.as("x").join(ch.as("y"),
          col("x.c") === col("y.c") && col("x.cv") === col("y.cv") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("id1"), col("y.doc_id").as("id2"),
          col("x.simhash").as("h1"), col("y.simhash").as("h2"))
        .distinct()
        .withColumn("hamming", expr("bit_count(h1 ^ h2)"))
        .filter(col("hamming") <= 3)
        .select("id1", "id2", "hamming")
        .orderBy("id1", "id2")
    }),

    // Fuzzy entity matching by edit distance — the data-cleaning
    // resolution shape: match on the DISTINCT vocabulary (dedup
    // first; the name table is orders of magnitude smaller than the
    // corpus), block by a composite key so candidate pairs are
    // block-local, then exact Levenshtein <= 3 verifies.
    //
    // Blocking is (first char × length band): edit distance ≤ 3
    // implies |len1 − len2| ≤ 3, so with bands of width 4 the two
    // names land in the same or an ADJACENT band. The probe side
    // explodes to its band and both neighbours {b−1, b, b+1}
    // (band-overlap trick; both directions because the lexicographic
    // pair order is independent of length); the anchor side keeps its
    // single band, so every qualifying pair matches EXACTLY once — no
    // dedup pass needed. The length-diff bound is ALSO an explicit
    // join predicate, so even inside a block only a ±3 length window
    // is quadratic. At a 100× vocabulary a single-letter block is no
    // longer one all-pairs cell but ~len-range/4 independent cells of
    // a narrow diagonal — DedupSkewSpec pins the candidate collapse
    // on a hostile same-letter vocabulary.
    "q_match_fuzzy" -> ((s, dir) =>
      fuzzyCandidates(Fixtures.part(s, dir).select(col("p_name")).distinct())
        .withColumn("dist", levenshtein(col("name1"), col("name2")))
        .filter(col("dist") <= 3)
        .select("name1", "name2", "dist")
        .orderBy("name1", "name2")),

    // SemDeDup (Abbas et al. 2023): semantic dedup scoped BY CLUSTER —
    // assign every vector to its nearest centroid (the k-means E-step
    // `q_emb_assign` runs), then inside each cluster drop vectors
    // dominated by a lower-id member with rounded cosine ≥ τ. The
    // cluster scoping is what makes semantic dedup plannable at
    // 100 TB: candidate pairs exist only within a cluster (corpus/k
    // rows each), never across the corpus, and k is the knob that
    // bounds the quadratic stage. Determinism: domination by ANY
    // lower-id member (not the iterative keep-set — order-free), on
    // the ROUNDED cosine so boundary pairs can't split across
    // engines. Output: surviving (vec_id, cluster).
    "q_dedup_semantic" -> ((s, dir) => {
      // E-step output MATERIALIZED (round 18): `assigned` feeds three
      // consumers (both sides of the within-cluster domination join +
      // the final anti-join), and as a view the whole clusterAssign
      // pipeline (corpus explode + centroid broadcast + argmax window)
      // re-executed under each — the r17 executed plan carried SIX
      // copies of the rank window and 18 parquet scans. Cluster
      // assignments are exactly the state a SemDeDup run persists
      // between its E-step and its dedup pass.
      val assigned = Similarity.clusterAssign(s, dir)
        .select("vec_id", "cluster").localCheckpoint()
      val e = Similarity.embDouble(s, dir).select(col("vec_id"), col("emb"))
      val withEmb = assigned.join(e, "vec_id")
      val lower = withEmb.select(col("cluster").as("lc"),
        col("vec_id").as("lo_id"), col("emb").as("lo_emb"))
      val dominated = withEmb.join(lower,
          col("cluster") === col("lc") && col("lo_id") < col("vec_id"))
        .filter(round(graft.functions.Funcs.cosineSim(col("emb"), col("lo_emb")), 4)
          >= 0.42)
        .select("vec_id").distinct()
      assigned.join(dominated, Seq("vec_id"), "left_anti")
        .select(col("vec_id"), col("cluster"))
        .orderBy("vec_id")
    }),

    // SemDeDup with a corpus-sized candidate scope — the scale path
    // the sf3 probe demanded: q_dedup_semantic's pair stage is n²/k
    // and the fixture's label alphabet pins k, so at 30× the within-
    // cluster join went quadratic. Here each k-means cell is refined
    // by an LSH band — the first r SIGN BITS of the raw float
    // embedding (axis-aligned random-hyperplane LSH; cosine-similar
    // vectors agree on signs, so true near-dups stay co-banded) —
    // with r derived from the corpus: r = clamp(0..8,
    // ceil(log2(n / (k·200)))), i.e. bands grow just fast enough to
    // hold ~200 vectors each. Candidate pairs are then ~n·200/2 at
    // ANY corpus size — linear — at the standard LSH recall trade
    // (boundary pairs split across bands). r is a pure function of
    // (count, distinct labels) in INTEGER arithmetic ([[bandBits]]:
    // ceil-division + bit length, mirrored by the oracle's integer
    // CASE ladder — a floating log2 could flip ceil() by one ULP on
    // one engine at an exact power-of-two ratio), computed identically
    // by the oracle's own SQL, and the sign bits compare the SAME
    // stored float on
    // both engines — no arithmetic to disagree on. At the gate scales
    // r = 0 (bands degenerate to the plain cells), so this key also
    // pins that the refinement machinery is a no-op exactly when the
    // corpus doesn't need it.
    "q_dedup_semantic_lsh" -> ((s, dir) => {
      // same materialized-E-step device as q_dedup_semantic (three
      // consumers of `assigned`; see the comment there)
      val assigned = Similarity.clusterAssign(s, dir)
        .select("vec_id", "cluster").localCheckpoint()
      val eRaw = Fixtures.embeddings(s, dir)
      // one metadata-cheap aggregate decides r (deterministic scalars)
      val cnt = eRaw.agg(count(lit(1)).as("n"),
        countDistinct(col("label")).as("k")).head()
      val (n, k) = (cnt.getLong(0), cnt.getLong(1))
      val r = bandBits(n, k)
      val signs = concat((0 until 8).map(i =>
        when(element_at(col("embedding"), i + 1) >= 0, lit("1"))
          .otherwise(lit("0"))): _*)
      val banded = eRaw.select(col("vec_id"), substring(signs, 1, r).as("band"))
      val e = Similarity.embDouble(s, dir).select(col("vec_id"), col("emb"))
      val withEmb = assigned.join(banded, "vec_id").join(e, "vec_id")
      val lower = withEmb.select(col("cluster").as("lc"), col("band").as("lb"),
        col("vec_id").as("lo_id"), col("emb").as("lo_emb"))
      val dominated = withEmb.join(lower,
          col("cluster") === col("lc") && col("band") === col("lb") &&
            col("lo_id") < col("vec_id"))
        .filter(round(graft.functions.Funcs.cosineSim(col("emb"), col("lo_emb")), 4)
          >= 0.42)
        .select("vec_id").distinct()
      assigned.join(banded, "vec_id")
        .join(dominated, Seq("vec_id"), "left_anti")
        .select(col("vec_id"), col("cluster"), col("band"))
        .orderBy("vec_id")
    }),

    // Embedding-cosine near-dup: pairs whose rounded cosine clears the
    // threshold. Both engines filter on the ROUNDED value so boundary
    // membership can't disagree (the q_agg_having lesson).
    // Near-dup detection over WINNOWING fingerprints (the detection
    // half of q_text_winnow, full corpus): docs sharing ≥ 3 RARE
    // fingerprints (df ≤ 20 — common-phrase buckets are dropped, the
    // same df-cap device as q_dedup_near_capped) are overlap pairs.
    // Bucket sizes are capped by the df filter, so the within-bucket
    // pair join is ≤ C(20,2) per bucket — linear in fingerprints at
    // any corpus size, never all-pairs; winnowing's guarantee makes
    // the candidates MEANINGFUL (a shared fp certifies a shared
    // ≥ w+k−1 token run).
    "q_dedup_winnow" -> ((s, dir) => {
      // checkpoint: the fingerprint derivation feeds FOUR subplans
      // (df count + both join sides via rare) — materialize it once
      // instead of re-running the winnow pipeline per reference (the
      // same device the graph queries use for their edge lists)
      val fps = TextAnalysis.winnowFps(s, dir).localCheckpoint(true)
      // df cap as a GROUPED aggregate + BROADCAST join-back (round 19;
      // guide §2.3/§2.5/§3.1): the r18 window form shuffled EVERY fp
      // row through one hash(fp) exchange and buffered each
      // fingerprint's whole group in one window frame — a
      // common-phrase fingerprint at corpus scale funnels through a
      // single task's buffer before the cap filter drops it. The
      // grouped form partial-aggregates map-side (the exchange carries
      // fp-dictionary-sized partial counts — 8-byte longs, not rows),
      // and the df-capped dictionary broadcasts back, dropping hot-fp
      // rows BEFORE any row-scale exchange. The build side is the fp
      // DICTIONARY (sub-linear in corpus size; winnowing keeps
      // ~2/(w+1) of grams and dedups per doc) — if it ever outgrew the
      // broadcast budget the same grouped-agg output joins by shuffle,
      // still strictly less data than the old full-row fp exchange.
      // Same df per fp, same rare set, same pairs.
      val rareFp = fps.groupBy("fp").agg(count(lit(1)).as("df"))
        .filter(col("df") <= 20)
        .select("fp")
      val rare = fps.join(broadcast(rareFp), "fp")
        .select("doc_id", "fp")
      rare.as("a").join(rare.as("b"),
          col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
        .agg(count(lit(1)).as("shared"))
        .filter(col("shared") >= 3)
        .orderBy("id1", "id2")
    }),

    "q_dedup_embed" -> ((s, dir) => {
      val e = Similarity.embDouble(s, dir).filter(col("vec_id") < 300)
      val a = e.select(col("vec_id").as("id1"), col("emb").as("ea"))
      val b = e.select(col("vec_id").as("id2"), col("emb").as("eb"))
      // Fused single-loop kernel (bit-identical to the HOF composition
      // — FunctionsSpec): one pass over both arrays per pair instead of
      // three separate zip_with/aggregate folds.
      a.join(b, col("id1") < col("id2"))
        .select(col("id1"), col("id2"),
          round(graft.functions.Funcs.cosineSim(col("ea"), col("eb")), 4)
            .as("cosine"))
        .filter(col("cosine") >= 0.42)
        .orderBy("id1", "id2")
    }))

  val oracle: Map[String, String] = Map(
    // winnowing fps (the q_text_winnow CTEs) → df-capped buckets →
    // shared-fp pair counts
    "q_dedup_winnow" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), t -> t <> '') AS toks
        |  FROM documents),
        |g AS (
        |  SELECT doc_id,
        |    CASE WHEN len(toks) >= 3 THEN
        |      list_transform(generate_series(1, len(toks) - 2),
        |        i -> CAST(('0x' || substring(
        |               md5(array_to_string(toks[i:i+2], ' ')), 1, 11)) AS BIGINT))
        |    ELSE [] END AS grams
        |  FROM base),
        |w AS (
        |  SELECT doc_id,
        |    CASE WHEN len(grams) = 0 THEN []
        |         WHEN len(grams) >= 4 THEN
        |      list_distinct(list_transform(generate_series(1, len(grams) - 3),
        |        j -> list_min(grams[j:j+3])))
        |    ELSE [list_min(grams)] END AS fps
        |  FROM g),
        |fps AS (SELECT doc_id, unnest(fps) AS fp FROM w),
        |dfreq AS (SELECT fp, count(*) AS df FROM fps GROUP BY 1),
        |rare AS (SELECT f.doc_id, f.fp FROM fps f JOIN dfreq d USING (fp)
        |         WHERE d.df <= 20)
        |SELECT a.doc_id AS id1, b.doc_id AS id2,
        |       CAST(count(*) AS BIGINT) AS shared
        |FROM rare a JOIN rare b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |GROUP BY 1, 2 HAVING count(*) >= 3
        |ORDER BY id1, id2""".stripMargin,
    "q_dedup_fingerprint" ->
      """SELECT min(doc_id) AS doc_id, count(*) AS dup_cnt
        |FROM documents GROUP BY sha256(text) ORDER BY doc_id""".stripMargin,
    "q_text_containment" ->
      """WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 300),
        |tok0 AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok FROM d),
        |toks AS (SELECT doc_id,
        |                ('0x' || substring(md5(tok), 1, 11))::BIGINT AS tokid
        |         FROM tok0),
        |p(i, a, b) AS (VALUES (0,1103,12345),(1,5077,999),(2,9173,471),
        |  (3,7919,8191),(4,2663,30269),(5,4271,11213),(6,6619,257),
        |  (7,3541,49157),(8,7333,6007),(9,9901,331),(10,5683,7039),
        |  (11,8761,52361)),
        |sig AS (SELECT doc_id, i, min((a * tokid + b) % 2147483647) AS mh
        |        FROM toks, p GROUP BY 1, 2),
        |bands AS (SELECT doc_id, i // 2 AS band,
        |                 array_to_string(list(mh ORDER BY i), ',') AS bkey
        |          FROM sig GROUP BY 1, 2),
        |cand AS (SELECT DISTINCT x.doc_id AS id1, y.doc_id AS id2
        |         FROM bands x JOIN bands y
        |         ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id),
        |sz AS (SELECT doc_id, count(*) AS n FROM toks GROUP BY 1),
        |sh AS (SELECT id1, id2, count(*) AS shared FROM cand
        |       JOIN toks a ON a.doc_id = id1
        |       JOIN toks b ON b.doc_id = id2 AND b.tokid = a.tokid
        |       GROUP BY 1, 2)
        |SELECT id1, id2,
        |       CAST(floor(CAST(shared AS DOUBLE) / least(s1.n, s2.n) * 10000 + 0.5)
        |            AS BIGINT) AS cont_x1e4
        |FROM sh JOIN sz s1 ON id1 = s1.doc_id JOIN sz s2 ON id2 = s2.doc_id
        |WHERE CAST(floor(CAST(shared AS DOUBLE) / least(s1.n, s2.n) * 10000 + 0.5)
        |           AS BIGINT) >= 8000
        |ORDER BY id1, id2""".stripMargin,
    "q_dedup_prefix" ->
      """SELECT CAST(min(doc_id) AS BIGINT) AS keeper,
        |       CAST(count(*) AS BIGINT) AS n_docs
        |FROM documents GROUP BY sha256(substring(text, 1, 200))
        |HAVING count(*) > 1 ORDER BY keeper""".stripMargin,
    "q_dedup_crosssource" ->
      """WITH h AS (SELECT sha256(substring(text, 1, 200)) AS th,
        |                  source, doc_id FROM documents)
        |SELECT least(a.source, b.source) AS src_a,
        |       greatest(a.source, b.source) AS src_b,
        |       CAST(count(*) AS BIGINT) AS n_pairs
        |FROM h a JOIN h b ON a.th = b.th AND a.doc_id < b.doc_id
        |GROUP BY src_a, src_b ORDER BY src_a, src_b""".stripMargin,
    "q_dedup_incremental" ->
      """WITH base AS (SELECT DISTINCT sha256(text) AS fp
        |              FROM documents WHERE doc_id < 400),
        |fresh AS (SELECT doc_id, sha256(text) AS fp
        |          FROM documents WHERE doc_id >= 400)
        |SELECT min(doc_id) AS doc_id, CAST(count(*) AS BIGINT) AS batch_dups
        |FROM fresh WHERE fp NOT IN (SELECT fp FROM base)
        |GROUP BY fp ORDER BY doc_id""".stripMargin,
    "q_dedup_cluster" ->
      """WITH RECURSIVE d AS (SELECT doc_id, text FROM documents WHERE doc_id < 300),
        |tok0 AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok FROM d),
        |toks AS (SELECT doc_id,
        |                ('0x' || substring(md5(tok), 1, 11))::BIGINT AS tokid
        |         FROM tok0),
        |p(i, a, b) AS (VALUES (0,1103,12345),(1,5077,999),(2,9173,471),
        |  (3,7919,8191),(4,2663,30269),(5,4271,11213),(6,6619,257),
        |  (7,3541,49157),(8,7333,6007),(9,9901,331),(10,5683,7039),
        |  (11,8761,52361)),
        |sig AS (SELECT doc_id, i, min((a * tokid + b) % 2147483647) AS mh
        |        FROM toks, p GROUP BY 1, 2),
        |bands AS (SELECT doc_id, i // 2 AS band,
        |                 array_to_string(list(mh ORDER BY i), ',') AS bkey
        |          FROM sig GROUP BY 1, 2),
        |cand AS (SELECT DISTINCT x.doc_id AS id1, y.doc_id AS id2
        |         FROM bands x JOIN bands y
        |         ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id),
        |sz AS (SELECT doc_id, count(*) AS n FROM toks GROUP BY 1),
        |sh AS (SELECT id1, id2, count(*) AS shared FROM cand
        |       JOIN toks a ON a.doc_id = id1
        |       JOIN toks b ON b.doc_id = id2 AND b.tokid = a.tokid
        |       GROUP BY 1, 2),
        |pairs AS (SELECT id1, id2
        |          FROM sh JOIN sz s1 ON id1 = s1.doc_id JOIN sz s2 ON id2 = s2.doc_id
        |          WHERE shared * 10 >= (s1.n + s2.n - shared) * 6),
        |edges AS (SELECT id1 AS a, id2 AS b FROM pairs
        |          UNION ALL SELECT id2, id1 FROM pairs),
        |reach(id, comp) AS (
        |  SELECT doc_id, doc_id FROM d
        |  UNION
        |  SELECT e.a, r.comp FROM edges e JOIN reach r ON e.b = r.id)
        |SELECT id AS doc_id, CAST(min(comp) AS BIGINT) AS cluster FROM reach
        |GROUP BY id ORDER BY doc_id""".stripMargin,
    "q_dedup_cluster_full" ->
      """WITH RECURSIVE d AS (SELECT doc_id, text FROM documents),
        |tok0 AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok FROM d),
        |toks AS (SELECT doc_id,
        |                ('0x' || substring(md5(tok), 1, 11))::BIGINT AS tokid
        |         FROM tok0),
        |p(i, a, b) AS (VALUES (0,1103,12345),(1,5077,999),(2,9173,471),
        |  (3,7919,8191),(4,2663,30269),(5,4271,11213),(6,6619,257),
        |  (7,3541,49157),(8,7333,6007),(9,9901,331),(10,5683,7039),
        |  (11,8761,52361)),
        |sig AS (SELECT doc_id, i, min((a * tokid + b) % 2147483647) AS mh
        |        FROM toks, p GROUP BY 1, 2),
        |bands AS (SELECT doc_id, i // 2 AS band,
        |                 array_to_string(list(mh ORDER BY i), ',') AS bkey
        |          FROM sig GROUP BY 1, 2),
        |roots AS (SELECT band, bkey, min(doc_id) AS id1 FROM bands GROUP BY 1, 2),
        |cand AS (SELECT DISTINCT r.id1, b.doc_id AS id2
        |         FROM bands b JOIN roots r
        |         ON b.band = r.band AND b.bkey = r.bkey AND b.doc_id > r.id1),
        |sz AS (SELECT doc_id, count(*) AS n FROM toks GROUP BY 1),
        |sh AS (SELECT id1, id2, count(*) AS shared FROM cand
        |       JOIN toks a ON a.doc_id = id1
        |       JOIN toks b ON b.doc_id = id2 AND b.tokid = a.tokid
        |       GROUP BY 1, 2),
        |pairs AS (SELECT id1, id2
        |          FROM sh JOIN sz s1 ON id1 = s1.doc_id JOIN sz s2 ON id2 = s2.doc_id
        |          WHERE shared * 10 >= (s1.n + s2.n - shared) * 6),
        |edges AS (SELECT id1 AS a, id2 AS b FROM pairs
        |          UNION ALL SELECT id2, id1 FROM pairs),
        |reach(id, comp) AS (
        |  SELECT doc_id, doc_id FROM d
        |  UNION
        |  SELECT e.a, r.comp FROM edges e JOIN reach r ON e.b = r.id)
        |SELECT id AS doc_id, CAST(min(comp) AS BIGINT) AS cluster FROM reach
        |GROUP BY id ORDER BY doc_id""".stripMargin,
    "q_dedup_minhash" ->
      """WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 300),
        |tok0 AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok FROM d),
        |toks AS (SELECT doc_id,
        |                ('0x' || substring(md5(tok), 1, 11))::BIGINT AS tokid
        |         FROM tok0),
        |p(i, a, b) AS (VALUES (0,1103,12345),(1,5077,999),(2,9173,471),
        |  (3,7919,8191),(4,2663,30269),(5,4271,11213),(6,6619,257),
        |  (7,3541,49157),(8,7333,6007),(9,9901,331),(10,5683,7039),
        |  (11,8761,52361)),
        |sig AS (SELECT doc_id, i, min((a * tokid + b) % 2147483647) AS mh
        |        FROM toks, p GROUP BY 1, 2),
        |bands AS (SELECT doc_id, i // 2 AS band,
        |                 array_to_string(list(mh ORDER BY i), ',') AS bkey
        |          FROM sig GROUP BY 1, 2),
        |cand AS (SELECT DISTINCT x.doc_id AS id1, y.doc_id AS id2
        |         FROM bands x JOIN bands y
        |         ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id),
        |sz AS (SELECT doc_id, count(*) AS n FROM toks GROUP BY 1),
        |sh AS (SELECT id1, id2, count(*) AS shared FROM cand
        |       JOIN toks a ON a.doc_id = id1
        |       JOIN toks b ON b.doc_id = id2 AND b.tokid = a.tokid
        |       GROUP BY 1, 2)
        |SELECT id1, id2,
        |       round(CAST(shared AS DOUBLE) / (s1.n + s2.n - shared), 4) AS jaccard
        |FROM sh JOIN sz s1 ON id1 = s1.doc_id JOIN sz s2 ON id2 = s2.doc_id
        |WHERE shared * 10 >= (s1.n + s2.n - shared) * 6
        |ORDER BY id1, id2""".stripMargin,
    "q_dedup_simhash" ->
      """WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 300),
        |tok0 AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM d),
        |tf AS (SELECT doc_id,
        |              ('0x' || substring(md5(tok), 1, 11))::BIGINT AS tokid,
        |              count(*) AS tf
        |       FROM tok0 GROUP BY 1, 2),
        |bits AS (SELECT b, 3571 + 2 * 1009 * b AS sa, 1277 + 4057 * b AS sc
        |         FROM (SELECT unnest(generate_series(0, 15)) AS b)),
        |contrib AS (SELECT doc_id, b,
        |                   sum(tf * (((sa * tokid + sc) % 2147483647 % 2) * 2 - 1)) AS w
        |            FROM tf, bits GROUP BY 1, 2),
        |sh AS (SELECT doc_id,
        |              CAST(sum(CASE WHEN w > 0
        |                       THEN CAST(round(2 ** b) AS BIGINT) ELSE 0 END)
        |                   AS BIGINT) AS simhash
        |       FROM contrib GROUP BY 1),
        |chunks(c, pw) AS (VALUES (0, 1), (1, 16), (2, 256), (3, 4096)),
        |ch AS (SELECT doc_id, simhash, c, (simhash // pw) % 16 AS cv
        |       FROM sh, chunks),
        |cand AS (SELECT DISTINCT x.doc_id AS id1, y.doc_id AS id2,
        |                x.simhash AS h1, y.simhash AS h2
        |         FROM ch x JOIN ch y
        |         ON x.c = y.c AND x.cv = y.cv AND x.doc_id < y.doc_id)
        |SELECT id1, id2, CAST(bit_count(xor(h1, h2)) AS BIGINT) AS hamming
        |FROM cand WHERE bit_count(xor(h1, h2)) <= 3
        |ORDER BY id1, id2""".stripMargin,
    "q_match_fuzzy" ->
      """WITH n AS (SELECT DISTINCT p_name FROM part)
        |SELECT a.p_name AS name1, b.p_name AS name2,
        |       CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
        |FROM n a JOIN n b
        |  ON substring(a.p_name, 1, 1) = substring(b.p_name, 1, 1)
        | AND a.p_name < b.p_name
        |WHERE levenshtein(a.p_name, b.p_name) <= 3
        |ORDER BY name1, name2""".stripMargin,
    "q_dedup_semantic" ->
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
        |      FROM sc JOIN vn USING (vec_id) JOIN cn USING (label)),
        |asg AS (SELECT vec_id, label AS cluster FROM (
        |  SELECT vec_id, label,
        |         row_number() OVER (PARTITION BY vec_id
        |                            ORDER BY score_x1e4 DESC, label) AS rk
        |  FROM r) WHERE rk = 1),
        |ed AS (SELECT vec_id,
        |              list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        |       FROM embeddings),
        |dt AS (SELECT hi.vec_id AS hi, lo.vec_id AS lo,
        |              list_dot_product(ea.e, eb.e) AS dot
        |       FROM asg hi JOIN asg lo
        |         ON hi.cluster = lo.cluster AND lo.vec_id < hi.vec_id
        |       JOIN ed ea ON ea.vec_id = hi.vec_id
        |       JOIN ed eb ON eb.vec_id = lo.vec_id),
        |dom AS (SELECT DISTINCT dt.hi FROM dt
        |        JOIN vn na ON na.vec_id = dt.hi
        |        JOIN vn nb ON nb.vec_id = dt.lo
        |        WHERE round(dot / (na.vn * nb.vn), 4) >= 0.42)
        |SELECT vec_id, cluster FROM asg
        |WHERE vec_id NOT IN (SELECT hi FROM dom) ORDER BY vec_id""".stripMargin,
    "q_dedup_semantic_lsh" ->
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
        |      FROM sc JOIN vn USING (vec_id) JOIN cn USING (label)),
        |asg AS (SELECT vec_id, label AS cluster FROM (
        |  SELECT vec_id, label,
        |         row_number() OVER (PARTITION BY vec_id
        |                            ORDER BY score_x1e4 DESC, label) AS rk
        |  FROM r) WHERE rk = 1),
        |prm AS (SELECT LEAST(8, CASE WHEN q <= 1 THEN 0 WHEN q <= 2 THEN 1
        |          WHEN q <= 4 THEN 2 WHEN q <= 8 THEN 3 WHEN q <= 16 THEN 4
        |          WHEN q <= 32 THEN 5 WHEN q <= 64 THEN 6 WHEN q <= 128 THEN 7
        |          ELSE 8 END) AS r
        |        FROM (SELECT CASE WHEN count(*) = 0
        |                          OR count(DISTINCT label) = 0 THEN 0
        |                     ELSE (count(*) + count(DISTINCT label) * 200 - 1)
        |                          // (count(DISTINCT label) * 200) END AS q
        |              FROM embeddings)),
        |sg AS (SELECT vec_id, substring(
        |         concat(CASE WHEN embedding[1] >= 0 THEN '1' ELSE '0' END,
        |                CASE WHEN embedding[2] >= 0 THEN '1' ELSE '0' END,
        |                CASE WHEN embedding[3] >= 0 THEN '1' ELSE '0' END,
        |                CASE WHEN embedding[4] >= 0 THEN '1' ELSE '0' END,
        |                CASE WHEN embedding[5] >= 0 THEN '1' ELSE '0' END,
        |                CASE WHEN embedding[6] >= 0 THEN '1' ELSE '0' END,
        |                CASE WHEN embedding[7] >= 0 THEN '1' ELSE '0' END,
        |                CASE WHEN embedding[8] >= 0 THEN '1' ELSE '0' END),
        |         1, (SELECT r FROM prm)) AS band
        |       FROM embeddings),
        |ab AS (SELECT asg.vec_id, cluster, band FROM asg JOIN sg USING (vec_id)),
        |dt AS (SELECT hi.vec_id AS hi, lo.vec_id AS lo, sum(a.x * b.x) AS dot
        |       FROM ab hi JOIN ab lo
        |         ON hi.cluster = lo.cluster AND hi.band = lo.band
        |        AND lo.vec_id < hi.vec_id
        |       JOIN ex a ON a.vec_id = hi.vec_id
        |       JOIN ex b ON b.vec_id = lo.vec_id AND b.i = a.i
        |       GROUP BY 1, 2),
        |dom AS (SELECT DISTINCT dt.hi FROM dt
        |        JOIN vn na ON na.vec_id = dt.hi
        |        JOIN vn nb ON nb.vec_id = dt.lo
        |        WHERE round(dot / (na.vn * nb.vn), 4) >= 0.42)
        |SELECT vec_id, cluster, band FROM ab
        |WHERE vec_id NOT IN (SELECT hi FROM dom) ORDER BY vec_id""".stripMargin,
    "q_dedup_embed" ->
      """WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 300),
        |ex AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
        |              generate_subscripts(embedding, 1) AS i FROM e),
        |dt AS (SELECT a.vec_id AS id1, b.vec_id AS id2, sum(a.x * b.x) AS dot
        |       FROM ex a JOIN ex b ON a.i = b.i AND a.vec_id < b.vec_id
        |       GROUP BY 1, 2),
        |n AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM ex GROUP BY 1)
        |SELECT id1, id2, round(dot / (na.nrm * nb.nrm), 4) AS cosine
        |FROM dt JOIN n na ON dt.id1 = na.vec_id JOIN n nb ON dt.id2 = nb.vec_id
        |WHERE round(dot / (na.nrm * nb.nrm), 4) >= 0.42
        |ORDER BY id1, id2""".stripMargin)
}
