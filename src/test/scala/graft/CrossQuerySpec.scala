package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Cross-query semantic invariants between the approximate operators
  * and their exact counterparts — properties the per-query DuckDB
  * oracle cannot express because they span two queries:
  *
  *  - LSH candidate generation may MISS near-dup pairs but must never
  *    invent one: verified MinHash output ⊆ exact token-Jaccard output.
  *  - Fingerprint dedup and exact dedup must elect identical survivors
  *    (sha2-256 collisions are the only divergence, and there are none).
  *  - Bucketed/IVF ANN probes search a subset of the corpus, so their
  *    best hit can never beat exhaustive kNN.
  */
class CrossQuerySpec extends AnyFunSuite {
  import TestSpark._

  private def run(name: String): DataFrame = SparkEntry.queries(name)(spark, sf)

  test("verified MinHash pairs are a subset of exact Jaccard pairs, scores equal") {
    val lsh = run("q_dedup_minhash").select("id1", "id2", "jaccard")
    val exact = run("q_dedup_near").select("id1", "id2", "jaccard")
    assert(lsh.exceptAll(exact).count() === 0,
      "LSH produced a pair the exact join does not contain")
    assert(lsh.count() > 0)
  }

  test("fingerprint dedup and exact dedup elect the same survivors") {
    val byFp = run("q_dedup_fingerprint").select("doc_id")
    val byText = run("q_dedup_exact").select("doc_id")
    assert(byFp.exceptAll(byText).count() === 0)
    assert(byText.exceptAll(byFp).count() === 0)
  }

  test("curation pipeline emits only exact-dedup survivors") {
    val curated = run("q_pipeline_curate").select("doc_id")
    val survivors = run("q_dedup_exact").select("doc_id")
    assert(curated.exceptAll(survivors).count() === 0,
      "curate kept a doc that exact dedup would have dropped")
    assert(curated.count() > 0)
  }

  test("driver contract: oracle keys == query keys minus the sketch-valued set") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    val orphanOracles = o -- q
    assert(orphanOracles.isEmpty, s"oracle SQL without a query: $orphanOracles")
    // the sketch keys are approximate-valued by design (banded by
    // QueriesSpec). q_dyn_sample left this set in r18: its pushed
    // key-hash membership (FNV-1a + splitmix64) is now spelled in
    // DuckDB SQL directly (HUGEINT limb arithmetic + list_reduce —
    // see DynamoQueries.oracle), so the driver's own gate checks it
    // content-exactly; DynamoConnectorSpec's independent hash
    // reimplementation and check.py's Python cross-check both remain.
    val declaredNoOracle =
      Set("q_agg_approx_distinct", "q_agg_sketch_union",
        "q_agg_approx_percentile")
    val noOracle = q -- o
    assert(noOracle === declaredNoOracle,
      s"queries silently missing an oracle: ${noOracle -- declaredNoOracle}")
  }

  test("bucketed and IVF ANN never beat exhaustive kNN's best hit") {
    def best(name: String): Option[Double] =
      run(name).collect().map(_.getAs[Double]("cosine")).maxOption
    val exact = best("q_sim_knn").get
    best("q_sim_ann_bucket").foreach(b => assert(b <= exact))
    best("q_sim_ivf").foreach(b => assert(b <= exact))
    // recall is monotone in nprobe: 3 probed cells can only improve
    // on 1, and both stay below the exhaustive scan
    val mprobe = best("q_sim_ivf_mprobe").get
    best("q_sim_ivf").foreach(b => assert(mprobe >= b))
    assert(mprobe <= exact)
    // PQ probes the same 3 cells but shortlists through lossy codes,
    // so its best hit can only lose to the exact multi-probe scan —
    // and its exact re-rank keeps it honest (a real cosine, ≤ exact)
    val pq = best("q_sim_ivf_pq").get
    assert(pq <= mprobe)
    assert(pq <= exact)
    assert(run("q_sim_ivf_pq").count() === 5)
    // The STORE-served probes are the same math over the same
    // postings (shared oracles), so they must agree exactly with
    // their parquet-served twins — the N↔double codec bit-exactness
    // law, cross-checked engine-side (the DuckDB gate checks it
    // against SQL; this pins Spark-vs-Spark too).
    def rows(name: String) = run(name).collect().toSeq
    assert(rows("q_dyn_ann") == rows("q_sim_ivf"))
    assert(rows("q_dyn_ann_mprobe") == rows("q_sim_ivf_mprobe"))
  }

  test("attribution conversions sum to exactly the purchase count") {
    // Every purchase is attributed to exactly one channel ('direct'
    // included), so the channel rollup must partition the purchases.
    import org.apache.spark.sql.functions._
    val attributed = run("q_events_attribution")
      .agg(sum("conversions")).collect().head.getLong(0)
    val purchases = graft.Fixtures.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    assert(attributed === purchases)
  }

  test("session paths partition the q_stream_session sessions") {
    // Rebuilding the path rollup WITHOUT the top-20 limit must count
    // exactly as many sessions as the session-window query emits —
    // same gap rule, independent implementations (session_window vs
    // gaps-and-islands), so drift in either shows up here.
    import org.apache.spark.sql.functions._
    val sessions = run("q_stream_session").count()
    val e = graft.Fixtures.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val nSessions = e
      .withColumn("prev", lag("ts", 1).over(w))
      .withColumn("new_sess",
        when(col("prev").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev")) >= 1800L * 1000000L, 1L)
          .otherwise(0L))
      .agg(sum("new_sess")).collect().head.getLong(0)
    assert(nSessions === sessions)
  }

  test("epoch mixing emits floor-or-ceil copies per doc, tier ratios inside [floor, ceil]") {
    import org.apache.spark.sql.functions._
    val copies = run("q_mix_epochs")
      .groupBy("doc_id", "source").agg(count(lit(1)).as("n"))
    val tiers = Map(
      Set("src0", "src1", "src2", "src3") -> (2L, 3L, 2.5),
      Set("src4", "src5", "src6", "src7") -> (1L, 2L, 1.5))
    val rows = copies.collect()
    rows.foreach { r =>
      val (src, n) = (r.getString(1), r.getLong(2))
      val (lo, hi, _) = tiers.find(_._1.contains(src)).map(_._2).getOrElse((1L, 1L, 1.0))
      assert(n >= lo && n <= hi, s"$src doc ${r.getLong(0)} got $n copies")
    }
    // aggregate upsampling ratio stays inside the tier's [floor, ceil]
    tiers.foreach { case (srcs, (lo, hi, _)) =>
      val t = rows.filter(r => srcs.contains(r.getString(1)))
      if (t.nonEmpty) {
        val ratio = t.map(_.getLong(2)).sum.toDouble / t.length
        assert(ratio >= lo && ratio <= hi, s"tier $srcs ratio $ratio")
      }
    }
  }

  test("dupspan fractions agree with a direct double-explode recount") {
    // Independent recomputation through the join-back shape the
    // optimized identity replaced — the two must agree row-for-row.
    import org.apache.spark.sql.functions._
    val d = graft.Fixtures.documents(spark, sf)
      .select(col("doc_id"),
        filter(split(col("text"), " "), x => length(x) > lit(0)).as("a"))
      .filter(size(col("a")) >= 5)
    val spans = d.select(col("doc_id"),
      explode(array_distinct(expr(
        "transform(sequence(1, size(a)-4), i -> concat_ws(' ', a[i-1], a[i], a[i+1], a[i+2], a[i+3]))")))
        .as("span"))
    val df = spans.groupBy("span").agg(count(lit(1)).as("df"))
    val direct = spans.join(df, "span").groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"),
        sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_dup"))
    val got = run("q_text_dupspan").select("doc_id", "n_spans", "n_dup")
    assert(got.exceptAll(direct.select("doc_id", "n_spans", "n_dup")).count() === 0)
    assert(direct.count() === got.count())
  }
}
