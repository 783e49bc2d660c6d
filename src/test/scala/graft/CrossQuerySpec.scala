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
    // QueriesSpec); q_dyn_sample's pushed key-hash sample is exact but
    // not expressible in portable SQL (DynamoConnectorSpec pins its
    // semantics instead)
    val declaredNoOracle =
      Set("q_agg_approx_distinct", "q_agg_sketch_union",
        "q_agg_approx_percentile", "q_dyn_sample")
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
  }
}
