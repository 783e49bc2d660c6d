package graft

import graft.functions.Funcs
import graft.queries.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the custom codegen `CosineSim` expression: bit-equality
  * with the higher-order-function kernel (which the DuckDB oracle
  * already validates), SQL registration, and null semantics.
  *
  * Uses the shared TestSpark session (suites in this JVM share one
  * SparkContext — a suite must never stop it), so SQL registration is
  * exercised through `Funcs.register`; `GraftExtensions` wires the
  * same descriptor for fresh sessions via spark.sql.extensions.
  */
class FunctionsSpec extends AnyFunSuite {

  private val sfDir: String = TestSpark.sf

  private lazy val spark: SparkSession = {
    val s = TestSpark.spark
    Funcs.register(s)
    s
  }

  test("CosineSim is bit-identical to the zip_with/aggregate kernel") {
    val e = Similarity.embDouble(spark, sfDir)
    val b = e.select(col("emb").as("eb")).limit(1)
    val both = e.crossJoin(broadcast(b))
      .select(
        Similarity.cosine(col("emb"), col("eb")).as("hof"),
        Funcs.cosineSim(col("emb"), col("eb")).as("native"))
    // bit-identical, not approximately-equal: both accumulate in
    // index order, so any difference is a kernel bug
    assert(both.filter(col("hof") =!= col("native")).count() === 0)
    assert(both.count() > 0)
  }

  test("cosine_sim is callable from SQL once registered") {
    Similarity.embDouble(spark, sfDir).limit(10).createOrReplaceTempView("emb_v")
    val n = spark.sql(
      """SELECT a.vec_id, cosine_sim(a.emb, b.emb) AS c
        |FROM emb_v a JOIN emb_v b ON a.vec_id < b.vec_id""".stripMargin)
      .filter(col("c").isNotNull).count()
    assert(n === 45)
  }

  test("null inputs yield null, not a crash") {
    val df = spark.sql(
      """SELECT cosine_sim(CAST(NULL AS ARRAY<DOUBLE>),
        |                  array(CAST(1.0 AS DOUBLE))) AS c""".stripMargin)
    assert(df.collect().head.isNullAt(0))
  }

  test("property: CosineSim matches a plain-Scala reference on random vectors") {
    import org.scalacheck.{Gen, rng}
    import spark.implicits._
    val genPair: Gen[(Seq[Double], Seq[Double])] = for {
      n <- Gen.choose(1, 64)
      a <- Gen.listOfN(n, Gen.choose(-10.0, 10.0))
      b <- Gen.listOfN(n, Gen.choose(-10.0, 10.0))
    } yield (a, b)
    val samples = (0 until 100).flatMap { i =>
      genPair(Gen.Parameters.default, rng.Seed(i.toLong))
    }
    def ref(a: Seq[Double], b: Seq[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      a.indices.foreach { i =>
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i)
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val expected = samples.map { case (a, b) => ref(a, b) }
    val got = samples.toDF("a", "b")
      .select(Funcs.cosineSim(col("a"), col("b"))).as[Double].collect()
    got.zip(expected).zipWithIndex.foreach { case ((g, e), i) =>
      assert(g === e, s"sample $i: kernel=$g reference=$e") // bit-exact
    }
  }

  test("centroid rejects ragged-dimension input with a clear error") {
    import graft.functions.CentroidAgg
    val b2 = CentroidAgg.reduce(CentroidAgg.zero, Seq(1.0, 2.0))
    val err = intercept[IllegalArgumentException] {
      CentroidAgg.reduce(b2, Seq(1.0, 2.0, 3.0))
    }
    assert(err.getMessage.contains("ragged"))
    val b3 = CentroidAgg.reduce(CentroidAgg.zero, Seq(1.0, 2.0, 3.0))
    val merr = intercept[IllegalArgumentException] {
      CentroidAgg.merge(CentroidAgg.reduce(CentroidAgg.zero, Seq(1.0, 2.0)), b3)
    }
    assert(merr.getMessage.contains("ragged"))
  }

  test("self-similarity is exactly 1 for unit-consistent vectors") {
    val e = Similarity.embDouble(spark, sfDir)
    val bad = e.select(Funcs.cosineSim(col("emb"), col("emb")).as("c"))
      .filter(abs(col("c") - 1.0) > 1e-12)
    assert(bad.count() === 0)
  }
}
