package graft

import graft.functions.{Funcs, GraftExtensions}
import graft.queries.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the custom codegen `CosineSim` expression: bit-equality
  * with the higher-order-function kernel (which the DuckDB oracle
  * already validates), SQL registration via GraftExtensions, null
  * semantics, and presence inside a codegen'd plan.
  */
class FunctionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val spark: SparkSession = {
    // withExtensions covers the fresh-session path; Funcs.register
    // covers the case where getOrCreate returns a session another
    // suite already started in this JVM.
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-functions-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    Funcs.register(s)
    s
  }

  override def afterAll(): Unit = spark.stop()

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

  test("cosine_sim is callable from SQL via GraftExtensions") {
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

  test("self-similarity is exactly 1 for unit-consistent vectors") {
    val e = Similarity.embDouble(spark, sfDir)
    val bad = e.select(Funcs.cosineSim(col("emb"), col("emb")).as("c"))
      .filter(abs(col("c") - 1.0) > 1e-12)
    assert(bad.count() === 0)
  }
}
