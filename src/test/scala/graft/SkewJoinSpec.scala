package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The skew-join playbook against a DELIBERATELY hot key, pinning why
  * `q_join_salted` exists: AQE's skew-join splits oversized map-side
  * partitions, but every row of one hot KEY still hashes to one
  * reducer — only salting actually splits a hot key. The invariants
  * that make salting safe at 100 TB:
  *   1. results are IDENTICAL to the plain join (salt is invisible),
  *   2. the hot key's rows really do land in multiple join partitions.
  */
class SkewJoinSpec extends AnyFunSuite {
  import TestSpark._

  // 50k-row fact, 90% of it on one hot key; 100-key dimension.
  private def skewed() = {
    import spark.implicits._
    val fact = spark.range(50000).select(
      when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id") % 100).as("k"),
      (col("id") % 1000).as("v"))
    val dim = spark.range(100).select(col("id").as("k"), concat(lit("d"), col("id")).as("name"))
    (fact, dim)
  }

  test("salting preserves the plain join's aggregate exactly") {
    val (fact, dim) = skewed()
    val salt = 8
    val plain = fact.join(dim, "k")
      .groupBy("name").agg(count(lit(1)).as("n"), sum("v").as("sv"))
    val salted = fact
      .withColumn("salt", pmod(col("v"), lit(salt)).cast("int"))
      .join(dim.withColumn("salt", explode(lit((0 until salt).toArray))),
        Seq("k", "salt"))
      .groupBy("name").agg(count(lit(1)).as("n"), sum("v").as("sv"))
    val p = plain.orderBy("name").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val s = salted.orderBy("name").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(s.toSeq === p.toSeq)
    // the hot key dominates: sanity that the fixture is actually skewed
    assert(p.find(_._1 == "d7").map(_._2).contains(45000L))
  }

  test("salting spreads a hot key over multiple join partitions; plain hashing does not") {
    val (fact, dim) = skewed()
    val salt = 8
    // disable broadcast so the join actually shuffles on the key — the
    // regime where a hot key pins one reducer — and AQE coalescing,
    // which at this toy size would legitimately merge ALL reducers
    // into one and hide the partition spread being asserted
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.shuffle.partitions")
    val prev = keys.map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try {
      def hotPartitions(joined: org.apache.spark.sql.DataFrame): Long =
        joined.filter(col("k") === 7L)
          .select(org.apache.spark.sql.functions.spark_partition_id().as("pid"))
          .distinct().count()
      val plainParts = hotPartitions(fact.join(dim, "k"))
      val saltedParts = hotPartitions(
        fact.withColumn("salt", pmod(col("v"), lit(salt)).cast("int"))
          .join(dim.withColumn("salt", explode(lit((0 until salt).toArray))),
            Seq("k", "salt")))
      assert(plainParts === 1L, "plain hash partitioning puts a hot key in one reducer")
      // (k, salt) hashes can collide across reducers, so the exact
      // count may fall short of `salt`; materially spread is the claim
      assert(saltedParts > 2L,
        s"salted join should spread the hot key over multiple partitions, got $saltedParts")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
