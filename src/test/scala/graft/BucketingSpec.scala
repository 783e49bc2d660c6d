package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed co-located join: pre-hashing both tables into the same
  * bucket layout on the join key removes BOTH shuffles from every
  * subsequent join on that key — at 100 TB this turns the dominant
  * repeated cost (re-shuffling a fact table per join) into a one-time
  * write cost. The spec pins the contract: the bucketed join plan has
  * NO hash-partitioning exchange, and results equal the plain join.
  */
class BucketingSpec extends AnyFunSuite {
  import TestSpark._

  test("joins on the bucket key run shuffle-free and match the plain join") {
    val o = Fixtures.orders(spark, sf)
    val c = Fixtures.customer(spark, sf)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    o.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("b_orders")
    c.write.bucketBy(8, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable("b_customer")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force SMJ so the exchange-elision is what we observe, not a broadcast
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("b_orders")
        .join(spark.table("b_customer"), col("o_custkey") === col("c_custkey"))
        .select("o_orderkey", "c_custkey", "o_totalprice")
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")

      val expected = o.join(c, o("o_custkey") === c("c_custkey"))
        .select("o_orderkey", "c_custkey", "o_totalprice")
      assert(j.count() === expected.count())
      assert(j.exceptAll(expected).count() === 0)
      assert(expected.exceptAll(j).count() === 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }
}
