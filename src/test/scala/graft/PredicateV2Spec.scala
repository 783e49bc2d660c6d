package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.dynamo.Implicits._

/** V2 `Predicate` pushdown (`SupportsPushDownV2Filters`): predicates
  * the v1 `sources.Filter` family cannot express — column-vs-column
  * comparisons and comparisons over arithmetic — must (a) reach the
  * scan (plan-pinned) and (b) return exactly the rows a
  * pushdown-disabled read computes. Spark does not re-evaluate pushed
  * predicates, so (b) is the correctness law; (a) is what makes the
  * feature real rather than silently declined.
  */
class PredicateV2Spec extends AnyFunSuite {
  import TestSpark._

  private lazy val root: String = {
    val r = Files.createTempDirectory("graft-predv2").toString
    import spark.implicits._
    val rows = (0L until 200L).map { i =>
      (i,
       if (i % 9 == 7) None else Some(i % 13),          // price: long, nullable
       if (i % 7 == 3) None else Some((i % 11).toDouble / 2.0), // cost: double, nullable
       if (i % 5 == 4) None else Some((i % 6).toInt),   // qty: int, nullable
       s"sku${i % 17}")
    }
    rows.toDF("id", "price", "cost", "qty", "sku")
      .write.dynamo(r, "goods", "id")
    r
  }

  private def read(pushdown: Boolean = true): DataFrame =
    spark.read.format("dynamo")
      .option("path", root).option("tableName", "goods")
      .option("filterPushdown", pushdown.toString)
      .load()

  private def ids(df: DataFrame): Seq[Long] =
    df.select("id").collect().map(_.getLong(0)).sorted.toSeq

  test("column-vs-column comparison is pushed as a v2 predicate and stays exact") {
    val q = read().filter(col("price") > col("cost"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedV2Predicates:"), s"v2 predicate not pushed:\n$plan")
    assert(ids(q) == ids(read(pushdown = false).filter(col("price") > col("cost"))))
  }

  test("arithmetic comparison is pushed and stays exact") {
    val p = col("qty") * 2 + 1 > 5
    val q = read().filter(p)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedV2Predicates:"), s"v2 predicate not pushed:\n$plan")
    assert(ids(q) == ids(read(pushdown = false).filter(p)))
  }

  test("mixed OR of a v1-shaped arm and an arithmetic arm pushes whole and stays exact") {
    val p = col("sku") === "sku3" || col("price") - col("qty") >= 8
    val q = read().filter(p)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedV2Predicates:"), s"v2 predicate not pushed:\n$plan")
    assert(ids(q) == ids(read(pushdown = false).filter(p)))
  }

  test("v1-expressible predicates still arrive as v1 filters through the v2 door") {
    val q = read().filter(col("sku") === "sku5" && col("price") > 3)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("EqualTo(sku,sku5)"), plan)
    assert(plan.contains("GreaterThan(price,3)"), plan)
    // and the point of routing them to v1: shard pruning etc. still sees them
    assert(!plan.contains("PushedV2Predicates:") ||
      !plan.contains("sku = sku5"), "v1-shaped predicate leaked into the adv tier")
  }

  test("unsupported shapes stay Spark-side and results are unchanged") {
    // division over integers has mode-dependent semantics → declined
    val p = col("price") % 3 === 1
    val q = read().filter(p)
    assert(ids(q) == ids(read(pushdown = false).filter(p)))
  }

  test("null semantics: arithmetic over a null attribute drops the row, NOT keeps it") {
    // qty null on i %5==4 rows; `NOT (qty*2 > 100)` must not resurrect them
    val p = !(col("qty") * 2 > lit(100))
    val q = read().filter(p)
    assert(ids(q) == ids(read(pushdown = false).filter(p)))
    // sanity: some nulls exist and none survive
    assert(ids(q).nonEmpty)
    assert(ids(q).forall(_ % 5 != 4))
  }

  test("pushed v2 predicates apply below a pushed aggregate") {
    val base = read().filter(col("price") > col("cost"))
    val q = base.agg(count(lit(1)).as("n"), sum("qty").as("sq"))
    val expect = read(pushdown = false).filter(col("price") > col("cost"))
      .agg(count(lit(1)).as("n"), sum("qty").as("sq"))
    assert(q.collect().toSeq == expect.collect().toSeq)
  }

  test("adv tier equivalence sweep: hand-picked v2-only predicates") {
    val preds = Seq(
      col("price") > col("cost"),
      col("price") <= col("cost"),
      col("cost") === col("price"),   // double vs long → cast long→double
      col("qty") + 1 < col("price"),
      -col("qty") < lit(-2),
      col("cost") * 2.0 >= 7.5,
      col("qty") =!= col("price"),
      (col("price") > col("cost")) && col("qty").isNotNull,
      (col("qty") * 3 > 9) || col("sku").startsWith("sku1"))
    val baseline = read(pushdown = false)
    val pushed = read()
    preds.foreach { p =>
      assert(ids(pushed.filter(p)) == ids(baseline.filter(p)), s"diverged on $p")
    }
  }
}
