package graft.queries

import graft.Fixtures
import org.apache.spark.sql.functions._

/** Sorts / limits (B-6) and set operations (B-7).
  *
  * Scale notes: `orderBy().limit(k)` lowers to
  * TakeOrderedAndProjectExec — per-partition top-k then a driver merge
  * of k·partitions rows, never a full global sort; this is the shape
  * that survives 100 TB. The full sort in `q_sort_multi` uses Spark's
  * range-partitioned sort (sampling-based boundaries → balanced
  * partitions). Set ops lower to hash aggregate (distinct) / union;
  * `intersect`/`except` shuffle on the full row, which is fine here
  * because inputs are single-column key sets.
  */
object SetSortOps {

  val queries: Map[String, Q] = Map(
    "q_sort_multi" -> ((s, dir) =>
      Fixtures.lineitem(s, dir)
        .select("l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice")
        .orderBy(col("l_returnflag"), col("l_extendedprice").desc,
                 col("l_orderkey"), col("l_linenumber"))
        .limit(1000)),

    "q_sort_limit" -> ((s, dir) =>
      Fixtures.orders(s, dir)
        .select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)),

    // Rows 101–200 of the same global order (Spark ≥3.4 offset).
    "q_sort_offset" -> ((s, dir) =>
      Fixtures.orders(s, dir)
        .select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .offset(100)
        .limit(100)),

    "q_union_all" -> ((s, dir) => {
      val o = Fixtures.orders(s, dir)
      o.filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
        .unionAll(o.filter(col("o_totalprice") > 300000.0).select("o_orderkey"))
        .orderBy("o_orderkey")
    }),

    "q_union_distinct" -> ((s, dir) => {
      val o = Fixtures.orders(s, dir)
      o.filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
        .union(o.filter(col("o_totalprice") > 300000.0).select("o_orderkey"))
        .distinct()
        .orderBy("o_orderkey")
    }),

    "q_intersect" -> ((s, dir) => {
      val o = Fixtures.orders(s, dir)
      o.filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
        .intersect(o.filter(col("o_orderpriority") === "5-LOW").select("o_custkey"))
        .orderBy("o_custkey")
    }),

    "q_except" -> ((s, dir) => {
      val o = Fixtures.orders(s, dir)
      o.select("o_custkey")
        .except(o.filter(col("o_orderpriority") === "1-URGENT").select("o_custkey"))
        .orderBy("o_custkey")
    }),

    // Wide→long reshape (Dataset.unpivot, Spark ≥3.4): one output row
    // per (id, measure) pair — a map-side Expand, no shuffle.
    "q_unpivot" -> ((s, dir) =>
      Fixtures.lineitem(s, dir).filter(col("l_orderkey") < 100)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_tax")
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_discount"), col("l_tax")),
          "metric", "value")
        // "value" tie-break: duplicate (l_orderkey, l_linenumber)
        // pairs exist in the fixture, so the order must be total
        .orderBy("l_orderkey", "l_linenumber", "metric", "value")))

  val oracle: Map[String, String] = Map(
    "q_unpivot" ->
      """WITH l AS (SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_tax
        |           FROM lineitem WHERE l_orderkey < 100)
        |SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS value FROM l
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM l
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM l
        |ORDER BY l_orderkey, l_linenumber, metric, value""".stripMargin,
    "q_sort_multi" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_extendedprice
        |FROM lineitem
        |ORDER BY l_returnflag, l_extendedprice DESC, l_orderkey, l_linenumber
        |LIMIT 1000""".stripMargin,
    "q_sort_limit" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "q_sort_offset" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100 OFFSET 100""".stripMargin,
    "q_union_all" ->
      """SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |UNION ALL
        |SELECT o_orderkey FROM orders WHERE o_totalprice > 300000.0
        |ORDER BY o_orderkey""".stripMargin,
    "q_union_distinct" ->
      """SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |UNION
        |SELECT o_orderkey FROM orders WHERE o_totalprice > 300000.0
        |ORDER BY o_orderkey""".stripMargin,
    "q_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
        |ORDER BY o_custkey""".stripMargin,
    "q_except" ->
      """SELECT o_custkey FROM orders
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |ORDER BY o_custkey""".stripMargin)
}
