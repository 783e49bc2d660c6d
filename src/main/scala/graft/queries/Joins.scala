package graft.queries

import graft.Fixtures
import org.apache.spark.sql.functions._

/** Join inventory (SURVEY.md §2B B-3).
  *
  * Scale notes: equi-joins on keys shuffle both sides on the join key
  * (sort-merge) unless one side is broadcast-able — `q_join_broadcast`
  * pins `broadcast()` explicitly for the dimension-table shape
  * (region is 5 rows; at 100 TB it is still 5 rows, so the broadcast
  * eliminates the shuffle entirely). The orders⋈customer joins keep
  * both sides declarative so AQE can downgrade to broadcast when the
  * build side measures small at runtime. Semi/anti joins ship only
  * the key column of the filtering side.
  */
object Joins {

  val queries: Map[String, Q] = Map(
    "q_join_inner" -> ((s, dir) => {
      val o = Fixtures.orders(s, dir)
      val c = Fixtures.customer(s, dir)
      o.join(c, o("o_custkey") === c("c_custkey"), "inner")
        .select("o_orderkey", "c_custkey", "c_mktsegment", "o_totalprice")
        .orderBy("o_orderkey")
    }),

    "q_join_broadcast" -> ((s, dir) => {
      val n = Fixtures.nation(s, dir)
      val r = Fixtures.region(s, dir)
      n.join(broadcast(r), n("n_regionkey") === r("r_regionkey"), "inner")
        .select("n_nationkey", "n_name", "r_name")
        .orderBy("n_nationkey")
    }),

    "q_join_left" -> ((s, dir) => {
      val c = Fixtures.customer(s, dir)
      val o = Fixtures.orders(s, dir)
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .select("c_custkey", "o_orderkey", "o_totalprice")
        .orderBy(col("c_custkey"), col("o_orderkey").asc_nulls_first)
    }),

    "q_join_semi" -> ((s, dir) => {
      val c = Fixtures.customer(s, dir)
      val urgent = Fixtures.orders(s, dir).filter(col("o_orderpriority") === "1-URGENT")
      c.join(urgent, c("c_custkey") === urgent("o_custkey"), "left_semi")
        .orderBy("c_custkey")
    }),

    "q_join_anti" -> ((s, dir) => {
      val c = Fixtures.customer(s, dir)
      val big = Fixtures.orders(s, dir).filter(col("o_totalprice") > 400000.0)
      c.join(big, c("c_custkey") === big("o_custkey"), "left_anti")
        .orderBy("c_custkey")
    }))

  val oracle: Map[String, String] = Map(
    "q_join_inner" ->
      """SELECT o_orderkey, c_custkey, c_mktsegment, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,
    "q_join_broadcast" ->
      """SELECT n_nationkey, n_name, r_name
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |ORDER BY n_nationkey""".stripMargin,
    "q_join_left" ->
      """SELECT c_custkey, o_orderkey, o_totalprice
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |ORDER BY c_custkey, o_orderkey ASC NULLS FIRST""".stripMargin,
    "q_join_semi" ->
      """SELECT * FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c.c_custkey
        |                AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "q_join_anti" ->
      """SELECT * FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c.c_custkey
        |                    AND o_totalprice > 400000.0)
        |ORDER BY c_custkey""".stripMargin)
}
