package graft.queries

import graft.Fixtures
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function inventory (SURVEY.md §2B B-5). Base window:
  * PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey —
  * the tiebreak column makes every ranking deterministic (rule D4).
  *
  * Scale notes: window evaluation shuffles once on the partition key
  * and sorts within partitions; o_custkey is high-cardinality and
  * evenly distributed, so partitions stay balanced at 100 TB.
  * `q_topk_group` (top-k per group) is the rank-then-filter pattern —
  * Spark pushes `rn <= 3` into a WindowGroupLimit physical operator
  * (Spark ≥3.5), so each partition keeps only k rows before the final
  * filter instead of ranking everything.
  */
object Windows {

  private val byPrice = Window.partitionBy("o_custkey")
    .orderBy(col("o_totalprice").desc, col("o_orderkey"))

  val queries: Map[String, Q] = Map(
    "q_win_rownum" -> ((s, dir) =>
      Fixtures.orders(s, dir)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
                row_number().over(byPrice).as("rn"))
        .orderBy("o_custkey", "rn")),

    "q_win_rank" -> ((s, dir) => {
      // Banded price manufactures ties so rank vs dense_rank differ.
      val banded = Fixtures.orders(s, dir)
        .withColumn("band", floor(col("o_totalprice") / 10000.0))
      val w = Window.partitionBy("o_custkey").orderBy(col("band").desc)
      banded.select(col("o_custkey"), col("o_orderkey"), col("band"),
                    rank().over(w).as("rnk"),
                    dense_rank().over(w).as("drnk"))
        .orderBy(col("o_custkey"), col("band").desc, col("o_orderkey"))
    }),

    "q_win_lag_lead" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Fixtures.orders(s, dir)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
                col("o_totalprice"),
                lag("o_totalprice", 1).over(w).as("prev_price"),
                lead("o_totalprice", 1).over(w).as("next_price"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // Running/moving frames aggregate over floor(price) — exact
    // integer accumulation, immune to the engine-specific double
    // summation order (segment tree vs sequential) that makes a
    // round(·,2) of a double frame-sum flake on .005 boundaries
    // (SURVEY.md known-hard #2; observed once on q_win_moving).
    "q_win_running" -> ((s, dir) =>
      Fixtures.orders(s, dir)
        .withColumn("price_i", floor(col("o_totalprice")))
        .select(col("o_custkey"), col("o_orderkey"),
                sum("price_i").over(
                  byPrice.rowsBetween(Window.unboundedPreceding, Window.currentRow))
                  .as("running_sum"))
        .orderBy("o_custkey", "o_orderkey")),

    "q_win_moving" -> ((s, dir) =>
      Fixtures.orders(s, dir)
        .withColumn("price_i", floor(col("o_totalprice")))
        .select(col("o_custkey"), col("o_orderkey"),
                round(avg("price_i").over(byPrice.rowsBetween(-3, 0)), 2)
                  .as("mov_avg"))
        .orderBy("o_custkey", "o_orderkey")),

    "q_topk_group" -> ((s, dir) =>
      Fixtures.orders(s, dir)
        .withColumn("rn", row_number().over(byPrice))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_custkey", "rn")),

    // RANGE frame: single numeric ORDER BY column (frames are
    // value-based, peers included — deterministic without a tiebreak).
    "q_win_range_frame" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice"))
        .rangeBetween(-100000L, 0L)
      Fixtures.orders(s, dir)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
                count(lit(1)).over(w).as("n_in_range"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    "q_win_ntile" -> ((s, dir) =>
      Fixtures.orders(s, dir)
        .select(col("o_custkey"), col("o_orderkey"),
                ntile(4).over(byPrice).as("quartile"))
        .orderBy("o_custkey", "o_orderkey")),

    // Full-partition frame so last_value sees the whole partition (the
    // default frame would make it the current row).
    "q_win_firstlast" -> ((s, dir) => {
      val full = byPrice.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Fixtures.orders(s, dir)
        .select(col("o_custkey"), col("o_orderkey"),
                first("o_orderkey").over(full).as("best_order"),
                last("o_orderkey").over(full).as("worst_order"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    "q_win_pct" -> ((s, dir) =>
      Fixtures.orders(s, dir)
        .select(col("o_custkey"), col("o_orderkey"),
                round(percent_rank().over(byPrice), 4).as("pct_rank"),
                round(cume_dist().over(byPrice), 4).as("cume"))
        .orderBy("o_custkey", "o_orderkey")),

    // nth_value + defaulted lag: the runner-up order per customer
    // (full-partition frame — the default frame would hide it until
    // row 2) and the previous order's price with a sentinel default.
    // Same single per-customer sort as the rest of the family.
    "q_win_nth" -> ((s, dir) => {
      val full = byPrice.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Fixtures.orders(s, dir)
        .select(col("o_custkey"), col("o_orderkey"),
                nth_value(col("o_orderkey"), 2).over(full).as("runner_up"),
                lag(col("o_totalprice"), 1, -1.0).over(byPrice).as("prev_price"))
        .orderBy("o_custkey", "o_orderkey")
    }))

  val oracle: Map[String, String] = Map(
    "q_win_rownum" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |       row_number() OVER (PARTITION BY o_custkey
        |                          ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |FROM orders ORDER BY o_custkey, rn""".stripMargin,
    "q_win_rank" ->
      """WITH banded AS (
        |  SELECT o_custkey, o_orderkey,
        |         CAST(floor(o_totalprice / 10000.0) AS BIGINT) AS band
        |  FROM orders)
        |SELECT o_custkey, o_orderkey, band,
        |       rank() OVER (PARTITION BY o_custkey ORDER BY band DESC) AS rnk,
        |       dense_rank() OVER (PARTITION BY o_custkey ORDER BY band DESC) AS drnk
        |FROM banded ORDER BY o_custkey, band DESC, o_orderkey""".stripMargin,
    "q_win_lag_lead" ->
      """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
        |       lag(o_totalprice, 1) OVER w AS prev_price,
        |       lead(o_totalprice, 1) OVER w AS next_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_win_running" ->
      """SELECT o_custkey, o_orderkey,
        |       CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) OVER (
        |         PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_sum
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_win_moving" ->
      """SELECT o_custkey, o_orderkey,
        |       round(avg(CAST(floor(o_totalprice) AS BIGINT)) OVER (
        |         PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
        |         ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 2) AS mov_avg
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_topk_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "q_win_range_frame" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |       count(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
        |         RANGE BETWEEN 100000 PRECEDING AND CURRENT ROW) AS n_in_range
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_win_ntile" ->
      """SELECT o_custkey, o_orderkey,
        |       CAST(ntile(4) OVER (PARTITION BY o_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS quartile
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_win_firstlast" ->
      """SELECT o_custkey, o_orderkey,
        |       first_value(o_orderkey) OVER w AS best_order,
        |       last_value(o_orderkey) OVER w AS worst_order
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |             ORDER BY o_totalprice DESC, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_win_pct" ->
      """SELECT o_custkey, o_orderkey,
        |       round(percent_rank() OVER w, 4) AS pct_rank,
        |       round(cume_dist() OVER w, 4) AS cume
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_win_nth" ->
      """SELECT o_custkey, o_orderkey,
        |       nth_value(o_orderkey, 2) OVER wf AS runner_up,
        |       lag(o_totalprice, 1, -1.0) OVER w AS prev_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |             ORDER BY o_totalprice DESC, o_orderkey),
        |       wf AS (PARTITION BY o_custkey
        |              ORDER BY o_totalprice DESC, o_orderkey
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin)
}
