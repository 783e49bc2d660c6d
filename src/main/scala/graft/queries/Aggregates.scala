package graft.queries

import graft.Fixtures
import org.apache.spark.sql.functions._

/** Aggregation inventory (SURVEY.md §2B B-4).
  *
  * Scale notes: every query here is a `groupBy().agg()` over built-in
  * aggregate functions, which Spark executes as partial (map-side)
  * HashAggregate → shuffle on the grouping keys → final HashAggregate.
  * Group cardinalities are tiny (≤ thousands), so the shuffle moves
  * only pre-aggregated partials — this is the plan shape that survives
  * a 100 TB scan. `countDistinct` is the exception (expands rows and
  * shuffles distinct pairs); acceptable because its key space
  * (event_type × user_id) is bounded; for unbounded key spaces use
  * `approx_count_distinct` (q_agg_approx_distinct).
  */
object Aggregates {

  val queries: Map[String, Q] = Map(
    // Flagship: TPC-H-Q1-style pricing summary.
    "q_agg_group" -> ((s, dir) => {
      Fixtures.lineitem(s, dir)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg("l_quantity"), 2).as("avg_qty"),
          round(avg("l_extendedprice"), 2).as("avg_price"),
          round(avg("l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    "q_agg_global" -> ((s, dir) => {
      Fixtures.lineitem(s, dir).agg(
        count(lit(1)).as("cnt"),
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(avg("l_extendedprice"), 2).as("avg_price"),
        round(min("l_discount"), 4).as("min_disc"),
        round(max("l_tax"), 4).as("max_tax"))
    }),

    "q_agg_count_distinct" -> ((s, dir) => {
      Fixtures.events(s, dir)
        .groupBy("event_type")
        .agg(countDistinct("user_id").as("n_users"))
        .orderBy("event_type")
    }),

    // Mergeable sketch rollup — THE 100 TB distinct-count pattern: a
    // daily rollup persists one small DataSketches HLL per
    // (type, day); "distinct users per type over any day range" is
    // then answered by UNIONING sketches, never rescanning raw
    // events. Sketch bytes are merge-associative, so both levels fold
    // map-side like any algebraic aggregate and the rollup stays
    // incremental (append tomorrow's sketches, union again).
    // Sketch-valued ⇒ no SQL oracle (like q_agg_approx_distinct);
    // QueriesSpec bands the estimate against the exact count.
    "q_agg_sketch_union" -> ((s, dir) =>
      Fixtures.events(s, dir)
        .withColumn("day", to_date(col("ts")))
        .groupBy("event_type", "day")
        .agg(hll_sketch_agg(col("user_id")).as("sk"))
        .groupBy("event_type")
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx_users"))
        .orderBy("event_type")),

    "q_agg_rollup" -> ((s, dir) => {
      Fixtures.lineitem(s, dir)
        .rollup("l_returnflag", "l_linestatus")
        .agg(round(sum("l_quantity"), 2).as("sum_qty"),
             count(lit(1)).as("cnt"))
        // Null grouping keys → sentinel so both engines sort identically.
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("status"),
          col("sum_qty"), col("cnt"))
        .orderBy("flag", "status")
    }),

    "q_agg_cube" -> ((s, dir) => {
      Fixtures.lineitem(s, dir)
        .cube("l_returnflag", "l_linestatus")
        .agg(round(sum("l_quantity"), 2).as("sum_qty"),
             count(lit(1)).as("cnt"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("status"),
          col("sum_qty"), col("cnt"))
        .orderBy("flag", "status")
    }),

    // GROUPING SETS is SQL-only surface in Spark; grouping_id() keeps
    // the (flag) / (status) / () result shapes distinguishable.
    "q_agg_grouping_sets" -> ((s, dir) => {
      Fixtures.lineitem(s, dir).createOrReplaceTempView("lineitem_gs")
      s.sql(
        """SELECT coalesce(l_returnflag, 'ALL') AS flag,
          |       coalesce(l_linestatus, 'ALL') AS status,
          |       CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT) AS gid,
          |       round(sum(l_quantity), 2) AS sum_qty,
          |       count(1) AS cnt
          |FROM lineitem_gs
          |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
          |ORDER BY gid, flag, status""".stripMargin)
    }),

    // List-valued outputs are cross-engine-fragile in parquet compare
    // (SURVEY.md known-hard #3), so the sorted list is emitted as a
    // joined string — same information, stable hash.
    "q_agg_collect" -> ((s, dir) => {
      Fixtures.lineitem(s, dir)
        .filter(col("l_orderkey") < 400)
        .groupBy("l_orderkey")
        .agg(array_join(
               transform(array_sort(collect_list(col("l_linenumber"))),
                         _.cast("string")), ",").as("linenumbers"))
        .orderBy("l_orderkey")
    }),

    // HLL++ sketch — engine-specific values, so no DuckDB oracle
    // (rule D3); AggregatesSpec asserts ±5% of exact instead.
    // EXACT distinct at scale via bucketed bitmaps: ids hash into
    // 32k-bit buckets (`bitmap_bucket_number`), each (group, bucket)
    // folds to ONE 4 KB bitmap map-side (`bitmap_construct_agg`), and
    // the per-group popcount sum is the exact distinct count. Where
    // `count(DISTINCT)` shuffles every distinct VALUE, this shuffles
    // one bitmap per (group, bucket) — the exact-count counterpart of
    // the HLL sketch, and the pattern that keeps exact user counts
    // feasible over 100 TB of events. Oracled against plain
    // COUNT(DISTINCT): the bitmap path must agree exactly.
    "q_agg_bitmap_distinct" -> ((s, dir) =>
      Fixtures.events(s, dir)
        .groupBy(col("event_type"),
          expr("bitmap_bucket_number(user_id)").as("bkt"))
        .agg(expr("bitmap_construct_agg(bitmap_bit_position(user_id))").as("bm"))
        .groupBy("event_type")
        .agg(sum(expr("bitmap_count(bm)")).cast("long").as("n_users"))
        .orderBy("event_type")),

    "q_agg_approx_distinct" -> ((s, dir) => {
      Fixtures.events(s, dir)
        .groupBy("event_type")
        .agg(approx_count_distinct("user_id").as("approx_users"))
        .orderBy("event_type")
    }),

    // Approximate percentiles (Greenwald-Khanna sketch,
    // `approx_percentile`) — the 100 TB path: the exact `percentile`
    // buffers EVERY group value in one aggregation buffer (fine at
    // bench scale, impossible at corpus scale), while the sketch is
    // fixed-size per group, merges associatively map-side, and bounds
    // rank error by 1/accuracy. Banded against the exact result in
    // QueriesSpec (sketch-valued → no portable oracle).
    "q_agg_approx_percentile" -> ((s, dir) =>
      Fixtures.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(expr(
          "approx_percentile(l_extendedprice, array(0.25D, 0.5D, 0.95D), 10000)")
          .as("pcts"))
        .select(col("l_returnflag"),
          round(element_at(col("pcts"), 1), 4).as("p25"),
          round(element_at(col("pcts"), 2), 4).as("p50"),
          round(element_at(col("pcts"), 3), 4).as("p95"))
        .orderBy("l_returnflag")),

    // Exact percentiles (sort-based, linear interpolation — identical
    // definition in Spark `percentile` and DuckDB `quantile_cont`).
    // The array result is unpacked to scalar columns: list-valued
    // outputs are fragile in cross-engine parquet compare (known-hard
    // #3), three doubles are not.
    "q_agg_percentile" -> ((s, dir) =>
      Fixtures.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(expr("percentile(l_extendedprice, array(0.25D, 0.5D, 0.95D))")
          .as("pcts"))
        .select(col("l_returnflag"),
          round(element_at(col("pcts"), 1), 4).as("p25"),
          round(element_at(col("pcts"), 2), 4).as("p50"),
          round(element_at(col("pcts"), 3), 4).as("p95"))
        .orderBy("l_returnflag")),

    // Per-group mode (most frequent value), tie → lexicographically
    // smallest — NOT the built-in `mode()`, whose tie-break is
    // engine-dependent; the two-level aggregate with an explicit rank
    // is deterministic on both engines and is the same two-shuffle
    // shape at any scale (first keyed by (group, value), then by
    // group).
    "q_agg_mode" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      Fixtures.orders(s, dir)
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("cnt"))
        .withColumn("rk", row_number().over(
          Window.partitionBy("o_orderstatus")
            .orderBy(col("cnt").desc, col("o_orderpriority"))))
        .filter(col("rk") === 1)
        .select(col("o_orderstatus"),
          col("o_orderpriority").as("mode_priority"), col("cnt"))
        .orderBy("o_orderstatus")
    }),

    // Statistical aggregate family. Both engines use numerically
    // stable one-pass algorithms; rounding absorbs the last-ulp
    // differences (rule D2).
    "q_agg_stats" -> ((s, dir) =>
      Fixtures.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
          round(var_samp(col("l_quantity")), 4).as("var_qty"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qp"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2)
            .as("covar_qp"))
        .orderBy("l_returnflag")),

    // Linear-regression aggregate family (regr_*): slope/intercept/R²
    // of extendedprice over quantity per return flag — one-pass
    // moment accumulation like the other stats, so still a single
    // partial+final hash aggregate; rounding absorbs last-ulp
    // differences (rule D2).
    "q_agg_regr" -> ((s, dir) =>
      Fixtures.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(round(regr_slope(col("l_extendedprice"), col("l_quantity")), 4).as("slope"),
          round(regr_intercept(col("l_extendedprice"), col("l_quantity")), 4).as("intercept"),
          round(regr_r2(col("l_extendedprice"), col("l_quantity")), 6).as("r2"),
          regr_count(col("l_extendedprice"), col("l_quantity")).as("n"))
        .orderBy("l_returnflag")),

    // Pivot: one output column per pinned pivot value (explicit value
    // list = deterministic schema; letting Spark scan for values would
    // be an extra pass AND nondeterministic column order).
    "q_pivot" -> ((s, dir) =>
      Fixtures.lineitem(s, dir)
        .groupBy("l_linestatus")
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(round(sum("l_quantity"), 2))
        .na.fill(0.0, Seq("A", "N", "R"))
        .orderBy("l_linestatus")),

    "q_agg_having" -> ((s, dir) => {
      val o = Fixtures.orders(s, dir)
      val c = Fixtures.customer(s, dir)
      o.join(c, o("o_custkey") === c("c_custkey"))
        .groupBy("c_mktsegment")
        // HAVING on the *unrounded* sum, exactly like the oracle SQL —
        // filtering the rounded value flips rows near the boundary.
        .agg(sum("o_totalprice").as("raw_total"),
             count(lit(1)).as("n_orders"))
        .filter(col("raw_total") > 3e8)
        .select(col("c_mktsegment"),
                round(col("raw_total"), 2).as("total_price"),
                col("n_orders"))
        .orderBy("c_mktsegment")
    }))

  val oracle: Map[String, String] = Map(
    "q_agg_percentile" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
        |  round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
        |  round(quantile_cont(l_extendedprice, 0.95), 4) AS p95
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_agg_mode" ->
      """SELECT o_orderstatus, o_orderpriority AS mode_priority, cnt FROM (
        |  SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
        |         row_number() OVER (PARTITION BY o_orderstatus
        |                            ORDER BY count(*) DESC, o_orderpriority) AS rk
        |  FROM orders GROUP BY o_orderstatus, o_orderpriority)
        |WHERE rk = 1 ORDER BY o_orderstatus""".stripMargin,
    "q_agg_stats" ->
      """SELECT l_returnflag,
        |  round(stddev_samp(l_quantity), 4) AS sd_qty,
        |  round(var_samp(l_quantity), 4) AS var_qty,
        |  round(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
        |  round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qp
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_agg_regr" ->
      """SELECT l_returnflag,
        |  round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
        |  round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
        |  round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
        |  CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_pivot" ->
      """SELECT l_linestatus,
        |  coalesce(round(sum(CASE WHEN l_returnflag = 'A' THEN l_quantity END), 2), 0.0) AS A,
        |  coalesce(round(sum(CASE WHEN l_returnflag = 'N' THEN l_quantity END), 2), 0.0) AS N,
        |  coalesce(round(sum(CASE WHEN l_returnflag = 'R' THEN l_quantity END), 2), 0.0) AS R
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
    "q_agg_group" ->
      """SELECT l_returnflag, l_linestatus,
        |       round(sum(l_quantity), 2) AS sum_qty,
        |       round(sum(l_extendedprice), 2) AS sum_base_price,
        |       round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
        |       round(avg(l_quantity), 2) AS avg_qty,
        |       round(avg(l_extendedprice), 2) AS avg_price,
        |       round(avg(l_discount), 4) AS avg_disc,
        |       count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_agg_global" ->
      """SELECT count(*) AS cnt, round(sum(l_quantity), 2) AS sum_qty,
        |       round(avg(l_extendedprice), 2) AS avg_price,
        |       round(min(l_discount), 4) AS min_disc,
        |       round(max(l_tax), 4) AS max_tax
        |FROM lineitem""".stripMargin,
    "q_agg_count_distinct" ->
      """SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // the bitmap path must agree exactly with plain COUNT(DISTINCT)
    "q_agg_bitmap_distinct" ->
      """SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_agg_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS flag,
        |       coalesce(l_linestatus, 'ALL') AS status,
        |       round(sum(l_quantity), 2) AS sum_qty, count(*) AS cnt
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY flag, status""".stripMargin,
    "q_agg_having" ->
      """SELECT c_mktsegment, round(sum(o_totalprice), 2) AS total_price,
        |       count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment HAVING sum(o_totalprice) > 3e8
        |ORDER BY c_mktsegment""".stripMargin,
    "q_agg_cube" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS flag,
        |       coalesce(l_linestatus, 'ALL') AS status,
        |       round(sum(l_quantity), 2) AS sum_qty, count(*) AS cnt
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY flag, status""".stripMargin,
    "q_agg_grouping_sets" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS flag,
        |       coalesce(l_linestatus, 'ALL') AS status,
        |       CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT) AS gid,
        |       round(sum(l_quantity), 2) AS sum_qty,
        |       count(*) AS cnt
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY gid, flag, status""".stripMargin,
    "q_agg_collect" ->
      """SELECT l_orderkey,
        |       array_to_string(list_sort(list(l_linenumber)), ',') AS linenumbers
        |FROM lineitem WHERE l_orderkey < 400
        |GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin)
}
