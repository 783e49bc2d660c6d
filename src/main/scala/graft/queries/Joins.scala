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
    }),

    "q_join_right" -> ((s, dir) => {
      val o = Fixtures.orders(s, dir)
      val c = Fixtures.customer(s, dir)
      o.join(c, o("o_custkey") === c("c_custkey"), "right")
        .select("c_custkey", "o_orderkey", "o_totalprice")
        .orderBy(col("c_custkey"), col("o_orderkey").asc_nulls_first)
    }),

    // Filtered sides manufacture unmatched rows on both ends; the join
    // output is aggregated to per-side counts (stable single row).
    "q_join_full" -> ((s, dir) => {
      val o = Fixtures.orders(s, dir).filter(col("o_totalprice") > 300000.0)
        .select("o_orderkey")
      val l = Fixtures.lineitem(s, dir).filter(col("l_quantity") > 45.0)
        .select("l_orderkey", "l_linenumber")
      o.join(l, o("o_orderkey") === l("l_orderkey"), "full")
        .agg(count(lit(1)).as("n_rows"),
             count("o_orderkey").as("n_left"),
             count("l_orderkey").as("n_right"))
    }),

    "q_join_cross" -> ((s, dir) =>
      Fixtures.region(s, dir).crossJoin(Fixtures.nation(s, dir))
        .select("r_name", "n_name")
        .orderBy("r_name", "n_name")),

    // Equi key + non-equi residual: sort-merge on nationkey, the
    // s_acctbal > c_acctbal predicate filters within each key group —
    // never a full cartesian product at any scale. Scale note: the
    // equi key has only ~25 distinct values, and the per-group work is
    // inherently QUADRATIC (every supplier×customer pair within a
    // nation is examined) — that cost is the query's semantics, the
    // oracle pays it identically, and no plan choice removes it. At
    // 100 TB this shape needs either a coarser residual pre-filter or
    // the banded-bucket rewrite q_join_band demonstrates; for skew in
    // the ~25-reducer layout, the salting pattern q_join_salted
    // demonstrates (SkewJoinSpec) applies as-is.
    "q_join_theta" -> ((s, dir) => {
      val sup = Fixtures.supplier(s, dir)
      val c = Fixtures.customer(s, dir)
      sup.join(c, sup("s_nationkey") === c("c_nationkey") &&
                  sup("s_acctbal") > c("c_acctbal"))
        .groupBy(col("s_nationkey").as("nationkey"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy("nationkey")
    }),

    // As-of join: for each purchase event, the latest click of the
    // same user with click.ts <= purchase.ts. Spark has no native
    // batch as-of; the scalable formulation is a tagged union + one
    // window pass (single shuffle on user_id — no inequality join, no
    // per-row probe), which is how an as-of join should be executed at
    // 100 TB when the right side fits the same partitioning.
    "q_join_asof" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = Fixtures.events(s, dir)
        .filter(col("event_type").isin("click", "purchase"))
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
                when(col("event_type") === "click", col("ts")).as("click_ts"))
      // Clicks sort before purchases at equal ts (as-of is inclusive).
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), when(col("event_type") === "click", 0).otherwise(1),
                 col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev.withColumn("asof_click_ts", last("click_ts", ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .select("user_id", "event_id", "ts", "asof_click_ts")
        .orderBy("user_id", "event_id")
    }),

    // FORWARD as-of (outcome labeling): each click pairs with the
    // same user's NEXT purchase at-or-after it — the
    // feature-timestamp → outcome lookup that builds training labels
    // without leaking the past. Same single keyed-window shape as the
    // backward as-of, mirrored frame (currentRow .. unboundedFollowing
    // with first/ignoreNulls) AND mirrored tie-break: clicks sort
    // before purchases at equal ts, so an equal-ts purchase sits at or
    // after the click's row position and the inclusive p.ts >= c.ts
    // bound holds.
    "q_join_asof_fwd" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = Fixtures.events(s, dir)
        .filter(col("event_type").isin("click", "purchase"))
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
                when(col("event_type") === "purchase", col("ts")).as("purch_ts"))
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), when(col("event_type") === "purchase", 1).otherwise(0),
                 col("event_id"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      ev.withColumn("next_purchase_ts", first("purch_ts", ignoreNulls = true).over(w))
        .filter(col("event_type") === "click")
        .select("user_id", "event_id", "ts", "next_purchase_ts")
        .orderBy("user_id", "event_id")
    }),

    // Self-join: line-number pairs within an order, counted per order.
    "q_join_self" -> ((s, dir) => {
      val l = Fixtures.lineitem(s, dir).filter(col("l_orderkey") < 1000)
        .select("l_orderkey", "l_linenumber")
      val l1 = l.select(col("l_orderkey").as("k"), col("l_linenumber").as("ln1"))
      val l2 = l.select(col("l_orderkey").as("k2"), col("l_linenumber").as("ln2"))
      l1.join(l2, col("k") === col("k2") && col("ln1") < col("ln2"))
        .groupBy(col("k").as("o_orderkey"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy("o_orderkey")
    }),

    // Salted skew join: the manual remedy when one join key dominates
    // (AQE skew-join splits map partitions, but a single hot KEY still
    // lands in one reducer — salting is what actually splits it). The
    // fact side gets a deterministic salt from its own row id; the
    // dimension side is replicated SALT× via explode, so the join key
    // becomes (key, salt) and a hot key spreads over SALT reducers.
    // The oracle is the PLAIN join aggregate — salting must be
    // invisible in the result, and that invariant is exactly what the
    // hash-compare proves.
    "q_join_salted" -> ((s, dir) => {
      val salt = 8
      val o = Fixtures.orders(s, dir)
        .withColumn("salt", pmod(col("o_orderkey"), lit(salt)).cast("int"))
      val c = Fixtures.customer(s, dir)
        .withColumn("salt", explode(lit((0 until salt).toArray)))
      o.join(c, o("o_custkey") === c("c_custkey") && o("salt") === c("salt"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          round(sum("o_totalprice"), 2).as("total"))
        .orderBy("c_mktsegment")
    }),

    // Bucketed band join — the scale form of a time-interval join
    // (click within 30 min after a view, per user). Spark plans a raw
    // band predicate as a nested-loop join; bucketing event time into
    // band-width buckets turns it into an EQUI-join on (user, bucket):
    // each view probes its own bucket and the next (a 30-min band can
    // span at most two 30-min buckets), and the exact band predicate
    // filters residually. Cost drops from |views|×|clicks| per user to
    // bucket-local pairs — the same pigeonhole move the simhash
    // chunk-join uses, applied to time.
    "q_join_band" -> ((s, dir) => {
      val bandUs = 1800000000L // 30 min in microseconds
      val e = Fixtures.events(s, dir).filter(col("user_id") < 50)
        .select(col("event_id"), col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("tus"))
      val bkt = floor(col("tus") / bandUs).cast("long")
      val v = e.filter(col("event_type") === "view")
        .select(col("event_id").as("view_id"), col("user_id"),
          col("tus").as("vtus"), explode(array(bkt, bkt + 1)).as("jb"))
      val c = e.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id").as("cuid"),
          col("tus").as("ctus"), bkt.as("cb"))
      v.join(c, col("user_id") === col("cuid") && col("jb") === col("cb") &&
          col("ctus") > col("vtus") && col("ctus") <= col("vtus") + bandUs)
        .select(col("view_id"), col("click_id"), col("user_id"),
          (col("ctus") - col("vtus")).as("lag_us"))
        .orderBy("view_id", "click_id")
    }))

  val oracle: Map[String, String] = Map(
    // The oracle is the PLAIN band join — bucketing must be invisible
    // in the result, exactly like the salted join's invariant.
    "q_join_band" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
        |                  epoch_us(CAST(ts AS TIMESTAMP)) AS tus
        |           FROM events WHERE user_id < 50)
        |SELECT v.event_id AS view_id, c.event_id AS click_id,
        |       v.user_id, c.tus - v.tus AS lag_us
        |FROM e v JOIN e c
        |  ON v.user_id = c.user_id
        | AND v.event_type = 'view' AND c.event_type = 'click'
        | AND c.tus > v.tus AND c.tus <= v.tus + 1800000000
        |ORDER BY view_id, click_id""".stripMargin,
    "q_join_salted" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |       round(sum(o_totalprice), 2) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
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
        |ORDER BY c_custkey""".stripMargin,
    "q_join_right" ->
      """SELECT c_custkey, o_orderkey, o_totalprice
        |FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
        |ORDER BY c_custkey, o_orderkey ASC NULLS FIRST""".stripMargin,
    "q_join_full" ->
      """SELECT count(*) AS n_rows,
        |       count(o_orderkey) AS n_left,
        |       count(l_orderkey) AS n_right
        |FROM (SELECT o_orderkey FROM orders WHERE o_totalprice > 300000.0) o
        |FULL JOIN (SELECT l_orderkey, l_linenumber FROM lineitem
        |           WHERE l_quantity > 45.0) l
        |ON o.o_orderkey = l.l_orderkey""".stripMargin,
    "q_join_cross" ->
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""".stripMargin,
    "q_join_theta" ->
      """SELECT s_nationkey AS nationkey, count(*) AS n_pairs
        |FROM supplier JOIN customer
        |  ON s_nationkey = c_nationkey AND s_acctbal > c_acctbal
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_join_asof" ->
      """SELECT p.user_id, p.event_id, CAST(p.ts AS TIMESTAMP) AS ts,
        |       (SELECT max(CAST(c.ts AS TIMESTAMP)) FROM events c
        |        WHERE c.user_id = p.user_id AND c.event_type = 'click'
        |          AND CAST(c.ts AS TIMESTAMP) <= CAST(p.ts AS TIMESTAMP))
        |         AS asof_click_ts
        |FROM events p WHERE p.event_type = 'purchase'
        |ORDER BY p.user_id, p.event_id""".stripMargin,
    "q_join_asof_fwd" ->
      """SELECT c.user_id, c.event_id, CAST(c.ts AS TIMESTAMP) AS ts,
        |       (SELECT min(CAST(p.ts AS TIMESTAMP)) FROM events p
        |        WHERE p.user_id = c.user_id AND p.event_type = 'purchase'
        |          AND CAST(p.ts AS TIMESTAMP) >= CAST(c.ts AS TIMESTAMP))
        |         AS next_purchase_ts
        |FROM events c WHERE c.event_type = 'click'
        |ORDER BY c.user_id, c.event_id""".stripMargin,
    "q_join_self" ->
      """SELECT l1.l_orderkey AS o_orderkey, count(*) AS n_pairs
        |FROM (SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_orderkey < 1000) l1
        |JOIN (SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_orderkey < 1000) l2
        |  ON l1.l_orderkey = l2.l_orderkey AND l1.l_linenumber < l2.l_linenumber
        |GROUP BY 1 ORDER BY 1""".stripMargin)
}
