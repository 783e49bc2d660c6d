package graft.queries

import graft.Fixtures
import org.apache.spark.sql.functions._

/** Streaming-semantics queries over `events` (SURVEY.md §2B B-10),
  * run here in batch mode: Spark's `window()` / `session_window()`
  * functions have identical semantics in batch and streaming, so the
  * oracle checks the window math; watermarks and incremental state are
  * covered by the MemoryStream ScalaTest suite (StreamingSpec).
  *
  * Scale notes: tumbling-window aggregation is a single shuffle keyed
  * by (window, type) with map-side partial aggregation — the grouped
  * key space (hours × types) stays small regardless of input volume.
  */
object Streaming {

  /** Ordered event-sequence funnel (view → click → purchase), shared
    * verbatim with the oracle: each stage is a grouped min-timestamp
    * over the PREVIOUS stage's survivors — three stage-keyed
    * aggregations and joins on user_id, never a per-user sort or a
    * sessionize-the-world window, so the funnel costs three bounded
    * shuffles at any event volume. Strictly-after semantics (`>`), the
    * conversion-analysis default.
    */
  private val funnelSql =
    """WITH ev AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS t
      |            FROM events
      |            WHERE CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-04 00:00:00'),
      |v AS (SELECT user_id, min(t) AS t1 FROM ev
      |      WHERE event_type = 'view' GROUP BY user_id),
      |c AS (SELECT e.user_id, min(e.t) AS t2
      |      FROM ev e JOIN v ON e.user_id = v.user_id
      |      WHERE e.event_type = 'click' AND e.t > v.t1
      |      GROUP BY e.user_id),
      |p AS (SELECT e.user_id, min(e.t) AS t3
      |      FROM ev e JOIN c ON e.user_id = c.user_id
      |      WHERE e.event_type = 'purchase' AND e.t > c.t2
      |      GROUP BY e.user_id),
      |u AS (SELECT DISTINCT user_id FROM ev)
      |SELECT CAST(CASE WHEN p.user_id IS NOT NULL THEN 3
      |                 WHEN c.user_id IS NOT NULL THEN 2
      |                 WHEN v.user_id IS NOT NULL THEN 1
      |                 ELSE 0 END AS BIGINT) AS depth,
      |       CAST(count(*) AS BIGINT) AS n_users
      |FROM u LEFT JOIN v USING (user_id) LEFT JOIN c USING (user_id)
      |       LEFT JOIN p USING (user_id)
      |GROUP BY depth ORDER BY depth""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_events_funnel" -> ((s, dir) => {
      Fixtures.events(s, dir).createOrReplaceTempView("events")
      s.sql(funnelSql)
    }),

    // Cohort retention matrix: users bucket by FIRST-seen day, then
    // each (cohort, day-offset) cell counts distinct returners. Two
    // keyed shuffles (first-seen min, then the cell count-distinct) —
    // the canonical product-analytics rollup, and the grouped key
    // space (days × 8 offsets) stays tiny at any event volume.
    "q_events_retention" -> ((s, dir) => {
      val e = Fixtures.events(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("d"))
      val cohorts = e.groupBy("user_id").agg(min("d").as("cohort"))
      e.join(cohorts, "user_id")
        .withColumn("day_offset", datediff(col("d"), col("cohort")).cast("long"))
        .filter(col("day_offset") <= 7)
        .groupBy(col("cohort"), col("day_offset"))
        .agg(countDistinct("user_id").as("n_users"))
        .select(col("cohort").cast("string").as("cohort_day"),
                col("day_offset"), col("n_users"))
        .orderBy("cohort_day", "day_offset")
    }),

    // Event-type co-occurrence (market-basket over sessions-as-days):
    // which event types appear together for the same user on the same
    // day. The self-join is keyed on (user, day) AFTER a distinct, so
    // its fan-out per key is bounded by the type vocabulary (≤ |types|²
    // rows per user-day), never by event volume — the shape that keeps
    // co-occurrence mining linear at 100 TB.
    "q_events_cooccur" -> ((s, dir) => {
      val e = Fixtures.events(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("d"), col("event_type"))
        .distinct()
      val a = e.withColumnRenamed("event_type", "t1")
      val b = e.withColumnRenamed("event_type", "t2")
      a.join(b, Seq("user_id", "d")).filter(col("t1") < col("t2"))
        .groupBy("t1", "t2").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("t1"), col("t2"))
    }),

    // Event-sequence transition matrix (the Markov-chain estimation
    // step behind session modeling / next-event prediction): count
    // (type → next type) transitions per user in time order. ONE
    // keyed window (lead over user_id) + one small grouped count —
    // the per-user sort is the only shuffle, and the output is
    // |types|² rows at any event volume.
    "q_events_markov" -> ((s, dir) => {
      val e = Fixtures.events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts", "event_id")
      e.withColumn("to_type", lead("event_type", 1).over(w))
        .filter(col("to_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("to_type"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("from_type", "to_type")
    }),

    // Volume-anomaly detection (the monitoring rollup behind data
    // quality alerting): per-type daily counts z-scored against that
    // type's own mean/stddev, outlier days flagged. Two tiny grouped
    // aggregates + a broadcast-sized join — the heavy input collapses
    // to (days × types) rows in the FIRST aggregation, so everything
    // after is metadata-sized at any event volume.
    "q_events_anomaly" -> ((s, dir) => {
      val daily = Fixtures.events(s, dir)
        .groupBy(to_date(col("ts")).as("d"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      val stats = daily.groupBy("event_type")
        .agg(avg("n").as("mu"), stddev_samp("n").as("sd"))
      daily.join(stats, "event_type")
        .withColumn("z", (col("n") - col("mu")) / col("sd"))
        .filter(abs(col("z")) > 1.5)
        .select(col("event_type"), col("d").cast("string").as("day"),
          col("n"), round(col("z"), 4).as("z"))
        .orderBy("event_type", "day")
    }),

    // Session path mining (the product-analytics "top user journeys"
    // rollup): 30-minute-gap sessions per user (the same
    // gaps-and-islands shape q_stream_session pins), each session
    // reduced to its first-3-event type path, top paths by session
    // count. ONE per-user keyed window chain (a single shuffle — the
    // lag, running-sum and row_number all share the (user_id; ts,
    // event_id) sort), then a path-vocabulary-sized rollup: |types|³
    // distinct paths at most, so everything after the window is
    // metadata-sized at any event volume.
    "q_events_sessionpath" -> ((s, dir) => {
      val e = Fixtures.events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts", "event_id")
      val sess = e
        .withColumn("prev", lag("ts", 1).over(w))
        // microsecond-exact gap: cast("long") would truncate to
        // seconds and disagree with the interval-exact oracle on
        // sub-second boundaries (bit at sf0.1)
        .withColumn("new_sess",
          when(col("prev").isNull ||
            unix_micros(col("ts")) - unix_micros(col("prev")) >= 1800L * 1000000L, 1L)
            .otherwise(0L))
        .withColumn("sid", sum("new_sess").over(w))
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("user_id", "sid").orderBy("ts", "event_id")))
      sess.filter(col("rn") <= 3)
        .groupBy("user_id", "sid")
        .agg(array_join(
          transform(array_sort(collect_list(struct(col("rn"), col("event_type")))),
            x => x.getField("event_type")), ">").as("path"))
        .groupBy("path").agg(count(lit(1)).as("n_sessions"))
        .orderBy(col("n_sessions").desc, col("path")).limit(20)
    }),

    // Last-touch attribution: each purchase credits the user's most
    // recent PRECEDING non-purchase event within a 3-day lookback
    // ('direct' if none). No per-purchase lateral probe: one per-user
    // window computes the running latest non-purchase touch as a
    // max-of-struct — (ts, event_id) lexicographic order IS recency —
    // so attribution costs the same single keyed sort the other
    // event-sequence rollups pay, and the output is |types|-sized.
    "q_events_attribution" -> ((s, dir) => {
      val e = Fixtures.events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"), col("value"))
      val wPrev = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      e.withColumn("touch",
          max(when(col("event_type") =!= "purchase",
            struct(col("ts"), col("event_id"), col("event_type")))).over(wPrev))
        .filter(col("event_type") === "purchase")
        .withColumn("channel",
          when(col("touch").isNotNull &&
            col("touch.ts") >= col("ts") - expr("INTERVAL 3 DAYS"),
            col("touch.event_type")).otherwise("direct"))
        .groupBy("channel")
        .agg(count(lit(1)).as("conversions"),
          round(sum("value"), 2).as("revenue"))
        .orderBy("channel")
    }),

    // Per-type volume trend (the capacity-forecasting primitive):
    // least-squares slope/intercept of daily event counts against the
    // day number, via the one-pass regr_* aggregates. The heavy input
    // collapses to (days × types) rows in the first aggregation, so
    // the regression runs on metadata-sized data at any event volume.
    "q_events_trend" -> ((s, dir) => {
      val daily = Fixtures.events(s, dir)
        .groupBy(to_date(col("ts")).as("d"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      daily
        .withColumn("day_num",
          datediff(col("d"), lit("2024-01-01").cast("date")).cast("double"))
        .groupBy("event_type")
        .agg(round(regr_slope(col("n").cast("double"), col("day_num")), 4).as("slope"),
          round(regr_intercept(col("n").cast("double"), col("day_num")), 4).as("icept"),
          count(lit(1)).as("n_days"))
        .orderBy("event_type")
    }),

    "q_stream_tumbling" -> ((s, dir) =>
      Fixtures.events(s, dir)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("cnt"),
             round(sum("value"), 2).as("sum_val"))
        .select(col("window.start").as("win_start"), col("event_type"),
                col("cnt"), col("sum_val"))
        .orderBy("win_start", "event_type")),

    // 1-hour windows sliding every 15 minutes: each event lands in
    // exactly 4 epoch-aligned windows. Spark's `window(ts, len, slide)`
    // expands rows 4x map-side (a Generate, no extra shuffle) then
    // aggregates — the same plan streaming uses, and the expansion
    // factor (len/slide), not data volume, bounds the cost at scale.
    "q_stream_sliding" -> ((s, dir) =>
      Fixtures.events(s, dir)
        .groupBy(window(col("ts"), "1 hour", "15 minutes"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("window.start").as("win_start"), col("cnt"))
        .orderBy("win_start")),

    // Per-user 30-minute-gap session windows. Spark merges events whose
    // [ts, ts+gap) windows overlap; a session's end is last-event ts +
    // gap. State is per (user, session) — bounded by the gap, which is
    // exactly why this survives unbounded streams. The oracle rebuilds
    // identical sessions with gaps-and-islands SQL (new session when
    // the gap from the previous event is >= 30 min).
    "q_stream_session" -> ((s, dir) =>
      Fixtures.events(s, dir)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("user_id"),
                col("session_window.start").as("sess_start"),
                col("session_window.end").as("sess_end"), col("cnt"))
        .orderBy("user_id", "sess_start")),

    // Streaming deduplication (exactly-once over an at-least-once
    // feed): the input simulates redelivery by unioning the events
    // feed with itself, and `dropDuplicates(event_id)` restores one
    // row per event — the operator streaming runs with per-key state
    // (StreamingSpec pins the watermark-bounded variant,
    // dropDuplicatesWithinWatermark, where state ages out instead of
    // growing with the stream). Deterministic because redelivered
    // rows are bit-identical, exactly like a real redelivery.
    "q_stream_dedup" -> ((s, dir) => {
      val ev = Fixtures.events(s, dir)
        .select("event_id", "user_id", "event_type", "value")
      ev.union(ev).dropDuplicates("event_id")
        .orderBy("event_id")
    }))

  val oracle: Map[String, String] = Map(
    "q_events_funnel" -> funnelSql,
    "q_events_retention" ->
      """WITH e AS (SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d
        |           FROM events),
        |c AS (SELECT user_id, min(d) AS cohort FROM e GROUP BY user_id)
        |SELECT CAST(cohort AS VARCHAR) AS cohort_day,
        |       CAST(d - cohort AS BIGINT) AS day_offset,
        |       CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
        |FROM e JOIN c USING (user_id)
        |WHERE d - cohort <= 7
        |GROUP BY cohort, day_offset
        |ORDER BY cohort_day, day_offset""".stripMargin,
    "q_events_markov" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS t, event_id, event_type
        |           FROM events),
        |n AS (SELECT event_type AS from_type,
        |             lead(event_type) OVER (PARTITION BY user_id
        |                                    ORDER BY t, event_id) AS to_type
        |      FROM e)
        |SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS cnt
        |FROM n WHERE to_type IS NOT NULL
        |GROUP BY 1, 2 ORDER BY from_type, to_type""".stripMargin,
    "q_events_anomaly" ->
      """WITH daily AS (SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
        |                      event_type, count(*) AS n
        |               FROM events GROUP BY 1, 2),
        |s AS (SELECT event_type, avg(n) AS mu, stddev_samp(n) AS sd
        |      FROM daily GROUP BY 1)
        |SELECT event_type, CAST(d AS VARCHAR) AS day, CAST(n AS BIGINT) AS n,
        |       round((n - mu) / sd, 4) AS z
        |FROM daily JOIN s USING (event_type)
        |WHERE abs((n - mu) / sd) > 1.5
        |ORDER BY event_type, day""".stripMargin,
    "q_events_cooccur" ->
      """WITH e AS (SELECT DISTINCT user_id,
        |                  CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d, event_type
        |           FROM events)
        |SELECT a.event_type AS t1, b.event_type AS t2,
        |       CAST(count(*) AS BIGINT) AS cnt
        |FROM e a JOIN e b
        |  ON a.user_id = b.user_id AND a.d = b.d AND a.event_type < b.event_type
        |GROUP BY 1, 2 ORDER BY cnt DESC, t1, t2""".stripMargin,
    "q_events_sessionpath" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
        |                  CAST(ts AS TIMESTAMP) AS t FROM events),
        |m AS (SELECT *, CASE WHEN lag(t) OVER w IS NULL
        |                       OR t - lag(t) OVER w >= INTERVAL '30 minutes'
        |                     THEN 1 ELSE 0 END AS new_sess
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
        |g AS (SELECT *, sum(new_sess) OVER (PARTITION BY user_id
        |                                    ORDER BY t, event_id
        |                                    ROWS UNBOUNDED PRECEDING) AS sid
        |      FROM m),
        |r AS (SELECT *, row_number() OVER (PARTITION BY user_id, sid
        |                                   ORDER BY t, event_id) AS rn FROM g),
        |p AS (SELECT user_id, sid,
        |             string_agg(event_type, '>' ORDER BY rn) AS path
        |      FROM r WHERE rn <= 3 GROUP BY user_id, sid)
        |SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
        |FROM p GROUP BY path
        |ORDER BY n_sessions DESC, path LIMIT 20""".stripMargin,
    "q_events_attribution" ->
      """WITH e AS (SELECT user_id, event_id, event_type, value,
        |                  CAST(ts AS TIMESTAMP) AS t FROM events),
        |p AS (SELECT * FROM e WHERE event_type = 'purchase')
        |SELECT coalesce(x.event_type, 'direct') AS channel,
        |       CAST(count(*) AS BIGINT) AS conversions,
        |       round(sum(p.value), 2) AS revenue
        |FROM p LEFT JOIN LATERAL (
        |  SELECT e2.event_type FROM e e2
        |  WHERE e2.user_id = p.user_id
        |    AND (e2.t < p.t OR (e2.t = p.t AND e2.event_id < p.event_id))
        |    AND e2.t >= p.t - INTERVAL 3 DAY
        |    AND e2.event_type <> 'purchase'
        |  ORDER BY e2.t DESC, e2.event_id DESC LIMIT 1) x ON TRUE
        |GROUP BY 1 ORDER BY channel""".stripMargin,
    "q_events_trend" ->
      """WITH daily AS (SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
        |                      event_type, count(*) AS n
        |               FROM events GROUP BY 1, 2)
        |SELECT event_type,
        |       round(regr_slope(CAST(n AS DOUBLE),
        |               CAST(d - DATE '2024-01-01' AS DOUBLE)), 4) AS slope,
        |       round(regr_intercept(CAST(n AS DOUBLE),
        |               CAST(d - DATE '2024-01-01' AS DOUBLE)), 4) AS icept,
        |       CAST(count(*) AS BIGINT) AS n_days
        |FROM daily GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_stream_tumbling" ->
      """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS win_start,
        |       event_type, count(*) AS cnt, round(sum(value), 2) AS sum_val
        |FROM events GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin,
    "q_stream_sliding" ->
      """WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS t FROM events),
        |w AS (SELECT time_bucket(INTERVAL '15 minutes', t)
        |             - k * INTERVAL '15 minutes' AS win_start
        |      FROM e, (SELECT unnest([0, 1, 2, 3]) AS k))
        |SELECT win_start, count(*) AS cnt
        |FROM w GROUP BY 1 ORDER BY win_start""".stripMargin,
    "q_stream_session" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS t FROM events),
        |m AS (SELECT user_id, t,
        |             CASE WHEN lag(t) OVER w IS NULL
        |                    OR t - lag(t) OVER w >= INTERVAL '30 minutes'
        |                  THEN 1 ELSE 0 END AS new_sess
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t)),
        |g AS (SELECT user_id, t,
        |             sum(new_sess) OVER (PARTITION BY user_id ORDER BY t
        |                                 ROWS UNBOUNDED PRECEDING) AS sid
        |      FROM m)
        |SELECT user_id, min(t) AS sess_start,
        |       max(t) + INTERVAL '30 minutes' AS sess_end, count(*) AS cnt
        |FROM g GROUP BY user_id, sid
        |ORDER BY user_id, sess_start""".stripMargin,
    "q_stream_dedup" ->
      """SELECT DISTINCT event_id, user_id, event_type, value
        |FROM (SELECT * FROM events UNION ALL SELECT * FROM events)
        |ORDER BY event_id""".stripMargin)
}
