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

  val queries: Map[String, Q] = Map(
    "q_stream_tumbling" -> ((s, dir) =>
      Fixtures.events(s, dir)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("cnt"),
             round(sum("value"), 2).as("sum_val"))
        .select(col("window.start").as("win_start"), col("event_type"),
                col("cnt"), col("sum_val"))
        .orderBy("win_start", "event_type")))

  val oracle: Map[String, String] = Map(
    "q_stream_tumbling" ->
      """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS win_start,
        |       event_type, count(*) AS cnt, round(sum(value), 2) AS sum_val
        |FROM events GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin)
}
