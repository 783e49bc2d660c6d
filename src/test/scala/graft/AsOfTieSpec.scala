package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** Pins inclusive tie handling for both as-of joins. The driver
  * fixtures happen to contain no equal-ts click/purchase pair for any
  * user (checked at sf0.01), so the DuckDB oracle (`p.ts >= c.ts` /
  * `c.ts <= p.ts`, both inclusive) cannot distinguish an inverted
  * window tie-break from the correct one — this synthetic fixture can.
  *
  * The hostile shape: one user with a click and a purchase at the SAME
  * timestamp. Backward as-of (purchase → latest click at-or-before)
  * must see the equal-ts click; forward as-of (click → next purchase
  * at-or-after) must see the equal-ts purchase. Each direction needs
  * the opposite window tie-break (clicks before purchases in both
  * orderings — the frame mirrors, the sort does not).
  */
class AsOfTieSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-asof-tie").toString
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    val t1 = java.sql.Timestamp.valueOf("2024-01-01 11:00:00")
    val t2 = java.sql.Timestamp.valueOf("2024-01-01 12:00:00")
    Seq(
      // user 1: click and purchase at the exact same ts t1, plus
      // strictly earlier/later events that must NOT win the tie
      (1L, t0, 1L, "click", 1.0, "{}"),
      (2L, t1, 1L, "click", 1.0, "{}"),
      (3L, t1, 1L, "purchase", 1.0, "{}"),
      (4L, t2, 1L, "purchase", 1.0, "{}"),
      // user 2: no tie — sanity that the plain path still works
      (5L, t0, 2L, "click", 1.0, "{}"),
      (6L, t2, 2L, "purchase", 1.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  test("backward as-of includes an equal-ts click (ts <= is inclusive)") {
    val rows = SparkEntry.queries("q_join_asof")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(3)))
    val byEvent = rows.map { case (_, eid, asof) => eid -> asof }.toMap
    // purchase event 3 at t1: the equal-ts click (event 2, t1) wins,
    // not the earlier click at t0
    assert(byEvent(3L) === java.sql.Timestamp.valueOf("2024-01-01 11:00:00"))
    assert(byEvent(4L) === java.sql.Timestamp.valueOf("2024-01-01 11:00:00"))
  }

  test("forward as-of includes an equal-ts purchase (ts >= is inclusive)") {
    val rows = SparkEntry.queries("q_join_asof_fwd")(spark, dir)
      .collect().map(r => (r.getLong(1), r.getTimestamp(3)))
    val byEvent = rows.toMap
    // click event 2 at t1: the equal-ts purchase (event 3, t1) is the
    // next purchase, not the later one at t2
    assert(byEvent(2L) === java.sql.Timestamp.valueOf("2024-01-01 11:00:00"))
    // click event 1 at t0: next purchase is the t1 one
    assert(byEvent(1L) === java.sql.Timestamp.valueOf("2024-01-01 11:00:00"))
    // user 2's click sees the t2 purchase
    assert(byEvent(5L) === java.sql.Timestamp.valueOf("2024-01-01 12:00:00"))
  }
}
