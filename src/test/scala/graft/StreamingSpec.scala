package graft

import java.sql.Timestamp

import graft.streaming.StreamOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery
import org.scalatest.funsuite.AnyFunSuite

/** Incremental-semantics suite for StreamOps: what the batch oracle
  * can't check — append-mode window finalization, late-data dropping
  * behind the watermark, and in-watermark dedup — driven through
  * MemoryStream micro-batches. Shares the TestSpark session (never
  * stopped: all suites in this JVM share its SparkContext).
  */
class StreamingSpec extends AnyFunSuite {

  case class Ev(ts: Timestamp, event_type: String, value: Double, event_id: Long)

  private lazy val spark: SparkSession = TestSpark.spark

  private def t(s: String): Timestamp = Timestamp.valueOf(s)

  private def startAppend(df: DataFrame, name: String): StreamingQuery =
    df.writeStream.format("memory").queryName(name).outputMode("append").start()

  test("tumbling append mode finalizes a window only after the watermark passes") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = startAppend(StreamOps.tumblingCounts(in.toDF(), "10 minutes"), "tumb")
    try {
      // two events in the 10:00 window, one in 11:00 → watermark 10:55:
      // the 10:00 window [10:00, 11:00) is NOT finalized yet
      in.addData(
        Ev(t("2024-01-01 10:00:00"), "click", 1.0, 1L),
        Ev(t("2024-01-01 10:30:00"), "click", 2.0, 2L),
        Ev(t("2024-01-01 11:05:00"), "click", 4.0, 3L))
      q.processAllAvailable()
      assert(spark.table("tumb").count() === 0)

      // advance watermark to 11:10 ≥ 11:00 → the 10:00 window emits once
      in.addData(Ev(t("2024-01-01 11:20:00"), "click", 8.0, 4L))
      q.processAllAvailable()
      val rows = spark.table("tumb").collect()
      assert(rows.length === 1)
      assert(rows.head.getAs[Timestamp]("win_start") === t("2024-01-01 10:00:00"))
      assert(rows.head.getAs[Long]("cnt") === 2L)
      assert(rows.head.getAs[Double]("sum_val") === 3.0)

      // a late event behind the watermark (10:45 < 11:10) is dropped:
      // closing the 11:00 window must count only the on-time events
      in.addData(Ev(t("2024-01-01 10:45:00"), "click", 100.0, 5L))
      in.addData(Ev(t("2024-01-01 12:30:00"), "click", 16.0, 6L))
      q.processAllAvailable()
      val win11 = spark.table("tumb").collect()
        .filter(_.getAs[Timestamp]("win_start") == t("2024-01-01 11:00:00"))
      assert(win11.length === 1)
      assert(win11.head.getAs[Long]("cnt") === 2L) // 11:05 + 11:20, no 10:45
      assert(win11.head.getAs[Double]("sum_val") === 12.0)
    } finally q.stop()
  }

  test("session windows merge within the gap and split across it") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long)]
    val df = in.toDF().toDF("ts", "user_id")
    val q = startAppend(StreamOps.sessionCounts(df, "10 minutes"), "sess")
    try {
      in.addData(
        (t("2024-01-01 10:00:00"), 1L),
        (t("2024-01-01 10:10:00"), 1L), // gap 10 min < 30 → same session
        (t("2024-01-01 11:30:00"), 1L)) // gap 80 min → new session
      // push watermark far past 11:30 + 30 min gap to close everything
      in.addData((t("2024-01-01 14:00:00"), 2L))
      q.processAllAvailable()
      val rows = spark.table("sess").collect()
        .filter(_.getAs[Long]("user_id") == 1L)
        .sortBy(_.getAs[Timestamp]("sess_start").getTime)
      assert(rows.length === 2)
      assert(rows(0).getAs[Timestamp]("sess_start") === t("2024-01-01 10:00:00"))
      assert(rows(0).getAs[Timestamp]("sess_end") === t("2024-01-01 10:40:00"))
      assert(rows(0).getAs[Long]("cnt") === 2L)
      assert(rows(1).getAs[Timestamp]("sess_start") === t("2024-01-01 11:30:00"))
      assert(rows(1).getAs[Long]("cnt") === 1L)
    } finally q.stop()
  }

  test("sliding windows assign each event to len/slide windows") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String)]
    val df = in.toDF().toDF("ts", "event_type")
    val q = startAppend(StreamOps.slidingCounts(df, "10 minutes"), "slide")
    try {
      in.addData((t("2024-01-01 10:07:00"), "x"))
      in.addData((t("2024-01-01 13:00:00"), "x")) // watermark → closes them
      q.processAllAvailable()
      val starts = spark.table("slide").collect()
        .map(_.getAs[Timestamp]("win_start")).sortBy(_.getTime)
      // 10:07 lands in the 1h windows starting 09:15, 09:30, 09:45, 10:00
      assert(starts.toSeq === Seq(
        t("2024-01-01 09:15:00"), t("2024-01-01 09:30:00"),
        t("2024-01-01 09:45:00"), t("2024-01-01 10:00:00")))
    } finally q.stop()
  }

  test("stream-static join enriches micro-batches via foreachBatch") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val dim = Seq(("click", "engagement"), ("view", "reach"))
      .toDF("event_type", "category")
    val in = MemoryStream[(Timestamp, String)]
    val joined = in.toDF().toDF("ts", "event_type").join(dim, "event_type")
    val seen = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    val q = joined.writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        seen.synchronized {
          seen ++= batch.groupBy("category").count().collect()
            .map(r => (r.getString(0), r.getLong(1)))
        }
        ()
      }
      .start()
    try {
      in.addData(
        (t("2024-01-01 10:00:00"), "click"),
        (t("2024-01-01 10:01:00"), "click"),
        (t("2024-01-01 10:02:00"), "view"),
        (t("2024-01-01 10:03:00"), "scroll")) // no dim row → dropped by inner join
      q.processAllAvailable()
      val totals = seen.synchronized {
        seen.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      }
      assert(totals === Map("engagement" -> 2L, "reach" -> 1L))
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionizes with in-batch splits and event-time timeout") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long)]
    val df = in.toDF().toDF("ts", "user_id")
    val q = startAppend(StreamOps.sessionize(df), "customsess")
    try {
      in.addData(
        (t("2024-01-01 10:00:00"), 1L),
        (t("2024-01-01 10:10:00"), 1L), // gap 10 min < 30 → same session
        (t("2024-01-01 11:30:00"), 1L)) // gap 80 min → closes first session in-batch
      // second session (11:30) stays open until the watermark passes
      // 12:00; a far-future event for another user advances it
      in.addData((t("2024-01-01 14:00:00"), 2L))
      q.processAllAvailable()
      // one more empty-ish batch so the event-time timeout fires
      in.addData((t("2024-01-01 15:00:00"), 2L))
      q.processAllAvailable()
      val rows = spark.table("customsess").collect()
        .filter(_.getAs[Long]("user_id") == 1L)
        .sortBy(_.getAs[Timestamp]("sess_start").getTime)
      assert(rows.length === 2)
      assert(rows(0).getAs[Timestamp]("sess_start") === t("2024-01-01 10:00:00"))
      assert(rows(0).getAs[Timestamp]("sess_end") === t("2024-01-01 10:40:00"))
      assert(rows(0).getAs[Long]("cnt") === 2L)
      assert(rows(1).getAs[Timestamp]("sess_start") === t("2024-01-01 11:30:00"))
      assert(rows(1).getAs[Timestamp]("sess_end") === t("2024-01-01 12:00:00"))
      assert(rows(1).getAs[Long]("cnt") === 1L)
    } finally q.stop()
  }

  test("mapGroupsWithState accumulates per-key totals across micro-batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = StreamOps.runningTotals(in.toDF())
      .writeStream.format("memory").queryName("totals").outputMode("update").start()
    try {
      in.addData(
        Ev(t("2024-01-01 10:00:00"), "click", 1.5, 1L),
        Ev(t("2024-01-01 10:01:00"), "click", 2.5, 2L),
        Ev(t("2024-01-01 10:02:00"), "view", 3.0, 3L))
      q.processAllAvailable()
      in.addData(Ev(t("2024-01-01 10:05:00"), "click", 4.0, 4L))
      q.processAllAvailable()
      // update-mode memory sink appends one row per touched key per batch;
      // the latest row per key carries the lifetime totals
      val latest = spark.table("totals").collect()
        .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2))))
        .groupBy(_._1).view.mapValues(_.map(_._2).maxBy(_._1)).toMap
      assert(latest("click") === ((3L, 8.0)))
      assert(latest("view") === ((1L, 3.0)))
    } finally q.stop()
  }

  test("transformWithState emits only when a key's high-water mark rises") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[Ev]
    val q = StreamOps.highWaterMarks(in.toDF())
      .writeStream.format("memory").queryName("hwm").outputMode("update").start()
    try {
      in.addData(
        Ev(t("2024-01-01 10:00:00"), "click", 5.0, 1L),
        Ev(t("2024-01-01 10:01:00"), "click", 3.0, 2L),
        Ev(t("2024-01-01 10:02:00"), "view", 2.0, 3L))
      q.processAllAvailable()
      in.addData(
        Ev(t("2024-01-01 10:05:00"), "click", 4.0, 4L), // below hwm → silent
        Ev(t("2024-01-01 10:06:00"), "view", 7.0, 5L))  // new hwm → emit
      q.processAllAvailable()
      val rows = spark.table("hwm").collect()
        .map(r => (r.getString(0), r.getDouble(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
      assert(rows("click") === Seq(5.0))      // second batch stayed silent
      assert(rows("view") === Seq(2.0, 7.0))  // rose twice → two emissions
    } finally {
      q.stop()
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  case class UEv(ts: Timestamp, user_id: Long, event_id: Long)

  test("stream-stream interval join pairs clicks with in-horizon views only") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val clicks = MemoryStream[UEv]
    val views = MemoryStream[UEv]
    val q = startAppend(
      StreamOps.clickViewJoin(clicks.toDF(), views.toDF()), "ssjoin")
    try {
      views.addData(
        UEv(t("2024-01-01 10:00:00"), 1L, 100L), // 5 min before click: in horizon
        UEv(t("2024-01-01 09:40:00"), 1L, 101L), // 25 min before: outside
        UEv(t("2024-01-01 10:02:00"), 2L, 102L)) // other user
      clicks.addData(UEv(t("2024-01-01 10:05:00"), 1L, 200L))
      q.processAllAvailable()
      // advance both watermarks so the joined row finalizes in append
      // mode (distinct users so the advance events don't join)
      views.addData(UEv(t("2024-01-01 11:00:00"), 8L, 109L))
      clicks.addData(UEv(t("2024-01-01 11:00:00"), 9L, 209L))
      q.processAllAvailable()
      val rows = spark.table("ssjoin").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("click_id"), r.getAs[Long]("view_id")))
      assert(rows.toSet === Set((1L, 200L, 100L)))
    } finally q.stop()
  }

  test("stream-stream LEFT OUTER interval join null-extends once the watermark proves no match") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val clicks = MemoryStream[UEv]
    val views = MemoryStream[UEv]
    val q = startAppend(
      StreamOps.clickViewJoinLeftOuter(clicks.toDF(), views.toDF()), "ssjoinlo")
    try {
      views.addData(
        UEv(t("2024-01-01 10:00:00"), 1L, 100L)) // in horizon for user 1
      clicks.addData(
        UEv(t("2024-01-01 10:05:00"), 1L, 200L), // matches view 100
        UEv(t("2024-01-01 10:05:00"), 3L, 201L)) // NO view for user 3
      q.processAllAvailable()
      // push both watermarks far past click_ts: the engine can now
      // PROVE no view will ever match click 201 and emits it null-extended
      views.addData(UEv(t("2024-01-01 11:00:00"), 8L, 109L))
      clicks.addData(UEv(t("2024-01-01 11:00:00"), 9L, 209L))
      q.processAllAvailable()
      views.addData(UEv(t("2024-01-01 12:00:00"), 8L, 110L))
      clicks.addData(UEv(t("2024-01-01 12:00:00"), 9L, 210L))
      q.processAllAvailable()
      val rows = spark.table("ssjoinlo").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("click_id"),
          if (r.isNullAt(r.fieldIndex("view_id"))) None
          else Some(r.getAs[Long]("view_id"))))
      assert(rows.toSet.contains((1L, 200L, Some(100L))), rows.mkString(","))
      assert(rows.toSet.contains((3L, 201L, None)), rows.mkString(","))
    } finally q.stop()
  }

  test("stream-stream FULL OUTER interval join null-extends BOTH sides past their watermarks") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val clicks = MemoryStream[UEv]
    val views = MemoryStream[UEv]
    val q = startAppend(
      StreamOps.clickViewJoinFullOuter(clicks.toDF(), views.toDF()), "ssjoinfo")
    try {
      views.addData(
        UEv(t("2024-01-01 10:00:00"), 1L, 100L), // matches user 1's click
        UEv(t("2024-01-01 10:00:00"), 5L, 101L)) // NO click for user 5
      clicks.addData(
        UEv(t("2024-01-01 10:05:00"), 1L, 200L), // matches view 100
        UEv(t("2024-01-01 10:05:00"), 3L, 201L)) // NO view for user 3
      q.processAllAvailable()
      // advance both watermarks far enough that neither orphan can
      // still find a partner (click side must pass view_ts + horizon)
      views.addData(UEv(t("2024-01-01 11:00:00"), 8L, 109L))
      clicks.addData(UEv(t("2024-01-01 11:00:00"), 9L, 209L))
      q.processAllAvailable()
      views.addData(UEv(t("2024-01-01 12:00:00"), 8L, 110L))
      clicks.addData(UEv(t("2024-01-01 12:00:00"), 9L, 210L))
      q.processAllAvailable()
      def opt(r: org.apache.spark.sql.Row, f: String): Option[Long] =
        if (r.isNullAt(r.fieldIndex(f))) None else Some(r.getAs[Long](f))
      val rows = spark.table("ssjoinfo").collect()
        .map(r => (r.getAs[Long]("user_id"), opt(r, "click_id"), opt(r, "view_id")))
      // matched pair once; orphan CLICK null-extends on the view side;
      // orphan VIEW null-extends on the click side — the new half
      assert(rows.toSet.contains((1L, Some(200L), Some(100L))), rows.mkString(","))
      assert(rows.toSet.contains((3L, Some(201L), None)), rows.mkString(","))
      assert(rows.toSet.contains((5L, None, Some(101L))), rows.mkString(","))
      assert(rows.count(_._1 == 1L) === 1) // matched row emits exactly once
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark suppresses re-deliveries of an event id") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = startAppend(StreamOps.dedupEvents(in.toDF(), "10 minutes"), "dedup")
    try {
      in.addData(
        Ev(t("2024-01-01 10:00:00"), "click", 1.0, 1L),
        Ev(t("2024-01-01 10:00:30"), "click", 1.0, 1L), // dup id in-watermark
        Ev(t("2024-01-01 10:01:00"), "view", 2.0, 2L))
      q.processAllAvailable()
      val ids = spark.table("dedup").collect().map(_.getAs[Long]("event_id")).sorted
      assert(ids.toSeq === Seq(1L, 2L))
    } finally q.stop()
  }

  case class Doc(doc_id: Long, text: String)

  test("streaming ingestion dedups against the store's fingerprint history across batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-ingest").toString
    val in = MemoryStream[Doc]
    val q = in.toDF().writeStream
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-ingest-ckpt").toString)
      .foreachBatch(StreamOps.ingestDedupBatch(root, "corpus", "fingerprints") _)
      .start()
    try {
      // batch 1: two distinct texts plus a batch-local duplicate
      in.addData(Doc(1L, "alpha"), Doc(2L, "beta"), Doc(3L, "alpha"))
      q.processAllAvailable()
      def corpus(): Seq[(Long, String)] =
        spark.read.format("dynamo").option("path", root)
          .option("tableName", "corpus").load()
          .select("doc_id", "text").collect()
          .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
      val afterB1 = corpus()
      assert(afterB1.map(_._2).sorted === Seq("alpha", "beta"))
      // batch 2: one historical duplicate (different doc_id, same
      // text) + one genuinely new doc — only the new one lands
      in.addData(Doc(4L, "beta"), Doc(5L, "gamma"))
      q.processAllAvailable()
      val afterB2 = corpus()
      assert(afterB2.map(_._2).sorted === Seq("alpha", "beta", "gamma"))
      assert(!afterB2.exists(_._1 == 4L), "historical duplicate was re-admitted")
      // batch 3: ONLY duplicates → nothing appended, nothing fails
      in.addData(Doc(6L, "alpha"), Doc(7L, "gamma"))
      q.processAllAvailable()
      assert(corpus() === afterB2)
      // the fingerprint table tracks exactly the admitted texts
      val fps = spark.read.format("dynamo").option("path", root)
        .option("tableName", "fingerprints").load().count()
      assert(fps === 3L)
      // batch 4 — CRASHED prior delivery: a publisher died between
      // its per-table pending publishes and the commit marker. The
      // orphans are invisible (no marker), so the REPLAYED delivery
      // must re-run the chunk whole and admit the doc exactly once —
      // the crash-point-independence the cross-table transaction buys
      // (two independent table writes would re-admit or lose here).
      import graft.sources.dynamo.{AttrVal, ItemJson}
      val md = java.security.MessageDigest.getInstance("SHA-256")
      val deltaFp = md.digest("delta".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val txnId = "00abad1dea00dead"
      val pub = System.currentTimeMillis() + 800000L
      def pend(table: String, item: Map[String, AttrVal]): Unit = {
        val line = ItemJson.write(Map(
          "op" -> (AttrVal.S("PUT"): AttrVal),
          "item" -> (AttrVal.M(item): AttrVal)))
        java.nio.file.Files.write(
          java.nio.file.Paths.get(root, table,
            f"wal-$pub%020d-dead.x$txnId-sall.jsonl"),
          (line + "\n").getBytes("UTF-8"))
      }
      pend("corpus", Map(
        "doc_id" -> AttrVal.N(BigDecimal(8)), "text" -> AttrVal.S("delta")))
      pend("fingerprints", Map("fp" -> AttrVal.S(deltaFp)))
      in.addData(Doc(8L, "delta"))
      q.processAllAvailable()
      val afterB4 = corpus()
      assert(afterB4.count(_._2 == "delta") === 1,
        s"crash replay must admit exactly once: $afterB4")
      assert(afterB4.exists(r => r._1 == 8L && r._2 == "delta"))
    } finally q.stop()
  }

  test("streaming near-dup ingestion rejects MinHash-near documents across batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-nd").toString
    val in = MemoryStream[Doc]
    val q = in.toDF().writeStream
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-nd-ckpt").toString)
      .foreachBatch(StreamOps.ingestNearDupBatch(root, "nd_corpus",
        "nd_sigs", "nd_bands") _)
      .start()
    // 20-token base text; the near variant changes ONE token
    // (Jaccard ≈ 19/21 ≈ 0.90 → sketch agreement far above 0.5);
    // the distinct text shares nothing.
    val base = (1 to 20).map(i => s"tok$i").mkString(" ")
    val near = ((1 to 19).map(i => s"tok$i") :+ "tokX").mkString(" ")
    val other = (1 to 20).map(i => s"zz$i").mkString(" ")
    try {
      def corpus(): Seq[Long] =
        spark.read.format("dynamo").option("path", root)
          .option("tableName", "nd_corpus").load()
          .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      // Batch 1: base + an in-batch near-dup of it → only base admits.
      in.addData(Doc(1L, base), Doc(2L, near))
      q.processAllAvailable()
      assert(corpus() == Seq(1L), "in-batch near-dup must resolve to bucket-min")
      // Batch 2: a HISTORICAL near-dup (vs batch 1) + a distinct doc.
      in.addData(Doc(3L, near), Doc(4L, other))
      q.processAllAvailable()
      assert(corpus() == Seq(1L, 4L), "historical near-dup must be rejected")
      // Batch 3: redelivery of an admitted doc → rejected by its own
      // registered signature (agreement 1.0), corpus unchanged.
      in.addData(Doc(5L, base))
      q.processAllAvailable()
      assert(corpus() == Seq(1L, 4L), "replayed content must not double-admit")
    } finally q.stop()
  }

  test("near-dup ingestion crash replay: orphan pendings are invisible, admission is exactly-once") {
    // Mirror of the exact-dedup crash law for the THREE-table
    // near-dup transaction (corpus + signatures + band postings):
    // a publisher that died between its per-table pending publishes
    // and the commit marker leaves unmarked orphans in all three
    // tables. They must be invisible (no half-registered documents),
    // the REPLAYED delivery must admit the doc exactly once, and the
    // history probe must then see its bands/signature — a later
    // near-duplicate rejects. Three independent appends failed both
    // ways here: doc-without-bands admitted future near-dups,
    // bands-without-doc lost the document.
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-nd-crash").toString
    val in = MemoryStream[Doc]
    val q = in.toDF().writeStream
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-nd-crash-ckpt").toString)
      .foreachBatch(StreamOps.ingestNearDupBatch(root, "nd_corpus",
        "nd_sigs", "nd_bands") _)
      .start()
    val base = (1 to 20).map(i => s"crash$i").mkString(" ")
    val near = ((1 to 19).map(i => s"crash$i") :+ "crashX").mkString(" ")
    try {
      def corpus(): Seq[Long] =
        spark.read.format("dynamo").option("path", root)
          .option("tableName", "nd_corpus").load()
          .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      // batch 1 creates the tables so the orphans have dirs to land in
      in.addData(Doc(1L, (1 to 20).map(i => s"seed$i").mkString(" ")))
      q.processAllAvailable()
      assert(corpus() == Seq(1L))
      // hand-plant the crashed delivery: pendings in ALL THREE tables
      // under one txn id, NO commit marker
      import graft.sources.dynamo.{AttrVal, ItemJson}
      val txnId = "0000dead0000beef"
      val pub = System.currentTimeMillis() + 800000L
      def pend(table: String, items: Seq[Map[String, AttrVal]]): Unit = {
        val lines = items.map(item => ItemJson.write(Map(
          "op" -> (AttrVal.S("PUT"): AttrVal),
          "item" -> (AttrVal.M(item): AttrVal)))).mkString("", "\n", "\n")
        java.nio.file.Files.write(
          java.nio.file.Paths.get(root, table,
            f"wal-$pub%020d-dead.x$txnId-sall.jsonl"),
          lines.getBytes("UTF-8"))
      }
      pend("nd_corpus", Seq(Map(
        "doc_id" -> AttrVal.N(BigDecimal(2)), "text" -> AttrVal.S(base))))
      pend("nd_sigs", Seq(Map("doc_id" -> AttrVal.N(BigDecimal(2))) ++
        (0 until graft.queries.Dedup.minhashSize).map(i =>
          s"mh$i" -> (AttrVal.N(BigDecimal(i)): AttrVal))))
      pend("nd_bands", Seq(Map(
        "bb" -> AttrVal.S("0:planted"),
        "doc_id" -> AttrVal.N(BigDecimal(2)))))
      // the orphans are invisible: the corpus still reads {1}
      assert(corpus() == Seq(1L), "unmarked pendings must stay invisible")
      // redelivered batch: doc 2 must admit EXACTLY once (the orphan
      // never counts), and its registration must be complete
      in.addData(Doc(2L, base))
      q.processAllAvailable()
      val after = corpus()
      assert(after == Seq(1L, 2L), s"crash replay must admit exactly once: $after")
      // the history probe sees the admitted doc: a near-duplicate of
      // it rejects even though doc 2's only durable registration came
      // from the replayed transaction
      in.addData(Doc(3L, near))
      q.processAllAvailable()
      assert(corpus() == Seq(1L, 2L),
        "bands/sigs of the replayed admission must reject its near-dup")
      // and every admitted doc is fully registered: one signature row
      // per corpus doc (no doc-without-sig or sig-without-doc)
      val sigIds = spark.read.format("dynamo").option("path", root)
        .option("tableName", "nd_sigs").load()
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(sigIds == Seq(1L, 2L), s"signature table drifted: $sigIds")
    } finally q.stop()
  }

  test("the CDC feed admits a cross-table transaction atomically at its commit marker") {
    import graft.sources.dynamo.{AttrVal, ItemJson, LocalKVStore, TableMeta}
    import graft.sources.dynamo.Implicits._
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val root = Files.createTempDirectory("graft-cdc-xtxn").toString
    val store = new LocalKVStore(root)
    store.createTable("ta", TableMeta("id", None, shards = 2, throughput = 1000000L))
    def put(k: String, seqOff: Long): Unit =
      store.appendWal("ta", System.currentTimeMillis() + seqOff, s"w$seqOff",
        Seq(store.Put(Map("id" -> (AttrVal.S(k): AttrVal)))))
    val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    put("r1", 0L)
    val q = spark.readStream.dynamoStream(root, "ta", cdc = true)
      .writeStream
      .option("checkpointLocation",
        Files.createTempDirectory("graft-cdc-xtxn-ckpt").toString)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.select("id").collect().foreach(r => seen.add(r.getString(0)))
        ()
      }
      .start()
    try {
      q.processAllAvailable()
      assert(seen.contains("r1"))
      // in-flight cross-table transaction: its pending file is
      // published (pubSeq assigned) but the commit marker has not
      // landed — the feed must neither deliver it NOR advance past
      // its pubSeq onto later writes (they would commit out of order)
      val txnId = "00c0ffee00c0ffee"
      val pub = System.currentTimeMillis()
      val line = ItemJson.write(Map(
        "op" -> (AttrVal.S("PUT"): AttrVal),
        "item" -> (AttrVal.M(Map("id" -> AttrVal.S("r2"))): AttrVal)))
      Files.write(Paths.get(root, "ta",
        f"wal-$pub%020d-w9.x$txnId-sall.jsonl"), (line + "\n").getBytes("UTF-8"))
      Thread.sleep(5)
      put("r3", 10L)
      Thread.sleep(15)
      q.processAllAvailable()
      assert(!seen.contains("r2") && !seen.contains("r3"),
        s"the frontier must hold below an unmarked pending transaction: $seen")
      // ONE marker rename commits: the transaction AND the later
      // write both flow on the next batch, in pubSeq order
      val tmp = Paths.get(root, s".txn-commit-$txnId.tmp")
      Files.write(tmp, Array.empty[Byte])
      Files.move(tmp, Paths.get(root, s".txn-commit-$txnId"),
        StandardCopyOption.ATOMIC_MOVE)
      Thread.sleep(15)
      q.processAllAvailable()
      assert(seen.contains("r2") && seen.contains("r3"), s"got $seen")
    } finally q.stop()
  }

  test("LAW: a resumed CDC stream replays exactly from its offset or fails LOUDLY on a folded gap") {
    import graft.sources.dynamo.{AttrVal, LocalKVStore, TableMeta}
    import graft.sources.dynamo.Implicits._
    import java.nio.file.Files
    val root = Files.createTempDirectory("graft-cdc-fold").toString
    val store = new LocalKVStore(root)
    store.createTable("tf", TableMeta("id", None, shards = 2, throughput = 1000000L))
    def put(k: String, seqOff: Long): Unit =
      store.appendWal("tf", System.currentTimeMillis() + seqOff, s"w$seqOff",
        Seq(store.Put(Map("id" -> (AttrVal.S(k): AttrVal)))))
    val ckpt = Files.createTempDirectory("graft-cdc-fold-ckpt").toString
    val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    def startQ() = spark.readStream.dynamoStream(root, "tf", cdc = true)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.select("id").collect().foreach(r => seen.add(r.getString(0)))
        ()
      }.start()
    // ---- healthy resume: fold only what the checkpoint already saw ----
    (0 until 5).foreach(i => put(s"a$i", i.toLong))
    Thread.sleep(15)
    val q1 = startQ()
    try { q1.processAllAvailable() } finally q1.stop()
    assert((0 until 5).forall(i => seen.contains(s"a$i")))
    store.compact("tf") // folds exactly the consumed prefix
    (0 until 3).foreach(i => put(s"b$i", 10L + i))
    Thread.sleep(25)
    val q2 = startQ()
    try { q2.processAllAvailable() } finally q2.stop()
    assert((0 until 3).forall(i => seen.contains(s"b$i")),
      s"resume after an already-consumed fold must keep delivering: $seen")
    // ---- gap: fold UNCONSUMED files past the checkpoint ----
    (0 until 3).foreach(i => put(s"c$i", 20L + i))
    store.compact("tf") // deletes the unconsumed c* journal files
    val q3 = startQ()
    val loud = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q3.processAllAvailable(); q3.awaitTermination(2000); ()
    }
    q3.stop()
    assert(loud.getMessage.contains("expired") ||
      Option(loud.getCause).exists(_.getMessage.contains("expired")), {
      def chain(t: Throwable): String =
        if (t == null) "" else t.getMessage + " <- " + chain(t.getCause)
      chain(loud)
    })
    assert(!(0 until 3).exists(i => seen.contains(s"c$i")),
      "folded changes must never be silently skipped OR partially delivered")
    // ---- startingTimestamp landing inside the folded range: loud ----
    val tsLoud = intercept[Exception] {
      spark.readStream.format("dynamo")
        .option("path", root).option("tableName", "tf")
        .option("startingTimestamp",
          (System.currentTimeMillis() - 3600000L).toString)
        .load()
        .writeStream
        .option("checkpointLocation",
          Files.createTempDirectory("graft-cdc-fold-ckpt2").toString)
        .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) => () }
        .start()
        .processAllAvailable()
    }
    def chain(t: Throwable): String =
      if (t == null) "" else t.getMessage + " <- " + chain(t.getCause)
    assert(chain(tsLoud).contains("expired"), chain(tsLoud))
    // a timestamp ABOVE the watermark still starts cleanly
    val okQ = spark.readStream.format("dynamo")
      .option("path", root).option("tableName", "tf")
      .option("startingTimestamp",
        (System.currentTimeMillis() + 60000L).toString)
      .load()
      .writeStream
      .option("checkpointLocation",
        Files.createTempDirectory("graft-cdc-fold-ckpt3").toString)
      .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) => () }
      .start()
    try okQ.processAllAvailable() finally okQ.stop()
  }

  test("LAW: continuous 3-region mesh (CDC-paced foreachBatch) converges to the LWW oracle") {
    // The store-level mesh law (ReplicationSpec), re-run with the
    // STREAMING admission-control path in the loop: every directed
    // edge (i → j) is a real Structured Streaming query — CDC feed of
    // region i gating StreamOps.replicateBatch passes into region j —
    // so trigger pacing, offset bookkeeping, and the per-region
    // watermark discipline are all under the same random-interleaving
    // oracle. Writes land mid-stream in random regions; edges drain
    // in random order; a quiescent round-robin settles relay chains;
    // every region must equal the functional LWW fold.
    import graft.sources.dynamo.{AttrVal, LocalKVStore, Replication, TableMeta}
    import graft.sources.dynamo.Implicits._
    import graft.sources.dynamo.Replication.{RDelete, RPut}
    val meta = TableMeta("id", None, shards = 2, throughput = 1000000L)
    (0 until 2).foreach { seedI =>
      val rnd = new scala.util.Random(41L + seedI)
      val nRegions = 3
      val regions = (0 until nRegions).map(i => s"m$i")
      val roots = regions.map(r => java.nio.file.Files
        .createTempDirectory(s"graft-mesh-$r").toString)
      val stores = roots.map { r =>
        val st = new LocalKVStore(r); st.createTable("t", meta); st
      }
      // one streaming query per directed edge, CDC-paced
      val edges = for {
        i <- regions.indices; j <- regions.indices if i != j
      } yield spark.readStream.dynamoStream(roots(i), "t", cdc = true)
        .writeStream
        .option("checkpointLocation", java.nio.file.Files
          .createTempDirectory(s"graft-mesh-ckpt-$seedI-$i$j").toString)
        .foreachBatch(StreamOps.replicateBatch(
          roots(i), regions(i), roots(j), "t") _)
        .start()
      try {
        final case class TOp(region: Int, ver: Long, k: String, del: Boolean)
        var ver = 100L
        val ops = (0 until 20).map { _ =>
          ver += 1
          TOp(rnd.nextInt(nRegions), ver, s"k${rnd.nextInt(5)}",
            rnd.nextInt(4) == 0)
        }
        ops.foreach { op =>
          val rop = if (op.del) RDelete(Map("id" -> (AttrVal.S(op.k): AttrVal)))
            else RPut(Map("id" -> (AttrVal.S(op.k): AttrVal),
              "v" -> (AttrVal.S(s"v${op.ver}"): AttrVal)))
          Replication.writeStamped(stores(op.region), "t",
            regions(op.region), op.ver,
            System.currentTimeMillis() + op.ver, s"mw${op.ver}", Seq(rop))
          // random mid-stream drains: some edges process, others lag
          if (rnd.nextInt(3) == 0)
            rnd.shuffle(edges.toList).take(2).foreach(_.processAllAvailable())
        }
        // Quiescent drain to a FIXPOINT, not a fixed round count: the
        // edges also self-trigger in background threads, so a batch
        // in flight on edge (2→1) can land its applies into region 1
        // AFTER this loop already drained (1→0) — a fixed N rounds
        // then misses the relay tail (observed under CPU load; the
        // forensic re-sync confirmed the store itself had shipped
        // nothing wrong — watermarks sat exactly below the unshipped
        // files). A round that changes NO region's journal head set
        // shipped nothing and left nothing in flight that could
        // trigger again — that is convergence, WITH one clock caveat:
        // the CDC feed's monotone fence gates names past the wall
        // clock, and this law's LWW stamps ride up to +120 ms in the
        // future (writeStamped then floors applies ABOVE that head,
        // so replb names chase the future stamps too). A no-change
        // round inside that window proves nothing — the files simply
        // aren't eligible yet (the forensics below proved exactly
        // this once: direct passes converged in 1 round). Stability
        // therefore also requires the clock to have passed every
        // published name's eligibility time.
        def heads(): Seq[Set[String]] = stores.map(_.walFileNames("t").toSet)
        def horizon(): Long = stores.flatMap(_.walFileNames("t"))
          .map(_.substring(4, 24).toLong).maxOption.getOrElse(0L)
        var prev = heads()
        var stable = false
        var rounds = 0
        while (!stable && rounds < 24) {
          val wait = horizon() + 2 - System.currentTimeMillis()
          if (wait > 0) Thread.sleep(wait)
          edges.foreach(_.processAllAvailable())
          val cur = heads()
          stable = cur == prev && horizon() < System.currentTimeMillis()
          prev = cur
          rounds += 1
        }
        assert(stable, s"seed $seedI: mesh failed to quiesce in $rounds rounds")
        val oracle = ops.groupBy(_.k).flatMap { case (k, kops) =>
          val win = kops.maxBy(o => (o.ver, regions(o.region)))
          if (win.del) None else Some(k -> s"v${win.ver}")
        }
        def state(st: LocalKVStore): Map[String, String] =
          st.scanSegment("t", 0, 1).map { case (it, _) =>
            it("id").asInstanceOf[AttrVal.S].v ->
              it("v").asInstanceOf[AttrVal.S].v
          }.toMap
        stores.zipWithIndex.foreach { case (st, i) =>
          if (state(st) != oracle) {
            // FORENSICS: distinguish "watermark skipped data" (a pass
            // now finds nothing yet state stays wrong — store bug)
            // from "the streaming drain stopped early" (direct passes
            // converge — pacing/liveness bug). Capture the diverged
            // state BEFORE the repair passes mutate it, dump listings,
            // then run direct store-level incremental rounds.
            val got0 = state(st)
            val listing = stores.zipWithIndex.map { case (s2, r) =>
              s"${regions(r)}: wal=${s2.walFileNames("t").mkString(",")}"
            }.mkString("\n")
            var k = 0
            val extra = new scala.util.Random(7)
            while (state(st) != oracle && k < 2 * nRegions) {
              for (a <- regions.indices; b <- regions.indices if a != b)
                Replication.syncIncremental(stores(a), regions(a),
                  stores(b), "t", System.currentTimeMillis() + extra.nextInt(3),
                  s"fx$a$b$k")
              k += 1
            }
            val verdict =
              if (state(st) == oracle)
                s"DIRECT store-level passes CONVERGED after $k rounds — " +
                  "the STREAMING drain stopped early (pacing bug)"
              else "direct passes DO NOT converge — watermark skipped data (store bug)"
            fail(s"seed $seedI: region ${regions(i)} diverged under " +
              s"streaming mesh.\n$verdict\ngot=$got0\noracle=$oracle\n$listing")
          }
        }
      } finally edges.foreach(_.stop())
    }
  }

  test("continuous replication: the CDC feed drives incremental sync to a replica") {
    import graft.sources.dynamo.{AttrVal, LocalKVStore, Replication, TableMeta}
    import graft.sources.dynamo.Implicits._
    import graft.sources.dynamo.Replication.{RDelete, RPut}
    val srcRoot = java.nio.file.Files.createTempDirectory("graft-repl-src").toString
    val dstRoot = java.nio.file.Files.createTempDirectory("graft-repl-dst").toString
    val meta = TableMeta("id", None, shards = 4, throughput = 1000000L)
    val src = new LocalKVStore(srcRoot)
    val dst = new LocalKVStore(dstRoot)
    src.createTable("t", meta)
    dst.createTable("t", meta)
    def put(k: String, v: String, ver: Long): Unit =
      Replication.writeStamped(src, "t", "regA", ver,
        System.currentTimeMillis() + ver, s"w$ver",
        Seq(RPut(Map("id" -> AttrVal.S(k), "v" -> AttrVal.S(v)))))
    put("a", "1", 1)
    val q = spark.readStream.dynamoStream(srcRoot, "t", cdc = true)
      .writeStream
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-repl-ckpt").toString)
      .foreachBatch(StreamOps.replicateBatch(srcRoot, "regA", dstRoot, "t") _)
      .start()
    try {
      q.processAllAvailable()
      def state(st: LocalKVStore): Map[String, String] =
        st.scanSegment("t", 0, 1).map { case (it, _) =>
          it("id").asInstanceOf[AttrVal.S].v ->
            it("v").asInstanceOf[AttrVal.S].v
        }.toMap
      assert(state(dst) == Map("a" -> "1"), "bootstrap batch must replicate")
      put("b", "2", 2); put("a", "3", 3)
      q.processAllAvailable()
      assert(state(dst) == Map("a" -> "3", "b" -> "2"),
        "new writes ship on the next micro-batch")
      Replication.writeStamped(src, "t", "regA", 4,
        System.currentTimeMillis() + 4, "w4", Seq(RDelete(Map("id" -> AttrVal.S("b")))))
      q.processAllAvailable()
      assert(state(dst) == Map("a" -> "3"), "deletes propagate with tombstones")
      assert(Replication.tombstones(dst, "t").nonEmpty)
    } finally q.stop()
  }
}
