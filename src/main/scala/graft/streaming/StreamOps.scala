package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Structured-Streaming transforms (SURVEY.md §2B B-10). Batch-mode
  * twins of the window math live in `queries.Streaming` (same window
  * semantics, DuckDB-oracled); these are the `readStream`-side shapes
  * with watermarks, i.e. what actually runs on an unbounded stream.
  * StreamingSpec drives them through MemoryStream and pins the
  * incremental behaviors the batch oracle can't see: append-mode
  * finalization, late-data dropping, state cleanup via watermark.
  *
  * Scale notes: every transform keys state by a bounded quantity —
  * (window × type) for tumbling/sliding, (user, open session) for
  * sessions, event_id within the watermark horizon for dedup. The
  * watermark is what makes state finite on an unbounded stream; all
  * four run identically on a 1000-executor cluster because state is
  * hash-partitioned by group key.
  */
object StreamOps {

  /** 1-hour tumbling counts + value sums per event type. */
  def tumblingCounts(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sum_val"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("cnt"), col("sum_val"))

  /** 1-hour windows sliding every 15 minutes (each event expands to 4
    * epoch-aligned windows map-side, exactly like the batch twin).
    */
  def slidingCounts(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("win_start"), col("cnt"))

  /** Per-user session windows with a 30-minute gap; a session closes
    * (and its state is freed) once the watermark passes last-event
    * ts + gap.
    */
  def sessionCounts(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("user_id"),
        col("session_window.start").as("sess_start"),
        col("session_window.end").as("sess_end"), col("cnt"))

  /** Exactly-once-per-id event stream: duplicates of `event_id` are
    * suppressed for as long as the id can still arrive (the watermark
    * horizon), then state is dropped — the streaming analogue of the
    * batch `q_dedup_events` window.
    */
  def dedupEvents(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream inner join with an event-time interval: each click
    * pairs with the same user's views from the preceding `horizon`.
    * Watermarks on BOTH sides + the time-range predicate are what let
    * the engine bound join state: a buffered view is droppable once
    * the click watermark passes view_ts + horizon, so state per user
    * is one horizon's worth of events, not the stream's history —
    * the canonical attribution-join shape at any scale.
    */
  def clickViewJoin(
      clicks: DataFrame, views: DataFrame,
      horizon: String = "10 minutes", watermark: String = "5 minutes"): DataFrame = {
    val c = clicks.withWatermark("ts", watermark)
      .select(col("user_id"), col("ts").as("click_ts"), col("event_id").as("click_id"))
    val v = views.withWatermark("ts", watermark)
      .select(col("user_id").as("v_user"), col("ts").as("view_ts"),
        col("event_id").as("view_id"))
    c.join(v,
      col("user_id") === col("v_user") &&
        col("view_ts") <= col("click_ts") &&
        col("view_ts") >= col("click_ts") - expr(s"INTERVAL $horizon"))
      .select(col("user_id"), col("click_id"), col("view_id"),
        col("click_ts"), col("view_ts"))
  }

  /** LEFT OUTER form of [[clickViewJoin]]: every click emits, matched
    * or not — but an unmatched click's null-extended row can only be
    * FINAL once no future view could still match it, so the engine
    * holds it until the VIEW-side watermark passes `click_ts` (the
    * condition's lower bound) and emits the null row then. This is
    * the one outer-join shape streaming can do exactly: the time-range
    * predicate + both watermarks bound how long "no match yet" stays
    * provisional, so state AND result latency are one horizon, not
    * the stream's history. The attribution use: clicks that converted
    * vs clicks with no preceding view, one query.
    */
  def clickViewJoinLeftOuter(
      clicks: DataFrame, views: DataFrame,
      horizon: String = "10 minutes", watermark: String = "5 minutes"): DataFrame = {
    val c = clicks.withWatermark("ts", watermark)
      .select(col("user_id"), col("ts").as("click_ts"), col("event_id").as("click_id"))
    val v = views.withWatermark("ts", watermark)
      .select(col("user_id").as("v_user"), col("ts").as("view_ts"),
        col("event_id").as("view_id"))
    c.join(v,
      col("user_id") === col("v_user") &&
        col("view_ts") <= col("click_ts") &&
        col("view_ts") >= col("click_ts") - expr(s"INTERVAL $horizon"),
      "leftOuter")
      .select(col("user_id"), col("click_id"), col("view_id"),
        col("click_ts"), col("view_ts"))
  }

  /** FULL OUTER form of [[clickViewJoin]], completing the stream-stream
    * join family: unmatched rows on EITHER side null-extend once the
    * OTHER side's watermark proves no partner can still arrive — an
    * unmatched click waits for the view watermark to pass `click_ts`
    * (the condition's lower bound on views), an unmatched view waits
    * for the click watermark to pass `view_ts + horizon` (the derived
    * upper bound on clicks). Both directions are watermark-bounded, so
    * state and result latency stay one horizon on each side. The
    * audit-join use: conversions, orphan clicks AND orphan views in a
    * single query — the reconciliation report shape.
    */
  def clickViewJoinFullOuter(
      clicks: DataFrame, views: DataFrame,
      horizon: String = "10 minutes", watermark: String = "5 minutes"): DataFrame = {
    val c = clicks.withWatermark("ts", watermark)
      .select(col("user_id"), col("ts").as("click_ts"), col("event_id").as("click_id"))
    val v = views.withWatermark("ts", watermark)
      .select(col("user_id").as("v_user"), col("ts").as("view_ts"),
        col("event_id").as("view_id"))
    c.join(v,
      col("user_id") === col("v_user") &&
        col("view_ts") <= col("click_ts") &&
        col("view_ts") >= col("click_ts") - expr(s"INTERVAL $horizon"),
      "fullOuter")
      .select(coalesce(col("user_id"), col("v_user")).as("user_id"),
        col("click_id"), col("view_id"), col("click_ts"), col("view_ts"))
  }

  /** Custom per-key state via `mapGroupsWithState` (the extension point
    * windowed aggregation can't reach): lifetime running count + value
    * sum per event type, re-emitted each micro-batch the key appears in
    * (update output mode). State is one (Long, Double) per distinct
    * event type — bounded by key cardinality, hash-partitioned across
    * executors like any keyed state; an unbounded keyspace would use
    * `GroupStateTimeout.ProcessingTimeTimeout` + `state.remove()` to
    * bound it (same callback, one more branch).
    */
  def runningTotals(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events.selectExpr("event_type", "value").as[(String, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState[(Long, Double), (String, Long, Double)](
        GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, Double)], state: GroupState[(Long, Double)]) =>
          var (cnt, sum) = state.getOption.getOrElse((0L, 0.0))
          rows.foreach { case (_, v) => cnt += 1; sum += v }
          state.update((cnt, sum))
          (key, cnt, math.rint(sum * 100) / 100)
      }
      .toDF("event_type", "cnt", "sum_val")
  }

  /** Custom sessionization via `flatMapGroupsWithState` — the full
    * custom-state surface: zero-or-more outputs per group per batch,
    * event-time timeout driven by the watermark. Semantically twins
    * `sessionCounts` (session end = last event + gap), but hand-rolled
    * state shows the shape `session_window` can't express (e.g.
    * emitting enriched session records, early partial emits).
    *
    * State per user = one open session (startMs, lastMs, count) —
    * O(1) per key, freed on timeout, hash-partitioned by user across
    * executors. A session closes either in-batch (a later event
    * exceeds the gap) or when the watermark passes last + gap
    * (`setTimeoutTimestamp` → `hasTimedOut` branch).
    */
  def sessionize(
      events: DataFrame,
      gapMs: Long = 30L * 60 * 1000,
      watermark: String = "10 minutes"): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events.withWatermark("ts", watermark)
      .selectExpr("user_id", "ts").as[(Long, Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, Long), (Long, Timestamp, Timestamp, Long)](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[(Long, Timestamp)], state: GroupState[(Long, Long, Long)]) =>
          if (state.hasTimedOut) {
            val (start, last, cnt) = state.get
            state.remove()
            Iterator((user, new Timestamp(start), new Timestamp(last + gapMs), cnt))
          } else {
            val times = rows.map(_._2.getTime).toArray.sorted
            val closed = scala.collection.mutable.ArrayBuffer
              .empty[(Long, Timestamp, Timestamp, Long)]
            var cur = state.getOption
            times.foreach { t =>
              cur = cur match {
                case Some((s, l, c)) if t - l <= gapMs =>
                  Some((math.min(s, t), math.max(l, t), c + 1))
                case Some((s, l, c)) =>
                  closed += ((user, new Timestamp(s), new Timestamp(l + gapMs), c))
                  Some((t, t, 1L))
                case None => Some((t, t, 1L))
              }
            }
            cur.foreach { st =>
              state.update(st)
              state.setTimeoutTimestamp(st._2 + gapMs)
            }
            closed.iterator
          }
      }
      .toDF("user_id", "sess_start", "sess_end", "cnt")
  }

  /** Per-key high-water-mark detector on Spark 4's `transformWithState`
    * (the arbitrary-state API succeeding *GroupsWithState): emits a row
    * ONLY when a key's running max increases — zero-or-one outputs per
    * key per batch, a shape windowed aggregation can't express and
    * `mapGroupsWithState` (exactly-one-output) can't either. State =
    * one `ValueState[Double]` per key in the RocksDB provider; a TTL
    * (`TTLConfig`) would bound an unbounded keyspace with no code
    * change. Requires
    * `spark.sql.streaming.stateStore.providerClass=...RocksDBStateStoreProvider`.
    */
  def highWaterMarks(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events.selectExpr("event_type", "value").as[(String, Double)]
      .groupByKey(_._1)
      .transformWithState(new HighWaterMark, TimeMode.None(), OutputMode.Update())
      .toDF("event_type", "hwm")
  }

  /** Streaming corpus ingestion with HISTORICAL dedup: one micro-batch
    * of documents (must carry `doc_id` and `text`) collapses its
    * batch-local duplicates, anti-joins against the store's
    * fingerprint table (every sha-256 ever admitted), appends only the
    * unseen documents to `dest`, and registers their fingerprints —
    * the q_dedup_incremental shape run per-batch on an unbounded feed,
    * with the connector as the durable dedup state. Wire it as
    * `docsStream.writeStream.foreachBatch(ingestDedupBatch(root, dest,
    * fpTable) _)`.
    *
    * Scale notes: the history probe is a digest-keyed anti-join —
    * constant-width keys, the history side arrives hash-sharded by
    * digest (its table hash key IS `fp`) — and the batch side is
    * micro-batch-sized; nothing rescans the corpus. The fresh set is
    * eagerly materialized BEFORE the writes: they would otherwise
    * re-evaluate the anti-join against the fingerprint table they
    * update and observe their own writes (empty set).
    *
    * Atomicity (round 11): a document and its fingerprint commit in
    * ONE cross-table transaction ([[graft.sources.dynamo.LocalKVStore.transactWriteMulti]],
    * 50-doc chunks, committed from executors in parallel). Two
    * separate table writes left a crash window with REAL failure
    * modes on redelivery: documents admitted without fingerprints
    * re-admit as duplicates, fingerprints registered without
    * documents LOSE the documents to the anti-join forever. With the
    * shared commit marker both halves land or neither does, so the
    * replayed batch either finds the fingerprints (skips exactly the
    * committed chunk) or re-runs it whole — idempotent per batch
    * content, now crash-point-independent.
    */
  def ingestDedupBatch(root: String, dest: String, fpTable: String)(
      batch: DataFrame, batchId: Long): Unit = {
    import graft.sources.dynamo.{AttrVal, LocalKVStore, TableMeta, TableTxn}
    val s = batch.sparkSession
    // a null hash key cannot be Put (the whole 50-doc transaction
    // would abort at key validation), and a null text has no
    // fingerprint to dedup on — reject both up front
    val candidates = batch
      .filter(col("doc_id").isNotNull && col("text").isNotNull)
      .withColumn("fp", sha2(col("text"), 256))
      .dropDuplicates("fp")
    val store = new LocalKVStore(root)
    val fresh = (if (store.exists(fpTable))
      candidates.join(
        s.read.format("dynamo").option("path", root)
          .option("tableName", fpTable).load().select("fp"),
        Seq("fp"), "left_anti")
    else candidates).localCheckpoint(true)
    if (!fresh.isEmpty) {
      if (!store.exists(dest))
        store.createTable(dest,
          TableMeta("doc_id", None, shards = 16, throughput = 1000000L))
      if (!store.exists(fpTable))
        store.createTable(fpTable,
          TableMeta("fp", None, shards = 16, throughput = 1000000L))
      val schema = fresh.schema
      fresh.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
        val st = new LocalKVStore(root)
        val encode = rowItemEncoder(schema)
        val pid = org.apache.spark.TaskContext.getPartitionId()
        rows.grouped(50).zipWithIndex.foreach { case (chunk, ci) =>
          val items = chunk.map(encode)
          val docOps = items.map(it => st.Put(it - "fp"))
          val fpOps = items.map(it => st.Put(Map("fp" -> it("fp"))))
          st.transactWriteMulti(Seq(
            TableTxn(dest, docOps), TableTxn(fpTable, fpOps)),
            System.currentTimeMillis(), f"ing-b$batchId%05d-p$pid%04d-c$ci%04d")
        }
      }
    }
  }

  /** External `Row` → wire item via the CONNECTOR's own codec
    * ([[graft.sources.dynamo.Codec.rowWriter]] behind Spark's
    * external→Catalyst converter): the ingesters' Puts then carry
    * exactly what the DSv2 append path would have written — arrays,
    * structs, maps, dates, and the Java 8 datetime types included,
    * timestamps in the same micros encoding a scan reads back — and
    * an unmapped type fails LOUDLY at encoder construction instead
    * of silently dropping the attribute. Nulls are kept as
    * `AttrVal.Null` (Put replaces the whole item; a null column IS
    * the item's content — the DSv2 Put rule).
    */
  private def rowItemEncoder(schema: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.Row => graft.sources.dynamo.ItemJson.Item = {
    val toCatalyst = org.apache.spark.sql.catalyst.CatalystTypeConverters
      .createToCatalystConverter(schema)
    val write = graft.sources.dynamo.Codec.rowWriter(schema)
    r => write(toCatalyst(r)
      .asInstanceOf[org.apache.spark.sql.catalyst.InternalRow])
  }

  /** Streaming NEAR-duplicate ingestion: admit each micro-batch's
    * documents only if they are not MinHash-near-duplicates of the
    * corpus ingested SO FAR — without ever rescanning that corpus.
    * The connector holds the dedup state as two tables:
    * `<sigTable>` (hash key `doc_id` → the 12 minhash minima) and
    * `<bandTable>` (hash key `bb` = band:signature bucket, range key
    * `doc_id`) — so the history probe is an equi-join on the band
    * table's OWN hash key (bucket-sharded, SPJ/broadcast-friendly;
    * only colliding buckets' rows are touched at any scale), and a
    * candidate's verification reads just the matched docs' stored
    * signatures, never their text. Jaccard is estimated as the
    * fraction of agreeing minima (≥ `threshold` ⇒ duplicate; LSH
    * banding guarantees high-Jaccard pairs collide in some bucket).
    * Batch-local near-dups resolve by bucket-min doc_id before the
    * history probe. Replay-idempotent for free: a redelivered batch's
    * docs match their own registered signatures (agreement 1.0) and
    * are rejected, so `dest` never double-admits — the same
    * fingerprint-table contract [[ingestDedupBatch]] pins for exact
    * dedup, lifted to near-dup. Wire as
    * `docsStream.writeStream.foreachBatch(ingestNearDupBatch(root,
    * "corpus", "nd_sigs", "nd_bands") _)`.
    */
  def ingestNearDupBatch(root: String, dest: String, sigTable: String,
      bandTable: String, threshold: Double = 0.5)(
      batch: DataFrame, batchId: Long): Unit = {
    import graft.queries.Dedup
    import graft.sources.dynamo.{AttrVal, LocalKVStore, TableMeta, TableTxn}
    val s = batch.sparkSession
    val docs = batch.select("doc_id", "text")
      .filter(col("doc_id").isNotNull && col("text").isNotNull)
      .dropDuplicates("doc_id")
    if (docs.isEmpty) return
    val sigs = Dedup.minhashSigs(Dedup.tokIds(docs)).localCheckpoint(true)
    val bands = Dedup.bandsOfSigs(sigs)
      .withColumn("bb", concat_ws(":", col("band"), col("bkey")))
      .select(col("doc_id"), col("bb"))
    val mhCols = (0 until Dedup.minhashSize).map(i => s"mh$i")
    def agreement(l: String, r: String) =
      mhCols.map(c => when(col(s"$l.$c") === col(s"$r.$c"), 1).otherwise(0))
        .reduce(_ + _).cast("double") / Dedup.minhashSize

    // Batch-local near-dups: inside each bucket only the min doc_id
    // survives as admit candidate IF the agreement verifies.
    val localPairs = bands.as("x").join(bands.as("y"),
        col("x.bb") === col("y.bb") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("keep"), col("y.doc_id").as("drop_c"))
      .distinct()
    val localDrops = localPairs
      .join(sigs.as("l"), col("keep") === col("l.doc_id"))
      .join(sigs.as("r"), col("drop_c") === col("r.doc_id"))
      .filter(agreement("l", "r") >= threshold)
      .select(col("drop_c").as("doc_id")).distinct()

    val store = new graft.sources.dynamo.LocalKVStore(root)
    // History probe: bucket-keyed join against the band table, then
    // signature-agreement verification against the sig table.
    val histDrops = if (store.exists(bandTable)) {
      val histBands = s.read.format("dynamo").option("path", root)
        .option("tableName", bandTable).load()
        .select(col("bb"), col("doc_id").as("old_doc"))
      val cand = bands.join(histBands, Seq("bb"))
        .select("doc_id", "old_doc").distinct()
      val histSigs = s.read.format("dynamo").option("path", root)
        .option("tableName", sigTable).load()
      cand.join(sigs.as("l"), Seq("doc_id"))
        .join(histSigs.withColumnRenamed("doc_id", "hist_id").as("r"),
          col("old_doc") === col("hist_id"))
        .filter(agreement("l", "r") >= threshold)
        .select("doc_id").distinct()
    } else s.range(0).select(col("id").as("doc_id"))

    val admitted = docs
      .join(localDrops.union(histDrops), Seq("doc_id"), "left_anti")
      .localCheckpoint(true) // freeze BEFORE the writes below register
    if (!admitted.isEmpty) {
      // Crash atomicity (round 12): an admitted document, its
      // signature row, and ALL its band postings commit in ONE
      // cross-table transaction. The previous three independent
      // appends left a crash window in which a document was admitted
      // but invisible to the history probe (missing band/sig rows) —
      // its future near-duplicates would then admit. One row per doc
      // carries the whole write (text + 12 minima + collected bucket
      // list), chunked so 8 ops/doc stays inside the 100-op
      // TransactWriteItems bound; chunks commit from executors in
      // parallel, and a crash replays to either "fully registered —
      // rejected as its own near-dup" or "absent — re-admitted once".
      if (!store.exists(dest))
        store.createTable(dest,
          TableMeta("doc_id", None, shards = 16, throughput = 1000000L))
      if (!store.exists(sigTable))
        store.createTable(sigTable,
          TableMeta("doc_id", None, shards = 16, throughput = 1000000L))
      if (!store.exists(bandTable))
        store.createTable(bandTable,
          TableMeta("bb", Some("doc_id"), shards = 16, throughput = 1000000L))
      val payload = admitted
        .join(sigs, Seq("doc_id"))
        .join(bands.groupBy("doc_id")
          .agg(collect_list(col("bb")).as("bbs")), Seq("doc_id"))
      val schema = payload.schema
      val sigFields = Set("doc_id") ++ mhCols
      payload.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
        val st = new LocalKVStore(root)
        val encode = rowItemEncoder(schema)
        val pid = org.apache.spark.TaskContext.getPartitionId()
        rows.grouped(12).zipWithIndex.foreach { case (chunk, ci) =>
          val items = chunk.map(encode)
          val docOps = items.map(it => st.Put(Map(
            "doc_id" -> it("doc_id"), "text" -> it("text"))))
          val sigOps = items.map(it =>
            st.Put(it.view.filterKeys(sigFields).toMap))
          val bandOps = items.flatMap { it =>
            val bbs = it("bbs") match {
              case AttrVal.L(vs) => vs
              case other => throw new IllegalStateException(
                s"band bucket list decoded as $other")
            }
            bbs.map(bb => st.Put(Map("bb" -> bb, "doc_id" -> it("doc_id"))))
          }
          st.transactWriteMulti(Seq(
            TableTxn(dest, docOps), TableTxn(sigTable, sigOps),
            TableTxn(bandTable, bandOps)),
            System.currentTimeMillis(), f"ndg-b$batchId%05d-p$pid%04d-c$ci%04d")
        }
      }
    }
  }

  /** CONTINUOUS Global-Tables replication: wire the source table's
    * change feed to an incremental sync pass per micro-batch —
    * `spark.readStream.dynamoStream(srcRoot, table, cdc = true)
    * .writeStream.foreachBatch(StreamOps.replicateBatch(srcRoot,
    * "regA", dstRoot, table) _)`. The CDC rows are deliberately
    * UNUSED as data: they gate WHEN a pass runs (admission control,
    * trigger pacing, availability of new journal entries), while the
    * shipping itself is journal-to-journal
    * ([[graft.sources.dynamo.Replication.syncIncremental]]) — exact
    * item fidelity with no row-codec round trip, and the per-region
    * WATERMARK (not the stream offset) decides what ships. That split
    * makes every delivery contract trivial: a replayed batch finds
    * the watermark already advanced and ships nothing (idempotent), a
    * dropped batch's writes ship with the next one (no loss), and a
    * restart from any checkpoint state is safe because LWW applies
    * are order-independent.
    */
  def replicateBatch(srcRoot: String, srcRegion: String, dstRoot: String,
      table: String)(batch: DataFrame, batchId: Long): Unit = {
    val _ = batch // pacing only; see scaladoc
    // the source region rides in the writer id: in a MESH, several
    // edges feed the same destination, and their independent batchId
    // sequences would otherwise collide on (seq, writerId)
    graft.sources.dynamo.Replication.syncIncremental(
      new graft.sources.dynamo.LocalKVStore(srcRoot), srcRegion,
      new graft.sources.dynamo.LocalKVStore(dstRoot), table,
      System.currentTimeMillis(), f"replb-$srcRegion-b$batchId%06d")
  }
}

/** StatefulProcessor for [[StreamOps.highWaterMarks]]. */
final class HighWaterMark
    extends StatefulProcessor[String, (String, Double), (String, Double)] {

  @transient private var hwm: ValueState[Double] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    hwm = getHandle.getValueState[Double]("hwm", Encoders.scalaDouble, TTLConfig.NONE)

  override def handleInputRows(
      key: String,
      rows: Iterator[(String, Double)],
      timers: TimerValues): Iterator[(String, Double)] = {
    val prev = if (hwm.exists()) hwm.get() else Double.NegativeInfinity
    val mx = rows.foldLeft(prev) { case (acc, (_, v)) => math.max(acc, v) }
    if (mx > prev) { hwm.update(mx); Iterator.single((key, mx)) }
    else Iterator.empty
  }
}
