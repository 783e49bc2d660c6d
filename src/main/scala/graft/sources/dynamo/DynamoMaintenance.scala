package graft.sources.dynamo

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

/** Distributed store maintenance. DynamoDB itself compacts internally;
  * our file store surfaces the equivalent as an explicit Spark job so
  * a write-heavy table's journal doesn't grow without bound
  * (scan-time WAL replay is per-segment-proportional either way —
  * compaction just returns scans to the pure-streaming fast path).
  */
object DynamoMaintenance {

  /** Shard-parallel WAL compaction: one task per shard, each merging
    * only its own shard file + journal (bounded memory = one shard),
    * no cross-task coordination — the same disjointness that makes
    * segmented scans embarrassingly parallel makes compaction so.
    */
  def compact(spark: SparkSession, path: String, table: String): Unit = {
    val store = new LocalKVStore(path)
    val shards = store.describe(table).shards
    // capture BEFORE the fold: only transaction files every shard
    // provably folded may be reclaimed afterwards
    val txnBefore = store.txnJournalNames(table)
    val txnFloor = store.pendingTxnFloor(table) // captured WITH txnBefore
    val parallelism = math.min(shards, spark.sparkContext.defaultParallelism)
    spark.sparkContext
      .parallelize(0 until shards, parallelism)
      .foreach(sh => new LocalKVStore(path).compactShard(table, sh))
    store.reclaimTxnJournal(table, txnBefore, txnFloor)
    // Refresh materialized GSI copies from the freshly folded view,
    // shard-parallel like the fold itself; no-op without indexes.
    store.describe(table).indexes.keys
      .foreach(buildIndex(spark, path, table, _))
  }

  /** Distributed GSI backfill: one task per BASE shard streams its
    * merged view into per-index-shard part files (the reshard
    * pattern), the driver concatenates and stamps the freshness
    * marker with the version captured BEFORE the scan — a concurrent
    * write leaves the marker stale and readers on the base path. This
    * is the 100 TB form of [[LocalKVStore.buildIndex]] (which scans
    * single-threaded and suits small tables / tests).
    */
  def buildIndex(spark: SparkSession, path: String, table: String, name: String): Unit = {
    val store = new LocalKVStore(path)
    val stamp = store.indexBuildStamp(table)
    val shards = store.describe(table).shards
    // The spill dir is shared across tasks, so only the orchestrator
    // may clear it — a crashed prior build's part files would
    // otherwise merge back rows the new scan never produced.
    store.clearSpillDir(table, s"gsi-tmp-$name")
    val parallelism = math.min(shards, spark.sparkContext.defaultParallelism)
    spark.sparkContext
      .parallelize(0 until shards, parallelism)
      .foreach(sh => new LocalKVStore(path).buildIndexShardParts(table, name, sh))
    store.finishIndexBuild(table, name, stamp)
  }

  /** TTL reaper: the reclamation half of the TTL story. Reads only
    * HIDE expired items (`ttlAttribute`/`ttlNow` options); this job
    * physically deletes them, like DynamoDB's background TTL deletion
    * — one task per shard, folding the journal and dropping every item
    * whose `ttlAttribute` is strictly below `nowEpochS` (the same
    * liveness rule scans use: missing/non-numeric attr = live). Run it
    * on whatever cadence the table's churn needs; between runs expired
    * items cost storage, never visibility.
    */
  def reapExpired(spark: SparkSession, path: String, table: String,
      ttlAttribute: String, nowEpochS: Long,
      /** `Some(region)`: the Global-Tables form — deletions publish
        * through the STAMPED write path (version above every expired
        * item's stamp), so LWW tombstone sidecars carry them to
        * replicas even after the fold. None: plain journal delete
        * markers (unreplicated tables).
        */
      region: Option[String] = None,
      /** Physically reclaim (compact each shard) after publishing the
        * markers. `false` leaves the markers in the journal — items
        * are already invisible to every reader, and a LAGGING CDC
        * stream keeps its chance to deliver the deletions before some
        * later compaction folds them (our analogue of the Streams
        * 24-hour retention window).
        */
      fold: Boolean = true): Unit = {
    val shards = new LocalKVStore(path).describe(table).shards
    val parallelism = math.min(shards, spark.sparkContext.defaultParallelism)
    spark.sparkContext
      .parallelize(0 until shards, parallelism)
      .foreach(sh => reapShard(new LocalKVStore(path), table, sh,
        ttlAttribute, nowEpochS, region, fold))
  }

  /** Per-shard TTL reap, the CDC/replication-VISIBLE form (DynamoDB
    * parity: expired items reach Streams as REMOVE records, and
    * Global Tables replicate the deletions): collect the shard's
    * expired keys from the merged view, publish ONE journal
    * delete-marker file under the `ttlreap` writer family — so the
    * CDC feed, journal-shipping replication, and backups all carry
    * the deletions like any writer's — then (optionally) fold the
    * shard so the items are physically reclaimed and, on the stamped
    * path, the markers compact into tombstone sidecars. Expiry rule
    * is scan-time [[Ttl.alive]]'s exactly (strictly below now;
    * non-numeric/missing attribute = live). Same caveat DynamoDB
    * documents: expiry → deletion is not atomic — a write landing
    * between the key scan and the marker publish is overridden by
    * the marker (the service's own window is measured in hours; ours
    * in milliseconds).
    */
  private[dynamo] def reapShard(store: LocalKVStore, table: String,
      shard: Int, attr: String, nowEpochS: Long,
      region: Option[String], fold: Boolean): Long = {
    val meta = store.describe(table)
    var maxVer = 0L
    val expired = scala.collection.mutable.ArrayBuffer.empty[Map[String, AttrVal]]
    store.scanSegment(table, shard, meta.shards).foreach { case (item, _) =>
      val dead = item.get(attr) match {
        case Some(AttrVal.N(v)) => v < BigDecimal(nowEpochS)
        case _                  => false
      }
      if (dead) {
        item.get(Replication.VerAttr).foreach {
          case AttrVal.N(v) => maxVer = math.max(maxVer, v.toLong)
          case _            => ()
        }
        expired += (Map(meta.hashKey -> item(meta.hashKey)) ++
          meta.rangeKey.map(rk => rk -> item(rk)))
      }
    }
    if (expired.nonEmpty) region match {
      case Some(r) =>
        // one stamp above every expired item's version outranks them
        // all; a racing fresher write ties at worst and resolves by
        // the ordinary LWW region tie-break — the same race DynamoDB's
        // TTL deletion has with concurrent writers
        Replication.writeStamped(store, table, r, maxVer + 1,
          System.currentTimeMillis(), f"ttlreap-s$shard%03d",
          expired.toSeq.map(k => Replication.RDelete(k)))
      case None =>
        store.appendWal(table, System.currentTimeMillis(),
          f"ttlreap-s$shard%03d",
          expired.toSeq.map(k => store.Delete(k)))
    }
    if (fold) store.compactShard(table, shard)
    expired.size
  }

  /** Re-bucket a table into a new shard count — the split/merge move a
    * long-lived table needs when data volume outruns its layout (more
    * shards = more scan/write parallelism and finer SPJ buckets; fewer
    * = less small-file overhead). One distributed pass: the journal is
    * folded away first (stale WAL shard suffixes would replay into the
    * wrong segment under the new numbering), each OLD shard's task
    * splits its items into per-new-shard part files, and the driver
    * swaps the layout + metadata. Data is read once and written once
    * regardless of either shard count. Requires exclusive access, like
    * compaction; not crash-atomic (rerun on failure — placement is a
    * pure function of the key, so the rebuild converges).
    */
  def reshard(spark: SparkSession, path: String, table: String, newShards: Int): Unit = {
    require(newShards > 0, s"newShards must be positive, got $newShards")
    val store = new LocalKVStore(path)
    val oldShards = store.describe(table).shards
    if (oldShards == newShards) return
    compact(spark, path, table)
    // Shared spill dir: clear crashed-prior-run parts once, driver-side
    // (tasks must not clear it — they'd race each other's parts).
    store.clearSpillDir(table, "reshard-tmp")
    val parallelism = math.min(oldShards, spark.sparkContext.defaultParallelism)
    spark.sparkContext
      .parallelize(0 until oldShards, parallelism)
      .foreach(sh => new LocalKVStore(path).reshardShard(table, sh, newShards))
    store.finishReshard(table, newShards)
  }

  /** Adaptive partition sizing (DynamoDB splits partitions as they
    * grow; it never merges them — mirrored here: the count only
    * RISES). Picks the smallest power-of-two shard count that brings
    * the mean shard under `targetShardBytes` (capped at `maxShards`)
    * and reshards when it exceeds the current count; otherwise a
    * no-op, so it is safe on a maintenance schedule. Returns the
    * resulting count. Power-of-two growth keeps successive reshards
    * cheap to reason about and bounds the count's drift to one
    * doubling per growth epoch at steady ingest.
    */
  def autoReshard(spark: SparkSession, path: String, table: String,
      targetShardBytes: Long = 256L << 20, maxShards: Int = 4096): Int = {
    require(targetShardBytes > 0, "targetShardBytes must be positive")
    val store = new LocalKVStore(path)
    val cur = store.describe(table).shards
    val size = store.sizeBytes(table)
    var want = 1
    while (want < maxShards && size / want > targetShardBytes) want *= 2
    // The doubling loop can overshoot a non-power-of-two cap (e.g.
    // maxShards = 1000 would land on 1024) — clamp to honor the
    // documented "capped at maxShards" contract exactly.
    want = math.min(want, maxShards)
    if (want > cur) { reshard(spark, path, table, want); want }
    else cur
  }

  /** Point-in-time RESTORE to a new table (DynamoDB PITR restore
    * analogue: restores always create a NEW table, never rewrite in
    * place). One task per shard replays the source shard at the
    * `asOfSeq` cut (the store rejects cuts below the compaction
    * watermark loudly) and journals it into the destination; one
    * compaction pass folds the journal into range-sorted paged bases,
    * so the restored table serves Query-shape reads immediately.
    * Secondary indexes re-declare and rebuild from the restored
    * data — the restore defines them, it does not copy index files
    * (DynamoDB restores rebuild GSIs the same way). The destination
    * shares the source's key schema and shard count, so the per-shard
    * replay writes only its own shard's journal file: no cross-task
    * coordination, O(shard) memory.
    *
    * Crash contract (loudly resumable, not atomic): the destination
    * carries a `restore-pending.json` quarantine marker from before
    * its meta.json exists until after the last index build. A crash
    * anywhere in between leaves a table every connector entry point
    * REFUSES (no silent half-data reads, no silently missing
    * indexes); rerunning this job wipes the partial destination and
    * rebuilds from the same deterministic cut. A destination that
    * exists WITHOUT the marker is a real table — refused, like the
    * service (restores always create a new table).
    */
  def restoreAsOf(spark: SparkSession, srcRoot: String, table: String,
      dstRoot: String, newTable: String, asOfSeq: Long): Unit = {
    val src = new LocalKVStore(srcRoot)
    val meta = src.describe(table)
    val dst = new LocalKVStore(dstRoot)
    if (dst.restorePending(newTable).nonEmpty) dst.wipeTableDir(newTable)
    else require(!dst.exists(newTable),
      s"restore destination '$newTable' already exists")
    dst.markRestorePending(newTable, srcRoot, table, asOfSeq)
    dst.createTable(newTable, meta.copy(indexes = Map.empty))
    val shards = meta.shards
    val parallelism = math.min(shards, spark.sparkContext.defaultParallelism)
    spark.sparkContext
      .parallelize(0 until shards, parallelism)
      .foreach { sh =>
        val s = new LocalKVStore(srcRoot)
        val d = new LocalKVStore(dstRoot)
        val w = d.walWriter(newTable, asOfSeq, f"restore-s$sh%03d")
        try {
          s.scanSegment(table, sh, shards, asOfSeq = Some(asOfSeq))
            .foreach { case (item, _) => w.append(d.Put(item)) }
          w.flush()
        } finally w.close()
      }
    compact(spark, dstRoot, newTable)
    meta.indexes.foreach { case (name, idx) =>
      dst.createIndex(newTable, name, idx)
      buildIndex(spark, dstRoot, newTable, name)
    }
    dst.clearRestorePending(newTable)
  }

  /** Point-in-time EXPORT to parquet (DynamoDB's
    * ExportTableToPointInTime analogue — export never consumes table
    * read capacity there; here it is one segmented snapshot scan).
    * Spark-first by construction: the export engine IS the
    * connector's parallel scan (one task per shard subset, consistent
    * `asOfSeq` replay bounds) feeding Spark's columnar parquet
    * writer — nothing bespoke to maintain. The inverse (ImportTable)
    * is the connector's existing bulk write:
    * `spark.read.parquet(out).write.dynamo(root, table, hashKey)`.
    */
  def exportAsOf(spark: SparkSession, root: String, table: String,
      outPath: String, asOfSeq: Option[Long] = None): Unit = {
    val rd = spark.read.format("dynamo")
      .option("path", root).option("tableName", table)
    asOfSeq.foreach(s => rd.option("asOfSeq", s.toString))
    rd.load().write.mode("overwrite").parquet(outPath)
  }

  /** DYNAMODB_JSON export (the service's S3 table-export wire
    * format): one `{"Item": {...attr-typed JSON...}}` line per item,
    * shard-parallel, one part file per shard under `dest`. EXACT item
    * fidelity — no Row codec round trip — so shapes a Spark schema
    * cannot spell (mixed-type lists, deep maps, arbitrary-precision
    * `N`) survive byte-faithfully. Inverse: [[importDynamoJson]],
    * which also ingests REAL DynamoDB S3 exports.
    *
    * Crash contract: `manifest-summary.json` (the service's export
    * manifest analogue, carrying `itemCount`/`partCount`) is written
    * LAST, after every part file — a crashed export is a directory
    * WITHOUT a manifest, detectable instead of silently short.
    */
  def exportDynamoJson(spark: SparkSession, path: String, table: String,
      dest: String): Unit = {
    val shards = new LocalKVStore(path).describe(table).shards
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dest))
    val parallelism = math.min(shards, spark.sparkContext.defaultParallelism)
    val itemCount = spark.sparkContext
      .parallelize(0 until shards, parallelism).map { sh =>
        val st = new LocalKVStore(path)
        val out = java.nio.file.Paths.get(dest, f"items-s$sh%03d.json")
        val w = java.nio.file.Files.newBufferedWriter(out,
          java.nio.charset.StandardCharsets.UTF_8)
        var n = 0L
        try st.scanSegment(table, sh, shards).foreach { case (item, _) =>
          w.write("{\"Item\":"); w.write(ItemJson.write(item)); w.write("}\n")
          n += 1
        } finally w.close()
        n
      }.sum().toLong
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dest, "manifest-summary.json"),
      s"""{"itemCount":$itemCount,"partCount":$shards}""".getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
  }

  /** Import DYNAMODB_JSON lines — `{"Item": {...}}` per line (the S3
    * export shape; `wrapped = false` accepts bare item objects) —
    * into a table: executor-parallel parse feeding chunked journal
    * appends (exact item fidelity, no Row schema needed), then one
    * compaction folds the load into sorted bases + page directories.
    * Reads REAL DynamoDB exports: the set tags SS/NS/BS decode as
    * lists (§1.2 — Spark has no set type), everything else is the
    * store's own wire shape already. Creates the table when absent.
    */
  def importDynamoJson(spark: SparkSession, path: String, table: String,
      src: String, hashKey: String, rangeKey: Option[String] = None,
      shards: Int = 16, wrapped: Boolean = true): Unit = {
    val store = new LocalKVStore(path)
    // An [[exportDynamoJson]] directory carries a manifest alongside
    // its part files — read only the parts (and surface a crashed,
    // manifest-less export loudly rather than importing it short).
    val srcDir = java.nio.file.Paths.get(src)
    def hasParts: Boolean = {
      val s = java.nio.file.Files.list(srcDir)
      try s.iterator().asScala.exists(
        _.getFileName.toString.startsWith("items-s"))
      finally s.close()
    }
    val input =
      if (java.nio.file.Files.isDirectory(srcDir) && hasParts) {
        require(java.nio.file.Files.isRegularFile(
          srcDir.resolve("manifest-summary.json")),
          s"'$src' looks like a crashed exportDynamoJson output: part " +
            "files present but no manifest-summary.json — re-export")
        s"$src/items-s*.json"
      } else src
    // Crash contract (the service's ImportTable FAILED state): when
    // the import CREATES the destination, a die mid-load would leave
    // a readable half-loaded table — quarantine it from before
    // meta.json exists until after the final fold; rerunning with the
    // same source converges (keyed Puts are idempotent). An import
    // into a PRE-EXISTING table is this engine's append extension and
    // carries ordinary write semantics (but never into a quarantined
    // one).
    if (!store.exists(table)) {
      store.markImportPending(table, s"import from $src")
      store.createTable(table, TableMeta(hashKey, rangeKey, shards, 1000000L))
    } else if (!store.importPending(table)) {
      // rerun of a crashed import keeps its own marker until done;
      // anything ELSE quarantined must not take appends
      store.assertNotRestorePending(table)
    }
    spark.read.textFile(input).foreachPartition { (it: Iterator[String]) =>
      val st = new LocalKVStore(path)
      val pid = org.apache.spark.TaskContext.getPartitionId()
      it.filter(_.trim.nonEmpty).grouped(1000).zipWithIndex.foreach {
        case (chunk, ci) =>
          val ops = chunk.map { line =>
            st.Put(if (wrapped) ItemJson.parseExportLine(line)
                   else ItemJson.parse(line))
          }
          st.appendWal(table, System.currentTimeMillis(),
            f"imp-p$pid%05d-c$ci%05d", ops)
      }
    }
    compact(spark, path, table)
    store.clearImportPending(table)
  }

  /** Global-Tables-style anti-entropy replication, one task per shard
    * (replicas share placement, so shard i syncs against shard i with
    * zero cross-task coordination — see [[Replication]]). Tombstone
    * maps are read once on the driver and broadcast with the task
    * closure: they are bounded by deletes, not table size. Returns
    * (puts, deletes) applied at the destination.
    */
  def replicate(spark: SparkSession, srcRoot: String, dstRoot: String,
      table: String, seq: Long): (Long, Long) = {
    val src = new LocalKVStore(srcRoot)
    val shards = src.describe(table).shards
    val srcT = Replication.tombstones(src, table)
    val dstT = Replication.tombstones(new LocalKVStore(dstRoot), table)
    val parallelism = math.min(shards, spark.sparkContext.defaultParallelism)
    val counts = spark.sparkContext
      .parallelize(0 until shards, parallelism)
      .map { sh =>
        val r = Replication.syncShard(new LocalKVStore(srcRoot),
          new LocalKVStore(dstRoot), table, sh, seq, s"repl-s$sh", srcT, dstT)
        (r.puts.toLong, r.deletes.toLong)
      }
      .reduce((a, b) => (a._1 + b._1, a._2 + b._2))
    counts
  }
}
