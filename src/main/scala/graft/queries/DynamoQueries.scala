package graft.queries

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Fixtures
import graft.sources.dynamo.{DynamoMaintenance, Implicits, IndexMeta, LocalKVStore, TableMeta, TableTxn}
import Implicits._

/** Typed-read row shape for `q_dyn_typed` (A7) — schema derived via
  * `Encoders.product`, no inference scan.
  */
final case class GCustomer(
    c_custkey: Long,
    c_name: String,
    c_nationkey: Long,
    c_acctbal: Double,
    c_mktsegment: String)

/** Queries through the `format("dynamo")` DSv2 connector (SURVEY.md
  * §2B B-1 q_dyn_*): the store is seeded from the customer parquet
  * fixture THROUGH THE CONNECTOR'S OWN WRITE PATH (A11 exercised on
  * every cold run), then compacted so scans stream from base shards.
  * The oracle compares against the parquet table directly — the store
  * is a faithful copy, so results must hash-match.
  *
  * Scale notes: the read is a segmented scan (one input partition per
  * store shard subset, no coordination); pushdown (A4/A5) drops
  * non-matching items before JSON→row decode. Numbers round-trip
  * through arbitrary-precision `N`, so doubles are bit-exact vs the
  * oracle.
  */
object DynamoQueries {

  private val seedLock = new Object

  // v2 path suffix: stores seeded by pre-partition-key-placement
  // builds live under the old root and would read as legacy layout —
  // a fresh root guarantees these queries exercise the current layout.
  // The root also carries a fingerprint of the source fixture files
  // (size + mtime of the tables we seed from): the seed markers are
  // content-blind, so without this a driver-side testdata REGENERATION
  // (it happened — round 6 → 7) would leave a stale store silently
  // serving the old rows while the oracle reads the new parquet.
  private def storeRoot(sfDir: String): String = {
    val fp = Seq("customer", "orders", "documents").map { t =>
      val p = Paths.get(s"$sfDir/$t.parquet")
      if (Files.exists(p)) s"${Files.size(p)}:${Files.getLastModifiedTime(p).toMillis}"
      else "absent"
    }.mkString(",").hashCode.toHexString
    // v7: compaction now writes range-sorted bases with page-directory
    // sidecars (the Query fast path) — stores compacted by older
    // builds have no directory (correct but unpruned), so reseed once
    // rather than serve q_dyn_query as a full-shard read
    "/tmp/graft-dynamo-v7/" + sfDir.replaceAll("[^A-Za-z0-9.]+", "_") + "-" + fp
  }

  /** Cross-process seed guard: the seeded store lives in shared /tmp,
    * so two JVMs (e.g. bench and verify) can race seed + compact —
    * compaction deletes WAL files a concurrent scan may be replaying.
    * A blocking OS `FileLock` on `<root>/.seed.lock` serializes the
    * whole seed-if-absent critical section across processes; the
    * JVM-local `seedLock` stays because `FileChannel.lock` throws
    * `OverlappingFileLockException` for a second lock attempt from the
    * same JVM.
    */
  private def withSeedLock[A](root: String)(body: => A): A = seedLock.synchronized {
    Files.createDirectories(Paths.get(root))
    val ch = java.nio.channels.FileChannel.open(Paths.get(root, ".seed.lock"),
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.WRITE)
    try {
      val lock = ch.lock()
      try body finally lock.release()
    } finally ch.close()
  }

  /** Shared seed-ingest helper (round-18: seeding runs inside every
    * bench and every verify, so the columnar encoder's measured
    * 1.2–1.7× win compounds across the whole gate). Flat-schema seed
    * loads go through [[graft.sources.dynamo.DynamoColumnarIngest]]:
    * the session CLONE narrows `files.maxPartitionBytes` to 8 MB so
    * the parquet scan itself carries the write parallelism — the row
    * path's `repartition(16)` would put an exchange above the scan
    * and drop the plan's columnar tail. `build` must be a pruning
    * projection only (plain column selects reach the scan's
    * ReadSchema; computed columns insert a Project and ingest falls
    * back to its single-task row write — keep THOSE seeds on the
    * explicit repartition row path instead).
    */
  private def seedIngest(s: SparkSession, root: String, table: String,
      hashKey: String, rangeKey: Option[String] = None)(
      build: SparkSession => DataFrame): Unit = {
    val clone = s.newSession()
    clone.conf.set("spark.sql.files.maxPartitionBytes",
      (8L * 1024 * 1024).toString)
    val t0 = System.nanoTime()
    val columnar = graft.sources.dynamo.DynamoColumnarIngest.ingest(
      build(clone), root, table, hashKey, rangeKey)
    // seeds run once per fixture per /tmp lifetime — one log line per
    // seed is the before/after evidence, not noise
    println(f"SEED $table%-18s columnar=$columnar " +
      f"${(System.nanoTime() - t0) / 1e9}%.2f s")
  }

  /** Seed `customer` into the store once per sfDir (marker-file
    * guarded; safe to re-run — puts are keyed upserts).
    */
  private def seededRoot(s: SparkSession, sfDir: String): String = {
    val root = storeRoot(sfDir)
    withSeedLock(root) {
      val marker = Paths.get(root, "customer", "_seeded")
      if (!Files.exists(marker)) {
        seedIngest(s, root, "customer", "c_custkey")(
          Fixtures.customer(_, sfDir))
        DynamoMaintenance.compact(s, root, "customer")
        Files.createFile(marker)
      }
      // GSI over market segment projecting the account balance (A8);
      // separate from the marker so stores seeded before the index
      // feature pick it up too.
      val store = new LocalKVStore(root)
      if (!store.describe("customer").indexes.contains("by_segment")) {
        store.createIndex("customer", "by_segment",
          IndexMeta("c_mktsegment", None, Some(Seq("c_acctbal"))))
      }
      // Stores seeded before materialized-GSI copies existed have the
      // index registered but no physical copy — backfill once (the
      // DISTRIBUTED build, one task per base shard) so q_dyn_gsi
      // exercises the index's own hash layout (an index-key-pinned
      // read touching one index shard), not the base-scan fallback.
      if (!store.indexFresh("customer", "by_segment"))
        DynamoMaintenance.buildIndex(s, root, "customer", "by_segment")
      // COMPOSITE GSI (hash c_mktsegment, range c_acctbal): the copy
      // is range-sorted with page directories, so an index-hash pin +
      // sort-key bound is a GSI Query — q_dyn_gsi_query reads only
      // the matching copy pages.
      if (!store.describe("customer").indexes.contains("by_seg_bal")) {
        store.createIndex("customer", "by_seg_bal",
          IndexMeta("c_mktsegment", Some("c_acctbal"), Some(Seq("c_name"))))
      }
      if (!store.indexFresh("customer", "by_seg_bal"))
        DynamoMaintenance.buildIndex(s, root, "customer", "by_seg_bal")
    }
    root
  }

  /** Seed `orders` as a RANGE-KEYED table (hash o_custkey, range
    * o_orderkey — DynamoDB's composite primary key), exercising the
    * multi-item-per-hash-key path end-to-end. Date column omitted: the
    * store's N type would widen it through inference (documented §1.2).
    */
  private def seededOrdersRoot(s: SparkSession, sfDir: String): String = {
    val root = storeRoot(sfDir)
    withSeedLock(root) {
      val marker = Paths.get(root, "orders", "_seeded")
      if (!Files.exists(marker)) {
        seedIngest(s, root, "orders", "o_custkey", Some("o_orderkey"))(
          Fixtures.orders(_, sfDir)
            .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"))
        DynamoMaintenance.compact(s, root, "orders")
        Files.createFile(marker)
      }
    }
    root
  }

  /** Seed `doc_keys` — a composite table with a STRING sort key
    * (hash `lang`, range `source:doc_id` zero-padded), the shape
    * behind `begins_with` Queries. Compacted so bases are
    * range-sorted with page directories.
    */
  private def seededDocKeysRoot(s: SparkSession, sfDir: String): String = {
    val root = storeRoot(sfDir)
    withSeedLock(root) {
      val marker = Paths.get(root, "doc_keys", "_seeded")
      if (!Files.exists(marker)) {
        Fixtures.documents(s, sfDir)
          .select(col("lang"),
            concat(col("source"), lit(":"),
              lpad(col("doc_id").cast("string"), 7, "0")).as("sk"),
            col("doc_id"), col("n_chars"))
          .repartition(8)
          .write.format("dynamo")
          .option("path", root).option("tableName", "doc_keys")
          .option("hashKey", "lang").option("rangeKey", "sk")
          .mode("append").save()
        DynamoMaintenance.compact(s, root, "doc_keys")
        Files.createFile(marker)
      }
    }
    root
  }

  /** Seed `customer_flags` — a second table sharing `customer`'s exact
    * layout (hash c_custkey, 16 shards) so the two are co-partitioned
    * for the storage-partitioned join.
    */
  private def seededFlagsRoot(s: SparkSession, sfDir: String): String = {
    val root = seededRoot(s, sfDir) // ensures customer exists first
    withSeedLock(root) {
      val marker = Paths.get(root, "customer_flags", "_seeded")
      if (!Files.exists(marker)) {
        Fixtures.customer(s, sfDir)
          .select(col("c_custkey"), (col("c_acctbal") > 0).as("positive"))
          .repartition(16)
          .write.dynamo(root, "customer_flags", "c_custkey")
        DynamoMaintenance.compact(s, root, "customer_flags")
        Files.createFile(marker)
      }
    }
    root
  }

  /** Pinned journal sequence for the `customer_asof` epoch-2 batch:
    * far enough in the future that every epoch-2 file publishes AT or
    * just above it (the monotone stamp `max(seq, now, maxListed+1)`
    * spreads concurrent writers across seq..seq+k), so any cut below
    * `asofEpochSeq` is a deterministic time-travel point at any
    * clock — epoch-2 ops commute (distinct keys), so the spread
    * within the batch never changes the replayed state.
    */
  private val asofEpochSeq = 4102444800000L // 2100-01-01T00:00:00Z in ms

  /** Seed `customer_asof` in two epochs: epoch 1 = the customer
    * parquet copy, compacted into base shards; epoch 2 = a journal
    * batch at [[asofEpochSeq]] deleting every `c_custkey % 10 == 3`
    * customer and putting one sentinel row. An `asOfSeq` read below
    * the epoch-2 seq must reproduce the parquet table exactly; a
    * current read must see epoch 2 applied. Deletes are written from
    * executors (per-partition WAL writers, distinct writer ids share
    * the pinned seq) — nothing is collected to the driver.
    */
  private def seededAsofRoot(s: SparkSession, sfDir: String): String = {
    val root = storeRoot(sfDir)
    withSeedLock(root) {
      val marker = Paths.get(root, "customer_asof", "_seeded")
      if (!Files.exists(marker)) {
        seedIngest(s, root, "customer_asof", "c_custkey")(
          Fixtures.customer(_, sfDir)
            .select("c_custkey", "c_name", "c_acctbal"))
        DynamoMaintenance.compact(s, root, "customer_asof")
        val seq = asofEpochSeq
        Fixtures.customer(s, sfDir)
          .filter(col("c_custkey") % 10 === 3)
          .select("c_custkey")
          .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
            val st = new LocalKVStore(root)
            val pid = org.apache.spark.TaskContext.getPartitionId()
            val w = st.walWriter("customer_asof", seq, f"asofdel-p$pid%04d")
            try {
              it.foreach { r =>
                w.append(st.Delete(Map("c_custkey" ->
                  (graft.sources.dynamo.AttrVal.N(BigDecimal(r.getLong(0)))
                    : graft.sources.dynamo.AttrVal))))
              }
              w.flush()
            } finally w.close()
          }
        val st = new LocalKVStore(root)
        st.appendWal("customer_asof", seq, "asofput", Seq(st.Put(Map(
          "c_custkey" -> graft.sources.dynamo.AttrVal.N(BigDecimal(-1)),
          "c_name" -> graft.sources.dynamo.AttrVal.S("time traveler"),
          "c_acctbal" -> graft.sources.dynamo.AttrVal.N(BigDecimal("0.5"))))))
        Files.createFile(marker)
      }
    }
    root
  }

  /** Seed `orders_asof` next to `customer_asof` (same store root):
    * epoch 1 = the orders parquet copy, compacted; epoch 2 = a journal
    * batch at the SAME [[asofEpochSeq]] deleting every
    * `o_orderkey % 10 == 3` order and putting one sentinel. One
    * epoch-millis cut below that seq is then a CROSS-TABLE snapshot
    * coordinate — DynamoConnectorSpec ("one asOfSeq cut snapshots
    * MULTIPLE tables consistently") pins the store-level law this
    * query exercises end-to-end.
    */
  private def seededAsofMultiRoot(s: SparkSession, sfDir: String): String = {
    val root = seededAsofRoot(s, sfDir) // customer_asof's two epochs
    withSeedLock(root) {
      val marker = Paths.get(root, "orders_asof", "_seeded")
      if (!Files.exists(marker)) {
        seedIngest(s, root, "orders_asof", "o_orderkey")(
          Fixtures.orders(_, sfDir)
            .select("o_orderkey", "o_custkey", "o_totalprice"))
        DynamoMaintenance.compact(s, root, "orders_asof")
        val seq = asofEpochSeq
        Fixtures.orders(s, sfDir)
          .filter(col("o_orderkey") % 10 === 3)
          .select("o_orderkey")
          .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
            val st = new LocalKVStore(root)
            val pid = org.apache.spark.TaskContext.getPartitionId()
            val w = st.walWriter("orders_asof", seq, f"oasofdel-p$pid%04d")
            try {
              it.foreach { r =>
                w.append(st.Delete(Map("o_orderkey" ->
                  (graft.sources.dynamo.AttrVal.N(BigDecimal(r.getLong(0)))
                    : graft.sources.dynamo.AttrVal))))
              }
              w.flush()
            } finally w.close()
          }
        val st = new LocalKVStore(root)
        st.appendWal("orders_asof", seq, "oasofput", Seq(st.Put(Map(
          "o_orderkey" -> graft.sources.dynamo.AttrVal.N(BigDecimal(-1)),
          "o_custkey" -> graft.sources.dynamo.AttrVal.N(BigDecimal(-1)),
          "o_totalprice" -> graft.sources.dynamo.AttrVal.N(BigDecimal("0.5"))))))
        Files.createFile(marker)
      }
    }
    root
  }

  /** Seed `customer_gsid` for the DELTA-fresh GSI read: epoch 1 = the
    * customer copy compacted + `by_seg` index backfilled (exact copy);
    * epoch 2 = a journal delta the copy has NOT folded — deletes of
    * every `c_custkey % 10 == 7` row, one sentinel put, and an UPDATE
    * moving the sentinel's balance (update-merge through the overlay).
    * No compaction after: reads via the index then run copy + overlay
    * ([[graft.sources.dynamo.LocalKVStore.IndexDelta]]) — the
    * DynamoDB shape where a GSI keeps serving under writes.
    */
  private def seededGsiDeltaRoot(s: SparkSession, sfDir: String): String = {
    val root = storeRoot(sfDir)
    withSeedLock(root) {
      val marker = Paths.get(root, "customer_gsid", "_seeded")
      if (!Files.exists(marker)) {
        seedIngest(s, root, "customer_gsid", "c_custkey")(
          // parquet-file column order: a select that REORDERS columns
          // inserts a Project above the scan and drops the columnar
          // tail; the store holds attr MAPS, so order is free
          Fixtures.customer(_, sfDir)
            .select("c_custkey", "c_acctbal", "c_mktsegment"))
        DynamoMaintenance.compact(s, root, "customer_gsid")
        val st = new LocalKVStore(root)
        st.createIndex("customer_gsid", "by_seg",
          IndexMeta("c_mktsegment", None, Some(Seq("c_acctbal"))))
        // the delta: executor-parallel deletes + a driver put/update
        val seq = asofEpochSeq
        Fixtures.customer(s, sfDir)
          .filter(col("c_custkey") % 10 === 7)
          .select("c_custkey")
          .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
            val stl = new LocalKVStore(root)
            val w = stl.walWriter("customer_gsid", seq,
              f"gsiddel-p${org.apache.spark.TaskContext.getPartitionId()}%04d")
            try {
              it.foreach { r =>
                w.append(stl.Delete(Map("c_custkey" ->
                  (graft.sources.dynamo.AttrVal.N(BigDecimal(r.getLong(0)))
                    : graft.sources.dynamo.AttrVal))))
              }
              w.flush()
            } finally w.close()
          }
        st.appendWal("customer_gsid", seq, "gsidput", Seq(
          st.Put(Map(
            "c_custkey" -> graft.sources.dynamo.AttrVal.N(BigDecimal(9999999)),
            "c_mktsegment" -> graft.sources.dynamo.AttrVal.S("BUILDING"),
            "c_acctbal" -> graft.sources.dynamo.AttrVal.N(BigDecimal("123.45"))))))
        st.appendWal("customer_gsid", seq + 1, "gsidupd", Seq(
          st.UpdateIfExists(Map(
            "c_custkey" -> graft.sources.dynamo.AttrVal.N(BigDecimal(9999999)),
            "c_acctbal" -> graft.sources.dynamo.AttrVal.N(BigDecimal("678.9"))))))
        Files.createFile(marker)
      }
      // strip the write-through journal (idempotent, OUTSIDE the
      // marker so pre-existing seeded stores migrate too): THIS key
      // deliberately exercises the classic DELTA overlay (applier-lag
      // state); the journal-tier serve has its own key
      // (`q_dyn_gsi_wt`, which keeps its journal)
      dropJournalArtifacts(root, "customer_gsid", "by_seg")
    }
    root
  }

  /** Delete one index's write-through artifacts (round files +
    * applied marker) — the applier-lag state, for keys that pin the
    * delta-overlay tier.
    */
  private def dropJournalArtifacts(root: String, table: String, name: String): Unit = {
    val dir = Paths.get(root, table)
    Files.deleteIfExists(dir.resolve(s"gsi-applied-$name.meta"))
    val ls = Files.list(dir)
    try {
      val it = ls.iterator()
      val doomed = scala.collection.mutable.ArrayBuffer.empty[java.nio.file.Path]
      while (it.hasNext) {
        val p = it.next()
        if (p.getFileName.toString.startsWith(s"gsi-wal-$name-r")) doomed += p
      }
      doomed.foreach(Files.deleteIfExists(_))
    } finally ls.close()
  }

  /** Seed `customer_gsiw` for the WRITE-THROUGH GSI serve: identical
    * two-epoch shape to `customer_gsid`, but the publish-time applier's
    * journal is KEPT — reads serve copy + round files with zero
    * base-shard work and zero overlay re-derivation (the `IndexJournal`
    * tier; DynamoConnectorSpec pins the partition shape).
    */
  private def seededGsiWtRoot(s: SparkSession, sfDir: String): String = {
    val root = storeRoot(sfDir)
    withSeedLock(root) {
      val marker = Paths.get(root, "customer_gsiw", "_seeded")
      if (!Files.exists(marker)) {
        seedIngest(s, root, "customer_gsiw", "c_custkey")(
          // file column order — see customer_gsid
          Fixtures.customer(_, sfDir)
            .select("c_custkey", "c_acctbal", "c_mktsegment"))
        DynamoMaintenance.compact(s, root, "customer_gsiw")
        val st = new LocalKVStore(root)
        st.createIndex("customer_gsiw", "by_seg",
          IndexMeta("c_mktsegment", None, Some(Seq("c_acctbal"))))
        val seq = asofEpochSeq
        Fixtures.customer(s, sfDir)
          .filter(col("c_custkey") % 10 === 7)
          .select("c_custkey")
          .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
            val stl = new LocalKVStore(root)
            val w = stl.walWriter("customer_gsiw", seq,
              f"gsiwdel-p${org.apache.spark.TaskContext.getPartitionId()}%04d")
            try {
              it.foreach { r =>
                w.append(stl.Delete(Map("c_custkey" ->
                  (graft.sources.dynamo.AttrVal.N(BigDecimal(r.getLong(0)))
                    : graft.sources.dynamo.AttrVal))))
              }
              w.flush()
            } finally w.close()
          }
        st.appendWal("customer_gsiw", seq, "gsiwput", Seq(
          st.Put(Map(
            "c_custkey" -> graft.sources.dynamo.AttrVal.N(BigDecimal(9999999)),
            "c_mktsegment" -> graft.sources.dynamo.AttrVal.S("BUILDING"),
            "c_acctbal" -> graft.sources.dynamo.AttrVal.N(BigDecimal("123.45"))))))
        st.appendWal("customer_gsiw", seq + 1, "gsiwupd", Seq(
          st.UpdateIfExists(Map(
            "c_custkey" -> graft.sources.dynamo.AttrVal.N(BigDecimal(9999999)),
            "c_acctbal" -> graft.sources.dynamo.AttrVal.N(BigDecimal("678.9"))))))
        Files.createFile(marker)
      }
      // idempotent catch-up OUTSIDE the marker (no-op when the journal
      // already covers the WAL): heals stores seeded by older builds
      // whose marker format predates the composition manifest
      new LocalKVStore(root).applyIndexWrites("customer_gsiw")
    }
    root
  }

  /** Seed `user_counters` ENTIRELY through `updateAction=add` writes:
    * one ADD op per event (+1 to `cnt`, +value to `amount`) — no base
    * rows at all (UpdateItem's ADD upserts from 0). The table's final
    * state IS a grouped aggregation, computed on the WRITE path —
    * DynamoDB's atomic-counter pattern at Spark scale. Reads fold the
    * add journal through the replay normal form (no compaction here,
    * deliberately: the query exercises the ADD fold, not the folded
    * base).
    */
  /** Seed `txn_cust` + `txn_sum` through CROSS-TABLE atomic
    * transactions ([[LocalKVStore.transactWriteMulti]] — the
    * TransactWriteItems-across-tables analogue the per-table journal
    * rename cannot give). Customers partition into 64 chunks
    * (`c_custkey % 64`); each chunk commits as ONE transaction
    * writing the chunk's rows into `txn_cust` AND its summary row
    * {chunk, n_rows, sum_cents} into `txn_sum`, all-or-nothing under
    * the shared commit marker. Any torn transaction breaks the
    * read-back cross-check (per-chunk aggregate of txn_cust vs its
    * txn_sum row vs the parquet oracle). 100 TB shape: transactions
    * commit FROM EXECUTORS in parallel — repartition-by-chunk gives
    * each task whole chunks, and the cross-JVM table locks serialize
    * only the per-table check/publish windows. Balances ride as
    * integer cents so every sum is exact and order-independent.
    */
  private def seededTxnMultiRoot(s: SparkSession, sfDir: String): String = {
    val root = storeRoot(sfDir)
    withSeedLock(root) {
      val marker = Paths.get(root, "txn_sum", "_seeded")
      if (!Files.exists(marker)) {
        // exists-guards keep the seed re-entrant after a crash
        // between createTable and the marker: the reseed then re-runs
        // the idempotent Puts over the surviving dirs instead of
        // re-initializing metadata over published journal history
        // (which double-publishes and leans on compaction to converge)
        val st0 = new LocalKVStore(root)
        if (!st0.exists("txn_cust")) st0.createTable("txn_cust",
          TableMeta("c_custkey", None, shards = 16, throughput = 1000000L))
        if (!st0.exists("txn_sum")) st0.createTable("txn_sum",
          TableMeta("chunk", None, shards = 4, throughput = 1000000L))
        Fixtures.customer(s, sfDir)
          .select(col("c_custkey"),
            (col("c_custkey") % 64).as("chunk"),
            round(col("c_acctbal") * 100, 0).cast("long").as("bal_cents"))
          .repartition(16, col("chunk"))
          .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
            val st = new LocalKVStore(root)
            val pid = org.apache.spark.TaskContext.getPartitionId()
            it.toSeq.groupBy(_.getLong(1)).foreach { case (chunk, rows) =>
              def n(v: Long) = graft.sources.dynamo.AttrVal.N(BigDecimal(v))
              val custOps = rows.map(r => st.Put(Map(
                "c_custkey" -> (n(r.getLong(0)): graft.sources.dynamo.AttrVal),
                "chunk" -> (n(chunk): graft.sources.dynamo.AttrVal),
                "bal_cents" -> (n(r.getLong(2)): graft.sources.dynamo.AttrVal))))
              val sumOp = st.Put(Map(
                "chunk" -> (n(chunk): graft.sources.dynamo.AttrVal),
                "n_rows" -> (n(rows.size.toLong): graft.sources.dynamo.AttrVal),
                "sum_cents" ->
                  (n(rows.map(_.getLong(2)).sum): graft.sources.dynamo.AttrVal)))
              st.transactWriteMulti(Seq(
                TableTxn("txn_cust", custOps),
                TableTxn("txn_sum", Seq(sumOp))),
                System.currentTimeMillis(), f"txm-p$pid%04d-c$chunk%03d")
            }
          }
        DynamoMaintenance.compact(s, root, "txn_cust")
        DynamoMaintenance.compact(s, root, "txn_sum")
        Files.createFile(marker)
      }
    }
    root
  }

  /** Seed the PartiQL `execute_transaction` ConditionCheck fixture
    * (§2A 84 → its CORRECTNESS row): `txn_chk_gate` holds one gate
    * item per gated customer (c_custkey % 100 = 0) and `txn_chk` the
    * written rows. Four transactions run per key through the full
    * PartiQL surface — an `EXISTS` check WITH an attribute condition
    * (commits iff the gate item's `bal_cents >= 0`), a `NOT EXISTS`
    * on an absent key (always commits), a `NOT EXISTS` on the present
    * key (always cancels), and an `EXISTS` whose condition is
    * unsatisfiable over the fixture (always cancels). Every expected
    * cancellation is REQUIRED to throw the TransactionCanceled
    * analogue and stage nothing — a leaked write lands in `txn_chk`
    * and hash-mismatches the oracle. Base rows are re-Put on every
    * (re)seed so a crashed seed replays deterministically.
    */
  private def seededTxnCheckRoot(s: SparkSession, sfDir: String): String = {
    val root = storeRoot(sfDir)
    withSeedLock(root) {
      val marker = Paths.get(root, "txn_chk", "_seeded")
      if (!Files.exists(marker)) {
        val st0 = new LocalKVStore(root)
        if (!st0.exists("txn_chk")) st0.createTable("txn_chk",
          TableMeta("c_custkey", None, shards = 8, throughput = 1000000L))
        if (!st0.exists("txn_chk_gate")) st0.createTable("txn_chk_gate",
          TableMeta("c_custkey", None, shards = 8, throughput = 1000000L))
        Fixtures.customer(s, sfDir)
          .filter(col("c_custkey") % 100 === 0)
          .select(col("c_custkey"),
            round(col("c_acctbal") * 100, 0).cast("long").as("bal_cents"))
          .repartition(16)
          .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
            import graft.sources.dynamo.{PartiQL, TxnCheckFailedException}
            val st = new LocalKVStore(root)
            val pid = org.apache.spark.TaskContext.getPartitionId()
            def n(v: Long): graft.sources.dynamo.AttrVal =
              graft.sources.dynamo.AttrVal.N(BigDecimal(v))
            val rows = it.toVector
            if (rows.nonEmpty) {
              val seq = System.currentTimeMillis()
              st.appendWal("txn_chk_gate", seq, f"seedg-p$pid%04d",
                rows.map(r => st.Put(Map(
                  "c_custkey" -> n(r.getLong(0)),
                  "bal_cents" -> n(r.getLong(1))))))
              st.appendWal("txn_chk", seq, f"seedc-p$pid%04d",
                rows.map(r => st.Put(Map(
                  "c_custkey" -> n(r.getLong(0)),
                  "bal_cents" -> n(r.getLong(1))))))
              // No publish fence needed: the store's monotone stamp
              // (LocalKVStore.nextPubSeq) orders every statement file
              // strictly after the just-published seed files — the
              // r17 wall-clock wait here is obsolete.
              def expectCancel(stmts: String): Unit =
                try {
                  PartiQL.executeTransaction(root, stmts, Nil)
                  throw new IllegalStateException(
                    s"transaction must cancel but committed: $stmts")
                } catch { case _: TxnCheckFailedException => () }
              rows.foreach { r =>
                val (k, b) = (r.getLong(0), r.getLong(1))
                // condition-carrying EXISTS gates the flag write
                val t1 = "EXISTS (SELECT * FROM txn_chk_gate " +
                  s"WHERE c_custkey = $k AND bal_cents >= 0); " +
                  s"UPDATE txn_chk SET flagged = 1 WHERE c_custkey = $k"
                if (b >= 0) PartiQL.executeTransaction(root, t1, Nil)
                else expectCancel(t1)
                // NOT EXISTS on an absent key commits
                PartiQL.executeTransaction(root,
                  "NOT EXISTS (SELECT * FROM txn_chk_gate " +
                    s"WHERE c_custkey = ${k + 1000000000L}); " +
                    s"UPDATE txn_chk SET chk2 = 1 WHERE c_custkey = $k", Nil)
                // NOT EXISTS on the present key cancels the whole txn
                expectCancel(
                  "NOT EXISTS (SELECT * FROM txn_chk_gate " +
                    s"WHERE c_custkey = $k); " +
                    s"UPDATE txn_chk SET chk2 = 999 WHERE c_custkey = $k")
                // EXISTS with an unsatisfiable condition cancels too
                expectCancel(
                  "EXISTS (SELECT * FROM txn_chk_gate " +
                    s"WHERE c_custkey = $k AND bal_cents >= 100000000); " +
                    s"UPDATE txn_chk SET chk2 = 777 WHERE c_custkey = $k")
              }
            }
          }
        DynamoMaintenance.compact(s, root, "txn_chk")
        DynamoMaintenance.compact(s, root, "txn_chk_gate")
        Files.createFile(marker)
      }
    }
    root
  }

  /** Seed the `RETURNING MODIFIED OLD|NEW *` fixture (§2A 85 → its
    * CORRECTNESS row): per gated customer three UPDATE statements run
    * through ExecuteStatement and their RETURNED images are PERSISTED
    * into `txn_ret_out`, so the oracle checks the returned-attrs
    * projection itself, durably, on every run:
    *   p1 `SET tag, bonus_cents … RETURNING MODIFIED NEW *`
    *      → image is EXACTLY {tag, bonus_cents} (required in-task);
    *   p2 `SET tag, bonus_cents, fresh REMOVE seg … RETURNING
    *      MODIFIED OLD *` → OLD carries the touched-and-previously-
    *      present {tag, bonus_cents, seg}; `fresh` (absent before) is
    *      absent from OLD (required);
    *   p3 `SET probe REMOVE bonus_cents … RETURNING MODIFIED NEW *`
    *      → the REMOVEd attribute is absent from NEW: image is
    *      exactly {probe} (required).
    * Base rows re-Put each (re)seed keep the passes deterministic.
    */
  private def seededReturningRoot(s: SparkSession, sfDir: String): String = {
    val root = storeRoot(sfDir)
    withSeedLock(root) {
      val marker = Paths.get(root, "txn_ret_out", "_seeded")
      if (!Files.exists(marker)) {
        val st0 = new LocalKVStore(root)
        if (!st0.exists("txn_ret")) st0.createTable("txn_ret",
          TableMeta("c_custkey", None, shards = 8, throughput = 1000000L))
        if (!st0.exists("txn_ret_out")) st0.createTable("txn_ret_out",
          TableMeta("c_custkey", None, shards = 8, throughput = 1000000L))
        Fixtures.customer(s, sfDir)
          .filter(col("c_custkey") % 100 === 0)
          .select(col("c_custkey"),
            round(col("c_acctbal") * 100, 0).cast("long").as("bal_cents"),
            col("c_mktsegment"))
          .repartition(16)
          .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
            import graft.sources.dynamo.{AttrVal, ItemJson, PartiQL}
            val st = new LocalKVStore(root)
            val pid = org.apache.spark.TaskContext.getPartitionId()
            def n(v: Long): AttrVal = AttrVal.N(BigDecimal(v))
            val rows = it.toVector
            if (rows.nonEmpty) {
              st.appendWal("txn_ret", System.currentTimeMillis(),
                f"seedr-p$pid%04d", rows.map(r => st.Put(Map(
                  "c_custkey" -> n(r.getLong(0)),
                  "bal_cents" -> n(r.getLong(1)),
                  "seg" -> AttrVal.S(r.getString(2))))))
              // No publish fence needed (see seededTxnCheckRoot): the
              // store's monotone stamp orders statement files strictly
              // after the seed publish.
              def img(stmt: String): Map[String, AttrVal] = {
                val (sch, rws) = PartiQL.execute(root, stmt, Nil)
                ItemJson.parse(
                  rws(0).getUTF8String(sch.fieldIndex("item")).toString)
              }
              val outOps = rows.map { r =>
                val k = r.getLong(0)
                val b = 2L * r.getLong(1) + 7L
                val p1 = img(s"UPDATE txn_ret SET tag = 'k$k', " +
                  s"bonus_cents = $b WHERE c_custkey = $k " +
                  "RETURNING MODIFIED NEW *")
                require(p1.keySet == Set("tag", "bonus_cents") &&
                  p1("bonus_cents") == n(b),
                  s"MODIFIED NEW must be exactly the touched attrs, got $p1")
                val p2 = img(s"UPDATE txn_ret SET tag = 'k$k', " +
                  s"bonus_cents = ${b + 1}, fresh = 1 REMOVE seg " +
                  s"WHERE c_custkey = $k RETURNING MODIFIED OLD *")
                require(p2.keySet == Set("tag", "bonus_cents", "seg"),
                  "MODIFIED OLD must carry touched-and-present attrs " +
                    s"only (no 'fresh'), got $p2")
                val p3 = img(s"UPDATE txn_ret SET probe = 2 " +
                  s"REMOVE bonus_cents WHERE c_custkey = $k " +
                  "RETURNING MODIFIED NEW *")
                require(p3.keySet == Set("probe"),
                  s"a REMOVEd attr must be absent from MODIFIED NEW, got $p3")
                st.Put(Map(
                  "c_custkey" -> n(k),
                  "tag" -> p2("tag"),
                  "bonus_new1" -> p1("bonus_cents"),
                  "bonus_old2" -> p2("bonus_cents"),
                  "seg_old2" -> p2("seg")))
              }
              st.appendWal("txn_ret_out", System.currentTimeMillis(),
                f"seedo-p$pid%04d", outOps)
            }
          }
        DynamoMaintenance.compact(s, root, "txn_ret")
        DynamoMaintenance.compact(s, root, "txn_ret_out")
        Files.createFile(marker)
      }
    }
    root
  }

  /** Seed a table through the COLUMNAR ingest path (§2A 86 → its
    * CORRECTNESS row): the customer parquet scan has a columnar tail,
    * so `DynamoColumnarIngest.ingest` consumes `executeColumnar()`
    * directly — ColumnarBatch cells → vectorCellWriter → the same
    * WalWriter as the row path. The seed REQUIRES the columnar path
    * was actually taken (a silent row-fallback would make the key
    * vacuous), then compacts. The oracle is the plain fixture: any
    * cell the columnar encode got wrong hash-mismatches.
    */
  private def seededColumnarIngestRoot(s: SparkSession, sfDir: String): String = {
    val root = storeRoot(sfDir)
    withSeedLock(root) {
      val marker = Paths.get(root, "customer_colw", "_seeded")
      if (!Files.exists(marker)) {
        val tookColumnar = graft.sources.dynamo.DynamoColumnarIngest.ingest(
          Fixtures.customer(s, sfDir), root, "customer_colw", "c_custkey")
        require(tookColumnar,
          "customer fixture scan must take the columnar ingest path " +
            "(a row-fallback here would leave §2A-86 untested)")
        DynamoMaintenance.compact(s, root, "customer_colw")
        Files.createFile(marker)
      }
    }
    root
  }

  /** Seed `events_bytype` — the DynamoDB time-series shape (hash
    * `event_type`, range `event_id`): a handful of partition keys,
    * each spanning MANY pages. Compaction's hash-group page alignment
    * makes every type's run page-pure, so a type-pinned aggregate
    * answers from per-page statistics with zero item reads
    * (`q_dyn_query_agg`). Values ride as integer cents so sums are
    * exact and order-independent.
    */
  private def seededEventsByTypeRoot(s: SparkSession, sfDir: String): String = {
    val root = storeRoot(sfDir)
    withSeedLock(root) {
      val marker = Paths.get(root, "events_bytype", "_seeded")
      if (!Files.exists(marker)) {
        Fixtures.events(s, sfDir)
          .select(col("event_type"), col("event_id"),
            round(col("value") * 100, 0).cast("long").as("value_cents"))
          .repartition(16)
          .write.format("dynamo")
          .option("path", root).option("tableName", "events_bytype")
          .option("hashKey", "event_type").option("rangeKey", "event_id")
          .mode("append").save()
        DynamoMaintenance.compact(s, root, "events_bytype")
        Files.createFile(marker)
      }
    }
    root
  }

  /** Seed the INTEGER-hash-key fixture: `events_byday` buckets events
    * by epoch day (hash `epoch_day` — a LONG, the common time-series
    * partition shape), range `event_id`. Exercises the integral
    * admission of the filterless sidecar-grouped answer end to end
    * (§2A 71): the `n:` key encoding decodes invertibly to the Spark
    * LongType group value, so `GROUP BY epoch_day` folds wholly from
    * page statistics.
    */
  private def seededEventsByDayRoot(s: SparkSession, sfDir: String): String = {
    val root = storeRoot(sfDir)
    withSeedLock(root) {
      val marker = Paths.get(root, "events_byday", "_seeded")
      if (!Files.exists(marker)) {
        Fixtures.events(s, sfDir)
          .select(
            floor(unix_timestamp(col("ts")) / 86400).cast("long").as("epoch_day"),
            col("event_id"),
            round(col("value") * 100, 0).cast("long").as("value_cents"))
          .repartition(16)
          .write.format("dynamo")
          .option("path", root).option("tableName", "events_byday")
          .option("hashKey", "epoch_day").option("rangeKey", "event_id")
          .mode("append").save()
        DynamoMaintenance.compact(s, root, "events_byday")
        Files.createFile(marker)
      }
    }
    root
  }

  /** Seed the LOCAL-secondary-index fixture: `events_lsi` keeps the
    * base composite key (hash `event_type`, range `event_id`) and an
    * LSI `byval` re-sorts each partition by `value_cents` with a
    * KEYS_ONLY projection — so the read exercises all three LSI-only
    * semantics at once: `stronglyConsistentReads` honored on an index
    * read, non-projected attribute (`user_id`) fetched transparently
    * from the co-located base item, and same-shard placement.
    * Index creation is guarded separately from the load marker so a
    * store seeded by an older build gains the index on first touch.
    */
  private def seededEventsLsiRoot(s: SparkSession, sfDir: String): String = {
    val root = storeRoot(sfDir)
    withSeedLock(root) {
      val marker = Paths.get(root, "events_lsi", "_seeded")
      if (!Files.exists(marker)) {
        Fixtures.events(s, sfDir)
          .select(col("event_type"), col("event_id"),
            round(col("value") * 100, 0).cast("long").as("value_cents"),
            col("user_id"))
          .repartition(16)
          .write.format("dynamo")
          .option("path", root).option("tableName", "events_lsi")
          .option("hashKey", "event_type").option("rangeKey", "event_id")
          .mode("append").save()
        DynamoMaintenance.compact(s, root, "events_lsi")
        Files.createFile(marker)
      }
      val store = new LocalKVStore(root)
      if (!store.describe("events_lsi").indexes.contains("byval"))
        store.createIndex("events_lsi", "byval", graft.sources.dynamo.IndexMeta(
          hashKey = "event_type", rangeKey = Some("value_cents"),
          projection = Some(Seq.empty), local = true))
    }
    root
  }

  private def seededCounterRoot(s: SparkSession, sfDir: String): String = {
    val root = storeRoot(sfDir)
    withSeedLock(root) {
      val marker = Paths.get(root, "user_counters", "_seeded")
      if (!Files.exists(marker)) {
        Fixtures.events(s, sfDir)
          .select(col("user_id"), lit(1L).as("cnt"), col("value").as("amount"))
          .repartition(16)
          .write.format("dynamo")
          .option("path", root).option("tableName", "user_counters")
          .option("hashKey", "user_id")
          .option("updateAction", "add")
          .mode("append").save()
        Files.createFile(marker)
      }
    }
    root
  }

  /** Seed WRITE-SHARDED counters (DynamoDB's hot-partition pattern:
    * a counter updated by many writers spreads over N sub-keys
    * `user#slot`, so no single item — hence no single partition —
    * absorbs the whole write rate; readers sum the slots). Slot =
    * a deterministic event-content hash mod 8, so the oracle can
    * reproduce the fan-out exactly.
    */
  private def seededCounterShardRoot(s: SparkSession, sfDir: String): String = {
    val root = storeRoot(sfDir)
    withSeedLock(root) {
      val marker = Paths.get(root, "user_counters_ws", "_seeded")
      if (!Files.exists(marker)) {
        Fixtures.events(s, sfDir)
          .select(
            concat_ws("#", col("user_id"),
              pmod(abs(hash(col("event_id"))), lit(8)).cast("string"))
              .as("ukey"),
            lit(1L).as("cnt"), col("value").as("amount"))
          .repartition(16)
          .write.format("dynamo")
          .option("path", root).option("tableName", "user_counters_ws")
          .option("hashKey", "ukey")
          .option("updateAction", "add")
          .mode("append").save()
        Files.createFile(marker)
      }
    }
    root
  }

  /** Pinned far-future write clocks for the replica seed (same device
    * as [[asofEpochSeq]]: a seq above any wall clock floors the
    * pubSeq, and the monotone stamp keeps each batch's files within
    * seq..seq+writers — far below the next batch's base, so batch
    * ORDER in the journal is deterministic). Local replay orders by
    * pubSeq; cross-region conflicts resolve by the LWW STAMPS
    * (`_rep_ver`/`_rep_src`), which are independent of these.
    */
  private val replDelSeq = 4102444900000L
  private val replSyncSeq1 = 4102444910000L
  private val replSyncSeq2 = 4102444920000L

  /** Seed TWO replica regions of `customer_rep` (Global Tables shape,
    * [[graft.sources.dynamo.Replication]]):
    *  - both regions bootstrap from the customer parquet stamped
    *    (ver 1, "boot") — identical, like a global table's initial
    *    region copy;
    *  - region A puts `c_custkey % 5 == 0` with an `X-` name prefix
    *    (ver 2, "rA"); region B puts `% 7 == 0` with `c_acctbal+1000`
    *    (ver 2, "rB") — keys `% 35 == 0` CONFLICT at equal version and
    *    resolve whole-item to rB (region tie-break), i.e. original
    *    name, bumped balance;
    *  - region B deletes `% 9 == 0` (ver 3) through the stamped write
    *    path, then COMPACTS — so the deletes reach region A through
    *    tombstone sidecars alone, the post-compaction path;
    *  - one shard-parallel replicate pass each way converges both
    *    regions (two-region LWW needs no relay round).
    * The query reads REGION A — every row it shows arrived there
    * either locally or by replication — and the oracle states the LWW
    * outcome directly over the parquet fixture.
    */
  private def seededReplicaRoot(s: SparkSession, sfDir: String): String = {
    val root = storeRoot(sfDir)
    val rootA = root + "/repA"
    val rootB = root + "/repB"
    withSeedLock(root) {
      val marker = Paths.get(root, "_replica_seeded")
      if (!Files.exists(marker)) {
        val boot = Fixtures.customer(s, sfDir)
          .withColumn("_rep_ver", lit(1L)).withColumn("_rep_src", lit("boot"))
          .repartition(16)
        boot.write.dynamo(rootA, "customer_rep", "c_custkey")
        boot.write.dynamo(rootB, "customer_rep", "c_custkey")
        Fixtures.customer(s, sfDir).filter(col("c_custkey") % 5 === 0)
          .withColumn("c_name", concat(lit("X-"), col("c_name")))
          .withColumn("_rep_ver", lit(2L)).withColumn("_rep_src", lit("rA"))
          .write.dynamo(rootA, "customer_rep", "c_custkey")
        Fixtures.customer(s, sfDir).filter(col("c_custkey") % 7 === 0)
          .withColumn("c_acctbal", col("c_acctbal") + 1000)
          .withColumn("_rep_ver", lit(2L)).withColumn("_rep_src", lit("rB"))
          .write.dynamo(rootB, "customer_rep", "c_custkey")
        // Stamped deletes from executors — the only op that NEEDS the
        // store-level write API (puts stamp via plain columns above;
        // deletes must also record their tombstone).
        Fixtures.customer(s, sfDir).filter(col("c_custkey") % 9 === 0)
          .select("c_custkey")
          .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
            val st = new LocalKVStore(rootB)
            val pid = org.apache.spark.TaskContext.getPartitionId()
            val ops = it.map { r =>
              graft.sources.dynamo.Replication.RDelete(Map("c_custkey" ->
                (graft.sources.dynamo.AttrVal.N(BigDecimal(r.getLong(0)))
                  : graft.sources.dynamo.AttrVal)))
            }.toSeq
            if (ops.nonEmpty)
              graft.sources.dynamo.Replication.writeStamped(st,
                "customer_rep", "rB", 3L, replDelSeq, f"rdel-p$pid%04d",
                ops.toList)
          }
        // Fold region B before replicating: region A must receive the
        // deletes from tombstone sidecars alone (journal folded away).
        DynamoMaintenance.compact(s, rootB, "customer_rep")
        DynamoMaintenance.replicate(s, rootA, rootB, "customer_rep", replSyncSeq1)
        DynamoMaintenance.replicate(s, rootB, rootA, "customer_rep", replSyncSeq2)
        Files.createFile(marker)
      }
    }
    rootA
  }

  /** Seed a second region pair for the INCREMENTAL (journal-shipping)
    * replication path: region D writes in two waves, each followed by
    * a `syncIncremental` pass into region C — the first pass
    * bootstraps and writes the per-region watermark, the second ships
    * ONLY wave-2 keys (the steady-state CDC-shaped path, cost
    * O(new writes) not O(table)). Region C never writes locally, so
    * its state is purely what incremental passes delivered. Wave-2
    * puts are whole items built from the fixture (LWW replicates
    * images, not merges), so `%12` keys lose wave 1's balance bump —
    * the oracle states exactly that.
    */
  private def seededReplicaIncRoot(s: SparkSession, sfDir: String): String = {
    val root = storeRoot(sfDir)
    val rootC = root + "/repC"
    val rootD = root + "/repD"
    withSeedLock(root) {
      val marker = Paths.get(root, "_replica_inc_seeded")
      if (!Files.exists(marker)) {
        val boot = Fixtures.customer(s, sfDir)
          .withColumn("_rep_ver", lit(1L)).withColumn("_rep_src", lit("boot"))
          .repartition(16)
        boot.write.dynamo(rootC, "customer_repi", "c_custkey")
        boot.write.dynamo(rootD, "customer_repi", "c_custkey")
        // Wave 1 at D, then the bootstrap incremental pass.
        Fixtures.customer(s, sfDir).filter(col("c_custkey") % 3 === 0)
          .withColumn("c_acctbal", col("c_acctbal") + 500)
          .withColumn("_rep_ver", lit(2L)).withColumn("_rep_src", lit("rD"))
          .write.dynamo(rootD, "customer_repi", "c_custkey")
        graft.sources.dynamo.Replication.syncIncremental(
          new LocalKVStore(rootD), "rD", new LocalKVStore(rootC),
          "customer_repi", System.currentTimeMillis(), "inc1")
        // Wave 2 at D: whole-item puts (reset %12's bump) + deletes.
        Fixtures.customer(s, sfDir).filter(col("c_custkey") % 4 === 0)
          .withColumn("c_name", concat(lit("Y-"), col("c_name")))
          .withColumn("_rep_ver", lit(3L)).withColumn("_rep_src", lit("rD"))
          .write.dynamo(rootD, "customer_repi", "c_custkey")
        Fixtures.customer(s, sfDir).filter(col("c_custkey") % 10 === 1)
          .select("c_custkey")
          .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
            val st = new LocalKVStore(rootD)
            val pid = org.apache.spark.TaskContext.getPartitionId()
            val ops = it.map { r =>
              graft.sources.dynamo.Replication.RDelete(Map("c_custkey" ->
                (graft.sources.dynamo.AttrVal.N(BigDecimal(r.getLong(0)))
                  : graft.sources.dynamo.AttrVal)))
            }.toList
            if (ops.nonEmpty)
              graft.sources.dynamo.Replication.writeStamped(st,
                "customer_repi", "rD", 4L, replDelSeq, f"rdeli-p$pid%04d",
                ops)
          }
        // Steady-state pass: ships only the keys wave 2 touched.
        graft.sources.dynamo.Replication.syncIncremental(
          new LocalKVStore(rootD), "rD", new LocalKVStore(rootC),
          "customer_repi", System.currentTimeMillis(), "inc2")
        Files.createFile(marker)
      }
    }
    rootC
  }

  /** Seed the IVF postings table: embeddings keyed (hash `label` =
    * coarse cell, range `vec_id`), so one cell's postings live in ONE
    * shard, range-sorted with page directories after compaction — the
    * connector as a vector store.
    */
  private def seededAnnRoot(s: SparkSession, sfDir: String): String = {
    val root = storeRoot(sfDir)
    withSeedLock(root) {
      val marker = Paths.get(root, "emb_ivf", "_seeded")
      if (!Files.exists(marker)) {
        Similarity.embDouble(s, sfDir).repartition(16)
          .write.format("dynamo")
          .option("path", root).option("tableName", "emb_ivf")
          .option("hashKey", "label").option("rangeKey", "vec_id")
          .mode("append").save()
        DynamoMaintenance.compact(s, root, "emb_ivf")
        Files.createFile(marker)
      }
    }
    root
  }

  /** Store-served IVF probe (see `q_dyn_ann`): coarse-quantize from
    * the fixture (tiny broadcast centroid math), read ONLY the best
    * `nprobe` cells' postings from the store (the cell is the table's
    * hash key — the broadcast join's runtime key filter prunes to the
    * owning shards and pages, §2A 52), exact-cosine re-rank.
    */
  private def dynAnnProbe(s: SparkSession, dir: String, nprobe: Int): DataFrame = {
    val root = seededAnnRoot(s, dir)
    val e = Similarity.embDouble(s, dir)
    val best = Similarity.ivfTopCells(e, nprobe)
    val q = e.filter(col("vec_id") === 0).select(col("emb").as("qe"))
    val postings = s.read.format("dynamo")
      .option("path", root).option("tableName", "emb_ivf").load()
    postings.filter(col("vec_id") =!= 0)
      .join(broadcast(best), col("label") === col("best_label"))
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(graft.functions.Funcs.cosineSim(col("emb"), col("qe")), 4)
          .as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(5)
  }

  val queries: Map[String, Q] = Map(
    // VECTOR STORE on the connector (IVF postings table): the coarse
    // quantizer picks the query's best cell from the fixture (tiny
    // centroid math, broadcast), then the candidate scan reads ONLY
    // that cell's postings from the store — the cell is the table's
    // HASH KEY, so the broadcast join's runtime key filter prunes to
    // one shard (and pages within it, §2A 52); exact cosine re-ranks
    // the cell. Identical math to q_sim_ivf — its oracle verbatim —
    // with the posting list served by the store instead of parquet,
    // proving the N↔double codec is bit-exact through the roundtrip.
    "q_dyn_ann" -> ((s, dir) => dynAnnProbe(s, dir, 1)),
    // nprobe = 3 over the store: the broadcast join's runtime filter
    // is now a 3-value key IN-list — the §2A 52 IN-window path — so
    // the scan reads the three matching cells' shards/pages, not the
    // table. Recall/latency dial identical to q_sim_ivf_mprobe
    // (shared oracle).
    "q_dyn_ann_mprobe" -> ((s, dir) => dynAnnProbe(s, dir, 3)),
    // INCREMENTAL replication read: region C received BOTH waves
    // purely through journal-shipping syncIncremental passes (the
    // second shipped only wave-2 keys past the watermark). %4 keys
    // are wave-2 whole items (original balance — %12 keys lost the
    // wave-1 bump, LWW replicates images), %3-only keys keep the
    // +500, %10==1 deleted via stamped tombstones.
    "q_dyn_replica_inc" -> ((s, dir) => {
      val root = seededReplicaIncRoot(s, dir)
      s.read.format("dynamo")
        .option("path", root).option("tableName", "customer_repi").load()
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")
    }),
    // GLOBAL TABLES replication read: region A's state after one
    // bidirectional anti-entropy pass with region B — B's balance
    // bumps and deletes arrived by replication (the deletes purely
    // via tombstones, B's journal was compacted), A's name prefixes
    // stayed, and the %35 conflict keys resolved whole-item to rB by
    // the (ver, region) tie-break. The oracle states that LWW outcome
    // directly over the fixture.
    "q_dyn_replica" -> ((s, dir) => {
      val root = seededReplicaRoot(s, dir)
      s.read.format("dynamo")
        .option("path", root).option("tableName", "customer_rep").load()
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")
    }),
    // ATOMIC COUNTERS (UpdateItem ADD): the table was written as one
    // ADD op per event, so reading it back IS the grouped aggregation
    // the oracle computes over the raw events — write-side
    // aggregation, the DynamoDB counter pattern. `amount` re-rounds
    // because the store accumulates exact decimals while the oracle's
    // double sum carries fp error.
    // CROSS-TABLE ATOMIC TRANSACTIONS: both tables were populated by
    // transactWriteMulti (one shared-commit-marker transaction per
    // chunk, executor-parallel). The read cross-checks the two tables
    // against EACH OTHER (per-chunk aggregate of txn_cust joined to
    // its txn_sum summary row) and the oracle checks both against the
    // parquet fixture — a torn transaction (rows without their
    // summary, or vice versa) hash-mismatches. The 64-row summary
    // side broadcasts.
    "q_dyn_txn_multi" -> ((s, dir) => {
      val root = seededTxnMultiRoot(s, dir)
      val cust = s.read.format("dynamo")
        .option("path", root).option("tableName", "txn_cust").load()
      val sums = s.read.format("dynamo")
        .option("path", root).option("tableName", "txn_sum").load()
      cust.groupBy(col("chunk"))
        .agg(count(lit(1)).as("n_cust"), sum("bal_cents").as("cust_cents"))
        .join(broadcast(sums.select(col("chunk"), col("n_rows"),
          col("sum_cents"))), Seq("chunk"))
        .orderBy("chunk")
    }),
    // COLUMNAR-INGESTED table read-back (§2A 86): customer_colw was
    // loaded exclusively through DynamoColumnarIngest (ColumnarBatch
    // cells → vectorCellWriter → the shared WalWriter; the seed
    // REQUIRES the columnar path ran), so this key oracle-checks the
    // whole columnar encode against the parquet fixture cell-by-cell
    // — the CORRECTNESS row for the columnar write path, same shape
    // as q_dyn_scan's for the row path.
    "q_dyn_ingest_columnar" -> ((s, dir) => {
      val root = seededColumnarIngestRoot(s, dir)
      s.read.format("dynamo")
        .option("path", root).option("tableName", "customer_colw").load()
        .select("c_custkey", "c_name", "c_nationkey", "c_acctbal",
          "c_mktsegment")
        .orderBy("c_custkey")
    }),
    // PartiQL ConditionCheck (§2A 84): the final txn_chk state after
    // the per-key transaction quartet — `flagged` present exactly
    // where the EXISTS condition held over the gate item, `chk2` = 1
    // everywhere because the two always-cancelling transactions (the
    // 999/777 writes) staged NOTHING. Explicit schema: the flag
    // attrs are sparse, so inference's sample page must not decide
    // the shape at scale.
    "q_dyn_txn_check" -> ((s, dir) => {
      val root = seededTxnCheckRoot(s, dir)
      import org.apache.spark.sql.types._
      s.read.format("dynamo")
        .schema(StructType(Seq(
          StructField("c_custkey", LongType),
          StructField("bal_cents", LongType),
          StructField("flagged", LongType),
          StructField("chk2", LongType))))
        .option("path", root).option("tableName", "txn_chk").load()
        .select("c_custkey", "bal_cents", "flagged", "chk2")
        .orderBy("c_custkey")
    }),
    // RETURNING MODIFIED (§2A 85): the persisted returned-images
    // table — bonus_new1 from pass 1's MODIFIED NEW, bonus_old2 +
    // seg_old2 from pass 2's MODIFIED OLD (seg was REMOVEd by that
    // very statement, so only the RETURNED image still knows it; the
    // oracle checks it against the fixture's c_mktsegment).
    "q_dyn_returning" -> ((s, dir) => {
      val root = seededReturningRoot(s, dir)
      import org.apache.spark.sql.types._
      s.read.format("dynamo")
        .schema(StructType(Seq(
          StructField("c_custkey", LongType),
          StructField("tag", StringType),
          StructField("bonus_new1", LongType),
          StructField("bonus_old2", LongType),
          StructField("seg_old2", StringType))))
        .option("path", root).option("tableName", "txn_ret_out").load()
        .select("c_custkey", "tag", "bonus_new1", "bonus_old2", "seg_old2")
        .orderBy("c_custkey")
    }),
    // PAGE-STATISTIC-ANSWERED Query aggregate (§2A 59): the pushed
    // hash pin + pushed MIN/MAX/COUNT/SUM resolve entirely from the
    // owning shard's per-page statistics — hash-group page alignment
    // keeps each event_type's run page-pure, so the plan is ONE
    // metadata partition with zero item reads (spec-pinned); the
    // oracle recomputes over the raw events fixture.
    "q_dyn_query_agg" -> ((s, dir) => {
      val root = seededEventsByTypeRoot(s, dir)
      s.read.dynamo(root, "events_bytype")
        .filter(col("event_type") === "click")
        .agg(count(lit(1)).as("n"),
          min("event_id").as("min_id"), max("event_id").as("max_id"),
          sum("value_cents").as("cents"))
    }),
    // FILTERLESS grouped answering (round 12): no pushed filter at
    // all — the groups enumerate from the page directories' own pure
    // hash bounds, so the ENTIRE `GROUP BY event_type` aggregate
    // folds from sidecars with zero item reads (the
    // DescribeTable-statistics move, per group).
    "q_dyn_group_scan" -> ((s, dir) => {
      val root = seededEventsByTypeRoot(s, dir)
      s.read.dynamo(root, "events_bytype")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          min("event_id").as("min_id"), max("event_id").as("max_id"),
          sum("value_cents").as("cents"))
        .orderBy("event_type")
    }),
    // INTEGER-hash-key filterless grouped answering (round 13, §2A
    // 71): the time-series shape — GROUP BY an epoch-day LONG hash
    // key. The canonical `n:` encoding decodes invertibly into the
    // LongType group column (every stored day is whole and in range),
    // so the whole grouped aggregate folds from page sidecars with
    // zero item reads; a fractional or out-of-range stored key would
    // decline to the ordinary grouped scan.
    "q_dyn_group_scan_ts" -> ((s, dir) => {
      val root = seededEventsByDayRoot(s, dir)
      s.read.dynamo(root, "events_byday")
        .groupBy("epoch_day")
        .agg(count(lit(1)).as("n"),
          min("event_id").as("min_id"), max("event_id").as("max_id"),
          sum("value_cents").as("cents"))
        .orderBy("epoch_day")
    }),
    // GROUPED page-statistic answering (round 12): GROUP BY the hash
    // key under a hash-IN pin — each pinned value is one group and one
    // page-pure run, so the plan folds one exact partial PER GROUP
    // from the same sidecars q_dyn_query_agg reads: one metadata
    // partition, zero item reads, three group rows.
    "q_dyn_group_agg" -> ((s, dir) => {
      val root = seededEventsByTypeRoot(s, dir)
      s.read.dynamo(root, "events_bytype")
        .filter(col("event_type").isin("click", "purchase", "view"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          min("event_id").as("min_id"), max("event_id").as("max_id"),
          sum("value_cents").as("cents"))
        .orderBy("event_type")
    }),
    "q_dyn_counter" -> ((s, dir) => {
      val root = seededCounterRoot(s, dir)
      s.read.format("dynamo")
        .option("path", root).option("tableName", "user_counters").load()
        .select(col("user_id"), col("cnt"),
          round(col("amount"), 2).as("amount"))
        .orderBy("user_id")
    }),
    // DELTA-fresh GSI read: the index-key-pinned read serves the
    // materialized copy PLUS the pinned journal overlay — deleted
    // rows vanish, the updated sentinel appears at its merged value —
    // without any rebuild. The oracle expresses the same final state
    // over the parquet fixture.
    // WRITE-THROUGH GSI read: same two-epoch table shape as
    // q_dyn_gsi_delta, but the publish-time applier's journal is kept
    // — the read serves copy + round files EXACTLY, zero base-shard
    // work, zero read-time re-derivation (the IndexJournal tier;
    // q_dyn_gsi_delta pins the applier-lag DELTA overlay instead).
    // WRITE-SHARDED counters (the DynamoDB hot-partition pattern):
    // each user's counter spreads over 8 `user#slot` sub-items so no
    // single item absorbs the whole write rate; the read sums the
    // slots back to one row per user — which must equal the plain
    // grouped aggregation over raw events (the q_dyn_counter oracle),
    // because any partition of a user's events sums to the same
    // totals. The slot function never appears in the oracle: that
    // independence IS the pattern's correctness argument.
    "q_dyn_counter_sharded" -> ((s, dir) => {
      val root = seededCounterShardRoot(s, dir)
      s.read.format("dynamo")
        .option("path", root).option("tableName", "user_counters_ws").load()
        .select(split(col("ukey"), "#").getItem(0).cast("long").as("user_id"),
          col("cnt"), col("amount"))
        .groupBy("user_id")
        .agg(sum("cnt").as("cnt"), round(sum("amount"), 2).as("amount"))
        .orderBy("user_id")
    }),
    "q_dyn_gsi_wt" -> ((s, dir) => {
      val root = seededGsiWtRoot(s, dir)
      s.read.format("dynamo")
        .option("path", root).option("tableName", "customer_gsiw")
        .option("indexName", "by_seg").load()
        .filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey", "c_mktsegment", "c_acctbal")
        .orderBy("c_custkey")
    }),
    "q_dyn_gsi_delta" -> ((s, dir) => {
      val root = seededGsiDeltaRoot(s, dir)
      s.read.format("dynamo")
        .option("path", root).option("tableName", "customer_gsid")
        .option("indexName", "by_seg").load()
        .filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey", "c_mktsegment", "c_acctbal")
        .orderBy("c_custkey")
    }),
    // WAL time travel (PITR shape): the snapshot read bounds the
    // journal replay at a past sequence, so the result equals the
    // table before the epoch-2 deletes/put — i.e. the parquet fixture
    // exactly, which IS the oracle. The latest read sees epoch 2.
    "q_dyn_asof" -> ((s, dir) => {
      val root = seededAsofRoot(s, dir)
      s.read.format("dynamo")
        .option("path", root).option("tableName", "customer_asof")
        .option("asOfSeq", (asofEpochSeq - 1).toString).load()
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")
    }),
    // PITR RESTORE-to-new-table: materialize the pre-epoch-2 cut of
    // customer_asof as a standalone compacted table (shard-parallel
    // replay + fold; indexes rebuilt from restored data). The
    // restored table serves WITHOUT any asOfSeq option — the history
    // is baked in — so it must equal the parquet fixture exactly,
    // which IS the oracle. q_dyn_asof proves the journal-bounded
    // READ; this proves the restore MATERIALIZATION.
    "q_dyn_restore" -> ((s, dir) => {
      val root = seededAsofRoot(s, dir)
      withSeedLock(root) {
        val marker = Paths.get(root, "customer_restored", "_restored")
        if (!Files.exists(marker)) {
          // no seed marker = no prior completed seed: drop any partial
          // attempt (restoreAsOf refuses an existing non-quarantined
          // destination, by the service's restore-to-NEW-table rule)
          val dst = Paths.get(root, "customer_restored")
          if (Files.isDirectory(dst)) {
            val w = Files.walk(dst)
            try w.iterator().asScala.toSeq.sortBy(-_.getNameCount)
              .foreach(Files.deleteIfExists(_))
            finally w.close()
          }
          DynamoMaintenance.restoreAsOf(s, root, "customer_asof",
            root, "customer_restored", asofEpochSeq - 1)
          Files.createFile(marker)
        }
      }
      s.read.format("dynamo")
        .option("path", root).option("tableName", "customer_restored").load()
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")
    }),
    // EXPORT → IMPORT roundtrip: snapshot-export the pre-epoch-2 cut
    // to parquet (segmented scan → columnar writer), then import that
    // parquet back through the connector's bulk write into a THIRD
    // table — the full DynamoDB export/import loop, including the
    // store-N ↔ parquet-type codec roundtrip — and read the imported
    // table with no snapshot option. Equals the fixture exactly.
    "q_dyn_export_import" -> ((s, dir) => {
      val root = seededAsofRoot(s, dir)
      withSeedLock(root) {
        val marker = Paths.get(root, "customer_imported", "_imported")
        if (!Files.exists(marker)) {
          val out = root + "/export-customer-asof"
          DynamoMaintenance.exportAsOf(s, root, "customer_asof", out,
            Some(asofEpochSeq - 1))
          seedIngest(s, root, "customer_imported", "c_custkey")(
            _.read.parquet(out))
          DynamoMaintenance.compact(s, root, "customer_imported")
          Files.createFile(marker)
        }
      }
      s.read.format("dynamo")
        .option("path", root).option("tableName", "customer_imported").load()
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")
    }),
    // CROSS-TABLE consistent snapshot: ONE epoch-millis cut addresses
    // BOTH co-stored tables (pubSeq is a clock stamp, so the same
    // value is a table-independent snapshot coordinate — the
    // multi-table-consistent read DynamoDB PITR restores give).
    // Both reads roll back before each table's epoch-2 batch, so the
    // join equals the plain parquet join — which IS the oracle. A
    // torn cut (one table pre-epoch-2, the other post) would lose the
    // %10==3 orders or customers and hash-mismatch.
    "q_dyn_asof_multi" -> ((s, dir) => {
      val root = seededAsofMultiRoot(s, dir)
      val cut = (asofEpochSeq - 1).toString
      def rd(t: String) = s.read.format("dynamo")
        .option("path", root).option("tableName", t)
        .option("asOfSeq", cut).load()
      val c = rd("customer_asof").select("c_custkey", "c_acctbal")
      val o = rd("orders_asof").select("o_custkey", "o_totalprice")
      c.join(o, col("c_custkey") === col("o_custkey"))
        .groupBy("c_custkey")
        .agg(count(lit(1)).as("n_orders"),
          round(sum("o_totalprice"), 2).as("total_price"),
          max("c_acctbal").as("acctbal"))
        .orderBy("c_custkey")
    }),
    "q_dyn_asof_latest" -> ((s, dir) => {
      val root = seededAsofRoot(s, dir)
      s.read.format("dynamo")
        .option("path", root).option("tableName", "customer_asof").load()
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")
    }),
    // Storage-partitioned join: customer ⋈ customer_flags share the
    // bucket(16, c_custkey) layout, both loaded through the catalog
    // (whose FunctionCatalog resolves the transform), so the join runs
    // with ZERO exchange on either side — the plan PlanSpec pins. The
    // merge hint only rules out broadcast; the v2.bucketing confs are
    // pinned uniformly by every harness session (Verify/Bench/
    // TestSpark), never re-set inside a query builder. Catalog name is root-derived because catalog
    // instances cache per name for the session's lifetime.
    "q_dyn_spj" -> ((s, dir) => {
      val root = seededFlagsRoot(s, dir)
      val cat = "graftdyn" + root.replaceAll("[^A-Za-z0-9]", "")
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.dynamo.DynamoCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.path", root)
      s.conf.set(s"spark.sql.catalog.$cat.readPartitions", "16")
      s.table(s"$cat.customer")
        .join(s.table(s"$cat.customer_flags").hint("merge"), "c_custkey")
        .filter(col("positive"))
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")
    }),
    // Partially-clustered SPJ: the pushed IN-filter prunes the
    // customer scan to a shard SUBSET while customer_flags stays full;
    // `pushPartValues` aligns the mismatched partition-value sets so
    // the join still runs with zero exchange on either side (the full
    // 100 TB side is never re-shuffled just because the probe side was
    // pruned) — StoragePartitionedJoinSpec pins the plan.
    "q_dyn_spj_pruned" -> ((s, dir) => {
      val root = seededFlagsRoot(s, dir)
      val cat = "graftdyn" + root.replaceAll("[^A-Za-z0-9]", "")
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.dynamo.DynamoCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.path", root)
      s.conf.set(s"spark.sql.catalog.$cat.readPartitions", "16")
      s.table(s"$cat.customer")
        .filter(col("c_custkey").isin(42, 999, 1077))
        .join(s.table(s"$cat.customer_flags").hint("merge"), "c_custkey")
        .select("c_custkey", "c_name", "c_acctbal", "positive")
        .orderBy("c_custkey")
    }),

    // PartiQL ExecuteStatement (the service's statement-based data
    // API): the SELECT translates onto the connector's OWN read — the
    // CALL's result is literally the DataFrame read's rows, so the
    // oracle on the parquet fixture checks the whole translator +
    // read stack. Writes (INSERT/UPDATE/DELETE, conditional journal
    // ops) are spec-covered in DynamoConnectorSpec.
    "q_dyn_partiql" -> ((s, dir) => {
      val root = seededRoot(s, dir)
      val cat = "graftdyn" + root.replaceAll("[^A-Za-z0-9]", "")
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.dynamo.DynamoCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.path", root)
      s.conf.set(s"spark.sql.catalog.$cat.readPartitions", "16")
      s.sql(s"CALL $cat.execute_statement(" +
        "'SELECT c_custkey, c_name, c_acctbal FROM customer " +
        "WHERE c_mktsegment = ''BUILDING'' AND c_acctbal BETWEEN 1000 AND 5000 " +
        "ORDER BY c_custkey')")
    }),

    // PartiQL boolean WHERE structure (round-14 dialect extension):
    // OR / NOT / parentheses translate onto the same DataFrame read,
    // through the LAZY composable surface (selectDataFrame) — the
    // analytics-path form with no page bound, fully distributed, so
    // this key stays sf-proof while the CALL form pages at ~1 MB.
    "q_dyn_partiql_or" -> ((s, dir) => {
      val root = seededRoot(s, dir)
      graft.sources.dynamo.PartiQL.selectDataFrame(s, root,
        "SELECT c_custkey, c_mktsegment, c_acctbal FROM customer " +
          "WHERE c_mktsegment = 'BUILDING' OR " +
          "(c_acctbal < 500 AND NOT (c_mktsegment = 'MACHINERY'))")
        .orderBy("c_custkey")
    }),

    // PartiQL condition functions (round-15 dialect completion):
    // size() resolves against the read's own decoded schema (string →
    // length, list/map → element count, binary → bytes) and
    // attribute_type() against the static decoded type — both compile
    // to native Catalyst over the same DataFrame read, so the key
    // pins the whole translator + type-resolution path under the
    // DuckDB oracle. size(c_mktsegment) = 8 selects exactly the
    // BUILDING segment (the only 8-char value) — a predicate the
    // translation must get right per-row, not a constant.
    "q_dyn_partiql_fn" -> ((s, dir) => {
      val root = seededRoot(s, dir)
      graft.sources.dynamo.PartiQL.selectDataFrame(s, root,
        "SELECT c_custkey, c_mktsegment, c_acctbal FROM customer " +
          "WHERE (size(c_mktsegment) = 8 OR " +
          "(size(c_name) > 17 AND c_acctbal < 0)) " +
          "AND attribute_type(c_acctbal, 'N')")
        .orderBy("c_custkey")
    }),

    // ExecuteStatement pagination (the service's NextToken): drive the
    // token loop at a tiny page bound so the key proves, under the
    // DuckDB oracle, that bounded pages CONCATENATE to the one-shot
    // read — resume is an ordered read with a PUSHED sort-key start
    // window, so page N+1 never rescans pages 1..N's key range.
    "q_dyn_partiql_page" -> ((s, dir) => {
      val root = seededOrdersRoot(s, dir)
      import graft.sources.dynamo.PartiQL
      val stmt = "SELECT o_orderkey, o_totalprice FROM orders WHERE o_custkey = 37"
      val out = Seq.newBuilder[org.apache.spark.sql.Row]
      var token: Option[String] = None
      var done = false
      var pages = 0
      while (!done) {
        val (sch, rows) = PartiQL.execute(root, stmt, Nil, None, false,
          token, pageBytes = 64)
        pages += 1
        require(pages < 1000, "paging must terminate")
        val okI = sch.fieldIndex("o_orderkey")
        val tpI = sch.fieldIndex("o_totalprice")
        rows.foreach(r => out +=
          org.apache.spark.sql.Row(r.getLong(okI), r.getDouble(tpI)))
        sch.fieldNames.indexOf("next_token") match {
          case i if i >= 0 => token = Some(rows.head.getUTF8String(i).toString)
          case _ => done = true
        }
      }
      require(pages > 1, s"the tiny page bound must force >1 page, got $pages")
      import scala.jdk.CollectionConverters._
      s.createDataFrame(out.result().asJava, org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("o_orderkey",
          org.apache.spark.sql.types.LongType, nullable = true),
        org.apache.spark.sql.types.StructField("o_totalprice",
          org.apache.spark.sql.types.DoubleType, nullable = true))))
    }),

    // DynamoDB `Query` shape (KeyConditionExpression analogue): hash
    // key pinned by equality + a sort-key range condition. Shard
    // pruning plans ONE segment (the owning shard), and inside it the
    // page directory written at compaction skips every base page
    // outside [100, 100000] on the sorted sort key — the read costs
    // O(matching pages), not O(shard), like Query vs Scan. At 100 TB
    // this is the difference between a point-ish read and a partition
    // scan; DynamoConnectorSpec pins the sub-shard read count.
    "q_dyn_query" -> ((s, dir) => {
      val root = seededOrdersRoot(s, dir)
      s.read.dynamo(root, "orders")
        .filter(col("o_custkey") === 37 && col("o_orderkey").between(100, 100000))
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .orderBy("o_orderkey")
    }),

    // Query + pushed top-N composition (ScanIndexForward=false +
    // Limit): the hash pin plans one shard, the page window bounds
    // the I/O to the matching sort-key run, and the pushed top-N
    // keeps only the best 5 inside the reader — DynamoDB's descending
    // Query with Limit, end to end.
    "q_dyn_query_topn" -> ((s, dir) => {
      val root = seededOrdersRoot(s, dir)
      s.read.dynamo(root, "orders")
        .filter(col("o_custkey") === 37 && col("o_orderkey") >= 100)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .orderBy(col("o_orderkey").desc)
        .limit(5)
    }),

    // `begins_with` Query shape on a STRING sort key: the hash pin
    // plans one shard, and the page directory prunes with the prefix
    // as BOTH an inclusive lower bound and a prefix-space upper bound
    // (truncated-compare — no invalid-UTF8 successor strings), so the
    // read touches only the sorted run of matching sort keys.
    "q_dyn_query_prefix" -> ((s, dir) => {
      val root = seededDocKeysRoot(s, dir)
      s.read.dynamo(root, "doc_keys")
        .filter(col("lang") === "en" && col("sk").startsWith("src1"))
        .select("doc_id", "sk", "n_chars")
        .orderBy("doc_id")
    }),

    // GSI Query (composite index: hash c_mktsegment, range
    // c_acctbal): the index-hash pin plans the owning INDEX shard and
    // the sort-key bound prunes the sorted copy's pages — DynamoDB's
    // `Query` against a GSI, at O(matching pages) I/O.
    "q_dyn_gsi_query" -> ((s, dir) => {
      val root = seededRoot(s, dir)
      s.read.dynamoIndex(root, "customer", "by_seg_bal")
        .filter(col("c_mktsegment") === "BUILDING" &&
          col("c_acctbal").between(1000.0, 3000.0))
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")
    }),

    // Range-keyed scan (composite primary key): hash-key predicate +
    // range predicate + non-key filter, all pushed to the store scan.
    "q_dyn_range" -> ((s, dir) => {
      val root = seededOrdersRoot(s, dir)
      s.read.dynamo(root, "orders")
        .filter(col("o_custkey") <= 100 && col("o_totalprice") > 50000)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .orderBy("o_orderkey")
    }),

    // Full connector scan with inferred (sampled) schema — A1/A6/A9.
    "q_dyn_scan" -> ((s, dir) => {
      val root = seededRoot(s, dir)
      s.read.dynamo(root, "customer")
        .select("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
        .orderBy("c_custkey")
    }),

    // Consistent parallel scan: the planner pins ONE journal listing
    // into every partition, so all tasks (and task retries) replay the
    // same snapshot. With no concurrent writer the result equals the
    // plain scan — which IS the oracle; the snapshot semantics under
    // writes are spec-pinned (DynamoConnectorSpec).
    "q_dyn_consistent" -> ((s, dir) => {
      val root = seededRoot(s, dir)
      s.read.format("dynamo")
        .option("path", root).option("tableName", "customer")
        .option("consistentScan", "true").load()
        .select("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
        .orderBy("c_custkey")
    }),

    // TABLESAMPLE pushdown: the seeded key-hash Bernoulli sample runs
    // inside the scan (Spark's Sample operator is removed), so a 30%
    // preview of a huge table reads 30% of the decode work per segment
    // with no driver state. Deterministic per (table, seed) — the
    // row set is reproducible across runs, but not expressible in
    // portable SQL, so this key is rows-only checked (no oracle).
    "q_dyn_sample" -> ((s, dir) => {
      val root = seededRoot(s, dir)
      s.read.dynamo(root, "customer")
        .sample(0.3, 1234L)
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")
    }),

    // Column pruning + filter pushdown through the ScanBuilder — A4/A5.
    "q_dyn_prune_filter" -> ((s, dir) => {
      val root = seededRoot(s, dir)
      s.read.dynamo(root, "customer")
        .filter(col("c_mktsegment") === "BUILDING" && col("c_acctbal") > 0)
        .select("c_custkey", "c_acctbal")
        .orderBy("c_custkey")
    }),

    // GSI read (A8): scan through the sparse `by_segment` index — the
    // visible attribute set is (table key ∪ index key ∪ projection),
    // and the index-key filter is pushed to the store scan.
    "q_dyn_gsi" -> ((s, dir) => {
      val root = seededRoot(s, dir)
      s.read.dynamoIndex(root, "customer", "by_segment")
        .filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey", "c_mktsegment", "c_acctbal")
        .orderBy("c_custkey")
    }),

    // LOCAL secondary index (round 12): a strongly-consistent Query
    // over the LSI's alternate sort key, selecting a NON-PROJECTED
    // attribute — the two reads a GSI cannot serve (DynamoDB rejects
    // ConsistentRead on GSIs and cannot fetch outside the
    // projection). The read demotes to the co-located base partition
    // (same shard as the table's own — LSI placement), folds the
    // live journal at reader time, and fetches `user_id` from the
    // base item transparently.
    "q_dyn_lsi" -> ((s, dir) => {
      val root = seededEventsLsiRoot(s, dir)
      s.read.format("dynamo")
        .option("path", root).option("tableName", "events_lsi")
        .option("indexName", "byval")
        .option("stronglyConsistentReads", "true")
        .load()
        .filter(col("event_type") === "click" &&
          col("value_cents") >= 2000L && col("value_cents") <= 8000L)
        .select("event_type", "event_id", "value_cents", "user_id")
        .orderBy("event_id")
    }),

    // Grouped aggregate pushdown over the MATERIALIZED GSI, COMPLETE:
    // the copy is hash-partitioned by the INDEX hash key, so grouping
    // by it makes every group index-shard-local — segments ship one
    // FINAL row per segment value and Spark plans no aggregate at all.
    // The serve-via-index decision is made at negotiation and PINNED
    // into the scan (no plan-time freshness re-check), so the
    // completeness claim can never execute over the base-scan
    // fallback where these groups span segments. At 100 TB this is
    // DynamoDB's "aggregate by GSI partition" shape with zero shuffle.
    "q_dyn_gsi_group" -> ((s, dir) => {
      val root = seededRoot(s, dir)
      s.read.dynamoIndex(root, "customer", "by_segment")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), sum("c_custkey").as("sum_key"),
             avg("c_custkey").as("avg_key"),
             min("c_acctbal").as("min_bal"), max("c_acctbal").as("max_bal"))
        .orderBy("c_mktsegment")
    }),

    // COUNT(*) pushdown (DynamoDB Select=COUNT): the scan ships one
    // partial count per segment and never decodes an item; the pushed
    // filter is evaluated below the count.
    "q_dyn_count" -> ((s, dir) => {
      val root = seededRoot(s, dir)
      s.read.dynamo(root, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .agg(count(lit(1)).as("n"))
    }),

    // MIN/MAX/SUM/COUNT(col) pushdown: segments ship one row of
    // partials each — the aggregates decode only their own attribute,
    // items never leave the store side (DynamoDB offers only
    // Select=COUNT; the per-segment partials are the natural
    // extension). The sum rides an integral column so the partials
    // fold exactly on both engines.
    "q_dyn_minmax" -> ((s, dir) => {
      val root = seededRoot(s, dir)
      s.read.dynamo(root, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .agg(min("c_acctbal").as("min_bal"), max("c_acctbal").as("max_bal"),
             min("c_name").as("first_name"), sum("c_custkey").as("sum_key"),
             count(col("c_acctbal")).as("n_bal"), count(lit(1)).as("n"))
    }),

    // Zone-map-ANSWERED MIN/MAX/COUNT(*): no filter, an aggregate
    // list of only min/max/count(*), compacted store (journal empty)
    // with exact base sidecars — the scan plans ONE metadata partition
    // carrying the folded zone-map ranges + summed item counters and
    // reads ZERO items. At 100 TB this is `SELECT min(x), max(x),
    // count(*)` answered from O(shards) sidecar files — the
    // Parquet-footer-statistics move (and DescribeTable's ItemCount)
    // applied to the store.
    "q_dyn_zone_minmax" -> ((s, dir) => {
      val root = seededRoot(s, dir)
      s.read.dynamo(root, "customer")
        .agg(min("c_acctbal").as("min_bal"), max("c_acctbal").as("max_bal"),
             min("c_name").as("min_name"), max("c_name").as("max_name"),
             min("c_custkey").as("min_key"), max("c_custkey").as("max_key"),
             count(lit(1)).as("n"), count(col("c_acctbal")).as("n_bal"),
             sum("c_custkey").as("sum_key"))
    }),

    // Fact ⋈ dim storage-partitioned join on the PARTITION key: the
    // composite-keyed orders table (hash o_custkey, range o_orderkey)
    // and hash-only customer co-locate each customer's orders with its
    // dim row (layout-2 placement), so the classic fact-table join
    // runs with ZERO exchange on either side — at 100 TB the dominant
    // repeated cost (re-shuffling the fact side per join) is gone.
    // StoragePartitionedJoinSpec pins the exchange-free plan shape.
    "q_dyn_spj_fact" -> ((s, dir) => {
      seededRoot(s, dir) // customer (and its GSI)
      val root = seededOrdersRoot(s, dir) // same store root
      val cat = "graftdyn" + root.replaceAll("[^A-Za-z0-9]", "")
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.dynamo.DynamoCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.path", root)
      s.conf.set(s"spark.sql.catalog.$cat.readPartitions", "16")
      // SPJ needs spark.sql.sources.v2.bucketing.enabled, which every
      // harness session pins uniformly (Verify/Bench/TestSpark) — do
      // not re-set session-wide conf inside a query builder.
      s.table(s"$cat.orders")
        .join(s.table(s"$cat.customer").hint("merge"),
          col("o_custkey") === col("c_custkey"))
        .filter(col("o_totalprice") > 150000)
        .select("o_orderkey", "o_custkey", "c_name", "o_totalprice")
        .orderBy("o_orderkey")
    }),

    // Grouped aggregate pushdown, COMPLETE: grouping by the PARTITION
    // key makes every group shard-local (layout-2 placement), so the
    // whole GROUP BY runs inside the scan — segments ship one FINAL
    // row per customer and Spark plans no aggregate at all: a grouped
    // rollup over a 100 TB order table with zero shuffle. The sum
    // rides the integral order key so partials fold exactly.
    "q_dyn_group_push" -> ((s, dir) => {
      val root = seededOrdersRoot(s, dir)
      s.read.dynamo(root, "orders")
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"), sum("o_orderkey").as("sum_key"),
             min("o_totalprice").as("min_price"), max("o_totalprice").as("max_price"))
        .orderBy("o_custkey")
    }),

    // AVG pushdown, COMPLETE only: Spark hands Avg to a source just
    // when supportCompletePushDown accepted the aggregation — here
    // grouping by the partition key makes every group shard-local and
    // the screen says groups are bounded, so each segment emits FINAL
    // averages and Spark plans no aggregate at all. Integral input
    // (o_orderkey) keeps the double sum exact and order-independent,
    // so the pushed value is bit-identical to the oracle's.
    "q_dyn_avg_push" -> ((s, dir) => {
      val root = seededOrdersRoot(s, dir)
      s.read.dynamo(root, "orders")
        .groupBy("o_custkey")
        .agg(avg("o_orderkey").as("avg_okey"), count(lit(1)).as("n_orders"))
        .orderBy("o_custkey")
    }),

    // Exchange-free WINDOW over the store layout: the catalog scan
    // reports bucket(16, o_custkey), which satisfies the window's
    // ClusteredDistribution on the same key — rows of one customer
    // are already co-located per shard, so rank-within-customer runs
    // with NO exchange before the (per-partition) sort. At 100 TB the
    // usual "shuffle the fact table to rank within key" disappears;
    // the plan shape is pinned by StoragePartitionedJoinSpec's conf.
    "q_dyn_win_local" -> ((s, dir) => {
      val root = seededOrdersRoot(s, dir)
      val cat = "graftdyn" + root.replaceAll("[^A-Za-z0-9]", "")
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.dynamo.DynamoCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.path", root)
      s.conf.set(s"spark.sql.catalog.$cat.readPartitions", "16")
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      s.table(s"$cat.orders")
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 2)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
        .orderBy("o_custkey", "rk")
    }),

    // Top-N pushdown (ORDER BY ... LIMIT over the scan): each segment
    // ships only its own best 10 rows through a bounded heap — at
    // table scale the scan emits ~10×segments candidate rows, not the
    // table — and Spark's TakeOrderedAndProject merges them (partial
    // push, exact by construction). Tie-break on the unique key keeps
    // the result deterministic.
    "q_dyn_topn" -> ((s, dir) => {
      val root = seededRoot(s, dir)
      s.read.dynamo(root, "customer")
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy(desc("c_acctbal"), asc("c_custkey"))
        .limit(10)
    }),

    // Point lookup (DynamoDB GetItem shape): the primary-key equality
    // pins the owning shard, so the scan plans ONE input partition and
    // reads one base shard + its own WAL slice — item-proportional,
    // not table-proportional (PushdownLawsSpec property-tests the
    // shard pruning against hostile key values).
    "q_dyn_point" -> ((s, dir) => {
      val root = seededRoot(s, dir)
      s.read.dynamo(root, "customer")
        .filter(col("c_custkey") === 42)
        .select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")
    }),

    // Typed read Dataset[GCustomer] — A7 — then back to a DataFrame.
    "q_dyn_typed" -> ((s, dir) => {
      val root = seededRoot(s, dir)
      s.dynamoAs[GCustomer](root, "customer")
        .filter(_.c_acctbal > 0)
        .toDF()
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")
    }))

  val oracle: Map[String, String] = Map(
    // identical pipeline to q_sim_ivf with the postings served by the
    // store — the oracle is shared verbatim
    "q_dyn_ann" -> Similarity.oracle("q_sim_ivf"),
    "q_dyn_ann_mprobe" -> Similarity.oracle("q_sim_ivf_mprobe"),
    // region C after two incremental passes: %10==1 deleted (ver 4),
    // %4 = wave-2 whole item (original balance, Y- name), %3-only
    // keeps wave 1's +500
    "q_dyn_replica_inc" ->
      """SELECT c_custkey,
        |  CASE WHEN c_custkey % 4 = 0 THEN 'Y-' || c_name
        |       ELSE c_name END AS c_name,
        |  CASE WHEN c_custkey % 4 = 0 THEN c_acctbal
        |       WHEN c_custkey % 3 = 0 THEN c_acctbal + 500
        |       ELSE c_acctbal END AS c_acctbal
        |FROM customer WHERE c_custkey % 10 <> 1
        |ORDER BY c_custkey""".stripMargin,
    // region A after bidirectional LWW sync: %9 deleted (rB ver 3),
    // %35 conflict → rB's whole item (original name, bumped balance),
    // %5 → rA's X- prefix, %7 → rB's +1000 balance
    "q_dyn_replica" ->
      """SELECT c_custkey,
        |  CASE WHEN c_custkey % 35 = 0 THEN c_name
        |       WHEN c_custkey % 5 = 0 THEN 'X-' || c_name
        |       ELSE c_name END AS c_name,
        |  CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 1000
        |       ELSE c_acctbal END AS c_acctbal
        |FROM customer WHERE c_custkey % 9 <> 0
        |ORDER BY c_custkey""".stripMargin,
    // the snapshot read rolls the journal back to before epoch 2, so
    // the oracle is the untouched parquet fixture; the latest read is
    // the fixture with epoch 2 (deletes + sentinel put) expressed in SQL
    "q_dyn_asof" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |ORDER BY c_custkey""".stripMargin,
    // the restore materialized the same pre-epoch-2 cut, so the
    // restored table equals the untouched fixture
    "q_dyn_restore" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |ORDER BY c_custkey""".stripMargin,
    // export→import roundtrips the same cut through parquet + bulk
    // write, so the imported table also equals the fixture
    "q_dyn_export_import" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |ORDER BY c_custkey""".stripMargin,
    // both sides of the cross-table transaction reduce to the same
    // parquet aggregate — any torn chunk breaks one of the pair
    "q_dyn_txn_multi" ->
      """SELECT CAST(c_custkey % 64 AS BIGINT) AS chunk,
        |       CAST(count(*) AS BIGINT) AS n_cust,
        |       CAST(SUM(CAST(ROUND(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT)
        |         AS cust_cents,
        |       CAST(count(*) AS BIGINT) AS n_rows,
        |       CAST(SUM(CAST(ROUND(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT)
        |         AS sum_cents
        |FROM customer GROUP BY 1 ORDER BY chunk""".stripMargin,
    // the columnar-ingested copy is faithful ⇔ it equals the fixture
    // (int32 widens to BIGINT through the store's N type, like
    // q_dyn_scan)
    "q_dyn_ingest_columnar" ->
      """SELECT c_custkey, c_name, CAST(c_nationkey AS BIGINT) AS c_nationkey,
        |       c_acctbal, c_mktsegment
        |FROM customer ORDER BY c_custkey""".stripMargin,
    // the ConditionCheck quartet's final state restates over the
    // fixture: flagged iff the gate condition held, chk2 = 1 iff the
    // cancelled transactions (999/777) truly staged nothing
    "q_dyn_txn_check" ->
      """SELECT c_custkey,
        |       CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS bal_cents,
        |       CASE WHEN CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) >= 0
        |            THEN CAST(1 AS BIGINT) END AS flagged,
        |       CAST(1 AS BIGINT) AS chk2
        |FROM customer WHERE c_custkey % 100 = 0
        |ORDER BY c_custkey""".stripMargin,
    // the persisted MODIFIED images restate over the fixture: both
    // bonus columns are the pass-1 value (pass 2's OLD is pass 1's
    // NEW) and seg_old2 is the fixture segment the REMOVE destroyed
    "q_dyn_returning" ->
      """SELECT c_custkey,
        |       'k' || CAST(c_custkey AS VARCHAR) AS tag,
        |       2 * CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) + 7 AS bonus_new1,
        |       2 * CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) + 7 AS bonus_old2,
        |       c_mktsegment AS seg_old2
        |FROM customer WHERE c_custkey % 100 = 0
        |ORDER BY c_custkey""".stripMargin,
    // the type-pinned aggregate reduces to the same numbers over the
    // raw events fixture (cents keep the sum exact)
    "q_dyn_query_agg" ->
      """SELECT CAST(count(*) AS BIGINT) AS n,
        |       min(event_id) AS min_id, max(event_id) AS max_id,
        |       CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
        |         AS cents
        |FROM events WHERE event_type = 'click'""".stripMargin,
    // filterless grouped form: sidecar-enumerated groups reduce to
    // the plain grouped aggregate over the raw events fixture
    "q_dyn_group_scan" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |       min(event_id) AS min_id, max(event_id) AS max_id,
        |       CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
        |         AS cents
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin,
    // integer-hash-key filterless grouped form: the sidecar-enumerated
    // LONG groups reduce to the plain day-bucketed aggregate
    "q_dyn_group_scan_ts" ->
      """SELECT CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 86400) AS BIGINT)
        |         AS epoch_day,
        |       CAST(count(*) AS BIGINT) AS n,
        |       min(event_id) AS min_id, max(event_id) AS max_id,
        |       CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
        |         AS cents
        |FROM events GROUP BY 1 ORDER BY epoch_day""".stripMargin,
    // grouped form: the per-type page-stat folds reduce to the same
    // grouped aggregate over the raw events fixture
    "q_dyn_group_agg" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |       min(event_id) AS min_id, max(event_id) AS max_id,
        |       CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
        |         AS cents
        |FROM events WHERE event_type IN ('click', 'purchase', 'view')
        |GROUP BY 1 ORDER BY event_type""".stripMargin,
    "q_dyn_counter" ->
      """SELECT user_id, CAST(count(*) AS BIGINT) AS cnt,
        |       round(sum(value), 2) AS amount
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    // write-sharded counters sum back to the same per-user totals —
    // the slot fan-out is invisible to the aggregate
    "q_dyn_counter_sharded" ->
      """SELECT user_id, CAST(count(*) AS BIGINT) AS cnt,
        |       round(sum(value), 2) AS amount
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    // one cut, two tables: both roll back to their parquet fixtures,
    // so the oracle is the plain fixture join
    "q_dyn_asof_multi" ->
      """SELECT c_custkey, CAST(count(*) AS BIGINT) AS n_orders,
        |       round(sum(o_totalprice), 2) AS total_price,
        |       max(c_acctbal) AS acctbal
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "q_dyn_asof_latest" ->
      """SELECT * FROM (
        |  SELECT c_custkey, c_name, c_acctbal FROM customer
        |  WHERE c_custkey % 10 <> 3
        |  UNION ALL
        |  SELECT CAST(-1 AS BIGINT) AS c_custkey,
        |         'time traveler' AS c_name, 0.5 AS c_acctbal)
        |ORDER BY c_custkey""".stripMargin,
    // flags table = (c_acctbal > 0) per customer, so the co-sharded
    // join reduces to the plain predicate on the parquet fixture
    "q_dyn_spj" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE c_acctbal > 0 ORDER BY c_custkey""".stripMargin,
    "q_dyn_spj_pruned" ->
      """SELECT c_custkey, c_name, c_acctbal, (c_acctbal > 0) AS positive
        |FROM customer WHERE c_custkey IN (42, 999, 1077)
        |ORDER BY c_custkey""".stripMargin,
    "q_dyn_point" ->
      """SELECT c_custkey, c_name, c_mktsegment, c_acctbal
        |FROM customer WHERE c_custkey = 42""".stripMargin,
    "q_dyn_range" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |FROM orders WHERE o_custkey <= 100 AND o_totalprice > 50000
        |ORDER BY o_orderkey""".stripMargin,
    "q_dyn_query" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |FROM orders WHERE o_custkey = 37
        |  AND o_orderkey BETWEEN 100 AND 100000
        |ORDER BY o_orderkey""".stripMargin,
    "q_dyn_gsi_query" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE c_mktsegment = 'BUILDING'
        |  AND c_acctbal BETWEEN 1000.0 AND 3000.0
        |ORDER BY c_custkey""".stripMargin,
    "q_dyn_partiql" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE c_mktsegment = 'BUILDING'
        |  AND c_acctbal BETWEEN 1000 AND 5000
        |ORDER BY c_custkey""".stripMargin,
    "q_dyn_partiql_or" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal FROM customer
        |WHERE c_mktsegment = 'BUILDING' OR
        |  (c_acctbal < 500 AND NOT (c_mktsegment = 'MACHINERY'))
        |ORDER BY c_custkey""".stripMargin,
    "q_dyn_partiql_fn" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal FROM customer
        |WHERE (length(c_mktsegment) = 8 OR
        |  (length(c_name) > 17 AND c_acctbal < 0))
        |  AND c_acctbal IS NOT NULL
        |ORDER BY c_custkey""".stripMargin,
    "q_dyn_partiql_page" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_custkey = 37 ORDER BY o_orderkey""".stripMargin,
    "q_dyn_query_topn" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice
        |FROM orders WHERE o_custkey = 37 AND o_orderkey >= 100
        |ORDER BY o_orderkey DESC LIMIT 5""".stripMargin,
    "q_dyn_query_prefix" ->
      """SELECT doc_id,
        |       source || ':' || lpad(CAST(doc_id AS VARCHAR), 7, '0') AS sk,
        |       n_chars
        |FROM documents
        |WHERE lang = 'en' AND source LIKE 'src1%'
        |ORDER BY doc_id""".stripMargin,
    // The pushed table-sample membership, exactly as the store
    // computes it (round-18: previously a Python-only oracle; the
    // driver's DuckDB gate recorded no_oracle): FNV-1a seeded with
    // 1234 over the canonical key encoding 'n:<custkey>', splitmix64
    // finalizer, top 53 bits as u in [0,1), keep iff u < 0.3. The
    // 64-bit wrap-around multiplications run in HUGEINT with 32-bit
    // limb splits (DuckDB integer arithmetic errors on overflow
    // instead of wrapping): h*0x100000001b3 = h*435 + (h mod 2^24)
    // * 2^40 (mod 2^64); the splitmix constants split as
    // lo + hi*2^32. Independently cross-checked against the Python
    // reimplementation in tools/check.py and the ScalaTest law.
    "q_dyn_sample" ->
      """WITH f AS (
        |  SELECT c_custkey, c_name, c_acctbal,
        |    list_reduce(
        |      list_prepend(
        |        CAST(xor(CAST(1234 AS UBIGINT),
        |                 CAST(14695981039346656037 AS UBIGINT)) AS HUGEINT),
        |        list_transform(
        |          range(1, length('n:' || CAST(c_custkey AS VARCHAR)) + 1),
        |          i -> CAST(ascii(substr('n:' || CAST(c_custkey AS VARCHAR),
        |                                 CAST(i AS INT), 1)) AS HUGEINT))),
        |      (acc, b) -> (
        |        (CAST(xor(CAST(acc AS UBIGINT), CAST(b AS UBIGINT)) AS HUGEINT) * 435
        |         + (CAST(xor(CAST(acc AS UBIGINT), CAST(b AS UBIGINT)) AS HUGEINT)
        |            % 16777216) * 1099511627776)
        |        % 18446744073709551616)) AS fnv
        |  FROM customer
        |),
        |z1 AS (SELECT *, CAST(xor(CAST(fnv AS UBIGINT),
        |                          CAST(fnv AS UBIGINT) >> 30) AS HUGEINT) AS z FROM f),
        |m1 AS (SELECT * EXCLUDE (z), (z * 484763065
        |         + ((z * 3210233709) % 4294967296) * 4294967296)
        |         % 18446744073709551616 AS z FROM z1),
        |z2 AS (SELECT * EXCLUDE (z), CAST(xor(CAST(z AS UBIGINT),
        |                          CAST(z AS UBIGINT) >> 27) AS HUGEINT) AS z FROM m1),
        |m2 AS (SELECT * EXCLUDE (z), (z * 321982955
        |         + ((z * 2496678331) % 4294967296) * 4294967296)
        |         % 18446744073709551616 AS z FROM z2),
        |z3 AS (SELECT * EXCLUDE (z), CAST(xor(CAST(z AS UBIGINT),
        |                          CAST(z AS UBIGINT) >> 31) AS UBIGINT) AS z FROM m2)
        |SELECT c_custkey, c_name, c_acctbal FROM z3
        |WHERE CAST(z >> 11 AS DOUBLE) / 9007199254740992.0 < 0.3
        |ORDER BY c_custkey""".stripMargin,
    // int32 columns widen to BIGINT through the store's N type.
    "q_dyn_scan" ->
      """SELECT c_custkey, c_name, CAST(c_nationkey AS BIGINT) AS c_nationkey,
        |       c_acctbal, c_mktsegment
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_dyn_consistent" ->
      """SELECT c_custkey, c_name, CAST(c_nationkey AS BIGINT) AS c_nationkey,
        |       c_acctbal, c_mktsegment
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_dyn_prune_filter" ->
      """SELECT c_custkey, c_acctbal FROM customer
        |WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 0
        |ORDER BY c_custkey""".stripMargin,
    "q_dyn_count" ->
      """SELECT CAST(count(*) AS BIGINT) AS n FROM customer
        |WHERE c_mktsegment = 'BUILDING'""".stripMargin,
    "q_dyn_minmax" ->
      """SELECT min(c_acctbal) AS min_bal, max(c_acctbal) AS max_bal,
        |       min(c_name) AS first_name,
        |       CAST(sum(c_custkey) AS BIGINT) AS sum_key,
        |       CAST(count(c_acctbal) AS BIGINT) AS n_bal,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM customer WHERE c_mktsegment = 'BUILDING'""".stripMargin,
    "q_dyn_spj_fact" ->
      """SELECT o_orderkey, o_custkey, c_name, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE o_totalprice > 150000
        |ORDER BY o_orderkey""".stripMargin,
    "q_dyn_avg_push" ->
      """SELECT o_custkey, avg(o_orderkey) AS avg_okey,
        |       CAST(count(*) AS BIGINT) AS n_orders
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "q_dyn_group_push" ->
      """SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
        |       CAST(sum(o_orderkey) AS BIGINT) AS sum_key,
        |       min(o_totalprice) AS min_price, max(o_totalprice) AS max_price
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "q_dyn_topn" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |ORDER BY c_acctbal DESC, c_custkey LIMIT 10""".stripMargin,
    "q_dyn_typed" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE c_acctbal > 0 ORDER BY c_custkey""".stripMargin,
    "q_dyn_gsi" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal FROM customer
        |WHERE c_mktsegment = 'BUILDING' ORDER BY c_custkey""".stripMargin,
    // LSI read: consistent serve + base-item fetch reduce to the
    // plain filtered projection over the raw events fixture
    "q_dyn_lsi" ->
      """SELECT event_type, event_id,
        |       CAST(ROUND(value * 100, 0) AS BIGINT) AS value_cents,
        |       user_id
        |FROM events
        |WHERE event_type = 'click'
        |  AND CAST(ROUND(value * 100, 0) AS BIGINT) BETWEEN 2000 AND 8000
        |ORDER BY event_id""".stripMargin,
    "q_dyn_gsi_wt" ->
      """SELECT * FROM (
        |  SELECT c_custkey, c_mktsegment, c_acctbal FROM customer
        |  WHERE c_mktsegment = 'BUILDING' AND c_custkey % 10 <> 7
        |  UNION ALL
        |  SELECT CAST(9999999 AS BIGINT) AS c_custkey,
        |         'BUILDING' AS c_mktsegment,
        |         CAST(678.9 AS DOUBLE) AS c_acctbal)
        |ORDER BY c_custkey""".stripMargin,
    "q_dyn_gsi_delta" ->
      """SELECT * FROM (
        |  SELECT c_custkey, c_mktsegment, c_acctbal FROM customer
        |  WHERE c_mktsegment = 'BUILDING' AND c_custkey % 10 <> 7
        |  UNION ALL
        |  SELECT CAST(9999999 AS BIGINT) AS c_custkey,
        |         'BUILDING' AS c_mktsegment,
        |         CAST(678.9 AS DOUBLE) AS c_acctbal)
        |ORDER BY c_custkey""".stripMargin,
    "q_dyn_win_local" ->
      """WITH r AS (SELECT o_custkey, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY o_custkey
        |                     ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders)
        |SELECT o_custkey, o_orderkey, o_totalprice, rk FROM r
        |WHERE rk <= 2 ORDER BY o_custkey, rk""".stripMargin,
    "q_dyn_zone_minmax" ->
      """SELECT min(c_acctbal) AS min_bal, max(c_acctbal) AS max_bal,
        |       min(c_name) AS min_name, max(c_name) AS max_name,
        |       CAST(min(c_custkey) AS BIGINT) AS min_key,
        |       CAST(max(c_custkey) AS BIGINT) AS max_key,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(count(c_acctbal) AS BIGINT) AS n_bal,
        |       CAST(sum(c_custkey) AS BIGINT) AS sum_key
        |FROM customer""".stripMargin,
    "q_dyn_gsi_group" ->
      """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(c_custkey) AS BIGINT) AS sum_key,
        |       avg(c_custkey) AS avg_key,
        |       min(c_acctbal) AS min_bal, max(c_acctbal) AS max_bal
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
}
