package graft.sources.dynamo

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption, StandardOpenOption}

import scala.collection.mutable

import graft.sources.dynamo.ItemJson.Item

/** DynamoDB **Global Tables** analogue: multi-active replication
  * between independent store roots ("regions") with last-writer-wins
  * conflict resolution. [REF: public DynamoDB Global Tables semantics
  * — replicas exchange item IMAGES (not op logs), every item carries
  * an engine-stamped `aws:rep:updatetime`, conflicts resolve
  * last-writer-wins on that stamp, and ADD math is NOT merged across
  * regions (the losing region's counter delta is simply overwritten).]
  *
  * Our mapping of those semantics:
  *
  *  - **Stamp = (`_rep_ver`, `_rep_src`)** item attributes (version +
  *    origin region), totally ordered by (ver, region) — version is
  *    the origin's write clock (epoch millis in production; any
  *    monotonic long in tests), region breaks exact ties
  *    deterministically. Writers to a replicated table stamp at write
  *    time via [[writeStamped]] (the engine-side stamping DynamoDB
  *    does internally); because stamps are ordinary attributes they
  *    survive compaction, backups, and time travel for free.
  *  - **Deletes leave tombstones** (`repltomb-*.jsonl` sidecars, one
  *    stamp per deleted key) so a replicated delete beats a stale put
  *    that arrives later — without them the put would resurrect the
  *    item. A FRESHER put (higher stamp) deliberately wins over an
  *    older tombstone: that is DynamoDB's actual recreate-after-delete
  *    behavior, not an anomaly. Tombstones are append-only sidecar
  *    files, invisible to every scan/journal listing prefix (none of
  *    which match `repltomb-`), folded to a per-key max at read time;
  *    volume is bounded by deletes, and a retention sweep may drop
  *    stamps every replica has acknowledged (not needed at test
  *    scale — DynamoDB GCs its own tombstones the same way).
  *  - **Sync = per-shard anti-entropy** ([[syncShard]]): replicas
  *    share table meta (same hash placement, same shard count), so
  *    shard i at the source aligns with shard i at the destination —
  *    each task streams one source shard against one destination
  *    shard's resolved stamps, O(shard) memory, zero cross-task
  *    coordination: the same disjointness that makes segmented scans
  *    and compaction embarrassingly parallel makes replication so
  *    ([[DynamoMaintenance.replicate]] runs one Spark task per
  *    shard). State-based sync is a join in the LWW semilattice,
  *    hence idempotent, commutative, and convergent by construction —
  *    ReplicationSpec pins all three plus the tombstone laws.
  *  - **[[syncIncremental]]** is the steady-state CDC-shaped path: it
  *    ships only keys the source journal touched past a per-region
  *    watermark (`replmark-*` sidecar at the destination). If
  *    compaction folded journal history past the watermark the delta
  *    is unrecoverable from the journal — it falls back LOUDLY to a
  *    full anti-entropy pass (the result says which path ran) rather
  *    than silently missing writes.
  *
  * Not replicated: `AddTo`/`RemoveAttrs` write-ops ([[writeStamped]]
  * rejects them). A cross-region counter merge is a CRDT the real
  * service does not implement either; counters belong to a single
  * writer region under Global Tables, and we keep that contract
  * explicit instead of guessing a merge.
  */
object Replication {

  /** Origin write-clock attribute (the `aws:rep:updatetime` analogue). */
  val VerAttr = "_rep_ver"

  /** Origin region attribute — total tie-break at equal versions. */
  val SrcAttr = "_rep_src"

  /** A replication version: ordered by version, then region.
    * Contract (same as the real service's updatetime): one (ver,
    * region) never stamps two DIFFERENT writes of the same key —
    * a region's write clock is monotonic per key.
    */
  final case class Stamp(ver: Long, region: String) {
    def beats(o: Stamp): Boolean =
      ver > o.ver || (ver == o.ver && region > o.region)
  }
  object Stamp {
    /** Unstamped (pre-replication) data sorts below every real stamp. */
    val zero: Stamp = Stamp(0L, "")
  }

  def stampOf(item: Item): Stamp = {
    val ver = item.get(VerAttr) match {
      case Some(AttrVal.N(n)) => n.toLong
      case _ => 0L
    }
    val src = item.get(SrcAttr) match {
      case Some(AttrVal.S(s)) => s
      case _ => ""
    }
    Stamp(ver, src)
  }

  def stamped(item: Item, st: Stamp): Item =
    item + (VerAttr -> AttrVal.N(BigDecimal(st.ver))) +
      (SrcAttr -> AttrVal.S(st.region))

  /** Replicated-write ops — instance-free mirror of the store's WAL op
    * surface restricted to what LWW can resolve (see class doc for why
    * ADD/REMOVE are out).
    */
  sealed trait ROp
  final case class RPut(item: Item) extends ROp
  final case class RUpdate(item: Item) extends ROp
  /** `key` = key attributes only, like the store's Delete op. */
  final case class RDelete(key: Item) extends ROp

  /** Stamping write — every op carries (ver, region) so replicas can
    * resolve it; deletes also record a tombstone. This is the write
    * API for replicated tables (plain writes still work — they just
    * sort below every stamped write, the right semantics for
    * pre-replication seed data). Distributed writers call this per
    * partition with a partition-unique `writerId`; puts at scale can
    * equivalently ride the DSv2 writer with `_rep_ver`/`_rep_src` as
    * literal columns (stamps are ordinary attributes) — only DELETES
    * need this entry point, for the tombstone.
    */
  def writeStamped(store: LocalKVStore, table: String, region: String,
      ver: Long, seq: Long, writerId: String, ops: Seq[ROp]): Unit = {
    val meta = store.describe(table)
    val st = Stamp(ver, region)
    val tombs = mutable.ArrayBuffer.empty[(String, Stamp)]
    val walOps: Seq[store.Op] = ops.map {
      case RPut(it) => store.Put(stamped(it, st))
      case RUpdate(it) => store.Update(stamped(it, st))
      case RDelete(key) =>
        tombs += ((store.keyOf(meta, key), st))
        store.Delete(key)
    }
    // Under the table lock: a sync apply's check-then-publish section
    // must never interleave with a stamped write, or a same-
    // millisecond pubSeq tie (broken by writer NAME) could replay the
    // fresher-stamped write below the stale image — losing it at its
    // own origin, which no later pass can repair.
    store.underTxnLock(table) {
      // Publish ABOVE the journal head, like [[applyLww]] does: an
      // apply that just published at maxWalSeq+1 (its own head bump)
      // can sit above `seq` — a same-millisecond flurry in production,
      // stacked +1 bumps under a future-clock contract — and a
      // stamped write replaying BELOW an apply's Delete op loses the
      // fresher write at its own origin. Both sides hold the table
      // lock, so flooring here makes publish order match lock order.
      val pubFloor = maxWalSeq(store, table) + 1
      store.appendWal(table, math.max(seq, pubFloor), writerId, walOps)
      if (tombs.nonEmpty) {
        // Origin = the PUBLISHED pubSeq of this write's journal files
        // (the writer floors at the wall clock, so it can exceed
        // `seq`) — the coordinate peer watermarks actually move
        // through, read back exactly from our own just-published
        // names. Recording a too-low origin could let the acked GC
        // drop a tombstone a lagging peer never replayed.
        val origin = store.walFileNames(table)
          .filter(_.contains(s"-$writerId-")).map(walSeqOf)
          .maxOption.getOrElse(math.max(seq, System.currentTimeMillis()))
        appendTombstones(store, table, seq, writerId, tombs.toSeq,
          tombs.iterator.map { case (k, _) => k -> origin }.toMap)
      }
    }
  }

  // ---- tombstone sidecars -------------------------------------------------

  /** One line per deleted key: `key \t ver \t region [\t originSeq]`.
    * Files publish with tmp+ATOMIC_MOVE like every other sidecar;
    * names embed (seq, writerId) so parallel tasks never collide.
    * `originSeq` is the pubSeq of THIS store's journal entry that
    * applied the delete — the coordinate peers' replication
    * watermarks move through, hence the acknowledgment-based GC
    * cutoff ([[gcTombstonesAcked]]). Three-field lines (older files,
    * and fresh writes where the file-name seq IS the origin) fall
    * back to the name's seq.
    */
  private def appendTombstones(store: LocalKVStore, table: String,
      seq: Long, writerId: String, tombs: Seq[(String, Stamp)],
      origins: Map[String, Long] = Map.empty): Unit = {
    val dir = Paths.get(store.rootDir, table)
    val tmp = dir.resolve(f".repltomb-$seq%020d-$writerId.tmp")
    val out = tombs.map { case (k, s) =>
      origins.get(k) match {
        case Some(o) => s"$k\t${s.ver}\t${s.region}\t$o"
        case None => s"$k\t${s.ver}\t${s.region}"
      }
    }.mkString("", "\n", "\n")
    Files.write(tmp, out.getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    Files.move(tmp, dir.resolve(f"repltomb-$seq%020d-$writerId.jsonl"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  private def tombFiles(store: LocalKVStore, table: String): Seq[Path] = {
    val dir = Paths.get(store.rootDir, table)
    if (!Files.isDirectory(dir)) return Nil
    val s = Files.list(dir)
    try {
      val b = Vector.newBuilder[Path]
      s.forEach(p =>
        if (p.getFileName.toString.startsWith("repltomb-")) b += p)
      b.result()
    } finally s.close()
  }

  /** Per-key (max stamp, origin pubSeq of that stamp's entry). */
  private def foldTombFiles(files: Seq[Path]): Map[String, (Stamp, Long)] = {
    val acc = mutable.HashMap.empty[String, (Stamp, Long)]
    files.foreach { p =>
      val nameSeq = p.getFileName.toString.stripPrefix("repltomb-")
        .take(20).toLong
      Files.readAllLines(p, StandardCharsets.UTF_8).forEach { line =>
        if (line.nonEmpty) {
          val f = line.split('\t')
          val k = f(0)
          val st = Stamp(f(1).toLong, f(2))
          val origin = if (f.length > 3) f(3).toLong else nameSeq
          if (acc.get(k).forall { case (cur, _) => st.beats(cur) })
            acc(k) = (st, origin)
        }
      }
    }
    acc.toMap
  }

  /** All tombstones of a table, folded to the max stamp per key. */
  def tombstones(store: LocalKVStore, table: String): Map[String, Stamp] =
    foldTombFiles(tombFiles(store, table)).map { case (k, (s, _)) => k -> s }

  /** Shared GC core: consolidate sidecars, drop entries `predicate`
    * approves, preserve each survivor's origin seq. Runs under the
    * table lock so a concurrent apply's tombstone append is never
    * deleted: only the files READ are removed, and the consolidated
    * survivor file publishes BEFORE the old files go — a racing
    * reader sees a superset, and max-folding makes duplicates
    * harmless. Returns how many keys' tombstones were dropped.
    */
  private def gcWith(store: LocalKVStore, table: String, seq: Long)(
      drop: ((String, (Stamp, Long))) => Boolean): Int =
    store.underTxnLock(table) {
      val files = tombFiles(store, table)
      val acc = foldTombFiles(files)
      val keep = acc.filterNot(drop)
      if (keep.nonEmpty) {
        val dir = Paths.get(store.rootDir, table)
        var pub = seq
        while (Files.exists(dir.resolve(f"repltomb-$pub%020d-gc.jsonl")))
          pub += 1
        appendTombstones(store, table, pub, "gc",
          keep.map { case (k, (s, _)) => (k, s) }.toSeq,
          keep.map { case (k, (_, o)) => k -> o })
      }
      files.foreach(Files.deleteIfExists(_))
      acc.size - keep.size
    }

  /** Retention sweep (DynamoDB GCs its replication tombstones after a
    * retention window the same way): DROP stamps with
    * `ver < beforeVer`. SAFETY PRECONDITION — the caller must know
    * every replica has synced past `beforeVer`: a tombstone dropped
    * while some replica still holds the pre-delete image lets that
    * image resurrect on the next sync (the spec demonstrates the
    * hazard as well as the safe path). [[gcTombstonesAcked]] COMPUTES
    * the precondition from peer watermarks instead of trusting the
    * caller.
    */
  def gcTombstones(store: LocalKVStore, table: String, beforeVer: Long,
      seq: Long): Int =
    gcWith(store, table, seq) { case (_, (s, _)) => s.ver < beforeVer }

  /** The acknowledgment floor for [[gcTombstonesAcked]]: the least
    * source-journal position of `myRegion` that EVERY peer has
    * replicated through (their `replmark-<myRegion>` watermarks). A
    * peer that has never run an incremental pass contributes 0 — the
    * safe default under which nothing is ever GC'd.
    */
  def ackedGcFloor(peers: Seq[LocalKVStore], table: String,
      myRegion: String): Long =
    if (peers.isEmpty) 0L
    else peers.map(watermark(_, table, myRegion)).min

  /** Acknowledgment-based tombstone GC — the COMPUTED form of the
    * [[gcTombstones]] precondition: drop exactly the tombstones whose
    * applying journal entry (origin pubSeq) every peer's replication
    * watermark has passed. A peer that synced past the entry has
    * applied the delete (or something fresher), so no peer still
    * holds the pre-delete image — resurrection is structurally
    * impossible, no caller judgment involved.
    */
  def gcTombstonesAcked(store: LocalKVStore, table: String, seq: Long,
      peers: Seq[LocalKVStore], myRegion: String): Int = {
    val floor = ackedGcFloor(peers, table, myRegion)
    gcWith(store, table, seq) { case (_, (_, origin)) => origin <= floor }
  }

  /** Replication lag diagnostic: how far `dst`'s view of `srcRegion`
    * trails `src`'s journal head, in the journal's clock coordinates
    * (milliseconds under the production epoch-millis contract). 0 when
    * fully caught up or the source journal is empty/folded behind the
    * watermark.
    */
  def replicationLag(src: LocalKVStore, srcRegion: String,
      dst: LocalKVStore, table: String): Long = {
    val head = math.max(maxWalSeq(src, table), src.compactionWatermark(table))
    math.max(0L, head - watermark(dst, table, srcRegion))
  }

  // ---- anti-entropy sync --------------------------------------------------

  /** What one sync pass did. `full` = whole-table anti-entropy ran
    * (either asked for, or the incremental path fell back because
    * compaction folded history past the watermark).
    */
  final case class SyncResult(puts: Int, deletes: Int, full: Boolean) {
    def applied: Int = puts + deletes
    def +(o: SyncResult): SyncResult =
      SyncResult(puts + o.puts, deletes + o.deletes, full || o.full)
  }

  /** Retry a discovery scan that lost a WAL file to a racing
    * compaction (listed, then folded+deleted before the read opened
    * it). Torn-but-readable views need no retry — compaction is
    * semantics-preserving, so any mixture of pre/post-fold state
    * under-ships at worst and the next pass repairs (the locked apply
    * re-checks every candidate against a compaction-fenced read
    * anyway). Five losses in a row means an operator is compacting in
    * a tight loop — fail loudly, the [[LocalKVStore.transactGet]]
    * contract.
    */
  private def retryingScan[A](table: String)(body: => A): A = {
    var attempt = 0
    while (true) {
      try return body
      catch {
        case _: java.nio.file.NoSuchFileException =>
          attempt += 1
          if (attempt >= 5) throw new IllegalStateException(
            s"replication scan on '$table' raced a moving compaction " +
              s"$attempt times — retry when maintenance settles")
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def requireAligned(a: TableMeta, b: TableMeta, table: String): Unit =
    require(a.hashKey == b.hashKey && a.rangeKey == b.rangeKey &&
      a.shards == b.shards,
      s"replicas of '$table' must share key schema and shard count " +
        s"(src ${a.hashKey}/${a.rangeKey}/${a.shards} vs " +
        s"dst ${b.hashKey}/${b.rangeKey}/${b.shards}): shard-aligned " +
        "anti-entropy needs identical placement")

  /** LWW-resolve one source shard against the matching destination
    * shard. Streams the source; holds one destination shard's stamps
    * (not items) plus the divergence set in memory — the same
    * O(shard) bound compaction runs under. Origin stamps are
    * preserved verbatim on apply (re-stamping would break
    * convergence). Tombstone maps are passed in (they are table-
    * global and cheap); this shard applies only its own keys.
    *
    * Two-phase vs racing writers: candidate discovery runs UNLOCKED
    * (shard tasks stay parallel); the apply is a check-then-publish
    * section under the destination's table lock ([[applyLww]]) that
    * re-resolves just the candidate keys — a stamped write that
    * landed since discovery makes its candidate drop, a write after
    * the apply replays above it (the apply pubSeq never exceeds the
    * journal clock's future). Divergence created DURING the pass is
    * simply missed and ships next pass — eventual, never wrong-way.
    */
  def syncShard(src: LocalKVStore, dst: LocalKVStore, table: String,
      shard: Int, seq: Long, writerId: String,
      srcTombs: Map[String, Stamp], dstTombs: Map[String, Stamp]): SyncResult = {
    val srcMeta = src.describe(table)
    val dstMeta = dst.describe(table)
    requireAligned(srcMeta, dstMeta, table)
    val shards = srcMeta.shards

    val dstStamp = mutable.HashMap.empty[String, Stamp]
    retryingScan(table) {
      dstStamp.clear()
      dst.scanSegment(table, shard, shards).foreach { case (item, _) =>
        dstStamp(dst.keyOf(dstMeta, item)) = stampOf(item)
      }
    }

    def bestDst(k: String): Option[Stamp] =
      (dstStamp.get(k), dstTombs.get(k)) match {
        case (Some(x), Some(y)) => Some(if (x.beats(y)) x else y)
        case (x, y) => x.orElse(y)
      }

    // The source's authoritative state per key is max(live item stamp,
    // tombstone stamp): a re-created item (put AFTER delete) must ship
    // as a put even though a tombstone exists, and a live item beaten
    // by its own tombstone (stale put that lost the local race) must
    // ship as the delete. Tracking live stamps for tombstoned keys
    // keeps the two loops from emitting both ops for one key.
    val srcLive = mutable.HashMap.empty[String, Stamp]
    val putCands = mutable.ArrayBuffer.empty[Item]
    retryingScan(table) {
      srcLive.clear(); putCands.clear()
      src.scanSegment(table, shard, shards).foreach { case (item, _) =>
        val k = src.keyOf(srcMeta, item)
        val s = stampOf(item)
        if (srcTombs.contains(k)) srcLive(k) = s
        val authoritative = srcTombs.get(k).forall(s.beats)
        val wins = bestDst(k) match {
          case None => true // absent and never deleted: presence wins
          case Some(d) => s.beats(d)
        }
        if (authoritative && wins)
          putCands += item // origin stamp rides in the item
      }
    }

    val delCands = mutable.ArrayBuffer.empty[(String, Stamp)]
    srcTombs.foreach { case (k, s) =>
      if (keyShard(srcMeta, k, src) == shard &&
          srcLive.get(k).forall(live => !live.beats(s)))
        delCands += ((k, s))
    }

    applyLww(dst, dstMeta, table, seq, writerId, putCands.toSeq,
      delCands.toSeq).copy(full = true)
  }

  /** Check-then-publish under the destination's table lock: re-resolve
    * exactly the candidate keys against the CURRENT destination state
    * (one owning-shard snapshot read + a tombstone fold), drop
    * candidates a racing stamped write has overtaken, and publish the
    * survivors at a pubSeq above everything already in the journal —
    * max(caller seq, wall clock, journal max + 1, compaction
    * watermark + 1) — so the applied image replays LAST for its keys.
    * A stamped write AFTER this section gets a later pubSeq (writes
    * take the same lock), so local replay order and stamp order agree
    * at all times for replicated tables.
    */
  private def applyLww(dst: LocalKVStore, dstMeta: TableMeta, table: String,
      seq: Long, writerId: String, putCands: Seq[Item],
      delCands: Seq[(String, Stamp)]): SyncResult = {
    if (putCands.isEmpty && delCands.isEmpty) return SyncResult(0, 0, full = false)
    dst.underTxnLock(table) {
      val putKeyed = putCands.map(it => dst.keyOf(dstMeta, it) -> it)
      val allKeys: Seq[(String, Item)] =
        (putKeyed.map { case (k, it) => k -> keyAttrsOf(dstMeta, it) } ++
          delCands.map { case (k, _) => k -> keyItemOf(dstMeta, k) })
          .distinctBy(_._1)
      val cur: Map[String, Option[Item]] =
        allKeys.map(_._1).zip(dst.transactGet(table, allKeys.map(_._2))).toMap
      val curTombs = tombstones(dst, table)
      def curStamp(k: String): Option[Stamp] =
        (cur.getOrElse(k, None).map(stampOf), curTombs.get(k)) match {
          case (Some(x), Some(y)) => Some(if (x.beats(y)) x else y)
          case (x, y) => x.orElse(y)
        }
      val puts = putKeyed.collect {
        case (k, it) if curStamp(k).forall(stampOf(it).beats) => dst.Put(it)
      }
      // Record/refresh the tombstone whenever the destination lacks an
      // equal-or-better one — even for keys it never stored, so a
      // three-region relay still carries the delete onward.
      val newTombs = delCands.filter { case (k, s) =>
        curTombs.get(k).forall(s.beats)
      }
      val newTombKeys = newTombs.map(_._1).toSet
      // Delete ops publish for beaten LIVE images, and ALSO for absent
      // keys whose tombstone is newly recorded here: without a journal
      // entry the tombstone-only knowledge would be invisible to
      // incremental discovery (which walks the JOURNAL) — a mesh relay
      // through a region that never held the item would silently stop
      // there under incremental-only syncs, and the tombstone's origin
      // pubSeq would sit above anything peers can ever observe, so the
      // acked GC could never drain it. A Delete of an absent key
      // replays to absent-normal-form — free — while giving both the
      // relay and the ack watermark a real journal coordinate. Never
      // published when a FRESHER live image exists (seq-ordered replay
      // would delete it): those tombstones are dominated and inert.
      val deletes = delCands.collect {
        case (k, s) if (cur.getOrElse(k, None) match {
          case Some(it) => s.beats(stampOf(it))
          case None => newTombKeys(k)
        }) => dst.Delete(keyItemOf(dstMeta, k))
      }
      val applySeq = Seq(seq, System.currentTimeMillis(),
        maxWalSeq(dst, table) + 1, dst.compactionWatermark(table) + 1).max
      val ops = puts ++ deletes
      if (ops.nonEmpty) dst.appendWal(table, applySeq, writerId, ops)
      if (newTombs.nonEmpty)
        appendTombstones(dst, table, applySeq, writerId, newTombs)
      SyncResult(puts.size, deletes.size, full = false)
    }
  }

  /** The key attributes of a full item. */
  private def keyAttrsOf(meta: TableMeta, item: Item): Item =
    (Seq(meta.hashKey) ++ meta.rangeKey).map(n => n -> item(n)).toMap

  private def keyShard(meta: TableMeta, key: String, store: LocalKVStore): Int =
    store.shardOf(meta, keyItemOf(meta, key))

  /** Rebuild the key attributes an encoded key string denotes — the
    * inverse of [[LocalKVStore.keyOf]] (`s:`/`n:`/`b:`-tagged values
    * joined by `|`). Composite split takes the FIRST `|`: a `|` inside
    * a string hash key would mis-split, the same way it would collide
    * in `keyOf` itself — the store's existing key-string contract.
    */
  private[dynamo] def keyItemOf(meta: TableMeta, key: String): Item = {
    val parts = meta.rangeKey match {
      case Some(_) =>
        val i = key.indexOf('|')
        require(i > 0, s"composite key expected: $key")
        Seq(key.substring(0, i), key.substring(i + 1))
      case None => Seq(key)
    }
    val names = Seq(meta.hashKey) ++ meta.rangeKey
    names.zip(parts).map { case (n, enc) =>
      val v = enc.substring(2)
      enc.charAt(0) match {
        case 's' => n -> AttrVal.S(v)
        case 'n' => n -> AttrVal.N(BigDecimal(v))
        case 'b' => n -> AttrVal.B(java.util.Base64.getDecoder.decode(v))
        case c => throw new IllegalArgumentException(s"key tag '$c' in $key")
      }
    }.toMap
  }

  /** Whole-table anti-entropy (driver-side shard loop — tests and
    * small tables; [[DynamoMaintenance.replicate]] is the one-task-
    * per-shard form).
    */
  def sync(src: LocalKVStore, dst: LocalKVStore, table: String,
      seq: Long, writerId: String): SyncResult = {
    val meta = src.describe(table)
    requireAligned(meta, dst.describe(table), table)
    val srcT = tombstones(src, table)
    val dstT = tombstones(dst, table)
    (0 until meta.shards).map { sh =>
      syncShard(src, dst, table, sh, seq, s"$writerId-s$sh", srcT, dstT)
    }.foldLeft(SyncResult(0, 0, full = true))(_ + _)
  }

  // ---- incremental (journal-shipping) sync --------------------------------

  private def markPath(dst: LocalKVStore, table: String, srcRegion: String): Path =
    Paths.get(dst.rootDir, table, s"replmark-$srcRegion.txt")

  /** Everything one incremental pass must remember about where it
    * stopped. Beyond the pubSeq watermark itself:
    *  - `seenAtWm`: journal file NAMES at pubSeq == wm this pass
    *    replayed. THIS store's monotone stamp no longer emits
    *    same-pubSeq ties, but pubSeq is not unique across FOREIGN
    *    writers (a legacy build, a lagging clock on another host) —
    *    one can land a file at exactly wm AFTER the pass's listing.
    *    A `> wm` filter would skip it forever; the name-set makes
    *    the boundary exclusive per FILE, not per seq.
    *  - `cwAtPass`: the source compaction watermark this pass
    *    verified to be <= wm. A later fold that lands EXACTLY at wm
    *    (folding such a colliding boundary file) advances the
    *    compaction watermark to wm without ever exceeding it — the
    *    `folded > wm` fallback check alone cannot see it.
    *  - `baseFp`: [[LocalKVStore.baseStateFingerprint]] at pass time.
    *    A fold at wm when the compaction watermark ALREADY equaled wm
    *    moves neither number — but every fold rewrites base shards,
    *    so the fingerprint is the last-resort tell.
    * cwAtPass == -1 marks a legacy (bare-number) file: the guards
    * treat it as "unprovable" and take one loud full sync to upgrade.
    */
  private final case class ReplMark(wm: Long, cwAtPass: Long,
      baseFp: String, seenAtWm: Set[String])

  private def readMark(dst: LocalKVStore, table: String,
      srcRegion: String): ReplMark = {
    val p = markPath(dst, table, srcRegion)
    if (!Files.exists(p)) return ReplMark(0L, 0L, "", Set.empty)
    val lines = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      .split('\n').toSeq.map(_.trim).filter(_.nonEmpty)
    lines.headOption match {
      case Some(h) if h.startsWith("v2 ") =>
        val parts = h.split(' ')
        ReplMark(parts(1).toLong, parts(2).toLong,
          if (parts.length > 3) parts(3) else "",
          lines.tail.toSet)
      case Some(h) => ReplMark(h.toLong, -1L, "", Set.empty) // legacy
      case None => ReplMark(0L, 0L, "", Set.empty)
    }
  }

  /** Highest source pubSeq this destination has already replicated
    * from `srcRegion` (0 before the first pass).
    */
  def watermark(dst: LocalKVStore, table: String, srcRegion: String): Long =
    readMark(dst, table, srcRegion).wm

  private def writeMark(dst: LocalKVStore, table: String,
      srcRegion: String, mark: ReplMark): Unit = {
    val p = markPath(dst, table, srcRegion)
    val tmp = p.resolveSibling("." + p.getFileName.toString + ".tmp")
    val body = (s"v2 ${mark.wm} ${mark.cwAtPass} ${mark.baseFp}" +:
      mark.seenAtWm.toSeq.sorted).mkString("\n")
    Files.write(tmp, body.getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  private def walSeqOf(name: String): Long =
    name.stripPrefix("wal-").take(20).toLong

  /** Ship only keys the source journal touched past the stored
    * watermark (the CDC-shaped steady-state path: cost is
    * O(new writes), not O(table)). Falls back LOUDLY to [[sync]] when
    * source compaction folded journal history past the watermark —
    * those deltas are unrecoverable from the journal, and missing
    * them silently would diverge the replicas. The advanced watermark
    * is the max source pubSeq OBSERVED IN THE LISTING this pass
    * replayed — never "now" — so a write racing the listing lands
    * after the new watermark and ships next pass.
    */
  def syncIncremental(src: LocalKVStore, srcRegion: String,
      dst: LocalKVStore, table: String, seq: Long,
      writerId: String,
      /** Backlog bound for the driver-side per-key path: more touched
        * keys than this delegates to the shard-parallel full
        * anti-entropy instead (same result, O(shard) per task instead
        * of O(backlog) on the driver) — the first-ever pass against a
        * long-lived journal is exactly that case. The steady-state
        * delta stays far below any sane bound.
        */
      maxIncrementalKeys: Int = 100000): SyncResult = {
    val mark = readMark(dst, table, srcRegion)
    val wm = mark.wm
    val folded = src.compactionWatermark(table)
    val fpPre = src.baseStateFingerprint(table)
    // Cross-table pending fence: an unmarked pending file joins the
    // journal at its ALREADY-ASSIGNED pubSeq once its commit marker
    // lands — advancing the watermark past that pubSeq now would skip
    // the committed transaction on every later pass. Cap every
    // advance strictly below the floor (never regressing an existing
    // wm; a pending landing AT wm rides the seen-name set instead).
    // Files above the cap re-ship next pass — idempotent under LWW.
    val pendFloor = src.pendingTxnFloor(table)
    def capWm(x: Long): Long = math.max(wm, math.min(x, pendFloor - 1L))
    // Boundary-fold risk: a fold landing EXACTLY at wm (compaction
    // watermark advanced to wm, or the base rewrote while it already
    // sat at wm, or the mark is legacy/unprovable) may have folded a
    // same-millisecond boundary file this destination never replayed
    // — invisible to the `folded > wm` check because the watermark
    // never exceeds wm. One loud full sync re-derives from the base.
    val boundaryFoldRisk = folded == wm && wm > 0 &&
      (mark.cwAtPass < 0 || folded > mark.cwAtPass || fpPre != mark.baseFp)
    if (folded > wm || boundaryFoldRisk) {
      // Pre-sync head capture: [[sync]] ships everything published
      // BEFORE its shard scans, but a write racing the scan of an
      // already-visited shard is NOT shipped while still raising the
      // post-sync maxWalSeq — advancing the watermark to a POST-sync
      // head would therefore skip that racing write on every later
      // incremental pass (the only path replicateBatch runs),
      // silently and forever. Advance only to the head observed here.
      val preNames = src.walFileNames(table)
      val preMax = capWm((folded +: preNames.map(walSeqOf)).max)
      val r = sync(src, dst, table, seq, writerId)
      writeMark(dst, table, srcRegion, ReplMark(preMax,
        math.min(folded, preMax), fpPre,
        preNames.filter(walSeqOf(_) == preMax).toSet))
      return r
    }
    val srcMeta = src.describe(table)
    val dstMeta = dst.describe(table)
    requireAligned(srcMeta, dstMeta, table)

    var newFiles: Seq[String] = Nil
    val touched = mutable.LinkedHashSet.empty[String]
    retryingScan(table) {
      touched.clear()
      // Per-FILE exclusive boundary: pubSeq is not unique across
      // writers/shards, so a file published at exactly wm after the
      // previous pass's listing must still ship — the seen-name set
      // (not `> wm` alone) decides.
      newFiles = src.walFileNames(table).filter(f =>
        walSeqOf(f) > wm || (walSeqOf(f) == wm && !mark.seenAtWm(f)))
      newFiles.foreach { f =>
        src.readWalFile(table, f).foreach { case (_, item, _) =>
          touched += src.keyOf(srcMeta, item)
        }
      }
    }
    // Backlog bound: a first pass against a long-lived journal can
    // touch table-scale key counts — that belongs to the shard-
    // parallel full path, not a driver-side per-key resolve. The
    // watermark advances only to the head of the PRE-sync listing
    // (same rationale as the fallback branch above).
    if (touched.size > maxIncrementalKeys) {
      val r = sync(src, dst, table, seq, writerId)
      val newWm = capWm((Seq(wm) ++ newFiles.map(walSeqOf)).max)
      writeMark(dst, table, srcRegion, ReplMark(newWm,
        math.min(folded, newWm), fpPre,
        seenAtBoundary(newWm, mark, newFiles)))
      return r
    }
    // Post-discovery fence: a compaction folding (wm, …] files DURING
    // the listing loop would make `touched` silently incomplete while
    // the advanced watermark below hides the gap forever — the one
    // ordering the entry check can't see. Folds after this line are
    // safe (their files were already read).
    val cwFence = src.compactionWatermark(table)
    if (cwFence > wm) {
      val r = sync(src, dst, table, seq, writerId)
      val newWm = capWm((Seq(wm, cwFence) ++ newFiles.map(walSeqOf)).max)
      writeMark(dst, table, srcRegion, ReplMark(newWm,
        math.min(cwFence, newWm), fpPre,
        seenAtBoundary(newWm, mark, newFiles)))
      return r
    }
    if (touched.isEmpty) {
      // Nothing to ship — still refresh the guard fields so a legacy
      // mark upgrades and the cw/fingerprint bindings track the state
      // this pass verified (folds strictly BELOW wm are folds of
      // already-shipped history and must not trip the boundary check
      // forever after).
      if (mark.cwAtPass != cwFence || mark.baseFp != fpPre)
        writeMark(dst, table, srcRegion,
          mark.copy(cwAtPass = cwFence, baseFp = fpPre))
      return SyncResult(0, 0, full = false)
    }
    val srcT = tombstones(src, table)
    val dstT = tombstones(dst, table)

    val keys = touched.toSeq
    val keyItems = keys.map(keyItemOf(srcMeta, _))
    val srcNow = src.transactGet(table, keyItems)
    val dstNow = dst.transactGet(table, keyItems)

    val putCands = mutable.ArrayBuffer.empty[Item]
    val delCands = mutable.ArrayBuffer.empty[(String, Stamp)]
    keys.indices.foreach { i =>
      val k = keys(i)
      val dstStamp = (dstNow(i).map(stampOf), dstT.get(k)) match {
        case (Some(x), Some(y)) => Some(if (x.beats(y)) x else y)
        case (x, y) => x.orElse(y)
      }
      // Same authoritative-state rule as [[syncShard]]: a live item
      // beaten by its own tombstone ships as the delete, not the put.
      srcNow(i).map(stampOf) match {
        case Some(s) if srcT.get(k).forall(s.beats) =>
          if (dstStamp.forall(s.beats)) putCands += srcNow(i).get
        case _ =>
          // Key absent (or tombstone-beaten) at source — only a
          // tombstone authorizes a destination delete.
          srcT.get(k).foreach { s =>
            if (dstNow(i).map(stampOf).exists(s.beats) ||
                dstT.get(k).forall(s.beats)) delCands += ((k, s))
          }
      }
    }
    val r = applyLww(dst, dstMeta, table, seq, writerId, putCands.toSeq,
      delCands.toSeq)
    val newWm = capWm((Seq(wm) ++ newFiles.map(walSeqOf)).max)
    writeMark(dst, table, srcRegion, ReplMark(newWm,
      math.min(cwFence, newWm), fpPre,
      seenAtBoundary(newWm, mark, newFiles)))
    r
  }

  /** File names replayed at the new boundary seq: the fresh listing's
    * names at `newWm`, plus the previous pass's seen set when the
    * boundary did not move (those files were filtered OUT of this
    * listing and must stay remembered).
    */
  private def seenAtBoundary(newWm: Long, prev: ReplMark,
      newFiles: Seq[String]): Set[String] = {
    val fresh = newFiles.filter(walSeqOf(_) == newWm).toSet
    if (newWm == prev.wm) prev.seenAtWm ++ fresh else fresh
  }

  private def maxWalSeq(store: LocalKVStore, table: String): Long = {
    val names = store.walFileNames(table)
    if (names.isEmpty) 0L else names.map(walSeqOf).max
  }
}
