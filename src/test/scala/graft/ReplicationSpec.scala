package graft

import java.nio.file.Files

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.dynamo.{AttrVal, LocalKVStore, Replication, TableMeta}
import graft.sources.dynamo.ItemJson.Item
import graft.sources.dynamo.Replication.{RDelete, RPut, Stamp, SyncResult}

/** Laws for the Global Tables analogue ([[Replication]]): state-based
  * LWW sync is a semilattice join, so replicas must CONVERGE
  * (bidirectional sync → identical states), syncs must be IDEMPOTENT
  * (second pass applies nothing) and ORDER-INDEPENDENT, deletes must
  * beat stale puts across regions (tombstones) while fresher puts
  * re-create deleted items (DynamoDB's actual recreate semantics),
  * stamps and tombstones must survive compaction, and the incremental
  * journal-shipping path must equal full anti-entropy — falling back
  * loudly when compaction folded journal history past its watermark.
  */
class ReplicationSpec extends AnyFunSuite {

  private val meta = TableMeta("id", None, shards = 4, throughput = 1000000L)

  private def freshPair(): (LocalKVStore, LocalKVStore) = {
    def mk(): LocalKVStore = {
      val st = new LocalKVStore(
        Files.createTempDirectory("repl").toString)
      st.createTable("t", meta)
      st
    }
    (mk(), mk())
  }

  private def item(k: String, v: String): Item =
    Map("id" -> AttrVal.S(k), "v" -> AttrVal.S(v))

  private def key(k: String): Item = Map("id" -> AttrVal.S(k))

  /** Resolved user-visible state: key -> v attr (stamps checked
    * separately where a law needs them).
    */
  private def state(st: LocalKVStore): Map[String, String] =
    st.scanSegment("t", 0, 1).map { case (it, _) =>
      val k = it("id").asInstanceOf[AttrVal.S].v
      val v = it.get("v").collect { case AttrVal.S(s) => s }.getOrElse("")
      k -> v
    }.toMap

  /** Full item-level state INCLUDING stamps — convergence must hold
    * on stamps too, or a third sync would diverge.
    */
  private def fullState(st: LocalKVStore): Map[String, Item] =
    st.scanSegment("t", 0, 1).map { case (it, _) =>
      it("id").asInstanceOf[AttrVal.S].v -> it
    }.toMap

  // Publish seqs floor at the wall clock (WalWriter stamps
  // pubSeq = max(seq, now, maxListed+1) — see LocalKVStore.nextPubSeq).
  // Hand out strictly increasing seqs ABOVE the clock so each write's
  // pubSeq equals its seq exactly and the laws' watermark arithmetic
  // stays deterministic — the contract production callers follow
  // (epoch-millis write clocks are monotonic per writer).
  private var seqCounter = System.currentTimeMillis() + 600000L
  private def nextSeq(): Long = { seqCounter += 1; seqCounter }

  private def w(st: LocalKVStore, region: String, ver: Long,
      ops: Seq[Replication.ROp]): Unit =
    Replication.writeStamped(st, "t", region, ver, nextSeq(),
      s"w$region$ver", ops)

  private def syncBoth(a: LocalKVStore, b: LocalKVStore): SyncResult =
    Replication.sync(a, b, "t", nextSeq(), "ab") +
      Replication.sync(b, a, "t", nextSeq(), "ba")

  test("bidirectional sync converges, including stamps; re-sync is idempotent") {
    val (a, b) = freshPair()
    w(a, "rA", 1, Seq(RPut(item("k1", "a1")), RPut(item("k2", "a1"))))
    w(b, "rB", 1, Seq(RPut(item("k3", "b1"))))
    w(a, "rA", 2, Seq(RPut(item("k2", "a2")))) // newer at A
    w(b, "rB", 2, Seq(RPut(item("k2", "b2")))) // equal ver: rB region wins
    syncBoth(a, b)
    syncBoth(a, b) // second crossing settles relayed state
    assert(fullState(a) == fullState(b))
    assert(state(a) == Map("k1" -> "a1", "k2" -> "b2", "k3" -> "b1"))
    val again = syncBoth(a, b)
    assert(again.applied == 0, s"idempotence: $again")
  }

  test("sync order does not change the converged state") {
    def run(abFirst: Boolean): Map[String, Item] = {
      val (a, b) = freshPair()
      w(a, "rA", 5, Seq(RPut(item("x", "ax")), RPut(item("y", "ay"))))
      w(b, "rB", 4, Seq(RPut(item("x", "bx"))))
      w(b, "rB", 6, Seq(RPut(item("y", "by")), RDelete(key("z"))))
      w(a, "rA", 7, Seq(RPut(item("z", "az")))) // fresher than the delete
      if (abFirst) syncBoth(a, b) else {
        Replication.sync(b, a, "t", nextSeq(), "ba")
        Replication.sync(a, b, "t", nextSeq(), "ab")
      }
      syncBoth(a, b)
      assert(fullState(a) == fullState(b))
      fullState(a)
    }
    assert(run(abFirst = true) == run(abFirst = false))
  }

  test("a replicated delete beats a stale put; a fresher put re-creates") {
    val (a, b) = freshPair()
    w(a, "rA", 1, Seq(RPut(item("k", "old"))))
    syncBoth(a, b)
    w(b, "rB", 3, Seq(RDelete(key("k"))))
    // Stale re-put at A with an OLDER stamp than the delete.
    w(a, "rA", 2, Seq(RPut(item("k", "stale"))))
    syncBoth(a, b)
    syncBoth(a, b)
    assert(state(a).get("k").isEmpty, "tombstone must beat the stale put")
    assert(state(b).get("k").isEmpty)
    // Fresher put AFTER the delete re-creates everywhere.
    w(a, "rA", 4, Seq(RPut(item("k", "fresh"))))
    syncBoth(a, b)
    assert(state(a)("k") == "fresh")
    assert(state(b)("k") == "fresh")
  }

  test("stamps and delete propagation survive source compaction") {
    val (a, b) = freshPair()
    w(a, "rA", 1, Seq(RPut(item("p", "v1")), RPut(item("q", "v1"))))
    w(a, "rA", 2, Seq(RDelete(key("q"))))
    a.compact("t") // folds the journal: delete now exists ONLY as base
    // absence + the tombstone sidecar; p's stamp rides its attributes.
    Replication.sync(a, b, "t", nextSeq(), "ab")
    assert(state(b) == Map("p" -> "v1"))
    assert(Replication.stampOf(fullState(b)("p")) == Stamp(1, "rA"))
    // And the tombstone still guards against a stale put arriving later.
    w(b, "rB", 1, Seq(RPut(item("q", "stale"))))
    Replication.sync(a, b, "t", nextSeq(), "ab2")
    val t = Replication.tombstones(b, "t")
    assert(t.keys.exists(_.contains("q")), "tombstone must have replicated")
  }

  test("incremental sync ships only journal-touched keys and equals full sync") {
    val (a, b) = freshPair()
    w(a, "rA", 1, Seq(RPut(item("k1", "v1")), RPut(item("k2", "v1"))))
    val first = Replication.syncIncremental(a, "rA", b, "t", nextSeq(), "i1")
    // No watermark yet but nothing compacted: journal path, both keys.
    assert(!first.full && first.puts == 2)
    w(a, "rA", 2, Seq(RPut(item("k2", "v2")), RDelete(key("k1"))))
    val second = Replication.syncIncremental(a, "rA", b, "t", nextSeq(), "i2")
    assert(!second.full && second.puts == 1 && second.deletes == 1)
    assert(state(b) == Map("k2" -> "v2"))
    val third = Replication.syncIncremental(a, "rA", b, "t", nextSeq(), "i3")
    assert(third.applied == 0, "nothing new: nothing shipped")
    // Full sync agrees exactly.
    val (c, _) = freshPair()
    Replication.sync(a, c, "t", nextSeq(), "full")
    assert(fullState(c) == fullState(b))
  }

  test("incremental sync falls back to full when compaction overtook the watermark") {
    val (a, b) = freshPair()
    w(a, "rA", 1, Seq(RPut(item("k1", "v1"))))
    Replication.syncIncremental(a, "rA", b, "t", nextSeq(), "i1")
    w(a, "rA", 2, Seq(RPut(item("k2", "v2"))))
    a.compact("t") // folds k2's journal entry past b's watermark
    val r = Replication.syncIncremental(a, "rA", b, "t", nextSeq(), "i2")
    assert(r.full, "folded history must force the full anti-entropy path")
    assert(state(b) == Map("k1" -> "v1", "k2" -> "v2"))
    // Watermark advanced: the next pass is incremental and empty.
    val r2 = Replication.syncIncremental(a, "rA", b, "t", nextSeq(), "i3")
    assert(!r2.full && r2.applied == 0)
  }

  /** Forge a same-pubSeq boundary tie: rename `writerId`'s published
    * journal files (wal + zstat sidecar) down to `pub`. The store's
    * own monotone stamp ([[LocalKVStore.nextPubSeq]]) no longer emits
    * such ties through the API, but a foreign or legacy writer whose
    * clock lags can still land these names — the watermark guards
    * must keep holding for them.
    */
  private def forgePub(root: String, writerId: String, pub: Long): Unit = {
    val dir = java.nio.file.Paths.get(root, "t")
    val st = Files.list(dir)
    val hits = try {
      val buf = Vector.newBuilder[java.nio.file.Path]
      val it = st.iterator()
      while (it.hasNext) {
        val p = it.next()
        val n = p.getFileName.toString
        if ((n.startsWith("wal-") || n.startsWith("zstat-")) &&
            n.contains(s"-$writerId-")) buf += p
      }
      buf.result()
    } finally st.close()
    assert(hits.nonEmpty, s"no published files for writer $writerId")
    hits.foreach { p =>
      val n = p.getFileName.toString
      val pre = n.takeWhile(_ != '-')
      val rest = n.drop(pre.length + 1 + 20) // skip "-" + 20-digit pubSeq
      Files.move(p, dir.resolve(f"$pre-$pub%020d$rest"),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
  }

  test("a same-pubSeq write landing at the watermark boundary still ships next pass") {
    // pubSeq uniqueness across writerIds is only guaranteed for
    // writers of THIS store build (the monotone stamp): a foreign
    // writer can land a file at EXACTLY the pubSeq the previous pass
    // recorded as its watermark. A `> wm` filter would skip that file
    // forever; the mark's seen-name set makes the boundary exclusive
    // per file, not per seq.
    val rootA = Files.createTempDirectory("repl-boundary-a").toString
    val a = new LocalKVStore(rootA); a.createTable("t", meta)
    val b = new LocalKVStore(
      Files.createTempDirectory("repl-boundary-b").toString)
    b.createTable("t", meta)
    val s = nextSeq()
    Replication.writeStamped(a, "t", "rA", 1, s, "w1", Seq(RPut(item("k1", "v1"))))
    Replication.syncIncremental(a, "rA", b, "t", nextSeq(), "i1") // wm = s
    assert(state(b) == Map("k1" -> "v1"))
    Replication.writeStamped(a, "t", "rA", 2, nextSeq(), "w2", Seq(RPut(item("k2", "v2"))))
    forgePub(rootA, "w2", s)
    val r = Replication.syncIncremental(a, "rA", b, "t", nextSeq(), "i2")
    assert(!r.full, "a live boundary file ships incrementally, no fallback needed")
    assert(state(b) == Map("k1" -> "v1", "k2" -> "v2"),
      "the boundary-colliding write must not be skipped")
  }

  test("a boundary-pubSeq write folded before the next pass forces the full fallback") {
    // Same collision, but compaction folds the unseen boundary file
    // before the next pass: the compaction watermark lands EXACTLY at
    // wm (never exceeding it), so the `folded > wm` check alone is
    // blind — the cw-at-pass / base-fingerprint guards must trip the
    // loud full sync that re-derives the write from the base.
    val rootA = Files.createTempDirectory("repl-boundary2-a").toString
    val a = new LocalKVStore(rootA); a.createTable("t", meta)
    val b = new LocalKVStore(
      Files.createTempDirectory("repl-boundary2-b").toString)
    b.createTable("t", meta)
    val s = nextSeq()
    Replication.writeStamped(a, "t", "rA", 1, s, "w1", Seq(RPut(item("k1", "v1"))))
    Replication.syncIncremental(a, "rA", b, "t", nextSeq(), "i1") // wm = s
    Replication.writeStamped(a, "t", "rA", 2, nextSeq(), "w2", Seq(RPut(item("k2", "v2"))))
    forgePub(rootA, "w2", s)
    a.compact("t") // folds BOTH files at pubSeq s: compaction watermark == wm
    val r = Replication.syncIncremental(a, "rA", b, "t", nextSeq(), "i2")
    assert(r.full, "a fold landing exactly at the watermark must force full sync")
    assert(state(b) == Map("k1" -> "v1", "k2" -> "v2"),
      "the folded boundary write must ship via the fallback")
    // Settled: the next pass is incremental and empty.
    val r2 = Replication.syncIncremental(a, "rA", b, "t", nextSeq(), "i3")
    assert(!r2.full && r2.applied == 0)
  }

  test("incremental-only passes converge after fallback full syncs race live writers") {
    // The fallback branches must advance the watermark only to the
    // PRE-sync journal head: [[Replication.sync]] does not ship a
    // write racing the scan of an already-visited shard, so a
    // watermark taken from a POST-sync listing would place that write
    // below the watermark unshipped — and replicateBatch (which only
    // ever runs the incremental path) would skip it forever.
    val (a, b) = freshPair()
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val verBase = new java.util.concurrent.atomic.AtomicLong(10)
    val writer = new Thread(() => {
      try {
        (0 until 200).foreach { i =>
          val ver = verBase.incrementAndGet()
          Replication.writeStamped(a, "t", "rA", ver,
            System.currentTimeMillis() + 1000000L + ver, s"race$ver",
            Seq(RPut(item(s"k${i % 30}", s"v$ver"))))
        }
      } catch { case e: Throwable => errs.add(e) }
    })
    writer.start()
    // Each compact pushes the compaction watermark past b's
    // replication watermark, forcing the next incremental call down
    // the full-sync fallback — mid-storm, so racing writes land in
    // the exact window the watermark rule protects.
    (0 until 8).foreach { _ =>
      a.compact("t")
      Replication.syncIncremental(a, "rA", b, "t", nextSeq(), s"f${nextSeq()}")
    }
    writer.join()
    assert(errs.isEmpty, s"writer failed: ${errs.peek()}")
    // Quiescent passes: INCREMENTAL ONLY — the steady-state
    // replicateBatch shape. Any write hidden below the watermark
    // would leave these passes permanently blind.
    (0 until 3).foreach { _ =>
      Replication.syncIncremental(a, "rA", b, "t", nextSeq(), s"q${nextSeq()}")
    }
    assert(fullState(a) == fullState(b),
      "incremental passes alone must repair everything the racing fallbacks missed")
  }

  test("replication watermark fences below an unmarked cross-table pending file") {
    // A cross-table transaction's journal file publishes BEFORE its
    // commit marker and joins the journal at that pre-assigned pubSeq
    // when the marker lands. Incremental passes running in between
    // must not advance the watermark past that pubSeq, or the
    // committed transaction would sit below the watermark unshipped
    // forever.
    val rootA = Files.createTempDirectory("repl-fence-a").toString
    val rootB = Files.createTempDirectory("repl-fence-b").toString
    val a = new LocalKVStore(rootA); a.createTable("t", meta)
    val b = new LocalKVStore(rootB); b.createTable("t", meta)
    w(a, "rA", 1, Seq(RPut(item("k1", "v1"))))
    Replication.syncIncremental(a, "rA", b, "t", nextSeq(), "i1")
    // in-flight cross-table transaction: pending file at pub P, unmarked
    val pub = nextSeq()
    val txnId = "00feedfacecafe00"
    val line = graft.sources.dynamo.ItemJson.write(Map(
      "op" -> (AttrVal.S("PUT"): AttrVal),
      "item" -> (AttrVal.M(item("k3", "v3")): AttrVal)))
    Files.write(java.nio.file.Paths.get(rootA, "t",
      f"wal-$pub%020d-w9.x$txnId-sall.jsonl"), (line + "\n").getBytes("UTF-8"))
    // ordinary write published ABOVE the pending transaction
    w(a, "rA", 2, Seq(RPut(item("k2", "v2"))))
    Replication.syncIncremental(a, "rA", b, "t", nextSeq(), "i2")
    assert(state(b) == Map("k1" -> "v1", "k2" -> "v2"),
      "committed writes above the fence still ship")
    // commit the transaction: ONE marker file at the source root
    val tmp = java.nio.file.Paths.get(rootA, s".txn-commit-$txnId.tmp")
    Files.write(tmp, Array.empty[Byte])
    Files.move(tmp, java.nio.file.Paths.get(rootA, s".txn-commit-$txnId"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    val r = Replication.syncIncremental(a, "rA", b, "t", nextSeq(), "i3")
    assert(state(b) == Map("k1" -> "v1", "k2" -> "v2", "k3" -> "v3"),
      s"the late-committed transaction must ship once marked ($r)")
  }

  test("LAW: a committed cross-table transaction ships per-table, whole — destination may lack the other table") {
    // Replication × transactions (r15 verdict item 3). The pinned
    // semantics: replication is PER-TABLE state shipping (DynamoDB
    // global tables; transactions are documented as NOT transactional
    // across regions), so a committed cross-table transaction's share
    // of a replicated table ships WHOLE through syncIncremental — the
    // root-level commit marker never travels, and the destination is
    // free to lack the transaction's OTHER table entirely. The only
    // thing that must never ship is an UNCOMMITTED pending half — the
    // watermark fence + listing invisibility guarantee that, including
    // while full anti-entropy runs mid-commit.
    import graft.sources.dynamo.{LocalKVStore => KV, TableTxn}
    import scala.jdk.CollectionConverters._
    val rootA = Files.createTempDirectory("repl-xtxn-src").toString
    val rootB = Files.createTempDirectory("repl-xtxn-dst").toString
    val a = new LocalKVStore(rootA)
    a.createTable("t", meta)
    a.createTable("u", meta) // replicates NOWHERE
    val b = new LocalKVStore(rootB)
    b.createTable("t", meta) // the destination has no "u" at all
    w(a, "rA", 1, Seq(RPut(item("k1", "v1"))))
    a.appendWal("t", nextSeq(), "wseed", Seq(a.Put(Map(
      "id" -> AttrVal.S("k2"),
      "l" -> AttrVal.L(Vector(AttrVal.N(BigDecimal(1))))))))
    Replication.syncIncremental(a, "rA", b, "t", nextSeq(), "i1")
    // a REAL cross-table transaction with nested-edit cargo in the
    // replicated table and a plain write in the unreplicated one.
    // Replicated mutations must advance their LWW stamp (the stamp
    // contract: one (ver, region) never stamps two different writes
    // of a key) — here the transaction bumps k2's stamp attrs in the
    // same atomic slice as its path edit, the transactional spelling
    // of writeStamped.
    a.transactWriteMulti(Seq(
      TableTxn("t", Seq(
        a.Put(item("k3", "t3")),
        a.PathEdits(Map("id" -> (AttrVal.S("k2"): AttrVal)),
          Seq(KV.PathEdit(Seq(Left("l"), Right(0)),
            Some(AttrVal.N(BigDecimal(9)))))),
        a.Update(Map("id" -> AttrVal.S("k2"),
          Replication.VerAttr -> AttrVal.N(BigDecimal(2)),
          Replication.SrcAttr -> AttrVal.S("rA")))), Nil),
      TableTxn("u", Seq(a.Put(item("k9", "u9"))), Nil)),
      nextSeq(), "xt1")
    Replication.syncIncremental(a, "rA", b, "t", nextSeq(), "i2")
    def visible(st: LocalKVStore): Map[String, Item] =
      st.scanSegment("t", 0, 1).map(_._1)
        .map(it => it("id").asInstanceOf[AttrVal.S].v ->
          (it - Replication.VerAttr - Replication.SrcAttr)).toMap
    assert(visible(b) === visible(a),
      "the committed transaction's t-share must ship whole")
    assert(visible(b)("k2")("l") ===
      AttrVal.L(Vector(AttrVal.N(BigDecimal(9)))),
      "path-edit cargo must ship as its resolved effect")
    // mid-commit window: pending halves in BOTH tables, marker absent.
    // Full anti-entropy (sync) runs NOW — nothing of the pending may
    // ship, and the incremental watermark must stay fenced below it.
    val pub = nextSeq()
    val txnId = "00c0ffee00c0ffee"
    def pend(table: String, k: String): Unit = {
      val line = graft.sources.dynamo.ItemJson.write(Map(
        "op" -> (AttrVal.S("PUT"): AttrVal),
        "item" -> (AttrVal.M(item(k, "pending")): AttrVal)))
      Files.write(java.nio.file.Paths.get(rootA, table,
        f"wal-$pub%020d-w9.x$txnId-sall.jsonl"), (line + "\n").getBytes("UTF-8"))
    }
    pend("t", "k4"); pend("u", "k8")
    val beforeMid = visible(b)
    Replication.sync(a, b, "t", nextSeq(), "anti1") // anti-entropy mid-commit
    assert(visible(b) === beforeMid,
      "anti-entropy mid-commit must not ship a torn pending half")
    Replication.syncIncremental(a, "rA", b, "t", nextSeq(), "i3")
    assert(visible(b) === beforeMid)
    // COMMIT at the source; the next incremental pass ships t's share
    val tmp = java.nio.file.Paths.get(rootA, s".txn-commit-$txnId.tmp")
    Files.write(tmp, Array.empty[Byte])
    Files.move(tmp, java.nio.file.Paths.get(rootA, s".txn-commit-$txnId"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    Replication.syncIncremental(a, "rA", b, "t", nextSeq(), "i4")
    assert(visible(b) === visible(a))
    assert(visible(b).contains("k4"), "the committed share must ship")
    assert(!Files.exists(java.nio.file.Paths.get(rootB, "u")),
      "replication must never materialize the unreplicated table")
    assert(java.nio.file.Files.list(java.nio.file.Paths.get(rootB))
      .iterator().asScala.forall(p =>
        !p.getFileName.toString.startsWith(".txn-commit-")),
      "the commit marker must never travel to the destination")
    // ...and the LWW floor: an in-place mutation that does NOT
    // advance its stamp (here: a plain unstamped Put over the
    // stamped k2) sorts below the destination's copy and never
    // ships — the flip side of the stamp contract above
    a.appendWal("t", nextSeq(), "wplain",
      Seq(a.Put(item("k2", "mutated-unstamped"))))
    Replication.syncIncremental(a, "rA", b, "t", nextSeq(), "i5")
    assert(!visible(b)("k2").contains("v"),
      "a stamp-regressing mutation must not replicate (LWW floor)")
  }

  test("LAW: index-invisible items (non-key-typed index slots) survive backup and anti-entropy") {
    // r15's keyTyped rule made items whose index key slot holds a
    // Bool/L/M sparse-INVISIBLE in the index instead of poisoning
    // rebuilds. The r16 frontier: those items as REPLICATION and
    // BACKUP cargo, including a pending chain that ENDS
    // index-invisible (a path edit retypes the slot) — both sides
    // must rebuild indexes cleanly and agree on the index view.
    import graft.sources.dynamo.{IndexMeta, LocalKVStore => KV}
    val rootA = Files.createTempDirectory("repl-keytyped-a").toString
    val a = new LocalKVStore(rootA)
    val imeta = TableMeta("id", None, shards = 2, throughput = 1000000L,
      indexes = Map("by_v" -> IndexMeta("v", None, None)))
    a.bulkLoad("t", imeta, Iterator(
      Map("id" -> AttrVal.S("k1"), "v" -> AttrVal.S("g1")),
      Map("id" -> AttrVal.S("k2"), "v" -> AttrVal.S("g2"))))
    a.buildIndex("t", "by_v")
    // k3 arrives index-invisible outright AND its pending chain ends
    // with a nested edit; k2's chain ENDS invisible (an Update
    // retypes v to Bool — top-level retypes ride the plain ops, path
    // edits are nested-only by contract); k1 stays visible
    a.appendWal("t", nextSeq(), "w1", Seq(
      a.Put(Map("id" -> AttrVal.S("k3"), "v" -> AttrVal.Bool(true),
        "m" -> AttrVal.M(Map("x" -> AttrVal.N(BigDecimal(1)))))),
      a.Update(Map("id" -> AttrVal.S("k2"), "v" -> AttrVal.Bool(false))),
      a.PathEdits(Map("id" -> (AttrVal.S("k3"): AttrVal)),
        Seq(KV.PathEdit(Seq(Left("m"), Left("x")),
          Some(AttrVal.N(BigDecimal(2))))))))
    def idxView(st: LocalKVStore): Vector[Item] = {
      st.compact("t") // rebuild registered copies — must not fault
      (0 until 2).flatMap(s =>
        st.scanIndexSegment("t", "by_v", s, 2).map(_._1))
        .toVector.sortBy(_.toString)
    }
    val srcIdx = idxView(a)
    assert(srcIdx.map(_("id")) === Vector(AttrVal.S("k1")),
      "only the key-typed item is index-visible at the source")
    // backup: the restored store rebuilds the same (sparse) index
    val dstRoot = Files.createTempDirectory("repl-keytyped-bk").toString
    a.backupTable("t", dstRoot)
    val r = new LocalKVStore(dstRoot)
    assert(idxView(r) === srcIdx)
    assert(r.scanSegment("t", 0, 1).map(_._1).toVector.sortBy(_.toString)
      === a.scanSegment("t", 0, 1).map(_._1).toVector.sortBy(_.toString),
      "index-invisible items still restore as BASE data")
    // anti-entropy: a replica receives the items and agrees
    val rootB = Files.createTempDirectory("repl-keytyped-b").toString
    val b = new LocalKVStore(rootB)
    b.createTable("t", imeta)
    b.buildIndex("t", "by_v")
    Replication.sync(a, b, "t", nextSeq(), "ae")
    assert(idxView(b) === srcIdx)
    assert(b.scanSegment("t", 0, 1).map(_._1).toVector.size === 3)
  }

  test("three-region relay carries deletes and wins through the middle region") {
    val (a, b) = freshPair()
    val (c, _) = freshPair()
    w(a, "rA", 1, Seq(RPut(item("k", "v1")), RPut(item("d", "v1"))))
    Replication.sync(a, b, "t", nextSeq(), "ab")
    Replication.sync(b, c, "t", nextSeq(), "bc")
    assert(state(c) == Map("k" -> "v1", "d" -> "v1"))
    w(a, "rA", 2, Seq(RDelete(key("d"))))
    // The delete flows A→B→C even though B never wrote anything.
    Replication.sync(a, b, "t", nextSeq(), "ab2")
    Replication.sync(b, c, "t", nextSeq(), "bc2")
    assert(state(c) == Map("k" -> "v1"))
  }

  test("replicas converge to the LWW oracle under random interleavings") {
    // Property law, StoreLawsSpec style: random stamped ops at two
    // regions, random sync interleavings → both replicas equal a
    // functional LWW fold of all ops.
    final case class TOp(region: String, ver: Long, k: String, del: Boolean,
        v: String)
    val genOps: Gen[List[TOp]] = {
      var ver = 0L
      Gen.listOfN(24, for {
        region <- Gen.oneOf("rA", "rB")
        k <- Gen.chooseNum(0, 5).map(i => s"k$i")
        del <- Gen.frequency(3 -> false, 1 -> true)
        v <- Gen.alphaLowerStr.map(_.take(4))
      } yield { ver += 1; TOp(region, ver, k, del, v) })
    }
    (0 until 25).foreach { i =>
      genOps(Gen.Parameters.default.withSize(20), Seed(i.toLong)).foreach { ops =>
        val (a, b) = freshPair()
        ops.foreach { op =>
          val st = if (op.region == "rA") a else b
          val rop = if (op.del) RDelete(key(op.k))
            else RPut(item(op.k, op.v))
          w(st, op.region, op.ver, Seq(rop))
          // Occasional mid-stream syncs exercise partial exchanges —
          // alternating the full and the INCREMENTAL path, so the
          // journal-shipping code faces the same random interleavings.
          if (op.ver % 7 == 0)
            Replication.syncIncremental(a, "rA", b, "t", nextSeq(), s"m${op.ver}")
          if (op.ver % 11 == 0) Replication.sync(b, a, "t", nextSeq(), s"n${op.ver}")
        }
        Replication.syncIncremental(a, "rA", b, "t", nextSeq(), "fin")
        syncBoth(a, b); syncBoth(a, b)
        // Functional oracle: per key, the op with the max (ver, region).
        val oracle = ops.groupBy(_.k).flatMap { case (k, kops) =>
          val winner = kops.maxBy(o => (o.ver, o.region))
          if (winner.del) None else Some(k -> winner.v)
        }
        assert(state(a) == oracle, s"seed $i: A diverged from LWW oracle")
        assert(fullState(a) == fullState(b), s"seed $i: replicas diverged")
      }
    }
  }

  test("sync racing concurrent writers still converges once writers quiesce") {
    // Anti-entropy needs no write fence: a pass that overlaps live
    // writers may ship a torn prefix, but every missed write is still
    // present at its origin with its stamp, so the next quiescent
    // pass ships it — convergence is eventual, never wrong-way (a
    // stale image can never beat the fresher stamp it raced).
    val (a, b) = freshPair()
    val keys = (0 until 40).map(i => s"k$i")
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val verBase = new java.util.concurrent.atomic.AtomicLong(10)
    val writers = (0 until 3).map { t =>
      new Thread(() => {
        try {
          val rnd = new scala.util.Random(t)
          (0 until 25).foreach { _ =>
            val k = keys(rnd.nextInt(keys.size))
            val ver = verBase.incrementAndGet()
            val region = if (t % 2 == 0) "rA" else "rB"
            val st = if (t % 2 == 0) a else b
            val op = if (rnd.nextInt(5) == 0) RDelete(key(k))
              else RPut(item(k, s"v$ver"))
            Replication.writeStamped(st, "t", region, ver,
              System.currentTimeMillis() + 1000000L + ver, s"race$t$ver",
              Seq(op))
          }
        } catch { case e: Throwable => errs.add(e) }
      })
    }
    writers.foreach(_.start())
    // Sync passes racing the writer storm.
    (0 until 4).foreach { _ =>
      Replication.sync(a, b, "t", nextSeq(), s"r${nextSeq()}")
      Replication.sync(b, a, "t", nextSeq(), s"r${nextSeq()}")
    }
    writers.foreach(_.join())
    assert(errs.isEmpty, s"writer failed: ${errs.peek()}")
    // Quiescent passes settle everything the racing passes missed.
    syncBoth(a, b); syncBoth(a, b)
    assert(fullState(a) == fullState(b), "replicas must converge after quiesce")
  }

  test("3-4 region mesh: random write/sync interleavings converge to the LWW oracle; acked GC drains") {
    // Global Tables run FULL MESH, not pairs: R regions, a random
    // stamped write history, random DIRECTED sync passes interleaved
    // (mixing the incremental and full paths), then a quiescent
    // round-robin — every region must equal the functional LWW fold,
    // and after convergence the acknowledgment-computed tombstone GC
    // must drain every region's tombstones without resurrection.
    (0 until 10).foreach { seedI =>
      val rnd = new scala.util.Random(seedI.toLong)
      val nRegions = 3 + (seedI % 2)
      val regions = (0 until nRegions).map(i => s"r$i")
      val stores = regions.map { r =>
        val st = new LocalKVStore(
          Files.createTempDirectory(s"mesh$r").toString)
        st.createTable("t", meta); st
      }
      final case class TOp(region: Int, ver: Long, k: String, del: Boolean)
      var ver = 100L
      val ops = (0 until 30).map { _ =>
        ver += 1
        TOp(rnd.nextInt(nRegions), ver, s"k${rnd.nextInt(6)}",
          rnd.nextInt(4) == 0)
      }
      ops.foreach { op =>
        val st = stores(op.region)
        val rop = if (op.del) RDelete(key(op.k))
          else RPut(item(op.k, s"v${op.ver}"))
        w(st, regions(op.region), op.ver, Seq(rop))
        // random directed mid-stream passes: any (src, dst) pair, path
        // chosen at random — partial relays through third regions
        // included
        if (rnd.nextInt(3) == 0) {
          val i = rnd.nextInt(nRegions)
          var j = rnd.nextInt(nRegions); if (j == i) j = (j + 1) % nRegions
          if (rnd.nextBoolean())
            Replication.syncIncremental(stores(i), regions(i), stores(j),
              "t", nextSeq(), s"mi$i$j${op.ver}")
          else Replication.sync(stores(i), stores(j), "t", nextSeq(),
            s"mf$i$j${op.ver}")
        }
      }
      // quiescent full round-robin (nRegions-1 rounds propagate any
      // relay chain); INCREMENTAL only — the steady-state path
      (0 until nRegions).foreach { _ =>
        for (i <- regions.indices; j <- regions.indices if i != j)
          Replication.syncIncremental(stores(i), regions(i), stores(j),
            "t", nextSeq(), s"q$i$j${nextSeq()}")
      }
      val oracle = ops.groupBy(_.k).flatMap { case (k, kops) =>
        val win = kops.maxBy(o => (o.ver, regions(o.region)))
        if (win.del) None else Some(k -> s"v${win.ver}")
      }
      stores.zipWithIndex.foreach { case (st, i) =>
        assert(state(st) == oracle,
          s"seed $seedI: region ${regions(i)} diverged from the LWW oracle")
      }
      // acked GC at every region: after full convergence every peer's
      // watermark passed every tombstone's origin, so GC drains ALL
      // tombstones — and one more mesh round must not resurrect.
      regions.indices.foreach { i =>
        val peers = stores.indices.filter(_ != i).map(stores)
        Replication.gcTombstonesAcked(stores(i), "t", nextSeq(),
          peers, regions(i))
        // Every WINNING tombstone (key absent in the converged state)
        // must drain — its relay published a journal entry peers acked.
        // A DOMINATED tombstone (a fresher put recreated the key) is
        // inert and may outlive the ack floor: its recording apply had
        // no journal entry of its own to ack.
        Replication.tombstones(stores(i), "t").keys.foreach { ck =>
          assert(oracle.contains(ck.stripPrefix("s:")),
            s"seed $seedI: winning tombstone $ck survived acked GC at ${regions(i)}")
        }
      }
      for (i <- regions.indices; j <- regions.indices if i != j)
        Replication.syncIncremental(stores(i), regions(i), stores(j),
          "t", nextSeq(), s"p$i$j${nextSeq()}")
      stores.foreach(st => assert(state(st) == oracle,
        s"seed $seedI: post-GC mesh round resurrected or lost state"))
    }
  }

  test("tombstone GC after full convergence is safe; premature GC resurrects") {
    // Safe path: both replicas converged past the delete, GC drops
    // the tombstones, further syncs change nothing.
    val (a, b) = freshPair()
    w(a, "rA", 1, Seq(RPut(item("k", "v")), RPut(item("j", "v"))))
    w(a, "rA", 2, Seq(RDelete(key("k"))))
    syncBoth(a, b); syncBoth(a, b)
    assert(Replication.tombstones(a, "t").nonEmpty)
    val droppedA = Replication.gcTombstones(a, "t", beforeVer = 3, nextSeq())
    val droppedB = Replication.gcTombstones(b, "t", beforeVer = 3, nextSeq())
    assert(droppedA == 1 && droppedB == 1)
    assert(Replication.tombstones(a, "t").isEmpty)
    val after = syncBoth(a, b)
    assert(after.applied == 0 && state(a) == Map("j" -> "v"))
    // GC keeps fresher tombstones: a cutoff below the stamp retains it.
    val (c, d) = freshPair()
    w(c, "rA", 9, Seq(RPut(item("x", "v"))))
    w(c, "rA", 10, Seq(RDelete(key("x"))))
    assert(Replication.gcTombstones(c, "t", beforeVer = 10, nextSeq()) == 0)
    assert(Replication.tombstones(c, "t").values.map(_.ver).toSeq == Seq(10L))
    // Hazard path (the documented precondition is real): replica d
    // still holds the PRE-delete image; GC'ing c's tombstone before d
    // synced lets the stale image resurrect at c.
    Replication.sync(c, d, "t", nextSeq(), "cd0") // too late: x already deleted at c
    val (e, f) = freshPair()
    w(e, "rA", 1, Seq(RPut(item("y", "stale"))))
    Replication.sync(e, f, "t", nextSeq(), "ef") // f now holds y@1
    w(e, "rA", 2, Seq(RDelete(key("y"))))
    Replication.gcTombstones(e, "t", beforeVer = 3, nextSeq()) // PREMATURE
    Replication.sync(f, e, "t", nextSeq(), "fe")
    assert(state(e).get("y").contains("stale"),
      "premature GC must resurrect — this is the hazard the precondition exists for")
  }

  test("sync racing compaction at both ends still converges once quiescent") {
    // Compaction rewrites base shards while sync passes scan them:
    // a racing pass may see a torn view, but every item it misses is
    // still at its origin with its stamp, and candidate applies
    // re-check under the table lock against a compaction-fenced
    // snapshot read (transactGet) — so convergence is eventual and
    // never wrong-way, same as the racing-writer law.
    val (a, b) = freshPair()
    (0 until 30).foreach { i =>
      w(a, "rA", 10 + i, Seq(RPut(item(s"k$i", s"v$i"))))
    }
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val compactor = new Thread(() => {
      try while (!stop.get()) { a.compact("t"); b.compact("t") }
      catch { case e: Throwable => errs.add(e) }
    })
    compactor.start()
    try {
      (0 until 6).foreach { i =>
        Replication.sync(a, b, "t", nextSeq(), s"c$i")
        w(b, "rB", 100 + i, Seq(RPut(item(s"k$i", s"w$i"))))
        Replication.sync(b, a, "t", nextSeq(), s"d$i")
      }
    } finally { stop.set(true); compactor.join() }
    assert(errs.isEmpty, s"maintenance failed: ${errs.peek()}")
    syncBoth(a, b); syncBoth(a, b)
    assert(fullState(a) == fullState(b),
      "replicas must converge once compaction quiesces")
    (0 until 6).foreach(i => assert(state(a)(s"k$i") == s"w$i"))
    (6 until 30).foreach(i => assert(state(a)(s"k$i") == s"v$i"))
  }

  test("incremental sync delegates table-scale backlogs to the full path") {
    val (a, b) = freshPair()
    (0 until 12).foreach(i => w(a, "rA", i + 1, Seq(RPut(item(s"k$i", s"v$i")))))
    // 12 touched keys > a bound of 5 → shard-parallel full path runs
    // (flagged in the result), state still converges, watermark still
    // advances so the NEXT pass is a true (empty) incremental.
    val r = Replication.syncIncremental(a, "rA", b, "t", nextSeq(), "big",
      maxIncrementalKeys = 5)
    assert(r.full, "backlog beyond the bound must take the full path")
    assert(state(b).size == 12)
    val r2 = Replication.syncIncremental(a, "rA", b, "t", nextSeq(), "big2",
      maxIncrementalKeys = 5)
    assert(!r2.full && r2.applied == 0)
  }

  test("acked GC drops only peer-acknowledged tombstones — the computed precondition") {
    val (a, b) = freshPair()
    w(a, "rA", 1, Seq(RPut(item("k", "v")), RPut(item("j", "v"))))
    // Peer B syncs incrementally (watermarks advance), then A deletes.
    Replication.syncIncremental(a, "rA", b, "t", nextSeq(), "i1")
    w(a, "rA", 2, Seq(RDelete(key("k"))))
    // Before B acknowledges the delete: floor < origin → GC refuses.
    assert(Replication.gcTombstonesAcked(a, "t", nextSeq(), Seq(b), "rA") == 0)
    assert(Replication.tombstones(a, "t").nonEmpty,
      "unacknowledged tombstone must survive")
    // B ships the delete (watermark passes the applying entry) → GC fires.
    Replication.syncIncremental(a, "rA", b, "t", nextSeq(), "i2")
    assert(state(b).get("k").isEmpty)
    assert(Replication.gcTombstonesAcked(a, "t", nextSeq(), Seq(b), "rA") == 1)
    assert(Replication.tombstones(a, "t").isEmpty)
    // And B cannot re-introduce k: it applied the delete, so it holds
    // no pre-delete image to ship.
    syncBoth(a, b)
    assert(state(a) == Map("j" -> "v"))
    // A peer that never ran an incremental pass floors the GC at 0.
    val (c, d) = freshPair()
    w(c, "rA", 1, Seq(RPut(item("x", "v"))))
    w(c, "rA", 2, Seq(RDelete(key("x"))))
    assert(Replication.ackedGcFloor(Seq(d), "t", "rA") == 0L)
    assert(Replication.gcTombstonesAcked(c, "t", nextSeq(), Seq(d), "rA") == 0)
  }

  test("backups carry tombstones: a restored replica resists stale-put resurrection") {
    val (a, b) = freshPair()
    w(a, "rA", 1, Seq(RPut(item("k", "v1")), RPut(item("j", "v1"))))
    Replication.sync(a, b, "t", nextSeq(), "ab") // b now holds k@1 (stale-to-be)
    w(a, "rA", 2, Seq(RDelete(key("k"))))
    val destRoot = Files.createTempDirectory("repl-backup").toString
    a.backupTable("t", destRoot)
    val restored = new LocalKVStore(destRoot)
    assert(state(restored) == Map("j" -> "v1"), "backup reflects the delete")
    assert(Replication.tombstones(restored, "t").nonEmpty,
      "tombstone sidecars must travel with the backup")
    // The stale peer can no longer resurrect the deleted item.
    Replication.sync(b, restored, "t", nextSeq(), "br")
    assert(state(restored) == Map("j" -> "v1"),
      "restored replica must reject the stale pre-delete image")
    // Incremental backups keep carrying later tombstones.
    w(a, "rA", 3, Seq(RDelete(key("j"))))
    a.backupTableIncremental("t", destRoot)
    assert(Replication.tombstones(restored, "t").size == 2)
    assert(state(restored).isEmpty)
  }

  test("writeStamped rejects non-LWW-resolvable ops is enforced by the ADT") {
    // RPut/RUpdate/RDelete is the whole ROp alphabet — ADD/REMOVE
    // cannot be expressed, which IS the rejection (compile-time).
    // Runtime check: update merges still stamp.
    val (a, b) = freshPair()
    w(a, "rA", 1, Seq(RPut(item("k", "v1"))))
    Replication.writeStamped(a, "t", "rA", 2, nextSeq(), "u",
      Seq(Replication.RUpdate(Map("id" -> AttrVal.S("k"),
        "extra" -> AttrVal.S("e")))))
    Replication.sync(a, b, "t", nextSeq(), "ab")
    val it = fullState(b)("k")
    assert(it("v") == AttrVal.S("v1") && it("extra") == AttrVal.S("e"))
    assert(Replication.stampOf(it) == Stamp(2, "rA"))
  }
}
