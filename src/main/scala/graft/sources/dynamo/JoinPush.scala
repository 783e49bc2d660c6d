package graft.sources.dynamo

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType

import graft.sources.dynamo.ItemJson.Item

/** One side of a pushed two-table join (`SupportsPushDownJoin`,
  * Spark 4.1): which table to read, the filters Spark already pushed
  * into that side's builder BEFORE the join negotiation (they apply to
  * the side's RAW items, below the join), and the (source column →
  * output alias) projection the joined relation exposes for it.
  */
final case class PushedJoinSide(
    opts: DynamoOptions,
    pushed: Array[Filter],
    adv: Seq[PredicateV2.VPred],
    cols: Seq[(String, String)]) extends Serializable {
  def describe: String =
    s"${opts.tableName}(${cols.map { case (c, a) =>
      if (c == a) c else s"$c AS $a" }.mkString(", ")})"
}

/** A join absorbed into the left scan: both sides live in the SAME
  * store, the join type is INNER or LEFT OUTER (`outer` — unmatched
  * probe rows null-extend), and the condition translated exactly
  * through [[PredicateV2.translate]] against the ALIASED joined schema
  * (Spark rewrites the condition onto the aliased output before
  * pushing). Anything else was declined at negotiation.
  */
final case class PushedJoinSpec(
    left: PushedJoinSide,
    right: PushedJoinSide,
    cond: Either[Filter, PredicateV2.VPred],
    joinedSchema: StructType,
    outer: Boolean = false) extends Serializable {

  /** Aliased (left, right) column pairs the condition constrains by
    * EQUALITY — the hash-join keys. Collected from `=` conjuncts of
    * column-vs-column shape; the FULL condition is still re-evaluated
    * on every merged candidate, so the pairs only need to be a sound
    * subset (hashing on them can never drop a matching pair: rows
    * whose key attrs are missing/null cannot satisfy `=` anyway).
    */
  def equiKeys: Seq[(String, String)] = {
    val leftAliases = left.cols.map(_._2).toSet
    val rightAliases = right.cols.map(_._2).toSet
    def walk(p: PredicateV2.VPred): Seq[(String, String)] = p match {
      case PredicateV2.VAnd(l, r) => walk(l) ++ walk(r)
      case PredicateV2.VCmp("=", PredicateV2.VCol(a, _), PredicateV2.VCol(b, _)) =>
        if (leftAliases(a) && rightAliases(b)) Seq((a, b))
        else if (leftAliases(b) && rightAliases(a)) Seq((b, a))
        else Nil
      case _ => Nil
    }
    cond.fold(_ => Nil, walk)
  }

  def describe: String = {
    val c = cond.fold(_.toString, _.toString)
    val jt = if (outer) "LEFT OUTER JOIN" else "INNER JOIN"
    s"${left.describe} $jt ${right.describe} ON $c"
  }
}

/** The pushed-join scan: Spark removed its Join operator, so this scan
  * IS the join. Partitioning follows the LEFT (probe) side's segment
  * plan — the scale shape of a fact ⋈ dim join: each task streams its
  * own left segment and builds a hash table of the (size-bounded,
  * filtered) right table, exactly a broadcast-hash join with the
  * build side read store-side instead of shipped from the driver.
  * Negotiation bounds the build: the right table's stored size must
  * not exceed `joinBuildMaxBytes` (option, default 64 MB), so the
  * per-task build is dimension-sized at any left-table scale.
  */
final class DynamoJoinScan(
    spec: PushedJoinSpec,
    schema: StructType,
    postFilters: Array[Filter],
    postAdv: Seq[PredicateV2.VPred],
    aggs: Seq[PushedAgg] = Nil)
    extends Scan with Batch with SupportsReportStatistics {

  // An ungrouped aggregate pushed OVER the join: each task folds its
  // merged rows into one partial row (Spark folds the partials).
  override def readSchema(): StructType =
    if (aggs.isEmpty) schema
    else StructType(aggs.zipWithIndex.map { case (a, i) => a.resultField(i) })

  override def description(): String =
    s"dynamo-join PushedJoin: [${spec.describe}], " +
      (if (postFilters.nonEmpty || postAdv.nonEmpty)
        s"PostJoinFilters: [${(postFilters.map(_.toString) ++
          postAdv.map(_.toString)).mkString(", ")}], "
      else "") +
      (if (aggs.nonEmpty)
        s"PushedAggregates: [${aggs.mkString(", ")}], "
      else "") +
      s"ReadSchema: ${readSchema().catalogString}"

  override def toBatch: Batch = this

  // Inner join with a dimension-sized right side: the probe side
  // dominates, so report its stored size (join planning above this
  // scan sees a sane magnitude).
  override def estimateStatistics(): Statistics = new Statistics {
    private val bytes =
      new LocalKVStore(spec.left.opts.path).sizeBytes(spec.left.opts.tableName)
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(bytes)
    override def numRows(): java.util.OptionalLong = java.util.OptionalLong.empty()
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val store = new LocalKVStore(spec.left.opts.path)
    val meta = store.describe(spec.left.opts.tableName)
    val n = DynamoScan.fullScanSegments(store, meta, spec.left.opts)
    val throughput =
      spec.left.opts.throughput.getOrElse(meta.throughput).toDouble
    val rate = math.max(0.1, spec.left.opts.targetCapacity * throughput / n)
    Array.tabulate(n)(i => DynamoInputPartition(i, n, rate))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new DynamoJoinReaderFactory(spec, schema, postFilters, postAdv, aggs)

  override def supportedCustomMetrics(): Array[org.apache.spark.sql.connector.metric.CustomMetric] =
    Array(new ScanMetrics.ItemsScanned, new ScanMetrics.ItemsFiltered)
}

final class DynamoJoinReaderFactory(
    spec: PushedJoinSpec, schema: StructType,
    postFilters: Array[Filter], postAdv: Seq[PredicateV2.VPred],
    aggs: Seq[PushedAgg] = Nil)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new DynamoJoinReader(spec, schema, postFilters, postAdv,
      partition.asInstanceOf[DynamoInputPartition], aggs)
}

/** Executor-side join task: hash-build the filtered right table, then
  * stream this task's left segment through it. Right items that fail
  * their side's pushed filters or TTL visibility never enter the map;
  * merged candidates re-evaluate the FULL join condition (hash keys
  * are a sound subset, see [[PushedJoinSpec.equiKeys]]) and then the
  * post-join pushed filters.
  */
final class DynamoJoinReader(
    spec: PushedJoinSpec,
    schema: StructType,
    postFilters: Array[Filter],
    postAdv: Seq[PredicateV2.VPred],
    partition: DynamoInputPartition,
    aggs: Seq[PushedAgg] = Nil)
    extends PartitionReader[InternalRow] {

  private lazy val decode = Codec.rowReader(schema)

  private var scanned = 0L
  private var matched = 0L

  /** Rename a raw item into the join's alias space, keeping only the
    * side's projected columns; absent attributes stay absent.
    */
  private def project(it: Item, cols: Seq[(String, String)]): Item =
    cols.flatMap { case (c, a) => it.get(c).map(a -> _) }.toMap

  private def sideVisible(side: PushedJoinSide, store: LocalKVStore,
      ttlNow: Long)(it: Item): Boolean =
    Ttl.alive(side.opts, ttlNow)(it) &&
      side.pushed.forall(FilterEval.eval(_, it)) &&
      side.adv.forall(PredicateV2.eval(_, it))

  private val keys = spec.equiKeys

  // Build side: the whole (filtered) right table, hashed on the equi
  // keys — or a flat vector when the condition has none (rare; the
  // nested-loop fallback is still bounded by joinBuildMaxBytes).
  private lazy val (rightByKey, rightAll) = {
    val s = spec.right
    val store = new LocalKVStore(s.opts.path)
    val meta = store.describe(s.opts.tableName)
    val limiter = new RateLimiter(math.max(0.1,
      s.opts.targetCapacity * s.opts.throughput.getOrElse(meta.throughput).toDouble))
    val consistency = if (s.opts.stronglyConsistentReads) 1.0 else 0.5
    val ttlNow = Ttl.now(s.opts)
    val rows = store.scanSegment(s.opts.tableName, 0, 1, s.opts.asOfSeq)
      .map { case (it, sz) =>
        limiter.acquire(sz.toDouble / s.opts.bytesPerRCU * consistency); it }
      .filter(sideVisible(s, store, ttlNow))
      .map(project(_, s.cols))
      .toVector
    if (keys.isEmpty) (Map.empty[Seq[AttrVal], Vector[Item]], rows)
    else {
      val m = rows.flatMap { it =>
        val k = keys.map { case (_, r) => it.get(r) }
        // a missing/null key attr can never satisfy `=` — skip
        if (k.forall(v => v.isDefined && v != Some(AttrVal.Null)))
          Some(k.map(_.get) -> it)
        else None
      }.groupMap(_._1)(_._2)
      (m, Vector.empty[Item])
    }
  }

  private val leftStore = new LocalKVStore(spec.left.opts.path)
  private lazy val leftTtlNow = Ttl.now(spec.left.opts)
  private val leftLimiter = new RateLimiter(partition.ratePerSegment)
  private val leftConsistency =
    if (spec.left.opts.stronglyConsistentReads) 1.0 else 0.5

  private val mergedItems: Iterator[Item] =
    leftStore.scanSegment(spec.left.opts.tableName, partition.segment,
        partition.totalSegments, spec.left.opts.asOfSeq)
      .flatMap { case (it0, sz) =>
        leftLimiter.acquire(sz.toDouble / spec.left.opts.bytesPerRCU * leftConsistency)
        scanned += 1
        if (!sideVisible(spec.left, leftStore, leftTtlNow)(it0)) Iterator.empty
        else {
          val l = project(it0, spec.left.cols)
          val candidates =
            if (keys.isEmpty) rightAll
            else {
              val k = keys.map { case (lc, _) => l.get(lc) }
              if (k.forall(v => v.isDefined && v != Some(AttrVal.Null)))
                rightByKey.getOrElse(k.map(_.get), Vector.empty)
              else Vector.empty
            }
          val merged = candidates.iterator
            .map(r => l ++ r)
            .filter(m => spec.cond.fold(FilterEval.eval(_, m), PredicateV2.eval(_, m)))
          // LEFT OUTER: a probe row with no surviving candidate emits
          // once, null-extended (right attrs absent → decode nulls)
          val joinedRows =
            if (!spec.outer) merged
            else if (merged.hasNext) merged
            else Iterator.single(l)
          joinedRows
            .filter(m => postFilters.forall(FilterEval.eval(_, m)) &&
              postAdv.forall(PredicateV2.eval(_, m)))
            .map { m => matched += 1; m }
        }
      }

  private var current: InternalRow = _
  private var aggEmitted = false

  override def next(): Boolean =
    if (aggs.nonEmpty) {
      // aggregate-over-join: fold this task's merged rows into ONE
      // partial row (same accumulators as the plain aggregate scan)
      if (aggEmitted) false
      else {
        val accs = AggAccs.make(aggs)
        mergedItems.foreach(m => accs.foreach(_.update(m)))
        current = InternalRow.fromSeq(accs.map(_.result).toSeq)
        aggEmitted = true
        true
      }
    } else if (mergedItems.hasNext) { current = decode(mergedItems.next()); true }
    else false

  override def get(): InternalRow = current

  override def currentMetricsValues(): Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
    Array(ScanMetrics.TaskMetric("itemsScanned", scanned),
      ScanMetrics.TaskMetric("itemsFiltered", scanned - matched))

  override def close(): Unit = ()
}
