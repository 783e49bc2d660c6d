package graft.sources.dynamo

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** SQL `UPDATE` and `MERGE INTO` on connector tables, as DELTA-based
  * row-level operations (`SupportsDelta`) — the natural fit for a
  * keyed item store: Spark rewrites the statement into a join against
  * the table's current rows and hands this writer only the CHANGED
  * rows tagged insert/update/delete, keyed by the primary key
  * (`rowId`). Each op then maps 1:1 onto the store's own write ops
  * (Put / Delete through the WAL), so a 100 TB `MERGE INTO` ships the
  * delta — never a rewrite of untouched data (what the group-based
  * alternative would do).
  *
  * Updates are represented as DELETE + INSERT
  * ([[DynamoRowLevelOperation.representUpdateAsDeleteAndInsert]]):
  * `UPDATE ... SET <key col> = ...` moves an item between keys — and
  * possibly shards — which a naive in-place Put would turn into a
  * silent duplicate under the old key. The split is the only correct
  * general form; for non-key updates it degenerates to
  * delete+reinsert of the same key, which the WAL's keyed replay
  * collapses.
  *
  * Commit model: unchanged (A14) — each task publishes its WAL files
  * atomically at task commit, job-level commit is a no-op, aborted
  * tasks leave nothing. A MERGE re-run after a mid-job failure
  * re-applies keyed ops and converges.
  */
final class DynamoRowLevelBuilder(
    opts: DynamoOptions, schema: StructType, info: RowLevelOperationInfo)
    extends RowLevelOperationBuilder {
  override def build(): RowLevelOperation =
    new DynamoRowLevelOperation(opts, schema, info.command())
}

final class DynamoRowLevelOperation(
    opts: DynamoOptions, schema: StructType, cmd: RowLevelOperation.Command)
    extends RowLevelOperation with SupportsDelta {

  override def command(): RowLevelOperation.Command = cmd

  /** The current-rows scan Spark joins the source statement against —
    * the ordinary scan builder, so filter/column pushdown prune it
    * like any read (a `MERGE` whose ON clause pins keys reads only
    * the owning shards).
    */
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new DynamoScanBuilder(opts, schema)

  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new DynamoDeltaWriteBuilder(opts, info.schema(),
      info.rowIdSchema().orElseThrow(() => new IllegalStateException(
        "delta write without a rowId schema")))

  override def rowId(): Array[NamedReference] = {
    val meta = new LocalKVStore(opts.path).describe(opts.tableName)
    (Seq(meta.hashKey) ++ meta.rangeKey).map(Expressions.column).toArray
  }

  // key-changing updates must move the item, not duplicate it (above)
  override def representUpdateAsDeleteAndInsert(): Boolean = true

  override def description(): String = s"dynamo:${opts.tableName} $cmd"
}

final class DynamoDeltaWriteBuilder(
    opts: DynamoOptions, rowSchema: StructType, idSchema: StructType)
    extends DeltaWriteBuilder {
  override def build(): DeltaWrite = new DynamoDeltaWrite(opts, rowSchema, idSchema)
}

final class DynamoDeltaWrite(
    opts: DynamoOptions, rowSchema: StructType, idSchema: StructType)
    extends DeltaWrite {
  override def toBatch(): DeltaBatchWrite =
    new DynamoDeltaBatchWrite(opts, rowSchema, idSchema)
  // same Spark-UI metrics as the ordinary write path
  override def supportedCustomMetrics(): Array[org.apache.spark.sql.connector.metric.CustomMetric] =
    Array(new WriteMetrics.RowsWritten, new WriteMetrics.BytesWritten)
}

final class DynamoDeltaBatchWrite(
    opts: DynamoOptions, rowSchema: StructType, idSchema: StructType)
    extends DeltaBatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DeltaWriterFactory =
    new DynamoDeltaWriterFactory(opts, rowSchema, idSchema,
      WriteSetup.ratePerWriter(opts, info.numPartitions),
      seq = System.currentTimeMillis())
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

final class DynamoDeltaWriterFactory(
    opts: DynamoOptions, rowSchema: StructType, idSchema: StructType,
    rate: Double, seq: Long)
    extends DeltaWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DeltaWriter[InternalRow] =
    new DynamoDeltaWriter(opts, rowSchema, idSchema, rate, seq, partitionId, taskId)
}

final class DynamoDeltaWriter(
    opts: DynamoOptions, rowSchema: StructType, idSchema: StructType,
    rate: Double, seq: Long, partitionId: Int, taskId: Long)
    extends DeltaWriter[InternalRow] {

  private val store = new LocalKVStore(opts.path)
  // id rows carry exactly Spark's rowId projection (the declared key
  // columns, typed from the relation); full rows carry the write schema
  private val encodeKey = Codec.rowWriter(idSchema)
  private val encodeRow = Codec.rowWriter(rowSchema)
  private val limiter = new RateLimiter(rate)
  private val wal = store.walWriter(opts.tableName, seq, f"p$partitionId%05d-t$taskId")

  private val buffer = new scala.collection.mutable.ArrayBuffer[store.Op](opts.writeBatchSize)
  private var rows = 0L
  private var bytes = 0L

  private def push(op: store.Op): Unit = {
    buffer += op
    rows += 1
    if (buffer.size >= opts.writeBatchSize) flush()
  }

  override def delete(metadata: InternalRow, id: InternalRow): Unit =
    push(store.Delete(encodeKey(id)))

  override def insert(row: InternalRow): Unit =
    push(store.Put(encodeRow(row)))

  // not reached with representUpdateAsDeleteAndInsert = true, but a
  // full-row Put is the correct non-key-changing fallback regardless
  override def update(metadata: InternalRow, id: InternalRow, row: InternalRow): Unit =
    push(store.Put(encodeRow(row)))

  private def flush(): Unit = {
    if (buffer.nonEmpty) {
      var batchBytes = 0L
      buffer.foreach { op =>
        wal.append(op)
        batchBytes += ItemJson.write(op.item).length
      }
      wal.flush()
      limiter.acquire(math.max(1.0, batchBytes.toDouble / opts.bytesPerWCU))
      bytes += batchBytes
      buffer.clear()
    }
  }

  override def commit(): WriterCommitMessage = {
    flush(); wal.close(); DynamoWriterCommit(rows)
  }
  override def abort(): Unit = wal.abort()
  override def close(): Unit = ()

  override def currentMetricsValues(): Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
    Array(ScanMetrics.TaskMetric("rowsWritten", rows),
      ScanMetrics.TaskMetric("bytesWritten", bytes))
}
