package graft.sources.dynamo

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
    val shards = new LocalKVStore(path).describe(table).shards
    val parallelism = math.min(shards, spark.sparkContext.defaultParallelism)
    spark.sparkContext
      .parallelize(0 until shards, parallelism)
      .foreach(sh => new LocalKVStore(path).compactShard(table, sh))
  }
}
