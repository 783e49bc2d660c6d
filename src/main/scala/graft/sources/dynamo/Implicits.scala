package graft.sources.dynamo

import scala.reflect.runtime.universe.TypeTag

import org.apache.spark.sql.{DataFrame, DataFrameReader, DataFrameWriter, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.DataStreamReader

/** Syntax mirroring the reference's public API shape
  * (`spark.read.dynamodb(t)`, `spark.read.dynamodbAs[T](t)`,
  * `df.write.dynamodb(t)`) [REF: implicits package object], with the
  * store root as an extra argument since there is no ambient AWS
  * region/endpoint in the offline environment.
  */
object Implicits {

  implicit final class DynamoReaderOps(private val reader: DataFrameReader) extends AnyVal {
    def dynamo(path: String, tableName: String): DataFrame =
      reader.format("dynamo").option("path", path).option("tableName", tableName).load()

    /** GSI read (A8) — the reference's `indexName` option. */
    def dynamoIndex(path: String, tableName: String, indexName: String): DataFrame =
      reader.format("dynamo")
        .option("path", path).option("tableName", tableName)
        .option("indexName", indexName)
        .load()

    /** Reference-spelled alias [REF: implicits — `dynamodb`]. */
    def dynamodb(path: String, tableName: String): DataFrame =
      dynamo(path, tableName)
  }

  implicit final class DynamoSessionOps(private val spark: SparkSession) extends AnyVal {
    /** Typed read: schema from the case class (no inference scan),
      * result a `Dataset[T]` — the reference's `dynamodbAs[T]` (A7).
      */
    def dynamoAs[T <: Product : TypeTag](path: String, tableName: String): Dataset[T] = {
      val enc = Encoders.product[T]
      spark.read.format("dynamo")
        .schema(enc.schema)
        .option("path", path).option("tableName", tableName)
        .load()
        .as[T](enc)
    }

    /** Reference-spelled alias [REF: implicits — `dynamodbAs[T]`]. */
    def dynamodbAs[T <: Product : TypeTag](path: String, tableName: String): Dataset[T] =
      dynamoAs[T](path, tableName)
  }

  implicit final class DynamoStreamReaderOps(private val reader: DataStreamReader) extends AnyVal {
    /** Change-feed read over the table's write journal (CDC when
      * `cdc=true`: adds a `_op` column and emits delete markers).
      */
    def dynamoStream(path: String, tableName: String, cdc: Boolean = false): DataFrame =
      reader.format("dynamo")
        .option("path", path).option("tableName", tableName)
        .option("cdc", cdc.toString)
        .load()
  }

  implicit final class DynamoWriterOps[T](private val writer: DataFrameWriter[T]) extends AnyVal {
    def dynamo(path: String, tableName: String, hashKey: String): Unit =
      writer.format("dynamo")
        .option("path", path).option("tableName", tableName).option("hashKey", hashKey)
        .mode("append")
        .save()

    /** Reference-spelled alias [REF: implicits — `dynamodb`]. */
    def dynamodb(path: String, tableName: String, hashKey: String): Unit =
      dynamo(path, tableName, hashKey)
  }
}
