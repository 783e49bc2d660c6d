package graft

import org.apache.spark.sql.SparkSession

/** Row-vs-columnar store-ingest micro-bench (the §2A columnar-write
  * measurement): loads the customer parquet fixture into the dynamo
  * store through BOTH write paths — `df.write.format("dynamo")` (row
  * writer) and [[graft.sources.dynamo.DynamoColumnarIngest]] (the
  * plan's ColumnarBatch output encoded column-at-a-time) — and prints
  * one JSON line with per-path seconds (min of reps) plus the verified
  * row counts. Fresh table names per rep; the store root is a temp
  * dir, deleted on exit. `SPARK_GRAFT_SF_DIR` selects the fixture
  * (default sf0.1).
  */
object IngestBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id) s").collect() // JVM warmup
    val root = java.nio.file.Files.createTempDirectory("graft-ingest-bench")
      .toString
    try {
    val reps = 3
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val expected = Fixtures.customer(spark, sfDir).count()
    val rowTimes = (1 to reps).map { r =>
      val df = Fixtures.customer(spark, sfDir)
      timed {
        df.write.format("dynamo").option("path", root)
          .option("tableName", s"row_$r").option("hashKey", "c_custkey")
          .mode("append").save()
      }
    }
    val colTimes = (1 to reps).map { r =>
      val df = Fixtures.customer(spark, sfDir)
      val tookColumnar = new java.util.concurrent.atomic.AtomicBoolean
      val t = timed {
        tookColumnar.set(graft.sources.dynamo.DynamoColumnarIngest
          .ingest(df, root, s"col_$r", "c_custkey"))
      }
      require(tookColumnar.get(),
        "customer fixture scan must take the columnar path")
      t
    }
    // equivalence sanity: both last tables read back the full fixture
    def count(t: String): Long =
      spark.read.format("dynamo").option("path", root)
        .option("tableName", t).load().count()
    require(count(s"row_$reps") == expected && count(s"col_$reps") == expected,
      "ingested row counts diverged from the fixture")
    def f3(d: Double) = f"$d%.3f"
    println(s"""{"metric":"ingest","unit":"sec","rows":$expected,""" +
      s""""row_write":${f3(rowTimes.min)},"columnar_ingest":${f3(colTimes.min)},""" +
      s""""row_reps":[${rowTimes.map(f3).mkString(",")}],""" +
      s""""col_reps":[${colTimes.map(f3).mkString(",")}]}""")
    } finally {
      // a failed require must not leak the multi-GB temp store or a
      // live local[32] session into the next bench
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
      spark.stop()
    }
  }
}
