package graft

import org.apache.spark.sql.SparkSession

/** Time a sequence of query keys in order with the same session shape
  * as [[Bench]] — for diagnosing order-dependent interference between
  * bench keys: `runMain graft.BenchSeq k1 k2 k3 ...` times each key
  * (2 reps) after running its predecessors, exactly like the bench.
  */
object BenchSeq {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Same default as Bench: a diagnosis run must reproduce the bench's
    // parallelism or its timings explain nothing.
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id) s").collect()
    args.foreach { key =>
      val fn = SparkEntry.queries(key)
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        Bench.materialize(fn(spark, sfDir))
        (System.nanoTime() - t0) / 1e9
      }
      println(f"BENCHSEQ $key%-24s ${times.map(t => f"$t%.2f").mkString(" ")} s")
    }
    spark.stop()
  }
}
