package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.dynamo.{DynamoMaintenance, Implicits, IndexMeta, LocalKVStore}
import Implicits._

/** Store-lifecycle scale probe (round-18: the connector store was the
  * one subsystem with zero measured evidence past sf1). Measures the
  * STORE's own cost decades — seed-write throughput through the DSv2
  * write path, journal→base compaction fold, GSI create+build, base
  * scans, a GSI read, a pushed aggregate, point/range Queries through
  * the page directories, a journal burst and the merged-view reads it
  * forces, and the re-compaction that folds it — at whatever fixture
  * `SPARK_GRAFT_SF_DIR` points to, in a PRIVATE store root (never the
  * shared seeded root the oracle and the q_dyn_* keys read; the probe
  * mutates its store, the shared root must stay content-stable).
  *
  * Emits one Bench-shaped JSON line (phase name → seconds) plus store
  * file-count/byte totals (page-directory metadata growth is one of
  * the named scale risks). `tools/store_probe.sh` merges this with a
  * BenchSeq pass over the real q_dyn_* read keys.
  */
object StoreProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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

    val root = s"/tmp/graft-store-probe/${java.nio.file.Paths.get(sfDir).getFileName}"
    wipe(root)

    val phases = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    def timed[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      val s = (System.nanoTime() - t0) / 1e9
      phases(name) = s
      println(f"STOREPROBE $name%-24s $s%.2f s")
      r
    }
    // min-of-2 for READ phases (one concurrent blip must not read as a
    // scale cliff); write/maintenance phases run once — they mutate.
    def timedRead(name: String)(body: => Unit): Unit = {
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      phases(name) = ts.min
      println(f"STOREPROBE $name%-24s ${ts.map(t => f"$t%.2f").mkString(" ")} s")
    }

    val cust = Fixtures.customer(spark, sfDir)
    val custRows = cust.count()

    // ---- lifecycle: seed → fold → index ------------------------------
    timed("seed_customer_write") {
      cust.repartition(16).write.dynamo(root, "customer", "c_custkey")
    }
    // columnar-vs-row seed comparison (the q_dyn seeds route through
    // DynamoColumnarIngest since round 18 — this phase records the
    // win at probe scale): same rows into a throwaway table, scan
    // split narrowed so the parquet scan carries the parallelism
    timed("seed_customer_columnar") {
      val clone = spark.newSession()
      clone.conf.set("spark.sql.files.maxPartitionBytes",
        (8L * 1024 * 1024).toString)
      val took = graft.sources.dynamo.DynamoColumnarIngest.ingest(
        Fixtures.customer(clone, sfDir), root, "customer_col", "c_custkey")
      println(s"STOREPROBE seed_customer_columnar tookColumnar=$took")
    }
    timed("compact_fold") { DynamoMaintenance.compact(spark, root, "customer") }
    timed("gsi_build") {
      val st = new LocalKVStore(root)
      st.createIndex("customer", "by_segment",
        IndexMeta("c_mktsegment", None, Some(Seq("c_acctbal"))))
      DynamoMaintenance.buildIndex(spark, root, "customer", "by_segment")
    }
    // composite-keyed table: the Query/page-directory path needs a
    // range key — orders (hash o_custkey, range o_orderkey)
    val ords = Fixtures.orders(spark, sfDir)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    val orderRows = ords.count()
    timed("seed_orders_write") {
      ords.repartition(16)
        .write.format("dynamo")
        .option("path", root).option("tableName", "orders")
        .option("hashKey", "o_custkey").option("rangeKey", "o_orderkey")
        .mode("append").save()
    }
    timed("compact_orders_fold") { DynamoMaintenance.compact(spark, root, "orders") }

    // ---- reads over the compacted bases ------------------------------
    timedRead("scan_base") {
      Bench.materialize(spark.read.dynamo(root, "customer"))
    }
    timedRead("gsi_read") {
      Bench.materialize(
        spark.read.dynamoIndex(root, "customer", "by_segment")
          .filter(col("c_mktsegment") === "BUILDING"))
    }
    timedRead("agg_zonemap") {
      Bench.materialize(spark.read.dynamo(root, "customer")
        .agg(min("c_acctbal").as("lo"), max("c_acctbal").as("hi"),
          count(lit(1)).as("n")))
    }
    timedRead("query_hash_pin") {
      Bench.materialize(spark.read.dynamo(root, "orders")
        .filter(col("o_custkey") === 1L))
    }
    timedRead("query_range") {
      Bench.materialize(spark.read.dynamo(root, "orders")
        .filter(col("o_custkey") === 1L && col("o_orderkey") > 1000000L))
    }

    // ---- live journal: burst, merged-view reads, refold ---------------
    timed("journal_burst_write") {
      // ~2% of customers updated through the connector write path —
      // the journal the merged view must overlay
      cust.filter(col("c_custkey") % 50 === 0)
        .select(col("c_custkey"), (col("c_acctbal") + 1).as("c_acctbal"))
        .repartition(16)
        .write.dynamo(root, "customer", "c_custkey")
    }
    timedRead("scan_overlay") {
      Bench.materialize(spark.read.dynamo(root, "customer"))
    }
    timedRead("gsi_read_overlay") {
      Bench.materialize(
        spark.read.dynamoIndex(root, "customer", "by_segment")
          .filter(col("c_mktsegment") === "BUILDING"))
    }
    timed("recompact_fold") { DynamoMaintenance.compact(spark, root, "customer") }
    timedRead("scan_refolded") {
      Bench.materialize(spark.read.dynamo(root, "customer"))
    }

    val (files, bytes) = duDir(root)
    val total = phases.values.sum
    def f3(d: Double) = f"$d%.3f"
    val qs = phases.map { case (k, v) => s""""$k":${f3(v)}""" }
      .mkString("{", ",", "}")
    val line = s"""{"metric":"store_probe","value":${f3(total)},"unit":"sec","queries":$qs,""" +
      s""""sf":"$sfDir","customer_rows":$custRows,"order_rows":$orderRows,""" +
      s""""store_files":$files,"store_bytes":$bytes}"""
    sys.env.get("SPARK_GRAFT_BENCH_OUT").foreach { out =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(out), line + "\n")
    }
    println(line)
    spark.stop()
  }

  private def wipe(root: String): Unit = {
    val p = java.nio.file.Paths.get(root)
    require(root.startsWith("/tmp/graft-store-probe"),
      s"refusing to wipe non-probe root $root")
    if (java.nio.file.Files.isDirectory(p)) {
      val all = java.nio.file.Files.walk(p)
      try {
        val it = all.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .iterator()
        while (it.hasNext) java.nio.file.Files.deleteIfExists(it.next())
      } finally all.close()
    }
  }

  private def duDir(root: String): (Long, Long) = {
    val p = java.nio.file.Paths.get(root)
    var files = 0L; var bytes = 0L
    val all = java.nio.file.Files.walk(p)
    try {
      val it = all.iterator()
      while (it.hasNext) {
        val f = it.next()
        if (java.nio.file.Files.isRegularFile(f)) {
          files += 1; bytes += java.nio.file.Files.size(f)
        }
      }
    } finally all.close()
    (files, bytes)
  }
}
