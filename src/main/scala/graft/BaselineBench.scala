package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reproducible BASELINE harness (BASELINE.md): vanilla Spark 4.1.2
  * executing the reference workload's logical queries DIRECTLY over
  * the parquet fixtures — deliberately independent of the graft query
  * modules, written as a user would write them — measured with the
  * EXACT harness shape `graft.Bench` uses (local[4], shuffle=4,
  * checksum materialization, min of `SPARK_GRAFT_BENCH_REPS` reps),
  * so BENCH-vs-BASELINE ratios compare work, not harness.
  */
object BaselineBench {

  private def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Same codegen compile-cache sizing as graft.Bench (round 19,
      // r18 verdict item 8): the baseline is min-of-reps too, so it
      // pays the same default-100-entry Janino recompile tax the graft
      // harness stopped paying in round 18 — leaving it stock would
      // make the bench-vs-baseline ratio measure harness config
      // asymmetry instead of query shape.
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id) s").collect()
    spark.read.parquet(s"$sfDir/nation.parquet")
      .groupBy("n_regionkey").count().collect()

    def p(name: String): DataFrame = spark.read.parquet(s"$sfDir/$name.parquet")
    // ts has shipped as nanos-as-long AND as native micros across
    // testdata generations — normalize like Fixtures.events does.
    def events: DataFrame = {
      val raw = p("events")
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        case _ => raw.withColumn("ts", col("ts").cast("timestamp"))
      }
    }

    val lineitem = p("lineitem")
    val orders = p("orders")

    val queries: Seq[(String, () => DataFrame)] = Seq(
      "scan_count" -> (() => p("nation").orderBy("n_nationkey")),
      "filter_scan" -> (() => lineitem
        .filter(col("l_shipdate") >= lit("1998-06-01").cast("timestamp") &&
                col("l_discount") > 0.05)
        .orderBy("l_orderkey", "l_linenumber")),
      "pricing_agg_q1" -> (() => lineitem
        .groupBy("l_returnflag", "l_linestatus")
        .agg(round(sum("l_quantity"), 2).as("sum_qty"),
             round(sum("l_extendedprice"), 2).as("sum_base_price"),
             round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
             round(avg("l_quantity"), 2).as("avg_qty"),
             round(avg("l_extendedprice"), 2).as("avg_price"),
             round(avg("l_discount"), 4).as("avg_disc"),
             count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),
      "join_3way_agg" -> (() => lineitem
        .join(orders, col("l_orderkey") === col("o_orderkey"))
        .join(p("customer"), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
             count(lit(1)).as("n"))
        .orderBy("c_mktsegment")),
      "window_topk" -> (() => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        orders.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
          .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
          .orderBy("o_custkey", "rn")
      }),
      "sort_limit" -> (() => orders
        .select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey")).limit(100)),
      "events_tumbling" -> (() => events
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sum_val"))
        .select(col("window.start").as("win_start"), col("event_type"),
                col("cnt"), col("sum_val"))
        .orderBy("win_start", "event_type")),
      "distinct_users" -> (() => events
        .groupBy("event_type").agg(countDistinct("user_id").as("n_users"))
        .orderBy("event_type")),
      "session_gap" -> (() => events
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("user_id"), col("session_window.start").as("sess_start"),
                col("session_window.end").as("sess_end"), col("cnt"))
        .orderBy("user_id", "sess_start")),
      "cosine_topk" -> (() => {
        val e = p("embeddings").filter(col("vec_id") < 200)
          .select(col("vec_id"),
                  transform(col("embedding"), _.cast("double")).as("emb"))
          .withColumn("nrm", sqrt(dot(col("emb"), col("emb"))))
        val a = e.select(col("vec_id").as("id1"), col("emb").as("ea"), col("nrm").as("na"))
        val b = e.select(col("vec_id").as("id2"), col("emb").as("eb"), col("nrm").as("nb"))
        a.join(b, col("id1") < col("id2"))
          .select(col("id1"), col("id2"),
                  round(dot(col("ea"), col("eb")) / (col("na") * col("nb")), 4).as("cosine"))
          .orderBy(col("cosine").desc, col("id1"), col("id2")).limit(10)
      }),
      "token_counts" -> (() => p("documents")
        .select(explode(split(col("text"), " ")).as("token"))
        .groupBy("token").agg(count(lit(1)).as("cnt")).orderBy("token")))

    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt
    // Same failure discipline as Bench: a broken query surfaces in
    // "errors" rather than benching at ~0 s.
    val results = queries.map { case (name, fn) =>
      var firstErr: Option[String] = None
      val ok = (1 to reps).flatMap { _ =>
        val t0 = System.nanoTime()
        try { Bench.materialize(fn()); Some((System.nanoTime() - t0) / 1e9) }
        catch { case e: Throwable =>
          if (firstErr.isEmpty)
            firstErr = Some(s"${e.getClass.getName}: ${String.valueOf(e.getMessage).take(200)}")
          None
        }
      }
      (name, ok.minOption, firstErr)
    }
    // Same esc rules as Bench.scala: multi-line Spark analysis errors
    // must not break the one-line JSON contract.
    def esc(s: String): String =
      s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
                  case c if c < ' ' => " "; case c => c.toString }
    val qs = results.collect { case (k, Some(v), _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, None, Some(e)) =>
      s"\"" + k + "\":\"" + esc(e) + "\"" }
      .mkString("{", ",", "}")
    val total = results.flatMap(_._2).sum
    println(s"""{"metric":"baseline_total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
