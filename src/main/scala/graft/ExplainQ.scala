package graft
import org.apache.spark.sql.SparkSession

/** Dev utility: `sbt "runMain graft.ExplainQ <key>..."` prints the
  * formatted physical plan of declared queries at sf0.01 — the
  * plan-audit loop (PushedFilters/ReadSchema/exchange placement)
  * without running Verify. Same family as BenchOne/BenchSeq.
  */
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    for (k <- args) {
      println(s"===== $k =====")
      SparkEntry.queries(k)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
