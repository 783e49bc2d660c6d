package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Partition-pruned layout: writing a corpus partitioned by a
  * low-cardinality column (lang here; ingestion date in production) is
  * the standard way a 100 TB table avoids full scans — a filter on the
  * partition column prunes whole directories at PLANNING time, before
  * any file is opened. The spec pins both halves of the contract: the
  * scan's PartitionFilters carries the predicate (and the data filter
  * does NOT ride there), and results equal the unpartitioned read.
  */
class PartitionPruningSpec extends AnyFunSuite {
  import TestSpark._

  test("filter on the partition column prunes at planning time") {
    val dir = Files.createTempDirectory("graft-part").toString
    Fixtures.documents(spark, sf)
      .write.partitionBy("lang").mode("overwrite").parquet(dir)

    val pruned = spark.read.parquet(dir)
      .filter(col("lang") === "en" && col("n_chars") > 100)
      .select("doc_id", "lang", "n_chars")
    val plan = pruned.queryExecution.executedPlan.toString

    // the lang predicate prunes directories, the n_chars predicate
    // pushes into the parquet row groups — different mechanisms, and
    // each must land in its own slot (findFirstMatchIn, not replaceAll:
    // a no-match must FAIL, not fall through to the whole plan string)
    val partFilters = "PartitionFilters: \\[([^\\]]*)\\]".r.findFirstMatchIn(plan)
    assert(partFilters.exists(_.group(1).contains("lang")), plan)
    val pushedFilters = "PushedFilters: \\[([^\\]]*)\\]".r.findFirstMatchIn(plan)
    assert(pushedFilters.exists(_.group(1).contains("GreaterThan(n_chars,100)")), plan)

    val expected = Fixtures.documents(spark, sf)
      .filter(col("lang") === "en" && col("n_chars") > 100)
      .select("doc_id", "lang", "n_chars")
    assert(pruned.count() === expected.count())
    assert(pruned.exceptAll(expected).count() === 0)
    assert(expected.exceptAll(pruned).count() === 0)
  }
}
