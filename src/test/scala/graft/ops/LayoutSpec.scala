package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import java.nio.file.Files

class LayoutSpec extends SparkTestBase {
  import spark.implicits._

  private def scanOf(df: org.apache.spark.sql.DataFrame): FileSourceScanExec = {
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    plan.collectFirst { case s: FileSourceScanExec => s }.get
  }

  test("writePartitioned layout prunes partitions at the scan for a partition-column filter") {
    val dir = Files.createTempDirectory("layout_part").toString
    val events = graft.Tables.events(spark, sf0001)
    Layout.writePartitioned(events, dir, Seq("event_type"))

    val back = spark.read.parquet(dir)
    val filtered = back.filter(col("event_type") === "purchase")
    val scan = scanOf(filtered)
    assert(scan.partitionFilters.nonEmpty,
      s"expected partition filters on the scan:\n$scan")
    // pruning happened at listing time: only the purchase directory is read
    val nSelected = scan.selectedPartitions.partitionCount
    assert(nSelected == 1, s"expected 1 selected partition, got $nSelected")
    assert(filtered.count() ==
      events.filter(col("event_type") === "purchase").count())
  }

  test("overwritePartitions rewrites only the partitions present in the new data") {
    val dir = Files.createTempDirectory("layout_dyn").toString
    val v1 = Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30))
      .toDF("id", "part", "v")
    Layout.writePartitioned(v1, dir, Seq("part"))

    // refresh ONLY partition b with new content
    val v2 = Seq((9L, "b", 99)).toDF("id", "part", "v")
    Layout.overwritePartitions(v2, dir, Seq("part"))

    val back = spark.read.parquet(dir)
      .select("id", "part", "v").as[(Long, String, Int)].collect().toSet
    assert(back == Set((1L, "a", 10), (9L, "b", 99), (3L, "c", 30)))

    // conf restored (the helper must not leak dynamic mode into the session)
    assert(spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
      .equalsIgnoreCase("static"))
  }
}
