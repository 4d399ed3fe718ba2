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

  test("writeRangeSorted yields near-disjoint per-file key ranges (data-skipping layout)") {
    val dir = Files.createTempDirectory("layout_range").toString
    val events = graft.Tables.events(spark, sf0001)
    Layout.writeRangeSorted(events, dir, "user_id", nFiles = 8)

    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getAbsolutePath)
    assert(files.length > 1, "expected multiple range files")
    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min(col("user_id")), max(col("user_id"))).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    // consecutive files don't interleave: file i's max <= file i+1's min
    // (boundary ties allowed — range partitioning puts equal keys together,
    // so in fact the ranges are fully disjoint for a key with many values)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(hi <= lo2, s"overlap: $hi > $lo2")
      case _ =>
    }
    // the layout actually narrows per-file spans vs the global span
    val (gMin, gMax) = (ranges.map(_._1).min, ranges.map(_._2).max)
    val avgSpan = ranges.map { case (lo, hi) => hi - lo }.sum.toDouble / ranges.length
    assert(avgSpan < (gMax - gMin) / 2.0,
      s"files span too wide for skipping: avg=$avgSpan global=${gMax - gMin}")
    // and nothing was lost
    assert(spark.read.parquet(dir).count() == events.count())
  }

  test("compact merges small files shuffle-free and preserves every row") {
    val dir = Files.createTempDirectory("layout_compact").toString + "/data"
    val events = graft.Tables.events(spark, sf0001)
    events.repartition(16).write.parquet(dir) // 16 slivers
    val before = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(before == 16)
    val expected = events.count()

    val plan = spark.read.parquet(dir).coalesce(2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"coalesce must not shuffle:\n$plan")

    Layout.compact(spark, dir, targetFiles = 2)
    val after = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(after == 2, s"expected 2 files after compaction, got $after")
    assert(spark.read.parquet(dir).count() == expected)
    // no temp/backup directories left behind
    val parent = new java.io.File(dir).getParentFile.listFiles().map(_.getName)
    assert(!parent.exists(_.contains("__compact")), parent.mkString(","))
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

  test("exportTrainingShards: deterministic layout, one file per shard, manifest verifies the read") {
    val dir = Files.createTempDirectory("layout_shards").toString
    val docs = graft.Tables.documents(spark, sf0001)
      .select("doc_id", "lang", "text")
    val n = 4
    val manifest = Layout.exportTrainingShards(docs, "doc_id",
      TextOps.wsTokenCount(col("text")), n, dir)
      .as[(Int, Long, Long, Long, Long, Long)].collect().toSeq

    // every row survives the write, with its manifest-declared shard
    val back = spark.read.parquet(dir)
    assert(back.count() == docs.count())
    val backByShard = back.groupBy(col("shard"))
      .count().as[(Int, Long)].collect().toMap
    assert(manifest.map(m => m._1 -> m._2).toMap == backByShard)
    // the read-back shard column equals the replayable assignment
    assert(back.filter(
      col("shard") =!= TextOps.shardAssign(col("doc_id"), n)).count() == 0)

    // routing: each shard directory holds exactly ONE data file (one task
    // owns each shard) — no nTasks × nShards sliver explosion
    for (m <- manifest) {
      val files = new java.io.File(s"$dir/shard=${m._1}").listFiles()
        .count(_.getName.endsWith(".parquet"))
      assert(files == 1, s"shard ${m._1}: expected 1 file, got $files")
    }

    // manifest checksums verify an independent read of the shard dirs
    val readManifest = Layout.shardManifest(
      back.drop("shard"), "doc_id", TextOps.wsTokenCount(col("text")), n)
      .as[(Int, Long, Long, Long, Long, Long)].collect().toSeq
    assert(readManifest == manifest)
    // ... and the assignment is partition-layout independent
    val reManifest = Layout.shardManifest(
      docs.repartition(7), "doc_id", TextOps.wsTokenCount(col("text")), n)
      .as[(Int, Long, Long, Long, Long, Long)].collect().toSeq
    assert(reManifest == manifest)
  }

  test("mortonKey16 interleaves bits exactly (hand values)") {
    def z(a: Long, b: Long): Long =
      Seq((a, b)).toDF("a", "b")
        .select(Layout.mortonKey16(col("a"), col("b")).as("z")).head().getLong(0)
    // x=0b11 -> even positions 0b101 = 5; y=0b101 -> odd positions
    // 0b100010 = 34; interleaved 39
    assert(z(3L, 5L) == 39L)
    assert(z(0L, 0L) == 0L)
    assert(z(65535L, 0L) == 0x55555555L) // all even bits
    assert(z(0L, 65535L) == 0xAAAAAAAAL) // all odd bits
    assert(z(65535L, 65535L) == 0xFFFFFFFFL)
  }

  test("writeZOrdered narrows per-file spans on BOTH dimensions; range sort on one") {
    // uniform 64 x 64 grid: ideal Z layout with 16 files puts each file
    // in ~one quadrant-of-quadrant (x and y spans ~ global/4 each)
    val n = 64
    val grid = (0 until n * n).map(i => (i / n * 100L, i % n * 100L)).toDF("x", "y")
    val zdir = Files.createTempDirectory("layout_z").toString
    val rdir = Files.createTempDirectory("layout_r").toString
    Layout.writeZOrdered(grid, zdir, "x", "y", nFiles = 16)
    Layout.writeRangeSorted(grid, rdir, "x", nFiles = 16)

    def avgSpan(dir: String, c: String): Double = {
      val spans = new java.io.File(dir).listFiles().toSeq
        .filter(_.getName.endsWith(".parquet"))
        .map { f =>
          val r = spark.read.parquet(f.getAbsolutePath)
            .agg(min(col(c)), max(col(c))).head()
          r.getLong(1) - r.getLong(0)
        }
      assert(spans.length > 1, s"expected multiple files in $dir")
      spans.sum.toDouble / spans.length
    }
    val global = (n - 1) * 100.0
    // Z layout: BOTH dimensions skip (file boundaries straddling curve
    // quadrants keep the average above the ideal 0.25 — 0.6 is the
    // robust bound)
    assert(avgSpan(zdir, "x") <= 0.6 * global)
    assert(avgSpan(zdir, "y") <= 0.6 * global)
    // single-column range sort: x narrow, y spans ~the whole range in
    // every file — the access pattern Z-order exists to fix
    assert(avgSpan(rdir, "x") <= 0.25 * global)
    assert(avgSpan(rdir, "y") >= 0.8 * global)
    assert(avgSpan(zdir, "y") < avgSpan(rdir, "y"))
    // the layout key is dropped: schema and content are untouched
    val back = spark.read.parquet(zdir)
    assert(back.columns.toSeq == Seq("x", "y"))
    assert(back.count() == n * n)
  }
}
