package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // steady-state measurement: first execution of each query is dominated
    // by JVM JIT + whole-stage-codegen compilation (measured 2-3x the warm
    // time), so run once uncounted, then time the second execution. A query
    // that throws is recorded as failed (time -1, listed in "failed") — NOT
    // timed as if its fast-fail wall time were a result.
    val failed = scala.collection.mutable.ArrayBuffer[String]()
    // SPARK_GRAFT_ONLY=q54_dup_clusters,q42_ngram_jaccard — local profiling
    // aid; unset (the driver's mode) runs the full suite
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    // drop state an execution left behind (persisted frames, checkpoint
    // RDDs) and nudge a GC — run BETWEEN executions, outside the timers,
    // so each timed run pays its own persists (as a driver cold run would)
    // but not the previous execution's leftovers: queries with per-round
    // localCheckpoints were measured 2-3x slower on their second timed run
    // purely from accumulated memory-store pressure
    def cleanup(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      System.gc()
    }
    // materialize via the no-op DSv2 sink, NOT count(): count() lets
    // Catalyst prune every unreferenced column, and for a query whose last
    // operator is a left join against an aggregated (unique-key) subtree
    // the ENTIRE compute collapses to a bare row-count scan (q113 measured
    // 0.3 s at both 1x and 10x — it was benching the parquet footer). The
    // noop write forces every output column through the full plan, which
    // is what any real consumer of the query pays.
    def run(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    val results = selected.map { case (name, fn) =>
      try {
        run(fn(spark, sfDir)) // warm-up (JIT + codegen)
        // min of 2 timed runs: the host is shared, and a transient load
        // spike during a single timed run was measured to inflate one query
        // 8x — min-of-k is the standard steady-state estimator for that
        val t = (0 until 2).map { _ =>
          cleanup()
          val t0 = System.nanoTime()
          run(fn(spark, sfDir))
          (System.nanoTime() - t0) / 1e9
        }.min
        name -> t
      } catch {
        case e: Throwable =>
          failed += name
          System.err.println(s"BENCH FAIL $name: ${e.getClass.getName}: ${e.getMessage}")
          name -> -1.0
      } finally {
        // isolate queries: Spark's ContextCleaner only reclaims shuffle
        // files / broadcasts when the JVM collects their references, and
        // 79 queries x 3 executions otherwise accumulate enough driver
        // state that late-suite queries were measured 5-10x slower from GC
        // pressure
        cleanup()
      }
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val fl = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$fl,"sf":"$sfDir"}"""
    println(line)
    // the driver's artifact truncates long stdout tails, which has left the
    // per-query map unauditable in past rounds — persist the identical JSON
    // line to a file as the durable record (overridable for local runs)
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/root/repo/BENCH_FULL.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (line + "\n").getBytes("UTF-8"))
    catch { case e: Exception =>
      System.err.println(s"BENCH: could not write $out: ${e.getMessage}") }
    spark.stop()
  }
}
