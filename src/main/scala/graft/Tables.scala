package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver's synthetic TPC-H-ish parquet tables (TESTDATA.md).
  *
  * All reads go through `spark.read.parquet` so Catalyst gets native column
  * pruning + predicate pushdown into the scan. No schema inference cost:
  * parquet footers carry the schema.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = table(s, d, "lineitem")
  /** events.ts is TIMESTAMP(NANOS) parquet, which Spark rejects by default:
    * read nanos as long (legacy conf) and convert to a µs TimestampType —
    * lossless for this data (all sub-µs components are zero) and identical to
    * DuckDB's own ns→µs handling, keeping oracle parity. */
  def events(s: SparkSession, d: String): DataFrame = {
    // The nanosAsLong conf only affects schema RESOLUTION (read-path parquet
    // conversion is captured when the plan is analyzed), so set it just for
    // the duration of the read and restore the prior value — other parquet
    // reads in the session keep their default nanos handling.
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    // synchronized: the conf is session-shared, so a concurrent events()
    // (or any parquet read racing the restore window) must not observe the
    // temporary setting
    Tables.synchronized {
      val prev = s.conf.getOption(key)
      s.conf.set(key, "true")
      try table(s, d, "events")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      finally prev match {
        case Some(v) => s.conf.set(key, v)
        case None    => s.conf.unset(key)
      }
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
