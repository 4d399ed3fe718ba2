package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

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

  /** Normalize a resolved `ts` column to µs TimestampType, branching on the
    * type the parquet footer actually resolved to — the ONE place every
    * events consumer (batch and streaming) gets its timestamp semantics:
    *
    *   - TimestampType:    already the contract type — pass through.
    *   - TimestampNTZType: parquet timestamp[us/ms] with isAdjustedToUTC =
    *     false. Cast to TimestampType; under a UTC session timezone (Verify
    *     + all specs) the cast is a pure re-tag, matching DuckDB's NTZ
    *     handling.
    *   - LongType: bare INT64 nanos (what the nanosAsLong legacy conf
    *     resolves TIMESTAMP(NANOS) to) — integer-divide to µs, lossless for
    *     this data (sub-µs components are zero; same ns→µs truncation
    *     DuckDB applies).
    */
  private def normalizeTs(df: DataFrame, tsType: DataType, where: String): DataFrame =
    tsType match {
      case TimestampType    => df
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case other =>
        throw new IllegalStateException(s"events.ts: unsupported type $other in $where")
    }

  /** events.ts has shipped in several physical parquet encodings across
    * testdata generations (TIMESTAMP(NANOS), timestamp[us] without timezone,
    * tz-adjusted timestamps). Sniff the RESOLVED schema of the file and
    * normalize every form to a µs TimestampType ([[normalizeTs]]) so
    * downstream queries see one stable type regardless of which generation
    * of files is on disk. Spark rejects TIMESTAMP(NANOS) outright unless
    * `spark.sql.legacy.parquet.nanosAsLong` is set, so a failed plain read
    * falls back to reading nanos-as-long and converting. */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw =
      try Some(table(s, d, "events"))
      catch { case _: Exception => None } // TIMESTAMP(NANOS) footer → rejected
    raw match {
      case Some(df) => normalizeTs(df, df.schema("ts").dataType, d)
      case None =>
        // nanos path: the legacy conf only affects schema RESOLUTION (the
        // conversion is captured at analysis), so set it just for the read
        // and restore. synchronized: the conf is session-shared, and a
        // concurrent parquet read racing the restore window must not observe
        // the temporary setting.
        val key = "spark.sql.legacy.parquet.nanosAsLong"
        Tables.synchronized {
          val prev = s.conf.getOption(key)
          s.conf.set(key, "true")
          try normalizeTs(table(s, d, "events"), LongType, d)
          finally prev match {
            case Some(v) => s.conf.set(key, v)
            case None    => s.conf.unset(key)
          }
        }
    }
  }

  /** Streaming twin of [[events]]: a file-source stream over the parquet
    * files in `dataDir` with the same schema-adaptive ts normalization. The
    * file stream source requires an explicit schema, so the footer schema is
    * sniffed with a one-off batch read of the same directory, then the
    * stream is built against it.
    *
    * Legacy TIMESTAMP(NANOS) files need `spark.sql.legacy.parquet
    * .nanosAsLong` alive for every micro-batch, not just analysis — on that
    * fallback path the conf is SET AND LEFT SET on the session (documented
    * side effect; it only affects nanos columns, which no other table
    * carries). */
  def eventsStream(s: SparkSession, dataDir: String): DataFrame = {
    val resolved =
      try Some(s.read.parquet(dataDir).schema)
      catch { case _: Exception => None } // TIMESTAMP(NANOS) footer → rejected
    resolved match {
      case Some(schema) =>
        normalizeTs(s.readStream.schema(schema).parquet(dataDir),
          schema("ts").dataType, dataDir)
      case None =>
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val schema = s.read.parquet(dataDir).schema // ts now resolves LONG
        normalizeTs(s.readStream.schema(schema).parquet(dataDir),
          schema("ts").dataType, dataDir)
    }
  }

  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
