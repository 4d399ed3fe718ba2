package graft.ingest

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

/** Contract test for `Tables.events` schema adaptivity (round-6 verdict item 7).
  *
  * The driver has regenerated `/root/testdata` with different physical
  * encodings for `events.ts` across rounds (TIMESTAMP(NANOS) in rounds 1-5,
  * timestamp[us] isAdjustedToUTC=false — i.e. TimestampNTZ — in round 6+).
  * A loader pinned to one encoding silently killed 24 queries when the files
  * changed underneath it; this spec writes one fixture per encoding Spark can
  * produce and asserts the loader returns the SAME TimestampType frame from
  * each, so the next regeneration cannot break ingestion undetected.
  *
  * (The TIMESTAMP(NANOS) form itself cannot be written by Spark — its writer
  * only emits µs — so that branch is covered by the LongType fixture, which
  * exercises the identical ns→µs arithmetic the nanosAsLong read resolves to.)
  */
class EventsSchemaSpec extends SparkTestBase {

  private def withTempDir(f: String => Unit): Unit = {
    val dir = Files.createTempDirectory("events-schema").toFile
    try f(dir.getAbsolutePath)
    finally {
      def rm(d: java.io.File): Unit = {
        Option(d.listFiles()).foreach(_.foreach(rm)); d.delete(); ()
      }
      rm(dir)
    }
  }

  // three rows, µs-precision instants, plus the non-ts payload columns the
  // real events table carries a subset of
  private val base = {
    import spark.implicits._
    Seq(
      (1L, "click", 1704067200000001L), // 2024-01-01T00:00:00.000001Z in µs
      (2L, "view", 1704067260500000L),
      (3L, "click", 1704153600000000L))
      .toDF("event_id", "kind", "us")
  }

  private def canonical(df: org.apache.spark.sql.DataFrame): Seq[(Long, String, Long)] = {
    assert(df.schema("ts").dataType == TimestampType, df.schema.treeString)
    df.select(col("event_id"), col("kind"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq.sorted
  }

  private val expected =
    Seq((1L, "click", 1704067200000001L), (2L, "view", 1704067260500000L),
        (3L, "click", 1704153600000000L))

  test("events loader normalizes TimestampType, TimestampNTZType and nanos-long to one frame") {
    withTempDir { tzDir =>
      withTempDir { ntzDir =>
        withTempDir { longDir =>
          // tz-adjusted µs timestamp (Spark's default writer output)
          base.withColumn("ts", timestamp_micros(col("us"))).drop("us")
            .write.mode("overwrite").parquet(s"$tzDir/events.parquet")
          // timestamp[us] isAdjustedToUTC=false — the round-6 testdata form
          base.withColumn("ts", timestamp_micros(col("us")).cast(TimestampNTZType)).drop("us")
            .write.mode("overwrite").parquet(s"$ntzDir/events.parquet")
          // bare INT64 nanos — what nanosAsLong resolves TIMESTAMP(NANOS) to
          base.withColumn("ts", col("us") * 1000L).drop("us")
            .write.mode("overwrite").parquet(s"$longDir/events.parquet")

          val fromTz   = canonical(Tables.events(spark, tzDir))
          val fromNtz  = canonical(Tables.events(spark, ntzDir))
          val fromLong = canonical(Tables.events(spark, longDir))

          assert(fromTz == expected)
          assert(fromNtz == expected)
          assert(fromLong == expected)
        }
      }
    }
  }

  test("events loader reads the current testdata with a TimestampType ts") {
    val df = Tables.events(spark, sf0001)
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.limit(1).count() == 1)
  }
}
