package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ChecksSpec extends SparkTestBase {
  import spark.implicits._

  test("audit counts rule violations in one pass, nulls counting as failures") {
    val df = Seq(
      (1L, Some(5.0), "a"),
      (2L, Some(-1.0), "b"),   // range violation
      (3L, None, "a"),         // null value: violates the range rule too
      (4L, Some(3.0), null))   // null label: violates the label rule
      .toDF("id", "v", "label")
    val out = Checks.audit(df, Seq(
      "v_nonneg" -> (col("v") >= 0),
      "label_known" -> col("label").isin("a", "b")))
      .as[(Long, Long, Long)].head()
    assert(out == ((4L, 2L, 1L))) // n_rows, v_nonneg violations, label violations
    // one aggregation pass: a single pair of HashAggregates, no join/union
    val p = Checks.audit(df, Seq("r1" -> (col("v") >= 0),
        "r2" -> col("label").isNotNull))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join") && !p.contains("Union"), p)
  }

  test("duplicateKeys reports multiplicities above one only") {
    val df = Seq((1L, "x"), (1L, "y"), (2L, "z"), (3L, "w"), (3L, "v"), (3L, "u"))
      .toDF("k", "payload")
    val out = Checks.duplicateKeys(df, Seq("k"))
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 2L, 3L -> 3L))
  }
}
