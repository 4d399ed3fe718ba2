package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality auditing — the pipeline-health gate a corpus run executes
  * before publishing a table (null rates, range violations, key
  * uniqueness). ALL declared rules evaluate in ONE map-side-partial
  * aggregation pass over the table: each rule is a `count(when(...))`
  * conditional aggregate, so auditing N rules costs the same single scan
  * as auditing one — never one job per rule. */
object Checks {

  /** One row: `n_rows` plus a violation count per named rule. A rule's
    * predicate states what MUST hold; rows where it is false OR NULL
    * count as violations (a null verdict is a failure, not a pass —
    * `coalesce(pred, false)`). */
  def audit(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "rules must be non-empty")
    require(rules.map(_._1).distinct.size == rules.size, "rule names must be unique")
    require(!rules.exists(_._1 == "n_rows"),
      "rule name n_rows collides with the built-in row-count column")
    val aggs = rules.map { case (name, pred) =>
      count(when(!coalesce(pred, lit(false)), 1)).as(name)
    }
    df.agg(count(lit(1)).as("n_rows"), aggs: _*)
  }

  /** Duplicate-key audit: one row per key value occurring more than once,
    * with its multiplicity — the uniqueness check `audit` can't express
    * as a row predicate. One hash aggregation on the key. */
  def duplicateKeys(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_copies"))
      .filter(col("n_copies") > 1)
  }
}
