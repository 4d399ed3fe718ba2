package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` carries one entry per implemented operator from SURVEY.md §2
  * (definitions live in [[Queries]] / [[PipelineQueries]]); `oracleSql` the
  * equivalent DuckDB SQL for the driver's hash-compare at sf0.01.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001 (driver smoke-checks rows>0):
    * top-20 customers by lineitem revenue with names — scan → fact-fact join
    * → broadcast dim join → hash agg → TakeOrderedAndProject, the minimum
    * end-to-end slice of SURVEY.md §7.3. */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    Tables.lineitem(spark, d)
      .join(Tables.orders(spark, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(spark, d)), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("c_custkey").asc)
      .limit(20)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on the
    * same parquet tables. Omitted for non-SQL-expressible ops (xxhash64-based
    * sketches) → driver records a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    Queries.all.flatMap(q => q.oracle.map(o => q.name -> o)).toMap

  /** Phase decomposition (build / delete / probe) of the store-backed
    * queries, for the bench's per-phase timings — see
    * [[PipelineQueries.phases]]. */
  def queryPhases: Map[String, Seq[(String, PipelineQueries.Phase)]] =
    PipelineQueries.phases
}
