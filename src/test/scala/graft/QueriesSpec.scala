package graft

import org.apache.spark.sql.functions._

/** Driver-contract checks: every declared query analyzes and runs at
  * sf0.001, oracle keys align, entry smoke passes. (The value-level oracle
  * compare runs in the driver's t2 gate / scripts/parity.py.) */
class QueriesSpec extends SparkTestBase {

  test("entry returns top-20 customers with positive revenue") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.length == 20)
    assert(rows.forall(_.getAs[Double]("revenue") > 0))
  }

  test("oracle keys are a subset of query keys") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    assert(SparkEntry.queries.size >= 48)
  }

  test("every declared query executes at sf0.001 with rows >= 0 and stable schema") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val df = fn(spark, sf0001)
        assert(df.schema.nonEmpty)
        // systemic plan invariant: no query may fall into a non-broadcast
        // cartesian product (the one join shape that cannot survive any
        // scale-up; 1-row stats cross joins plan as BroadcastNestedLoop
        // and are fine)
        val plan = df.queryExecution.executedPlan.toString
        assert(!plan.contains("CartesianProduct"),
          s"$name plans a CartesianProduct:\n$plan")
        df.count()
        None
      } catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("; "))
  }

  test("queries with oracles produce at least one output row at sf0.001, except pair queries") {
    // near-dup pair queries may legitimately be empty on tiny corpora
    val mayBeEmpty = Set("q42_ngram_jaccard", "q43_minhash_lsh", "q21_anti_join", "q25_except")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val n = fn(spark, sf0001).count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("dense reindex query output is a contiguous 0..N-1 range") {
    val out = SparkEntry.queries("q17_dense_reindex")(spark, sf0001)
      .select(col("partkey_order")).as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().sorted
    assert(out.toSeq == out.indices.map(_.toLong))
  }
}
