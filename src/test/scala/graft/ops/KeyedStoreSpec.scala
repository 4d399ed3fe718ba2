package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class KeyedStoreSpec extends SparkTestBase {
  import spark.implicits._

  private def storePath(name: String): String =
    new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), name).toString

  private def state(path: String, asOf: Option[Long] = None): Set[(Long, Long, String, Double)] =
    KeyedStore.readLatest(spark, path, asOf)
      .select($"id", $"batch", $"name", $"score")
      .as[(Long, Long, String, Double)].collect().toSet

  /** batches: 0 = insert {1,2,3}; 1 = update 2, insert 4; 2 = delete {1,4};
    * 3 = re-insert 1. */
  private def build(path: String): Unit = {
    KeyedStore.dropKeyedStore(spark, path)
    KeyedStore.writeKeyedBatch(
      Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0))
        .toDF("k", "name", "score"), "k", path, 0L)
    KeyedStore.writeKeyedBatch(
      Seq((2L, "b2", 2.5), (4L, "d", 4.0)).toDF("k", "name", "score"),
      "k", path, 1L)
    KeyedStore.deleteKeyedBatch(Seq(1L, 4L, 99L).toDF("k"), "k", path, 2L)
    KeyedStore.writeKeyedBatch(
      Seq((1L, "a3", 1.5)).toDF("k", "name", "score"), "k", path, 3L)
  }

  private val finalState = Set(
    (1L, 3L, "a3", 1.5), (2L, 1L, "b2", 2.5), (3L, 0L, "c", 3.0))

  test("latest-wins fold: upsert, update, delete, re-insert") {
    val p = storePath("ks_basic")
    build(p)
    assert(state(p) == finalState)
  }

  test("snapshot reads replay any prefix of the log") {
    val p = storePath("ks_asof")
    build(p)
    assert(state(p, Some(0L)) == Set(
      (1L, 0L, "a", 1.0), (2L, 0L, "b", 2.0), (3L, 0L, "c", 3.0)))
    assert(state(p, Some(1L)) == Set(
      (1L, 0L, "a", 1.0), (2L, 1L, "b2", 2.5), (3L, 0L, "c", 3.0),
      (4L, 1L, "d", 4.0)))
    // deletes applied at 2; the 99 delete (never inserted) is a no-op
    assert(state(p, Some(2L)) == Set(
      (2L, 1L, "b2", 2.5), (3L, 0L, "c", 3.0)))
    assert(state(p, Some(3L)) == finalState)
  }

  test("replaying a failed batch is idempotent (overwrite, not append)") {
    val p = storePath("ks_replay")
    build(p)
    KeyedStore.writeKeyedBatch(
      Seq((2L, "b2", 2.5), (4L, "d", 4.0)).toDF("k", "name", "score"),
      "k", p, 1L)
    KeyedStore.deleteKeyedBatch(Seq(1L, 4L, 99L).toDF("k"), "k", p, 2L)
    assert(state(p) == finalState)
  }

  test("compaction preserves every readable state and trims history loudly") {
    val p = storePath("ks_compact")
    build(p)
    val before = state(p)
    KeyedStore.compactKeyedStore(spark, p, upTo = 2L)
    assert(KeyedStore.currentBase(spark, p).contains((1L, 2L)))
    assert(state(p) == before)
    // snapshot at and above the horizon still answers
    assert(state(p, Some(2L)) == Set((2L, 1L, "b2", 2.5), (3L, 0L, "c", 3.0)))
    assert(state(p, Some(3L)) == finalState)
    // below the horizon: trimmed, loud
    val e = intercept[IllegalArgumentException](state(p, Some(1L)))
    assert(e.getMessage.contains("compaction horizon"))
    // second compaction folds the remaining batch onto the new base
    KeyedStore.compactKeyedStore(spark, p, upTo = 3L)
    assert(KeyedStore.currentBase(spark, p).contains((2L, 3L)))
    assert(state(p) == finalState)
  }

  test("a stale folded batch dir left by a crashed compaction is ignored") {
    val p = storePath("ks_crash")
    build(p)
    KeyedStore.compactKeyedStore(spark, p, upTo = 2L)
    // simulate the crash window: the folded batch=1 dir reappears (publish
    // succeeded, reclamation did not) with CONFLICTING old content
    KeyedStore.writeKeyedBatch(
      Seq((2L, "stale", -1.0), (4L, "stale", -1.0)).toDF("k", "name", "score"),
      "k", p, 1L)
    assert(state(p) == finalState)
    assert(state(p, Some(2L)) == Set((2L, 1L, "b2", 2.5), (3L, 0L, "c", 3.0)))
  }

  test("payload schema drift is rejected at write time") {
    val p = storePath("ks_drift")
    KeyedStore.dropKeyedStore(spark, p)
    KeyedStore.writeKeyedBatch(
      Seq((1L, "a", 1.0)).toDF("k", "name", "score"), "k", p, 0L)
    // renamed column
    val e1 = intercept[IllegalArgumentException] {
      KeyedStore.writeKeyedBatch(
        Seq((2L, "b", 2.0)).toDF("k", "label", "score"), "k", p, 1L)
    }
    assert(e1.getMessage.contains("drifts from the store schema"))
    // retyped column
    val e2 = intercept[IllegalArgumentException] {
      KeyedStore.writeKeyedBatch(
        Seq((2L, "b", 2)).toDF("k", "name", "score"), "k", p, 1L)
    }
    assert(e2.getMessage.contains("drifts"))
  }

  test("liveLogBatches counts only post-horizon batches") {
    val p = storePath("ks_loglen")
    build(p)
    assert(KeyedStore.liveLogBatches(spark, p) == 4L)
    KeyedStore.compactKeyedStore(spark, p, upTo = 2L)
    assert(KeyedStore.liveLogBatches(spark, p) == 1L)
    KeyedStore.compactKeyedStore(spark, p, upTo = 3L)
    assert(KeyedStore.liveLogBatches(spark, p) == 0L)
  }

  test("duplicate ids within a batch are rejected loudly") {
    val p = storePath("ks_dup")
    KeyedStore.dropKeyedStore(spark, p)
    val e = intercept[IllegalArgumentException] {
      KeyedStore.writeKeyedBatch(
        Seq((1L, "a", 1.0), (1L, "b", 2.0)).toDF("k", "name", "score"),
        "k", p, 0L)
    }
    assert(e.getMessage.contains("one row per id per batch"))
  }

  test("NULL id fails the write job (in-flight assert)") {
    val p = storePath("ks_null")
    KeyedStore.dropKeyedStore(spark, p)
    val df = Seq(("1", "a", 1.0), (null, "b", 2.0)).toDF("k", "name", "score")
    val e = intercept[Exception] {
      KeyedStore.writeKeyedBatch(df, "k", p, 0L)
    }
    assert(e.getMessage != null)
  }

  test("delete before any batch exists is rejected") {
    val p = storePath("ks_nodel")
    KeyedStore.dropKeyedStore(spark, p)
    val e = intercept[IllegalStateException] {
      KeyedStore.deleteKeyedBatch(Seq(1L).toDF("k"), "k", p, 0L)
    }
    assert(e.getMessage.contains("nothing to delete from"))
  }

  test("merge-on-read plan: base side has no exchange, log ids broadcast") {
    val p = storePath("ks_plan")
    build(p)
    KeyedStore.compactKeyedStore(spark, p, upTo = 1L)
    val plan = KeyedStore.readLatest(spark, p)
      .queryExecution.executedPlan.toString
    // the anti-join against log-touched ids must be broadcast, never a
    // shuffled join that would move the corpus-sized base
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"expected broadcast anti-join in:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"unexpected SortMergeJoin:\n$plan")
  }

  test("SCD2 history: intervals close on change and delete, reopen on re-insert") {
    val p = storePath("ks_hist")
    build(p)
    val got = KeyedStore.history(spark, p)
      .select($"id", $"valid_from", $"valid_to", $"name")
      .as[(Long, Long, Option[Long], String)].collect().toSet
    assert(got == Set(
      (1L, 0L, Some(2L), "a"),   // deleted at 2
      (1L, 3L, None, "a3"),      // re-inserted, current
      (2L, 0L, Some(1L), "b"),   // superseded
      (2L, 1L, None, "b2"),
      (3L, 0L, None, "c"),
      (4L, 1L, Some(2L), "d"))) // inserted then deleted
  }

  test("SCD2 history after compaction starts at the horizon state") {
    val p = storePath("ks_hist_c")
    build(p)
    KeyedStore.compactKeyedStore(spark, p, upTo = 2L)
    val got = KeyedStore.history(spark, p)
      .select($"id", $"valid_from", $"valid_to", $"name")
      .as[(Long, Long, Option[Long], String)].collect().toSet
    // pre-horizon versions (b at 0, d's whole life) are trimmed; the base
    // rows enter as open intervals at their recorded batch
    assert(got == Set(
      (1L, 3L, None, "a3"),
      (2L, 1L, None, "b2"),
      (3L, 0L, None, "c")))
  }

  test("point lookups push the id predicate into the base scan") {
    val p = storePath("ks_lookup")
    build(p)
    KeyedStore.compactKeyedStore(spark, p, upTo = 1L)
    val df = KeyedStore.readLatest(spark, p).filter($"id" === 3L)
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(id), EqualTo(id,3)]"),
      s"expected id pushdown into the parquet scan:\n$scan")
    assert(df.select($"name").as[String].collect().toSeq == Seq("c"))
  }

  test("model check: random batch sequences fold exactly like a Map") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // a CDC op: Left(ids) = delete batch, Right((id, payload)) = upsert
    val batchGen: Gen[Either[List[Long], List[(Long, Long)]]] = Gen.frequency(
      3 -> Gen.nonEmptyListOf(Gen.zip(Gen.chooseNum(0L, 12L), Gen.chooseNum(0L, 999L)))
        .map(kvs => Right(kvs.toMap.toList)), // one row per id, like the contract
      1 -> Gen.nonEmptyListOf(Gen.chooseNum(0L, 12L)).map(l => Left(l.distinct)))
    val seqGen = Gen.listOfN(6, batchGen)
    (0 until 4).foreach { trial =>
      val batches = seqGen.pureApply(
        org.scalacheck.Gen.Parameters.default.withSize(20), Seed(977L + trial))
      // the first batch must be an upsert (delete needs a schema)
      val ops = batches match {
        case Left(_) :: rest => Right(List((0L, 0L))) :: rest
        case bs => bs
      }
      val p = storePath(s"ks_model_$trial")
      KeyedStore.dropKeyedStore(spark, p)
      var model = Map.empty[Long, (Long, Long)] // id -> (batch, payload)
      ops.zipWithIndex.foreach {
        case (Right(kvs), b) =>
          KeyedStore.writeKeyedBatch(kvs.toDF("k", "v"), "k", p, b.toLong)
          kvs.foreach { case (id, v) => model += id -> (b.toLong, v) }
        case (Left(ids), b) =>
          KeyedStore.deleteKeyedBatch(ids.toDF("k"), "k", p, b.toLong)
          model --= ids
      }
      val got = KeyedStore.readLatest(spark, p)
        .select($"id", $"batch", $"v").as[(Long, Long, Long)].collect().toSet
      val want = model.map { case (id, (b, v)) => (id, b, v) }.toSet
      assert(got == want, s"trial $trial: $got vs $want")
      // compact at a random midpoint and re-check the fold is unchanged
      KeyedStore.compactKeyedStore(spark, p, upTo = (trial % ops.size).toLong)
      val got2 = KeyedStore.readLatest(spark, p)
        .select($"id", $"batch", $"v").as[(Long, Long, Long)].collect().toSet
      assert(got2 == want, s"trial $trial post-compact: $got2 vs $want")
    }
  }

  test("base-only read after compaction is a bare scan of the generation") {
    val p = storePath("ks_bare")
    build(p)
    KeyedStore.compactKeyedStore(spark, p, upTo = 3L)
    val plan = KeyedStore.readLatest(spark, p)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected exchange-free scan:\n$plan")
    assert(state(p) == finalState)
  }
}
