package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants from the SURVEY test plan (§5 item 3): each
  * holds for GENERATED inputs, not hand-picked fixtures (raw ScalaCheck
  * generators with fixed seeds — the scalatest bridge artifact is not in
  * the offline cache). Inputs are kept small (a Spark job per case). */
class PropertySpec extends SparkTestBase {
  import spark.implicits._

  /** 5 deterministic samples per generator. */
  private def forAll[A](g: Gen[A])(f: A => Unit): Unit =
    (0 until 5).foreach { i =>
      f(g.pureApply(Gen.Parameters.default.withSize(40), Seed(42L + i)))
    }
  private def forAll[A, B](g1: Gen[A], g2: Gen[B])(f: (A, B) => Unit): Unit =
    (0 until 5).foreach { i =>
      f(g1.pureApply(Gen.Parameters.default.withSize(40), Seed(42L + i)),
        g2.pureApply(Gen.Parameters.default.withSize(40), Seed(4242L + i)))
    }

  private val idLists: Gen[List[Long]] =
    Gen.nonEmptyListOf(Gen.chooseNum(0L, 500L))

  test("denseReindex is an order-preserving bijection onto 0..N-1") {
    forAll(idLists) { ids =>
      val df = ids.toDF("id")
      val out = Relational.denseReindex(df, "id", "idx")
        .orderBy("idx").as[(Long, Long)].collect()
      val distinctSorted = ids.distinct.sorted
      assert(out.map(_._1).toSeq == distinctSorted)          // preserves id order
      assert(out.map(_._2).toSeq == distinctSorted.indices.map(_.toLong)) // dense 0..N-1
    }
  }

  test("semi-join and anti-join partition the left input") {
    forAll(idLists, idLists) { (left, right) =>
      val l = left.toDF("k")
      val r = right.toDF("k")
      val semi = l.join(r, Seq("k"), "left_semi").count()
      val anti = l.join(r, Seq("k"), "left_anti").count()
      assert(semi + anti == left.size)
    }
  }

  test("running sum's last value per group equals the group total") {
    val rows: Gen[List[(Long, Long, Long)]] = Gen.nonEmptyListOf(
      Gen.zip(Gen.chooseNum(0L, 3L), Gen.chooseNum(0L, 1000L), Gen.chooseNum(-50L, 50L)))
    forAll(rows) { data =>
      // unique order key per group so "last" is well-defined
      val distinct = data.groupBy(t => (t._1, t._2)).map(_._2.head).toList
      val df = distinct.toDF("g", "ord", "v")
      val rs = Relational.runningSum(df, "g", "ord", "v", "cum")
      val lastPerGroup = rs.withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy($"g").orderBy($"ord".desc)))
        .filter($"rn" === 1).select($"g", $"cum").as[(Long, Long)].collect().toMap
      val totals = distinct.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
      assert(lastPerGroup == totals)
    }
  }

  test("per-group top-k equals sort-then-take within each group") {
    val rows: Gen[List[(Long, Long, Double)]] = Gen.nonEmptyListOf(
      Gen.zip(Gen.chooseNum(0L, 3L), Gen.chooseNum(0L, 1000L), Gen.chooseNum(-100.0, 100.0)))
    forAll(rows) { data =>
      val distinct = data.groupBy(t => (t._1, t._2)).map(_._2.head).toList
      val df = distinct.toDF("g", "item", "score")
      val k = 3
      val got = Relational.topKPerGroup(df, Seq($"g"), Seq($"score".desc, $"item".asc), k)
        .select($"g", $"item").as[(Long, Long)].collect().toSet
      val want = distinct.groupBy(_._1).toList.flatMap { case (g, rs) =>
        rs.sortBy(r => (-r._3, r._2)).take(k).map(r => (g, r._2))
      }.toSet
      assert(got == want)
    }
  }

  test("TopK aggregator equals the row_number window per-group top-k") {
    val rows: Gen[List[(Long, Long, Double)]] = Gen.nonEmptyListOf(
      Gen.zip(Gen.chooseNum(0L, 3L), Gen.chooseNum(0L, 1000L), Gen.chooseNum(-10.0, 10.0)))
    forAll(rows) { data =>
      val distinct = data.groupBy(t => (t._1, t._2)).map(_._2.head).toList
      val df = distinct.toDF("g", "item", "score")
      val k = 3
      val topk = udaf(new Aggregators.TopK(k))
      val viaAgg = df.groupBy($"g").agg(topk($"score", $"item").as("recs"))
        .select($"g", posexplode($"recs"))
        .select($"g", $"col._2".as("item"), ($"pos" + 1).cast("long").as("rn"))
        .as[(Long, Long, Long)].collect().toSet
      val viaWindow = Relational.topKPerGroup(df, Seq($"g"),
          Seq($"score".desc, $"item".asc), k)
        .select($"g", $"item", $"rn".cast("long"))
        .as[(Long, Long, Long)].collect().toSet
      assert(viaAgg == viaWindow)
    }
  }

  test("equalized groups all end at the minimum group size") {
    val rows: Gen[List[(String, Long)]] = Gen.nonEmptyListOf(
      Gen.zip(Gen.oneOf("A", "B"), Gen.chooseNum(0L, 10000L)))
    forAll(rows) { data =>
      val distinct = data.distinct
      if (distinct.map(_._1).distinct.size == 2) {
        val df = distinct.toDF("grp", "key")
        val out = Relational.equalizeGroupsRandom(df, "grp", 7L, Seq("key"))
          .groupBy("grp").count().as[(String, Long)].collect().toMap
        val minSize = distinct.groupBy(_._1).map(_._2.size).min
        assert(out.values.toSet == Set(minSize.toLong))
      }
    }
  }

  test("resample equals an in-memory reference for generated event logs") {
    val evGen: Gen[List[(String, Long, Long, Double)]] = Gen.nonEmptyListOf(
      Gen.zip(Gen.oneOf("a", "b"), Gen.chooseNum(0L, 5000L),
        Gen.chooseNum(0L, 100000L), Gen.chooseNum(-50, 50).map(_.toDouble)))
    val interval = 300L
    forAll(evGen) { raw =>
      // unique ids: the pick order (ts, id) must be total
      val data = raw.zipWithIndex.map { case ((k, sec, _, v), i) =>
        (k, sec, i.toLong, v)
      }
      val df = data.map { case (k, sec, id, v) =>
        (k, new java.sql.Timestamp(sec * 1000L), id, v)
      }.toDF("k", "ts", "id", "v")
      val got = Relational.resample(df, "k", "ts", "id", "v", interval)
        .collect().map(r => (r.getString(0), r.getLong(1)) ->
          (r.getLong(2), r.getDouble(3))).toMap

      // reference: per key, walk the dense bin range carrying the last value
      val ref = data.groupBy(_._1).flatMap { case (k, evs) =>
        val byBin = evs.groupBy(e => math.floorDiv(e._2, interval))
        val bins = byBin.keys
        var lastV = 0.0
        (bins.min to bins.max).map { b =>
          val here = byBin.getOrElse(b, Nil)
          if (here.nonEmpty) lastV = here.maxBy(e => (e._2, e._3))._4
          (k, b) -> (here.size.toLong, lastV)
        }
      }
      assert(got == ref, s"data=$data")
    }
  }

  private val edgeLists: Gen[List[(Long, Long)]] =
    Gen.listOf(Gen.zip(Gen.chooseNum(0L, 60L), Gen.chooseNum(0L, 60L)))

  test("duplicateClusters: driver union-find equals distributed propagation on random graphs") {
    forAll(edgeLists) { rawEdges =>
      // self-loops and duplicate pairs are legal inputs; components must
      // come out identical either way, labeled with the min member id
      val edges = rawEdges.filter { case (a, b) => a != b }
      val nodeIds = (0L to 60L).toList
      val nodes = nodeIds.toDF("doc_id")
      val pairs =
        if (edges.isEmpty) Seq.empty[(Long, Long)].toDF("id_a", "id_b")
        else edges.toDF("id_a", "id_b")
      val fast = Dedup.duplicateClusters(nodes, "doc_id", pairs)
        .as[(Long, Long)].collect().toMap
      val dist = Dedup.duplicateClusters(nodes, "doc_id", pairs, driverEdgeCap = 0L)
        .as[(Long, Long)].collect().toMap
      // reference: brute-force transitive closure over the undirected graph
      val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      def component(start: Long): Set[Long] = {
        var seen = Set(start); var frontier = Set(start)
        while (frontier.nonEmpty) {
          frontier = frontier.flatMap(n => adj.getOrElse(n, Set.empty)) -- seen
          seen ++= frontier
        }
        seen
      }
      val ref = nodeIds.map(id => id -> component(id).min).toMap
      assert(fast == ref, s"fast path diverges, edges=$edges")
      assert(dist == ref, s"distributed path diverges, edges=$edges")
    }
  }

  // characters chosen to stress every gopherStats rule boundary: all Java
  // \s classes, bullet markers, dot runs, '#', token-fusing punctuation,
  // stop words, and non-ASCII (• and é exercise codepoint vs char paths)
  private val gopherChars: Gen[Char] = Gen.frequency(
    (8, Gen.alphaNumChar), (3, Gen.const(' ')), (1, Gen.const('\t')),
    (1, Gen.const('\n')), (1, Gen.const('\r')), (1, Gen.const('\u000B')),
    (1, Gen.const('\f')), (2, Gen.const('.')), (1, Gen.const('#')),
    (1, Gen.const('-')), (1, Gen.const('*')), (1, Gen.const('•')),
    (1, Gen.const('\'')), (1, Gen.const(',')), (1, Gen.const('é')),
    (2, Gen.oneOf(Seq("the", "be", "to", "of", "and", "that", "have", "with")
      .map(_.charAt(0)))))
  private val gopherDocs: Gen[List[String]] =
    Gen.nonEmptyListOf(Gen.stringOf(gopherChars))

  test("gopherStats kernel == composed HOFs on generated adversarial text") {
    forAll(gopherDocs) { docs =>
      val df = docs.map(Tuple1(_)).toDF("text")
      val diff = df.select(TextOps.gopherRules(col("text")).as("k"),
          TextOps.gopherRulesComposed(col("text")).as("c"))
        .filter(not(col("k") <=> col("c")))
      val bad = diff.limit(2).collect()
      assert(bad.isEmpty, s"kernel != composed on e.g. ${bad.mkString("; ")}")
    }
  }

  test("exactTopKeys: certified answers equal the exact top-k; refusals are honest") {
    // Zipf-ish multisets: key i drawn with weight ~ 1/i over a 30-key
    // universe plus occasional tail singletons — some draws certify at the
    // chosen support, some must refuse; both outcomes are checked
    val keyGen = Gen.frequency(
      (1 to 30).map(i => (900 / i, Gen.const(s"k$i"))) :+
        (10 -> Gen.chooseNum(0, 10000).map(n => s"t$n")): _*)
    val multisets = Gen.listOfN(400, keyGen)
    forAll(multisets) { keys =>
      val df = keys.toDF("key")
      val exact = keys.groupBy(identity).view.mapValues(_.size.toLong).toSeq
        .sortBy { case (k, n) => (-n, k) }.take(8)
        .zipWithIndex.map { case ((k, n), i) => (k, n, (i + 1).toLong) }
      try {
        val got = Sketches.exactTopKeys(df, "key", 8, support = 0.02)
          .as[(String, Long, Long)].collect().toSeq
        assert(got == exact) // certificate held => provably the true top-k
      } catch {
        case e: IllegalStateException =>
          // refusal must be honest: the 8th count really is under the bar
          assert(e.getMessage.contains("not provable"))
          assert(exact.size < 8 || exact.last._2 <= 0.02 * keys.size,
            s"refused a certifiable top-8: ${exact.last}")
      }
    }
  }
}
