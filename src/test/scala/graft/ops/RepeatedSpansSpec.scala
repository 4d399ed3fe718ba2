package graft.ops

import graft.SparkTestBase
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** Hand-computed cases for [[Dedup.repeatedSpans]] and its positional
  * shingle kernel: cross-doc repeats, within-doc repeats, maximal-span
  * merging, the ≥k no-partial-window contract, and the minCount knob. */
class RepeatedSpansSpec extends SparkTestBase {
  import spark.implicits._

  private def df(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("shingle_hash_seq is positional, full windows only") {
    val out = df((1L, "a b c d"), (2L, "a b"), (3L, ""))
      .select(col("doc_id"), TextFunctions.shingle_hash_seq(col("text"), 3).as("hs"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(out(1L).length == 2)    // windows "a b c", "b c d"
    assert(out(2L).isEmpty && out(3L).isEmpty) // sub-k docs: nothing
    // positional identity: same window text => same hash at both sites
    val again = df((4L, "x a b c"), (5L, "a b c y"))
      .select(TextFunctions.shingle_hash_seq(col("text"), 3).as("hs"))
      .as[Seq[Long]].collect()
    assert(again(0)(1) == again(1)(0)) // "a b c" at pos 1 and pos 0
  }

  test("cross-doc repeated window becomes a span in both docs") {
    // "one two three four" shared by docs 1 and 2 at different offsets
    val d = df(
      (1L, "one two three four alpha beta gamma"),
      (2L, "x y one two three four p q r"),
      (3L, "nothing shared here at all friends"))
    val spans = Dedup.repeatedSpans(d, "doc_id", "text", 4)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(spans == Set((1L, 0L, 4L, 1L), (2L, 2L, 4L, 1L)))
  }

  test("overlapping duplicated windows merge into one maximal span") {
    // 6-token repeat shared across docs => with k=4, three overlapping
    // windows (pos 0,1,2 in doc 1) merge into a single span of len 6
    val rep = "one two three four five six"
    val d = df((1L, s"$rep tail a b"), (2L, s"head c $rep"))
    val spans = Dedup.repeatedSpans(d, "doc_id", "text", 4)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(spans == Set((1L, 0L, 6L, 3L), (2L, 2L, 6L, 3L)))
  }

  test("disjoint repeats yield separate spans; within-doc repeat counts") {
    // doc 1 repeats its own 4-gram at pos 0 and pos 8 (gap 8 > k=4)
    val d = df((1L, "a b c d x1 x2 x3 x4 a b c d"),
               (2L, "unrelated words only in here"))
    val spans = Dedup.repeatedSpans(d, "doc_id", "text", 4)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(spans == Set((1L, 0L, 4L, 1L), (1L, 8L, 4L, 1L)))
  }

  test("adjacent (non-overlapping, gap-free) windows merge") {
    // doc 1: duplicated windows at pos 0 and pos 4 with k=4 — intervals
    // [0,3] and [4,7] touch, so one contiguous masked span of len 8
    val d = df(
      (1L, "a b c d e f g h"),
      (2L, "a b c d zz1 zz2 zz3 zz4"),   // repeats window at pos 0
      (3L, "yy1 yy2 yy3 yy4 e f g h"))   // repeats window at pos 4
    val spans = Dedup.repeatedSpans(d, "doc_id", "text", 4)
      .as[(Long, Long, Long, Long)].collect()
      .filter(_._1 == 1L).toSet
    assert(spans == Set((1L, 0L, 8L, 2L)))
  }

  test("minCount raises the repetition bar") {
    val d = df(
      (1L, "one two three four a1 a2 a3 a4"),
      (2L, "one two three four b1 b2 b3 b4"),
      (3L, "one two three four c1 c2 c3 c4"),
      (4L, "a1 a2 a3 a4 only twice here x"))
    val spans = Dedup.repeatedSpans(d, "doc_id", "text", 4, minCount = 3)
      .as[(Long, Long, Long, Long)].collect().toSet
    // the triple-repeated gram survives minCount=3; the doubled one does not
    assert(spans == Set((1L, 0L, 4L, 1L), (2L, 0L, 4L, 1L), (3L, 0L, 4L, 1L)))
  }

  test("cutSpans removes exactly the flagged tokens and rejoins") {
    val d = df((1L, "a b c d e f g h"))
    val spans = Seq((1L, 2L, 3L)).toDF("doc_id", "span_start", "span_len")
    val out = Dedup.cutSpans(d, "doc_id", "text", spans)
      .as[(Long, String, Long, Long)].collect().head
    assert(out == ((1L, "a b f g h", 5L, 3L)))
  }

  test("cutSpans: no spans passes normalized text; full cover leaves empty row") {
    val d = df((1L, "Keep, ALL of this!"), (2L, "x y z w"))
    val spans = Seq((2L, 0L, 4L)).toDF("doc_id", "span_start", "span_len")
    val out = Dedup.cutSpans(d, "doc_id", "text", spans)
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, "keep all of this", 4L, 0L)))
    assert(out(2L) == ((2L, "", 0L, 4L)))
  }

  test("cutSpans composes with repeatedSpans end to end") {
    val rep = "one two three four five six"
    val d = df((1L, s"$rep tail a b"), (2L, s"head c $rep"))
    val spans = Dedup.repeatedSpans(d, "doc_id", "text", 4)
    val out = Dedup.cutSpans(d, "doc_id", "text", spans)
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, "tail a b", 3L, 6L)))
    assert(out(2L) == ((2L, "head c", 2L, 6L)))
  }

  test("normalization applies before windowing (case/punct-insensitive)") {
    val d = df((1L, "One, Two THREE four tail1 tail2 tail3"),
               (2L, "pad1 pad2 pad3 one two three FOUR!"))
    val spans = Dedup.repeatedSpans(d, "doc_id", "text", 4)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(spans == Set((1L, 0L, 4L, 1L), (2L, 3L, 4L, 1L)))
  }

  test("keepFirst: canonical occurrence unflagged, later copies flagged") {
    val rep = "one two three four five six"
    val d = df((1L, s"$rep tail a b"), (2L, s"head c $rep"))
    val spans = Dedup.repeatedSpansKeepFirst(d, "doc_id", "text", 4)
      .as[(Long, Long, Long, Long)].collect().toSet
    // doc 1 owns the passage (smaller doc_id): only doc 2's copy flags
    assert(spans == Set((2L, 2L, 6L, 3L)))
    val cut = Dedup.cutSpans(d, "doc_id", "text", Dedup.repeatedSpansKeepFirst(
        d, "doc_id", "text", 4))
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(cut(1L) == ((1L, s"$rep tail a b", 9L, 0L))) // canonical keeps all
    assert(cut(2L) == ((2L, "head c", 2L, 6L)))
  }

  test("keepFirst: within-doc repeat keeps the earlier position") {
    val d = df((1L, "a b c d x1 x2 x3 x4 a b c d"))
    val spans = Dedup.repeatedSpansKeepFirst(d, "doc_id", "text", 4)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(spans == Set((1L, 8L, 4L, 1L)))
  }

  test("keepFirst: canonical order is (doc_id, pos), doc_id first") {
    // the repeat sits LATE in doc 1 and EARLY in doc 2 — doc 1 still owns it
    val d = df((1L, "f1 f2 f3 f4 one two three four"),
               (2L, "one two three four g1 g2 g3 g4"))
    val spans = Dedup.repeatedSpansKeepFirst(d, "doc_id", "text", 4)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(spans == Set((2L, 0L, 4L, 1L)))
  }

  test("keepFirst: three-way repeat cuts all but the first copy") {
    val rep = "alpha beta gamma delta"
    val d = df((3L, s"$rep p1 p2 p3 p4"), (5L, s"q1 $rep q2 q3"),
               (9L, s"r1 r2 r3 r4 $rep"))
    val spans = Dedup.repeatedSpansKeepFirst(d, "doc_id", "text", 4)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(spans == Set((5L, 1L, 4L, 1L), (9L, 4L, 4L, 1L)))
  }

  test("contaminatedSpans cuts exactly the benchmark quote, nothing else") {
    // doc 1 quotes a 5-token benchmark passage mid-document; doc 2 is
    // clean; doc 3 is shorter than the window and can never match
    val corpus = df(
      (1L, "intro words the quick brown fox jumps closing remark"),
      (2L, "totally unrelated content with many words here"),
      (3L, "tiny doc"))
    val bench = df((100L, "prefix the quick brown fox jumps suffix"))
    val spans = Dedup.contaminatedSpans(corpus, bench, "doc_id", "text", 3)
      .as[(Long, Long, Long, Long)].collect().toSet
    // windows of "the quick brown fox jumps" start at corpus positions
    // 2..4 (3 overlapping 3-windows) and merge into one span covering
    // tokens 2..6: span_len = 4 - 2 + 3 = 5
    assert(spans == Set((1L, 2L, 5L, 3L)))
    val cut = Dedup.cutSpans(corpus, "doc_id", "text",
        Dedup.contaminatedSpans(corpus, bench, "doc_id", "text", 3))
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(cut(1L) == ((1L, "intro words closing remark", 4L, 5L)))
    assert(cut(2L)._3 == 7L && cut(2L)._4 == 0L) // untouched
    assert(cut(3L)._4 == 0L)
    // a benchmark shorter than the window has no k-window to leak
    val tinyBench = df((100L, "fox jumps"))
    assert(Dedup.contaminatedSpans(corpus, tinyBench, "doc_id", "text", 3)
      .collect().isEmpty)
  }
}
