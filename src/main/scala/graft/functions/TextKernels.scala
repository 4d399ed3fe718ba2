package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData

/** Single-pass text kernels behind the codegen'd dedup/similarity
  * Expressions ([[ShingleHashSet]], [[MinHashSig]], [[SimHash62]]).
  *
  * Why kernels instead of composed column functions: the DataFrame
  * formulations of shingling/minhash/simhash (posexplode + window leads +
  * collect_set / 64 min() aggregates) are correct but pay one exchange per
  * aggregation and a window sort — per-document signature computation is
  * embarrassingly parallel, so at the 100-TB design point it should be a
  * shuffle-free narrow map over the corpus. Each kernel normalizes,
  * tokenizes and hashes in ONE pass over the document and returns a
  * primitive array/long, keeping the whole pipeline inside whole-stage
  * codegen with zero exchanges before the (unavoidable) candidate-join.
  *
  * Hash family — deliberately SQL-expressible (not xxhash64) so the DuckDB
  * oracle can replay it exactly (integer arithmetic only, no 64-bit
  * overflow: all intermediates < 2^62):
  *
  *   - per-string pair: h1 = polyhash(base 131, seed 7) mod P,
  *     h2 = polyhash(base 137, seed 11) mod P over Unicode code points of
  *     the normalized text, P = 2^31 - 1 (Mersenne);
  *   - 62-bit element hash: h62 = h1 * 2^31 + h2 (collision prob ~2^-62 —
  *     safe for exact-value oracle parity, unlike a single 31-bit hash);
  *   - MinHash component i: min over shingles of
  *     (a_i * h1 + b_i * h2 + i) mod P with a_i, b_i < 2^30 derived from
  *     LCG constants (products < 2^61, sum < 2^62);
  *   - SimHash: 62 bits, bit b of a token votes via bit b of (h1, h2).
  *
  * Normalization mirrors [[graft.ops.TextOps.normalizeText]] exactly:
  * ASCII lowercase, keep only [a-z0-9 ] (a literal space — tabs/newlines are
  * REMOVED, not spacified), collapse space runs, trim. The corpus is
  * ASCII-after-normalization by construction (non-ASCII letters are stripped
  * by both engines), which is what makes per-code-point lowercasing exact.
  */
object TextKernels extends Serializable {

  val P: Long = 2147483647L // 2^31 - 1
  val Base1: Long = 131L
  val Seed1: Long = 7L
  val Base2: Long = 137L
  val Seed2: Long = 11L

  /** MinHash family coefficients (i-th hash function), < 2^30. */
  def coefA(i: Int): Long = ((1103515245L * i + 12345L) % 1073741824L) | 1L
  def coefB(i: Int): Long = (69069L * i + 1013904223L) % 1073741824L

  /** Normalized form of `text` (TextOps.normalizeText semantics). Non-ASCII
    * characters go through Character.toLowerCase so the few Unicode chars
    * whose lowercase IS ASCII (U+212A KELVIN SIGN -> 'k', U+0130 -> 'i')
    * survive exactly as they do under Spark's and DuckDB's full-string
    * lower(); everything else non-[a-z0-9 ] is dropped by all three. */
  def normalize(text: String): String = {
    val n = text.length
    val sb = new java.lang.StringBuilder(n)
    var pendingSpace = false
    var i = 0
    while (i < n) {
      val c = text.charAt(i)
      val keep: Char =
        if (c >= 'a' && c <= 'z' || c >= '0' && c <= '9') c
        else if (c >= 'A' && c <= 'Z') (c + 32).toChar
        else if (c == ' ') ' '
        else if (c > 127) { // non-ASCII: keep only if its lowercase is ascii
          val lc = Character.toLowerCase(c)
          if (lc >= 'a' && lc <= 'z') lc else 0
        }
        else 0
      if (keep == ' ') {
        if (sb.length > 0) pendingSpace = true // leading spaces -> trim
      } else if (keep != 0) {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(keep)
      }
      i += 1
    }
    sb.toString // trailing space never appended -> trimmed
  }

  /** Token start offsets within a normalized string (single-space
    * separated). Empty string yields one empty token, matching
    * split(trim(""), "\\s+") == Seq(""). */
  private def tokenStarts(s: String): Array[Int] = {
    var count = 1
    var i = 0
    while (i < s.length) { if (s.charAt(i) == ' ') count += 1; i += 1 }
    val starts = new Array[Int](count + 1)
    starts(0) = 0
    var t = 1
    i = 0
    while (i < s.length) {
      if (s.charAt(i) == ' ') { starts(t) = i + 1; t += 1 }
      i += 1
    }
    starts(count) = s.length + 1 // sentinel: start of one-past-last token
    starts
  }

  /** (h1, h2) packed as h1 * 2^31 + h2 over s[from, until). */
  private def hashRange(s: String, from: Int, until: Int): Long = {
    var h1 = Seed1
    var h2 = Seed2
    var i = from
    while (i < until) {
      val c = s.charAt(i).toLong
      h1 = (h1 * Base1 + c) % P
      h2 = (h2 * Base2 + c) % P
      i += 1
    }
    h1 * 2147483648L + h2
  }

  /** Number of n-token shingles: max(ntok - n, 0) + 1 — docs shorter than n
    * tokens yield their single partial shingle (Dedup.shingles semantics). */
  @inline private def numShingles(ntok: Int, n: Int): Int =
    math.max(ntok - n, 0) + 1

  /** Distinct 62-bit shingle hashes, sorted ascending (deterministic). */
  def shingleHashSet(text: UTF8String, n: Int): ArrayData = {
    val s = normalize(text.toString)
    val starts = tokenStarts(s)
    val ntok = starts.length - 1
    val m = numShingles(ntok, n)
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) {
      val from = starts(i)
      val until = (if (i + n >= ntok) s.length + 1 else starts(i + n)) - 1
      hs(i) = hashRange(s, from, until)
      i += 1
    }
    java.util.Arrays.sort(hs)
    var w = 0
    var r = 0
    while (r < m) { // in-place dedupe of the sorted run
      if (w == 0 || hs(r) != hs(w - 1)) { hs(w) = hs(r); w += 1 }
      r += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(hs, w))
  }

  /** POSITIONAL 62-bit shingle hashes: element i = hash of the FULL
    * n-token window starting at token i of the normalized text — NOT
    * deduplicated, NOT sorted, and (unlike [[shingleHashSet]]) no partial
    * tail window: a doc with fewer than n tokens yields an empty array.
    * Position is the array index, so `posexplode` recovers (pos, hash)
    * rows — the input to span-level duplicate detection, where WHERE a
    * window occurs matters as much as THAT it occurs. */
  def shingleHashSeq(text: UTF8String, n: Int): ArrayData = {
    val s = normalize(text.toString)
    val starts = tokenStarts(s)
    val ntok = starts.length - 1
    val m = math.max(ntok - n + 1, 0)
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) {
      val from = starts(i)
      val until = (if (i + n >= ntok) s.length + 1 else starts(i + n)) - 1
      hs(i) = hashRange(s, from, until)
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(hs)
  }

  /** k-component MinHash signature over the doc's n-token shingles
    * (duplicate shingles are harmless under min). */
  def minHashSig(text: UTF8String, n: Int, k: Int): ArrayData = {
    val s = normalize(text.toString)
    val starts = tokenStarts(s)
    val ntok = starts.length - 1
    val m = numShingles(ntok, n)
    val a = new Array[Long](k)
    val b = new Array[Long](k)
    var j = 0
    while (j < k) { a(j) = coefA(j); b(j) = coefB(j); j += 1 }
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var i = 0
    while (i < m) {
      val from = starts(i)
      val until = (if (i + n >= ntok) s.length + 1 else starts(i + n)) - 1
      val h = hashRange(s, from, until)
      val h1 = h >>> 31
      val h2 = h & 2147483647L
      j = 0
      while (j < k) {
        val v = (a(j) * h1 + b(j) * h2 + j) % P
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(sig)
  }

  /** 62-bit rolling-polynomial fingerprint of the FULL normalized text
    * (h1 * 2^31 + h2 over every code point) — the rolling-hash document
    * fingerprint; equal values ⇒ near-identical documents modulo
    * case/punctuation/whitespace, with a SQL-replayable hash. */
  def textHash62(text: UTF8String): Long = {
    val s = normalize(text.toString)
    hashRange(s, 0, s.length)
  }

  /** PII redaction chain compiled once per executor: (placeholder, pattern)
    * in [[graft.ops.TextOps.PiiPatterns]] order. java.util.regex — the same
    * engine Spark's own regexp_replace uses, so match semantics are
    * bit-identical to the composed column form. */
  private lazy val piiCompiled: Array[(String, java.util.regex.Pattern)] =
    graft.ops.TextOps.PiiPatterns.iterator
      .map { case (kind, re) => (s"<$kind>", java.util.regex.Pattern.compile(re)) }
      .toArray

  /** Sequential PII redaction + substitution count in one kernel call:
    * pattern k runs on the text with patterns 1..k−1 already redacted (the
    * exact [[graft.ops.TextOps.redactPii]]/piiCount contract the DuckDB
    * oracle replays), but each pattern's matcher pass does the replace AND
    * the count together, and a pattern with no match skips the rebuild
    * entirely. The composed column form pays 9 regex scans per row (3 for
    * the replace chain + 3+3 for the count's shadow chain); this pays 3,
    * with zero intermediate UTF8String round-trips. */
  def redactPiiCount(text: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    var s = text.toString
    var count = 0L
    var pi = 0
    while (pi < piiCompiled.length) {
      val (placeholder, pattern) = piiCompiled(pi)
      val m = pattern.matcher(s)
      if (m.find()) {
        val sb = new java.lang.StringBuilder(s.length)
        var last = 0
        var more = true
        while (more) {
          count += 1
          sb.append(s, last, m.start()).append(placeholder)
          last = m.end()
          more = m.find()
        }
        sb.append(s, last, s.length)
        s = sb.toString
      }
      pi += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(UTF8String.fromString(s), count)
  }

  /** 62-bit SimHash over whitespace tokens of the normalized text: bit b of
    * the result = sign of Σ_tokens (bit b of (h1,h2) ? +1 : -1), bits 0..30
    * from h1, 31..61 from h2 (all token occurrences vote, not distinct). */
  def simHash62(text: UTF8String): Long = {
    val s = normalize(text.toString)
    val starts = tokenStarts(s)
    val ntok = starts.length - 1
    val counts = new Array[Int](62)
    var i = 0
    while (i < ntok) {
      val from = starts(i)
      val until = (if (i + 1 >= ntok) s.length + 1 else starts(i + 1)) - 1
      val h = hashRange(s, from, until)
      val h1 = h >>> 31
      val h2 = h & 2147483647L
      var b = 0
      while (b < 31) {
        counts(b) += (if (((h1 >> b) & 1L) != 0) 1 else -1)
        counts(b + 31) += (if (((h2 >> b) & 1L) != 0) 1 else -1)
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 62) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}
