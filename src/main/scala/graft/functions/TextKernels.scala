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

  /** [[normalize]] over the engine's native string type — the kernel form
    * of TextOps.normalizeText for hot per-row paths (q41's fingerprint):
    * one character pass instead of lower + two regexp_replace + trim
    * (four interpreted scans and three intermediate strings per row). */
  def normalizeUtf8(text: UTF8String): UTF8String =
    UTF8String.fromString(normalize(text.toString))

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
    * the replace chain + 3+3 for the count's shadow chain); this pays at
    * most 3, with zero intermediate UTF8String round-trips.
    *
    * Mandatory-character gates make the common clean-text case cheaper
    * still: an email match REQUIRES a literal '@' and an IPv4/phone match
    * REQUIRES a digit (both facts read directly off
    * [[graft.ops.TextOps.PiiPatterns]]), so one cheap char scan decides
    * which regex engines run at all — a corpus document with neither
    * character pays zero regex work. Exact: a gate only skips a pattern
    * that provably cannot match, and placeholders inserted by earlier
    * patterns contain neither '@' nor digits, so gates computed on the
    * ORIGINAL text stay valid for the whole chain. */
  def redactPiiCount(text: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    var s = text.toString
    var count = 0L
    var hasAt = false
    var hasDigit = false
    var ci = 0
    while (ci < s.length && !(hasAt && hasDigit)) {
      val c = s.charAt(ci)
      if (c == '@') hasAt = true
      else if (c >= '0' && c <= '9') hasDigit = true
      ci += 1
    }
    var pi = 0
    while (pi < piiCompiled.length) {
      val (placeholder, pattern) = piiCompiled(pi)
      // gate: pattern 0 (email) needs '@'; patterns 1-2 (ipv4, phone) need
      // a digit
      if (if (pi == 0) hasAt else hasDigit) {
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
      }
      pi += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(UTF8String.fromString(s), count)
  }

  /** Marker word → indexes of the languages scoring it, derived from
    * [[graft.ops.TextOps.LangMarkerWords]] (shared words like "la"/"que"
    * score several languages). */
  private lazy val langMarkerIndex: java.util.HashMap[String, Array[Int]] = {
    val m = new java.util.HashMap[String, Array[Int]]()
    graft.ops.TextOps.LangMarkerWords.zipWithIndex.foreach { case ((_, words), li) =>
      words.foreach { w =>
        m.put(w, Option(m.get(w)).map(_ :+ li).getOrElse(Array(li)))
      }
    }
    m
  }
  private lazy val maxMarkerLen: Int =
    graft.ops.TextOps.LangMarkerWords.flatMap(_._2).map(_.length).max

  /** Single-pass language-ID + quality statistics — the fused form of the
    * curation funnel's flag computation, which composed costs ~10 full
    * regex scans per document (5 × `regexp_extract_all(lower(text), ...)`
    * marker counts + whitespace-token count + punctuation count). Two
    * character passes (original text; lowered text) produce:
    *
    *   - n_ws_tokens: `size(split(trim(text), "\s+"))` semantics exactly —
    *     trim strips 0x20 only (Spark's trim), split keeps leading/trailing
    *     empties (limit −1), so tokens = (maximal [ \t\n\x0B\f\r] runs) + 1,
    *     and the empty string yields 1;
    *   - n_nonalnum: `[^A-Za-z0-9\s]` code-point count over the raw text;
    *   - n_chars:    `length(text)` (code points);
    *   - en/de/es/fr: marker-word hits over `lower(text)` — a `\b(?:w|…)\b`
    *     alternation match is exactly "maximal \w run equals a marker word"
    *     (no boundary exists inside a \w run), so hits are counted by
    *     hashing each ≤ maxMarkerLen run against the marker index;
    *   - zh:          [一-鿿] code-point count (lowering is a no-op
    *     on CJK).
    *
    * Lowering is string-level `toLowerCase(Locale.ROOT)` — the same
    * one-to-many expansions (e.g. U+0130 → "i" + combining dot) Spark's
    * `lower()` performs, which per-char lowering would miss. */
  def langQualityStats(text: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val s = text.toString
    // pass 1: raw text — ws-token count, non-alnum count, char length
    var from = 0
    var until = s.length
    while (from < until && s.charAt(from) == ' ') from += 1
    while (until > from && s.charAt(until - 1) == ' ') until -= 1
    var nTok = 1L
    var nNonAlnum = 0L
    var nChars = 0L
    var inWs = false
    var i = from
    while (i < until) {
      val c = s.charAt(i)
      val ws = c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
      if (ws && !inWs) nTok += 1L
      inWs = ws
      i += 1
    }
    i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      nChars += 1L
      val alnum = (cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z') ||
        (cp >= '0' && cp <= '9')
      val ws = cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B || cp == '\f' || cp == '\r'
      if (!alnum && !ws) nNonAlnum += 1L
      i += Character.charCount(cp)
    }
    // pass 2: lowered text — marker-word hits per language + CJK count
    val low = s.toLowerCase(java.util.Locale.ROOT)
    val scores = new Array[Long](graft.ops.TextOps.LangMarkerWords.length)
    var zh = 0L
    var runStart = -1
    // a maximal \w run equal to a marker word scores its languages; runs
    // longer than any marker can never hit, so no substring is built for them
    def endRun(end: Int): Unit = if (runStart >= 0) {
      if (end - runStart <= maxMarkerLen) {
        val langs = langMarkerIndex.get(low.substring(runStart, end))
        if (langs != null) { var k = 0; while (k < langs.length) { scores(langs(k)) += 1L; k += 1 } }
      }
      runStart = -1
    }
    i = 0
    while (i < low.length) {
      val cp = low.codePointAt(i)
      val isWord = (cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z') ||
        (cp >= '0' && cp <= '9') || cp == '_'
      if (isWord) { if (runStart < 0) runStart = i }
      else endRun(i)
      if (cp >= 0x4e00 && cp <= 0x9fff) zh += 1L
      i += Character.charCount(cp)
    }
    endRun(low.length)
    org.apache.spark.sql.catalyst.InternalRow(nTok, nNonAlnum, nChars,
      scores(0), scores(1), scores(2), scores(3), zh)
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

  private val gopherStopWords: Array[String] =
    Array("the", "be", "to", "of", "and", "that", "have", "with")
  private val maxStopLen: Int = gopherStopWords.map(_.length).max

  private def isJavaWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Single-pass Gopher quality statistics: STRUCT(n_words, sum_word_len,
    * n_sym, n_lines, n_bullet, n_ellipsis, n_alpha_words, n_stop) — all
    * BIGINT raw counts; the ratio algebra stays in Column space
    * ([[graft.ops.TextOps.gopherRules]]) so the oracle-replayed IEEE
    * divisions are unchanged. Semantics are EXACTLY the built-in
    * higher-order formulation this replaces (cross-checked in
    * VectorTextSpec on real corpus docs + adversarial edges):
    *
    *  - words = `split(trim(text), '\\s+')` fields of the space-trimmed
    *    text (leading/trailing NON-SPACE whitespace yields empty edge
    *    tokens, exactly like Java split with limit -1); lengths count
    *    codepoints ([[org.apache.spark.sql.functions.length]] semantics);
    *  - n_sym = non-overlapping matches of `#|\.\.\.` over the RAW text
    *    (a run of d dots contributes d/3);
    *  - lines = `split(text, '\n')`; a bullet line opens with optional
    *    intra-line whitespace then -, * or •; an ellipsis line's last
    *    non-whitespace characters are `...`;
    *  - n_stop = how many of the 8 Gopher stop words occur among the
    *    NORMALIZED tokens ([[normalize]] semantics: punctuation removed
    *    without creating boundaries, so "The," still counts).
    *
    * ~2 character passes (raw + lowered) instead of seven interpreted
    * higher-order-function scans with per-token/per-line regex matching. */
  def gopherStats(text: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val s = text.toString
    // ---- pass 1: raw text ----
    // space-trim bounds (Spark trim() removes 0x20 only)
    var from = 0
    var until = s.length
    while (from < until && s.charAt(from) == ' ') from += 1
    while (until > from && s.charAt(until - 1) == ' ') until -= 1
    // token sweep over [from, until): fields between \s+ runs
    var nWords = 1L
    var sumLen = 0L
    var nAlphaWords = 0L
    var tokLen = 0L
    var tokAlpha = false
    var i = from
    while (i < until) {
      val cp = s.codePointAt(i)
      if (cp < 128 && isJavaWs(cp.toChar)) {
        // a ws RUN closes one field
        sumLen += tokLen
        if (tokAlpha) nAlphaWords += 1L
        tokLen = 0L; tokAlpha = false
        var j = i + 1
        while (j < until && { val c = s.charAt(j); isJavaWs(c) }) j += 1
        nWords += 1L
        i = j
      } else {
        tokLen += 1L
        if ((cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z')) tokAlpha = true
        i += Character.charCount(cp)
      }
    }
    sumLen += tokLen
    if (tokAlpha) nAlphaWords += 1L
    // symbol + line sweep over the FULL raw text
    var nSym = 0L
    var nLines = 1L
    var nBullet = 0L
    var nEllipsis = 0L
    var dotRun = 0
    var atLineStart = true   // only intra-line \s seen since the line began
    var lastNonWsEndsDots = 0 // dot count ending at the line's last non-ws char
    i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '.') { dotRun += 1 } else { nSym += dotRun / 3; dotRun = 0 }
      if (c == '#') nSym += 1L
      if (c == '\n') {
        if (lastNonWsEndsDots >= 3) nEllipsis += 1L
        nLines += 1L; atLineStart = true; lastNonWsEndsDots = 0
      } else {
        val ws = isJavaWs(c)
        if (!ws) {
          if (atLineStart && (c == '-' || c == '*' || c == '•')) nBullet += 1L
          atLineStart = false
          lastNonWsEndsDots = if (c == '.') lastNonWsEndsDots + 1 else 0
        }
      }
      i += 1
    }
    nSym += dotRun / 3
    if (lastNonWsEndsDots >= 3) nEllipsis += 1L
    // ---- pass 2: lowered text, normalized-token stop-word membership ----
    val low = s.toLowerCase(java.util.Locale.ROOT)
    var stopMask = 0
    val buf = new java.lang.StringBuilder(maxStopLen + 1)
    var dead = false
    def closeTok(): Unit = {
      if (!dead && buf.length > 0) {
        val t = buf.toString
        var k = 0
        while (k < gopherStopWords.length) {
          if (gopherStopWords(k) == t) stopMask |= (1 << k)
          k += 1
        }
      }
      buf.setLength(0); dead = false
    }
    i = 0
    while (i < low.length) {
      val c = low.charAt(i)
      if (c == ' ') closeTok()
      else if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        if (buf.length >= maxStopLen) dead = true else buf.append(c)
      }
      // any other char: removed by normalize() WITHOUT a boundary
      i += 1
    }
    closeTok()
    org.apache.spark.sql.catalyst.InternalRow(nWords, sumLen, nSym, nLines,
      nBullet, nEllipsis, nAlphaWords, java.lang.Integer.bitCount(stopMask).toLong)
  }
}
