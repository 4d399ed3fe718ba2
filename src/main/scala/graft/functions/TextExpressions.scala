package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd per-document signature Expressions over a STRING column.
  *
  * Each stays inside whole-stage codegen (doGenCode emits a single call into
  * the [[TextKernels]] static kernel — the same pattern Spark's built-in
  * string functions use to call into UTF8String), so signature computation
  * is a narrow, shuffle-free map: the scalable formulation for per-doc
  * dedup sketches at the 100-TB design point. Contrast with the composed
  * DataFrame forms (posexplode + window + aggregate), which pay two
  * exchanges and an interpreted ObjectHashAggregate per sketch.
  */
abstract class TextKernelExpression extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a STRING input, got $dt")
  }

  /** Generated-code call on the kernel singleton for input variable `c`. */
  protected def kernelCall(c: String): String

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = ctx.addReferenceObj("textKernels", TextKernels,
      "graft.functions.TextKernels$")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $kernel.${kernelCall(c)};")
  }
}

/** Distinct 62-bit n-token shingle hashes of the normalized text, sorted. */
case class ShingleHashSet(child: Expression, n: Int) extends TextKernelExpression {
  require(n >= 1, "shingle length must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes"
  override def nullSafeEval(input: Any): Any =
    TextKernels.shingleHashSet(input.asInstanceOf[UTF8String], n)
  override protected def kernelCall(c: String): String = s"shingleHashSet($c, $n)"
  override protected def withNewChildInternal(newChild: Expression): ShingleHashSet =
    copy(child = newChild)
}

/** Positional (non-distinct) 62-bit n-token full-window shingle hashes:
  * index = token position; empty for docs shorter than n tokens. */
case class ShingleHashSeq(child: Expression, n: Int) extends TextKernelExpression {
  require(n >= 1, "shingle length must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hash_seq"
  override def nullSafeEval(input: Any): Any =
    TextKernels.shingleHashSeq(input.asInstanceOf[UTF8String], n)
  override protected def kernelCall(c: String): String = s"shingleHashSeq($c, $n)"
  override protected def withNewChildInternal(newChild: Expression): ShingleHashSeq =
    copy(child = newChild)
}

/** k-component MinHash signature over n-token shingles. */
case class MinHashSig(child: Expression, n: Int, k: Int) extends TextKernelExpression {
  require(n >= 1 && k >= 1, "shingle length and signature size must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"
  override def nullSafeEval(input: Any): Any =
    TextKernels.minHashSig(input.asInstanceOf[UTF8String], n, k)
  override protected def kernelCall(c: String): String = s"minHashSig($c, $n, $k)"
  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** 62-bit SimHash of the normalized text's whitespace tokens. */
case class SimHash62(child: Expression) extends TextKernelExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"
  override def nullSafeEval(input: Any): Any =
    TextKernels.simHash62(input.asInstanceOf[UTF8String])
  override protected def kernelCall(c: String): String = s"simHash62($c)"
  override protected def withNewChildInternal(newChild: Expression): SimHash62 =
    copy(child = newChild)
}

/** Single-pass PII redaction: STRUCT(clean_text STRING, n_pii BIGINT) with
  * the sequential [[graft.ops.TextOps.PiiPatterns]] chain semantics (see
  * [[TextKernels.redactPiiCount]]). One kernel call yields both outputs, so
  * selecting both fields costs one regex chain per row, not two — Catalyst's
  * subexpression elimination shares the struct between the GetStructField
  * projections. */
case class RedactPii(child: Expression) extends TextKernelExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("clean_text", StringType, nullable = false),
    StructField("n_pii", LongType, nullable = false)))
  override def prettyName: String = "graft_redact_pii"
  override def nullSafeEval(input: Any): Any =
    TextKernels.redactPiiCount(input.asInstanceOf[UTF8String])
  override protected def kernelCall(c: String): String = s"redactPiiCount($c)"
  override protected def withNewChildInternal(newChild: Expression): RedactPii =
    copy(child = newChild)
}

/** Single-pass language-ID + quality statistics: STRUCT(n_ws_tokens BIGINT,
  * n_nonalnum BIGINT, n_chars BIGINT, en BIGINT, de BIGINT, es BIGINT,
  * fr BIGINT, zh BIGINT) with the exact composed-column semantics (see
  * [[TextKernels.langQualityStats]]) at ~2 character passes instead of ~10
  * regex scans per document. */
case class LangQualityStats(child: Expression) extends TextKernelExpression {
  override def dataType: DataType = StructType(
    Seq("n_ws_tokens", "n_nonalnum", "n_chars", "en", "de", "es", "fr", "zh")
      .map(StructField(_, LongType, nullable = false)))
  override def prettyName: String = "graft_lang_quality_stats"
  override def nullSafeEval(input: Any): Any =
    TextKernels.langQualityStats(input.asInstanceOf[UTF8String])
  override protected def kernelCall(c: String): String = s"langQualityStats($c)"
  override protected def withNewChildInternal(newChild: Expression): LangQualityStats =
    copy(child = newChild)
}

/** Single-pass Gopher quality-rule statistics: STRUCT(n_words,
  * sum_word_len, n_sym, n_lines, n_bullet, n_ellipsis, n_alpha_words,
  * n_stop BIGINT) with exactly the built-in higher-order-function
  * semantics (see [[TextKernels.gopherStats]]) at ~2 character passes
  * instead of seven interpreted HOF scans with per-token regex. */
case class GopherStats(child: Expression) extends TextKernelExpression {
  override def dataType: DataType = StructType(
    Seq("n_words", "sum_word_len", "n_sym", "n_lines", "n_bullet",
      "n_ellipsis", "n_alpha_words", "n_stop")
      .map(StructField(_, LongType, nullable = false)))
  override def prettyName: String = "graft_gopher_stats"
  override def nullSafeEval(input: Any): Any =
    TextKernels.gopherStats(input.asInstanceOf[UTF8String])
  override protected def kernelCall(c: String): String = s"gopherStats($c)"
  override protected def withNewChildInternal(newChild: Expression): GopherStats =
    copy(child = newChild)
}

/** Normalized text (TextOps.normalizeText semantics) as a single-pass
  * kernel: ASCII lowercase, keep [a-z0-9 ], collapse runs, trim. For hot
  * paths that need the normalized STRING itself (md5 fingerprinting) —
  * the hash-producing kernels below already normalize internally. */
case class NormalizeText(child: Expression) extends TextKernelExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_normalize_text"
  override def nullSafeEval(input: Any): Any =
    TextKernels.normalizeUtf8(input.asInstanceOf[UTF8String])
  override protected def kernelCall(c: String): String = s"normalizeUtf8($c)"
  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

/** 62-bit rolling-polynomial fingerprint of the normalized text. */
case class TextHash62(child: Expression) extends TextKernelExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_text_hash62"
  override def nullSafeEval(input: Any): Any =
    TextKernels.textHash62(input.asInstanceOf[UTF8String])
  override protected def kernelCall(c: String): String = s"textHash62($c)"
  override protected def withNewChildInternal(newChild: Expression): TextHash62 =
    copy(child = newChild)
}

object TextFunctions {
  def normalize_text(text: Column): Column =
    GraftColumnBridge.column(NormalizeText(GraftColumnBridge.expression(text)))
  def text_hash62(text: Column): Column =
    GraftColumnBridge.column(TextHash62(GraftColumnBridge.expression(text)))
  def shingle_hashes(text: Column, n: Int): Column =
    GraftColumnBridge.column(ShingleHashSet(GraftColumnBridge.expression(text), n))
  def shingle_hash_seq(text: Column, n: Int): Column =
    GraftColumnBridge.column(ShingleHashSeq(GraftColumnBridge.expression(text), n))
  def minhash_sig(text: Column, n: Int, k: Int): Column =
    GraftColumnBridge.column(MinHashSig(GraftColumnBridge.expression(text), n, k))
  def simhash62(text: Column): Column =
    GraftColumnBridge.column(SimHash62(GraftColumnBridge.expression(text)))
  def redact_pii(text: Column): Column =
    GraftColumnBridge.column(RedactPii(GraftColumnBridge.expression(text)))
  def lang_quality_stats(text: Column): Column =
    GraftColumnBridge.column(LangQualityStats(GraftColumnBridge.expression(text)))
  def gopher_stats(text: Column): Column =
    GraftColumnBridge.column(GopherStats(GraftColumnBridge.expression(text)))

  /** SQL builders (FunctionRegistry / SparkSessionExtensions): the sketch
    * parameters (shingle n, signature k) must be INTEGER LITERALS — they
    * shape the kernel and its output schema, so a per-row value cannot
    * work. The builders fail fast at ANALYSIS time on anything else. */
  private def intLit(e: Expression, fn: String, name: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $name must be an INTEGER literal, got $other")
  }
  private[functions] val buildTextHash62: Seq[Expression] => Expression = {
    case Seq(t) => TextHash62(t)
    case e => throw new IllegalArgumentException(
      s"graft_text_hash62 requires exactly 1 argument, got ${e.length}")
  }
  private[functions] val buildShingleHashes: Seq[Expression] => Expression = {
    case Seq(t, n) => ShingleHashSet(t, intLit(n, "graft_shingle_hashes", "n"))
    case e => throw new IllegalArgumentException(
      s"graft_shingle_hashes requires exactly 2 arguments, got ${e.length}")
  }
  private[functions] val buildShingleHashSeq: Seq[Expression] => Expression = {
    case Seq(t, n) => ShingleHashSeq(t, intLit(n, "graft_shingle_hash_seq", "n"))
    case e => throw new IllegalArgumentException(
      s"graft_shingle_hash_seq requires exactly 2 arguments, got ${e.length}")
  }
  private[functions] val buildMinHashSig: Seq[Expression] => Expression = {
    case Seq(t, n, k) => MinHashSig(t, intLit(n, "graft_minhash_sig", "n"),
      intLit(k, "graft_minhash_sig", "k"))
    case e => throw new IllegalArgumentException(
      s"graft_minhash_sig requires exactly 3 arguments, got ${e.length}")
  }
  private[functions] val buildSimHash62: Seq[Expression] => Expression = {
    case Seq(t) => SimHash62(t)
    case e => throw new IllegalArgumentException(
      s"graft_simhash62 requires exactly 1 argument, got ${e.length}")
  }
  private[functions] val buildNormalizeText: Seq[Expression] => Expression = {
    case Seq(t) => NormalizeText(t)
    case e => throw new IllegalArgumentException(
      s"graft_normalize_text requires exactly 1 argument, got ${e.length}")
  }
  private[functions] val buildRedactPii: Seq[Expression] => Expression = {
    case Seq(t) => RedactPii(t)
    case e => throw new IllegalArgumentException(
      s"graft_redact_pii requires exactly 1 argument, got ${e.length}")
  }
  private[functions] val buildLangQualityStats: Seq[Expression] => Expression = {
    case Seq(t) => LangQualityStats(t)
    case e => throw new IllegalArgumentException(
      s"graft_lang_quality_stats requires exactly 1 argument, got ${e.length}")
  }
  private[functions] val buildGopherStats: Seq[Expression] => Expression = {
    case Seq(t) => GopherStats(t)
    case e => throw new IllegalArgumentException(
      s"graft_gopher_stats requires exactly 1 argument, got ${e.length}")
  }
}
