package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._

/** Codegen'd dot product over two ARRAY<FLOAT|DOUBLE> columns.
  *
  * The higher-order-function formulation (`aggregate(zip_with(...))`,
  * VectorOps.dotHof) is CodegenFallback: every evaluation allocates lambda
  * frames and boxes each element — measured ~20× slower in the brute-force
  * similarity scan where the dot product runs once per (query, candidate)
  * pair. This expression stays inside whole-stage codegen: a primitive loop,
  * f32 elements promoted exactly to f64, summed left-to-right (deterministic,
  * matching the HOF form bit-for-bit).
  *
  * Semantics: null input array → null; null elements contribute 0; lengths
  * are combined up to min(len(a), len(b)).
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elementType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dot_product needs ARRAY<FLOAT|DOUBLE> inputs, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val (lf, rf) = (elementType(left) == FloatType, elementType(right) == FloatType)
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
        val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
        sum += xv * yv
      }
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      def get(arr: String, e: Expression) =
        if (elementType(e) == FloatType) s"(double) $arr.getFloat($i)"
        else s"$arr.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $sum += ${get(a, left)} * ${get(b, right)};
         |  }
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd squared-L2 distance over two ARRAY<FLOAT|DOUBLE> columns —
  * same design as [[DotProduct]] (the `aggregate(zip_with(...))` HOF form is
  * CodegenFallback); sequential Σ(aᵢ−bᵢ)², deterministic on any layout. */
case class L2Sq(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elementType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"l2sq needs ARRAY<FLOAT|DOUBLE> inputs, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val (lf, rf) = (elementType(left) == FloatType, elementType(right) == FloatType)
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
        val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
        val d = xv - yv
        sum += d * d
      }
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      val d = ctx.freshName("d")
      def get(arr: String, e: Expression) =
        if (elementType(e) == FloatType) s"(double) $arr.getFloat($i)"
        else s"$arr.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    double $d = ${get(a, left)} - ${get(b, right)};
         |    $sum += $d * $d;
         |  }
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): L2Sq =
    copy(left = newLeft, right = newRight)
}

object GraftFunctions {

  /** Column-level entry point. */
  def dot_product(a: Column, b: Column): Column =
    GraftColumnBridge.column(DotProduct(GraftColumnBridge.expression(a),
      GraftColumnBridge.expression(b)))

  /** Column-level squared-L2 distance. */
  def l2sq(a: Column, b: Column): Column =
    GraftColumnBridge.column(L2Sq(GraftColumnBridge.expression(a),
      GraftColumnBridge.expression(b)))

  /** Expression builder with a proper arity error (shared by the session
    * registry and SparkSessionExtensions paths). */
  private[functions] val buildDot: Seq[Expression] => Expression = {
    case Seq(a, b) => DotProduct(a, b)
    case exprs => throw new IllegalArgumentException(
      s"graft_dot requires exactly 2 arguments, got ${exprs.length}")
  }

  /** Expression builder with a proper arity error. */
  private[functions] val buildL2Sq: Seq[Expression] => Expression = {
    case Seq(a, b) => L2Sq(a, b)
    case exprs => throw new IllegalArgumentException(
      s"graft_l2sq requires exactly 2 arguments, got ${exprs.length}")
  }

  /** Every (name, implementing expression class, builder) the engine
    * exposes to SQL — vector math plus the text sketch kernels, one list
    * shared by [[register]] and [[GraftExtensions]] so the two seams
    * cannot drift. The class is what DESCRIBE FUNCTION reports; it must
    * point at the EXPRESSION, not the registration plumbing. */
  private[functions] val sqlFunctions: Seq[(String, Class[_], Seq[Expression] => Expression)] = Seq(
    ("graft_dot", classOf[DotProduct], buildDot),
    ("graft_l2sq", classOf[L2Sq], buildL2Sq),
    ("graft_normalize_text", classOf[NormalizeText], TextFunctions.buildNormalizeText),
    ("graft_text_hash62", classOf[TextHash62], TextFunctions.buildTextHash62),
    ("graft_shingle_hashes", classOf[ShingleHashSet], TextFunctions.buildShingleHashes),
    ("graft_shingle_hash_seq", classOf[ShingleHashSeq], TextFunctions.buildShingleHashSeq),
    ("graft_minhash_sig", classOf[MinHashSig], TextFunctions.buildMinHashSig),
    ("graft_simhash62", classOf[SimHash62], TextFunctions.buildSimHash62),
    ("graft_redact_pii", classOf[RedactPii], TextFunctions.buildRedactPii),
    ("graft_lang_quality_stats", classOf[LangQualityStats],
      TextFunctions.buildLangQualityStats),
    ("graft_gopher_stats", classOf[GopherStats],
      TextFunctions.buildGopherStats))

  /** Register the engine's SQL functions on an existing session. */
  def register(spark: SparkSession): Unit =
    sqlFunctions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "scala_udf")
    }
}
