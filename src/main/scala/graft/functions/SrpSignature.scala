package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expression: the 32-plane signed-random-projection
  * LSH signature of a numeric vector (`array<float|double>`), fused
  * into ONE primitive loop — per-element micro-quantization
  * (qᵢ = floor(xᵢ·10⁶ + 0.5)), the integer-LCG hyperplane
  * coefficients, the per-plane BIGINT dots, and the sign-bit pack all
  * happen inside generated code.
  *
  * Why custom (SURVEY.md §2.10 preference order): the compositional
  * form ([[graft.sim.Similarity.srpSignatureComposed]]) nests
  * `aggregate(sequence, aggregate(sequence, …))` — higher-order
  * functions are `CodegenFallback` in Spark, so every row pays
  * planes×dims (= 2048 at 64 dims) boxed lambda invocations plus two
  * materialized index arrays. Here the same arithmetic is a pair of
  * primitive loops; the quantized values are computed once into a
  * stack `long[]` and reused across all 32 planes. Numerically the
  * two forms are IDENTICAL (same IEEE multiply+add+floor per lane,
  * same 64-bit integer ops; differential-pinned in SrpSignatureSpec)
  * — except for null ELEMENTS, where the compositional form's
  * `when(null ≥ 0)` silently treats the plane dot as negative while
  * this expression returns NULL for the whole signature (the sane
  * contract; the quantization discipline requires non-null lanes).
  *
  * Coefficients: c(p,i) = (1103515245·(p·64 + i) + 12345) mod 2048 −
  * 1024, operands non-negative before the mod — the same shared
  * integer LCG the DuckDB oracles interpolate, so any engine
  * reproduces signatures bit-for-bit. Magnitudes: |c| ≤ 1024,
  * |q| ≤ 6·10⁵ at the testdata value range, 64 lanes ⇒ the plane dot
  * stays far inside a long.
  */
case class SrpSignature(child: Expression) extends UnaryExpression {

  override def prettyName: String = "srp_signature"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(t, _) if t == FloatType || t == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case _ =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<float|double>, got ${child.dataType.catalogString}")
  }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val lf = elemIsFloat
    val qs = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      val xi = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      qs(i) = math.floor(xi * 1000000.0 + 0.5).toLong
      i += 1
    }
    var sig = 0L
    var p = 0
    while (p < SrpSignature.Planes) {
      var acc = 0L
      var j = 0
      val base = p * SrpSignature.Stride
      while (j < n) {
        acc += ((1103515245L * (base + j) + 12345L) % 2048L - 1024L) * qs(j)
        j += 1
      }
      if (acc >= 0L) sig |= 1L << p
      p += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val xGet = if (elemIsFloat) s"(double) $a.getFloat" else s"$a.getDouble"
      val n = ctx.freshName("n")
      val qs = ctx.freshName("qs")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      val base = ctx.freshName("base")
      val sig = ctx.freshName("sig")
      s"""
         |final int $n = $a.numElements();
         |final long[] $qs = new long[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $qs[$i] = (long) java.lang.Math.floor($xGet($i) * 1000000.0 + 0.5);
         |}
         |if (!${ev.isNull}) {
         |  long $sig = 0L;
         |  for (int $p = 0; $p < ${SrpSignature.Planes}; $p++) {
         |    long $acc = 0L;
         |    final long $base = (long) $p * ${SrpSignature.Stride}L;
         |    for (int $j = 0; $j < $n; $j++) {
         |      $acc += ((1103515245L * ($base + $j) + 12345L) % 2048L - 1024L) * $qs[$j];
         |    }
         |    if ($acc >= 0L) $sig |= 1L << $p;
         |  }
         |  ${ev.value} = $sig;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SrpSignature =
    copy(child = newChild)
}

object SrpSignature {
  /** Signature bits / hyperplane count (matches the oracle SQL). */
  val Planes = 32
  /** Coefficient-table stride: 64 lanes per plane (testdata width). */
  val Stride = 64

  /** Column-level entry point. */
  def apply(vec: Column): Column =
    GraftColumnBridge.column(SrpSignature(GraftColumnBridge.expression(vec)))

  /** Registration triple for `injectFunction` — SQL name
    * `srp_signature(vec)`. */
  val registration: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("srp_signature"),
    new ExpressionInfo(classOf[SrpSignature].getName, "srp_signature"),
    (children: Seq[Expression]) => SrpSignature(children(0)))
}
