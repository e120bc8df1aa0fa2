package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Document fingerprint by k-gram rolling hash (winnowing-lite): the
  * MINIMUM of the polynomial hashes of every k-byte window,
  *
  *   h(w) = Σ byte_j · B^(k-1-j)  mod M    (B = 257, M = 1e9+7)
  *
  * computed in ONE O(n) pass with the classic Rabin–Karp rolling
  * update (add incoming byte, subtract outgoing·B^(k-1)) — not
  * O(n·k) window recomputation — inside whole-stage codegen. Two
  * documents sharing any k-gram window can collide on the min
  * fingerprint, which is exactly the near-dup signal winnowing uses.
  *
  * NULL for NULL input or input shorter than k bytes. The polynomial
  * value is canonical, so an O(n·k) reimplementation (the DuckDB
  * oracle) produces identical fingerprints.
  */
case class RollingMinHash(child: Expression, k: Int) extends UnaryExpression {

  override def prettyName: String = "rolling_min_hash"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && k >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (string, k >= 1), got (${child.dataType.catalogString}, k=$k)")

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val n = bytes.length
    if (n < k) return null
    val B = RollingMinHash.Base; val M = RollingMinHash.Mod
    // B^(k-1) mod M for the outgoing byte
    var bk1 = 1L; var p = 0
    while (p < k - 1) { bk1 = bk1 * B % M; p += 1 }
    var h = 0L; var i = 0
    while (i < k) { h = (h * B + (bytes(i) & 0xff)) % M; i += 1 }
    var min = h
    while (i < n) {
      h = ((h - (bytes(i - k) & 0xff) * bk1 % M + M) % M * B + (bytes(i) & 0xff)) % M
      if (h < min) min = h
      i += 1
    }
    min
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val n = ctx.freshName("n")
      val bk1 = ctx.freshName("bk1")
      val h = ctx.freshName("h")
      val min = ctx.freshName("min")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val B = RollingMinHash.Base; val M = RollingMinHash.Mod
      s"""
         |final byte[] $bytes = $c.getBytes();
         |final int $n = $bytes.length;
         |if ($n < $k) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $bk1 = 1L;
         |  for (int $p = 0; $p < ${k - 1}; $p++) { $bk1 = $bk1 * ${B}L % ${M}L; }
         |  long $h = 0L;
         |  int $i = 0;
         |  for (; $i < $k; $i++) { $h = ($h * ${B}L + ($bytes[$i] & 0xff)) % ${M}L; }
         |  long $min = $h;
         |  for (; $i < $n; $i++) {
         |    $h = (($h - ($bytes[$i - $k] & 0xff) * $bk1 % ${M}L + ${M}L) % ${M}L
         |          * ${B}L + ($bytes[$i] & 0xff)) % ${M}L;
         |    if ($h < $min) $min = $h;
         |  }
         |  ${ev.value} = $min;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingMinHash =
    copy(child = newChild)
}

object RollingMinHash {
  val Base = 257L
  val Mod = 1000000007L

  def apply(text: Column, k: Int): Column =
    GraftColumnBridge.column(RollingMinHash(GraftColumnBridge.expression(text), k))

  /** SQL registration: `rolling_min_hash(text, k)` (k a foldable
    * integer literal) — malformed calls get clean analysis-time
    * errors, not internal ClassCast/IndexOutOfBounds. */
  val registration: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("rolling_min_hash"),
    new ExpressionInfo(classOf[RollingMinHash].getName, "rolling_min_hash"),
    (children: Seq[Expression]) => {
      def bad(msg: String) =
        throw new IllegalArgumentException(s"rolling_min_hash(text, k): $msg")
      if (children.size != 2) bad(s"expects 2 arguments, got ${children.size}")
      if (!children(1).foldable) bad("k must be a literal")
      children(1).eval() match {
        case i: Int => RollingMinHash(children(0), i)
        case l: Long => RollingMinHash(children(0), l.toInt)
        case s: Short => RollingMinHash(children(0), s.toInt)
        case null => bad("k must not be NULL"); null
        case other => bad(s"k must be an integer, got $other"); null
      }
    })
}
