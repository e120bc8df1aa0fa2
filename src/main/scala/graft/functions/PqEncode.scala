package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expression: product-quantization encode of a
  * micro-quantized vector (`array<long>`) against a driver-collected
  * codebook — for each of `m` subspaces, the argmin-by-(distance,
  * code) codeword and its integer squared-L2 reconstruction error,
  * returned as `array<struct<sub_j, code, dist_pico2>>`.
  *
  * Why custom (SURVEY.md §2.10 preference order, the
  * [[SrpSignature]] rationale at a larger scale): the compositional
  * encode ([[graft.sim.Similarity.pqCodesComposed]]) inlines
  * m·k·dsub (= 1024 at 8×16×8) element_at/multiply nodes plus k
  * struct literals per subspace into ONE projection under a
  * Generate — past Janino's 64 KB method limit, so whole-stage
  * codegen FAILS and every corpus row walks a ~5000-node interpreted
  * tree (the round-8 bench regression: 10–30 s per PQ query at
  * sf0.1). Here the same arithmetic is three primitive loops over a
  * `long[][]` codebook shipped once per task as a codegen reference
  * object; the generated method is a few hundred bytes regardless of
  * m·k·dsub. Semantics are IDENTICAL including tie-breaks (min
  * distance, then min code — the `array_min` struct ordering the
  * composed form relies on; differential-pinned in PqEncodeSpec).
  *
  * Magnitudes: micro-quantized lanes are |q| ≤ ~10⁶, so a subspace
  * distance is ≤ dsub·(2·10⁶)² ≈ 3·10¹³ — far inside a long.
  */
case class PqEncode(child: Expression, codes: IndexedSeq[Long],
                    codebook: IndexedSeq[IndexedSeq[Long]],
                    m: Int, dsub: Int) extends UnaryExpression {

  require(codebook.nonEmpty && codebook.forall(_.length == m * dsub),
    s"codebook entries must have m*dsub = ${m * dsub} lanes")
  require(codes.length == codebook.length && codes.sorted == codes,
    "codes must parallel the codebook, ascending — argmin ties break " +
      "to the smallest CODE, which equals the smallest index only when sorted")

  override def prettyName: String = "pq_encode"

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("sub_j", LongType, nullable = false),
    StructField("code", LongType, nullable = false),
    StructField("dist_pico2", LongType, nullable = false))), containsNull = false)

  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<bigint>, got ${child.dataType.catalogString}")
  }

  /** Codebook as a primitive [k][m·dsub] matrix for the hot loop /
    * codegen reference object. */
  @transient private lazy val cb: Array[Array[Long]] =
    codebook.map(_.toArray).toArray
  @transient private lazy val codeVals: Array[Long] = codes.toArray

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    if (x.numElements() < m * dsub) return null
    val out = new Array[Any](m)
    var j = 0
    while (j < m) {
      var bestD = Long.MaxValue
      var bestC = -1
      var c = 0
      while (c < cb.length) {
        var d = 0L
        var i = 0
        val base = j * dsub
        while (i < dsub) {
          val diff = x.getLong(base + i) - cb(c)(base + i)
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; bestC = c }
        c += 1
      }
      out(j) = InternalRow(j.toLong, codeVals(bestC), bestD)
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cbRef = ctx.addReferenceObj("pqCodebook", cb, "long[][]")
      val codesRef = ctx.addReferenceObj("pqCodes", codeVals, "long[]")
      val out = ctx.freshName("out")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val diff = ctx.freshName("diff")
      val bestD = ctx.freshName("bestD")
      val bestC = ctx.freshName("bestC")
      val base = ctx.freshName("base")
      val row = ctx.freshName("row")
      s"""
         |if ($a.numElements() < ${m * dsub}) { ${ev.isNull} = true; } else {
         |  Object[] $out = new Object[$m];
         |  for (int $j = 0; $j < $m; $j++) {
         |    long $bestD = Long.MAX_VALUE; int $bestC = -1;
         |    final int $base = $j * $dsub;
         |    for (int $c = 0; $c < $cbRef.length; $c++) {
         |      long $d = 0L;
         |      for (int $i = 0; $i < $dsub; $i++) {
         |        final long $diff = $a.getLong($base + $i) - $cbRef[$c][$base + $i];
         |        $d += $diff * $diff;
         |      }
         |      if ($d < $bestD) { $bestD = $d; $bestC = $c; }
         |    }
         |    Object[] $row = new Object[]{(long) $j, $codesRef[$bestC], $bestD};
         |    $out[$j] = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow($row);
         |  }
         |  ${ev.value} =
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

object PqEncode {
  /** Column-level entry point. `codebook(c)` must be codeword c's
    * m·dsub quantized lanes — tie-break on equal distances is the
    * SMALLEST code index, so order the codebook by code before
    * calling. */
  def apply(vec: Column, codes: Array[Long], codebook: Array[Array[Long]],
            m: Int, dsub: Int): Column =
    GraftColumnBridge.column(PqEncode(GraftColumnBridge.expression(vec),
      codes.toIndexedSeq, codebook.map(_.toIndexedSeq).toIndexedSeq, m, dsub))
}
