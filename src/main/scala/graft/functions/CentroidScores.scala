package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expression: score one vector against a
  * driver-collected centroid matrix — for every centroid, the struct
  * `(cs = round(cosine(vec, centroid), 6), negCell = -cell)`, in
  * centroid input order. `array_max` over the result is the IVF
  * coarse-quantizer assignment (max cosine, smaller-cell tiebreak —
  * the negCell trick); `sort_array(..., desc)[1..nprobe]` is the
  * multi-probe cell list. See [[graft.sim.Similarity.ivfAssign]].
  *
  * Why custom (the [[PqLut]] rationale on the corpus-side hot path):
  * the composed form inlines k `struct(round(cosine_sim(v, <64-lane
  * literal>), 6), -cell)` nodes into one projection. Each CosineSim
  * is a tight codegen'd loop, but k of them wrapped in array(...)
  * make the generated consume path grow with k·dim — past the k≈10s
  * the projection silently leaves whole-stage codegen and every
  * cosine evaluates interpreted and boxed. Measured on the r13 sf1
  * sweep: k=8 assignment of 20k×64-dim vectors ≈ 0.4 s, k=80 ≈ 13 s
  * (30× for 10× k — the cliff, not the arithmetic; it made
  * q_dedup_embed_ann SLOWER after its cell count was scale-fixed to
  * k ∝ N). Here the matrix ships as ONE reference object (the same
  * transport a broadcast relation uses) and the scoring is two
  * primitive loops — constant generated-code size at any k, so the
  * 100 TB operating point (k ≈ N/250 cells) keeps whole-stage
  * codegen.
  *
  * Exactness: floats widen per element exactly as [[CosineSim]]
  * does (float×float accumulated in double is bit-equal to the
  * cast-to-double form), the accumulation order is the same single
  * pass, and the 6-decimal round is the same HALF_UP BigDecimal
  * Spark's `round` applies to doubles — CentroidScoresSpec pins the
  * native output row-for-row against the composed form on the test
  * corpus at k=8 and k=80.
  *
  * Null semantics: null input array → NULL result (nullIntolerant);
  * a null element or a length-mismatched vector also nulls the whole
  * result (the composed form would emit per-centroid null cs structs
  * there — unreachable on the embeddings contract, where lanes are
  * dense and fixed-width; the spec covers the live domain).
  */
case class CentroidScores(child: Expression, cells: IndexedSeq[Long],
                          centroids: IndexedSeq[IndexedSeq[Double]])
    extends UnaryExpression {

  require(cells.nonEmpty && cells.length == centroids.length,
    "cells must parallel the centroid matrix")
  require(centroids.forall(_.length == centroids.head.length),
    "centroid rows must share one dimensionality")

  override def prettyName: String = "centroid_scores"

  /** Plan prints summarize the matrix instead of dumping k·dim
    * doubles (k=800 at sf10 is ~1 MB of text per EXPLAIN).
    * Canonicalization/equality still use the full case-class
    * product, so semantic dedup is unaffected. */
  override def stringArgs: Iterator[Any] =
    Iterator(child, s"k=${cells.length}",
      s"dim=${centroids.head.length}")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("cs", DoubleType, nullable = true),
    StructField("negCell", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(t, _) if t == FloatType || t == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float|double>, got ${child.dataType.catalogString}")
  }

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient private lazy val cents: Array[Array[Double]] =
    centroids.map(_.toArray).toArray
  @transient private lazy val negCells: Array[Long] = cells.map(-_).toArray

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val dim = cents(0).length
    if (x.numElements() != dim) return null
    val lf = elemIsFloat
    val vec = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      if (x.isNullAt(i)) return null
      vec(i) = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      i += 1
    }
    val out = new Array[Any](cents.length)
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var j = 0
      while (j < dim) {
        val xi = vec(j); val yi = cent(j)
        dot += xi * yi; na += xi * xi; nb += yi * yi
        j += 1
      }
      val cs = CentroidScores.round6(dot / (math.sqrt(na) * math.sqrt(nb)))
      out(c) = org.apache.spark.sql.catalyst.InternalRow(cs, negCells(c))
      c += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val centsRef = ctx.addReferenceObj("centroidMatrix", cents, "double[][]")
      val negRef = ctx.addReferenceObj("centroidNegCells", negCells, "long[]")
      val xGet = if (elemIsFloat) s"(double) $a.getFloat" else s"$a.getDouble"
      val dim = ctx.freshName("dim")
      val vec = ctx.freshName("vec")
      val bad = ctx.freshName("bad")
      val out = ctx.freshName("out")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val cent = ctx.freshName("cent")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val cs = ctx.freshName("cs")
      s"""
         |final int $dim = $centsRef[0].length;
         |boolean $bad = ($a.numElements() != $dim);
         |final double[] $vec = new double[$dim];
         |if (!$bad) {
         |  for (int $i = 0; $i < $dim; $i++) {
         |    if ($a.isNullAt($i)) { $bad = true; break; }
         |    $vec[$i] = $xGet($i);
         |  }
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  Object[] $out = new Object[$centsRef.length];
         |  for (int $c = 0; $c < $centsRef.length; $c++) {
         |    final double[] $cent = $centsRef[$c];
         |    double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |    for (int $j = 0; $j < $dim; $j++) {
         |      final double $xi = $vec[$j];
         |      final double $yi = $cent[$j];
         |      $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |    }
         |    final double $cs = graft.functions.CentroidScores.round6(
         |      $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb)));
         |    $out[$c] = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |      new Object[]{(Double) $cs, (Long) $negRef[$c]});
         |  }
         |  ${ev.value} =
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CentroidScores =
    copy(child = newChild)
}

object CentroidScores {
  /** The exact arithmetic Spark's `round(x, 6)` applies to a DOUBLE
    * column (Round/RoundBase on DoubleType): decimal HALF_UP on the
    * shortest-repr BigDecimal of the value. NaN/±Inf pass through
    * untouched, as Round's code path never reaches setScale for
    * non-finite doubles (it would throw) — they cannot occur on the
    * embeddings contract (norms > 0), but the guard keeps the
    * expression total. */
  def round6(x: Double): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else BigDecimal(x).setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP)
      .toDouble

  /** Column-level entry point; `cells(c)` is the cell id of
    * `centroids(c)` (already widened to double — exact for float
    * sources). */
  def apply(vec: Column, cells: Array[Long],
            centroids: Array[Array[Double]]): Column =
    GraftColumnBridge.column(CentroidScores(GraftColumnBridge.expression(vec),
      cells.toIndexedSeq, centroids.map(_.toIndexedSeq).toIndexedSeq))
}
