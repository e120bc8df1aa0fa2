package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expression: TWO-LEVEL (hierarchical) IVF coarse
  * quantization — assign one vector to a cell by first picking its
  * highest-cosine META centroid among m ≈ √k of them, then its
  * highest-cosine cell among that meta's CHILD centroids. Returns the
  * winning child's cell id (LongType). See
  * [[graft.sim.Similarity.ivfAssign]] for the structure builder and
  * the cross-engine contract the DuckDB oracle mirrors relationally.
  *
  * Why it exists (the r15 sf1→sf10 decade's top finding): flat
  * assignment is N·k cosines, and with the scale-correct cell count
  * k = N/250 that is N²/250 — q_ann_cell_balance measured 75.7× on
  * 10× data. Capping k (r15's IvfCellCap=2048) bounded assignment but
  * let the within-cell PAIR term grow ∝N²/k past the cap. Two-level
  * assignment costs N·(m + k/m) ≈ N·2√k cosines, so k can keep
  * scaling with N (cell size pinned ~250, pair term linear): at
  * k = 262144 a row scores 1024 cosines instead of 262144.
  *
  * Same codegen rationale as [[CentroidScores]]: the meta matrix and
  * the flattened child structure ship as single reference objects
  * (constant generated-code size in k) and scoring is primitive
  * double loops — whole-stage codegen survives any k. Tie discipline
  * is the flat path's, applied per level: scores are
  * round(cosine, 6) ([[CentroidScores.round6]], the exact Round
  * arithmetic), argmax keeps the FIRST index on ties, and both the
  * meta array and each child segment are sorted by cell id ascending
  * — so ties break toward the smaller cell at both levels, exactly
  * the `ORDER BY cs DESC, cell` row_number()=1 the oracle writes.
  *
  * Null semantics (pinned, same as CentroidScores): null input array
  * → NULL (nullIntolerant); a null element or a length-mismatched
  * vector also nulls the result rather than scoring a truncated
  * vector — unreachable on the embeddings contract, covered by spec.
  *
  * @param child      the vector column (array<float|double>)
  * @param metas      m meta-centroid vectors, cell-id-ascending
  * @param childOff   m+1 offsets into the flattened child arrays;
  *                   meta i's children live in [childOff(i), childOff(i+1))
  * @param childCells flattened child cell ids, ascending within each
  *                   segment (every segment nonempty — a meta is
  *                   always its own child)
  * @param childVecs  flattened child centroid vectors, parallel to
  *                   childCells
  */
case class HierCentroidAssign(child: Expression,
                              metas: IndexedSeq[IndexedSeq[Double]],
                              childOff: IndexedSeq[Int],
                              childCells: IndexedSeq[Long],
                              childVecs: IndexedSeq[IndexedSeq[Double]])
    extends UnaryExpression {

  require(metas.nonEmpty, "need at least one meta centroid")
  require(childOff.length == metas.length + 1 && childOff.head == 0 &&
    childOff.last == childCells.length,
    "childOff must be m+1 offsets spanning the child arrays")
  require(childOff.sliding(2).forall(p => p(0) < p(1)),
    "every meta needs a nonempty child segment")
  require(childCells.length == childVecs.length,
    "childCells must parallel childVecs")
  require((metas ++ childVecs).forall(_.length == metas.head.length),
    "all centroid rows must share one dimensionality")

  override def prettyName: String = "hier_centroid_assign"

  /** Plan prints summarize the structure instead of dumping k·dim
    * doubles (at the 2¹⁸-cell cap the raw toString would be hundreds
    * of MB of text per EXPLAIN). Canonicalization/equality still use
    * the full case-class product, so semantic dedup is unaffected. */
  override def stringArgs: Iterator[Any] =
    Iterator(child, s"m=${metas.length}", s"k=${childCells.length}",
      s"dim=${metas.head.length}")

  override def dataType: DataType = LongType
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

  @transient private lazy val metaArr: Array[Array[Double]] =
    metas.map(_.toArray).toArray
  @transient private lazy val offArr: Array[Int] = childOff.toArray
  @transient private lazy val cellArr: Array[Long] = childCells.toArray
  @transient private lazy val childArr: Array[Array[Double]] =
    childVecs.map(_.toArray).toArray

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val dim = metaArr(0).length
    if (x.numElements() != dim) return null
    val lf = elemIsFloat
    val vec = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      if (x.isNullAt(i)) return null
      vec(i) = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      i += 1
    }
    val mi = HierCentroidAssign.argmaxRound6(vec, metaArr, 0, metaArr.length)
    val ci = HierCentroidAssign.argmaxRound6(vec, childArr,
      offArr(mi), offArr(mi + 1))
    cellArr(ci)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val metaRef = ctx.addReferenceObj("hierMetaMatrix", metaArr, "double[][]")
      val offRef = ctx.addReferenceObj("hierChildOff", offArr, "int[]")
      val cellRef = ctx.addReferenceObj("hierChildCells", cellArr, "long[]")
      val childRef = ctx.addReferenceObj("hierChildMatrix", childArr, "double[][]")
      val xGet = if (elemIsFloat) s"(double) $a.getFloat" else s"$a.getDouble"
      val dim = ctx.freshName("dim")
      val vec = ctx.freshName("vec")
      val bad = ctx.freshName("bad")
      val i = ctx.freshName("i")
      val mi = ctx.freshName("mi")
      val ci = ctx.freshName("ci")
      s"""
         |final int $dim = $metaRef[0].length;
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
         |  final int $mi = graft.functions.HierCentroidAssign.argmaxRound6(
         |    $vec, $metaRef, 0, $metaRef.length);
         |  final int $ci = graft.functions.HierCentroidAssign.argmaxRound6(
         |    $vec, $childRef, $offRef[$mi], $offRef[$mi + 1]);
         |  ${ev.value} = $cellRef[$ci];
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HierCentroidAssign =
    copy(child = newChild)
}

object HierCentroidAssign {

  /** Keep-first argmax of round6(cosine(vec, rows(i))) over
    * i ∈ [from, until) — the one scoring kernel both codegen and
    * interpreted eval call, and the same arithmetic the driver-side
    * centroid→meta grouping in Similarity uses: single-pass
    * dot/na/nb accumulation (bit-equal to [[CosineSim]] /
    * [[CentroidScores]]), then the exact `round(x, 6)` decimal.
    * Keep-first + cell-ascending row order = smaller-cell tiebreak.
    * NaN scores (a zero-norm vector or centroid: 0/0) rank GREATEST,
    * not never-selected: the flat path's struct array_max and the
    * oracle's ORDER BY cs DESC both put NaN above every real score,
    * so this kernel maps NaN → +∞ before the compare — all-NaN rows
    * then resolve keep-first = smallest cell on every engine face
    * (cosine over finite inputs can produce NaN but never ±∞: a zero
    * denominator forces a zero numerator). */
  def argmaxRound6(vec: Array[Double], rows: Array[Array[Double]],
                   from: Int, until: Int): Int = {
    var best = from
    var bestCs = java.lang.Double.NEGATIVE_INFINITY
    var c = from
    while (c < until) {
      val cent = rows(c)
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var j = 0
      while (j < vec.length) {
        val xi = vec(j); val yi = cent(j)
        dot += xi * yi; na += xi * xi; nb += yi * yi
        j += 1
      }
      val raw = CentroidScores.round6(dot / (math.sqrt(na) * math.sqrt(nb)))
      val cs = if (java.lang.Double.isNaN(raw))
        java.lang.Double.POSITIVE_INFINITY else raw
      if (cs > bestCs) { bestCs = cs; best = c }
      c += 1
    }
    best
  }

  /** Column-level entry point — see the case-class scaladoc for the
    * structure contract ([[graft.sim.Similarity.ivfAssign]] builds
    * it). */
  def apply(vec: Column, metas: Array[Array[Double]], childOff: Array[Int],
            childCells: Array[Long], childVecs: Array[Array[Double]]): Column =
    GraftColumnBridge.column(HierCentroidAssign(
      GraftColumnBridge.expression(vec),
      metas.map(_.toIndexedSeq).toIndexedSeq,
      childOff.toIndexedSeq,
      childCells.toIndexedSeq,
      childVecs.map(_.toIndexedSeq).toIndexedSeq))
}
