package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTesting
import graft.sim.Similarity

/** Pins the r16 two-level IVF assignment — the fix for the r15
  * decade's N²/250 flat-assignment flags — against an INDEPENDENT
  * reference: a test-local reimplementation of the spec (score all
  * metas, pick max round-6 cosine with smaller-cell tiebreak, then
  * the same over that meta's children) written with BigDecimal
  * rounding and explicit tie logic, not the expression's kernel.
  * Covers both eval regimes (codegen + interpreted), structure
  * invariants, the flat-below-cutover guarantee that keeps tested-SF
  * artifacts bit-identical, off-contract null pinning, and the
  * whole-stage-codegen witness at the scaled operating point. */
class HierCentroidAssignSpec extends AnyFunSuite {
  lazy val spark = SparkTesting.spark

  private def embeddings = graft.pipeline.Tables
    .t(spark, SparkTesting.sf, "embeddings")
    .select(col("vec_id"), col("embedding").as("v"))

  private def centroids(k: Int) = embeddings
    .filter(col("vec_id") < k)
    .select(col("vec_id").as("cell"), col("v").as("centv"))

  private def withInterpreted[T](f: => T): T = {
    val conf = spark.conf
    val prevWS = conf.get("spark.sql.codegen.wholeStage", "true")
    val prevFM = conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    conf.set("spark.sql.codegen.wholeStage", "false")
    conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try f finally {
      conf.set("spark.sql.codegen.wholeStage", prevWS)
      conf.set("spark.sql.codegen.factoryMode", prevFM)
    }
  }

  // ---- independent reference implementation (test-local) ----

  private def refCos6(a: Seq[Double], b: Seq[Double]): Double = {
    val dot = a.zip(b).map { case (x, y) => x * y }.sum
    val na = a.map(x => x * x).sum
    val nb = b.map(y => y * y).sum
    CentroidScores.round6(dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  /** smaller-cell argmax: max score, then min cell among the maxima */
  private def refPick(v: Seq[Double], cands: Seq[(Long, Seq[Double])]): Long = {
    val scored = cands.map { case (cell, cv) => (cell, refCos6(v, cv)) }
    val best = scored.map(_._2).max
    scored.filter(_._2 == best).map(_._1).min
  }

  /** the two-level spec, end to end, from raw (cell, vec) pairs */
  private def refAssign(v: Seq[Double], cents: Seq[(Long, Seq[Double])],
                        m: Int): Long = {
    val sorted = cents.sortBy(_._1)
    val metas = sorted.take(m)
    // centroid -> meta: a meta is its own child; others join best meta
    val groups = sorted.map { case (cell, cv) =>
      val mcell = if (metas.exists(_._1 == cell)) cell else refPick(cv, metas)
      (cell, cv, mcell)
    }
    val bestMeta = refPick(v, metas)
    refPick(v, groups.filter(_._3 == bestMeta).map(g => (g._1, g._2)))
  }

  test("hier structure well-formed at k=80: m=9, a partition, metas lead") {
    val e = embeddings.collect().map(r =>
      (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    val cents = e.filter(_._1 < 80)
    val (metas, off, childCells, childVecs) =
      Similarity.hierStructure(cents.map(_._1), cents.map(_._2))
    assert(metas.length === 9)
    assert(off.length === 10 && off.head === 0 && off.last === 80)
    assert(childCells.length === 80 && childVecs.length === 80)
    // partition of all 80 cells
    assert(childCells.sorted.toSeq === (0L until 80L))
    // each segment is nonempty, cell-ascending, and led by its meta
    for (g <- 0 until 9) {
      val seg = childCells.slice(off(g), off(g + 1))
      assert(seg.nonEmpty, s"meta $g has no children")
      assert(seg.toSeq === seg.sorted.toSeq, s"segment $g not ascending")
      assert(seg.head === g.toLong, s"meta $g does not lead its own segment")
    }
  }

  for (interp <- Seq(false, true)) {
    test(s"ivfAssign(k=80) == independent two-level reference " +
        s"(interpreted=$interp)") {
      val run = () => Similarity.ivfAssign(
        embeddings.select(col("vec_id").as("cid"), col("v").as("cv")),
        centroids(80))
        .select("cid", "cell").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val got = if (interp) withInterpreted(run()) else run()
      val rows = embeddings.collect().map(r =>
        (r.getLong(0), r.getSeq[Float](1).map(_.toDouble)))
      val cents: Seq[(Long, Seq[Double])] =
        rows.filter(_._1 < 80).map { case (id, v) => (id, v: Seq[Double]) }.toSeq
      var checked = 0
      rows.foreach { case (id, v) =>
        val want = refAssign(v, cents, m = 9)
        assert(got(id) === want, s"vec $id: engine=${got(id)} ref=$want")
        checked += 1
      }
      assert(checked === rows.length && checked > 0)
    }
  }

  test("flat below the cutover: k=8 assignment is the plain argmax " +
      "(tested-SF bit-identity guarantee)") {
    val corpus = embeddings.select(col("vec_id").as("cid"), col("v").as("cv"))
    val got = Similarity.ivfAssign(corpus, centroids(8))
      .select("cid", "cell").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = embeddings.collect().map(r =>
      (r.getLong(0), r.getSeq[Float](1).map(_.toDouble)))
    val cents: Seq[(Long, Seq[Double])] =
      rows.filter(_._1 < 8).map { case (id, v) => (id, v: Seq[Double]) }.toSeq
    rows.foreach { case (id, v) =>
      assert(got(id) === refPick(v, cents), s"flat assignment moved for $id")
    }
    // and the plan carries the flat expression, not the hierarchical one
    val plan = Similarity.ivfAssign(corpus, centroids(8))
      .queryExecution.executedPlan.toString()
    assert(plan.contains("centroid_scores") &&
      !plan.contains("hier_centroid_assign"),
      s"k=8 must stay on the flat path:\n$plan")
  }

  test("off-contract inputs null the cell (codegen + interpreted)") {
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType, true))))
    val rows = Seq(
      Row(0, Seq(1.0, 0.0)),        // on-contract
      Row(1, null),                 // null array
      Row(2, Seq[Any](1.0, null)),  // null element
      Row(3, Seq(1.0, 0.0, 5.0)),   // too long
      Row(4, Seq(1.0)))             // too short
    val df = spark.createDataFrame(rows.asJava, schema)
    // 2 metas, each its own only child: cells (0,1)
    val expr = HierCentroidAssign(col("v"),
      Array(Array(1.0, 0.0), Array(0.0, 1.0)), Array(0, 1, 2),
      Array(0L, 1L), Array(Array(1.0, 0.0), Array(0.0, 1.0)))
    def run(interp: Boolean) = {
      val f = () => df.select(col("id"), expr.as("cell"))
        .collect().map(r => (r.getInt(0),
          if (r.isNullAt(1)) -999L else r.getLong(1))).toSeq.sortBy(_._1)
      if (interp) withInterpreted(f()) else f()
    }
    for (interp <- Seq(false, true)) {
      assert(run(interp) ===
        Seq((0, 0L), (1, -999L), (2, -999L), (3, -999L), (4, -999L)),
        s"off-contract pinning broke (interpreted=$interp)")
    }
  }

  test("zero-norm vector (all-NaN scores): hier picks the smallest cell, " +
      "matching the flat path and the oracle's ORDER BY cs DESC") {
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("cid",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("cv",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType, false))))
    val df = spark.createDataFrame(
      Seq(Row(0L, Seq(0.0, 0.0)), Row(1L, Seq(0.0, 1.0))).asJava, schema)
    // metas = cells (3, 7); 3's children = (3, 5), 7's = (7)
    val hier = HierCentroidAssign(col("cv"),
      Array(Array(1.0, 0.0), Array(0.0, 1.0)), Array(0, 2, 3),
      Array(3L, 5L, 7L),
      Array(Array(1.0, 0.0), Array(0.5, 0.5), Array(0.0, 1.0)))
    for (interp <- Seq(false, true)) {
      val f = () => df.select(col("cid"), hier.as("cell")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val got = if (interp) withInterpreted(f()) else f()
      // zero vector: every cosine is NaN -> NaN-as-greatest keep-first
      // = first meta (cell 3), then its first child (cell 3)
      assert(got(0L) === 3L, s"zero vector must land in the smallest cell " +
        s"(interpreted=$interp), got ${got(0L)}")
      // a real vector is unaffected by the NaN mapping
      assert(got(1L) === 7L, s"real vector drifted (interpreted=$interp)")
    }
    // the flat CentroidScores path agrees: all-NaN struct array_max
    // resolves to max negCell = smallest cell
    val flat = df.select(col("cid"),
      (-array_max(CentroidScores(col("cv"), Array(3L, 5L, 7L),
        Array(Array(1.0, 0.0), Array(0.5, 0.5), Array(0.0, 1.0))))
        .getField("negCell")).as("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(flat(0L) === 3L, "flat path zero-vector cell diverged from hier")
  }

  test("stays in whole-stage codegen at the scaled operating point (k=80)") {
    val plan = Similarity.ivfAssign(
      embeddings.select(col("vec_id").as("cid"), col("v").as("cv")),
      centroids(80))
      .queryExecution.executedPlan.toString()
    val projLines = SparkTesting.finalSection(plan).linesIterator
      .filter(_.contains("hier_centroid_assign")).toSeq
    assert(projLines.nonEmpty, s"no hier_centroid_assign projection in:\n$plan")
    assert(projLines.forall(_.contains("*(")),
      s"two-level assignment left whole-stage codegen:\n${projLines.mkString("\n")}")
    // and it stays a narrow zero-shuffle projection
    assert(!plan.contains("Exchange"),
      "two-level assignment must not shuffle")
  }
}
