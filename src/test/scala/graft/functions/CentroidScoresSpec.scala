package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTesting
import graft.sim.Similarity

/** Differential pin for the native CentroidScores expression (the
  * r13 fix for the k≈tens codegen cliff that made scale-correct IVF
  * cell counts SLOWER than the quadratic k=8 they replaced): the
  * native per-row (round(cosine,6), -cell) score array must equal
  * the composed per-centroid-literal form row for row — same
  * cosines, same 6-decimal HALF_UP round, same order — at a small k
  * (the composed form's codegen'd regime) and at a large k (its
  * interpreted-fallback regime), and ivfAssign's argmax must be
  * well-formed at the scaled operating point. */
class CentroidScoresSpec extends AnyFunSuite {
  lazy val spark = SparkTesting.spark

  private def embeddings = graft.pipeline.Tables
    .t(spark, SparkTesting.sf, "embeddings")
    .select(col("vec_id"), col("embedding").as("v"))

  private def centroids(k: Int) = embeddings
    .filter(col("vec_id") < k)
    .select(col("vec_id").as("cell"), col("v").as("centv"))

  /** Run `f` with codegen fully off — the PqEncodeSpec idiom: the
    * composed reference at k=80 is KNOWN to leave codegen anyway;
    * running it interpreted on purpose keeps the test log at zero
    * `ERROR CodeGenerator` lines while pinning identical semantics. */
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

  private def flat(rows: Array[Row]): Seq[(Long, Seq[(Double, Long)])] =
    rows.toSeq.map { r =>
      (r.getLong(0),
        r.getSeq[Row](1).map(s => (s.getDouble(0), s.getLong(1))))
    }.sortBy(_._1)

  for (k <- Seq(8, 80)) {
    test(s"native scores == composed scores, every row and slot, k=$k") {
      val e = embeddings
      val native = flat(
        Similarity.centroidScoresForTest(e, centroids(k), composed = false)
          .collect())
      val composed = withInterpreted {
        flat(Similarity.centroidScoresForTest(e, centroids(k), composed = true)
          .collect())
      }
      assert(native == composed,
        s"native CentroidScores diverged from the composed form at k=$k")
    }
  }

  test("ivfAssign well-formed at the scaled operating point (k=80)") {
    val e = embeddings.select(col("vec_id").as("cid"), col("v").as("cv"))
    val assigned = Similarity.ivfAssign(e, centroids(80))
    val n = e.count()
    assert(assigned.count() == n)
    assert(assigned.filter(col("cell") < 0 || col("cell") >= 80).count() == 0L)
    // a centroid may only be claimed away from itself by an exact
    // rounded-cosine tie with a SMALLER cell — never a larger one
    assert(assigned.filter(col("cid") < 80)
      .filter(col("cell") > col("cid")).count() == 0L)
  }

  // Off-contract inputs (r13 ADVICE): the embeddings contract keeps
  // lanes dense and fixed-width, so these rows are unreachable in the
  // live queries — but the expression's behavior there must be PINNED,
  // not incidental: a null element or a length-mismatched vector nulls
  // the ENTIRE score array (so ivfAssign would surface a null cell for
  // that row rather than silently scoring a truncated vector), and a
  // null input array is null-intolerant NULL. Both eval paths.
  test("off-contract inputs null the whole score array (codegen + interpreted)") {
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType, true))))
    val rows = Seq(
      Row(0, Seq(1.0, 0.0)),                       // on-contract: scores
      Row(1, null),                                // null array
      Row(2, Seq[Any](1.0, null)),                 // null element
      Row(3, Seq(1.0, 0.0, 5.0)),                  // too long
      Row(4, Seq(1.0))                             // too short
    )
    val df = spark.createDataFrame(rows.asJava, schema)
    val cells = Array(0L, 1L)
    val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    def scored(interpreted: Boolean) = {
      val run = () => df
        .select(col("id"), CentroidScores(col("v"), cells, cents).as("s"))
        .collect().map(r => (r.getInt(0), r.isNullAt(1))).toSeq.sortBy(_._1)
      if (interpreted) withInterpreted(run()) else run()
    }
    for (interp <- Seq(false, true)) {
      val got = scored(interp)
      assert(got == Seq((0, false), (1, true), (2, true), (3, true), (4, true)),
        s"off-contract null pinning broke (interpreted=$interp): $got")
    }
    // and the on-contract row's scores are the expected cosines
    val s = df.filter(col("id") === 0)
      .select(CentroidScores(col("v"), cells, cents).as("s"))
      .collect()(0).getSeq[Row](0).map(r => (r.getDouble(0), r.getLong(1)))
    assert(s == Seq((1.0, 0L), (0.0, -1L)))
  }

  test("native expression stays in whole-stage codegen at k=80") {
    // score surface, not ivfAssign: since r16 assignment at k >= the
    // hier cutover routes to HierCentroidAssign (its own codegen
    // witness lives in HierCentroidAssignSpec); CentroidScores still
    // carries flat small-k assignment and ivfProbeCells at any k
    val plan = Similarity
      .centroidScoresForTest(embeddings, centroids(80), composed = false)
      .queryExecution.executedPlan.toString()
    // the `*(n)` stage marker on the Project carrying centroid_scores
    // is the codegen witness (executedPlan pretty-print; a fallen-back
    // projection prints an unstarred `Project`)
    val projLines = SparkTesting.finalSection(plan).linesIterator
      .filter(_.contains("centroid_scores")).toSeq
    assert(projLines.nonEmpty, s"no centroid_scores projection in:\n$plan")
    assert(projLines.forall(_.contains("*(")),
      s"IVF assignment projection left whole-stage codegen:\n${projLines.mkString("\n")}")
  }
}
