package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTesting
import graft.sim.Similarity

/** Differential pin: the native PqEncode expression must reproduce
  * the composed literal-tree encode row for row (including the
  * min-distance-then-min-code tie-break), and must stay inside
  * whole-stage codegen where the composed form falls back.
  */
class PqEncodeSpec extends AnyFunSuite {
  lazy val spark = SparkTesting.spark

  private def inputs() = {
    val e = graft.pipeline.Tables.t(spark, SparkTesting.sf, "embeddings")
      .select(col("vec_id"), Similarity.srpQuantize(col("embedding")).as("q"))
    val cb = e.filter(col("vec_id") < 16)
      .select(col("vec_id").as("code"), col("q").as("cq"))
    (e, cb)
  }

  test("native == composed, row for row") {
    val (e, cb) = inputs()
    val native = Similarity.pqCodes(e, cb, m = 8, dsub = 8)
    val composed = Similarity.pqCodesComposed(e, cb, m = 8, dsub = 8)
    assert(native.exceptAll(composed).count() == 0 &&
      composed.exceptAll(native).count() == 0,
      "PqEncode must reproduce the composed encode exactly")
  }

  test("self-encode: codebook vectors reconstruct at distance 0 to themselves") {
    val (e, cb) = inputs()
    val self = Similarity.pqCodes(e.filter(col("vec_id") < 16), cb, 8, 8)
    assert(self.filter(col("dist_pico2") =!= 0 || col("code") =!= col("vec_id"))
      .count() == 0)
  }

  test("ties break to the smallest code") {
    import spark.implicits._
    // two identical codewords (codes 3 and 7): every subspace must
    // pick 3
    val cb = Seq((3L, Seq.fill(16)(5L)), (7L, Seq.fill(16)(5L)))
      .toDF("code", "cq")
    val corpus = Seq((1L, Seq.fill(16)(9L))).toDF("vec_id", "q")
    val out = Similarity.pqCodes(corpus, cb, m = 2, dsub = 8).collect()
    assert(out.forall(_.getLong(2) == 3L), out.mkString(","))
  }

  test("the encode stays in whole-stage codegen (no fallback)") {
    val (e, cb) = inputs()
    val df = Similarity.pqCodes(e, cb, 8, 8)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // codegen stages print as "*(n)" in executedPlan.toString — the
    // composed form's codegen FAILS (Janino 64 KB) and every stage
    // falls back, which this native expression exists to eliminate
    assert(plan.contains("*("), plan)
  }
}
