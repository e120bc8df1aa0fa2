package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTesting

/** Shift-share reconciliation and dedup-savings invariants. */
class ShiftShareSpec extends AnyFunSuite {
  lazy val spark = SparkTesting.spark
  private def q(name: String) =
    graft.SparkEntry.queries(name)(spark, SparkTesting.sf)
  private def tbl(name: String) =
    graft.pipeline.Tables.t(spark, SparkTesting.sf, name)

  test("shift_share: three components reconcile to the exact delta within flooring slack") {
    import spark.implicits._
    val rows = q("q_shift_share").as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (nk, delta, national, mix, competitive) =>
      val walk = national + mix + competitive
      // each (nation, industry) cell floors at most 3 terms by 1 cent
      assert(math.abs(walk - delta) <= 3 * 6 + 3,
        s"nation $nk: walk $walk vs delta $delta")
    }
  }

  test("dedup_savings: accounting identities hold against the corpus") {
    import spark.implicits._
    val Array((nDocs, nClusters, nDups, totalChars, dropped, ppm)) =
      q("q_dedup_savings").as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(nDocs == tbl("documents").count())
    assert(nClusters ==
      tbl("documents").select(md5(col("text"))).distinct().count())
    assert(nDups == nDocs - nClusters)
    assert(totalChars ==
      tbl("documents").agg(sum("n_chars")).as[Long].head())
    assert(dropped >= 0 && dropped < totalChars)
    assert(ppm == 1000000L * dropped / totalChars)
  }
}
