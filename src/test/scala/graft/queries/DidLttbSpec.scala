package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTesting

/** Invariants for diff-in-diff, LTOB downsampling, and rare-label
  * collapse: cell arithmetic, triangle argmax, share partitioning.
  */
class DidLttbSpec extends AnyFunSuite {
  lazy val spark = SparkTesting.spark
  private def q(name: String) =
    graft.SparkEntry.queries(name)(spark, SparkTesting.sf)
  private def tbl(name: String) =
    graft.pipeline.Tables.t(spark, SparkTesting.sf, name)

  test("did_lift: four cells populated, DiD is exactly the cell arithmetic") {
    import spark.implicits._
    val Array((cp, cq, tp, tq, did)) =
      q("q_did_lift").as[(Long, Long, Long, Long, Long)].collect()
    Seq(cp, cq, tp, tq).foreach(r => assert(r >= 0 && r <= 1000000))
    assert(did == (tq - tp) - (cq - cp))
  }

  test("lttb_downsample: one pick per interior bucket, the pick maximizes area") {
    import spark.implicits._
    val rows = q("q_lttb_downsample").as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.map(_._1).distinct.length == rows.length, "one point per bucket")
    // recompute from scratch
    val daily = tbl("events")
      .groupBy(expr("div(unix_micros(date_trunc('day', ts)), 86400000000)")
        .as("x")).agg(count(lit(1)).as("y"))
      .as[(Long, Long)].collect().sortBy(_._1)
    val byB = daily.groupBy { case (x, _) => x / 5 }
    val means = byB.map { case (b, pts) =>
      b -> (pts.map(_._1).sum / pts.length, pts.map(_._2).sum / pts.length)
    }
    rows.foreach { case (b, dnum, y, area2) =>
      val (mxp, myp) = means(b - 1); val (mxn, myn) = means(b + 1)
      val areas = byB(b).map { case (x, yy) =>
        (x, yy, math.abs((mxp - x) * (myn - yy) - (mxn - x) * (myp - yy)))
      }
      val best = areas.maxBy(a => (a._3, -a._1))
      assert((dnum, y, area2) == best, s"bucket $b pick")
    }
    // interior buckets only
    val bs = byB.keys.toSeq.sorted
    assert(rows.map(_._1).sorted.toSeq == bs.drop(1).dropRight(1))
  }

  test("rare_label_collapse: en survives, tail folds, shares sum to the pie") {
    import spark.implicits._
    val rows = q("q_rare_label_collapse").as[(String, Long, Long, Long)].collect()
    assert(rows.map(_._1).contains("en") && rows.map(_._1).contains("OTHER"))
    assert(rows.map(_._2).sum == tbl("documents").count())
    val other = rows.find(_._1 == "OTHER").get
    assert(other._4 >= 2, "OTHER absorbed several source labels")
    rows.filter(_._1 != "OTHER").foreach { r =>
      assert(r._3 >= 200000, s"surviving label ${r._1} meets the threshold")
      assert(r._4 == 1)
    }
    assert(rows.map(_._3).sum <= 1000000)
  }
}
