package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTesting

/** MASE scorecard and Kadane peak-window invariants. */
class MasePeakSpec extends AnyFunSuite {
  lazy val spark = SparkTesting.spark
  private def q(name: String) =
    graft.SparkEntry.queries(name)(spark, SparkTesting.sf)

  private def dailySeries(et: String): Array[Long] = {
    import spark.implicits._
    graft.pipeline.Tables.t(spark, SparkTesting.sf, "events")
      .filter(col("event_type") === et)
      .groupBy(expr("div(unix_micros(date_trunc('day', ts)), 86400000000)")
        .as("d")).agg(count(lit(1)).as("y"))
      .as[(Long, Long)].collect().sortBy(_._1).map(_._2)
  }

  test("mase: error counts line up with lags, ratio recomputed for one type") {
    import spark.implicits._
    val rows = q("q_mase_seasonal_naive")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val (et, n1, e1, n7, e7, mase) = rows.head
    val ys = dailySeries(et)
    assert(n1 == ys.length - 1 && n7 == ys.length - 7)
    assert(e1 == ys.sliding(2).map { case Array(a, b) => math.abs(b - a) }.sum)
    assert(e7 == ys.indices.drop(7).map(i => math.abs(ys(i) - ys(i - 7))).sum)
    assert(mase == 1000000L * e7 * n1 / (e1 * n7))
  }

  test("peak_window: the reported peak equals the true max-subarray of residuals") {
    import spark.implicits._
    val rows = q("q_peak_window").as[(String, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (et, endD, peak, n) =>
      val ys = dailySeries(et)
      assert(n == ys.length)
      val sy = ys.sum
      val ep = ys.map(y => y * n - sy)
      // Kadane from scratch
      var best = Long.MinValue; var cur = 0L
      ep.foreach { e => cur = math.max(e, cur + e); best = math.max(best, cur) }
      assert(peak == best, s"$et peak")
      assert(peak > 0, s"$et residuals must have a positive stretch")
    }
  }
}
