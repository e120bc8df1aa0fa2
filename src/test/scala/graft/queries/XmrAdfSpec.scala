package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTesting

/** XmR chart and ADF-screen invariants. */
class XmrAdfSpec extends AnyFunSuite {
  lazy val spark = SparkTesting.spark
  private def q(name: String) =
    graft.SparkEntry.queries(name)(spark, SparkTesting.sf)

  test("xmr_chart: limits bracket the center, violations recomputed for one type") {
    import spark.implicits._
    val rows = q("q_xmr_chart")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (et, n, ybar, mrbar, ucl, lcl, viol) =>
      assert(lcl < ybar && ybar < ucl, s"$et limits bracket the center")
      assert(mrbar > 0 && viol >= 0 && viol <= n)
      // 2.66 factor reconstruction within flooring slack
      assert(math.abs((ucl - ybar) - (ybar - lcl)) <= 2, s"$et symmetric limits")
    }
    val (et, _, _, _, ucl, lcl, viol) = rows.head
    val ys = graft.pipeline.Tables.t(spark, SparkTesting.sf, "events")
      .filter(col("event_type") === et)
      .groupBy(expr("div(unix_micros(date_trunc('day', ts)), 86400000000)"))
      .count().select("count").as[Long].collect()
    assert(viol == ys.count(y => 1000 * y > ucl || 1000 * y < lcl), s"$et")
  }

  test("adf_screen: phi negative (counts mean-revert), t consistent, stationary") {
    import spark.implicits._
    val rows = q("q_adf_screen").as[(String, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (et, n, phi, tMilli, nonstat) =>
      assert(n >= 10)
      // a stationary noisy-counts series mean-reverts: phi < 0 and
      // the unit root is rejected
      assert(phi < 0, s"$et phi=$phi")
      assert(tMilli < 0, s"$et t=$tMilli")
      assert(nonstat == (if (tMilli > -2860) 1L else 0L))
    }
  }
}
