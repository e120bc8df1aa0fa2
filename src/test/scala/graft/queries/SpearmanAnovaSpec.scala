package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTesting

/** Invariants for Spearman, ANOVA, and the shuffle advisor. */
class SpearmanAnovaSpec extends AnyFunSuite {
  lazy val spark = SparkTesting.spark
  private def q(name: String) =
    graft.SparkEntry.queries(name)(spark, SparkTesting.sf)
  private def tbl(name: String) =
    graft.pipeline.Tables.t(spark, SparkTesting.sf, name)

  test("spearman_daily: rho from a from-scratch rank computation") {
    import spark.implicits._
    val Array((n, sd2, rho)) = q("q_spearman_daily")
      .as[(Long, Long, Long)].collect()
    assert(rho >= -1000000 && rho <= 1000000)
    val cd = tbl("events")
      .groupBy(expr("div(unix_micros(date_trunc('day', ts)), 86400000000)")
        .as("d"))
      .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("x"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("y"))
      .as[(Long, Long, Long)].collect()
    assert(n == cd.length)
    def ranks(key: Array[(Long, Long)]): Map[Long, Long] =
      key.sortBy(p => (p._2, p._1)).zipWithIndex
        .map { case ((d, _), i) => d -> (i + 1L) }.toMap
    val rx = ranks(cd.map(r => (r._1, r._2)))
    val ry = ranks(cd.map(r => (r._1, r._3)))
    val want = cd.map(r => { val dd = rx(r._1) - ry(r._1); dd * dd }).sum
    assert(sd2 == want)
    assert(rho == 1000000L - 6000000L * sd2 / (n * (n * n - 1)))
  }

  test("anova_oneway: SS decomposition non-negative, F consistent with parts") {
    import spark.implicits._
    val Array((n, k, ssb, ssw, dfb, dfw, f)) = q("q_anova_oneway")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(k == 5 && dfb == k - 1 && dfw == n - k)
    assert(ssb >= 0 && ssw > 0, "variance decomposition sane")
    val want = math.floor(1000.0 * (ssb.toDouble * dfw) / (ssw.toDouble * dfb))
      .toLong
    assert(f == want)
  }

  test("shuffle_advisor: byte arithmetic exact, join stage sums the scans") {
    import spark.implicits._
    val rows = q("q_shuffle_advisor").as[(String, Long, Long, Long)].collect()
    val byS = rows.map(r => r._1 -> r).toMap
    val li = byS("scan_lineitem"); val or = byS("scan_orders")
    val j = byS("shuffle_join_orderkey")
    assert(li._2 == tbl("lineitem").count() && or._2 == tbl("orders").count())
    assert(li._3 == li._2 * 100 && or._3 == or._2 * 64)
    assert(j._3 == li._3 + or._3 && j._2 == li._2 + or._2)
    rows.foreach { r =>
      assert(r._4 == (r._3 + 134217727) / 134217728 && r._4 >= 1)
    }
  }
}
