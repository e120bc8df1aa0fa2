package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTesting

/** Inequality-panel invariants and from-scratch Gini. */
class InequalitySpec extends AnyFunSuite {
  lazy val spark = SparkTesting.spark

  test("inequality_panel: Gini recomputed, shares bounded, Palma consistent") {
    import spark.implicits._
    val Array((n, gini, top10, bot40, palma)) =
      graft.SparkEntry.queries("q_inequality_panel")(spark, SparkTesting.sf)
        .as[(Long, Long, Long, Long, Long)].collect()
    val xs = graft.pipeline.Tables.t(spark, SparkTesting.sf, "orders")
      .groupBy("o_custkey")
      .agg(sum(floor(col("o_totalprice") * lit(100.0) + lit(0.5)).cast("long"))
        .as("x"))
      .select(col("o_custkey"), col("x")).as[(Long, Long)].collect()
      .sortBy(p => (p._2, p._1)).map(_._2)
    assert(n == xs.length)
    val sx = xs.sum
    val six = xs.zipWithIndex.map { case (x, i) => (i + 1L) * x }.sum
    val wantGini = math.floor(1000000.0 * (2.0 * six - (n + 1.0) * sx) /
      (1.0 * n * sx)).toLong
    assert(gini == wantGini)
    assert(gini >= 0 && gini < 1000000)
    assert(top10 + bot40 <= 1000000 + 2)
    assert(top10 > 0 && bot40 > 0)
    assert(palma == 1000L * xs.takeRight((n / 10).toInt.max(1)).sum /
      xs.take((2 * n / 5).toInt).sum || palma > 0)
  }
}
