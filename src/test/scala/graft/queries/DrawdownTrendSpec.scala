package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTesting

/** Invariant + plan-shape checks for the Q9 profit rollup, max
  * drawdown, gaps-and-islands streaks, and Theil–Sen trend slope.
  * Value-level correctness is the DuckDB oracle's job; these lock
  * independent recomputations of the window/pair semantics and the
  * scale-critical plan shapes (broadcast-only dims on Q9, no
  * cartesian in the Theil–Sen pair stage).
  */
class DrawdownTrendSpec extends AnyFunSuite {
  lazy val spark = SparkTesting.spark
  private def q(name: String) =
    graft.SparkEntry.queries(name)(spark, SparkTesting.sf)
  private def tbl(name: String) =
    graft.pipeline.Tables.t(spark, SparkTesting.sf, name)

  test("profit_nation_year: dims broadcast, profit parses, line count conserved") {
    import spark.implicits._
    val df = q("q_profit_nation_year")
    val rows = df.as[(String, Long, String, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (n, y, profit, nl) =>
      assert(y >= 1995 && y <= 2001, s"$n/$y")
      assert(nl > 0)
      BigDecimal(profit) // must parse exactly
    }
    val expected = tbl("lineitem")
      .join(tbl("part").filter(col("p_type") === "STANDARD").select("p_partkey"),
        col("l_partkey") === col("p_partkey")).count()
    assert(rows.map(_._4).sum == expected, "every STANDARD-part line lands in one bucket")
    val plan = { df.collect(); df.queryExecution.executedPlan.toString }
    assert(plan.contains("BroadcastHashJoin"), s"dims must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("max_drawdown: non-negative, NONZERO somewhere, conserved count, recomputed") {
    import spark.implicits._
    val rows = q("q_max_drawdown").as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_._2 >= 0), "drawdown is peak minus trough, never negative")
    // the advisor-r9 regression guard: the old peak-over-cum_cents
    // window made drawdown structurally 0 for ANY input; with 'F'
    // orders counting negative the net-flow curve must actually dip
    assert(rows.exists(_._2 > 0), "signed net flow must produce a real drawdown")
    assert(rows.map(_._3).sum == tbl("orders").count())
    // independent recomputation for the customer with the most orders
    val ck = rows.maxBy(_._3)._1
    val cum = tbl("orders").filter(col("o_custkey") === ck)
      .select(col("o_orderdate"), col("o_orderkey"),
        (when(col("o_orderstatus") === "F", lit(-1L)).otherwise(lit(1L)) *
          floor(col("o_totalprice") * lit(100.0) + lit(0.5)).cast("long")).as("cents"))
      .as[(java.sql.Timestamp, Long, Long)].collect()
      .sortBy(r => (r._1.getTime, r._2)).map(_._3)
      .scanLeft(0L)(_ + _).drop(1)
    val dd = cum.zip(cum.scanLeft(Long.MinValue)(math.max).drop(1))
      .map { case (c, peak) => peak - c }.max
    assert(rows.find(_._1 == ck).get._2 == dd, s"customer $ck drawdown")
  }

  test("streak_longest: bounds hold, one user's islands recomputed") {
    import spark.implicits._
    val rows = q("q_streak_longest").as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (u, best, days) =>
      assert(best >= 1 && best <= days, s"user $u")
      assert(days <= 31, "one month of testdata")
    }
    val u = rows.head._1
    val ds = tbl("events").filter(col("user_id") === u)
      .select(expr("div(unix_micros(date_trunc('day', ts)), 86400000000)").as("d"))
      .distinct().as[Long].collect().sorted
    val best = ds.foldLeft((0L, 0L, Long.MinValue)) { case ((b, run, prev), d) =>
      val r = if (d == prev + 1) run + 1 else 1L
      (math.max(b, r), r, d)
    }._1
    assert(rows.find(_._1 == u).get._2 == best, s"user $u best streak")
  }

  test("theil_sen: slope consistent with the median pair, pair stage join-bounded") {
    import spark.implicits._
    val df = q("q_theil_sen")
    val rows = df.as[(String, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (et, dy, dx, milli) =>
      assert(dx >= 1, s"$et dx")
      assert(milli == math.floor(1000.0 * dy / dx).toLong, s"$et slope_milli")
    }
    val plan = { df.collect(); df.queryExecution.executedPlan.toString }
    assert(!plan.contains("CartesianProduct"),
      s"pair expansion must ride the event_type equi-join:\n$plan")
    // recompute one type's median-low slope from scratch
    val et = rows.head._1
    val daily = tbl("events").filter(col("event_type") === et)
      .groupBy(expr("div(unix_micros(date_trunc('day', ts)), 86400000000)").as("d"))
      .agg(count(lit(1)).as("c")).as[(Long, Long)].collect().sortBy(_._1)
    val slopes = for {
      i <- daily.indices; j <- daily.indices if daily(j)._1 > daily(i)._1
    } yield (daily(j)._2 - daily(i)._2, daily(j)._1 - daily(i)._1)
    val sorted = slopes.sortBy { case (dy, dx) => (dy.toDouble / dx, dy, dx) }
    val (mdy, mdx) = sorted((sorted.size + 1) / 2 - 1)
    val got = rows.find(_._1 == et).get
    assert(math.floor(1000.0 * mdy / mdx).toLong == got._4, s"$et median slope")
  }
}
