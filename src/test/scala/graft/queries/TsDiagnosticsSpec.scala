package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTesting

/** Time-series diagnostics invariants: Kendall pair algebra, runs
  * accounting, Durbin-Watson bounds and recomputation. */
class TsDiagnosticsSpec extends AnyFunSuite {
  lazy val spark = SparkTesting.spark
  private def q(name: String) =
    graft.SparkEntry.queries(name)(spark, SparkTesting.sf)
  private def tbl(name: String) =
    graft.pipeline.Tables.t(spark, SparkTesting.sf, name)

  private def dailySeries(et: String): Array[Long] = {
    import spark.implicits._
    tbl("events").filter(col("event_type") === et)
      .groupBy(expr("div(unix_micros(date_trunc('day', ts)), 86400000000)")
        .as("d")).agg(count(lit(1)).as("y"))
      .as[(Long, Long)].collect().sortBy(_._1).map(_._2)
  }

  test("kendall_tau: C+D+ties = pairs, tau recomputed for one type") {
    import spark.implicits._
    val rows = q("q_kendall_tau").as[(String, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (et, pairs, c, dd, tau) =>
      assert(c + dd <= pairs)
      assert(tau >= -1000000 && tau <= 1000000, s"$et")
    }
    val (et, pairs, c, dd, _) = rows.head
    val ys = dailySeries(et)
    val all = for { i <- ys.indices; j <- ys.indices if j > i } yield (ys(i), ys(j))
    assert(pairs == all.size)
    assert(c == all.count { case (a, b) => b > a })
    assert(dd == all.count { case (a, b) => b < a })
  }

  test("runs_test: runs between 1 and n_moves, recomputed for one type") {
    import spark.implicits._
    val rows = q("q_runs_test").as[(String, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (et, np, nm, runs, _, _) =>
      assert(runs >= 1 && runs <= np + nm, s"$et")
    }
    val (et, np, nm, runs, _, _) = rows.head
    val ys = dailySeries(et)
    val sgns = ys.sliding(2).collect {
      case Array(a, b) if b != a => if (b > a) 1 else -1
    }.toArray
    assert(np == sgns.count(_ == 1) && nm == sgns.count(_ == -1))
    val wantRuns = if (sgns.isEmpty) 0
      else 1 + sgns.sliding(2).count { case Array(a, b) => a != b; case _ => false }
    assert(runs == wantRuns, s"$et runs")
  }

  test("durbin_watson: dw in (0, 4000), exact integer ratio recomputed") {
    import spark.implicits._
    val rows = q("q_durbin_watson").as[(String, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (et, num, den, dw) =>
      assert(den > 0 && num >= 0)
      assert(dw == 1000 * num / den)
      assert(dw > 0 && dw < 4000, s"$et dw=$dw")
    }
    val (et, num, den, _) = rows.head
    val ys = dailySeries(et)
    val n = ys.length; val sy = ys.sum
    val ep = ys.map(y => y * n - sy)
    assert(den == ep.map(e => e * e).sum)
    assert(num == ep.sliding(2).collect {
      case Array(a, b) => (b - a) * (b - a) }.sum)
  }
}
