package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTesting

/** Invariants for TWAP, Mann–Whitney U, and Fano burstiness: time
  * conservation, U-statistic laws, dispersion recomputation.
  */
class TwapMannWhitneySpec extends AnyFunSuite {
  lazy val spark = SparkTesting.spark
  private def q(name: String) =
    graft.SparkEntry.queries(name)(spark, SparkTesting.sf)
  private def tbl(name: String) =
    graft.pipeline.Tables.t(spark, SparkTesting.sf, name)

  test("time_weighted_avg: held time ends at midnight, twap inside value hull") {
    import spark.implicits._
    val rows = q("q_time_weighted_avg")
      .as[(Long, String, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (u, day, n, heldUs, twap) =>
      assert(n >= 1)
      assert(heldUs > 0 && heldUs < 86400000000L, s"$u/$day held=$heldUs")
      assert(twap >= 0, s"$u/$day twap")
    }
    // recompute one user-day from scratch
    val (u, day, _, heldUs, twap) = rows.maxBy(_._3)
    val evs = tbl("events").filter(col("user_id") === u &&
        date_format(col("ts"), "yyyy-MM-dd") === day)
      .select(unix_micros(col("ts")).as("s"), col("event_id"),
        floor(col("value") * lit(100.0) + lit(0.5)).cast("long").as("cents"))
      .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    val dayEnd = (evs.head._1 / 86400000000L + 1) * 86400000000L
    val durs = evs.indices.map { i =>
      val end = if (i == evs.length - 1) dayEnd else evs(i + 1)._1
      (evs(i)._3, end - evs(i)._1)
    }
    assert(heldUs == durs.map(_._2).sum)
    assert(twap == durs.map(p => p._1 * p._2).sum / durs.map(_._2).sum)
  }

  test("mann_whitney: U statistics partition n1*n2, matches row-level ranking") {
    import spark.implicits._
    val Array((na, nb, u2a, u2b, rbMilli)) =
      q("q_mann_whitney").as[(Long, Long, Long, Long, Long)].collect()
    assert(u2a + u2b == 2 * na * nb, "U_a + U_b = n1*n2 (half-units doubled)")
    assert(rbMilli >= -1000 && rbMilli <= 1000)
    // row-level recomputation with average ranks
    val pts = tbl("events")
      .filter(col("event_type").isin("click", "purchase"))
      .select(floor(col("value") * lit(100.0) + lit(0.5)).cast("long").as("x"),
        col("event_type")).as[(Long, String)].collect()
    val sorted = pts.sortBy(_._1)
    // doubled average rank per value
    val byVal = sorted.groupBy(_._1)
    var r2a = 0L
    val cumBefore = scala.collection.mutable.Map.empty[Long, Long]
    var run = 0L
    byVal.keys.toSeq.sorted.foreach { v =>
      cumBefore(v) = run; run += byVal(v).length
    }
    byVal.foreach { case (v, grp) =>
      val dr = 2 * cumBefore(v) + grp.length + 1
      r2a += dr * grp.count(_._2 == "click")
    }
    assert(u2a == r2a - na * (na + 1), "doubled U from doubled ranks")
  }

  test("burstiness_fano: moments rebuild from per-minute counts, fano positive") {
    import spark.implicits._
    val rows = q("q_burstiness_fano")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val mnums = tbl("events")
      .select(expr("div(unix_micros(date_trunc('minute', ts)), 60000000)")
        .as("m")).agg(min("m"), max("m")).as[(Long, Long)].head()
    val span = mnums._2 - mnums._1 + 1
    rows.foreach { case (et, n, occupied, sx, sxx, fano) =>
      assert(n == span)
      assert(occupied <= n && occupied >= 1)
      assert(sxx >= sx, "counts >= 1 on occupied minutes")
      assert(fano == math.floor(
        1000.0 * (n * sxx - sx * sx) / ((n - 1.0) * sx)).toLong, s"$et fano")
      assert(fano > 0)
    }
  }
}
