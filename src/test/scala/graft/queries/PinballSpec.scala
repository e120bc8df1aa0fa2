package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTesting

/** Pinball-loss evaluation invariants: quantile monotonicity, the
  * asymmetric-loss law, and loss recomputation for one cell.
  */
class PinballSpec extends AnyFunSuite {
  lazy val spark = SparkTesting.spark

  test("pinball_eval: 3 quantiles per type, yhat monotone in q, one cell recomputed") {
    import spark.implicits._
    val rows = graft.SparkEntry.queries("q_pinball_eval")(spark, SparkTesting.sf)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (et, rs) =>
      assert(rs.map(_._2).sorted.toSeq == Seq(100L, 500L, 900L), s"$et quantiles")
      val byQ = rs.map(r => r._2 -> r._3).toMap
      assert(byQ(100L) <= byQ(500L) && byQ(500L) <= byQ(900L),
        s"$et quantile predictions must be monotone")
    }
    rows.foreach { case (_, _, _, n, total, mean) =>
      assert(n > 0 && total >= 0 && mean == total / n)
    }
    // recompute one (type, q) cell from raw data
    val (et, qp, yhat, n, total, _) = rows.head
    val ev = graft.pipeline.Tables.t(spark, SparkTesting.sf, "events")
    val m = ev.agg(min(expr("div(unix_micros(date_trunc('day', ts)), 86400000000)")))
      .as[Long].head()
    val test = ev.filter(col("event_type") === et &&
        expr("div(unix_micros(date_trunc('day', ts)), 86400000000)") >= m + 15)
      .select(floor(col("value") * lit(100.0) + lit(0.5)).cast("long"))
      .as[Long].collect()
    assert(n == test.length)
    val want = test.map(y =>
      if (y >= yhat) qp * (y - yhat) else (1000 - qp) * (yhat - y)).sum
    assert(total == want, s"$et q=$qp loss")
  }
}
