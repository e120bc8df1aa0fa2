package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTesting

/** Holt's linear smoothing: recurrence recomputed from scratch in
  * Scala, forecasts are the linear extrapolation of terminal state.
  */
class HoltLinearSpec extends AnyFunSuite {
  lazy val spark = SparkTesting.spark

  test("holt_linear: terminal state matches a from-scratch fold, forecasts linear") {
    import spark.implicits._
    val rows = graft.SparkEntry.queries("q_holt_linear")(spark, SparkTesting.sf)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (et, n, l, b, f1, f2, f3) =>
      assert(f1 == l + b && f2 == l + 2 * b && f3 == l + 3 * b, s"$et forecasts")
      val ys = graft.pipeline.Tables.t(spark, SparkTesting.sf, "events")
        .filter(col("event_type") === et)
        .groupBy(expr("div(unix_micros(date_trunc('day', ts)), 86400000000)")
          .as("d")).agg(count(lit(1)).as("y"))
        .as[(Long, Long)].collect().sortBy(_._1).map(_._2)
      assert(n == ys.length)
      var (ll, bb) = (1000L * ys.head, 0L)
      ys.tail.foreach { y =>
        val l2 = math.floor((300L * 1000 * y + 700 * (ll + bb)) / 1000.0).toLong
        bb = math.floor((100 * (l2 - ll) + 900 * bb) / 1000.0).toLong
        ll = l2
      }
      assert(l == ll && b == bb, s"$et state: got ($l,$b) want ($ll,$bb)")
    }
  }
}
