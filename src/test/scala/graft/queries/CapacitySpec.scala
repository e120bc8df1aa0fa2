package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTesting

/** Capacity-headroom invariants. */
class CapacitySpec extends AnyFunSuite {
  lazy val spark = SparkTesting.spark

  test("capacity_headroom: order statistics ordered, ratios consistent") {
    import spark.implicits._
    val rows = graft.SparkEntry.queries("q_capacity_headroom")(
      spark, SparkTesting.sf)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (et, n, p50, p99, peak, burst, head) =>
      assert(n > 0 && p50 >= 1)
      assert(p50 <= p99 && p99 <= peak, s"$et order statistics")
      assert(burst == 1000000L * p99 / p50)
      assert(head == 1000000L * peak / p99)
      assert(burst >= 1000000L && head >= 1000000L)
    }
  }
}
