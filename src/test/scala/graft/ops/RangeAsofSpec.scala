package graft.ops

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTesting
import graft.ops.Ops._

/** As-of join and binned range join: semantics on handcrafted edge
  * cases, equivalence to the naive (non-scalable) formulations, and
  * plan shape (no nested-loop join ever appears). */
class RangeAsofSpec extends AnyFunSuite {
  lazy val spark = SparkTesting.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofLastValue: equal-ts matches, no-prior is null, latest wins") {
    import spark.implicits._
    val series = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 12:00:00"), 200.0),
      (2L, ts("2024-01-01 11:00:00"), 999.0)).toDF("user_id", "ts", "v")
    val probes = Seq(
      (10L, 1L, ts("2024-01-01 09:59:59")), // before any observation
      (11L, 1L, ts("2024-01-01 10:00:00")), // exactly simultaneous → match
      (12L, 1L, ts("2024-01-01 11:59:59")), // between → first value
      (13L, 1L, ts("2024-01-01 23:00:00")), // after both → latest
      (14L, 3L, ts("2024-01-01 12:00:00"))  // key with no series at all
    ).toDF("event_id", "user_id", "ts")
    val got = asofLastValue(probes, series, "user_id", "ts", "ts", "v", "av")
      .select("event_id", "av").as[(Long, Option[Double])]
      .collect().toMap
    assert(got == Map(10L -> None, 11L -> Some(100.0), 12L -> Some(100.0),
      13L -> Some(200.0), 14L -> None))
  }

  test("asofLastValue plan: one key shuffle, no join operator at all") {
    import spark.implicits._
    val series = Seq((1L, ts("2024-01-01 10:00:00"), 1.0)).toDF("user_id", "ts", "v")
    val probes = Seq((10L, 1L, ts("2024-01-01 11:00:00"))).toDF("event_id", "user_id", "ts")
    val df = asofLastValue(probes, series, "user_id", "ts", "ts", "v", "av")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of must not contain any join:\n$plan")
    val finalPlan = SparkTesting.finalSection(plan)
    val shuffles = finalPlan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(shuffles == 1, s"expected exactly 1 key shuffle, got $shuffles:\n$finalPlan")
  }

  test("binnedRangeJoin == naive range join on random-ish data") {
    import spark.implicits._
    // windows of mixed lengths incl. shorter-than-bin, longer-than-bin,
    // empty (end == start, must drop), and bin-straddling
    val base = ts("2024-01-01 00:00:00").getTime
    val windows = Seq(
      (0L, 0L, 30L),      // short, inside one bin
      (1L, 50L, 70L),     // straddles the 60-min bin boundary
      (2L, 0L, 600L),     // spans many bins
      (3L, 100L, 100L),   // EMPTY — must produce nothing
      (4L, 590L, 610L))   // tail window
      .map { case (id, a, b) =>
        (id, new Timestamp(base + a * 60000), new Timestamp(base + b * 60000)) }
      .toDF("window_id", "ws", "we")
    val points = (0L until 240L).map(i => (i, new Timestamp(base + i * 150000)))
      .toDF("point_id", "ts") // every 2.5 min over 10 h
    val binned = binnedRangeJoin(points, "ts", windows, "ws", "we",
      binWidthUs = 3600L * 1000000) // 1-hour bins
      .select("window_id", "point_id").as[(Long, Long)].collect().toSet
    val naive = points.crossJoin(windows)
      .filter(col("ts") >= col("ws") && col("ts") < col("we"))
      .select("window_id", "point_id").as[(Long, Long)].collect().toSet
    assert(binned == naive, s"diff: ${(binned -- naive) ++ (naive -- binned)}")
    assert(!binned.exists(_._1 == 3L), "empty window must match nothing")
    assert(binned.nonEmpty)
    // boundary contract: start inclusive, end exclusive
    assert(binned.contains((0L, 0L)), "point exactly at start must match")
    assert(!binned.contains((1L, 28L)), "point exactly at end must not match")
  }

  test("binnedRangeJoin plan: equi-join on the bin, no nested loop") {
    val df = graft.SparkEntry.queries("q_range_join_binned")(spark, SparkTesting.sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join must not nested-loop:\n$plan")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin") ||
      plan.contains("ShuffledHashJoin"), s"expected an equi-join on the bin:\n$plan")
  }
}
