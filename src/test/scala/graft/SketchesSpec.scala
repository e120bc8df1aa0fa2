package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Error-bound checks for sketch-based aggregates (no DuckDB oracle —
  * sketch internals are engine-specific, so correctness is "within
  * the configured error of exact"). */
class SketchesSpec extends AnyFunSuite {
  lazy val spark = SparkTesting.spark

  test("approx_count_distinct within 2% rsd of exact per group") {
    import spark.implicits._
    val li = graft.pipeline.Tables.t(spark, SparkTesting.sf, "lineitem")
    // The registered query folds the 3σ bound into within_bound (its
    // oracle-checked surface); assert it holds for every group, and
    // cross-check the exact counts against an independent aggregate.
    val rows = SparkEntry.queries("q_approx_distinct")(spark, SparkTesting.sf)
      .select($"l_returnflag", $"exact_parts", $"within_bound")
      .as[(String, Long, Int)].collect()
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct("l_partkey").as("d"))
      .select($"l_returnflag", $"d").as[(String, Long)].collect().toMap
    assert(rows.map(_._1).toSet == exact.keySet)
    rows.foreach { case (k, e, ok) =>
      assert(e == exact(k), s"group $k: exact_parts $e != independent ${exact(k)}")
      assert(ok == 1, s"group $k: approx_count_distinct outside 3σ (6%) of exact $e")
    }
  }

  test("approx quantiles bracket the exact median") {
    val li = graft.pipeline.Tables.t(spark, SparkTesting.sf, "lineitem")
    val Array(q25, q50, q75) =
      li.stat.approxQuantile("l_extendedprice", Array(0.25, 0.5, 0.75), 0.01)
    assert(q25 <= q50 && q50 <= q75)
    val exactMedian = li.select(expr("percentile(l_extendedprice, 0.5)"))
      .head().getDouble(0)
    assert(math.abs(q50 - exactMedian) / exactMedian <= 0.05)
  }
}
