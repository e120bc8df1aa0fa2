package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTesting

/** q_sink_orc's scan-economics half: the status predicate must reach
  * the ORC reader as a pushed filter and the read schema must prune
  * to the referenced columns — the roundtrip has to preserve scan
  * selectivity, not just values (the values half is the DuckDB
  * oracle's job). */
class OrcSinkSpec extends AnyFunSuite {
  lazy val spark = SparkTesting.spark

  test("ORC roundtrip: filter pushed to the ORC scan, columns pruned") {
    val df = graft.SparkEntry.queries("q_sink_orc")(spark, SparkTesting.sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator.find(_.contains("FileScan orc"))
    assert(scanLine.isDefined, s"no ORC scan in plan:\n$plan")
    assert(scanLine.get.contains("PushedFilters: [IsNotNull(o_orderstatus), EqualTo(o_orderstatus,O)]"),
      s"status predicate not pushed to ORC:\n${scanLine.get}")
    // o_orderkey was written but is dead to this query — pruned read
    assert(!scanLine.get.replaceAll("PushedFilters.*", "").contains("o_orderkey"),
      s"read schema not pruned:\n${scanLine.get}")
  }

  test("ORC roundtrip preserves row count and cents exactly") {
    import spark.implicits._
    val viaOrc = graft.SparkEntry.queries("q_sink_orc")(spark, SparkTesting.sf)
      .as[(String, Long, Long)].collect().toSeq
    val direct = graft.pipeline.Tables.t(spark, SparkTesting.sf, "orders")
      .filter(col("o_orderstatus") === "O")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(floor(col("o_totalprice") * lit(100.0) + lit(0.5)).cast("long")).cast("long").as("c"))
      .orderBy("o_orderpriority")
      .as[(String, Long, Long)].collect().toSeq
    assert(viaOrc == direct)
  }
}
