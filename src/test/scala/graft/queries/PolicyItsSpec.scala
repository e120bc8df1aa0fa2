package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTesting

/** Inventory-policy and ITS invariants. */
class PolicyItsSpec extends AnyFunSuite {
  lazy val spark = SparkTesting.spark
  private def q(name: String) =
    graft.SparkEntry.queries(name)(spark, SparkTesting.sf)
  private def tbl(name: String) =
    graft.pipeline.Tables.t(spark, SparkTesting.sf, name)

  test("inventory_policy: EOQ/ROP formulas rebuild for one part, all positive") {
    import spark.implicits._
    val rows = q("q_inventory_policy")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.length == tbl("lineitem").select("l_partkey").distinct().count())
    rows.foreach { case (pk, nd, tq, eoq, rop, ss) =>
      assert(nd >= 1 && tq >= 1 && eoq >= 1 && rop >= 0 && ss >= 0, s"part $pk")
      assert(rop == 7 * tq / nd)
    }
    // recompute EOQ for the busiest part
    val (pk, _, tq, eoq, _, _) = rows.maxBy(_._3)
    val price = tbl("part").filter(col("p_partkey") === pk)
      .select(floor(col("p_retailprice") * lit(100.0) + lit(0.5)).cast("long"))
      .as[Long].head()
    assert(eoq == math.floor(math.sqrt(2.0 * tq * 10000 / (0.2 * price))).toLong)
  }

  test("its_segmented: every type has both segments, level change consistent") {
    import spark.implicits._
    val rows = q("q_its_segmented")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(rows.length == 5)
    rows.foreach { case (et, nPre, nPost, bPre, bPost, _) =>
      assert(nPre >= 2 && nPost >= 2, s"$et segments populated")
      // slopes of a ~flat synthetic series stay small (< 500 events/day drift)
      assert(math.abs(bPre) < 500000000L && math.abs(bPost) < 500000000L, s"$et")
    }
  }
}
