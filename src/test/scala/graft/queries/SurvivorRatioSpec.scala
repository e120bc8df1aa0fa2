package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTesting

/** Survivorship-bias and ratio-CI invariants. */
class SurvivorRatioSpec extends AnyFunSuite {
  lazy val spark = SparkTesting.spark
  private def q(name: String) =
    graft.SparkEntry.queries(name)(spark, SparkTesting.sf)
  private def tbl(name: String) =
    graft.pipeline.Tables.t(spark, SparkTesting.sf, name)

  test("survivorship_bias: survivor set is a subset, counts match the lake") {
    import spark.implicits._
    val Array((nAll, nSurv, meanAll, meanSurv, biasPpm)) =
      q("q_survivorship_bias").as[(Long, Long, Long, Long, Long)].collect()
    val all95 = tbl("orders").filter(year(col("o_orderdate")) === 1995)
      .select("o_custkey").distinct().count()
    assert(nAll == all95 && nSurv <= nAll && nSurv > 0)
    assert(meanAll > 0 && meanSurv > 0)
    val want = math.floor(1000000.0 *
      (meanSurv.toDouble - meanAll) / meanAll).toLong
    // floored means vs exact-rational bias differ slightly; just pin sign band
    assert(math.abs(biasPpm - want) < 5000, s"bias $biasPpm vs ~$want")
  }

  test("ratio_delta_ci: CI brackets R, se positive, R consistent with totals") {
    import spark.implicits._
    val Array((n, sx, sy, r, se, lo, hi)) = q("q_ratio_delta_ci")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(n > 0 && sx > 0 && sy > 0)
    assert(r == math.floor(1000.0 * sx / sy).toLong)
    assert(se > 0)
    assert(lo <= r && r <= hi, "CI brackets the point estimate")
    assert(hi - lo <= 2 * 1960 * se / 1000 + 2, "CI width ~ 2*1.96*se")
  }
}
