package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTesting

/** ATT matching invariants. */
class AttMatchingSpec extends AnyFunSuite {
  lazy val spark = SparkTesting.spark

  test("att_matching: treated count matches parity split, ATT from the sums") {
    import spark.implicits._
    val Array((nT, syT, syM, att, naive)) =
      graft.SparkEntry.queries("q_att_matching")(spark, SparkTesting.sf)
        .as[(Long, Long, Long, Long, Long)].collect()
    val treated = graft.pipeline.Tables.t(spark, SparkTesting.sf, "events")
      .select("user_id").distinct().filter(col("user_id") % 2 === 1).count()
    assert(nT == treated)
    assert(att == math.floor(1000.0 * (syT - syM) / nT).toLong)
    // under a pure-parity pseudo-treatment the corrected and naive
    // estimates are both near zero relative to total spend
    assert(math.abs(att) < 1000L * syT.max(1) / nT + 100000,
      s"att=$att bounded")
    assert(math.abs(naive) < 2000000, "parity split has no real effect")
  }
}
