package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTesting

/** IV-Wald and RDD invariants — the causal-suite completion. */
class CausalSuiteSpec extends AnyFunSuite {
  lazy val spark = SparkTesting.spark
  private def q(name: String) =
    graft.SparkEntry.queries(name)(spark, SparkTesting.sf)
  private def tbl(name: String) =
    graft.pipeline.Tables.t(spark, SparkTesting.sf, name)

  test("iv_wald: arms partition users, Wald = reduced form / first stage") {
    import spark.implicits._
    val Array((n0, n1, dx, dy, wald)) =
      q("q_iv_wald").as[(Long, Long, Long, Long, Long)].collect()
    assert(n0 + n1 == tbl("events").select("user_id").distinct().count())
    assert(dx != 0, "first stage must not be exactly zero here")
    // wald floors dy/dx of the same doubles; check within 1 milli
    val approx = math.floor(1000.0 * dy.toDouble / dx).toLong
    assert(math.abs(wald - approx) <= 1000, s"wald=$wald vs ~$approx")
  }

  test("rdd_jump: band cells populated, jump consistent with cell means") {
    import spark.implicits._
    val Array((nb, na, mb, ma, jump, jumpPpm)) =
      q("q_rdd_jump").as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(nb > 0 && na > 0, "both sides of the cutoff populated")
    assert(mb > 0 && ma > 0)
    // floored means vs exact jump: within 2 milli-units of the
    // difference of floored means
    assert(math.abs(jump - 1000 * (ma - mb)) <= 2000,
      s"jump $jump vs means $mb/$ma")
    assert((jumpPpm > 0) == (jump > 0) || jump == 0)
  }
}
