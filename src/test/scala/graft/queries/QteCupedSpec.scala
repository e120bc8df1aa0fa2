package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTesting

/** QTE, placebo-DiD, and CUPED invariants. */
class QteCupedSpec extends AnyFunSuite {
  lazy val spark = SparkTesting.spark
  private def q(name: String) =
    graft.SparkEntry.queries(name)(spark, SparkTesting.sf)

  test("qte_arms: four quantiles, monotone within each arm, delta consistent") {
    import spark.implicits._
    val rows = q("q_qte_arms").as[(Long, Long, Long, Long)].collect()
    assert(rows.map(_._1).sorted.toSeq == Seq(250L, 500L, 750L, 900L))
    rows.foreach { case (_, c, tr, d) => assert(d == tr - c) }
    val s = rows.sortBy(_._1)
    assert(s.map(_._2).zip(s.map(_._2).tail).forall { case (a, b) => a <= b },
      "control quantiles monotone")
    assert(s.map(_._3).zip(s.map(_._3).tail).forall { case (a, b) => a <= b },
      "treat quantiles monotone")
  }

  test("did_placebo: placebo near zero on the synthetic stream, flag consistent") {
    import spark.implicits._
    val Array((did, placebo, suspect)) =
      q("q_did_placebo").as[(Long, Long, Long)].collect()
    assert(math.abs(placebo) < 200000, s"placebo $placebo bounded by small-sample noise")
    val expectSuspect =
      math.abs(placebo) * 2 > math.abs(did) && math.abs(did) > 0
    assert(suspect == (if (expectSuspect) 1L else 0L))
  }

  test("cuped: variance reduction equals rho-squared, bounded by 1e6") {
    import spark.implicits._
    val Array((n, vx, vy, cov, theta, red)) =
      q("q_cuped").as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(n > 0 && vx > 0 && vy > 0)
    assert(red >= 0 && red <= 1000000, "rho^2 lives in [0,1]")
    assert(theta == math.floor(1000.0 * cov / vx).toLong)
    assert(red == math.floor(
      1000000.0 * (1.0 * cov) * cov / ((1.0 * vx) * vy)).toLong)
    // Cauchy-Schwarz guarantees the bound even before the floor
    assert(BigInt(cov) * cov <= BigInt(vx) * vy)
  }
}
