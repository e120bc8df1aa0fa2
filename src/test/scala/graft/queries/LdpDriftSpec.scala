package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTesting

/** Invariants for LDP counts, TV drift, and assortativity: report
  * conservation, debias quality, TV laws, Cauchy-Schwarz.
  */
class LdpDriftSpec extends AnyFunSuite {
  lazy val spark = SparkTesting.spark
  private def q(name: String) =
    graft.SparkEntry.queries(name)(spark, SparkTesting.sf)
  private def tbl(name: String) =
    graft.pipeline.Tables.t(spark, SparkTesting.sf, name)

  test("ldp_counts: reported and true totals both conserve; estimates near truth") {
    import spark.implicits._
    val rows = q("q_ldp_counts").as[(String, Long, Long, Long, Long)].collect()
    assert(rows.length == 5)
    val total = tbl("events").count()
    assert(rows.map(_._2).sum == total, "true counts conserve")
    assert(rows.map(_._3).sum == total, "reported counts conserve (RR is a bijection per event)")
    rows.foreach { case (et, truth, _, est, errPpm) =>
      // debiased estimate within 20% of truth on these sample sizes
      assert(math.abs(est - truth).toDouble / truth < 0.2, s"$et est=$est true=$truth")
      assert(errPpm == math.floor(1000000.0 * (est - truth) / truth).toLong)
    }
  }

  test("tv_drift: per-type deltas consistent, TV = half the delta sum, in [0,1e6]") {
    import spark.implicits._
    val rows = q("q_tv_drift")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.length == 5)
    val tv = rows.head._7
    assert(rows.forall(_._7 == tv), "one scalar TV")
    assert(tv == rows.map(_._6).sum / 2, "TV is half the L1")
    assert(tv >= 0 && tv <= 1000000)
    rows.foreach { case (et, c1, c2, s1, s2, d, _) =>
      assert(c1 > 0 && c2 > 0, s"$et present in both halves")
      // |share1-share2| agrees with the cross-multiplied delta within
      // the flooring slack of the two share divisions
      assert(math.abs(math.abs(s1 - s2) - d) <= 2, s"$et delta $d vs |${s1 - s2}|")
    }
  }

  test("assortativity: moments satisfy Cauchy-Schwarz, milli value bounded") {
    import spark.implicits._
    val Array((n, sx, sy, sxy, sxx, syy, a)) = q("q_assortativity")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(n > 0)
    val vx = BigInt(n) * sxx - BigInt(sx) * sx
    val vy = BigInt(n) * syy - BigInt(sy) * sy
    val cov = BigInt(n) * sxy - BigInt(sx) * sy
    assert(vx >= 0 && vy >= 0)
    assert(cov * cov <= vx * vy, "Cauchy-Schwarz")
    assert(a >= -1000 && a <= 1000)
  }
}
