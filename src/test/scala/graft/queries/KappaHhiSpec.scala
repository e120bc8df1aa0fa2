package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTesting

/** Invariants for Cohen's kappa, HHI concentration, and the
  * Simpson's-paradox audit. */
class KappaHhiSpec extends AnyFunSuite {
  lazy val spark = SparkTesting.spark
  private def q(name: String) =
    graft.SparkEntry.queries(name)(spark, SparkTesting.sf)
  private def tbl(name: String) =
    graft.pipeline.Tables.t(spark, SparkTesting.sf, name)

  test("lang_id_kappa: po/pe laws hold; kappa between -1 and 1; kappa <= po") {
    import spark.implicits._
    val Array((n, agree, sChance, po, pe, kappa)) =
      q("q_lang_id_kappa").as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(n == tbl("documents").count())
    assert(agree <= n)
    assert(po == 1000000L * agree / n)
    assert(pe == 1000000L * sChance / (n * n))
    assert(kappa >= -1000000 && kappa <= 1000000)
    assert(kappa <= po, "chance correction can only lower agreement")
    val want = math.floor(1000000.0 * (n * agree - sChance) /
      (n.toDouble * n - sChance)).toLong
    assert(kappa == want)
  }

  test("hhi_concentration: HHI bounded by [1e6/n, 1e6], equivalent-n sane") {
    import spark.implicits._
    val rows = q("q_hhi_concentration").as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (nk, nSup, hhi, eqN) =>
      assert(nSup >= 1)
      // perfect competition floor 1e6/n (minus ppm flooring slack),
      // monopoly ceiling 1e6
      assert(hhi <= 1000000, s"nation $nk")
      assert(hhi >= 1000000 / nSup - nSup, s"nation $nk hhi=$hhi n=$nSup")
      assert(eqN == 1000000 / hhi && eqN <= nSup + 1, s"nation $nk eq=$eqN")
    }
  }

  test("simpson_audit: overall slope shared, flips only on genuine sign opposition") {
    import spark.implicits._
    val rows = q("q_simpson_audit").as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.map(_._4).distinct.length == 1, "one pooled slope")
    rows.foreach { case (nk, n, slope, overall, flip) =>
      assert(n > 0)
      val expectFlip = slope != 0 && overall != 0 &&
        math.signum(slope.toDouble) != math.signum(overall.toDouble)
      assert(flip == (if (expectFlip) 1L else 0L), s"nation $nk")
    }
  }
}
