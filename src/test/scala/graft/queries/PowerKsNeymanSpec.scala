package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTesting

/** Invariants for the power-iteration PCA, the two-sample KS
  * statistic, and the Neyman sampling allocation. The oracle owns
  * value equality; these lock normalization, distribution-function
  * laws, and budget conservation, plus from-scratch recomputations.
  */
class PowerKsNeymanSpec extends AnyFunSuite {
  lazy val spark = SparkTesting.spark
  private def q(name: String) =
    graft.SparkEntry.queries(name)(spark, SparkTesting.sf)
  private def tbl(name: String) =
    graft.pipeline.Tables.t(spark, SparkTesting.sf, name)

  test("embed_power_pca: 64 dims, milli-normalized, renorm peak hits exactly 1000") {
    import spark.implicits._
    val rows = q("q_embed_power_pca").as[(Long, Long, Long, Long)].collect()
    assert(rows.length == 64)
    assert(rows.map(_._1).sorted.toSeq == (1L to 64L).toSeq)
    rows.foreach { case (dim, _, v1, v2) =>
      assert(math.abs(v1) <= 1000 && math.abs(v2) <= 1000, s"dim $dim")
    }
    // floor(1000*w/m) hits exactly ±1000 at the argmax |w| coordinate
    assert(rows.map(r => math.abs(r._3)).max == 1000, "v1 normalized")
    assert(rows.map(r => math.abs(r._4)).max == 1000, "v2 normalized")
    // the two iterates agree in direction (dominant eigengap): their
    // integer dot product is positive
    val dot = rows.map(r => r._3 * r._4).sum
    assert(dot > 0, s"iterates should not flip direction: dot=$dot")
  }

  test("ks_two_sample: statistic matches a from-scratch ECDF scan") {
    import spark.implicits._
    val Array((ksPpm, atCents, na, nb)) =
      q("q_ks_two_sample").as[(Long, Long, Long, Long)].collect()
    assert(ksPpm > 0 && ksPpm <= 1000000)
    val pts = tbl("events")
      .filter(col("event_type").isin("click", "purchase"))
      .select(floor(col("value") * lit(100.0) + lit(0.5)).cast("long").as("x"),
        col("event_type"))
      .as[(Long, String)].collect()
    val clicks = pts.filter(_._2 == "click").map(_._1).sorted
    val purch = pts.filter(_._2 == "purchase").map(_._1).sorted
    assert(na == clicks.length && nb == purch.length)
    val support = (clicks ++ purch).distinct.sorted
    var best = 0L; var bestX = Long.MaxValue
    support.foreach { x =>
      val fa = 1000000L * clicks.count(_ <= x) / clicks.length
      val fb = 1000000L * purch.count(_ <= x) / purch.length
      val dd = math.abs(fa - fb)
      if (dd > best || (dd == best && x < bestX)) { best = dd; bestX = x }
    }
    assert(ksPpm == best, s"KS ppm: got $ksPpm want $best")
    assert(atCents == bestX, s"KS argmax location")
  }

  test("sample_neyman: budget conserved under floor, zero-weight strata get zero") {
    import spark.implicits._
    val rows = q("q_sample_neyman")
      .as[(String, String, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val allocSum = rows.map(_._6).sum
    assert(allocSum <= 1000 && allocSum > 900,
      s"floored allocations sum just below the 1000 budget: $allocSum")
    assert(rows.map(_._5).sum <= 1000000)
    rows.foreach { case (lang, source, n, sMilli, share, alloc) =>
      assert(n >= 1)
      if (n < 2) assert(sMilli == 0 && share == 0 && alloc == 0,
        s"singleton stratum $lang/$source must get zero weight")
      assert(alloc <= 1000 && share <= 1000000)
    }
    // recompute one stratum's s_milli from scratch
    val (lang, source, n, sMilli, _, _) = rows.maxBy(_._3)
    val ys = tbl("documents")
      .filter(col("lang") === lang && col("source") === source)
      .select(col("n_chars")).as[Long].collect()
    assert(n == ys.length)
    val sy = ys.sum; val syy = ys.map(y => y * y).sum
    val want = math.floor(1000.0 *
      math.sqrt((n * syy - sy * sy).toDouble / (n.toDouble * (n - 1)))).toLong
    assert(sMilli == want, s"stratum $lang/$source s_milli")
  }
}
