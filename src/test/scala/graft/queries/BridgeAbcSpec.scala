package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTesting

/** Invariants for the revenue bridge, share-of-parent hierarchy,
  * ABC classification, and embedding radius histogram: waterfall
  * reconciliation, share algebra, class boundaries, histogram
  * conservation.
  */
class BridgeAbcSpec extends AnyFunSuite {
  lazy val spark = SparkTesting.spark
  private def q(name: String) =
    graft.SparkEntry.queries(name)(spark, SparkTesting.sf)
  private def tbl(name: String) =
    graft.pipeline.Tables.t(spark, SparkTesting.sf, name)

  test("revenue_bridge: effects reconcile to delta within flooring slack") {
    import spark.implicits._
    val rows = q("q_revenue_bridge")
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (brand, r1, r2, q1, q2, dRev, pe, ve, me) =>
      assert(dRev == r2 - r1)
      // price + volume + mix = delta exactly in the rational algebra;
      // each reported effect floors once, so the walk reconciles
      // within 3 cents
      val walk = pe + ve + me
      assert(math.abs(walk - dRev) <= 3, s"$brand walk $walk vs $dRev")
      assert(q1 > 0 && q2 > 0)
    }
  }

  test("share_of_parent: nation shares sum to ~1e6 within each region") {
    import spark.implicits._
    val rows = q("q_share_of_parent")
      .as[(String, String, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (region, rs) =>
      val s = rs.map(_._4).sum
      // each nation share floors once → total within nations-count of 1e6
      assert(s <= 1000000 && s > 1000000 - rs.length, s"$region shares $s")
      assert(rs.map(_._5).distinct.length == 1, s"$region one region share")
    }
    val regShares = rows.groupBy(_._1).map(_._2.head._5).toSeq
    assert(regShares.sum <= 1000000 && regShares.sum > 1000000 - regShares.length)
  }

  test("abc_classification: A leads revenue share, parts partition, A<=80% B<=95%") {
    import spark.implicits._
    val rows = q("q_abc_classification").as[(String, Long, Long, Long)].collect()
    assert(rows.map(_._1).sorted.toSeq == Seq("A", "B", "C"))
    val nParts = tbl("lineitem").select("l_partkey").distinct().count()
    assert(rows.map(_._2).sum == nParts)
    val byC = rows.map(r => r._1 -> r).toMap
    assert(byC("A")._4 <= 800000 + 10000, "A covers ~80% (boundary part may push)")
    assert(byC("A")._4 > byC("B")._4 && byC("B")._4 > byC("C")._4,
      "head classes dominate revenue")
    // on this near-uniform synthetic revenue the A class holds ~80%
    // of parts too — only the SHARE boundaries are data-independent:
    assert(byC("A")._4 + byC("B")._4 + byC("C")._4 > 1000000 - 3)
    // per-part mean revenue still orders A >= B >= C (ties possible)
    def meanRev(c: String) = byC(c)._3.toDouble / byC(c)._2
    assert(meanRev("A") >= meanRev("B") && meanRev("B") >= meanRev("C"))
  }

  test("embed_radius_hist: membership conserved, decade = digit count, bounds ordered") {
    import spark.implicits._
    val rows = q("q_embed_radius_hist").as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val total = tbl("embeddings").filter(size(col("embedding")) > 0).count()
    assert(rows.map(_._3).sum == total)
    rows.foreach { case (label, decade, n, dMin, dMax) =>
      assert(n > 0 && dMin <= dMax)
      if (decade > 0) {
        assert(dMin.toString.length == decade && dMax.toString.length == decade,
          s"label $label decade $decade")
      } else assert(dMin == 0 && dMax == 0)
    }
  }
}
