package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTesting

/** Invariants for the Lorenz decile curve, lateness profile, price
  * elasticity, and BOW cosine pairs. Oracle owns values; these lock
  * curve convexity, count conservation, threshold laws, and a
  * from-scratch pair recomputation.
  */
class LorenzLatenessSpec extends AnyFunSuite {
  lazy val spark = SparkTesting.spark
  private def q(name: String) =
    graft.SparkEntry.queries(name)(spark, SparkTesting.sf)
  private def tbl(name: String) =
    graft.pipeline.Tables.t(spark, SparkTesting.sf, name)

  test("lorenz_deciles: ten deciles, monotone convex curve ending at 1e6") {
    import spark.implicits._
    val rows = q("q_lorenz_deciles").as[(Long, Long, Long, Long)].collect()
    assert(rows.map(_._1).toSeq == (1L to 10L).toSeq)
    assert(rows.map(_._2).sum ==
      tbl("orders").select("o_custkey").distinct().count())
    // cumulative share increases, final share is the full pie (floor
    // of an exact division of the total by itself)
    val shares = rows.map(_._4)
    assert(shares.zip(shares.tail).forall { case (a, b) => a < b })
    assert(shares.last == 1000000L)
    // Lorenz convexity: decile revenue is non-decreasing along the
    // spend-sorted deciles (ties possible, strict decrease is not)
    val decCents = rows.map(_._3)
    assert(decCents.zip(decCents.tail).forall { case (a, b) => a <= b })
  }

  test("lateness_profile: counts conserve events, decade = digit count of max_sec") {
    import spark.implicits._
    val rows = q("q_lateness_profile").as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.map(_._2).sum == tbl("events").count())
    rows.foreach { case (decade, n, minSec, maxSec) =>
      assert(n > 0 && minSec <= maxSec)
      if (decade == 0) assert(minSec == 0 && maxSec == 0)
      else {
        assert(minSec.toString.length == decade, s"decade $decade min $minSec")
        assert(maxSec.toString.length == decade, s"decade $decade max $maxSec")
      }
    }
  }

  test("price_elasticity: moment sums rebuild the floored slope, all brands covered") {
    import spark.implicits._
    val rows = q("q_price_elasticity")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (brand, n, sx, sy, sxy, sxx, slope) =>
      assert(n >= 1 && sx > 0 && sy > 0)
      val den = n * sxx - sx * sx
      val want =
        if (den == 0) 0L
        else math.floor(1000000.0 * (n * sxy - sx * sy) / den).toLong
      assert(slope == want, s"$brand slope")
    }
    val brands = tbl("part")
      .join(tbl("lineitem"), col("l_partkey") === col("p_partkey"), "left_semi")
      .select("p_brand").distinct().count()
    assert(rows.length == brands, "one regression per traded brand")
  }

  test("bow_cosine_pairs: every survivor passes the integer gate, one pair recomputed") {
    import spark.implicits._
    val rows = q("q_bow_cosine_pairs")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty, "the shared-vocab corpus must yield high-cosine pairs")
    rows.foreach { case (a, b, dp, nsqA, nsqB, cosMilli) =>
      assert(a < b)
      assert(100 * dp * dp >= 64 * nsqA * nsqB, s"pair ($a,$b) below the gate")
      assert(cosMilli >= 800 && cosMilli <= 1000, s"pair ($a,$b) cos $cosMilli")
      assert(cosMilli ==
        math.floor(1000.0 * dp / math.sqrt(nsqA.toDouble * nsqB)).toLong)
    }
    // recompute one pair's dot/norms from raw term frequencies
    val (a, b, dp, nsqA, nsqB, _) = rows.head
    def tf(id: Long): Map[String, Long] = tbl("documents")
      .filter(col("doc_id") === id)
      .select(explode(graft.text.TextAnalysis.tokens(col("text"))).as("tok"))
      .groupBy("tok").count().as[(String, Long)].collect().toMap
    val (ta, tb) = (tf(a), tf(b))
    assert(nsqA == ta.values.map(v => v * v).sum)
    assert(nsqB == tb.values.map(v => v * v).sum)
    assert(dp == ta.map { case (k, v) => v * tb.getOrElse(k, 0L) }.sum)
  }
}
