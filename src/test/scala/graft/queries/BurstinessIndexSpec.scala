package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTesting

/** Word burstiness and price-index invariants. */
class BurstinessIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTesting.spark
  private def q(name: String) =
    graft.SparkEntry.queries(name)(spark, SparkTesting.sf)

  test("word_burstiness: df <= N, one token's moments recomputed") {
    import spark.implicits._
    val rows = q("q_word_burstiness").as[(String, Long, Long, Long)].collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val docs = graft.pipeline.Tables.t(spark, SparkTesting.sf, "documents")
    val n = docs.count()
    rows.foreach { case (tok, df, occ, burst) =>
      assert(df >= 1 && df <= n && occ >= df, s"$tok")
      assert(burst > 0, s"$tok burstiness positive for real tokens")
    }
    val (tok, df, occ, burst) = rows.head
    import scala.jdk.CollectionConverters._
    val counts = docs
      .select(graft.text.TextAnalysis.tokens(col("text")).as("tk"))
      .as[Seq[String]].collect().map(_.count(_ == tok).toLong)
    assert(df == counts.count(_ > 0) && occ == counts.sum)
    val ss = counts.map(c => c * c).sum
    val want = math.floor(1000.0 * (n.toDouble * ss - occ.toDouble * occ) /
      ((n - 1.0) * occ)).toLong
    assert(burst == want, s"$tok burstiness")
  }

  test("price_index: Fisher between Laspeyres and Paasche (up to flooring)") {
    import spark.implicits._
    val Array((nParts, p0q0, p1q0, p0q1, p1q1, lasp, paas, fisher)) =
      q("q_price_index")
        .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(nParts > 0)
    Seq(p0q0, p1q0, p0q1, p1q1).foreach(v => assert(v > 0))
    assert(lasp == 1000000L * p1q0 / p0q0)
    assert(paas == 1000000L * p1q1 / p0q1)
    val (lo, hi) = (math.min(lasp, paas), math.max(lasp, paas))
    assert(fisher >= lo - 1 && fisher <= hi + 1, "geometric mean lies between")
    // the synthetic lake has no systematic inflation: indices near 1e6
    Seq(lasp, paas, fisher).foreach(v =>
      assert(v > 500000 && v < 2000000, s"index $v"))
  }
}
