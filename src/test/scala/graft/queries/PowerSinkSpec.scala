package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTesting

/** Invariants for the gzip CSV sink, effect sizes, and A/B power. */
class PowerSinkSpec extends AnyFunSuite {
  lazy val spark = SparkTesting.spark
  private def q(name: String) =
    graft.SparkEntry.queries(name)(spark, SparkTesting.sf)
  private def tbl(name: String) =
    graft.pipeline.Tables.t(spark, SparkTesting.sf, name)

  test("sink_csv_gzip: roundtrip conserves customers and writes gzip files") {
    import spark.implicits._
    val rows = q("q_sink_csv_gzip").as[(String, Long, Long)].collect()
    assert(rows.map(_._2).sum == tbl("customer").count())
    val out = new java.io.File(
      graft.queries.SinkScratch.dir("q_sink_csv_gzip", SparkTesting.sf))
    val gz = out.listFiles().filter(_.getName.endsWith(".csv.gz"))
    assert(gz.nonEmpty, "compressed part files on disk")
  }

  test("effect_sizes: four comparisons vs click, d bounded for same-scale data") {
    import spark.implicits._
    val rows = q("q_effect_sizes").as[(String, Long, Long, Long)].collect()
    assert(rows.map(_._1).sorted.toSeq ==
      Seq("error", "purchase", "signup", "view"))
    rows.foreach { case (et, n, nb, d) =>
      assert(n > 0 && nb > 0)
      assert(math.abs(d) < 2000, s"$et |d|=$d — same uniform value distribution")
    }
  }

  test("ab_power_mde: MDE shrinks as 1/sqrt(n); sizing answers the inverse") {
    import spark.implicits._
    val Array((n, nArm, pos, pPpm, mde, nFor10)) =
      q("q_ab_power_mde").as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(nArm * 2 <= n + 1 && pos <= n)
    assert(pPpm == 1000000L * pos / n)
    val p = pos.toDouble / n
    assert(mde == math.floor(1000000.0 * 2.8 *
      math.sqrt(2.0 * p * (1 - p) / nArm)).toLong)
    assert(nFor10 > 0)
    // detecting the 10% relative lift needs more samples than one arm
    // currently holds iff MDE > 10% of p — internal consistency
    val needMore = mde > pPpm / 10
    assert((nFor10 > nArm) == needMore, s"mde=$mde p=$pPpm nFor10=$nFor10 nArm=$nArm")
  }
}
