package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTesting

/** Invariants for position-based attribution, embedding centroid
  * drift, EB-smoothed rates, and the SRM audit: credit conservation,
  * shrinkage direction, χ² component laws.
  */
class AttributionShiftSpec extends AnyFunSuite {
  lazy val spark = SparkTesting.spark
  private def q(name: String) =
    graft.SparkEntry.queries(name)(spark, SparkTesting.sf)
  private def tbl(name: String) =
    graft.pipeline.Tables.t(spark, SparkTesting.sf, name)

  test("attribution_position: total credit = 1e6 per converting journey exactly") {
    import spark.implicits._
    val rows = q("q_attribution_position").as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    // journeys = purchases with >=1 click in the prior 7 days; the
    // flooring-remainder-to-first rule makes per-journey credit sum
    // EXACTLY 1e6, so total credit = 1e6 * n_journeys
    val ev = tbl("events")
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id"),
        unix_micros(col("ts")).as("pts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cuid"), unix_micros(col("ts")).as("cts"))
    val journeys = p.join(c,
      col("user_id") === col("cuid") &&
        col("cts") <= col("pts") && col("cts") > col("pts") - lit(604800000000L),
      "left_semi").count()
    assert(rows.map(_._3).sum == 1000000L * journeys,
      s"credit conservation across $journeys journeys")
  }

  test("embed_centroid_shift: every label present, cohort counts partition the lake") {
    import spark.implicits._
    val rows = q("q_embed_centroid_shift").as[(Int, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val total = tbl("embeddings").filter(size(col("embedding")) > 0).count()
    assert(rows.map(r => r._2 + r._3).sum == total)
    rows.foreach { case (label, na, nb, shift) =>
      assert(na > 0 && nb > 0, s"label $label needs both cohorts")
      assert(shift >= 0 && shift < 2000000,
        s"label $label shift $shift outside the unit-ball diameter in micro")
    }
  }

  test("eb_smoothed_rate: shrinkage pulls toward the global mean, never past it") {
    import spark.implicits._
    val rows = q("q_eb_smoothed_rate").as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val totPos = rows.map(_._3).sum; val totN = rows.map(_._2).sum
    val muPpm = 1000000L * totPos / totN
    rows.foreach { case (pk, n, pos, raw, sm) =>
      assert(pos <= n)
      // smoothed lies between raw and the prior mean (±1 for the
      // double flooring of mu and the quotient)
      val lo = math.min(raw, muPpm) - 1; val hi = math.max(raw, muPpm) + 1
      assert(sm >= lo && sm <= hi, s"part $pk: raw=$raw mu=$muPpm sm=$sm")
    }
  }

  test("srm_check: three arms, expected counts rebuild, alarm consistent with parts") {
    import spark.implicits._
    val rows = q("q_srm_check").as[(String, Long, Long, Long, Long, Long)].collect()
    assert(rows.map(_._1).sorted.toSeq == Seq("test", "train", "val"))
    val n = rows.map(_._2).sum
    assert(n == tbl("documents").count())
    rows.foreach { case (split, obs, num, expN, part, alarm) =>
      assert(expN == num * n / 256)
      val dev = 256 * obs - num * n
      assert(part == 1000 * dev * dev / (256 * num * n), s"$split χ² part")
      assert(alarm == (if (rows.map(_._5).sum > 5991) 1L else 0L))
    }
  }
}
