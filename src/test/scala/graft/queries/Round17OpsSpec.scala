package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTesting

/** Invariant checks for the round-17 operator batch: l-diversity,
  * CCNet per-language quality terciles, MRR@10. Value-level
  * correctness is the DuckDB oracle's job; these pin the algebraic
  * invariants each output must satisfy on ANY input, plus one
  * cross-operator consistency contract per query (the strongest test
  * this suite can own: two independently-planned operators agreeing
  * on a shared quantity).
  */
class Round17OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTesting.spark
  private def q(name: String) =
    graft.SparkEntry.queries(name)(spark, SparkTesting.sf)
  private def tbl(name: String) =
    graft.pipeline.Tables.t(spark, SparkTesting.sf, name)

  test("l-diversity: mass conserved, pigeonhole floor, risky flag, recompute") {
    import spark.implicits._
    val rows = q("q_l_diversity")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.map(_._3).sum == tbl("documents").count(),
      "every document lands in exactly one QI class")
    val langs = tbl("documents").select("lang").distinct().count()
    rows.foreach { case (src, bucket, cnt, nSens, topShare, risky) =>
      assert(nSens >= 1 && nSens <= math.min(cnt, langs),
        s"($src,$bucket): n_sensitive $nSens out of range")
      // pigeonhole: the dominant value covers at least a 1/n share
      assert(topShare >= 1000L / nSens && topShare <= 1000L,
        s"($src,$bucket): top share $topShare vs n_sensitive $nSens")
      assert(risky == (if (nSens < 3) 1L else 0L), s"($src,$bucket): risky flag")
      if (nSens == 1) assert(topShare == 1000L, "homogeneous class = full share")
    }
    // independent recompute of one class's diversity via countDistinct
    val (src0, b0, _, nSens0, _, _) = rows.head
    val recomputed = tbl("documents")
      .filter(col("source") === src0 && expr("div(n_chars, 100)") === b0)
      .agg(countDistinct("lang")).as[Long].head()
    assert(recomputed == nSens0, s"countDistinct recompute $recomputed != $nSens0")
  }

  test("ccnet buckets: conservation, disjoint descending score ranges, shares") {
    import spark.implicits._
    val rows = q("q_ccnet_buckets")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(rows.map(_._3).sum == tbl("documents").count(),
      "every document lands in exactly one (lang, bucket)")
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      val byBucket = rs.sortBy(_._2)
      assert(byBucket.map(_._2).toSet.subsetOf(Set(1L, 2L, 3L)),
        s"$lang: buckets outside 1..3")
      assert(byBucket.head._2 == 1L,
        s"$lang: the top score group must open bucket 1 (p0 = 0)")
      // score-group atomicity ⇒ bucket score ranges are DISJOINT and
      // strictly descending (head = highest scores)
      byBucket.sliding(2).foreach {
        case Array(hi, lo) =>
          assert(hi._5 <= hi._6 && lo._5 <= lo._6, "min ≤ max inside a bucket")
          assert(hi._5 > lo._6,
            s"$lang: bucket ${hi._2} range overlaps bucket ${lo._2}")
        case _ => ()
      }
      // permille floors: shares sum in (1000 - |buckets|, 1000]
      val ss = rs.map(_._4).sum
      assert(ss > 1000 - rs.length && ss <= 1000, s"$lang: shares sum $ss")
      // no bucket exceeds the atomic-tie bound: a bucket other than
      // the one a mega tie-group starts in holds < n/3 + tie mass;
      // weakest universal bound is n itself, so instead pin the rule:
      // bucket of a group recomputes from its start position p0
      val n = rs.map(_._3).sum
      // (the first score group of bucket b starts at exactly the
      // cumulative mass of the earlier buckets, so b recomputes)
      var p0 = 0L
      byBucket.foreach { case (_, bucket, nd, _, _, _) =>
        assert(bucket == 1 + (3 * p0) / n,
          s"$lang: bucket $bucket != start-position rule at p0=$p0, n=$n")
        p0 += nd
      }
    }
  }

  test("mrr: 2520/r exactness, rank bounds, hit-count agreement with RBP") {
    import spark.implicits._
    val mrr = q("q_mrr_eval")
      .as[(Long, Long, Long, Long)].collect()
    assert(mrr.length == 10, "one row per probe, zero-hit probes included")
    assert(mrr.map(_._1).sorted.toSeq == (0L to 9L).toSeq)
    mrr.foreach { case (qid, hits, fr, scaled) =>
      assert(hits >= 0 && hits <= 10, s"q$qid: hits $hits")
      if (fr == 0) {
        assert(hits == 0 && scaled == 0, s"q$qid: no hit must score 0")
      } else {
        assert(fr >= 1 && fr <= 10, s"q$qid: first hit rank $fr")
        assert(hits >= 1, s"q$qid: a first hit implies hits ≥ 1")
        assert(scaled == 2520L / fr, s"q$qid: 2520/$fr exactness")
      }
    }
    // cross-operator contract: RBP and MRR read the SAME two rankings,
    // so per probe (a) hit counts agree and (b) the first-hit rank is
    // visible in RBP's dyadic sum: 2^(10-fr) ≤ rbp_scaled < 2^(11-fr)
    val rbp = q("q_rbp_ranking_eval")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._3, r._4)).toMap
    mrr.foreach { case (qid, hits, fr, _) =>
      rbp.get(qid).foreach { case (rbpHits, rbpScaled) =>
        assert(rbpHits == hits, s"q$qid: RBP hits $rbpHits != MRR hits $hits")
        if (fr > 0) {
          assert(rbpScaled >= (1L << (10 - fr).toInt) &&
            rbpScaled < (1L << (11 - fr).toInt),
            s"q$qid: rbp_scaled $rbpScaled outside first-hit band for rank $fr")
        } else assert(rbpScaled == 0L, s"q$qid: zero hits but rbp $rbpScaled")
      }
    }
  }
}
