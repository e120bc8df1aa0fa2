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

  test("sample reservoir: k per group, dense ranks, md5-pure draw") {
    import spark.implicits._
    val rows = q("q_sample_reservoir").as[(String, Long, Long)].collect()
    val langSizes = tbl("documents").groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    assert(rows.map(_._1).toSet == langSizes.keySet, "every language sampled")
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      assert(rs.length == math.min(5L, langSizes(lang)),
        s"$lang: expected min(5, n) picks")
      assert(rs.map(_._2).sorted.toSeq == (1L to rs.length).toSeq,
        s"$lang: dense pick ranks")
      assert(rs.map(_._3).distinct.length == rs.length,
        s"$lang: duplicate doc in sample")
    }
    // purity: the engine's draw for one language recomputes from JVM
    // md5 alone (same discipline as the kfold spec)
    val lang0 = langSizes.keys.min
    def tag(id: Long): String = java.security.MessageDigest
      .getInstance("MD5").digest(s"rsv1|$id".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val expect = tbl("documents").filter(col("lang") === lang0)
      .select("doc_id").as[Long].collect()
      .map(id => (tag(id), id)).sorted.take(5).map(_._2).toSeq
    val got = rows.filter(_._1 == lang0).sortBy(_._2).map(_._3).toSeq
    assert(got == expect, s"$lang0: engine draw $got != md5 recompute $expect")
  }

  test("vocab coverage curve: monotone in k, exact vocab cuts, mass bounds") {
    import spark.implicits._
    val rows = q("q_vocab_coverage_curve")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(256L, 1024L, 4096L, 16384L))
    val vocab = tbl("documents")
      .select(explode(graft.text.TextAnalysis.tokens(col("text"))).as("tok"))
      .agg(countDistinct("tok"), count(lit(1))).as[(Long, Long)].head()
    val (nVocab, nTokens) = vocab
    rows.foreach { case (k, nCut, mass, tot, cov) =>
      assert(nCut == math.min(k, nVocab), s"k=$k: n_vocab_at_cut $nCut")
      assert(tot == nTokens, s"k=$k: total_tokens $tot != $nTokens")
      assert(mass <= tot && cov == 1000L * mass / tot, s"k=$k: mass/coverage")
      if (k >= nVocab) assert(mass == tot && cov == 1000L,
        s"k=$k covers the whole vocab but mass $mass != total $tot")
    }
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._2 <= b._2 && a._3 <= b._3 && a._5 <= b._5,
        "curve must be non-decreasing in k")
    }
  }
}
