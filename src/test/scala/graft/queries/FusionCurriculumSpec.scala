package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTesting

/** Invariants for RRF fusion, epoch shuffle plans, and curriculum
  * banding: fusion score laws, permutation determinism, band
  * partitioning.
  */
class FusionCurriculumSpec extends AnyFunSuite {
  lazy val spark = SparkTesting.spark
  private def q(name: String) =
    graft.SparkEntry.queries(name)(spark, SparkTesting.sf)
  private def tbl(name: String) =
    graft.pipeline.Tables.t(spark, SparkTesting.sf, name)

  test("rrf_fusion: five fused per query, scores consistent with contributing ranks") {
    import spark.implicits._
    val rows = q("q_rrf_fusion")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (qid, rs) =>
      assert(rs.map(_._6).sorted.toSeq == (1L to 5L).toSeq, s"query $qid")
    }
    rows.foreach { case (qid, cid, rrf, ra, rb, _) =>
      assert(qid != cid)
      val want = (if (ra > 0) 1000 / (60 + ra) else 0L) +
        (if (rb > 0) 1000 / (60 + rb) else 0L)
      assert(rrf == want, s"($qid,$cid) rrf")
      assert(ra > 0 || rb > 0, "a fused candidate came from some ranker")
      assert(ra <= 20 && rb <= 20)
    }
    // a candidate ranked top by BOTH lists must outrank one ranked by
    // a single list at the same positions — monotonicity smoke
    assert(rows.filter(_._6 == 1L).forall(r => r._3 >= 16),
      "fused winner carries at least one strong contribution")
  }

  test("epoch_shuffle_plan: three distinct permutation prefixes, checksums differ") {
    import spark.implicits._
    val rows = q("q_epoch_shuffle_plan")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.length == 15, "3 epochs x top-5")
    val byEpoch = rows.groupBy(_._1)
    assert(byEpoch.keySet == Set(0L, 1L, 2L))
    byEpoch.foreach { case (ep, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (1L to 5L).toSeq, s"epoch $ep ranks")
      assert(rs.map(_._5).distinct.length == 1, s"epoch $ep one checksum")
      // priorities ascend with rank (the permutation key)
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._4).zip(sorted.map(_._4).tail)
        .forall { case (a, b) => a <= b }, s"epoch $ep priority order")
    }
    // different epochs hash to different orders (overwhelming odds)
    assert(byEpoch.values.map(_.sortBy(_._2).map(_._3).toSeq).toSet.size == 3,
      "epoch permutations differ")
    assert(rows.map(_._5).distinct.length == 3, "per-epoch checksums differ")
  }

  test("curriculum_schedule: four bands partition the corpus, ranges ordered") {
    import spark.implicits._
    val rows = q("q_curriculum_schedule").as[(Long, Long, Long, Long)].collect()
    assert(rows.map(_._1).sorted.toSeq == (1L to 4L).toSeq)
    assert(rows.map(_._2).sum == tbl("documents").count())
    rows.foreach { case (band, n, dMin, dMax) =>
      assert(n > 0 && dMin <= dMax, s"band $band")
    }
    // band ranges are non-overlapping and ascending
    val s = rows.sortBy(_._1)
    s.sliding(2).foreach {
      case Array((_, _, _, hiPrev), (_, _, loNext, _)) =>
        assert(hiPrev <= loNext, "quartile bands ascend")
      case _ =>
    }
  }
}
