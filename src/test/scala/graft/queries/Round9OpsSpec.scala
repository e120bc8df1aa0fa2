package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTesting

/** Invariant + plan-shape checks for the round-9 late additions
  * (rank-AUC, future-window labels, trigram mining, SAX coding, BM25,
  * BPE pair stats, k-anonymity). Value-level correctness is the
  * DuckDB oracle's job; these lock the semantic invariants the oracle
  * can't see (probability bounds, leakage rules, quartile balance)
  * and the scale-critical plan shapes (no self-join on the label
  * window, broadcast-only dims on BM25).
  */
class Round9OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTesting.spark
  private def q(name: String) =
    graft.SparkEntry.queries(name)(spark, SparkTesting.sf)

  test("auc_rank: AUC in [0,1e6], class counts partition each type's events") {
    import spark.implicits._
    val rows = q("q_auc_rank")
      .as[(String, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (et, n1, n0, auc) =>
      assert(n1 > 0 && n0 > 0, s"$et n1=$n1 n0=$n0")
      assert(auc >= 0 && auc <= 1000000, s"$et auc_micro=$auc")
    }
    val total = graft.pipeline.Tables.t(spark, SparkTesting.sf, "events")
      .groupBy("event_type").count()
      .as[(String, Long)].collect().toMap
    rows.foreach { case (et, n1, n0, _) =>
      assert(n1 + n0 == total(et), s"$et: $n1+$n0 != ${total(et)}")
    }
  }

  test("label_future_window: binary labels, no same-day leakage, join-free plan") {
    import spark.implicits._
    val df = q("q_label_future_window")
    val rows = df.as[(Long, String, Long, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (_, _, _, l) => l == 0L || l == 1L })
    // leakage rule: a user whose ONLY purchase day is D must have
    // label 0 on day D itself (frame starts at D+1)
    val buyDays = graft.pipeline.Tables.t(spark, SparkTesting.sf, "events")
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
      .distinct().as[(Long, String)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val labeled = rows.groupBy(_._1)
    labeled.foreach { case (u, rs) =>
      val buys = buyDays.getOrElse(u, Set.empty)
      rs.foreach { case (_, day, _, l) =>
        val next7 = (1 to 7).map(k => java.time.LocalDate.parse(day).plusDays(k).toString)
        val expect = if (next7.exists(buys)) 1L else 0L
        assert(l == expect, s"user $u day $day: label $l expected $expect (buys=$buys)")
      }
    }
    // scale shape: RANGE window over day numbers, never a self-join
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"label window must be join-free:\n$plan")
  }

  test("seq_trigrams: 25 rows, desc counts, well-formed trigrams") {
    import spark.implicits._
    val rows = q("q_seq_trigrams").as[(String, Long)].collect()
    assert(rows.length == 25)
    assert(rows.sliding(2).forall { case Array(a, b) =>
      a._2 > b._2 || (a._2 == b._2 && a._1 < b._1) }, "order by cnt desc, trigram")
    rows.foreach { case (tg, c) =>
      assert(tg.split(">").length == 3, tg); assert(c > 0)
    }
  }

  test("sax_quartile: symbol string spans all days, quartiles balanced") {
    import spark.implicits._
    val rows = q("q_sax_quartile").as[(String, Long, String)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (et, nDays, sax) =>
      assert(sax.length == nDays, s"$et: |sax|=${sax.length} != n_days=$nDays")
      assert(sax.forall(c => c >= 'a' && c <= 'd'), s"$et: $sax")
      // ntile contract: bucket sizes differ by at most 1
      val counts = "abcd".map(c => sax.count(_ == c))
      assert(counts.max - counts.min <= 1, s"$et: symbol counts $counts")
    }
  }

  test("bm25_topk: every hit contains a query term, scores positive desc, dims broadcast") {
    import spark.implicits._
    val df = q("q_bm25_topk")
    val rows = df.as[(Long, Long)].collect()
    assert(rows.nonEmpty && rows.length <= 20)
    assert(rows.forall(_._2 > 0))
    assert(rows.sliding(2).forall { case Array(a, b) =>
      a._2 > b._2 || (a._2 == b._2 && a._1 < b._1) })
    val hits = rows.map(_._1).toSet
    val withTerm = graft.pipeline.Tables.t(spark, SparkTesting.sf, "documents")
      .filter(col("text").rlike("(^| )(spark|join|window)( |$)"))
      .select("doc_id").as[Long].collect().toSet
    assert(hits.subsetOf(withTerm), s"hits without any query term: ${hits -- withTerm}")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // df + (N,L) both ride broadcasts; the only shuffles key on doc/term aggs
    assert(plan.contains("BroadcastExchange"), plan)
    assert(!plan.contains("SortMergeJoin"), s"BM25 dims must broadcast:\n$plan")
  }

  test("bpe_pair_count: 2-char pairs, desc counts") {
    import spark.implicits._
    val rows = q("q_bpe_pair_count").as[(String, Long)].collect()
    assert(rows.length == 20)
    rows.foreach { case (p, c) => assert(p.length == 2, p); assert(c > 0) }
    assert(rows.sliding(2).forall { case Array(a, b) =>
      a._2 > b._2 || (a._2 == b._2 && a._1 < b._1) })
  }

  test("char_gini: permille bounds, single-char docs hit zero impurity") {
    import spark.implicits._
    val rows = q("q_char_gini").as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, n, g) =>
      assert(n > 0)
      assert(g >= 0 && g < 1000, s"doc $id gini=$g")
      // a doc whose non-space chars are all identical must score 0
      if (n == 1) assert(g == 0)
    }
  }

  test("cohort_ltv: cumulative revenue monotone, buyers within cohort size") {
    import spark.implicits._
    val rows = q("q_cohort_ltv")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (cohort, rs) =>
      val byAge = rs.sortBy(_._2)
      byAge.foreach { case (_, age, rev, buyers, users, cum, ltv) =>
        assert(age >= 0, s"$cohort age=$age")
        assert(buyers <= users, s"$cohort: buyers $buyers > cohort $users")
        assert(ltv == Math.floorDiv(1000 * cum, users))
      }
      // cum_rev_cents strictly accumulates rev_cents in age order
      val cums = byAge.map(_._6)
      val expect = byAge.map(_._3).scanLeft(0L)(_ + _).drop(1)
      assert(cums.sameElements(expect), s"$cohort: $cums vs $expect")
    }
  }

  test("bounce_rate: permille bounds, bounces never exceed sessions") {
    import spark.implicits._
    val rows = q("q_bounce_rate").as[(String, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (day, sessions, bounces, p) =>
      assert(sessions > 0 && bounces >= 0 && bounces <= sessions, s"$day")
      assert(p == Math.floorDiv(1000 * bounces, sessions))
    }
  }

  test("embed_class_margin: flag exact, centroid table broadcast, own-dist sane") {
    import spark.implicits._
    val df = q("q_embed_class_margin")
    val rows = df.as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, _, own, other, margin, sep) =>
      assert(own >= 0 && other >= 0, s"vec $id")
      assert(margin == other - own)
      assert(sep == (if (other > own) 1L else 0L))
    }
    // the synthetic labels are weakly clustered (~37% separable at
    // sf0.01) — assert non-degeneracy, not majority: a constant flag
    // (all-0 or all-1) means the margin computation collapsed
    val sep = rows.count(_._6 == 1L)
    assert(sep > 0 && sep < rows.length, s"degenerate separable flag: $sep/${rows.length}")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"), plan)
    assert(!plan.contains("SortMergeJoin"), s"centroids must broadcast:\n$plan")
  }

  test("k_anonymity: classes partition the corpus, risky flag exact") {
    import spark.implicits._
    val rows = q("q_k_anonymity")
      .as[(String, String, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, _, cnt, risky) =>
      assert(risky == (if (cnt < 5) 1L else 0L))
    }
    val totalDocs = graft.pipeline.Tables.t(spark, SparkTesting.sf, "documents").count()
    assert(rows.map(_._4).sum == totalDocs)
  }
}
