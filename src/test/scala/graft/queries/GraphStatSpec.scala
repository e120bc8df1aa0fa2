package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTesting
import graft.ops.{MGBuf, MisraGriesAgg}

/** Plan-shape + invariant checks for GraphStatQueries. Value-level
  * correctness is the DuckDB oracle's job; these lock the SCALE
  * properties (shuffle counts, broadcast choices, bounded sketch
  * state) and the semantic guarantees the oracle can't see (skyline
  * dominance, Misra-Gries one-sidedness).
  */
class GraphStatSpec extends AnyFunSuite {
  lazy val spark = SparkTesting.spark
  private def q(name: String) =
    graft.SparkEntry.queries(name)(spark, SparkTesting.sf)

  private def executed(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    SparkTesting.finalSection(df.queryExecution.executedPlan.toString)
  }

  test("skyline: one window shuffle on brand; no join; dominance holds") {
    val df = q("q_skyline_pareto")
    val plan = executed(df)
    assert(!plan.contains("Join"), s"skyline is window-only, no self-join:\n$plan")
    // brute-force dominance check: no kept point is dominated by any
    // other KEPT point (transitivity extends this to all points)
    val rows = df.collect().toSeq.map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    for (Seq(a, b) <- rows.combinations(2); if a._1 == b._1) {
      val dominated =
        (a._2 <= b._2 && a._3 >= b._3 && (a._2 < b._2 || a._3 > b._3)) ||
          (b._2 <= a._2 && b._3 >= a._3 && (b._2 < a._2 || b._3 > a._3))
      assert(!dominated, s"skyline points dominate each other: $a vs $b")
    }
  }

  test("markov: permilles row-sum to ≤1000 and >1000-|types| floor loss") {
    val df = q("q_markov_transition")
    val sums = df.groupBy("prev")
      .agg(sum("permille").as("s"), count(lit(1)).as("k"))
      .collect()
    sums.foreach { r =>
      val s = r.getLong(1); val k = r.getLong(2)
      assert(s <= 1000 && s > 1000 - k,
        s"floor-permille row must sum into (1000-k, 1000]: $r")
    }
  }

  test("concurrency sweep: one event_type shuffle; peaks ≥ 1") {
    val df = q("q_concurrency_sweep")
    val plan = executed(df)
    assert(SparkTesting.hashExchanges(plan) == 1,
      s"union is narrow; sweep rides ONE event_type exchange:\n$plan")
    assert(df.filter(col("peak") < 1).count() == 0)
  }

  test("pctl: p25 ≤ p50 ≤ p75, all values present in the data") {
    val df = q("q_pctl_disc_group").collect()
    df.foreach { r =>
      assert(r.getLong(1) <= r.getLong(2) && r.getLong(2) <= r.getLong(3))
    }
  }

  test("heavy hitters: candidate pass broadcasts; result = exact filter") {
    val df = q("q_heavy_hitters_gate")
    val plan = executed(df)
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"candidate + total joins must broadcast:\n$plan")
    // independent exact recompute with plain DataFrame ops
    val docs = graft.pipeline.Tables.t(spark, SparkTesting.sf, "documents")
    val w = docs.select(col("source"),
        explode(graft.text.TextAnalysis.tokens(col("text"))).as("tok"))
      .groupBy("source", "tok").agg(count(lit(1)).as("n"))
    val tot = w.groupBy("source").agg(sum("n").as("total"))
    val expect = w.join(tot, "source").filter(col("n") * 32 > col("total"))
      .select("source", "tok", "n")
    assert(df.exceptAll(expect).count() == 0 && expect.exceptAll(df).count() == 0,
      "sketch-gated result must equal the exact heavy-hitter set")
  }

  test("pagerank: rank conservation and bounds") {
    val df = q("q_pagerank_iter").collect()
    // every rank ∈ [150, 150 + 850·indegScale]; total mass stays near
    // 1000·|nodes| (floor losses only shrink it)
    val n = df.length.toLong
    val total = df.map(_.getLong(1)).sum
    assert(df.forall(_.getLong(1) >= 150))
    assert(total <= 1000 * n,
      s"floor-division PageRank can only lose mass: total=$total nodes=$n")
    assert(total > 900 * n, s"mass loss should be small: total=$total nodes=$n")
  }

  test("knn classify: probe set broadcasts, top-k limited map-side, " +
      "prediction among the 5 voted labels") {
    val df = q("q_knn_classify")
    val plan = executed(df)
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"probes must broadcast against one corpus scan:\n$plan")
    assert(plan.contains("WindowGroupLimit"),
      s"top-k must reduce map-side before the qid shuffle:\n$plan")
    assert(df.filter(col("correct") =!=
      when(col("true_label") === col("pred_label"), 1).otherwise(0)).count() == 0)
  }

  test("window distinct count: one user shuffle; monotone within a day burst") {
    val df = q("q_window_distinct_count")
    val plan = executed(df)
    assert(SparkTesting.hashExchanges(plan) == 1,
      s"rolling distinct rides ONE user_id exchange:\n$plan")
    assert(df.filter(col("n_types_7d") < 1 || col("n_types_7d") > 5).count() == 0,
      "distinct count bounded by the event-type domain")
  }

  test("robust scaler: median maps to ~0, quartiles to ±1000 milli") {
    val df = q("q_robust_scaler")
    // rows at the median scale to 0 (or −1 from floor of −ε); the
    // scaled IQR spans ~[−1000, 1000] for the inner half of the data
    val n = df.count()
    val inner = df.filter(col("scaled_milli") >= -1000 && col("scaled_milli") <= 1000).count()
    assert(inner >= n / 2, s"inner half of data must land within ±IQR: $inner of $n")
    assert(df.filter(col("v") === col("scaled_milli")).count() != n,
      "scaling must actually transform")
  }

  test("target encode LOO: stats broadcast; encoding excludes own row") {
    val df = q("q_target_encode_loo")
    val plan = executed(df)
    assert(plan.contains("BroadcastHashJoin"),
      s"per-type stats must broadcast onto the fact:\n$plan")
    // independent check on one type: loo differs from the plain mean
    // whenever v differs from the type mean (own-row exclusion)
    val rows = df.filter(col("event_type") === "click")
      .select("v", "loo_mean_milli").collect().map(r => (r.getLong(0), r.getLong(1)))
    val n = rows.length.toLong
    val s0 = rows.map(_._1).sum
    rows.foreach { case (v, loo) =>
      val expect = math.floor((s0 - v).toDouble / (n - 1)).toLong
      assert(loo == expect, s"v=$v loo=$loo expect=$expect")
    }
  }

  test("supplier concentration: permille within (0, 1000]; top3 ≤ total") {
    val df = q("q_supplier_concentration")
    assert(df.filter(col("top3_rev") > col("total_rev")).count() == 0)
    assert(df.filter(col("top3_permille") <= 0 || col("top3_permille") > 1000).count() == 0)
  }

  test("gini: within [0, 1000); tied-frequency rank assignment is order-proof") {
    val df = q("q_gini_source")
    assert(df.filter(col("gini_milli") < 0 || col("gini_milli") >= 1000).count() == 0)
  }

  test("drift shares: permilles and drift reconcile; totals conserved") {
    val df = q("q_drift_shares")
    assert(df.filter(col("drift_permille") =!=
      (col("share2_permille") - col("share1_permille"))).count() == 0)
    val sums = df.agg(sum("share1_permille"), sum("share2_permille")).collect()(0)
    // floor-permille column sums land in (1000-k, 1000]
    val k = df.count()
    assert(sums.getLong(0) <= 1000 && sums.getLong(0) > 1000 - k)
    assert(sums.getLong(1) <= 1000 && sums.getLong(1) > 1000 - k)
  }

  test("hard-pair mining: pos/neg distinct, WindowGroupLimit reduces map-side") {
    val df = q("q_hard_negative_mining")
    val plan = executed(df)
    assert(plan.contains("WindowGroupLimit"),
      s"rank-1 argmax must reduce before the qid shuffle:\n$plan")
    assert(df.filter(col("pos_id") === col("neg_id")).count() == 0,
      "hardest positive and negative are different rows by label disjointness")
  }

  test("stickiness: wau ≥ dau; ratio in (0, 1000]; fact never joins fact") {
    val df = q("q_stickiness_dau_wau")
    val plan = executed(df)
    assert(df.filter(col("wau") < col("dau")).count() == 0)
    assert(df.filter(col("stickiness_permille") <= 0 ||
      col("stickiness_permille") > 1000).count() == 0)
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"the day list must broadcast against the (day,user) dedup:\n$plan")
  }

  test("stratified exemplars: ≤3 per cell, map-side group limit, stable picks") {
    val df = q("q_stratified_exemplars")
    val plan = executed(df)
    assert(plan.contains("WindowGroupLimit"),
      s"per-cell cap must reduce before the shuffle:\n$plan")
    val over = df.groupBy("lang", "bucket").count().filter(col("count") > 3).count()
    assert(over == 0)
    // determinism: a second run picks the same doc_ids
    val a = df.select("doc_id").collect().map(_.getLong(0)).toSeq
    val b = q("q_stratified_exemplars").select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(a == b, "hash-ordered exemplars must not churn")
  }

  test("supplier similarity: jaccard in (0,1000]; ≤3 per supplier; symmetric pairs") {
    val df = q("q_supplier_similarity")
    assert(df.filter(col("jac_permille") <= 0 || col("jac_permille") > 1000).count() == 0)
    assert(df.groupBy("suppkey").count().filter(col("count") > 3).count() == 0)
    val plan = executed(df)
    assert(plan.contains("WindowGroupLimit"), s"top-3 must cap map-side:\n$plan")
  }

  test("assoc rules: confidence ≤ 1000; rules come in directed pairs") {
    val df = q("q_assoc_rules")
    assert(df.filter(col("conf_permille") > 1000 || col("conf_permille") <= 0).count() == 0)
    val fwd = df.select(col("antecedent"), col("consequent")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fwd.forall { case (a, b) => fwd.contains((b, a)) },
      "every A→B rule must have its B→A sibling")
  }

  test("cusum: one row per type; last cumulative deviation sums to zero check") {
    val df = q("q_changepoint_cusum")
    val types = graft.pipeline.Tables.t(spark, SparkTesting.sf, "events")
      .select("event_type").distinct().count()
    assert(df.count() == types, "exactly one changepoint per type")
    assert(df.filter(col("cusum") === 0).count() == 0 || df.count() == 0,
      "a peak deviation of zero would mean a perfectly flat series")
  }

  test("trend slope: den > 0; rational reproduces independently") {
    val rows = q("q_trend_slope").collect()
    rows.foreach { r => assert(r.getLong(3) > 0, s"slope_den must be positive: $r") }
    // independent recompute for one type
    val daily = graft.pipeline.Tables.t(spark, SparkTesting.sf, "events")
      .filter(col("event_type") === "view")
      .groupBy(date_trunc("day", col("ts")).cast("date").as("day"))
      .agg(count(lit(1)).as("y")).collect()
      .map(r => (r.getDate(0).toLocalDate.toEpochDay - java.time.LocalDate.parse("2024-01-01").toEpochDay,
        r.getLong(1)))
    val n = daily.length.toLong
    val sx = daily.map(_._1).sum; val sy = daily.map(_._2).sum
    val sxy = daily.map(p => p._1 * p._2).sum; val sxx = daily.map(p => p._1 * p._1).sum
    val viewRow = rows.find(_.getString(0) == "view").get
    assert(viewRow.getLong(2) == n * sxy - sx * sy && viewRow.getLong(3) == n * sxx - sx * sx)
  }

  test("misra-gries: one-sided guarantee on adversarial + merged streams") {
    val k = 9
    val agg = new MisraGriesAgg(k)
    val rnd = new scala.util.Random(7)
    // zipf-ish stream: token i appears ~N/(i+1) times, shuffled
    val stream = rnd.shuffle(
      (0 until 40).flatMap(i => Seq.fill(1200 / (i + 1))(s"t$i")).toVector)
    val nTot = stream.size.toLong
    // split into 7 chunks, reduce each, merge pairwise in random order
    val parts = stream.grouped(stream.size / 7 + 1).map(ch =>
      ch.foldLeft(agg.zero)(agg.reduce)).toVector
    val merged = rnd.shuffle(parts).reduce(agg.merge)
    val out = agg.finish(merged).toSet
    assert(merged.toks.size <= k, "state must stay bounded by k")
    val exact = stream.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    exact.foreach { case (t, c) =>
      if (c > nTot / (k + 1))
        assert(out.contains(t), s"token $t freq=$c > N/(k+1)=${nTot / (k + 1)} must survive")
    }
  }

  test("rfm: quintile sizes balanced within 1; scores span 1..5") {
    val df = q("q_rfm_scores")
    for (c <- Seq("r_score", "f_score", "m_score")) {
      val sizes = df.groupBy(c).count().collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(sizes.map(_._1).sorted.sameElements(1L to 5L), s"$c must hit all 5 quintiles")
      assert(sizes.map(_._2).max - sizes.map(_._2).min <= 1,
        s"ntile quintiles differ by at most 1: ${sizes.mkString(",")}")
    }
  }

  test("anomaly mad: every flagged row clears 3×MAD; medians broadcast") {
    val df = q("q_anomaly_mad")
    val plan = executed(df)
    assert(plan.contains("BroadcastHashJoin"),
      s"dim-sized median/MAD tables must broadcast-join the stream:\n$plan")
    assert(df.filter(col("dev") <= lit(3) * col("mad")).count() == 0)
  }

  test("cosupplier degree: symmetric relation, no cartesian product") {
    val df = q("q_cosupplier_degree")
    val plan = executed(df)
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"self-join must stay keyed on partkey:\n$plan")
    // degree bound: a supplier can't co-occur with more suppliers
    // than exist (minus itself)
    val nSup = graft.pipeline.Tables.t(spark, SparkTesting.sf, "supplier").count()
    assert(df.filter(col("n_cosuppliers") >= nSup).count() == 0)
  }

  test("label propagation: labels stay inside the native domain") {
    val df = q("q_label_propagation")
    val native = df.select("native_label").distinct().collect().map(_.getLong(0)).toSet
    val prop = df.select("propagated_label").distinct().collect().map(_.getLong(0)).toSet
    assert(prop.subsetOf(native),
      s"propagation can only redistribute existing labels: ${prop -- native}")
    assert(df.filter((col("agrees") === 1) =!=
      (col("native_label") === col("propagated_label"))).count() == 0)
  }

  test("session pattern dup: windows and session agg share the user shuffle; " +
      "every reported pattern has ≥2 sessions") {
    val df = q("q_session_pattern_dup")
    val plan = executed(df)
    // 1 user_id exchange (both windows + session agg) + 1 pattern
    // exchange (final agg) — anything more means a window replanned
    assert(SparkTesting.hashExchanges(plan) <= 2,
      s"expected ≤2 exchanges (user_id, pattern):\n$plan")
    assert(df.filter(col("n_sessions") < 2).count() == 0)
    assert(df.filter(col("n_users") > col("n_sessions")).count() == 0,
      "a user contributes at least one session per counted pattern")
  }

  test("class weights: inverse monotone — rarer label never weighs less") {
    val rows = q("q_class_weights").collect()
      .map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    rows.sliding(2).foreach {
      case Array((n1, w1), (n2, w2)) =>
        assert(n1 > n2 || w1 >= w2, s"weight must not increase with count: ($n1,$w1) ($n2,$w2)")
      case _ =>
    }
  }
}
