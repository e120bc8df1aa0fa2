package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTesting

/** Plan-shape + invariant checks for the analytics surface
  * (AnalyticsQueries). Value-level correctness is the DuckDB oracle's
  * job; these lock the SCALE properties — shuffle counts, broadcast
  * choices, narrow chunking — and the semantic invariants the oracle
  * can't see (frame coverage, outlier threshold).
  */
class AnalyticsQueriesSpec extends AnyFunSuite {
  lazy val spark = SparkTesting.spark
  private def q(name: String) =
    graft.SparkEntry.queries(name)(spark, SparkTesting.sf)

  private def executed(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    SparkTesting.finalSection(df.queryExecution.executedPlan.toString)
  }

  private def hashExchanges(plan: String): Int =
    SparkTesting.hashExchanges(plan)

  test("ewma_trailing: window invariants — den bounds, lone-day identity") {
    import spark.implicits._
    val rows = q("q_ewma_trailing")
      .select("event_type", "n_events", "ewma_num", "ewma_den", "ewma_milli")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (et, c, num, den, milli) =>
      // den = Σ 2^(6-lag) over 1..7 observed days ⇒ within [1, 127];
      // the current day always contributes weight 64
      assert(den >= 64 && den <= 127, s"$et den=$den")
      // num is a convex-ish combination bound: den·min ≤ num ≤ den·max
      // can't check per-window here, but milli must equal the floor div
      assert(milli == Math.floorDiv(1000 * num, den))
      // a fully-isolated day (den == 64) smooths to exactly its own count
      if (den == 64) assert(milli == Math.floorDiv(1000 * c * 64, 64L))
    }
  }

  test("ewma_trailing: one fact shuffle, donation fan-out on the daily dim only") {
    val plan = executed(q("q_ewma_trailing"))
    // explode(sequence(0,6)) runs AFTER the daily aggregate — the
    // fact table is never fanned out 7× (the Generate sits above the
    // first HashAggregate pair, below only dim-sized exchanges)
    assert(plan.contains("Generate explode"), plan)
    // daily-agg side + join-back side: 2 scans, or 1 when AQE reuses
    // the daily exchange — never more (the fact is not in the fan-out)
    val factScans = plan.linesIterator.count(l =>
      l.contains("FileScan parquet") && l.contains("events.parquet"))
    assert(factScans >= 1 && factScans <= 2,
      s"expected 1-2 events scans (daily + join-back), got $factScans:\n$plan")
  }

  test("calibration bins: partition of all events, rates exact, bins ordered") {
    import spark.implicits._
    val rows = q("q_calibration_bins")
      .select("bin", "n", "positives", "pos_permille", "lo_cents", "hi_cents")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(rows.nonEmpty && rows.forall(r => r._1 >= 0 && r._1 <= 9))
    val total = graft.pipeline.Tables.t(spark, SparkTesting.sf, "events").count()
    assert(rows.map(_._2).sum == total, "bins must partition the event set")
    rows.foreach { case (bin, n, pos, pm, lo, hi) =>
      assert(pos >= 0 && pos <= n)
      assert(pm == Math.floorDiv(1000 * pos, n))
      assert(lo <= hi)
    }
    // observed per-bin cent ranges never overlap across ordered bins
    rows.sortBy(_._1).sliding(2).foreach {
      case Seq(a, b) => assert(a._6 < b._5, s"bins ${a._1}/${b._1} overlap")
      case _ =>
    }
  }

  test("quantile normalize: grank in [1,N], within-source monotone, global identity") {
    import spark.implicits._
    val rows = q("q_quantile_normalize")
      .select("doc_id", "source", "n_chars", "grank", "norm_chars")
      .as[(Long, String, Long, Long, Long)].collect().toSeq
    val n = rows.size
    assert(n > 0)
    rows.foreach { case (_, _, _, g, _) => assert(g >= 1 && g <= n) }
    // within a source, a longer doc can never normalize below a shorter one
    rows.groupBy(_._2).values.foreach { docs =>
      docs.sortBy(d => (d._3, d._1)).map(_._5).sliding(2).foreach {
        case Seq(a, b) => assert(a <= b, "normalization must be monotone")
        case _ =>
      }
    }
    // the top-ranked doc of every source maps to the global maximum
    // (grank = ⌈n_s·N/n_s⌉ = N exactly), and every norm value is a
    // value that actually occurs in the corpus
    val globalMax = rows.map(_._3).max
    val occurring = rows.map(_._3).toSet
    rows.groupBy(_._2).values.foreach { docs =>
      assert(docs.maxBy(d => (d._3, d._1))._5 == globalMax)
    }
    assert(rows.forall(r => occurring.contains(r._5)))
  }

  test("quantile normalize: single-partition exchange only under the value histogram") {
    // the global distribution may enter ONLY as the dim-sized value
    // histogram — a SinglePartition exchange is fine there, but the
    // fact side must never collapse to one partition (the global
    // row_number trap). Structural check: every SinglePartition
    // exchange in the final plan sits above an aggregate (the vc
    // histogram path), never directly above a documents scan.
    val plan = executed(q("q_quantile_normalize"))
    val lines = plan.linesIterator.toSeq
    val spIdx = lines.zipWithIndex.filter(_._1.contains("Exchange SinglePartition"))
    spIdx.foreach { case (_, i) =>
      val below = lines.drop(i).take(8).mkString("\n")
      assert(below.contains("HashAggregate") || below.contains("Window"),
        s"SinglePartition exchange not over the histogram path:\n$below")
    }
    // and the fact-side per-source window partitions by source
    assert(plan.contains("Exchange hashpartitioning(source"),
      s"per-source window must hash-partition on source:\n$plan")
  }

  test("feature hashing: bucket mass conserves token count, buckets in range") {
    import spark.implicits._
    val rows = q("q_feature_hashing")
      .select("doc_id", "bucket", "cnt").as[(Long, Int, Long)].collect()
    assert(rows.forall(r => r._2 >= 0 && r._2 < 64 && r._3 > 0))
    val massByDoc = rows.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val tokByDoc = graft.pipeline.Tables.t(spark, SparkTesting.sf, "documents")
      .select(col("doc_id"),
        graft.text.TextAnalysis.tokenCount(col("text")).as("n"))
      .as[(Long, Long)].collect().toMap
    tokByDoc.filter(_._2 > 0).foreach { case (id, n) =>
      assert(massByDoc.getOrElse(id, 0L) == n,
        s"doc $id: hashed mass ${massByDoc.get(id)} != token count $n")
    }
  }

  test("compaction plan: bins contiguous, every bin but the last crosses target") {
    import spark.implicits._
    val rows = q("q_compaction_plan")
      .select("source", "doc_id", "bytes", "cum_bytes", "file_bin")
      .as[(String, Long, Long, Long, Long)].collect()
    rows.groupBy(_._1).values.foreach { fs =>
      val ordered = fs.sortBy(_._2)
      // cumsum consistency + bins non-decreasing in doc order
      ordered.foldLeft((0L, 0L)) { case ((cum, lastBin), (_, _, b, c, bin)) =>
        assert(c == cum + b)
        assert(bin >= lastBin)
        (c, bin)
      }
      // greedy fill: a bin only closes once its cumulative stream
      // crosses the next 4096 boundary — so each non-final bin's
      // last doc has cum ≥ (bin+1)·4096
      ordered.groupBy(_._5).toSeq.sortBy(_._1).dropRight(1).foreach {
        case (bin, files) =>
          assert(files.map(_._4).max >= (bin + 1) * 4096,
            s"bin $bin closed before filling its 4096 target")
      }
    }
  }

  test("unpivot: ONE lineitem scan through an Expand — never 4 re-scans") {
    val plan = executed(q("q_unpivot_melt"))
    val scans = plan.linesIterator.count(l =>
      l.contains("FileScan parquet") && l.contains("lineitem.parquet"))
    assert(scans == 1, s"expected 1 lineitem scan, got $scans:\n$plan")
    assert(plan.contains("Expand"), s"unpivot should plan as Expand:\n$plan")
    // 4 measures × rows, partitioned into the 4 measure names
    import spark.implicits._
    val n = graft.pipeline.Tables.t(spark, SparkTesting.sf, "lineitem").count()
    val byMeasure = q("q_unpivot_melt").groupBy("measure").count()
      .as[(String, Long)].collect().toMap
    assert(byMeasure.keySet ==
      Set("quantity", "extendedprice", "discount", "tax"))
    assert(byMeasure.values.forall(_ == n))
  }

  test("pivot: two-phase aggregate, no join, fixed column set") {
    val df = q("q_pivot_event_counts")
    val plan = executed(df)
    // Catalyst plans pivot as partial count on (user, type) then
    // pivotfirst on user: 2 exchanges, the second over rows already
    // reduced to ≤ |users|·|types| — the fact is shuffled only once
    assert(hashExchanges(plan) == 2, s"pivot is a two-phase agg:\n$plan")
    assert(!plan.contains("Join"), s"pivot must not join:\n$plan")
    assert(df.columns.toSeq ==
      Seq("user_id", "click", "error", "purchase", "signup", "view"))
    // row invariant: pivot cells sum back to the per-user event count
    val bad = df.withColumn("total",
        col("click") + col("error") + col("purchase") + col("signup") + col("view"))
      .join(graft.pipeline.Tables.t(spark, SparkTesting.sf, "events")
        .groupBy("user_id").agg(count(lit(1)).as("n")), "user_id")
      .filter(col("total") =!= col("n")).count()
    assert(bad == 0)
  }

  test("window frames: running + moving sums share one shuffle") {
    val plan = executed(q("q_running_total"))
    assert(hashExchanges(plan) == 1,
      s"both frames must ride one user_id exchange:\n$plan")
  }

  test("lag gap: one shuffle; gaps are non-negative and null-first") {
    val df = q("q_event_gap_lag")
    val plan = executed(df)
    assert(hashExchanges(plan) == 1, s"lag should shuffle once:\n$plan")
    assert(df.filter(col("gap_us") < 0).count() == 0,
      "ordered-by-ts gaps can never be negative")
    val users = df.select("user_id").distinct().count()
    assert(df.filter(col("gap_us").isNull).count() == users,
      "exactly one NULL gap (the first event) per user")
  }

  test("z-score: stats broadcast back onto the fact — no fact shuffle join") {
    val df = q("q_zscore_outliers")
    val plan = executed(df)
    assert(plan.contains("BroadcastHashJoin"),
      s"per-type stats must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"the fact must never be shuffled for the stats join:\n$plan")
    // recompute the exact per-type moments: every surviving row must
    // satisfy the exact-integer predicate 4·num² > 25·den against the
    // UNREDUCED den (the emitted zvar_cents2 is den div n² — the
    // scale-free floored population variance that replaced raw den
    // when sf10 pushed den past BIGINT)
    val ev = graft.pipeline.Tables.t(spark, SparkTesting.sf, "events")
      .select(col("event_type"),
        floor(col("value") * lit(100.0) + lit(0.5))
          .cast("decimal(38,0)").as("c"))
    val st = ev.groupBy("event_type").agg(
      count(lit(1)).cast("decimal(38,0)").as("n"),
      sum(col("c")).as("sc"), sum(expr("c * c")).as("scc"))
    val joined = df.join(st, "event_type")
    assert(joined.filter(expr(
      "4 * cast(znum_cents as decimal(38,0)) * znum_cents <= " +
        "25 * (n * scc - sc * sc)")).count() == 0,
      "an emitted row fails the exact |z| > 2.5 predicate")
    assert(joined.filter(expr(
      "cast(zvar_cents2 as decimal(38,0)) <> div(n * scc - sc * sc, n * n)"))
      .count() == 0,
      "zvar_cents2 must be the floored population variance den div n²")
    // and the variance is a true centered second moment: non-negative
    assert(df.filter(col("zvar_cents2") < 0).count() == 0)
  }

  test("inverted index: posting lists capped before collection") {
    val df = q("q_inverted_index")
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val postings = r.getAs[String]("postings").split(",").filter(_.nonEmpty)
      assert(postings.length <= 10, s"capped at 10: ${r}")
      assert(postings.length <= r.getAs[Long]("n_docs"))
      assert(postings.map(_.toLong).toSeq == postings.map(_.toLong).toSeq.sorted)
    }
    // r17 shape: the rank window carries row_number ALONE so the
    // map-side WindowGroupLimit fires (ScalePlanSpec pins it); n_docs
    // is its own term-keyed aggregate joined back. Cost: the distinct
    // pays one (doc_id, term) exchange — REUSED by both branches —
    // and each branch one term exchange: ≤3 real exchanges, one more
    // than the pre-r17 fused-window shape, bought back many times
    // over by stop-word posting lists never reaching a reducer.
    val plan = executed(df)
    val real = graft.SparkTesting.finalSection(plan).linesIterator
      .filter(_.contains("Exchange hashpartitioning"))
      .count(!_.contains("ReusedExchange"))
    assert(real <= 3, s"expected ≤3 real hash exchanges:\n$plan")
    assert(graft.SparkTesting.finalSection(plan).linesIterator
      .exists(l => l.contains("ReusedExchange") && l.contains("term")),
      s"the distinct exchange must be shared by both branches:\n$plan")
  }

  test("chunking is narrow (no hash shuffle) and covers every token") {
    val df = q("q_chunk_stride")
    val plan = executed(df)
    assert(hashExchanges(plan) == 0,
      s"per-row chunking must not shuffle:\n$plan")
    // exact shape: chunk i holds min(W, n_tok - i·S) tokens (only
    // the tail can be short), and the chunk count is ⌊(n-1)/S⌋+1 —
    // together these mean every token is covered and none invented
    import graft.text.{TextAnalysis => TA}
    val docs = graft.pipeline.Tables.t(spark, SparkTesting.sf, "documents")
      .select(col("doc_id"), size(TA.tokens(col("text"))).as("n_tok"))
    val j = df.join(docs, "doc_id")
    assert(j.filter(col("n_toks") =!=
      least(lit(32), col("n_tok") - col("chunk_idx") * 24)).count() == 0,
      "each chunk holds min(W, n - i*S) tokens")
    val badCount = df.groupBy("doc_id").agg(count(lit(1)).as("n_chunks"))
      .join(docs, "doc_id")
      .filter(col("n_chunks") =!=
        floor((greatest(col("n_tok"), lit(1)) - 1) / 24) + 1).count()
    assert(badCount == 0, "chunk count is floor((n-1)/S)+1")
  }

  test("snapshot diff: full-outer merge join, output is churn-only") {
    val df = q("q_snapshot_diff")
    val plan = executed(df)
    assert(plan.contains("SortMergeJoin") && plan.contains("FullOuter"),
      s"CDC diff is a full-outer sort-merge join:\n$plan")
    val statuses = df.select("status").distinct().collect().map(_.getString(0)).toSet
    assert(statuses.subsetOf(Set("inserted", "deleted", "updated")),
      s"unchanged rows must be filtered out, got $statuses")
  }

  test("runs/SCD-2: lag+cumsum islands ride ONE user_id exchange") {
    val df = q("q_runs_scd2")
    val plan = executed(df)
    // the headline: change-flag window, running-sum island, run
    // aggregate AND valid_to lead all reuse hash(user_id) — the
    // oracle's rn−rn derivation would need a second (user,type) one
    assert(hashExchanges(plan) == 1,
      s"islands must not add exchanges beyond hash(user_id):\n$plan")
    val events = graft.pipeline.Tables.t(spark, SparkTesting.sf, "events").count()
    val runTotal = df.agg(sum("n")).collect()(0).getLong(0)
    assert(runTotal == events, "every event belongs to exactly one run")
    val users = df.select("user_id").distinct().count()
    assert(df.filter(col("valid_to").isNull).count() == users,
      "exactly one open (current) run per user")
  }

  test("mode: one winner per user, threshold respected by tiebreak") {
    val df = q("q_mode_per_group")
    val users = graft.pipeline.Tables.t(spark, SparkTesting.sf, "events")
      .select("user_id").distinct().count()
    assert(df.count() == users)
    assert(df.select("user_id").distinct().count() == users)
  }

  test("exact-integer pearson moments satisfy Cauchy-Schwarz (|r| <= 1)") {
    val rows = q("q_corr_exact").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val cnum = BigInt(r.getAs[String]("cnum"))
      val dx = BigInt(r.getAs[String]("dx"))
      val dy = BigInt(r.getAs[String]("dy"))
      assert(dx >= 0 && dy >= 0, s"second moments are non-negative: $r")
      // r = cnum/sqrt(dx·dy) ∈ [-1,1] ⇔ cnum² ≤ dx·dy — exact BigInt
      assert(cnum * cnum <= dx * dy, s"|r| out of range: $r")
    }
  }

  test("ntile quartiles are balanced and complete") {
    val sizes = q("q_ntile_quartiles").groupBy("quartile").count()
      .collect().map(r => r.getAs[Int]("quartile") -> r.getAs[Long]("count")).toMap
    assert(sizes.keySet == Set(1, 2, 3, 4))
    assert(sizes.values.max - sizes.values.min <= 1,
      s"ntile must balance band sizes within 1: $sizes")
  }

  test("resample/LOCF: contiguous daily grid, no null after first day") {
    val df = q("q_resample_locf")
    assert(df.filter(col("filled").isNull).count() == 0,
      "grid starts at each user's first ACTIVE day, so LOCF never lacks a seed")
    val ev = graft.pipeline.Tables.t(spark, SparkTesting.sf, "events")
    val observedDays = ev.select(col("user_id"), to_date(col("ts")).as("d")).distinct().count()
    assert(df.filter(col("observed") === 1).count() == observedDays,
      "observed flags reproduce the distinct active (user, day) set")
    // contiguity: rows per user == span between first and last day
    val bad = df.groupBy("user_id")
      .agg(count(lit(1)).as("rows"), min("day").as("d0"), max("day").as("d1"))
      .filter(col("rows") =!= datediff(col("d1"), col("d0")) + 1).count()
    assert(bad == 0, "every day in the span appears exactly once")
  }

  test("fuzzy resolve: banding finds every planted typo, no nested loop") {
    val df = q("q_fuzzy_resolve")
    val plan = executed(df)
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"deletion-neighborhood banding must stay an equi-join:\n$plan")
    val rows = df.collect()
    assert(rows.nonEmpty)
    // every planted corruption is distance 1 from exactly its source
    assert(rows.forall(r => r.getAs[Long]("probe_key") == r.getAs[Long]("c_custkey")),
      "each typo'd probe must resolve to its own source row")
    val probes = graft.pipeline.Tables.t(spark, SparkTesting.sf, "customer")
      .filter(col("c_custkey") % 11 === 0 || col("c_custkey") % 13 === 0).count()
    assert(rows.map(_.getAs[Long]("probe_key")).distinct.length == probes,
      "no probe goes unresolved")
  }

  test("winsorize: ~10% clamped, bounds broadcast, one fact shuffle") {
    val df = q("q_winsorize")
    val plan = executed(df)
    assert(plan.contains("BroadcastHashJoin"), s"bounds must broadcast:\n$plan")
    assert(hashExchanges(plan) == 1,
      s"rank window is the only fact shuffle; the clamp join adds none:\n$plan")
    val n = df.count().toDouble
    val clamped = df.filter(col("was_clamped") === 1).count().toDouble
    assert(clamped / n > 0.06 && clamped / n < 0.14,
      s"p05/p95 clamping should touch ~10% of rows, got ${clamped / n}")
  }

  test("triangle support: equi-join plan, nodes from the sampled subgraph") {
    val df = q("q_triangle_support")
    val plan = executed(df)
    assert(!plan.contains("CartesianProduct"),
      s"triangle enumeration must stay equi-joins:\n$plan")
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_id") % 13 == 0, "nodes come from the mod-13 sample")
      assert(r.getAs[Long]("n_triangles") >= 1)
    }
  }

  test("approx percentile: sketch rank check rides broadcasts only") {
    val df = q("q_approx_pctl")
    val plan = executed(df)
    assert(plan.contains("BroadcastHashJoin") && !plan.contains("SortMergeJoin"),
      s"sketch + rank-check tables broadcast; the fact is never join-shuffled:\n$plan")
    assert(df.filter(col("within_bound") =!= 1).count() == 0,
      "percentile_approx's deterministic rank guarantee must hold")
  }

  test("funnel steps are monotone non-increasing") {
    val counts = q("q_funnel_steps").collect()
      .map(r => r.getAs[String]("step") -> r.getAs[Long]("users")).sortBy(_._1).map(_._2)
    assert(counts.length == 3)
    assert(counts(0) >= counts(1) && counts(1) >= counts(2),
      s"ordered deadlines can only lose users: ${counts.toSeq}")
  }

  test("cohort retention: offsets non-negative, week 0 covers the cohort") {
    val df = q("q_cohort_retention")
    assert(df.filter(col("wk") < 0).count() == 0,
      "no activity precedes a user's first-touch week")
    // every user is active in their own first-touch week, so the
    // wk=0 cell of each cohort equals the cohort's size
    val ev = graft.pipeline.Tables.t(spark, SparkTesting.sf, "events")
    val cohortSizes = ev.groupBy("user_id")
      .agg(date_format(date_trunc("week", min(col("ts"))), "yyyy-MM-dd").as("cohort_week"))
      .groupBy("cohort_week").agg(count(lit(1)).as("size"))
    val bad = df.filter(col("wk") === 0)
      .join(cohortSizes, "cohort_week")
      .filter(col("active_users") =!= col("size")).count()
    assert(bad == 0)
  }

  test("attribution: zero joins, one user_id shuffle (as-of shape)") {
    val df = q("q_attribution_last_touch")
    val plan = executed(df)
    assert(!plan.contains("Join"), s"as-of attribution must not join:\n$plan")
    assert(hashExchanges(plan) == 1, s"one user_id exchange:\n$plan")
    // a credited click can never postdate its purchase
    val ev = graft.pipeline.Tables.t(spark, SparkTesting.sf, "events")
      .select(col("event_id").as("click_id"), col("ts").as("click_ts"))
    val p = graft.pipeline.Tables.t(spark, SparkTesting.sf, "events")
      .select(col("event_id"), col("ts").as("purchase_ts"))
    val bad = df.filter(col("click_id").isNotNull)
      .join(ev, "click_id").join(p, "event_id")
      .filter(col("click_ts") > col("purchase_ts")).count()
    assert(bad == 0)
  }

  test("wow growth: first week NULL, later weeks computed") {
    val df = q("q_wow_growth").collect()
    val byType = df.groupBy(_.getAs[String]("event_type"))
    byType.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[String]("week"))
      assert(sorted.head.isNullAt(sorted.head.fieldIndex("wow_permille")),
        "no previous week for the first row")
      assert(sorted.tail.forall(!_.isNullAt(sorted.head.fieldIndex("wow_permille"))),
        "every later week has a growth figure")
    }
  }

  test("basket pairs: within-order equi-join, ordered pairs, bounded k") {
    val df = q("q_basket_pairs")
    val plan = executed(df)
    assert(!plan.contains("CartesianProduct"),
      s"pair generation must stay a within-order equi-join:\n$plan")
    val rows = df.collect()
    assert(rows.length <= 20)
    assert(rows.forall(r => r.getAs[Long]("part_a") < r.getAs[Long]("part_b")))
    val supports = rows.map(_.getAs[Long]("n_orders"))
    assert(supports.zip(supports.tail).forall { case (a, b) => a >= b },
      "ranked by support descending")
  }

  test("rolling anomaly: warm-up days score NULL, baseline excludes self") {
    val df = q("q_rolling_anomaly")
    // first 4 days per type have <4 baseline days → NULL moments, flag 0
    val warm = df.filter(col("znum_cents").isNull)
    assert(warm.filter(col("anomaly") =!= 0).count() == 0)
    val perType = warm.groupBy("event_type").count().collect()
    perType.foreach(r => assert(r.getLong(1) == 4,
      s"exactly the 4 warm-up days are unscored: $r"))
    // one window pass: daily agg shuffle + frame window share the
    // event_type-rooted exchanges; no join anywhere
    val plan = executed(df)
    assert(!plan.contains("Join"), s"self-baseline needs no join:\n$plan")
  }

  test("dq audit: anti joins prune to key columns, scalar checks share scans") {
    val df = q("q_dq_audit")
    val plan = executed(df)
    assert(plan.contains("LeftAnti"), s"FK orphan checks are anti joins:\n$plan")
    // every fact scan in the audit reads at most 2 columns — the FK
    // checks must not drag full rows through the anti-join shuffle
    val wideScans = plan.linesIterator
      .filter(_.contains("ReadSchema: struct<"))
      .filter(l => l.substring(l.indexOf("ReadSchema")).count(_ == ',') > 1)
      .toList
    assert(wideScans.isEmpty, s"audit scans must stay key-pruned:\n$wideScans")
    val rows = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.size == 6)
    assert(rows("a_lineitem_fk_orders") == 0 && rows("b_orders_fk_customer") == 0,
      "the synthetic lake is referentially intact")
    assert(rows("d_lineitem_dup_key") > 0,
      "the known duplicate business keys must be reported, not assumed away")
  }

  test("tf-idf ranks are integer-deterministic and bounded at 3") {
    val df = q("q_tfidf_topk")
    val perDoc = df.groupBy("doc_id").agg(count(lit(1)).as("k"),
      max(col("rnk")).as("maxr")).collect()
    perDoc.foreach { r =>
      assert(r.getAs[Long]("k") <= 3)
      assert(r.getAs[Int]("maxr") <= 3)
    }
  }
}
