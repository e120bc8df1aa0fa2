package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTesting

/** Invariant + plan-shape checks for the relational warehouse shapes
  * (RelQueries: TPC-H Q2/Q4/Q11/Q15/Q17/Q18/Q19/Q20/Q22 adaptations +
  * the bucketed co-located join) and the interval/histogram/
  * attribution/segment-dedup additions. Value-level correctness is
  * the DuckDB oracle's job; these lock what the oracle can't see —
  * decorrelation plan shapes (semi/anti joins, broadcast scalars,
  * zero-shuffle bucketed inputs) and semantic invariants (rank-1
  * uniqueness, threshold predicates, interval-union bounds).
  */
class RelQueriesSpec extends AnyFunSuite {
  lazy val spark = SparkTesting.spark
  private def q(name: String) =
    graft.SparkEntry.queries(name)(spark, SparkTesting.sf)
  private def planOf(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("exists_late_ship: semi-join (no fan-out), counts bounded by orders") {
    import spark.implicits._
    val df = q("q_exists_late_ship")
    val plan = planOf(df)
    assert(plan.contains("LeftSemi"), s"expected a LEFT SEMI decorrelation:\n$plan")
    val total = graft.pipeline.Tables.t(spark, SparkTesting.sf, "orders").count()
    val late = df.as[(String, Long)].collect()
    assert(late.nonEmpty && late.map(_._2).sum <= total)
  }

  test("min_offer_supplier: rank-1 per part, offer is that part's true minimum") {
    import spark.implicits._
    val rows = q("q_min_offer_supplier").as[(Long, String, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.map(_._1).distinct.length == rows.length, "one winner per part")
    // recompute the per-part minimum offer independently
    val truth = graft.pipeline.Tables.t(spark, SparkTesting.sf, "lineitem")
      .join(graft.pipeline.Tables.t(spark, SparkTesting.sf, "part")
        .filter(col("p_size") >= 45).select("p_partkey"),
        col("l_partkey") === col("p_partkey"))
      .groupBy("l_partkey")
      .agg(min(floor(col("l_extendedprice") * lit(100.0) + lit(0.5)).cast("long"))
        .as("mn"))
      .as[(Long, Long)].collect().toMap
    rows.foreach { case (pk, _, offer) => assert(truth(pk) == offer, s"part $pk") }
    assert(rows.length == truth.size, "every qualifying part is present")
  }

  test("part_revenue_share: every survivor really exceeds 700 ppm; scalar is a broadcast") {
    import spark.implicits._
    val df = q("q_part_revenue_share")
    val rows = df.as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty && rows.forall(_._3 >= 700))
    val plan = planOf(df)
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"the grand-total scalar must broadcast, not shuffle:\n$plan")
  }

  test("top_supplier_window: all emitted rows tie at the global max") {
    import spark.implicits._
    val rows = q("q_top_supplier_window").as[(Long, String, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.map(_._3).distinct.length == 1, "ties only")
  }

  test("small_qty_revenue: the cross-multiplied predicate matches the avg definition") {
    import spark.implicits._
    val rows = q("q_small_qty_revenue").as[(String, Long, Long)].collect()
    assert(rows.nonEmpty && rows.forall(r => r._2 > 0 && r._3 > 0))
    // independent recount of qualifying rows
    val li = graft.pipeline.Tables.t(spark, SparkTesting.sf, "lineitem")
    val pa = li.groupBy(col("l_partkey").as("k"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity").cast("long")).as("sq"))
    val nSmall = li.join(pa, col("l_partkey") === col("k"))
      .filter(lit(5L) * col("n") * col("l_quantity").cast("long") < col("sq"))
      .count()
    assert(rows.map(_._2).sum == nSmall)
  }

  test("big_orders: every row exceeds the 250-qty gate, sorted descending") {
    import spark.implicits._
    val rows = q("q_big_orders").as[(String, Long, String, Long)].collect()
    assert(rows.nonEmpty && rows.forall(_._4 > 250))
    assert(rows.map(_._4).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
  }

  test("nested_semi_suppliers + lapsed_rich: thresholds hold, anti join plans as anti") {
    import spark.implicits._
    val ns = q("q_nested_semi_suppliers").as[(Long, String, String, Long)].collect()
    assert(ns.nonEmpty && ns.forall(_._4 > 400))
    val df = q("q_lapsed_rich_customers")
    val plan = planOf(df)
    assert(plan.contains("LeftAnti"), s"NOT EXISTS must decorrelate to LEFT ANTI:\n$plan")
    val rows = df.as[(String, Long, Long)].collect()
    assert(rows.nonEmpty && rows.forall(r => r._2 > 0 && r._3 > 0))
  }

  test("join_bucketed: ONE exchange total — the aggregate's; join inputs never shuffle") {
    val df = q("q_join_bucketed")
    val plan = planOf(df)
    assert(SparkTesting.finalSection(plan).contains("SortMergeJoin"),
      s"merge hint must hold on bucketed inputs:\n$plan")
    assert(SparkTesting.hashExchanges(plan) <= 1,
      s"bucketed join inputs must not re-shuffle:\n$plan")
    // layout is invisible to results: totals match the plain join
    import spark.implicits._
    val n = df.as[(String, Long, Long)].collect().map(_._2).sum
    assert(n == graft.pipeline.Tables.t(spark, SparkTesting.sf, "lineitem").count())
  }

  test("interval_coverage: covered time within [max_island, n*300s] per user") {
    import spark.implicits._
    val rows = q("q_interval_coverage").as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val nev = graft.pipeline.Tables.t(spark, SparkTesting.sf, "events")
      .groupBy("user_id").count().as[(Long, Long)].collect().toMap
    rows.foreach { case (u, nIsl, covered, maxIsl) =>
      assert(nIsl >= 1 && nIsl <= nev(u))
      assert(maxIsl >= 300 && covered >= maxIsl, s"user $u")
      assert(covered <= nev(u) * 300, s"user $u: union can't exceed event mass")
    }
  }

  test("histogram_equidepth: buckets partition all customers, depths within 1 of each other") {
    import spark.implicits._
    val rows = q("q_histogram_equidepth").as[(Long, Long, Long, Long)].collect()
    assert(rows.map(_._1).sorted.sameElements(1L to 8L))
    val depths = rows.map(_._2)
    assert(depths.max - depths.min <= 1, s"equi-depth: ${depths.mkString(",")}")
    // band edges are monotone and non-overlapping
    val sorted = rows.sortBy(_._1)
    sorted.sliding(2).foreach {
      case Array(a, b) => assert(a._4 <= b._3, "bucket ranges must not overlap")
      case _ => ()
    }
  }

  test("attribution_linear: per-purchase credits never exceed 1000 milli") {
    import spark.implicits._
    val rows = q("q_attribution_linear").as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    // each purchase hands out n * (1000 div n) <= 1000 milli; total
    // credit is bounded by purchases * 1000
    val nPurch = graft.pipeline.Tables.t(spark, SparkTesting.sf, "events")
      .filter(col("event_type") === "purchase")
      .groupBy("user_id").count().as[(Long, Long)].collect().toMap
    rows.foreach { case (u, nCred, milli) =>
      assert(nCred > 0 && milli <= nPurch.getOrElse(u, 0L) * 1000, s"user $u")
    }
  }

  test("degree_distribution: every graph node lands in exactly one band") {
    import spark.implicits._
    val rows = q("q_degree_distribution").as[(String, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (side, band, _, mn, mx) =>
      assert(mn >= (1L << band.toInt) && mx < (1L << (band.toInt + 1)), s"$side/$band")
    }
    val li = graft.pipeline.Tables.t(spark, SparkTesting.sf, "lineitem")
    val nParts = li.select("l_partkey").distinct().count()
    val nSupps = li.select("l_suppkey").distinct().count()
    assert(rows.filter(_._1 == "part").map(_._3).sum == nParts)
    assert(rows.filter(_._1 == "supplier").map(_._3).sum == nSupps)
  }

  test("segment_dedup: kept mass never exceeds total; a planted dup drops both copies") {
    import spark.implicits._
    val rows = q("q_segment_dedup").as[(Long, Long, Long, Long)].collect()
    val nDocs = graft.pipeline.Tables.t(spark, SparkTesting.sf, "documents").count()
    assert(rows.length == nDocs, "every doc reports")
    rows.foreach { case (id, total, kept, pm) =>
      assert(total > 0 && kept >= 0 && kept <= total, s"doc $id")
      assert(pm == 1000L * kept / total, s"doc $id permille")
    }
    // cross-doc discipline: total token mass matches the tokenizer
    val tokMass = graft.pipeline.Tables.t(spark, SparkTesting.sf, "documents")
      .select(size(split(col("text"), " ")).cast("long").as("n"))
      .agg(sum("n")).as[Long].head()
    assert(rows.map(_._2).sum == tokMass)
  }

  test("ohlc_daily: low <= open/close <= high, volume partitions the events") {
    import spark.implicits._
    val rows = q("q_ohlc_daily")
      .as[(String, String, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (et, day, o, h, l, c, v) =>
      assert(l <= o && o <= h && l <= c && c <= h && v > 0, s"$et/$day")
    }
    val total = graft.pipeline.Tables.t(spark, SparkTesting.sf, "events").count()
    assert(rows.map(_._7).sum == total)
  }

  test("gap_fill_linear: actives are exact, interpolants bounded by their endpoints") {
    import spark.implicits._
    val rows = q("q_gap_fill_linear").as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty && rows.exists(_._4 == 1L), "gaps must exist to fill")
    // per user the grid is dense and every interpolated value lies
    // within that user's active-day value envelope (linearity)
    rows.groupBy(_._1).foreach { case (u, rs) =>
      val days = rs.map(_._2).sorted
      assert(days.last - days.head + 1 == days.length, s"user $u grid has holes")
      val active = rs.filter(_._4 == 0L).map(_._3)
      val (lo, hi) = (active.min, active.max)
      rs.filter(_._4 == 1L).foreach { r =>
        assert(r._3 >= lo && r._3 <= hi, s"user $u day ${r._2} out of envelope")
      }
    }
  }

  test("activity_bitmap: popcount consistent, first/last bits really set") {
    import spark.implicits._
    val rows = q("q_activity_bitmap").as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (u, bm, n, fb, lb) =>
      assert(java.lang.Long.bitCount(bm) == n, s"user $u popcount")
      assert((bm & (1L << fb.toInt)) != 0 && (bm & (1L << lb.toInt)) != 0, s"user $u")
      assert(fb <= lb && fb >= 0 && lb < 64, s"user $u bounds")
    }
  }

  test("date_dim: dense spine, dow cycles 1..7, weekend iff dow in {6,7}") {
    import spark.implicits._
    val rows = q("q_date_dim")
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].collect()
      .sortBy(_._2)
    assert(rows.nonEmpty)
    assert(rows.last._2 - rows.head._2 + 1 == rows.length, "spine must be dense")
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b._2 == a._2 + 1)
        assert(b._6 == (if (a._6 == 7) 1 else a._6 + 1), "dow must cycle")
      case _ => ()
    }
    rows.foreach { r =>
      assert((r._8 == 1) == (r._6 >= 6), s"day ${r._1}")
      assert(r._1 == java.time.LocalDate.ofEpochDay(r._2).toString, s"dnum render ${r._1}")
    }
  }

  test("merge_upsert: actions partition by key residue, deletes really gone") {
    import spark.implicits._
    val rows = q("q_merge_upsert").as[(Long, Long, String)].collect()
    val snap = graft.pipeline.Tables.t(spark, SparkTesting.sf, "orders")
      .select(col("o_orderkey"),
        floor(col("o_totalprice") * lit(100.0) + lit(0.5)).cast("long").as("cents"))
      .as[(Long, Long)].collect().toMap
    val byAction = rows.groupBy(_._3)
    // row accounting: |result| = |snap| − deletes + inserts
    val nDel = snap.keys.count(_ % 10 == 3)
    val nIns = snap.keys.count(_ % 10 == 4)
    assert(rows.length == snap.size - nDel + nIns)
    // residue 4's ORIGINAL row is untouched (the insert is its
    // shifted copy), so kept covers residues 4-9
    byAction("kept").foreach { case (k, c, _) =>
      assert(k % 10 >= 4 && snap(k) == c, s"kept $k")
    }
    byAction("updated").foreach { case (k, c, _) =>
      assert(k % 10 <= 2 && snap(k) + 500 == c, s"updated $k")
    }
    byAction("inserted").foreach { case (k, c, _) =>
      assert(k > 10000000L && (k - 10000000L) % 10 == 4 &&
        snap(k - 10000000L) + 500 == c, s"inserted $k")
    }
    assert(rows.forall(r => r._1 % 10 != 3), "deleted keys must not survive")
  }

  test("filtered_scan_revenue: all three predicates reach the parquet scan, no join") {
    val df = q("q_filtered_scan_revenue")
    val plan = planOf(df)
    assert(!plan.contains("Join"), s"Q6 shape must be join-free:\n$plan")
    val pushed = plan.linesIterator.filter(_.contains("PushedFilters")).mkString
    Seq("l_shipdate", "l_discount", "l_quantity").foreach { c =>
      assert(pushed.contains(c), s"$c must push down:\n$pushed")
    }
  }

  test("returned_top_customers: top-20 via TakeOrdered, monotone revenue") {
    import spark.implicits._
    val df = q("q_returned_top_customers")
    val plan = planOf(df)
    assert(SparkTesting.finalSection(plan).contains("TakeOrderedAndProject"),
      s"ordered limit must not global-sort:\n$plan")
    val rows = df.as[(Long, String, String, Long, Long)].collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    assert(rows.map(_._5).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
  }

  test("priority_class_lines + cust_order_histogram: totals partition their facts") {
    import spark.implicits._
    val li = graft.pipeline.Tables.t(spark, SparkTesting.sf, "lineitem").count()
    val pc = q("q_priority_class_lines").as[(String, Long, Long)].collect()
    assert(pc.map(r => r._2 + r._3).sum == li)
    val cust = graft.pipeline.Tables.t(spark, SparkTesting.sf, "customer").count()
    val ord = graft.pipeline.Tables.t(spark, SparkTesting.sf, "orders").count()
    val h = q("q_cust_order_histogram").as[(Long, Long)].collect()
    assert(h.map(_._2).sum == cust, "histogram must cover every customer")
    assert(h.map(r => r._1 * r._2).sum == ord, "order mass must reconcile")
  }

  test("sketch_intersection: inclusion-exclusion exact side reconciles, bound holds") {
    import spark.implicits._
    val Array((a, b, i, u, ok)) =
      q("q_sketch_intersection").as[(Long, Long, Long, Long, Int)].collect()
    assert(a + b - i == u, "exact inclusion-exclusion must reconcile")
    assert(i > 0 && i < u, "cohorts must genuinely partially overlap")
    assert(ok == 1, "HLL I-E estimate outside the 15% gate")
  }

  test("csv_quarantine: corrupt rows quarantined exactly, never silently dropped") {
    import spark.implicits._
    val Array((clean, quar, cents)) =
      q("q_csv_quarantine").as[(Long, Long, Long)].collect()
    val keys = graft.pipeline.Tables.t(spark, SparkTesting.sf, "orders")
      .select("o_orderkey").as[Long].collect()
    assert(quar == keys.count(_ % 50 == 0), "quarantine count")
    assert(clean + quar == keys.length, "no silent drops")
    assert(cents > 0)
  }

  test("hits_scores: milli normalization peaks at exactly 1000 per side") {
    import spark.implicits._
    val rows = q("q_hits_scores").as[(String, Long, Long)].collect()
    Seq("part", "supplier").foreach { side =>
      val scores = rows.filter(_._1 == side).map(_._3)
      assert(scores.nonEmpty && scores.max == 1000L, s"$side max")
      assert(scores.forall(x => x >= 0 && x <= 1000), s"$side bounds")
    }
  }

  test("seasonal_decompose: edges NULL-trended, decomposition reconciles exactly") {
    import spark.implicits._
    val rows = q("q_seasonal_decompose")
      .as[(String, Long, Long, Option[Long], Long, Option[Long])].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (et, rs) =>
      val sorted = rs.sortBy(_._2)
      // first/last 3 days can't have a full centered window
      assert(sorted.take(3).forall(_._4.isEmpty), s"$et leading edge")
      assert(sorted.takeRight(3).forall(_._4.isEmpty), s"$et trailing edge")
      sorted.foreach { r =>
        (r._4, r._6) match {
          case (Some(tr), Some(res)) =>
            // exact reconstruction: 1000·c = trend + seasonal + residual
            assert(1000L * r._3 == tr + r._5 + res, s"$et day ${r._2}")
          case (None, None) => ()
          case other => fail(s"$et day ${r._2}: trend/resid must be NULL together $other")
        }
      }
    }
  }

  test("velocity_cap + weighted_median: bounds and half-mass property hold") {
    import spark.implicits._
    val vc = q("q_velocity_cap").as[(Long, Long, Long)].collect()
    val perUser = graft.pipeline.Tables.t(spark, SparkTesting.sf, "events")
      .groupBy("user_id").count().as[(Long, Long)].collect().toMap
    vc.foreach { case (u, peak, flag) =>
      assert(peak >= 1 && peak <= perUser(u), s"user $u peak")
      assert(flag == (if (peak >= 3) 1L else 0L))
    }
    val wm = q("q_weighted_median").as[(String, Long, Long)].collect()
    val li = graft.pipeline.Tables.t(spark, SparkTesting.sf, "lineitem")
      .select(col("l_returnflag"),
        floor(col("l_extendedprice") * lit(100.0) + lit(0.5)).cast("long").as("cents"),
        col("l_quantity").cast("long").as("w"))
      .as[(String, Long, Long)].collect()
    wm.foreach { case (f, med, tw) =>
      val grp = li.filter(_._1 == f)
      assert(grp.map(_._3).sum == tw, s"$f total weight")
      // half-mass property: weight at-or-below the weighted median
      // reaches half; weight strictly below does not
      val below = grp.filter(_._2 < med).map(_._3).sum
      val atOrBelow = grp.filter(_._2 <= med).map(_._3).sum
      assert(2 * atOrBelow >= tw && 2 * below < tw, s"$f half-mass")
    }
  }

  test("survival_curve: monotone non-increasing, anchored at the full cohort") {
    import spark.implicits._
    val rows = q("q_survival_curve").as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.nonEmpty && rows.head._1 == 0L)
    val cohort = graft.pipeline.Tables.t(spark, SparkTesting.sf, "events")
      .select("user_id").distinct().count()
    assert(rows.head._2 == cohort, "k=0 must cover every user")
    rows.sliding(2).foreach {
      case Array(a, b) => assert(b._2 <= a._2, s"survival must not rise at k=${b._1}")
      case _ => ()
    }
    assert(rows.last._2 >= 1, "max-span user defines the last offset")
  }

  test("asof_nearest: every purchase matched, distance beats or ties the backward pick") {
    import spark.implicits._
    val rows = q("q_asof_nearest").as[(Long, Long, Long, Long)].collect()
    val nPurch = graft.pipeline.Tables.t(spark, SparkTesting.sf, "events")
      .filter(col("event_type") === "purchase").count()
    assert(rows.length == nPurch, "every purchase must emit one match")
    assert(rows.forall(_._4 >= 0), "distance must be non-negative")
    // nearest can never be FARTHER than the backward-only as-of pick
    val ev = graft.pipeline.Tables.t(spark, SparkTesting.sf, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("s"))
      .as[(Long, Long, String, Long)].collect()
    val clicksByUser = ev.filter(_._3 == "click").groupBy(_._2)
    val purch = ev.filter(_._3 == "purchase").map(e => (e._1, (e._2, e._4))).toMap
    rows.foreach { case (pid, u, _, dt) =>
      val (_, pts) = purch(pid)
      val backward = clicksByUser.get(u).toSeq.flatten
        .filter(_._4 <= pts).map(c => pts - c._4)
      if (backward.nonEmpty) assert(dt <= backward.min, s"purchase $pid")
    }
  }

  test("new_vs_returning: day-1 all new, per-day split sums to that day's actives") {
    import spark.implicits._
    val rows = q("q_new_vs_returning").as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.nonEmpty && rows.head._3 == 0L, "first day can only be new users")
    val cohort = graft.pipeline.Tables.t(spark, SparkTesting.sf, "events")
      .select("user_id").distinct().count()
    assert(rows.map(_._2).sum == cohort, "each user is new exactly once")
    val daily = graft.pipeline.Tables.t(spark, SparkTesting.sf, "events")
      .select(col("user_id"),
        expr("div(unix_micros(date_trunc('day', ts)), 86400000000)").as("d"))
      .distinct().groupBy("d").count().as[(Long, Long)].collect().toMap
    rows.foreach { case (d, nw, ret) => assert(nw + ret == daily(d), s"day $d") }
  }

  test("pivot_multi_agg + grouping_sets_mixed: crosstabs reconcile with their facts") {
    import spark.implicits._
    val pv = q("q_pivot_multi_agg").as[(Long, Long, Long, Long, Long)].collect()
    val byType = graft.pipeline.Tables.t(spark, SparkTesting.sf, "events")
      .groupBy("event_type").count().as[(String, Long)].collect().toMap
    assert(pv.map(_._2).sum == byType("click"))
    assert(pv.map(_._4).sum == byType("purchase"))
    val li = graft.pipeline.Tables.t(spark, SparkTesting.sf, "lineitem").count()
    val gs = q("q_grouping_sets_mixed").as[(String, String, Long, Long)].collect()
    // each declared grouping set partitions the fact independently
    Seq(0L, 1L, 2L).foreach { gid =>
      assert(gs.filter(_._3 == gid).map(_._4).sum == li, s"gid $gid")
    }
    assert(gs.map(_._3).distinct.sorted.sameElements(Seq(0L, 1L, 2L)),
      "exactly the three declared sets — no grand total, no extra marginal")
  }

  test("kwic: windows hold at most 3 tokens and the hit is really the term") {
    import spark.implicits._
    val rows = q("q_kwic").as[(Long, Long, String, String)].collect()
    assert(rows.nonEmpty)
    val toks = graft.pipeline.Tables.t(spark, SparkTesting.sf, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .as[(Long, Seq[String])].collect().toMap
    rows.foreach { case (doc, pos, l, r) =>
      assert(toks(doc)(pos.toInt - 1) == "spark", s"doc $doc pos $pos")
      assert(l.split(" ").count(_.nonEmpty) <= 3 && r.split(" ").count(_.nonEmpty) <= 3)
      if (pos > 3) assert(l == toks(doc).slice(pos.toInt - 4, pos.toInt - 1).mkString(" "))
    }
    val expected = toks.values.map(_.count(_ == "spark")).sum
    assert(rows.length == expected, "every occurrence emits exactly one row")
  }

  test("embed_dim_variance: every lane profiled, moments satisfy Cauchy-Schwarz") {
    import spark.implicits._
    val rows = q("q_embed_dim_variance").as[(Long, Long, Long, Long)].collect()
    val nVec = graft.pipeline.Tables.t(spark, SparkTesting.sf, "embeddings").count()
    assert(rows.map(_._1).sorted.sameElements(1L to 64L))
    rows.foreach { case (dim, n, s1, s2) =>
      assert(n == nVec, s"dim $dim count")
      // n·Σq² ≥ (Σq)² ⟺ variance ≥ 0 (use BigInt — (Σq)² can pass Long)
      assert(BigInt(n) * BigInt(s2) >= BigInt(s1) * BigInt(s1), s"dim $dim moments")
    }
  }

  test("alert_hysteresis: dead-band days HOLD the previous alert state") {
    import spark.implicits._
    val rows = q("q_alert_hysteresis").as[(String, Long, Long)].collect().sortBy(_._1)
    assert(rows.nonEmpty && rows.forall(r => r._3 == 0L || r._3 == 1L))
    var prev = 0L
    rows.foreach { case (day, pm, alert) =>
      val expected = if (pm > 210) 1L else if (pm < 190) 0L else prev
      assert(alert == expected, s"$day pm=$pm")
      prev = alert
    }
  }
}
