package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTesting

/** Invariant checks for the round-10 operator batch: k-fold CV
  * assignment, Zipf goodness-of-fit, per-user Simpson diversity and
  * Cramér's V. Value-level correctness is the DuckDB oracle's job;
  * these pin the algebraic invariants each statistic must satisfy on
  * ANY input, plus the determinism/purity properties the designs
  * claim.
  */
class Round10OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTesting.spark
  private def q(name: String) =
    graft.SparkEntry.queries(name)(spark, SparkTesting.sf)
  private def tbl(name: String) =
    graft.pipeline.Tables.t(spark, SparkTesting.sf, name)

  test("kfold: 5 exhaustive folds, conserved masses, shares sum to ~1000") {
    import spark.implicits._
    val rows = q("q_kfold_assign")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.map(_._1).sorted.sameElements(Array(0L, 1L, 2L, 3L, 4L)),
      "every fold 0..4 must be present")
    assert(rows.map(_._2).sum == tbl("documents").count(),
      "every document lands in exactly one fold")
    val charTotal = tbl("documents")
      .agg(sum(col("n_chars").cast("long"))).as[Long].head()
    assert(rows.map(_._4).sum == charTotal, "char mass conserved")
    // permille floors: sum in (1000-5, 1000]
    val ds = rows.map(_._5).sum
    val cs = rows.map(_._6).sum
    assert(ds > 995 && ds <= 1000, s"doc shares sum $ds")
    assert(cs > 995 && cs <= 1000, s"char shares sum $cs")
    // purity: the fold of one doc recomputes from md5 alone
    val id = tbl("documents").select("doc_id").as[Long].head()
    val md5hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"fold1|$id".getBytes("UTF-8"))
      .take(1).map("%02x".format(_)).mkString
    val expect = Integer.parseInt(md5hex, 16) % 5
    val got = tbl("documents").filter(col("doc_id") === id)
      .select((conv(substring(md5(concat(lit("fold1|"), col("doc_id"))), 1, 2),
        16, 10).cast("int") % 5).cast("long")).as[Long].head()
    assert(got == expect, s"doc $id fold: md5 recompute $expect != engine $got")
  }

  test("zipf gof: ranks total-ordered, invariant exact, top ratio = 1000") {
    import spark.implicits._
    val rows = q("q_zipf_gof")
      .as[(Long, String, Long, Long, Long)].collect()
    // the synthetic corpus vocabulary can be SMALLER than the top-K
    // cut (31 tokens at sf0.001) — the cut is min(32, |vocab|)
    val vocab = tbl("documents")
      .select(explode(graft.text.TextAnalysis.tokens(col("text"))).as("tok"))
      .select("tok").distinct().count()
    assert(rows.length == math.min(32L, vocab), s"top cut: ${rows.length}")
    assert(rows.map(_._1).toSeq == (1L to rows.length).toSeq, "dense ranks")
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._3 > b._3 || (a._3 == b._3 && a._2 < b._2),
        s"rank order must follow (freq DESC, tok): $a then $b")
    }
    rows.foreach { case (r, _, f, fxr, ratio) =>
      assert(fxr == f * r, "freq*rank must be exact")
      assert(ratio == 1000L * f * r / rows.head._3, "permille vs f(1)")
    }
    assert(rows.head._5 == 1000, "rank 1 ratio is exactly 1000 by definition")
  }

  test("simpson diversity: bounds, single-type zero, event mass conserved") {
    import spark.implicits._
    val rows = q("q_user_simpson_diversity")
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (u, n, k, sp) =>
      assert(n >= k && k >= 1, s"user $u: $k types over $n events")
      assert(sp >= 0 && sp < 1000, s"user $u: permille $sp out of range")
      if (k == 1) assert(sp == 0, s"user $u: one type must score 0")
      // Simpson is bounded by the uniform mix over k types
      assert(sp <= 1000 * (k - 1) / k, s"user $u: $sp beats uniform bound")
    }
    assert(rows.map(_._2).sum == tbl("events").count(), "event mass conserved")
    // independent recomputation for one user
    val u0 = rows.head._1
    val cs = tbl("events").filter(col("user_id") === u0)
      .groupBy("event_type").agg(count(lit(1)).as("c"))
      .select("c").as[Long].collect()
    val n0 = cs.sum
    val expect = 1000L * (n0 * n0 - cs.map(c => c * c).sum) / (n0 * n0)
    assert(rows.head._4 == expect, s"user $u0 simpson")
  }

  test("lsh band tuning: 32-hash budget, S-curve orderings hold") {
    import spark.implicits._
    val rows = q("q_lsh_band_tuning")
      .as[(Long, Long, Long, Long, Option[Long], Option[Long])].collect()
    assert(rows.length == 3)
    rows.foreach { case (b, r, np, nd, davg, navg) =>
      assert(b * r == 32, s"config ($b,$r) breaks the 32-hash budget")
      assert(nd <= np)
      (davg.toSeq ++ navg.toSeq).foreach(v =>
        assert(v >= 0 && v <= 1000, s"catch permille $v out of range"))
    }
    // more rows per band = stricter bands = fewer accidental catches:
    // the non-dup catch rate must be non-increasing in r
    val byR = rows.sortBy(_._2).flatMap(_._6)
    byR.sliding(2).foreach { case Array(a, b) =>
      assert(a >= b, s"non-dup catch must fall as r grows: $byR")
    }
    // within a config, true dups must catch at least as often as
    // non-dups (the whole point of the S-curve)
    rows.foreach { case (b, r, _, _, Some(d0), Some(n0)) =>
      assert(d0 >= n0, s"config ($b,$r): dup catch $d0 < non-dup $n0")
    case _ => ()
    }
  }

  test("seasonal strength: bounds, and variance numerators recompute from " +
      "the decompose cell table") {
    import spark.implicits._
    val rows = q("q_seasonal_strength")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (et, n, vd, vr, st) =>
      assert(n >= 1, et)
      assert(vd >= 0 && vr >= 0, s"$et: variance numerators must be >= 0")
      assert(st >= 0 && st <= 1000, s"$et: strength $st")
      if (vd > 0 && vr < vd) assert(st == 1000 * (vd - vr) / vd, s"$et ratio")
    }
    // recompute one type's numerators from q_seasonal_decompose cells
    val et = rows.head._1
    val cells = q("q_seasonal_decompose")
      .filter(col("event_type") === et && col("trend_milli").isNotNull)
      .select(col("resid_milli"), (col("seasonal_milli") + col("resid_milli")).as("det"))
      .as[(Long, Long)].collect()
    val n = cells.length.toLong
    def varNum(xs: Array[Long]) = n * xs.map(x => x * x).sum - {
      val s0 = xs.sum; s0 * s0 }
    assert(rows.head._2 == n)
    assert(rows.head._3 == varNum(cells.map(_._2)), s"$et var_det")
    assert(rows.head._4 == varNum(cells.map(_._1)), s"$et var_resid")
  }

  test("erasure plan: request mass conserved, flags and permille consistent") {
    import spark.implicits._
    val rows = q("q_erasure_plan")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val erased = tbl("events").filter(col("user_id") % 97 === 0).count()
    assert(rows.map(_._3).sum == erased, "every requester row planned once")
    assert(rows.map(_._2).sum == tbl("events").count())
    rows.foreach { case (day, nr, ne, nu, flag, pm) =>
      assert(ne <= nr && nu <= ne, day)
      assert(flag == (if (ne > 0) 1 else 0), day)
      assert(pm == 1000 * ne / nr, day)
    }
  }

  test("cms: the one-sided error contract holds for every key") {
    import spark.implicits._
    val rows = q("q_cms_estimate").as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (u, n, est, over) =>
      assert(est >= n, s"user $u: CMS must never underestimate ($est < $n)")
      assert(over == est - n, u)
    }
    assert(rows.map(_._2).sum == tbl("events").count(), "truth mass conserved")
  }

  test("wl refinement: the label REFINES degree (same hash -> same degree)") {
    import spark.implicits._
    val rows = q("q_wl_refine").as[(Long, Long, String)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._3).foreach { case (h, grp) =>
      assert(grp.map(_._2).distinct.length == 1,
        s"hash $h spans degrees ${grp.map(_._2).distinct.toSeq}")
    }
    assert(rows.map(_._3).distinct.length >= rows.map(_._2).distinct.length,
      "WL classes must be at least as fine as the degree partition")
  }

  test("encoding advisor: verdicts are self-consistent with the evidence") {
    import spark.implicits._
    val rows = q("q_encoding_advisor")
      .as[(String, Long, Long, Long, Long, Long, String)].collect()
    assert(rows.map(_._1).toSeq ==
      Seq("a_l_returnflag", "b_l_quantity", "c_l_partkey"))
    rows.foreach { case (cn, n, ndv, ndvPm, runs, runsPm, enc) =>
      assert(ndv <= n && runs <= n && runs >= 1, cn)
      assert(ndvPm == 1000 * ndv / n && runsPm == 1000 * runs / n, cn)
      val expect = if (10 * ndv <= n) "dictionary"
      else if (2 * runs <= n) "rle" else "plain"
      assert(enc == expect, s"$cn: $enc vs evidence $expect")
    }
    // the 3-value flag column must be dictionary on any realistic lake
    assert(rows.head._7 == "dictionary", "l_returnflag has 3 values")
  }

  test("zonemap audit: the sorted layout prunes at least as much") {
    import spark.implicits._
    val rows = q("q_zonemap_prune_audit")
      .as[(String, Long, Long, Long)].collect()
    assert(rows.map(_._1).toSeq == Seq("a_natural", "b_shipdate_sorted"))
    rows.foreach { case (l, nf, np, pm) =>
      assert(np <= nf, l)
      assert(pm == 1000 * np / nf, l)
    }
    assert(rows(1)._4 >= rows(0)._4,
      "sorting by ship date must not prune LESS than the natural layout")
    assert(rows(1)._4 >= 900,
      "a one-week probe against weekly files must skip nearly everything")
  }

  test("dbscan grid: labels recompute from the cell table + P75 threshold") {
    import spark.implicits._
    val rows = q("q_dbscan_grid").as[(Long, Long, Long, String)].collect()
    assert(rows.nonEmpty)
    assert(rows.map(_._4).toSet.subsetOf(Set("core", "border", "noise")))
    // recompute: minpts = discrete P75 of cell counts
    val ns = rows.map(_._3).sorted
    val minpts = ns(math.ceil(0.75 * ns.length).toInt - 1)
    val core = rows.filter(_._3 >= minpts).map(r => (r._1, r._2)).toSet
    rows.foreach { case (cx, cy, n, label) =>
      val isCore = n >= minpts
      val nearCore = core.exists { case (kx, ky) =>
        math.abs(kx - cx) <= 1 && math.abs(ky - cy) <= 1 }
      val expect = if (isCore) "core" else if (nearCore) "border" else "noise"
      assert(label == expect, s"cell ($cx,$cy) n=$n: $label != $expect")
    }
    assert(core.nonEmpty, "P75 threshold guarantees a non-empty core set")
  }

  test("butterfly census: identity against a brute-force recount") {
    import spark.implicits._
    val Array((np, npm, bf, mx)) = q("q_butterfly_count")
      .as[(Long, Long, Long, Long)].collect()
    assert(npm <= np && bf >= npm && mx >= 1)
    // brute-force from the distinct edge list
    val edges = tbl("lineitem").select(col("l_suppkey"), col("l_partkey"))
      .distinct().as[(Long, Long)].collect()
    val byPart = edges.groupBy(_._2).values.map(_.map(_._1).sorted)
    val common = scala.collection.mutable.Map.empty[(Long, Long), Long]
    byPart.foreach { ss =>
      for (i <- ss.indices; j <- i + 1 until ss.length)
        common((ss(i), ss(j))) = common.getOrElse((ss(i), ss(j)), 0L) + 1
    }
    assert(np == common.size, "pair count")
    assert(bf == common.values.map(c => c * (c - 1) / 2).sum, "butterflies")
    assert(mx == common.values.max, "max common")
  }

  test("join cardinality: estimate formula exact, PK-side estimate = |fact|") {
    import spark.implicits._
    val rows = q("q_join_card_estimate")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.map(_._1).toSeq == Seq("a_lineitem_orders", "b_orders_customer"))
    rows.foreach { case (jn, nl, nr, v, est, act, err) =>
      assert(est == nl * nr / v, jn)
      assert(err == 1000 * math.abs(est - act) / act, jn)
      // the join's right side is its PK side: ndv_max = n_right, so the
      // textbook estimate collapses to the fact row count
      assert(v == nr && est == nl, s"$jn: PK-side estimate must equal |fact|")
    }
  }

  test("raking ipf: the weighted column margins hit the population targets") {
    import spark.implicits._
    val rows = q("q_raking_ipf").as[(String, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (et, dow, n, w1, w2) =>
      assert(n >= 1 && w1 >= 1 && w2 >= 1, s"$et/$dow")
    }
    // after the column step, Σ n·w2 per dow must equal the population
    // column margin ×1000 up to integer-floor slack (one floor per
    // cell on w2, bounded by the number of cells in the column)
    val iso = expr("cast((dayofweek(ts) + 5) % 7 + 1 as bigint)")
    val popCol = tbl("events").select(iso.as("dow"))
      .groupBy("dow").agg(count(lit(1)).as("ct"))
      .as[(Long, Long)].collect().toMap
    rows.groupBy(_._2).foreach { case (dow, cells) =>
      val mass = cells.map(c => c._3 * c._5).sum
      val target = 1000L * popCol(dow)
      val slack = cells.map(_._3).sum // Σn · (≤1 floor loss per unit weight)
      assert(mass <= target && mass >= target - slack,
        s"dow $dow: weighted mass $mass vs target $target (slack $slack)")
    }
  }

  test("median polish: medians are table values, decomposition reconstructs") {
    import spark.implicits._
    val rows = q("q_median_polish")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (et, dow, v, rm, cm, res) =>
      assert(v == rm + cm + res, s"$et/$dow: polish must reconstruct v")
    }
    // each row median is one of that row's values (percentile_disc)
    rows.groupBy(_._1).foreach { case (et, grp) =>
      assert(grp.map(_._3).contains(grp.head._4), s"$et row median not a value")
    }
    // half-bound: at least half of each row's detrended values are >= 0
    rows.groupBy(_._1).foreach { case (et, grp) =>
      val nonneg = grp.count(r => r._3 - r._4 >= 0)
      assert(2 * nonneg >= grp.length, s"$et median property")
    }
  }

  test("weight ess: Kish bounds hold and uniform weights recompute exactly") {
    import spark.implicits._
    val rows = q("q_weight_ess").as[(String, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (src, n, sw, ess, pm) =>
      assert(ess >= 1 && ess <= n, s"$src: ESS must sit in [1, n]")
      assert(pm >= 0 && pm <= 1000, s"$src: permille $pm")
      assert(sw >= n, s"$src: char mass at least one per doc")
    }
    // recompute one source with exact BigInt arithmetic (floor of the
    // true rational) — the double chain must not drift off the exact
    // value by more than one ulp-floor, and on this data must equal it
    val src = rows.head._1
    val ws = tbl("documents").filter(col("source") === src)
      .select(col("n_chars").cast("long")).as[Long].collect()
    val swB = BigInt(ws.sum); val swwB = ws.map(w => BigInt(w) * w).sum
    val exact = (swB * swB / swwB).toLong
    assert(math.abs(rows.head._4 - exact) <= 1, s"$src ESS $exact")
  }

  test("rbp ranking: dyadic weights bounded, consistent with hit counts") {
    import spark.implicits._
    val rows = q("q_rbp_ranking_eval").as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (qid, nr, hits, scaled, pm) =>
      assert(nr >= 1 && nr <= 10 && hits <= nr, s"qid $qid")
      assert(pm == 1000 * scaled / 1023, s"qid $qid permille")
      // given `hits` hits at SOME ranks 1..nr, the dyadic mass is
      // bracketed by the hits sitting at the worst vs best ranks
      val weights = (1 to nr.toInt).map(r => 1L << (10 - r))
      val lo = weights.takeRight(hits.toInt).sum
      val hi = weights.take(hits.toInt).sum
      assert(scaled >= lo && scaled <= hi, s"qid $qid: $scaled not in [$lo,$hi]")
    }
  }

  test("markov backtest: the trained argmax recomputes from the first half") {
    import spark.implicits._
    val rows = q("q_markov_backtest")
      .as[(String, String, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (p, _, n, c, acc) =>
      assert(c <= n, p); assert(acc == 1000 * c / n, p)
    }
    // recompute the cut + one prev-type's argmax successor from raw events
    val days = tbl("events")
      .select(expr("div(unix_micros(date_trunc('day', ts)), 86400000000)").as("d"))
      .distinct().as[Long].collect().sorted
    val cut = days(math.ceil(0.5 * days.length).toInt - 1)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val tr = tbl("events")
      .withColumn("prev", lag("event_type", 1).over(w))
      .withColumn("d", expr("div(unix_micros(date_trunc('day', ts)), 86400000000)"))
      .filter(col("prev").isNotNull && col("d") <= cut)
      .groupBy("prev", "event_type").count()
      .as[(String, String, Long)].collect()
    val p0 = rows.head._1
    val best = tr.filter(_._1 == p0).minBy(t => (-t._3, t._2))._2
    assert(rows.head._2 == best, s"$p0 argmax successor")
  }

  test("tokenizer fertility: masses recompute, alpha-run corpus is exact") {
    import spark.implicits._
    val rows = q("q_tokenizer_fertility")
      .as[(String, Long, Long, Long, Option[Long])].collect()
    assert(rows.nonEmpty)
    assert(rows.map(_._2).sum == tbl("documents").count())
    val masses = tbl("documents").groupBy("lang")
      .agg(sum(graft.text.TextAnalysis.tokenCount(col("text"))).as("ws"),
        sum(graft.text.TextAnalysis.regexTokenCount(col("text"))).as("rx"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    rows.foreach { case (lang, _, ws, rx, pm) =>
      assert(masses(lang) == ((ws, rx)), lang)
      assert(pm.contains(1000 * rx / ws), lang)
    }
  }

  test("partition grain advisor: censuses conserve mass, skew >= 1000") {
    import spark.implicits._
    val rows = q("q_partition_grain_advisor")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.map(_._1).toSeq == Seq("a_day", "b_week", "c_month"))
    val total = tbl("events").count()
    rows.foreach { case (g, np, avg, mx, mn, skew, gap) =>
      assert(avg == total / np, g)
      assert(mn <= avg && avg <= mx, g)
      assert(skew >= 1000, s"$g: max/avg permille $skew must be >= 1000")
      assert(gap == math.abs(avg - 20000), g)
    }
    // coarser grains have fewer partitions and larger maxima
    assert(rows(0)._2 >= rows(1)._2 && rows(1)._2 >= rows(2)._2)
    assert(rows(0)._4 <= rows(1)._4 && rows(1)._4 <= rows(2)._4)
  }

  test("gains curve: cumulative columns reconstruct, lift ends at 1000") {
    import spark.implicits._
    val rows = q("q_gains_curve")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty && rows.length <= 10)
    assert(rows.map(_._1).toSeq == rows.map(_._1).sorted.reverse.toSeq)
    // cum columns are the running sums in decile-desc order
    var (cn, cp) = (0L, 0L)
    rows.foreach { case (dec, n, np, cumN, cumP, lift) =>
      cn += n; cp += np
      assert(cumN == cn && cumP == cp, s"decile $dec running sums")
      assert(np <= n, s"decile $dec")
    }
    val last = rows.last
    assert(last._6 == 1000L * last._5 * cn / (last._4 * cp),
      "lift formula at the full-population row")
    assert(last._4 == cn && last._5 == cp)
    assert(last._6 >= 999 && last._6 <= 1000,
      "full-population lift is 1 by definition (floor may shave 1)")
  }

  test("jackknife source: LOO identity holds against BigInt recomputation") {
    import spark.implicits._
    val rows = q("q_jackknife_source")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val docs = tbl("documents").select(col("source"), col("n_chars").cast("long"))
      .as[(String, Long)].collect()
    val tn = docs.length.toLong
    val tc = docs.map(_._2).sum
    rows.foreach { case (src, n, full, loo, delta) =>
      val (sn, sc) = (docs.count(_._1 == src).toLong,
        docs.filter(_._1 == src).map(_._2).sum)
      assert(n == sn, src)
      assert(full == 1000 * tc / tn, src)
      assert(loo == 1000 * (tc - sc) / (tn - sn), src)
      assert(delta == loo - full, src)
    }
  }

  test("mcc: quadrants tile the corpus, value recomputes and is bounded") {
    import spark.implicits._
    val rows = q("q_mcc_lang_id")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val total = tbl("documents").count()
    rows.foreach { case (lang, tp, fp, fn, tn, mcc) =>
      assert(tp + fp + fn + tn == total, s"$lang quadrants must tile the corpus")
      assert(mcc >= -1000 && mcc <= 1000, s"$lang mcc $mcc")
      if (Seq(tp + fp, tp + fn, tn + fp, tn + fn).forall(_ > 0)) {
        val expect = math.floor(1000.0 * (tp * tn - fp * fn) /
          math.sqrt((1.0 * (tp + fp) * (tp + fn)) *
            (1.0 * (tn + fp) * (tn + fn)))).toLong
        assert(mcc == expect, s"$lang recompute")
      } else assert(mcc == 0, s"$lang degenerate quadrant")
    }
  }

  private def executedPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("round-10 plan shapes: broadcasts where dim-sized, no stray shuffles") {
    // CMS: the 256-counter array must BROADCAST into the key probe —
    // a shuffled counter join would defeat the sketch's whole point
    val cms = executedPlan(q("q_cms_estimate"))
    assert(cms.contains("BroadcastHashJoin"), s"CMS counters must broadcast:\n$cms")
    // kfold: the assignment is a pure projection — the only exchange
    // is the 5-row census rollup + its total broadcast
    val kf = executedPlan(q("q_kfold_assign"))
    assert(!kf.contains("SortMergeJoin"), s"kfold must stay broadcast-only:\n$kf")
    // DBSCAN: density logic must ride broadcast equi-joins (an
    // |Δcx|<=1 band join would plan BroadcastNestedLoop/cartesian)
    val db = executedPlan(q("q_dbscan_grid"))
    assert(db.contains("BroadcastHashJoin") && !db.contains("CartesianProduct"),
      s"dbscan neighbor test must be a broadcast equi-join:\n$db")
    // the only nested-loop joins allowed are the 1-row minpts-scalar
    // crossJoins (the repo-wide broadcast-scalar pattern) — the
    // core/border NEIGHBOR joins themselves must both be hash joins
    assert("BroadcastHashJoin \\[cx".r.findAllIn(db).length >= 2,
      s"both label joins must be equi-hash on (cx, cy):\n$db")
    // raking: both margin joins are dim-sized broadcasts; the fact
    // shuffles only for its two aggregates
    val rk = executedPlan(q("q_raking_ipf"))
    assert(!rk.contains("SortMergeJoin"), s"raking margins must broadcast:\n$rk")
  }

  test("odds/risk ratio: quadrants tile, ratios recompute, OR bounds RR") {
    import spark.implicits._
    val Array((a, b, c, dd, or, rr)) = q("q_odds_risk_ratio")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(a + b + c + dd == tbl("events").count())
    assert(or == 1000 * a * dd / (b * c))
    assert(rr == 1000 * a * (c + dd) / (c * (a + b)))
    // for a positive outcome, OR is always at least as far from 1 as RR
    assert((or - 1000) * (rr - 1000) >= 0, "OR and RR agree in direction")
    assert(math.abs(or - 1000) + 1 >= math.abs(rr - 1000),
      s"OR ($or) must be at least as extreme as RR ($rr) up to floor slack")
  }

  test("rate ci: band is symmetric, recomputes, and contains the rate") {
    import spark.implicits._
    val rows = q("q_rate_ci").as[(String, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (et, n, t, rate, lo, hi) =>
      assert(rate == 1000 * n / t, et)
      val hw = math.floor(1960.0 * math.sqrt(1.0 * n) / (1.0 * t)).toLong
      assert(lo == rate - hw && hi == rate + hw, s"$et band")
      assert(lo <= rate && rate <= hi, et)
      assert(t >= 1 && n >= 1, et)
    }
  }

  test("capture-recapture: estimator bounds and identities hold") {
    import spark.implicits._
    val Array((n1, n2, m, obs, lp, ch, cov)) = q("q_capture_recapture")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(m >= 1 && m <= math.min(n1, n2))
    assert(obs == n1 + n2 - m, "inclusion-exclusion over the two halves")
    assert(lp == n1 * n2 / m && ch == (n1 + 1) * (n2 + 1) / (m + 1) - 1)
    assert(lp >= obs - 1, "the estimate can never fall below the observed base")
    assert(ch <= lp, "Chapman corrects the LP estimate downward")
    assert(cov == 1000 * obs * m / (n1 * n2))
    assert(cov >= 1 && cov <= 1000)
  }

  test("good-turing: the lowest-r prefix recomputes from token counts") {
    import spark.implicits._
    val rows = q("q_good_turing").as[(Long, Long, Option[Long])].collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val freqs = tbl("documents")
      .select(explode(graft.text.TextAnalysis.tokens(col("text"))).as("tok"))
      .groupBy("tok").count().select("count").as[Long].collect()
    val nr = freqs.groupBy(identity).map { case (r, xs) => r -> xs.length.toLong }
    // the emitted rows are exactly the lowest min(10, |distinct r|)
    // frequencies — the scale-adaptive cut
    val expectR = nr.keys.toSeq.sorted.take(10)
    assert(rows.map(_._1).toSeq == expectR, "lowest-r prefix")
    rows.foreach { case (r, n, rstar) =>
      assert(nr(r) == n, s"N_$r")
      nr.get(r + 1) match {
        case Some(n1) => assert(rstar.contains(1000 * (r + 1) * n1 / n), s"r*=$r")
        case None => assert(rstar.isEmpty, s"r=$r has no successor")
      }
    }
  }

  test("dup evidence: every flagged pair gets evidence, ranked by rarity") {
    import spark.implicits._
    val rows = q("q_dup_evidence").as[(Long, Long, Long, String, Long)].collect()
    val flagged = q("q_dedup_ngram_jaccard").filter(col("near_dup") === 1)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // at sf0.001 the 1-in-13 sample may flag NO pairs — evidence must
    // then be empty too (exact parity with the flagging query either way)
    assert(rows.map(r => (r._1, r._2)).toSet == flagged,
      "evidence pairs are exactly the flagged ngram-jaccard pairs")
    rows.groupBy(r => (r._1, r._2)).foreach { case (p, grp) =>
      val sorted = grp.sortBy(_._3)
      assert(sorted.map(_._3).toSeq == (1L to grp.length).toSeq, s"$p ranks")
      assert(grp.length <= 3, p)
      // rarity order: df non-decreasing with rank
      sorted.sliding(2).foreach {
        case Array(x, y) => assert(x._5 < y._5 || (x._5 == y._5 && x._4 < y._4), p)
        case _ => ()
      }
      // each evidence shingle really occurs in BOTH docs
      grp.foreach(r => assert(r._5 >= 2, s"$p: shared shingle must have df >= 2"))
    }
  }

  test("minhash error curve: nested prefixes, error shrinks with k on average") {
    import spark.implicits._
    val rows = q("q_minhash_error_curve").as[(Long, Long, Long, Long)].collect()
    assert(rows.map(_._1).toSeq == Seq(2L, 4L, 8L))
    val n = rows.head._2
    rows.foreach { case (k, np, mean, mx) =>
      assert(np == n, "every k evaluates the SAME pair set")
      assert(mean <= mx && mx <= 1000 && mean >= 0, s"k=$k")
    }
    // more hashes should not be worse on average (quantization means
    // strict monotonicity isn't guaranteed row-to-row, but the 8-hash
    // estimate must beat the 2-hash one)
    assert(rows(2)._3 <= rows(0)._3,
      s"k=8 mean error ${rows(2)._3} must be <= k=2 mean ${rows(0)._3}")
  }

  test("recall curve: truth masses are k-exact, @5 row matches recall_eval") {
    import spark.implicits._
    val rows = q("q_recall_curve").as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.map(_._1).toSeq == Seq(1L, 3L, 5L, 10L))
    val nq = rows.head._2
    rows.foreach { case (k, n, hits, nt, pm) =>
      assert(n == nq, "same probe set at every k")
      assert(nt == k * nq, s"k=$k: truth depth is exact (corpus >> k)")
      assert(hits <= nt, s"k=$k")
      assert(pm == 1000 * hits / nt, s"k=$k permille")
    }
    // the @5 row must reconcile with q_embed_recall_eval's per-query gate
    val eval5 = q("q_embed_recall_eval").select("hits", "n_truth")
      .as[(Long, Long)].collect()
    val r5 = rows.find(_._1 == 5L).get
    assert(r5._3 == eval5.map(_._1).sum && r5._4 == eval5.map(_._2).sum,
      "recall@5 aggregates the single-gate query exactly")
  }

  test("design effect: components reconcile with anova, DEFF recomputes") {
    import spark.implicits._
    val Array((n, k, ssb, ssw, n0m, iccU, deffM)) = q("q_design_effect")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(n == tbl("documents").count())
    assert(k >= 2 && ssb >= 0 && ssw >= 0)
    assert(iccU >= -1000000 && iccU <= 1000000, s"ICC $iccU out of [-1,1]")
    // recompute the full IEEE chain from the integer components
    val docs = tbl("documents").groupBy("source").count()
      .select("count").as[Long].collect()
    val ssqn = docs.map(x => x * x).sum
    val msb = 1.0 * ssb / (k - 1); val msw = 1.0 * ssw / (n - k)
    val n0 = (1.0 * n - (1.0 * ssqn) / n) / (k - 1)
    val icc = (msb - msw) / (msb + (n0 - 1.0) * msw)
    assert(n0m == math.floor(1000.0 * n0).toLong)
    assert(iccU == math.floor(1000000.0 * icc).toLong)
    assert(deffM == math.floor(1000.0 *
      (1.0 + ((1.0 * n) / k - 1.0) * icc)).toLong)
    assert(deffM >= 0, "DEFF is a variance multiplier")
  }

  test("allan variance: block masses conserve and one cell recomputes") {
    import spark.implicits._
    val rows = q("q_allan_variance").as[(Long, String, Long, Long, Long)].collect()
    assert(rows.map(_._1).distinct.sorted.toSeq == Seq(1L, 2L, 4L))
    rows.foreach { case (tau, et, m, ssd, av) =>
      assert(m >= 1, s"$et tau=$tau")
      assert(av == 1000 * ssd / (2 * m), s"$et tau=$tau formula")
    }
    // recompute tau=2 for one type from the daily series
    val et = rows.head._2
    val daily = tbl("events").filter(col("event_type") === et)
      .groupBy(expr("div(unix_micros(date_trunc('day', ts)), 86400000000)").as("d"))
      .agg(count(lit(1)).as("y")).as[(Long, Long)].collect()
    val blocks = daily.groupBy(_._1 / 2).map { case (b, xs) => b -> xs.map(_._2).sum }
      .toSeq.sortBy(_._1).map(_._2)
    val ssd = blocks.sliding(2).collect { case Seq(a, b2) => (b2 - a) * (b2 - a) }.sum
    val got = rows.find(r => r._1 == 2 && r._2 == et).get
    assert(got._4 == ssd, s"$et tau=2 sum of squared diffs")
    assert(got._3 == blocks.length - 1)
  }

  test("shingle sweep: n=3 row reconciles with the ngram-jaccard query") {
    import spark.implicits._
    val rows = q("q_shingle_size_sweep")
      .as[(Long, Long, Long, Option[Long])].collect()
    assert(rows.map(_._1).toSeq == Seq(2L, 3L, 5L))
    rows.foreach { case (n, np, nf, mj) =>
      assert(nf <= np, s"n=$n")
      assert(mj.isEmpty == (np == 0), s"n=$n: mean is NULL iff no pairs")
      mj.foreach(v => assert(v >= 0 && v <= 1000, s"n=$n mean jac $v"))
    }
    // candidate sets shrink (weakly) as shingles grow on this corpus
    assert(rows(0)._2 >= rows(1)._2 && rows(1)._2 >= rows(2)._2,
      "longer shingles cannot create new candidate pairs")
    val base = q("q_dedup_ngram_jaccard")
    val r3 = rows.find(_._1 == 3L).get
    assert(r3._2 == base.count(), "n=3 candidate pairs")
    assert(r3._3 == base.filter(col("near_dup") === 1).count(), "n=3 flagged")
  }

  test("jaccard threshold sweep: monotone in the threshold, 0.4 reconciles") {
    import spark.implicits._
    val rows = q("q_jaccard_threshold_sweep").as[(Long, Long, Long)].collect()
    assert(rows.map(_._1).toSeq == Seq(200L, 400L, 600L, 800L))
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._2 >= b._2 && a._3 >= b._3,
        "a stricter threshold can only flag fewer pairs/docs")
    case _ => ()
    }
    rows.foreach { case (_, nf, nd) => assert(nd <= nf || nf == 0) }
    val flagged04 = q("q_dedup_token_jaccard").filter(col("near_dup") === 1)
    assert(rows.find(_._1 == 400L).get._2 == flagged04.count(),
      "the 0.4 row is exactly q_dedup_token_jaccard's flag count")
  }

  test("length-richness corr: components recompute with BigInt, bounded") {
    import spark.implicits._
    val rows = q("q_quality_length_corr")
      .as[(String, Long, Long, Long, Long, Option[Long])].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (src, n, cov, vx, vy, cm) =>
      assert(vx >= 0 && vy >= 0, src)
      cm.foreach(v => assert(v >= -1000 && v <= 1000, s"$src corr $v"))
      // BigInt recomputation of the integer components
      val xs = tbl("documents").filter(col("source") === src)
        .select(col("n_chars").cast("long"),
          size(array_distinct(graft.text.TextAnalysis.tokens(col("text"))))
            .cast("long")).as[(Long, Long)].collect()
      assert(n == xs.length)
      def bi(f: ((Long, Long)) => BigInt) = xs.map(f).sum
      val (bn, bsx, bsy) = (BigInt(n), bi(t => BigInt(t._1)), bi(t => BigInt(t._2)))
      assert(BigInt(cov) == bn * bi(t => BigInt(t._1) * t._2) - bsx * bsy, src)
      assert(BigInt(vx) == bn * bi(t => BigInt(t._1) * t._1) - bsx * bsx, src)
      assert(BigInt(vy) == bn * bi(t => BigInt(t._2) * t._2) - bsy * bsy, src)
      if (vx > 0 && vy > 0)
        assert(cm.contains(math.floor(
          1000.0 * cov / math.sqrt((1.0 * vx) * (1.0 * vy))).toLong), src)
    }
  }

  test("cramers v: one row, bounded effect, chain recomputes from chi2") {
    import spark.implicits._
    val rows = q("q_cramers_v").as[(Long, Long, Long, Long)].collect()
    assert(rows.length == 1)
    val (chi2m, n, dof, vm) = rows.head
    assert(n == tbl("events").count())
    assert(dof >= 1)
    assert(vm >= 0 && vm <= 1000, s"V=$vm out of [0,1]")
    val expect =
      math.floor(1000.0 * math.sqrt((chi2m / 1000.0) / (1.0 * n * dof))).toLong
    assert(vm == expect, "v_milli must be the exact floored IEEE chain")
    // chi2_milli must equal the sum of q_chi2_independence's cells
    val cells = q("q_chi2_independence").select("contrib_milli").as[Long].collect()
    assert(chi2m == cells.sum, "chi2 is the integer sum of the cell table")
  }
}
