package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTesting

/** Invariant checks for the round-17 third operator batch:
  * t-closeness, soft-dedup weights, per-source JSD, mutual
  * information, shard checksum manifest. Value-level correctness is
  * the DuckDB oracle's job; these pin algebraic invariants plus one
  * independent JVM recompute or cross-operator contract per query.
  */
class Round17cOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTesting.spark
  private def q(name: String) =
    graft.SparkEntry.queries(name)(spark, SparkTesting.sf)
  private def tbl(name: String) =
    graft.pipeline.Tables.t(spark, SparkTesting.sf, name)

  test("t-closeness: class parity with l-diversity, bounds, homogeneity identity") {
    import spark.implicits._
    val tc = q("q_t_closeness").as[(String, Long, Long, Long, Long)].collect()
    assert(tc.nonEmpty)
    val n = tbl("documents").count()
    assert(tc.map(_._3).sum == n, "class populations partition the corpus")
    tc.foreach { case (src, b, clsN, tv, risky) =>
      assert(clsN >= 1, s"($src,$b): empty class emitted")
      assert(tv >= 0 && tv <= 1000, s"($src,$b): tv $tv outside [0,1000]")
      assert(risky == (if (tv > 200) 1L else 0L), s"($src,$b): risky flag")
    }
    // same QI as q_l_diversity ⇒ identical class set and populations
    val ld = q("q_l_diversity").as[(String, Long, Long, Long, Long, Long)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(tc.map(r => (r._1, r._2) -> r._3).toMap == ld,
      "t-closeness and l-diversity disagree on the QI class census")
    // homogeneity identity: a 1-language class (l-diversity n_sens=1
    // over the same QI) has TV exactly 1000 - permille(global lang) —
    // verified via a direct recompute of that class's language
    val globalLang = tbl("documents").groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    val homo = q("q_l_diversity").as[(String, Long, Long, Long, Long, Long)]
      .collect().filter(_._4 == 1L)
    homo.foreach { case (src, b, _, _, _, _) =>
      val lang = tbl("documents")
        .filter(col("source") === src && expr("div(n_chars, 100)") === b)
        .select("lang").distinct().as[String].collect()
      assert(lang.length == 1)
      val expect = 1000L - 1000L * globalLang(lang.head) / n
      val got = tc.find(r => r._1 == src && r._2 == b).get._4
      // denominator clearing floors once; the identity is exact when
      // 1000*g_v/N is integral, within 1 otherwise
      assert(math.abs(got - expect) <= 1,
        s"($src,$b): homogeneous-class TV $got vs 1000-permille $expect")
    }
  }

  test("soft dedup weights: mass identities, bounds, cluster-level recompute") {
    import spark.implicits._
    val rows = q("q_soft_dedup_weights")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.map(_._2).sum == tbl("documents").count())
    rows.foreach { case (src, nd, kept, eff, saved) =>
      assert(kept >= 0 && kept <= 1000L * nd, s"$src: kept mass $kept")
      assert(eff == kept / nd && saved == 1000 - eff, s"$src: derived columns")
    }
    // corpus-level identity: total kept mass = Σ_clusters csz·(1000 div csz),
    // recomputed from the documents table via an independent plan
    val expectTotal = tbl("documents")
      .groupBy(md5(col("text")).as("fp")).agg(count(lit(1)).as("c"))
      .select(sum(expr("c * div(1000, c)")).cast("long")).as[Long].head()
    assert(rows.map(_._3).sum == expectTotal,
      "per-source kept mass does not reconcile with the cluster census")
    // cross-operator: cluster count agrees with q_dedup_exact's rows
    val nClusters = q("q_dedup_exact").count()
    val uniformBound = rows.map(_._3).sum
    assert(uniformBound <= 1000L * nClusters,
      "kept mass exceeds 1000 per distinct content")
    assert(uniformBound > 1000L * nClusters - nClusters * 1000,
      "kept mass fell below the quantization floor")
  }

  test("jsd sources: bounds, nats/bits consistency, token totals, one recompute") {
    import spark.implicits._
    val rows = q("q_jsd_sources")
      .as[(String, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    val ln2 = math.log(2.0)
    rows.foreach { case (src, nTok, nats, bits) =>
      assert(nTok >= 1, s"$src: token count")
      assert(nats >= 0 && nats <= 1000 * ln2 + 1e-6,
        s"$src: JSD $nats outside [0, 1000·ln2]")
      assert(bits >= 0 && bits <= 1000 + 1e-6, s"$src: bits view $bits")
      // both columns round the SAME underlying double: recover it to
      // rounding slack
      assert(math.abs(bits * ln2 - nats) <= 2e-3 * (1 + ln2),
        s"$src: nats $nats vs bits $bits disagree beyond round-3 slack")
    }
    val totalTokens = tbl("documents")
      .select(explode(graft.text.TextAnalysis.tokens(col("text"))))
      .count()
    assert(rows.map(_._2).sum == totalTokens, "per-source token masses")
    // independent JVM recompute for one source
    val src0 = rows.map(_._1).min
    val byTok = tbl("documents")
      .select(col("source"), explode(graft.text.TextAnalysis.tokens(col("text"))).as("tok"))
      .groupBy("source", "tok").count().as[(String, String, Long)].collect()
    val global = byTok.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val nAll = global.values.sum.toDouble
    val mine = byTok.filter(_._1 == src0).map(r => r._2 -> r._3).toMap
    val nS = mine.values.sum.toDouble
    val jsd = global.map { case (tok, g) =>
      val p = mine.getOrElse(tok, 0L) / nS
      val qq = g / nAll
      val m = (p + qq) / 2
      ((if (p > 0) p * math.log(p / m) else 0.0) + qq * math.log(qq / m)) / 2
    }.sum
    val got = rows.find(_._1 == src0).get._3
    assert(math.abs(got - 1000 * jsd) <= 2e-3,
      s"$src0: engine JSD $got vs JVM recompute ${1000 * jsd}")
  }

  test("mutual information: bounds, entropy recompute, NMI consistency") {
    import spark.implicits._
    val (nCells, nDocs, mi, hLang, hSource, nmi) =
      q("q_mutual_information")
        .as[(Long, Long, Double, Double, Double, Double)].head()
    assert(nDocs == tbl("documents").count())
    val cells = tbl("documents").groupBy("lang", "source").count()
      .as[(String, String, Long)].collect()
    assert(nCells == cells.length)
    assert(mi >= -1e-3, s"MI $mi negative beyond rounding slack")
    assert(mi <= math.min(hLang, hSource) + 1e-3, "MI exceeds min entropy")
    assert(nmi >= -1e-3 && nmi <= 1000 + 1e-3, s"NMI $nmi outside [0,1000]")
    // JVM recompute of all four numbers from the exact cell counts
    val n = cells.map(_._3).sum.toDouble
    val px = cells.groupBy(_._1).view.mapValues(_.map(_._3).sum / n).toMap
    val py = cells.groupBy(_._2).view.mapValues(_.map(_._3).sum / n).toMap
    val miR = cells.map { case (l, s0, c) =>
      val p = c / n; p * math.log(p / (px(l) * py(s0)))
    }.sum
    val hxR = -px.values.map(p => p * math.log(p)).sum
    val hyR = -py.values.map(p => p * math.log(p)).sum
    assert(math.abs(mi - 1000 * miR) <= 2e-3, s"MI $mi vs recompute ${1000 * miR}")
    assert(math.abs(hLang - 1000 * hxR) <= 2e-3, "H(lang) recompute")
    assert(math.abs(hSource - 1000 * hyR) <= 2e-3, "H(source) recompute")
    assert(math.abs(nmi - 1000 * miR / math.min(hxR, hyR)) <= 2e-3,
      "NMI recompute")
  }

  test("shard checksum: census identities, JVM md5 recompute, order invariance") {
    import spark.implicits._
    val rows = q("q_shard_checksum")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(rows.map(_._2).sum == tbl("documents").count())
    assert(rows.map(_._5).sum ==
      tbl("documents").agg(sum("n_chars")).as[Long].head())
    rows.foreach { case (src, nd, lo, hi, _, cs) =>
      assert(lo <= hi && hi - lo + 1 >= nd, s"$src: id span vs count")
      assert(cs >= 0 && cs < nd * (1L << 32), s"$src: checksum magnitude")
    }
    // independent JVM recompute for one shard
    val src0 = rows.map(_._1).min
    def h(id: Long, text: String): Long = {
      val dig = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id|$text".getBytes("UTF-8"))
      dig.take(4).foldLeft(0L)((a, b) => (a << 8) | (b & 0xffL))
    }
    val expect = tbl("documents").filter(col("source") === src0)
      .select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, tx) => h(id, tx) }.sum
    assert(rows.find(_._1 == src0).get._6 == expect,
      s"$src0: engine checksum != JVM md5 recompute")
    // order independence: a shuffled copy of the lake produces the
    // identical manifest (the property the operator exists to provide)
    val shuffled = tbl("documents").repartition(7, col("lang"))
      .sortWithinPartitions(col("text"))
    val again = shuffled.groupBy("source")
      .agg(sum(conv(substring(md5(concat(col("doc_id").cast("string"),
          lit("|"), col("text"))), 1, 8), 16, 10).cast("long")).as("cs"))
      .as[(String, Long)].collect().toMap
    rows.foreach { case (src, _, _, _, _, cs) =>
      assert(again(src) == cs, s"$src: checksum moved under reshuffle")
    }
  }
}
