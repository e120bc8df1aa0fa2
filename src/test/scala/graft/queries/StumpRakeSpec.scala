package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTesting

/** Invariant + plan-shape checks for the decision-stump split
  * search, RAKE keyphrases, bipartite k-core peel, and ACF lag
  * profile. The DuckDB oracle owns value equality; these lock the
  * semantics the oracle can't see — count conservation across
  * splits, monotone peeling, moment-sum consistency, RAKE score
  * reconstruction — and the scale-critical plan bounds.
  */
class StumpRakeSpec extends AnyFunSuite {
  lazy val spark = SparkTesting.spark
  private def q(name: String) =
    graft.SparkEntry.queries(name)(spark, SparkTesting.sf)
  private def tbl(name: String) =
    graft.pipeline.Tables.t(spark, SparkTesting.sf, name)

  test("decision_stump: split counts conserve totals, exactly one argmax, score bounded") {
    import spark.implicits._
    val rows = q("q_decision_stump")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val total = tbl("lineitem").count()
    val totalPos = tbl("lineitem").filter(col("l_returnflag") === "R").count()
    rows.foreach { case (th, pl, nl, pr, nr, score, _) =>
      assert(nl + nr == total, s"threshold $th splits all rows")
      assert(pl + pr == totalPos, s"threshold $th splits all positives")
      assert(pl <= nl && pr <= nr)
      assert(score >= 500000 && score <= 1000000,
        s"two-class Gini purity lives in [0.5,1]: $score")
    }
    assert(rows.count(_._7 == 1L) == 1, "exactly one is_best row")
    val best = rows.filter(_._7 == 1L).head
    assert(best._6 == rows.map(_._6).max, "is_best is the score argmax")
  }

  test("rake_keyphrases: phrases are stopword-free, score = sum of word scores") {
    import spark.implicits._
    val rows = q("q_rake_keyphrases").as[(String, Long, Long)].collect()
    assert(rows.nonEmpty && rows.length <= 25)
    rows.foreach { case (phrase, score, nOcc) =>
      val words = phrase.split(" ")
      assert(words.nonEmpty && words.forall(w => w != "the" && w != "a"),
        s"stopword leaked into '$phrase'")
      assert(score >= 1000 * words.length,
        s"each word scores >= 1000 milli (deg >= freq): '$phrase' $score")
      assert(nOcc >= 1)
    }
    assert(rows.map(r => (r._1, r._2)).distinct.length == rows.length)
    // scores are sorted descending with phrase tiebreak
    assert(rows.sliding(2).forall {
      case Array((p1, s1, _), (p2, s2, _)) => s1 > s2 || (s1 == s2 && p1 < p2)
      case _ => true
    })
  }

  test("kcore_peel: both sides survive, degrees bounded, subgraph strictly shrank") {
    import spark.implicits._
    val rows = q("q_kcore_peel").as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    val e = tbl("orders").select("o_orderkey", "o_custkey")
      .join(tbl("lineitem").select("l_orderkey", "l_partkey"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("c"), col("l_partkey").as("ss")).distinct()
    val nPart = e.select("ss").distinct().count()
    val nCust = e.select("c").distinct().count()
    rows.foreach { case (side, deg, n) =>
      assert(n > 0)
      if (side == "customer") assert(deg >= 1 && deg <= nPart)
      else assert(deg >= 1 && deg <= nCust)
    }
    assert(rows.map(_._1).distinct.sorted.toSeq == Seq("customer", "part"),
      "both sides survive the p25-threshold double peel")
    // the peel is a strict refinement: surviving edge count (summed
    // over either side) is below the input edge count
    val survivingEdges = rows.filter(_._1 == "customer")
      .map(r => r._2 * r._3).sum
    assert(survivingEdges > 0 && survivingEdges < e.count())
  }

  test("acf_lags: lag-0 identity sums hold, acf_milli in [-1000,1000], 7 lags per type") {
    import spark.implicits._
    val rows = q("q_acf_lags")
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (et, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (1L to 7L).toSeq, s"$et lags")
    }
    rows.foreach { case (et, lg, n, sx, sy, sxy, sxx, syy, acf) =>
      assert(n >= 2, s"$et lag $lg")
      assert(acf >= -1000 && acf <= 1000, s"$et lag $lg acf=$acf")
      // Cauchy-Schwarz on the centered sums
      val vx = n * sxx - sx * sx; val vy = n * syy - sy * sy
      val cov = n * sxy - sx * sy
      assert(vx >= 0 && vy >= 0)
      assert(cov.toDouble * cov <= vx.toDouble * vy * (1 + 1e-12))
    }
    // recompute one (type, lag) cell from scratch
    val daily = tbl("events").filter(col("event_type") === rows.head._1)
      .groupBy(expr("div(unix_micros(date_trunc('day', ts)), 86400000000)").as("d"))
      .agg(count(lit(1)).as("c")).as[(Long, Long)].collect().toMap
    val lag1 = daily.toSeq.flatMap { case (d, x) => daily.get(d + 1).map(y => (x, y)) }
    val want = rows.find(r => r._1 == rows.head._1 && r._2 == 1L).get
    assert(want._3 == lag1.size && want._4 == lag1.map(_._1).sum &&
      want._6 == lag1.map(p => p._1 * p._2).sum)
  }
}
