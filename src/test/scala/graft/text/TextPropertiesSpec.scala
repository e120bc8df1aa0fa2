package graft.text

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTesting

/** Property tests for the round-5 algorithmic cores: connected
  * components vs a driver-side union-find reference, the salted join
  * vs the plain join, and the shingle transform's structural
  * invariants — randomized inputs, exact reference semantics. */
class TextPropertiesSpec extends AnyFunSuite {
  lazy val spark = SparkTesting.spark
  import spark.implicits._

  private val params = SCTest.Parameters.default.withMinSuccessfulTests(8)
  private def check(p: Prop): Unit = {
    val r = SCTest.check(params, p)
    assert(r.passed, r.status.toString)
  }

  test("ngram_novelty invariants: first doc fully novel, n_new sums to vocab") {
    val nov = graft.SparkEntry.queries("q_ngram_novelty")(spark, SparkTesting.sf)
      .select("doc_id", "n_shingles", "n_new", "novelty_permille")
      .as[(Long, Long, Long, Long)].collect()
    assert(nov.nonEmpty)
    // the smallest doc_id with shingles can only contain first-seen
    // shingles — novelty is exactly 1000‰
    val first = nov.minBy(_._1)
    assert(first._3 == first._2 && first._4 == 1000L, s"first doc: $first")
    // every distinct shingle is first-seen in exactly one doc
    val totalNew = nov.map(_._3).sum
    val vocab = NearDup.shingles3(
      graft.pipeline.Tables.t(spark, SparkTesting.sf, "documents"),
      "doc_id", "text").select("sh").distinct().count()
    assert(totalNew == vocab, s"sum(n_new)=$totalNew != |shingle vocab|=$vocab")
    nov.foreach { case (id, n, nn, p) =>
      assert(nn >= 0 && nn <= n && p == Math.floorDiv(1000 * nn, n), s"doc $id")
    }
  }

  test("edit-distance dedup invariants: banded cap, length bound, identity pairs") {
    val rows = graft.SparkEntry.queries("q_dedup_edit_distance")(spark, SparkTesting.sf)
      .select("doc_a", "doc_b", "len_a", "len_b", "edit_dist_capped", "near_exact")
      .as[(Long, Long, Long, Long, Long, Int)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, la, lb, d, ne) =>
      assert(a < b)
      assert(math.abs(la - lb) <= 20, "blocking admits only |Δlen| ≤ K")
      assert(d >= 0 && d <= 21)
      // edit distance lower bound: d ≥ |Δlen| whenever the true
      // distance was computed (capped rows only promise > 20)
      if (d <= 20) assert(d >= math.abs(la - lb))
      assert((ne == 1) == (d <= 20), "flag must mirror the cap")
    }
  }

  /** Reference union-find: smallest member labels its component. */
  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    (0 until n).map(i => i.toLong -> find(i).toLong).toMap
  }

  test("connectedComponents == union-find on random graphs") {
    val gen = for {
      n <- Gen.chooseNum(1, 12)
      m <- Gen.chooseNum(0, 14)
      edges <- Gen.listOfN(m, for {
        a <- Gen.chooseNum(0, n - 1); b <- Gen.chooseNum(0, n - 1)
        if a != b
      } yield (math.min(a, b).toLong, math.max(a, b).toLong))
    } yield (n, edges)
    check(Prop.forAll(gen) { case (n, edges) =>
      val nodes = (0 until n).map(_.toLong).toDF("doc_id")
      val pairs = edges.toDF("doc_a", "doc_b")
      val got = NearDup.connectedComponents(nodes, "doc_id", pairs)
        .as[(Long, Long)].collect().toMap
      got == unionFind(n, edges)
    })
  }

  test("saltedJoin == plain equi-join under random skew and salt") {
    val gen = for {
      salt <- Gen.chooseNum(1, 6)
      // heavily skewed fact: most rows share key 0
      fact <- Gen.listOfN(20, Gen.frequency(
        4 -> Gen.const(0L), 1 -> Gen.chooseNum(1L, 4L)))
    } yield (salt, fact)
    check(Prop.forAll(gen) { case (salt, factKeys) =>
      val fact = factKeys.zipWithIndex
        .map { case (k, i) => (i.toLong, k) }.toDF("row_id", "k")
      val dim = (0L to 4L).map(k => (k, s"dim$k")).toDF("k", "name")
      val salted = graft.ops.Ops.saltedJoin(fact, dim, "k", salt, col("row_id"))
        .select("row_id", "k", "name").as[(Long, Long, String)]
        .collect().sorted.toSeq
      val plain = fact.join(dim, Seq("k")).select("row_id", "k", "name")
        .as[(Long, Long, String)].collect().sorted.toSeq
      salted == plain
    })
  }

  test("shinglesN invariants: width, count bound, containment") {
    val wordGen = Gen.oneOf("a", "bb", "ccc", "d", "ee")
    val gen = for {
      n <- Gen.chooseNum(2, 4)
      words <- Gen.listOfN(10, wordGen)
      len <- Gen.chooseNum(0, 10)
    } yield (n, words.take(len))
    check(Prop.forAll(gen) { case (n, words) =>
      val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
      val sh = NearDup.shinglesN(docs, "doc_id", "text", n)
        .select("sh").as[String].collect().toSeq
      val expected = words.sliding(n).filter(_.size == n)
        .map(_.mkString(" ")).toSeq.distinct
      sh.sorted == expected.sorted
    })
  }
}
