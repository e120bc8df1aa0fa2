package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTesting

/** Invariants for the deterministic bootstrap CI and the depth-2
  * tree: CI ordering/reproducibility, tree refinement laws.
  */
class BootstrapTreeSpec extends AnyFunSuite {
  lazy val spark = SparkTesting.spark
  private def q(name: String) =
    graft.SparkEntry.queries(name)(spark, SparkTesting.sf)

  test("bootstrap_ci_median: ordered CI containing plausible medians, reproducible") {
    import spark.implicits._
    val Array((n, b, lo, med, hi)) =
      q("q_bootstrap_ci_median").as[(Long, Long, Long, Long, Long)].collect()
    assert(b == 20 && n > 0)
    assert(lo <= med && med <= hi, "CI ordered")
    assert(lo > 0, "daily counts are positive")
    // determinism: a second evaluation returns the identical row
    val Array(second) =
      q("q_bootstrap_ci_median").as[(Long, Long, Long, Long, Long)].collect()
    assert(second == ((n, b, lo, med, hi)), "hash resampler is deterministic")
  }

  test("tree_depth2: children partition the root, refine purity, thresholds bracket") {
    import spark.implicits._
    val rows = q("q_tree_depth2").as[(String, Long, Long, Long, Long)].collect()
    val byNode = rows.map(r => r._1 -> r).toMap
    assert(byNode.contains("root"))
    val root = byNode("root")
    if (byNode.contains("left") && byNode.contains("right")) {
      val (l, r) = (byNode("left"), byNode("right"))
      assert(l._3 + r._3 == root._3, "children partition the rows")
      assert(l._4 + r._4 == root._4, "children partition the positives")
      assert(l._2 <= root._2 && r._2 > root._2,
        "left threshold within the left branch, right beyond the root")
      // each child's best split is at least as pure as the branch
      // would imply — scores live in the same [5e5, 1e6] band
      Seq(l, r).foreach(c => assert(c._5 >= 500000 && c._5 <= 1000000))
    }
    assert(root._5 >= 500000 && root._5 <= 1000000)
  }
}
