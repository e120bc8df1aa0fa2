package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTesting

/** Skip-gram co-occurrence and kNN reciprocity invariants. */
class SkipgramKnnSpec extends AnyFunSuite {
  lazy val spark = SparkTesting.spark
  private def q(name: String) =
    graft.SparkEntry.queries(name)(spark, SparkTesting.sf)

  test("skipgram_pairs: canonical pairs, one cell recomputed from a document") {
    import spark.implicits._
    val rows = q("q_skipgram_pairs").as[(String, String, Long)].collect()
    assert(rows.nonEmpty && rows.length <= 30)
    rows.foreach { case (u, v, n) => assert(u <= v && n >= 1) }
    // counts are sorted descending with (u,v) tiebreak
    assert(rows.sliding(2).forall {
      case Array((u1, v1, n1), (u2, v2, n2)) =>
        n1 > n2 || (n1 == n2 && (u1 < u2 || (u1 == u2 && v1 <= v2)))
      case _ => true
    })
    // recompute the top pair's contribution from one document
    val (u, v, _) = rows.head
    val docs = graft.pipeline.Tables.t(spark, SparkTesting.sf, "documents")
      .select(col("doc_id"), graft.text.TextAnalysis.tokens(col("text")).as("tk"))
      .as[(Long, Seq[String])].collect()
    val total = docs.map { case (_, tk) =>
      (for { i <- tk.indices; j <- (i + 1) until math.min(i + 4, tk.length) }
        yield (Seq(tk(i), tk(j)).min, Seq(tk(i), tk(j)).max))
        .count(p => p._1 == u && p._2 == v)
    }.sum
    assert(rows.head._3 == total, s"($u,$v) corpus count")
  }

  test("knn_reciprocity: edges = 5 per node, mutual <= edges, ppm consistent") {
    import spark.implicits._
    val Array((nodes, edges, mutual, ppm)) =
      q("q_knn_reciprocity").as[(Long, Long, Long, Long)].collect()
    assert(nodes >= 2)
    assert(edges == 5 * nodes || edges == (nodes - 1) * nodes.min(5),
      s"k=5 out-degree (or n-1 when the sample is tiny): $edges vs $nodes")
    assert(mutual <= edges && mutual % 2 == 0, "mutual edges come in pairs")
    assert(ppm == 1000000L * mutual / edges)
  }
}
