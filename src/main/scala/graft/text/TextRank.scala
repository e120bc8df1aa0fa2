package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** TextRank: PageRank power iteration over the token-adjacency graph
  * — the classic graph-based keyword extractor (Mihalcea & Tarau
  * 2004), and the engine's canonical "iterative graph algorithm as
  * declarative joins" shape (the same pattern a link-graph quality
  * score runs over a web-crawl corpus before curation).
  *
  * Everything is INTEGER-EXACT so a DuckDB oracle can replay it
  * bit-for-bit: ranks live in micro-units (10⁻⁶), the damping factor
  * is 850/1000, and every division is a truncating integer `div`
  * over non-negative operands (where truncation == floor, so Spark's
  * `div` and DuckDB's `//` agree). No float ever enters the loop.
  *
  * Scale shape (per iteration): one equi-join of the weighted edge
  * list against the current rank vector on `src`, one
  * map-side-combined sum by `dst`, one left join back onto the node
  * set — all hash-partitioned on the token key. The edge-list and
  * node-set subtrees each end at an exchange, so Spark's
  * ReusedExchange dedups them across iterations (pinned in
  * ScalePlanSpec): the corpus is tokenized and the adjacency
  * aggregated ONCE per execution, not once per iteration. The
  * iteration count is a small fixed constant, so the unrolled plan
  * stays O(iters) nodes and nothing needs driver-side materialization
  * (contrast NearDup.connectedComponents, whose data-dependent round
  * count forces per-round lineage truncation).
  */
object TextRank {

  /** Rank unit: 1.0 == 10⁶ micro. */
  val Scale = 1000000L

  /** Damping d = 0.85 as a permille numerator (÷1000 in the update). */
  val DampPermille = 850L

  /** The teleport term (1−d)·Scale every node keeps per iteration. */
  val BaseMicro = 150000L

  /** Weighted undirected token-adjacency edges `(src, dst, w)`:
    * w = number of times the two distinct tokens appear ADJACENT in
    * `textCol`, emitted in both directions. The bigram fan-out is a
    * narrow per-row zip of the token array against itself shifted by
    * one; the only shuffle is the map-side-combined (src, dst) count
    * — which collapses to the vocabulary-pair cardinality, not the
    * corpus size. */
  def adjacency(docs: DataFrame, textCol: Column): DataFrame = {
    val tk = TextAnalysis.tokens(textCol)
    val n1 = greatest(size(tk) - 1, lit(0))
    val bg = docs
      .select(zip_with(slice(tk, lit(1), n1), slice(tk, lit(2), n1),
        (u, v) => struct(u.as("u"), v.as("v"))).as("ps"))
      .select(explode(col("ps")).as("p"))
      .filter(col("p.u") =!= col("p.v")) // self-loops feed rank back; drop
    val ed = bg.select(col("p.u").as("src"), col("p.v").as("dst"))
      .union(bg.select(col("p.v").as("src"), col("p.u").as("dst")))
    ed.groupBy("src", "dst").agg(count(lit(1)).as("w"))
  }

  /** `iters` power-iteration rounds over weighted edges `(src, dst,
    * w)`. Nodes are the tokens with at least one edge; all start at
    * Scale. Update (all integer, all non-negative):
    *
    *   pr'(v) = BaseMicro + div(850 · Σ_u div(w(u,v)·pr(u), S(u)), 1000)
    *
    * where S(u) is u's out-strength Σ_v w(u,v). Returns (tok, pr). */
  def ranks(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 16,
      s"iters=$iters: the unrolled plan is O(iters) — keep it a small constant")
    val strength = edges.groupBy("src").agg(sum(col("w")).as("s"))
    val ew = edges.join(strength, "src") // (src, dst, w, s) — broadcastable, vocab²-bounded
    val nodes = edges.select(col("src").as("tok")).distinct()
    var pr = nodes.withColumn("pr", lit(Scale))
    for (_ <- 1 to iters) {
      val contrib = ew
        .join(pr.select(col("tok").as("src"), col("pr").as("_p")), "src")
        .groupBy(col("dst").as("tok"))
        .agg(sum(expr("div(w * _p, s)")).as("m"))
      pr = nodes.join(contrib, Seq("tok"), "left")
        .select(col("tok"),
          (lit(BaseMicro) +
            expr(s"div($DampPermille * coalesce(m, 0L), 1000)")).as("pr"))
    }
    pr
  }
}
