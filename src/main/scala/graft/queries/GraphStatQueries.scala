package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.pipeline.Tables.t
import graft.text.{TextAnalysis => TA}

/** Graph + exact-statistics operators (SURVEY.md §2.11 extensions):
  * unrolled iterative PageRank, Pareto skyline, Markov transition
  * matrix, sweep-line concurrency, discrete percentiles, class
  * weighting, and a sketch-gated heavy-hitter report. All outputs
  * are born-integer (milli/permille fixed point via floor division)
  * or value passthrough — no float arithmetic crosses the oracle
  * boundary (the round-5..7 lesson).
  */
object GraphStatQueries {

  val all: Seq[QDef] = Seq(

    // Iterative PAGERANK, two unrolled power iterations over the
    // undirected part↔supplier co-shipment graph (edges = distinct
    // (l_partkey, l_suppkey) pairs, both directions, so no dangling
    // nodes). Fixed-point milli arithmetic: rank0=1000 for all,
    // contrib = rank div outdeg, rank' = 150 + (850·Σcontrib) div
    // 1000 — integer-only so both engines agree bit-for-bit.
    // 100 TB shape: each iteration is a co-partitioned src-join
    // (deg derives from e's own src grouping) plus ONE aggregate
    // shuffle on dst; iterations unroll in the plan — no driver
    // loop, no collect. Degree table is node-sized (too big to
    // broadcast at scale) so it stays a keyed join.
    QDef("q_pagerank_iter", Some("""
      WITH e0 AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem),
      e AS (SELECT 'p' || CAST(p AS VARCHAR) AS src, 's' || CAST(s AS VARCHAR) AS dst FROM e0
            UNION ALL
            SELECT 's' || CAST(s AS VARCHAR), 'p' || CAST(p AS VARCHAR) FROM e0),
      deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
      r1 AS (SELECT e.dst AS node, 150 + (850 * CAST(sum(1000 // deg.outdeg) AS BIGINT)) // 1000 AS rank
             FROM e JOIN deg ON e.src = deg.src GROUP BY e.dst),
      r2 AS (SELECT e.dst AS node, 150 + (850 * CAST(sum(r1.rank // deg.outdeg) AS BIGINT)) // 1000 AS rank
             FROM e JOIN deg ON e.src = deg.src JOIN r1 ON r1.node = e.src
             GROUP BY e.dst)
      SELECT node, rank FROM r2 ORDER BY node"""),
      (s, d) => {
        val e0 = t(s, d, "lineitem")
          .select(col("l_partkey").as("p"), col("l_suppkey").as("s")).distinct()
        val e = e0.select(concat(lit("p"), col("p").cast("string")).as("src"),
            concat(lit("s"), col("s").cast("string")).as("dst"))
          .union(e0.select(concat(lit("s"), col("s").cast("string")).as("src"),
            concat(lit("p"), col("p").cast("string")).as("dst")))
        val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
        def iterate(ranks: org.apache.spark.sql.DataFrame) =
          e.join(deg, "src")
            .join(ranks, col("node") === col("src"))
            .groupBy(col("dst"))
            .agg(sum(expr("rank div outdeg")).as("c"))
            .select(col("dst").as("node"),
              (lit(150) + expr("(850 * c) div 1000")).as("rank"))
        // iteration 1 from the uniform rank0=1000: contrib is a pure
        // function of outdeg, no rank join needed
        val r1 = e.join(deg, "src")
          .groupBy(col("dst"))
          .agg(sum(expr("1000 div outdeg")).as("c"))
          .select(col("dst").as("node"),
            (lit(150) + expr("(850 * c) div 1000")).as("rank"))
        iterate(r1).orderBy("node")
      }),

    // Pareto SKYLINE per brand (minimize price, maximize size): the
    // classic 2-D skyline via ONE window pass — sort (price asc,
    // size desc) inside each brand, keep a point iff its size
    // strictly exceeds the running max over all preceding rows.
    // Every potential dominator sorts before its victim, so the
    // cummax test is exactly the NOT-EXISTS dominance predicate —
    // O(n log n) against the oracle's O(n²) self-join, and the only
    // wide op is the brand-keyed window shuffle. Prices as integer
    // cents via floor (DuckDB CAST(double AS BIGINT) rounds
    // half-even while Spark truncates — floor() agrees everywhere).
    QDef("q_skyline_pareto", Some("""
      WITH pts AS (SELECT DISTINCT p_brand AS brand,
          CAST(floor(p_retailprice * 100) AS BIGINT) AS price_c,
          CAST(p_size AS BIGINT) AS size FROM part)
      SELECT brand, price_c, size FROM pts p WHERE NOT EXISTS (
        SELECT 1 FROM pts q WHERE q.brand = p.brand
          AND q.price_c <= p.price_c AND q.size >= p.size
          AND (q.price_c < p.price_c OR q.size > p.size))
      ORDER BY brand, price_c, size"""),
      (s, d) => {
        val pts = t(s, d, "part")
          .select(col("p_brand").as("brand"),
            floor(col("p_retailprice") * 100).cast("long").as("price_c"),
            col("p_size").cast("long").as("size"))
          .distinct()
        val w = Window.partitionBy("brand")
          .orderBy(col("price_c").asc, col("size").desc)
          .rowsBetween(Window.unboundedPreceding, -1)
        pts.withColumn("cmax", max("size").over(w))
          .filter(col("cmax").isNull || col("size") > col("cmax"))
          .select("brand", "price_c", "size")
          .orderBy("brand", "price_c", "size")
      }),

    // MARKOV first-order transition matrix of the event stream:
    // lag() per user over (ts, event_id), count each (prev → next)
    // pair, permille row-normalized by integer floor division.
    // One user-keyed window shuffle; the transition matrix itself is
    // |types|² rows, so its aggregate and the row-total join are
    // dim-sized (broadcast).
    QDef("q_markov_transition", Some("""
      WITH o AS (SELECT user_id, event_type,
          lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        FROM events),
      c AS (SELECT prev, event_type AS next, count(*) AS n
            FROM o WHERE prev IS NOT NULL GROUP BY 1, 2),
      tot AS (SELECT prev, CAST(sum(n) AS BIGINT) AS tot FROM c GROUP BY prev)
      SELECT c.prev, c.next, n, (1000 * n) // tot AS permille
      FROM c JOIN tot USING (prev) ORDER BY prev, next"""),
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val c = t(s, d, "events")
          .withColumn("prev", lag(col("event_type"), 1).over(w))
          .filter(col("prev").isNotNull)
          .groupBy(col("prev"), col("event_type").as("next"))
          .agg(count(lit(1)).as("n"))
        val tot = c.groupBy("prev").agg(sum("n").as("tot"))
        c.join(broadcast(tot), "prev")
          .select(col("prev"), col("next"), col("n"),
            expr("(1000 * n) div tot").as("permille"))
          .orderBy("prev", "next")
      }),

    // TYPE-TOKEN RATIO per document (lexical-diversity training
    // signal): distinct tokens ÷ total tokens in permille, integer
    // floor. Fully narrow — tokenize, two array ops, a projection;
    // no shuffle except the presentation sort.
    QDef("q_doc_ttr", Some("""
      WITH d AS (SELECT doc_id,
          list_filter(string_split(text, ' '), t -> t <> '') AS toks FROM documents)
      SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
        CAST(len(list_distinct(toks)) AS BIGINT) AS n_types,
        (1000 * CAST(len(list_distinct(toks)) AS BIGINT))
          // CAST(len(toks) AS BIGINT) AS ttr_permille
      FROM d WHERE len(toks) > 0 ORDER BY doc_id"""),
      (s, d) =>
        t(s, d, "documents")
          .withColumn("toks", TA.tokens(col("text")))
          .filter(size(col("toks")) > 0)
          .select(col("doc_id"),
            size(col("toks")).cast("long").as("n_tokens"),
            size(array_distinct(col("toks"))).cast("long").as("n_types"))
          .withColumn("ttr_permille", expr("(1000 * n_types) div n_tokens"))
          .orderBy("doc_id")),

    // SWEEP-LINE peak concurrency: each event occupies the half-open
    // interval [ts, ts+300s); peak simultaneous events per type =
    // max running sum over the merged +1/−1 boundary stream. Tie
    // order (t, delta) puts −1 before +1 at the same instant —
    // half-open semantics — and the default RANGE frame makes peers
    // atomic, so the running sum is order-deterministic in both
    // engines. One event_type-keyed shuffle carries the whole sweep.
    QDef("q_concurrency_sweep", Some("""
      WITH pts AS (
        SELECT event_type, ts AS t, 1 AS delta FROM events
        UNION ALL
        SELECT event_type, ts + INTERVAL 300 SECOND, -1 FROM events),
      c AS (SELECT event_type,
          CAST(sum(delta) OVER (PARTITION BY event_type ORDER BY t, delta) AS BIGINT) AS cum
        FROM pts)
      SELECT event_type, max(cum) AS peak FROM c
      GROUP BY event_type ORDER BY event_type"""),
      (s, d) => {
        val ev = t(s, d, "events")
        val pts = ev.select(col("event_type"), col("ts").as("t"), lit(1).as("delta"))
          .union(ev.select(col("event_type"),
            (col("ts") + expr("INTERVAL 300 SECONDS")).as("t"), lit(-1).as("delta")))
        val w = Window.partitionBy("event_type").orderBy(col("t"), col("delta"))
        pts.withColumn("cum", sum("delta").over(w).cast("long"))
          .groupBy("event_type").agg(max("cum").as("peak"))
          .orderBy("event_type")
      }),

    // DISCRETE percentiles (p25/p50/p75) of event value per type:
    // exact order statistics at ceil(q·n) via row_number — element
    // SELECTION, not interpolation, so the outputs are values the
    // data actually contains (milli-fixed-point via floor). One
    // type-keyed window shuffle; the final pivot-style aggregate is
    // dim-sized.
    QDef("q_pctl_disc_group", Some("""
      WITH v AS (SELECT event_type, CAST(floor(value * 1000) AS BIGINT) AS v FROM events),
      r AS (SELECT event_type, v,
          row_number() OVER (PARTITION BY event_type ORDER BY v) AS rn,
          count(*) OVER (PARTITION BY event_type) AS n FROM v)
      SELECT event_type,
        max(CASE WHEN rn = (n+3)//4 THEN v END) AS p25,
        max(CASE WHEN rn = (n+1)//2 THEN v END) AS p50,
        max(CASE WHEN rn = (3*n+3)//4 THEN v END) AS p75
      FROM r GROUP BY event_type ORDER BY event_type"""),
      (s, d) => {
        val w = Window.partitionBy("event_type").orderBy("v")
        val wn = Window.partitionBy("event_type")
        t(s, d, "events")
          .select(col("event_type"), floor(col("value") * 1000).cast("long").as("v"))
          .withColumn("rn", row_number().over(w))
          .withColumn("n", count(lit(1)).over(wn))
          .groupBy("event_type")
          .agg(
            max(when(col("rn") === expr("(n+3) div 4"), col("v"))).as("p25"),
            max(when(col("rn") === expr("(n+1) div 2"), col("v"))).as("p50"),
            max(when(col("rn") === expr("(3*n+3) div 4"), col("v"))).as("p75"))
          .orderBy("event_type")
      }),

    // CLASS WEIGHTS for imbalanced training labels: inverse-frequency
    // weight_milli = (total·1000) div (k·count) — the standard
    // sklearn "balanced" scheme in integer milli. Label histogram is
    // one map-side-combined aggregate; the 1-row total joins back by
    // broadcast.
    QDef("q_class_weights", Some("""
      WITH c AS (SELECT CAST(label AS BIGINT) AS label, count(*) AS n
                 FROM embeddings GROUP BY label),
      t AS (SELECT CAST(sum(n) AS BIGINT) AS total, CAST(count(*) AS BIGINT) AS k FROM c)
      SELECT label, n, (total * 1000) // (k * n) AS weight_milli
      FROM c, t ORDER BY label"""),
      (s, d) => {
        val c = t(s, d, "embeddings")
          .groupBy(col("label").cast("long").as("label"))
          .agg(count(lit(1)).as("n"))
        val tot = c.agg(sum("n").as("total"), count(lit(1)).as("k"))
        c.crossJoin(broadcast(tot))
          .select(col("label"), col("n"),
            expr("(total * 1000) div (k * n)").as("weight_milli"))
          .orderBy("label")
      }),

    // HEAVY HITTERS, sketch-gated exact: per source, every token
    // whose exact frequency exceeds 1/32 of the source's token mass.
    // Pass 1 runs a Misra-Gries(64) typed Aggregator — O(64) state
    // per group, partial-aggregated map-side, so the full token→count
    // map never crosses the shuffle. Its one-sided guarantee (no
    // token above N/65 is lost) makes the candidate set a SUPERSET of
    // the answer; pass 2 re-counts only the ≤64-per-source survivors
    // exactly (broadcast semi-filter before the count shuffle) and
    // applies the exact 32·n > N gate — so the result matches the
    // oracle's full exact aggregation while shuffling ~nothing.
    QDef("q_heavy_hitters_gate", Some("""
      WITH tk AS (SELECT source,
          unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS tok
        FROM documents),
      w AS (SELECT source, tok, count(*) AS n FROM tk GROUP BY source, tok),
      tot AS (SELECT source, CAST(sum(n) AS BIGINT) AS total FROM w GROUP BY source)
      SELECT w.source, w.tok, n FROM w JOIN tot USING (source)
      WHERE 32 * n > total ORDER BY source, tok"""),
      (s, d) => {
        import s.implicits._
        val docs = t(s, d, "documents")
        val tok = docs.select(col("source"), explode(TA.tokens(col("text"))).as("tok"))
        val cand = tok.as[(String, String)]
          .groupByKey(_._1).mapValues(_._2)
          .agg(new graft.ops.MisraGriesAgg(64).toColumn)
          .toDF("source", "cand")
          .select(col("source"), explode(col("cand")).as("tok"))
        val tot = docs
          .select(col("source"), TA.tokenCount(col("text")).as("nt"))
          .groupBy("source").agg(sum("nt").as("total"))
        tok.join(broadcast(cand), Seq("source", "tok"))
          .groupBy("source", "tok").agg(count(lit(1)).as("n"))
          .join(broadcast(tot), "source")
          .filter(col("n") * 32 > col("total"))
          .select(col("source"), col("tok"), col("n"))
          .orderBy("source", "tok")
      })
  )
}
