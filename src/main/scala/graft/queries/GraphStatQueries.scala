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

  /** Hub cap for pair-expansion plans (q_cosupplier_degree,
    * q_assoc_rules): per-group sorted item sets are sliced to this
    * length before the pair-generating double explode, bounding the
    * per-group fan-out at HubCap² rows no matter how skewed the
    * graph. 256 is identity at every tested SF (measured maxima:
    * part degree 52, basket 17 at sf0.1) so the uncapped oracle SQL
    * still matches — the cap exists for the 100 TB hub, where an
    * unbounded group would otherwise quadratically dominate the
    * stage (the q_lsh_bucket_skew failure mode). */
  val HubCap = 256

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
      }),

    // RFM (recency / frequency / monetary) customer scoring with
    // exact ntile(5) quintiles. Monetary sums pre-floored integer
    // cents (a float sum's addition order would leak into the floor
    // boundary — the round-5..7 lesson). Ties inside each ntile sort
    // carry a custkey tiebreak so the quintile assignment is a total
    // order both engines agree on. SCALE NOTE: exact global ntile is
    // a single-partition window by construction; a 100 TB deployment
    // would swap it for approx-quantile cutpoints (one pass, no
    // global sort) at the cost of boundary exactness — kept exact
    // here because the oracle contract is exact quintiles.
    QDef("q_rfm_scores", Some("""
      WITH maxd AS (SELECT CAST(max(o_orderdate) AS DATE) AS mx FROM orders),
      a AS (SELECT o_custkey AS custkey,
          date_diff('day', CAST(max(o_orderdate) AS DATE), (SELECT mx FROM maxd)) AS recency_days,
          count(*) AS frequency,
          CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS monetary_c
        FROM orders GROUP BY 1)
      SELECT custkey, CAST(recency_days AS BIGINT) AS recency_days, frequency, monetary_c,
        CAST(ntile(5) OVER (ORDER BY recency_days, custkey) AS BIGINT) AS r_score,
        CAST(ntile(5) OVER (ORDER BY frequency DESC, custkey) AS BIGINT) AS f_score,
        CAST(ntile(5) OVER (ORDER BY monetary_c DESC, custkey) AS BIGINT) AS m_score
      FROM a ORDER BY custkey"""),
      (s, d) => {
        val o = t(s, d, "orders")
        val mx = o.agg(max(col("o_orderdate").cast("date")).as("mx"))
        val a = o.groupBy(col("o_custkey").as("custkey"))
          .agg(max(col("o_orderdate").cast("date")).as("lastd"),
            count(lit(1)).as("frequency"),
            sum(floor(col("o_totalprice") * 100).cast("long")).as("monetary_c"))
          .crossJoin(broadcast(mx))
          .withColumn("recency_days", datediff(col("mx"), col("lastd")).cast("long"))
        a.withColumn("r_score",
            ntile(5).over(Window.orderBy(col("recency_days"), col("custkey"))).cast("long"))
          .withColumn("f_score",
            ntile(5).over(Window.orderBy(col("frequency").desc, col("custkey"))).cast("long"))
          .withColumn("m_score",
            ntile(5).over(Window.orderBy(col("monetary_c").desc, col("custkey"))).cast("long"))
          .select("custkey", "recency_days", "frequency", "monetary_c",
            "r_score", "f_score", "m_score")
          .orderBy("custkey")
      }),

    // ROBUST outlier detection via MAD (median absolute deviation):
    // per event type, flag events whose |v − median| exceeds 3×MAD.
    // Both medians are exact DISCRETE order statistics (row_number at
    // ceil(n/2)) in milli fixed point, so the whole chain is integer
    // and the flag threshold can't wobble across engines — unlike
    // the mean/stddev z-score (q_zscore_outliers), a 1% corrupted
    // tail can't drag the threshold. Two type-keyed window passes +
    // two dim-sized broadcast joins.
    QDef("q_anomaly_mad", Some("""
      WITH v AS (SELECT event_id, event_type, CAST(floor(value * 1000) AS BIGINT) AS v FROM events),
      r AS (SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY v) AS rn,
              count(*) OVER (PARTITION BY event_type) AS n FROM v),
      med AS (SELECT event_type, max(CASE WHEN rn = (n+1)//2 THEN v END) AS med FROM r GROUP BY 1),
      dev AS (SELECT v.event_type, v.event_id, v.v, abs(v.v - med.med) AS dev
              FROM v JOIN med USING (event_type)),
      r2 AS (SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY dev) AS rn,
              count(*) OVER (PARTITION BY event_type) AS n FROM dev),
      mad AS (SELECT event_type, max(CASE WHEN rn = (n+1)//2 THEN dev END) AS mad FROM r2 GROUP BY 1)
      SELECT d.event_id, d.event_type, d.v, d.dev, m.mad
      FROM dev d JOIN mad m USING (event_type)
      WHERE d.dev > 3 * m.mad ORDER BY d.event_id"""),
      (s, d) => {
        val v = t(s, d, "events")
          .select(col("event_id"), col("event_type"),
            floor(col("value") * 1000).cast("long").as("v"))
        def discMedian(df: org.apache.spark.sql.DataFrame, valueCol: String) = {
          val w = Window.partitionBy("event_type").orderBy(valueCol)
          val wn = Window.partitionBy("event_type")
          df.withColumn("rn", row_number().over(w))
            .withColumn("n", count(lit(1)).over(wn))
            .groupBy("event_type")
            .agg(max(when(col("rn") === expr("(n+1) div 2"), col(valueCol))).as(s"med_$valueCol"))
        }
        val dev = v.join(broadcast(discMedian(v, "v")), "event_type")
          .withColumn("dev", abs(col("v") - col("med_v")))
        dev.join(broadcast(discMedian(dev, "dev").withColumnRenamed("med_dev", "mad")),
            "event_type")
          .filter(col("dev") > lit(3) * col("mad"))
          .select("event_id", "event_type", "v", "dev", "mad")
          .orderBy("event_id")
      }),

    // 2-HOP graph neighborhood: co-supplier degree — for each
    // supplier, how many OTHER suppliers share at least one part
    // with it. NOT an edge-list self-join (the r7/r8 shape that blew
    // its budget 1.7× under load materializing ~17M multi-counted
    // (part, s, s2) rows through a shuffle join): per-part supplier
    // sets are collected ONCE (one shuffle on p, map-side combined),
    // pairs are generated NARROWLY by a double explode of each set
    // with s < s2 (half the pair volume; no join anywhere in the
    // plan — ScalePlanSpec pins this), deduped with map-side partial
    // aggregation, then mirrored cheaply for the per-supplier count.
    // Hub parts quadratically inflate pair generation (the LSH
    // bucket-skew story, q_lsh_bucket_skew) — the 100 TB mitigation
    // is IN the plan now, not a comment: each part's sorted supplier
    // set is sliced to HubCap (256) before exploding, bounding the
    // per-part fan-out at HubCap² rows regardless of skew. Synthetic
    // max part degree is 52 at sf0.1 (measured), so the cap is
    // exactly the identity at every tested SF and the uncapped
    // oracle still matches; at a 100 TB hub part it degrades to the
    // 256 lowest-keyed co-suppliers — the standard drop-hub-items
    // discipline of co-occurrence mining.
    QDef("q_cosupplier_degree", Some("""
      WITH e AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem)
      SELECT a.s AS suppkey, count(DISTINCT b.s) AS n_cosuppliers
      FROM e a JOIN e b ON a.p = b.p AND a.s <> b.s
      GROUP BY a.s ORDER BY suppkey"""),
      (s, d) => {
        val sets = t(s, d, "lineitem")
          .groupBy(col("l_partkey"))
          .agg(slice(sort_array(collect_set(col("l_suppkey"))), 1, HubCap).as("ss"))
        val pairs = sets
          .select(explode(col("ss")).as("s"), col("ss"))
          .select(col("s"), explode(col("ss")).as("s2"))
          .filter(col("s") < col("s2"))
          .distinct()
        pairs.union(pairs.select(col("s2"), col("s")))
          .groupBy(col("s").as("suppkey"))
          .agg(count(lit(1)).as("n_cosuppliers"))
          .orderBy("suppkey")
      }),

    // LABEL PROPAGATION, two synchronous rounds over the
    // part↔supplier graph: parts adopt the plurality nation of their
    // suppliers, then suppliers adopt the plurality label of their
    // parts; report propagated vs native label. Plurality = mode
    // with deterministic (count desc, label asc) tie-break, the same
    // total-order trick as q_mode_per_group. Each round is one
    // join + one keyed window — the iterative-propagation plan shape
    // (like q_pagerank_iter, unrolled, no driver loop).
    QDef("q_label_propagation", Some("""
      WITH e AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem),
      pl AS (
        SELECT p, lab FROM (
          SELECT e.p, CAST(sup.s_nationkey AS BIGINT) AS lab, count(*) AS n
          FROM e JOIN supplier sup ON e.s = sup.s_suppkey GROUP BY 1, 2)
        QUALIFY row_number() OVER (PARTITION BY p ORDER BY n DESC, lab) = 1),
      sl AS (
        SELECT s, lab FROM (
          SELECT e.s, pl.lab, count(*) AS n
          FROM e JOIN pl USING (p) GROUP BY 1, 2)
        QUALIFY row_number() OVER (PARTITION BY s ORDER BY n DESC, lab) = 1)
      SELECT sl.s AS suppkey, CAST(sup.s_nationkey AS BIGINT) AS native_label,
             sl.lab AS propagated_label,
             CASE WHEN sl.lab = CAST(sup.s_nationkey AS BIGINT) THEN 1 ELSE 0 END AS agrees
      FROM sl JOIN supplier sup ON sl.s = sup.s_suppkey
      ORDER BY suppkey"""),
      (s, d) => {
        val e = t(s, d, "lineitem")
          .select(col("l_partkey").as("p"), col("l_suppkey").as("s")).distinct()
        val sup = t(s, d, "supplier")
          .select(col("s_suppkey"), col("s_nationkey").cast("long").as("native_label"))
        def plurality(df: org.apache.spark.sql.DataFrame, key: String) = {
          val w = Window.partitionBy(key).orderBy(col("n").desc, col("lab"))
          df.groupBy(col(key), col("lab")).agg(count(lit(1)).as("n"))
            .withColumn("rn", row_number().over(w))
            .filter(col("rn") === 1).select(col(key), col("lab"))
        }
        val pl = plurality(
          e.join(broadcast(sup), col("s") === col("s_suppkey"))
            .select(col("p"), col("native_label").as("lab")), "p")
        val sl = plurality(e.join(pl, "p").select(col("s"), col("lab")), "s")
        sl.join(broadcast(sup), col("s") === col("s_suppkey"))
          .select(col("s").as("suppkey"), col("native_label"),
            col("lab").as("propagated_label"),
            when(col("lab") === col("native_label"), 1).otherwise(0).as("agrees"))
          .orderBy("suppkey")
      }),

    // BEHAVIORAL near-dup: sessionize each user's stream (24 h gap
    // rule — break flag via lag, session id via running sum, the
    // q_window_session machinery), render each session's ordered
    // event-type sequence as a '>' -joined pattern string, and
    // report every pattern more than one session exhibits. The
    // "dedup by behavior, not content" operator a bot-detection /
    // synthetic-data-contamination pipeline needs. Spark renders the
    // ordered string_agg as array_sort(collect_list(struct)) —
    // deterministic because (ts, event_id) totally orders the
    // struct. BOTH windows and the session aggregate ride the one
    // user_id shuffle; only pattern-sized rows reach the final
    // pattern-keyed exchange.
    QDef("q_session_pattern_dup", Some("""
      WITH o AS (SELECT user_id, event_id, ts, event_type,
          CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
               OR epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                  > 86400000000 THEN 1 ELSE 0 END AS brk
        FROM events),
      s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sess FROM o),
      p AS (SELECT user_id, sess,
              string_agg(event_type, '>' ORDER BY ts, event_id) AS pattern
            FROM s GROUP BY 1, 2)
      SELECT pattern, count(*) AS n_sessions, count(DISTINCT user_id) AS n_users
      FROM p GROUP BY pattern HAVING count(*) > 1 ORDER BY pattern"""),
      (s, d) => {
        val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val o = t(s, d, "events")
          .withColumn("gap_us",
            unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(byUser))
          .withColumn("brk",
            when(col("gap_us").isNull || col("gap_us") > 86400000000L, 1).otherwise(0))
          .withColumn("sess", sum("brk").over(byUser))
        o.groupBy("user_id", "sess")
          .agg(array_join(
            transform(
              array_sort(collect_list(struct(col("ts"), col("event_id"), col("event_type")))),
              x => x.getField("event_type")), ">").as("pattern"))
          .groupBy("pattern")
          .agg(count(lit(1)).as("n_sessions"), countDistinct("user_id").as("n_users"))
          .filter(col("n_sessions") > 1)
          .orderBy("pattern")
      }),

    // WINDOWED DISTINCT COUNT — rolling 7-day distinct event types
    // per user, an operator Spark's window functions lack natively
    // (no COUNT(DISTINCT) OVER): expressed as
    // size(array_distinct(collect_list() over RANGE frame)). The
    // RANGE frame is keyed on epoch micros so peers (equal
    // timestamps) share one frame — value-determined, order-proof in
    // both engines. State bound: the collected list holds ≤ the
    // 7-day event fan of one user — bounded by time, not stream
    // length. One user_id shuffle.
    QDef("q_window_distinct_count", Some("""
      SELECT user_id, event_id, CAST(count(DISTINCT event_type) OVER (
          PARTITION BY user_id ORDER BY epoch_us(ts)
          RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_types_7d
      FROM events ORDER BY user_id, event_id"""),
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("us"))
          .rangeBetween(-604800000000L, 0L)
        t(s, d, "events")
          .withColumn("us", unix_micros(col("ts")))
          .withColumn("n_types_7d",
            size(array_distinct(collect_list(col("event_type")).over(w))).cast("long"))
          .select("user_id", "event_id", "n_types_7d")
          .orderBy("user_id", "event_id")
      }),

    // ROBUST feature SCALER: (v − median) / IQR per event type in
    // milli fixed point — the outlier-insensitive standardization
    // (sklearn RobustScaler) for ML feature prep. Quartiles are
    // exact discrete order statistics (q_pctl_disc_group's
    // construction); the scale step is floor(a/b) via IEEE double
    // division, bit-identical across engines for |a| < 2^53 (integer
    // `div`/`//` semantics on NEGATIVE numerators are the portable
    // trap: truncation vs floor differs across engines/versions).
    // One type-keyed window + a broadcast stats join.
    QDef("q_robust_scaler", Some("""
      WITH v AS (SELECT event_id, event_type, CAST(floor(value * 1000) AS BIGINT) AS v FROM events),
      r AS (SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY v) AS rn,
              count(*) OVER (PARTITION BY event_type) AS n FROM v),
      st AS (SELECT event_type,
              max(CASE WHEN rn = (n+3)//4 THEN v END) AS q1,
              max(CASE WHEN rn = (n+1)//2 THEN v END) AS med,
              max(CASE WHEN rn = (3*n+3)//4 THEN v END) AS q3
             FROM r GROUP BY 1)
      SELECT event_id, v.event_type, v.v,
             CAST(floor(((v.v - st.med) * 1000) / (st.q3 - st.q1)) AS BIGINT) AS scaled_milli
      FROM v JOIN st USING (event_type)
      WHERE st.q3 > st.q1 ORDER BY event_id"""),
      (s, d) => {
        val v = t(s, d, "events")
          .select(col("event_id"), col("event_type"),
            floor(col("value") * 1000).cast("long").as("v"))
        val w = Window.partitionBy("event_type").orderBy("v")
        val wn = Window.partitionBy("event_type")
        val st = v.withColumn("rn", row_number().over(w))
          .withColumn("n", count(lit(1)).over(wn))
          .groupBy("event_type")
          .agg(max(when(col("rn") === expr("(n+3) div 4"), col("v"))).as("q1"),
            max(when(col("rn") === expr("(n+1) div 2"), col("v"))).as("med"),
            max(when(col("rn") === expr("(3*n+3) div 4"), col("v"))).as("q3"))
        // q3 = q1 (a degenerate constant-valued group) would divide
        // by zero, where floor(±Inf) semantics diverge across
        // engines — such groups are unscalable by definition, so
        // both sides drop them explicitly
        v.join(broadcast(st), "event_type")
          .filter(col("q3") > col("q1"))
          .withColumn("scaled_milli",
            floor((col("v") - col("med")) * 1000 / (col("q3") - col("q1"))).cast("long"))
          .select("event_id", "event_type", "v", "scaled_milli")
          .orderBy("event_id")
      }),


    // LEAVE-ONE-OUT target encoding: event_type → mean of value
    // (milli) over all OTHER rows of the type — the leakage-safe
    // categorical encoder (plain mean encoding leaks each row's own
    // target into its feature). Exact integer sums; the per-row mean
    // is floor of an IEEE double division (identical everywhere for
    // |num| < 2^53). One map-side-combined aggregate + a broadcast
    // join: two passes, zero wide shuffles of the fact.
    QDef("q_target_encode_loo", Some("""
      WITH v AS (SELECT event_id, event_type, CAST(floor(value * 1000) AS BIGINT) AS v FROM events),
      st AS (SELECT event_type, CAST(sum(v) AS BIGINT) AS s, count(*) AS n
             FROM v GROUP BY 1)
      SELECT event_id, v.event_type, v.v,
             CAST(floor(CAST(st.s - v.v AS DOUBLE) / (st.n - 1)) AS BIGINT) AS loo_mean_milli
      FROM v JOIN st USING (event_type) WHERE st.n > 1 ORDER BY event_id"""),
      (s, d) => {
        val v = t(s, d, "events")
          .select(col("event_id"), col("event_type"),
            floor(col("value") * 1000).cast("long").as("v"))
        val st = v.groupBy("event_type")
          .agg(sum("v").as("s"), count(lit(1)).as("n"))
        v.join(broadcast(st), "event_type").filter(col("n") > 1)
          .withColumn("loo_mean_milli",
            floor((col("s") - col("v")).cast("double") / (col("n") - 1)).cast("long"))
          .select("event_id", "event_type", "v", "loo_mean_milli")
          .orderBy("event_id")
      }),

    // REVENUE CONCENTRATION audit: each nation's top-3 suppliers'
    // share of its lineitem revenue, permille — the skew/dependency
    // readout (who dominates a partition) that decides salting and
    // risk reviews alike. Per-supplier rollup (one keyed shuffle),
    // broadcast nation join, top-3 via the WindowGroupLimit-rewritten
    // row_number, dim-sized final aggregate.
    QDef("q_supplier_concentration", Some("""
      WITH rev AS (SELECT s.s_nationkey AS nationkey, l.l_suppkey AS suppkey,
          CAST(sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS r
        FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey GROUP BY 1, 2),
      rk AS (SELECT *, row_number() OVER (PARTITION BY nationkey ORDER BY r DESC, suppkey) AS rn
             FROM rev)
      SELECT nationkey, CAST(sum(CASE WHEN rn <= 3 THEN r ELSE 0 END) AS BIGINT) AS top3_rev,
             CAST(sum(r) AS BIGINT) AS total_rev,
             (1000 * CAST(sum(CASE WHEN rn <= 3 THEN r ELSE 0 END) AS BIGINT))
               // CAST(sum(r) AS BIGINT) AS top3_permille
      FROM rk GROUP BY nationkey ORDER BY nationkey"""),
      (s, d) => {
        val sup = t(s, d, "supplier")
          .select(col("s_suppkey"), col("s_nationkey").as("nationkey"))
        val rev = t(s, d, "lineitem")
          .groupBy(col("l_suppkey").as("suppkey"))
          .agg(sum(floor(col("l_extendedprice") * 100).cast("long")).as("r"))
          .join(broadcast(sup), col("suppkey") === col("s_suppkey"))
        val w = Window.partitionBy("nationkey").orderBy(col("r").desc, col("suppkey"))
        rev.withColumn("rn", row_number().over(w))
          .groupBy("nationkey")
          .agg(sum(when(col("rn") <= 3, col("r")).otherwise(0L)).as("top3_rev"),
            sum("r").as("total_rev"))
          .withColumn("top3_permille", expr("(1000 * top3_rev) div total_rev"))
          .orderBy("nationkey")
      }),

    // GINI inequality of each source's token-frequency distribution,
    // exact milli: gini = (2·Σi·x_i − (n+1)·Σx)/(n·Σx) with ranks
    // assigned ascending — tied frequencies contribute x·Σi over the
    // tie run regardless of intra-tie order, so the statistic is
    // order-proof. The corpus-balance number a mixture planner reads
    // (high gini = a few boilerplate tokens carry the source). One
    // token-count aggregate + one source-keyed window pass.
    QDef("q_gini_source", Some("""
      WITH tk AS (SELECT source,
          unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS tok FROM documents),
      w AS (SELECT source, tok, count(*) AS x FROM tk GROUP BY 1, 2),
      rk AS (SELECT source, x,
          row_number() OVER (PARTITION BY source ORDER BY x, tok) AS i,
          count(*) OVER (PARTITION BY source) AS n,
          CAST(sum(x) OVER (PARTITION BY source) AS BIGINT) AS sx FROM w)
      SELECT source,
        CAST(floor(1000.0 * (2.0 * CAST(sum(i * x) AS BIGINT) - (n + 1) * sx)
          / (CAST(n AS DOUBLE) * sx)) AS BIGINT) AS gini_milli
      FROM rk GROUP BY source, n, sx ORDER BY source"""),
      (s, d) => {
        val w = t(s, d, "documents")
          .select(col("source"), explode(TA.tokens(col("text"))).as("tok"))
          .groupBy("source", "tok").agg(count(lit(1)).as("x"))
        val wr = Window.partitionBy("source").orderBy(col("x"), col("tok"))
        val wn = Window.partitionBy("source")
        w.withColumn("i", row_number().over(wr))
          .withColumn("n", count(lit(1)).over(wn))
          .withColumn("sx", sum("x").over(wn))
          .groupBy("source", "n", "sx")
          .agg(sum(col("i") * col("x")).as("six"))
          .withColumn("gini_milli",
            floor((lit(1000.0) * (lit(2.0) * col("six") - (col("n") + 1) * col("sx")))
              / (col("n").cast("double") * col("sx"))).cast("long"))
          .select("source", "gini_milli")
          .orderBy("source")
      }),

    // DISTRIBUTION DRIFT audit between the stream's first and second
    // half-month: per event type, each half's share in permille and
    // the signed drift — the PSI-style production-monitoring readout
    // in pure integer arithmetic (no logs, no floats: a drift gate
    // must mean the same thing on every engine that evaluates it).
    // One aggregate over the fact + a 1-row broadcast of the totals.
    QDef("q_drift_shares", Some("""
      WITH b AS (SELECT event_type,
          CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 0 ELSE 1 END AS half FROM events),
      c AS (SELECT event_type,
          count(*) FILTER (half = 0) AS o1, count(*) FILTER (half = 1) AS o2
        FROM b GROUP BY 1),
      t AS (SELECT CAST(sum(o1) AS BIGINT) AS t1, CAST(sum(o2) AS BIGINT) AS t2 FROM c)
      SELECT event_type, o1, o2,
             (1000 * o1) // t1 AS share1_permille,
             (1000 * o2) // t2 AS share2_permille,
             (1000 * o2) // t2 - (1000 * o1) // t1 AS drift_permille
      FROM c, t ORDER BY event_type"""),
      (s, d) => {
        val c = t(s, d, "events")
          .withColumn("half",
            when(col("ts") < lit("2024-01-16").cast("timestamp"), 0).otherwise(1))
          .groupBy("event_type")
          .agg(sum(when(col("half") === 0, 1L).otherwise(0L)).as("o1"),
            sum(when(col("half") === 1, 1L).otherwise(0L)).as("o2"))
        val tot = c.agg(sum("o1").as("t1"), sum("o2").as("t2"))
        c.crossJoin(broadcast(tot))
          .select(col("event_type"), col("o1"), col("o2"),
            expr("(1000 * o1) div t1").as("share1_permille"),
            expr("(1000 * o2) div t2").as("share2_permille"),
            expr("(1000 * o2) div t2 - (1000 * o1) div t1").as("drift_permille"))
          .orderBy("event_type")
      }),

    // BACKLOG AGING report: orders bucketed by age (days from order
    // date to the lake's max-date snapshot) × status, with counts
    // and pre-floored integer-cent value — the operational aging
    // table every pipeline backfill/retention review reads. The
    // snapshot date is a 1-row broadcast; bucketing is a per-row
    // when-chain; one dim-sized aggregate.
    QDef("q_order_aging", Some("""
      WITH mx AS (SELECT CAST(max(o_orderdate) AS DATE) AS m FROM orders),
      a AS (SELECT o_orderstatus AS status,
              date_diff('day', CAST(o_orderdate AS DATE), (SELECT m FROM mx)) AS age,
              CAST(floor(o_totalprice * 100) AS BIGINT) AS v FROM orders),
      b AS (SELECT status,
              CASE WHEN age < 30 THEN '00-29' WHEN age < 90 THEN '30-89'
                   WHEN age < 365 THEN '90-364' ELSE '365+' END AS bucket, v FROM a)
      SELECT status, bucket, count(*) AS n, CAST(sum(v) AS BIGINT) AS value_c
      FROM b GROUP BY 1, 2 ORDER BY status, bucket"""),
      (s, d) => {
        val o = t(s, d, "orders")
        val mx = o.agg(max(col("o_orderdate").cast("date")).as("m"))
        o.crossJoin(broadcast(mx))
          .select(col("o_orderstatus").as("status"),
            datediff(col("m"), col("o_orderdate").cast("date")).as("age"),
            floor(col("o_totalprice") * 100).cast("long").as("v"))
          .withColumn("bucket",
            when(col("age") < 30, "00-29").when(col("age") < 90, "30-89")
              .when(col("age") < 365, "90-364").otherwise("365+"))
          .groupBy("status", "bucket")
          .agg(count(lit(1)).as("n"), sum("v").as("value_c"))
          .orderBy("status", "bucket")
      }),

    // STICKINESS (DAU/WAU): per day, distinct active users, the
    // trailing-7-day distinct-user count, and their permille ratio —
    // the engagement metric product analytics runs daily. The
    // (day, user) dedup bounds everything downstream: WAU re-counts
    // distinct users over a 7-day day-join whose build side is the
    // DAY LIST (calendar-sized, broadcast) — the fact never joins
    // the fact.
    QDef("q_stickiness_dau_wau", Some("""
      WITH du AS (SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day, user_id FROM events),
      d AS (SELECT day, count(*) AS dau FROM du GROUP BY day),
      w AS (SELECT a.day, count(DISTINCT b.user_id) AS wau
            FROM d a JOIN du b ON b.day BETWEEN a.day - INTERVAL 6 DAY AND a.day
            GROUP BY a.day)
      SELECT strftime(d.day, '%Y-%m-%d') AS day, dau, wau,
             (1000 * dau) // wau AS stickiness_permille
      FROM d JOIN w USING (day) ORDER BY day"""),
      (s, d) => {
        val du = t(s, d, "events")
          .select(date_trunc("day", col("ts")).cast("date").as("day"), col("user_id"))
          .distinct()
        val days = du.groupBy("day").agg(count(lit(1)).as("dau"))
        val w = broadcast(days.select(col("day").as("d0")))
          .join(du, col("day").between(col("d0") - expr("INTERVAL 6 DAYS"), col("d0")))
          .groupBy(col("d0").as("day"))
          .agg(countDistinct("user_id").as("wau"))
        days.join(w, "day")
          .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
            col("dau"), col("wau"),
            expr("(1000 * dau) div wau").as("stickiness_permille"))
          .orderBy("day")
      }),

    // STRATIFIED EXEMPLARS: three deterministic sample documents per
    // (lang × TTR-quality bucket) cell — the "show me examples from
    // every stratum" inspection query a corpus review starts with.
    // The pick order is a seed-stamped md5 of doc_id (stable across
    // engines/runs/partitions, like q_quality_resample), so the
    // exemplars never churn between reviews. One window pass;
    // WindowGroupLimit caps each cell map-side.
    QDef("q_stratified_exemplars", Some("""
      WITH d AS (SELECT doc_id, lang,
          list_filter(string_split(text, ' '), t -> t <> '') AS toks FROM documents),
      q AS (SELECT doc_id, lang, CAST(len(toks) AS BIGINT) AS n_tokens,
              (1000 * CAST(len(list_distinct(toks)) AS BIGINT))
                // CAST(len(toks) AS BIGINT) AS ttr
            FROM d WHERE len(toks) > 0),
      b AS (SELECT doc_id, lang, n_tokens,
              CASE WHEN ttr >= 600 THEN 'hi' WHEN ttr >= 400 THEN 'mid' ELSE 'lo' END AS bucket
            FROM q),
      r AS (SELECT *, CAST(row_number() OVER (PARTITION BY lang, bucket
              ORDER BY md5('ex1|' || doc_id), doc_id) AS BIGINT) AS rn FROM b)
      SELECT lang, bucket, rn, doc_id, n_tokens FROM r WHERE rn <= 3
      ORDER BY lang, bucket, rn"""),
      (s, d) => {
        val q = t(s, d, "documents")
          .withColumn("toks", TA.tokens(col("text")))
          .filter(size(col("toks")) > 0)
          .select(col("doc_id"), col("lang"),
            size(col("toks")).cast("long").as("n_tokens"),
            expr("(1000 * cast(size(array_distinct(toks)) AS BIGINT)) div size(toks)")
              .as("ttr"))
        val b = q.withColumn("bucket",
          when(col("ttr") >= 600, "hi").when(col("ttr") >= 400, "mid").otherwise("lo"))
        val w = Window.partitionBy("lang", "bucket")
          .orderBy(md5(concat(lit("ex1|"), col("doc_id").cast("string"))), col("doc_id"))
        b.withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 3)
          .select("lang", "bucket", "rn", "doc_id", "n_tokens")
          .orderBy("lang", "bucket", "rn")
      }),

    // ASSOCIATION RULES over co-purchase pairs: for every pair with
    // support ≥ 2 orders, both directed rules with integer permille
    // confidence (n_ab/n_antecedent) and milli lift
    // (n_ab·|orders| / (n_a·n_b)) — the market-basket completion of
    // q_basket_pairs' raw counts. NOT an orderkey self-join (the
    // r7/r8 shape, 1.29× over budget under load): baskets are built
    // with ONE collect_set shuffle on orderkey, and everything else
    // derives from the basket arrays — item counts and the order
    // total by a narrow explode + re-agg, within-basket pairs by the
    // capped double explode (HubCap slice = identity at tested
    // basket sizes ≤ 17; at a 100 TB mega-basket it bounds the
    // quadratic fan-out). The deduped edge list never shuffles
    // twice, and the only joins left are the broadcast enrichments.
    // The support threshold bounds the rule set BEFORE the direction
    // fan-out.
    QDef("q_assoc_rules", Some("""
      WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      ic AS (SELECT l_partkey, count(*) AS n FROM lp GROUP BY 1),
      tot AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS t FROM lp),
      pc AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS nab
             FROM lp a JOIN lp b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
             GROUP BY 1, 2 HAVING count(*) >= 2),
      r AS (SELECT pa AS antecedent, pb AS consequent, nab FROM pc
            UNION ALL SELECT pb, pa, nab FROM pc)
      SELECT r.antecedent, r.consequent, r.nab AS support_n,
             (1000 * r.nab) // ia.n AS conf_permille,
             (1000 * r.nab * tot.t) // (ia.n * ib.n) AS lift_milli
      FROM r JOIN ic ia ON r.antecedent = ia.l_partkey
             JOIN ic ib ON r.consequent = ib.l_partkey, tot
      ORDER BY antecedent, consequent"""),
      (s, d) => {
        val baskets = t(s, d, "lineitem")
          .groupBy(col("l_orderkey"))
          .agg(slice(sort_array(collect_set(col("l_partkey"))), 1, HubCap).as("ps"))
        val items = baskets.select(explode(col("ps")).as("l_partkey"))
        val ic = items.groupBy("l_partkey").agg(count(lit(1)).as("n"))
        val tot = baskets.agg(count(lit(1)).as("t"))
        val pc = baskets
          .select(explode(col("ps")).as("pa"), col("ps"))
          .select(col("pa"), explode(col("ps")).as("pb"))
          .filter(col("pa") < col("pb"))
          .groupBy("pa", "pb").agg(count(lit(1)).as("nab"))
          .filter(col("nab") >= 2)
        val r = pc.select(col("pa").as("antecedent"), col("pb").as("consequent"), col("nab"))
          .union(pc.select(col("pb"), col("pa"), col("nab")))
        r.join(broadcast(ic.select(col("l_partkey").as("antecedent"), col("n").as("na"))),
            "antecedent")
          .join(broadcast(ic.select(col("l_partkey").as("consequent"), col("n").as("nb"))),
            "consequent")
          .crossJoin(broadcast(tot))
          .select(col("antecedent"), col("consequent"), col("nab").as("support_n"),
            expr("(1000 * nab) div na").as("conf_permille"),
            expr("(1000 * nab * t) div (na * nb)").as("lift_milli"))
          .orderBy("antecedent", "consequent")
      }),

    // ITEM-ITEM similarity (collaborative-filtering primitive): for
    // each supplier, the 3 most-similar others by exact Jaccard over
    // shared part sets, permille. The pair counts come from one
    // partkey-keyed self-join of the deduped edge list (the
    // q_dedup_token_jaccard shape on the graph domain); per-item
    // set sizes broadcast on, and the top-3 is a WindowGroupLimit
    // window — pairs with no shared part never materialize.
    QDef("q_supplier_similarity", Some("""
      WITH e AS (SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem),
      sz AS (SELECT s, count(*) AS n FROM e GROUP BY s),
      ab AS (SELECT a.s AS sa, b.s AS sb, count(*) AS nab
             FROM e a JOIN e b ON a.p = b.p AND a.s <> b.s GROUP BY 1, 2),
      j AS (SELECT sa, sb, nab,
              (1000 * nab) // (za.n + zb.n - nab) AS jac_permille
            FROM ab JOIN sz za ON ab.sa = za.s JOIN sz zb ON ab.sb = zb.s),
      r AS (SELECT *, CAST(row_number() OVER (PARTITION BY sa
              ORDER BY jac_permille DESC, sb) AS BIGINT) AS rank FROM j)
      SELECT sa AS suppkey, sb AS similar_suppkey, nab AS shared_parts,
             jac_permille, rank
      FROM r WHERE rank <= 3 ORDER BY suppkey, rank"""),
      (s, d) => {
        // ONE shuffle builds the per-part sets straight off the fact
        // (collect_set dedups — no separate edge-distinct pass); the
        // per-supplier set sizes re-derive from the sets by a narrow
        // explode + small re-agg, so the full edge list never
        // shuffles twice.
        val sets = t(s, d, "lineitem")
          .groupBy(col("l_partkey").as("p"))
          .agg(slice(sort_array(collect_set(col("l_suppkey"))), 1, HubCap).as("ss"))
        val sz = sets.select(explode(col("ss")).as("s"))
          .groupBy("s").agg(count(lit(1)).as("n"))
        // pair counts via the HubCap-sliced double explode (the
        // q_cosupplier_degree discipline — no edge self-join);
        // nab is symmetric, so count the sa<sb half and mirror.
        val half = sets
          .select(explode(col("ss")).as("sa"), col("ss"))
          .select(col("sa"), explode(col("ss")).as("sb"))
          .filter(col("sa") < col("sb"))
          .groupBy("sa", "sb").agg(count(lit(1)).as("nab"))
        val ab = half.union(half.select(col("sb"), col("sa"), col("nab")))
        val j = ab
          .join(broadcast(sz.select(col("s").as("sa"), col("n").as("na"))), "sa")
          .join(broadcast(sz.select(col("s").as("sb"), col("n").as("nb"))), "sb")
          .withColumn("jac_permille", expr("(1000 * nab) div (na + nb - nab)"))
        val w = Window.partitionBy("sa").orderBy(col("jac_permille").desc, col("sb"))
        j.withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= 3)
          .select(col("sa").as("suppkey"), col("sb").as("similar_suppkey"),
            col("nab").as("shared_parts"), col("jac_permille"), col("rank"))
          .orderBy("suppkey", "rank")
      }),

    // CUSUM CHANGEPOINT detection: per event type, the day where the
    // cumulative deviation of daily counts from the type's mean rate
    // peaks — the classic level-shift locator, in EXACT integers
    // (cusum_k = Σ_{d≤k}(c_d·D − T) is the mean-centered cusum
    // scaled by D days, so no division ever happens). One dim-sized
    // daily aggregate + a broadcast totals join + one tiny window.
    QDef("q_changepoint_cusum", Some("""
      WITH d AS (SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day, count(*) AS c
                 FROM events GROUP BY 1, 2),
      t AS (SELECT event_type, CAST(count(*) AS BIGINT) AS nd, CAST(sum(c) AS BIGINT) AS tot
            FROM d GROUP BY 1),
      cu AS (SELECT d.event_type, d.day,
              CAST(sum(d.c * t.nd - t.tot) OVER (PARTITION BY d.event_type ORDER BY d.day) AS BIGINT) AS cusum
             FROM d JOIN t USING (event_type))
      SELECT event_type, strftime(day, '%Y-%m-%d') AS change_day, cusum
      FROM cu
      QUALIFY row_number() OVER (PARTITION BY event_type ORDER BY abs(cusum) DESC, day) = 1
      ORDER BY event_type"""),
      (s, d) => {
        val daily = t(s, d, "events")
          .groupBy(col("event_type"), date_trunc("day", col("ts")).cast("date").as("day"))
          .agg(count(lit(1)).as("c"))
        val tot = daily.groupBy("event_type")
          .agg(count(lit(1)).as("nd"), sum("c").as("tot"))
        val wc = Window.partitionBy("event_type").orderBy("day")
        val wr = Window.partitionBy("event_type")
          .orderBy(abs(col("cusum")).desc, col("day"))
        daily.join(broadcast(tot), "event_type")
          .withColumn("cusum", sum(col("c") * col("nd") - col("tot")).over(wc).cast("long"))
          .withColumn("rn", row_number().over(wr))
          .filter(col("rn") === 1)
          .select(col("event_type"),
            date_format(col("day"), "yyyy-MM-dd").as("change_day"), col("cusum"))
          .orderBy("event_type")
      }),

    // LINEAR TREND per event type over daily counts, as the EXACT
    // OLS-slope rational (num, den) — the q_zscore_outliers
    // discipline: slope = num/den is derivable, but emitting the
    // rational means no float/rounding semantics can diverge across
    // oracle environments. Integer moments over dim-sized daily
    // aggregates; magnitudes ≤ nd·Σxy ≈ 10⁹ at sf0.1, far inside
    // BIGINT at any plausible day count.
    QDef("q_trend_slope", Some("""
      WITH d AS (SELECT event_type,
              date_diff('day', DATE '2024-01-01', CAST(date_trunc('day', ts) AS DATE)) AS x,
              count(*) AS y
            FROM events GROUP BY 1, 2),
      s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
              CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x * y) AS BIGINT) AS sxy,
              CAST(sum(x * x) AS BIGINT) AS sxx
            FROM d GROUP BY 1)
      SELECT event_type, n, n * sxy - sx * sy AS slope_num, n * sxx - sx * sx AS slope_den
      FROM s ORDER BY event_type"""),
      (s, d) => {
        val daily = t(s, d, "events")
          .groupBy(col("event_type"),
            datediff(date_trunc("day", col("ts")).cast("date"),
              lit("2024-01-01").cast("date")).cast("long").as("x"))
          .agg(count(lit(1)).as("y"))
        daily.groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
            sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
          .select(col("event_type"), col("n"),
            (col("n") * col("sxy") - col("sx") * col("sy")).as("slope_num"),
            (col("n") * col("sxx") - col("sx") * col("sx")).as("slope_den"))
          .orderBy("event_type")
      }),

    // SHIPPING-DELAY PROFILE per order priority: mean (exact milli)
    // plus exact discrete p50/p90 of order-date→ship-date days — the
    // SLA distribution readout (q_order_aging counts the open
    // backlog; this profiles fulfillment latency on shipped lines).
    // Percentiles are q_pctl_disc_group's selection-not-interpolation
    // order statistics (rank = ceil(q·n) via row_number — values the
    // data contains). Synthetic delays go NEGATIVE, so the mean runs
    // over +3000-shifted days and un-shifts after: every div stays on
    // non-negatives, where DuckDB's floor-`//` equals Spark's
    // truncating `div` (the cross-engine trap class documented at
    // q_embed_class_margin). One orders-broadcast join, one
    // priority-keyed window shuffle, dim-sized output.
    QDef("q_ship_delay_profile", Some("""
      WITH dly AS (SELECT o.o_orderpriority AS priority,
          CAST(date_diff('day', o.o_orderdate, l.l_shipdate) AS BIGINT) AS delay_days
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
      r AS (SELECT priority, delay_days,
          row_number() OVER (PARTITION BY priority ORDER BY delay_days) AS rn,
          count(*) OVER (PARTITION BY priority) AS n FROM dly)
      SELECT priority, CAST(max(n) AS BIGINT) AS n,
        (1000 * CAST(sum(delay_days + 3000) AS BIGINT)) // max(n) - 3000000 AS mean_milli,
        max(CASE WHEN rn = (n+1)//2 THEN delay_days END) AS p50,
        max(CASE WHEN rn = (9*n+9)//10 THEN delay_days END) AS p90
      FROM r GROUP BY priority ORDER BY priority"""),
      (s, d) => {
        val dly = t(s, d, "lineitem").select(col("l_orderkey"), col("l_shipdate"))
          .join(t(s, d, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority"),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("o_orderpriority").as("priority"),
            datediff(col("l_shipdate"), col("o_orderdate")).cast("long").as("delay_days"))
        val w = Window.partitionBy("priority").orderBy("delay_days")
        val wn = Window.partitionBy("priority")
        dly
          .withColumn("rn", row_number().over(w))
          .withColumn("n", count(lit(1)).over(wn))
          .groupBy("priority")
          .agg(max("n").cast("long").as("n_out"),
            sum(col("delay_days") + lit(3000L)).cast("long").as("sum_sh"),
            max(when(col("rn") === expr("(n+1) div 2"), col("delay_days"))).as("p50"),
            max(when(col("rn") === expr("(9*n+9) div 10"), col("delay_days"))).as("p90"))
          .select(col("priority"), col("n_out").as("n"),
            (expr("div(1000 * sum_sh, n_out)") - lit(3000000L)).as("mean_milli"),
            col("p50"), col("p90"))
          .orderBy("priority")
      }),

    // DEGREE DISTRIBUTION: log2-banded degree histogram of BOTH
    // sides of the part↔supplier bipartite graph (the power-law
    // fingerprint that decides whether the pair-expansion operators
    // need their HubCap at all — a heavy tail here is the early
    // warning). Born-integer banding: no float log2 crosses the
    // oracle — band b covers [2^b, 2^(b+1)) via a STATIC 41-row
    // shift table that broadcasts into a range join (41-row BNLJ,
    // each degree hits exactly one band). Degrees are one
    // countDistinct per side off the same fact scan; everything
    // after is |nodes|-sized.
    QDef("q_degree_distribution", Some("""
      WITH deg AS (
        SELECT 'part' AS side, l_partkey AS node,
               count(DISTINCT l_suppkey) AS deg
        FROM lineitem GROUP BY 1, 2
        UNION ALL
        SELECT 'supplier' AS side, l_suppkey AS node,
               count(DISTINCT l_partkey) AS deg
        FROM lineitem GROUP BY 1, 2),
      bands AS (SELECT b, (CAST(1 AS BIGINT) << b) AS lo,
                       (CAST(1 AS BIGINT) << (b + 1)) AS hi
                FROM range(0, 41) t(b))
      SELECT d.side, CAST(bd.b AS BIGINT) AS band,
             CAST(count(*) AS BIGINT) AS n_nodes,
             CAST(min(d.deg) AS BIGINT) AS min_deg,
             CAST(max(d.deg) AS BIGINT) AS max_deg
      FROM deg d JOIN bands bd ON d.deg >= bd.lo AND d.deg < bd.hi
      GROUP BY 1, 2 ORDER BY side, band"""),
      (s, d) => {
        val li = t(s, d, "lineitem").select("l_partkey", "l_suppkey")
        val deg = li.groupBy(col("l_partkey").as("node"))
          .agg(countDistinct("l_suppkey").as("deg"))
          .select(lit("part").as("side"), col("node"), col("deg"))
          .unionByName(
            li.groupBy(col("l_suppkey").as("node"))
              .agg(countDistinct("l_partkey").as("deg"))
              .select(lit("supplier").as("side"), col("node"), col("deg")))
        val bands = s.range(0, 41).select(col("id").as("b"),
          expr("shiftleft(cast(1 as bigint), cast(id as int))").as("lo"),
          expr("shiftleft(cast(1 as bigint), cast(id + 1 as int))").as("hi"))
        deg.join(broadcast(bands), col("deg") >= col("lo") && col("deg") < col("hi"))
          .groupBy(col("side"), col("b").as("band"))
          .agg(count(lit(1)).as("n_nodes"),
            min("deg").cast("long").as("min_deg"),
            max("deg").cast("long").as("max_deg"))
          .orderBy("side", "band")
      }),

    // HITS HUB/AUTHORITY (Kleinberg): two unrolled power iterations
    // over the part↔supplier bipartite graph — authorities (parts)
    // accumulate hub mass, hubs (suppliers) accumulate authority
    // mass, each step max-normalized to milli fixed point so every
    // score is an exact BIGINT (the q_pagerank_iter discipline: no
    // driver loop, no float). The per-step max is a 1-row broadcast;
    // every spread joins the edge list co-partitioned on its key, so
    // an iteration costs two hash exchanges regardless of graph
    // size. Directionality is what PageRank on the undirected
    // mirror can't express: a supplier serving many strong parts
    // ranks high as a HUB even if no part "links back".
    QDef("q_hits_scores", Some("""
      WITH edges AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem),
      a1 AS (SELECT p, 1000 * count(*) AS a FROM edges GROUP BY 1),
      a1n AS (SELECT p, (1000 * a) // (SELECT max(a) FROM a1) AS a FROM a1),
      h1 AS (SELECT e.s, sum(a1n.a) AS h FROM edges e JOIN a1n ON e.p = a1n.p GROUP BY 1),
      h1n AS (SELECT s, (1000 * h) // (SELECT max(h) FROM h1) AS h FROM h1),
      a2 AS (SELECT e.p, sum(h1n.h) AS a FROM edges e JOIN h1n ON e.s = h1n.s GROUP BY 1),
      a2n AS (SELECT p, (1000 * a) // (SELECT max(a) FROM a2) AS a FROM a2)
      SELECT 'part' AS side, p AS node, CAST(a AS BIGINT) AS score_milli FROM a2n
      UNION ALL SELECT 'supplier', s, CAST(h AS BIGINT) FROM h1n
      ORDER BY side, node"""),
      (s, d) => {
        val edges = t(s, d, "lineitem")
          .select(col("l_partkey").as("p"), col("l_suppkey").as("sk")).distinct()
        def normed(df: org.apache.spark.sql.DataFrame, v: String) =
          df.crossJoin(broadcast(df.agg(max(v).as("mx"))))
            .select(df.columns.filter(_ != v).map(col) :+
              expr(s"div(1000 * $v, mx)").as(v): _*)
        val a1 = edges.groupBy("p").agg((count(lit(1)) * 1000L).as("a"))
        val a1n = normed(a1, "a")
        val h1 = edges.join(a1n, "p").groupBy("sk").agg(sum("a").as("h"))
        val h1n = normed(h1, "h")
        val a2 = edges.join(h1n, "sk").groupBy("p").agg(sum("h").as("a"))
        val a2n = normed(a2, "a")
        a2n.select(lit("part").as("side"), col("p").as("node"),
            col("a").as("score_milli"))
          .unionByName(h1n.select(lit("supplier").as("side"),
            col("sk").as("node"), col("h").as("score_milli")))
          .orderBy("side", "node")
      }),

    // BUTTERFLY CENSUS (bipartite 4-cycles): Σ over supplier pairs
    // C(common_parts, 2) — the bipartite analogue of the triangle
    // count (q_triangle_support's cohesion primitive needs a
    // one-mode graph; butterflies measure cohesion ON the bipartite
    // structure directly, no projection loss). Pairs materialize
    // only through the part equi-join, so the expansion is
    // Σ_part C(deg,2) — bounded by per-part supplier counts (the
    // q_cosupplier_degree discipline; a hub-capped slice bounds it
    // at adversarial scale). C(c,2) = c·(c−1) div 2 is an even
    // product — exact non-negative integer division. ONE summary
    // row.
    QDef("q_butterfly_count", Some("""
      WITH e AS (SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem),
      pr AS (SELECT a.s AS sa, b.s AS sb, CAST(count(*) AS BIGINT) AS c
             FROM e a JOIN e b ON a.p = b.p AND a.s < b.s GROUP BY 1, 2)
      SELECT CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(sum(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_pairs_multi,
             CAST(sum((c * (c - 1)) // 2) AS BIGINT) AS n_butterflies,
             CAST(max(c) AS BIGINT) AS max_common
      FROM pr"""),
      (s, d) => {
        // r17 OPT (guide §2.4 / the q_cosupplier_degree discipline):
        // the old part-keyed SELF-JOIN evaluated the distinct edge
        // subtree twice — the two renamed sides canonicalize
        // differently, so AQE stage reuse never fired (final plan:
        // 4 scans, 0 ReusedExchange) and the corpus was scanned +
        // deduped twice. One collect_set per part now generates the
        // same Σ_p C(deg,2) pair mass by an in-row double explode —
        // no join anywhere, one distinct-edge aggregation. The sorted
        // set is sliced to HubCap (identity at every tested SF — max
        // part degree 52 at sf0.1 — same cap + rationale as
        // q_cosupplier_degree for the adversarial hub part).
        val sets = t(s, d, "lineitem")
          .groupBy(col("l_partkey"))
          .agg(slice(sort_array(collect_set(col("l_suppkey"))), 1, HubCap).as("ss"))
          .filter(size(col("ss")) > 1)
        sets.select(explode(col("ss")).as("sa"), col("ss"))
          .select(col("sa"), explode(col("ss")).as("sb"))
          .filter(col("sa") < col("sb"))
          .groupBy("sa", "sb").agg(count(lit(1)).as("c"))
          .agg(count(lit(1)).as("n_pairs"),
            sum(when(col("c") >= 2, 1L).otherwise(0L)).cast("long")
              .as("n_pairs_multi"),
            sum(expr("div(c * (c - 1), 2)")).cast("long").as("n_butterflies"),
            max("c").cast("long").as("max_common"))
      }),

    // WEISFEILER–LEHMAN refinement (1 round): each supplier's WL
    // label after one neighborhood-aggregation step on the
    // supplier↔part graph — md5 of (own degree | sorted neighbor-
    // degree HISTOGRAM). Two suppliers get the same wl_hash iff
    // their 1-hop neighborhoods are degree-isomorphic: the
    // structural-role fingerprint (graph-kernel / graph-embedding
    // primitive) that plain degree (q_degree_distribution) can't
    // see. The HISTOGRAM form — (degree, count) pairs, not the raw
    // neighbor multiset — is the 100 TB decision: per-node state is
    // |distinct neighbor degrees|, never |neighbors|, so hub nodes
    // cost the same as leaves. Canonical string via ordered
    // aggregation on both engines (ties are equal strings — order
    // among them cannot change the output). Degrees are dim-sized
    // broadcast joins off one distinct edge projection.
    QDef("q_wl_refine", Some("""
      WITH e AS (SELECT DISTINCT l_suppkey AS sk, l_partkey AS pk FROM lineitem),
      sdeg AS (SELECT sk, CAST(count(*) AS BIGINT) AS sd FROM e GROUP BY 1),
      pdeg AS (SELECT pk, CAST(count(*) AS BIGINT) AS pd FROM e GROUP BY 1),
      nh AS (SELECT e.sk, pdeg.pd, CAST(count(*) AS BIGINT) AS c
             FROM e JOIN pdeg ON e.pk = pdeg.pk GROUP BY 1, 2),
      wl AS (SELECT nh.sk,
               string_agg(nh.pd || ':' || nh.c, ',' ORDER BY nh.pd) AS sig
             FROM nh GROUP BY 1)
      SELECT wl.sk AS s_suppkey, sdeg.sd AS degree,
             substr(md5(sdeg.sd || '|' || wl.sig), 1, 16) AS wl_hash
      FROM wl JOIN sdeg ON wl.sk = sdeg.sk ORDER BY s_suppkey"""),
      (s, d) => {
        // r17 OPT: (1) the supplier degree is the HISTOGRAM's own mass
        // — sd = Σ_pd c — so the third edge pass (sdeg) and the final
        // shuffle join that attached it are gone; (2) isNotNull bake
        // (q_jsd_sources discipline) so pdeg's copy of the edge
        // subtree — decorated with isnotnull(pk) by its join — stays
        // canonically identical to the probe's copy and the distinct
        // stage is reused, not re-run.
        val e = t(s, d, "lineitem")
          .select(col("l_suppkey").as("sk"), col("l_partkey").as("pk"))
          .filter(col("sk").isNotNull && col("pk").isNotNull)
          .distinct()
        val pdeg = e.groupBy("pk").agg(count(lit(1)).as("pd"))
        val nh = e.join(broadcast(pdeg), "pk").groupBy("sk", "pd")
          .agg(count(lit(1)).as("c"))
        nh.groupBy("sk")
          .agg(array_sort(collect_list(struct(col("pd"), col("c")))).as("a"),
            sum("c").cast("long").as("sd"))
          .select(col("sk"), col("sd"),
            expr("array_join(transform(a, x -> concat(cast(x.pd as string), ':', " +
              "cast(x.c as string))), ',')").as("sig"))
          .select(col("sk").as("s_suppkey"), col("sd").as("degree"),
            substring(md5(concat(col("sd").cast("string"), lit("|"), col("sig"))),
              1, 16).as("wl_hash"))
          .orderBy("s_suppkey")
      }),

    // Bipartite (kc,ks)-core peeling — two unrolled rounds of the
    // classic k-core refinement on the customer×part purchase graph
    // (sparse on both sides, unlike customer×supplier which is
    // near-complete and peels all-or-nothing):
    // drop nodes below their side's degree threshold, recompute
    // degrees on the surviving subgraph, drop again, report the
    // surviving degree histogram. Thresholds are the P25 degree of
    // each side (two 1-row broadcast scalars), so the query is
    // scale-adaptive — no constant tuned to one SF. Round 2 exists
    // because peeling CASCADES across sides: removing weak customers
    // lowers supplier degrees, which removes suppliers, which lowers
    // customer degrees. Every stage is a keyed agg or an equi-join
    // against a degree table (dim-sized → broadcast); the edge list
    // is the distinct projection of one fact scan. Matches the
    // unrolled-iteration discipline of q_pagerank_iter/q_hits_scores
    // (fixed rounds, oracle mirrors the same unrolling).
    QDef("q_kcore_peel", Some("""
      WITH e AS (SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS s
                 FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
      kc AS (SELECT CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY dc)
                      AS BIGINT) AS kcv
             FROM (SELECT count(*) AS dc FROM e GROUP BY c)),
      ks AS (SELECT CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY ds)
                      AS BIGINT) AS ksv
             FROM (SELECT count(*) AS ds FROM e GROUP BY s)),
      d1c AS (SELECT c, count(*) AS dc FROM e GROUP BY c),
      d1s AS (SELECT s, count(*) AS ds FROM e GROUP BY s),
      e1 AS (SELECT e.c, e.s FROM e
             JOIN d1c USING (c) JOIN d1s USING (s) CROSS JOIN kc CROSS JOIN ks
             WHERE dc >= kcv AND ds >= ksv),
      d2c AS (SELECT c, count(*) AS dc FROM e1 GROUP BY c),
      d2s AS (SELECT s, count(*) AS ds FROM e1 GROUP BY s),
      e2 AS (SELECT e1.c, e1.s FROM e1
             JOIN d2c USING (c) JOIN d2s USING (s) CROSS JOIN kc CROSS JOIN ks
             WHERE dc >= kcv AND ds >= ksv)
      SELECT side, degree, CAST(count(*) AS BIGINT) AS n_nodes FROM (
        SELECT 'customer' AS side, CAST(count(*) AS BIGINT) AS degree
        FROM e2 GROUP BY c
        UNION ALL
        SELECT 'part' AS side, CAST(count(*) AS BIGINT) AS degree
        FROM e2 GROUP BY s)
      GROUP BY 1, 2 ORDER BY side, degree"""),
      (s, d) => {
        // the edge list feeds six aggregates; an explicit persist()
        // measured SLOWER than Catalyst's own exchange reuse here
        // (the distinct's shuffle is reused across the degree passes)
        val e = t(s, d, "orders").select("o_orderkey", "o_custkey")
          .join(t(s, d, "lineitem").select("l_orderkey", "l_partkey"),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("o_custkey").as("c"), col("l_partkey").as("ss"))
          .distinct()
        def deg(edges: org.apache.spark.sql.DataFrame, key: String, as: String) =
          edges.groupBy(key).agg(count(lit(1)).as(as))
        val kc = deg(e, "c", "dc")
          .agg(expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY dc)")).toDF("m")
          .select(col("m").cast("long").as("kcv"))
        val ks = deg(e, "ss", "ds")
          .agg(expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY ds)")).toDF("m")
          .select(col("m").cast("long").as("ksv"))
        def peel(edges: org.apache.spark.sql.DataFrame) =
          edges
            .join(broadcast(deg(edges, "c", "dc")), Seq("c"))
            .join(broadcast(deg(edges, "ss", "ds")), Seq("ss"))
            .crossJoin(broadcast(kc)).crossJoin(broadcast(ks))
            .filter(col("dc") >= col("kcv") && col("ds") >= col("ksv"))
            .select("c", "ss")
        val e2 = peel(peel(e))
        deg(e2, "c", "degc")
          .select(lit("customer").as("side"), col("degc").cast("long").as("degree"))
          .unionByName(deg(e2, "ss", "degs")
            .select(lit("part").as("side"), col("degs").cast("long").as("degree")))
          .groupBy("side", "degree")
          .agg(count(lit(1)).as("n_nodes"))
          .orderBy("side", "degree")
      }),

    // Degree ASSORTATIVITY of the customer×part purchase graph —
    // Pearson correlation of endpoint degrees over the EDGE list
    // (negative = hubs attach to leaves, the usual retail shape):
    // the exact integer moment sums (n, Σ, Σ², Σxy over edges) ship
    // with corr_milli floored from the shared IEEE value —
    // q_corr_exact's discipline on a graph statistic. Degrees join
    // back as two dim-sized broadcasts onto one pass of the edge
    // list; n·Σxy stays in BIGINT while edges·deg² < 1e18 (shard
    // the moment pass beyond that).
    QDef("q_assortativity", Some("""
      WITH e AS (SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
                 FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
      dc AS (SELECT c, CAST(count(*) AS BIGINT) AS x FROM e GROUP BY c),
      dp AS (SELECT p, CAST(count(*) AS BIGINT) AS y FROM e GROUP BY p),
      m AS (SELECT CAST(count(*) AS BIGINT) AS n,
              CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
              CAST(sum(x * y) AS BIGINT) AS sxy,
              CAST(sum(x * x) AS BIGINT) AS sxx,
              CAST(sum(y * y) AS BIGINT) AS syy
            FROM e JOIN dc USING (c) JOIN dp USING (p))
      SELECT n, sx, sy, sxy, sxx, syy,
             CAST(CASE WHEN n * sxx - sx * sx <= 0 OR n * syy - sy * sy <= 0
                       THEN 0
                  ELSE floor(1000.0 * (n * sxy - sx * sy) /
                        sqrt(CAST(n * sxx - sx * sx AS DOUBLE) *
                             CAST(n * syy - sy * sy AS DOUBLE)))
                  END AS BIGINT) AS assortativity_milli
      FROM m"""),
      (s, d) => {
        // isNotNull bake (r17 OPT, q_jsd_sources discipline): dc's and
        // dp's joins push isnotnull(c) / isnotnull(p) respectively
        // into THEIR copies of this subtree, so the three copies
        // canonicalized differently and the join+distinct ran three
        // times (final plan: 6 scans, 0 ReusedExchange). Baking both
        // (vacuous on inner-join keys that the moment pass joins on
        // anyway) makes the copies identical → one edge stage, two
        // ReusedExchange.
        val e = t(s, d, "orders").select("o_orderkey", "o_custkey")
          .join(t(s, d, "lineitem").select("l_orderkey", "l_partkey"),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("o_custkey").as("c"), col("l_partkey").as("p"))
          .filter(col("c").isNotNull && col("p").isNotNull)
          .distinct()
        val dc = e.groupBy("c").agg(count(lit(1)).as("x"))
        val dp = e.groupBy("p").agg(count(lit(1)).as("y"))
        e.join(broadcast(dc), Seq("c")).join(broadcast(dp), Seq("p"))
          .agg(count(lit(1)).as("n"), sum("x").cast("long").as("sx"),
            sum("y").cast("long").as("sy"),
            sum(col("x") * col("y")).cast("long").as("sxy"),
            sum(col("x") * col("x")).cast("long").as("sxx"),
            sum(col("y") * col("y")).cast("long").as("syy"))
          .withColumn("assortativity_milli",
            when(col("n") * col("sxx") - col("sx") * col("sx") <= 0 ||
                 col("n") * col("syy") - col("sy") * col("sy") <= 0, 0L)
              .otherwise(floor(lit(1000.0) *
                (col("n") * col("sxy") - col("sx") * col("sy")) /
                sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
                  .cast("double") *
                  (col("n") * col("syy") - col("sy") * col("sy"))
                    .cast("double"))))
              .cast("long"))
      }),

    // HERFINDAHL–HIRSCHMAN concentration index of supplier revenue
    // within each nation — the canonical market-concentration
    // scalar (q_supplier_concentration reports top-3 share; HHI
    // weights EVERY share quadratically): hhi_ppm = Σ share_ppm² /
    // 1e6 on floored integer shares, plus the equivalent-competitor
    // count 1e6 // hhi. Supplier-grain aggregate → nation-grain
    // rollup — dim-sized after the one fact scan.
    QDef("q_hhi_concentration", Some("""
      WITH rev AS (SELECT s.s_nationkey AS nk, l.l_suppkey AS sk,
              CAST(sum(CAST(floor(l.l_extendedprice * 100.0 + 0.5) AS BIGINT))
                AS BIGINT) AS r
            FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
            GROUP BY 1, 2),
      tot AS (SELECT nk, CAST(sum(r) AS BIGINT) AS tr FROM rev GROUP BY 1),
      sh AS (SELECT rev.nk, (1000000 * rev.r) // tot.tr AS share_ppm
             FROM rev JOIN tot USING (nk))
      SELECT CAST(nk AS BIGINT) AS nationkey,
             CAST(count(*) AS BIGINT) AS n_suppliers,
             CAST(sum(share_ppm * share_ppm) // 1000000 AS BIGINT) AS hhi_ppm,
             CAST(1000000 // (sum(share_ppm * share_ppm) // 1000000) AS BIGINT)
               AS equivalent_n
      FROM sh GROUP BY 1 ORDER BY nationkey"""),
      (s, d) => {
        val rev = t(s, d, "lineitem").select("l_suppkey", "l_extendedprice")
          .join(broadcast(t(s, d, "supplier").select("s_suppkey", "s_nationkey")),
            col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("s_nationkey").as("nk"), col("l_suppkey").as("sk"))
          .agg(sum(floor(col("l_extendedprice") * lit(100.0) + lit(0.5))
            .cast("long")).cast("long").as("r"))
        val tot = rev.groupBy("nk").agg(sum("r").cast("long").as("tr"))
        rev.join(broadcast(tot), Seq("nk"))
          .select(col("nk"), expr("div(1000000 * r, tr)").as("share_ppm"))
          .groupBy("nk")
          .agg(count(lit(1)).as("n_suppliers"),
            expr("div(sum(share_ppm * share_ppm), 1000000)").cast("long")
              .as("hhi_ppm"))
          .select(col("nk").cast("long").as("nationkey"), col("n_suppliers"),
            col("hhi_ppm"),
            expr("div(1000000, hhi_ppm)").cast("long").as("equivalent_n"))
          .orderBy("nationkey")
      })
  )
}
