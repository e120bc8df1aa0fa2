package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.pipeline.Tables.t
import graft.text.{NearDup, TextAnalysis => TA}

/** Reporting / corpus-analytics operators that round out the engine's
  * relational surface beyond SURVEY.md §2's reference inventory:
  * pivoted crosstabs, rollup subtotals, window frames (running /
  * moving sums, lag deltas), two-pass z-score outlier detection, and
  * the text-corpus analyses a training-data curator runs before
  * mixing (TF-IDF keywords, bigram collocation PMI, inverted index,
  * stride-overlap context chunking). All built-in expression trees —
  * no UDFs — so everything stays inside whole-stage codegen.
  */
object AnalyticsQueries {

  /** doc → non-blank token list CTE (DuckDB mirror of
    * TextAnalysis.tokens — the ONE tokenization). */
  private val toksCte =
    """d AS (SELECT doc_id,
      |  list_filter(string_split(text, ' '), t -> t <> '') AS toks FROM documents)""".stripMargin

  private val eventTypes = Seq("click", "error", "purchase", "signup", "view")

  val all: Seq[QDef] = Seq(

    // PIVOT crosstab: per-user event-type counts as fixed columns
    // (the reference's per-contact activity summary rendered wide,
    // run_ac_extraction.py:1429-1474 renders the same rollup as
    // text). Pivot values are DECLARED, not discovered — a discovery
    // pass over 100 TB just to learn the column set is a full extra
    // scan, and an unbounded pivot is an unbounded schema. Shape: one
    // hash aggregate on user_id with map-side partials; the pivot
    // becomes a fixed-width conditional-count projection.
    QDef("q_pivot_event_counts", Some(s"""
      SELECT user_id,
        ${eventTypes.map(ty => s"count(*) FILTER (WHERE event_type = '$ty') AS \"$ty\"").mkString(",\n        ")}
      FROM events GROUP BY user_id ORDER BY user_id"""),
      (s, d) => t(s, d, "events")
        .groupBy("user_id")
        .pivot("event_type", eventTypes)
        .agg(count(lit(1)))
        .select(col("user_id") +: eventTypes.map(ty => coalesce(col(ty), lit(0L)).as(ty)): _*)
        .orderBy("user_id")),

    // ROLLUP subtotals: revenue by (returnflag, linestatus) with
    // per-flag subtotals and a grand total in ONE pass — the
    // hand-written "totals row" loops a report builder writes around
    // pandas groupbys collapse into a single grouping-sets aggregate.
    // Rollup NULL markers are projected to '(all)' sentinels (the
    // grouping keys are never null in the lake, so the sentinel is
    // unambiguous). Sums in DECIMAL, rendered as strings (Spark
    // widens to DECIMAL(22,2), DuckDB to (38,2) — same digits).
    QDef("q_rollup_pricing", Some("""
      SELECT coalesce(l_returnflag, '(all)') AS flag,
             coalesce(l_linestatus, '(all)') AS status,
             count(*) AS n,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS sum_price
      FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
      ORDER BY flag, status"""),
      (s, d) => t(s, d, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"),
          sum(col("l_extendedprice").cast("decimal(12,2)")).cast("string").as("sum_price"))
        .select(coalesce(col("l_returnflag"), lit("(all)")).as("flag"),
          coalesce(col("l_linestatus"), lit("(all)")).as("status"),
          col("n"), col("sum_price"))
        .orderBy("flag", "status")),

    // WINDOW FRAMES: per-user running total + 3-row moving sum over
    // the event timeline — the cumulative-engagement curve the
    // reference renders per contact. One shuffle on user_id serves
    // BOTH frames (same partition+order ⇒ one Window exec, one sort).
    // Frame sums in DECIMAL: a running double sum is order-dependent
    // in the last ulp; decimal is exact, so the hash compare is too.
    QDef("q_running_total", Some("""
      SELECT user_id, event_id,
        CAST(sum(CAST(value AS DECIMAL(12,2))) OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS VARCHAR) AS run_total,
        CAST(sum(CAST(value AS DECIMAL(12,2))) OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS VARCHAR) AS moving3
      FROM events ORDER BY user_id, event_id"""),
      (s, d) => {
        val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val dec = col("value").cast("decimal(12,2)")
        t(s, d, "events").select(col("user_id"), col("event_id"),
          sum(dec).over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("string").as("run_total"),
          sum(dec).over(byUser.rowsBetween(-2, 0)).cast("string").as("moving3"))
          .orderBy("user_id", "event_id")
      }),

    // LAG delta: microseconds since the user's previous event (first
    // event per user ⇒ NULL) — inter-event gaps feed the session
    // analysis q_window_session bins. Integer epoch arithmetic: no
    // float, no timezone rendering. Same single-shuffle Window shape.
    QDef("q_event_gap_lag", Some("""
      SELECT user_id, event_id,
        epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events ORDER BY user_id, event_id"""),
      (s, d) => {
        val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
        t(s, d, "events").select(col("user_id"), col("event_id"),
          (unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(byUser)).as("gap_us"))
          .orderBy("user_id", "event_id")
      }),

    // Z-SCORE outliers, two-pass: per-type (n, Σv, Σv²) in exact
    // DECIMAL, broadcast the tiny stats table back onto the stream,
    // flag |z| > 2.5. The sums are exact ⇒ mean/var/z are the same
    // IEEE doubles in any aggregation order on any cluster — a
    // double stddev_pop would be partition-order-dependent. 100 TB
    // shape: one map-side-combined aggregate over the fact + one
    // broadcast join; the fact is never shuffled.
    QDef("q_zscore_outliers", Some("""
      WITH st AS (SELECT event_type, count(*) AS n,
          sum(CAST(value AS DECIMAL(12,2))) AS sv,
          sum(CAST(value AS DECIMAL(12,2)) * CAST(value AS DECIMAL(12,2))) AS svv
        FROM events GROUP BY event_type),
      j AS (SELECT e.event_id, e.event_type, e.value,
          CAST(sv AS DOUBLE)/n AS mean,
          CAST(svv AS DOUBLE)/n - (CAST(sv AS DOUBLE)/n)*(CAST(sv AS DOUBLE)/n) AS variance
        FROM events e JOIN st USING (event_type))
      SELECT event_id, event_type,
        CAST((value-mean)/sqrt(greatest(variance, 0.0)) AS DECIMAL(10,3)) AS z
      FROM j WHERE abs((value-mean)/sqrt(greatest(variance, 0.0))) > 2.5
      ORDER BY event_id"""),
      (s, d) => {
        val dec = col("value").cast("decimal(12,2)")
        val ev = t(s, d, "events").select(col("event_id"), col("event_type"), col("value"))
        val stats = ev.groupBy("event_type").agg(
          count(lit(1)).as("n"), sum(dec).as("sv"), sum(dec * dec).as("svv"))
        val mean = col("sv").cast("double") / col("n")
        val z = (col("value") - col("mean")) / sqrt(greatest(col("variance"), lit(0.0)))
        ev.join(broadcast(stats), "event_type")
          .withColumn("mean", mean)
          .withColumn("variance",
            col("svv").cast("double") / col("n") - col("mean") * col("mean"))
          .filter(abs(z) > 2.5)
          .select(col("event_id"), col("event_type"), z.cast("decimal(10,3)").as("z"))
          .orderBy("event_id")
      }),

    // TF-IDF keywords: top-3 terms per doc. Ranking key is
    // (tf DESC, df ASC, term) — integer-deterministic and
    // order-equivalent to tf·idf at fixed tf (higher idf = lower df)
    // — so the float score never decides a rank; it is reported,
    // rounded to DECIMAL(12,4). Corpus size N arrives as a broadcast
    // 1-row cross join, NOT a driver collect. 100 TB: tf is one
    // shuffle on (doc, term); df one on term; the rank window
    // re-shuffles on doc_id — all uniform keys (stop-word skew lives
    // in df's TERM key only, where the combiner flattens it).
    QDef("q_tfidf_topk", Some(s"""
      WITH $toksCte,
      tk AS (SELECT doc_id, unnest(toks) AS term FROM d),
      tf AS (SELECT doc_id, term, count(*) AS tf FROM tk GROUP BY doc_id, term),
      dfr AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
      nd AS (SELECT count(*) AS n_docs FROM documents),
      sc AS (SELECT tf.doc_id, tf.term, tf.tf, dfr.df,
        CAST(tf.tf AS DOUBLE) * ln(CAST(n_docs AS DOUBLE)/dfr.df) AS score,
        row_number() OVER (PARTITION BY tf.doc_id ORDER BY tf.tf DESC, dfr.df ASC, tf.term) AS rnk
        FROM tf JOIN dfr USING (term) CROSS JOIN nd)
      SELECT doc_id, rnk, term, tf, df, CAST(score AS DECIMAL(12,4)) AS tfidf
      FROM sc WHERE rnk <= 3 ORDER BY doc_id, rnk"""),
      (s, d) => {
        val docs = t(s, d, "documents")
        val tk = docs.select(col("doc_id"), explode(TA.tokens(col("text"))).as("term"))
        val tf = tk.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        val dfr = tf.groupBy("term").agg(count(lit(1)).as("df"))
        val nd = docs.agg(count(lit(1)).as("n_docs"))
        val byDoc = Window.partitionBy("doc_id")
          .orderBy(col("tf").desc, col("df").asc, col("term").asc)
        tf.join(dfr, "term")
          .crossJoin(broadcast(nd))
          .withColumn("score",
            col("tf").cast("double") * log(col("n_docs").cast("double") / col("df")))
          .withColumn("rnk", row_number().over(byDoc))
          .filter(col("rnk") <= 3)
          .select(col("doc_id"), col("rnk"), col("term"), col("tf"), col("df"),
            col("score").cast("decimal(12,4)").as("tfidf"))
          .orderBy("doc_id", "rnk")
      }),

    // Bigram PMI collocations: top-50 adjacent pairs by count with
    // pointwise mutual information. Bigrams come from the ONE
    // shingle definition (NearDup.shingleExpr, n=2, non-distinct —
    // PMI needs occurrence counts, not doc membership). Unigram
    // counts join back by word — a shuffle join, NOT a broadcast:
    // a web-scale vocabulary (typos, numbers) does not reliably fit
    // an executor. PMI numerator/denominator are built left-to-right
    // identically on both engines so the doubles agree bitwise
    // before the DECIMAL round.
    QDef("q_bigram_pmi", Some(s"""
      WITH $toksCte,
      bi AS (SELECT unnest(list_transform(range(1, greatest(len(toks), 1)),
              i -> toks[i] || ' ' || toks[i+1])) AS bg FROM d),
      bc AS (SELECT bg, count(*) AS c_xy FROM bi GROUP BY bg),
      un AS (SELECT unnest(toks) AS w FROM d),
      uc AS (SELECT w, count(*) AS c_w FROM un GROUP BY w),
      tt AS (SELECT sum(c_xy) AS t_bi FROM bc),
      t1 AS (SELECT sum(c_w) AS t_uni FROM uc)
      SELECT bg, c_xy,
        CAST(ln((CAST(c_xy AS DOUBLE) * CAST(t_uni AS DOUBLE) * CAST(t_uni AS DOUBLE)) /
                (CAST(t_bi AS DOUBLE) * CAST(cx.c_w AS DOUBLE) * CAST(cy.c_w AS DOUBLE))) AS DECIMAL(12,4)) AS pmi
      FROM bc CROSS JOIN tt CROSS JOIN t1
      JOIN uc cx ON cx.w = split_part(bg, ' ', 1)
      JOIN uc cy ON cy.w = split_part(bg, ' ', 2)
      ORDER BY c_xy DESC, bg LIMIT 50"""),
      (s, d) => {
        val docs = t(s, d, "documents")
          .select(col("doc_id"), TA.tokens(col("text")).as("toks"))
        val bc = docs.select(explode(NearDup.shingleExpr("toks", 2)).as("bg"))
          .groupBy("bg").agg(count(lit(1)).as("c_xy"))
        val uc = docs.select(explode(col("toks")).as("w"))
          .groupBy("w").agg(count(lit(1)).as("c_w"))
        val tBi = bc.agg(sum(col("c_xy")).as("t_bi"))
        val tUni = uc.agg(sum(col("c_w")).as("t_uni"))
        val num = col("c_xy").cast("double") * col("t_uni").cast("double") * col("t_uni").cast("double")
        val den = col("t_bi").cast("double") * col("cx.c_w").cast("double") * col("cy.c_w").cast("double")
        bc.crossJoin(broadcast(tBi)).crossJoin(broadcast(tUni))
          .join(uc.as("cx"), col("cx.w") === split_part(col("bg"), lit(" "), lit(1)))
          .join(uc.as("cy"), col("cy.w") === split_part(col("bg"), lit(" "), lit(2)))
          .select(col("bg"), col("c_xy"), log(num / den).cast("decimal(12,4)").as("pmi"))
          .orderBy(col("c_xy").desc, col("bg").asc)
          .limit(50)
      }),

    // Inverted index: term → doc frequency + the first 10 postings.
    // The posting list is CAPPED BEFORE collection: rn ≤ 10 via a
    // row_number window, with the full doc count from a second frame
    // over the SAME partition key — one shuffle serves both windows
    // AND the final per-term aggregate (hash partitioning on term is
    // already satisfied), and no group ever materializes more than
    // 10 ids. A naive collect_list-then-slice holds a stop-word's
    // entire corpus-wide posting list in one aggregation buffer.
    QDef("q_inverted_index", Some(s"""
      WITH $toksCte,
      td AS (SELECT DISTINCT doc_id, unnest(toks) AS term FROM d)
      SELECT term, count(*) AS n_docs,
        array_to_string(list_slice(list_sort(list(doc_id)), 1, 10), ',') AS postings
      FROM td GROUP BY term ORDER BY term"""),
      (s, d) => {
        val td = t(s, d, "documents")
          .select(col("doc_id"), explode(TA.tokens(col("text"))).as("term"))
          .distinct()
        val byTerm = Window.partitionBy("term")
        td.select(col("term"), col("doc_id"),
            row_number().over(byTerm.orderBy("doc_id")).as("rn"),
            count(lit(1)).over(byTerm).as("n_docs"))
          .filter(col("rn") <= 10)
          .groupBy("term")
          .agg(max(col("n_docs")).as("n_docs"),
            expr("array_join(transform(array_sort(collect_list(doc_id)), x -> cast(x AS STRING)), ',')")
              .as("postings"))
          .orderBy("term")
      }),

    // Context-window chunking: split each doc's tokens into
    // 32-token windows with stride 24 (8-token overlap) — the
    // sequence-shaping step between cleaning and packing
    // (q_pack_sequences packs whole docs; chunking bounds single
    // long docs first). Pure per-row transform+explode: narrow, no
    // shuffle, fan-out ≈ n_tokens/stride per row. Chunk count
    // floor((n-1)/stride)+1 covers every token; the tail chunk may
    // be short but never empty.
    QDef("q_chunk_stride", Some(s"""
      WITH $toksCte,
      c AS (SELECT doc_id, unnest(range(0, ((greatest(len(toks), 1) - 1) // 24) + 1)) AS chunk_idx,
            toks FROM d)
      SELECT doc_id, chunk_idx,
        len(list_slice(toks, chunk_idx*24 + 1, chunk_idx*24 + 32)) AS n_toks,
        array_to_string(list_slice(toks, chunk_idx*24 + 1, chunk_idx*24 + 32), ' ') AS chunk
      FROM c ORDER BY doc_id, chunk_idx"""),
      (s, d) => t(s, d, "documents")
        .select(col("doc_id"), TA.tokens(col("text")).as("toks"))
        .select(col("doc_id"), expr(
          """explode(transform(
            |  sequence(cast(0 AS BIGINT), (greatest(size(toks), 1) - 1) div 24),
            |  i -> struct(i AS chunk_idx, slice(toks, i*24 + 1, 32) AS c)))""".stripMargin).as("e"))
        .select(col("doc_id"), col("e.chunk_idx").as("chunk_idx"),
          size(col("e.c")).as("n_toks"),
          concat_ws(" ", col("e.c")).as("chunk"))
        .orderBy("doc_id", "chunk_idx"))
  )
}
