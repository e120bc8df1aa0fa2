package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.pipeline.Tables.t
import graft.text.{NearDup, TextAnalysis => TA}

/** Training-data-pipeline text operators over `documents`
  * (TESTDATA.md): dedup (exact / MinHash+LSH / SimHash / Jaccard),
  * language-ID, quality scoring, token counting, fingerprinting.
  *
  * Sampling note: the synthetic corpus shares one 31-token vocabulary
  * across all docs, so near-dup candidate generation fires on a large
  * fraction of pairs; pair-producing queries therefore run on a
  * deterministic doc_id-mod sample to bound the quadratic term at any
  * scale factor (the operators themselves are corpus-size-agnostic —
  * see graft.text.NearDup scale notes).
  */
object TextQueries {

  /** doc → distinct tokens, shared CTE body (DuckDB side). */
  private[queries] val tokCte =
    """tok AS (SELECT DISTINCT doc_id, tok FROM
      |  (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents %s)
      |  WHERE tok <> '')""".stripMargin

  private[queries] def tokDf(s: org.apache.spark.sql.SparkSession, d: String,
                             sampleMod: Option[Int] = None,
                             pilot: Boolean = false) = {
    val base = t(s, d, "documents")
    val sampled = sampleMod.fold(base)(m => base.filter(col("doc_id") % m === 0))
    // pilot=true: the fixed-size prefix cap for calibration faces —
    // see NearDup.PilotDocCap for the Θ(N²)-by-the-data argument.
    val docs =
      if (pilot) sampled.filter(col("doc_id") < NearDup.PilotDocCap) else sampled
    docs.select(col("doc_id"), explode(TA.tokens(col("text"))).as("tok")).distinct()
  }

  // minhash signature SQL fragments (k columns), shared by 2 oracles
  private def sigSelect(k: Int, over: String): String =
    s"sig AS (SELECT doc_id, " +
      (0 until k).map(i => s"min(md5('$i|' || $over)) AS s$i").mkString(", ") +
      s" FROM ${if (over == "sh") "sh" else "tok"} GROUP BY doc_id)"

  private def bandsSql(k: Int, rows: Int): String =
    "bands AS (" + (0 until k / rows).map { b =>
      val cols = (b * rows until (b + 1) * rows).map(i => s"s$i").mkString(" || ")
      s"SELECT doc_id, $b AS band, md5($cols) AS bh FROM sig"
    }.mkString(" UNION ALL ") + ")"

  private val pairsSql =
    """SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
      |ORDER BY doc_a, doc_b""".stripMargin

  /** Rolling-min fingerprint CTEs (`d` → `w` → `fp(doc_id, fp_roll)`)
    * — the ONE copy of the canonical Rabin–Karp polynomial oracle
    * (same Base/Mod as the native RollingMinHash expression), shared
    * by the fingerprint and winnow-pair oracles so the two cannot
    * desync. `where` further restricts the documents scan. */
  private def rollingFpCtes(k: Int, where: String): String = {
    import graft.functions.RollingMinHash.{Base => B, Mod => M}
    val pows = (0 until k).map { j => // B^(k-1-j) mod M
      var r = 1L; (0 until (k - 1 - j)).foreach(_ => r = r * B % M); r
    }
    val terms = (0 until k).map(j =>
      s"CAST(ord(substr(text, CAST(i + $j AS INTEGER), 1)) AS BIGINT) * ${pows(j)}")
      .mkString(" + ")
    s"""d AS (SELECT doc_id, text, length(text) AS n FROM documents
       |           WHERE length(text) >= $k $where),
       |w AS (SELECT doc_id, text, unnest(range(1, n - $k + 2)) AS i FROM d),
       |fp AS (SELECT doc_id, min(($terms) % $M) AS fp_roll FROM w GROUP BY doc_id)""".stripMargin
  }

  /** 16-bit SimHash CTE body (`tok` → `{p}v` → `{p}sig`), name-
    * prefixed so a composite oracle can host it alongside the MinHash
    * `sig` CTE without a clash — the ONE copy of the vote/bit trees,
    * shared by the signature, candidate-pair, and method-agreement
    * oracles so none can desync. */
  private def simhashSigBody(p: String): String = {
    val v = "CAST(('0x' || substr(md5(tok), 1, 4)) AS INTEGER)"
    val votes = (0 until 16).map(j =>
      s"sum(CASE WHEN ($v >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS b$j").mkString(", ")
    val bits = (0 until 16).map(j =>
      s"CASE WHEN b$j > 0 THEN ${1L << j} ELSE 0 END").mkString(" + ")
    s"${p}v AS (SELECT doc_id, $votes FROM tok GROUP BY doc_id), " +
      s"${p}sig AS (SELECT doc_id, CAST($bits AS BIGINT) AS simhash16 FROM ${p}v)"
  }

  /** 16-bit SimHash CTEs (tok → votes → sig), shared by the signature
    * and candidate-pair oracles. */
  private def simhashSigCtes(where: String): String =
    s"WITH ${tokCte.format(where)}, ${simhashSigBody("")}"

  val all: Seq[QDef] = Seq(

    // Corpus vocabulary stats (the vocab-building pass of a training
    // pipeline): per-token document frequency + total occurrences,
    // top 20 by df with a deterministic token tie-break. One explode
    // + one agg; at 100 TB this is the canonical map-side-combined
    // wordcount shape (partial agg per partition before the shuffle).
    QDef("q_vocab_df", Some("""
      WITH occ AS (SELECT doc_id, tok FROM
        (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
        WHERE tok <> '')
      SELECT tok, count(DISTINCT doc_id) AS df, count(*) AS tf
      FROM occ GROUP BY tok ORDER BY df DESC, tok LIMIT 20"""),
      (s, d) => t(s, d, "documents")
        .select(col("doc_id"), explode(TA.tokens(col("text"))).as("tok"))
        .groupBy("tok")
        .agg(countDistinct(col("doc_id")).as("df"), count(lit(1)).as("tf"))
        .orderBy(col("df").desc, col("tok")).limit(20)),

    // TEXTRANK keyword extraction: 3 PageRank power iterations over
    // the weighted token-adjacency graph (Mihalcea & Tarau 2004) —
    // the engine's iterative-graph-algorithm-as-declarative-joins
    // shape, the same loop a link-graph quality score runs over a
    // web-crawl corpus before curation. All arithmetic is integer
    // micro-units with truncating division over non-negative operands
    // (truncation == floor there, so Spark `div` and DuckDB `//`
    // agree) — see graft.text.TextRank for the update rule and the
    // ReusedExchange scale notes (corpus tokenized ONCE per
    // execution, not once per iteration; pinned in ScalePlanSpec).
    // Oracle: the same three rounds unrolled as CTEs.
    QDef("q_textrank_keywords", Some {
      def c(k: Int, prev: String) = s"""
        c$k AS (SELECT dst, CAST(sum((w * pr) // s) AS BIGINT) AS m
               FROM ew JOIN st USING (src) JOIN $prev ON $prev.tok = ew.src GROUP BY dst),
        p$k AS (SELECT tok, CAST(150000 + (850 * COALESCE(m, 0)) // 1000 AS BIGINT) AS pr
               FROM n LEFT JOIN c$k ON c$k.dst = n.tok)"""
      s"""
      WITH d AS (SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks FROM documents),
      bg AS (SELECT unnest(list_transform(range(1, len(toks)),
               i -> {'u': toks[i], 'v': toks[i+1]})) AS p FROM d),
      e0 AS (SELECT p.u AS u, p.v AS v FROM bg WHERE p.u <> p.v),
      ed AS (SELECT u AS src, v AS dst FROM e0 UNION ALL SELECT v, u FROM e0),
      ew AS (SELECT src, dst, count(*) AS w FROM ed GROUP BY src, dst),
      st AS (SELECT src, CAST(sum(w) AS BIGINT) AS s FROM ew GROUP BY src),
      n AS (SELECT DISTINCT src AS tok FROM ew),
      p0 AS (SELECT tok, CAST(1000000 AS BIGINT) AS pr FROM n),
      ${c(1, "p0")},
      ${c(2, "p1")},
      ${c(3, "p2")}
      SELECT tok, pr AS pr_micro FROM p3 ORDER BY pr DESC, tok LIMIT 20"""
    },
      (s, d) => {
        val edges = graft.text.TextRank.adjacency(
          t(s, d, "documents"), col("text"))
        graft.text.TextRank.ranks(edges, iters = 3)
          .select(col("tok"), col("pr").as("pr_micro"))
          .orderBy(col("pr_micro").desc, col("tok")).limit(20)
      }),

    // VOCABULARY GROWTH curve (Heaps'-law corpus diversity audit):
    // per 100-doc bucket of the ingest order, how many tokens appear
    // for the FIRST time, plus the cumulative vocabulary — the
    // saturation signal that tells a crawl-curation pipeline when a
    // source stops contributing novelty. First-occurrence is a
    // map-side-combined min(doc_id) per token (never a sort of the
    // corpus); the only single-partition step is the running sum over
    // the BUCKET table, whose cardinality is |corpus|/100 — at 100 TB
    // that's still thousands of rows, not data-scale. Integer-exact.
    QDef("q_vocab_growth", Some("""
      WITH d AS (SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks FROM documents),
      occ AS (SELECT doc_id, unnest(toks) AS tok FROM d),
      ft AS (SELECT tok, min(doc_id) AS first_doc FROM occ GROUP BY tok),
      nb AS (SELECT first_doc // 100 AS bucket, CAST(count(*) AS BIGINT) AS new_tokens
             FROM ft GROUP BY 1),
      db AS (SELECT doc_id // 100 AS bucket, CAST(count(*) AS BIGINT) AS n_docs,
                    CAST(sum(len(toks)) AS BIGINT) AS n_occ FROM d GROUP BY 1)
      SELECT db.bucket, n_docs, n_occ, coalesce(new_tokens, 0) AS new_tokens,
             CAST(sum(coalesce(new_tokens, 0)) OVER (ORDER BY db.bucket) AS BIGINT) AS cum_vocab
      FROM db LEFT JOIN nb ON db.bucket = nb.bucket
      ORDER BY db.bucket"""),
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val docs = t(s, d, "documents")
          .select(col("doc_id"), TA.tokens(col("text")).as("toks"))
        val ft = docs.select(col("doc_id"), explode(col("toks")).as("tok"))
          .groupBy("tok").agg(min(col("doc_id")).as("first_doc"))
        val nb = ft.select(expr("div(first_doc, 100)").as("bucket"))
          .groupBy("bucket").agg(count(lit(1)).as("new_tokens"))
        val db = docs.select(expr("div(doc_id, 100)").as("bucket"),
            size(col("toks")).cast("long").as("nt"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n_docs"), sum(col("nt")).cast("long").as("n_occ"))
        val w = Window.orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        db.join(nb, Seq("bucket"), "left")
          .select(col("bucket"), col("n_docs"), col("n_occ"),
            coalesce(col("new_tokens"), lit(0L)).as("new_tokens"))
          .withColumn("cum_vocab", sum(col("new_tokens")).over(w).cast("long"))
          .orderBy("bucket")
      }),

    // Bigram-LM quality proxy (the KenLM-perplexity stand-in a
    // curation pipeline runs when no external LM is allowed): score
    // each doc by the MEAN CORPUS FREQUENCY of its bigrams, in milli
    // units — high = in-distribution phrasing, low = rare/garbled
    // sequences. Self-supervised (the corpus is its own LM), and
    // integer-exact end to end: counts are BIGINTs, the mean is one
    // truncating div over non-negative operands. Scale shape: the
    // bigram count table keys on the bigram (vocab² can't broadcast
    // at 100 TB) — instances shuffle-join counts on the bigram key,
    // then re-aggregate per doc: explode → map-side-combined count →
    // key join → doc agg, the same shape as tf-idf. Docs with <2
    // tokens keep score 0 via the left join (never a div-by-zero).
    QDef("q_doc_lm_score", Some("""
      WITH d AS (SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks FROM documents),
      bi AS (SELECT doc_id, unnest(list_transform(range(1, greatest(len(toks), 1)),
               i -> toks[i] || ' ' || toks[i+1])) AS bg FROM d),
      bc AS (SELECT bg, CAST(count(*) AS BIGINT) AS cnt FROM bi GROUP BY bg),
      ds AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
                    CAST(sum(cnt) AS BIGINT) AS sum_cnt
             FROM bi JOIN bc USING (bg) GROUP BY doc_id)
      SELECT d.doc_id, coalesce(n_bigrams, 0) AS n_bigrams,
             coalesce(sum_cnt, 0) AS sum_cnt,
             CASE WHEN coalesce(n_bigrams, 0) = 0 THEN 0
                  ELSE (1000 * sum_cnt) // n_bigrams END AS lm_score_milli
      FROM d LEFT JOIN ds USING (doc_id) ORDER BY doc_id"""),
      (s, d) => {
        val docs = t(s, d, "documents")
          .select(col("doc_id"), TA.tokens(col("text")).as("toks"))
        val bi = docs.select(col("doc_id"),
          explode(NearDup.shingleExpr("toks", 2)).as("bg"))
        val bc = bi.groupBy("bg").agg(count(lit(1)).as("cnt"))
        val ds = bi.join(bc, "bg").groupBy("doc_id")
          .agg(count(lit(1)).as("n_bigrams"), sum(col("cnt")).as("sum_cnt"))
        docs.select("doc_id").join(ds, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
            coalesce(col("sum_cnt"), lit(0L)).cast("long").as("sum_cnt"),
            when(coalesce(col("n_bigrams"), lit(0L)) === 0, lit(0L))
              .otherwise(expr("div(1000 * sum_cnt, n_bigrams)")).as("lm_score_milli"))
          .orderBy("doc_id")
      }),

    // Cross-SOURCE OVERLAP matrix (dataset contamination audit):
    // for every source pair, how many distinct word-3-grams they
    // share, plus the Jaccard permille over their shingle
    // vocabularies. One pass over distinct (source, shingle): the
    // sources sharing a shingle collect into a bounded set (≤ the
    // source count BY CONSTRUCTION — the cross-source analog of an
    // LSH bucket), pairs expand within the row, and a hash aggregate
    // counts per pair. No self-join: a shingle-keyed self-join would
    // evaluate the whole shingle pipeline twice. Totals broadcast
    // (one row per source).
    QDef("q_source_overlap", Some("""
      WITH d AS (SELECT source, doc_id,
        list_filter(string_split(text, ' '), t -> t <> '') AS toks FROM documents),
      sh AS (SELECT DISTINCT source, sh FROM
        (SELECT source, unnest(list_transform(range(1, greatest(len(toks) - 1, 1)),
                i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh FROM d)),
      tot AS (SELECT source, count(*) AS n FROM sh GROUP BY source),
      inter AS (SELECT a.source AS src_a, b.source AS src_b, count(*) AS i
                FROM sh a JOIN sh b ON a.sh = b.sh AND a.source < b.source
                GROUP BY src_a, src_b)
      SELECT src_a, src_b, CAST(i AS BIGINT) AS n_shared,
             (1000 * i) // (ta.n + tb.n - i) AS jac_permille
      FROM inter JOIN tot ta ON ta.source = src_a
                 JOIN tot tb ON tb.source = src_b
      ORDER BY src_a, src_b"""),
      (s, d) => {
        val sh = NearDup.shinglesN(
          t(s, d, "documents").withColumnRenamed("source", "src"),
          "src", "text", 3)
        val tot = sh.groupBy("src").agg(count(lit(1)).as("n"))
        val pairs = sh.groupBy("sh")
          .agg(array_sort(collect_set(col("src"))).as("_ss"))
          .filter(size(col("_ss")) > 1)
          .select(explode(expr(
            """flatten(transform(_ss, (x, i) ->
              |  transform(slice(_ss, i + 2, size(_ss) - i - 1), y ->
              |    struct(x AS src_a, y AS src_b))))""".stripMargin)).as("_p"))
          .groupBy(col("_p.src_a").as("src_a"), col("_p.src_b").as("src_b"))
          .agg(count(lit(1)).cast(LongType).as("n_shared"))
        pairs
          .join(broadcast(tot.toDF("src_a", "na")), Seq("src_a"))
          .join(broadcast(tot.toDF("src_b", "nb")), Seq("src_b"))
          .select(col("src_a"), col("src_b"), col("n_shared"),
            expr("div(1000 * n_shared, na + nb - n_shared)").as("jac_permille"))
          .orderBy("src_a", "src_b")
      }),

    // Per-source VOCABULARY health: token volume, distinct types,
    // hapax legomena (frequency-1 types within the source) and the
    // hapax share of the vocabulary — the classic "is this source
    // natural text or templated sludge" diagnostic (natural corpora
    // run ~40-60% hapax; templated ones near 0). Two map-side-
    // combined aggregates — (source, tok) counts, then per-source
    // rollup — no window, no distinct-explode shuffle beyond the
    // first aggregate's own. The permille's sum() is pinned to
    // BIGINT BEFORE the multiply: DuckDB's sum() returns HUGEINT,
    // and a HUGEINT-typed output column converts to float64 in
    // pandas-side readers (417.0 ≠ 417 — the r5–r7 hard-signal
    // divergence) while a BIGINT `//` BIGINT stays int64.
    QDef("q_vocab_hapax", Some("""
      WITH occ AS (SELECT source, tok FROM
        (SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents)
        WHERE tok <> ''),
      c AS (SELECT source, tok, count(*) AS n FROM occ GROUP BY source, tok)
      SELECT source,
             CAST(sum(n) AS BIGINT) AS n_tokens,
             count(*) AS n_types,
             CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
             (1000 * CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT))
               // count(*) AS hapax_permille
      FROM c GROUP BY source ORDER BY source"""),
      (s, d) => t(s, d, "documents")
        .select(col("source"), explode(TA.tokens(col("text"))).as("tok"))
        .groupBy("source", "tok").agg(count(lit(1)).as("n"))
        .groupBy("source")
        .agg(sum(col("n")).cast(LongType).as("n_tokens"),
          count(lit(1)).as("n_types"),
          sum(when(col("n") === 1, 1).otherwise(0)).cast(LongType).as("n_hapax"))
        .withColumn("hapax_permille", expr("div(1000 * n_hapax, n_types)"))
        .orderBy("source")),

    // Token counting: whitespace tokens + BPE-ish regex tokens.
    QDef("q_doc_token_stats", Some("""
      WITH d AS (SELECT doc_id, n_chars,
        list_filter(string_split(text, ' '), t -> t <> '') AS toks,
        CAST(len(regexp_extract_all(text, '[a-z]+')) AS BIGINT) AS n_regex_tokens
        FROM documents)
      SELECT doc_id, n_chars, CAST(len(toks) AS BIGINT) AS n_tokens,
             CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct, n_regex_tokens
      FROM d ORDER BY doc_id"""),
      (s, d) => t(s, d, "documents")
        .withColumn("toks", TA.tokens(col("text")))
        .select(col("doc_id"), col("n_chars"),
          size(col("toks")).cast(LongType).as("n_tokens"),
          size(array_distinct(col("toks"))).cast(LongType).as("n_distinct"),
          TA.regexTokenCount(col("text")).as("n_regex_tokens"))
        .orderBy("doc_id")),

    // Language-ID: marker-token n-gram heuristic (deterministic
    // argmax with fixed tie priority). The synthetic corpus shares
    // one vocabulary, so accuracy is not meaningful here — the
    // mechanics (score → argmax) are what's exercised.
    QDef("q_doc_lang_id", Some("""
      WITH d AS (SELECT doc_id, lang,
        list_filter(string_split(text, ' '), t -> t <> '') AS toks FROM documents),
      s AS (SELECT doc_id, lang,
        CAST(len(list_filter(toks, t -> t IN ('the', 'a', 'data'))) AS BIGINT) AS s_en,
        CAST(len(list_filter(toks, t -> t IN ('agg', 'merge', 'vector'))) AS BIGINT) AS s_es,
        CAST(len(list_filter(toks, t -> t IN ('scan', 'query', 'batch'))) AS BIGINT) AS s_fr
        FROM d)
      SELECT doc_id, lang AS actual_lang, s_en, s_es, s_fr,
             CASE WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
                  WHEN s_es >= s_fr THEN 'es' ELSE 'fr' END AS predicted_lang
      FROM s ORDER BY doc_id"""),
      (s, d) => {
        val base = t(s, d, "documents")
          .withColumn("toks", TA.tokens(col("text")))
          .select(col("doc_id"), col("lang").as("actual_lang"),
            TA.langScore(col("toks"), Seq("the", "a", "data")).as("s_en"),
            TA.langScore(col("toks"), Seq("agg", "merge", "vector")).as("s_es"),
            TA.langScore(col("toks"), Seq("scan", "query", "batch")).as("s_fr"))
        base.withColumn("predicted_lang",
          when(col("s_en") >= col("s_es") && col("s_en") >= col("s_fr"), "en")
            .when(col("s_es") >= col("s_fr"), "es").otherwise("fr"))
          .orderBy("doc_id")
      }),

    // Language-ID CONFUSION MATRIX: the q_doc_lang_id classifier
    // scored against the true lang column — per (actual, predicted)
    // cell counts and per-actual recall permille, the acceptance
    // gate a language filter runs before it decides a corpus's
    // language mix. Same narrow scoring projection, then one
    // dim-sized aggregate + a broadcast row-total join.
    QDef("q_lang_id_confusion", Some("""
      WITH d AS (SELECT doc_id, lang,
        list_filter(string_split(text, ' '), t -> t <> '') AS toks FROM documents),
      s AS (SELECT doc_id, lang,
        CAST(len(list_filter(toks, t -> t IN ('the', 'a', 'data'))) AS BIGINT) AS s_en,
        CAST(len(list_filter(toks, t -> t IN ('agg', 'merge', 'vector'))) AS BIGINT) AS s_es,
        CAST(len(list_filter(toks, t -> t IN ('scan', 'query', 'batch'))) AS BIGINT) AS s_fr
        FROM d),
      p AS (SELECT lang AS actual_lang,
             CASE WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
                  WHEN s_es >= s_fr THEN 'es' ELSE 'fr' END AS predicted_lang
            FROM s),
      c AS (SELECT actual_lang, predicted_lang, count(*) AS n FROM p GROUP BY 1, 2),
      tot AS (SELECT actual_lang, CAST(sum(n) AS BIGINT) AS t FROM c GROUP BY 1)
      SELECT c.actual_lang, c.predicted_lang, c.n,
             (1000 * c.n) // tot.t AS cell_permille
      FROM c JOIN tot USING (actual_lang)
      ORDER BY actual_lang, predicted_lang"""),
      (s, d) => {
        val base = t(s, d, "documents")
          .withColumn("toks", TA.tokens(col("text")))
          .select(col("lang").as("actual_lang"),
            TA.langScore(col("toks"), Seq("the", "a", "data")).as("s_en"),
            TA.langScore(col("toks"), Seq("agg", "merge", "vector")).as("s_es"),
            TA.langScore(col("toks"), Seq("scan", "query", "batch")).as("s_fr"))
        val c = base.withColumn("predicted_lang",
            when(col("s_en") >= col("s_es") && col("s_en") >= col("s_fr"), "en")
              .when(col("s_es") >= col("s_fr"), "es").otherwise("fr"))
          .groupBy("actual_lang", "predicted_lang")
          .agg(count(lit(1)).as("n"))
        val tot = c.groupBy("actual_lang").agg(sum("n").as("t"))
        c.join(broadcast(tot), "actual_lang")
          .select(col("actual_lang"), col("predicted_lang"), col("n"),
            expr("(1000 * n) div t").as("cell_permille"))
          .orderBy("actual_lang", "predicted_lang")
      }),

    // Quality scoring: integer-exact length/diversity metrics + flag.
    QDef("q_doc_quality", Some("""
      WITH d AS (SELECT doc_id, n_chars,
        list_filter(string_split(text, ' '), t -> t <> '') AS toks FROM documents),
      m AS (SELECT doc_id, n_chars,
        CAST(len(toks) AS BIGINT) AS n_tokens,
        CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
        CAST(COALESCE(list_sum(list_transform(toks, t -> length(t))), 0) AS BIGINT) AS sum_tok_chars
        FROM d)
      SELECT doc_id, n_chars, n_tokens, n_distinct, sum_tok_chars,
             CASE WHEN n_tokens >= 10 AND 3 * n_distinct >= n_tokens THEN 1 ELSE 0 END AS quality_ok
      FROM m ORDER BY doc_id"""),
      (s, d) => t(s, d, "documents")
        .withColumn("toks", TA.tokens(col("text")))
        .select(col("doc_id"), col("n_chars"),
          size(col("toks")).cast(LongType).as("n_tokens"),
          size(array_distinct(col("toks"))).cast(LongType).as("n_distinct"),
          aggregate(transform(col("toks"), t => length(t)), lit(0),
            (acc, x) => acc + x).cast(LongType).as("sum_tok_chars"))
        .withColumn("quality_ok",
          when(col("n_tokens") >= 10 && col("n_distinct") * 3 >= col("n_tokens"), 1)
            .otherwise(0))
        .orderBy("doc_id")),

    // Quality ratios (stopword / short-token / uniqueness / mean
    // token length): the classic pretraining-corpus quality signals.
    // Ratios are emitted as exact integer permille/centi values
    // (floor division on both engines) — float division would make
    // the cross-engine hash depend on rounding at exact boundaries.
    QDef("q_doc_quality_ratios", Some("""
      WITH d AS (SELECT doc_id,
        list_filter(string_split(text, ' '), t -> t <> '') AS toks FROM documents),
      m AS (SELECT doc_id,
        CAST(len(toks) AS BIGINT) AS n_tokens,
        CAST(len(list_filter(toks, t -> t IN ('the', 'a'))) AS BIGINT) AS n_stop,
        CAST(len(list_filter(toks, t -> length(t) <= 2)) AS BIGINT) AS n_short,
        CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
        CAST(COALESCE(list_sum(list_transform(toks, t -> length(t))), 0) AS BIGINT) AS tok_chars
        FROM d)
      SELECT doc_id, n_tokens, n_stop,
             CASE WHEN n_tokens = 0 THEN 0 ELSE (1000 * n_stop) // n_tokens END AS stop_permille,
             CASE WHEN n_tokens = 0 THEN 0 ELSE (1000 * n_short) // n_tokens END AS short_permille,
             CASE WHEN n_tokens = 0 THEN 0 ELSE (1000 * n_distinct) // n_tokens END AS uniq_permille,
             CASE WHEN n_tokens = 0 THEN 0 ELSE (100 * tok_chars) // n_tokens END AS avg_tok_centi
      FROM m ORDER BY doc_id"""),
      (s, d) => {
        // div = integral division, exact on both engines (DuckDB `//`)
        def permille(num: String, den: String, scale: Int) =
          when(col(den) === 0, lit(0L))
            .otherwise(expr(s"div(${scale}L * $num, $den)"))
        t(s, d, "documents")
          .withColumn("toks", TA.tokens(col("text")))
          .select(col("doc_id"),
            size(col("toks")).cast(LongType).as("n_tokens"),
            TA.langScore(col("toks"), Seq("the", "a")).as("n_stop"),
            size(filter(col("toks"), t => length(t) <= 2)).cast(LongType).as("n_short"),
            size(array_distinct(col("toks"))).cast(LongType).as("n_distinct"),
            aggregate(transform(col("toks"), t => length(t)), lit(0),
              (acc, x) => acc + x).cast(LongType).as("tok_chars"))
          .select(col("doc_id"), col("n_tokens"), col("n_stop"),
            permille("n_stop", "n_tokens", 1000).as("stop_permille"),
            permille("n_short", "n_tokens", 1000).as("short_permille"),
            permille("n_distinct", "n_tokens", 1000).as("uniq_permille"),
            permille("tok_chars", "n_tokens", 100).as("avg_tok_centi"))
          .orderBy("doc_id")
      }),

    // Document fingerprinting: full-text md5, prefix md5, and an
    // order-invariant bag-of-words fingerprint.
    QDef("q_doc_fingerprint", Some("""
      WITH d AS (SELECT doc_id, text,
        list_filter(string_split(text, ' '), t -> t <> '') AS toks FROM documents)
      SELECT doc_id, md5(text) AS fp_full, md5(substr(text, 1, 64)) AS fp_prefix,
             md5(array_to_string(list_sort(list_distinct(toks)), ' ')) AS fp_bow
      FROM d ORDER BY doc_id"""),
      (s, d) => t(s, d, "documents")
        .withColumn("toks", TA.tokens(col("text")))
        .select(col("doc_id"), md5(col("text")).as("fp_full"),
          md5(substring(col("text"), 1, 64)).as("fp_prefix"),
          TA.bowFingerprint(col("toks")).as("fp_bow"))
        .orderBy("doc_id")),

    // Rolling-hash document fingerprint (winnowing-lite): min of the
    // 8-byte-window Rabin–Karp polynomial hashes, computed O(n) by
    // the native codegen'd RollingMinHash expression; the oracle
    // recomputes each window O(n·k) from the same canonical
    // polynomial — identical values. NOTE: byte/char equivalence (the
    // expression hashes UTF-8 bytes, the oracle indexes chars) holds
    // because the corpus is ASCII — same assumption as
    // q_multimodal_features.
    QDef("q_doc_fingerprint_rolling", Some(s"""
      WITH ${rollingFpCtes(8, "")}
      SELECT doc_id, fp_roll FROM fp ORDER BY doc_id"""),
      (s, d) => t(s, d, "documents")
        .filter(length(col("text")) >= 8)
        .select(col("doc_id"),
          graft.functions.RollingMinHash(col("text"), 8).as("fp_roll"))
        .orderBy("doc_id")),

    // Winnowing-fingerprint candidate pairs: docs sharing the same
    // rolling-min fingerprint (the O(n) native expression above) are
    // near-dup candidates — the winnowing use of the fingerprint,
    // closing the fingerprint→pairs loop. Pair generation reuses the
    // LSH within-bucket combiner (collect ids per fingerprint, emit
    // sorted combinations), never a self-join; 1-in-7 sample like the
    // other pair queries (the shared 31-token vocabulary makes full-
    // corpus minima collide into mega-buckets).
    QDef("q_dedup_winnow_pairs", Some(s"""
      WITH ${rollingFpCtes(8, "AND doc_id % 7 = 0")},
      ok AS (SELECT fp_roll FROM fp GROUP BY fp_roll
             HAVING count(*) BETWEEN 2 AND 64)
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM fp a JOIN fp b ON a.fp_roll = b.fp_roll AND a.doc_id < b.doc_id
      WHERE a.fp_roll IN (SELECT fp_roll FROM ok)
      ORDER BY doc_a, doc_b"""),
      (s, d) => {
        val fp = t(s, d, "documents")
          .filter(col("doc_id") % 7 === 0 && length(col("text")) >= 8)
          .select(col("doc_id"),
            graft.functions.RollingMinHash(col("text"), 8).as("fp_roll"))
        // maxBucket=64: a fingerprint shared by more docs is a
        // universal substring, not a near-dup signal — dropping it
        // bounds the quadratic pair term at any corpus size
        NearDup.lshCandidatePairs(
          fp.select(col("doc_id"), lit(0).as("band"), col("fp_roll").as("bh")),
          "doc_id", maxBucket = 64).orderBy("doc_a", "doc_b")
      }),

    // Exact dedup by content hash; smallest doc_id survives.
    QDef("q_dedup_exact", Some("""
      SELECT md5(text) AS fp, min(doc_id) AS keep_id, count(*) AS n_dupes
      FROM documents GROUP BY fp ORDER BY fp"""),
      (s, d) => NearDup.exactDedup(t(s, d, "documents"), "doc_id", "text")
        .orderBy("fp")),

    // MinHash signatures (k=8) over the distinct token set.
    QDef("q_dedup_minhash_sig", Some(
      s"WITH ${tokCte.format("")}, ${sigSelect(8, "tok")} " +
        "SELECT * FROM sig ORDER BY doc_id"),
      (s, d) => NearDup.minhashSignatures(tokDf(s, d), "doc_id", "tok", 8)
        .orderBy("doc_id")),

    // MinHash LSH candidate pairs: 4 bands × 2 rows, on a
    // deterministic 1-in-7 sample of the fixed PILOT prefix. The
    // pair-LIST face is a calibration deliverable: with this
    // corpus's 31-token vocabulary a random pair sits at J ≈ 0.6,
    // so candidates at ANY band geometry are Θ(N²) by the data
    // (measured: 203k pairs at sf0.1 → 20.2M at sf1, 100× on 10×
    // docs before the cap). The production dedup paths are
    // q_dedup_incremental (O(delta) probe) and q_dedup_cluster
    // (capped edges → CC); see NearDup.PilotDocCap.
    QDef("q_dedup_minhash_pairs", Some(
      s"WITH ${tokCte.format(
        s"WHERE doc_id % 7 = 0 AND doc_id < ${NearDup.PilotDocCap}")}, " +
        s"${sigSelect(8, "tok")}, ${bandsSql(8, 2)} $pairsSql"),
      (s, d) => NearDup.lshCandidatePairs(
        NearDup.lshBands(
          NearDup.minhashSignatures(tokDf(s, d, Some(7), pilot = true),
            "doc_id", "tok", 8),
          "doc_id", 8, 2),
        "doc_id").orderBy("doc_a", "doc_b")),

    // CROSS-LINGUAL NEAR-DUP AUDIT: the LSH candidate pairs census'd
    // by (canonicalized) language pair — pairs whose langs DIFFER are
    // template/boilerplate artifacts or machine translations, and a
    // corpus where they dominate has a shared-scaffold problem no
    // same-language dedup threshold will fix (the reviewer reads this
    // 15-row census before trusting the dedup drop list). Composes
    // the q_dedup_minhash_pairs candidate set (same pilot cap — the
    // census is a calibration face) with two lang probes; 100 TB
    // shape: the LSH-bounded pair set BROADCASTS onto the documents
    // scan twice (key equi-joins, docs never shuffle), then a
    // ≤|langs|² hash aggregate.
    QDef("q_dedup_crosslingual_pairs", Some(
      s"""WITH ${tokCte.format(
        s"WHERE doc_id % 7 = 0 AND doc_id < ${NearDup.PilotDocCap}")},
      ${sigSelect(8, "tok")}, ${bandsSql(8, 2)},
      cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
               FROM bands a JOIN bands b
                 ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
      l AS (SELECT least(da.lang, db.lang) AS lang_a,
                   greatest(da.lang, db.lang) AS lang_b
            FROM cand c JOIN documents da ON da.doc_id = c.doc_a
                        JOIN documents db ON db.doc_id = c.doc_b)
      SELECT lang_a, lang_b,
             CAST(CASE WHEN lang_a <> lang_b THEN 1 ELSE 0 END AS BIGINT)
               AS cross_lingual,
             CAST(count(*) AS BIGINT) AS n_pairs
      FROM l GROUP BY lang_a, lang_b ORDER BY lang_a, lang_b"""),
      (s, d) => {
        val pairs = NearDup.lshCandidatePairs(
          NearDup.lshBands(
            NearDup.minhashSignatures(tokDf(s, d, Some(7), pilot = true),
              "doc_id", "tok", 8),
            "doc_id", 8, 2), "doc_id")
        val langs = t(s, d, "documents").select("doc_id", "lang")
        val withLa = langs.toDF("doc_a", "la").join(broadcast(pairs), Seq("doc_a"))
        langs.toDF("doc_b", "lb").join(broadcast(withLa), Seq("doc_b"))
          .select(least(col("la"), col("lb")).as("lang_a"),
            greatest(col("la"), col("lb")).as("lang_b"))
          .groupBy("lang_a", "lang_b").agg(count(lit(1)).as("n_pairs"))
          .select(col("lang_a"), col("lang_b"),
            when(col("lang_a") =!= col("lang_b"), 1L).otherwise(0L)
              .as("cross_lingual"),
            col("n_pairs"))
          .orderBy("lang_a", "lang_b")
      }),

    // MinHash JACCARD ESTIMATE — the filter stage between LSH
    // candidate generation and exact verification: for each candidate
    // pair, the fraction of the k=8 signature components that agree
    // estimates J(a,b), and only pairs clearing a threshold proceed
    // to the expensive exact check. Integer permille (1000·agree/8)
    // so the compare is exact cross-engine. 100 TB shape: the pair
    // set is LSH-bounded and the signature table is one row per doc —
    // the two sig probes are key-equi-joins on doc id; production
    // callers persist `sigs` so the signature aggregation runs once.
    // Pilot-capped like q_dedup_minhash_pairs, whose candidate set
    // (Θ(N²) on this corpus) it consumes.
    QDef("q_dedup_minhash_est", Some(s"""
      WITH ${tokCte.format(
        s"WHERE doc_id % 7 = 0 AND doc_id < ${NearDup.PilotDocCap}")},
      ${sigSelect(8, "tok")},
      ${bandsSql(8, 2)},
      cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
               FROM bands a JOIN bands b
                 ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id)
      SELECT doc_a, doc_b,
             CAST(${(0 until 8).map(i =>
               s"(CASE WHEN sa.s$i = sb.s$i THEN 1 ELSE 0 END)").mkString(" + ")}
               AS BIGINT) AS n_agree,
             (1000 * (${(0 until 8).map(i =>
               s"(CASE WHEN sa.s$i = sb.s$i THEN 1 ELSE 0 END)").mkString(" + ")})) // 8
               AS est_permille
      FROM cand JOIN sig sa ON sa.doc_id = doc_a
                JOIN sig sb ON sb.doc_id = doc_b
      ORDER BY doc_a, doc_b"""),
      (s, d) => {
        val sigs = NearDup.minhashSignatures(
          tokDf(s, d, Some(7), pilot = true), "doc_id", "tok", 8)
        val cand = NearDup.lshCandidatePairs(
          NearDup.lshBands(sigs, "doc_id", 8, 2), "doc_id")
        def side(p: String) = sigs.toDF(
          "doc_id" +: (0 until 8).map(i => s"$p$i"): _*)
        val agree = (0 until 8).map(i =>
          when(col(s"a$i") === col(s"b$i"), 1).otherwise(0)).reduce(_ + _)
        cand
          .join(side("a").withColumnRenamed("doc_id", "doc_a"), Seq("doc_a"))
          .join(side("b").withColumnRenamed("doc_id", "doc_b"), Seq("doc_b"))
          .select(col("doc_a"), col("doc_b"),
            agree.cast(LongType).as("n_agree"))
          .withColumn("est_permille", expr("div(1000 * n_agree, 8)"))
          .orderBy("doc_a", "doc_b")
      }),

    // n-gram (word 3-gram shingle) MinHash LSH pairs: k=4 signature,
    // 4 bands × 1 row — r=1 makes a band collide with probability J
    // itself, the loosest (highest-recall) LSH operating point. The
    // r6 configuration (2 bands × 2 rows, P=1-(1-J²)² ≈ 2J² at small
    // J) matched on ZERO rows at sf0.01/sf0.1 — a vacuous oracle:
    // 3-gram shingle Jaccard between distinct synthetic docs is low
    // enough that no pair ever agreed on two adjacent components.
    // With r=1 the query proves the banding machinery on real
    // collisions at every SF while staying LSH-bounded (the capped
    // bucket join still applies).
    QDef("q_dedup_ngram_minhash_pairs", Some(s"""
      WITH d AS (SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
                 FROM documents WHERE doc_id % 7 = 0),
      sh AS (SELECT DISTINCT doc_id, sh FROM
        (SELECT doc_id, unnest(list_transform(range(1, greatest(len(toks) - 1, 1)),
                i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh FROM d)),
      ${sigSelect(4, "sh")}, ${bandsSql(4, 1)} $pairsSql"""),
      (s, d) => NearDup.lshCandidatePairs(
        NearDup.lshBands(
          NearDup.minhashSignatures(
            NearDup.shingles3(t(s, d, "documents").filter(col("doc_id") % 7 === 0),
              "doc_id", "text"),
            "doc_id", "sh", 4),
          "doc_id", 4, 1),
        "doc_id").orderBy("doc_a", "doc_b")),

    // 16-bit SimHash per doc (votes over md5-derived bits).
    QDef("q_dedup_simhash", Some(
      s"${simhashSigCtes("")} SELECT doc_id, simhash16 FROM sig ORDER BY doc_id"),
      (s, d) => NearDup.simhash16(tokDf(s, d), "doc_id", "tok").orderBy("doc_id")),

    // SimHash near-dup pairs: 4-nibble banding (hamming<=3 pairs must
    // share a band by pigeonhole) then exact bit_count(xor) filter, on
    // the 1-in-7 sample of the fixed pilot prefix. A 16-bit simhash
    // has 16 values per nibble band, so band buckets hold N/16 docs
    // and the candidate expansion is Θ(N²) by construction (measured
    // 81k → 8.0M pairs on 10× docs before the cap) — the pair-list
    // face is a calibration pilot; see NearDup.PilotDocCap.
    QDef("q_dedup_simhash_pairs", Some(s"""
      ${simhashSigCtes(
        s"WHERE doc_id % 7 = 0 AND doc_id < ${NearDup.PilotDocCap}")},
      bands AS (
        SELECT doc_id, 0 AS band, (simhash16 >> 0) & 15 AS bv FROM sig
        UNION ALL SELECT doc_id, 1, (simhash16 >> 4) & 15 FROM sig
        UNION ALL SELECT doc_id, 2, (simhash16 >> 8) & 15 FROM sig
        UNION ALL SELECT doc_id, 3, (simhash16 >> 12) & 15 FROM sig),
      cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
               FROM bands a JOIN bands b
                 ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id),
      p AS (SELECT doc_a, doc_b,
                   CAST(bit_count(xor(sa.simhash16, sb.simhash16)) AS BIGINT) AS hamming
            FROM cand JOIN sig sa ON doc_a = sa.doc_id JOIN sig sb ON doc_b = sb.doc_id)
      SELECT doc_a, doc_b, hamming FROM p WHERE hamming <= 3 ORDER BY doc_a, doc_b"""),
      (s, d) => NearDup.simhashPairs(
        NearDup.simhash16(tokDf(s, d, Some(7), pilot = true), "doc_id", "tok"),
        "doc_id", maxHamming = 3).orderBy("doc_a", "doc_b")),

    // Exact token-set Jaccard near-dup pairs on a 1-in-13 sample;
    // integer cross-multiplied threshold (J >= 0.4). Hub tokens
    // (df > TokenDfCap) are dropped from the intersection join only
    // (sizes stay full → J estimate one-sided-low; identity at
    // tested SFs where max df ≈ 321) so one stopword-like token can
    // never expand the self-join quadratically — the same cap rides
    // the oracle's kept CTE.
    QDef("q_dedup_token_jaccard", Some(s"""
      WITH ${tokCte.format("WHERE doc_id % 13 = 0")},
      sz AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
      kept AS (SELECT t.doc_id, t.tok FROM tok t JOIN (
                 SELECT tok FROM tok GROUP BY tok
                 HAVING count(*) <= ${NearDup.TokenDfCap}) lv USING (tok)),
      inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
                FROM kept a JOIN kept b ON a.tok = b.tok AND a.doc_id < b.doc_id
                GROUP BY doc_a, doc_b)
      SELECT doc_a, doc_b, i, sa.n AS na, sb.n AS nb,
             CASE WHEN i * 10 >= 4 * (sa.n + sb.n - i) THEN 1 ELSE 0 END AS near_dup
      FROM inter JOIN sz sa ON doc_a = sa.doc_id JOIN sz sb ON doc_b = sb.doc_id
      ORDER BY doc_a, doc_b"""),
      (s, d) => NearDup.tokenJaccardPairs(tokDf(s, d, Some(13)), "doc_id", "tok", 4,
          dfCap = Some(NearDup.TokenDfCap))
        .orderBy("doc_a", "doc_b")),

    // LENGTH↔RICHNESS CORRELATION per source: exact Pearson
    // components between doc length (chars) and lexical richness
    // (distinct tokens) — "are this source's long docs actually
    // richer, or just repetitive?" — the per-source scatter summary
    // behind a quality-filter tuning call (q_doc_quality scores each
    // doc; this says whether LENGTH is even a useful proxy per
    // source). Components ride as exact integer numerators
    // (n·Σxy−ΣxΣy etc., the q_moving_corr discipline); corr_milli is
    // the single irrational step — one exactly-rounded
    // mul/sqrt/div chain floored once, NULL when either variance is
    // zero. One map-side-combined aggregate, |sources| rows.
    QDef("q_quality_length_corr", Some("""
      WITH m AS (SELECT source, CAST(n_chars AS BIGINT) AS x,
              CAST(len(list_distinct(list_filter(string_split(text, ' '),
                t -> t <> ''))) AS BIGINT) AS y
            FROM documents),
      a AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
              CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
              CAST(sum(x * y) AS BIGINT) AS sxy,
              CAST(sum(x * x) AS BIGINT) AS sxx,
              CAST(sum(y * y) AS BIGINT) AS syy
            FROM m GROUP BY 1)
      SELECT source, n,
             CAST(n * sxy - sx * sy AS BIGINT) AS cov_num,
             CAST(n * sxx - sx * sx AS BIGINT) AS var_x_num,
             CAST(n * syy - sy * sy AS BIGINT) AS var_y_num,
             CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
                  THEN CAST(floor(1000.0 * (n * sxy - sx * sy) /
                    sqrt((1.0 * (n * sxx - sx * sx)) *
                         (1.0 * (n * syy - sy * sy)))) AS BIGINT)
             END AS corr_milli
      FROM a ORDER BY source"""),
      (s, d) => {
        val m = t(s, d, "documents").select(col("source"),
          col("n_chars").cast("long").as("x"),
          size(array_distinct(graft.text.TextAnalysis.tokens(col("text"))))
            .cast("long").as("y"))
        val a = m.groupBy("source").agg(count(lit(1)).as("n"),
          sum("x").cast("long").as("sx"), sum("y").cast("long").as("sy"),
          sum(col("x") * col("y")).cast("long").as("sxy"),
          sum(col("x") * col("x")).cast("long").as("sxx"),
          sum(col("y") * col("y")).cast("long").as("syy"))
        val cov = col("n") * col("sxy") - col("sx") * col("sy")
        val vx = col("n") * col("sxx") - col("sx") * col("sx")
        val vy = col("n") * col("syy") - col("sy") * col("sy")
        a.select(col("source"), col("n"),
          cov.cast("long").as("cov_num"), vx.cast("long").as("var_x_num"),
          vy.cast("long").as("var_y_num"),
          when(vx > 0 && vy > 0,
            floor(lit(1000.0) * cov /
              sqrt((lit(1.0) * vx) * (lit(1.0) * vy))).cast("long"))
            .as("corr_milli"))
          .orderBy("source")
      }),

    // SHINGLE-SIZE SWEEP: the dedup-design dial q_dedup_ngram_jaccard
    // fixes at n=3, swept — for n ∈ {2, 3, 5}: candidate pairs,
    // flagged pairs at J ≥ 0.2, and the mean candidate Jaccard
    // permille. Smaller shingles blur (everything overlaps), larger
    // sharpen until recall dies — this table is the measured argument
    // for the n the pipeline ships. Each branch is the standard
    // inverted-index pair shape on the same 1-in-13 sample; per-pair
    // permille floors once and only integer sums aggregate.
    // Pilot-capped like the other calibration faces (threshold sweep,
    // error curve, band tuning): a design-dial sweep is a pilot study
    // and its three uncapped pair branches were the last >10× slope
    // ratio of the r13 sweep (11.35× on 10× data) — O(1) in corpus
    // size by the NearDup.PilotDocCap contract, bit-identical at
    // tested SFs.
    QDef("q_shingle_size_sweep", Some({
      def branch(n: Int) = s"""
        SELECT $n AS sn, i, sa.n + sb.n - i AS u FROM (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
          FROM sh$n a JOIN sh$n b ON a.sh = b.sh AND a.doc_id < b.doc_id
          GROUP BY 1, 2) p
        JOIN sz$n sa ON p.doc_a = sa.doc_id JOIN sz$n sb ON p.doc_b = sb.doc_id"""
      def cte(n: Int) = s"""
      sh$n AS (SELECT DISTINCT doc_id, sh FROM
        (SELECT doc_id, unnest(list_transform(range(1, greatest(len(toks) - ${n - 2}, 1)),
                i -> ${(0 until n).map(j => s"toks[i+$j]").mkString(" || ' ' || ")})) AS sh
         FROM d)),
      sz$n AS (SELECT doc_id, count(*) AS n FROM sh$n GROUP BY doc_id)"""
      s"""
      WITH d AS (SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
                 FROM documents
                 WHERE doc_id % 13 = 0 AND doc_id < ${NearDup.PilotDocCap}),
      ${Seq(2, 3, 5).map(cte).mkString(",")},
      u AS (${Seq(2, 3, 5).map(branch).mkString(" UNION ALL ")}),
      agg AS (SELECT sn, CAST(count(*) AS BIGINT) AS n_pairs,
                CAST(sum(CASE WHEN 10 * i >= 2 * u THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_flagged,
                CAST(sum((1000 * i) // u) // count(*) AS BIGINT)
                  AS mean_jac_permille
              FROM u GROUP BY 1),
      ns AS (SELECT 2 AS sn UNION ALL SELECT 3 UNION ALL SELECT 5)
      SELECT CAST(ns.sn AS BIGINT) AS shingle_n,
             coalesce(agg.n_pairs, 0) AS n_pairs,
             coalesce(agg.n_flagged, 0) AS n_flagged,
             agg.mean_jac_permille
      FROM ns LEFT JOIN agg ON ns.sn = agg.sn ORDER BY shingle_n"""
    }),
      (s, d) => {
        val docs = t(s, d, "documents").filter(col("doc_id") % 13 === 0 &&
          col("doc_id") < NearDup.PilotDocCap)
        val branches = Seq(2, 3, 5).map { n =>
          NearDup.tokenJaccardPairs(
              NearDup.shinglesN(docs, "doc_id", "text", n), "doc_id", "sh", 2)
            .select(lit(n.toLong).as("shingle_n"), col("i"),
              (col("na") + col("nb") - col("i")).as("u"), col("near_dup"))
        }
        val agg = branches.reduce(_ unionByName _)
          .groupBy("shingle_n")
          .agg(count(lit(1)).as("n_pairs"),
            sum(col("near_dup").cast("long")).cast("long").as("n_flagged"),
            expr("div(sum(div(1000 * i, u)), count(1))").cast("long")
              .as("mean_jac_permille"))
        // a branch with NO candidate pairs must still report its zero
        // row — an absent sweep point reads as "not measured"
        s.createDataset(Seq(2L, 3L, 5L))(org.apache.spark.sql.Encoders.scalaLong)
          .toDF("shingle_n")
          .join(agg, Seq("shingle_n"), "left")
          .select(col("shingle_n"),
            coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
            coalesce(col("n_flagged"), lit(0L)).as("n_flagged"),
            col("mean_jac_permille"))
          .orderBy("shingle_n")
      }),

    // JACCARD-THRESHOLD SWEEP: the dedup POLICY curve — at J ≥
    // {0.2, 0.4, 0.6, 0.8} over the same token-Jaccard pair table:
    // flagged pairs and the docs that would be dropped (pair count
    // upper-bounds removals; distinct doc_b is the min-id-survivor
    // removal estimate). One pair pass, four conditional sums — the
    // cost/aggressiveness table a curation review reads before fixing
    // THE threshold (q_dedup_eval scores one choice; this shows the
    // cliff). Integer cross-multiplied thresholds, no floats.
    // Pilot-capped: the sweep's all-pairs table is the quadratic
    // truth pass — a tuning pilot, O(1) in corpus size by contract
    // (NearDup.PilotDocCap).
    QDef("q_jaccard_threshold_sweep", Some(s"""
      WITH ${tokCte.format(
        s"WHERE doc_id % 13 = 0 AND doc_id < ${NearDup.PilotDocCap}")},
      sz AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
      p AS (SELECT doc_a, doc_b, i, sa.n + sb.n - i AS u FROM (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
              FROM tok a JOIN tok b ON a.tok = b.tok AND a.doc_id < b.doc_id
              GROUP BY 1, 2) q
            JOIN sz sa ON q.doc_a = sa.doc_id JOIN sz sb ON q.doc_b = sb.doc_id),
      th AS (SELECT 2 AS t10 UNION ALL SELECT 4 UNION ALL SELECT 6
             UNION ALL SELECT 8)
      SELECT CAST(th.t10 * 100 AS BIGINT) AS threshold_permille,
             CAST(sum(CASE WHEN 10 * p.i >= th.t10 * p.u THEN 1 ELSE 0 END)
               AS BIGINT) AS n_flagged,
             CAST(count(DISTINCT CASE WHEN 10 * p.i >= th.t10 * p.u
               THEN p.doc_b END) AS BIGINT) AS est_docs_dropped
      FROM th CROSS JOIN p GROUP BY 1 ORDER BY threshold_permille"""),
      (s, d) => {
        val p = NearDup.tokenJaccardPairs(tokDf(s, d, Some(13), pilot = true),
            "doc_id", "tok", 0)
          .select(col("doc_a"), col("doc_b"), col("i"),
            (col("na") + col("nb") - col("i")).as("u"))
        val hit = lit(10) * col("i") >= col("t10") * col("u")
        p.select(col("doc_b"), col("i"), col("u"),
            explode(array(Seq(2, 4, 6, 8).map(x => lit(x.toLong)): _*)).as("t10"))
          .groupBy("t10")
          .agg(sum(when(hit, 1L).otherwise(0L)).cast("long").as("n_flagged"),
            countDistinct(when(hit, col("doc_b"))).as("est_docs_dropped"))
          .select((col("t10") * 100).cast("long").as("threshold_permille"),
            col("n_flagged"), col("est_docs_dropped"))
          .orderBy("threshold_permille")
      }),

    // NEAR-DUP EVIDENCE: for every flagged n-gram-Jaccard pair, the
    // three RAREST shared shingles (global-DF asc, shingle asc) —
    // the explainability view a curation reviewer reads before
    // trusting a dedup drop ("these pairs share THIS text", with
    // rarity making the evidence specific: a shared stop-phrase
    // proves nothing, a shared rare 3-gram does). Composes the
    // ngram-jaccard pair set with the shingle inverted index it
    // already built; the per-pair window is bounded by the pair's
    // shared-shingle count, and the rank is a total order so both
    // engines pick identical evidence.
    QDef("q_dup_evidence", Some(s"""
      WITH d AS (SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
                 FROM documents WHERE doc_id % 13 = 0),
      sh AS (SELECT DISTINCT doc_id, sh FROM
        (SELECT doc_id, unnest(list_transform(range(1, greatest(len(toks) - 1, 1)),
                i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh FROM d)),
      sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
                FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
                GROUP BY doc_a, doc_b),
      flagged AS (SELECT doc_a, doc_b FROM inter
                  JOIN sz sa ON doc_a = sa.doc_id JOIN sz sb ON doc_b = sb.doc_id
                  WHERE i * 10 >= 2 * (sa.n + sb.n - i)),
      gdf AS (SELECT sh, CAST(count(*) AS BIGINT) AS df FROM sh GROUP BY sh),
      ev AS (SELECT f.doc_a, f.doc_b, a.sh, gdf.df,
               CAST(row_number() OVER (PARTITION BY f.doc_a, f.doc_b
                 ORDER BY gdf.df, a.sh) AS BIGINT) AS rnk
             FROM flagged f
             JOIN sh a ON a.doc_id = f.doc_a
             JOIN sh b ON b.doc_id = f.doc_b AND a.sh = b.sh
             JOIN gdf ON gdf.sh = a.sh)
      SELECT doc_a, doc_b, rnk, sh AS shingle, df AS shingle_df
      FROM ev WHERE rnk <= 3 ORDER BY doc_a, doc_b, rnk"""),
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val sh = NearDup.shingles3(
          t(s, d, "documents").filter(col("doc_id") % 13 === 0), "doc_id", "text")
        val flagged = NearDup.tokenJaccardPairs(sh, "doc_id", "sh", 2)
          .filter(col("near_dup") === 1).select("doc_a", "doc_b")
        val gdf = sh.groupBy("sh").agg(count(lit(1)).as("df"))
        flagged
          .join(sh.select(col("doc_id").as("doc_a"), col("sh")), Seq("doc_a"))
          .join(sh.select(col("doc_id").as("doc_b"), col("sh")), Seq("doc_b", "sh"))
          .join(gdf, Seq("sh"))
          .withColumn("rnk", row_number().over(
            Window.partitionBy("doc_a", "doc_b").orderBy(col("df"), col("sh")))
            .cast("long"))
          .filter(col("rnk") <= 3)
          .select(col("doc_a"), col("doc_b"), col("rnk"),
            col("sh").as("shingle"), col("df").as("shingle_df"))
          .orderBy("doc_a", "doc_b", "rnk")
      }),

    // MINHASH ERROR CURVE: the sketch-SIZING advisor — for signature
    // sizes k ∈ {2, 4, 8} (nested prefixes of ONE 8-hash signature
    // build, so the comparison is apples-to-apples), the measured
    // |estimate − exact| Jaccard error over every sampled
    // shared-token pair: mean and max in exact permille. This is the
    // accuracy side of the (k, bands, rows) budget the
    // q_lsh_band_tuning S-curve spends — together they answer "how
    // many hashes do I pay per doc at 100 TB". All integer: each
    // pair's error is a born-integer |a − b|, and only integer sums
    // cross the aggregation. Pilot-capped: the exact-Jaccard truth
    // pass is all-pairs — an accuracy pilot, O(1) in corpus size
    // by contract (NearDup.PilotDocCap; 165× slope at sf1 before).
    QDef("q_minhash_error_curve", Some(s"""
      WITH ${tokCte.format(
        s"WHERE doc_id % 7 = 0 AND doc_id < ${NearDup.PilotDocCap}")},
      ${sigSelect(8, "tok")},
      sz AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
      inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
                FROM tok a JOIN tok b ON a.tok = b.tok AND a.doc_id < b.doc_id
                GROUP BY doc_a, doc_b),
      truep AS (SELECT doc_a, doc_b,
                  CAST((1000 * i) // (sa.n + sb.n - i) AS BIGINT) AS true_pm
                FROM inter JOIN sz sa ON doc_a = sa.doc_id
                           JOIN sz sb ON doc_b = sb.doc_id),
      ag AS (SELECT t.true_pm,
               ${(0 until 8).map(x =>
                 s"(CASE WHEN sa.s$x = sb.s$x THEN 1 ELSE 0 END) AS g$x")
                 .mkString(", ")}
             FROM truep t JOIN sig sa ON t.doc_a = sa.doc_id
                          JOIN sig sb ON t.doc_b = sb.doc_id),
      er AS (SELECT 2 AS k, abs((1000 * (g0 + g1)) // 2 - true_pm) AS err FROM ag
             UNION ALL
             SELECT 4, abs((1000 * (g0 + g1 + g2 + g3)) // 4 - true_pm) FROM ag
             UNION ALL
             SELECT 8, abs((1000 * (g0 + g1 + g2 + g3 + g4 + g5 + g6 + g7)) // 8
               - true_pm) FROM ag)
      SELECT CAST(k AS BIGINT) AS k, CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(sum(err) // count(*) AS BIGINT) AS mean_abs_err_permille,
             CAST(max(err) AS BIGINT) AS max_err_permille
      FROM er GROUP BY 1 ORDER BY k"""),
      (s, d) => {
        val tok = tokDf(s, d, Some(7), pilot = true)
        val sig = NearDup.minhashSignatures(tok, "doc_id", "tok", 8)
        val truep = NearDup.tokenJaccardPairs(tok, "doc_id", "tok", 0)
          .select(col("doc_a"), col("doc_b"),
            expr("div(1000 * i, na + nb - i)").as("true_pm"))
        val ag = truep
          .join(sig.toDF("doc_a" +: (0 until 8).map(x => s"a$x"): _*), Seq("doc_a"))
          .join(sig.toDF("doc_b" +: (0 until 8).map(x => s"b$x"): _*), Seq("doc_b"))
          .select(col("true_pm") +: (0 until 8).map(x =>
            when(col(s"a$x") === col(s"b$x"), 1L).otherwise(0L).as(s"g$x")): _*)
        // One pass, not three: a per-k UNION of branches re-executes
        // the whole pilot join tree once per k (3× the token join +
        // signature joins — measured as this query's entire thin
        // bench margin). All three |est − true| errors are columns of
        // the SAME row, so compute them in one projection and unpivot
        // with stack() — the plan runs the join tree exactly once.
        def errCol(k: Int) =
          abs(expr(s"div(1000 * (${(0 until k).map(x => s"g$x").mkString(" + ")}), $k)")
            - col("true_pm"))
        ag.select(errCol(2).as("e2"), errCol(4).as("e4"), errCol(8).as("e8"))
          .select(expr("stack(3, 2L, e2, 4L, e4, 8L, e8) AS (k, err)"))
          .groupBy("k")
          .agg(count(lit(1)).as("n_pairs"),
            expr("div(sum(err), count(1))").cast("long")
              .as("mean_abs_err_permille"),
            max("err").cast("long").as("max_err_permille"))
          .orderBy("k")
      }),

    // LSH BAND-TUNING ADVISOR: for three (bands, rows) configs of a
    // 32-hash MinHash budget — (16,2), (8,4), (4,8) — the expected
    // collision behavior ON THIS CORPUS'S observed pair-similarity
    // distribution: P(catch) = 1 − (1 − s^r)^b evaluated at each
    // sampled pair's EXACT Jaccard s, split into true-dup (J ≥ 0.5)
    // vs non-dup mass. This is the S-curve sweep every LSH
    // deployment tunes by hand (q_lsh_bucket_skew measures one
    // config's bucket health AFTER the choice; this picks the
    // config), made deterministic: powers are REPEATED-SQUARING
    // chains of exactly-rounded IEEE multiplies (identical trees on
    // both engines — no pow(), which is not correctly rounded), each
    // pair's P floors ONCE to permille, and only INTEGER sums cross
    // the aggregation (the order-dependent double-sum trap never
    // appears). Pair source is the q_dedup_token_jaccard sample,
    // pilot-capped: the S-curve is tuned on a fixed-size pilot by
    // contract — its all-pairs exact-Jaccard term is quadratic in
    // the sample (NearDup.PilotDocCap; 66× slope at sf1 before).
    QDef("q_lsh_band_tuning", Some(s"""
      WITH ${tokCte.format(
        s"WHERE doc_id % 13 = 0 AND doc_id < ${NearDup.PilotDocCap}")},
      sz AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
      inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
                FROM tok a JOIN tok b ON a.tok = b.tok AND a.doc_id < b.doc_id
                GROUP BY doc_a, doc_b),
      p AS (SELECT (1.0 * i) / (sa.n + sb.n - i) AS s,
              CASE WHEN 2 * i >= (sa.n + sb.n - i) THEN 1 ELSE 0 END AS is_dup
            FROM inter JOIN sz sa ON doc_a = sa.doc_id
                       JOIN sz sb ON doc_b = sb.doc_id),
      c16 AS (SELECT 16 AS bands, 2 AS rows_per_band, is_dup,
                CAST(floor(1000.0 * (1.0 - t8 * t8)) AS BIGINT) AS catch_pm
              FROM (SELECT is_dup, t4 * t4 AS t8 FROM (
                    SELECT is_dup, t2 * t2 AS t4 FROM (
                    SELECT is_dup, t * t AS t2 FROM (
                    SELECT is_dup, 1.0 - s * s AS t FROM p))))),
      c8 AS (SELECT 8 AS bands, 4 AS rows_per_band, is_dup,
               CAST(floor(1000.0 * (1.0 - t4 * t4)) AS BIGINT) AS catch_pm
             FROM (SELECT is_dup, t2 * t2 AS t4 FROM (
                   SELECT is_dup, t * t AS t2 FROM (
                   SELECT is_dup, 1.0 - s2 * s2 AS t FROM (
                   SELECT is_dup, s * s AS s2 FROM p))))),
      c4 AS (SELECT 4 AS bands, 8 AS rows_per_band, is_dup,
               CAST(floor(1000.0 * (1.0 - t2 * t2)) AS BIGINT) AS catch_pm
             FROM (SELECT is_dup, t * t AS t2 FROM (
                   SELECT is_dup, 1.0 - s4 * s4 AS t FROM (
                   SELECT is_dup, s2 * s2 AS s4 FROM (
                   SELECT is_dup, s * s AS s2 FROM p))))),
      allc AS (SELECT * FROM c16 UNION ALL SELECT * FROM c8 UNION ALL
               SELECT * FROM c4)
      SELECT CAST(bands AS BIGINT) AS bands,
             CAST(rows_per_band AS BIGINT) AS rows_per_band,
             CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(sum(is_dup) AS BIGINT) AS n_dups,
             CASE WHEN sum(is_dup) > 0 THEN CAST(
               sum(CASE WHEN is_dup = 1 THEN catch_pm ELSE 0 END) // sum(is_dup)
               AS BIGINT) END AS dup_avg_catch_permille,
             CASE WHEN count(*) - sum(is_dup) > 0 THEN CAST(
               sum(CASE WHEN is_dup = 0 THEN catch_pm ELSE 0 END)
                 // (count(*) - sum(is_dup)) AS BIGINT)
             END AS nondup_avg_catch_permille
      FROM allc GROUP BY 1, 2 ORDER BY bands DESC"""),
      (s, d) => {
        val tok = tokDf(s, d, Some(13), pilot = true)
        val sz = tok.groupBy(col("doc_id").as("sd")).agg(count(lit(1)).as("n"))
        val inter = tok.select(col("doc_id").as("doc_a"), col("tok"))
          .join(tok.select(col("doc_id").as("doc_b"), col("tok")), "tok")
          .filter(col("doc_a") < col("doc_b"))
          .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("i"))
        val p = inter
          .join(sz, col("doc_a") === col("sd")).withColumnRenamed("n", "na")
          .drop("sd")
          .join(sz, col("doc_b") === col("sd")).withColumnRenamed("n", "nb")
          .select((lit(1.0) * col("i") / (col("na") + col("nb") - col("i"))).as("s"),
            when(lit(2) * col("i") >= col("na") + col("nb") - col("i"), 1L)
              .otherwise(0L).as("is_dup"))
        // repeated-squaring catch chains — the multiplication TREES must
        // match the oracle's exactly (IEEE ops are exactly rounded, so
        // identical trees give identical bits)
        def chain(bands: Int, r: Int) = {
          val sCol = col("s")
          val sr = r match {
            case 2 => sCol * sCol
            case 4 => { val s2 = sCol * sCol; s2 * s2 }
            case 8 => { val s2 = sCol * sCol; val s4 = s2 * s2; s4 * s4 }
          }
          val t = lit(1.0) - sr
          val tb = bands match {
            case 16 => { val t2 = t * t; val t4 = t2 * t2; val t8 = t4 * t4; t8 * t8 }
            case 8 => { val t2 = t * t; val t4 = t2 * t2; t4 * t4 }
            case 4 => { val t2 = t * t; t2 * t2 }
          }
          p.select(lit(bands.toLong).as("bands"), lit((32 / bands).toLong)
              .as("rows_per_band"), col("is_dup"),
            floor(lit(1000.0) * (lit(1.0) - tb)).cast("long").as("catch_pm"))
        }
        chain(16, 2).unionByName(chain(8, 4)).unionByName(chain(4, 8))
          .groupBy("bands", "rows_per_band")
          .agg(count(lit(1)).as("n_pairs"), sum("is_dup").cast("long").as("n_dups"),
            sum(when(col("is_dup") === 1, col("catch_pm")).otherwise(0L))
              .as("dup_sum"),
            sum(when(col("is_dup") === 0, col("catch_pm")).otherwise(0L))
              .as("nondup_sum"))
          .select(col("bands"), col("rows_per_band"), col("n_pairs"), col("n_dups"),
            when(col("n_dups") > 0, expr("div(dup_sum, n_dups)"))
              .as("dup_avg_catch_permille"),
            when(col("n_pairs") - col("n_dups") > 0,
              expr("div(nondup_sum, n_pairs - n_dups)"))
              .as("nondup_avg_catch_permille"))
          .orderBy(col("bands").desc)
      }),

    // PREFIX-FILTERED Jaccard join (AllPairs/PPJoin): same truth as
    // q_dedup_token_jaccard's J≥0.4 pairs, but candidates come ONLY
    // from each doc's rarest n−⌈0.4n⌉+1 tokens under the global
    // frequency order. THE ORACLE IS THE FULL-JOIN TRUTH — the hash
    // compare therefore PROVES the prefix candidate scheme is
    // complete (a dropped true pair would mismatch). See
    // NearDup.prefixJaccardPairs for the theorem and the 100 TB
    // rationale (prefixes hold rare tokens, so candidate buckets are
    // the frequency tail; no pruning is visible on this 31-token-
    // vocabulary corpus, by construction — which also makes the
    // true pair set Θ(N²) here, so the pair-LIST face is
    // pilot-capped like the rest of the family; see
    // NearDup.PilotDocCap).
    QDef("q_dedup_prefix_jaccard", Some(s"""
      WITH ${tokCte.format(
        s"WHERE doc_id % 13 = 0 AND doc_id < ${NearDup.PilotDocCap}")},
      sz AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
      inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
                FROM tok a JOIN tok b ON a.tok = b.tok AND a.doc_id < b.doc_id
                GROUP BY doc_a, doc_b)
      SELECT doc_a, doc_b, i, sa.n AS na, sb.n AS nb
      FROM inter JOIN sz sa ON doc_a = sa.doc_id JOIN sz sb ON doc_b = sb.doc_id
      WHERE i * 10 >= 4 * (sa.n + sb.n - i)
      ORDER BY doc_a, doc_b"""),
      (s, d) => NearDup.prefixJaccardPairs(tokDf(s, d, Some(13), pilot = true),
          "doc_id", "tok", 4)
        .orderBy("doc_a", "doc_b")),

    // n-gram Jaccard near-dup pairs: word-3-gram shingle sets, exact
    // Jaccard >= 0.2 via integer cross-multiplication, 1-in-13 sample.
    // Shingle df is far flatter than token df (3-grams are near-
    // unique), but a templated boilerplate shingle is exactly the hub
    // failure mode — same TokenDfCap drop on the join side, mirrored
    // in the oracle's kept CTE.
    QDef("q_dedup_ngram_jaccard", Some(s"""
      WITH d AS (SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
                 FROM documents WHERE doc_id % 13 = 0),
      sh AS (SELECT DISTINCT doc_id, sh FROM
        (SELECT doc_id, unnest(list_transform(range(1, greatest(len(toks) - 1, 1)),
                i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh FROM d)),
      sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      kept AS (SELECT t.doc_id, t.sh FROM sh t JOIN (
                 SELECT sh FROM sh GROUP BY sh
                 HAVING count(*) <= ${NearDup.TokenDfCap}) lv USING (sh)),
      inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
                FROM kept a JOIN kept b ON a.sh = b.sh AND a.doc_id < b.doc_id
                GROUP BY doc_a, doc_b)
      SELECT doc_a, doc_b, i, sa.n AS na, sb.n AS nb,
             CASE WHEN i * 10 >= 2 * (sa.n + sb.n - i) THEN 1 ELSE 0 END AS near_dup
      FROM inter JOIN sz sa ON doc_a = sa.doc_id JOIN sz sb ON doc_b = sb.doc_id
      ORDER BY doc_a, doc_b"""),
      (s, d) => NearDup.tokenJaccardPairs(
        NearDup.shingles3(t(s, d, "documents").filter(col("doc_id") % 13 === 0),
          "doc_id", "text"),
        "doc_id", "sh", 2, dfCap = Some(NearDup.TokenDfCap))
        .orderBy("doc_a", "doc_b")),

    // CONTAINMENT pairs (Broder's resemblance-vs-containment split):
    // exact asymmetric C(a→b)=|A∩B|/|A| both ways as permille, plus
    // the quote_like flag — ≥80% of one side inside the other while
    // Jaccard < 0.6. This is the relation symmetric near-dup dedup
    // structurally MISSES (a quoted/subset doc has high containment
    // but low Jaccard because the union is dominated by the long
    // side); curation wants these surfaced separately: the contained
    // doc is a removal candidate, the containing one is not. Same
    // bounded-pair shape as q_dedup_token_jaccard (1-in-13 sample;
    // at scale the input would be LSH candidates).
    QDef("q_dedup_containment", Some(s"""
      WITH ${tokCte.format("WHERE doc_id % 13 = 0")},
      sz AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
      kept AS (SELECT t.doc_id, t.tok FROM tok t JOIN (
                 SELECT tok FROM tok GROUP BY tok
                 HAVING count(*) <= ${NearDup.TokenDfCap}) lv USING (tok)),
      inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
                FROM kept a JOIN kept b ON a.tok = b.tok AND a.doc_id < b.doc_id
                GROUP BY doc_a, doc_b)
      SELECT doc_a, doc_b, i, sa.n AS na, sb.n AS nb,
             (1000 * i) // sa.n AS cont_a_permille,
             (1000 * i) // sb.n AS cont_b_permille,
             CASE WHEN (i * 5 >= sa.n * 4 OR i * 5 >= sb.n * 4)
                   AND i * 10 < 6 * (sa.n + sb.n - i) THEN 1 ELSE 0 END AS quote_like
      FROM inter JOIN sz sa ON doc_a = sa.doc_id JOIN sz sb ON doc_b = sb.doc_id
      ORDER BY doc_a, doc_b"""),
      (s, d) => NearDup.containmentPairs(tokDf(s, d, Some(13)), "doc_id", "tok",
          dfCap = Some(NearDup.TokenDfCap))
        .orderBy("doc_a", "doc_b")),

    // NOVELTY scoring: per doc, the fraction of its distinct word
    // 3-grams FIRST seen in this doc under the doc_id total order —
    // the corpus-construction dual of dedup: instead of removing
    // repeats, score what each doc ADDS (dedup asks "is this a
    // copy", novelty asks "does this doc contribute anything"). A
    // low-novelty tail is boilerplate/templates even when no single
    // pair crosses a dup threshold. Full corpus, NO sample: the plan
    // is linear in total shingles — explode → min-by-shingle
    // (map-side combined) → one co-partitioned equi-join back on the
    // shingle, the inverted-index shape, no pair expansion anywhere.
    // Permille by floor division; docs under 3 tokens (no shingles)
    // are structurally absent on both sides.
    QDef("q_ngram_novelty", Some(s"""
      WITH d AS (SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
                 FROM documents),
      sh AS (SELECT DISTINCT doc_id, sh FROM
        (SELECT doc_id, unnest(list_transform(range(1, greatest(len(toks) - 1, 1)),
                i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh FROM d)),
      f AS (SELECT sh, min(doc_id) AS first_doc FROM sh GROUP BY sh)
      SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
             CAST(sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END) AS BIGINT)
               AS n_new,
             CAST((1000 * sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END))
               // count(*) AS BIGINT) AS novelty_permille
      FROM sh s JOIN f USING (sh) GROUP BY s.doc_id ORDER BY doc_id"""),
      (s, d) => {
        val sh = NearDup.shingles3(t(s, d, "documents"), "doc_id", "text")
        val first = sh.groupBy("sh").agg(min(col("doc_id")).as("first_doc"))
        sh.join(first, "sh")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_shingles"),
            sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L)).as("n_new"))
          .select(col("doc_id"), col("n_shingles"), col("n_new"),
            expr("div(1000 * n_new, n_shingles)").as("novelty_permille"))
          .orderBy("doc_id")
      }),

    // TOKENIZER FERTILITY per language: regex-token mass over
    // whitespace-token mass in exact permille — the
    // tokens-per-"word" ratio that decides whether a tokenizer suits
    // a corpus slice (fertility creeping up on one language = that
    // language is being shredded into fragments; the metric every
    // multilingual-tokenizer evaluation tables). Both counts are the
    // engine-shared TextAnalysis trees (whitespace split; [a-z]+
    // runs as the BPE-ish stand-in), aggregated map-side to
    // |langs| rows.
    QDef("q_tokenizer_fertility", Some("""
      WITH d AS (SELECT lang,
              CAST(len(list_filter(string_split(text, ' '), t -> t <> ''))
                AS BIGINT) AS ws,
              CAST(len(regexp_extract_all(text, '[a-z]+')) AS BIGINT) AS rx
            FROM documents)
      SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(ws) AS BIGINT) AS ws_tokens,
             CAST(sum(rx) AS BIGINT) AS regex_tokens,
             CASE WHEN sum(ws) > 0
                  THEN CAST((1000 * sum(rx)) // sum(ws) AS BIGINT) END
               AS fertility_permille
      FROM d GROUP BY 1 ORDER BY lang"""),
      (s, d) => t(s, d, "documents")
        .select(col("lang"),
          graft.text.TextAnalysis.tokenCount(col("text")).as("ws"),
          graft.text.TextAnalysis.regexTokenCount(col("text")).as("rx"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum("ws").cast("long").as("ws_tokens"),
          sum("rx").cast("long").as("regex_tokens"))
        .select(col("lang"), col("n_docs"), col("ws_tokens"), col("regex_tokens"),
          when(col("ws_tokens") > 0,
            expr("div(1000 * regex_tokens, ws_tokens)")).as("fertility_permille"))
        .orderBy("lang")),

    // ZIPF GOODNESS-OF-FIT over the corpus vocabulary — per top-32
    // rank: occurrence frequency, the Zipf invariant freq·rank, and
    // its ratio to f(1) in exact permille (Zipf's law predicts
    // freq·rank ≈ f(1), i.e. ratio ≈ 1000; systematic decay below
    // 1000 reveals a sub-Zipfian, template-heavy corpus — the
    // vocabulary-health readout next to q_vocab_hapax's tail view).
    // Deliberately LOG-FREE: the classic log-log slope needs ln(),
    // which is not exactly-rounded IEEE and can floor differently
    // across engines (the q_bigram_pmi lesson) — the freq·rank ratio
    // is the same diagnostic in pure BIGINT. The top-K cut is
    // (freq DESC, tok) total-ordered, so ranks are engine-stable;
    // rank assignment happens AFTER the 32-row limit, so the window
    // is literal-bounded, never a data-scale single-partition sort
    // (one map-side-combined token count + a 32-row tail).
    QDef("q_zipf_gof", Some("""
      WITH tk AS (SELECT tok FROM
          (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
          WHERE tok <> ''),
      f AS (SELECT tok, CAST(count(*) AS BIGINT) AS freq FROM tk GROUP BY 1
            ORDER BY freq DESC, tok LIMIT 32),
      rk AS (SELECT tok, freq,
               CAST(row_number() OVER (ORDER BY freq DESC, tok) AS BIGINT) AS rnk
             FROM f),
      top AS (SELECT CAST(max(freq) AS BIGINT) AS f1 FROM f)
      SELECT rk.rnk, rk.tok, rk.freq,
             CAST(rk.freq * rk.rnk AS BIGINT) AS fr_x_rank,
             CAST((1000 * rk.freq * rk.rnk) // top.f1 AS BIGINT)
               AS zipf_ratio_permille
      FROM rk, top ORDER BY rnk"""),
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val f = t(s, d, "documents")
          .select(explode(graft.text.TextAnalysis.tokens(col("text"))).as("tok"))
          .groupBy("tok").agg(count(lit(1)).as("freq"))
          .orderBy(col("freq").desc, col("tok")).limit(32)
        f.withColumn("rnk",
            row_number().over(Window.orderBy(col("freq").desc, col("tok")))
              .cast("long"))
          .crossJoin(broadcast(f.agg(max("freq").as("f1"))))
          .select(col("rnk"), col("tok"), col("freq"),
            (col("freq") * col("rnk")).as("fr_x_rank"),
            expr("div(1000 * freq * rnk, f1)").as("zipf_ratio_permille"))
          .orderBy("rnk")
      }),

    // NEAR-EXACT dedup by EDIT DISTANCE (the similarity modality the
    // token/shingle family can't see: transpositions and small edits
    // inside tokens change every shingle but few characters).
    // Candidates come from length-band blocking — edit distance ≤ K
    // forces |len(a)−len(b)| ≤ K, so each doc posts into its
    // ⌊len/K⌋ and ⌊len/K⌋+1 buckets and every qualifying pair
    // collides in at least one bucket (complete by construction,
    // like the LSH band argument but metric-exact). The Spark side
    // computes BANDED Levenshtein with the threshold argument —
    // O(K·n) per pair instead of O(n²), the 100 TB difference — and
    // caps the emitted distance at K+1 ("beyond K"), which the
    // oracle mirrors with least(full_distance, K+1). The pair list is
    // a CALIBRATION face, and its sample is a FIXED-SIZE pilot
    // prefix (1-in-13 below PilotDocCap), not a fixed fraction: the
    // pre-r16 %-only sample kept pairs ∝ (N/13)²/bands — 37.3×
    // measured on the r15 sf1→sf10 decade — while the capped pilot
    // pins the within-band quadratic at O(1) in corpus size, exactly
    // how an edit-distance threshold is tuned before a 100 TB run
    // (the q_dedup_eval / PilotDocCap discipline). Bit-identical at
    // sf ≤ 0.1 (max doc_id 4999 < cap).
    QDef("q_dedup_edit_distance", Some(s"""
      WITH d AS (SELECT doc_id, text, length(text) AS ln FROM documents
                 WHERE doc_id % 13 = 0 AND doc_id < ${NearDup.PilotDocCap}),
      blk AS (SELECT doc_id, unnest([ln // 20, ln // 20 + 1]) AS b FROM d),
      cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
               FROM blk a JOIN blk b ON a.b = b.b AND a.doc_id < b.doc_id),
      p AS (SELECT doc_a, doc_b, da.ln AS len_a, db.ln AS len_b,
              CAST(least(levenshtein(da.text, db.text), 21) AS BIGINT) AS edit_dist_capped
            FROM cand JOIN d da ON doc_a = da.doc_id JOIN d db ON doc_b = db.doc_id
            WHERE abs(da.ln - db.ln) <= 20)
      SELECT doc_a, doc_b, len_a, len_b, edit_dist_capped,
             CASE WHEN edit_dist_capped <= 20 THEN 1 ELSE 0 END AS near_exact
      FROM p ORDER BY doc_a, doc_b"""),
      (s, d) => {
        val k = 20
        val docs = t(s, d, "documents").filter(col("doc_id") % 13 === 0 &&
            col("doc_id") < NearDup.PilotDocCap)
          .select(col("doc_id"), col("text"), length(col("text")).as("ln"))
        val blk = docs.select(col("doc_id"),
          explode(array(expr(s"ln div $k"), expr(s"ln div $k + 1"))).as("b"))
        val cand = blk.select(col("doc_id").as("doc_a"), col("b"))
          .join(blk.select(col("doc_id").as("doc_b"), col("b")), "b")
          .filter(col("doc_a") < col("doc_b"))
          .select("doc_a", "doc_b").distinct()
        cand
          .join(docs.select(col("doc_id").as("doc_a"), col("text").as("ta"),
            col("ln").as("len_a")), "doc_a")
          .join(docs.select(col("doc_id").as("doc_b"), col("text").as("tb"),
            col("ln").as("len_b")), "doc_b")
          .filter(abs(col("len_a") - col("len_b")) <= k)
          // banded levenshtein: -1 = "beyond k" → cap at k+1
          .withColumn("lv", levenshtein(col("ta"), col("tb"), k))
          .select(col("doc_a"), col("doc_b"), col("len_a"), col("len_b"),
            when(col("lv") === -1, lit(k + 1)).otherwise(col("lv")).cast("long")
              .as("edit_dist_capped"),
            when(col("lv") === -1, 0).otherwise(1).as("near_exact"))
          .orderBy("doc_a", "doc_b")
      }),

    // LSH EVALUATION harness: confusion counts of the minhash-LSH
    // candidate generator (k=8, 4 bands × 2 rows — the
    // q_dedup_minhash_pairs operating point) against exact token-set
    // Jaccard >= 0.4 ground truth, on the same 1-in-7 PILOT sample.
    // THE tuning loop of a production dedup pipeline: before
    // spending a cluster-day LSH-joining 100 TB, you measure band
    // geometry recall/precision on a bounded pilot exactly like
    // this — the truth pass is all-pairs (quadratic) and lives ONLY
    // here, never on the full corpus, and "bounded" must mean
    // FIXED-SIZE, not fixed-fraction: the uncapped 1-in-7 sample
    // grew 154× on 10× data in the r13 slope sweep
    // (NearDup.PilotDocCap). One summary row, born-integer counts +
    // permille ratios (BIGINT div; -1 sentinel when a denominator is
    // empty, so the output is total and exact on any corpus).
    QDef("q_dedup_eval", Some(s"""
      WITH ${tokCte.format(
        s"WHERE doc_id % 7 = 0 AND doc_id < ${NearDup.PilotDocCap}")},
      ${sigSelect(8, "tok")},
      ${bandsSql(8, 2)},
      cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
               FROM bands a JOIN bands b
                 ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
      sz AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
      inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
                FROM tok a JOIN tok b ON a.tok = b.tok AND a.doc_id < b.doc_id
                GROUP BY doc_a, doc_b),
      truth AS (SELECT doc_a, doc_b FROM inter
                JOIN sz sa ON doc_a = sa.doc_id JOIN sz sb ON doc_b = sb.doc_id
                WHERE i * 10 >= 4 * (sa.n + sb.n - i)),
      m AS (SELECT (SELECT count(*) FROM truth) AS n_truth,
                   (SELECT count(*) FROM cand) AS n_cand,
                   (SELECT count(*) FROM truth x JOIN cand c
                      ON x.doc_a = c.doc_a AND x.doc_b = c.doc_b) AS tp)
      SELECT n_truth, n_cand, tp, n_cand - tp AS fp, n_truth - tp AS fn,
             CASE WHEN n_cand = 0 THEN -1 ELSE (1000 * tp) // n_cand END
               AS precision_permille,
             CASE WHEN n_truth = 0 THEN -1 ELSE (1000 * tp) // n_truth END
               AS recall_permille
      FROM m"""),
      (s, d) => {
        val toks = tokDf(s, d, Some(7), pilot = true)
        val truth = NearDup.tokenJaccardPairs(toks, "doc_id", "tok", 4)
          .filter(col("near_dup") === 1).select("doc_a", "doc_b")
        val cand = NearDup.lshCandidatePairs(
          NearDup.lshBands(
            NearDup.minhashSignatures(toks, "doc_id", "tok", 8),
            "doc_id", 8, 2),
          "doc_id")
        truth.withColumn("t", lit(1))
          .join(cand.withColumn("c", lit(1)), Seq("doc_a", "doc_b"), "full_outer")
          .agg(count(col("t")).as("n_truth"), count(col("c")).as("n_cand"),
            count(when(col("t").isNotNull && col("c").isNotNull, 1)).as("tp"))
          .select(col("n_truth"), col("n_cand"), col("tp"),
            (col("n_cand") - col("tp")).as("fp"),
            (col("n_truth") - col("tp")).as("fn"),
            when(col("n_cand") === 0, lit(-1L))
              .otherwise(expr("div(1000 * tp, n_cand)")).as("precision_permille"),
            when(col("n_truth") === 0, lit(-1L))
              .otherwise(expr("div(1000 * tp, n_truth)")).as("recall_permille"))
      }),

    // LSH BUCKET SKEW audit: per-band bucket census — bucket count,
    // member rows, largest bucket, singleton count (buckets that can
    // never produce a candidate), and pair mass Σ s·(s−1)/2, the
    // EXACT number of candidate pairs the band would expand to. This
    // is the pre-flight you run before the LSH join at scale: a
    // degenerate band (one mega-bucket holding half the corpus) shows
    // up here as pair_mass exploding, and sets maxBucket for
    // CappedSortedIds. Cost: two hash aggregates, the second over
    // |buckets| rows — no pair is ever materialized.
    QDef("q_lsh_bucket_skew", Some(s"""
      WITH ${tokCte.format("WHERE doc_id % 7 = 0")}, ${sigSelect(8, "tok")},
      ${bandsSql(8, 2)},
      b AS (SELECT band, bh, count(*) AS sz FROM bands GROUP BY band, bh)
      SELECT band, count(*) AS n_buckets, CAST(sum(sz) AS BIGINT) AS n_rows,
             max(sz) AS max_bucket,
             count(*) FILTER (WHERE sz = 1) AS n_singletons,
             CAST(sum(sz * (sz - 1) // 2) AS BIGINT) AS pair_mass
      FROM b GROUP BY band ORDER BY band"""),
      (s, d) => NearDup.lshBands(
          NearDup.minhashSignatures(tokDf(s, d, Some(7)), "doc_id", "tok", 8),
          "doc_id", 8, 2)
        .groupBy("band", "bh").agg(count(lit(1)).as("sz"))
        .groupBy("band").agg(
          count(lit(1)).as("n_buckets"),
          sum(col("sz")).as("n_rows"),
          max(col("sz")).as("max_bucket"),
          count(when(col("sz") === 1, 1)).as("n_singletons"),
          sum(expr("div(sz * (sz - 1), 2)")).as("pair_mass"))
        .orderBy("band")),

    // INCREMENTAL DEDUP — the 100 TB dedup path: a new delta batch
    // (1-in-5 of the corpus by id, standing in for "docs past the
    // watermark") is deduped AGAINST the existing corpus without ever
    // recomputing corpus-internal pairs. Exact duplicates resolve by
    // content-hash equi-join (keep = smallest matching corpus id);
    // near-duplicates by full-signature minhash match (k=8 as ONE
    // 8-row band — the conservative gate; production tunes band
    // geometry per recall target, same lshBands machinery) as a
    // LEFT SEMI probe into the corpus band table, so no delta×corpus
    // pair set is ever expanded. In production the corpus fp/band
    // tables are the persisted dedup state, appended per batch — the
    // cost per run is O(|delta| + probed buckets), independent of
    // corpus-internal pair counts.
    QDef("q_dedup_incremental", Some(s"""
      WITH ${tokCte.format("")}, ${sigSelect(8, "tok")}, ${bandsSql(8, 8)},
      dl AS (SELECT doc_id, md5(text) AS fp FROM documents WHERE doc_id % 5 = 4),
      cp AS (SELECT md5(text) AS fp, doc_id AS c_id FROM documents
             WHERE doc_id % 5 <> 4),
      ex AS (SELECT dl.doc_id, min(c_id) AS exact_keep
             FROM dl LEFT JOIN cp ON dl.fp = cp.fp GROUP BY dl.doc_id),
      nr AS (SELECT DISTINCT a.doc_id FROM bands a
             WHERE a.doc_id % 5 = 4 AND EXISTS (
               SELECT 1 FROM bands b
               WHERE b.band = a.band AND b.bh = a.bh AND b.doc_id % 5 <> 4))
      SELECT e.doc_id,
             CASE WHEN e.exact_keep IS NOT NULL THEN 'exact_dup'
                  WHEN nr.doc_id IS NOT NULL THEN 'near_dup'
                  ELSE 'novel' END AS verdict,
             coalesce(e.exact_keep, -1) AS exact_keep
      FROM ex e LEFT JOIN nr ON e.doc_id = nr.doc_id ORDER BY e.doc_id"""),
      (s, d) => {
        val docs = t(s, d, "documents")
        val isDelta = col("doc_id") % 5 === 4
        val exact = docs.filter(isDelta)
          .select(col("doc_id"), md5(col("text")).as("fp"))
          .join(docs.filter(!isDelta)
            .select(md5(col("text")).as("fp"), col("doc_id").as("c_id")),
            Seq("fp"), "left")
          .groupBy("doc_id").agg(min(col("c_id")).as("exact_keep"))
        val bands = NearDup.lshBands(
          NearDup.minhashSignatures(tokDf(s, d), "doc_id", "tok", 8),
          "doc_id", 8, 8)
        val near = bands.filter(isDelta)
          .join(bands.filter(!isDelta).select("band", "bh"),
            Seq("band", "bh"), "left_semi")
          .select("doc_id").distinct().withColumn("is_near", lit(1))
        exact.join(near, Seq("doc_id"), "left")
          .select(col("doc_id"),
            when(col("exact_keep").isNotNull, "exact_dup")
              .when(col("is_near") === 1, "near_dup")
              .otherwise("novel").as("verdict"),
            coalesce(col("exact_keep"), lit(-1L)).as("exact_keep"))
          .orderBy("doc_id")
      }),

    // Dedup CLUSTERS: connected components over the token-Jaccard
    // >= 0.6 near-dup graph (1-in-13 sample) — every doc labeled with
    // its component's smallest doc id (cluster id = deterministic
    // survivor). Spark side is iterative min-label propagation
    // (NearDup.connectedComponents); the oracle walks the same graph
    // with a recursive CTE. Pair generation reuses the exact
    // integer-cross-multiplied Jaccard predicate, hub-capped
    // (df > TokenDfCap dropped from the intersection join only, sizes
    // full — identical edge set at tested SFs, bounded fan-out at any
    // SF; the cap rides the oracle's kept CTE).
    QDef("q_dedup_cluster", Some(s"""
      WITH RECURSIVE ${tokCte.format("WHERE doc_id % 13 = 0")},
      sz AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
      kept AS (SELECT t.doc_id, t.tok FROM tok t JOIN (
                 SELECT tok FROM tok GROUP BY tok
                 HAVING count(*) <= ${NearDup.TokenDfCap}) lv USING (tok)),
      inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
                FROM kept a JOIN kept b ON a.tok = b.tok AND a.doc_id < b.doc_id
                GROUP BY doc_a, doc_b),
      pairs AS (SELECT doc_a, doc_b FROM inter
                JOIN sz sa ON doc_a = sa.doc_id JOIN sz sb ON doc_b = sb.doc_id
                WHERE i * 10 >= 6 * (sa.n + sb.n - i)),
      nodes AS (SELECT doc_id FROM documents WHERE doc_id % 13 = 0),
      edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
                UNION ALL SELECT doc_b, doc_a FROM pairs),
      reach AS (
        SELECT doc_id AS id, doc_id AS r FROM nodes
        UNION
        SELECT reach.id, e.dst FROM reach JOIN edges e ON e.src = reach.r)
      SELECT id AS doc_id, min(r) AS cluster_id,
             CASE WHEN min(r) = id THEN 1 ELSE 0 END AS is_survivor
      FROM reach GROUP BY id ORDER BY doc_id"""),
      (s, d) => {
        val edges = NearDup.tokenJaccardPairs(tokDf(s, d, Some(13)), "doc_id", "tok", 6,
            dfCap = Some(NearDup.TokenDfCap))
          .filter(col("near_dup") === 1).select("doc_a", "doc_b")
        val nodes = t(s, d, "documents").filter(col("doc_id") % 13 === 0)
          .select("doc_id")
        NearDup.connectedComponents(nodes, "doc_id", edges)
          .withColumn("is_survivor",
            when(col("cluster_id") === col("doc_id"), 1).otherwise(0))
          .orderBy("doc_id")
      }),

    // Cluster REPRESENTATIVE selection: within each near-dup cluster
    // keep the longest document (doc_id tiebreak) — the "keep best,
    // drop rest" step that turns cluster labels into an actual
    // deduplicated corpus (min-id survivorship in q_dedup_cluster is
    // arbitrary; real pipelines keep by a quality signal). Same
    // mod-13 hub-capped Jaccard + connected-components machinery, then
    // ONE cluster-partitioned window — clusters are near-dup groups,
    // inherently small, so the window never sees a hot partition and
    // there is no global sort.
    QDef("q_dedup_cluster_rep", Some(s"""
      WITH RECURSIVE ${tokCte.format("WHERE doc_id % 13 = 0")},
      sz AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
      kept AS (SELECT t.doc_id, t.tok FROM tok t JOIN (
                 SELECT tok FROM tok GROUP BY tok
                 HAVING count(*) <= ${NearDup.TokenDfCap}) lv USING (tok)),
      inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
                FROM kept a JOIN kept b ON a.tok = b.tok AND a.doc_id < b.doc_id
                GROUP BY doc_a, doc_b),
      pairs AS (SELECT doc_a, doc_b FROM inter
                JOIN sz sa ON doc_a = sa.doc_id JOIN sz sb ON doc_b = sb.doc_id
                WHERE i * 10 >= 6 * (sa.n + sb.n - i)),
      nodes AS (SELECT doc_id FROM documents WHERE doc_id % 13 = 0),
      edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
                UNION ALL SELECT doc_b, doc_a FROM pairs),
      reach AS (
        SELECT doc_id AS id, doc_id AS r FROM nodes
        UNION
        SELECT reach.id, e.dst FROM reach JOIN edges e ON e.src = reach.r),
      cc AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id),
      q AS (SELECT cc.doc_id, cc.cluster_id, d.n_chars,
              row_number() OVER (PARTITION BY cc.cluster_id
                ORDER BY d.n_chars DESC, cc.doc_id) AS rn
            FROM cc JOIN documents d ON d.doc_id = cc.doc_id)
      SELECT doc_id, cluster_id, n_chars,
             max(CASE WHEN rn = 1 THEN doc_id END)
               OVER (PARTITION BY cluster_id) AS rep_id,
             CASE WHEN rn = 1 THEN 1 ELSE 0 END AS is_rep
      FROM q ORDER BY doc_id"""),
      (s, d) => {
        val edges = NearDup.tokenJaccardPairs(tokDf(s, d, Some(13)), "doc_id", "tok", 6,
            dfCap = Some(NearDup.TokenDfCap))
          .filter(col("near_dup") === 1).select("doc_a", "doc_b")
        val docs = t(s, d, "documents").filter(col("doc_id") % 13 === 0)
        val byCluster = org.apache.spark.sql.expressions.Window
          .partitionBy("cluster_id")
        val ranked = NearDup
          .connectedComponents(docs.select("doc_id"), "doc_id", edges)
          .join(docs.select("doc_id", "n_chars"), Seq("doc_id"))
          .withColumn("rn", row_number().over(
            byCluster.orderBy(col("n_chars").desc, col("doc_id"))))
        ranked
          .withColumn("rep_id",
            max(when(col("rn") === 1, col("doc_id"))).over(byCluster))
          .select(col("doc_id"), col("cluster_id"), col("n_chars"),
            col("rep_id"),
            when(col("rn") === 1, 1).otherwise(0).as("is_rep"))
          .orderBy("doc_id")
      }),

    // Quality FILTER chain (Gopher/C4-style): ordered reject rules —
    // token-count bounds, mean-token-length band, type/token
    // diversity, stopword presence — with the FIRST failing rule
    // recorded as the reject reason. All predicates are integer-exact
    // (cross-multiplied, no float division), and the whole chain is
    // one codegen'd projection over the documents scan.
    QDef("q_doc_quality_filter", Some("""
      WITH d AS (SELECT doc_id,
        list_filter(string_split(text, ' '), t -> t <> '') AS toks FROM documents),
      m AS (SELECT doc_id,
        CAST(len(toks) AS BIGINT) AS n_tokens,
        CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
        CAST(len(list_filter(toks, t -> t IN ('the', 'a'))) AS BIGINT) AS n_stop,
        CAST(COALESCE(list_sum(list_transform(toks, t -> length(t))), 0) AS BIGINT) AS tok_chars
        FROM d)
      SELECT doc_id, n_tokens,
             CASE WHEN n_tokens IS NULL THEN 'unscorable'
                  WHEN n_tokens < 20 THEN 'too_short'
                  WHEN n_tokens > 90 THEN 'too_long'
                  WHEN 100 * tok_chars < 420 * n_tokens
                       OR 100 * tok_chars > 520 * n_tokens THEN 'word_length'
                  WHEN 2 * n_distinct < n_tokens THEN 'low_diversity'
                  WHEN n_stop = 0 THEN 'no_stopwords'
                  ELSE NULL END AS reject_reason,
             CASE WHEN n_tokens >= 20 AND n_tokens <= 90
                       AND 100 * tok_chars >= 420 * n_tokens
                       AND 100 * tok_chars <= 520 * n_tokens
                       AND 2 * n_distinct >= n_tokens
                       AND n_stop > 0 THEN 1 ELSE 0 END AS keep
      FROM m ORDER BY doc_id"""),
      // the verdict tree lives in TA.withQualityVerdict — ONE
      // definition shared with the streaming gate (DocStream), so
      // this oracle check covers both
      (s, d) => TA.withQualityVerdict(t(s, d, "documents"), "text")
        .select("doc_id", "n_tokens", "reject_reason", "keep")
        .orderBy("doc_id")),

    // QUALITY GATE WATERFALL: the attrition ledger of the filter
    // chain — per gate (in q_doc_quality_filter's first-match CASE
    // order), how many docs reached it, how many it dropped, how many
    // survived. The last row's n_surviving IS the kept-corpus size;
    // a gate dropping far more than its neighbors is either doing its
    // job or miscalibrated, and this 6-row table is how a curation
    // review tells which before anyone re-tunes a threshold. The
    // verdict tree is the ONE shared TA.withQualityVerdict (batch,
    // stream, and this census can't desync); the waterfall itself is
    // one map-side-combined count per reason + a 6-row spine window —
    // the corpus is scanned once and never shuffled.
    QDef("q_quality_gate_waterfall", Some("""
      WITH d AS (SELECT doc_id,
        list_filter(string_split(text, ' '), t -> t <> '') AS toks FROM documents),
      m AS (SELECT
        CAST(len(toks) AS BIGINT) AS n_tokens,
        CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
        CAST(len(list_filter(toks, t -> t IN ('the', 'a'))) AS BIGINT) AS n_stop,
        CAST(COALESCE(list_sum(list_transform(toks, t -> length(t))), 0) AS BIGINT) AS tok_chars
        FROM d),
      r AS (SELECT CASE WHEN n_tokens IS NULL THEN 'unscorable'
                  WHEN n_tokens < 20 THEN 'too_short'
                  WHEN n_tokens > 90 THEN 'too_long'
                  WHEN 100 * tok_chars < 420 * n_tokens
                       OR 100 * tok_chars > 520 * n_tokens THEN 'word_length'
                  WHEN 2 * n_distinct < n_tokens THEN 'low_diversity'
                  WHEN n_stop = 0 THEN 'no_stopwords' END AS reject_reason
            FROM m),
      dr AS (SELECT reject_reason, CAST(count(*) AS BIGINT) AS n_dropped
             FROM r WHERE reject_reason IS NOT NULL GROUP BY reject_reason),
      tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM r),
      sp AS (SELECT * FROM (VALUES (1, 'unscorable'), (2, 'too_short'),
               (3, 'too_long'), (4, 'word_length'), (5, 'low_diversity'),
               (6, 'no_stopwords')) AS v(gate_order, gate)),
      w AS (SELECT sp.gate_order, sp.gate, coalesce(dr.n_dropped, 0) AS n_dropped
            FROM sp LEFT JOIN dr ON dr.reject_reason = sp.gate)
      SELECT CAST(gate_order AS BIGINT) AS gate_order, gate,
             CAST(tot.n_total - coalesce(sum(n_dropped) OVER (ORDER BY gate_order
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS n_entering,
             CAST(n_dropped AS BIGINT) AS n_dropped,
             CAST(tot.n_total - sum(n_dropped) OVER (ORDER BY gate_order)
               AS BIGINT) AS n_surviving
      FROM w, tot ORDER BY gate_order"""),
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val v = TA.withQualityVerdict(t(s, d, "documents"), "text")
          .select("reject_reason")
        val dr = v.filter(col("reject_reason").isNotNull)
          .groupBy("reject_reason").agg(count(lit(1)).as("n_dropped"))
        val tot = v.agg(count(lit(1)).as("n_total"))
        val spine = s.createDataFrame(Seq(
          (1L, "unscorable"), (2L, "too_short"), (3L, "too_long"),
          (4L, "word_length"), (5L, "low_diversity"), (6L, "no_stopwords")))
          .toDF("gate_order", "gate")
        // the 6-row spine windows run single-partition by construction
        // (bounded by the gate count, never the corpus)
        val ord = Window.orderBy("gate_order")
        val before = ord.rowsBetween(Window.unboundedPreceding, -1)
        spine.join(dr.withColumnRenamed("reject_reason", "gate"), Seq("gate"), "left")
          .crossJoin(broadcast(tot))
          .withColumn("n_dropped", coalesce(col("n_dropped"), lit(0L)))
          .select(col("gate_order"), col("gate"),
            (col("n_total") - coalesce(sum(col("n_dropped")).over(before), lit(0L)))
              .as("n_entering"),
            col("n_dropped"),
            (col("n_total") - sum(col("n_dropped")).over(ord)).as("n_surviving"))
          .orderBy("gate_order")
      }),

    // Deterministic hash-stratified sampling (training-data mixture
    // balancing): downsample the over-represented stratum ('en' here)
    // to a 4-in-16 hash rate, keep other strata whole. The keep
    // decision is a pure seed-stamped function of the doc id — the
    // same split reproduces on any engine, any run, any partitioning
    // (the property that matters for train/eval splits), unlike
    // rand()-based sampling.
    QDef("q_sample_stratified", Some("""
      SELECT doc_id, lang FROM documents
      WHERE lang <> 'en'
         OR CAST(('0x' || substr(md5('mix1|' || doc_id), 1, 1)) AS INTEGER) < 4
      ORDER BY doc_id"""),
      (s, d) => t(s, d, "documents")
        .filter(col("lang") =!= "en" ||
          conv(substring(md5(concat(lit("mix1|"), col("doc_id").cast(StringType))), 1, 1),
            16, 10).cast(IntegerType) < 4)
        .select("doc_id", "lang")
        .orderBy("doc_id")),

    // Multimodal envelope metadata: binary payload column → typed
    // mapPartitions extraction (decode stubbed; plumbing real —
    // graft.multimodal.Multimodal).
    QDef("q_multimodal_meta", Some("""
      SELECT doc_id, CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
             substr(md5(text), 1, 8) AS content_fp, 'decoded' AS decode_status
      FROM documents ORDER BY doc_id"""),
      (s, d) => graft.multimodal.Multimodal.extractMeta(
        graft.multimodal.Multimodal.mediaFromDocuments(s, d))
        .toDF().orderBy("doc_id")),

    // Multimodal frame sampling: one row per contiguous payload slice
    // (video frame-sample / audio chunk stand-in) — a row-generating
    // transform whose oracle replays the slice arithmetic with
    // substr on the ASCII corpus.
    QDef("q_multimodal_frames", Some {
      val frames = 3
      s"""
      WITH f AS (SELECT doc_id, text, unnest(range(0, $frames)) AS frame_id FROM documents),
      s AS (SELECT doc_id, CAST(frame_id AS INTEGER) AS frame_id,
                   (frame_id * length(text)) // $frames AS fr,
                   ((frame_id + 1) * length(text)) // $frames AS un,
                   text
            FROM f)
      SELECT doc_id, frame_id, CAST(un - fr AS BIGINT) AS n_bytes,
             ord(substr(text, CAST(fr + 1 AS INTEGER), 1)) AS first_b,
             ord(substr(text, CAST(un AS INTEGER), 1)) AS last_b,
             substr(md5(substr(text, CAST(fr + 1 AS INTEGER), CAST(un - fr AS INTEGER))), 1, 8) AS frame_fp
      FROM s WHERE un > fr
      ORDER BY doc_id, frame_id"""
    },
      (s, d) => graft.multimodal.Multimodal.frameSample(
        graft.multimodal.Multimodal.mediaFromDocuments(s, d), 3)
        .toDF().orderBy("doc_id", "frame_id")),

    // Multimodal RESIZE stand-in: fixed-stride byte downsample (every
    // 4th byte) with input/output sizes and output fingerprint — the
    // second codec stage variant (decode→resample→re-encode shape);
    // the oracle replays the stride pick with substr on the ASCII
    // corpus. Same typed mapPartitions plumbing as the other codec
    // stages: blobs stay in their own pruned column, one codec init
    // per partition.
    QDef("q_multimodal_resize", Some("""
      WITH i AS (SELECT doc_id, unnest(range(1, length(text) + 1, 4)) AS i
                 FROM documents WHERE length(text) >= 1),
      r AS (SELECT i.doc_id,
                   string_agg(substr(d.text, CAST(i.i AS INTEGER), 1), '' ORDER BY i.i) AS ds
            FROM i JOIN documents d ON d.doc_id = i.doc_id
            GROUP BY i.doc_id)
      SELECT r.doc_id, CAST(length(d.text) AS BIGINT) AS n_bytes_in,
             CAST(length(r.ds) AS BIGINT) AS n_bytes_out,
             substr(md5(r.ds), 1, 8) AS out_fp
      FROM r JOIN documents d ON d.doc_id = r.doc_id ORDER BY r.doc_id"""),
      (s, d) => graft.multimodal.Multimodal.downsample(
        graft.multimodal.Multimodal.mediaFromDocuments(s, d), 4)
        .toDF().orderBy("doc_id")),

    // Multimodal feature extraction: the stub decoder samples payload
    // bytes at fixed strides (k/256 dyadic rationals — exact in both
    // engines' DECIMAL), which DuckDB replays with ord(substr(...)) on
    // the ASCII corpus. A real codec swaps in behind the same
    // mapPartitions plumbing and schema.
    QDef("q_multimodal_features", Some {
      val dim = 4
      // length(text) == byte count on the ASCII corpus; // is floor
      // division matching the stub's integer stride arithmetic
      val cols = (0 until dim).map(i =>
        s"CAST(CAST(CASE WHEN length(text) = 0 THEN 0 ELSE " +
          s"ord(substr(text, (($i * length(text)) // $dim) + 1, 1)) END / 256.0 " +
          s"AS DECIMAL(12,8)) AS VARCHAR) AS f$i")
        .mkString(", ")
      s"SELECT doc_id, $cols FROM documents ORDER BY doc_id"
    },
      (s, d) => {
        val dim = 4
        val feats = graft.multimodal.Multimodal.extractFeatures(
          graft.multimodal.Multimodal.mediaFromDocuments(s, d), dim).toDF()
        feats.select(col("doc_id") +:
          (0 until dim).map(i =>
            element_at(col("feature"), i + 1).cast("decimal(12,8)")
              .cast("string").as(s"f$i")): _*)
          .orderBy("doc_id")
      }),

    // BM25 RETRIEVAL SCORING, log-free integer form: top-20 docs for
    // a declared query-term set, with the classic k1=1.2 / b=0.75
    // saturation + length normalization carried through EXACT integer
    // arithmetic — multiply the tf fraction by 10·L so the k1/b
    // rationals clear, and swap the usual log-idf for the
    // probability-ratio core (N−df+1)/(df+1) at permille scale
    // (monotone in the same direction; the log is a display
    // transform this engine leaves to consumers, keeping the oracle
    // surface engine-exact — the discipline that fixed the round-7
    // statistics reds). Per-term contribution:
    //   ⌊ ⌊1000(N−df+1)/(df+1)⌋ · 22·tf·L / (10·L·tf + 3·L + 9·dl·N) ⌋.
    // Shape: dl rides the exploded tokens as a grouping key so tf
    // needs NO join back to a per-doc table; df is a term-count dim
    // (≤ |query|) joined broadcast; (N, L) is a 1-row broadcast
    // scalar; top-20 is a TakeOrdered. One corpus pass + one narrow
    // stats pass — no all-docs shuffle beyond the tf aggregate.
    QDef("q_bm25_topk", Some("""
      WITH d AS (SELECT doc_id,
          list_filter(string_split(text, ' '), t -> t <> '') AS toks FROM documents),
      c AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(len(toks)) AS BIGINT) AS l
            FROM d WHERE len(toks) > 0),
      tf AS (SELECT doc_id, dl, term, CAST(count(*) AS BIGINT) AS tf FROM
               (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, unnest(toks) AS term
                FROM d WHERE len(toks) > 0)
             WHERE term IN ('spark', 'join', 'window') GROUP BY 1, 2, 3),
      df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
      sc AS (SELECT tf.doc_id,
               (((1000 * (c.n - df.df + 1)) // (df.df + 1)) * (22 * tf.tf * c.l))
                 // (10 * c.l * tf.tf + 3 * c.l + 9 * tf.dl * c.n) AS contrib
             FROM tf JOIN df ON tf.term = df.term, c)
      SELECT doc_id, CAST(sum(contrib) AS BIGINT) AS bm25_milli
      FROM sc GROUP BY 1 ORDER BY bm25_milli DESC, doc_id LIMIT 20"""),
      (s, d) => {
        val terms = Seq("spark", "join", "window")
        val docs = t(s, d, "documents")
          .select(col("doc_id"), TA.tokens(col("text")).as("toks"))
          .filter(size(col("toks")) > 0)
        val c = docs.agg(count(lit(1)).as("n"),
          sum(size(col("toks"))).cast("long").as("l"))
        val tf = docs
          .select(col("doc_id"), size(col("toks")).cast("long").as("dl"),
            explode(col("toks")).as("term"))
          .filter(col("term").isin(terms: _*))
          .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
        val df = tf.groupBy(col("term").as("df_term")).agg(count(lit(1)).as("df"))
        tf.join(broadcast(df), col("term") === col("df_term"))
          .crossJoin(broadcast(c))
          .select(col("doc_id"),
            expr("div(div(1000 * (n - df + 1), df + 1) * (22 * tf * l), " +
              "10 * l * tf + 3 * l + 9 * dl * n)").as("contrib"))
          .groupBy("doc_id").agg(sum("contrib").cast("long").as("bm25_milli"))
          .orderBy(col("bm25_milli").desc, col("doc_id"))
          .limit(20)
      }),

    // BPE MERGE STATISTIC: global top-20 adjacent character pairs
    // inside tokens — the count a byte-pair-encoding trainer
    // maximizes at every merge step (one full iteration of the BPE
    // inner loop, expressed as a plan instead of a driver loop).
    // Pair generation is transform(sequence) INSIDE the scan stage —
    // a narrow ≤(len−1)-way fan-out, never a per-char shuffle; the
    // single shuffle is the final pair aggregate (alphabet²-bounded
    // key space, so map-side combine collapses it to KBs per task at
    // any corpus size). Tokens shorter than 2 chars are filtered on
    // BOTH sides before fan-out (Spark's sequence(1,0) would run
    // DESCENDING — [1,0] — where DuckDB's range(1,1) is empty: the
    // guard is correctness, not just economy).
    QDef("q_bpe_pair_count", Some("""
      WITH d AS (SELECT doc_id,
          list_filter(string_split(text, ' '), t -> t <> '') AS toks FROM documents),
      tok AS (SELECT unnest(toks) AS tok FROM d),
      pr AS (SELECT unnest(list_transform(range(1, length(tok)),
               i -> substr(tok, CAST(i AS INTEGER), 2))) AS pair
             FROM tok WHERE length(tok) >= 2)
      SELECT pair, CAST(count(*) AS BIGINT) AS cnt
      FROM pr GROUP BY 1 ORDER BY cnt DESC, pair LIMIT 20"""),
      (s, d) =>
        t(s, d, "documents")
          .select(explode(TA.tokens(col("text"))).as("tok"))
          .filter(length(col("tok")) >= 2)
          .select(explode(expr(
            "transform(sequence(1, length(tok) - 1), i -> substring(tok, i, 2))"))
            .as("pair"))
          .groupBy("pair").agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("pair")).limit(20)),

    // CHARACTER GINI IMPURITY per doc: 1000·(1 − Σᵢ cᵢ²/n²) over
    // non-space characters — the log-free diversity twin of character
    // entropy (low impurity ⇒ repeated-character junk, keyboard
    // mashing, padding; a standard cheap quality screen next to
    // q_doc_quality_ratios' token-level ratios). Exactly integral:
    // impurity_permille = 1000 − ⌊1000·Σc²/n²⌋. Shape: explode to
    // (doc, char) → map-side-combined count (keys bounded by
    // |alphabet|·docs) → per-doc aggregate; n ≤ doc length keeps
    // 1000·Σc² ≤ 1000·n² well inside a long for any real doc.
    QDef("q_char_gini", Some("""
      WITH ch AS (SELECT doc_id, c, CAST(count(*) AS BIGINT) AS cnt FROM
          (SELECT doc_id, unnest(string_split_regex(text, '')) AS c FROM documents)
        WHERE c <> ' ' AND c <> '' GROUP BY 1, 2),
      a AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n,
              CAST(sum(cnt * cnt) AS BIGINT) AS s2 FROM ch GROUP BY 1)
      SELECT doc_id, n, 1000 - (1000 * s2) // (n * n) AS gini_permille
      FROM a WHERE n > 0 ORDER BY doc_id"""),
      (s, d) =>
        t(s, d, "documents")
          .select(col("doc_id"), explode(split(col("text"), "")).as("c"))
          .filter(col("c") =!= " " && col("c") =!= "")
          .groupBy("doc_id", "c").agg(count(lit(1)).as("cnt"))
          .groupBy("doc_id")
          .agg(sum("cnt").cast("long").as("n"),
            sum(col("cnt") * col("cnt")).cast("long").as("s2"))
          .filter(col("n") > 0)
          .select(col("doc_id"), col("n"),
            (lit(1000L) - expr("div(1000 * s2, n * n)")).as("gini_permille"))
          .orderBy("doc_id")),

    // EXACT-DUP RATE BY SOURCE: per ingestion source, docs vs
    // distinct content hashes and the dup share in permille — the
    // per-feed DQ scoreboard that decides WHERE dedup spend goes
    // (q_dedup_exact lists the dup rows; this is the management
    // view). count(DISTINCT md5) is one map-side-combined aggregate
    // per source; at 100 TB swap the exact distinct for the HLL
    // sketch (q_hll_merge's contract) — the query shape is identical.
    QDef("q_dup_rate_by_source", Some("""
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_distinct,
             (1000 * (count(*) - count(DISTINCT md5(text)))) // count(*) AS dup_permille
      FROM documents GROUP BY 1 ORDER BY source"""),
      (s, d) =>
        t(s, d, "documents")
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            countDistinct(md5(col("text"))).as("n_distinct"))
          .select(col("source"), col("n_docs"), col("n_distinct"),
            expr("div(1000 * (n_docs - n_distinct), n_docs)").as("dup_permille"))
          .orderBy("source")),

    // SOFT DEDUPLICATION WEIGHTS — down-weight duplicates instead of
    // dropping them: every doc keeps sampling weight 1/|its exact
    // cluster|, so each distinct CONTENT contributes unit mass while
    // every copy stays available (the soft alternative to
    // q_dedup_exact's hard survivor pick — recent LLM-data work
    // prefers it because hard dedup throws away the duplication
    // signal itself and can distort the source mix). Weights are
    // permille-QUANTIZED (w = 1000 div cluster_size) so the rollup
    // is integer-exact on both engines — the quantization is the
    // operator's contract, not an approximation note. Per-source
    // rollup: doc count, kept mass, effective weight, and the
    // permille the sampler saves vs uniform. Scale shape: ONE corpus
    // scan collapses rows to the (fp, source) support table
    // (map-side combined — duplicates compress in the map phase);
    // cluster sizes re-aggregate that table by fp (exchange reused)
    // and join back fp-keyed, so every join input is support-table
    // sized — the corpus is never scanned twice nor joined at row
    // grain. Clusters SPAN sources, so per-source kept mass
    // deliberately reflects cross-source duplication (a source of
    // pure copies of another source's docs rolls up near-zero kept
    // mass).
    QDef("q_soft_dedup_weights", Some("""
      WITH g AS (SELECT md5(text) AS fp, source, CAST(count(*) AS BIGINT) AS cnt
                 FROM documents GROUP BY 1, 2),
      f AS (SELECT fp, CAST(sum(cnt) AS BIGINT) AS csz FROM g GROUP BY 1)
      SELECT source, CAST(sum(cnt) AS BIGINT) AS n_docs,
             CAST(sum(cnt * (1000 // csz)) AS BIGINT) AS kept_mass_permille,
             CAST(sum(cnt * (1000 // csz)) // sum(cnt) AS BIGINT)
               AS eff_weight_permille,
             CAST(1000 - sum(cnt * (1000 // csz)) // sum(cnt) AS BIGINT)
               AS saved_permille
      FROM g JOIN f USING (fp)
      GROUP BY source ORDER BY source"""),
      (s, d) => {
        val g = t(s, d, "documents")
          .select(col("source"), md5(col("text")).as("fp"))
          .groupBy("fp", "source").agg(count(lit(1)).as("cnt"))
        val f = g.groupBy("fp").agg(sum("cnt").cast(LongType).as("csz"))
        g.join(f, "fp")
          .groupBy("source")
          .agg(sum("cnt").cast(LongType).as("n_docs"),
            sum(col("cnt") * expr("div(1000, csz)")).cast(LongType)
              .as("kept_mass_permille"))
          .select(col("source"), col("n_docs"), col("kept_mass_permille"),
            expr("div(kept_mass_permille, n_docs)").as("eff_weight_permille"),
            (lit(1000L) - expr("div(kept_mass_permille, n_docs)"))
              .as("saved_permille"))
          .orderBy("source")
      }),

    // SEGMENT-LEVEL DEDUP (CCNet-style line dedup adapted to
    // newline-free docs): the corpus is cut into consecutive 8-token
    // segments, a segment occurring in ≥2 DISTINCT docs is
    // boilerplate-suspect, and every doc reports its kept-token mass
    // (tokens whose segment is corpus-unique) in exact permille —
    // the paragraph/line dedup pass CCNet/RefinedWeb run BEFORE
    // doc-level MinHash, which catches shared headers/footers that
    // whole-doc dedup never sees (this corpus: 153 repeated segments
    // across 500 docs). Plan: segmentation is a zero-shuffle
    // transform(sequence)+explode INSIDE the scan stage (no
    // pre-shuffle token explode); the segment-df aggregate
    // map-side-combines, and the join back to the segment stream is
    // co-keyed on the segment string — at 100 TB both sides hash on
    // seg, one exchange each, state bounded by |distinct segments|.
    QDef("q_segment_dedup", Some("""
      WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      seg AS (
        SELECT doc_id,
               array_to_string(toks[(8*i+1):(8*i+8)], ' ') AS seg,
               least(8, len(toks) - 8*i) AS ntok
        FROM d, UNNEST(range(0, (len(toks)+7)//8)) AS t(i)),
      df AS (SELECT seg, count(DISTINCT doc_id) AS df FROM seg GROUP BY 1)
      SELECT s.doc_id, CAST(sum(s.ntok) AS BIGINT) AS total_tokens,
             CAST(sum(CASE WHEN df.df = 1 THEN s.ntok ELSE 0 END) AS BIGINT)
               AS kept_tokens,
             CAST((1000 * sum(CASE WHEN df.df = 1 THEN s.ntok ELSE 0 END))
               // sum(s.ntok) AS BIGINT) AS kept_permille
      FROM seg s JOIN df ON s.seg = df.seg
      GROUP BY 1 ORDER BY doc_id"""),
      (s, d) => {
        val seg = t(s, d, "documents")
          .select(col("doc_id"), split(col("text"), " ").as("toks"))
          .select(col("doc_id"), expr(
            """explode(transform(sequence(0, cast((size(toks) + 7) div 8 as int) - 1),
                 i -> struct(concat_ws(' ', slice(toks, 8*i + 1, 8)) as seg,
                             least(8, size(toks) - 8*i) as ntok)))""").as("sg"))
          .select(col("doc_id"), col("sg.seg").as("seg"),
            col("sg.ntok").cast("long").as("ntok"))
        val df = seg.groupBy("seg").agg(countDistinct("doc_id").as("df"))
        seg.join(df, "seg")
          .groupBy("doc_id")
          .agg(sum("ntok").cast("long").as("total_tokens"),
            sum(when(col("df") === 1L, col("ntok")).otherwise(0L))
              .cast("long").as("kept_tokens"))
          .select(col("doc_id"), col("total_tokens"), col("kept_tokens"),
            expr("div(1000 * kept_tokens, total_tokens)").as("kept_permille"))
          .orderBy("doc_id")
      }),

    // KEYWORD IN CONTEXT (KWIC): every occurrence of a declared term
    // with its ±3-token window — the concordance view a corpus
    // inspector (or a contamination analyst) reads before deciding a
    // filter rule. Zero joins: posexplode CARRIES the token array
    // alongside each position, so both context slices are pure
    // projections off the same row (the self-join a naive
    // position-table formulation would pay never exists). Positions
    // are 1-based on the oracle surface; Spark's 0-based posexplode
    // is shifted at the boundary.
    QDef("q_kwic", Some("""
      WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      p AS (SELECT doc_id, i FROM d,
            UNNEST(generate_series(1, len(toks))) AS g(i)
            WHERE toks[i] = 'spark')
      SELECT p.doc_id, CAST(p.i AS BIGINT) AS pos,
             coalesce(array_to_string(d.toks[greatest(1, p.i - 3):(p.i - 1)], ' '),
                      '') AS left_ctx,
             coalesce(array_to_string(d.toks[(p.i + 1):(p.i + 3)], ' '), '')
               AS right_ctx
      FROM p JOIN d ON p.doc_id = d.doc_id ORDER BY p.doc_id, pos"""),
      (s, d) =>
        t(s, d, "documents")
          .select(col("doc_id"), split(col("text"), " ").as("toks"))
          .select(col("doc_id"), col("toks"),
            posexplode(col("toks")).as(Seq("p0", "tok")))
          .filter(col("tok") === "spark")
          .select(col("doc_id"), (col("p0") + 1).cast("long").as("pos"),
            expr("""concat_ws(' ',
              slice(toks, greatest(1, p0 + 1 - 3),
                    (p0 + 1) - greatest(1, p0 + 1 - 3)))""").as("left_ctx"),
            expr("concat_ws(' ', slice(toks, p0 + 2, 3))").as("right_ctx"))
          .orderBy("doc_id", "pos"))
  ) ++ Seq(

    // RAKE keyphrase extraction (Rapid Automatic Keyword Extraction):
    // candidate phrases are the maximal stopword-free token runs
    // (gaps-and-islands over token positions, stopset = the corpus'
    // {'the','a'}); each word scores deg/freq where freq counts its
    // occurrences and deg sums the lengths of the phrases those
    // occurrences sit in; a phrase scores the sum of its words'
    // scores. Everything is keyed narrow aggregation: the phrase
    // split is per-doc windowing, word stats are one map-side-combined
    // vocab-sized agg (broadcast back), and identical phrase strings
    // share one global score, so the final rollup is phrase-keyed —
    // no pair expansion anywhere, corpus scans stay linear at 100 TB.
    // Word scores are born-integer milli-units (1000·deg // freq).
    QDef("q_rake_keyphrases", Some("""
      WITH d AS (SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks FROM documents),
      pt AS (SELECT doc_id, unnest(list_transform(range(1, len(toks) + 1),
               i -> {'pos': i, 'tok': toks[i]})) AS s FROM d),
      occ AS (SELECT doc_id, s.pos AS pos, s.tok AS tok,
                s.pos - row_number() OVER (PARTITION BY doc_id ORDER BY s.pos)
                  AS grp
              FROM pt WHERE s.tok NOT IN ('the', 'a')),
      ph AS (SELECT doc_id, grp, count(*) AS plen,
                string_agg(tok, ' ' ORDER BY pos) AS phrase
             FROM occ GROUP BY 1, 2),
      oc2 AS (SELECT o.tok, o.doc_id, o.grp, p.plen
              FROM occ o JOIN ph p USING (doc_id, grp)),
      ws AS (SELECT tok, CAST((1000 * sum(plen)) // count(*) AS BIGINT)
                      AS wscore_milli
             FROM oc2 GROUP BY tok),
      ps AS (SELECT o.doc_id, o.grp, CAST(sum(w.wscore_milli) AS BIGINT)
                      AS score_milli
             FROM oc2 o JOIN ws w USING (tok) GROUP BY 1, 2)
      SELECT p.phrase, ps.score_milli, CAST(count(*) AS BIGINT) AS n_occ
      FROM ph p JOIN ps USING (doc_id, grp)
      GROUP BY 1, 2 ORDER BY score_milli DESC, phrase LIMIT 25"""),
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val occ = t(s, d, "documents")
          .select(col("doc_id"), posexplode(TA.tokens(col("text"))))
          .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("tok"))
          .filter(!col("tok").isin("the", "a"))
          .withColumn("grp", col("pos") -
            row_number().over(Window.partitionBy("doc_id").orderBy("pos")))
        val ph = occ.groupBy("doc_id", "grp")
          .agg(count(lit(1)).as("plen"),
            expr("concat_ws(' ', transform(array_sort(collect_list(struct(pos, tok))), x -> x.tok))")
              .as("phrase"))
        val oc2 = occ.join(ph.select("doc_id", "grp", "plen"), Seq("doc_id", "grp"))
        val ws = oc2.groupBy("tok")
          .agg(expr("div(1000 * sum(plen), count(1))").cast("long").as("wscore_milli"))
        val ps = oc2.join(broadcast(ws), Seq("tok"))
          .groupBy("doc_id", "grp")
          .agg(sum("wscore_milli").cast("long").as("score_milli"))
        ph.join(ps, Seq("doc_id", "grp"))
          .groupBy("phrase", "score_milli")
          .agg(count(lit(1)).as("n_occ"))
          .orderBy(col("score_milli").desc, col("phrase")).limit(25)
      }),

    // Bag-of-words COSINE near-dup pairs via the inverted-index
    // self-join — the term-frequency-weighted sibling of
    // q_dedup_token_jaccard (set overlap): dot products accumulate
    // ONLY through shared postings (token-keyed equi-join, never
    // all-pairs), squared norms are one per-doc integer agg, and the
    // cos ≥ 0.8 gate is the exact integer cross-multiplication
    // 100·dp² ≥ 64·|a|²·|b|² — no float decides membership. Same
    // 1-in-13 doc_id-mod sample as the other pair queries, on the
    // fixed PILOT prefix (this corpus' 31-token vocabulary makes
    // every token a full posting list, so survivors at ANY cosine
    // bar are Θ(N²) by the data — measured 3.1k → 285k pairs on 10×
    // docs before the cap; real corpora get the df-cap/prefix
    // tricks NearDup documents, and the pair-LIST face is a pilot —
    // NearDup.PilotDocCap). cos_milli = floor of the shared IEEE
    // value, reported for the survivors only.
    QDef("q_bow_cosine_pairs", Some(s"""
      WITH tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS f FROM
        (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
         FROM documents
         WHERE doc_id % 13 = 0 AND doc_id < ${NearDup.PilotDocCap})
        WHERE tok <> '' GROUP BY doc_id, tok),
      nrm AS (SELECT doc_id, CAST(sum(f * f) AS BIGINT) AS nsq
              FROM tf GROUP BY doc_id),
      dp AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(sum(a.f * b.f) AS BIGINT) AS dp
             FROM tf a JOIN tf b ON a.tok = b.tok AND a.doc_id < b.doc_id
             GROUP BY 1, 2)
      SELECT doc_a, doc_b, dp, na.nsq AS nsq_a, nb.nsq AS nsq_b,
             CAST(floor(1000.0 * dp /
               sqrt(CAST(na.nsq AS DOUBLE) * CAST(nb.nsq AS DOUBLE)))
               AS BIGINT) AS cos_milli
      FROM dp JOIN nrm na ON doc_a = na.doc_id JOIN nrm nb ON doc_b = nb.doc_id
      WHERE 100 * dp * dp >= 64 * na.nsq * nb.nsq
      ORDER BY doc_a, doc_b"""),
      (s, d) => {
        val tf = t(s, d, "documents")
          .filter(col("doc_id") % 13 === 0 &&
            col("doc_id") < NearDup.PilotDocCap)
          .select(col("doc_id"), explode(TA.tokens(col("text"))).as("tok"))
          .groupBy("doc_id", "tok").agg(count(lit(1)).as("f"))
        val nrm = tf.groupBy("doc_id")
          .agg(sum(col("f") * col("f")).cast("long").as("nsq"))
        val a = tf.select(col("doc_id").as("doc_a"), col("tok"), col("f").as("fa"))
        val b = tf.select(col("doc_id").as("doc_b"), col("tok"), col("f").as("fb"))
        a.join(b, Seq("tok")).filter(col("doc_a") < col("doc_b"))
          .groupBy("doc_a", "doc_b")
          .agg(sum(col("fa") * col("fb")).cast("long").as("dp"))
          .join(nrm.select(col("doc_id").as("doc_a"), col("nsq").as("nsq_a")),
            Seq("doc_a"))
          .join(nrm.select(col("doc_id").as("doc_b"), col("nsq").as("nsq_b")),
            Seq("doc_b"))
          .filter(lit(100) * col("dp") * col("dp") >=
            lit(64) * col("nsq_a") * col("nsq_b"))
          .select(col("doc_a"), col("doc_b"), col("dp"), col("nsq_a"), col("nsq_b"),
            floor(lit(1000.0) * col("dp") /
              sqrt(col("nsq_a").cast("double") * col("nsq_b").cast("double")))
              .cast("long").as("cos_milli"))
          .orderBy("doc_a", "doc_b")
      }),

    // COHEN'S KAPPA for the lang-id classifier — chance-corrected
    // agreement over the same stopword-score predictor
    // q_lang_id_confusion reports raw cells for: κ = (pₒ−pₑ)/(1−pₑ)
    // held EXACT as the integer rational (N·D − S)/(N² − S) with
    // D = diagonal agreements and S = Σ row-marginal·col-marginal
    // (the chance term), floored once to ppm (κ can be negative —
    // floored shared double, not integer division). The marginal
    // product is a label-set-sized join — everything after the one
    // doc-grain scoring pass is k-row arithmetic.
    // MATTHEWS CORRELATION per language (one-vs-rest): the
    // classifier-eval family closer — accuracy (confusion), chance-
    // corrected agreement (κ), rank separation (AUC) exist; MCC is
    // the one single-class summary that stays honest under class
    // imbalance (a majority-class predictor scores κ≈0 AND MCC≈0,
    // but hits high accuracy). TP/FP/FN/TN derive from the
    // |langs|²-sized confusion CELLS, never a per-label rescan of
    // the corpus — at 100 TB the doc-grain pass happens once and
    // every label's quadrant algebra is dim-sized. The irrational
    // step is one fixed mul/sqrt/div tree of exactly-rounded IEEE
    // ops floored once (can be negative — floor, not truncate, on
    // both engines by construction).
    QDef("q_mcc_lang_id", Some("""
      WITH d AS (SELECT doc_id, lang,
        list_filter(string_split(text, ' '), t -> t <> '') AS toks
        FROM documents),
      s AS (SELECT lang,
        CAST(len(list_filter(toks, t -> t IN ('the', 'a', 'data'))) AS BIGINT)
          AS s_en,
        CAST(len(list_filter(toks, t -> t IN ('agg', 'merge', 'vector')))
          AS BIGINT) AS s_es,
        CAST(len(list_filter(toks, t -> t IN ('scan', 'query', 'batch')))
          AS BIGINT) AS s_fr
        FROM d),
      p AS (SELECT lang AS a,
             CASE WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
                  WHEN s_es >= s_fr THEN 'es' ELSE 'fr' END AS pr
            FROM s),
      cells AS (SELECT a, pr, CAST(count(*) AS BIGINT) AS n FROM p GROUP BY 1, 2),
      labs AS (SELECT DISTINCT a AS lab FROM p),
      m AS (SELECT labs.lab,
              CAST(coalesce(sum(CASE WHEN c.a = labs.lab AND c.pr = labs.lab
                THEN c.n END), 0) AS BIGINT) AS tp,
              CAST(coalesce(sum(CASE WHEN c.a <> labs.lab AND c.pr = labs.lab
                THEN c.n END), 0) AS BIGINT) AS fp,
              CAST(coalesce(sum(CASE WHEN c.a = labs.lab AND c.pr <> labs.lab
                THEN c.n END), 0) AS BIGINT) AS fn,
              CAST(coalesce(sum(CASE WHEN c.a <> labs.lab AND c.pr <> labs.lab
                THEN c.n END), 0) AS BIGINT) AS tn
            FROM labs CROSS JOIN cells c GROUP BY 1)
      SELECT lab AS lang, tp, fp, fn, tn,
             CASE WHEN (tp + fp) = 0 OR (tp + fn) = 0
                    OR (tn + fp) = 0 OR (tn + fn) = 0 THEN 0
                  ELSE CAST(floor((1000.0 * (tp * tn - fp * fn)) /
                    sqrt((1.0 * (tp + fp) * (tp + fn)) *
                         (1.0 * (tn + fp) * (tn + fn)))) AS BIGINT)
             END AS mcc_milli
      FROM m ORDER BY lang"""),
      (s, d) => {
        val toks = graft.text.TextAnalysis.tokens(col("text"))
        def score(ws: Seq[String]) =
          size(filter(toks, tk => tk.isin(ws.map(lit): _*))).cast("long")
        val p = t(s, d, "documents")
          .select(col("lang").as("a"),
            score(Seq("the", "a", "data")).as("s_en"),
            score(Seq("agg", "merge", "vector")).as("s_es"),
            score(Seq("scan", "query", "batch")).as("s_fr"))
          .select(col("a"),
            when(col("s_en") >= col("s_es") && col("s_en") >= col("s_fr"), "en")
              .when(col("s_es") >= col("s_fr"), "es").otherwise("fr").as("pr"))
        val cells = p.groupBy("a", "pr").agg(count(lit(1)).as("n"))
        val labs = p.select(col("a").as("lab")).distinct()
        labs.crossJoin(broadcast(cells))
          .groupBy("lab")
          .agg(
            coalesce(sum(when(col("a") === col("lab") && col("pr") === col("lab"),
              col("n"))), lit(0L)).cast("long").as("tp"),
            coalesce(sum(when(col("a") =!= col("lab") && col("pr") === col("lab"),
              col("n"))), lit(0L)).cast("long").as("fp"),
            coalesce(sum(when(col("a") === col("lab") && col("pr") =!= col("lab"),
              col("n"))), lit(0L)).cast("long").as("fn"),
            coalesce(sum(when(col("a") =!= col("lab") && col("pr") =!= col("lab"),
              col("n"))), lit(0L)).cast("long").as("tn"))
          .select(col("lab").as("lang"), col("tp"), col("fp"), col("fn"), col("tn"),
            when(col("tp") + col("fp") === 0 || col("tp") + col("fn") === 0 ||
                 col("tn") + col("fp") === 0 || col("tn") + col("fn") === 0, 0L)
              .otherwise(floor((lit(1000.0) * (col("tp") * col("tn") -
                  col("fp") * col("fn"))) /
                sqrt((lit(1.0) * (col("tp") + col("fp")) * (col("tp") + col("fn"))) *
                     (lit(1.0) * (col("tn") + col("fp")) * (col("tn") + col("fn")))))
                .cast("long")).as("mcc_milli"))
          .orderBy("lang")
      }),

    QDef("q_lang_id_kappa", Some("""
      WITH d AS (SELECT doc_id, lang,
        list_filter(string_split(text, ' '), t -> t <> '') AS toks
        FROM documents),
      s AS (SELECT lang,
        CAST(len(list_filter(toks, t -> t IN ('the', 'a', 'data'))) AS BIGINT)
          AS s_en,
        CAST(len(list_filter(toks, t -> t IN ('agg', 'merge', 'vector')))
          AS BIGINT) AS s_es,
        CAST(len(list_filter(toks, t -> t IN ('scan', 'query', 'batch')))
          AS BIGINT) AS s_fr
        FROM d),
      p AS (SELECT lang AS a,
             CASE WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
                  WHEN s_es >= s_fr THEN 'es' ELSE 'fr' END AS pr
            FROM s),
      cells AS (SELECT a, pr, CAST(count(*) AS BIGINT) AS n FROM p GROUP BY 1, 2),
      nn AS (SELECT CAST(sum(n) AS BIGINT) AS total,
               CAST(sum(CASE WHEN a = pr THEN n ELSE 0 END) AS BIGINT) AS diag
             FROM cells),
      rt AS (SELECT a AS lab, CAST(sum(n) AS BIGINT) AS r FROM cells GROUP BY 1),
      ct AS (SELECT pr AS lab, CAST(sum(n) AS BIGINT) AS c FROM cells GROUP BY 1),
      ch AS (SELECT CAST(sum(rt.r * ct.c) AS BIGINT) AS s_chance
             FROM rt JOIN ct USING (lab))
      SELECT nn.total AS n, nn.diag AS n_agree, ch.s_chance,
             CAST((1000000 * nn.diag) // nn.total AS BIGINT) AS po_ppm,
             CAST((1000000 * ch.s_chance) // (nn.total * nn.total) AS BIGINT)
               AS pe_ppm,
             CAST(floor(1000000.0 * (nn.total * nn.diag - ch.s_chance) /
                        (nn.total * nn.total - ch.s_chance)) AS BIGINT)
               AS kappa_ppm
      FROM nn, ch"""),
      (s, d) => {
        val base = t(s, d, "documents")
          .withColumn("toks", TA.tokens(col("text")))
          .select(col("lang").as("a"),
            TA.langScore(col("toks"), Seq("the", "a", "data")).as("s_en"),
            TA.langScore(col("toks"), Seq("agg", "merge", "vector")).as("s_es"),
            TA.langScore(col("toks"), Seq("scan", "query", "batch")).as("s_fr"))
        val cells = base.withColumn("pr",
            when(col("s_en") >= col("s_es") && col("s_en") >= col("s_fr"), "en")
              .when(col("s_es") >= col("s_fr"), "es").otherwise("fr"))
          .groupBy("a", "pr").agg(count(lit(1)).as("n"))
        val nn = cells.agg(sum("n").cast("long").as("total"),
          sum(when(col("a") === col("pr"), col("n")).otherwise(0L))
            .cast("long").as("diag"))
        val rt = cells.groupBy(col("a").as("lab"))
          .agg(sum("n").cast("long").as("r"))
        val ct = cells.groupBy(col("pr").as("lab"))
          .agg(sum("n").cast("long").as("c"))
        val ch = rt.join(ct, Seq("lab"))
          .agg(sum(col("r") * col("c")).cast("long").as("s_chance"))
        nn.crossJoin(broadcast(ch))
          .select(col("total").as("n"), col("diag").as("n_agree"),
            col("s_chance"),
            expr("div(1000000 * diag, total)").cast("long").as("po_ppm"),
            expr("div(1000000 * s_chance, total * total)").cast("long")
              .as("pe_ppm"),
            floor(lit(1000000.0) * (col("total") * col("diag") - col("s_chance")) /
              (col("total") * col("total") - col("s_chance"))).cast("long")
              .as("kappa_ppm"))
      }),

    // SKIP-GRAM co-occurrence pairs (±3-token window) — the
    // word2vec/GloVe pretraining statistic that q_bigram_pmi's
    // adjacent-only counts can't see: for every token occurrence,
    // its unordered co-occurrents within 3 positions, counted
    // corpus-wide, top-30 pairs. The window pairing rides the
    // position self-join per doc with |Δpos| ≤ 3 — each token emits
    // ≤6 pairs, so the expansion is 6·corpus-linear, never
    // quadratic; counts are one map-side-combined aggregate. Pairs
    // are canonicalized (u < v) so both directions collapse.
    QDef("q_skipgram_pairs", Some("""
      WITH d AS (SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks FROM documents),
      pt AS (SELECT doc_id, unnest(list_transform(range(1, len(toks) + 1),
               i -> {'pos': i, 'tok': toks[i]})) AS s FROM d),
      p AS (SELECT doc_id, s.pos AS pos, s.tok AS tok FROM pt),
      pr AS (SELECT CASE WHEN a.tok <= b.tok THEN a.tok ELSE b.tok END AS u,
               CASE WHEN a.tok <= b.tok THEN b.tok ELSE a.tok END AS v
             FROM p a JOIN p b
               ON a.doc_id = b.doc_id AND b.pos > a.pos AND b.pos <= a.pos + 3)
      SELECT u, v, CAST(count(*) AS BIGINT) AS n_cooc
      FROM pr GROUP BY 1, 2 ORDER BY n_cooc DESC, u, v LIMIT 30"""),
      (s, d) => {
        val p = t(s, d, "documents")
          .select(col("doc_id"), posexplode(TA.tokens(col("text"))))
          .select(col("doc_id"), col("pos"), col("col").as("tok"))
        val a = p.select(col("doc_id"), col("pos").as("pa"), col("tok").as("ta"))
        val b = p.select(col("doc_id").as("doc2"), col("pos").as("pb"),
          col("tok").as("tb"))
        a.join(b, col("doc_id") === col("doc2") && col("pb") > col("pa") &&
            col("pb") <= col("pa") + 3)
          .select(when(col("ta") <= col("tb"), col("ta")).otherwise(col("tb"))
            .as("u"),
            when(col("ta") <= col("tb"), col("tb")).otherwise(col("ta")).as("v"))
          .groupBy("u", "v")
          .agg(count(lit(1)).as("n_cooc"))
          .orderBy(col("n_cooc").desc, col("u"), col("v")).limit(30)
      }),

    // WORD BURSTINESS (Church–Gale): per token, the variance-to-mean
    // ratio of its per-document counts — a bursty token (≫1000
    // milli) clumps into few documents (topical), a Poisson-ish one
    // spreads evenly (functional). The per-token dispersion drives
    // stopword discovery and tf saturation choices in retrieval.
    // Exact integer per-doc-count moments (df, Σc, Σc²) with the
    // ZERO-docs correction applied via the corpus doc count N (one
    // broadcast scalar): mean and variance are over ALL docs, not
    // just containing ones — no dense doc×token grid materializes.
    // Top-20 by occurrences; ratio floors the shared double.
    QDef("q_word_burstiness", Some("""
      WITH d AS (SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks FROM documents),
      nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
      tc AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c FROM
               (SELECT doc_id, unnest(toks) AS tok FROM d) GROUP BY 1, 2),
      m AS (SELECT tok, CAST(count(*) AS BIGINT) AS df,
              CAST(sum(c) AS BIGINT) AS occ, CAST(sum(c * c) AS BIGINT) AS ss
            FROM tc GROUP BY 1)
      SELECT tok, df, occ,
             CAST(floor(1000.0 * (1.0 * nn.n * ss - 1.0 * occ * occ) /
                        ((nn.n - 1.0) * occ)) AS BIGINT) AS burstiness_milli
      FROM m, nn ORDER BY occ DESC, tok LIMIT 20"""),
      (s, d) => {
        val docs = t(s, d, "documents")
          .select(col("doc_id"), TA.tokens(col("text")).as("toks"))
        val nn = docs.agg(count(lit(1)).as("n"))
        docs.select(col("doc_id"), explode(col("toks")).as("tok"))
          .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
          .groupBy("tok")
          .agg(count(lit(1)).as("df"), sum("c").cast("long").as("occ"),
            sum(col("c") * col("c")).cast("long").as("ss"))
          .crossJoin(broadcast(nn))
          .select(col("tok"), col("df"), col("occ"),
            floor(lit(1000.0) *
              (lit(1.0) * col("n") * col("ss") - lit(1.0) * col("occ") * col("occ")) /
              ((col("n") - lit(1.0)) * col("occ"))).cast("long")
              .as("burstiness_milli"))
          .orderBy(col("occ").desc, col("tok")).limit(20)
      }),

    // DETECTOR-AGREEMENT MATRIX: the same pilot sample pushed through
    // the three near-dup detectors the engine ships — exact token
    // Jaccard ≥ 0.5, MinHash(8) LSH candidates with estimate ≥ 0.5,
    // SimHash16 hamming ≤ 3 — and the Venn census of which pairs each
    // catches. THE curation diagnostic before choosing a detector: a
    // pair in jaccard-only is LSH recall loss, minhash-only above the
    // jaccard cell is estimator false-positive mass, simhash-only is
    // the bag-of-words-weighted relation the set-based detectors
    // ignore. All three detector trees are the registry's own
    // machinery (shared CTE bodies / NearDup calls — this query
    // cannot desync from the individual faces). Pilot-capped like
    // every calibration face; the matrix is ≤ 7 rows.
    QDef("q_dedup_method_agreement", Some({
      val agreeSum = (0 until 8).map(i =>
        s"(CASE WHEN sa.s$i = sb.s$i THEN 1 ELSE 0 END)").mkString(" + ")
      s"""
      WITH ${tokCte.format(
        s"WHERE doc_id % 7 = 0 AND doc_id < ${NearDup.PilotDocCap}")},
      ${sigSelect(8, "tok")},
      ${bandsSql(8, 2)},
      mhc AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
              FROM bands a JOIN bands b
                ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
      mh AS (SELECT doc_a, doc_b FROM mhc
             JOIN sig sa ON doc_a = sa.doc_id JOIN sig sb ON doc_b = sb.doc_id
             WHERE $agreeSum >= 4),
      ${simhashSigBody("sh_")},
      shb AS (
        SELECT doc_id, 0 AS band, (simhash16 >> 0) & 15 AS bv FROM sh_sig
        UNION ALL SELECT doc_id, 1, (simhash16 >> 4) & 15 FROM sh_sig
        UNION ALL SELECT doc_id, 2, (simhash16 >> 8) & 15 FROM sh_sig
        UNION ALL SELECT doc_id, 3, (simhash16 >> 12) & 15 FROM sh_sig),
      shc AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
              FROM shb a JOIN shb b
                ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id),
      sh AS (SELECT doc_a, doc_b FROM shc
             JOIN sh_sig sa ON doc_a = sa.doc_id
             JOIN sh_sig sb ON doc_b = sb.doc_id
             WHERE bit_count(xor(sa.simhash16, sb.simhash16)) <= 3),
      sz AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
      inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
                FROM tok a JOIN tok b ON a.tok = b.tok AND a.doc_id < b.doc_id
                GROUP BY doc_a, doc_b),
      jac AS (SELECT doc_a, doc_b FROM inter
              JOIN sz sa ON doc_a = sa.doc_id JOIN sz sb ON doc_b = sb.doc_id
              WHERE i * 10 >= 5 * (sa.n + sb.n - i)),
      uni AS (SELECT doc_a, doc_b FROM jac
              UNION SELECT doc_a, doc_b FROM mh
              UNION SELECT doc_a, doc_b FROM sh),
      m AS (SELECT
              CASE WHEN j.doc_a IS NOT NULL THEN 1 ELSE 0 END AS in_jaccard,
              CASE WHEN h.doc_a IS NOT NULL THEN 1 ELSE 0 END AS in_minhash,
              CASE WHEN s2.doc_a IS NOT NULL THEN 1 ELSE 0 END AS in_simhash
            FROM uni u
            LEFT JOIN jac j ON u.doc_a = j.doc_a AND u.doc_b = j.doc_b
            LEFT JOIN mh h ON u.doc_a = h.doc_a AND u.doc_b = h.doc_b
            LEFT JOIN sh s2 ON u.doc_a = s2.doc_a AND u.doc_b = s2.doc_b)
      SELECT in_jaccard, in_minhash, in_simhash,
             CAST(count(*) AS BIGINT) AS n_pairs
      FROM m GROUP BY 1, 2, 3
      ORDER BY in_jaccard DESC, in_minhash DESC, in_simhash DESC"""
    }),
      (s, d) => {
        val tok = tokDf(s, d, Some(7), pilot = true)
        val jac = NearDup.tokenJaccardPairs(tok, "doc_id", "tok", 5)
          .filter(col("near_dup") === 1).select("doc_a", "doc_b")
        val sigs = NearDup.minhashSignatures(tok, "doc_id", "tok", 8)
        val cand = NearDup.lshCandidatePairs(
          NearDup.lshBands(sigs, "doc_id", 8, 2), "doc_id")
        def side(p: String) = sigs.toDF(
          "doc_id" +: (0 until 8).map(i => s"$p$i"): _*)
        val agree = (0 until 8).map(i =>
          when(col(s"a$i") === col(s"b$i"), 1).otherwise(0)).reduce(_ + _)
        val mh = cand
          .join(side("a").withColumnRenamed("doc_id", "doc_a"), Seq("doc_a"))
          .join(side("b").withColumnRenamed("doc_id", "doc_b"), Seq("doc_b"))
          .filter(agree >= 4).select("doc_a", "doc_b")
        val sh = NearDup.simhashPairs(
            NearDup.simhash16(tok, "doc_id", "tok"), "doc_id", maxHamming = 3)
          .select("doc_a", "doc_b")
        // r17 OPT (guide §2.4): the old union+distinct THEN three
        // membership left-joins evaluated every method pipeline
        // TWICE (once into uni, once as a join side). Tag each
        // pipeline's pairs and OR the flags in one (doc_a, doc_b)
        // aggregate — each pipeline runs once, zero joins, and the
        // flags are the same set-membership bits the left joins
        // produced (max-of-indicator ≡ IS NOT NULL on a distinct-pair
        // side). Same-session A/B at sf0.1: 4.10 → 3.2 s.
        def flag(m: Int) = max(when(col("m") === m, 1).otherwise(0))
        jac.withColumn("m", lit(1))
          .unionByName(mh.withColumn("m", lit(2)))
          .unionByName(sh.withColumn("m", lit(3)))
          .groupBy("doc_a", "doc_b")
          .agg(flag(1).as("in_jaccard"), flag(2).as("in_minhash"),
            flag(3).as("in_simhash"))
          .groupBy("in_jaccard", "in_minhash", "in_simhash")
          .agg(count(lit(1)).as("n_pairs"))
          .orderBy(col("in_jaccard").desc, col("in_minhash").desc,
            col("in_simhash").desc)
      }),

    // DEDUP REVIEW QUEUE: a deterministic, UNBIASED sample of 20
    // flagged near-dup pairs for human audit — ranked by the md5 of
    // the pair key, so the queue is (a) reproducible run-over-run and
    // engine-over-engine, (b) not biased toward low doc ids or high
    // similarity the way head-of-sort sampling is (auditing only the
    // most-similar pairs systematically overstates detector
    // precision). Ships the evidence a reviewer needs inline
    // (intersection, sizes, exact Jaccard permille). Same hub-capped
    // pair machinery as q_dedup_cluster; the hash rank is one
    // bounded-input sort.
    QDef("q_dedup_review_queue", Some(s"""
      WITH ${tokCte.format("WHERE doc_id % 13 = 0")},
      sz AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
      kept AS (SELECT t.doc_id, t.tok FROM tok t JOIN (
                 SELECT tok FROM tok GROUP BY tok
                 HAVING count(*) <= ${NearDup.TokenDfCap}) lv USING (tok)),
      inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
                FROM kept a JOIN kept b ON a.tok = b.tok AND a.doc_id < b.doc_id
                GROUP BY doc_a, doc_b),
      p AS (SELECT doc_a, doc_b, i, sa.n AS na, sb.n AS nb,
              (1000 * i) // (sa.n + sb.n - i) AS jac_permille,
              md5(CAST(doc_a AS VARCHAR) || '|' || CAST(doc_b AS VARCHAR))
                AS sample_key
            FROM inter JOIN sz sa ON doc_a = sa.doc_id
                       JOIN sz sb ON doc_b = sb.doc_id
            WHERE i * 10 >= 6 * (sa.n + sb.n - i))
      SELECT doc_a, doc_b, i, na, nb, jac_permille, sample_key
      FROM p ORDER BY sample_key LIMIT 20"""),
      (s, d) => NearDup.tokenJaccardPairs(tokDf(s, d, Some(13)), "doc_id", "tok", 6,
          dfCap = Some(NearDup.TokenDfCap))
        .filter(col("near_dup") === 1)
        .select(col("doc_a"), col("doc_b"), col("i"), col("na"), col("nb"),
          expr("div(1000 * i, na + nb - i)").as("jac_permille"),
          md5(concat(col("doc_a").cast("string"), lit("|"),
            col("doc_b").cast("string"))).as("sample_key"))
        .orderBy("sample_key").limit(20)),

    // CHUNK-BOUNDARY OVERLAP: detect chunking artifacts — document
    // pairs where A's last 16 chars EQUAL B's first 16 chars, the
    // signature of one source text split into overlapping chunks (a
    // scraped page chunked with window overlap, a book split on
    // rolling offsets). Near-dup machinery misses these: consecutive
    // chunks can have low global Jaccard while their seam matches
    // exactly. Shape: two narrow projections (head/tail substring of
    // a column-pruned scan) and ONE string equi-join — linear, no
    // token explode, no window. SEAM df cap on the join key (df ≤ 16
    // per side, oracle-mirrored — deliberately far tighter than
    // TokenDfCap): a genuine chunk seam is near-unique (one doc
    // continues another), while a boundary shared by a crowd is a
    // template ("Click here to subscr…") whose heads×tails fan-out
    // is the quadratic term — an uncapped probe at sf1 returned 89×
    // the sf0.1 pairs on 10× docs, all template noise. With the cap
    // the per-boundary fan-out is ≤ 16², output linear in boundary
    // values. Inert at tested SFs (max bucket 10). At most one row
    // per (doc_a, doc_b): a doc has ONE tail, so ORDER BY
    // (doc_a, doc_b) is total.
    QDef("q_chunk_boundary_overlap", Some(s"""
      WITH d AS (SELECT doc_id, substr(text, 1, 16) AS head,
                        substr(text, CAST(n_chars AS INTEGER) - 15, 16) AS tail
                 FROM documents WHERE n_chars >= 32),
      hk AS (SELECT head FROM d GROUP BY head HAVING count(*) <= 16),
      tk AS (SELECT tail FROM d GROUP BY tail HAVING count(*) <= 16),
      a AS (SELECT d.doc_id AS doc_a, d.tail AS boundary FROM d JOIN tk USING (tail)),
      b AS (SELECT d.doc_id AS doc_b, d.head AS boundary FROM d JOIN hk USING (head))
      SELECT doc_a, doc_b, boundary FROM a JOIN b USING (boundary)
      WHERE doc_a <> doc_b ORDER BY doc_a, doc_b"""),
      (s, dd) => {
        val d = t(s, dd, "documents").filter(col("n_chars") >= 32)
          .select(col("doc_id"),
            substring(col("text"), 1, 16).as("head"),
            expr("substring(text, cast(n_chars - 15 as int), 16)").as("tail"))
        val hk = d.groupBy("head").agg(count(lit(1)).as("_df"))
          .filter(col("_df") <= 16).select("head")
        val tk = d.groupBy("tail").agg(count(lit(1)).as("_df"))
          .filter(col("_df") <= 16).select("tail")
        val a = d.join(tk, Seq("tail"))
          .select(col("doc_id").as("doc_a"), col("tail").as("boundary"))
        val b = d.join(hk, Seq("head"))
          .select(col("doc_id").as("doc_b"), col("head").as("boundary"))
        a.join(b, Seq("boundary"))
          .filter(col("doc_a") =!= col("doc_b"))
          .select(col("doc_a"), col("doc_b"), col("boundary"))
          .orderBy("doc_a", "doc_b")
      }),

    // BPE MERGE TRAINING, 3 unrolled steps (Sennrich et al. 2016):
    // the tokenizer-training loop itself, not just the pair census
    // q_bpe_pair_count takes. Each step counts adjacent unit pairs
    // over the space-separated character sequences of the WORD VOCAB
    // (weighted by word frequency), merges the (count desc, pair asc)
    // winner everywhere, and repeats on the merged sequences. Merge
    // application is boundary-guarded leftmost non-overlapping
    // `replace` — identical scan semantics in both engines; because
    // each match consumes BOTH flanking spaces, ANY space-adjacent
    // occurrence of the winning pair is skipped, not just runs of 3+
    // identical units: ' a b a b ' merges to 'ab a b' (the first
    // match eats the boundary space the second needs), where
    // reference BPE yields 'ab ab'; likewise in an 'a a a' run the
    // leftmost pair wins and the scan resumes after it
    // (alternate-occurrence variant of reference BPE, deterministic
    // and engine-identical; documented, not hidden — a skipped
    // occurrence merges on a later step that re-picks the pair).
    // Scale shape: the corpus is touched ONCE (the word count); all
    // three merge rounds run over the vocab table, which is
    // Heaps-law-sublinear in corpus size, and each winner is a
    // broadcast 1-row scalar. ASCII corpus contract: '(.)' strides
    // one codepoint identically under Java regex and RE2 here.
    QDef("q_bpe_merge_unrolled", Some("""
      WITH tk AS (SELECT unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS tok FROM documents),
      w0 AS (SELECT tok, CAST(count(*) AS BIGINT) AS n FROM tk GROUP BY tok),
      s0 AS (SELECT rtrim(regexp_replace(tok, '(.)', '\1 ', 'g')) AS seq, n FROM w0),
      p1 AS (SELECT pair, CAST(sum(n) AS BIGINT) AS cnt FROM (
               SELECT n, unnest(list_transform(range(1, len(u)), i -> u[i] || ' ' || u[i+1])) AS pair
               FROM (SELECT string_split(seq, ' ') AS u, n FROM s0)) GROUP BY pair),
      m1 AS (SELECT pair, cnt FROM p1 ORDER BY cnt DESC, pair LIMIT 1),
      s1 AS (SELECT trim(replace(' ' || seq || ' ', ' ' || m1.pair || ' ',
               ' ' || replace(m1.pair, ' ', '') || ' ')) AS seq, n FROM s0, m1),
      p2 AS (SELECT pair, CAST(sum(n) AS BIGINT) AS cnt FROM (
               SELECT n, unnest(list_transform(range(1, len(u)), i -> u[i] || ' ' || u[i+1])) AS pair
               FROM (SELECT string_split(seq, ' ') AS u, n FROM s1)) GROUP BY pair),
      m2 AS (SELECT pair, cnt FROM p2 ORDER BY cnt DESC, pair LIMIT 1),
      s2 AS (SELECT trim(replace(' ' || seq || ' ', ' ' || m2.pair || ' ',
               ' ' || replace(m2.pair, ' ', '') || ' ')) AS seq, n FROM s1, m2),
      p3 AS (SELECT pair, CAST(sum(n) AS BIGINT) AS cnt FROM (
               SELECT n, unnest(list_transform(range(1, len(u)), i -> u[i] || ' ' || u[i+1])) AS pair
               FROM (SELECT string_split(seq, ' ') AS u, n FROM s2)) GROUP BY pair),
      m3 AS (SELECT pair, cnt FROM p3 ORDER BY cnt DESC, pair LIMIT 1)
      SELECT * FROM (
        SELECT CAST(1 AS BIGINT) AS step, pair, cnt FROM m1
        UNION ALL SELECT CAST(2 AS BIGINT), pair, cnt FROM m2
        UNION ALL SELECT CAST(3 AS BIGINT), pair, cnt FROM m3)
      ORDER BY step"""),
      (s, d) => {
        val w0 = t(s, d, "documents")
          .select(explode(TA.tokens(col("text"))).as("tok"))
          .groupBy("tok").agg(count(lit(1)).as("n"))
        var seqDf = w0.select(
          rtrim(regexp_replace(col("tok"), "(.)", "$1 ")).as("seq"), col("n"))
        val steps = (1 to 3).map { k =>
          val top = seqDf
            .select(col("n"), split(col("seq"), " ").as("u"))
            .filter(size(col("u")) >= 2)
            .select(col("n"), explode(
              expr("transform(sequence(0, size(u) - 2), i -> concat(u[i], ' ', u[i+1]))"))
              .as("pair"))
            .groupBy("pair").agg(sum("n").cast(LongType).as("cnt"))
            .orderBy(col("cnt").desc, col("pair")).limit(1)
          seqDf = seqDf.crossJoin(broadcast(top.select(col("pair").as("mp"))))
            .select(trim(expr(
              "replace(concat(' ', seq, ' '), concat(' ', mp, ' '), concat(' ', replace(mp, ' ', ''), ' '))"))
              .as("seq"), col("n"))
          top.select(lit(k.toLong).as("step"), col("pair"), col("cnt"))
        }
        steps.reduce(_ union _).orderBy("step")
      }),

    // INTERPOLATED KNESER–NEY BIGRAM LM (Kneser & Ney 1995, fixed
    // discount D=0.75): the classic n-gram LM estimator — what
    // q_doc_lm_score's raw-frequency proxy graduates into. For each
    // bigram: p(w2|w1) = (c−D)/c(w1) + D·N1+(w1,·)/c(w1) · p_cont(w2)
    // with continuation probability p_cont = N1+(·,w2)/|bigram types|.
    // Output: the global top-20 bigrams by probability, micro-
    // quantized BEFORE ranking so ties break identically cross-engine.
    // Scale shape: every table is a map-side-combined aggregate keyed
    // on w1 / w2 / the bigram; the joins are linear equi-joins on
    // those keys; the type total is a broadcast scalar; the final
    // top-20 is a TakeOrdered, never a global sort.
    QDef("q_kn_bigram_lm", Some("""
      WITH d AS (SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks FROM documents),
      bi AS (SELECT unnest(list_transform(range(1, greatest(len(toks), 1)),
               i -> toks[i] || ' ' || toks[i+1])) AS bg FROM d),
      bc AS (SELECT split_part(bg, ' ', 1) AS w1, split_part(bg, ' ', 2) AS w2,
                    CAST(count(*) AS BIGINT) AS c FROM bi GROUP BY 1, 2),
      ctx AS (SELECT w1, CAST(sum(c) AS BIGINT) AS cw1 FROM bc GROUP BY w1),
      fan AS (SELECT w1, CAST(count(*) AS BIGINT) AS n1f FROM bc GROUP BY w1),
      hist AS (SELECT w2, CAST(count(*) AS BIGINT) AS n1h FROM bc GROUP BY w2),
      tt AS (SELECT CAST(count(*) AS BIGINT) AS types FROM bc),
      p AS (SELECT w1, w2, c,
              CAST(floor(((c - 0.75) / cw1
                + 0.75 * n1f / cw1 * (CAST(n1h AS DOUBLE) / types)) * 1000000 + 0.5)
                AS BIGINT) AS p_micro
            FROM bc JOIN ctx USING (w1) JOIN fan USING (w1) JOIN hist USING (w2), tt)
      SELECT w1, w2, c, p_micro FROM p
      ORDER BY p_micro DESC, w1, w2 LIMIT 20"""),
      (s, d) => {
        val bi = t(s, d, "documents")
          .select(TA.tokens(col("text")).as("toks"))
          .select(explode(NearDup.shingleExpr("toks", 2)).as("bg"))
        val bc = bi
          .select(substring_index(col("bg"), " ", 1).as("w1"),
            substring_index(col("bg"), " ", -1).as("w2"))
          .groupBy("w1", "w2").agg(count(lit(1)).as("c"))
        val ctx = bc.groupBy("w1").agg(sum("c").cast(LongType).as("cw1"))
        val fan = bc.groupBy("w1").agg(count(lit(1)).as("n1f"))
        val hist = bc.groupBy("w2").agg(count(lit(1)).as("n1h"))
        val tt = bc.agg(count(lit(1)).as("types"))
        bc.join(ctx, "w1").join(fan, "w1").join(hist, "w2")
          .crossJoin(broadcast(tt))
          .select(col("w1"), col("w2"), col("c"),
            floor(((col("c") - lit(0.75)) / col("cw1")
              + lit(0.75) * col("n1f") / col("cw1")
                * (col("n1h").cast("double") / col("types"))) * lit(1000000)
              + lit(0.5)).cast(LongType).as("p_micro"))
          .orderBy(col("p_micro").desc, col("w1"), col("w2")).limit(20)
      }),

    // EXACT-SUBSTRING DUPLICATE-SPAN CENSUS (the ExactSubstr dedup of
    // Lee et al. 2022 at 8-token granularity): positions whose 8-token
    // window occurs MORE THAN ONCE in the corpus are duplicated;
    // overlapping duplicated windows merge into maximal spans
    // (interval merge, not position islands — islands would double-
    // count tokens when two dup positions sit < 8 apart). Per doc with
    // any dup span: span count, longest span, duplicated token mass,
    // permille of the doc that is copy. This is the span-level answer
    // q_doc_dup_ngram_mass's per-shingle mass can't give — "HOW LONG
    // are the copied stretches". Scale shape: window-occurrence counts
    // are one map-side-combined aggregate on md5(window); the join
    // back is a linear equi-join; the merge windows run per doc over
    // DUP positions only. At 100 TB the occurrence table shuffles on
    // the hash key — linear, and exactly what ExactSubstr's suffix
    // array replaces when spans must be arbitrary-length.
    QDef("q_dup_span_census", Some("""
      WITH d AS (SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks FROM documents),
      sh AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens, i AS pos,
               md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]
                 || ' ' || toks[i+4] || ' ' || toks[i+5] || ' ' || toks[i+6] || ' ' || toks[i+7]) AS h
             FROM d, unnest(range(1, greatest(len(toks) - 6, 1))) AS r(i)),
      occ AS (SELECT h FROM sh GROUP BY h HAVING count(*) > 1),
      dp AS (SELECT doc_id, n_tokens, pos AS s, pos + 7 AS e FROM sh JOIN occ USING (h)),
      mk AS (SELECT doc_id, n_tokens, s, e,
               CASE WHEN max(e) OVER (PARTITION BY doc_id ORDER BY s
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
                    OR s > max(e) OVER (PARTITION BY doc_id ORDER BY s
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    THEN 1 ELSE 0 END AS brk
             FROM dp),
      isl AS (SELECT doc_id, n_tokens, s, e,
               sum(brk) OVER (PARTITION BY doc_id ORDER BY s
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
              FROM mk),
      sp AS (SELECT doc_id, n_tokens, island,
               CAST(max(e) - min(s) + 1 AS BIGINT) AS span_tokens
             FROM isl GROUP BY doc_id, n_tokens, island)
      SELECT doc_id, n_tokens, CAST(count(*) AS BIGINT) AS n_spans,
             CAST(max(span_tokens) AS BIGINT) AS longest_span,
             CAST(sum(span_tokens) AS BIGINT) AS dup_tokens,
             CAST((1000 * sum(span_tokens)) // n_tokens AS BIGINT) AS dup_permille
      FROM sp GROUP BY doc_id, n_tokens ORDER BY doc_id"""),
      (s, d) => {
        val docs = t(s, d, "documents")
          .select(col("doc_id"), TA.tokens(col("text")).as("toks"))
        val sh = docs
          .select(col("doc_id"), size(col("toks")).cast(LongType).as("n_tokens"),
            posexplode(NearDup.shingleExpr("toks", 8)))
          .select(col("doc_id"), col("n_tokens"),
            (col("pos") + 1).cast(LongType).as("pos"), md5(col("col")).as("h"))
        val occ = sh.groupBy("h").agg(count(lit(1)).as("occ"))
          .filter(col("occ") > 1).select("h")
        val dp = sh.join(occ, "h")
          .select(col("doc_id"), col("n_tokens"), col("pos").as("s"),
            (col("pos") + 7).as("e"))
        val wPrev = org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy("s")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
        val wRun = org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy("s")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        val isl = dp
          .withColumn("pmax", max("e").over(wPrev))
          .withColumn("brk",
            when(col("pmax").isNull || col("s") > col("pmax"), 1L).otherwise(0L))
          .withColumn("island", sum("brk").over(wRun))
        val sp = isl.groupBy("doc_id", "n_tokens", "island")
          .agg((max("e") - min("s") + 1).cast(LongType).as("span_tokens"))
        sp.groupBy("doc_id", "n_tokens")
          .agg(count(lit(1)).as("n_spans"),
            max("span_tokens").as("longest_span"),
            sum("span_tokens").cast(LongType).as("dup_tokens"))
          .select(col("doc_id"), col("n_tokens"), col("n_spans"),
            col("longest_span"), col("dup_tokens"),
            expr("div(1000 * dup_tokens, n_tokens)").as("dup_permille"))
          .orderBy("doc_id")
      }),

    // TOKEN SHANNON ENTROPY per doc — the information-density quality
    // facet the ratio gates (q_doc_quality_ratios) and char-level
    // Gini (q_char_gini) both miss: a doc looping one phrase has high
    // length and normal punctuation but LOW unigram entropy.
    // H = ln(n) − (Σ c·ln c)/n over per-doc token counts; normalized
    // H/ln(types) rescales to [0,1] so a length-independent threshold
    // works. One explode → (doc,tok) count → per-doc aggregate, both
    // map-side-combined; no joins, no windows — at 100 TB this is a
    // single linear pass. Zero-token docs are structurally absent on
    // both sides (no tokens → no rows).
    QDef("q_doc_entropy", Some("""
      WITH tk AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS tok FROM documents),
      c AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c FROM tk GROUP BY doc_id, tok),
      h AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS n_types,
                   sum(c * ln(CAST(c AS DOUBLE))) AS sclnc
            FROM c GROUP BY doc_id)
      SELECT doc_id, n AS n_tokens, n_types,
             (round(ln(CAST(n AS DOUBLE)) - sclnc / n, 3) + 0.0) AS entropy3,
             CASE WHEN n_types <= 1 THEN 0.0
                  ELSE (round((ln(CAST(n AS DOUBLE)) - sclnc / n)
                              / ln(CAST(n_types AS DOUBLE)), 3) + 0.0) END AS norm_entropy3
      FROM h ORDER BY doc_id"""),
      (s, d) => {
        val c = t(s, d, "documents")
          .select(col("doc_id"), explode(TA.tokens(col("text"))).as("tok"))
          .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
        c.groupBy("doc_id")
          .agg(sum("c").cast(LongType).as("n"), count(lit(1)).as("n_types"),
            sum(col("c") * log(col("c").cast("double"))).as("sclnc"))
          .select(col("doc_id"), col("n").as("n_tokens"), col("n_types"),
            round(log(col("n").cast("double")) - col("sclnc") / col("n"), 3)
              .as("entropy3"),
            when(col("n_types") <= 1, lit(0.0))
              .otherwise(round((log(col("n").cast("double")) - col("sclnc") / col("n"))
                / log(col("n_types").cast("double")), 3)).as("norm_entropy3"))
          .orderBy("doc_id")
      })
  )
}
