package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.pipeline.Tables.t
import graft.text.{NearDup, TextAnalysis => TA}

/** Training-data preparation operators beyond the dedup/quality core
  * (SURVEY.md §2.11): benchmark decontamination, repetition signals,
  * JSONL sink roundtrip, context-window sequence packing, PII
  * redaction, corpus length histograms. All built-in expression
  * trees — no UDFs — so everything stays in whole-stage codegen.
  */
object TrainPrepQueries {

  /** doc → token list CTE, shared DuckDB fragment. */
  private val toksCte =
    """d AS (SELECT doc_id,
      |  list_filter(string_split(text, ' '), t -> t <> '') AS toks FROM documents)""".stripMargin

  /** Distinct word n-gram CTE over `d` (mirrors NearDup.shinglesN). */
  private def shCte(n: Int): String = shCteNamed(n, "sh")

  /** Same CTE under a caller-chosen name, so one oracle can host
    * several shingle widths side by side (q_contam_ngram_size_sweep). */
  private def shCteNamed(n: Int, nm: String): String = {
    val terms = (0 until n).map(j => s"toks[i+$j]").mkString(" || ' ' || ")
    s"""$nm AS (SELECT DISTINCT doc_id, sh FROM
       |  (SELECT doc_id, unnest(list_transform(range(1, greatest(len(toks) - ${n - 2}, 1)),
       |          i -> $terms)) AS sh FROM d))""".stripMargin
  }

  // PII patterns — plain character classes only (no \d, no shorthand)
  // so Java regex (Spark) and RE2 (DuckDB) read them identically.
  private val EmailPat = "[a-z0-9.#_-]+@[a-z0-9.-]+"
  private val PhonePat = "[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}"

  /** Held-out eval set for the decontamination family: FIXED-SIZE
    * pilot prefix, not a fixed fraction. A real benchmark suite is a
    * curated CONSTANT — it does not grow when the train corpus grows
    * — but the pre-r16 `doc_id % 50 = 0` set did, and since the
    * broadcast contamination join's output is |train shingles ∩ eval
    * shingles|, a ∝N eval set made every decontam face quadratic
    * (the r15 sf1→sf10 decade measured it live: q_decontam_ngram
    * 16.5×, q_eval_coverage_ngram 262 s at sf10). The
    * [[graft.text.NearDup.PilotDocCap]] prefix pins |eval| ≤ 100
    * docs (every 50th id below 5000) at ANY corpus size, so the
    * broadcast side is O(1), the join output is O(N), and docs past
    * the cap rejoin the train side — the same discipline the
    * embedding faces adopted in r14 (PilotVecCap). Bit-identical at
    * sf ≤ 0.1 (max doc_id 4999 < cap). */
  private val evalSqlPred =
    s"doc_id % 50 = 0 AND doc_id < ${NearDup.PilotDocCap}"
  private val trainSqlPred =
    s"(doc_id % 50 <> 0 OR doc_id >= ${NearDup.PilotDocCap})"
  private def evalColPred =
    col("doc_id") % 50 === 0 && col("doc_id") < NearDup.PilotDocCap
  private def trainColPred =
    col("doc_id") % 50 =!= 0 || col("doc_id") >= NearDup.PilotDocCap

  val all: Seq[QDef] = Seq(

    // Benchmark DECONTAMINATION: train docs sharing any word-4-gram
    // with the eval set ([[evalSqlPred]] — a FIXED-SIZE pilot prefix
    // standing in for a held-out benchmark) are contaminated; report
    // how many distinct shingles and eval docs each one hits. 100 TB
    // shape: the eval set is bounded BY CONSTRUCTION (≤100 docs at
    // any corpus size — see evalSqlPred), so its shingle set
    // BROADCASTS as an O(1) constant, the train-side scan joins
    // without a fact shuffle, the join output is O(N), and the
    // per-doc counts are one hash aggregate.
    QDef("q_decontam_ngram", Some(s"""
      WITH $toksCte, ${shCte(4)},
      ev AS (SELECT doc_id AS eval_id, sh FROM sh WHERE $evalSqlPred),
      tr AS (SELECT doc_id, sh FROM sh WHERE $trainSqlPred)
      SELECT tr.doc_id, count(DISTINCT tr.sh) AS n_shared,
             count(DISTINCT ev.eval_id) AS n_eval_docs
      FROM tr JOIN ev USING (sh) GROUP BY tr.doc_id ORDER BY tr.doc_id"""),
      (s, d) => {
        // eval side: distinct (shrinks the broadcast); train side: RAW
        // shingles — no pre-join dedup shuffle, the broadcast join
        // filters first and the countDistinct aggregate dedups after,
        // over only the contaminated survivors
        val docs = t(s, d, "documents")
        val ev = NearDup.shinglesN(docs.filter(evalColPred),
          "doc_id", "text", 4)
          .select(col("doc_id").as("eval_id"), col("sh"))
        val tr = NearDup.shinglesN(docs.filter(trainColPred),
          "doc_id", "text", 4, distinct = false)
        tr.join(broadcast(ev), Seq("sh"))
          .groupBy("doc_id")
          .agg(countDistinct(col("sh")).as("n_shared"),
            countDistinct(col("eval_id")).as("n_eval_docs"))
          .orderBy("doc_id")
      }),

    // Decontamination REMOVAL: the clean train corpus — every train
    // doc with NO word-4-gram in common with the eval set (the
    // filter q_decontam_ngram's audit feeds). Same broadcast
    // contamination join, then a broadcast ANTI-join of the (tiny)
    // contaminated id set against the train scan: at 100 TB neither
    // join shuffles the corpus.
    QDef("q_decontam_filter", Some(s"""
      WITH $toksCte, ${shCte(4)},
      ev AS (SELECT sh FROM sh WHERE $evalSqlPred),
      tr AS (SELECT doc_id, sh FROM sh WHERE $trainSqlPred),
      bad AS (SELECT DISTINCT tr.doc_id FROM tr JOIN ev USING (sh))
      SELECT doc_id, lang, n_chars FROM documents
      WHERE $trainSqlPred AND doc_id NOT IN (SELECT doc_id FROM bad)
      ORDER BY doc_id"""),
      (s, d) => {
        val docs = t(s, d, "documents")
        val ev = NearDup.shinglesN(docs.filter(evalColPred),
          "doc_id", "text", 4).select("sh")
        val contaminated = NearDup.shinglesN(
          docs.filter(trainColPred), "doc_id", "text", 4,
          distinct = false)
          .join(broadcast(ev), Seq("sh"))
          .select("doc_id").distinct()
        docs.filter(trainColPred)
          .join(broadcast(contaminated), Seq("doc_id"), "left_anti")
          .select("doc_id", "lang", "n_chars")
          .orderBy("doc_id")
      }),

    // EVAL-SET COVERAGE — the flip side of q_decontam_ngram: that
    // face asks "which TRAIN docs leak eval text"; this one asks, per
    // EVAL doc, "how much of it does the train corpus already
    // contain" (distinct word-3-grams found anywhere in train, as a
    // permille) — the benchmark-saturation / memorization-risk score
    // a curation report carries next to the contamination list (a
    // benchmark whose items are 900‰-covered measures retrieval, not
    // generalization). Same 100 TB shape as decontam, reversed
    // aggregation: the bounded eval shingle set BROADCASTS, the
    // train-side scan joins with NO fact shuffle (train shingles stay
    // raw — the broadcast join filters first, the distinct dedups
    // only the surviving hits), and the per-eval-doc counts are one
    // tiny hash aggregate. Eval docs with <3 tokens have no shingles
    // and are (correctly) absent.
    QDef("q_eval_coverage_ngram", Some(s"""
      WITH $toksCte, ${shCte(3)},
      ev AS (SELECT doc_id AS eval_id, sh FROM sh WHERE $evalSqlPred),
      tr AS (SELECT doc_id, sh FROM sh WHERE $trainSqlPred),
      hit AS (SELECT DISTINCT ev.eval_id, ev.sh FROM tr JOIN ev USING (sh)),
      tot AS (SELECT eval_id, CAST(count(*) AS BIGINT) AS n_shingles FROM ev GROUP BY eval_id),
      cov AS (SELECT eval_id, CAST(count(*) AS BIGINT) AS n_covered FROM hit GROUP BY eval_id)
      SELECT t.eval_id, t.n_shingles,
             coalesce(c.n_covered, 0) AS n_covered,
             CAST((1000 * coalesce(c.n_covered, 0)) // t.n_shingles AS BIGINT)
               AS coverage_permille
      FROM tot t LEFT JOIN cov c USING (eval_id) ORDER BY t.eval_id"""),
      (s, d) => {
        val docs = t(s, d, "documents")
        val ev = NearDup.shinglesN(docs.filter(evalColPred),
          "doc_id", "text", 3)
          .select(col("doc_id").as("eval_id"), col("sh"))
        val tr = NearDup.shinglesN(docs.filter(trainColPred),
          "doc_id", "text", 3, distinct = false)
        val hit = tr.join(broadcast(ev), Seq("sh"))
          .select("eval_id", "sh").distinct()
        val tot = ev.groupBy("eval_id").agg(count(lit(1)).as("n_shingles"))
        val cov = hit.groupBy("eval_id").agg(count(lit(1)).as("n_covered"))
        tot.join(cov, Seq("eval_id"), "left")
          .select(col("eval_id"), col("n_shingles"),
            coalesce(col("n_covered"), lit(0L)).as("n_covered"),
            expr("div(1000 * coalesce(n_covered, 0), n_shingles)")
              .as("coverage_permille"))
          .orderBy("eval_id")
      }),

    // DECONTAMINATION SENSITIVITY SWEEP: q_decontam_ngram's verdict
    // at shingle widths n ∈ {3,4,5} side by side — contaminated
    // train docs, distinct shared shingles, eval docs hit — the
    // tuning table that justifies the production width (too small ⇒
    // stop-phrase false positives inflate the drop list; too large ⇒
    // paraphrased leakage slips through; the knee is where
    // n_contaminated stops falling). Three independent broadcast
    // decontam passes (one corpus scan each, eval side broadcast,
    // corpus never shuffles) unioned into a 3-row table — the
    // per-width term is linear, so the sweep is 3× decontam, never
    // more. Train shingles stay raw (non-distinct); the
    // count(DISTINCT) aggregates dedup only the contaminated
    // survivors.
    QDef("q_contam_ngram_size_sweep", Some(s"""
      WITH $toksCte, ${shCteNamed(3, "sh3")}, ${shCteNamed(4, "sh4")}, ${shCteNamed(5, "sh5")}
      SELECT CAST(n AS BIGINT) AS n,
             CAST(n_contaminated AS BIGINT) AS n_contaminated,
             CAST(n_shared_shingles AS BIGINT) AS n_shared_shingles,
             CAST(n_eval_docs_hit AS BIGINT) AS n_eval_docs_hit
      FROM (${Seq(3, 4, 5).map(n =>
        s"""SELECT $n AS n, count(DISTINCT tr.doc_id) AS n_contaminated,
           |       count(DISTINCT tr.sh) AS n_shared_shingles,
           |       count(DISTINCT ev.doc_id) AS n_eval_docs_hit
           |FROM sh$n tr JOIN sh$n ev ON tr.sh = ev.sh
           |WHERE (tr.doc_id % 50 <> 0 OR tr.doc_id >= ${NearDup.PilotDocCap})
           |  AND ev.doc_id % 50 = 0 AND ev.doc_id < ${NearDup.PilotDocCap}""".stripMargin)
        .mkString(" UNION ALL ")})
      ORDER BY n"""),
      (s, d) => {
        val docs = t(s, d, "documents")
        Seq(3, 4, 5).map { n =>
          val ev = NearDup.shinglesN(docs.filter(evalColPred),
            "doc_id", "text", n)
            .select(col("doc_id").as("eval_id"), col("sh"))
          val tr = NearDup.shinglesN(docs.filter(trainColPred),
            "doc_id", "text", n, distinct = false)
          tr.join(broadcast(ev), Seq("sh"))
            .agg(countDistinct(col("doc_id")).as("n_contaminated"),
              countDistinct(col("sh")).as("n_shared_shingles"),
              countDistinct(col("eval_id")).as("n_eval_docs_hit"))
            .select(lit(n.toLong).as("n"), col("n_contaminated"),
              col("n_shared_shingles"), col("n_eval_docs_hit"))
        }.reduce(_ unionByName _).orderBy("n")
      }),

    // REPETITION signal (Gopher-style): most frequent bigram's share
    // of all bigrams, exact integer permille. Non-distinct bigram
    // explode → two map-side-combined aggregates; the flag threshold
    // (60‰) splits the synthetic corpus ~15/85.
    QDef("q_doc_repetition", Some(s"""
      WITH $toksCte,
      bg AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)),
               i -> toks[i] || ' ' || toks[i+1])) AS bg
             FROM d WHERE len(toks) >= 2),
      c AS (SELECT doc_id, bg, count(*) AS n FROM bg GROUP BY doc_id, bg),
      r AS (SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_bigrams,
                   CAST(max(n) AS BIGINT) AS top_count
            FROM c GROUP BY doc_id)
      SELECT doc_id, n_bigrams, top_count,
             (1000 * top_count) // n_bigrams AS rep_permille,
             CASE WHEN (1000 * top_count) // n_bigrams >= 60 THEN 1 ELSE 0 END AS repetitive
      FROM r ORDER BY doc_id"""),
      (s, d) => {
        // bigrams = 2-wide shingles: the ONE shingle tree
        // (NearDup.shingleExpr), non-exploded-distinct because
        // repetition needs multiplicities
        val bg = t(s, d, "documents")
          .withColumn("toks", TA.tokens(col("text")))
          .select(col("doc_id"),
            explode(NearDup.shingleExpr("toks", 2)).as("bg"))
        bg.groupBy("doc_id", "bg").agg(count(lit(1)).as("n"))
          .groupBy("doc_id")
          .agg(sum(col("n")).cast(LongType).as("n_bigrams"),
            max(col("n")).cast(LongType).as("top_count"))
          .select(col("doc_id"), col("n_bigrams"), col("top_count"),
            expr("div(1000 * top_count, n_bigrams)").as("rep_permille"))
          .withColumn("repetitive",
            when(col("rep_permille") >= 60, 1).otherwise(0))
          .orderBy("doc_id")
      }),

    // DUPLICATED n-GRAM MASS (the other Gopher repetition axis):
    // fraction of each doc's bigram/trigram OCCURRENCES that belong
    // to an n-gram appearing more than once in that doc — catches
    // looped boilerplate that top-share (q_doc_repetition) misses
    // when the repetition spreads over many different n-grams.
    // Integer permille; docs too short for a trigram keep 0 via the
    // left join. Two explode→count chains re-aggregated per doc and
    // joined on doc_id — each chain is the map-side-combined
    // wordcount shape.
    QDef("q_doc_dup_ngram_mass", Some(s"""
      WITH $toksCte,
      b AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)),
              i -> toks[i] || ' ' || toks[i+1])) AS g
            FROM d WHERE len(toks) >= 2),
      bc AS (SELECT doc_id, g, count(*) AS n FROM b GROUP BY doc_id, g),
      br AS (SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_bi,
                    CAST(sum(CASE WHEN n > 1 THEN n ELSE 0 END) AS BIGINT) AS dup_bi
             FROM bc GROUP BY doc_id),
      t3 AS (SELECT doc_id, unnest(list_transform(range(1, greatest(len(toks) - 1, 1)),
               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS g
             FROM d WHERE len(toks) >= 3),
      tc AS (SELECT doc_id, g, count(*) AS n FROM t3 GROUP BY doc_id, g),
      tr AS (SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_tri,
                    CAST(sum(CASE WHEN n > 1 THEN n ELSE 0 END) AS BIGINT) AS dup_tri
             FROM tc GROUP BY doc_id)
      SELECT d.doc_id,
             coalesce(n_bi, 0) AS n_bi, coalesce(dup_bi, 0) AS dup_bi,
             CASE WHEN coalesce(n_bi, 0) = 0 THEN 0
                  ELSE (1000 * dup_bi) // n_bi END AS dup2_permille,
             coalesce(n_tri, 0) AS n_tri, coalesce(dup_tri, 0) AS dup_tri,
             CASE WHEN coalesce(n_tri, 0) = 0 THEN 0
                  ELSE (1000 * dup_tri) // n_tri END AS dup3_permille
      FROM d LEFT JOIN br ON d.doc_id = br.doc_id
             LEFT JOIN tr ON d.doc_id = tr.doc_id
      ORDER BY d.doc_id"""),
      (s, d) => {
        val docs = t(s, d, "documents")
          .select(col("doc_id"), TA.tokens(col("text")).as("toks"))
        // r17 OPT attempt, REVERTED after measurement (guide §1.1 —
        // the "ideal" single-scan plan lost): merging both widths
        // into one struct-tagged explode + (doc_id, k, g) wordcount
        // halved the scan/tokenize work on paper but measured 1.45 →
        // 1.94 s at sf0.1 and 6.68 → 14.0 s at sf1 — the struct
        // wrapper + wider hash key cost more per gram than the saved
        // tokenize pass. The two independent chains below also
        // overlap on the 32 slots, which the serial merged stage
        // forfeits.
        def mass(k: Int, nCol: String, dupCol: String) = docs
          .select(col("doc_id"), explode(NearDup.shingleExpr("toks", k)).as("g"))
          .groupBy("doc_id", "g").agg(count(lit(1)).as("n"))
          .groupBy("doc_id")
          .agg(sum(col("n")).cast(LongType).as(nCol),
            sum(when(col("n") > 1, col("n")).otherwise(0L)).cast(LongType).as(dupCol))
        def permille(dup: String, n: String) =
          when(coalesce(col(n), lit(0L)) === 0, lit(0L))
            .otherwise(expr(s"div(1000 * $dup, $n)"))
        docs.select("doc_id")
          .join(mass(2, "n_bi", "dup_bi"), Seq("doc_id"), "left")
          .join(mass(3, "n_tri", "dup_tri"), Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("n_bi"), lit(0L)).as("n_bi"),
            coalesce(col("dup_bi"), lit(0L)).as("dup_bi"),
            permille("dup_bi", "n_bi").as("dup2_permille"),
            coalesce(col("n_tri"), lit(0L)).as("n_tri"),
            coalesce(col("dup_tri"), lit(0L)).as("dup_tri"),
            permille("dup_tri", "n_tri").as("dup3_permille"))
          .orderBy("doc_id")
      }),

    // JSONL sink + readback roundtrip — the interchange format
    // training pipelines actually emit. Distributed write (one .json
    // part per partition), read back under an EXPLICIT schema (no
    // inference pass over 100 TB), value-identical to the source.
    QDef("q_sink_jsonl", Some("""
      SELECT doc_id, text, lang, source, n_chars
      FROM documents ORDER BY doc_id"""),
      (s, d) => {
        val out = SinkScratch.dir("q_sink_jsonl", d)
        t(s, d, "documents").select("doc_id", "text", "lang", "source", "n_chars")
          .write.mode("overwrite").json(out)
        s.read
          .schema("doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG")
          .json(out)
          .select("doc_id", "text", "lang", "source", "n_chars")
          .orderBy("doc_id")
      }),

    // PARTITIONED parquet sink + partition-PRUNED readback: the lake
    // layout every 100 TB corpus lands in — written partitioned by
    // language, read back through a partition filter that prunes at
    // the directory listing (PartitionFilters in the scan, pinned in
    // ScalePlanSpec — the 'en' probe lists one directory, it does not
    // scan four languages and filter rows). The partition column is
    // dropped from the output (it lives in the path, and its read
    // type is the sink's business, not the consumer's).
    QDef("q_sink_parquet_partitioned", Some("""
      SELECT doc_id, text, source, n_chars FROM documents
      WHERE lang = 'en' ORDER BY doc_id"""),
      (s, d) => {
        val out = SinkScratch.dir("q_sink_parquet_partitioned", d)
        t(s, d, "documents")
          .write.mode("overwrite").partitionBy("lang").parquet(out)
        s.read.parquet(out).filter(col("lang") === "en")
          .select("doc_id", "text", "source", "n_chars")
          .orderBy("doc_id")
      }),

    // SCHEMA EVOLUTION on read: two parquet batches written with
    // DIFFERENT schemas (a later batch adds c_mktsegment) read back
    // through ONE mergeSchema scan — the additive-column lake
    // contract: old files never rewrite, the union schema resolves
    // at read time, absent columns surface as NULL (exactly the
    // align-by-name union semantic, §2.6, pushed down to the
    // STORAGE layer). The oracle recomputes the merged view
    // logically from the base table. At 100 TB this is the nightly
    // reality of a long-lived lake — footer-only schema merge, no
    // data rewrite, partition pruning intact.
    QDef("q_schema_evolution", Some("""
      SELECT c_custkey, c_name,
             CASE WHEN c_custkey % 2 = 1 THEN c_mktsegment END AS c_mktsegment
      FROM customer ORDER BY c_custkey"""),
      (s, d) => {
        val out = SinkScratch.dir("q_schema_evolution", d)
        val base = t(s, d, "customer")
        base.filter(col("c_custkey") % 2 === 0)
          .select("c_custkey", "c_name")
          .write.mode("overwrite").parquet(s"$out/batch1")
        base.filter(col("c_custkey") % 2 === 1)
          .select("c_custkey", "c_name", "c_mktsegment")
          .write.mode("overwrite").parquet(s"$out/batch2")
        s.read.option("mergeSchema", "true").parquet(s"$out/batch1", s"$out/batch2")
          .select("c_custkey", "c_name", "c_mktsegment")
          .orderBy("c_custkey")
      }),

    // Context-window SEQUENCE PACKING: concatenate each shard's docs
    // in id order and chunk the token stream into budget-sized
    // windows; a doc's seq_id is the window its first token lands in.
    // The running total is a window sum PARTITIONED BY SHARD — packing
    // parallelizes across shards instead of forcing one global sort
    // (a total-order window would single-partition 100 TB).
    QDef("q_pack_sequences", Some(s"""
      WITH $toksCte,
      n AS (SELECT doc_id, doc_id % 4 AS shard,
                   CAST(len(toks) AS BIGINT) AS n_tokens FROM d),
      w AS (SELECT doc_id, shard, n_tokens,
                   CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
            FROM n)
      SELECT doc_id, shard, n_tokens, cum - n_tokens AS start_off,
             (cum - n_tokens) // 256 AS seq_id
      FROM w ORDER BY doc_id"""),
      (s, d) => {
        val w = Window.partitionBy("shard").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, d, "documents")
          .select(col("doc_id"), (col("doc_id") % 4).as("shard"),
            TA.tokenCount(col("text")).as("n_tokens"))
          .withColumn("cum", sum(col("n_tokens")).over(w).cast(LongType))
          .select(col("doc_id"), col("shard"), col("n_tokens"),
            (col("cum") - col("n_tokens")).as("start_off"),
            expr("div(cum - n_tokens, 256)").as("seq_id"))
          .orderBy("doc_id")
      }),

    // PII REDACTION: emails and dashed phone numbers replaced with
    // typed placeholders, plus per-row match counts (the audit trail a
    // compliance pass needs). The synthetic corpus carries no PII, so
    // the note deterministically embeds id-derived email/phone spans
    // into the free text (2 of 3 docs an email, 3 of 4 a phone) —
    // what varies is exactly what a scrubber must find. One codegen'd
    // projection over the scan; patterns are dialect-neutral
    // character classes (no \\d shorthand).
    QDef("q_pii_redact", Some(s"""
      WITH n AS (SELECT doc_id, text ||
        CASE WHEN doc_id % 3 <> 0
             THEN ' contact ' || lower(source) || CAST(doc_id AS VARCHAR) || '@example.com'
             ELSE '' END ||
        CASE WHEN doc_id % 4 <> 0
             THEN ' tel ' || lpad(CAST(10 + doc_id % 90 AS VARCHAR), 2, '0')
                  || '-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                  || '-' || lpad(CAST((doc_id * 7) % 1000 AS VARCHAR), 3, '0')
                  || '-' || lpad(CAST((doc_id * 13) % 10000 AS VARCHAR), 4, '0')
             ELSE '' END AS note
        FROM documents)
      SELECT doc_id,
             regexp_replace(regexp_replace(note, '$EmailPat', '[EMAIL]', 'g'),
                            '$PhonePat', '[PHONE]', 'g') AS note_redacted,
             CAST(len(regexp_extract_all(note, '$EmailPat')) AS BIGINT) AS n_email,
             CAST(len(regexp_extract_all(note, '$PhonePat')) AS BIGINT) AS n_phone
      FROM n ORDER BY doc_id"""),
      (s, d) => {
        val id = col("doc_id")
        def pad(c: org.apache.spark.sql.Column, w: Int) =
          lpad(c.cast(StringType), w, "0")
        val note = concat(col("text"),
          when(id % 3 =!= 0, concat(lit(" contact "), lower(col("source")),
            id.cast(StringType), lit("@example.com"))).otherwise(""),
          when(id % 4 =!= 0, concat(lit(" tel "),
            pad(id % 90 + 10, 2), lit("-"), pad(id % 1000, 3), lit("-"),
            pad((id * 7) % 1000, 3), lit("-"), pad((id * 13) % 10000, 4)))
            .otherwise(""))
        t(s, d, "documents")
          .select(id, note.as("note"))
          .select(id,
            regexp_replace(regexp_replace(col("note"), EmailPat, "[EMAIL]"),
              PhonePat, "[PHONE]").as("note_redacted"),
            size(regexp_extract_all(col("note"), lit(EmailPat), lit(0)))
              .cast(LongType).as("n_email"),
            size(regexp_extract_all(col("note"), lit(PhonePat), lit(0)))
              .cast(LongType).as("n_phone"))
          .orderBy("doc_id")
      }),

    // QUANTILE NORMALIZATION of a per-source feature to the GLOBAL
    // distribution (the cross-source comparability transform: a doc
    // at its source's p-th length quantile maps to the corpus-wide
    // value at that quantile — batch-effect removal for mixture
    // construction when sources have systematically different length
    // profiles). All-integer: source rank rn/n_s lifts to the target
    // global rank g = ⌈rn·N/n_s⌉ by ceiling division, and the
    // norm value is the v whose cumulative-count span covers g.
    // 100 TB shape: NO global row_number anywhere (a global window
    // collapses to one partition — the classic total-order trap);
    // the global distribution enters ONLY as the value histogram
    // (distinct feature values + counts + cumulative base), which is
    // value-cardinality-sized, broadcast, and range-joined. The
    // fact-scale work is one per-source window.
    QDef("q_quantile_normalize", Some("""
      WITH d AS (SELECT doc_id, source, n_chars FROM documents),
      tot AS (SELECT CAST(count(*) AS BIGINT) AS n_g FROM d),
      sr AS (SELECT doc_id, source, n_chars,
              CAST(row_number() OVER (PARTITION BY source
                ORDER BY n_chars, doc_id) AS BIGINT) AS rn,
              CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n_s
             FROM d),
      vc AS (SELECT n_chars AS v, CAST(count(*) AS BIGINT) AS cnt FROM d GROUP BY 1),
      vb AS (SELECT v, cnt, CAST(coalesce(sum(cnt) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS base
             FROM vc),
      g AS (SELECT doc_id, source, n_chars,
              (rn * n_g + n_s - 1) // n_s AS grank FROM sr, tot)
      SELECT g.doc_id, g.source, g.n_chars, g.grank, vb.v AS norm_chars
      FROM g JOIN vb ON g.grank > vb.base AND g.grank <= vb.base + vb.cnt
      ORDER BY doc_id"""),
      (s, d) => {
        val docs = t(s, d, "documents").select(col("doc_id"), col("source"), col("n_chars"))
        val tot = docs.agg(count(lit(1)).as("n_g"))
        val ws = Window.partitionBy("source").orderBy("n_chars", "doc_id")
        val sr = docs
          .withColumn("rn", row_number().over(ws).cast("long"))
          .withColumn("n_s", count(lit(1)).over(Window.partitionBy("source")))
          .crossJoin(broadcast(tot))
          .withColumn("grank", expr("div(rn * n_g + n_s - 1, n_s)"))
        val vc = docs.groupBy(col("n_chars").as("v")).agg(count(lit(1)).as("cnt"))
        // single-partition window is SAFE here: vc is the distinct
        // feature-value histogram (value-cardinality-sized), not the fact
        val vb = vc.withColumn("base",
          coalesce(sum(col("cnt")).over(Window.orderBy("v")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        sr.join(broadcast(vb),
            col("grank") > col("base") && col("grank") <= col("base") + col("cnt"))
          .select(col("doc_id"), col("source"), col("n_chars"), col("grank"),
            col("v").as("norm_chars"))
          .orderBy("doc_id")
      }),

    // FEATURE HASHING (the hashing-trick vectorizer): token
    // OCCURRENCES bucketed into a fixed 64-dim space by a seeded
    // md5 byte — the fixed-width featurization that needs NO
    // vocabulary build, no fit step, and no growing dimension when
    // the corpus grows (the property that makes it the streaming/
    // distributed default over count-vectorizers; collisions are the
    // accepted lossy trade, Weinberger et al. 2009). Same seeded
    // md5-byte discipline as q_split_assign, so buckets are
    // engine-reproducible. Sparse output rows (doc, bucket, cnt):
    // explode → ONE map-side-combined aggregate; at 100 TB output
    // is ≤ 64 rows per doc regardless of vocabulary.
    QDef("q_feature_hashing", Some("""
      WITH tk AS (SELECT doc_id,
              unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS tok
            FROM documents),
      b AS (SELECT doc_id,
              CAST(('0x' || substr(md5('fh1|' || tok), 1, 2)) AS INTEGER) % 64 AS bucket
            FROM tk)
      SELECT doc_id, bucket, CAST(count(*) AS BIGINT) AS cnt
      FROM b GROUP BY doc_id, bucket ORDER BY doc_id, bucket"""),
      (s, d) => {
        val tk = t(s, d, "documents")
          .select(col("doc_id"), explode(TA.tokens(col("text"))).as("tok"))
        tk.select(col("doc_id"),
            (conv(substring(md5(concat(lit("fh1|"), col("tok"))), 1, 2), 16, 10)
              .cast(IntegerType) % 64).as("bucket"))
          .groupBy("doc_id", "bucket").agg(count(lit(1)).as("cnt"))
          .orderBy("doc_id", "bucket")
      }),

    // OOV / VOCABULARY COVERAGE: per-doc out-of-vocabulary token
    // rate against the corpus's top-16 tokens by frequency
    // (deterministic count-desc, token-asc cut) — the tokenizer-
    // coverage readout that decides whether a fixed vocab serves a
    // corpus (rising OOV under a frozen vocab = domain drift; the
    // 31-token synthetic vocabulary makes a top-16 cut genuinely
    // discriminative). The vocab is top-K-BOUNDED so it BROADCASTS
    // at any corpus size; membership is a broadcast left-semi-style
    // join flag aggregated per doc, occurrences (not distinct) so
    // the rate weights by token mass. All-integer permille.
    QDef("q_oov_rate", Some("""
      WITH tk AS (SELECT doc_id,
              unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS tok
            FROM documents),
      v AS (SELECT tok FROM (
              SELECT tok, count(*) AS f FROM tk GROUP BY tok
              ORDER BY f DESC, tok LIMIT 16)),
      m AS (SELECT tk.doc_id, CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END AS oov
            FROM tk LEFT JOIN v ON tk.tok = v.tok)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(sum(oov) AS BIGINT) AS n_oov,
             CAST((1000 * sum(oov)) // count(*) AS BIGINT) AS oov_permille
      FROM m GROUP BY doc_id ORDER BY doc_id"""),
      (s, d) => {
        val tk = t(s, d, "documents")
          .select(col("doc_id"), explode(TA.tokens(col("text"))).as("tok"))
        val vocab = tk.groupBy("tok").agg(count(lit(1)).as("f"))
          .orderBy(col("f").desc, col("tok")).limit(16)
          .select(col("tok"), lit(1).as("in_vocab"))
        tk.join(broadcast(vocab), Seq("tok"), "left")
          .select(col("doc_id"),
            when(col("in_vocab").isNull, 1L).otherwise(0L).as("oov"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_tokens"), sum(col("oov")).as("n_oov"))
          .select(col("doc_id"), col("n_tokens"), col("n_oov"),
            expr("div(1000 * n_oov, n_tokens)").as("oov_permille"))
          .orderBy("doc_id")
      }),

    // VOCAB COVERAGE CURVE — q_oov_rate's tokenizer-SIZING sweep (the
    // house "gate + its curve" pairing, like recall_eval →
    // recall_curve): what share of the corpus token MASS does a
    // top-k vocabulary cover, at k ∈ {256, 1024, 4096, 16384}? The
    // knee of this curve is where a vocab budget stops paying — the
    // decision table a BPE/WordPiece sizing pass reads. Scale shape:
    // the corpus-sized work is the map-side-combined token count; the
    // top-16384 cut is a bounded TakeOrdered selection (never a
    // global sort of the Heaps-growing vocab); then ALL FOUR cuts
    // come from ONE pass over the 16384-row top table — each top row
    // explodes into the cuts it belongs to (≤4 rows) and a single
    // hash aggregate rolls them up, so per-k work is a PLAN FACT,
    // never a per-k re-evaluation of the pipeline (the coreset-fps
    // lesson). The grand total is a second 1-row aggregate of the
    // SAME token-count exchange (runtime exchange reuse collapses it;
    // worst case it is one extra 1-column pruned scan) riding a
    // broadcast. ScalePlanSpec pins: exactly one TakeOrdered, no
    // per-k union fan-out, ≤2 pruned scans. BIGINT-exact; at tiny SF
    // the vocab may be smaller than every cut (all curves flat at
    // 1000‰) — the curve stays well-defined.
    QDef("q_vocab_coverage_curve", Some("""
      WITH tk AS (SELECT unnest(list_filter(string_split(text, ' '),
              t -> t <> '')) AS tok FROM documents),
      tc AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM tk GROUP BY tok),
      top AS (SELECT tok, cnt,
                CAST(row_number() OVER (ORDER BY cnt DESC, tok) AS BIGINT) AS rnk
              FROM tc
              QUALIFY row_number() OVER (ORDER BY cnt DESC, tok) <= 16384),
      tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total_tokens FROM tc),
      ks AS (SELECT CAST(256 AS BIGINT) AS k UNION ALL SELECT 1024
             UNION ALL SELECT 4096 UNION ALL SELECT 16384)
      SELECT ks.k, CAST(count(*) AS BIGINT) AS n_vocab_at_cut,
             CAST(sum(t.cnt) AS BIGINT) AS covered_mass,
             CAST(max(tot.total_tokens) AS BIGINT) AS total_tokens,
             CAST((1000 * sum(t.cnt)) // max(tot.total_tokens)
               AS BIGINT) AS coverage_permille
      FROM ks JOIN top t ON t.rnk <= ks.k CROSS JOIN tot
      GROUP BY ks.k ORDER BY ks.k"""),
      (s, d) => {
        val tk = t(s, d, "documents")
          .select(explode(TA.tokens(col("text"))).as("tok"))
        val tc = tk.groupBy("tok").agg(count(lit(1)).as("cnt"))
        val top = tc.orderBy(col("cnt").desc, col("tok")).limit(16384)
          .withColumn("rnk", row_number().over(
            Window.orderBy(col("cnt").desc, col("tok"))))
        val tot = tc.agg(sum("cnt").cast(LongType).as("total_tokens"))
        top.select(col("cnt"),
            explode(expr(
              "filter(array(256L, 1024L, 4096L, 16384L), k -> rnk <= k)"))
              .as("k"))
          .groupBy("k")
          .agg(count(lit(1)).as("n_vocab_at_cut"),
            sum("cnt").cast(LongType).as("covered_mass"))
          .crossJoin(broadcast(tot))
          .select(col("k"), col("n_vocab_at_cut"), col("covered_mass"),
            col("total_tokens"),
            expr("div(1000 * covered_mass, total_tokens)")
              .as("coverage_permille"))
          .orderBy("k")
      }),

    // DETERMINISTIC RESERVOIR SAMPLE (k = 5 per language): the
    // fixed-size uniform without-replacement draw every pipeline
    // needs for eyeball QA, labeling batches, and held-out audits —
    // as a PURE FUNCTION of (seed, doc_id), not an RNG (the
    // q_kfold_assign md5 discipline), so the "reservoir" re-draws
    // identically on any engine, any partitioning, any run. Rank =
    // row_number over md5('rsv1|' || doc_id) per language, keep ≤ 5.
    // Scale shape: the rank window carries ONLY row_number, so the
    // optimizer inserts the PARTIAL WindowGroupLimit (the
    // q_inverted_index lesson applied at design time) — each map
    // task forwards at most 5 rows per language and the per-language
    // reducer sees ≤ 5·|map tasks| rows, never the corpus; a
    // |langs|-partition window over raw docs would otherwise be a
    // parallelism ceiling AND a full shuffle. Plan-pinned in
    // ScalePlanSpec.
    QDef("q_sample_reservoir", Some("""
      WITH r AS (SELECT lang, doc_id,
               md5('rsv1|' || CAST(doc_id AS VARCHAR)) AS tag
             FROM documents),
      pick AS (SELECT lang, doc_id, tag,
                 CAST(row_number() OVER (PARTITION BY lang
                   ORDER BY tag, doc_id) AS BIGINT) AS pick_rank
               FROM r
               QUALIFY row_number() OVER (PARTITION BY lang
                 ORDER BY tag, doc_id) <= 5)
      SELECT lang, pick_rank, doc_id FROM pick
      ORDER BY lang, pick_rank"""),
      (s, d) => {
        val r = t(s, d, "documents")
          .select(col("lang"), col("doc_id"),
            md5(concat(lit("rsv1|"), col("doc_id").cast("string"))).as("tag"))
        val w = Window.partitionBy("lang").orderBy(col("tag"), col("doc_id"))
        r.withColumn("pick_rank", row_number().over(w).cast(LongType))
          .filter(col("pick_rank") <= 5)
          .select(col("lang"), col("pick_rank"), col("doc_id"))
          .orderBy("lang", "pick_rank")
      }),

    // JACKKNIFE SOURCE SENSITIVITY: leave-one-SOURCE-out estimates of
    // the corpus mean doc length — "if this source vanished, how
    // would the headline statistic move?" — the robustness audit
    // that catches one source silently carrying (or dragging) a
    // corpus metric, at the grain removals actually happen
    // (whole sources, not rows; the jackknife's natural unit here).
    // All estimates derive from ONE aggregate: full-corpus totals
    // broadcast back onto the per-source rollup, each LOO mean an
    // exact integer milli division of (total − this source).
    QDef("q_jackknife_source", Some("""
      WITH s AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(CAST(n_chars AS BIGINT)) AS BIGINT) AS chars
            FROM documents GROUP BY 1),
      tt AS (SELECT CAST(sum(n_docs) AS BIGINT) AS tn,
                    CAST(sum(chars) AS BIGINT) AS tc FROM s)
      SELECT source, n_docs,
             CAST((1000 * tt.tc) // tt.tn AS BIGINT) AS full_mean_milli,
             CAST((1000 * (tt.tc - chars)) // (tt.tn - n_docs) AS BIGINT)
               AS loo_mean_milli,
             CAST((1000 * (tt.tc - chars)) // (tt.tn - n_docs)
               - (1000 * tt.tc) // tt.tn AS BIGINT) AS delta_milli
      FROM s, tt ORDER BY source"""),
      (s, d) => {
        val src = t(s, d, "documents")
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars").cast(LongType)).cast(LongType).as("chars"))
        src.crossJoin(broadcast(src.agg(sum("n_docs").cast(LongType).as("tn"),
            sum("chars").cast(LongType).as("tc"))))
          .select(col("source"), col("n_docs"),
            expr("div(1000 * tc, tn)").as("full_mean_milli"),
            expr("div(1000 * (tc - chars), tn - n_docs)").as("loo_mean_milli"),
            (expr("div(1000 * (tc - chars), tn - n_docs)") -
              expr("div(1000 * tc, tn)")).as("delta_milli"))
          .orderBy("source")
      }),

    // EFFECTIVE SAMPLE SIZE per source — Kish's ESS = (Σw)²/Σw² with
    // char mass as the importance weight: how many EQUAL-WEIGHT docs
    // this source is really worth once length-weighting skews it
    // (ess ≈ n means uniform value; ess ≪ n means a few giants carry
    // the source — the mixture-design readout next to
    // q_mix_weighted's copy counts). (Σw)² exceeds the exact-double
    // window, so the ratio routes BOTH products through
    // exactly-rounded doubles and floors once — the engines compute
    // identical bits (the count²-overflow rule from the shift-share
    // family). One map-side-combined aggregate, |sources| rows.
    QDef("q_weight_ess", Some("""
      WITH w AS (SELECT source, CAST(n_chars AS BIGINT) AS wt FROM documents),
      a AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(wt) AS BIGINT) AS sw, CAST(sum(wt * wt) AS BIGINT) AS sww
            FROM w GROUP BY 1)
      SELECT source, n_docs, sw AS sum_w,
             CAST(floor((1.0 * sw * sw) / (1.0 * sww)) AS BIGINT) AS ess,
             CAST(floor((1000.0 * sw * sw) / (1.0 * n_docs * sww)) AS BIGINT)
               AS ess_permille
      FROM a ORDER BY source"""),
      (s, d) => t(s, d, "documents")
        .select(col("source"), col("n_chars").cast(LongType).as("wt"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("wt").cast(LongType).as("sw"),
          sum(col("wt") * col("wt")).cast(LongType).as("sww"))
        .select(col("source"), col("n_docs"), col("sw").as("sum_w"),
          floor(lit(1.0) * col("sw") * col("sw") / (lit(1.0) * col("sww")))
            .cast(LongType).as("ess"),
          floor(lit(1000.0) * col("sw") * col("sw") /
            (lit(1.0) * col("n_docs") * col("sww")))
            .cast(LongType).as("ess_permille"))
        .orderBy("source")),

    // SMALL-FILE COMPACTION planner (the lakehouse maintenance op):
    // greedy bin-packing of per-source docs (stand-ins for data
    // files, sized by n_chars) into ≥4 KB output files — each doc
    // joins the bin its PRECEDING bytes fill, bin = (cum−size) div
    // target, so bins are contiguous in the (source, doc_id) order
    // and every bin except the last crosses the target (the
    // q_select_token_budget greedy-fill shape applied to file
    // layout). Deterministic, integer, no data movement planned
    // twice: ONE per-source window over a metadata-sized projection
    // — at 100 TB this plans compaction for billions of files with
    // one shuffle of (path, size) tuples, never touching file bytes.
    QDef("q_compaction_plan", Some("""
      WITH f AS (SELECT source, doc_id, CAST(n_chars AS BIGINT) AS bytes FROM documents),
      c AS (SELECT source, doc_id, bytes,
              CAST(sum(bytes) OVER (PARTITION BY source ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_bytes
            FROM f)
      SELECT source, doc_id, bytes, cum_bytes,
             (cum_bytes - bytes) // 4096 AS file_bin
      FROM c ORDER BY source, doc_id"""),
      (s, d) => {
        val w = Window.partitionBy("source").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, d, "documents")
          .select(col("source"), col("doc_id"), col("n_chars").cast(LongType).as("bytes"))
          .withColumn("cum_bytes", sum(col("bytes")).over(w).cast(LongType))
          .withColumn("file_bin", expr("div(cum_bytes - bytes, 4096)"))
          .orderBy("source", "doc_id")
      }),

    // TRAIN/VAL/TEST SPLIT assignment: a seed-stamped md5 byte of the
    // doc id buckets each doc 80/10/10 — a pure function of
    // (seed, id), so the split is stable across engines, runs, and
    // repartitions, and a doc can never migrate between splits when
    // the corpus grows (the leakage mode rand()- or position-based
    // splits suffer). Zero shuffles: one codegen'd projection.
    QDef("q_split_assign", Some("""
      WITH h AS (SELECT doc_id, lang,
        CAST(('0x' || substr(md5('split1|' || doc_id), 1, 2)) AS INTEGER) AS b
        FROM documents)
      SELECT doc_id, lang,
             CASE WHEN b < 204 THEN 'train'
                  WHEN b < 230 THEN 'val'
                  ELSE 'test' END AS split
      FROM h ORDER BY doc_id"""),
      (s, d) => t(s, d, "documents")
        .select(col("doc_id"), col("lang"),
          graft.text.Mixing.splitAssign("split1", col("doc_id")).as("split"))
        .orderBy("doc_id")),

    // K-FOLD CROSS-VALIDATION assignment + balance census: 5 folds
    // from the same salted-md5-of-id discipline as q_split_assign
    // (pure function of (seed, id) — stable across engines, runs,
    // repartitions, and corpus growth; a doc never migrates folds),
    // reported at FOLD grain with the balance evidence CV protocols
    // need before trusting fold-out metrics: doc count, distinct
    // sources, char mass, and each fold's share of both in exact
    // permille. The assignment is a zero-shuffle codegen'd
    // projection; the census is one map-side-combined aggregate to 5
    // rows, totals ride a 1-row broadcast back — at 100 TB the whole
    // audit costs one pass over (id, source, n_chars), never text.
    QDef("q_kfold_assign", Some("""
      WITH h AS (SELECT doc_id, source, CAST(n_chars AS BIGINT) AS nc,
              CAST(('0x' || substr(md5('fold1|' || doc_id), 1, 2)) AS INTEGER) % 5
                AS fold
            FROM documents),
      f AS (SELECT CAST(fold AS BIGINT) AS fold, CAST(count(*) AS BIGINT) AS n_docs,
              CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
              CAST(sum(nc) AS BIGINT) AS char_mass
            FROM h GROUP BY 1),
      tt AS (SELECT CAST(sum(n_docs) AS BIGINT) AS td,
                    CAST(sum(char_mass) AS BIGINT) AS tc FROM f)
      SELECT fold, n_docs, n_sources, char_mass,
             CAST((1000 * n_docs) // tt.td AS BIGINT) AS doc_share_permille,
             CAST((1000 * char_mass) // tt.tc AS BIGINT) AS char_share_permille
      FROM f, tt ORDER BY fold"""),
      (s, d) => {
        val fold = (conv(substring(md5(concat(lit("fold1|"), col("doc_id"))), 1, 2),
          16, 10).cast(IntegerType) % 5).cast(LongType)
        val f = t(s, d, "documents")
          .select(fold.as("fold"), col("source"), col("n_chars").cast(LongType).as("nc"))
          .groupBy("fold")
          .agg(count(lit(1)).as("n_docs"),
            countDistinct("source").as("n_sources"),
            sum("nc").cast(LongType).as("char_mass"))
        f.crossJoin(broadcast(f.agg(sum("n_docs").cast(LongType).as("td"),
            sum("char_mass").cast(LongType).as("tc"))))
          .select(col("fold"), col("n_docs"), col("n_sources"), col("char_mass"),
            expr("div(1000 * n_docs, td)").as("doc_share_permille"),
            expr("div(1000 * char_mass, tc)").as("char_share_permille"))
          .orderBy("fold")
      }),

    // SPLIT-LEAKAGE AUDIT: near-dup pairs that CROSS train/val/test
    // boundaries — the eval-integrity number a split assignment must
    // be judged by (random per-doc splits leak near-duplicates into
    // eval; the fix is splitting by dedup CLUSTER, and this audit is
    // what tells you whether you must). Composes the prefix-filtered
    // Jaccard join (the scale path) with the production hash-split
    // assignment on the same sample; output is the per-(split,split)
    // pair census with a leak flag. Canonical pair order via
    // least/greatest so (train,val) and (val,train) collapse.
    // Pilot-capped: the near-dup pair table is Θ(N²) on this corpus
    // (31-token vocabulary), so the audit runs on the fixed pilot
    // prefix — at scale you audit the SPLIT POLICY on a pilot, then
    // split by dedup cluster (NearDup.PilotDocCap; 59× slope before).
    QDef("q_split_leakage_audit", Some(s"""
      WITH ${TextQueries.tokCte.format(
        s"WHERE doc_id % 13 = 0 AND doc_id < ${graft.text.NearDup.PilotDocCap}")},
      sz AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
      inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
                FROM tok a JOIN tok b ON a.tok = b.tok AND a.doc_id < b.doc_id
                GROUP BY doc_a, doc_b),
      nd AS (SELECT doc_a, doc_b
             FROM inter JOIN sz sa ON doc_a = sa.doc_id JOIN sz sb ON doc_b = sb.doc_id
             WHERE i * 10 >= 4 * (sa.n + sb.n - i)),
      sp AS (SELECT doc_id,
               CASE WHEN CAST(('0x' || substr(md5('split1|' || doc_id), 1, 2)) AS INTEGER) < 204 THEN 'train'
                    WHEN CAST(('0x' || substr(md5('split1|' || doc_id), 1, 2)) AS INTEGER) < 230 THEN 'val'
                    ELSE 'test' END AS split
             FROM documents WHERE doc_id % 13 = 0),
      cl AS (SELECT least(a.split, b.split) AS split_lo,
                    greatest(a.split, b.split) AS split_hi
             FROM nd JOIN sp a ON a.doc_id = nd.doc_a JOIN sp b ON b.doc_id = nd.doc_b)
      SELECT split_lo, split_hi, count(*) AS n_pairs,
             CASE WHEN split_lo <> split_hi THEN 1 ELSE 0 END AS is_leak
      FROM cl GROUP BY split_lo, split_hi ORDER BY split_lo, split_hi"""),
      (s, d) => {
        val pairs = graft.text.NearDup.prefixJaccardPairs(
          TextQueries.tokDf(s, d, Some(13), pilot = true), "doc_id", "tok", 4)
          .select("doc_a", "doc_b")
        val sp = t(s, d, "documents").filter(col("doc_id") % 13 === 0)
          .select(col("doc_id"),
            graft.text.Mixing.splitAssign("split1", col("doc_id")).as("split"))
        pairs
          .join(sp.select(col("doc_id").as("doc_a"), col("split").as("sa")), "doc_a")
          .join(sp.select(col("doc_id").as("doc_b"), col("split").as("sb")), "doc_b")
          .select(least(col("sa"), col("sb")).as("split_lo"),
            greatest(col("sa"), col("sb")).as("split_hi"))
          .groupBy("split_lo", "split_hi").agg(count(lit(1)).as("n_pairs"))
          .withColumn("is_leak",
            when(col("split_lo") =!= col("split_hi"), 1).otherwise(0))
          .orderBy("split_lo", "split_hi")
      }),

    // Corpus LENGTH PERCENTILES: exact discrete p50/p90/p99 of doc
    // length per source, selected by INTEGER rank index
    // (ceil(q·n) = (q·n + 99) div 100) — not percentile_approx and
    // not interpolating quantiles, whose float semantics differ per
    // engine. Per-source windows partition the rank computation; at
    // scale each source's rows sort independently (same shape as the
    // packing window, never a global sort).
    QDef("q_doc_len_pctl", Some("""
      WITH r AS (SELECT source, n_chars,
        row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rn,
        count(*) OVER (PARTITION BY source) AS n
        FROM documents)
      SELECT source, max(n) AS n_docs,
        max(CASE WHEN rn = (50*n + 99) // 100 THEN n_chars END) AS p50_chars,
        max(CASE WHEN rn = (90*n + 99) // 100 THEN n_chars END) AS p90_chars,
        max(CASE WHEN rn = (99*n + 99) // 100 THEN n_chars END) AS p99_chars
      FROM r GROUP BY source ORDER BY source"""),
      (s, d) => {
        val bySource = Window.partitionBy("source")
        val ranked = t(s, d, "documents")
          .select(col("source"), col("n_chars"), col("doc_id"))
          .withColumn("rn", row_number().over(
            bySource.orderBy(col("n_chars"), col("doc_id"))).cast(LongType))
          .withColumn("n", count(lit(1)).over(bySource))
        def pick(q: Int) = max(when(
          col("rn") === expr(s"div($q * n + 99, 100)"), col("n_chars")))
        ranked.groupBy("source")
          .agg(max(col("n")).as("n_docs"), pick(50).as("p50_chars"),
            pick(90).as("p90_chars"), pick(99).as("p99_chars"))
          .orderBy("source")
      }),

    // BOILERPLATE MINING: the corpus's most document-frequent word
    // 3-grams — the header/footer/license-text detector every web
    // corpus needs. Non-distinct shingle explode → one hash aggregate
    // (count + countDistinct, both partial-aggregated map-side) → a
    // global top-20 by (df, tf, shingle), which Spark executes as
    // TakeOrderedAndProject: each partition keeps 20 rows, the driver
    // merges — no global sort of the n-gram space at any scale.
    QDef("q_boilerplate_ngrams", Some(s"""
      WITH $toksCte,
      sh AS (SELECT doc_id, unnest(list_transform(range(1, greatest(len(toks) - 1, 1)),
               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
             FROM d)
      SELECT sh, count(DISTINCT doc_id) AS df, count(*) AS tf
      FROM sh GROUP BY sh ORDER BY df DESC, tf DESC, sh LIMIT 20"""),
      (s, d) => t(s, d, "documents")
        .withColumn("toks", TA.tokens(col("text")))
        .select(col("doc_id"), explode(NearDup.shingleExpr("toks", 3)).as("sh"))
        .groupBy("sh")
        .agg(countDistinct(col("doc_id")).as("df"), count(lit(1)).as("tf"))
        .orderBy(col("df").desc, col("tf").desc, col("sh")).limit(20)),

    // BOILERPLATE FRACTION per doc: the permille of a doc's distinct
    // 3-grams that are corpus-common (document frequency >= 10% of
    // the corpus, integer cross-multiplied so the threshold is
    // scale-relative, not a magic absolute). 100 TB shape: the common
    // set is small BY CONSTRUCTION (>= 10% df caps it at 10 shingles
    // per corpus-sized unit of text) so it BROADCASTS; the per-doc
    // side joins its distinct shingles against that broadcast and
    // aggregates — the only corpus-wide shuffle is the one df
    // aggregate that mines the set.
    QDef("q_boilerplate_frac", Some(s"""
      WITH $toksCte, ${shCte(3)},
      n AS (SELECT count(*) AS n_docs FROM documents),
      boiler AS (SELECT sh FROM sh CROSS JOIN n
                 GROUP BY sh, n_docs HAVING count(*) * 10 >= n_docs),
      j AS (SELECT s.doc_id, count(*) AS n_sh,
                   count(b.sh) AS n_boiler
            FROM sh s LEFT JOIN boiler b ON s.sh = b.sh
            GROUP BY s.doc_id)
      SELECT doc_id, CAST(n_sh AS BIGINT) AS n_sh,
             CAST(n_boiler AS BIGINT) AS n_boiler,
             (1000 * n_boiler) // n_sh AS boiler_permille,
             CASE WHEN (1000 * n_boiler) // n_sh >= 500 THEN 1 ELSE 0 END AS mostly_boiler
      FROM j ORDER BY doc_id"""),
      (s, d) => {
        val docs = t(s, d, "documents")
        // isNotNull bake (r17 OPT, the q_jsd_sources discipline): the
        // boiler branch's join key pushes isnotnull(sh) into its copy
        // of the shingle subtree; adding the same (vacuous — concat_ws
        // never yields null) predicate here makes both copies
        // canonically identical so the tokenize+explode+distinct stage
        // is computed once and reused, instead of twice.
        val sh = NearDup.shinglesN(docs, "doc_id", "text", 3)
          .filter(col("sh").isNotNull)
        val nDocs = docs.agg(count(lit(1)).as("n_docs"))
        val boiler = sh.groupBy("sh")
          .agg(count(lit(1)).as("df"))
          .crossJoin(broadcast(nDocs))
          .filter(col("df") * 10 >= col("n_docs"))
          .select("sh")
        sh.join(broadcast(boiler.withColumn("_hit", lit(1))), Seq("sh"), "left")
          .groupBy("doc_id")
          .agg(count(lit(1)).cast(LongType).as("n_sh"),
            count(col("_hit")).cast(LongType).as("n_boiler"))
          .select(col("doc_id"), col("n_sh"), col("n_boiler"),
            expr("div(1000 * n_boiler, n_sh)").as("boiler_permille"))
          .withColumn("mostly_boiler",
            when(col("boiler_permille") >= 500, 1).otherwise(0))
          .orderBy("doc_id")
      }),

    // Weighted EPOCH MIXING: replicate each source document per its
    // language's mixture weight — en downsampled to 0.5 epochs, zh
    // upsampled to 2.5, the rest at 1.0. Whole copies come from an
    // integer explode; the fractional epoch keeps a doc iff a
    // seed-stamped md5 nibble clears the fraction (the same
    // deterministic-hash idiom as q_sample_stratified — reproducible
    // on any engine, any partitioning, unlike rand()). 100 TB shape:
    // a pure per-row projection + explode, ZERO shuffles, and the
    // explode factor is the mixture weight itself (bounded, known).
    QDef("q_mix_weighted", Some("""
      WITH w AS (SELECT doc_id, lang,
        CASE lang WHEN 'en' THEN 0 WHEN 'zh' THEN 2 ELSE 1 END
          + CASE WHEN CASE lang WHEN 'en' THEN 8 WHEN 'zh' THEN 8 ELSE 0 END
                      > CAST(('0x' || substr(md5('epoch1|' || doc_id), 1, 1)) AS INTEGER)
                 THEN 1 ELSE 0 END AS n_copies
        FROM documents)
      SELECT doc_id, lang, CAST(unnest(range(1, n_copies + 1)) AS BIGINT) AS copy_n
      FROM w ORDER BY doc_id, copy_n"""),
      (s, d) =>
        // the copy-count tree lives ONCE in graft.text.Mixing — shared
        // with the streaming ingest variant (DocStream.mixedStream),
        // so this oracle check covers both
        graft.text.Mixing.explodeCopies(
          t(s, d, "documents").select("doc_id", "lang"),
          graft.text.Mixing.epochCopies(col("lang"), col("doc_id"), "epoch1",
            Map("en" -> 500, "zh" -> 2500), 1000))
          .orderBy("doc_id", "copy_n")),

    // Corpus LENGTH HISTOGRAM: fixed char-length bands with count /
    // min / max / total — the "what am I about to train on" overview
    // stat. One scan, one tiny hash aggregate.
    QDef("q_doc_len_hist", Some("""
      WITH b AS (SELECT n_chars,
        CASE WHEN n_chars < 128 THEN 'a_lt128'
             WHEN n_chars < 256 THEN 'b_lt256'
             WHEN n_chars < 384 THEN 'c_lt384'
             WHEN n_chars < 512 THEN 'd_lt512'
             ELSE 'e_ge512' END AS bucket
        FROM documents)
      SELECT bucket, count(*) AS n_docs,
             min(n_chars) AS min_chars, max(n_chars) AS max_chars,
             CAST(sum(n_chars) AS BIGINT) AS sum_chars
      FROM b GROUP BY bucket ORDER BY bucket"""),
      (s, d) => t(s, d, "documents")
        .withColumn("bucket",
          when(col("n_chars") < 128, "a_lt128")
            .when(col("n_chars") < 256, "b_lt256")
            .when(col("n_chars") < 384, "c_lt384")
            .when(col("n_chars") < 512, "d_lt512")
            .otherwise("e_ge512"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_docs"),
          min(col("n_chars")).as("min_chars"),
          max(col("n_chars")).as("max_chars"),
          sum(col("n_chars")).cast(LongType).as("sum_chars"))
        .orderBy("bucket")),

    // The composed CURATION LIFECYCLE (pipeline.Curation — the
    // training-data runFull): quality gate → exact dedup → near-dup
    // cluster reps → benchmark decontamination → split assignment,
    // audited as per-stage survivor counts and verified end-to-end
    // against one oracle statement that replays the WHOLE chain.
    // Runs on the mod-13 sample (the cluster queries' bound) with
    // exact-Jaccard edges so the oracle's recursive-CTE components
    // stay cheap; the scale path swaps in LSH candidate pairs
    // (CurationSpec proves the swap preserves the lifecycle's
    // invariants).
    QDef("q_curate_audit", Some(s"""
      WITH RECURSIVE
      s0 AS (SELECT * FROM documents WHERE doc_id % 13 = 0),
      dd AS (SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks FROM s0),
      m AS (SELECT doc_id,
        CAST(len(toks) AS BIGINT) AS n_tokens,
        CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
        CAST(len(list_filter(toks, t -> t IN ('the', 'a'))) AS BIGINT) AS n_stop,
        CAST(COALESCE(list_sum(list_transform(toks, t -> length(t))), 0) AS BIGINT) AS tok_chars
        FROM dd),
      q AS (SELECT s0.* FROM s0 JOIN m USING (doc_id)
            WHERE n_tokens >= 20 AND n_tokens <= 90
              AND 100 * tok_chars >= 420 * n_tokens AND 100 * tok_chars <= 520 * n_tokens
              AND 2 * n_distinct >= n_tokens AND n_stop > 0),
      ex AS (SELECT min(doc_id) AS doc_id FROM q GROUP BY md5(text)),
      q2 AS (SELECT q.* FROM q JOIN ex USING (doc_id)),
      tok AS (SELECT DISTINCT doc_id, unnest(toks) AS tok
              FROM (SELECT dd.doc_id, dd.toks FROM dd JOIN q2 USING (doc_id))),
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
      edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
                UNION ALL SELECT doc_b, doc_a FROM pairs),
      reach AS (
        SELECT doc_id AS id, doc_id AS r FROM q2
        UNION
        SELECT reach.id, e.dst FROM reach JOIN edges e ON e.src = reach.r),
      cc AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id),
      rp AS (SELECT cc.doc_id, row_number() OVER (PARTITION BY cluster_id
               ORDER BY s0.n_chars DESC, cc.doc_id) AS rn
             FROM cc JOIN s0 ON s0.doc_id = cc.doc_id),
      q3 AS (SELECT q2.* FROM q2 JOIN rp ON rp.doc_id = q2.doc_id AND rp.rn = 1),
      fd AS (SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
             FROM documents),
      evsh AS (SELECT DISTINCT sh FROM
        (SELECT unnest(list_transform(range(1, greatest(len(toks) - 2, 1)),
           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])) AS sh
         FROM fd WHERE doc_id % 50 = 0)),
      trsh AS (SELECT doc_id, unnest(list_transform(range(1, greatest(len(toks) - 2, 1)),
                 i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])) AS sh
               FROM (SELECT fd.doc_id, fd.toks FROM fd JOIN q3 USING (doc_id))
               WHERE doc_id % 50 <> 0),
      bad AS (SELECT DISTINCT trsh.doc_id FROM trsh JOIN evsh USING (sh)),
      q4 AS (SELECT * FROM q3 WHERE doc_id % 50 <> 0
             AND doc_id NOT IN (SELECT doc_id FROM bad)),
      sp AS (SELECT CASE WHEN b < 204 THEN 'f_train' WHEN b < 230 THEN 'g_val'
                         ELSE 'h_test' END AS stage
             FROM (SELECT CAST(('0x' || substr(md5('split1|' || doc_id), 1, 2)) AS INTEGER) AS b
                   FROM q4))
      SELECT * FROM (
        SELECT 'a_raw' AS stage, count(*) AS n_docs FROM s0
        UNION ALL SELECT 'b_quality', count(*) FROM q
        UNION ALL SELECT 'c_exact_dedup', count(*) FROM q2
        UNION ALL SELECT 'd_neardup_rep', count(*) FROM q3
        UNION ALL SELECT 'e_decontam', count(*) FROM q4
        UNION ALL SELECT stage, count(*) FROM sp GROUP BY stage
      ) ORDER BY stage"""),
      (s, d) => {
        val docs = t(s, d, "documents")
        val st = graft.pipeline.Curation.curate(
          docs.filter(col("doc_id") % 13 === 0),
          docs.filter(col("doc_id") % 50 === 0),
          ex => NearDup.tokenJaccardPairs(
            ex.select(col("doc_id"), explode(TA.tokens(col("text"))).as("tok")).distinct(),
            "doc_id", "tok", 6, dfCap = Some(NearDup.TokenDfCap))
            .filter(col("near_dup") === 1).select("doc_a", "doc_b"))
        graft.pipeline.Curation.audit(st)
      }),

    // QUALITY-WEIGHTED importance resampling: docs keep with a rate
    // tied to their lexical-diversity bucket (TTR ≥600‰ keep-all,
    // ≥400‰ half, else quarter), decided by a seed-stamped md5 byte
    // of doc_id — the Mixing.splitAssign determinism trick, so the
    // SAME docs survive on any engine, run, or partitioning (what
    // rand()-based sampling can't promise, and what makes the sample
    // reproducible for a training run). Pure per-row projection +
    // filter: zero shuffles at any corpus size.
    QDef("q_quality_resample", Some(s"""
      WITH $toksCte,
      q AS (SELECT doc_id,
              (1000 * CAST(len(list_distinct(toks)) AS BIGINT))
                // CAST(len(toks) AS BIGINT) AS ttr
            FROM d WHERE len(toks) > 0),
      h AS (SELECT doc_id, ttr,
              CASE WHEN ttr >= 600 THEN 'hi' WHEN ttr >= 400 THEN 'mid' ELSE 'lo' END AS bucket,
              CAST(('0x' || substr(md5('qrs1|' || doc_id), 1, 2)) AS INTEGER) AS b
            FROM q)
      SELECT doc_id, bucket, ttr, CAST(b AS BIGINT) AS b FROM h
      WHERE b < CASE bucket WHEN 'hi' THEN 256 WHEN 'mid' THEN 128 ELSE 64 END
      ORDER BY doc_id"""),
      (s, d) => {
        val q = t(s, d, "documents")
          .withColumn("toks", TA.tokens(col("text")))
          .filter(size(col("toks")) > 0)
          .select(col("doc_id"),
            expr("(1000 * cast(size(array_distinct(toks)) AS BIGINT)) div size(toks)")
              .as("ttr"))
        q.withColumn("bucket",
            when(col("ttr") >= 600, "hi").when(col("ttr") >= 400, "mid")
              .otherwise("lo"))
          .withColumn("b", conv(substring(
            md5(concat(lit("qrs1|"), col("doc_id").cast(StringType))), 1, 2),
            16, 10).cast(LongType))
          .filter(col("b") < when(col("bucket") === "hi", 256)
            .when(col("bucket") === "mid", 128).otherwise(64))
          .select("doc_id", "bucket", "ttr", "b")
          .orderBy("doc_id")
      }),

    // PACKING-EFFICIENCY readout for q_pack_sequences: per context
    // window (shard, seq_id), how many docs landed, their token
    // mass, and the fill permille against the 256-token budget
    // (>1000 = the window's last doc overflows into the next — the
    // waste/overflow signal a packing strategy is tuned by). Same
    // one-shuffle window as the packer, then a dim-sized aggregate.
    QDef("q_pack_fill_eval", Some(s"""
      WITH $toksCte,
      n AS (SELECT doc_id, doc_id % 4 AS shard,
                   CAST(len(toks) AS BIGINT) AS n_tokens FROM d),
      w AS (SELECT doc_id, shard, n_tokens,
                   CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
            FROM n),
      p AS (SELECT shard, (cum - n_tokens) // 256 AS seq_id, n_tokens FROM w)
      SELECT shard, seq_id, count(*) AS n_docs,
             CAST(sum(n_tokens) AS BIGINT) AS seq_tokens,
             (1000 * CAST(sum(n_tokens) AS BIGINT)) // 256 AS fill_permille
      FROM p GROUP BY 1, 2 ORDER BY shard, seq_id"""),
      (s, d) => {
        val w = Window.partitionBy("shard").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, d, "documents")
          .select(col("doc_id"), (col("doc_id") % 4).as("shard"),
            TA.tokenCount(col("text")).as("n_tokens"))
          .withColumn("cum", sum(col("n_tokens")).over(w).cast(LongType))
          .select(col("shard"), expr("div(cum - n_tokens, 256)").as("seq_id"),
            col("n_tokens"))
          .groupBy("shard", "seq_id")
          .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("seq_tokens"))
          .withColumn("fill_permille", expr("(1000 * seq_tokens) div 256"))
          .orderBy("shard", "seq_id")
      }),

    // K-ANONYMITY AUDIT (k=5) over the quasi-identifier tuple
    // (lang, source, length-centile-bucket): every equivalence class
    // with its population and a risky flag for classes smaller than
    // k — the release-gate a privacy review runs BEFORE a corpus
    // ships (q_pii_redact scrubs direct identifiers; this catches
    // re-identification by rare attribute combination, which
    // redaction can't). One hash aggregate on the QI tuple with
    // map-side partials; class count is bounded by the QI domain,
    // not the corpus, so the output stays dim-sized at 100 TB.
    QDef("q_k_anonymity", Some("""
      WITH g AS (SELECT lang, source, n_chars // 100 AS len_bucket,
          CAST(count(*) AS BIGINT) AS cnt FROM documents GROUP BY 1, 2, 3)
      SELECT lang, source, len_bucket, cnt,
          CAST(CASE WHEN cnt < 5 THEN 1 ELSE 0 END AS BIGINT) AS risky
      FROM g ORDER BY lang, source, len_bucket"""),
      (s, d) =>
        t(s, d, "documents")
          .groupBy(col("lang"), col("source"),
            expr("div(n_chars, 100)").as("len_bucket"))
          .agg(count(lit(1)).as("cnt"))
          .select(col("lang"), col("source"), col("len_bucket"), col("cnt"),
            when(col("cnt") < 5, 1L).otherwise(0L).as("risky"))
          .orderBy("lang", "source", "len_bucket")),

    // L-DIVERSITY AUDIT (l=3) — the companion gate q_k_anonymity
    // cannot express: a class can be large (k-anonymous) yet still
    // leak because every member shares ONE sensitive value (the
    // homogeneity attack of Machanavajjhala 2006). QI here is
    // (source, length-bucket); the sensitive attribute is `lang` (a
    // nationality-grade proxy). Per class: population, DISTINCT
    // sensitive values, the dominant value's share in permille (the
    // probabilistic-inference view — 1000 means total homogeneity),
    // and risky = fewer than l distinct values. Scale shape: TWO
    // map-side-combined hash aggregates — raw rows collapse to
    // (QI, lang) counts first, so the distinct count is a plain
    // count over the collapsed table, never a count-distinct shuffle
    // of corpus rows; output is bounded by the QI×sensitive domain
    // at any corpus size. Integer-exact end to end.
    QDef("q_l_diversity", Some("""
      WITH g AS (SELECT source, n_chars // 100 AS len_bucket, lang,
          CAST(count(*) AS BIGINT) AS cnt FROM documents GROUP BY 1, 2, 3),
      c AS (SELECT source, len_bucket,
          CAST(sum(cnt) AS BIGINT) AS cnt,
          CAST(count(*) AS BIGINT) AS n_sensitive,
          CAST(max(cnt) AS BIGINT) AS top_cnt
        FROM g GROUP BY 1, 2)
      SELECT source, len_bucket, cnt, n_sensitive,
          (1000 * top_cnt) // cnt AS top_share_permille,
          CAST(CASE WHEN n_sensitive < 3 THEN 1 ELSE 0 END AS BIGINT) AS risky
      FROM c ORDER BY source, len_bucket"""),
      (s, d) =>
        t(s, d, "documents")
          .groupBy(col("source"), expr("div(n_chars, 100)").as("len_bucket"),
            col("lang"))
          .agg(count(lit(1)).as("cnt"))
          .groupBy("source", "len_bucket")
          .agg(sum("cnt").cast(LongType).as("cnt"),
            count(lit(1)).as("n_sensitive"),
            max("cnt").cast(LongType).as("top_cnt"))
          .select(col("source"), col("len_bucket"), col("cnt"),
            col("n_sensitive"),
            expr("div(1000 * top_cnt, cnt)").as("top_share_permille"),
            when(col("n_sensitive") < 3, 1L).otherwise(0L).as("risky"))
          .orderBy("source", "len_bucket")),

    // T-CLOSENESS AUDIT (t = 0.2, Li 2007) — the third privacy gate,
    // closing the triad q_k_anonymity (class too small) and
    // q_l_diversity (class too uniform) leave open: a class can be
    // large AND diverse yet still leak because its sensitive-value
    // DISTRIBUTION differs sharply from the corpus-wide one (the
    // skewness attack — "this class is 90% zh in a 15% zh corpus"
    // is an inference gain even with all 5 values present). Distance
    // is total variation (the categorical EMD), kept INTEGER-EXACT by
    // clearing denominators: TV·(2·cls_n·N) = Σ_v |N·cv − cls_n·g_v|,
    // so tv_permille = (500·Σ|…|) div (cls_n·N) with no floating
    // division until the final floor. Absent values contribute their
    // full global mass via the class × global-domain cross join.
    // Scale shape: raw rows collapse once to (QI, lang) counts
    // (map-side combined); everything after runs on that support
    // table crossed with the |langs|-row broadcast global — output
    // and state bounded by the QI×sensitive domain at any corpus
    // size. Magnitudes: N·cv ≤ N² = 2.5e11 at sf10, ×500 well inside
    // BIGINT.
    QDef("q_t_closeness", Some("""
      WITH g AS (SELECT source, n_chars // 100 AS len_bucket, lang,
          CAST(count(*) AS BIGINT) AS cnt FROM documents GROUP BY 1, 2, 3),
      c AS (SELECT source, len_bucket, CAST(sum(cnt) AS BIGINT) AS cls_n
            FROM g GROUP BY 1, 2),
      gl AS (SELECT lang, CAST(sum(cnt) AS BIGINT) AS gcnt FROM g GROUP BY 1),
      tt AS (SELECT CAST(sum(gcnt) AS BIGINT) AS n FROM gl),
      x AS (SELECT c.source, c.len_bucket, c.cls_n, gl.gcnt, tt.n,
              COALESCE(g.cnt, 0) AS cv
            FROM c CROSS JOIN gl CROSS JOIN tt
            LEFT JOIN g ON g.source = c.source
              AND g.len_bucket = c.len_bucket AND g.lang = gl.lang),
      a AS (SELECT source, len_bucket, cls_n,
              CAST((500 * sum(abs(n * cv - cls_n * gcnt)))
                // (cls_n * max(n)) AS BIGINT) AS tv_permille
            FROM x GROUP BY 1, 2, 3)
      SELECT source, len_bucket, cls_n, tv_permille,
          CAST(CASE WHEN tv_permille > 200 THEN 1 ELSE 0 END AS BIGINT) AS risky
      FROM a ORDER BY source, len_bucket"""),
      (s, d) => {
        val g = t(s, d, "documents")
          .groupBy(col("source"), expr("div(n_chars, 100)").as("len_bucket"),
            col("lang"))
          .agg(count(lit(1)).as("cnt"))
        val c = g.groupBy("source", "len_bucket")
          .agg(sum("cnt").cast(LongType).as("cls_n"))
        val gl = g.groupBy("lang").agg(sum("cnt").cast(LongType).as("gcnt"))
        val tt = gl.agg(sum("gcnt").cast(LongType).as("n"))
        c.crossJoin(broadcast(gl)).crossJoin(broadcast(tt))
          .join(g, Seq("source", "len_bucket", "lang"), "left")
          .select(col("source"), col("len_bucket"), col("cls_n"), col("gcnt"),
            col("n"), coalesce(col("cnt"), lit(0L)).as("cv"))
          .groupBy("source", "len_bucket", "cls_n")
          .agg(expr("div(500 * sum(abs(n * cv - cls_n * gcnt)), cls_n * max(n))")
            .as("tv_permille"))
          .select(col("source"), col("len_bucket"), col("cls_n"),
            col("tv_permille"),
            when(col("tv_permille") > 200, 1L).otherwise(0L).as("risky"))
          .orderBy("source", "len_bucket")
      }),

    // CCNET HEAD/MIDDLE/TAIL BUCKETS (Wenzek 2020): rank each
    // language's documents by LM quality and split into terciles —
    // the curation cut CCNet/LLaMA-era recipes apply per language
    // (keep head+middle, drop tail) so high-resource languages don't
    // set the quality bar for low-resource ones. The LM score is the
    // engine's self-supervised bigram proxy (q_doc_lm_score's exact
    // pipeline — high milli-score = in-distribution = "head", the
    // low-perplexity end). Tercile assignment is SCORE-GROUP ATOMIC:
    // bucket = 1 + floor(3·p0/n) where p0 is the group's 0-based
    // start position in the per-language score-descending order —
    // ties land in one bucket together, so the split is a pure
    // function of the score (deterministic in any engine, no
    // doc-level tiebreak window). Scale shape: the scoring pass is
    // the tf-idf shape (explode → map-side-combined bigram count →
    // key join → doc re-agg); the tercile windows then run over the
    // (lang, score) SUPPORT table — bounded by distinct milli scores,
    // not corpus rows — the q_weighted_median support-table
    // discipline applied proactively rather than retrofitted. Output
    // is ≤ 3·|langs| rows at any corpus size; BIGINT-exact
    // throughout (both engines' integer division on non-negative
    // operands).
    QDef("q_ccnet_buckets", Some("""
      WITH d AS (SELECT doc_id, lang,
        list_filter(string_split(text, ' '), t -> t <> '') AS toks FROM documents),
      bi AS (SELECT doc_id, unnest(list_transform(range(1, greatest(len(toks), 1)),
               i -> toks[i] || ' ' || toks[i+1])) AS bg FROM d),
      bc AS (SELECT bg, CAST(count(*) AS BIGINT) AS cnt FROM bi GROUP BY bg),
      ds AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
                    CAST(sum(cnt) AS BIGINT) AS sum_cnt
             FROM bi JOIN bc USING (bg) GROUP BY doc_id),
      sc AS (SELECT d.doc_id, d.lang,
               CASE WHEN coalesce(n_bigrams, 0) = 0 THEN 0
                    ELSE (1000 * sum_cnt) // n_bigrams END AS score
             FROM d LEFT JOIN ds USING (doc_id)),
      sup AS (SELECT lang, score, CAST(count(*) AS BIGINT) AS cnt
              FROM sc GROUP BY 1, 2),
      cum AS (SELECT lang, score, cnt,
                sum(cnt) OVER (PARTITION BY lang ORDER BY score DESC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS chi,
                sum(cnt) OVER (PARTITION BY lang) AS n
              FROM sup),
      bk AS (SELECT lang, score, cnt, n,
               1 + (3 * (chi - cnt)) // n AS bucket FROM cum)
      SELECT lang, CAST(bucket AS BIGINT) AS bucket,
             CAST(sum(cnt) AS BIGINT) AS n_docs,
             CAST((1000 * sum(cnt)) // max(n) AS BIGINT) AS share_permille,
             CAST(min(score) AS BIGINT) AS score_min,
             CAST(max(score) AS BIGINT) AS score_max
      FROM bk GROUP BY 1, 2 ORDER BY lang, bucket"""),
      (s, d) => {
        val docs = t(s, d, "documents")
          .select(col("doc_id"), col("lang"), TA.tokens(col("text")).as("toks"))
        val bi = docs.select(col("doc_id"),
          explode(NearDup.shingleExpr("toks", 2)).as("bg"))
        val bc = bi.groupBy("bg").agg(count(lit(1)).as("cnt"))
        val ds = bi.join(bc, "bg").groupBy("doc_id")
          .agg(count(lit(1)).as("n_bigrams"), sum(col("cnt")).as("sum_cnt"))
        val sc = docs.select("doc_id", "lang").join(ds, Seq("doc_id"), "left")
          .select(col("lang"),
            when(coalesce(col("n_bigrams"), lit(0L)) === 0, lit(0L))
              .otherwise(expr("div(1000 * sum_cnt, n_bigrams)")).as("score"))
        val sup = sc.groupBy("lang", "score").agg(count(lit(1)).as("cnt"))
        val wCum = Window.partitionBy("lang").orderBy(col("score").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wAll = Window.partitionBy("lang")
        sup
          .withColumn("chi", sum("cnt").over(wCum))
          .withColumn("n", sum("cnt").over(wAll))
          .withColumn("bucket", expr("1 + div(3 * (chi - cnt), n)"))
          .groupBy("lang", "bucket")
          .agg(sum("cnt").cast(LongType).as("n_docs"),
            max("n").as("n"),
            min("score").cast(LongType).as("score_min"),
            max("score").cast(LongType).as("score_max"))
          .select(col("lang"), col("bucket"), col("n_docs"),
            expr("div(1000 * n_docs, n)").as("share_permille"),
            col("score_min"), col("score_max"))
          .orderBy("lang", "bucket")
      }),

    // Decision-stump split search — the 1-D CART building block: for
    // every candidate threshold on an integral feature (l_quantity,
    // label = returned line), the left/right class counts and the
    // Gini-purity score of the split. One fact-scan aggregate to
    // per-value counts (feature-cardinality rows, ≤50 here), then a
    // prefix-sum window over that TINY table gives every threshold's
    // left side in one pass — the classic histogram-based split
    // finder (the single-partition window is over feature values,
    // never data rows, so it is scale-free; the grand total rides a
    // 1-row broadcast). Purity is computed from milli-unit class
    // shares so every intermediate stays a small BIGINT at ANY row
    // count — no count-squared term that would overflow at 100 TB.
    // The max-quantity row is the degenerate empty-right split and is
    // excluded. score_micro ≤ 1e6; is_best tags the argmax
    // (score desc, threshold asc tiebreak).
    QDef("q_decision_stump", Some("""
      WITH b AS (SELECT CAST(l_quantity AS BIGINT) AS q,
                        CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS lab
                 FROM lineitem),
      per AS (SELECT q, CAST(sum(lab) AS BIGINT) AS pos,
                     CAST(count(*) AS BIGINT) AS n
              FROM b GROUP BY q),
      cum AS (SELECT q,
                sum(pos) OVER (ORDER BY q
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cpos,
                sum(n) OVER (ORDER BY q
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cn
              FROM per),
      tot AS (SELECT sum(pos) AS tpos, sum(n) AS tn FROM per),
      sc AS (SELECT q, cpos, cn, tpos, tn,
               (1000 * cpos) // cn AS pl,
               (1000 * (tpos - cpos)) // (tn - cn) AS pr
             FROM cum, tot WHERE tn - cn > 0)
      SELECT q AS threshold,
             CAST(cpos AS BIGINT) AS n_pos_left, CAST(cn AS BIGINT) AS n_left,
             CAST(tpos - cpos AS BIGINT) AS n_pos_right,
             CAST(tn - cn AS BIGINT) AS n_right,
             CAST((pl * pl + (1000 - pl) * (1000 - pl)) * cn // tn +
                  (pr * pr + (1000 - pr) * (1000 - pr)) * (tn - cn) // tn
               AS BIGINT) AS score_micro,
             CASE WHEN row_number() OVER (
                    ORDER BY (pl * pl + (1000 - pl) * (1000 - pl)) * cn // tn +
                             (pr * pr + (1000 - pr) * (1000 - pr)) * (tn - cn) // tn
                               DESC, q) = 1
                  THEN 1 ELSE 0 END AS is_best
      FROM sc ORDER BY threshold"""),
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val per = t(s, d, "lineitem")
          .select(col("l_quantity").cast("long").as("q"),
            when(col("l_returnflag") === "R", 1L).otherwise(0L).as("lab"))
          .groupBy("q")
          .agg(sum("lab").cast("long").as("pos"), count(lit(1)).as("n"))
        // feature-cardinality windows (≤50 rows) — single partition is fine
        val w = Window.orderBy("q")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = per.select(col("q"),
          sum("pos").over(w).as("cpos"), sum("n").over(w).as("cn"))
        val tot = per.agg(sum("pos").cast("long").as("tpos"),
          sum("n").cast("long").as("tn"))
        cum.crossJoin(broadcast(tot))
          .filter(col("tn") - col("cn") > 0)
          .withColumn("pl", expr("div(1000 * cpos, cn)"))
          .withColumn("pr", expr("div(1000 * (tpos - cpos), (tn - cn))"))
          .withColumn("score_micro",
            expr("""div((pl * pl + (1000 - pl) * (1000 - pl)) * cn, tn) +
                    div((pr * pr + (1000 - pr) * (1000 - pr)) * (tn - cn), tn)""")
              .cast("long"))
          .select(col("q").as("threshold"),
            col("cpos").cast("long").as("n_pos_left"),
            col("cn").cast("long").as("n_left"),
            (col("tpos") - col("cpos")).cast("long").as("n_pos_right"),
            (col("tn") - col("cn")).cast("long").as("n_right"),
            col("score_micro"),
            when(row_number().over(
              Window.orderBy(col("score_micro").desc, col("q"))) === 1,
              1L).otherwise(0L).as("is_best"))
          .orderBy("threshold")
      }),

    // Neyman-optimal stratified sampling allocation — the survey-
    // sampling answer to "which strata deserve the sample budget":
    // allocate ∝ N_h·S_h (stratum size × stratum std-dev of
    // n_chars), so high-variance strata get proportionally more
    // draws than proportional allocation would give. One
    // map-side-combined pass computes each stratum's exact integer
    // moments; S_h comes out as a FLOORED MILLI-UNIT integer (the
    // sqrt argument is the same exactly-rounded IEEE double in both
    // engines), and every ratio after that is integer arithmetic on
    // positive values — the share denominator is an exact integer
    // sum, never a float accumulation whose ordering could differ
    // between engines. Singleton strata (n<2) have undefined S and
    // get weight 0. Budget = 1000 draws.
    QDef("q_sample_neyman", Some("""
      WITH m AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(n_chars) AS BIGINT) AS sy,
                   CAST(sum(n_chars * n_chars) AS BIGINT) AS syy
                 FROM documents GROUP BY 1, 2),
      s AS (SELECT lang, source, n,
              CASE WHEN n < 2 THEN 0
                ELSE CAST(floor(1000.0 * sqrt(
                  CAST(n * syy - sy * sy AS DOUBLE) / (n * (n - 1)))) AS BIGINT)
              END AS s_milli
            FROM m),
      w AS (SELECT lang, source, n, s_milli, n * s_milli AS wgt FROM s),
      tw AS (SELECT sum(wgt) AS tot FROM w)
      SELECT lang, source, n, s_milli,
             CAST((1000000 * wgt) // tot AS BIGINT) AS share_ppm,
             CAST((1000 * wgt) // tot AS BIGINT) AS alloc_n
      FROM w, tw ORDER BY lang, source"""),
      (s, d) => {
        val m = t(s, d, "documents")
          .groupBy("lang", "source")
          .agg(count(lit(1)).as("n"),
            sum("n_chars").cast("long").as("sy"),
            sum(col("n_chars") * col("n_chars")).cast("long").as("syy"))
        val w = m.select(col("lang"), col("source"), col("n"),
          when(col("n") < 2, 0L)
            .otherwise(floor(lit(1000.0) * sqrt(
              (col("n") * col("syy") - col("sy") * col("sy")).cast("double") /
                (col("n") * (col("n") - 1)))).cast("long"))
            .as("s_milli"))
          .withColumn("wgt", col("n") * col("s_milli"))
        w.crossJoin(broadcast(w.agg(sum("wgt").cast("long").as("tot"))))
          .select(col("lang"), col("source"), col("n"), col("s_milli"),
            expr("div(1000000 * wgt, tot)").cast("long").as("share_ppm"),
            expr("div(1000 * wgt, tot)").cast("long").as("alloc_n"))
          .orderBy("lang", "source")
      }),

    // Empirical-Bayes (beta-binomial) smoothed return rate per part —
    // the shrinkage every per-item rate table needs before anyone
    // ranks by it: raw pos/n swings wildly for thin parts, so shrink
    // toward the global mean with prior strength α=20 pseudo-counts:
    // smoothed = (pos + α·μ)/(n + α). The global mean enters as its
    // FLOORED ppm (one broadcast row) so the whole formula stays
    // small-integer arithmetic — no pos·D product that would
    // overflow when the corpus denominator D hits trillions. Raw and
    // smoothed ship side by side; thin parts visibly pull toward
    // mu_ppm, fat parts barely move.
    QDef("q_eb_smoothed_rate", Some("""
      WITH per AS (SELECT l_partkey,
              CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                AS BIGINT) AS pos,
              CAST(count(*) AS BIGINT) AS n
            FROM lineitem GROUP BY 1),
      g AS (SELECT (1000000 * sum(pos)) // sum(n) AS mu_ppm FROM per)
      SELECT l_partkey, n, pos,
             CAST((1000000 * pos) // n AS BIGINT) AS raw_ppm,
             CAST((1000000 * pos + 20 * mu_ppm) // (n + 20) AS BIGINT)
               AS smoothed_ppm
      FROM per, g ORDER BY l_partkey"""),
      (s, d) => {
        val per = t(s, d, "lineitem")
          .groupBy("l_partkey")
          .agg(sum(when(col("l_returnflag") === "R", 1L).otherwise(0L))
            .cast("long").as("pos"),
            count(lit(1)).as("n"))
        per.crossJoin(broadcast(
          per.agg(expr("div(1000000 * sum(pos), sum(n))").cast("long")
            .as("mu_ppm"))))
          .select(col("l_partkey"), col("n"), col("pos"),
            expr("div(1000000 * pos, n)").cast("long").as("raw_ppm"),
            expr("div(1000000 * pos + 20 * mu_ppm, n + 20)").cast("long")
              .as("smoothed_ppm"))
          .orderBy("l_partkey")
      }),

    // Sample-Ratio-Mismatch audit over q_split_assign's hash arms —
    // the experimentation-ops check that a deterministic splitter
    // actually lands on its designed 204/26/26-of-256 proportions:
    // exact integer χ² in milli-units, Σ 1000·(256·O − num·N)² /
    // (256·num·N) over the three arms, alarm at the df=2 95%
    // critical value (5.991). The observed counts are one dim-sized
    // aggregate over the same md5-byte assignment the splitter uses;
    // everything downstream is 3-row arithmetic against a broadcast
    // total. Squared deviations stay in BIGINT while N < ~1e8 docs;
    // beyond that, audit per-shard and sum the χ² components.
    QDef("q_srm_check", Some("""
      WITH h AS (SELECT CAST(('0x' || substr(md5('split1|' || doc_id), 1, 2))
                   AS INTEGER) AS b
                 FROM documents),
      o AS (SELECT CASE WHEN b < 204 THEN 'train'
                        WHEN b < 230 THEN 'val' ELSE 'test' END AS split,
                   CASE WHEN b < 204 THEN 204
                        WHEN b < 230 THEN 26 ELSE 26 END AS num
            FROM h),
      cnt AS (SELECT split, num, CAST(count(*) AS BIGINT) AS obs
              FROM o GROUP BY 1, 2),
      tot AS (SELECT sum(obs) AS nn FROM cnt)
      SELECT split, obs, CAST(num AS BIGINT) AS expected_num_256,
             CAST((num * nn) // 256 AS BIGINT) AS expected_n,
             CAST((1000 * (256 * obs - num * nn) * (256 * obs - num * nn)) //
                  (256 * num * nn) AS BIGINT) AS chi2_part_milli,
             CASE WHEN sum((1000 * (256 * obs - num * nn) *
                            (256 * obs - num * nn)) // (256 * num * nn))
                    OVER () > 5991 THEN 1 ELSE 0 END AS srm_alarm
      FROM cnt, tot ORDER BY split"""),
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val cnt = t(s, d, "documents")
          .select((conv(substring(md5(concat(lit("split1|"), col("doc_id"))), 1, 2),
            16, 10).cast(IntegerType)).as("b"))
          .select(
            when(col("b") < 204, "train").when(col("b") < 230, "val")
              .otherwise("test").as("split"),
            when(col("b") < 204, 204L).otherwise(26L).as("num"))
          .groupBy("split", "num").agg(count(lit(1)).as("obs"))
        cnt.crossJoin(broadcast(cnt.agg(sum("obs").cast("long").as("nn"))))
          .withColumn("chi2_part_milli",
            expr("""div(1000 * (256 * obs - num * nn) * (256 * obs - num * nn),
                        256 * num * nn)""").cast("long"))
          .select(col("split"), col("obs"),
            col("num").cast("long").as("expected_num_256"),
            expr("div(num * nn, 256)").cast("long").as("expected_n"),
            col("chi2_part_milli"),
            when(sum("chi2_part_milli")
              .over(Window.partitionBy()) > 5991, 1L).otherwise(0L)
              .as("srm_alarm"))
          .orderBy("split")
      }),

    // Reproducible EPOCH SHUFFLE plan — deterministic per-epoch
    // training order without any RNG state: priority = integer prefix
    // of md5(epoch|doc_id) (the q_feature_hashing byte discipline,
    // widened to 8 hex chars so a BIGINT carries it), ranked within
    // each epoch. Every epoch is an independent permutation, every
    // run reproduces it bit-for-bit — the property a training-data
    // lake must guarantee for loss-curve debugging. The plan ships
    // as each epoch's first five docs plus an ORDER CHECKSUM
    // (Σ rank·doc_id over the whole epoch) so a consumer can verify
    // the full permutation without materializing it twice. Ranking
    // is one window per epoch partition; the checksum reuses the
    // same ranked pass.
    QDef("q_epoch_shuffle_plan", Some("""
      WITH ep AS (SELECT unnest(range(0, 3)) AS epoch),
      h AS (SELECT ep.epoch, d.doc_id,
              CAST(('0x' || substr(md5('ep|' || ep.epoch || '|' || d.doc_id),
                1, 8)) AS BIGINT) AS pri
            FROM documents d CROSS JOIN ep),
      r AS (SELECT epoch, doc_id, pri,
              row_number() OVER (PARTITION BY epoch ORDER BY pri, doc_id)
                AS rnk
            FROM h),
      chk AS (SELECT epoch, CAST(sum(rnk * doc_id) AS BIGINT)
                       AS order_checksum
              FROM r GROUP BY 1)
      SELECT CAST(r.epoch AS BIGINT) AS epoch, CAST(r.rnk AS BIGINT) AS rnk,
             r.doc_id, r.pri, c.order_checksum
      FROM r JOIN chk c USING (epoch) WHERE r.rnk <= 5
      ORDER BY epoch, rnk"""),
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val h = t(s, d, "documents").select(col("doc_id"))
          .withColumn("epoch", explode(expr("sequence(0L, 2L)")))
          .withColumn("pri",
            conv(substring(md5(concat(lit("ep|"), col("epoch").cast("string"),
              lit("|"), col("doc_id").cast("string"))), 1, 8), 16, 10)
              .cast("long"))
        val r = h.withColumn("rnk", row_number().over(
          Window.partitionBy("epoch").orderBy(col("pri"), col("doc_id"))))
        val chk = r.groupBy("epoch")
          .agg(sum(col("rnk") * col("doc_id")).cast("long").as("order_checksum"))
        r.filter(col("rnk") <= 5)
          .join(broadcast(chk), Seq("epoch"))
          .select(col("epoch").cast("long").as("epoch"),
            col("rnk").cast("long").as("rnk"), col("doc_id"), col("pri"),
            col("order_checksum"))
          .orderBy("epoch", "rnk")
      }),

    // CURRICULUM schedule — band the corpus easy→hard on a
    // difficulty proxy (mean token length in milli-chars, integer
    // division) and report each band's population and difficulty
    // range. Banding uses broadcast QUARTILE THRESHOLD scalars
    // (percentile_disc), NOT an ntile over doc-grain — an ntile
    // would drag every doc through one ordered partition, while
    // three 1-row scalars keep the pass embarrassingly parallel at
    // 100 TB (band = 1 + Σ threshold exceedances; quantile ties
    // cluster into the lower band on both engines identically).
    QDef("q_curriculum_schedule", Some("""
      WITH d AS (SELECT doc_id, n_chars,
              len(list_filter(string_split(text, ' '), t -> t <> '')) AS n_toks
            FROM documents),
      diff AS (SELECT doc_id, (1000 * n_chars) // n_toks AS dm
               FROM d WHERE n_toks > 0),
      qs AS (SELECT
               percentile_disc(0.25) WITHIN GROUP (ORDER BY dm) AS q1,
               percentile_disc(0.5) WITHIN GROUP (ORDER BY dm) AS q2,
               percentile_disc(0.75) WITHIN GROUP (ORDER BY dm) AS q3
             FROM diff),
      b AS (SELECT doc_id, dm,
              1 + CASE WHEN dm > q1 THEN 1 ELSE 0 END
                + CASE WHEN dm > q2 THEN 1 ELSE 0 END
                + CASE WHEN dm > q3 THEN 1 ELSE 0 END AS band
            FROM diff, qs)
      SELECT CAST(band AS BIGINT) AS band, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(min(dm) AS BIGINT) AS d_min, CAST(max(dm) AS BIGINT) AS d_max
      FROM b GROUP BY 1 ORDER BY band"""),
      (s, d) => {
        val diff = t(s, d, "documents")
          .select(col("doc_id"), col("n_chars"),
            size(TA.tokens(col("text"))).as("n_toks"))
          .filter(col("n_toks") > 0)
          .select(col("doc_id"), expr("div(1000 * n_chars, n_toks)").as("dm"))
        val qs = diff.agg(
          expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY dm)").as("q1"),
          expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY dm)").as("q2"),
          expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY dm)").as("q3"))
        diff.crossJoin(broadcast(qs))
          .select(col("dm"),
            (lit(1) + when(col("dm") > col("q1"), 1).otherwise(0)
              + when(col("dm") > col("q2"), 1).otherwise(0)
              + when(col("dm") > col("q3"), 1).otherwise(0)).as("band"))
          .groupBy("band")
          .agg(count(lit(1)).as("n_docs"),
            min("dm").cast("long").as("d_min"),
            max("dm").cast("long").as("d_max"))
          .select(col("band").cast("long").as("band"), col("n_docs"),
            col("d_min"), col("d_max"))
          .orderBy("band")
      }),

    // RARE-LABEL COLLAPSE — the categorical-cardinality guard every
    // feature pipeline runs before one-hot/target encoding: labels
    // whose share falls under the threshold (20% here; lang='en'
    // survives, the tail folds into OTHER) collapse to a single
    // bucket, and the distribution is re-reported with provenance
    // (how many source labels each surviving bucket absorbed). Two
    // dim-sized aggregates and one broadcast total — the fact is
    // scanned once; shares are exact integer ppm.
    QDef("q_rare_label_collapse", Some("""
      WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n
                 FROM documents GROUP BY 1),
      tot AS (SELECT sum(n) AS tn FROM c),
      m AS (SELECT CASE WHEN 1000000 * n >= 200000 * tn THEN lang
                        ELSE 'OTHER' END AS label, n
            FROM c, tot)
      SELECT label, CAST(sum(n) AS BIGINT) AS n_docs,
             CAST((1000000 * sum(n)) // max(tn) AS BIGINT) AS share_ppm,
             CAST(count(*) AS BIGINT) AS n_source_labels
      FROM m, tot GROUP BY label ORDER BY label"""),
      (s, d) => {
        val c = t(s, d, "documents").groupBy("lang").agg(count(lit(1)).as("n"))
        val tot = c.agg(sum("n").cast("long").as("tn"))
        c.crossJoin(broadcast(tot))
          .select(when(lit(1000000L) * col("n") >= lit(200000L) * col("tn"),
            col("lang")).otherwise("OTHER").as("label"), col("n"), col("tn"))
          .groupBy("label")
          .agg(sum("n").cast("long").as("n_docs"),
            expr("div(1000000 * sum(n), max(tn))").cast("long").as("share_ppm"),
            count(lit(1)).as("n_source_labels"))
          .orderBy("label")
      }),

    // DEPTH-2 DECISION TREE on the q_decision_stump histogram: find
    // the root split, then the best split WITHIN each branch — the
    // induction step of CART, still entirely histogram-based. The
    // root threshold is a 1-row broadcast scalar (QUALIFY argmax),
    // the children re-run the same prefix-sum-over-feature-values
    // scoring PARTITIONED by branch — so depth-2 costs one more
    // ≤50-row window pass, not another fact scan (the per-value
    // histogram is shared; Catalyst reuses its aggregation subtree).
    // Same milli-share purity arithmetic (overflow-free at any row
    // count). Output: the root row plus each branch's best split.
    QDef("q_tree_depth2", Some("""
      WITH b AS (SELECT CAST(l_quantity AS BIGINT) AS q,
                        CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS lab
                 FROM lineitem),
      per AS (SELECT q, CAST(sum(lab) AS BIGINT) AS pos,
                     CAST(count(*) AS BIGINT) AS n
              FROM b GROUP BY q),
      cum AS (SELECT q,
                sum(pos) OVER (ORDER BY q
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cpos,
                sum(n) OVER (ORDER BY q
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cn
              FROM per),
      tot AS (SELECT sum(pos) AS tpos, sum(n) AS tn FROM per),
      sc AS (SELECT q, cpos, cn, tpos, tn,
               (1000 * cpos) // cn AS pl,
               (1000 * (tpos - cpos)) // (tn - cn) AS pr
             FROM cum, tot WHERE tn - cn > 0),
      scored AS (SELECT q, tpos, tn,
               (pl * pl + (1000 - pl) * (1000 - pl)) * cn // tn +
               (pr * pr + (1000 - pr) * (1000 - pr)) * (tn - cn) // tn
                 AS score
             FROM sc),
      root AS (SELECT q AS t0, tpos AS rpos, tn AS rn2, score AS rscore
               FROM scored QUALIFY row_number()
                 OVER (ORDER BY score DESC, q) = 1),
      side AS (SELECT CASE WHEN per.q <= root.t0 THEN 'left' ELSE 'right' END
                 AS node, per.q, per.pos, per.n
               FROM per, root),
      scum AS (SELECT node, q,
                 sum(pos) OVER (PARTITION BY node ORDER BY q
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cpos,
                 sum(n) OVER (PARTITION BY node ORDER BY q
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cn
               FROM side),
      stot AS (SELECT node, CAST(sum(pos) AS BIGINT) AS tpos,
                 CAST(sum(n) AS BIGINT) AS tn
               FROM side GROUP BY node),
      ssc AS (SELECT s.node, s.q, s.cpos, s.cn, st.tpos, st.tn,
                (1000 * s.cpos) // s.cn AS pl,
                (1000 * (st.tpos - s.cpos)) // (st.tn - s.cn) AS pr
              FROM scum s JOIN stot st USING (node) WHERE st.tn - s.cn > 0),
      child AS (SELECT node, q, tpos, tn,
                  (pl * pl + (1000 - pl) * (1000 - pl)) * cn // tn +
                  (pr * pr + (1000 - pr) * (1000 - pr)) * (tn - cn) // tn
                    AS score
                FROM ssc
                QUALIFY row_number() OVER (PARTITION BY node
                  ORDER BY (pl * pl + (1000 - pl) * (1000 - pl)) * cn // tn +
                           (pr * pr + (1000 - pr) * (1000 - pr)) *
                             (tn - cn) // tn DESC, q) = 1)
      SELECT 'root' AS node, CAST(t0 AS BIGINT) AS threshold,
             CAST(rn2 AS BIGINT) AS n_node, CAST(rpos AS BIGINT) AS pos_node,
             CAST(rscore AS BIGINT) AS score_micro
      FROM root
      UNION ALL
      SELECT node, CAST(q AS BIGINT), CAST(tn AS BIGINT),
             CAST(tpos AS BIGINT), CAST(score AS BIGINT)
      FROM child
      ORDER BY node"""),
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val frame = Window.orderBy("q")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val per = t(s, d, "lineitem")
          .select(col("l_quantity").cast("long").as("q"),
            when(col("l_returnflag") === "R", 1L).otherwise(0L).as("lab"))
          .groupBy("q")
          .agg(sum("lab").cast("long").as("pos"), count(lit(1)).as("n"))
        val tot = per.agg(sum("pos").cast("long").as("tpos"),
          sum("n").cast("long").as("tn"))
        val scoreExpr =
          """div((pl * pl + (1000 - pl) * (1000 - pl)) * cn, tn) +
             div((pr * pr + (1000 - pr) * (1000 - pr)) * (tn - cn), tn)"""
        val scored = per
          .select(col("q"), sum("pos").over(frame).as("cpos"),
            sum("n").over(frame).as("cn"))
          .crossJoin(broadcast(tot))
          .filter(col("tn") - col("cn") > 0)
          .withColumn("pl", expr("div(1000 * cpos, cn)"))
          .withColumn("pr", expr("div(1000 * (tpos - cpos), (tn - cn))"))
          .withColumn("score", expr(scoreExpr))
        val root = scored
          .withColumn("rk", row_number().over(
            Window.orderBy(col("score").desc, col("q"))))
          .filter(col("rk") === 1)
          .select(col("q").as("t0"), col("tpos").as("rpos"),
            col("tn").as("rn2"), col("score").as("rscore"))
        val side = per.crossJoin(broadcast(root))
          .select(when(col("q") <= col("t0"), "left").otherwise("right")
            .as("node"), col("q"), col("pos"), col("n"))
        val sframe = Window.partitionBy("node").orderBy("q")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val stot = side.groupBy("node")
          .agg(sum("pos").cast("long").as("tpos"), sum("n").cast("long").as("tn"))
        val child = side
          .select(col("node"), col("q"),
            sum("pos").over(sframe).as("cpos"), sum("n").over(sframe).as("cn"))
          .join(broadcast(stot), Seq("node"))
          .filter(col("tn") - col("cn") > 0)
          .withColumn("pl", expr("div(1000 * cpos, cn)"))
          .withColumn("pr", expr("div(1000 * (tpos - cpos), (tn - cn))"))
          .withColumn("score", expr(scoreExpr))
          .withColumn("rk", row_number().over(Window.partitionBy("node")
            .orderBy(col("score").desc, col("q"))))
          .filter(col("rk") === 1)
        root.select(lit("root").as("node"), col("t0").cast("long").as("threshold"),
          col("rn2").cast("long").as("n_node"),
          col("rpos").cast("long").as("pos_node"),
          col("rscore").cast("long").as("score_micro"))
          .unionByName(child.select(col("node"),
            col("q").cast("long").as("threshold"),
            col("tn").cast("long").as("n_node"),
            col("tpos").cast("long").as("pos_node"),
            col("score").cast("long").as("score_micro")))
          .orderBy("node")
      }),

    // DEDUP ROI audit — what exact-dedup actually buys: cluster the
    // corpus by content hash (the q_dedup_exact grouping), keep the
    // smallest doc_id as representative, and account the characters
    // the dropped members would have cost in storage/training
    // tokens. The one-row scorecard a curation review opens with.
    // One hash aggregate carrying both count and char sums —
    // map-side combined, no second scan.
    QDef("q_dedup_savings", Some("""
      WITH cl AS (SELECT md5(text) AS h, CAST(count(*) AS BIGINT) AS n,
              CAST(sum(n_chars) AS BIGINT) AS chars,
              CAST(min(n_chars) AS BIGINT) AS rep_chars
            FROM documents GROUP BY 1)
      SELECT CAST(sum(n) AS BIGINT) AS n_docs,
             CAST(count(*) AS BIGINT) AS n_clusters,
             CAST(sum(n - 1) AS BIGINT) AS n_dups,
             CAST(sum(chars) AS BIGINT) AS total_chars,
             CAST(sum(chars - rep_chars) AS BIGINT) AS dropped_chars,
             CAST((1000000 * sum(chars - rep_chars)) // sum(chars) AS BIGINT)
               AS savings_ppm
      FROM cl"""),
      (s, d) =>
        t(s, d, "documents")
          .groupBy(md5(col("text")).as("h"))
          .agg(count(lit(1)).as("n"), sum("n_chars").cast("long").as("chars"),
            min("n_chars").cast("long").as("rep_chars"))
          .agg(sum("n").cast("long").as("n_docs"),
            count(lit(1)).as("n_clusters"),
            sum(col("n") - 1).cast("long").as("n_dups"),
            sum("chars").cast("long").as("total_chars"),
            sum(col("chars") - col("rep_chars")).cast("long")
              .as("dropped_chars"))
          .select(col("n_docs"), col("n_clusters"), col("n_dups"),
            col("total_chars"), col("dropped_chars"),
            expr("div(1000000 * dropped_chars, total_chars)").cast("long")
              .as("savings_ppm"))),

    // TEMPERATURE-SCALED MIXING WEIGHTS (τ = 1/2): per-source
    // sampling weights wᵢ ∝ √shareᵢ — the standard rebalancing that
    // up-weights small sources without letting them dominate
    // (multilingual/DoReMi-style mixing at its most common fixed τ).
    // τ = 1/2 specifically because √ is the ONE power IEEE requires
    // correctly rounded — pow(x, 0.7) can differ across libm
    // implementations, sqrt cannot — so the whole chain is
    // bit-deterministic: micro-share floors once through an
    // exactly-rounded double product (the count²-overflow rule: at
    // 100 TB char totals, 10⁶·chars exceeds BIGINT but the double
    // route is correctly rounded identically in any engine), √ of an
    // integer-valued double, then only INTEGER sums/divs normalize.
    // boost_milli = wᵢ/shareᵢ is the effective oversampling factor a
    // mixing loader applies per source. |sources| rows, one
    // map-side-combined aggregate + two broadcast scalars.
    QDef("q_mix_temperature", Some("""
      WITH a AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS chars
                 FROM documents GROUP BY 1),
      t AS (SELECT CAST(sum(chars) AS BIGINT) AS tot FROM a),
      x AS (SELECT source, n_docs, chars,
              CAST(floor(1000000.0 * chars / tot) AS BIGINT) AS share_micro
            FROM a, t),
      y AS (SELECT *, CAST(floor(sqrt(CAST(share_micro AS DOUBLE))) AS BIGINT) AS s
            FROM x),
      sm AS (SELECT CAST(sum(s) AS BIGINT) AS ssum FROM y)
      SELECT source, n_docs, chars,
             share_micro // 1000 AS share_permille,
             (1000 * s) // ssum AS w_t05_permille,
             CASE WHEN share_micro = 0 THEN NULL
                  ELSE (1000000000 * s) // (ssum * share_micro) END AS boost_milli
      FROM y, sm ORDER BY source"""),
      (s, d) => {
        val a = t(s, d, "documents")
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum("n_chars").cast(LongType).as("chars"))
        val tot = a.agg(sum("chars").cast(LongType).as("tot"))
        val y = a.crossJoin(broadcast(tot))
          .withColumn("share_micro",
            floor(lit(1000000.0) * col("chars") / col("tot")).cast(LongType))
          .withColumn("s",
            floor(sqrt(col("share_micro").cast("double"))).cast(LongType))
        val sm = y.agg(sum("s").cast(LongType).as("ssum"))
        y.crossJoin(broadcast(sm))
          .select(col("source"), col("n_docs"), col("chars"),
            expr("div(share_micro, 1000)").as("share_permille"),
            expr("div(1000 * s, ssum)").as("w_t05_permille"),
            when(col("share_micro") === 0, lit(null))
              .otherwise(expr("div(1000000000 * s, ssum * share_micro)"))
              .cast(LongType).as("boost_milli"))
          .orderBy("source")
      }),

    // QUALITY-CLASSIFIER TRAINING, 2 unrolled full-batch GD steps:
    // logistic regression (en-vs-rest on [1, chars/1000, tokens/100])
    // trained INSIDE the engine — the fastText-style quality-
    // classifier fit as pure aggregates, no ML runtime. From w=0
    // (where sigmoid is exactly 0.5), each step is one mean-gradient
    // aggregate + a broadcast weight update; the readout is the
    // post-step-2 weights and mean log-loss. Deterministic: fixed
    // feature scalings (never data-dependent), lr=1, and every
    // per-doc term is the same IEEE expression on both engines,
    // rounded AFTER the final aggregate. Scale shape: 3 linear
    // passes over docs (gradient, gradient, loss), each one
    // map-side-combined aggregate; weights travel as broadcast
    // 1-row scalars. No shuffle at any width.
    QDef("q_logreg_gd_steps", Some("""
      WITH f AS (SELECT CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
                        n_chars / 1000.0 AS x2,
                        len(list_filter(string_split(text, ' '), t -> t <> '')) / 100.0 AS x3
                 FROM documents),
      g0 AS (SELECT count(*) AS n,
                    sum(0.5 - y) / count(*) AS g1,
                    sum(x2 * (0.5 - y)) / count(*) AS g2,
                    sum(x3 * (0.5 - y)) / count(*) AS g3 FROM f),
      w1 AS (SELECT n, -g1 AS a1, -g2 AS a2, -g3 AS a3 FROM g0),
      g1s AS (SELECT n, a1, a2, a3,
                sum(1.0 / (1.0 + exp(-(a1 + a2 * x2 + a3 * x3))) - y) / n AS h1,
                sum(x2 * (1.0 / (1.0 + exp(-(a1 + a2 * x2 + a3 * x3))) - y)) / n AS h2,
                sum(x3 * (1.0 / (1.0 + exp(-(a1 + a2 * x2 + a3 * x3))) - y)) / n AS h3
              FROM f, w1 GROUP BY n, a1, a2, a3),
      w2 AS (SELECT n, a1 - h1 AS b1, a2 - h2 AS b2, a3 - h3 AS b3 FROM g1s),
      ls AS (SELECT n, b1, b2, b3,
               sum(-(y * ln(1.0 / (1.0 + exp(-(b1 + b2 * x2 + b3 * x3))))
                 + (1.0 - y) * ln(1.0 - 1.0 / (1.0 + exp(-(b1 + b2 * x2 + b3 * x3)))))) / n AS loss
             FROM f, w2 GROUP BY n, b1, b2, b3)
      SELECT CAST(n AS BIGINT) AS n_docs,
             (round(b1, 4) + 0.0) AS w_bias4, (round(b2, 4) + 0.0) AS w_chars4,
             (round(b3, 4) + 0.0) AS w_tokens4, (round(loss, 4) + 0.0) AS loss4
      FROM ls"""),
      (s, d) => {
        val f = t(s, d, "documents")
          .select(when(col("lang") === "en", lit(1.0)).otherwise(lit(0.0)).as("y"),
            (col("n_chars") / lit(1000.0)).as("x2"),
            (size(TA.tokens(col("text"))) / lit(100.0)).as("x3"))
        val g0 = f.agg(count(lit(1)).as("n"),
          (sum(lit(0.5) - col("y")) / count(lit(1))).as("g1"),
          (sum(col("x2") * (lit(0.5) - col("y"))) / count(lit(1))).as("g2"),
          (sum(col("x3") * (lit(0.5) - col("y"))) / count(lit(1))).as("g3"))
        val w1 = g0.select(col("n"), (-col("g1")).as("a1"),
          (-col("g2")).as("a2"), (-col("g3")).as("a3"))
        def sig(z: org.apache.spark.sql.Column) =
          lit(1.0) / (lit(1.0) + exp(-z))
        val fw1 = f.crossJoin(broadcast(w1))
        val z1 = col("a1") + col("a2") * col("x2") + col("a3") * col("x3")
        val g1s = fw1.groupBy("n", "a1", "a2", "a3")
          .agg((sum(sig(z1) - col("y")) / col("n")).as("h1"),
            (sum(col("x2") * (sig(z1) - col("y"))) / col("n")).as("h2"),
            (sum(col("x3") * (sig(z1) - col("y"))) / col("n")).as("h3"))
        val w2 = g1s.select(col("n"), (col("a1") - col("h1")).as("b1"),
          (col("a2") - col("h2")).as("b2"), (col("a3") - col("h3")).as("b3"))
        val z2 = col("b1") + col("b2") * col("x2") + col("b3") * col("x3")
        f.crossJoin(broadcast(w2)).groupBy("n", "b1", "b2", "b3")
          .agg((sum(-(col("y") * log(sig(z2))
            + (lit(1.0) - col("y")) * log(lit(1.0) - sig(z2)))) / col("n")).as("loss"))
          .select(col("n").cast(LongType).as("n_docs"),
            round(col("b1"), 4).as("w_bias4"), round(col("b2"), 4).as("w_chars4"),
            round(col("b3"), 4).as("w_tokens4"), round(col("loss"), 4).as("loss4"))
      }),

    // DSIR IMPORTANCE WEIGHTS (Data Selection via Importance
    // Resampling, Xie et al. 2023): score every raw-pool doc by how
    // much more likely its hashed-bigram profile is under the TARGET
    // distribution (the doc_id%50=0 eval slice, the same stand-in
    // q_decontam_ngram uses) than under the raw pool itself.
    // log w(d) = Σ_b n_db·[ln(ct_b+1) − ln(cr_b+1)]
    //         + n_d·[ln(Nr+B) − ln(Nt+B)]   (add-1 over B=256 buckets)
    // Bigrams hash through the shared md5-byte discipline
    // (q_feature_hashing), so both engines bucket identically. Scale
    // shape: the two bucket-count tables are ≤256 rows — the
    // log-ratio table BROADCASTS; the corpus path is explode → two
    // map-side-combined aggregates (doc×bucket, then doc) → one
    // broadcast join. The corpus never shuffles on a wide key and the
    // target slice is bounded by construction. Downstream resampling
    // (top-p by logw3) is a TopK, deliberately not emitted here — a
    // global rank column would force a total sort at 100 TB.
    QDef("q_dsir_weights", Some("""
      WITH d AS (SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks FROM documents),
      bi AS (SELECT doc_id, unnest(list_transform(range(1, greatest(len(toks), 1)),
               i -> toks[i] || ' ' || toks[i+1])) AS bg FROM d),
      hb AS (SELECT doc_id, CAST(('0x' || substr(md5('ds1|' || bg), 1, 2)) AS INTEGER) AS bucket FROM bi),
      tc AS (SELECT bucket, CAST(count(*) AS BIGINT) AS ct FROM hb WHERE doc_id % 50 = 0 GROUP BY bucket),
      rc AS (SELECT bucket, CAST(count(*) AS BIGINT) AS cr FROM hb WHERE doc_id % 50 <> 0 GROUP BY bucket),
      nt AS (SELECT CAST(coalesce(sum(ct), 0) AS BIGINT) AS ntot FROM tc),
      nr AS (SELECT CAST(coalesce(sum(cr), 0) AS BIGINT) AS rtot FROM rc),
      lr AS (SELECT bucket, ln(coalesce(ct, 0) + 1.0) - ln(coalesce(cr, 0) + 1.0) AS lrb
             FROM tc FULL JOIN rc USING (bucket)),
      db AS (SELECT doc_id, bucket, CAST(count(*) AS BIGINT) AS ndb FROM hb
             WHERE doc_id % 50 <> 0 GROUP BY doc_id, bucket),
      w AS (SELECT db.doc_id, CAST(sum(ndb) AS BIGINT) AS n_feats,
                   sum(ndb * lrb) AS lw FROM db JOIN lr USING (bucket) GROUP BY db.doc_id)
      SELECT doc_id, n_feats,
             (round(lw + n_feats * (ln(rtot + 256.0) - ln(ntot + 256.0)), 3) + 0.0) AS logw3
      FROM w, nt, nr ORDER BY doc_id"""),
      (s, d) => {
        val docs = t(s, d, "documents")
          .select(col("doc_id"), TA.tokens(col("text")).as("toks"))
        val hb = docs
          .select(col("doc_id"), explode(NearDup.shingleExpr("toks", 2)).as("bg"))
          .select(col("doc_id"),
            conv(substring(md5(concat(lit("ds1|"), col("bg"))), 1, 2), 16, 10)
              .cast(IntegerType).as("bucket"))
        // r17 OPT (guide §2.4, one exchange instead of three): tc/rc/db
        // used to filter the RAW exploded stream below three different
        // aggregates, so the tokenize→explode→md5 map stage (the
        // expensive part) ran three times — the %50 filters made the
        // subtrees non-identical, defeating AQE stage reuse. Folding
        // everything onto ONE (doc_id, bucket) count first makes all
        // three consumers share a single canonical exchange (computed
        // once, reused twice); the bucket-level counts then aggregate
        // the ≤|docs|·256 support rows, with the filter applied ABOVE
        // the shared stage. Counts are identical: Σ_{docs in slice}
        // ndb ≡ the old filtered raw count. sf1 10.3 s → see
        // OPTIMIZATION_r17.md.
        // the isNotNull bake (q_jsd_sources discipline): db's broadcast
        // join on bucket pushes an isnotnull(bucket) into ITS copy of
        // the subtree; without the same predicate in the shared tree,
        // tc/rc's copies canonicalize differently and the stage is
        // re-run instead of reused. bucket is never null (md5 of a
        // non-null concat), so the filter is a no-op semantically.
        val base = hb.filter(col("bucket").isNotNull)
          .groupBy("doc_id", "bucket").agg(count(lit(1)).as("ndb"))
        val tc = base.filter(col("doc_id") % 50 === 0)
          .groupBy("bucket").agg(sum("ndb").cast(LongType).as("ct"))
        val rc = base.filter(col("doc_id") % 50 =!= 0)
          .groupBy("bucket").agg(sum("ndb").cast(LongType).as("cr"))
        val lr = tc.join(rc, Seq("bucket"), "full")
          .select(col("bucket"),
            (log(coalesce(col("ct"), lit(0L)) + lit(1.0))
              - log(coalesce(col("cr"), lit(0L)) + lit(1.0))).as("lrb"))
        val nt = tc.agg(coalesce(sum("ct"), lit(0L)).cast(LongType).as("ntot"))
        val nr = rc.agg(coalesce(sum("cr"), lit(0L)).cast(LongType).as("rtot"))
        val db = base.filter(col("doc_id") % 50 =!= 0)
        db.join(broadcast(lr), "bucket")
          .groupBy("doc_id")
          .agg(sum("ndb").cast(LongType).as("n_feats"),
            sum(col("ndb") * col("lrb")).as("lw"))
          .crossJoin(broadcast(nt)).crossJoin(broadcast(nr))
          .select(col("doc_id"), col("n_feats"),
            round(col("lw") + col("n_feats")
              * (log(col("rtot") + lit(256.0)) - log(col("ntot") + lit(256.0))), 3)
              .as("logw3"))
          .orderBy("doc_id")
      }),

    // DOMAIN REWEIGHTING, one multiplicative-weights step (the
    // DoReMi-shaped loop of Xie et al. 2023, with the per-domain
    // QUALITY SURVIVAL rate as the integer-exact reward surrogate —
    // the curation analogue of excess loss, and exp(η·x) replaced by
    // its first-order rational form 1000+x so the update is BIGINT
    // all the way and hash-identical cross-engine): starting from
    // uniform weights, each source's weight moves by its kept-rate
    // excess over the corpus-wide kept rate (the shared
    // TA.withQualityVerdict gate), floored at 1‰ so no domain is ever
    // starved, then renormalized by truncating division. The output
    // is the next epoch's sampling mixture over sources — what
    // q_mix_weighted consumes as its weight table. Scale shape: ONE
    // corpus scan into a map-side-combined per-source aggregate
    // (|sources| rows); the corpus-total and weight-sum terms are
    // window sums over that domain-cardinality table, so nothing
    // wider than |sources| ever shuffles and the corpus never moves.
    QDef("q_domain_reweight", Some("""
      WITH d AS (SELECT doc_id, source,
        list_filter(string_split(text, ' '), t -> t <> '') AS toks FROM documents),
      m AS (SELECT source,
        CAST(len(toks) AS BIGINT) AS n_tokens,
        CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
        CAST(len(list_filter(toks, t -> t IN ('the', 'a'))) AS BIGINT) AS n_stop,
        CAST(COALESCE(list_sum(list_transform(toks, t -> length(t))), 0) AS BIGINT) AS tok_chars
        FROM d),
      k AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(CASE WHEN n_tokens >= 20 AND n_tokens <= 90
                       AND 100 * tok_chars >= 420 * n_tokens
                       AND 100 * tok_chars <= 520 * n_tokens
                       AND 2 * n_distinct >= n_tokens
                       AND n_stop > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        FROM m GROUP BY source),
      tot AS (SELECT CAST((1000 * sum(n_kept)) // sum(n_docs) AS BIGINT) AS kept_all FROM k),
      w AS (SELECT source, n_docs, n_kept,
              CAST((1000 * n_kept) // n_docs AS BIGINT) AS kept_permille,
              CAST((1000 * n_kept) // n_docs - tot.kept_all AS BIGINT) AS excess_permille,
              CAST(greatest(1, 1000 + (1000 * n_kept) // n_docs - tot.kept_all) AS BIGINT) AS w_raw
            FROM k, tot),
      ws AS (SELECT CAST(sum(w_raw) AS BIGINT) AS w_sum FROM w)
      SELECT source, n_docs, n_kept, kept_permille, excess_permille,
             CAST((1000 * w_raw) // ws.w_sum AS BIGINT) AS new_weight_permille
      FROM w, ws ORDER BY source"""),
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val all = Window.partitionBy(lit(1))
        TA.withQualityVerdict(t(s, d, "documents"), "text")
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("keep").cast(LongType)).cast(LongType).as("n_kept"))
          .withColumn("_tk", sum("n_kept").over(all))
          .withColumn("_td", sum("n_docs").over(all))
          .withColumn("kept_permille", expr("div(1000 * n_kept, n_docs)"))
          .withColumn("excess_permille",
            col("kept_permille") - expr("div(1000 * _tk, _td)"))
          .withColumn("w_raw",
            greatest(lit(1L), lit(1000L) + col("excess_permille")))
          .withColumn("_ws", sum("w_raw").over(all))
          .select(col("source"), col("n_docs"), col("n_kept"),
            col("kept_permille"), col("excess_permille"),
            expr("div(1000 * w_raw, _ws)").as("new_weight_permille"))
          .orderBy("source")
      }),

    // PER-SOURCE JENSEN–SHANNON DIVERGENCE vs the corpus token mix —
    // the bounded, symmetric divergence mixture papers (DoReMi, DSIR,
    // data-selection surveys) quote when they say "domain X is far
    // from the corpus": JSD(P_s ‖ P_corpus) in milli-nats, plus the
    // bits view (JSD/ln 2, bounded by 1000 milli-bits). Complements
    // the engine's integer-exact TV gauge (q_tv_drift) — TV counts
    // mass moved, JSD weighs it information-theoretically, and the
    // two rank drift differently on fat-vs-thin-tailed differences.
    // Float discipline: ln() is not bitwise-portable across libm
    // (the q_bigram_pmi lesson) and no exp/lift trick can clear a
    // SUM of logs, so this follows the q_doc_entropy containment —
    // both engines compute IEEE-double terms from the SAME exact
    // integer counts and round once at the end (round-3 on
    // milli-nats; term counts are vocab-bounded, so accumulated
    // error sits ~9 orders below the rounding grain). Scale shape:
    // one token explode collapses to the (source, token) support
    // table (map-side combined; its exchange is reused by the vocab
    // and per-source re-aggs); the only join is st ⋈ gt co-keyed on
    // token — support-table sized both sides. Absent-token terms
    // (p=0) are NOT enumerated: for p=0 the JSD term is exactly
    // q·ln2/2, so their total contribution is (ln2/2)·(1 − Σ_present
    // q) — closed form from the per-source present-token global
    // mass, no |sources|×|vocab| cross join, and exact (not a
    // shared-support approximation).
    QDef("q_jsd_sources", Some("""
      WITH tk AS (SELECT source,
              unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS tok
            FROM documents),
      st AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS c
             FROM tk GROUP BY 1, 2),
      gt AS (SELECT tok, CAST(sum(c) AS BIGINT) AS g FROM st GROUP BY 1),
      ns AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_s FROM st GROUP BY 1),
      tt AS (SELECT CAST(sum(g) AS BIGINT) AS n FROM gt),
      term AS (SELECT st.source, ns.n_s,
                 CAST(st.c AS DOUBLE) / ns.n_s AS p,
                 CAST(gt.g AS DOUBLE) / tt.n AS q
               FROM st JOIN gt USING (tok) JOIN ns USING (source)
               CROSS JOIN tt),
      j AS (SELECT source, max(n_s) AS n_tokens,
              sum((p * ln(p / ((p + q) / 2))
                   + q * ln(q / ((p + q) / 2))) / 2) AS jsd_present,
              sum(q) AS q_present
            FROM term GROUP BY source)
      SELECT source, CAST(n_tokens AS BIGINT) AS n_tokens,
             (round(1000 * (jsd_present + ln(2) / 2 * (1 - q_present)), 3)
               + 0.0) AS jsd_milli3,
             (round(1000 * (jsd_present + ln(2) / 2 * (1 - q_present)) / ln(2), 3)
               + 0.0) AS jsd_bits_milli3
      FROM j ORDER BY source"""),
      (s, d) => {
        // the isnotnull join-key constraints are baked into the ONE
        // st subtree (they hold trivially — split() never yields
        // nulls) so the later equi-joins don't push fresh filters
        // into a diverged copy: all four uses stay canonical-equal
        // and the explode+aggregate exchange is reused, not re-run
        // (plan-pinned in ScalePlanSpec).
        val st = t(s, d, "documents")
          .select(col("source"), explode(TA.tokens(col("text"))).as("tok"))
          .filter(col("source").isNotNull && col("tok").isNotNull)
          .groupBy("source", "tok").agg(count(lit(1)).as("c"))
        val gt = st.groupBy("tok").agg(sum("c").cast(LongType).as("g"))
        val ns = st.groupBy("source").agg(sum("c").cast(LongType).as("n_s"))
        val tt = gt.agg(sum("g").cast(LongType).as("n"))
        val j = st.join(gt, "tok").join(ns, "source").crossJoin(broadcast(tt))
          .select(col("source"), col("n_s"),
            (col("c").cast("double") / col("n_s")).as("p"),
            (col("g").cast("double") / col("n")).as("q"))
          .groupBy("source")
          .agg(max("n_s").cast(LongType).as("n_tokens"),
            sum((col("p") * log(col("p") / ((col("p") + col("q")) / 2))
              + col("q") * log(col("q") / ((col("p") + col("q")) / 2))) / 2)
              .as("jsd_present"),
            sum(col("q")).as("q_present"))
        val jsd = col("jsd_present") + log(lit(2.0)) / 2 * (lit(1.0) - col("q_present"))
        j.select(col("source"), col("n_tokens"),
            (round(lit(1000) * jsd, 3) + 0.0).as("jsd_milli3"),
            (round(lit(1000) * jsd / log(lit(2.0)), 3) + 0.0)
              .as("jsd_bits_milli3"))
          .orderBy("source")
      }),

    // SHARD CHECKSUM MANIFEST — the lake-integrity artifact a
    // migration/compaction/replication job publishes so a second
    // copy can be verified WITHOUT row-by-row diffing: per source
    // shard, row count, doc_id span, char mass, and an
    // order-independent content checksum (sum over docs of the first
    // 8 md5 hex digits of 'doc_id|text' as an integer — commutative,
    // so the manifest is identical under any partitioning, file
    // layout, or row order, which is exactly what a rewrite is
    // allowed to change; any byte drift in any doc moves the sum).
    // Complements q_snapshot_diff (which finds WHICH rows changed —
    // run it only on shards this manifest flags) and q_dq_audit
    // (semantic checks, not byte fidelity). One scan, one map-side-
    // combined aggregate, |sources| output rows at any corpus size;
    // sum magnitude ≤ N·2³² ≈ 2.1e15 at sf10 — inside BIGINT with
    // 3 orders of headroom.
    QDef("q_shard_checksum", Some("""
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
          CAST(min(doc_id) AS BIGINT) AS min_id,
          CAST(max(doc_id) AS BIGINT) AS max_id,
          CAST(sum(CAST(n_chars AS BIGINT)) AS BIGINT) AS char_mass,
          CAST(sum(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|' || text), 1, 8))
            AS BIGINT)) AS BIGINT) AS content_sum
      FROM documents GROUP BY 1 ORDER BY source"""),
      (s, d) =>
        t(s, d, "documents")
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            min("doc_id").cast(LongType).as("min_id"),
            max("doc_id").cast(LongType).as("max_id"),
            sum(col("n_chars").cast(LongType)).cast(LongType).as("char_mass"),
            sum(conv(substring(md5(concat(col("doc_id").cast("string"),
                lit("|"), col("text"))), 1, 8), 16, 10).cast(LongType))
              .cast(LongType).as("content_sum"))
          .orderBy("source"))
  )
}
