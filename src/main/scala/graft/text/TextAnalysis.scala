package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis surface for training-data pipelines: tokenization,
  * language-ID heuristics, quality scoring, fingerprinting. All
  * codegen-friendly built-in expressions — no UDFs — so they run
  * inside whole-stage codegen on a 100 TB `documents` scan.
  */
object TextAnalysis {

  /** Whitespace tokens, empty strings dropped (documents.text carries
    * a trailing space, so split() yields a trailing ""). */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => t =!= lit(""))

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    size(tokens(text)).cast(LongType)

  /** BPE-ish regex token count: alpha runs (the vocabulary here is
    * all lowercase ASCII; a fuller engine would use a byte-pair
    * pattern — the plumbing is identical). Built with the Column
    * function, not an expr() string splice, so aliased/quoted/derived
    * columns work. */
  def regexTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-z]+"), lit(0))).cast(LongType)

  /** Marker-token language score: how many tokens fall in `markers`
    * (empty marker list scores 0). */
  def langScore(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t =>
      markers.map(m => t === m).foldLeft(lit(false))(_ || _))).cast(LongType)

  /** Content fingerprint invariant to token order: md5 of the sorted
    * distinct token set (a cheap bag-of-words fingerprint that
    * collapses shuffled near-dupes). */
  def bowFingerprint(toks: Column): Column =
    md5(array_join(array_sort(array_distinct(toks)), " "))

  /** Appends the Gopher/C4-style quality verdict — `n_tokens`,
    * `reject_reason` (first failing rule, NULL = clean), `keep` —
    * as ONE codegen'd expression tree. This is the SINGLE definition
    * of the reject chain: the batch operator (q_doc_quality_filter,
    * DuckDB-oracled) and the streaming gate (DocStream) both apply
    * it, so batch/stream quality verdicts cannot drift. All
    * predicates are integer-exact (cross-multiplied, no float
    * division); NULL text ⇒ NULL metrics ⇒ the leading unscorable
    * rule (matching SQL's NULL-conjunction semantics). */
  def withQualityVerdict(df: org.apache.spark.sql.DataFrame,
                         textCol: String): org.apache.spark.sql.DataFrame = {
    // fail fast instead of silently clobbering-and-dropping user
    // columns that share the scratch/output names (same discipline
    // as Ops.saltedJoin's _salt guard)
    val reserved =
      Seq("_toks", "_n_distinct", "_n_stop", "_tok_chars",
        "n_tokens", "reject_reason", "keep")
    require(!df.columns.exists(reserved.contains),
      s"withQualityVerdict reserves the column names ${reserved.mkString("/")}")
    // tokenize ONCE into a scratch column — four independent
    // tokens(text) subtrees would rely on subexpression elimination
    // to avoid splitting every document up to 4 times per row
    df.withColumn("_toks", tokens(col(textCol)))
      .withColumn("n_tokens", size(col("_toks")).cast(LongType))
      .withColumn("_n_distinct", size(array_distinct(col("_toks"))).cast(LongType))
      .withColumn("_n_stop", langScore(col("_toks"), Seq("the", "a")))
      .withColumn("_tok_chars",
        aggregate(transform(col("_toks"), t => length(t)), lit(0),
          (acc, x) => acc + x).cast(LongType))
      .withColumn("reject_reason",
        when(col("n_tokens").isNull, "unscorable")
          .when(col("n_tokens") < 20, "too_short")
          .when(col("n_tokens") > 90, "too_long")
          .when(col("_tok_chars") * 100 < col("n_tokens") * 420 ||
            col("_tok_chars") * 100 > col("n_tokens") * 520, "word_length")
          .when(col("_n_distinct") * 2 < col("n_tokens"), "low_diversity")
          .when(col("_n_stop") === 0, "no_stopwords"))
      .withColumn("keep", when(col("reject_reason").isNull, 1).otherwise(0))
      .drop("_toks", "_n_distinct", "_n_stop", "_tok_chars")
  }
}
