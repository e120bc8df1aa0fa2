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
}
