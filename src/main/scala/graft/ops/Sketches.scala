package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared Count-Min-sketch expression trees — ONE definition of the
  * salted-md5 bucket hash and the counter build, consumed by the
  * batch sketch (`q_cms_estimate`, AnalyticsQueries) and the
  * streaming sketch ([[graft.streaming.EventStream.cmsCounterStream]]),
  * so the batch oracle check covers the streaming face's arithmetic
  * (the TextAnalysis / Mixing discipline applied to sketches).
  *
  * The sketch is d=4 hash rows × w=64 buckets: 256 counters total at
  * any fact scale. Counters are pure ADDITIVE state, which is what
  * makes the streaming form a plain running aggregation — no custom
  * state store, bounded at d·w rows forever.
  */
object Sketches {
  val CmsDepth = 4
  val CmsWidth = 64

  /** Row-`i` bucket of `key`: first 16 md5 bits of "cms{i}|{key}"
    * mod width. Deterministic, engine-reproducible (the
    * q_split_assign salted-hash discipline). */
  def cmsBucket(i: Column, key: Column): Column =
    conv(substring(md5(concat(lit("cms"), i.cast("string"), lit("|"),
      key.cast("string"))), 1, 4), 16, 10).cast("int") % CmsWidth

  /** One (i, bucket) increment row per (input row, hash row). */
  def cmsIncrements(df: DataFrame, key: String): DataFrame =
    df.select(col(key).as("k"),
        explode(array((0 until CmsDepth).map(lit): _*)).as("i"))
      .select(col("i"), cmsBucket(col("i"), col("k")).as("bucket"))

  /** The 256-counter array. In batch this is one map-side-combined
    * aggregate; under a streaming DataFrame the SAME plan is a
    * running aggregation whose state is exactly d·w rows. */
  def cmsCounters(df: DataFrame, key: String): DataFrame =
    cmsIncrements(df, key).groupBy("i", "bucket")
      .agg(count(lit(1)).as("c"))

  /** Counters from a PRE-AGGREGATED (key, weight) table — identical
    * counters to [[cmsCounters]] over the raw stream (the sketch is
    * additive: Σ_{rows with key} 1 = weight), at |keys|·d hash
    * evaluations instead of |rows|·d. r17 OPT (guide §2.3, aggregate
    * before you explode): the batch q_cms_estimate already owns the
    * exact per-key counts for its truth column, so hashing every raw
    * event row again — 4 md5s per event — only re-derived what the
    * truth table states. The streaming face keeps [[cmsCounters]]:
    * a stream has no finished per-key table to fold. */
  def cmsCountersWeighted(keyCounts: DataFrame, key: String,
                          weight: String): DataFrame =
    keyCounts.select(col(key).as("k"), col(weight).as("w"),
        explode(array((0 until CmsDepth).map(lit): _*)).as("i"))
      .select(col("i"), cmsBucket(col("i"), col("k")).as("bucket"), col("w"))
      .groupBy("i", "bucket")
      .agg(sum("w").cast("long").as("c"))

  /** Point estimates for a key table: min over the key's d counters —
    * the counter side broadcasts (256 rows) at any scale. */
  def cmsEstimate(keys: DataFrame, key: String, counters: DataFrame): DataFrame =
    keys.select(col(key),
        explode(array((0 until CmsDepth).map(lit): _*)).as("i"))
      .select(col(key), col("i"), cmsBucket(col("i"), col(key)).as("bucket"))
      .join(broadcast(counters), Seq("i", "bucket"))
      .groupBy(key)
      .agg(min("c").cast("long").as("cms_estimate"))
}
