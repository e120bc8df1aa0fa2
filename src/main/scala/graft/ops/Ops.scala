package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Functions._

/** Relational operator families from SURVEY.md §2.3-2.6, as
  * DataFrame→DataFrame combinators. Each is a declarative plan
  * fragment — Catalyst handles pushdown/pruning/broadcast; the only
  * scale decisions made here are explicit `broadcast()` on dimension
  * sides and total-order tiebreaks for determinism.
  */
object Ops {

  // ───────────────────────── dedup / snapshots ──────────────────────

  /** A1 — full-table dedup by MD5 content hash over all non-lineage
    * columns; among duplicates the row with the smallest tiebreak
    * wins (the reference's keep="first" is file-order; a shuffle
    * engine needs an explicit total order).
    * Ref: run_ac_extraction.py:126-131, 170-172.
    *
    * Scale: one shuffle on the 128-bit hash — effectively unskewed
    * keys, so this partitions evenly at any data size. */
  def contentHashDedup(df: DataFrame, lineageCols: Seq[String], tiebreak: Column): DataFrame = {
    // schema-aware canonicalization: string columns hash as-is (the
    // all-string staging contract), typed columns render canonically
    // (ISO timestamps, sorted-key map JSON — _normalize_for_hash parity)
    val contentFields = df.schema.fields
      .filterNot(f => lineageCols.contains(f.name)).sortBy(_.name)
      .map(f => (col(f.name), f.dataType)).toSeq
    val hashed = df.withColumn("_row_hash", rowHashTyped(contentFields))
    val w = Window.partitionBy(col("_row_hash")).orderBy(tiebreak.asc)
    hashed
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn", "_row_hash")
  }

  /** A2 — SCD-1 "latest per key": keep the newest row per business
    * key by (ts desc, tiebreak desc). Ref: run_ac_extraction.py:175-188.
    *
    * Scale: single hash-partition shuffle on the business key; skewed
    * keys are bounded because output is 1 row/key (row_number streams,
    * no buffering beyond the sort spill). */
  def latestSnapshot(df: DataFrame, keys: Seq[String], ts: Column, tiebreak: Column): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ts.desc_nulls_last, tiebreak.desc)
    df.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }

  /** A4 — most-recent N rows per group. Ref: run_ac_extraction.py:1183-1193. */
  def topNPerGroup(df: DataFrame, keys: Seq[String], order: Seq[Column], n: Int): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("_rn", row_number().over(w)).filter(col("_rn") <= n).drop("_rn")
  }

  // ───────────────────────────── unions ─────────────────────────────

  /** U1 — append aligning columns by name, absent columns → NULL
    * (pandas concat semantics). Ref: run_ac_extraction.py:164-167. */
  def alignUnion(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b, allowMissingColumns = true)

  /** U2 — union of heterogeneous sources already conformed to a shared
    * schema. Ref: run_ac_extraction.py:1371-1384. */
  def conformedUnion(sources: Seq[DataFrame]): DataFrame =
    sources.reduce(_.unionByName(_, allowMissingColumns = true))

  // ───────────────────────────── joins ──────────────────────────────

  /** J3 — dict-map lookup = broadcast LEFT join against a 2-column
    * dim(id→name). The reference does `Series.map(dict(zip(id,name)))`
    * ~15 times; every one is this plan.
    * Ref: run_ac_extraction.py:899-954, 1044-1127.
    *
    * Scale: `broadcast()` is explicit — dims are orders of magnitude
    * smaller than facts, so this must never become a shuffle join. */
  def mapLookup(fact: DataFrame, dim: DataFrame, factKey: Column,
                dimKey: String, dimVal: String, as: String): DataFrame = {
    // dict semantics: exactly one value per key. A duplicate-keyed dim
    // would otherwise fan out fact rows through the join; the
    // reference's dict(zip(...)) collapses dupes (last wins by input
    // order — undefined in a shuffle engine, so we take the
    // deterministic max).
    val d = dim.select(col(dimKey).cast("string").as("_mk"), col(dimVal).as(as))
      .groupBy("_mk").agg(max(col(as)).as(as))
    fact.join(broadcast(d), factKey.cast("string") === col("_mk"), "left").drop("_mk")
  }

  /** J4 — layered lookup with fallback: primary value if non-blank,
    * else the fallback lookup. Ref: run_ac_extraction.py:926-949,
    * 1083-1086, 1234-1240. */
  def fallbackChain(primary: Column, fallbacks: Column*): Column =
    coalesce((primary +: fallbacks).map(nullifBlank): _*)

  /** As-of join: for each left row, attach the latest right `value`
    * with right-ts ≤ left-ts under the same key (DuckDB/kdb ASOF
    * semantics, equal timestamps match). Spark has no native as-of
    * operator; the naive formulations — a range theta-join
    * (nested-loop explosion) or per-row correlated max (re-scan per
    * row) — both die at scale. This one is the scale-safe form: tag
    * both sides, union (plan-level concat, narrow), ONE window pass
    * with `last(value, ignoreNulls)` over (key, ts) — a single hash
    * shuffle on the key and a sort within partitions, total cost
    * O(n log n) per key group with no row expansion whatsoever.
    *
    * Duplicate right rows per (key, ts) are DEFINED behavior: the
    * greatest `value` at that instant wins (the window orders `_v`
    * ascending within a timestamp, so `last` lands on the max — the
    * tiebreak q_attribution_last_touch relies on to pick the highest
    * click id among simultaneous clicks). Callers wanting a different
    * resolution rule (first value, sum, …) should pre-aggregate the
    * series to one row per (key, ts) before calling.
    *
    * @param left   probe side; all its columns survive
    * @param right  value series: (key, rts, valueCol) — other
    *               columns are dropped
    * @param as     output column name for the as-of value
    */
  def asofLastValue(left: DataFrame, right: DataFrame, key: String,
                    lts: String, rts: String, valueCol: String,
                    as: String): DataFrame = {
    // fail fast instead of silently clobbering-and-dropping caller
    // columns that happen to share the internal working names (the
    // same guard saltedJoin applies to _salt)
    val reserved = Seq("_t", "_side", "_v")
    require(!left.columns.exists(reserved.contains),
      s"asofLastValue reserves the column names ${reserved.mkString("/")}")
    val vType = right.schema(valueCol).dataType
    // _side orders right (0) before left (1) at equal ts, so an
    // exactly-simultaneous observation is visible to the probe row
    val l = left
      .withColumn("_t", col(lts))
      .withColumn("_side", lit(1))
      .withColumn("_v", lit(null).cast(vType))
    val r = right.select(col(key), col(rts).as("_t"),
      lit(0).as("_side"), col(valueCol).as("_v"))
    // _v ascending last: several series rows at the SAME ts resolve
    // deterministically to the greatest value (a ledger can't accept
    // "whichever row the sort happened to emit last")
    val w = Window.partitionBy(col(key))
      .orderBy(col("_t").asc, col("_side").asc, col("_v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn(as, last(col("_v"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .drop("_t", "_side", "_v")
  }

  /** Range join via time binning: pair left rows (point `lts`) with
    * right rows (interval `[startCol, endCol)`) WITHOUT the
    * nested-loop plan a pure inequality join degenerates to. Each
    * left row lands in exactly one `binWidthUs`-wide bin; each right
    * interval explodes into the bins it covers; the join is then a
    * plain equi-join on the bin plus an exact range filter. Pair
    * generation cost is O(intervals × bins-per-interval), the join
    * is a keyed shuffle (broadcast when one side is small), and no
    * pair is produced twice (a point has one bin).
    *
    * Pick `binWidthUs` near the typical interval length: much
    * smaller multiplies the explode, much larger multiplies
    * false-candidate filtering. Empty intervals (end ≤ start) are
    * dropped — `sequence` would otherwise generate a DESCENDING bin
    * range and fabricate candidates. */
  def binnedRangeJoin(left: DataFrame, lts: String, right: DataFrame,
                      startCol: String, endCol: String,
                      binWidthUs: Long): DataFrame = {
    require(binWidthUs > 0, "binWidthUs must be positive")
    require(!left.columns.contains("_bin") && !right.columns.contains("_bin"),
      "binnedRangeJoin reserves the column name _bin")
    val lb = left.withColumn("_bin",
      floor(unix_micros(col(lts)) / binWidthUs))
    val rb = right
      .filter(col(endCol) > col(startCol))
      .withColumn("_bin", explode(sequence(
        floor(unix_micros(col(startCol)) / binWidthUs),
        // end is exclusive: the last covered instant is end − 1µs
        floor((unix_micros(col(endCol)) - 1) / binWidthUs))))
    lb.join(rb, "_bin")
      .filter(col(lts) >= col(startCol) && col(lts) < col(endCol))
      .drop("_bin")
  }

  /** Skew-salted equi-join: for a fact side with pathological key
    * skew joining a dim too large to broadcast, split each hot key
    * across `salt` reducers by salting the fact side and replicating
    * the dim side `salt`× (explode of a 0..salt-1 sequence). Same
    * rows as a plain inner equi-join on `key` for ANY input; the
    * shuffle key becomes (key, _salt), so one hot key occupies up to
    * `salt` partitions instead of one.
    *
    * `saltBy` must be deterministic per fact row (a row id, or the
    * full row struct) — a random salt would break retry/replay
    * determinism, the same reason the reference pins extraction
    * timestamps. Prefer AQE's skew-join splitting (on everywhere in
    * `Sessions`) when it applies; this is the declarative form for
    * joins AQE can't split (e.g. followed by a bucketed write, or
    * under static planning). Dim replication cost is salt×|dim| —
    * size `salt` to the worst key's partition overflow, not higher. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 salt: Int, saltBy: Column): DataFrame = {
    require(salt > 0, "salt must be positive")
    // fail fast instead of silently clobbering-and-dropping a user
    // column that happens to share the internal name
    require(!fact.columns.contains("_salt") && !dim.columns.contains("_salt"),
      "saltedJoin reserves the column name _salt")
    val f = fact.withColumn("_salt", pmod(hash(saltBy), lit(salt)))
    val d = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(salt - 1))))
    f.join(d, Seq(key, "_salt")).drop("_salt")
  }

  // ─────────────────────── per-group rollups ────────────────────────

  /** F10 — case-insensitive column resolution against candidate names:
    * the first candidate that matches an actual column (ignoring case)
    * wins. Driver-side schema logic, not a row expression.
    * Ref: pick_col run_ac_extraction.py:292-301. */
  def pickCol(columns: Seq[String], candidates: Seq[String]): Option[String] =
    candidates.iterator.flatMap(c => columns.find(_.equalsIgnoreCase(c))).nextOption()

  /** A6 — per-key sorted distinct set rendered ", "-joined.
    * Ref: run_ac_extraction.py:1447-1474, 1500-1502.
    * Scale: collect_set is a partial (map-side) aggregate — distinct
    * values per key are assumed dim-sized (tag/list names), so state
    * stays small even on skewed keys. */
  def sortedSetAgg(c: Column): Column =
    array_join(array_sort(collect_set(c)), ", ")

  /** A6, skew-safe form: two-phase sorted-set aggregation over a
    * salted key. `collect_set` partial-aggregates map-side, but a hot
    * key still funnels ALL its raw rows' distinct values into one
    * reducer; salting on `hash(value) % salt` splits a hot key across
    * `salt` reducers (phase 1), then merges the much smaller distinct
    * sets (phase 2). Same result as [[sortedSetAgg]] for any input —
    * use when a key can dominate a partition (e.g. one contact with
    * 10^8 events at 100 TB). */
  def sortedSetAggSalted(df: DataFrame, keys: Seq[String], value: Column,
                         as: String, salt: Int = 16): DataFrame = {
    val phase1 = df
      .withColumn("_salt", pmod(hash(value), lit(salt)))
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(collect_set(value).as("_partial"))
    phase1
      .groupBy(keys.map(col): _*)
      .agg(array_join(array_sort(array_distinct(flatten(collect_list(col("_partial"))))), ", ")
        .as(as))
  }
}
