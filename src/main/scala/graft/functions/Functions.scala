package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalar `Column` combinators — the reference's scalar surface
  * (SURVEY.md §2.7) re-expressed as codegen-friendly built-in
  * expression trees. No UDFs: every helper here composes
  * `org.apache.spark.sql.functions` so Catalyst can constant-fold,
  * push down, and whole-stage-codegen them.
  *
  * Reference: /root/reference/scripts/run_ac_extraction.py (file:line
  * cited per function).
  */
object Functions {

  /** Blank-string-as-null idiom of the all-string lake: `""`, `"nan"`,
    * `"None"` (and whitespace) all mean SQL NULL.
    * Ref: run_ac_extraction.py:949, 1085, 1452, 1461-1463. */
  def nullifBlank(c: Column): Column = {
    val t = trim(c)
    when(c.isNull || t === "" || t === "nan" || t === "None", lit(null).cast(StringType))
      .otherwise(t)
  }

  /** Lenient int coercion, default 0 on failure.
    * Ref: safe_int, run_ac_extraction.py:58-63. */
  def safeInt(c: Column): Column =
    coalesce(trim(c.cast(StringType)).try_cast(LongType), lit(0L))

  /** First non-blank of N candidate columns (ts candidates, id
    * candidates). Ref: _pick_ts run_ac_extraction.py:1165-1169,
    * column probing :892-916. */
  def coalesceCandidates(cs: Column*): Column =
    coalesce(cs.map(nullifBlank): _*)

  /** Dict-style decode with passthrough default.
    * Ref: status/hidden decode maps run_ac_extraction.py:409-410,
    * 781-782. */
  def decodeMap(c: Column, mapping: Seq[(String, String)], default: Column): Column =
    mapping.foldRight(default) { case ((k, v), acc) => when(c === k, lit(v)).otherwise(acc) }

  /** Trailing integer id from a URL: `/123` or `/123?x=1` → "123".
    * Ref: extract_id_from_url run_ac_extraction.py:83-87. */
  def extractIdFromUrl(c: Column): Column =
    nullifBlank(regexp_extract(c, "/(\\d+)(\\?|$)", 1))

  /** Full-name build `trim(first ' ' last)` with fallback when blank.
    * Ref: _mk_name run_ac_extraction.py:1011-1013, :1394-1397. */
  def mkName(first: Column, last: Column, fallback: Column): Column = {
    val joined = trim(concat_ws(" ", coalesce(trim(first), lit("")), coalesce(trim(last), lit(""))))
    coalesce(nullifBlank(joined), fallback)
  }

  /** Chatter line: `"{ts} — {title} ({who}) — {detail} — {url}"`, with
    * blank parts skipped entirely (concat_ws drops NULLs).
    * Ref: _mk_chatter_line run_ac_extraction.py:1411-1422. */
  def chatterLine(parts: Column*): Column =
    concat_ws(" — ", parts.map(nullifBlank): _*)

  /** Normalize a column to its canonical string rendering for content
    * hashing: NULL→"", everything else its string form. The staging
    * lake is all-string so this is the v1-complete form; for typed
    * columns use [[canonicalForHash]]. Ref: _normalize_for_hash
    * run_ac_extraction.py:93-123. */
  def normalizeForHash(c: Column): Column =
    coalesce(c.cast(StringType), lit(""))

  /** Schema-aware canonical rendering for content hashing — the full
    * `_normalize_for_hash` semantics (run_ac_extraction.py:93-123):
    * timestamps → ISO-8601 Z, dates → yyyy-MM-dd, maps → JSON with
    * entries sorted by key (the reference's sort_keys=True), arrays/
    * structs → JSON preserving element/field order, NULL → "".
    * Everything is built-in expressions — order-canonicalization of
    * maps uses array_sort(map_entries(...)), which sorts structs by
    * their first field (the key). */
  def canonicalForHash(c: Column, dt: DataType): Column = {
    val rendered = dt match {
      case TimestampType | TimestampNTZType => tsIsoZ(c)
      case DateType => date_format(c, "yyyy-MM-dd")
      case _: MapType => to_json(array_sort(map_entries(c)))
      case _: ArrayType | _: StructType => to_json(c)
      case _ => c.cast(StringType)
    }
    coalesce(rendered, lit(""))
  }

  /** MD5 content hash over a typed schema: each field rendered via
    * [[canonicalForHash]], "||"-joined. */
  def rowHashTyped(fields: Seq[(Column, DataType)]): Column =
    md5(concat_ws("||", fields.map { case (c, dt) => canonicalForHash(c, dt) }: _*))

  /** MD5 content hash over the given columns, `"||"`-joined after
    * normalization — the synthetic dedup key.
    * Ref: df_rowhash run_ac_extraction.py:126-131. */
  def rowHash(cols: Seq[Column]): Column = {
    // concat_ws would silently drop NULLs, collapsing ("a",NULL) and
    // ("a","") onto different inputs than the reference; normalize
    // each part to "" first so the join is positional and total.
    md5(concat_ws("||", cols.map(normalizeForHash): _*))
  }

  /** Synthetic event id `"{source}:{rowid}"` with md5-of-row fallback.
    * Ref: run_ac_extraction.py:1197-1200. */
  def synthEventId(source: String, id: Column, fallbackHash: Column): Column =
    concat_ws(":", lit(source), coalesce(nullifBlank(id.cast(StringType)), fallbackHash))

  /** Canonical output rendering of a timestamp for the oracle compare:
    * `yyyy-MM-dd HH:mm:ss` in UTC. */
  def tsOut(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")

  /** ISO-8601 `...Z` rendering. Ref: run_ac_extraction.py:55, 1404. */
  def tsIsoZ(c: Column): Column = date_format(c, "yyyy-MM-dd'T'HH:mm:ss'Z'")
}
