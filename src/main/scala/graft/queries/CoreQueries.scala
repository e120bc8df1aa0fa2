package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.Functions._
import graft.ops.Ops._
import graft.pipeline.Tables.t
import graft.pipeline.ChatterMaster

/** SURVEY.md §2 operator inventory over the driver testdata
  * (TESTDATA.md / FIXTURES.md role mapping: customer≙contacts,
  * events≙activity stream, nation/region≙dims, orders/lineitem≙
  * per-contact fan-out facts).
  *
  * Every query is deterministic: total-order `ORDER BY` with a unique
  * tiebreak, timestamps rendered as strings, doubles canonicalized to
  * DECIMAL(12,2) before use — the DuckDB oracle mirrors each of those
  * choices exactly (SURVEY.md §7 "oracle parity traps").
  */
object CoreQueries {

  private val TS = "yyyy-MM-dd HH:mm:ss"
  private val TSD = "%Y-%m-%d %H:%M:%S" // duckdb strftime equivalent

  /** nullifBlank as DuckDB SQL over an expression string. */
  private def nbSql(e: String): String =
    s"CASE WHEN $e IS NULL OR trim($e) IN ('', 'nan', 'None') THEN NULL ELSE trim($e) END"

  /** The A9 digest contract as DuckDB SQL — shared verbatim by the
    * compositional (q_digest_rollup) and typed-Aggregator
    * (q_digest_rollup_typed) implementations: two engines, one
    * contract, zero drift. */
  private lazy val digestOracleSql = s"""
      WITH e AS (SELECT user_id, event_id, strftime(ts, '$TSD') AS ets, event_type FROM events),
      last3 AS (SELECT * FROM e
        QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ets DESC, event_id DESC) <= 3),
      lines AS (SELECT user_id,
        string_agg(ets || ' — ' || event_type, chr(10) ORDER BY ets, event_id) AS tail
        FROM last3 GROUP BY user_id),
      sets AS (SELECT user_id,
        string_agg(DISTINCT event_type, ', ' ORDER BY event_type) AS types
        FROM e GROUP BY user_id)
      SELECT c.c_custkey AS contact_id,
             c.c_name || ' [' || s.types || ']' || chr(10) || l.tail AS digest
      FROM customer c
      JOIN sets s ON c.c_custkey = s.user_id
      JOIN lines l ON c.c_custkey = l.user_id
      ORDER BY contact_id"""

  val all: Seq[QDef] = Seq(

    // ─────────────────────── §2.1 sources ────────────────────────

    // S1: all-string staging scan (the reference reads every CSV
    // dtype=str; run_ac_extraction.py:165,289,384). Doubles are
    // canonicalized via DECIMAL(12,2) so both engines render the
    // same string.
    QDef("q_scan_csv_allstring", Some(s"""
      SELECT CAST(c_custkey AS VARCHAR) AS c_custkey, c_name,
             CAST(c_nationkey AS VARCHAR) AS c_nationkey,
             CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS VARCHAR) AS c_acctbal,
             c_mktsegment
      FROM customer ORDER BY CAST(c_custkey AS BIGINT)"""),
      (s, d) => t(s, d, "customer").select(
        col("c_custkey").cast(StringType).as("c_custkey"),
        col("c_name"),
        col("c_nationkey").cast(StringType).as("c_nationkey"),
        col("c_acctbal").cast("decimal(12,2)").cast(StringType).as("c_acctbal"),
        col("c_mktsegment"))
        .orderBy(col("c_custkey").cast(LongType))),

    // S4: offset/limit-paginated collection scan (pagination is the
    // connector's concern — graft.sources.PagedSource; semantically a
    // full ordered scan; run_ac_extraction.py:222-247).
    QDef("q_src_paginated", Some(s"""
      SELECT o_orderkey, o_custkey, o_orderstatus,
             strftime(o_orderdate, '$TSD') AS o_orderdate, o_orderpriority
      FROM orders ORDER BY o_orderkey"""),
      (s, d) => t(s, d, "orders").select(
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        date_format(col("o_orderdate"), TS).as("o_orderdate"),
        col("o_orderpriority"))
        .orderBy("o_orderkey")),

    // S5: keyset incremental scan past a watermark
    // (run_ac_extraction.py:249-270; filter is pushed to the parquet
    // scan — at 100 TB this prunes, not post-filters).
    QDef("q_src_keyset_incremental", Some(s"""
      SELECT o_orderkey, o_custkey, strftime(o_orderdate, '$TSD') AS o_orderdate
      FROM orders WHERE o_orderkey > 1000 ORDER BY o_orderkey"""),
      (s, d) => t(s, d, "orders")
        .filter(col("o_orderkey") > 1000)
        .select(col("o_orderkey"), col("o_custkey"),
          date_format(col("o_orderdate"), TS).as("o_orderdate"))
        .orderBy("o_orderkey")),

    // S8: per-key fan-out scan (the reference's N+1 API pattern ≡ an
    // equi-join driving table × detail; run_ac_extraction.py:422-441).
    QDef("q_src_fanout", Some("""
      SELECT o.o_orderkey, l.l_linenumber, l.l_partkey,
             CAST(CAST(l.l_quantity AS DECIMAL(12,2)) AS VARCHAR) AS quantity
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      ORDER BY o.o_orderkey, l.l_linenumber, l.l_partkey,
               CAST(l.l_quantity AS DECIMAL(12,2))"""),
      // (o_orderkey, l_linenumber) is NOT unique in the synthetic
      // lineitem — l_partkey + quantity complete the total order.
      // quantity rendered as string (decimal byte-widths hash
      // differently across engines); ORDER BY stays numeric.
      (s, d) => t(s, d, "orders").select("o_orderkey")
        .join(t(s, d, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_quantity").cast("decimal(12,2)").cast("string").as("quantity"))
        .orderBy(col("o_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("quantity").cast("decimal(12,2)"))),

    // ──────────────── §2.2 projection / derivation ────────────────

    // P1: lineage stamping (fixed literals for determinism;
    // run_ac_extraction.py:151-153).
    QDef("q_lineage_stamp", Some("""
      SELECT o_orderkey, 'r1' AS run_id, '2026-01-01T00:00:00Z' AS extracted_at
      FROM orders ORDER BY o_orderkey"""),
      (s, d) => t(s, d, "orders")
        .select(col("o_orderkey"), lit("r1").as("run_id"),
          lit("2026-01-01T00:00:00Z").as("extracted_at"))
        .orderBy("o_orderkey")),

    // P2: rename + column-subset projection (run_ac_extraction.py:1516-1517).
    QDef("q_rename_project", Some("""
      SELECT c_custkey AS contact_id, c_name AS contact_name, c_mktsegment AS segment
      FROM customer ORDER BY contact_id"""),
      (s, d) => t(s, d, "customer")
        .withColumnRenamed("c_custkey", "contact_id")
        .withColumnRenamed("c_name", "contact_name")
        .withColumnRenamed("c_mktsegment", "segment")
        .select("contact_id", "contact_name", "segment")
        .orderBy("contact_id")),

    // P3: cast key columns to string before joins (run_ac_extraction.py:886-889).
    QDef("q_cast_string_norm", Some("""
      SELECT CAST(c_custkey AS VARCHAR) AS contact_id,
             CAST(c_nationkey AS VARCHAR) AS nation_id
      FROM customer ORDER BY CAST(c_custkey AS BIGINT)"""),
      (s, d) => t(s, d, "customer").select(
        col("c_custkey").cast(StringType).as("contact_id"),
        col("c_nationkey").cast(StringType).as("nation_id"))
        .orderBy(col("contact_id").cast(LongType))),

    // P4: single-key equality predicate (run_ac_extraction.py:1442).
    QDef("q_filter_eq", Some(s"""
      SELECT event_id, user_id, event_type, strftime(ts, '$TSD') AS event_ts
      FROM events WHERE user_id = 42 ORDER BY event_id"""),
      (s, d) => t(s, d, "events")
        .filter(col("user_id") === 42)
        .select(col("event_id"), col("user_id"), col("event_type"),
          date_format(col("ts"), TS).as("event_ts"))
        .orderBy("event_id")),

    // P5: membership predicate (run_ac_extraction.py:1680, 949).
    QDef("q_filter_isin", Some("""
      SELECT event_id, event_type FROM events
      WHERE event_type IN ('signup', 'purchase') ORDER BY event_id"""),
      (s, d) => t(s, d, "events")
        .filter(col("event_type").isin("signup", "purchase"))
        .select("event_id", "event_type")
        .orderBy("event_id")),

    // P6: drop blank/'nan'/'None'/NULL strings — the all-string
    // lake's null idiom (run_ac_extraction.py:1452, 1461-1463).
    // Blanks are synthesized deterministically to exercise each path.
    QDef("q_filter_nonblank", Some(s"""
      WITH e AS (SELECT event_id,
        CASE WHEN event_id % 7 = 0 THEN ''
             WHEN event_id % 11 = 0 THEN 'nan'
             WHEN event_id % 13 = 0 THEN NULL
             ELSE event_type END AS raw FROM events)
      SELECT event_id, raw AS kept_type FROM e
      WHERE ${nbSql("raw")} IS NOT NULL ORDER BY event_id"""),
      (s, d) => t(s, d, "events")
        .withColumn("raw",
          when(col("event_id") % 7 === 0, lit(""))
            .when(col("event_id") % 11 === 0, lit("nan"))
            .when(col("event_id") % 13 === 0, lit(null).cast(StringType))
            .otherwise(col("event_type")))
        .filter(nullifBlank(col("raw")).isNotNull)
        .select(col("event_id"), col("raw").as("kept_type"))
        .orderBy("event_id")),

    // P7: first non-blank of N candidate columns
    // (run_ac_extraction.py:1165-1169, 892-916).
    QDef("q_coalesce_candidates", Some(s"""
      WITH e AS (SELECT event_id,
        CASE WHEN event_id % 3 = 0 THEN '' ELSE event_type END AS c1,
        CASE WHEN event_id % 5 = 0 THEN NULL ELSE 'alt_' || event_type END AS c2
        FROM events)
      SELECT event_id,
             COALESCE(${nbSql("c1")}, ${nbSql("c2")}, 'default') AS picked
      FROM e ORDER BY event_id"""),
      (s, d) => t(s, d, "events")
        .withColumn("c1", when(col("event_id") % 3 === 0, lit("")).otherwise(col("event_type")))
        .withColumn("c2", when(col("event_id") % 5 === 0, lit(null).cast(StringType))
          .otherwise(concat(lit("alt_"), col("event_type"))))
        .select(col("event_id"),
          coalesce(coalesceCandidates(col("c1"), col("c2")), lit("default")).as("picked"))
        .orderBy("event_id")),

    // P8: dict decode with passthrough default (run_ac_extraction.py:409-410).
    QDef("q_conditional_decode", Some("""
      SELECT o_orderkey,
             CASE o_orderstatus WHEN 'O' THEN 'Open' WHEN 'F' THEN 'Finished'
                  WHEN 'P' THEN 'Pending' ELSE o_orderstatus END AS status_decoded
      FROM orders ORDER BY o_orderkey"""),
      (s, d) => t(s, d, "orders")
        .select(col("o_orderkey"),
          decodeMap(col("o_orderstatus"),
            Seq("O" -> "Open", "F" -> "Finished", "P" -> "Pending"),
            col("o_orderstatus")).as("status_decoded"))
        .orderBy("o_orderkey")),

    // P9: lenient int coercion, default 0 (safe_int,
    // run_ac_extraction.py:58-63). Corrupt values synthesized.
    QDef("q_safe_int", Some("""
      WITH e AS (SELECT event_id,
        CASE WHEN event_id % 9 = 0 THEN 'oops'
             ELSE json_extract_string(props, '$.k') END AS raw FROM events)
      SELECT event_id, COALESCE(TRY_CAST(trim(raw) AS BIGINT), 0) AS k_int
      FROM e ORDER BY event_id"""),
      (s, d) => t(s, d, "events")
        .withColumn("raw", when(col("event_id") % 9 === 0, lit("oops"))
          .otherwise(get_json_object(col("props"), "$.k")))
        .select(col("event_id"), safeInt(col("raw")).as("k_int"))
        .orderBy("event_id")),

    // ───────────────────────── §2.3 joins ─────────────────────────

    // J1: left outer enrich events ⟕ contacts — contact dim is
    // explicitly broadcast (run_ac_extraction.py:1390-1392).
    QDef("q_join_left_enrich", Some("""
      SELECT e.event_id, e.user_id, c.c_name AS contact_name, e.event_type
      FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
      ORDER BY e.event_id"""),
      (s, d) => t(s, d, "events")
        .join(broadcast(t(s, d, "customer")
          .select(col("c_custkey").as("user_id"), col("c_name").as("contact_name"))),
          Seq("user_id"), "left")
        .select("event_id", "user_id", "contact_name", "event_type")
        .orderBy("event_id")),

    // J2: seed join + fill-blank-from-seed COALESCE-on-blank
    // (run_ac_extraction.py:1513-1531, esp. 1525-1529).
    QDef("q_join_seed_coalesce", Some("""
      WITH contacts AS (SELECT c_custkey,
             CASE WHEN c_custkey % 5 = 0 THEN ''
                  ELSE lower(c_name) || '@live.test' END AS email FROM customer),
      seed AS (SELECT c_custkey, 'seed+' || c_custkey || '@seed.test' AS email_seed
               FROM customer WHERE c_custkey % 2 = 0)
      SELECT c.c_custkey,
             CASE WHEN trim(c.email) = '' AND s.email_seed IS NOT NULL
                  THEN s.email_seed ELSE c.email END AS email
      FROM contacts c LEFT JOIN seed s ON c.c_custkey = s.c_custkey
      ORDER BY c.c_custkey"""),
      (s, d) => {
        val cust = t(s, d, "customer")
        val contacts = cust.select(col("c_custkey"),
          when(col("c_custkey") % 5 === 0, lit(""))
            .otherwise(concat(lower(col("c_name")), lit("@live.test"))).as("email"))
        val seed = cust.filter(col("c_custkey") % 2 === 0)
          .select(col("c_custkey"),
            concat(lit("seed+"), col("c_custkey"), lit("@seed.test")).as("email_seed"))
        contacts.join(broadcast(seed), Seq("c_custkey"), "left")
          .select(col("c_custkey"),
            when(trim(col("email")) === "" && col("email_seed").isNotNull,
              col("email_seed")).otherwise(col("email")).as("email"))
          .orderBy("c_custkey")
      }),

    // J3: dict-map lookup = broadcast left join dim(id→name) on
    // string-normalized keys (run_ac_extraction.py:899-954, 1044-1127).
    QDef("q_maplookup_broadcast", Some("""
      SELECT c.c_custkey, n.n_name AS nation_name
      FROM customer c LEFT JOIN nation n
        ON CAST(c.c_nationkey AS VARCHAR) = CAST(n.n_nationkey AS VARCHAR)
      ORDER BY c.c_custkey"""),
      (s, d) => mapLookup(t(s, d, "customer"), t(s, d, "nation"),
        col("c_nationkey"), "n_nationkey", "n_name", "nation_name")
        .select("c_custkey", "nation_name")
        .orderBy("c_custkey")),

    // J4: layered lookup with blank-aware fallback
    // (run_ac_extraction.py:926-949, 1083-1086).
    QDef("q_join_fallback_chain", Some("""
      SELECT c.c_custkey,
             COALESCE(CASE WHEN n.n_nationkey % 3 = 0 THEN NULL ELSE n.n_name END,
                      r.r_name) AS region_or_nation
      FROM customer c
      LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
      LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
      ORDER BY c.c_custkey"""),
      (s, d) => t(s, d, "customer")
        .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"), "left")
        .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"), "left")
        .select(col("c_custkey"),
          fallbackChain(
            when(col("n_nationkey") % 3 === 0, lit("")).otherwise(col("n_name")),
            col("r_name")).as("region_or_nation"))
        .orderBy("c_custkey")),

    // J5: two-level nested fan-out contacts→orders→lineitem
    // (run_deals_bundle, run_ac_extraction.py:836-861).
    QDef("q_join_nested_fanout", Some("""
      SELECT c.c_custkey, o.o_orderkey, l.l_linenumber,
             CAST(CAST(l.l_extendedprice AS DECIMAL(12,2)) AS VARCHAR) AS price
      FROM customer c
      JOIN orders o ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      ORDER BY c.c_custkey, o.o_orderkey, l.l_linenumber,
               CAST(l.l_extendedprice AS DECIMAL(12,2))"""),
      (s, d) => broadcast(t(s, d, "customer").select("c_custkey"))
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"))
        .join(t(s, d, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .select(col("c_custkey"), col("o_orderkey"), col("l_linenumber"),
          col("l_extendedprice").cast("decimal(12,2)").cast("string").as("price"))
        // (l_orderkey, l_linenumber) is NOT unique in the synthetic
        // testdata — price completes the total order. price rendered
        // as string (cross-engine decimal hashing); ORDER BY numeric.
        .orderBy(col("c_custkey"), col("o_orderkey"), col("l_linenumber"),
          col("price").cast("decimal(12,2)"))),

    // J6: email→contact_id resolution (run_ac_extraction.py:315-327).
    QDef("q_join_email_resolve", Some("""
      WITH contacts AS (SELECT c_custkey, lower(c_name) || '@x.test' AS email FROM customer),
      seed AS (SELECT lower(c_name) || '@x.test' AS email FROM customer WHERE c_custkey % 10 = 0)
      SELECT s.email, c.c_custkey AS contact_id
      FROM seed s LEFT JOIN contacts c ON s.email = c.email
      ORDER BY s.email"""),
      (s, d) => {
        val cust = t(s, d, "customer")
        val contacts = cust.select(col("c_custkey"),
          concat(lower(col("c_name")), lit("@x.test")).as("email"))
        val seed = cust.filter(col("c_custkey") % 10 === 0)
          .select(concat(lower(col("c_name")), lit("@x.test")).as("email"))
        seed.join(contacts.withColumnRenamed("c_custkey", "contact_id"), Seq("email"), "left")
          .select("email", "contact_id")
          .orderBy("email")
      }),

    // J9 (extension): skew-salted equi-join — the fact side gets a
    // deterministic salt from a high-cardinality column, the dim
    // replicates once per salt, and the shuffle key becomes
    // (key, salt) so one hot key spreads over `salt` reducers (for
    // skew AQE's split can't reach, e.g. pre-agg hot keys). The
    // oracle IS the plain equi-join: salting must be invisible in
    // the result.
    QDef("q_join_salted_skew", Some("""
      SELECT e.event_id, e.user_id, c.c_mktsegment
      FROM events e JOIN customer c ON e.user_id = c.c_custkey
      ORDER BY e.event_id"""),
      (s, d) => {
        val fact = t(s, d, "events").select(col("event_id"), col("user_id"))
        val dim = t(s, d, "customer")
          .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
        graft.ops.Ops.saltedJoin(fact, dim, "user_id", salt = 8,
          saltBy = col("event_id"))
          .select("event_id", "user_id", "c_mktsegment")
          .orderBy("event_id")
      }),

    // J7 (extension): as-of join — every non-purchase event carries
    // the user's most recent purchase value at-or-before the event.
    // Spark-side: Ops.asofLastValue (union + ONE window pass, no row
    // expansion); oracle: DuckDB's native ASOF LEFT JOIN. The
    // purchase series is pre-aggregated per (user, instant) so "the"
    // value at a timestamp is well-defined in both engines.
    QDef("q_asof_join", Some(s"""
      WITH p AS (SELECT user_id, ts, max(value) AS pv FROM events
                 WHERE event_type = 'purchase' GROUP BY user_id, ts),
      e AS (SELECT event_id, user_id, ts, event_type FROM events
            WHERE event_type <> 'purchase')
      SELECT e.event_id, e.user_id, strftime(e.ts, '$TSD') AS event_ts,
             e.event_type,
             CAST(CAST(p.pv AS DECIMAL(12,2)) AS VARCHAR) AS last_purchase
      FROM e ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.ts >= p.ts
      ORDER BY e.event_id"""),
      (s, d) => {
        val ev = t(s, d, "events")
        val purchases = ev.filter(col("event_type") === "purchase")
          .groupBy("user_id", "ts").agg(max(col("value")).as("pv"))
        val probes = ev.filter(col("event_type") =!= "purchase")
          .select("event_id", "user_id", "ts", "event_type")
        asofLastValue(probes, purchases, "user_id", "ts", "ts", "pv",
          "last_purchase")
          .select(col("event_id"), col("user_id"),
            date_format(col("ts"), TS).as("event_ts"), col("event_type"),
            col("last_purchase").cast("decimal(12,2)").cast("string")
              .as("last_purchase"))
          .orderBy("event_id")
      }),

    // J8 (extension): range join via time binning — overlapping
    // 3-day promo windows (one per nation, staggered daily) matched
    // to the events inside them. Spark-side: Ops.binnedRangeJoin
    // (bin equi-join + exact filter — NO nested-loop plan); oracle:
    // DuckDB's plain inequality join.
    QDef("q_range_join_binned", Some(s"""
      WITH w AS (SELECT n_nationkey AS window_id,
               TIMESTAMP '2024-01-01' + INTERVAL (n_nationkey) DAY AS ws,
               TIMESTAMP '2024-01-01' + INTERVAL (n_nationkey + 3) DAY AS we
             FROM nation),
      j AS (SELECT w.window_id, e.value FROM w
            JOIN events e ON e.ts >= w.ws AND e.ts < w.we)
      SELECT window_id, count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(12,2))) AS VARCHAR) AS total_value
      FROM j GROUP BY window_id ORDER BY window_id"""),
      (s, d) => {
        val windows = t(s, d, "nation").select(
          col("n_nationkey").as("window_id"),
          expr("timestampadd(DAY, n_nationkey, TIMESTAMP'2024-01-01')").as("ws"),
          expr("timestampadd(DAY, n_nationkey + 3, TIMESTAMP'2024-01-01')").as("we"))
        binnedRangeJoin(t(s, d, "events"), "ts", windows, "ws", "we",
          binWidthUs = 24L * 3600 * 1000000) // 1-day bins ≈ window scale
          .groupBy("window_id")
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast("decimal(12,2)")).cast("string")
              .as("total_value"))
          .orderBy("window_id")
      }),

    // ─────────────────── §2.4 aggregations / dedup ─────────────────

    // A1: content-hash dedup over all non-lineage columns; among
    // duplicates min(run_id) wins (run_ac_extraction.py:126-131,
    // 170-172). Two synthetic "runs" with a deterministic drift.
    QDef("q_dedup_content_hash", Some("""
      WITH base AS (
        SELECT c_custkey, c_name, c_nationkey, c_mktsegment AS segment, 'r1' AS run_id FROM customer
        UNION ALL
        SELECT c_custkey, c_name, c_nationkey,
               CASE WHEN c_custkey % 4 = 0 THEN 'CHANGED' ELSE c_mktsegment END, 'r2' FROM customer
      ), hashed AS (
        SELECT *, md5(COALESCE(CAST(c_custkey AS VARCHAR), '') || '||' ||
                      COALESCE(c_name, '') || '||' ||
                      COALESCE(CAST(c_nationkey AS VARCHAR), '') || '||' ||
                      COALESCE(segment, '')) AS _h
        FROM base)
      SELECT c_custkey, c_name, c_nationkey, segment, run_id FROM hashed
      QUALIFY row_number() OVER (PARTITION BY _h ORDER BY run_id) = 1
      ORDER BY c_custkey, run_id"""),
      (s, d) => {
        val cust = t(s, d, "customer")
        val r1 = cust.select(col("c_custkey"), col("c_name"), col("c_nationkey"),
          col("c_mktsegment").as("segment"), lit("r1").as("run_id"))
        val r2 = cust.select(col("c_custkey"), col("c_name"), col("c_nationkey"),
          when(col("c_custkey") % 4 === 0, lit("CHANGED"))
            .otherwise(col("c_mktsegment")).as("segment"), lit("r2").as("run_id"))
        contentHashDedup(r1.unionByName(r2), Seq("run_id"), col("run_id"))
          .orderBy("c_custkey", "run_id")
      }),

    // A2: SCD-1 latest-per-key snapshot (run_ac_extraction.py:175-188).
    QDef("q_latest_snapshot", Some(s"""
      SELECT l_orderkey, l_linenumber, strftime(l_shipdate, '$TSD') AS updated_at
      FROM lineitem
      QUALIFY row_number() OVER (PARTITION BY l_orderkey
                                 ORDER BY l_shipdate DESC, l_linenumber DESC) = 1
      ORDER BY l_orderkey"""),
      (s, d) => latestSnapshot(t(s, d, "lineitem"), Seq("l_orderkey"),
        col("l_shipdate"), col("l_linenumber"))
        .select(col("l_orderkey"), col("l_linenumber"),
          date_format(col("l_shipdate"), TS).as("updated_at"))
        .orderBy("l_orderkey")),

    // A3: distinct by key (run_ac_extraction.py:313, 327).
    QDef("q_dedup_key", Some(
      "SELECT DISTINCT o_custkey FROM orders ORDER BY o_custkey"),
      (s, d) => t(s, d, "orders").select("o_custkey")
        .dropDuplicates("o_custkey").orderBy("o_custkey")),

    // A4: most-recent N per group (run_ac_extraction.py:1183-1193).
    QDef("q_topn_per_group", Some(s"""
      SELECT user_id, event_id, strftime(ts, '$TSD') AS event_ts, event_type
      FROM events
      QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) <= 5
      ORDER BY user_id, event_id"""),
      (s, d) => topNPerGroup(t(s, d, "events"), Seq("user_id"),
        Seq(col("ts").desc, col("event_id").desc), 5)
        .select(col("user_id"), col("event_id"),
          date_format(col("ts"), TS).as("event_ts"), col("event_type"))
        .orderBy("user_id", "event_id")),

    // A5: last-k after chronological sort = top-k by recency,
    // re-emitted in ascending order (run_ac_extraction.py:1479).
    QDef("q_lastk_per_group", Some(s"""
      SELECT user_id, event_id, strftime(ts, '$TSD') AS event_ts
      FROM events
      QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) <= 3
      ORDER BY user_id, event_ts, event_id"""),
      (s, d) => topNPerGroup(t(s, d, "events"), Seq("user_id"),
        Seq(col("ts").desc, col("event_id").desc), 3)
        .select(col("user_id"), col("event_id"),
          date_format(col("ts"), TS).as("event_ts"))
        .orderBy("user_id", "event_ts", "event_id")),

    // A6: per-key sorted distinct set, ", "-joined
    // (run_ac_extraction.py:1447-1474).
    QDef("q_collect_sorted_set", Some("""
      SELECT user_id, string_agg(DISTINCT event_type, ', ' ORDER BY event_type) AS types
      FROM events GROUP BY user_id ORDER BY user_id"""),
      (s, d) => t(s, d, "events").groupBy("user_id")
        .agg(sortedSetAgg(col("event_type")).as("types"))
        .orderBy("user_id")),

    // A7: max-id watermark advance (run_ac_extraction.py:266, 1568).
    QDef("q_agg_max_watermark", Some(
      "SELECT max(event_id) AS max_id FROM events"),
      (s, d) => t(s, d, "events").agg(max(col("event_id")).as("max_id"))),

    // A8: per-(key,key) entry counts (run_ac_extraction.py:768-787).
    QDef("q_count_entries", Some("""
      SELECT user_id, event_type, count(*) AS n FROM events
      GROUP BY user_id, event_type ORDER BY user_id, event_type"""),
      (s, d) => t(s, d, "events").groupBy("user_id", "event_type")
        .agg(count(lit(1)).as("n"))
        .orderBy("user_id", "event_type")),

    // Float aggregation surface (SURVEY.md §2.7 note): TPC-H Q1-style
    // pricing summary; doubles canonicalized to DECIMAL for exact
    // cross-engine arithmetic.
    QDef("q_agg_pricing_summary", Some("""
      SELECT l_returnflag, l_linestatus,
             CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS sum_qty,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS sum_price,
             count(*) AS n
      FROM lineitem GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""),
      // sums rendered as strings: Spark widens sum(DECIMAL(12,2)) to
      // DECIMAL(22,2), DuckDB to DECIMAL(38,2) — same value, different
      // hash; the string render is identical (scale 2 both).
      (s, d) => t(s, d, "lineitem").groupBy("l_returnflag", "l_linestatus")
        .agg(sum(col("l_quantity").cast("decimal(12,2)")).cast("string").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(12,2)")).cast("string").as("sum_price"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus")),

    // TPC-H Q3-shape: revenue of open orders by order, 3-way join +
    // agg + ordered limit. Revenue in DECIMAL for exact cross-engine
    // arithmetic; (revenue, orderkey) total-orders the limit boundary.
    QDef("q_agg_top_revenue", Some("""
      SELECT o.o_orderkey,
             CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2)) *
                 (1 - CAST(l.l_discount AS DECIMAL(12,2)))) AS VARCHAR) AS revenue,
             strftime(o.o_orderdate, '%Y-%m-%d') AS odate, o.o_orderpriority
      FROM customer c
      JOIN orders o ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE c.c_mktsegment = 'BUILDING' AND o.o_orderstatus = 'O'
      GROUP BY o.o_orderkey, odate, o.o_orderpriority
      ORDER BY sum(CAST(l.l_extendedprice AS DECIMAL(12,2)) *
                   (1 - CAST(l.l_discount AS DECIMAL(12,2)))) DESC,
               o.o_orderkey LIMIT 20"""),
      // revenue rendered as string for cross-engine hashing; the
      // DESC ordering and the limit boundary stay on the numeric.
      (s, d) => t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey")
        .join(t(s, d, "orders").filter(col("o_orderstatus") === "O"),
          col("c_custkey") === col("o_custkey"))
        .join(t(s, d, "lineitem"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("odate"),
          col("o_orderpriority"))
        .agg(sum(col("l_extendedprice").cast("decimal(12,2)") *
          (lit(1) - col("l_discount").cast("decimal(12,2)"))).as("revenue_n"))
        .orderBy(col("revenue_n").desc, col("o_orderkey")).limit(20)
        .select(col("o_orderkey"), col("revenue_n").cast("string").as("revenue"),
          col("odate"), col("o_orderpriority"))),

    // TPC-H Q5-shape: revenue by nation through a 4-way join chain
    // (region → nation → customer → orders → lineitem), broadcast
    // dims, group by nation name.
    QDef("q_agg_nation_revenue", Some("""
      SELECT n.n_name,
             CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2)) *
                 (1 - CAST(l.l_discount AS DECIMAL(12,2)))) AS VARCHAR) AS revenue,
             count(*) AS n_items
      FROM nation n
      JOIN customer c ON c.c_nationkey = n.n_nationkey
      JOIN orders o ON o.o_custkey = c.c_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY n.n_name ORDER BY n.n_name"""),
      (s, d) => t(s, d, "lineitem")
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, d, "customer").select("c_custkey", "c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, d, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(sum(col("l_extendedprice").cast("decimal(12,2)") *
          (lit(1) - col("l_discount").cast("decimal(12,2)"))).cast("string").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("n_name")),

    // TPC-H Q21-shape: suppliers who were the SOLE returned-line
    // supplier in a finished multi-supplier order — the classic
    // semi-join + anti-join pair on the same fact table. Both
    // existence probes are key-equi joins on l_orderkey with a
    // suppkey-inequality residual (never a correlated per-row
    // subquery): at 100 TB all three lineitem branches shuffle on the
    // SAME key, so AQE plans them as co-partitioned sort-merge
    // semi/anti joins with no extra exchange; orders' status filter
    // prunes before the join. Total-ordered limit (numwait DESC,
    // name) keeps the top-10 deterministic.
    QDef("q_agg_suppliers_waiting", Some("""
      SELECT s.s_name, count(*) AS numwait
      FROM supplier s
      JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
      JOIN orders o ON o.o_orderkey = l1.l_orderkey
      WHERE o.o_orderstatus = 'F' AND l1.l_returnflag = 'R'
        AND EXISTS (SELECT 1 FROM lineitem l2
                    WHERE l2.l_orderkey = l1.l_orderkey
                      AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM lineitem l3
                        WHERE l3.l_orderkey = l1.l_orderkey
                          AND l3.l_suppkey <> l1.l_suppkey
                          AND l3.l_returnflag = 'R')
      GROUP BY s.s_name ORDER BY numwait DESC, s.s_name LIMIT 10"""),
      (s, d) => {
        val li = t(s, d, "lineitem")
        val l1 = li.filter(col("l_returnflag") === "R")
          .select("l_orderkey", "l_suppkey")
        val others = li.select(col("l_orderkey").as("o2_orderkey"),
          col("l_suppkey").as("o2_suppkey"))
        val othersR = li.filter(col("l_returnflag") === "R")
          .select(col("l_orderkey").as("o3_orderkey"),
            col("l_suppkey").as("o3_suppkey"))
        l1.join(t(s, d, "orders").filter(col("o_orderstatus") === "F")
            .select("o_orderkey"),
            col("l_orderkey") === col("o_orderkey"))
          .join(others, col("o2_orderkey") === col("l_orderkey") &&
            col("o2_suppkey") =!= col("l_suppkey"), "left_semi")
          .join(othersR, col("o3_orderkey") === col("l_orderkey") &&
            col("o3_suppkey") =!= col("l_suppkey"), "left_anti")
          .join(broadcast(t(s, d, "supplier").select("s_suppkey", "s_name")),
            col("l_suppkey") === col("s_suppkey"))
          .groupBy("s_name").agg(count(lit(1)).as("numwait"))
          .orderBy(col("numwait").desc, col("s_name")).limit(10)
      }),

    // Approximate distinct counting (HLL++ sketch): cardinality of
    // l_partkey per return flag. The sketch estimate itself is
    // engine-specific, so the oracle-checked surface is the exact
    // distinct count plus a bound flag the oracle asserts as 1. The
    // configured 0.02 is a relative STANDARD DEVIATION, not a max
    // error — a 2% flag would flip ~32% of the time per group — so
    // the checked bound is 3σ (6%), ~99.7% per group, making the
    // hash deterministic in practice at any scale factor.
    QDef("q_approx_distinct", Some("""
      SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts,
             count(*) AS n, CAST(1 AS INTEGER) AS within_bound
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
      (s, d) => {
        // r17 OPT (guide §2.3, shuffle fewer bytes): the one-shot
        // countDistinct+approx_count_distinct aggregate made Spark
        // carry a partial HLL++ buffer (410 long slots ≈ 3.3 KB) per
        // (flag, partkey) GROUP through the first exchange — the
        // sketch meant to SUMMARIZE the keys was being shipped once
        // per key. Pre-aggregating to the distinct (flag, partkey)
        // grain first (3-column rows through the exchange), then
        // sketching the already-deduped keys, is value-identical:
        // HLL insertion is idempotent, so the sketch over the
        // deduped set equals the sketch over the raw multiset, and
        // exact_parts/n fall out as count/sum. sf0.1 bench:
        // 2.08 s → see OPTIMIZATION_r17.md; the old plan's
        // 413-column exchange is now 3 columns.
        val perKey = t(s, d, "lineitem")
          .groupBy("l_returnflag", "l_partkey")
          .agg(count(lit(1)).as("nk"))
        perKey.groupBy("l_returnflag")
          .agg(count(lit(1)).as("exact_parts"),
            sum(col("nk")).cast(LongType).as("n"),
            approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"))
          .select(col("l_returnflag"), col("exact_parts"), col("n"),
            (abs(col("approx_parts") - col("exact_parts")) <=
              lit(0.06) * col("exact_parts")).cast("int").as("within_bound"))
          .orderBy("l_returnflag")
      }),

    // MERGEABLE sketches (the property that makes sketches the
    // 100 TB answer, which q_approx_distinct alone doesn't show):
    // one Datasketches-HLL sketch of user ids per event type, then
    // ONE union-merge producing the global distinct estimate — no
    // second pass over the fact. That's the distributed-aggregation
    // contract in miniature: partial sketches per group/partition,
    // lossless binary merge, estimate at the end; per-type sketches
    // persist as bytes for incremental refresh (merge tomorrow's
    // sketch, never recount history). The estimate is
    // engine-specific, so the oracle-checked surface is the exact
    // global distinct + a 5% bound flag asserted 1 (lgK=12 → 1.6%
    // rel. std err; 3σ ≈ 5%), the q_approx_distinct discipline.
    QDef("q_hll_merge", Some("""
      SELECT CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
             CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
             CAST(1 AS INTEGER) AS within_bound
      FROM events"""),
      (s, d) => {
        val perType = t(s, d, "events")
          .groupBy("event_type")
          .agg(hll_sketch_agg(col("user_id"), 12).as("sk"))
        perType.agg(
            count(lit(1)).as("n_types"),
            hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
          .crossJoin(broadcast(t(s, d, "events")
            .agg(countDistinct(col("user_id")).as("exact_users"))))
          .select(col("n_types"), col("exact_users"),
            (abs(col("est") - col("exact_users")) <=
              lit(0.05) * col("exact_users")).cast("int").as("within_bound"))
      }),

    // ─────────────────── §2.5 sorts / limits ──────────────────────

    // O1: global total-order timeline sort with explicit tiebreak
    // (run_ac_extraction.py:1425).
    QDef("q_sort_stable_multikey", Some(s"""
      SELECT user_id, event_id, strftime(ts, '$TSD') AS event_ts, event_type
      FROM events
      ORDER BY user_id ASC, event_ts ASC NULLS LAST, event_id ASC"""),
      (s, d) => t(s, d, "events")
        .select(col("user_id"), col("event_id"),
          date_format(col("ts"), TS).as("event_ts"), col("event_type"))
        .orderBy(col("user_id").asc, col("event_ts").asc_nulls_last, col("event_id").asc)),

    // O2: debug sampling — first N after numeric sort
    // (run_ac_extraction.py:1582-1584).
    QDef("q_limit_sample", Some(
      "SELECT c_custkey FROM customer ORDER BY c_custkey LIMIT 10"),
      (s, d) => t(s, d, "customer").select("c_custkey")
        .orderBy("c_custkey").limit(10)),

    // ───────────────────── §2.6 set operations ────────────────────

    // U1: align-by-name union, absent cols → NULL
    // (run_ac_extraction.py:164-167).
    QDef("q_union_align_by_name", Some("""
      SELECT * FROM (
        SELECT c_custkey, c_name, 'a' AS src FROM customer
        UNION ALL BY NAME
        SELECT c_custkey, c_mktsegment AS segment, 'b' AS src FROM customer)
      ORDER BY c_custkey, src"""),
      (s, d) => {
        val cust = t(s, d, "customer")
        val a = cust.select(col("c_custkey"), col("c_name"), lit("a").as("src"))
        val b = cust.select(col("c_custkey"), col("c_mktsegment").as("segment"), lit("b").as("src"))
        alignUnion(a, b).orderBy("c_custkey", "src")
      }),

    // U3: distinct union of id universes, numeric order
    // (run_ac_extraction.py:1576-1580).
    QDef("q_union_distinct_ids", Some("""
      SELECT DISTINCT id FROM (
        SELECT c_custkey AS id FROM customer
        UNION ALL SELECT user_id AS id FROM events) ORDER BY id"""),
      (s, d) => t(s, d, "customer").select(col("c_custkey").as("id"))
        .union(t(s, d, "events").select(col("user_id").as("id")))
        .distinct().orderBy("id")),

    // SET OPERATIONS (INTERSECT / EXCEPT — the two relational set ops
    // the union family doesn't exercise): behavioral cohorts as id-set
    // algebra — users who both purchased AND signed up, and users who
    // viewed but NEVER purchased. Catalyst rewrites INTERSECT/EXCEPT
    // to left-semi/left-anti joins over the deduped key sets, so the
    // plan is two narrow key-only scans per cohort and the shuffles
    // carry distinct user ids, never events. The multiplexed
    // event_type filters come from ONE events pass per branch pair
    // (the scan is key+type only — column pruning does the rest).
    QDef("q_set_ops_users", Some("""
      WITH pur AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
      sig AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'signup'),
      vie AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'view')
      SELECT cohort, user_id FROM (
        SELECT 'purchase_and_signup' AS cohort, user_id
        FROM (SELECT user_id FROM pur INTERSECT SELECT user_id FROM sig)
        UNION ALL
        SELECT 'view_never_bought', user_id
        FROM (SELECT user_id FROM vie EXCEPT SELECT user_id FROM pur))
      ORDER BY cohort, user_id"""),
      (s, d) => {
        def ids(ty: String) = t(s, d, "events")
          .filter(col("event_type") === ty).select(col("user_id")).distinct()
        ids("purchase").intersect(ids("signup"))
          .select(lit("purchase_and_signup").as("cohort"), col("user_id"))
          .union(ids("view").except(ids("purchase"))
            .select(lit("view_never_bought").as("cohort"), col("user_id")))
          .orderBy("cohort", "user_id")
      }),

    // U2 / §2.8: the conform-union — 3 heterogeneous testdata sources
    // plus the CATALOG-DRIVEN contact seed roster (the paged
    // connector under the endpoint catalog's per-endpoint column set,
    // deterministic fixture backend mirrored by the oracle's range()
    // generator) conformed to the unified event schema
    // (run_ac_extraction.py:1171-1384; roster rows are the same
    // `dict(it)` dynamic payloads as every other source).
    QDef("q_conform_union", Some(s"""
      WITH ev AS (
        SELECT 'events:' || event_id AS event_id, user_id AS contact_id,
               'events' AS source, CAST(event_id AS VARCHAR) AS source_row_id,
               strftime(ts, '$TSD') AS event_ts, event_type,
               'activity ' || event_type AS title,
               json_extract_string(props, '$$.k') AS detail,
               'https://example.test/events/' || event_id AS url,
               CAST(NULL AS VARCHAR) AS part_id, CAST(NULL AS VARCHAR) AS supplier_id,
               CAST(NULL AS VARCHAR) AS order_id, CAST(NULL AS VARCHAR) AS order_title,
               CAST(NULL AS VARCHAR) AS stage_id, CAST(NULL AS VARCHAR) AS stage_name,
               event_type AS tag_id,
               CASE event_type WHEN 'click' THEN 'Clicked' WHEN 'view' THEN 'Viewed'
                    WHEN 'purchase' THEN 'Purchased' WHEN 'signup' THEN 'Signed up'
                    WHEN 'error' THEN 'Errored' ELSE 'tag_other' END AS tag_name
        FROM events),
      od AS (
        SELECT 'orders:' || o_orderkey AS event_id, o_custkey AS contact_id,
               'orders' AS source, CAST(o_orderkey AS VARCHAR) AS source_row_id,
               strftime(o_orderdate, '$TSD') AS event_ts,
               CASE o_orderstatus WHEN 'O' THEN 'order_open' WHEN 'F' THEN 'order_filled'
                    WHEN 'P' THEN 'order_pending' ELSE 'order_other' END AS event_type,
               o_orderpriority AS title,
               CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR) AS detail,
               CAST(NULL AS VARCHAR) AS url,
               CAST(NULL AS VARCHAR) AS part_id, CAST(NULL AS VARCHAR) AS supplier_id,
               CAST(o_orderkey AS VARCHAR) AS order_id, o_orderpriority AS order_title,
               o_orderstatus AS stage_id,
               CASE o_orderstatus WHEN 'O' THEN 'Open' WHEN 'F' THEN 'Filled'
                    WHEN 'P' THEN 'Pending' ELSE 'Other' END AS stage_name,
               CAST(NULL AS VARCHAR) AS tag_id, CAST(NULL AS VARCHAR) AS tag_name
        FROM orders),
      sh AS (
        SELECT 'lineitem:' || l_orderkey || ':' || l_linenumber AS event_id,
               o_custkey AS contact_id, 'lineitem' AS source,
               l_orderkey || '-' || l_linenumber AS source_row_id,
               strftime(l_shipdate, '$TSD') AS event_ts, 'shipment' AS event_type,
               'ship ' || l_returnflag || ' ' || l_linestatus AS title,
               CAST(CAST(l_quantity AS DECIMAL(12,2)) AS VARCHAR) AS detail,
               CAST(NULL AS VARCHAR) AS url,
               CAST(l_partkey AS VARCHAR) AS part_id,
               CAST(l_suppkey AS VARCHAR) AS supplier_id,
               CAST(l_orderkey AS VARCHAR) AS order_id, o_orderpriority AS order_title,
               o_orderstatus AS stage_id,
               CASE o_orderstatus WHEN 'O' THEN 'Open' WHEN 'F' THEN 'Filled'
                    WHEN 'P' THEN 'Pending' ELSE 'Other' END AS stage_name,
               CAST(NULL AS VARCHAR) AS tag_id, CAST(NULL AS VARCHAR) AS tag_name
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      sd AS (
        SELECT 'contacts:' || i AS event_id, i AS contact_id,
               'contacts' AS source, CAST(i AS VARCHAR) AS source_row_id,
               '2026-01-01 00:00:00' AS event_ts, 'contact_seed' AS event_type,
               'user' || i || '@example.com' AS title, 'seed' AS detail,
               CAST(NULL AS VARCHAR) AS url,
               CAST(NULL AS VARCHAR) AS part_id, CAST(NULL AS VARCHAR) AS supplier_id,
               CAST(NULL AS VARCHAR) AS order_id, CAST(NULL AS VARCHAR) AS order_title,
               CAST(NULL AS VARCHAR) AS stage_id, CAST(NULL AS VARCHAR) AS stage_name,
               CAST(NULL AS VARCHAR) AS tag_id, CAST(NULL AS VARCHAR) AS tag_name
        FROM range(0, 200) t(i))
      SELECT * FROM (SELECT * FROM ev UNION ALL SELECT * FROM od
                     UNION ALL SELECT * FROM sh UNION ALL SELECT * FROM sd)
      ORDER BY contact_id, event_ts, event_id, title, detail,
               part_id, supplier_id"""),
      // event_id is not unique for lineitem-derived events (duplicate
      // (l_orderkey, l_linenumber) pairs exist in the synthetic data);
      // at sf>=1 two such twins can also tie on shipdate+quantity+
      // flags, so part_id+supplier_id complete the total order.
      (s, d) => ChatterMaster.unifiedEvents(s, d)
        .unionByName(ChatterMaster.conformContactSeed(s))
        .orderBy("contact_id", "event_ts", "event_id", "title", "detail",
                 "part_id", "supplier_id")),

    // ─────────────────── §2.7 scalar functions ────────────────────

    // F1: trim/concat full-name build with fallback (_mk_name,
    // run_ac_extraction.py:1011-1013).
    QDef("q_str_trim_concat", Some(s"""
      WITH c AS (SELECT c_custkey,
        CASE WHEN c_custkey % 6 = 0 THEN '' ELSE c_name END AS fn,
        CASE WHEN c_custkey % 6 = 0 THEN '' ELSE c_mktsegment END AS ln
        FROM customer)
      SELECT c_custkey,
        COALESCE(${nbSql("trim(concat_ws(' ', COALESCE(trim(fn), ''), COALESCE(trim(ln), '')))")},
                 'contact#' || c_custkey) AS display
      FROM c ORDER BY c_custkey"""),
      (s, d) => t(s, d, "customer")
        .withColumn("fn", when(col("c_custkey") % 6 === 0, lit("")).otherwise(col("c_name")))
        .withColumn("ln", when(col("c_custkey") % 6 === 0, lit("")).otherwise(col("c_mktsegment")))
        .select(col("c_custkey"),
          mkName(col("fn"), col("ln"),
            concat(lit("contact#"), col("c_custkey"))).as("display"))
        .orderBy("c_custkey")),

    // F2: template chatter line, blank parts skipped
    // (_mk_chatter_line, run_ac_extraction.py:1411-1422).
    QDef("q_str_format", Some(s"""
      WITH e AS (SELECT event_id, strftime(ts, '$TSD') AS ets, event_type,
        CASE WHEN event_id % 4 = 0 THEN '' ELSE json_extract_string(props, '$$.k') END AS detail,
        CASE WHEN event_id % 2 = 0 THEN 'https://x.test/e/' || event_id ELSE NULL END AS url
        FROM events)
      SELECT event_id,
             concat_ws(' — ', ${nbSql("ets")}, ${nbSql("event_type")},
                       ${nbSql("detail")}, ${nbSql("url")}) AS line
      FROM e ORDER BY event_id"""),
      (s, d) => t(s, d, "events")
        .withColumn("ets", date_format(col("ts"), TS))
        .withColumn("detail", when(col("event_id") % 4 === 0, lit(""))
          .otherwise(get_json_object(col("props"), "$.k")))
        .withColumn("url", when(col("event_id") % 2 === 0,
          concat(lit("https://x.test/e/"), col("event_id"))).otherwise(lit(null).cast(StringType)))
        .select(col("event_id"),
          chatterLine(col("ets"), col("event_type"), col("detail"), col("url")).as("line"))
        .orderBy("event_id")),

    // F3: case-insensitive prefix dispatch (run_ac_extraction.py:1251-1262).
    QDef("q_str_prefix_dispatch", Some("""
      SELECT event_id,
             CASE WHEN lower(event_type) LIKE 'sign%' THEN 'registration'
                  WHEN lower(event_type) LIKE 'purch%' THEN 'commerce'
                  ELSE 'other' END AS category
      FROM events ORDER BY event_id"""),
      (s, d) => t(s, d, "events")
        .select(col("event_id"),
          when(lower(col("event_type")).startsWith("sign"), lit("registration"))
            .when(lower(col("event_type")).startsWith("purch"), lit("commerce"))
            .otherwise(lit("other")).as("category"))
        .orderBy("event_id")),

    // F4: trailing integer id from URL (extract_id_from_url,
    // run_ac_extraction.py:83-87).
    QDef("q_regexp_extract_id", Some("""
      WITH e AS (SELECT event_id,
        'https://x.test/api/' || user_id ||
          CASE WHEN event_id % 2 = 0 THEN '?page=1' ELSE '' END AS url
        FROM events)
      SELECT event_id, regexp_extract(url, '/(\d+)(\?|$)', 1) AS extracted_id
      FROM e ORDER BY event_id"""),
      (s, d) => t(s, d, "events")
        .withColumn("url", concat(lit("https://x.test/api/"), col("user_id"),
          when(col("event_id") % 2 === 0, lit("?page=1")).otherwise(lit(""))))
        .select(col("event_id"),
          regexp_extract(col("url"), "/(\\d+)(\\?|$)", 1).as("extracted_id"))
        .orderBy("event_id")),

    // F5: JSON-path fetch from a string cell (run_ac_extraction.py:936-947).
    QDef("q_json_get", Some("""
      SELECT event_id, json_extract_string(props, '$.k') AS k
      FROM events ORDER BY event_id"""),
      (s, d) => t(s, d, "events")
        .select(col("event_id"), get_json_object(col("props"), "$.k").as("k"))
        .orderBy("event_id")),

    // F6: md5 hex digest (run_ac_extraction.py:130, 1200).
    QDef("q_md5_hash", Some(
      "SELECT c_custkey, md5(c_name) AS name_md5 FROM customer ORDER BY c_custkey"),
      (s, d) => t(s, d, "customer")
        .select(col("c_custkey"), md5(col("c_name")).as("name_md5"))
        .orderBy("c_custkey")),

    // F7: lenient timestamp parse, invalid → NULL
    // (run_ac_extraction.py:1188, 1401-1403).
    QDef("q_ts_parse_lenient", Some(s"""
      WITH e AS (SELECT event_id,
        CASE WHEN event_id % 10 = 0 THEN 'not-a-ts'
             ELSE strftime(ts, '$TSD') END AS raw FROM events)
      SELECT event_id, strftime(TRY_CAST(raw AS TIMESTAMP), '$TSD') AS parsed
      FROM e ORDER BY event_id"""),
      (s, d) => t(s, d, "events")
        .withColumn("raw", when(col("event_id") % 10 === 0, lit("not-a-ts"))
          .otherwise(date_format(col("ts"), TS)))
        .select(col("event_id"),
          date_format(try_to_timestamp(col("raw")), TS).as("parsed"))
        .orderBy("event_id")),

    // F8: strftime renderings incl. ISO-Z (run_ac_extraction.py:55, 1403-1404).
    QDef("q_ts_format", Some("""
      SELECT event_id, strftime(ts, '%Y-%m-%dT%H:%M:%SZ') AS iso_z,
             strftime(ts, '%Y-%m-%d') AS d
      FROM events ORDER BY event_id"""),
      (s, d) => t(s, d, "events")
        .select(col("event_id"), tsIsoZ(col("ts")).as("iso_z"),
          date_format(col("ts"), "yyyy-MM-dd").as("d"))
        .orderBy("event_id")),

    // F9: whole-day age ≥ TTL check (fixed "now" literal for
    // determinism; run_ac_extraction.py:360-363).
    QDef("q_date_age_days", Some("""
      SELECT o_orderkey,
             CASE WHEN datediff('day', CAST(o_orderdate AS DATE), DATE '2026-08-01') >= 7
                  THEN 1 ELSE 0 END AS stale
      FROM orders ORDER BY o_orderkey"""),
      (s, d) => t(s, d, "orders")
        .select(col("o_orderkey"),
          when(datediff(lit("2026-08-01").cast(DateType), to_date(col("o_orderdate"))) >= 7,
            lit(1)).otherwise(lit(0)).as("stale"))
        .orderBy("o_orderkey")),

    // F11: lowercase normalization (run_ac_extraction.py:297-300).
    QDef("q_lower", Some(
      "SELECT c_custkey, lower(c_mktsegment) AS seg FROM customer ORDER BY c_custkey"),
      (s, d) => t(s, d, "customer")
        .select(col("c_custkey"), lower(col("c_mktsegment")).as("seg"))
        .orderBy("c_custkey")),

    // F12: synthetic event id "{source}:{rowid}" with md5-of-row
    // fallback (run_ac_extraction.py:1197-1200).
    QDef("q_synth_event_id", Some("""
      WITH e AS (SELECT event_id, user_id, event_type,
        CASE WHEN event_id % 8 = 0 THEN NULL ELSE CAST(event_id AS VARCHAR) END AS src_id
        FROM events)
      SELECT event_id,
             concat_ws(':', 'events',
               COALESCE(src_id,
                 md5(COALESCE(CAST(user_id AS VARCHAR), '') || '||' ||
                     COALESCE(event_type, '')))) AS synth_id
      FROM e ORDER BY event_id"""),
      (s, d) => t(s, d, "events")
        .withColumn("src_id", when(col("event_id") % 8 === 0, lit(null).cast(StringType))
          .otherwise(col("event_id").cast(StringType)))
        .select(col("event_id"),
          synthEventId("events", col("src_id"),
            rowHash(Seq(col("user_id"), col("event_type")))).as("synth_id"))
        .orderBy("event_id")),

    // ───────────── §2.9 streaming batch-analog: tumbling window ────
    // (Structured Streaming variant lives in graft.streaming; this is
    // the deterministic batch analog the oracle can check.)
    QDef("q_window_tumbling", Some(s"""
      SELECT strftime(date_trunc('hour', ts), '$TSD') AS window_start, event_type,
             count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(12,2))) AS VARCHAR) AS total_value
      FROM events GROUP BY 1, event_type
      ORDER BY window_start, event_type"""),
      (s, d) => t(s, d, "events")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(12,2)")).as("total_value"))
        .select(date_format(col("w.start"), TS).as("window_start"),
          col("event_type"), col("n"), col("total_value").cast("string").as("total_value"))
        .orderBy("window_start", "event_type")),

    // Sliding windows: 1-hour windows every 30 minutes — each event
    // lands in 2 overlapping windows. The oracle replays Spark's
    // window assignment by unnesting both candidate starts per event.
    QDef("q_window_sliding", Some(s"""
      WITH w AS (SELECT event_type, value,
        unnest([date_trunc('hour', ts),
                date_trunc('hour', ts - INTERVAL 30 MINUTE) + INTERVAL 30 MINUTE]) AS ws
        FROM events)
      SELECT strftime(ws, '$TSD') AS window_start, event_type,
             count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(12,2))) AS VARCHAR) AS total_value
      FROM w GROUP BY ws, event_type
      ORDER BY window_start, event_type"""),
      (s, d) => t(s, d, "events")
        .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(12,2)")).as("total_value"))
        .select(date_format(col("w.start"), TS).as("window_start"),
          col("event_type"), col("n"), col("total_value").cast("string").as("total_value"))
        .orderBy("window_start", "event_type")),

    // Session windows (batch analog; streaming form in
    // graft.streaming.EventStream.sessionCounts): per-user sessions
    // close after a 1-hour event gap. Spark's session_window merges
    // events whose timestamps are strictly closer than the gap, which
    // the oracle mirrors as a gaps-and-islands cumulative sum.
    QDef("q_window_session", Some(s"""
      WITH m AS (SELECT user_id, ts, event_id, value,
        CASE WHEN lag(ts) OVER w IS NULL
                  OR ts - lag(ts) OVER w >= INTERVAL 1 HOUR THEN 1 ELSE 0 END AS new_s
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      s AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING) AS sid FROM m)
      SELECT user_id, strftime(min(ts), '$TSD') AS session_start,
             count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(12,2))) AS VARCHAR) AS total_value
      FROM s GROUP BY user_id, sid
      ORDER BY user_id, session_start"""),
      (s, d) => t(s, d, "events")
        .groupBy(session_window(col("ts"), "1 hour").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(12,2)")).as("total_value"))
        .select(col("user_id"), date_format(col("w.start"), TS).as("session_start"),
          col("n"), col("total_value").cast("string").as("total_value"))
        .orderBy("user_id", "session_start")),

    // A9: per-contact digest rollup — sorted sets + last-k lines
    // folded into one template string (run_ac_extraction.py:1436-1506).
    QDef("q_digest_rollup", Some(digestOracleSql),
      (s, d) => {
        val e = t(s, d, "events").select(col("user_id"), col("event_id"),
          date_format(col("ts"), TS).as("ets"), col("event_type"))
        val last3 = topNPerGroup(e, Seq("user_id"),
          Seq(col("ets").desc, col("event_id").desc), 3)
        val lines = last3
          .withColumn("line", concat(col("ets"), lit(" — "), col("event_type")))
          .groupBy("user_id")
          .agg(array_join(transform(
            array_sort(collect_list(struct(col("ets"), col("event_id"), col("line")))),
            x => x.getField("line")), "\n").as("tail"))
          .withColumnRenamed("user_id", "lu")
        val sets = e.groupBy("user_id").agg(sortedSetAgg(col("event_type")).as("types"))
          .withColumnRenamed("user_id", "su")
        t(s, d, "customer")
          .join(sets, col("c_custkey") === col("su"))
          .join(lines, col("c_custkey") === col("lu"))
          .select(col("c_custkey").as("contact_id"),
            concat(col("c_name"), lit(" ["), col("types"), lit("]\n"), col("tail")).as("digest"))
          .orderBy("contact_id")
      }),

    // A9 (typed form): same digest contract, computed by the bounded
    // O(k)-state typed Aggregator (graft.ops.DigestAgg) instead of
    // collect_list+sort+slice — the scale path for skewed contacts.
    QDef("q_digest_rollup_typed", Some(digestOracleSql),
      (s, d) => {
        import s.implicits._
        val e = t(s, d, "events")
          .select(col("user_id"), col("event_id"),
            date_format(col("ts"), TS).as("ets"), col("event_type"))
          .withColumn("line", concat(col("ets"), lit(" — "), col("event_type")))
        val digests = e.select(col("user_id"),
          struct(col("ets"), col("event_id"), col("event_type"), col("line")).as("ev"))
          .as[(Long, graft.ops.DigestEvent)]
          .groupByKey(_._1).mapValues(_._2)
          .agg(new graft.ops.DigestAgg(3).toColumn)
          .toDF("user_id", "out")
        t(s, d, "customer")
          .join(digests, col("c_custkey") === col("user_id"))
          .select(col("c_custkey").as("contact_id"),
            concat(col("c_name"), lit(" ["), col("out.types"), lit("]\n"),
              col("out.tail")).as("digest"))
          .orderBy("contact_id")
      }),

    // ───────────── remaining §2 names (S2, O3, F10, U2-full) ─────────

    // S2: CSV sink + readback roundtrip (write_csv_utf8sig,
    // run_ac_extraction.py:65-67; the UTF-8-BOM byte is a sink-encoding
    // detail outside the query surface). The oracle checks the written
    // lake reads back value-identical under the all-string contract.
    QDef("q_sink_csv", Some(s"""
      SELECT CAST(c_custkey AS VARCHAR) AS c_custkey, c_name,
             CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS VARCHAR) AS c_acctbal,
             c_mktsegment
      FROM customer ORDER BY CAST(c_custkey AS BIGINT)"""),
      (s, d) => {
        val out = SinkScratch.dir("q_sink_csv", d)
        t(s, d, "customer").select(
          col("c_custkey").cast(StringType).as("c_custkey"),
          col("c_name"),
          col("c_acctbal").cast("decimal(12,2)").cast(StringType).as("c_acctbal"),
          col("c_mktsegment"))
          .write.mode("overwrite").option("header", true).csv(out)
        s.read.option("header", true).csv(out) // no inferSchema → all-string
          .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
          .orderBy(col("c_custkey").cast(LongType))
      }),

    // O3: short-page head — the connector's page-boundary semantics as
    // a batch ordered-limit (run_ac_extraction.py:243-244). o_orderkey
    // is unique in the testdata, so the limit boundary is total-ordered.
    QDef("q_head_page", Some("""
      SELECT o_orderkey, o_custkey, o_orderstatus
      FROM orders ORDER BY o_orderkey LIMIT 100"""),
      (s, d) => t(s, d, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus")
        .orderBy("o_orderkey").limit(100)),

    // F10: case-insensitive column resolution against candidates
    // (pick_col, run_ac_extraction.py:292-301) — schema logic applied
    // to a deliberately case-mangled frame.
    QDef("q_case_insensitive_colpick", Some("""
      SELECT c_custkey AS contact_id, c_name AS contact_name
      FROM customer ORDER BY contact_id"""),
      (s, d) => {
        val mangled = t(s, d, "customer")
          .withColumnRenamed("c_custkey", "C_CustKey")
          .withColumnRenamed("c_name", "C_NAME")
        val cols = mangled.columns.toSeq
        val idCol = graft.ops.Ops.pickCol(cols, Seq("custkey", "contact_id", "c_custkey")).get
        val nameCol = graft.ops.Ops.pickCol(cols, Seq("name", "c_name")).get
        mangled.select(col(idCol).as("contact_id"), col(nameCol).as("contact_name"))
          .orderBy("contact_id")
      }),

    // U2 (full width): 13 heterogeneous sources conformed to the
    // unified event schema and unioned BY NAME with missing columns →
    // NULL (run_ac_extraction.py:1371-1384; branch shapes mirror
    // _as_event_rows' 13 sources each populating a different column
    // subset). Spark side exercises unionByName(allowMissingColumns);
    // the oracle spells out the NULL padding per branch.
    QDef("q_union_conformed_13", Some(s"""
      WITH u AS (
        SELECT 'events:' || event_id AS event_id, user_id AS contact_id,
               'events_click' AS source, CAST(event_id AS VARCHAR) AS source_row_id,
               strftime(ts, '$TSD') AS event_ts, event_type,
               CAST(NULL AS VARCHAR) AS title, CAST(NULL AS VARCHAR) AS detail,
               'https://example.test/events/' || event_id AS url
        FROM events WHERE event_type = 'click'
        UNION ALL
        SELECT 'events:' || event_id, user_id, 'events_view',
               CAST(event_id AS VARCHAR), strftime(ts, '$TSD'), event_type,
               NULL, NULL, NULL
        FROM events WHERE event_type = 'view'
        UNION ALL
        SELECT 'events:' || event_id, user_id, 'events_purchase',
               CAST(event_id AS VARCHAR), strftime(ts, '$TSD'), event_type,
               NULL, CAST(CAST(value AS DECIMAL(12,2)) AS VARCHAR), NULL
        FROM events WHERE event_type = 'purchase'
        UNION ALL
        SELECT 'events:' || event_id, user_id, 'events_signup',
               CAST(event_id AS VARCHAR), strftime(ts, '$TSD'), event_type,
               'welcome', NULL, NULL
        FROM events WHERE event_type = 'signup'
        UNION ALL
        SELECT 'events:' || event_id, user_id, 'events_error',
               CAST(event_id AS VARCHAR), strftime(ts, '$TSD'), event_type,
               NULL, json_extract_string(props, '$$.k'), NULL
        FROM events WHERE event_type = 'error'
        UNION ALL
        SELECT 'orders:' || o_orderkey, o_custkey, 'orders_open',
               CAST(o_orderkey AS VARCHAR), strftime(o_orderdate, '$TSD'), 'order_open',
               o_orderpriority, NULL, NULL
        FROM orders WHERE o_orderstatus = 'O'
        UNION ALL
        SELECT 'orders:' || o_orderkey, o_custkey, 'orders_filled',
               CAST(o_orderkey AS VARCHAR), strftime(o_orderdate, '$TSD'), 'order_filled',
               NULL, CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR), NULL
        FROM orders WHERE o_orderstatus = 'F'
        UNION ALL
        SELECT 'orders:' || o_orderkey, o_custkey, 'orders_pending',
               CAST(o_orderkey AS VARCHAR), strftime(o_orderdate, '$TSD'), 'order_pending',
               o_orderpriority, CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR), NULL
        FROM orders WHERE o_orderstatus = 'P'
        UNION ALL
        SELECT 'lineitem:' || l_orderkey || ':' || l_linenumber, o_custkey, 'lineitem',
               l_orderkey || '-' || l_linenumber, strftime(l_shipdate, '$TSD'), 'shipment',
               'ship ' || l_returnflag || ' ' || l_linestatus,
               CAST(CAST(l_quantity AS DECIMAL(12,2)) AS VARCHAR), NULL
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        UNION ALL
        SELECT 'customer:' || c_custkey, c_custkey, 'customer',
               CAST(c_custkey AS VARCHAR), NULL, 'contact_seed',
               c_name, c_mktsegment, NULL
        FROM customer
        UNION ALL
        SELECT 'supplier:' || s_suppkey, NULL, 'supplier',
               CAST(s_suppkey AS VARCHAR), NULL, 'supplier_onboarded',
               s_name, NULL, NULL
        FROM supplier
        UNION ALL
        SELECT 'part:' || p_partkey, NULL, 'part',
               CAST(p_partkey AS VARCHAR), NULL, 'part_listed',
               p_name, p_brand, NULL
        FROM part
        UNION ALL
        SELECT 'nation:' || n_nationkey, NULL, 'nation',
               CAST(n_nationkey AS VARCHAR), NULL, 'dim_nation_loaded',
               n_name, NULL, NULL
        FROM nation)
      SELECT * FROM u
      ORDER BY source, event_id, source_row_id, event_ts, title, detail"""),
      (s, d) => {
        // The per-type event branches and per-status order branches
        // are CASE-multiplexed over ONE scan each (the reference's
        // _as_event_rows reads every source once): at 100 TB five
        // filtered scans of the biggest fact are five full passes
        // where a single CASE-projected pass does the same work.
        // `when` without `otherwise` yields NULL — exactly the
        // missing-column padding the per-branch unionByName produced.
        // Asserted in ScalePlanSpec: one events scan, two orders scans
        // (the multiplex + the lineitem-resolve join).
        val et = col("event_type")
        val ev = t(s, d, "events")
          .filter(et.isin("click", "view", "purchase", "signup", "error"))
          .select(
            concat_ws(":", lit("events"), col("event_id")).as("event_id"),
            col("user_id").cast("bigint").as("contact_id"),
            concat(lit("events_"), et).as("source"),
            col("event_id").cast(StringType).as("source_row_id"),
            date_format(col("ts"), TS).as("event_ts"),
            et,
            when(et === "signup", lit("welcome")).as("title"),
            when(et === "purchase", col("value").cast("decimal(12,2)").cast(StringType))
              .when(et === "error", get_json_object(col("props"), "$.k")).as("detail"),
            when(et === "click",
              concat_ws("", lit("https://example.test/events/"), col("event_id"))).as("url"))
        val st = col("o_orderstatus")
        val od = t(s, d, "orders")
          .filter(st.isin("O", "F", "P"))
          .select(
            concat_ws(":", lit("orders"), col("o_orderkey")).as("event_id"),
            col("o_custkey").cast("bigint").as("contact_id"),
            decodeMap(st, Seq("O" -> "orders_open", "F" -> "orders_filled",
              "P" -> "orders_pending"), lit(null)).as("source"),
            col("o_orderkey").cast(StringType).as("source_row_id"),
            date_format(col("o_orderdate"), TS).as("event_ts"),
            decodeMap(st, Seq("O" -> "order_open", "F" -> "order_filled",
              "P" -> "order_pending"), lit(null)).as("event_type"),
            when(st =!= "F", col("o_orderpriority")).as("title"),
            when(st =!= "O",
              col("o_totalprice").cast("decimal(12,2)").cast(StringType)).as("detail"))
        val branches = Seq(
          ev,
          od,
          t(s, d, "lineitem")
            .join(t(s, d, "orders").select("o_orderkey", "o_custkey"),
              col("l_orderkey") === col("o_orderkey"))
            .select(
              concat_ws(":", lit("lineitem"), col("l_orderkey"), col("l_linenumber")).as("event_id"),
              col("o_custkey").cast("bigint").as("contact_id"),
              lit("lineitem").as("source"),
              concat_ws("-", col("l_orderkey"), col("l_linenumber")).as("source_row_id"),
              date_format(col("l_shipdate"), TS).as("event_ts"),
              lit("shipment").as("event_type"),
              concat_ws(" ", lit("ship"), col("l_returnflag"), col("l_linestatus")).as("title"),
              col("l_quantity").cast("decimal(12,2)").cast(StringType).as("detail")),
          t(s, d, "customer").select(
            concat_ws(":", lit("customer"), col("c_custkey")).as("event_id"),
            col("c_custkey").cast("bigint").as("contact_id"),
            lit("customer").as("source"),
            col("c_custkey").cast(StringType).as("source_row_id"),
            lit("contact_seed").as("event_type"),
            col("c_name").as("title"),
            col("c_mktsegment").as("detail")),
          t(s, d, "supplier").select(
            concat_ws(":", lit("supplier"), col("s_suppkey")).as("event_id"),
            lit("supplier").as("source"),
            col("s_suppkey").cast(StringType).as("source_row_id"),
            lit("supplier_onboarded").as("event_type"),
            col("s_name").as("title")),
          t(s, d, "part").select(
            concat_ws(":", lit("part"), col("p_partkey")).as("event_id"),
            lit("part").as("source"),
            col("p_partkey").cast(StringType).as("source_row_id"),
            lit("part_listed").as("event_type"),
            col("p_name").as("title"),
            col("p_brand").as("detail")),
          t(s, d, "nation").select(
            concat_ws(":", lit("nation"), col("n_nationkey")).as("event_id"),
            lit("nation").as("source"),
            col("n_nationkey").cast(StringType).as("source_row_id"),
            lit("dim_nation_loaded").as("event_type"),
            col("n_name").as("title")))
        conformedUnion(branches)
          .select("event_id", "contact_id", "source", "source_row_id",
            "event_ts", "event_type", "title", "detail", "url")
          .orderBy("source", "event_id", "source_row_id", "event_ts", "title", "detail")
      }),

    // BLOOM-FILTER SEMI-JOIN (runtime-filter pattern): lineitem rows
    // of URGENT orders, aggregated per returnflag — but the fact side
    // is prefiltered by a Bloom bitset built over the dim keys BEFORE
    // the exact join, so at 100 TB the (1 − sel − fp) non-matching
    // majority dies in the scan stage instead of crossing the shuffle
    // to be dropped by the join. The bitset build is a declarative
    // dim aggregate (map-side-combined bit_or per 64-bit block,
    // graft.functions.Bloom.buildBits) collected as a config-bounded
    // driver literal; the probe is the native codegen'd
    // bloom_might_contain expression. The EXACT semi-join still runs
    // after the prefilter, so false positives never reach the output
    // — the Bloom changes traffic, never the answer, which is why the
    // oracle is the plain semi-join. 16 bits/key, k=6 ⇒ ~0.5% FP.
    QDef("q_bloom_semijoin", Some("""
      SELECT l.l_returnflag,
             CAST(count(*) AS BIGINT) AS n_items,
             CAST(sum(CAST(floor(l.l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
               AS revenue_cents
      FROM lineitem l
      WHERE l.l_orderkey IN (SELECT o_orderkey FROM orders
                             WHERE o_orderpriority = '1-URGENT')
      GROUP BY 1 ORDER BY l.l_returnflag"""),
      (s, d) => {
        val dim = t(s, d, "orders")
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_orderkey"))
        // build: one narrow dim pass; nbits = 16·keys (the second
        // dim pass is dim-sized — at scale, piggyback the count on
        // an earlier stat or size from table metadata)
        val nKeys = dim.count()
        val bits = graft.functions.Bloom.buildBits(
          dim, col("o_orderkey"), math.max(1024L, 16L * nKeys))
        t(s, d, "lineitem")
          .filter(graft.functions.Bloom.mightContain(bits, col("l_orderkey")))
          .join(dim, col("l_orderkey") === col("o_orderkey"), "left_semi")
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n_items"),
            sum(floor(col("l_extendedprice") * lit(100.0) + lit(0.5)).cast("long"))
              .cast("long").as("revenue_cents"))
          .orderBy("l_returnflag")
      }),

    // ORC SINK/SCAN ROUNDTRIP: orders exported to ORC (the OTHER
    // columnar interchange format a lake speaks besides parquet —
    // Spark-native, zlib by default) and read back through a
    // predicate that must reach the ORC reader as a pushed filter,
    // proving the roundtrip preserves both VALUES (cents as BIGINT —
    // lossless) and SCAN ECONOMICS (OrcSinkSpec pins PushedFilters;
    // a format you can write but not selectively re-read is a dead
    // end at 100 TB). Oracle computes the same aggregate straight
    // off parquet: format conversion must be invisible to results.
    QDef("q_sink_orc", Some("""
      SELECT o_orderpriority,
             CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
               AS total_cents
      FROM orders WHERE o_orderstatus = 'O'
      GROUP BY 1 ORDER BY o_orderpriority"""),
      (s, d) => {
        val out = SinkScratch.dir("q_sink_orc", d)
        t(s, d, "orders")
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_orderpriority"),
            floor(col("o_totalprice") * lit(100.0) + lit(0.5)).cast("long").as("cents"))
          .write.mode("overwrite").orc(out)
        s.read.orc(out)
          .filter(col("o_orderstatus") === "O")
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n_orders"),
            sum("cents").cast("long").as("total_cents"))
          .orderBy("o_orderpriority")
      }),

    // GZIP-compressed CSV sink → re-scan roundtrip: the
    // interchange-format path (landing zones and partner feeds ship
    // gzip CSV, not parquet) exercised end to end — write with
    // codec=gzip, read back WITH an explicit schema (no inference
    // scan), aggregate. Compression must be invisible to results
    // (oracle computes the same aggregate off parquet); the explicit
    // read schema is the 100 TB discipline — schema inference costs
    // a full extra pass. NB gzip is non-splittable: fine for
    // partner-feed file sizes, the parquet/orc sinks are the
    // scale-out path.
    QDef("q_sink_csv_gzip", Some("""
      SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_cust,
             CAST(sum(CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
               AS bal_cents
      FROM customer GROUP BY 1 ORDER BY c_mktsegment"""),
      (s, d) => {
        val out = SinkScratch.dir("q_sink_csv_gzip", d)
        t(s, d, "customer")
          .select(col("c_custkey"), col("c_mktsegment"),
            floor(col("c_acctbal") * lit(100.0) + lit(0.5)).cast("long")
              .as("bal_cents"))
          .write.mode("overwrite")
          .option("compression", "gzip").option("header", "true").csv(out)
        s.read.schema("c_custkey LONG, c_mktsegment STRING, bal_cents LONG")
          .option("header", "true").csv(out)
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n_cust"),
            sum("bal_cents").cast("long").as("bal_cents"))
          .orderBy("c_mktsegment")
      }),

    // TPC-H Q7-shape: cross-nation trade volume — the fact joins TWO
    // different dimension paths (supplier→nation and
    // customer←orders←nation) and groups by the nation PAIR × ship
    // year. The shape that matters at 100 TB: every dim chain
    // (supplier, customer, nation×2) broadcasts, so the only
    // shuffle the fact pays is lineitem⋈orders on the order key and
    // the final pair-keyed aggregate. Revenue exactly integral:
    // cents × (1000 − discount‰) = milli-cents, no float product
    // crosses the oracle surface.
    QDef("q_nation_trade_pairs", Some("""
      SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
             CAST(year(l.l_shipdate) AS BIGINT) AS ship_year,
             CAST(count(*) AS BIGINT) AS n_items,
             CAST(sum(CAST(floor(l.l_extendedprice * 100.0 + 0.5) AS BIGINT)
                      * (1000 - CAST(floor(l.l_discount * 1000.0 + 0.5) AS BIGINT)))
               AS BIGINT) AS revenue_milli_cents
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation nc ON c.c_nationkey = nc.n_nationkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation ns ON s.s_nationkey = ns.n_nationkey
      WHERE ns.n_name <> nc.n_name
      GROUP BY 1, 2, 3 ORDER BY supp_nation, cust_nation, ship_year"""),
      (s, d) => {
        val rev = (floor(col("l_extendedprice") * lit(100.0) + lit(0.5)).cast("long")
          * (lit(1000L) - floor(col("l_discount") * lit(1000.0) + lit(0.5)).cast("long")))
        t(s, d, "lineitem")
          .join(t(s, d, "orders").select("o_orderkey", "o_custkey"),
            col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(t(s, d, "customer").select("c_custkey", "c_nationkey")),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(t(s, d, "nation")
            .select(col("n_nationkey").as("nck"), col("n_name").as("cust_nation"))),
            col("c_nationkey") === col("nck"))
          .join(broadcast(t(s, d, "supplier").select("s_suppkey", "s_nationkey")),
            col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(t(s, d, "nation")
            .select(col("n_nationkey").as("nsk"), col("n_name").as("supp_nation"))),
            col("s_nationkey") === col("nsk"))
          .filter(col("supp_nation") =!= col("cust_nation"))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).cast("long").as("ship_year"))
          .agg(count(lit(1)).as("n_items"),
            sum(rev).cast("long").as("revenue_milli_cents"))
          .orderBy("supp_nation", "cust_nation", "ship_year")
      }),

    // TPC-H Q14-shape: promo revenue share by ship month — the
    // conditional-aggregate-over-a-join pattern (one pass computes
    // both the filtered and total mass; a naive consumer would scan
    // twice). part is a broadcast dim; the month aggregate is the
    // only shuffle. Share in permille off exact milli-cents.
    QDef("q_promo_share", Some("""
      SELECT strftime(date_trunc('month', l.l_shipdate), '%Y-%m') AS ship_month,
             CAST(sum(CASE WHEN p.p_type = 'PROMO'
                 THEN CAST(floor(l.l_extendedprice * 100.0 + 0.5) AS BIGINT)
                      * (1000 - CAST(floor(l.l_discount * 1000.0 + 0.5) AS BIGINT))
                 ELSE 0 END) AS BIGINT) AS promo_milli_cents,
             CAST(sum(CAST(floor(l.l_extendedprice * 100.0 + 0.5) AS BIGINT)
                      * (1000 - CAST(floor(l.l_discount * 1000.0 + 0.5) AS BIGINT)))
               AS BIGINT) AS total_milli_cents,
             (1000 * CAST(sum(CASE WHEN p.p_type = 'PROMO'
                 THEN CAST(floor(l.l_extendedprice * 100.0 + 0.5) AS BIGINT)
                      * (1000 - CAST(floor(l.l_discount * 1000.0 + 0.5) AS BIGINT))
                 ELSE 0 END) AS BIGINT))
               // CAST(sum(CAST(floor(l.l_extendedprice * 100.0 + 0.5) AS BIGINT)
                      * (1000 - CAST(floor(l.l_discount * 1000.0 + 0.5) AS BIGINT)))
                   AS BIGINT) AS promo_permille
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1 ORDER BY ship_month"""),
      (s, d) => {
        val rev = (floor(col("l_extendedprice") * lit(100.0) + lit(0.5)).cast("long")
          * (lit(1000L) - floor(col("l_discount") * lit(1000.0) + lit(0.5)).cast("long")))
        t(s, d, "lineitem")
          .join(broadcast(t(s, d, "part").select("p_partkey", "p_type")),
            col("l_partkey") === col("p_partkey"))
          .groupBy(date_format(date_trunc("month", col("l_shipdate")), "yyyy-MM")
            .as("ship_month"))
          .agg(sum(when(col("p_type") === "PROMO", rev).otherwise(0L))
              .cast("long").as("promo_milli_cents"),
            sum(rev).cast("long").as("total_milli_cents"))
          .select(col("ship_month"), col("promo_milli_cents"), col("total_milli_cents"),
            expr("div(1000 * promo_milli_cents, total_milli_cents)").as("promo_permille"))
          .orderBy("ship_month")
      })
  )
}
