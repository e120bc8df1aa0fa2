package graft.queries

import org.apache.spark.sql.functions._
import graft.pipeline.Tables.t

/** Classic warehouse query shapes (TPC-H Q2/Q4/Q11/Q15/Q17/Q18/Q19/
  * Q20/Q22 adapted to the testdata star schema) — the relational
  * stress patterns a reference user's ad-hoc analytics would throw at
  * the engine beyond the reference's own ETL surface
  * (run_ac_extraction.py:1016-1507 is the only big join/agg statement
  * the reference itself ships; these cover the decorrelated-subquery
  * / semi-anti-join / scalar-broadcast shapes it never exercises).
  *
  * Shared discipline with the rest of the inventory: money exactly
  * integral as cents (`floor(x*100+0.5)` BIGINT) before any
  * aggregate, total-order `ORDER BY` with unique tiebreaks, no float
  * crosses the oracle surface. Scale notes per query — the common
  * theme is that every correlated subquery is decorrelated into
  * either a 1-row broadcast scalar, a dim-sized broadcast, or a
  * co-partitioned self-keyed aggregate join (the fact never joins
  * the fact on a new key).
  */
object RelQueries {

  val all: Seq[QDef] = Seq(

    // TPC-H Q4-shape: EXISTS decorrelated to a LEFT SEMI join. The
    // correlation condition (l_shipdate > o_orderdate + 60 days)
    // references both sides, so it rides the join condition; both
    // sides shuffle once on the order key and the semi join emits
    // each order at most once — no DISTINCT pass, no fan-out.
    QDef("q_exists_late_ship", Some("""
      SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_late_orders
      FROM orders o
      WHERE EXISTS (SELECT 1 FROM lineitem l
                    WHERE l.l_orderkey = o.o_orderkey
                      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
      GROUP BY 1 ORDER BY o_orderpriority"""),
      (s, d) => {
        t(s, d, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
          .join(t(s, d, "lineitem").select("l_orderkey", "l_shipdate"),
            col("l_orderkey") === col("o_orderkey") &&
              col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
            "left_semi")
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n_late_orders"))
          .orderBy("o_orderpriority")
      }),

    // TPC-H Q2-shape: "the supplier with the minimum offer per part"
    // — the correlated MIN subquery decorrelated to one rank-1 window
    // over a (part, supplier) aggregate. The part subset filter
    // (p_size ≥ 45, 259/2000 parts) is applied via broadcast join
    // BEFORE the fact aggregates, so the agg input is pre-pruned —
    // at 100 TB the scan emits ~13% of rows into the shuffle.
    // Deterministic: ties on offer_cents break by s_suppkey.
    QDef("q_min_offer_supplier", Some("""
      WITH offers AS (
        SELECT l.l_partkey, l.l_suppkey,
               min(CAST(floor(l.l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS offer_cents
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE p.p_size >= 45
        GROUP BY 1, 2)
      SELECT o.l_partkey AS p_partkey, s.s_name, o.offer_cents
      FROM offers o JOIN supplier s ON o.l_suppkey = s.s_suppkey
      QUALIFY row_number() OVER (PARTITION BY o.l_partkey
                                 ORDER BY o.offer_cents, o.l_suppkey) = 1
      ORDER BY p_partkey"""),
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val offers = t(s, d, "lineitem")
          .select("l_partkey", "l_suppkey", "l_extendedprice")
          .join(broadcast(t(s, d, "part").filter(col("p_size") >= 45)
            .select("p_partkey")), col("l_partkey") === col("p_partkey"))
          .groupBy("l_partkey", "l_suppkey")
          .agg(min(floor(col("l_extendedprice") * lit(100.0) + lit(0.5)).cast("long"))
            .as("offer_cents"))
        offers
          .withColumn("rn", row_number().over(Window.partitionBy("l_partkey")
            .orderBy(col("offer_cents"), col("l_suppkey"))))
          .filter(col("rn") === 1)
          .join(broadcast(t(s, d, "supplier").select("s_suppkey", "s_name")),
            col("l_suppkey") === col("s_suppkey"))
          .select(col("l_partkey").as("p_partkey"), col("s_name"), col("offer_cents"))
          .orderBy("p_partkey")
      }),

    // TPC-H Q11-shape: GROUP BY + HAVING against a scalar subquery
    // over the SAME aggregate. The per-part revenue rollup is
    // computed once; its grand total re-aggregates the |parts|-sized
    // result to ONE row that broadcasts back as a cross join — the
    // fact is scanned and shuffled exactly once, and the "subquery"
    // costs one dim-sized pass. Threshold in ppm (700) because with
    // 2000 parts the mean share is 500 ppm — permille would select
    // nothing; integer ppm keeps the predicate exact.
    QDef("q_part_revenue_share", Some("""
      WITH pr AS (
        SELECT l_partkey,
               sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS rev_cents
        FROM lineitem GROUP BY 1),
      tot AS (SELECT sum(rev_cents) AS tot_cents FROM pr)
      SELECT pr.l_partkey, CAST(pr.rev_cents AS BIGINT) AS rev_cents,
             CAST((1000000 * pr.rev_cents) // tot.tot_cents AS BIGINT) AS share_ppm
      FROM pr, tot
      WHERE 1000000 * pr.rev_cents > 700 * tot.tot_cents
      ORDER BY rev_cents DESC, l_partkey"""),
      (s, d) => {
        val pr = t(s, d, "lineitem")
          .groupBy("l_partkey")
          .agg(sum(floor(col("l_extendedprice") * lit(100.0) + lit(0.5)).cast("long"))
            .cast("long").as("rev_cents"))
        pr.crossJoin(broadcast(pr.agg(sum("rev_cents").cast("long").as("tot_cents"))))
          .filter(lit(1000000L) * col("rev_cents") > lit(700L) * col("tot_cents"))
          .select(col("l_partkey"), col("rev_cents"),
            expr("div(1000000 * rev_cents, tot_cents)").as("share_ppm"))
          .orderBy(col("rev_cents").desc, col("l_partkey"))
      }),

    // TPC-H Q15-shape: the revenue-view max — supplier(s) whose
    // windowed revenue equals the global maximum. The MAX "subquery"
    // is a 1-row re-aggregate of the |suppliers|-sized rollup,
    // broadcast back; the half-year ship-date filter is pushed to the
    // parquet scan. Emits ALL tied suppliers (none on this data, but
    // the shape must not pick arbitrarily) ordered by key.
    QDef("q_top_supplier_window", Some("""
      WITH sr AS (
        SELECT l_suppkey,
               sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS rev_cents
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1998-01-01'
          AND l_shipdate <  TIMESTAMP '1998-07-01'
        GROUP BY 1)
      SELECT s.s_suppkey, s.s_name, CAST(sr.rev_cents AS BIGINT) AS rev_cents
      FROM sr JOIN supplier s ON sr.l_suppkey = s.s_suppkey
      WHERE sr.rev_cents = (SELECT max(rev_cents) FROM sr)
      ORDER BY s_suppkey"""),
      (s, d) => {
        val sr = t(s, d, "lineitem")
          .filter(col("l_shipdate") >= lit("1998-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-07-01").cast("timestamp"))
          .groupBy("l_suppkey")
          .agg(sum(floor(col("l_extendedprice") * lit(100.0) + lit(0.5)).cast("long"))
            .cast("long").as("rev_cents"))
        sr.crossJoin(broadcast(sr.agg(max("rev_cents").as("max_cents"))))
          .filter(col("rev_cents") === col("max_cents"))
          .join(broadcast(t(s, d, "supplier").select("s_suppkey", "s_name")),
            col("l_suppkey") === col("s_suppkey"))
          .select("s_suppkey", "s_name", "rev_cents")
          .orderBy("s_suppkey")
      }),

    // TPC-H Q17-shape: the correlated-average subquery ("rows with
    // quantity below 20% of their part's average") decorrelated to a
    // per-part (n, Σqty) aggregate joined BACK to the fact on the
    // same key. The aggregate is |parts|-bounded, so at this SF
    // Catalyst broadcasts it (the fact never shuffles for the join);
    // past the broadcast cap both sides hash-partition on l_partkey
    // and the join still adds no third shuffle — either regime is
    // the plan you'd want. The average itself never materializes:
    // the predicate cross-multiplies (5·n·qty < Σqty ⟺ qty < Σ/(5n))
    // so the comparison is pure BIGINT. Quantities are integral by
    // data contract (1..50); CAST, not floor-round.
    QDef("q_small_qty_revenue", Some("""
      WITH pa AS (
        SELECT l_partkey, count(*) AS n, sum(CAST(l_quantity AS BIGINT)) AS sq
        FROM lineitem GROUP BY 1)
      SELECT p.p_brand,
             CAST(count(*) AS BIGINT) AS n_small,
             CAST(sum(CAST(floor(l.l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
               AS rev_cents
      FROM lineitem l
      JOIN pa ON l.l_partkey = pa.l_partkey
      JOIN part p ON l.l_partkey = p.p_partkey
      WHERE 5 * pa.n * CAST(l.l_quantity AS BIGINT) < pa.sq
      GROUP BY 1 ORDER BY p_brand"""),
      (s, d) => {
        val pa = t(s, d, "lineitem")
          .groupBy(col("l_partkey").as("pa_partkey"))
          .agg(count(lit(1)).as("n"), sum(col("l_quantity").cast("long")).as("sq"))
        t(s, d, "lineitem").select("l_partkey", "l_quantity", "l_extendedprice")
          .join(pa, col("l_partkey") === col("pa_partkey"))
          .filter(lit(5L) * col("n") * col("l_quantity").cast("long") < col("sq"))
          .join(broadcast(t(s, d, "part").select("p_partkey", "p_brand")),
            col("l_partkey") === col("p_partkey"))
          .groupBy("p_brand")
          .agg(count(lit(1)).as("n_small"),
            sum(floor(col("l_extendedprice") * lit(100.0) + lit(0.5)).cast("long"))
              .cast("long").as("rev_cents"))
          .orderBy("p_brand")
      }),

    // TPC-H Q18-shape: HAVING on a fact rollup, survivors joined back
    // to their order/customer context. The quantity rollup and the
    // orders join share the order key, and the HAVING (Σqty > 250,
    // ~1.4% of orders) prunes before any wide row is built; customer
    // is a broadcast dim. Date rendered as a string so both engines
    // agree byte-for-byte.
    QDef("q_big_orders", Some("""
      WITH oq AS (
        SELECT l_orderkey, sum(CAST(l_quantity AS BIGINT)) AS total_qty
        FROM lineitem GROUP BY 1 HAVING sum(CAST(l_quantity AS BIGINT)) > 250)
      SELECT c.c_name, o.o_orderkey, strftime(o.o_orderdate, '%Y-%m-%d') AS order_day,
             CAST(oq.total_qty AS BIGINT) AS total_qty
      FROM oq
      JOIN orders o ON oq.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      ORDER BY total_qty DESC, o_orderkey"""),
      (s, d) => {
        t(s, d, "lineitem")
          .groupBy("l_orderkey")
          .agg(sum(col("l_quantity").cast("long")).as("total_qty"))
          .filter(col("total_qty") > 250L)
          .join(t(s, d, "orders").select("o_orderkey", "o_custkey", "o_orderdate"),
            col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(t(s, d, "customer").select("c_custkey", "c_name")),
            col("o_custkey") === col("c_custkey"))
          .select(col("c_name"), col("o_orderkey"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_day"),
            col("total_qty"))
          .orderBy(col("total_qty").desc, col("o_orderkey"))
      }),

    // TPC-H Q19-shape: the disjunction-of-conjunction-blocks
    // predicate spanning the fact⋈dim join. Catalyst extracts the
    // common l_quantity ≤/≥ envelope? No — OR-blocks mixing sides
    // can't split, which is exactly the point of the shape: the
    // engine must evaluate the residual disjunction post-join without
    // falling out of codegen (part broadcasts, so the whole
    // join+filter+agg is one WholeStageCodegen over the scan).
    // One summary row: no ORDER BY needed.
    QDef("q_disjunctive_filter", Some("""
      SELECT CAST(count(*) AS BIGINT) AS n_items,
             CAST(sum(CAST(floor(l.l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
               AS rev_cents
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE (p.p_brand = 'Brand#11' AND p.p_size BETWEEN 1 AND 15
             AND l.l_quantity <= 20.0)
         OR (p.p_brand = 'Brand#22' AND p.p_size BETWEEN 10 AND 30
             AND l.l_quantity BETWEEN 10.0 AND 35.0)
         OR (p.p_brand = 'Brand#33' AND p.p_size BETWEEN 20 AND 50
             AND l.l_quantity >= 25.0)"""),
      (s, d) => {
        t(s, d, "lineitem").select("l_partkey", "l_quantity", "l_extendedprice")
          .join(broadcast(t(s, d, "part").select("p_partkey", "p_brand", "p_size")),
            col("l_partkey") === col("p_partkey"))
          .filter(
            (col("p_brand") === "Brand#11" && col("p_size").between(1, 15) &&
              col("l_quantity") <= 20.0) ||
            (col("p_brand") === "Brand#22" && col("p_size").between(10, 30) &&
              col("l_quantity").between(10.0, 35.0)) ||
            (col("p_brand") === "Brand#33" && col("p_size").between(20, 50) &&
              col("l_quantity") >= 25.0))
          .agg(count(lit(1)).as("n_items"),
            sum(floor(col("l_extendedprice") * lit(100.0) + lit(0.5)).cast("long"))
              .cast("long").as("rev_cents"))
      }),

    // TPC-H Q20-shape: the nested-semi-join chain ("suppliers who
    // shipped a lot of a product class") — part-type filter broadcast
    // into the fact scan, year filter pushed, per-supplier rollup,
    // threshold, then the survivor KEY SET (≤|suppliers|) drives the
    // dim lookups. At 100 TB the only fact shuffle is the
    // per-supplier aggregate; everything after operates on ≤100 rows.
    QDef("q_nested_semi_suppliers", Some("""
      WITH sq AS (
        SELECT l.l_suppkey, sum(CAST(l.l_quantity AS BIGINT)) AS promo_qty
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE p.p_type = 'PROMO' AND year(l.l_shipdate) = 1997
        GROUP BY 1 HAVING sum(CAST(l.l_quantity AS BIGINT)) > 400)
      SELECT s.s_suppkey, s.s_name, n.n_name, CAST(sq.promo_qty AS BIGINT) AS promo_qty
      FROM sq
      JOIN supplier s ON sq.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      ORDER BY promo_qty DESC, s_suppkey"""),
      (s, d) => {
        t(s, d, "lineitem")
          .filter(year(col("l_shipdate")) === 1997)
          .select("l_partkey", "l_suppkey", "l_quantity")
          .join(broadcast(t(s, d, "part").filter(col("p_type") === "PROMO")
            .select("p_partkey")), col("l_partkey") === col("p_partkey"))
          .groupBy("l_suppkey")
          .agg(sum(col("l_quantity").cast("long")).as("promo_qty"))
          .filter(col("promo_qty") > 400L)
          .join(broadcast(t(s, d, "supplier")
            .select("s_suppkey", "s_name", "s_nationkey")),
            col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(t(s, d, "nation").select("n_nationkey", "n_name")),
            col("s_nationkey") === col("n_nationkey"))
          .select("s_suppkey", "s_name", "n_name", "promo_qty")
          .orderBy(col("promo_qty").desc, col("s_suppkey"))
      }),

    // TPC-H Q22-shape: scalar-average gate + NOT EXISTS anti join —
    // "rich but lapsed" customers (balance above the positive-balance
    // mean, no order since 2000). The scalar is a 1-row broadcast of
    // exact integer division; the NOT EXISTS decorrelates to a LEFT
    // ANTI against the DISTINCT recent-buyer key set, which is
    // bounded by |customers| no matter how big orders grows — the
    // anti join's build side is the small one by construction.
    QDef("q_lapsed_rich_customers", Some("""
      WITH avgb AS (
        SELECT (sum(CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT)) // count(*)) AS avg_cents
        FROM customer WHERE c_acctbal > 0.0),
      recent AS (
        SELECT DISTINCT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '2000-01-01')
      SELECT c.c_mktsegment,
             CAST(count(*) AS BIGINT) AS n_cust,
             CAST(sum(CAST(floor(c.c_acctbal * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
               AS bal_cents
      FROM customer c, avgb
      WHERE CAST(floor(c.c_acctbal * 100.0 + 0.5) AS BIGINT) > avgb.avg_cents
        AND NOT EXISTS (SELECT 1 FROM recent r WHERE r.o_custkey = c.c_custkey)
      GROUP BY 1 ORDER BY c_mktsegment"""),
      (s, d) => {
        val cents = floor(col("c_acctbal") * lit(100.0) + lit(0.5)).cast("long")
        val avgb = t(s, d, "customer").filter(col("c_acctbal") > 0.0)
          .agg(expr("div(sum(cast(floor(c_acctbal * 100.0 + 0.5) as long)), count(*))")
            .as("avg_cents"))
        val recent = t(s, d, "orders")
          .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
          .select("o_custkey").distinct()
        t(s, d, "customer")
          .crossJoin(broadcast(avgb))
          .filter(cents > col("avg_cents"))
          .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n_cust"), sum(cents).cast("long").as("bal_cents"))
          .orderBy("c_mktsegment")
      }),

    // BUCKETED CO-LOCATED JOIN: both fact sides written ONCE as
    // 8-bucket tables hash-clustered + sorted on the order key, then
    // sort-merge-joined with ZERO shuffle exchanges on either input
    // (RelQueriesSpec pins it: the only Exchange in the plan is the
    // final priority aggregate's). This is THE 100 TB pattern for a
    // join repeated every run — pay the cluster-by once at ingest,
    // never re-shuffle the fact again; the `merge` hint keeps the
    // demo honest by declining the broadcast Catalyst would pick on
    // toy-sized orders. Scratch external tables (SinkScratch, swept
    // at JVM exit) with per-dataset names so sf dirs never collide;
    // the oracle replays the same join+agg straight off parquet —
    // layout must be invisible to results.
    QDef("q_join_bucketed", Some("""
      SELECT o.o_orderpriority,
             CAST(count(*) AS BIGINT) AS n_items,
             CAST(sum(CAST(floor(l.l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
               AS rev_cents
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY 1 ORDER BY o_orderpriority"""),
      (s, d) => {
        val tag = math.abs(d.hashCode).toHexString
        val (liT, oT) = (s"graft_bkt_li_$tag", s"graft_bkt_o_$tag")
        t(s, d, "lineitem")
          .select(col("l_orderkey"),
            floor(col("l_extendedprice") * lit(100.0) + lit(0.5)).cast("long")
              .as("cents"))
          .write.mode("overwrite")
          .option("path", SinkScratch.dir(liT, d))
          .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
          .saveAsTable(liT)
        t(s, d, "orders").select("o_orderkey", "o_orderpriority")
          .write.mode("overwrite")
          .option("path", SinkScratch.dir(oT, d))
          .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
          .saveAsTable(oT)
        s.table(liT).hint("merge")
          .join(s.table(oT), col("l_orderkey") === col("o_orderkey"))
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n_items"),
            sum("cents").cast("long").as("rev_cents"))
          .orderBy("o_orderpriority")
      }),

    // DATE DIMENSION BUILD: the calendar spine every star schema
    // joins through, generated from the fact's own [min, max] order
    // date — one row per day with year/quarter/month plus
    // BORN-INTEGER week attributes: dow = ((dnum+3) mod 7)+1
    // (Monday=1 — 1970-01-01 anchors Thursday, no locale, no engine
    // dayofweek convention) and week_num = (dnum+3) div 7 (weeks
    // since the 1969-12-29 Monday — an ISO-week stand-in that never
    // hits the cross-engine YEAROFWEEK boundary trap). Plan: a 1-row
    // span aggregate explodes into the |days| grid — the fact is
    // scanned once for its bounds and never again.
    QDef("q_date_dim", Some("""
      WITH b AS (SELECT epoch_us(min(date_trunc('day', o_orderdate))) // 86400000000 AS lo,
                        epoch_us(max(date_trunc('day', o_orderdate))) // 86400000000 AS hi
                 FROM orders),
      d AS (SELECT g.dnum FROM b, UNNEST(range(b.lo, b.hi + 1)) AS g(dnum)),
      e AS (SELECT dnum, DATE '1970-01-01' + CAST(dnum AS INT) AS day FROM d)
      SELECT strftime(day, '%Y-%m-%d') AS day,
             CAST(dnum AS BIGINT) AS dnum,
             CAST(year(day) AS BIGINT) AS y,
             CAST(quarter(day) AS BIGINT) AS q,
             CAST(month(day) AS BIGINT) AS m,
             CAST((dnum + 3) % 7 + 1 AS BIGINT) AS dow,
             CAST((dnum + 3) // 7 AS BIGINT) AS week_num,
             CASE WHEN (dnum + 3) % 7 + 1 >= 6 THEN 1 ELSE 0 END AS is_weekend
      FROM e ORDER BY dnum"""),
      (s, d) => {
        val b = t(s, d, "orders").agg(
          expr("div(unix_micros(min(date_trunc('day', o_orderdate))), 86400000000)")
            .as("lo"),
          expr("div(unix_micros(max(date_trunc('day', o_orderdate))), 86400000000)")
            .as("hi"))
        b.select(explode(expr("sequence(lo, hi)")).as("dnum"))
          .withColumn("day", expr("date_add(date '1970-01-01', cast(dnum as int))"))
          .select(
            date_format(col("day"), "yyyy-MM-dd").as("day"),
            col("dnum"),
            year(col("day")).cast("long").as("y"),
            quarter(col("day")).cast("long").as("q"),
            month(col("day")).cast("long").as("m"),
            (expr("(dnum + 3) % 7") + lit(1L)).as("dow"),
            expr("div(dnum + 3, 7)").as("week_num"),
            when(expr("(dnum + 3) % 7") + lit(1L) >= 6, 1L).otherwise(0L)
              .as("is_weekend"))
          .orderBy("dnum")
      }),

    // CDC MERGE APPLY (the lakehouse MERGE INTO, as a plan): a
    // change feed of upserts + deletes applied to a snapshot in ONE
    // key-to-key FULL OUTER join — update where both sides match,
    // insert where only the delta has the key, delete drops the row,
    // untouched rows pass through tagged 'kept'. The feed is derived
    // deterministically from the snapshot itself (key residues:
    // %10∈{0,1,2}→update +500, 3→delete, 4→insert under a shifted
    // key), so every action path is exercised (9000/4500/1500/1500
    // at sf0.01). Scale shape is q_agg_incremental_merge's: both
    // sides hash-partition on the SAME key, history is never
    // rescanned beyond the one join, and the anti-delete is a filter
    // on the join result, not a second pass. Three-valued-logic trap
    // spelled explicitly: the delete filter is `op IS NULL OR op <>
    // 'D'` — a bare NOT(op='D' AND …) silently drops every kept row.
    QDef("q_merge_upsert", Some("""
      WITH snap AS (SELECT o_orderkey AS k,
                           CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
                    FROM orders),
      delta AS (
        SELECT CASE WHEN o_orderkey % 10 = 4 THEN o_orderkey + 10000000
                    ELSE o_orderkey END AS k,
               CASE WHEN o_orderkey % 10 = 3 THEN 'D' ELSE 'U' END AS op,
               CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) + 500 AS cents
        FROM orders WHERE o_orderkey % 10 IN (0, 1, 2, 3, 4)),
      m AS (SELECT coalesce(s.k, d.k) AS k, s.cents AS sc, d.op, d.cents AS dc
            FROM snap s FULL OUTER JOIN delta d ON s.k = d.k)
      SELECT k AS okey,
             CASE WHEN op = 'U' THEN dc ELSE sc END AS cents,
             CASE WHEN op IS NULL THEN 'kept'
                  WHEN op = 'U' AND sc IS NOT NULL THEN 'updated'
                  ELSE 'inserted' END AS action
      FROM m WHERE op IS NULL OR op <> 'D'
      ORDER BY okey"""),
      (s, d) => {
        val cents = floor(col("o_totalprice") * lit(100.0) + lit(0.5)).cast("long")
        val snap = t(s, d, "orders").select(col("o_orderkey").as("k"),
          cents.as("sc"))
        val delta = t(s, d, "orders")
          .filter(col("o_orderkey") % 10 <= 4)
          .select(
            when(col("o_orderkey") % 10 === 4, col("o_orderkey") + 10000000L)
              .otherwise(col("o_orderkey")).as("dk"),
            when(col("o_orderkey") % 10 === 3, "D").otherwise("U").as("op"),
            (cents + lit(500L)).as("dc"))
        snap.join(delta, col("k") === col("dk"), "full_outer")
          .filter(col("op").isNull || col("op") =!= "D")
          .select(coalesce(col("k"), col("dk")).as("okey"),
            when(col("op") === "U", col("dc")).otherwise(col("sc")).as("cents"),
            when(col("op").isNull, "kept")
              .when(col("op") === "U" && col("sc").isNotNull, "updated")
              .otherwise("inserted").as("action"))
          .orderBy("okey")
      }),

    // TPC-H Q6-shape: the pure scan-side aggregate — a conjunctive
    // date/discount/quantity predicate and ONE summary row, no join
    // anywhere. The poster child for pushdown economics: every
    // predicate lands in the parquet scan's PushedFilters and the
    // whole query is scan→filter→partial-agg→1-row exchange; at
    // 100 TB this query's cost is IO after row-group pruning,
    // nothing else.
    QDef("q_filtered_scan_revenue", Some("""
      SELECT CAST(count(*) AS BIGINT) AS n_items,
             CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
               AS rev_cents
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
        AND l_discount BETWEEN 0.05 AND 0.07
        AND l_quantity < 24.0"""),
      (s, d) =>
        t(s, d, "lineitem")
          .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
            col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24.0)
          .agg(count(lit(1)).as("n_items"),
            sum(floor(col("l_extendedprice") * lit(100.0) + lit(0.5)).cast("long"))
              .cast("long").as("rev_cents"))),

    // TPC-H Q10-shape: returned-revenue customer ranking — the
    // "who's returning merchandise" churn screen. The returnflag
    // filter pushes into the fact scan BEFORE the joins (~⅓ of
    // rows), orders joins on the order key, customer + nation
    // broadcast, and the top-20 is TakeOrderedAndProject (no global
    // sort materializes).
    QDef("q_returned_top_customers", Some("""
      SELECT c.c_custkey, c.c_name, n.n_name,
             CAST(count(*) AS BIGINT) AS n_items,
             CAST(sum(CAST(floor(l.l_extendedprice * 100.0 + 0.5) AS BIGINT)
                      * (1000 - CAST(floor(l.l_discount * 1000.0 + 0.5) AS BIGINT)))
               AS BIGINT) AS lost_milli_cents
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      WHERE l.l_returnflag = 'R'
      GROUP BY 1, 2, 3
      ORDER BY lost_milli_cents DESC, c_custkey LIMIT 20"""),
      (s, d) => {
        val rev = (floor(col("l_extendedprice") * lit(100.0) + lit(0.5)).cast("long")
          * (lit(1000L) - floor(col("l_discount") * lit(1000.0) + lit(0.5)).cast("long")))
        t(s, d, "lineitem").filter(col("l_returnflag") === "R")
          .join(t(s, d, "orders").select("o_orderkey", "o_custkey"),
            col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(t(s, d, "customer")
            .select("c_custkey", "c_name", "c_nationkey")),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(t(s, d, "nation").select("n_nationkey", "n_name")),
            col("c_nationkey") === col("n_nationkey"))
          .groupBy("c_custkey", "c_name", "n_name")
          .agg(count(lit(1)).as("n_items"),
            sum(rev).cast("long").as("lost_milli_cents"))
          .orderBy(col("lost_milli_cents").desc, col("c_custkey"))
          .limit(20)
      }),

    // TPC-H Q12-shape: the two-way conditional aggregate over a
    // join — per return flag, line counts split by order-priority
    // class (critical vs not) in ONE pass. No second scan, no
    // pivot machinery: two sum(CASE)s share the row stream.
    QDef("q_priority_class_lines", Some("""
      SELECT l.l_returnflag,
             CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                           THEN 1 ELSE 0 END) AS BIGINT) AS high_lines,
             CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                           THEN 0 ELSE 1 END) AS BIGINT) AS low_lines
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY 1 ORDER BY l_returnflag"""),
      (s, d) => {
        val isHigh = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        t(s, d, "lineitem").select("l_orderkey", "l_returnflag")
          .join(t(s, d, "orders").select("o_orderkey", "o_orderpriority"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy("l_returnflag")
          .agg(sum(when(isHigh, 1L).otherwise(0L)).cast("long").as("high_lines"),
            sum(when(isHigh, 0L).otherwise(1L)).cast("long").as("low_lines"))
          .orderBy("l_returnflag")
      }),

    // TPC-H Q13-shape: the distribution-of-counts double aggregate —
    // orders per customer, then customers per order-count (the
    // engagement histogram whose mode says what a "normal" customer
    // looks like). LEFT OUTER keeps zero-order customers honest (the
    // count(order_key) vs count(*) distinction matters: NULL fan-in
    // counts 0, not 1). First agg shuffles on customer, second on
    // the count — both partial-aggregated map-side.
    QDef("q_cust_order_histogram", Some("""
      WITH co AS (SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
                  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                  GROUP BY 1)
      SELECT n_orders, CAST(count(*) AS BIGINT) AS n_customers
      FROM co GROUP BY 1 ORDER BY n_orders"""),
      (s, d) =>
        t(s, d, "customer").select("c_custkey")
          .join(t(s, d, "orders").select("o_orderkey", "o_custkey"),
            col("c_custkey") === col("o_custkey"), "left")
          .groupBy("c_custkey")
          .agg(count(col("o_orderkey")).as("n_orders"))
          .groupBy("n_orders")
          .agg(count(lit(1)).as("n_customers"))
          .orderBy("n_orders")),

    // SKETCH-ALGEBRA INTERSECTION: |A ∩ B| for two customer cohorts
    // estimated by inclusion–exclusion over MERGEABLE HLL sketches
    // (est_A + est_B − est_A∪B) — the q_hll_merge contract extended
    // from union to intersection, which is how sketch stores answer
    // overlap questions without ever co-scanning the cohorts. The
    // estimate is engine-specific, so the oracle-checked surface is
    // the exact counts plus a bound flag asserted 1 (I-E compounds
    // three 3σ≈5% terms → gate at 15% of the union). Each cohort is
    // one filtered sketch aggregate; the exact side is the
    // verification harness, not the production path.
    QDef("q_sketch_intersection", Some("""
      WITH a AS (SELECT DISTINCT o_custkey FROM orders
                 WHERE o_orderpriority = '1-URGENT'),
      b AS (SELECT DISTINCT o_custkey FROM orders
            WHERE o_orderpriority = '5-LOW')
      SELECT (SELECT count(*) FROM a) AS exact_a,
             (SELECT count(*) FROM b) AS exact_b,
             (SELECT count(*) FROM a JOIN b USING (o_custkey)) AS exact_int,
             (SELECT count(*) FROM (SELECT * FROM a UNION SELECT * FROM b))
               AS exact_union,
             CAST(1 AS INTEGER) AS within_bound"""),
      (s, d) => {
        val o = t(s, d, "orders")
        def cohort(p: String) = o.filter(col("o_orderpriority") === p)
          .select("o_custkey")
        val skA = cohort("1-URGENT")
          .agg(hll_sketch_agg(col("o_custkey"), 12).as("sk"),
            countDistinct("o_custkey").as("exact_a"))
        val skB = cohort("5-LOW")
          .agg(hll_sketch_agg(col("o_custkey"), 12).as("skb"),
            countDistinct("o_custkey").as("exact_b"))
        val exact = cohort("1-URGENT").distinct()
          .join(cohort("5-LOW").distinct(), "o_custkey")
          .agg(count(lit(1)).as("exact_int"))
          .crossJoin(cohort("1-URGENT").union(cohort("5-LOW")).distinct()
            .agg(count(lit(1)).as("exact_union")))
        skA.crossJoin(skB).crossJoin(broadcast(exact))
          .select(col("exact_a"), col("exact_b"), col("exact_int"),
            col("exact_union"),
            (abs(hll_sketch_estimate(col("sk")) +
              hll_sketch_estimate(col("skb")) -
              hll_sketch_estimate(hll_union(col("sk"), col("skb"))) -
              col("exact_int")) <= lit(0.15) * col("exact_union"))
              .cast("int").as("within_bound"))
      }),

    // MALFORMED-ROW QUARANTINE AT INGEST: a CSV feed with a known
    // corruption pattern (every 50th key's numeric field garbled)
    // read under PERMISSIVE mode with a corrupt-record column — bad
    // rows are QUARANTINED and counted, never dropped silently and
    // never allowed to poison the aggregate (the batch face of the
    // reference's tolerate-and-continue source posture,
    // run_ac_extraction.py:374-382). The corruption is deterministic,
    // so the oracle reconstructs both populations logically from
    // orders — the CSV is scratch transport. Scale: the parse +
    // quarantine split is a projection inside the scan; no
    // second pass over the file.
    QDef("q_csv_quarantine", Some("""
      SELECT CAST(count(CASE WHEN o_orderkey % 50 <> 0 THEN 1 END) AS BIGINT)
               AS n_clean,
             CAST(count(CASE WHEN o_orderkey % 50 = 0 THEN 1 END) AS BIGINT)
               AS n_quarantined,
             CAST(sum(CASE WHEN o_orderkey % 50 <> 0
                      THEN CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)
                      END) AS BIGINT) AS clean_cents
      FROM orders"""),
      (s, d) => {
        import org.apache.spark.sql.types._
        val out = SinkScratch.dir("q_csv_quarantine", d)
        t(s, d, "orders")
          .select(concat_ws(",",
            col("o_orderkey").cast("string"),
            col("o_orderstatus"),
            // the garbled field must be one the consumer actually
            // reads: Spark's CSV parser prunes unreferenced columns,
            // and an unparsed field can't be detected as corrupt
            when(col("o_orderkey") % 50 === 0,
              concat(lit("BAD"),
                floor(col("o_totalprice") * lit(100.0) + lit(0.5)).cast("long")))
              .otherwise(floor(col("o_totalprice") * lit(100.0) + lit(0.5))
                .cast("long").cast("string"))).as("value"))
          .write.mode("overwrite").text(out)
        val schema = StructType(Seq(
          StructField("okey", LongType), StructField("status", StringType),
          StructField("cents", LongType),
          StructField("_bad", StringType)))
        s.read.schema(schema)
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_bad")
          .csv(out)
          .agg(count(when(col("_bad").isNull, 1)).as("n_clean"),
            count(when(col("_bad").isNotNull, 1)).as("n_quarantined"),
            sum(when(col("_bad").isNull, col("cents"))).cast("long")
              .as("clean_cents"))
      }),

    // TPC-H Q8-shape: market share — one nation's slice of a
    // region's revenue per ship year, numerator and denominator from
    // the SAME single pass (conditional aggregate; a naive consumer
    // runs the region query twice). The region membership filter
    // broadcasts into the fact via the supplier→nation→region chain;
    // share is exact integer permille of milli-cents.
    QDef("q_market_share", Some("""
      SELECT CAST(year(l.l_shipdate) AS BIGINT) AS ship_year,
             CAST(sum(CASE WHEN n.n_name = 'NATION_2'
                 THEN CAST(floor(l.l_extendedprice * 100.0 + 0.5) AS BIGINT)
                      * (1000 - CAST(floor(l.l_discount * 1000.0 + 0.5) AS BIGINT))
                 ELSE 0 END) AS BIGINT) AS nation_milli_cents,
             CAST(sum(CAST(floor(l.l_extendedprice * 100.0 + 0.5) AS BIGINT)
                      * (1000 - CAST(floor(l.l_discount * 1000.0 + 0.5) AS BIGINT)))
               AS BIGINT) AS region_milli_cents,
             CAST((1000 * sum(CASE WHEN n.n_name = 'NATION_2'
                 THEN CAST(floor(l.l_extendedprice * 100.0 + 0.5) AS BIGINT)
                      * (1000 - CAST(floor(l.l_discount * 1000.0 + 0.5) AS BIGINT))
                 ELSE 0 END))
               // sum(CAST(floor(l.l_extendedprice * 100.0 + 0.5) AS BIGINT)
                   * (1000 - CAST(floor(l.l_discount * 1000.0 + 0.5) AS BIGINT)))
               AS BIGINT) AS share_permille
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'ASIA'
      GROUP BY 1 ORDER BY ship_year"""),
      (s, d) => {
        val rev = (floor(col("l_extendedprice") * lit(100.0) + lit(0.5)).cast("long")
          * (lit(1000L) - floor(col("l_discount") * lit(1000.0) + lit(0.5)).cast("long")))
        t(s, d, "lineitem")
          .join(broadcast(t(s, d, "supplier").select("s_suppkey", "s_nationkey")),
            col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(t(s, d, "nation")),
            col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(t(s, d, "region").filter(col("r_name") === "ASIA")
            .select("r_regionkey")), col("n_regionkey") === col("r_regionkey"))
          .groupBy(year(col("l_shipdate")).cast("long").as("ship_year"))
          .agg(sum(when(col("n_name") === "NATION_2", rev).otherwise(0L))
              .cast("long").as("nation_milli_cents"),
            sum(rev).cast("long").as("region_milli_cents"))
          .select(col("ship_year"), col("nation_milli_cents"),
            col("region_milli_cents"),
            expr("div(1000 * nation_milli_cents, region_milli_cents)")
              .as("share_permille"))
          .orderBy("ship_year")
      }),

    // TPC-H Q16-shape: supplier diversity census — DISTINCT supplier
    // counts per (brand, type), excluding blacklisted suppliers
    // (negative account balance) via NOT IN → LEFT ANTI against the
    // tiny blacklist key set. The anti join prunes the fact BEFORE
    // the expensive distinct aggregate; part broadcasts; the
    // countDistinct shuffles (brand, type, suppkey) partials, never
    // raw rows.
    QDef("q_supplier_census", Some("""
      SELECT p.p_brand, p.p_type,
             CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS n_suppliers,
             CAST(count(*) AS BIGINT) AS n_items
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE l.l_suppkey NOT IN
        (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
      GROUP BY 1, 2 ORDER BY p_brand, p_type"""),
      (s, d) => {
        val blacklist = t(s, d, "supplier").filter(col("s_acctbal") < 0.0)
          .select("s_suppkey")
        t(s, d, "lineitem").select("l_partkey", "l_suppkey")
          .join(blacklist, col("l_suppkey") === col("s_suppkey"), "left_anti")
          .join(broadcast(t(s, d, "part").select("p_partkey", "p_brand", "p_type")),
            col("l_partkey") === col("p_partkey"))
          .groupBy("p_brand", "p_type")
          .agg(countDistinct("l_suppkey").as("n_suppliers"),
            count(lit(1)).as("n_items"))
          .orderBy("p_brand", "p_type")
      }),

    // MULTI-MEASURE PIVOT: the two-aggregate crosstab (count AND
    // cents per pivoted event type) in ONE two-phase pivot pass —
    // q_pivot_event_counts carries one measure; real reporting
    // pivots carry several, and the declared-values contract (never
    // an inference scan) matters just as much here. Spark names the
    // output {value}_{aggAlias}, which the oracle mirrors; absent
    // combinations coalesce to 0 so the crosstab is dense.
    QDef("q_pivot_multi_agg", Some("""
      SELECT user_id,
        CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT)
          AS click_n,
        CAST(sum(CASE WHEN event_type = 'click'
                 THEN CAST(floor(value * 100.0 + 0.5) AS BIGINT) ELSE 0 END)
          AS BIGINT) AS click_cents,
        CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
          AS purchase_n,
        CAST(sum(CASE WHEN event_type = 'purchase'
                 THEN CAST(floor(value * 100.0 + 0.5) AS BIGINT) ELSE 0 END)
          AS BIGINT) AS purchase_cents
      FROM events GROUP BY 1 ORDER BY user_id"""),
      (s, d) =>
        t(s, d, "events")
          .groupBy("user_id")
          .pivot("event_type", Seq("click", "purchase"))
          .agg(count(lit(1)).as("n"),
            sum(floor(col("value") * lit(100.0) + lit(0.5)).cast("long"))
              .as("cents"))
          .select(col("user_id"),
            coalesce(col("click_n"), lit(0L)).cast("long").as("click_n"),
            coalesce(col("click_cents"), lit(0L)).cast("long").as("click_cents"),
            coalesce(col("purchase_n"), lit(0L)).cast("long").as("purchase_n"),
            coalesce(col("purchase_cents"), lit(0L)).cast("long")
              .as("purchase_cents"))
          .orderBy("user_id")),

    // MIXED GROUPING SETS: the two one-dimension marginals PLUS the
    // full cross — ((flag, status), (flag), (status)) — in one
    // Expand pass, each row tagged with its grouping_id bitmask.
    // Distinct from rollup (which would add the grand total and
    // drop the (status) marginal) and cube (which pays all four
    // sets); GROUPING SETS buys exactly the marginals a report
    // needs. Spark and DuckDB share the MSB-first grouping()
    // convention (pinned by q_cube_pricing), so gid transfers.
    QDef("q_grouping_sets_mixed", Some("""
      SELECT coalesce(l_returnflag, '(all)') AS flag,
             coalesce(l_linestatus, '(all)') AS status,
             CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT)
               AS gid,
             CAST(count(*) AS BIGINT) AS n
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                              (l_returnflag), (l_linestatus))
      ORDER BY gid, flag, status"""),
      (s, d) =>
        t(s, d, "lineitem")
          .groupingSets(
            Seq(Seq(col("l_returnflag"), col("l_linestatus")),
              Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
            col("l_returnflag"), col("l_linestatus"))
          // grouping() is only legal INSIDE the aggregate list — a
          // post-agg projection can't see the grouping bitmask
          .agg((grouping(col("l_returnflag")).cast("long") * 2 +
              grouping(col("l_linestatus")).cast("long")).as("gid"),
            count(lit(1)).as("n"))
          .select(
            coalesce(col("l_returnflag"), lit("(all)")).as("flag"),
            coalesce(col("l_linestatus"), lit("(all)")).as("status"),
            col("gid"), col("n"))
          .orderBy("gid", "flag", "status")),

    // TPC-H Q9-shape: profit by nation and order-year through the
    // full fact→part/supplier/nation/orders join fan. The testdata
    // lake has no partsupp, so unit cost is the part's retail price
    // (the only cost-like column) — the SHAPE is what matters: two
    // broadcast dims prune the fact before its single shuffle join
    // with orders on the order key, then a dim×year-sized aggregate.
    // At 100 TB the part filter (p_type='STANDARD', ~1/6 of parts)
    // rides the broadcast hash join as a semi-filter so ~5/6 of fact
    // rows never reach the orders shuffle. Money stays DECIMAL end
    // to end (both products forced to scale 4 so the difference and
    // the sum carry one exact scale) and renders as VARCHAR — the
    // q_agg_top_revenue cross-engine discipline.
    QDef("q_profit_nation_year", Some("""
      SELECT n.n_name, CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
             CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2)) *
                        (1 - CAST(l.l_discount AS DECIMAL(12,2))) -
                      CAST(p.p_retailprice AS DECIMAL(12,2)) *
                        CAST(l.l_quantity AS DECIMAL(12,2))) AS VARCHAR)
               AS profit,
             CAST(count(*) AS BIGINT) AS n_lines
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE p.p_type = 'STANDARD'
      GROUP BY 1, 2 ORDER BY n_name, o_year"""),
      (s, d) =>
        t(s, d, "lineitem")
          .join(broadcast(t(s, d, "part").filter(col("p_type") === "STANDARD")
            .select("p_partkey", "p_retailprice")),
            col("l_partkey") === col("p_partkey"))
          .join(broadcast(t(s, d, "supplier").select("s_suppkey", "s_nationkey")),
            col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(t(s, d, "nation").select("n_nationkey", "n_name")),
            col("s_nationkey") === col("n_nationkey"))
          .join(t(s, d, "orders").select("o_orderkey", "o_orderdate"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("n_name"), year(col("o_orderdate")).cast("long").as("o_year"))
          .agg(sum(col("l_extendedprice").cast("decimal(12,2)") *
                     (lit(1) - col("l_discount").cast("decimal(12,2)")) -
                   col("p_retailprice").cast("decimal(12,2)") *
                     col("l_quantity").cast("decimal(12,2)")).cast("string")
            .as("profit"),
            count(lit(1)).as("n_lines"))
          .orderBy("n_name", "o_year")),

    // REVENUE BRIDGE (price/volume decomposition waterfall) — the
    // finance-review walk from 1995 revenue to 1996 revenue per
    // brand: price effect (Δprice·old volume), volume effect
    // (old price·Δvolume), and the joint mix term (Δprice·Δvolume),
    // which sum EXACTLY to ΔRevenue because avg-price is held as the
    // exact rational rev/qty — effects are computed as
    // cross-multiplied integer cents·units divided once at the end
    // (floored shared doubles for the report columns, with the exact
    // Δrev shipped alongside so the bridge is auditable). Two
    // year-slice aggregates of one fact scan, joined brand-to-brand
    // — dim-sized everywhere after the scan.
    QDef("q_revenue_bridge", Some("""
      WITH y AS (SELECT p.p_brand, year(o.o_orderdate) AS yr,
              CAST(sum(CAST(floor(l.l_extendedprice * 100.0 + 0.5) AS BIGINT))
                AS BIGINT) AS rev,
              CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty
            FROM lineitem l
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            JOIN part p ON p.p_partkey = l.l_partkey
            WHERE year(o.o_orderdate) IN (1995, 1996)
            GROUP BY 1, 2),
      a AS (SELECT p_brand, rev AS rev1, qty AS qty1 FROM y WHERE yr = 1995),
      b AS (SELECT p_brand, rev AS rev2, qty AS qty2 FROM y WHERE yr = 1996)
      SELECT a.p_brand, rev1, rev2, qty1, qty2,
             CAST(rev2 - rev1 AS BIGINT) AS delta_rev_cents,
             CAST(floor((1.0 * rev2 / qty2 - 1.0 * rev1 / qty1) * qty1)
               AS BIGINT) AS price_effect_cents,
             CAST(floor(1.0 * rev1 / qty1 * (qty2 - qty1)) AS BIGINT)
               AS volume_effect_cents,
             CAST(floor((1.0 * rev2 / qty2 - 1.0 * rev1 / qty1) *
                        (qty2 - qty1)) AS BIGINT) AS mix_effect_cents
      FROM a JOIN b USING (p_brand) ORDER BY p_brand"""),
      (s, d) => {
        val y = t(s, d, "lineitem")
          .join(t(s, d, "orders").select("o_orderkey", "o_orderdate"),
            col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(t(s, d, "part").select("p_partkey", "p_brand")),
            col("l_partkey") === col("p_partkey"))
          .filter(year(col("o_orderdate")).isin(1995, 1996))
          .groupBy(col("p_brand"), year(col("o_orderdate")).as("yr"))
          .agg(sum(floor(col("l_extendedprice") * lit(100.0) + lit(0.5))
            .cast("long")).cast("long").as("rev"),
            sum(col("l_quantity").cast("long")).cast("long").as("qty"))
        val a = y.filter(col("yr") === 1995)
          .select(col("p_brand"), col("rev").as("rev1"), col("qty").as("qty1"))
        val b = y.filter(col("yr") === 1996)
          .select(col("p_brand").as("pb2"), col("rev").as("rev2"),
            col("qty").as("qty2"))
        val p1 = lit(1.0) * col("rev1") / col("qty1")
        val p2 = lit(1.0) * col("rev2") / col("qty2")
        a.join(b, col("p_brand") === col("pb2"))
          .select(col("p_brand"), col("rev1"), col("rev2"), col("qty1"),
            col("qty2"),
            (col("rev2") - col("rev1")).cast("long").as("delta_rev_cents"),
            floor((p2 - p1) * col("qty1")).cast("long").as("price_effect_cents"),
            floor(p1 * (col("qty2") - col("qty1"))).cast("long")
              .as("volume_effect_cents"),
            floor((p2 - p1) * (col("qty2") - col("qty1"))).cast("long")
              .as("mix_effect_cents"))
          .orderBy("p_brand")
      }),

    // SHARE-OF-PARENT hierarchy readout — revenue rolled to
    // region → nation with each level's share of its PARENT in exact
    // ppm: the drill-down table every OLAP front-end renders. One
    // fact aggregate at nation grain (dims broadcast), the region
    // and grand totals re-aggregate the NATION-sized table, and both
    // ride back as broadcast joins — the fact shuffles once.
    QDef("q_share_of_parent", Some("""
      WITH nat AS (SELECT r.r_name, n.n_name,
              CAST(sum(CAST(floor(l.l_extendedprice * 100.0 + 0.5) AS BIGINT))
                AS BIGINT) AS rev
            FROM lineitem l
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN nation n ON n.n_nationkey = s.s_nationkey
            JOIN region r ON r.r_regionkey = n.n_regionkey
            GROUP BY 1, 2),
      reg AS (SELECT r_name, CAST(sum(rev) AS BIGINT) AS reg_rev
              FROM nat GROUP BY 1),
      tot AS (SELECT sum(rev) AS tot_rev FROM nat)
      SELECT nat.r_name, nat.n_name, nat.rev AS rev_cents,
             CAST((1000000 * CAST(nat.rev AS HUGEINT)) // reg.reg_rev AS BIGINT)
               AS share_of_region_ppm,
             CAST((1000000 * CAST(reg.reg_rev AS HUGEINT)) // tot.tot_rev
               AS BIGINT) AS region_share_ppm
      FROM nat JOIN reg USING (r_name), tot
      ORDER BY r_name, n_name"""),
      (s, d) => {
        val nat = t(s, d, "lineitem").select("l_suppkey", "l_extendedprice")
          .join(broadcast(t(s, d, "supplier").select("s_suppkey", "s_nationkey")),
            col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(t(s, d, "nation")),
            col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(t(s, d, "region")),
            col("n_regionkey") === col("r_regionkey"))
          .groupBy("r_name", "n_name")
          .agg(sum(floor(col("l_extendedprice") * lit(100.0) + lit(0.5))
            .cast("long")).cast("long").as("rev"))
        val reg = nat.groupBy("r_name")
          .agg(sum("rev").cast("long").as("reg_rev"))
        val tot = nat.agg(sum("rev").cast("long").as("tot_rev"))
        nat.join(broadcast(reg), Seq("r_name")).crossJoin(broadcast(tot))
          .select(col("r_name"), col("n_name"), col("rev").as("rev_cents"),
            // rev×1e6 passes 2^63 once national revenue crosses ~$92T
            // (the sf10 sweep hit it) — route the product through
            // DECIMAL(38,0)/HUGEINT, the q_abc_classification pattern.
            expr("div(1000000 * cast(rev as decimal(38,0)), reg_rev)")
              .cast("long").as("share_of_region_ppm"),
            expr("div(1000000 * cast(reg_rev as decimal(38,0)), tot_rev)")
              .cast("long").as("region_share_ppm"))
          .orderBy("r_name", "n_name")
      }),

    // ABC INVENTORY CLASSIFICATION — parts ranked by revenue, class
    // A = the head covering 80% of cumulative revenue, B = the next
    // 15%, C = the tail: the warehouse-ops sibling of the Lorenz
    // curve that outputs a CLASSIFICATION, not a curve. The ordered
    // pass runs over the PART aggregate (dim-sized); boundaries are
    // exact integer cross-multiplications on the running sum in
    // REDUCED-FRACTION form (5·cum ≤ 4·tr for the 80% line,
    // 20·cum ≤ 19·tr for 95% — NOT cum·1e6 vs threshold·tr, whose
    // left side is 3.2e19 at sf1 and overflowed BIGINT in the r13
    // sf1 sweep; ×20 keeps the predicate exact in BIGINT past a
    // 4e17-cent ≈ $4-quadrillion book), so class membership never
    // touches a float. The ppm share product still scales with
    // total money, so it alone routes through DECIMAL(38,0) /
    // HUGEINT; output columns stay BIGINT.
    QDef("q_abc_classification", Some("""
      WITH pr AS (SELECT l_partkey,
              CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT))
                AS BIGINT) AS rev
            FROM lineitem GROUP BY 1),
      tot AS (SELECT sum(rev) AS tr FROM pr),
      c AS (SELECT l_partkey, rev,
              sum(rev) OVER (ORDER BY rev DESC, l_partkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
            FROM pr),
      k AS (SELECT l_partkey, rev,
              CASE WHEN 5 * cum <= 4 * tr THEN 'A'
                   WHEN 20 * cum <= 19 * tr THEN 'B'
                   ELSE 'C' END AS abc
            FROM c, tot)
      SELECT abc, CAST(count(*) AS BIGINT) AS n_parts,
             CAST(sum(rev) AS BIGINT) AS class_rev_cents,
             CAST((1000000 * CAST(sum(rev) AS HUGEINT)) // max(tr) AS BIGINT)
               AS rev_share_ppm
      FROM k, tot GROUP BY abc ORDER BY abc"""),
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val pr = t(s, d, "lineitem")
          .groupBy("l_partkey")
          .agg(sum(floor(col("l_extendedprice") * lit(100.0) + lit(0.5))
            .cast("long")).cast("long").as("rev"))
        val tot = pr.agg(sum("rev").cast("long").as("tr"))
        pr.withColumn("cum", sum("rev").over(
          Window.orderBy(col("rev").desc, col("l_partkey"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .crossJoin(broadcast(tot))
          .select(col("rev"), col("tr"),
            when(lit(5L) * col("cum") <= lit(4L) * col("tr"), "A")
              .when(lit(20L) * col("cum") <= lit(19L) * col("tr"), "B")
              .otherwise("C").as("abc"))
          .groupBy("abc")
          .agg(count(lit(1)).as("n_parts"),
            sum("rev").cast("long").as("class_rev_cents"),
            expr("div(1000000 * cast(sum(rev) as decimal(38,0)), max(tr))")
              .cast("long").as("rev_share_ppm"))
          .orderBy("abc")
      }),

    // SHUFFLE-PARTITION ADVISOR — the sizing arithmetic behind
    // `spark.sql.shuffle.partitions`: estimate each join input's
    // bytes from row counts × the SCHEMA-DERIVED row width (fixed
    // per-type constants: 8B numerics/timestamps, 16B short
    // strings — deterministic, no sampling), then recommend
    // ceil(bytes / 128 MiB) tasks for each scan and for the
    // orderkey shuffle join of both. This is the q_compaction_plan /
    // q_key_skew_audit infra family extended to the SHUFFLE stage:
    // two count(*) aggregates, 3-row arithmetic, and exactly the
    // calculation the 100 TB tuning notes in SURVEY §4 prescribe.
    QDef("q_shuffle_advisor", Some("""
      WITH l AS (SELECT CAST(count(*) AS BIGINT) AS r FROM lineitem),
      o AS (SELECT CAST(count(*) AS BIGINT) AS r FROM orders),
      st AS (
        SELECT 'scan_lineitem' AS stage, l.r AS n_rows,
               CAST(l.r * 100 AS BIGINT) AS est_bytes FROM l
        UNION ALL
        SELECT 'scan_orders', o.r, CAST(o.r * 64 AS BIGINT) FROM o
        UNION ALL
        SELECT 'shuffle_join_orderkey', l.r + o.r,
               CAST(l.r * 100 + o.r * 64 AS BIGINT) FROM l, o)
      SELECT stage, n_rows, est_bytes,
             CAST((est_bytes + 134217727) // 134217728 AS BIGINT)
               AS rec_partitions
      FROM st ORDER BY stage"""),
      (s, d) => {
        val l = t(s, d, "lineitem").agg(count(lit(1)).as("r"))
        val o = t(s, d, "orders").agg(count(lit(1)).as("r"))
        val stages = l.select(lit("scan_lineitem").as("stage"),
            col("r").as("n_rows"), (col("r") * 100).cast("long").as("est_bytes"))
          .unionByName(o.select(lit("scan_orders").as("stage"),
            col("r").as("n_rows"), (col("r") * 64).cast("long").as("est_bytes")))
          .unionByName(l.crossJoin(o.select(col("r").as("r2")))
            .select(lit("shuffle_join_orderkey").as("stage"),
              (col("r") + col("r2")).as("n_rows"),
              (col("r") * 100 + col("r2") * 64).cast("long").as("est_bytes")))
        stages.select(col("stage"), col("n_rows"), col("est_bytes"),
          expr("div(est_bytes + 134217727, 134217728)").cast("long")
            .as("rec_partitions"))
          .orderBy("stage")
      }),

    // INVENTORY POLICY per part — the operations-research trio a
    // replenishment system derives from the same demand history:
    // EOQ = √(2·D·S/H) (S = 10000 cents order cost, H = 20% of unit
    // retail), reorder point = daily demand × 7-day lead time, and
    // safety stock = z₀.₉₅·σ_daily·√7 with σ from EXACT integer
    // demand moments over the part's active days. All irrational
    // steps are single floored shared-double sqrt's of exact
    // integers; everything before them is one (part, day) aggregate
    // rolled to part grain — dim-sized outputs at any SF.
    QDef("q_inventory_policy", Some("""
      WITH dd AS (SELECT l_partkey,
               epoch_us(date_trunc('day', l_shipdate)) // 86400000000 AS d,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
             FROM lineitem GROUP BY 1, 2),
      m AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS nd,
              CAST(sum(q) AS BIGINT) AS sq, CAST(sum(q * q) AS BIGINT) AS sqq
            FROM dd GROUP BY 1),
      p AS (SELECT m.*, CAST(floor(pt.p_retailprice * 100.0 + 0.5) AS BIGINT)
                    AS price_cents
            FROM m JOIN part pt ON pt.p_partkey = m.l_partkey)
      SELECT l_partkey, nd AS n_active_days, sq AS total_qty,
             CAST(floor(sqrt(2.0 * sq * 10000 / (0.2 * price_cents)))
               AS BIGINT) AS eoq_units,
             CAST((7 * sq) // nd AS BIGINT) AS reorder_point_units,
             CAST(CASE WHEN nd < 2 THEN 0
               ELSE floor(1.645 * sqrt(7.0) *
                 sqrt((1.0 * nd * sqq - 1.0 * sq * sq) / (nd * (nd - 1.0))))
               END AS BIGINT) AS safety_stock_units
      FROM p ORDER BY l_partkey"""),
      (s, d) => {
        val dd = t(s, d, "lineitem")
          .groupBy(col("l_partkey"),
            expr("div(unix_micros(date_trunc('day', l_shipdate)), 86400000000)")
              .as("d"))
          .agg(sum(col("l_quantity").cast("long")).cast("long").as("q"))
        val m = dd.groupBy("l_partkey")
          .agg(count(lit(1)).as("nd"), sum("q").cast("long").as("sq"),
            sum(col("q") * col("q")).cast("long").as("sqq"))
        m.join(broadcast(t(s, d, "part").select(col("p_partkey"),
          floor(col("p_retailprice") * lit(100.0) + lit(0.5)).cast("long")
            .as("price_cents"))),
          col("l_partkey") === col("p_partkey"))
          .select(col("l_partkey"), col("nd").as("n_active_days"),
            col("sq").as("total_qty"),
            floor(sqrt(lit(2.0) * col("sq") * lit(10000) /
              (lit(0.2) * col("price_cents")))).cast("long").as("eoq_units"),
            expr("div(7 * sq, nd)").cast("long").as("reorder_point_units"),
            when(col("nd") < 2, 0L)
              .otherwise(floor(lit(1.645) * sqrt(lit(7.0)) *
                sqrt((lit(1.0) * col("nd") * col("sqq") -
                  lit(1.0) * col("sq") * col("sq")) /
                  (col("nd") * (col("nd") - lit(1.0))))))
              .cast("long").as("safety_stock_units"))
          .orderBy("l_partkey")
      }),

    // PRICE INDICES 1995→1996 — Laspeyres (base-period basket),
    // Paasche (current basket), Fisher (geometric mean of both):
    // the macro-level companion to q_revenue_bridge's per-brand
    // walk. Per-part unit prices are the exact rationals rev/qty;
    // each basket term floors ONCE to integer cents
    // (div(rev_y·qty_base, qty_y)) so the basket sums are exact
    // integers with ≤|parts| cents of flooring slack — no float
    // accumulation. Only parts traded in BOTH years enter (the
    // matched-sample convention). Indices in ppm of the base;
    // Fisher takes one shared-double sqrt over the EXACT integer ppm
    // columns — never re-derived via float floor-div: 1000000·p1q0 ≈
    // 5.5e17 exceeds 2^53, so `1.0 * X // Y` floor-divides a rounded
    // double and can land one ppm off the integer div (the r11
    // fresh-draw sweep caught exactly that fisher_ppm 1-off).
    QDef("q_price_index", Some("""
      WITH y AS (SELECT l.l_partkey, year(o.o_orderdate) AS yr,
              CAST(sum(CAST(floor(l.l_extendedprice * 100.0 + 0.5) AS BIGINT))
                AS BIGINT) AS rev,
              CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty
            FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
            WHERE year(o.o_orderdate) IN (1995, 1996)
            GROUP BY 1, 2),
      a AS (SELECT l_partkey, rev AS r0, qty AS q0 FROM y WHERE yr = 1995),
      b AS (SELECT l_partkey, rev AS r1, qty AS q1 FROM y WHERE yr = 1996),
      j AS (SELECT a.l_partkey, r0, q0, r1, q1 FROM a JOIN b USING (l_partkey)),
      s AS (SELECT CAST(count(*) AS BIGINT) AS n_parts,
              CAST(sum(r0) AS BIGINT) AS p0q0,
              CAST(sum((r1 * q0) // q1) AS BIGINT) AS p1q0,
              CAST(sum((r0 * q1) // q0) AS BIGINT) AS p0q1,
              CAST(sum(r1) AS BIGINT) AS p1q1
            FROM j),
      f AS (SELECT n_parts, p0q0, p1q0, p0q1, p1q1,
              CAST((1000000 * CAST(p1q0 AS HUGEINT)) // p0q0 AS BIGINT)
                AS laspeyres_ppm,
              CAST((1000000 * CAST(p1q1 AS HUGEINT)) // p0q1 AS BIGINT)
                AS paasche_ppm
            FROM s)
      SELECT n_parts, p0q0, p1q0, p0q1, p1q1, laspeyres_ppm, paasche_ppm,
             CAST(floor(sqrt((1.0 * laspeyres_ppm) * (1.0 * paasche_ppm)))
               AS BIGINT) AS fisher_ppm
      FROM f"""),
      (s, d) => {
        val y = t(s, d, "lineitem")
          .join(t(s, d, "orders").select("o_orderkey", "o_orderdate"),
            col("l_orderkey") === col("o_orderkey"))
          .filter(year(col("o_orderdate")).isin(1995, 1996))
          .groupBy(col("l_partkey"), year(col("o_orderdate")).as("yr"))
          .agg(sum(floor(col("l_extendedprice") * lit(100.0) + lit(0.5))
            .cast("long")).cast("long").as("rev"),
            sum(col("l_quantity").cast("long")).cast("long").as("qty"))
        val a = y.filter(col("yr") === 1995)
          .select(col("l_partkey"), col("rev").as("r0"), col("qty").as("q0"))
        val b = y.filter(col("yr") === 1996)
          .select(col("l_partkey").as("pk2"), col("rev").as("r1"),
            col("qty").as("q1"))
        a.join(b, col("l_partkey") === col("pk2"))
          .agg(count(lit(1)).as("n_parts"),
            sum("r0").cast("long").as("p0q0"),
            sum(expr("div(r1 * q0, q1)")).cast("long").as("p1q0"),
            sum(expr("div(r0 * q1, q0)")).cast("long").as("p0q1"),
            sum("r1").cast("long").as("p1q1"))
          .select(col("n_parts"), col("p0q0"), col("p1q0"), col("p0q1"),
            col("p1q1"),
            // basket-sum × 1e6 passes 2^63 once a year's basket
            // crosses ~$92T in cents (the sf10 sweep hit it) —
            // DECIMAL(38,0)/HUGEINT product, q_abc_classification
            // pattern; ppm itself stays ~1e6 so fisher's shared
            // double sqrt is unchanged.
            expr("div(1000000 * cast(p1q0 as decimal(38,0)), p0q0)")
              .cast("long").as("laspeyres_ppm"),
            expr("div(1000000 * cast(p1q1 as decimal(38,0)), p0q1)")
              .cast("long").as("paasche_ppm"),
            floor(sqrt(
              (lit(1.0) *
                expr("div(1000000 * cast(p1q0 as decimal(38,0)), p0q0)")) *
              (lit(1.0) *
                expr("div(1000000 * cast(p1q1 as decimal(38,0)), p0q1)"))))
              .cast("long").as("fisher_ppm"))
      }),

    // JOIN-CARDINALITY ESTIMATOR AUDIT: the textbook CBO estimate
    // |A⋈B| = n_A·n_B / max(ndv_A, ndv_B) for the two fact joins,
    // against their MEASURED cardinalities, with the error in
    // permille — the evidence for trusting (or distrusting) a
    // cost-based join order on this lake. The stats side is four
    // count/NDV aggregates (exactly what ANALYZE collects — 1-row
    // broadcasts); the actuals are the real joins counted. On
    // FK-clean data the estimate is near-exact (err ≈ 0); the gap IS
    // the signal when keys are skewed or filtered. Born-integer
    // throughout; products stay ≤ ~10¹¹ at bench SFs.
    QDef("q_join_card_estimate", Some("""
      WITH s1 AS (SELECT CAST(count(*) AS BIGINT) AS n_l,
              CAST(count(DISTINCT l_orderkey) AS BIGINT) AS v_l FROM lineitem),
      s2 AS (SELECT CAST(count(*) AS BIGINT) AS n_o,
              CAST(count(DISTINCT o_orderkey) AS BIGINT) AS v_o,
              CAST(count(DISTINCT o_custkey) AS BIGINT) AS v_oc FROM orders),
      s3 AS (SELECT CAST(count(*) AS BIGINT) AS n_c,
              CAST(count(DISTINCT c_custkey) AS BIGINT) AS v_c FROM customer),
      a1 AS (SELECT CAST(count(*) AS BIGINT) AS act FROM lineitem l
             JOIN orders o ON l.l_orderkey = o.o_orderkey),
      a2 AS (SELECT CAST(count(*) AS BIGINT) AS act FROM orders o
             JOIN customer c ON o.o_custkey = c.c_custkey)
      SELECT * FROM (
        SELECT 'a_lineitem_orders' AS join_name, s1.n_l AS n_left,
               s2.n_o AS n_right, greatest(s1.v_l, s2.v_o) AS ndv_max,
               CAST((s1.n_l * s2.n_o) // greatest(s1.v_l, s2.v_o) AS BIGINT)
                 AS est_rows,
               a1.act AS actual_rows,
               CAST((1000 * abs((s1.n_l * s2.n_o) // greatest(s1.v_l, s2.v_o)
                 - a1.act)) // a1.act AS BIGINT) AS err_permille
        FROM s1, s2, a1
        UNION ALL
        SELECT 'b_orders_customer', s2.n_o, s3.n_c,
               greatest(s2.v_oc, s3.v_c),
               CAST((s2.n_o * s3.n_c) // greatest(s2.v_oc, s3.v_c) AS BIGINT),
               a2.act,
               CAST((1000 * abs((s2.n_o * s3.n_c) // greatest(s2.v_oc, s3.v_c)
                 - a2.act)) // a2.act AS BIGINT)
        FROM s2, s3, a2)
      ORDER BY join_name"""),
      (s, d) => {
        val li = t(s, d, "lineitem")
        val or = t(s, d, "orders")
        val cu = t(s, d, "customer")
        val s1 = li.agg(count(lit(1)).as("n_l"),
          countDistinct("l_orderkey").as("v_l"))
        val s2 = or.agg(count(lit(1)).as("n_o"),
          countDistinct("o_orderkey").as("v_o"),
          countDistinct("o_custkey").as("v_oc"))
        val s3 = cu.agg(count(lit(1)).as("n_c"),
          countDistinct("c_custkey").as("v_c"))
        val a1 = li.select("l_orderkey")
          .join(or.select("o_orderkey"), col("l_orderkey") === col("o_orderkey"))
          .agg(count(lit(1)).as("act"))
        val a2 = or.select("o_custkey")
          .join(cu.select("c_custkey"), col("o_custkey") === col("c_custkey"))
          .agg(count(lit(1)).as("act"))
        def row(name: String, stats: org.apache.spark.sql.DataFrame,
                nL: String, nR: String, vL: String, vR: String,
                act: org.apache.spark.sql.DataFrame) =
          stats.crossJoin(broadcast(act))
            .select(lit(name).as("join_name"), col(nL).as("n_left"),
              col(nR).as("n_right"),
              greatest(col(vL), col(vR)).as("ndv_max"),
              expr(s"div($nL * $nR, greatest($vL, $vR))").as("est_rows"),
              col("act").as("actual_rows"),
              expr(s"div(1000 * abs(div($nL * $nR, greatest($vL, $vR)) - act), act)")
                .as("err_permille"))
        row("a_lineitem_orders", s1.crossJoin(broadcast(s2)),
            "n_l", "n_o", "v_l", "v_o", a1)
          .unionByName(row("b_orders_customer", s2.crossJoin(broadcast(s3)),
            "n_o", "n_c", "v_oc", "v_c", a2))
          .orderBy("join_name")
      }),

    // COLUMN-ENCODING ADVISOR: the write-path decision a columnar
    // lake makes per column — dictionary (low NDV), RLE (long runs
    // in physical order), or plain — justified by measured evidence:
    // row count, NDV, NDV permille, run count under the file's
    // physical (l_orderkey, l_linenumber) order, run permille, and
    // the verdict. Runs are counted WITHIN orderkey groups (each
    // group start opens a run), so the window is key-partitioned —
    // never a global single-partition sort — and the per-group order
    // tie-breaks on the value itself because (l_orderkey,
    // l_linenumber) genuinely ties in this lake (the TOTAL-order
    // rule). Three column branches, each one narrow window pass +
    // one rollup; thresholds: dict if NDV ≤ 10% of rows, RLE if
    // runs ≤ 50% of rows.
    QDef("q_encoding_advisor", Some("""
      WITH f AS (SELECT 'a_l_returnflag' AS col_name, CAST(count(*) AS BIGINT) AS n,
               CAST(count(DISTINCT v) AS BIGINT) AS ndv, CAST(sum(chg) AS BIGINT) AS runs
             FROM (SELECT v, CASE WHEN v = lag(v) OVER
                     (PARTITION BY k ORDER BY ln, v) THEN 0 ELSE 1 END AS chg
                   FROM (SELECT l_orderkey AS k, l_linenumber AS ln,
                         l_returnflag AS v FROM lineitem))),
      q AS (SELECT 'b_l_quantity', CAST(count(*) AS BIGINT),
               CAST(count(DISTINCT v) AS BIGINT), CAST(sum(chg) AS BIGINT)
             FROM (SELECT v, CASE WHEN v = lag(v) OVER
                     (PARTITION BY k ORDER BY ln, v) THEN 0 ELSE 1 END AS chg
                   FROM (SELECT l_orderkey AS k, l_linenumber AS ln,
                         CAST(l_quantity AS BIGINT) AS v FROM lineitem))),
      p AS (SELECT 'c_l_partkey', CAST(count(*) AS BIGINT),
               CAST(count(DISTINCT v) AS BIGINT), CAST(sum(chg) AS BIGINT)
             FROM (SELECT v, CASE WHEN v = lag(v) OVER
                     (PARTITION BY k ORDER BY ln, v) THEN 0 ELSE 1 END AS chg
                   FROM (SELECT l_orderkey AS k, l_linenumber AS ln,
                         l_partkey AS v FROM lineitem))),
      u AS (SELECT * FROM f UNION ALL SELECT * FROM q UNION ALL SELECT * FROM p)
      SELECT col_name, n, ndv,
             CAST((1000 * ndv) // n AS BIGINT) AS ndv_permille,
             runs, CAST((1000 * runs) // n AS BIGINT) AS runs_permille,
             CASE WHEN 10 * ndv <= n THEN 'dictionary'
                  WHEN 2 * runs <= n THEN 'rle'
                  ELSE 'plain' END AS encoding
      FROM u ORDER BY col_name"""),
      (s, d) => {
        def branch(name: String, v: org.apache.spark.sql.Column) = {
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy("k").orderBy("ln", "v")
          t(s, d, "lineitem")
            .select(col("l_orderkey").as("k"), col("l_linenumber").as("ln"),
              v.as("v"))
            .withColumn("chg",
              when(col("v") === lag("v", 1).over(w), 0L).otherwise(1L))
            .agg(count(lit(1)).as("n"), countDistinct("v").as("ndv"),
              sum("chg").cast("long").as("runs"))
            .select(lit(name).as("col_name"), col("n"), col("ndv"), col("runs"))
        }
        branch("a_l_returnflag", col("l_returnflag"))
          .unionByName(branch("b_l_quantity", col("l_quantity").cast("long")))
          .unionByName(branch("c_l_partkey", col("l_partkey")))
          .select(col("col_name"), col("n"), col("ndv"),
            expr("div(1000 * ndv, n)").as("ndv_permille"), col("runs"),
            expr("div(1000 * runs, n)").as("runs_permille"),
            when(lit(10) * col("ndv") <= col("n"), "dictionary")
              .when(lit(2) * col("runs") <= col("n"), "rle")
              .otherwise("plain").as("encoding"))
          .orderBy("col_name")
      }),

    // ZONE-MAP PRUNE AUDIT: the data-skipping evidence behind a sort
    // decision — bucket lineitem into file-sized groups under TWO
    // layouts (natural l_orderkey ranges vs ship-date-sorted weekly
    // ranges), carry each file's (min, max) ship-day zone map, and
    // count how many files a one-week probe predicate can skip.
    // Natural layout prunes ~nothing (every file spans the whole
    // date range); the sorted layout prunes all but the probe's
    // neighborhood — the measured justification for paying the sort
    // at write time (q_zorder_layout is the multi-column version of
    // the same decision). Two map-side-combined aggregates over a
    // 2-column projection; file-grain output.
    QDef("q_zonemap_prune_audit", Some("""
      WITH r AS (SELECT l_orderkey,
               CAST(datediff('day', TIMESTAMP '1995-01-01', l_shipdate) AS BIGINT)
                 AS d
             FROM lineitem),
      nat AS (SELECT l_orderkey // 500 AS fid, min(d) AS lo, max(d) AS hi
              FROM r GROUP BY 1),
      srt AS (SELECT d // 7 AS fid, min(d) AS lo, max(d) AS hi
              FROM r GROUP BY 1),
      probe AS (SELECT
          CAST(datediff('day', TIMESTAMP '1995-01-01', TIMESTAMP '1997-06-01')
            AS BIGINT) AS plo,
          CAST(datediff('day', TIMESTAMP '1995-01-01', TIMESTAMP '1997-06-08')
            AS BIGINT) AS phi)
      SELECT * FROM (
        SELECT 'a_natural' AS layout, CAST(count(*) AS BIGINT) AS n_files,
               CAST(sum(CASE WHEN hi < plo OR lo > phi THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_pruned,
               CAST((1000 * sum(CASE WHEN hi < plo OR lo > phi THEN 1 ELSE 0 END))
                 // count(*) AS BIGINT) AS prune_permille
        FROM nat, probe
        UNION ALL
        SELECT 'b_shipdate_sorted', CAST(count(*) AS BIGINT),
               CAST(sum(CASE WHEN hi < plo OR lo > phi THEN 1 ELSE 0 END)
                 AS BIGINT),
               CAST((1000 * sum(CASE WHEN hi < plo OR lo > phi THEN 1 ELSE 0 END))
                 // count(*) AS BIGINT)
        FROM srt, probe)
      ORDER BY layout"""),
      (s, d) => {
        val r = t(s, d, "lineitem").select(col("l_orderkey"),
          datediff(col("l_shipdate"), lit("1995-01-01")).cast("long").as("d"))
        val probe = (datediff(lit("1997-06-01").cast("date"),
          lit("1995-01-01").cast("date")).cast("long"),
          datediff(lit("1997-06-08").cast("date"),
            lit("1995-01-01").cast("date")).cast("long"))
        def audit(label: String, df: org.apache.spark.sql.DataFrame) =
          df.agg(count(lit(1)).as("n_files"),
            sum(when(col("hi") < probe._1 || col("lo") > probe._2, 1L)
              .otherwise(0L)).cast("long").as("n_pruned"))
            .select(lit(label).as("layout"), col("n_files"), col("n_pruned"),
              expr("div(1000 * n_pruned, n_files)").as("prune_permille"))
        val nat = r.groupBy(expr("div(l_orderkey, 500)").as("fid"))
          .agg(min("d").as("lo"), max("d").as("hi"))
        val srt = r.groupBy(expr("div(d, 7)").as("fid"))
          .agg(min("d").as("lo"), max("d").as("hi"))
        audit("a_natural", nat).unionByName(audit("b_shipdate_sorted", srt))
          .orderBy("layout")
      }),

    // SHIFT-SHARE decomposition of each nation's 1995→1996 revenue
    // growth into the three classic components: NATIONAL (what
    // global growth alone would give), INDUSTRY MIX (the nation's
    // p_type portfolio growing at industry rates vs global), and
    // COMPETITIVE (local industry growth vs the industry at large).
    // Growth rates are exact ppm integers; each component term
    // floors ONCE per (nation, industry) cell, so the decomposition
    // reconciles to the exact delta within |industries| cents (the
    // spec pins this). Three aggregates of one two-year fact slice,
    // all joins dim-sized.
    QDef("q_shift_share", Some("""
      WITH cell AS (SELECT n.n_nationkey AS nk, p.p_type AS ind,
              year(o.o_orderdate) AS yr,
              CAST(sum(CAST(floor(l.l_extendedprice * 100.0 + 0.5) AS BIGINT))
                AS BIGINT) AS rev
            FROM lineitem l
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            JOIN part p ON p.p_partkey = l.l_partkey
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN nation n ON n.n_nationkey = s.s_nationkey
            WHERE year(o.o_orderdate) IN (1995, 1996)
            GROUP BY 1, 2, 3),
      w AS (SELECT * FROM (
              SELECT nk, ind,
                CAST(sum(CASE WHEN yr = 1995 THEN rev ELSE 0 END) AS BIGINT) AS b,
                CAST(sum(CASE WHEN yr = 1996 THEN rev ELSE 0 END) AS BIGINT) AS c
              FROM cell GROUP BY 1, 2)
            WHERE b > 0),
      gi AS (SELECT ind, CAST(floor((1000000.0 * (sum(c) - sum(b))) / sum(b))
                      AS BIGINT) AS g_ind
             FROM w GROUP BY 1),
      gg AS (SELECT CAST(floor((1000000.0 * (sum(c) - sum(b))) / sum(b))
                      AS BIGINT) AS g_glob FROM w),
      comp AS (SELECT w.nk,
                 CAST(sum(w.c - w.b) AS BIGINT) AS delta_cents,
                 CAST(sum(CAST(floor((1.0 * w.b * gg.g_glob) / 1000000.0)
                   AS BIGINT)) AS BIGINT) AS national,
                 CAST(sum(CAST(floor((1.0 * w.b * (gi.g_ind - gg.g_glob)) /
                   1000000.0) AS BIGINT)) AS BIGINT) AS industry_mix,
                 CAST(sum(w.c - w.b - CAST(floor((1.0 * w.b * gi.g_ind) /
                   1000000.0) AS BIGINT)) AS BIGINT) AS competitive
               FROM w JOIN gi USING (ind) CROSS JOIN gg
               WHERE w.b > 0 GROUP BY 1)
      SELECT CAST(nk AS BIGINT) AS nationkey, delta_cents, national,
             industry_mix, competitive
      FROM comp ORDER BY nationkey"""),
      (s, d) => {
        val cell = t(s, d, "lineitem")
          .join(t(s, d, "orders").select("o_orderkey", "o_orderdate"),
            col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(t(s, d, "part").select("p_partkey", "p_type")),
            col("l_partkey") === col("p_partkey"))
          .join(broadcast(t(s, d, "supplier").select("s_suppkey", "s_nationkey")),
            col("l_suppkey") === col("s_suppkey"))
          .filter(year(col("o_orderdate")).isin(1995, 1996))
          .groupBy(col("s_nationkey").as("nk"), col("p_type").as("ind"),
            year(col("o_orderdate")).as("yr"))
          .agg(sum(floor(col("l_extendedprice") * lit(100.0) + lit(0.5))
            .cast("long")).cast("long").as("rev"))
        val w = cell.groupBy("nk", "ind")
          .agg(sum(when(col("yr") === 1995, col("rev")).otherwise(0L))
            .cast("long").as("b"),
            sum(when(col("yr") === 1996, col("rev")).otherwise(0L))
              .cast("long").as("c"))
          .filter(col("b") > 0)
        // growth rates and component terms can be NEGATIVE — floor
        // through an exact integer-valued double on BOTH engines
        // (integer // would floor in DuckDB but truncate in Spark)
        val gi = w.groupBy("ind")
          .agg(floor(lit(1000000.0) * (sum("c") - sum("b")) / sum("b"))
            .cast("long").as("g_ind"))
        val gg = w.agg(floor(lit(1000000.0) * (sum("c") - sum("b")) / sum("b"))
          .cast("long").as("g_glob"))
        w.join(broadcast(gi), Seq("ind")).crossJoin(broadcast(gg))
          .groupBy("nk")
          .agg(sum(col("c") - col("b")).cast("long").as("delta_cents"),
            sum(floor(lit(1.0) * col("b") * col("g_glob") / lit(1000000.0))
              .cast("long")).cast("long").as("national"),
            sum(floor(lit(1.0) * col("b") * (col("g_ind") - col("g_glob")) /
              lit(1000000.0)).cast("long")).cast("long").as("industry_mix"),
            sum(col("c") - col("b") -
              floor(lit(1.0) * col("b") * col("g_ind") / lit(1000000.0))
                .cast("long")).cast("long").as("competitive"))
          .select(col("nk").cast("long").as("nationkey"), col("delta_cents"),
            col("national"), col("industry_mix"), col("competitive"))
          .orderBy("nationkey")
      })
  )
}
