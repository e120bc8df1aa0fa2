#!/usr/bin/env python3
"""Realistic-corpus cap census (VERDICT r14 item 3).

The synthetic documents table has a ~31-token global vocabulary, so
random doc pairs share Jaccard ~0.6 and every LSH census / S-curve /
cap was tuned on a pathologically dense similarity graph. This script
measures, on a --vocab=zipf corpus (tools/gen_sf.py), the statistics
each engine cap keys on, and reports whether the cap would fire:

  - TokenDfCap=1024  (NearDup.scala): token document frequency
  - SrpBucketCap=250 (Similarity.scala): 16-bit SRP bucket sizes
    (proxied here by the band-bucket census on minhash bands — the
    exact engine-side censuses come from the dumped Verify outputs
    when present)
  - LSH band-bucket maxBucket: 4-gram shingle band buckets

Usage: python3 tools/zipf_census.py <zipfDir> <synthDir> [verifyOut]
"""
import json
import sys

import duckdb


def stats(con, d):
    out = {}
    out["docs"] = con.sql(
        f"SELECT count(*) FROM read_parquet('{d}/documents.parquet')"
    ).fetchone()[0]
    # token df distribution
    out["token_df"] = dict(zip(
        ["types", "max_df", "df_gt_1024", "p99_df"],
        con.sql(f"""
        WITH toks AS (SELECT DISTINCT doc_id, unnest(string_split(text,' ')) AS tok
                      FROM read_parquet('{d}/documents.parquet')),
        df AS (SELECT tok, count(*) AS df FROM toks GROUP BY tok)
        SELECT count(*), max(df),
               count(*) FILTER (df > 1024),
               CAST(quantile_cont(df, 0.99) AS BIGINT) FROM df""").fetchone()))
    # 4-gram shingle df (what the LSH shingle stages hash)
    out["shingle_df"] = dict(zip(
        ["types", "max_df", "df_gt_1024"],
        con.sql(f"""
        WITH t AS (SELECT doc_id, string_split(text,' ') AS w
                   FROM read_parquet('{d}/documents.parquet')),
        sh AS (SELECT DISTINCT doc_id,
                      w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] AS sh
               FROM t, unnest(range(1, len(w)-2)) AS u(i)
               WHERE len(w) >= 4),
        df AS (SELECT sh, count(*) AS df FROM sh GROUP BY sh)
        SELECT count(*), max(df), count(*) FILTER (df > 1024) FROM df""").fetchone()))
    # random-pair jaccard on a 300-doc sample (pair density the LSH
    # self-joins face)
    out["pair_jaccard"] = dict(zip(
        ["avg", "p99", "share_ge_035"],
        [float(x) for x in con.sql(f"""
        WITH d AS (SELECT doc_id, list_distinct(string_split(text,' ')) AS t
                   FROM read_parquet('{d}/documents.parquet')
                   USING SAMPLE reservoir(300 ROWS) REPEATABLE (42)),
        p AS (SELECT len(list_intersect(a.t,b.t))*1.0 /
                     nullif(len(list_distinct(a.t || b.t)),0) AS j
              FROM d a JOIN d b ON a.doc_id < b.doc_id)
        SELECT round(avg(j),4), round(quantile_cont(j,0.99),4),
               round(avg(CASE WHEN j >= 0.35 THEN 1 ELSE 0 END),4) FROM p
        """).fetchone()]))
    return out


def main():
    zipf_dir, synth_dir = sys.argv[1], sys.argv[2]
    verify_out = sys.argv[3] if len(sys.argv) > 3 else None
    con = duckdb.connect()
    report = {
        "zipf": stats(con, zipf_dir),
        "synthetic": stats(con, synth_dir),
        "caps": {"TokenDfCap": 1024, "SrpBucketCap": 250},
    }
    if verify_out:
        # engine-side censuses, straight from the Verify dumps
        for q in ("q_lsh_bucket_skew", "q_ann_cell_balance",
                  "q_srp_bucket_census"):
            try:
                rows = con.sql(
                    f"SELECT * FROM read_parquet('{verify_out}/{q}/*.parquet') "
                    f"LIMIT 20").fetchall()
                cols = [c[0] for c in con.sql(
                    f"DESCRIBE SELECT * FROM read_parquet('{verify_out}/{q}/*.parquet')"
                ).fetchall()]
                report.setdefault("engine_census", {})[q] = {
                    "columns": cols, "rows": [list(map(str, r)) for r in rows]}
            except Exception:
                pass
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
