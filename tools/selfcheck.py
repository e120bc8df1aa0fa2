#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify
output against SparkEntry.oracleSql in DuckDB and hash-compare.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, os, json, glob, hashlib
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        return repr(v)
    return str(v)


def table_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    h = hashlib.sha256()
    for r in rows:
        h.update("\x01".join(norm(r[i]) for i in order).encode())
        h.update(b"\x02")
    return h.hexdigest()


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    fails, passes, skips = [], [], []
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        pdir = f"{out_dir}/{name}"
        files = glob.glob(f"{pdir}/*.parquet")
        if not files:
            fails.append((name, "no spark output"))
            continue
        try:
            sp = con.execute(f"SELECT * FROM read_parquet({files!r})")
            sp_cols = [c[0] for c in sp.description]
            sp_rows = sp.fetchall()
            du = con.execute(sql)
            du_cols = [c[0] for c in du.description]
            du_rows = du.fetchall()
        except Exception as ex:
            fails.append((name, f"exec error: {str(ex)[:300]}"))
            continue
        if sorted(sp_cols) != sorted(du_cols):
            fails.append((name, f"cols spark={sorted(sp_cols)} duck={sorted(du_cols)}"))
            continue
        if len(sp_rows) != len(du_rows):
            fails.append((name, f"rows spark={len(sp_rows)} duck={len(du_rows)}"))
            continue
        hs, hd = table_hash(sp_rows, sp_cols), table_hash(du_rows, du_cols)
        if hs != hd:
            # find first differing row for debugging
            so = sorted(range(len(sp_cols)), key=lambda i: sp_cols[i])
            do = sorted(range(len(du_cols)), key=lambda i: du_cols[i])
            diff = ""
            for i, (a, b) in enumerate(zip(sp_rows, du_rows)):
                na = [norm(a[j]) for j in so]
                nb = [norm(b[j]) for j in do]
                if na != nb:
                    diff = f" first diff @row {i}: spark={na} duck={nb}"
                    break
            fails.append((name, "hash mismatch" + diff))
        else:
            passes.append(name)
    for n in passes:
        print(f"PASS {n}")
    for n, why in fails:
        print(f"FAIL {n}: {why}")
    print(f"\n{len(passes)} pass / {len(fails)} fail")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
