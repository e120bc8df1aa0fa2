#!/usr/bin/env python3
"""Forensic row-serialization dump (VERDICT r9 item 3).

For each dumped query in a graft.Verify output dir, write
`<outDir>/<name>.rows.txt` holding EXACTLY the byte stream the
correctness gate hashes for the Spark side: columns sorted by name,
values normalized with the same rules as tools/selfcheck.py
(NULL -> \\x00NULL, floats -> repr, else str), one row per line
joined by \\x01. First line is a comment with the sha256 and the
sorted column list. A driver-red can then be byte-diffed against the
driver's own DuckDB serialization instead of re-guessed per round.

Parallel since r16 (VERDICT r15 item 5): the single-threaded pass ran
40+ minutes at sf10 — each query is independent, so a process pool
fans them out (GRAFT_DUMP_ROWS_PROCS to override; each worker opens
its own DuckDB connection). Output bytes are identical to the serial
form. Set GRAFT_SKIP_ROWS_DUMP=1 on the Verify side to skip the tail
entirely for big-SF runs.

Usage: python3 tools/dump_rows.py <outDir> [query ...]
(no query args = every subdir containing parquet)
"""
import sys, os, glob, hashlib
from multiprocessing import Pool

import duckdb


def norm(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        return repr(v)
    return str(v)


def dump_one(args):
    out_dir, name = args
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        return 0
    con = duckdb.connect()
    con.execute("PRAGMA threads=2")
    cur = con.execute(f"SELECT * FROM read_parquet({files!r})")
    cols = [c[0] for c in cur.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    h = hashlib.sha256()
    lines = []
    for r in cur.fetchall():
        line = "\x01".join(norm(r[i]) for i in order)
        h.update(line.encode())
        h.update(b"\x02")
        lines.append(line)
    with open(f"{out_dir}/{name}.rows.txt", "w") as f:
        f.write(f"# sha256={h.hexdigest()} cols={[cols[i] for i in order]}\n")
        f.write("\n".join(lines))
        if lines:
            f.write("\n")
    con.close()
    return 1


def main():
    out_dir = sys.argv[1]
    names = sys.argv[2:]
    if not names:
        names = sorted(d for d in os.listdir(out_dir)
                       if os.path.isdir(os.path.join(out_dir, d))
                       and glob.glob(f"{out_dir}/{d}/*.parquet"))
    procs = int(os.environ.get("GRAFT_DUMP_ROWS_PROCS",
                               min(8, os.cpu_count() or 4)))
    if procs <= 1 or len(names) <= 1:
        wrote = sum(dump_one((out_dir, n)) for n in names)
    else:
        with Pool(procs) as pool:
            wrote = sum(pool.map(dump_one, [(out_dir, n) for n in names],
                                 chunksize=4))
    print(f"[dump_rows] wrote {wrote} .rows.txt files to {out_dir}")


if __name__ == "__main__":
    main()
