#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify
output against SparkEntry.oracleSql in DuckDB and hash-compare.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, os, json, glob, hashlib, subprocess
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

CLASSES_ROOT = "target/scala-2.13/classes"


def classes_fingerprint(root=CLASSES_ROOT):
    """Mirror of graft.Verify.classesFingerprint: sha256 over sorted
    (relative path, bytes) of every .class file."""
    if not os.path.isdir(root):
        return "<no-classes-dir>"
    h = hashlib.sha256()
    paths = []
    for dirpath, _, files in os.walk(root):
        for f in files:
            if f.endswith(".class"):
                p = os.path.join(dirpath, f)
                paths.append((os.path.relpath(p, root), p))
    for rel, p in sorted(paths):
        h.update(rel.encode())
        h.update(open(p, "rb").read())
    return h.hexdigest()


def check_provenance(out_dir, only):
    """Refuse a stale verify artifact: the dump must have been produced
    by the compiled classes currently on disk, which must themselves be
    newer than every source file (VERDICT r6 item 1 — a stale jar must
    never produce an artifact that claims to be HEAD)."""
    meta_path = f"{out_dir}/verify_meta.json"
    if not os.path.exists(meta_path):
        print("WARN no verify_meta.json in dump (pre-r7 artifact?) — provenance unchecked")
        return []
    meta = json.load(open(meta_path))
    stamped_duck = meta.get("duckdb_version")
    # '<exit 1>'/'<error: …>' sentinels mean the verify host simply
    # lacked python3+duckdb — that is NOT an environmental version
    # divergence, and warning as if it were would re-create the
    # adjudication noise this stamp exists to eliminate
    if stamped_duck and not stamped_duck.startswith("<") \
            and stamped_duck != duckdb.__version__:
        print(f"WARN dump stamped against duckdb {stamped_duck} but this compare "
              f"runs duckdb {duckdb.__version__} — a hash divergence may be "
              "environmental, not a code bug")
    problems = []
    if meta.get("stale_build") is True:
        problems.append("verify ran on classes OLDER than src/main/scala (stale build)")
    now_fp = classes_fingerprint()
    if now_fp == "<no-classes-dir>":
        problems.append(
            "no target/scala-2.13/classes under the current directory — run "
            "selfcheck from the repo root (provenance cannot be checked elsewhere)")
    elif meta.get("classes_sha256") == "<no-classes-dir>":
        # Verify ran where it couldn't see the compiled classes (e.g. a
        # deployed stale jar) — exactly the scenario the gate exists
        # for; an unprovable artifact is not an acceptable artifact
        problems.append(
            "dump carries no classes fingerprint (Verify ran outside the repo "
            "root / from a jar) — regenerate from an sbt build at the repo root")
    elif meta.get("classes_sha256") != now_fp:
        problems.append(
            f"dump built from classes {meta.get('classes_sha256','?')[:12]}… but "
            f"on-disk classes are {now_fp[:12]}… (rebuild happened after the dump — regenerate)")
    # a filtered run only refreshed a subset: comparing anything beyond
    # that subset would grade other (possibly older-build) dumps as
    # current — the mixed-artifact failure mode
    stamped = set(meta.get("filtered") or [])
    if stamped and (not only or not only.issubset(stamped)):
        problems.append(
            f"dump meta comes from a FILTERED Verify run ({sorted(stamped)}); "
            "full compares (or queries outside the subset) need a full regenerate")
    try:
        head = subprocess.run(["git", "rev-parse", "HEAD"], capture_output=True,
                              text=True, timeout=10).stdout.strip()
        if head and not meta.get("git_sha", "").startswith("<") and meta["git_sha"] != head:
            # classes fingerprint is the hard gate; a moved HEAD with
            # identical classes (commit without source change) is benign
            print(f"WARN dump stamped {meta['git_sha'][:12]} but HEAD is {head[:12]} "
                  "(ok iff classes fingerprint matched)")
    except Exception:
        pass
    if meta.get("git_dirty") is True:
        print("WARN working tree was dirty when the dump was produced "
              f"(sha {meta.get('git_sha','?')[:12]}) — fine mid-iteration, not for a round close")
    return problems


# The driver's fetch path renders DuckDB's wide/exotic types differently
# than fetchall() does (r9 postmortem: all 15 driver-red queries — and ONLY
# those — emitted a HUGEINT column, because sum(BIGINT) returns HUGEINT in
# DuckDB; locally int vs driver-side float64/decimal render → hash
# mismatch with rows+schema green). Only these types are proven
# render-stable across fetch paths; any other output type fails the gate.
SAFE_TYPES = {"BIGINT", "VARCHAR", "INTEGER", "DOUBLE",
              "SMALLINT", "TINYINT", "DATE", "BOOLEAN"}


def unsafe_output_types(con, sql):
    try:
        cols = con.execute(f"DESCRIBE {sql}").fetchall()
    except Exception:
        return []  # the main compare will surface the real error
    return [(c[0], c[1]) for c in cols if c[1] not in SAFE_TYPES]


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
    provenance = check_provenance(out_dir, only)
    for p in provenance:
        print(f"FAIL <provenance>: {p}")
    if provenance:
        print("\nartifact is STALE — rerun: sbt -batch compile && runMain graft.Verify …")
        sys.exit(1)
    con = duckdb.connect()
    # GRAFT_DUCKDB_THREADS caps the oracle's parallelism so a big-SF
    # selfcheck can run alongside a timed Bench without polluting it.
    if os.environ.get("GRAFT_DUCKDB_THREADS"):
        con.execute(f"PRAGMA threads={int(os.environ['GRAFT_DUCKDB_THREADS'])}")
    # GRAFT_DUCKDB_MEMLIMIT (e.g. "48GB") bounds the oracle so a big-SF
    # embedding CROSS JOIN spills instead of tripping the kernel OOM
    # killer into a concurrently-running Verify/Bench JVM (bitten at
    # sf10 in r15: an unbounded DuckDB grew to ~90 GB next to a 64 GB
    # Spark heap and the kernel shot the JVM).
    if os.environ.get("GRAFT_DUCKDB_MEMLIMIT"):
        con.execute(
            f"PRAGMA memory_limit='{os.environ['GRAFT_DUCKDB_MEMLIMIT']}'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # Verify records thrown queries in errors.json (r8 item 2: a query
    # that fails analysis must read as ERR, never as "not sampled")
    err_path = f"{out_dir}/errors.json"
    errors = json.load(open(err_path)) if os.path.exists(err_path) else {}
    # Incremental per-query verdicts (r16): results print AS the loop
    # runs (flushed), so a kernel OOM kill mid-pass leaves a log that
    # names the query in flight instead of an empty file (the r15 sf10
    # postmortem had to bisect by hand). Names are looped in sorted
    # order, so the output ordering is unchanged from the batch form.
    def verdict(line):
        print(line, flush=True)
    fails, passes, skips = [], [], []
    for name in sorted(set(oracle) | set(errors)):
        if only and name not in only:
            continue
        if name in errors:
            fails.append((name, f"ERR in Verify: {errors[name][:300]}"))
            verdict(f"FAIL {name}: {fails[-1][1]}")
            continue
        sql = oracle[name]
        bad_types = unsafe_output_types(con, sql)
        if bad_types:
            fails.append((name, f"oracle emits driver-unsafe output type(s) "
                          f"{bad_types} — CAST to BIGINT/VARCHAR/DOUBLE "
                          "(sum(BIGINT) returns HUGEINT: wrap it)"))
            verdict(f"FAIL {name}: {fails[-1][1]}")
            continue
        pdir = f"{out_dir}/{name}"
        files = glob.glob(f"{pdir}/*.parquet")
        if not files:
            fails.append((name, "no spark output"))
            verdict(f"FAIL {name}: no spark output")
            continue
        # STREAMED compare (r16): both sides advance through fetchmany
        # chunks with incremental hashes — never a full fetchall. At
        # sf10 the whole-table-shaped outputs (q_conform_union & co,
        # ~20M wide VARCHAR rows) cost ~50 GB PER SIDE as python
        # tuples; that python heap — not DuckDB's buffer pool — is
        # what tripped the kernel OOM killer in r15 and in this
        # round's first two attempts (GRAFT_DUCKDB_MEMLIMIT can't see
        # it). Hash/normalization semantics are byte-identical to the
        # old table_hash: same row order (both cursors preserve it),
        # same per-row norm()+\x01/\x02 framing. The spark side reads
        # through a SECOND cursor of the same connection so the two
        # result sets stay independently open.
        CHUNK = 65536
        try:
            cur_sp = con.cursor()
            sp = cur_sp.execute(f"SELECT * FROM read_parquet({files!r})")
            sp_cols = [c[0] for c in sp.description]
            du = con.execute(sql)
            du_cols = [c[0] for c in du.description]
            if sorted(sp_cols) != sorted(du_cols):
                fails.append((name, f"cols spark={sorted(sp_cols)} duck={sorted(du_cols)}"))
                verdict(f"FAIL {name}: {fails[-1][1]}")
                continue
            so = sorted(range(len(sp_cols)), key=lambda i: sp_cols[i])
            do = sorted(range(len(du_cols)), key=lambda i: du_cols[i])
            h_sp, h_du = hashlib.sha256(), hashlib.sha256()
            n_sp = n_du = 0
            first_diff = None
            while True:
                a = sp.fetchmany(CHUNK)
                b = du.fetchmany(CHUNK)
                # normalize ONCE per row; the same strings feed the hash
                # and (only when a chunk pair actually differs) the
                # first-diff scan — the passing-query common case pays
                # zero extra normalization (r16 ADVICE: the old
                # unconditional scan re-norm'd every row a second time)
                na_rows = ["\x01".join(norm(r[j]) for j in so) for r in a]
                nb_rows = ["\x01".join(norm(r[j]) for j in do) for r in b]
                for s in na_rows:
                    h_sp.update(s.encode())
                    h_sp.update(b"\x02")
                for s in nb_rows:
                    h_du.update(s.encode())
                    h_du.update(b"\x02")
                if first_diff is None and na_rows != nb_rows:
                    for i, (ra, rb) in enumerate(zip(na_rows, nb_rows)):
                        if ra != rb:
                            first_diff = (n_sp + i, ra.split("\x01"),
                                          rb.split("\x01"))
                            break
                n_sp += len(a)
                n_du += len(b)
                if not a and not b:
                    break
        except Exception as ex:
            fails.append((name, f"exec error: {str(ex)[:300]}"))
            verdict(f"FAIL {name}: {fails[-1][1]}")
            continue
        if n_sp != n_du:
            fails.append((name, f"rows spark={n_sp} duck={n_du}"))
            verdict(f"FAIL {name}: {fails[-1][1]}")
            continue
        hs, hd = h_sp.hexdigest(), h_du.hexdigest()
        # serializer-parity check: the forensic .rows.txt written by
        # tools/dump_rows.py must hash to exactly what this compare
        # computes from the same parquet — drift there would make the
        # postmortem artifact lie
        rows_txt = f"{out_dir}/{name}.rows.txt"
        if os.path.exists(rows_txt):
            with open(rows_txt) as fh:
                first = fh.readline()
            stamped = first.split("sha256=")[1].split()[0] if "sha256=" in first else "?"
            if stamped != hs:
                fails.append((name, f"forensic rows.txt sha {stamped[:12]}… != "
                              f"computed spark hash {hs[:12]}… (dump_rows drift)"))
                verdict(f"FAIL {name}: {fails[-1][1]}")
                continue
        if hs != hd:
            diff = ""
            if first_diff is not None:
                i, na, nb = first_diff
                diff = f" first diff @row {i}: spark={na} duck={nb}"
            fails.append((name, "hash mismatch" + diff))
            verdict(f"FAIL {name}: {fails[-1][1]}")
        else:
            passes.append(name)
            verdict(f"PASS {name}")
    print(f"\n{len(passes)} pass / {len(fails)} fail")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
