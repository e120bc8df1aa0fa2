#!/usr/bin/env python3
"""Deterministic sf-scale testdata generator (VERDICT r10 item 1: the
scale-up proof sweep needs an sf1 = 10x sf0.1 dataset, and
/root/testdata is read-only).

Mirrors the driver testdata's schema, dtypes, value ranges and the
STRUCTURES the operators exercise, all measured off the read-only
sf0.1 tables (see the per-table notes inline):
  - fixed region/nation dims; linear customer/supplier/part/orders/
    lineitem/events; documents = max(500, 50000*sf),
    embeddings = max(500, 20000*sf), users = 15000*sf;
  - FIXED time windows at every sf (events: Jan 2024; orders:
    1995..2001) — scale raises DENSITY, not span, exactly like the
    driver data (verified sf0.01 vs sf0.1);
  - documents: 30-token vocab, uniform lengths 10..100, ~5% near-dup
    children (parent text + " dup" suffix; chains and exact-dup
    collisions emerge naturally), lang weights en/.41 zh/.15 es/.15
    fr/.15 de/.14, source = src{doc_id %% 20};
  - embeddings: 64-dim L2-normalized gaussian float32, labels 0..9
    (measured sf0.1 label-mean separation is exactly the null
    expectation of random unit vectors, so no planted cluster signal).

NOT the driver's RNG — correctness at any sf is Spark-vs-DuckDB on
the SAME files, so only the distributions matter, not the draws.

Usage: python3 tools/gen_sf.py <sf> <outDir> [--vocab=zipf] [--embed=planted]

--vocab=zipf (VERDICT r14 item 3): swaps ONLY the documents table for
a REALISTIC corpus — ~50k word types drawn Zipf(s=1.07) (natural-
language-like: a fat head of stopwords, a long tail of hapaxes),
lognormal doc lengths, and near-dup children made by token-level
mutation (drop/replace ~8%% of tokens) instead of a " dup" suffix.
The synthetic default has a 30-token vocabulary where RANDOM pairs
share Jaccard≈0.6 — a pathologically dense similarity graph; every
LSH census, S-curve advisor and cap sizing deserves one validation
run on a corpus where random pairs are near-disjoint, which is what
this mode provides. Other tables are identical to the default so the
whole 400-query Verify can run against the dir.
"""
import sys, os, json
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42

ADJ = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
NOUN = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
PTYPE = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_W = [0.41, 0.15, 0.15, 0.15, 0.14]
VOCAB = ["a", "agg", "batch", "big", "column", "customer", "data", "fast",
         "filter", "group", "hash", "join", "key", "line", "merge", "order",
         "part", "query", "row", "scan", "slow", "small", "sort", "spark",
         "stream", "table", "the", "value", "vector", "window"]  # 30 + 'dup'

US_PER_DAY = 86_400_000_000


def day_us(y, m, d):
    import datetime
    dt = datetime.datetime(y, m, d, tzinfo=datetime.timezone.utc)
    return int(dt.timestamp() * 1_000_000)


def write(out, name, table):
    pq.write_table(table, os.path.join(out, f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows")


def ts_col(us):  # int64 micros -> timestamp[us]
    return pa.array(np.asarray(us, dtype=np.int64), type=pa.timestamp("us"))


def main(sf, out, vocab_mode="synthetic", embed_mode="gaussian"):
    rng = np.random.default_rng(SEED)
    os.makedirs(out, exist_ok=True)

    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_li = int(6_000_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_user = int(15_000 * sf)
    n_doc = max(500, int(50_000 * sf))
    n_vec = max(500, int(20_000 * sf))

    write(out, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS}))
    write(out, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32())}))

    write(out, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": pa.array(np.array(SEGMENTS)[rng.integers(0, 5, n_cust)])}))

    write(out, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2)}))

    # p_retailprice = 900 + (key % 1000)/10, exactly as measured
    pk = np.arange(n_part)
    write(out, "part", pa.table({
        "p_partkey": pa.array(pk, pa.int64()),
        "p_name": [f"{ADJ[a]} {NOUN[b]}" for a, b in
                   zip(rng.integers(0, 8, n_part), rng.integers(0, 8, n_part))],
        "p_brand": [f"Brand#{i}" for i in rng.integers(0, 25, n_part)],
        "p_type": pa.array(np.array(PTYPE)[rng.integers(0, 6, n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": 900.0 + (pk % 1000) / 10.0}))

    od_lo, od_hi = day_us(1995, 1, 1), day_us(2001, 8, 1)
    odate = (od_lo + rng.integers(0, (od_hi - od_lo) // US_PER_DAY + 1, n_ord)
             * US_PER_DAY)
    write(out, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": pa.array(np.array(["O", "P", "F"])[rng.integers(0, 3, n_ord)]),
        "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
        "o_orderdate": ts_col(odate),
        "o_orderpriority": pa.array(np.array(PRIORITIES)[rng.integers(0, 5, n_ord)])}))

    sd_lo, sd_hi = day_us(1995, 1, 2), day_us(2001, 11, 4)
    sdate = (sd_lo + rng.integers(0, (sd_hi - sd_lo) // US_PER_DAY + 1, n_li)
             * US_PER_DAY)
    write(out, "lineitem", pa.table({
        "l_orderkey": pa.array(rng.integers(0, n_ord, n_li), pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, n_li), pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
        "l_discount": rng.integers(0, 11, n_li) / 100.0,
        "l_tax": rng.integers(0, 9, n_li) / 100.0,
        "l_returnflag": pa.array(np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)]),
        "l_linestatus": pa.array(np.array(["F", "O"])[rng.integers(0, 2, n_li)]),
        "l_shipdate": ts_col(sdate)}))

    ev_lo, ev_hi = day_us(2024, 1, 1), day_us(2024, 1, 31)
    ets = np.sort(rng.integers(ev_lo, ev_hi, n_ev))
    kprops = rng.integers(0, 100, n_ev)
    write(out, "events", pa.table({
        "event_id": pa.array(np.arange(n_ev), pa.int64()),
        "ts": ts_col(ets),
        "user_id": pa.array(rng.integers(0, n_user, n_ev), pa.int64()),
        "event_type": pa.array(np.array(EVENT_TYPES)[rng.integers(0, 5, n_ev)]),
        "value": np.round(rng.exponential(50.0, n_ev), 2),
        "props": [f'{{"k": {k}}}' for k in kprops]}))

    # documents: ~5% are near-dup children (parent + " dup"); chains
    # and exact-dup collisions arise when children share a parent or a
    # dup'd doc is re-picked — the measured sf0.1 structure
    texts = []
    lang_idx = rng.choice(len(LANGS), n_doc, p=LANG_W)
    lengths = rng.integers(10, 101, n_doc)
    dup_flags = rng.random(n_doc) < 0.05
    if vocab_mode == "zipf":
        # ~50k types, Zipf-ranked: P(rank r) ∝ 1/r^1.07 (s just over 1
        # keeps the tail heavy enough that most types are rare). Doc
        # lengths lognormal (median ~55 tokens, capped 10..400). Near-
        # dup children mutate ~8% of the parent's tokens in place, the
        # structure real near-dup detectors face (high-but-<1 Jaccard,
        # shared shingle runs), instead of the suffix trick.
        v_n = 50_000
        zvocab = np.array([f"w{i}" for i in range(v_n)])
        zw = 1.0 / np.power(np.arange(1, v_n + 1), 1.07)
        zw /= zw.sum()
        lengths = np.clip(np.exp(rng.normal(4.0, 0.6, n_doc)), 10, 400).astype(int)
        tok_lists = []
        for i in range(n_doc):
            if i > 0 and dup_flags[i]:
                parent = tok_lists[int(rng.integers(0, i))]
                child = list(parent)
                n_mut = max(1, int(0.08 * len(child)))
                for j in rng.integers(0, len(child), n_mut):
                    if rng.random() < 0.5 and len(child) > 10:
                        child[int(j) % len(child)] = None  # drop
                    else:
                        child[int(j) % len(child)] = zvocab[
                            int(rng.choice(v_n, p=zw))]
                tok_lists.append([t for t in child if t is not None])
            else:
                tok_lists.append(list(
                    zvocab[rng.choice(v_n, lengths[i], p=zw)]))
        texts = [" ".join(t) for t in tok_lists]
    else:
        for i in range(n_doc):
            if i > 0 and dup_flags[i]:
                texts.append(texts[int(rng.integers(0, i))] + " dup")
            else:
                toks = np.array(VOCAB)[rng.integers(0, len(VOCAB), lengths[i])]
                texts.append(" ".join(toks))
    write(out, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc), pa.int64()),
        "text": texts,
        "lang": pa.array(np.array(LANGS)[lang_idx]),
        "source": [f"src{i % 20}" for i in range(n_doc)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64())}))

    if embed_mode == "planted":
        # --embed=planted (ADVICE r14 item 3): label-aligned CLUSTERS
        # plus planted NEAR-DUP children, so the semantic-dedup / kNN /
        # decontam faces are validated on vectors with real structure
        # instead of the gaussian null. Geometry (unit vectors; noise
        # sigmas below are PER-DIM, so a 64-dim noise vector's NORM is
        # sigma*8 — the first cut of this generator used 0.6 per-dim,
        # i.e. noise norm 4.8, and buried the clusters entirely):
        #   member = 0.8*center + noise(per-dim 0.075, norm~0.6)
        #   -> E[cos] within a cluster ~0.64, across clusters ~0 —
        #   straddles the engines' 0.5 cosine gates, so threshold
        #   sweeps see a real knee;
        #   child = normalize(parent + noise(per-dim 0.04, norm~0.32))
        #   -> cos ~0.95, the true-positive band every embedding
        #   near-dup detector gates on. ~5% children, parent's label
        #   inherited (clusters stay pure); chains arise when a child
        #   is re-picked as parent.
        centers = rng.standard_normal((10, 64)).astype(np.float32)
        centers /= np.linalg.norm(centers, axis=1, keepdims=True)
        labels = rng.integers(0, 10, n_vec)
        emb = (0.8 * centers[labels]
               + 0.075 * rng.standard_normal((n_vec, 64)).astype(np.float32))
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        vdup = rng.random(n_vec) < 0.05
        for i in range(1, n_vec):
            if vdup[i]:
                p = int(rng.integers(0, i))
                emb[i] = emb[p] + 0.04 * rng.standard_normal(64).astype(np.float32)
                emb[i] /= np.linalg.norm(emb[i])
                labels[i] = labels[p]
        emb = emb.astype(np.float32)
        labels = labels.astype(np.int32)
    else:
        emb = rng.standard_normal((n_vec, 64)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        labels = rng.integers(0, 10, n_vec).astype(np.int32)
    write(out, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_vec), pa.int64()),
        "embedding": pa.array([v for v in emb.tolist()],
                              pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32())}))

    with open(os.path.join(out, "GEN_META.json"), "w") as f:
        json.dump({"sf": sf, "seed": SEED, "generator": "tools/gen_sf.py",
                   "vocab": vocab_mode, "embed": embed_mode}, f)


if __name__ == "__main__":
    mode = "zipf" if "--vocab=zipf" in sys.argv[3:] else "synthetic"
    emb_mode = "planted" if "--embed=planted" in sys.argv[3:] else "gaussian"
    main(float(sys.argv[1]), sys.argv[2], mode, emb_mode)
