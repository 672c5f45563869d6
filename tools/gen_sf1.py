#!/usr/bin/env python3
"""Generate a local sf1 (10x sf0.1 rows) for events/documents/embeddings.

Scale-curve smoke data (round-4 verdict item 8): same distributions as the
driver corpus (vocab, token-length mix, lang/source shares, event types,
ts span, embedding dim), 10x the rows, fully seeded. Written to
/tmp/sf1 — only the RESULTING time-vs-rows table is committed
(BASELINE.md); the data itself is reproducible from this script.

Dev tooling only (python/duckdb/pyarrow are the driver-side stack the
oracle already uses) — nothing in src/ depends on this.
"""
import hashlib
import json
import random
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import duckdb

TABLES = ["documents", "events", "embeddings", "customer", "supplier",
          "part", "orders", "lineitem", "region", "nation"]
MANIFEST = __file__.rsplit("/", 1)[0] + "/sf1_manifest.json"


def md5s(d):
    out = {}
    for t in TABLES:
        h = hashlib.md5()
        with open(f"{d}/{t}.parquet", "rb") as f:
            for chunk in iter(lambda: f.read(1 << 20), b""):
                h.update(chunk)
        out[t] = h.hexdigest()
    return out


def check(d):
    """Byte-verify a regenerated sf1 corpus against the committed manifest
    (round-10 verdict item 4): a silent generator/env drift would
    invalidate the 10x-scale gate, so the bench/correctness tooling calls
    this before trusting DIR as 'the' sf1 corpus. Returns error or None."""
    try:
        want = json.load(open(MANIFEST))["md5"]
    except FileNotFoundError:
        return f"no committed manifest at {MANIFEST}"
    try:
        got = md5s(d)
    except FileNotFoundError as e:
        return f"sf1 corpus incomplete under {d}: {e}"
    bad = [t for t in TABLES if got[t] != want.get(t)]
    if bad:
        return (f"sf1 corpus under {d} does NOT match the committed "
                f"manifest (tables: {', '.join(bad)}) — regenerate with "
                f"tools/gen_sf1.py or fix the generator env before gating")
    return None


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "--check":
    err = check(sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1")
    if err:
        sys.exit(err)
    print("sf1 corpus matches the committed manifest")
    sys.exit(0)

if __name__ == "__main__":
    OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    SRC = "/root/testdata/sf0.1"
    rng = random.Random(20260813)
    nprng = np.random.default_rng(20260813)

    import os
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()

    # ---- documents: 50k rows, same vocab + length/lang/source mix ----------
    vocab = [r[0] for r in con.execute(
        f"SELECT DISTINCT unnest(string_split(text,' ')) AS t FROM '{SRC}/documents.parquet' ORDER BY t").fetchall()]
    langs, lang_w = zip(*con.execute(
        f"SELECT lang, count(*) FROM '{SRC}/documents.parquet' GROUP BY 1 ORDER BY 1").fetchall())
    sources = [f"src{i}" for i in range(20)]
    N_DOC = 50000
    doc_rows = {"doc_id": [], "text": [], "lang": [], "source": [], "n_chars": []}
    for i in range(N_DOC):
        n_tok = rng.randint(10, 100)
        text = " ".join(rng.choice(vocab) for _ in range(n_tok))
        doc_rows["doc_id"].append(i)
        doc_rows["text"].append(text)
        doc_rows["lang"].append(rng.choices(langs, weights=lang_w)[0])
        doc_rows["source"].append(rng.choice(sources))
        doc_rows["n_chars"].append(len(text))
    pq.write_table(pa.table({
        "doc_id": pa.array(doc_rows["doc_id"], pa.int64()),
        "text": pa.array(doc_rows["text"], pa.string()),
        "lang": pa.array(doc_rows["lang"], pa.string()),
        "source": pa.array(doc_rows["source"], pa.string()),
        "n_chars": pa.array(doc_rows["n_chars"], pa.int64()),
    }), f"{OUT}/documents.parquet")

    # ---- embeddings: 20k rows, dim 64 float, label 0..9 --------------------
    N_EMB = 20000
    emb = nprng.standard_normal((N_EMB, 64)).astype(np.float32)
    pq.write_table(pa.table({
        "vec_id": pa.array(range(N_EMB), pa.int64()),
        "embedding": pa.array([e.tolist() for e in emb], pa.list_(pa.float32())),
        "label": pa.array([i % 10 for i in range(N_EMB)], pa.int32()),
    }), f"{OUT}/embeddings.parquet")

    # ---- events: 1M rows, ts MICROS (the post-round-5 corpus unit) over the
    # same month --------------------------------------------------------------
    N_EV = 1000000
    types = ["click", "error", "purchase", "signup", "view"]
    base_us = 1704067200 * 10**6  # 2024-01-01 UTC
    span_us = 29 * 24 * 3600 * 10**6
    ts = np.sort(nprng.integers(0, span_us, N_EV)) + base_us
    pq.write_table(pa.table({
        "event_id": pa.array(range(N_EV), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(nprng.integers(0, 20000, N_EV), pa.int64()),
        "event_type": pa.array([types[i] for i in nprng.integers(0, 5, N_EV)], pa.string()),
        "value": pa.array(np.round(nprng.exponential(80.0, N_EV), 2), pa.float64()),
        "props": pa.array(['{"k": %d}' % k for k in nprng.integers(0, 100, N_EV)], pa.string()),
    }), f"{OUT}/events.parquet")

    # ---- TPC-H tables: 10 disjoint key-shifted copies of the sf0.1 rows ----
    # (the standard SF-scaling shape: per-copy join selectivities are
    # preserved, cross-copy keys never match — so joins/aggs see 10x input
    # AND 10x output, the honest linear reference). region/nation are fixed
    # dimensions at every SF and are copied as-is.
    SHIFT = 10**7  # > any sf0.1 key
    for t, keys in [
        ("customer", ["c_custkey"]),
        ("supplier", ["s_suppkey", "s_nationkey=KEEP"]),
        ("part", ["p_partkey"]),
        ("orders", ["o_orderkey", "o_custkey"]),
        ("lineitem", ["l_orderkey", "l_partkey", "l_suppkey"]),
    ]:
        cols = [d[0] for d in con.execute(
            f"SELECT * FROM '{SRC}/{t}.parquet' LIMIT 0").description]
        shift_keys = {k.split("=")[0] for k in keys if not k.endswith("=KEEP")}
        sel = ", ".join(
            f"{c} + i * {SHIFT} AS {c}" if c in shift_keys else c for c in cols)
        con.execute(
            f"COPY (SELECT {sel} FROM '{SRC}/{t}.parquet', "
            f"generate_series(0, 9) AS g(i)) TO '{OUT}/{t}.parquet' (FORMAT PARQUET)")
    for t in ["region", "nation"]:
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{OUT}/{t}.parquet' (FORMAT PARQUET)")

    print("wrote", OUT)
    for t in TABLES:
        print(t, con.execute(f"SELECT count(*) FROM '{OUT}/{t}.parquet'").fetchone()[0])

    # Per-table md5 manifest (verdict item 4): the generator is
    # byte-deterministic by construction (seeded rng/np rng; duckdb COPY of a
    # deterministic relation), so the md5s are a property of the RECIPE, and
    # the committed tools/sf1_manifest.json lets every later gate verify a
    # regenerated corpus instead of assuming it. Versions are recorded because
    # a pyarrow/duckdb upgrade MAY legitimately re-encode the same rows into
    # different bytes — that shows up here as a manifest bump with a reason,
    # not as silent drift.
    manifest = {
        "md5": md5s(OUT),
        "generator": "tools/gen_sf1.py seed 20260813",
        "versions": {"pyarrow": pa.__version__, "duckdb": duckdb.__version__,
                     "numpy": np.__version__},
    }
    print(json.dumps(manifest, indent=1))
    if not os.path.exists(MANIFEST):
        json.dump(manifest, open(MANIFEST, "w"), indent=1)
        print("committed new manifest:", MANIFEST)
    else:
        err = check(OUT)
        print("manifest check:", err or "OK — matches committed manifest")
