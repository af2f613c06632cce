"""Generate a larger synthetic lake fixture (default sf1) matching
the driver testdata's schemas and distributions (TESTDATA.md), for
local scaling experiments beyond the shipped sf0.1.

The shipped fixtures are read-only and top out at sf0.1 (~600k-row
lineitem) — small enough that fixed costs dominate and scaling claims
extrapolate (VERDICT r04 item 5). This script writes an sf1
(~6M-row lineitem, 10× corpus) under REPO/testdata_sf1/ with the
same tables, schemas, key ranges (nationkey 0-24, src0-19, 10 labels,
unit-norm 64-dim embeddings, 30-day event window), per-order line
counts (1-7), and near-duplicate document structure, so every
registered query runs unmodified and the sf0.01→sf0.1→sf1 timing
curve measures REAL row-scaling, not fixture artifacts.

Deterministic (seed 42 + table-specific offsets). Usage:

    python tools/gen_sf.py [--sf 1.0] [--out testdata_sf1]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = (
    "join hash row batch scan customer column filter small slow merge "
    "order vector line table data agg value key stream window spark a "
    "group part big sort query fast the"
).split()

LANGS = np.array(["en", "zh", "es", "de", "fr"])
LANG_P = np.array([0.44, 0.15, 0.15, 0.13, 0.13])
EVENT_TYPES = np.array(["click", "error", "purchase", "signup", "view"])
PRIORITIES = np.array(
    ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
)
SEGMENTS = np.array(
    ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
)
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
P_NAMES_A = np.array(["small", "red", "blue", "green", "large", "tiny"])
P_NAMES_B = np.array(["ring", "widget", "bolt", "gear", "cog", "pin"])
P_TYPES = np.array(
    ["ECONOMY", "SMALL", "STANDARD", "LARGE", "PROMO", "MEDIUM"]
)


def _write(out: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out, f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows")


def _money(rng, n, lo, hi):
    return np.round(rng.uniform(lo, hi, n), 2)


def gen(sf: float, out: str) -> None:
    os.makedirs(out, exist_ok=True)
    n_cust = int(150_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_part = int(200_000 * sf)
    n_supp = int(10_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_users = int(15_000 * sf)
    n_doc = int(50_000 * sf)
    n_emb = int(20_000 * sf)

    _write(out, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    _write(out, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    rng = np.random.default_rng(42)
    _write(out, "customer", pa.table({
        "c_custkey": np.arange(n_cust, dtype=np.int64),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": rng.integers(0, 25, n_cust).astype(np.int32),
        "c_acctbal": _money(rng, n_cust, -999, 10_000),
        "c_mktsegment": SEGMENTS[rng.integers(0, 5, n_cust)],
    }))

    rng = np.random.default_rng(43)
    _write(out, "supplier", pa.table({
        "s_suppkey": np.arange(n_supp, dtype=np.int64),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": rng.integers(0, 25, n_supp).astype(np.int32),
        "s_acctbal": _money(rng, n_supp, 0, 10_000),
    }))

    rng = np.random.default_rng(44)
    _write(out, "part", pa.table({
        "p_partkey": np.arange(n_part, dtype=np.int64),
        "p_name": np.char.add(
            np.char.add(P_NAMES_A[rng.integers(0, 6, n_part)], " "),
            P_NAMES_B[rng.integers(0, 6, n_part)],
        ),
        "p_brand": np.array(
            [f"Brand#{b}" for b in rng.integers(1, 26, n_part)]
        ),
        "p_type": P_TYPES[rng.integers(0, 6, n_part)],
        "p_size": rng.integers(1, 51, n_part).astype(np.int32),
        "p_retailprice": np.round(900.0 + np.arange(n_part) * 0.1 % 100, 2),
    }))

    rng = np.random.default_rng(45)
    base = np.datetime64("1995-01-01")
    o_dates = base + rng.integers(0, 2404, n_ord).astype("timedelta64[D]")
    _write(out, "orders", pa.table({
        "o_orderkey": np.arange(n_ord, dtype=np.int64),
        "o_custkey": rng.integers(0, n_cust, n_ord),
        "o_orderstatus": np.array(["F", "O", "P"])[rng.integers(0, 3, n_ord)],
        "o_totalprice": _money(rng, n_ord, 1000, 500_000),
        "o_orderdate": o_dates.astype("datetime64[us]"),
        "o_orderpriority": PRIORITIES[rng.integers(0, 5, n_ord)],
    }))

    rng = np.random.default_rng(46)
    per_order = rng.integers(1, 8, n_ord)  # 1..7 lines, mean 4
    okey = np.repeat(np.arange(n_ord, dtype=np.int64), per_order)
    n_li = len(okey)
    lnum = np.concatenate([np.arange(1, c + 1) for c in per_order])
    ship = np.repeat(o_dates, per_order) + rng.integers(
        1, 96, n_li
    ).astype("timedelta64[D]")
    _write(out, "lineitem", pa.table({
        "l_orderkey": okey,
        "l_partkey": rng.integers(0, n_part, n_li),
        "l_suppkey": rng.integers(0, n_supp, n_li),
        "l_linenumber": lnum.astype(np.int32),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": _money(rng, n_li, 900, 105_000),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)],
        "l_linestatus": np.array(["F", "O"])[rng.integers(0, 2, n_li)],
        "l_shipdate": ship.astype("datetime64[us]"),
    }))

    rng = np.random.default_rng(47)
    ev_base = np.datetime64("2024-01-01T00:00:00", "us")
    month_us = 30 * 24 * 3600 * 1_000_000
    offs = np.sort(rng.integers(0, month_us, n_ev))
    _write(out, "events", pa.table({
        "event_id": np.arange(n_ev, dtype=np.int64),
        "ts": (ev_base + offs.astype("timedelta64[us]")),
        "user_id": rng.integers(0, n_users, n_ev),
        "event_type": EVENT_TYPES[rng.integers(0, 5, n_ev)],
        "value": _money(rng, n_ev, 0.01, 500),
        "props": np.array(
            [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_ev)]
        ),
    }))

    # documents: 30-word vocab, ~45-90 words/doc, 'dup' marker in ~5%,
    # ~10% near-copies of an earlier doc (1-word perturbation) so
    # exact/minhash/simhash dedup find real clusters at every SF
    rng = np.random.default_rng(48)
    vocab = np.array(VOCAB)
    texts: list[str] = []
    for i in range(n_doc):
        if i > 0 and rng.random() < 0.10:
            src = texts[int(rng.integers(0, i))]
            words = src.split()
            words[int(rng.integers(0, len(words)))] = vocab[
                int(rng.integers(0, len(vocab)))
            ]
            texts.append(" ".join(words))
            continue
        n_words = int(rng.integers(12, 110))
        words = list(vocab[rng.integers(0, len(vocab), n_words)])
        if rng.random() < 0.05:
            words[int(rng.integers(0, n_words))] = "dup"
        texts.append(" ".join(words))
    _write(out, "documents", pa.table({
        "doc_id": np.arange(n_doc, dtype=np.int64),
        "text": texts,
        "lang": LANGS[rng.choice(5, n_doc, p=LANG_P)],
        "source": np.array([f"src{i % 20}" for i in range(n_doc)]),
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    }))

    # embeddings: 10 label clusters on the unit sphere + noise
    rng = np.random.default_rng(49)
    centers = rng.normal(0, 1, (10, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, 10, n_emb)
    vecs = centers[labels] + rng.normal(0, 0.35, (n_emb, 64))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    _write(out, "embeddings", pa.table({
        "vec_id": np.arange(n_emb, dtype=np.int64),
        "embedding": pa.array(
            vecs.astype(np.float32).tolist(), pa.list_(pa.float32())
        ),
        "label": labels.astype(np.int32),
    }))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument(
        "--out",
        default=os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "testdata_sf1"),
    )
    a = ap.parse_args()
    print(f"generating sf={a.sf} → {a.out}")
    gen(a.sf, a.out)
