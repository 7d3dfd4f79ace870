"""Deterministic synthetic-table generator matching the driver's
TESTDATA.md schema/distribution profile, for oracle-gate runs at scale
factors the sandbox does not ship (CLAUDE.md: value-hash parity bugs
can surface only at larger sf; VERDICT r4 next #4 asks for one green
gate at sf>=0.3).

Profiles were measured off /root/testdata/sf0.01 and sf0.1 (see
PLANS.md round-5 note): row counts scale linearly per table (customer
150k/sf, supplier 10k/sf, part 200k/sf, orders 1.5M/sf, lineitem
6M/sf, events 1M/sf, documents 50k/sf, embeddings 20k/sf), events span
exactly 2024-01-01..2024-01-31 with Exponential(mean 50) values,
documents are word-salad over the same ~30-token vocab with the
en-heavy lang mix, embeddings are unit-norm 64-dim vectors around 10
seeded cluster centers. Seeded numpy throughout — same sf, same bytes.

Usage: python tools/gen_sf.py --sf 0.3 [--out .testdata/sf0.3]
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np
import pandas as pd

VOCAB = ("spark column row line query big fast data stream window table "
         "order customer part scan sort small value filter hash group "
         "batch merge join key slow vector agg the a").split()
LANGS = ["en", "es", "fr", "de", "zh"]
LANG_P = [0.4, 0.15, 0.15, 0.15, 0.15]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
PADJ = ["large", "hot", "cold", "small", "bright", "dark", "smooth"]
PNOUN = ["ring", "bolt", "gear", "cap", "valve", "pin", "disk"]
ETYPES = ["click", "view", "purchase", "signup", "error"]


def _write(out, name, df):
    path = os.path.join(out, f"{name}.parquet")
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            # Spark cannot read TIMESTAMP(NANOS) parquet; the driver's
            # tables are microsecond like the reference profile
            df[c] = df[c].astype("datetime64[us]")
    df.to_parquet(path, index=False)
    print(f"{name}: {len(df)} rows -> {path}")


def generate(sf: float, out: str, seed: int = 42) -> None:
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(seed)
    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_li = int(6_000_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_doc = max(500, int(50_000 * sf))
    n_emb = max(500, int(20_000 * sf))

    _write(out, "region", pd.DataFrame({
        "r_regionkey": np.arange(5, dtype=np.int64),
        "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
    }))
    _write(out, "nation", pd.DataFrame({
        "n_nationkey": np.arange(25, dtype=np.int64),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": (np.arange(25) % 5).astype(np.int64),
    }))
    _write(out, "customer", pd.DataFrame({
        "c_custkey": np.arange(n_cust, dtype=np.int64),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": rng.integers(0, 25, n_cust),
        "c_acctbal": np.round(rng.uniform(-999, 9999, n_cust), 2),
        "c_mktsegment": rng.choice(SEGMENTS, n_cust),
    }))
    _write(out, "supplier", pd.DataFrame({
        "s_suppkey": np.arange(n_supp, dtype=np.int64),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": rng.integers(0, 25, n_supp),
        "s_acctbal": np.round(rng.uniform(-999, 9999, n_supp), 2),
    }))
    _write(out, "part", pd.DataFrame({
        "p_partkey": np.arange(n_part, dtype=np.int64),
        "p_name": [f"{rng.choice(PADJ)} {rng.choice(PNOUN)}"
                   for _ in range(n_part)],
        "p_brand": [f"Brand#{int(b)}" for b in rng.integers(1, 26, n_part)],
        "p_type": rng.choice(PTYPES, n_part),
        "p_size": rng.integers(1, 51, n_part).astype(np.int32),
        "p_retailprice": np.round(900.0 + 0.1 * np.arange(n_part), 2),
    }))

    odate = (pd.Timestamp("1995-01-01")
             + pd.to_timedelta(rng.integers(0, 2404, n_ord), unit="D"))
    _write(out, "orders", pd.DataFrame({
        "o_orderkey": np.arange(n_ord, dtype=np.int64),
        "o_custkey": rng.integers(0, n_cust, n_ord),
        "o_orderstatus": rng.choice(["F", "O", "P"], n_ord,
                                    p=[0.49, 0.49, 0.02]),
        "o_totalprice": np.round(rng.uniform(1000, 500_000, n_ord), 2),
        "o_orderdate": odate,
        "o_orderpriority": rng.choice(PRIORITIES, n_ord),
    }))

    l_ok = rng.integers(0, n_ord, n_li)
    qty = rng.integers(1, 51, n_li).astype(np.float64)
    unit = rng.uniform(900, 2100, n_li)
    ship = (pd.Timestamp("1995-01-01")
            + pd.to_timedelta(rng.integers(1, 2500, n_li), unit="D"))
    _write(out, "lineitem", pd.DataFrame({
        "l_orderkey": l_ok,
        "l_partkey": rng.integers(0, n_part, n_li),
        "l_suppkey": rng.integers(0, n_supp, n_li),
        "l_linenumber": rng.integers(1, 8, n_li).astype(np.int32),
        "l_quantity": qty,
        "l_extendedprice": np.round(qty * unit, 2),
        "l_discount": np.round(rng.uniform(0, 0.10, n_li), 2),
        "l_tax": np.round(rng.uniform(0, 0.08, n_li), 2),
        "l_returnflag": rng.choice(["A", "N", "R"], n_li),
        "l_linestatus": rng.choice(["F", "O"], n_li),
        "l_shipdate": ship,
    }))

    span = 30 * 86400.0
    ets = np.sort(rng.uniform(0, span, n_ev))
    _write(out, "events", pd.DataFrame({
        "event_id": np.arange(n_ev, dtype=np.int64),
        "ts": pd.Timestamp("2024-01-01")
        + pd.to_timedelta((ets * 1e6).astype(np.int64), unit="us"),
        "user_id": rng.integers(0, max(int(15_000 * sf), 10), n_ev),
        "event_type": rng.choice(ETYPES, n_ev),
        "value": np.round(rng.exponential(50.0, n_ev), 2),
        "props": [json.dumps({"k": int(k)})
                  for k in rng.integers(0, 100, n_ev)],
    }))

    n_words = rng.integers(8, 101, n_doc)
    texts = [" ".join(rng.choice(VOCAB, size=w)) for w in n_words]
    _write(out, "documents", pd.DataFrame({
        "doc_id": np.arange(n_doc, dtype=np.int64),
        "text": texts,
        "lang": rng.choice(LANGS, n_doc, p=LANG_P),
        "source": [f"src{int(s)}" for s in rng.integers(0, 20, n_doc)],
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    }))

    centers = rng.normal(size=(10, 64))
    labels = rng.integers(0, 10, n_emb)
    vecs = centers[labels] + rng.normal(scale=0.6, size=(n_emb, 64))
    vecs = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    _write(out, "embeddings", pd.DataFrame({
        "vec_id": np.arange(n_emb, dtype=np.int64),
        "embedding": [v.astype(np.float32).tolist() for v in vecs],
        "label": labels.astype(np.int32),
    }))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, required=True)
    ap.add_argument("--out", default=None)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()
    out = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".testdata", f"sf{args.sf:g}")
    generate(args.sf, out, seed=args.seed)
