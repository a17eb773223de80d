"""Generate LARGER scale-factor fixtures for scaling measurements.

The driver ships sf0.001/0.01/0.1 under /root/testdata (read-only);
the r11 verdict's ask #2 is to PROVE the scale-motivated persists at
a larger SF. This writes schema-identical synthetic tables whose
distributions mimic the observed driver data (measured via DuckDB on
sf0.1 — vocab, value ranges, category sets, near-dup planting, join
fan-outs), at any SF, into a SEPARATE directory. It never touches
/root/testdata.

The absolute values differ from the driver's generator (different
RNG), so cross-engine correctness at these SFs is still exact (Spark
and DuckDB read the same parquet) while per-query wall times are only
compared across THIS generator's own SFs (a generator-consistent
sf0.1 leg is generated alongside sf1 so the 0.1 -> 1 exponent never
mixes generators).

Observed distribution facts reproduced (sf0.1, seed-42 driver data):
- row counts per SF: customer 150k, supplier 10k, part 200k, orders
  1.5M, lineitem 6M, events 1M, documents 50k, embeddings 20k per
  unit SF x10 (nation/region fixed at 25/5);
- documents: 30-word query-engine vocab, 5 langs x 20 sources,
  ~9-110 words/doc, ~5% of docs have a near-dup partner (same text +
  " dup" appended) and ~0.16% an exact-dup partner — near-dup pair
  count scales LINEARLY with the corpus, which is what keeps banding
  gates honest at scale;
- embeddings: unit-normalized 64-dim float32 Gaussians, labels
  uniform 0..9 (no cluster structure — matches observed same-label
  vs cross-label cosine of ~0.00);
- lineitem: qty uniform 1..50, discount 0..0.10 (2dp), tax 0..0.08
  (2dp), extendedprice ~ uniform(900, 105000) UNCORRELATED with qty,
  lines/order ~ Poisson(4), linenumber uniform 1..7 (duplicates per
  order exist in the driver data too), shipdate uniform day-grain
  1995-2001 independent of orderdate;
- orders: status F/O/P, priority 1..5 uniform, totalprice uniform
  ~1000..500000 (uncorrelated with line sums — the reconciliation
  audit query EXPECTS mismatches), orderdate uniform day-grain
  1995-2001;
- events: 5 types uniform, ts uniform over Jan 2024, value ~
  Exp(mean 50), props = {"k": 0..99} JSON.

Usage: python scripts/gen_fixtures.py --sf 1 --out /root/testdata_big
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "the",
    "row", "agg", "key", "query", "a", "scan", "batch",
]
LANGS = ["de", "en", "es", "fr", "zh"]
SEGMENTS = ["MACHINERY", "AUTOMOBILE", "BUILDING", "HOUSEHOLD", "FURNITURE"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
ADJS = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
NOUNS = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]

DAY_US = 86_400_000_000  # microseconds


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    path = os.path.join(out_dir, f"{name}.parquet")
    pq.write_table(table, path, compression="snappy")
    print(f"wrote {path} ({table.num_rows} rows)")


def _ts_col(us: np.ndarray) -> pa.Array:
    return pa.array(us.astype("int64"), type=pa.timestamp("us"))


def generate(sf: float, out_dir: str, seed: int = 42) -> None:
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_doc = int(50_000 * sf)
    n_emb = int(20_000 * sf)

    # region / nation (fixed)
    _write(out_dir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    _write(out_dir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    # customer
    _write(out_dir, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": pa.array(
            np.array(SEGMENTS)[rng.integers(0, 5, n_cust)]
        ),
    }))

    # supplier
    _write(out_dir, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
    }))

    # part
    adj = np.array(ADJS)[rng.integers(0, 8, n_part)]
    noun = np.array(NOUNS)[rng.integers(0, 8, n_part)]
    _write(out_dir, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": [f"{a} {n}" for a, n in zip(adj, noun)],
        "p_brand": [f"Brand#{b}" for b in rng.integers(0, 25, n_part)],
        "p_type": pa.array(np.array(PTYPES)[rng.integers(0, 6, n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(
            900.0 + (np.arange(n_part) % 1000) / 10.0, 2
        ),
    }))

    # orders: day-grain dates over 1995-01-01 .. 2001-08-01
    epoch_1995 = np.datetime64("1995-01-01").astype(
        "datetime64[us]"
    ).astype("int64")
    n_days = 2405
    odate = epoch_1995 + rng.integers(0, n_days, n_ord) * DAY_US
    _write(out_dir, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": pa.array(
            np.array(["F", "O", "P"])[rng.integers(0, 3, n_ord)]
        ),
        "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
        "o_orderdate": _ts_col(odate),
        "o_orderpriority": pa.array(np.array([
            "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW",
        ])[rng.integers(0, 5, n_ord)]),
    }))

    # lineitem: lines/order ~ Poisson(4) (floor 0 -> some orders empty,
    # as observed), attributes independent of the header
    lines_per = rng.poisson(4.0, n_ord)
    okeys = np.repeat(np.arange(n_ord), lines_per)
    n_li = len(okeys)
    sdate = epoch_1995 + rng.integers(1, n_days + 95, n_li) * DAY_US
    _write(out_dir, "lineitem", pa.table({
        "l_orderkey": pa.array(okeys, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, n_li), pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype("float64"),
        "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": pa.array(
            np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)]
        ),
        "l_linestatus": pa.array(
            np.array(["F", "O"])[rng.integers(0, 2, n_li)]
        ),
        "l_shipdate": _ts_col(sdate),
    }))

    # events: Jan 2024, value ~ Exp(50), props JSON
    epoch_2024 = np.datetime64("2024-01-01").astype(
        "datetime64[us]"
    ).astype("int64")
    ets = epoch_2024 + rng.integers(0, 30 * DAY_US, n_ev)
    _write(out_dir, "events", pa.table({
        "event_id": pa.array(np.arange(n_ev), pa.int64()),
        "ts": _ts_col(ets),
        "user_id": pa.array(rng.integers(0, n_cust // 10, n_ev), pa.int64()),
        "event_type": pa.array(
            np.array(EVENT_TYPES)[rng.integers(0, 5, n_ev)]
        ),
        "value": np.round(rng.exponential(50.0, n_ev), 2),
        "props": [
            '{"k": %d}' % k for k in rng.integers(0, 100, n_ev)
        ],
    }))

    # documents: vocab texts + linear near-dup planting
    vocab = np.array(VOCAB)
    n_base = n_doc
    lens = rng.integers(9, 111, n_base)
    texts = [
        " ".join(vocab[rng.integers(0, len(vocab), ln)]) for ln in lens
    ]
    # ~5% near-dup partners (base text + " dup"), ~0.16% exact dups:
    # overwrite a deterministic pseudo-random 5% of docs with a
    # partner's text so pair counts grow linearly in n_doc
    n_near = int(0.05 * n_doc)
    n_exact = max(1, int(0.0016 * n_doc))
    victims = rng.choice(n_doc, size=n_near + n_exact, replace=False)
    partners = rng.integers(0, n_doc, n_near + n_exact)
    for i in range(n_near):
        v, p = victims[i], partners[i]
        if v != p:
            texts[v] = texts[p] + " dup"
    for i in range(n_near, n_near + n_exact):
        v, p = victims[i], partners[i]
        if v != p:
            texts[v] = texts[p]
    _write(out_dir, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc), pa.int64()),
        "text": texts,
        "lang": pa.array(np.array(LANGS)[rng.integers(0, 5, n_doc)]),
        "source": pa.array(
            [f"src{s}" for s in rng.integers(0, 20, n_doc)]
        ),
        "n_chars": pa.array(
            np.array([len(t) for t in texts]), pa.int64()
        ),
    }))

    # embeddings: unit-norm 64-dim float32, labels uniform 0..9
    vecs = rng.standard_normal((n_emb, 64))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    vecs = vecs.astype("float32")
    _write(out_dir, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n_emb), pa.int32()),
    }))

    with open(os.path.join(out_dir, "GENERATED.json"), "w") as f:
        json.dump({"sf": sf, "seed": seed, "generator": "gen_fixtures.py"}, f)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, required=True)
    ap.add_argument("--out", default="/root/testdata_big")
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()
    out_dir = os.path.join(args.out, f"sf{args.sf:g}")
    generate(args.sf, out_dir, args.seed)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
