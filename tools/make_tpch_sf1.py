"""Deterministic dbgen-SHAPED TPC-H sf1 in the driver's trimmed
schema.

`testdata_sf1` (tools/make_scale_data.py) is a key-offset 10× of
sf0.1 — right for growth exponents, wrong for TPC-H selectivity and
skew: the driver's tables draw every column independently uniform,
while dbgen correlates dates, ties return flags to a current-date
cutoff, skips every third customer (q13/q22's anti-join tail), ties
candidate suppliers to parts (q21's per-order supplier multiplicity)
and prices lineitems from the part's retail price.  This generator
reproduces those STRUCTURAL properties at dbgen sf1 cardinalities —
150k customers, 10k suppliers, 200k parts, 1.5M orders, ~6M lineitem
— while keeping the driver's column domains (brand/type/name
vocabularies, 1995–2001 date window) so every adapted catalog query
and its DuckDB oracle runs unchanged.

dbgen structure reproduced (TPC-H spec §4.2.2-4.2.3 clause by
clause; spec is public):
- lines per order uniform 1..7 (≈4 avg → 6.0M lines);
- o_custkey drawn only from custkey % 3 != 0 (a third of customers
  never order);
- l_shipdate = o_orderdate + U(1,121) days; receipt = ship + U(1,30);
  l_returnflag = R|A (50/50) when receipt ≤ CURRENT else N;
  l_linestatus = F when ship ≤ CURRENT else O (CURRENT = the window
  midpoint, mirroring dbgen's 1995-06-17);
- o_orderstatus = F when all lines F, O when all O, else P;
- p_retailprice = (90000 + (pk/10 % 20001) + 100·(pk % 1000))/100;
- l_extendedprice = l_quantity · p_retailprice(partkey);
- o_totalprice = Σ extprice·(1+tax)·(1−discount);
- l_suppkey = (partkey + i·(S/4 + (partkey + S − 1)/S)) % S,
  i ∈ U(0,3) — each part has 4 candidate suppliers.

Writes /root/repo/testdata_tpch_sf1/*.parquet (plus the non-TPCH
tables copied from testdata_sf1 so the oracle harness can register
all ten views).  Usage:

    python tools/make_tpch_sf1.py [out_dir] [scale]
"""

from __future__ import annotations

import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 901
SRC = "/root/testdata/sf0.1"          # region/nation verbatim
AUX = "/root/repo/testdata_sf1"       # events/documents/embeddings

SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
            "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
              "5-LOW"]
TYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
ADJ = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
NOUN = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod",
        "widget"]

EPOCH = np.datetime64("1995-01-01")
END = np.datetime64("2001-08-01")


def _ts(days: np.ndarray) -> pa.Array:
    return pa.array((EPOCH + days.astype("timedelta64[D]"))
                    .astype("datetime64[us]"))


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/repo/testdata_tpch_sf1"
    scale = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    n_cust = int(150_000 * scale)
    n_supp = int(10_000 * scale)
    n_part = int(200_000 * scale)
    n_ord = int(1_500_000 * scale)
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(SEED)

    for t in ("region", "nation"):
        shutil.copyfile(os.path.join(SRC, f"{t}.parquet"),
                        os.path.join(out, f"{t}.parquet"))
    for t in ("events", "documents", "embeddings"):
        src = os.path.join(AUX, f"{t}.parquet")
        if os.path.exists(src):
            shutil.copyfile(src, os.path.join(out, f"{t}.parquet"))

    def bal(n):
        return np.round(rng.uniform(-999.99, 9999.99, n), 2)

    ck = np.arange(n_cust, dtype=np.int64)
    pq.write_table(pa.table({
        "c_custkey": ck,
        "c_name": np.array([f"Customer#{k:09d}" for k in ck]),
        "c_nationkey": rng.integers(0, 25, n_cust).astype(np.int32),
        "c_acctbal": bal(n_cust),
        "c_mktsegment": np.array(SEGMENTS)[
            rng.integers(0, len(SEGMENTS), n_cust)],
    }), os.path.join(out, "customer.parquet"))

    sk = np.arange(n_supp, dtype=np.int64)
    pq.write_table(pa.table({
        "s_suppkey": sk,
        "s_name": np.array([f"Supplier#{k:09d}" for k in sk]),
        "s_nationkey": rng.integers(0, 25, n_supp).astype(np.int32),
        "s_acctbal": bal(n_supp),
    }), os.path.join(out, "supplier.parquet"))

    pk = np.arange(n_part, dtype=np.int64)
    retail = (90_000 + (pk // 10) % 20_001 + 100 * (pk % 1000)) / 100.0
    pq.write_table(pa.table({
        "p_partkey": pk,
        "p_name": np.char.add(np.char.add(
            np.array(ADJ)[rng.integers(0, 8, n_part)], " "),
            np.array(NOUN)[rng.integers(0, 8, n_part)]),
        "p_brand": np.array([f"Brand#{b}" for b in
                             rng.integers(1, 26, n_part)]),
        "p_type": np.array(TYPES)[rng.integers(0, len(TYPES), n_part)],
        "p_size": rng.integers(1, 51, n_part).astype(np.int32),
        "p_retailprice": retail,
    }), os.path.join(out, "part.parquet"))

    # ---- orders + lineitem -------------------------------------------
    ok = np.arange(n_ord, dtype=np.int64)
    eligible = ck[ck % 3 != 0]                 # dbgen's custkey skip
    o_cust = eligible[rng.integers(0, len(eligible), n_ord)]
    span_days = int((END - EPOCH) / np.timedelta64(1, "D")) - 122
    o_days = rng.integers(0, span_days + 1, n_ord)

    n_lines = rng.integers(1, 8, n_ord)
    l_order = np.repeat(ok, n_lines)
    m = len(l_order)
    print(f"# lineitem rows: {m}", file=sys.stderr)
    l_lineno = (np.arange(m, dtype=np.int64)
                - np.repeat(np.cumsum(n_lines) - n_lines, n_lines)
                + 1).astype(np.int32)
    l_part = rng.integers(0, n_part, m)
    i4 = rng.integers(0, 4, m)
    l_supp = ((l_part + i4 * (n_supp // 4
                              + (l_part + n_supp - 1) // n_supp))
              % n_supp).astype(np.int64)
    qty = rng.integers(1, 51, m).astype(np.float64)
    disc = np.round(rng.integers(0, 11, m) / 100.0, 2)
    tax = np.round(rng.integers(0, 9, m) / 100.0, 2)
    ship_days = np.repeat(o_days, n_lines) + rng.integers(1, 122, m)
    receipt_days = ship_days + rng.integers(1, 31, m)
    current = span_days // 2 + 61              # window midpoint
    rf = np.where(receipt_days <= current,
                  np.where(rng.integers(0, 2, m) == 0, "R", "A"), "N")
    ls = np.where(ship_days <= current, "F", "O")
    extprice = np.round(qty * retail[l_part], 2)

    # order status + total price derived from the lines (dbgen §4.2.3)
    f_cnt = np.bincount(l_order, weights=(ls == "F"), minlength=n_ord)
    o_status = np.where(f_cnt == n_lines, "F",
                        np.where(f_cnt == 0, "O", "P"))
    o_total = np.round(np.bincount(
        l_order, weights=extprice * (1 + tax) * (1 - disc),
        minlength=n_ord), 2)

    pq.write_table(pa.table({
        "o_orderkey": ok,
        "o_custkey": o_cust,
        "o_orderstatus": o_status,
        "o_totalprice": o_total,
        "o_orderdate": _ts(o_days),
        "o_orderpriority": np.array(PRIORITIES)[
            rng.integers(0, len(PRIORITIES), n_ord)],
    }), os.path.join(out, "orders.parquet"))

    pq.write_table(pa.table({
        "l_orderkey": l_order,
        "l_partkey": l_part,
        "l_suppkey": l_supp,
        "l_linenumber": l_lineno,
        "l_quantity": qty,
        "l_extendedprice": extprice,
        "l_discount": disc,
        "l_tax": tax,
        "l_returnflag": rf,
        "l_linestatus": ls,
        "l_shipdate": _ts(ship_days),
    }), os.path.join(out, "lineitem.parquet"))
    print(f"# wrote {out}: cust={n_cust} supp={n_supp} part={n_part} "
          f"orders={n_ord} lineitem={m}", file=sys.stderr)


if __name__ == "__main__":
    main()
