"""Generate a scaled-up copy of the driver testdata for the
scale-growth audit (BENCH_SF1 / SCALE.md growth curves).

The driver ships sf0.001/0.01/0.1 only; the 100 TB design claims need
at least one measured decade beyond the bench SF.  This tool builds a
FACTOR× dataset from sf0.1 with the same schemas and the same
statistical character, deterministically (seed fixed):

* region/nation — fixed-cardinality dimensions, copied verbatim
  (exactly how they behave in TPC-H: they do not scale with SF).
* customer/supplier/part/orders/lineitem — FACTOR key-offset shards:
  copy i adds i·(max_key+1) to every key column, so each shard is a
  self-consistent TPC-H sub-universe and all join relationships hold
  across the union (the layout of a sharded warehouse).  Key-derived
  name columns (Customer#…, Supplier#…) are re-derived from the new
  keys so name-based operators (fuzzy linkage) see the same name
  density as the original, not FACTOR exact clones of each name.
* events — FACTOR shards with offset event_id/user_id and the
  original nanosecond-timestamp layout preserved byte-for-byte (the
  nanosAsLong read-compat path stays exercised at scale); the 30-day
  window stays fixed and user count scales, matching how the driver
  scales events across its own SFs (15/150/1500 users).
* documents — FRESH word-soup docs sampled from sf0.1's empirical
  unigram distribution, document-length distribution, and
  (lang, source) joint — NOT clones: cloning would hand every dedup
  operator FACTOR×|docs| exact-duplicate pairs and poison the
  growth-curve measurement with an artifact of the generator.
* embeddings — fresh per-label Gaussian samples (per-dimension
  mean/std fit on sf0.1), label mix preserved.

Usage: python tools/make_scale_data.py [factor] [out_dir] [src_dir] [tables]
Defaults: 10 /root/repo/testdata_sf1 /root/testdata/sf0.1 (all tables)
`tables` is a comma list restricting generation (e.g.
"documents,events" for the third-decade audit, which only re-measures
document/event-shaped queries — a full 100×-sf0.1 lineitem would be
~1 GB of parquet nothing reads).
"""

from __future__ import annotations

import os
import sys
from collections import Counter

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SEED = 20240842


def _read(src_dir: str, name: str) -> pa.Table:
    return pq.read_table(os.path.join(src_dir, f"{name}.parquet"))


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows")


def _shards(table: pa.Table, factor: int, offsets: dict[str, int],
            renames: dict[str, tuple[str, str]] | None = None) -> pa.Table:
    """FACTOR copies; copy i adds i*offsets[col] to each key column.
    renames: col -> (prefix, key_col) re-derives TPC-H-style
    'Prefix#%09d' names from the shifted key."""
    out = []
    for i in range(factor):
        t = table
        for col, k in offsets.items():
            idx = t.schema.get_field_index(col)
            shifted = pc.add(t.column(col), pa.scalar(
                i * k, type=t.schema.field(col).type))
            t = t.set_column(idx, col, shifted)
        for col, (prefix, key_col) in (renames or {}).items():
            keys = t.column(key_col).to_pylist()
            names = pa.array([f"{prefix}#{k:09d}" for k in keys])
            t = t.set_column(t.schema.get_field_index(col), col, names)
        out.append(t)
    return pa.concat_tables(out)


def _key_range(table: pa.Table, col: str) -> int:
    return pc.max(table.column(col)).as_py() + 1


def make_documents(src: pa.Table, factor: int) -> pa.Table:
    rng = np.random.default_rng(SEED)
    texts = src.column("text").to_pylist()
    words = Counter(w for t in texts for w in t.split())
    vocab = sorted(words)
    freq = np.array([words[w] for w in vocab], dtype=np.float64)
    probs = freq / freq.sum()
    lengths = np.array([len(t.split()) for t in texts])
    meta = list(zip(src.column("lang").to_pylist(),
                    src.column("source").to_pylist()))
    n = src.num_rows * factor
    lens = rng.choice(lengths, size=n, replace=True)
    midx = rng.integers(0, len(meta), size=n)
    flat = rng.choice(np.array(vocab, dtype=object),
                      size=int(lens.sum()), replace=True, p=probs)
    out_texts, pos = [], 0
    for ln in lens:
        out_texts.append(" ".join(flat[pos:pos + ln]))
        pos += ln
    return pa.table({
        "doc_id": pa.array(range(n), type=pa.int64()),
        "text": pa.array(out_texts),
        "lang": pa.array([meta[i][0] for i in midx]),
        "source": pa.array([meta[i][1] for i in midx]),
        "n_chars": pa.array([len(t) for t in out_texts],
                            type=pa.int64()),
    })


def make_embeddings(src: pa.Table, factor: int) -> pa.Table:
    rng = np.random.default_rng(SEED + 1)
    emb = np.array(src.column("embedding").to_pylist(),
                   dtype=np.float64)
    labels = np.array(src.column("label").to_pylist())
    n = src.num_rows * factor
    out_labels = rng.choice(labels, size=n, replace=True)
    out = np.empty((n, emb.shape[1]), dtype=np.float32)
    for lbl in np.unique(labels):
        rows = emb[labels == lbl]
        mu, sd = rows.mean(axis=0), rows.std(axis=0) + 1e-9
        mask = out_labels == lbl
        out[mask] = rng.normal(
            mu, sd, size=(int(mask.sum()), emb.shape[1])
        ).astype(np.float32)
    return pa.table({
        "vec_id": pa.array(range(n), type=pa.int64()),
        "embedding": pa.array(list(out),
                              type=pa.list_(pa.float32())),
        "label": pa.array(out_labels.tolist(), type=pa.int32()),
    })


def main():
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/testdata_sf1"
    src_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    tables = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None

    def wanted(name):
        return tables is None or name in tables

    os.makedirs(out_dir, exist_ok=True)
    print(f"scaling {src_dir} x{factor} -> {out_dir}"
          + (f" (tables: {sorted(tables)})" if tables else ""))

    for name in ("region", "nation"):
        if wanted(name):
            _write(out_dir, name, _read(src_dir, name))

    if wanted("customer"):
        cust = _read(src_dir, "customer")
        _write(out_dir, "customer", _shards(
            cust, factor, {"c_custkey": _key_range(cust, "c_custkey")},
            {"c_name": ("Customer", "c_custkey")}))
    if wanted("supplier"):
        supp = _read(src_dir, "supplier")
        _write(out_dir, "supplier", _shards(
            supp, factor, {"s_suppkey": _key_range(supp, "s_suppkey")},
            {"s_name": ("Supplier", "s_suppkey")}))
    if wanted("part"):
        part = _read(src_dir, "part")
        _write(out_dir, "part", _shards(
            part, factor, {"p_partkey": _key_range(part, "p_partkey")}))
    if wanted("orders") or wanted("lineitem"):
        orders = _read(src_dir, "orders")
        ok = _key_range(orders, "o_orderkey")
        if wanted("orders"):
            cust = _read(src_dir, "customer")
            _write(out_dir, "orders", _shards(
                orders, factor,
                {"o_orderkey": ok,
                 "o_custkey": _key_range(cust, "c_custkey")}))
        if wanted("lineitem"):
            part = _read(src_dir, "part")
            supp = _read(src_dir, "supplier")
            _write(out_dir, "lineitem", _shards(
                _read(src_dir, "lineitem"), factor,
                {"l_orderkey": ok,
                 "l_partkey": _key_range(part, "p_partkey"),
                 "l_suppkey": _key_range(supp, "s_suppkey")}))
    if wanted("events"):
        events = _read(src_dir, "events")
        _write(out_dir, "events", _shards(
            events, factor,
            {"event_id": _key_range(events, "event_id"),
             "user_id": _key_range(events, "user_id")}))
    if wanted("documents"):
        _write(out_dir, "documents",
               make_documents(_read(src_dir, "documents"), factor))
    if wanted("embeddings"):
        _write(out_dir, "embeddings",
               make_embeddings(_read(src_dir, "embeddings"), factor))
    print("done")


if __name__ == "__main__":
    main()
