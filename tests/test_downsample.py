"""Unit gates for operators/downsample.py — LTTB."""

import numpy as np
import pytest

from loudml_spark import errors
from loudml_spark.operators.downsample import lttb, lttb_values

BASE = 1704067200


def test_lttb_keeps_endpoints_and_extremes():
    n = 500
    ts = np.arange(n, dtype=np.int64)
    vals = np.sin(np.arange(n) / 10.0) * 10
    vals[250] = 100.0  # a spike a coarse mean would flatten
    idx = lttb_values(ts, vals, 50)
    assert idx[0] == 0 and idx[-1] == n - 1
    assert len(idx) == 50
    assert 250 in idx                      # the spike survives
    assert np.all(np.diff(idx) > 0)        # strictly increasing


def test_lttb_short_series_passthrough():
    ts = np.arange(5, dtype=np.int64)
    vals = np.ones(5)
    assert list(lttb_values(ts, vals, 10)) == [0, 1, 2, 3, 4]
    with pytest.raises(errors.Invalid):
        lttb_values(ts, vals, 2)


def test_lttb_dataframe_keyed_and_nulls(spark):
    rows = []
    for k in ("a", "b"):
        for i in range(200):
            v = None if i % 50 == 25 else float(i % 17)
            rows.append((k, BASE + i * 60, v))
    df = spark.createDataFrame(rows, "k string, bucket_ts long, value double")
    out = lttb(df, n_out=20, by=["k"]).collect()
    per_key = {}
    for r in out:
        per_key.setdefault(r["k"], []).append(r)
    assert set(per_key) == {"a", "b"}
    for k, pts in per_key.items():
        assert len(pts) == 20
        assert all(r["value"] is not None for r in pts)
    # matches the numpy core on the null-dropped series
    ts = np.array([r[1] for r in rows[:200] if r[2] is not None],
                  dtype=np.int64)
    vals = np.array([r[2] for r in rows[:200] if r[2] is not None])
    idx = lttb_values(ts, vals, 20)
    got_a = sorted(r["bucket_ts"] for r in per_key["a"])
    assert got_a == sorted(int(t) for t in ts[idx])
