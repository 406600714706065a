"""Unit gates for operators/observe.py — one-pass quality metrics."""

import pytest

from loudml_spark import errors
from loudml_spark.operators.observe import observe_quality


def test_observe_quality_single_action(spark, tmp_path):
    rows = [(1, 10.0), (2, None), (3, 500.0), (4, 50.0)]
    df = spark.createDataFrame(rows, "id long, v double")
    observed, obs = observe_quality(
        df, ["id", "v"], bounds={"v": (0.0, 100.0)})
    observed.write.mode("overwrite").parquet(str(tmp_path / "out"))
    m = obs.get
    assert m["n_rows"] == 4
    assert m["id_nulls"] == 0
    assert m["v_nulls"] == 1
    assert m["v_oob"] == 1          # 500.0; the null is not "oob"
    # the data landed in the same single action
    assert spark.read.parquet(str(tmp_path / "out")).count() == 4


def test_observe_quality_validation(spark):
    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(errors.Invalid):
        observe_quality(df, [])
