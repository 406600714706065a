"""REST layer smoke tests — stdlib client against the stdlib server
(the reference's tests/test_api.py write→train→eval→forecast flow)."""

import json
import math
import urllib.error
import urllib.request

import numpy as np
import pytest

from loudml_spark.api import Engine
from loudml_spark.server import serve_background

BASE = 1704067200


@pytest.fixture(scope="module")
def srv(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("srv")
    eng = Engine(spark, storage_path=str(root / "models"))
    rng = np.random.default_rng(3)
    rows = [
        (BASE + i * 3600,
         10.0 + 5.0 * math.sin(2 * math.pi * i / 24)
         + float(rng.normal(0, 0.05)))
        for i in range(480)
    ]
    spark.createDataFrame(rows, "ts long, value double") \
        .write.parquet(str(root / "events"))
    server = serve_background(eng)
    url = f"http://127.0.0.1:{server.server_address[1]}"
    _post(url + "/buckets", {
        "name": "events", "type": "parquet", "path": str(root / "events"),
    })
    yield url
    server.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=120) as r:
        return r.status, json.loads(r.read())


def _post(url, body=None):
    data = json.dumps(body).encode() if body is not None else b""
    req = urllib.request.Request(url, data=data, method="POST")
    req.add_header("Content-Type", "application/json")
    with urllib.request.urlopen(req, timeout=300) as r:
        return r.status, json.loads(r.read())


def test_version_banner(srv):
    code, body = _get(srv + "/")
    assert code == 200
    assert body["version"] == "loudml-spark"


def test_bucket_read_roundtrip(srv):
    code, body = _get(srv + "/buckets")
    assert code == 200 and "events" in body
    code, body = _post(
        srv + f"/buckets/events/_read?from={BASE}&to={BASE + 86400}"
        "&bucket_interval=6h&features=avg(value);count(value)&ts_col=ts"
    )
    assert code == 200
    assert len(body["timestamps"]) == 4
    assert len(body["observed"]["avg_value"]) == 4


def test_full_model_flow_train_eval_forecast(srv):
    code, _ = _post(srv + "/models", {
        "name": "m1", "type": "seasonal_naive", "bucket_interval": 3600,
    })
    assert code == 201
    code, _ = _post(
        srv + f"/models/m1/_train?bucket=events&from={BASE}"
        f"&to={BASE + 15 * 86400}&features=avg(value)&ts_col=ts"
    )
    assert code == 200
    code, rows = _post(
        srv + f"/models/m1/_eval?bucket=events&from={BASE + 15 * 86400}"
        f"&to={BASE + 16 * 86400}&features=avg(value)&ts_col=ts"
    )
    assert code == 200 and len(rows) == 24
    assert all("score" in r for r in rows)
    code, fc = _post(
        srv + f"/models/m1/_forecast?from={BASE + 16 * 86400}"
        f"&to={BASE + 17 * 86400}&percent_interval=0.95"
    )
    assert code == 200 and len(fc) == 24
    assert all(r["lower"] < r["predicted"] < r["upper"] for r in fc)


def test_forecast_constraint_conflict(srv):
    # series oscillates in [5,15] → low:8 must 409 with crossing info
    code, _ = _post(srv + "/models", {
        "name": "m2", "type": "seasonal_naive", "bucket_interval": 3600,
    })
    _post(srv + f"/models/m2/_train?bucket=events&from={BASE}"
          f"&to={BASE + 15 * 86400}&features=avg(value)&ts_col=ts")
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(srv + f"/models/m2/_forecast?from={BASE + 16 * 86400}"
              f"&to={BASE + 17 * 86400}&constraint=value:low:8.0")
    assert ei.value.code == 409
    body = json.loads(ei.value.read())
    assert body["threshold"] == 8.0


def test_background_job_polling(srv):
    _post(srv + "/models", {
        "name": "m3", "type": "gaussian", "bucket_interval": 3600,
    })
    code, body = _post(
        srv + f"/models/m3/_train?bucket=events&from={BASE}"
        f"&to={BASE + 7 * 86400}&features=avg(value)&ts_col=ts&bg=true"
    )
    assert code == 202
    job_id = body["job"]
    import time

    for _ in range(120):
        code, desc = _get(srv + f"/jobs/{job_id}")
        if desc["state"] in ("done", "failed"):
            break
        time.sleep(0.5)
    assert desc["state"] == "done"


def test_errors_are_json(srv):
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(srv + "/models/nope")
    assert ei.value.code == 404
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(srv + f"/buckets/events/_read?from={BASE}&to={BASE + 3600}"
              "&bucket_interval=1h&features=frob(value)&ts_col=ts")
    assert ei.value.code == 400


def test_malformed_requests_get_json_errors(srv):
    # missing required param → 400, not a dropped connection
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(srv + "/models/m1/_train?bucket=events")  # no from/to
    assert ei.value.code == 400
    # malformed path → JSON error, not a stack-trace disconnect
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(srv + "/buckets")  # POST with no body
    assert ei.value.code in (400, 500)
    json.loads(ei.value.read())  # body is JSON


def test_nodes_endpoint(srv):
    code, body = _get(f"{srv}/_nodes")
    assert code == 200
    assert body["_nodes"] == {"total": 1, "successful": 1, "failed": 0}
    node = body["nodes"]["node-0"]
    assert node["http"]["publish_address"].split(":")[1].isdigit()
    # ES-style metric selector as the first segment
    code, body = _get(f"{srv}/_nodes/http")
    assert code == 200 and "http" in body["nodes"]["node-0"]
    code, body = _get(f"{srv}/_nodes/node-0/http")
    assert code == 200
    assert set(body["nodes"]["node-0"]) == {"name", "http"}
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(f"{srv}/_nodes/nope")
    assert ei.value.code == 404
