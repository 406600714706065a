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


def _req(url, method, body=None):
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(url, data=data, method=method)
    if data is not None:
        req.add_header("Content-Type", "application/json")
    with urllib.request.urlopen(req, timeout=120) as r:
        return r.status, r.read()


def test_head_existence_probes(srv):
    # reference verb shape: HEAD /buckets/<a;b> → 200 iff ALL exist,
    # 404 otherwise, never a body (server.py:1122-1134, 776-787)
    code, body = _req(srv + "/buckets/events", "HEAD")
    assert code == 200 and body == b""
    with pytest.raises(urllib.error.HTTPError) as ei:
        _req(srv + "/buckets/events;ghost", "HEAD")
    assert ei.value.code == 404
    with pytest.raises(urllib.error.HTTPError) as ei:
        _req(srv + "/models/never-created", "HEAD")
    assert ei.value.code == 404
    # HEAD on a GET route answers with GET's status and no body
    code, body = _req(srv + "/buckets", "HEAD")
    assert code == 200 and body == b""


def test_patch_bucket_merges_settings(srv):
    # PATCH changes one key, keeps the rest (server.py:1105-1114);
    # invalid patches must leave the bucket untouched
    code, body = _req(srv + "/buckets/events", "PATCH",
                      {"max_series_per_request": 7})
    assert code == 204 and body == b""
    code, out = _get(srv + "/buckets/events")
    assert code == 200 and out["name"] == "events"
    with pytest.raises(urllib.error.HTTPError) as ei:
        _req(srv + "/buckets/events", "PATCH", {"type": "no-such-type"})
    assert ei.value.code == 400
    code, _ = _req(srv + "/buckets/events", "HEAD")  # still there
    assert code == 200


def test_patch_model_keeps_trained_state(srv):
    _post(srv + "/models", {
        "name": "mpatch", "type": "seasonal_naive",
        "bucket_interval": 3600,
    })
    _post(srv + f"/models/mpatch/_train?bucket=events&from={BASE}"
          f"&to={BASE + 10 * 86400}&features=avg(value)&ts_col=ts")
    code, body = _req(srv + "/models/mpatch", "PATCH",
                      {"grace_period": 42})
    assert code == 204 and body == b""
    code, settings = _get(srv + "/models/mpatch")
    assert settings["grace_period"] == 42
    # trained state survived: eval still works without retraining
    code, rows = _post(
        srv + f"/models/mpatch/_eval?bucket=events&from={BASE}"
        f"&to={BASE + 86400}&features=avg(value)&ts_col=ts")
    assert code == 200 and len(rows) > 0


def test_scheduled_jobs_rest_crud(srv):
    # POST validates the url shape like config boot (400 on junk)
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(srv + "/scheduled_jobs", {
            "name": "bad", "relative_url": "/models/x/_destroy",
            "every": {"count": 1, "unit": "hours"},
        })
    assert ei.value.code == 400
    code, out = _post(srv + "/scheduled_jobs", {
        "name": "nightly", "method": "post",
        "relative_url": "/models/mpatch/_eval",
        "params": {"bucket": "events"},
        "every": {"count": 1, "unit": "hours"},
    })
    assert code == 201 and out["names"] == ["nightly"]
    code, listing = _get(srv + "/scheduled_jobs")
    names = {j["name"] for j in listing}
    assert "nightly" in names
    # per-id routes: GET, HEAD, DELETE (missing ids tolerated)
    code, got = _get(srv + "/scheduled_jobs/nightly")
    assert code == 200 and got[0]["name"] == "nightly"
    code, _ = _req(srv + "/scheduled_jobs/nightly", "HEAD")
    assert code == 200
    with pytest.raises(urllib.error.HTTPError) as ei:
        _req(srv + "/scheduled_jobs/nightly;ghost", "HEAD")
    assert ei.value.code == 404
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(srv + "/scheduled_jobs/ghost")
    assert ei.value.code == 404
    code, body = _req(srv + "/scheduled_jobs/nightly;ghost", "DELETE")
    assert code == 204 and body == b""
    code, listing = _get(srv + "/scheduled_jobs")
    assert "nightly" not in {j["name"] for j in listing}
    # collection DELETE clears everything
    _post(srv + "/scheduled_jobs", {
        "name": "n2", "relative_url": "/models/mpatch/_eval",
        "params": {"bucket": "events"},
        "every": {"count": 2, "unit": "hours"},
    })
    code, body = _req(srv + "/scheduled_jobs", "DELETE")
    assert code == 204
    code, listing = _get(srv + "/scheduled_jobs")
    assert listing == []


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


def test_hooks_rest_crud_and_test(srv):
    # reference server.py:939-1028: hooks CRUD under /models/<n>/hooks
    # plus POST .../hooks/<h>/_test firing the fake prediction through
    # the real detect path
    from loudml_spark.ml.hooks import Hook, register_hook_type

    fired = []

    class Rec(Hook):
        hook_type = "rec"

        def on_anomaly_start(self, model, start_ts, score, **kw):
            fired.append((model, start_ts, score))

    register_hook_type("rec", Rec)

    code, _ = _post(srv + "/models", {
        "name": "hooked", "type": "gaussian", "bucket_interval": 60,
    })
    assert code == 201
    code, body = _get(srv + "/models/hooked/hooks")
    assert code == 200 and body == []
    # missing type / name → 400; unknown type → 404 (server.py:951-971)
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(srv + "/models/hooked/hooks", {"name": "n1"})
    assert ei.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(srv + "/models/hooked/hooks", {"type": "rec"})
    assert ei.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(srv + "/models/hooked/hooks",
              {"type": "ghost-type", "name": "n1"})
    assert ei.value.code == 404
    # create (201), describe, update-in-place, built-in logging type
    code, _ = _post(srv + "/models/hooked/hooks",
                    {"type": "rec", "name": "n1", "config": {"k": 1}})
    assert code == 201
    code, _ = _post(srv + "/models/hooked/hooks",
                    {"type": "logging", "name": "n2"})
    assert code == 201
    code, body = _get(srv + "/models/hooked/hooks")
    assert code == 200 and body == ["n1", "n2"]
    code, body = _get(srv + "/models/hooked/hooks/n1")
    assert code == 200 and body == {
        "name": "n1", "type": "rec", "config": {"k": 1}}
    code, _ = _req(srv + "/models/hooked/hooks/n1", "POST",
                   {"type": "rec", "config": {"k": 2}})
    assert code == 200
    _, body = _get(srv + "/models/hooked/hooks/n1")
    assert body["config"] == {"k": 2}
    # _test drives the fake prediction into the recording hook
    code, _ = _post(srv + "/models/hooked/hooks/n1/_test")
    assert code == 200
    assert fired and all(m == "hooked" for m, _, _ in fired)
    # delete, then 404 on the gone hook and on _test against it
    code, _ = _req(srv + "/models/hooked/hooks/n1", "DELETE")
    assert code == 200
    _, body = _get(srv + "/models/hooked/hooks")
    assert body == ["n2"]
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(srv + "/models/hooked/hooks/n1")
    assert ei.value.code == 404
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(srv + "/models/hooked/hooks/n1/_test")
    assert ei.value.code == 404
    # unknown model → 404 on the collection route
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(srv + "/models/ghost/hooks")
    assert ei.value.code == 404


def test_hook_post_rejects_mismatched_body_name(srv):
    # POST /models/<n>/hooks/<h> addresses hook <h>; a body smuggling
    # a DIFFERENT name must 400, not silently create/replace another
    # hook while answering 200 for this one
    code, _ = _post(srv + "/models", {
        "name": "hooked2", "type": "gaussian", "bucket_interval": 60,
    })
    assert code == 201
    code, _ = _post(srv + "/models/hooked2/hooks",
                    {"type": "logging", "name": "h1"})
    assert code == 201
    with pytest.raises(urllib.error.HTTPError) as ei:
        _req(srv + "/models/hooked2/hooks/h1", "POST",
             {"type": "logging", "name": "h2"})
    assert ei.value.code == 400
    # h2 was NOT created on the side
    _, body = _get(srv + "/models/hooked2/hooks")
    assert body == ["h1"]
    # a body without a name updates the URL-addressed hook
    code, _ = _req(srv + "/models/hooked2/hooks/h1", "POST",
                   {"type": "logging", "config": {"x": 1}})
    assert code == 200
    _, body = _get(srv + "/models/hooked2/hooks/h1")
    assert body["config"] == {"x": 1}
