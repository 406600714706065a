"""Job registry + model templates."""

import time

import pytest

from loudml_spark import errors
from loudml_spark.jobs import DONE, FAILED, JobRegistry
from loudml_spark.templates import render_template, template_variables


def test_job_lifecycle(spark):
    reg = JobRegistry(spark)
    job = reg.submit("count", lambda: spark.range(1000).count())
    assert job.wait(60) == 1000
    assert job.state == DONE
    assert reg.get(job.id).describe()["progress"] == 1.0


def test_job_failure_captured(spark):
    reg = JobRegistry(spark)

    def boom():
        raise ValueError("nope")

    job = reg.submit("bad", boom)
    with pytest.raises(errors.LoudMLSparkError, match="nope"):
        job.wait(30)
    assert job.state == FAILED
    assert "ValueError" in job.error


def test_job_listing_and_unknown(spark):
    reg = JobRegistry(spark)
    j = reg.submit("x", lambda: 1)
    j.wait(30)
    assert any(d["id"] == j.id for d in reg.list_jobs())
    with pytest.raises(errors.LoudMLSparkError):
        reg.get("nope")


def test_template_render_types_and_fanout():
    tpl = {
        "name": "cpu-{{ host }}",
        "bucket_interval": "{{ interval }}",
        "features": [{
            "metric": "avg", "field": "cpu",
            "match_all": [{"tag": "host", "value": "{{ host }}"}],
        }],
    }
    assert template_variables(tpl) == {"host", "interval"}
    out = render_template(tpl, {"host": "web1", "interval": 300})
    assert out["name"] == "cpu-web1"
    assert out["bucket_interval"] == 300  # bare var keeps int type
    assert out["features"][0]["match_all"][0]["value"] == "web1"
    with pytest.raises(errors.Invalid, match="missing template"):
        render_template(tpl, {"host": "web1"})
