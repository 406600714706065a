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


# ------------------------------------------------------- scheduled jobs


def test_every_next_run_arithmetic():
    from loudml_spark import errors
    from loudml_spark.scheduler import Every

    # 2024-01-01 is a Monday; now = 10:00:00 UTC
    now = 1704103200.0
    assert Every(30, "seconds").next_run(now) == now + 30
    assert Every(2, "minutes").next_run(now) == now + 120
    # daily at 02:30 → tomorrow 02:30 (02:30 today already passed)
    nxt = Every(1, "days", "02:30").next_run(now)
    assert nxt == 1704162600.0  # 2024-01-02T02:30:00Z
    # daily at 18:00 → today 18:00
    assert Every(1, "days", "18:00").next_run(now) == 1704132000.0
    # every sunday at 04:00 → 2024-01-07T04:00:00Z
    assert Every(1, "sunday", "04:00").next_run(now) == 1704600000.0
    # hourly at :15 → 10:15 same hour
    assert Every(1, "hours", ":15").next_run(now) == now + 900
    import pytest as _pt
    with _pt.raises(errors.Invalid):
        Every(1, "fortnight")
    with _pt.raises(errors.Invalid):
        Every(1, "seconds", "02:30")  # at invalid for sub-hour units
    with _pt.raises(errors.Invalid):
        Every(1, "days", "25:00")


def test_scheduled_template_fan_out_and_firing():
    from loudml_spark.jobs import DONE, JobRegistry
    from loudml_spark.scheduler import ScheduledJobRegistry

    reg = ScheduledJobRegistry(JobRegistry())
    ran = []

    template = {
        "name": "eval-{{ model_name }}",
        "method": "post",
        "relative_url": "/models/{{ model_name }}/_eval",
        "every": {"count": 30, "unit": "seconds"},
    }
    models = ["m_a", "m_b", "m_c"]
    jobs = reg.add_template(
        template, models, fn=lambda desc: ran.append(desc["name"]))
    assert [j.name for j in jobs] == ["eval-m_a", "eval-m_b", "eval-m_c"]
    assert all("{{" not in j.desc["relative_url"] for j in jobs)

    now = 1704103200.0
    # first tick arms the schedules, nothing fires
    assert reg.run_pending(now) == []
    assert all(sj["next_run_at"] == now + 30
               for sj in reg.list_scheduled())
    # 31s later all three fire through the async registry
    fired = reg.run_pending(now + 31)
    assert len(fired) == 3
    for j in fired:
        j.wait(10)
        assert j.state == DONE
    assert sorted(ran) == ["eval-m_a", "eval-m_b", "eval-m_c"]
    # rearmed for the next window
    assert all(sj["next_run_at"] == now + 61
               for sj in reg.list_scheduled())
    # non-templated spec passes through unchanged
    plain = {"name": "cleanup", "every": {"count": 1, "unit": "hours"}}
    assert len(reg.add_template(plain, models, fn=lambda d: None)) == 1


def test_run_pending_binds_each_jobs_own_fn():
    # regression: the fired lambda must not late-bind the loop var —
    # with per-job closures, each firing must run ITS OWN callback
    from loudml_spark.scheduler import ScheduledJobRegistry

    reg = ScheduledJobRegistry()
    ran = []
    for name in ("alpha", "beta", "gamma"):
        reg.add(
            {"name": name, "every": {"count": 10, "unit": "seconds"}},
            (lambda n: lambda desc: ran.append(n))(name),
        )
    now = 1704103200.0
    reg.run_pending(now)          # arm
    jobs = reg.run_pending(now + 11)
    for j in jobs:
        j.wait(10)
    assert sorted(ran) == ["alpha", "beta", "gamma"]


def test_hourly_at_uses_minute_second_format():
    from loudml_spark import errors
    from loudml_spark.scheduler import Every

    now = 1704103200.0  # 10:00:00Z
    # schedule-library semantics: hourly at "MM:SS"
    assert Every(1, "hours", "45:30").next_run(now) == now + 45 * 60 + 30
    assert Every(1, "hours", ":15").next_run(now) == now + 15 * 60
    import pytest as _pt
    with _pt.raises(errors.Invalid):
        Every(1, "hours", "01:02:03")  # no hour field for hourly at


def test_hourly_at_rejects_trailing_colon():
    from loudml_spark import errors
    from loudml_spark.scheduler import Every
    import pytest as _pt

    with _pt.raises(errors.Invalid):
        Every(1, "hours", "5:")


def test_job_scheduler_pool_by_type(spark):
    """Training jobs run in the 'training' FAIR pool, everything else
    in 'queries' (the reference's nice-d training worker-pool split,
    loudml/server.py:1859-1870) — the thread-local property must be
    visible to the job's own Spark actions."""
    reg = JobRegistry(spark)

    def read_pool():
        return spark.sparkContext.getLocalProperty("spark.scheduler.pool")

    assert reg.submit("train[m1]", read_pool).wait(30) == "training"
    assert reg.submit("eval[m1]", read_pool).wait(30) == "queries"
    # explicit override wins
    assert reg.submit("eval[m1]", read_pool,
                      pool="training").wait(30) == "training"


def test_scheduled_train_jobs_route_to_training_pool(spark):
    """Pool routing for SCHEDULED jobs reads the spec's relative_url,
    not the user-chosen schedule name: a retrain schedule named
    anything still lands in the training pool."""
    from loudml_spark.scheduler import ScheduledJobRegistry

    reg = ScheduledJobRegistry(JobRegistry(spark))

    def read_pool(desc):
        return spark.sparkContext.getLocalProperty("spark.scheduler.pool")

    reg.add({"name": "nightly refresh",  # name says nothing about type
             "relative_url": "/models/m1/_train",
             "every": {"count": 1, "unit": "seconds"}},
            read_pool, now=0.0)
    reg.add({"name": "scoring sweep",
             "relative_url": "/models/m1/_eval",
             "every": {"count": 1, "unit": "seconds"}},
            read_pool, now=0.0)
    jobs = reg.run_pending(now=10.0)
    got = {j.name: j.wait(30) for j in jobs}
    assert got["nightly refresh"] == "training"
    assert got["scoring sweep"] == "queries"
