"""Scheduled jobs — the reference's ``every: {count, unit, at}``
recurring jobs plus per-model template fan-out.

Parity targets:

* schema ``every: {count, unit, at}`` with unit ∈ seconds/minutes/
  hours/days/weeks or a weekday name, ``at`` = "HH:MM[:SS]"
  (/root/reference/loudml/schemas.py:78-107);
* ``setup_scheduled_jobs``: a spec containing an undeclared
  ``{{ model_name }}`` fans out to one scheduled job per stored model
  (/root/reference/loudml/server.py:1803-1818);
* execution through the async job registry (jobs.py) so each firing
  is a tracked waiting→running→done job with Spark job-group cancel.

Time arithmetic is pure-functional over an explicit ``now`` (UTC) —
deterministic and testable; a driver loop (or any external cron)
calls :meth:`ScheduledJobRegistry.run_pending` at its own cadence.
The reference used the `schedule` package; the semantics mirrored
here are that library's documented ones: interval units fire every
``count·unit`` seconds; day/week/weekday units fire at the wall time
``at`` (default midnight-relative "next occurrence").
"""

from __future__ import annotations

import datetime as _dt
import json
from typing import Any, Callable

from loudml_spark import errors
from loudml_spark.jobs import Job, JobRegistry
from loudml_spark.templates import render_template, template_variables

_UNIT_SECONDS = {
    "second": 1, "seconds": 1,
    "minute": 60, "minutes": 60,
    "hour": 3600, "hours": 3600,
    "day": 86400, "days": 86400,
    "week": 604800, "weeks": 604800,
}
# ISO weekday numbers (Monday=1)
_WEEKDAYS = {
    "monday": 1, "tuesday": 2, "wednesday": 3, "thursday": 4,
    "friday": 5, "saturday": 6, "sunday": 7,
}


def _parse_at(at: str, *, hourly: bool = False) -> tuple[int, int, int]:
    """Wall time for 'at'.  Day/week units: "HH:MM[:SS]".  Hour units
    (the `schedule` library's documented format, which this module
    mirrors): ":MM[:SS]" or "MM:SS" — both fields are minute/second,
    there is no hour field."""
    parts = at.split(":")
    if len(parts) not in (2, 3):
        raise errors.Invalid(f"invalid 'at' time: {at!r}")
    try:
        nums = [int(p) if p != "" else 0 for p in parts]
    except ValueError:
        raise errors.Invalid(f"invalid 'at' time: {at!r}")
    if hourly:
        if len(parts) == 3:
            raise errors.Invalid(
                f"invalid hourly 'at' time (use ':MM' or 'MM:SS'): {at!r}")
        h = 0
        if parts[0] == "":
            m, s = nums[1], 0     # ":MM" → minute
        elif parts[1] == "":
            # "MM:" is neither documented form — reject rather than
            # silently guessing (a user typing "5:" likely meant 05:00)
            raise errors.Invalid(
                f"invalid hourly 'at' time (use ':MM' or 'MM:SS'): {at!r}")
        else:
            m, s = nums           # "MM:SS" → minute, second
    else:
        h, m = nums[0], nums[1]
        s = nums[2] if len(nums) == 3 else 0
    if not (0 <= h < 24 and 0 <= m < 60 and 0 <= s < 60):
        raise errors.Invalid(f"invalid 'at' time: {at!r}")
    return h, m, s


class Every:
    """Validated ``every`` clause with next-fire-time arithmetic."""

    def __init__(self, count, unit: str, at: str | None = None):
        if not isinstance(count, (int, float)) or count <= 0:
            raise errors.Invalid(f"invalid schedule count: {count!r}")
        if unit not in _UNIT_SECONDS and unit not in _WEEKDAYS:
            raise errors.Invalid(f"invalid schedule unit: {unit!r}")
        if at is not None:
            if unit in ("second", "seconds", "minute", "minutes"):
                raise errors.Invalid(
                    f"'at' is not valid with unit {unit!r}")
            self.at = _parse_at(at, hourly=unit in ("hour", "hours"))
        else:
            self.at = None
        self.count = count
        self.unit = unit

    @classmethod
    def parse(cls, every: dict) -> "Every":
        if "count" not in every or "unit" not in every:
            raise errors.Invalid("schedule needs 'count' and 'unit'")
        return cls(every["count"], every["unit"], every.get("at"))

    def next_run(self, now: float) -> float:
        """Epoch seconds (UTC) of the next firing strictly after now."""
        dt = _dt.datetime.fromtimestamp(now, tz=_dt.timezone.utc)
        if self.unit in _WEEKDAYS:
            target_wd = _WEEKDAYS[self.unit]
            h, m, s = self.at or (0, 0, 0)
            cand = dt.replace(hour=h, minute=m, second=s, microsecond=0)
            days_ahead = (target_wd - dt.isoweekday()) % 7
            cand = cand + _dt.timedelta(days=days_ahead)
            if cand <= dt:
                cand += _dt.timedelta(days=7)
            # 'every 2 sunday' steps whole weeks beyond the first hit
            cand += _dt.timedelta(weeks=int(self.count) - 1)
            return cand.timestamp()
        step = self.count * _UNIT_SECONDS[self.unit]
        if self.at is None:
            return now + step
        h, m, s = self.at
        if self.unit in ("hour", "hours"):
            # at=":MM[:SS]" within the hour
            cand = dt.replace(minute=m, second=s, microsecond=0)
            while cand <= dt:
                cand += _dt.timedelta(hours=1)
            return (cand + _dt.timedelta(
                hours=(int(self.count) - 1))).timestamp()
        # day/week units: next wall-clock occurrence of at
        cand = dt.replace(hour=h, minute=m, second=s, microsecond=0)
        while cand <= dt:
            cand += _dt.timedelta(days=1)
        extra = (int(self.count) - 1) * (
            7 if self.unit in ("week", "weeks") else 1)
        return (cand + _dt.timedelta(days=extra)).timestamp()


class ScheduledJob:
    """One validated recurring job (schemas.py:78-107 shape)."""

    def __init__(self, desc: dict, fn: Callable[[dict], Any]):
        if "name" not in desc or "every" not in desc:
            raise errors.Invalid("scheduled job needs 'name' and 'every'")
        self.desc = dict(desc)
        self.name = desc["name"]
        self.every = Every.parse(desc["every"])
        self.fn = fn
        self.next_run_at: float | None = None
        self.runs: list[Job] = []
        self.n_fired = 0  # lifetime count (runs list is bounded)

    MAX_RUNS = 100  # keep only the most recent run handles

    def describe(self) -> dict:
        return {
            "name": self.name,
            "every": self.desc["every"],
            "next_run_at": self.next_run_at,
            "n_runs": self.n_fired,
        }


class ScheduledJobRegistry:
    """Recurring-job bookkeeping over the async JobRegistry.

    ``fn`` receives the (rendered) job desc at each firing — the
    engine-level equivalent of the reference's self-HTTP-call specs
    (method/relative_url): callers bind the desc to an Engine action
    (train/eval/forecast) instead of a URL.
    """

    def __init__(self, jobs: JobRegistry | None = None):
        self.jobs = jobs or JobRegistry()
        self._scheduled: dict[str, ScheduledJob] = {}

    def add(self, desc: dict, fn: Callable[[dict], Any],
            now: float | None = None) -> ScheduledJob:
        sj = ScheduledJob(desc, fn)
        if sj.name in self._scheduled:
            raise errors.Invalid(f"duplicate scheduled job: {sj.name}")
        if now is not None:
            sj.next_run_at = sj.every.next_run(now)
        self._scheduled[sj.name] = sj
        return sj

    def add_template(
        self,
        template: dict,
        model_names: list[str],
        fn: Callable[[dict], Any],
        now: float | None = None,
    ) -> list[ScheduledJob]:
        """Per-model fan-out (server.py:1803-1818): a spec that uses
        ``{{ model_name }}`` becomes one scheduled job per model; a
        spec with no template variables is added as-is."""
        if "model_name" not in template_variables(template):
            return [self.add(template, fn, now=now)]
        out = []
        for model_name in model_names:
            rendered = render_template(
                json.loads(json.dumps(template)),
                {"model_name": model_name},
            )
            out.append(self.add(rendered, fn, now=now))
        return out

    def run_pending(self, now: float) -> list[Job]:
        """Fire every job whose next_run_at ≤ now; returns the
        submitted Jobs.  Missed windows collapse into one firing (the
        `schedule` library's behavior)."""
        fired = []
        for sj in self._scheduled.values():
            if sj.next_run_at is None:
                sj.next_run_at = sj.every.next_run(now)
                continue
            if sj.next_run_at <= now:
                # bind BOTH desc and fn as defaults: the lambda runs on
                # a registry thread after this loop has moved on, and a
                # late-bound `sj` would resolve to the last job iterated.
                # Pool routing reads the SPEC, not the user-chosen job
                # name: a schedule whose relative_url targets _train
                # is a training job whatever it is called (a name
                # heuristic would put 'nightly retrain' in the query
                # pool and starve interactive reads — the exact
                # failure the pool split prevents).
                from loudml_spark.jobs import TRAIN_POOL

                url = str(sj.desc.get("relative_url", ""))
                pool = TRAIN_POOL if "_train" in url else None
                job = self.jobs.submit(
                    sj.name, lambda d=sj.desc, f=sj.fn: f(d),
                    pool=pool)
                sj.runs.append(job)
                sj.n_fired += 1
                if len(sj.runs) > sj.MAX_RUNS:
                    del sj.runs[:-sj.MAX_RUNS]
                fired.append(job)
                sj.next_run_at = sj.every.next_run(now)
        return fired

    def remove(self, name: str) -> None:
        if name not in self._scheduled:
            raise errors.LoudMLSparkError(f"unknown scheduled job: {name}")
        del self._scheduled[name]

    def clear(self) -> None:
        """Drop every scheduled job — DELETE /scheduled_jobs parity
        (reference server.py:1346-1351)."""
        self._scheduled.clear()

    def find(self, name: str):
        """The ScheduledJob or None — lets callers rebind a live job
        (e.g. PATCH /models re-cadencing eval[<model>]) without going
        through the HTTP 404 path."""
        return self._scheduled.get(name)

    def names(self) -> list[str]:
        return sorted(self._scheduled)

    def describe(self, name: str) -> dict:
        if name not in self._scheduled:
            raise errors.LoudMLSparkError(f"unknown scheduled job: {name}")
        return self._scheduled[name].describe()

    def list_scheduled(self) -> list[dict]:
        return [sj.describe() for sj in self._scheduled.values()]
