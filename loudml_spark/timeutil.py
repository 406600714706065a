"""Time parsing and range alignment.

Behavioral parity with the reference's time handling
(/root/reference/loudml/misc.py:64-238):

* time deltas are ``<float><unit>`` strings with units s/m/h/d/w plus
  M (=30 d) and y (=365 d); a bare number means seconds;
* timestamps are epoch **seconds as float**; inputs accept epoch
  numbers, ISO-8601 strings, or relative ``now±delta``;
* query ranges are half-open ``[from, to)`` and get aligned outward to
  multiples of the bucket interval (floor the start, ceil the end).

``now`` is injectable (the reference resolves relative dates against
the local clock at parse time, which SURVEY §7.4 flags as a test trap).
"""

from __future__ import annotations

import datetime
import math
import re

from loudml_spark import errors

_DELTA_UNITS = {
    "s": 1.0,
    "m": 60.0,
    "h": 3600.0,
    "d": 86400.0,
    "w": 7 * 86400.0,
    "M": 30 * 86400.0,
    "y": 365 * 86400.0,
}


def parse_timedelta(delta) -> float:
    """Parse a time delta into **seconds** (float).

    Accepts a number (seconds) or a string ``<value><unit>`` where unit
    is one of s/m/h/d/w/M/y; a trailing digit means seconds.
    """
    if isinstance(delta, (int, float)) and not isinstance(delta, bool):
        return float(delta)
    if not isinstance(delta, str) or not delta:
        raise errors.Invalid(f"invalid time delta: {delta!r}")

    unit = delta[-1]
    if unit in "0123456789":
        unit, value = "s", delta
    else:
        value = delta[:-1]
    try:
        value = float(value)
    except ValueError:
        raise errors.Invalid(f"invalid time delta value: {delta!r}")
    scale = _DELTA_UNITS.get(unit)
    if scale is None:
        raise errors.Invalid(f"invalid time delta unit: {unit!r}")
    return value * scale


_ISO_RE = re.compile(r"^\d{4}-\d{2}-\d{2}")


def make_ts(mixed, now: float | None = None) -> float:
    """Convert a mixed input to an epoch-seconds float.

    Accepts: epoch number, numeric string, ISO-8601 string (assumed UTC
    when naive), ``now``, ``now+<delta>``, ``now-<delta>``.
    """
    if isinstance(mixed, (int, float)) and not isinstance(mixed, bool):
        return float(mixed)
    if isinstance(mixed, datetime.datetime):
        if mixed.tzinfo is None:
            mixed = mixed.replace(tzinfo=datetime.timezone.utc)
        return mixed.timestamp()
    if not isinstance(mixed, str):
        raise errors.Invalid(f"invalid timestamp: {mixed!r}")
    try:
        return float(mixed)
    except ValueError:
        pass
    if mixed.startswith("now"):
        base = time_now() if now is None else float(now)
        rest = mixed[3:]
        if not rest:
            return base
        sign = 1.0
        if rest[0] == "+":
            rest = rest[1:]
        elif rest[0] == "-":
            sign, rest = -1.0, rest[1:]
        return base + sign * parse_timedelta(rest)
    if _ISO_RE.match(mixed):
        dt = datetime.datetime.fromisoformat(mixed.replace("Z", "+00:00"))
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=datetime.timezone.utc)
        return dt.timestamp()
    raise errors.Invalid(f"invalid timestamp: {mixed!r}")


def time_now() -> float:
    """Current epoch seconds (separate function so tests can patch)."""
    return datetime.datetime.now(datetime.timezone.utc).timestamp()


def ts_to_datetime(ts: float) -> datetime.datetime:
    return datetime.datetime.fromtimestamp(ts, datetime.timezone.utc)


def ts_to_str(ts: float) -> str:
    dt = ts_to_datetime(ts)
    return "%s.%03dZ" % (dt.strftime("%Y-%m-%dT%H:%M:%S"), dt.microsecond / 1000)


def align_range(
    from_date, to_date, bucket_interval, now: float | None = None
) -> tuple[int, int]:
    """Align ``[from, to)`` outward to multiples of ``bucket_interval``.

    Returns integer epoch seconds (floor the start, ceil the end) —
    the contract of the reference's DateRange.build_date_range
    (loudml/misc.py:223-238).
    """
    interval = parse_timedelta(bucket_interval)
    if interval <= 0:
        raise errors.Invalid("bucket_interval must be > 0")
    from_ts = make_ts(from_date, now=now)
    to_ts = make_ts(to_date, now=now)
    if to_ts < from_ts:
        raise errors.Invalid(f"invalid date range: [{from_ts}, {to_ts})")
    aligned_from = math.floor(from_ts / interval) * interval
    aligned_to = math.ceil(to_ts / interval) * interval
    return int(aligned_from), int(aligned_to)
