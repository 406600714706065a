import pytest

from loudml_spark import errors, timeutil


def test_parse_timedelta_units():
    assert timeutil.parse_timedelta(42) == 42.0
    assert timeutil.parse_timedelta("42") == 42.0
    assert timeutil.parse_timedelta("42s") == 42.0
    assert timeutil.parse_timedelta("42m") == 42 * 60.0
    assert timeutil.parse_timedelta("42h") == 42 * 3600.0
    assert timeutil.parse_timedelta("42d") == 42 * 86400.0
    assert timeutil.parse_timedelta("2w") == 14 * 86400.0
    assert timeutil.parse_timedelta("2M") == 60 * 86400.0
    assert timeutil.parse_timedelta("2y") == 730 * 86400.0


def test_parse_timedelta_invalid():
    with pytest.raises(errors.Invalid):
        timeutil.parse_timedelta("42x")
    with pytest.raises(errors.Invalid):
        timeutil.parse_timedelta("")
    with pytest.raises(errors.Invalid):
        timeutil.parse_timedelta("xs")


def test_make_ts():
    assert timeutil.make_ts(1234.5) == 1234.5
    assert timeutil.make_ts("1234.5") == 1234.5
    assert timeutil.make_ts("1970-01-01T00:00:42Z") == 42.0
    assert timeutil.make_ts("2024-01-01") == 1704067200.0
    # relative, with injectable clock
    assert timeutil.make_ts("now", now=1000.0) == 1000.0
    assert timeutil.make_ts("now-1m", now=1000.0) == 940.0
    assert timeutil.make_ts("now+30s", now=1000.0) == 1030.0


def test_align_range_floor_ceil():
    # loudml/misc.py:223-238 contract
    assert timeutil.align_range(1, 9, 3) == (0, 9)
    assert timeutil.align_range(0, 9, 3) == (0, 9)
    assert timeutil.align_range(4, 10, 3) == (3, 12)
    with pytest.raises(errors.Invalid):
        timeutil.align_range(10, 4, 3)
