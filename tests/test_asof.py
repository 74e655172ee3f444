"""As-of join vs brute force, including the tolerance window."""

import datetime as dt

from veranda_spark.operators.asof import asof_join


def _mk(spark):
    base = dt.datetime(2024, 1, 1)
    left = [
        (i, i % 3, base + dt.timedelta(seconds=10 * i)) for i in range(30)
    ]
    right = [
        (i % 3, base + dt.timedelta(seconds=25 * i), float(i)) for i in range(10)
    ]
    l = spark.createDataFrame(left, "event_id int, user_id int, ts timestamp")
    r = spark.createDataFrame(right, "user_id int, ts timestamp, v double")
    return l, r, left, right


def _brute(left, right, tol=None):
    out = {}
    for eid, uid, lts in left:
        best = None
        for ruid, rts, v in right:
            if ruid == uid and rts <= lts and (best is None or rts > best[0]):
                best = (rts, v)
        if best and tol is not None and (lts - best[0]).total_seconds() > tol:
            best = None
        out[eid] = best[1] if best else None
    return out


def test_asof_matches_bruteforce(spark):
    l, r, left, right = _mk(spark)
    got = {row["event_id"]: row["v"] for row in asof_join(l, r, key="user_id").collect()}
    assert got == _brute(left, right)
    assert any(v is None for v in got.values())  # pre-first-right rows are NULL
    assert any(v is not None for v in got.values())


def test_asof_tolerance(spark):
    l, r, left, right = _mk(spark)
    got = {
        row["event_id"]: row["v"]
        for row in asof_join(l, r, key="user_id", tolerance_seconds=30).collect()
    }
    assert got == _brute(left, right, tol=30)


def test_asof_equal_timestamp_is_visible(spark):
    # a right row exactly at the left ts must match (<= semantics)
    base = dt.datetime(2024, 1, 1)
    l = spark.createDataFrame([(1, 7, base)], "event_id int, user_id int, ts timestamp")
    r = spark.createDataFrame([(7, base, 42.0)], "user_id int, ts timestamp, v double")
    row = asof_join(l, r, key="user_id").collect()[0]
    assert row["v"] == 42.0 and row["asof_ts"] == base
