"""Interval join vs brute force, including bucket-boundary edges."""

import datetime as dt

from veranda_spark.operators.range_join import interval_join


def test_interval_join_matches_bruteforce(spark):
    base = dt.datetime(2024, 1, 1)
    pts = [(i, base + dt.timedelta(minutes=17 * i)) for i in range(200)]
    ivs = [
        (j, base + dt.timedelta(hours=3 * j), base + dt.timedelta(hours=3 * j + 2))
        for j in range(20)
    ]
    p = spark.createDataFrame(pts, "point_id int, ts timestamp")
    v = spark.createDataFrame(ivs, "window_id int, start_ts timestamp, end_ts timestamp")
    got = {
        (r["point_id"], r["window_id"])
        for r in interval_join(p, v, bucket_seconds=3600).collect()
    }
    want = {
        (pid, wid)
        for pid, ts in pts
        for wid, s, e in ivs
        if s <= ts <= e
    }
    assert got == want and len(want) > 50


def test_interval_join_inclusive_bounds(spark):
    base = dt.datetime(2024, 1, 1)
    p = spark.createDataFrame(
        [(1, base), (2, base + dt.timedelta(hours=2)), (3, base + dt.timedelta(hours=2, seconds=1))],
        "point_id int, ts timestamp",
    )
    v = spark.createDataFrame(
        [(0, base, base + dt.timedelta(hours=2))],
        "window_id int, start_ts timestamp, end_ts timestamp",
    )
    got = sorted(r["point_id"] for r in interval_join(p, v).collect())
    assert got == [1, 2]  # start and end inclusive; 1s past end excluded
