"""Interval (range) join — point-in-interval without a cross join.

The temporal analog of the engine's spatial cell-cover join: intervals
are exploded over coarse time buckets (the 1-D "cell cover"), points
carry their bucket key, the equi-join prunes, and the exact containment
predicate re-checks.  Candidate volume is O(points + interval_len/bucket)
instead of O(points × intervals).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    bucket_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Rows of ``points`` joined to every interval containing their
    timestamp (inclusive bounds).  ``intervals`` is the small side and is
    broadcast after bucket explosion."""
    b = F.lit(bucket_seconds)
    pts = points.withColumn(
        "_bucket", F.floor(F.unix_timestamp(F.col(ts_col)) / b).cast("long")
    )
    iv = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start_col)) / b).cast("long"),
                F.floor(F.unix_timestamp(F.col(end_col)) / b).cast("long"),
            )
        ),
    )
    cand = pts.join(F.broadcast(iv), "_bucket", "inner")
    hit = cand.filter(
        (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) <= F.col(end_col))
    ).drop("_bucket")
    if how == "inner":
        return hit
    raise ValueError(f"how={how!r}")
