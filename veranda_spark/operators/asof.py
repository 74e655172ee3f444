"""As-of (point-in-time) join — a custom operator Spark lacks.

For each left row, attach the most recent right row with the same key
whose timestamp is <= the left timestamp (the time-series "last known
value" join).  No reference analog (veranda is batch raster IO); this is
the temporal sibling of the engine's spatial point lookup, included for
training-pipeline completeness (event/state alignment).

Plan (no per-row Python, no range self-join):
1. unionByName both sides with a side marker,
2. one window pass per key ordered by (ts, side):
   ``last(right_value, ignorenulls=True)`` carries the latest right value
   forward onto each left row,
3. filter back to left rows.

One shuffle on the key — the same cost as a groupBy; contrast with the
naive ``left.join(right, key).where(r.ts <= l.ts)`` + re-rank, which
explodes candidates quadratically per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Left as-of join: every left row + the latest right values at or
    before its timestamp (NULL when none, or when older than
    ``tolerance_seconds``)."""
    value_cols = value_cols or [
        c for c in right.columns if c not in (key, right_ts)
    ]
    clash = [c for c in value_cols if c in left.columns]
    if clash:
        # a same-named left column would enter the carry-forward window and
        # pollute the as-of result (round-1 advisory) — refuse loudly
        raise ValueError(
            f"value_cols {clash} collide with left columns; alias them on "
            "the right side before joining"
        )
    l_tag = left.withColumn("_side", F.lit(1)).withColumn("_ts", F.col(left_ts))
    r_tag = (
        right.select(key, F.col(right_ts).alias("_rts"), *value_cols)
        .withColumn("_side", F.lit(0))
        .withColumn("_ts", F.col("_rts"))
    )
    merged = l_tag.unionByName(r_tag, allowMissingColumns=True)
    # right rows sort before left rows at equal ts (side 0 < 1), so an
    # exactly-simultaneous right row IS visible to the left row (<= join)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = merged
    for c in value_cols:
        carried = carried.withColumn(c, F.last(F.col(c), ignorenulls=True).over(w))
    carried = carried.withColumn(
        "_asof_ts", F.last(F.col("_rts"), ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("_side") == 1)
    if tolerance_seconds is not None:
        # cast to double (not unix_timestamp, which truncates to whole
        # seconds) so sub-second tolerances compare exactly
        stale = (
            F.col("_ts").cast("double") - F.col("_asof_ts").cast("double")
        ) > tolerance_seconds
        for c in value_cols:
            out = out.withColumn(c, F.when(stale, F.lit(None)).otherwise(F.col(c)))
        out = out.withColumn("_asof_ts", F.when(stale, F.lit(None)).otherwise(F.col("_asof_ts")))
    return out.drop("_side", "_ts", "_rts").withColumnRenamed("_asof_ts", "asof_ts")
