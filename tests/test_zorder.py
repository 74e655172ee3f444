"""Z-order key vs python reference; clustered writer layout property."""

import glob

import numpy as np
from pyspark.sql import functions as F

from veranda_spark.cells import zorder_key
from veranda_spark.io.catalog import write_zordered


def _spread(x):
    x &= 0xFFFF
    for sh, m in ((8, 0x00FF00FF), (4, 0x0F0F0F0F), (2, 0x33333333), (1, 0x55555555)):
        x = (x | (x << sh)) & m
    return x


def _z(a, b):
    return (_spread(a) << 1) | _spread(b)


def test_zorder_key_matches_reference(spark):
    rng = np.random.default_rng(3)
    pairs = [(int(a), int(b)) for a, b in rng.integers(0, 65536, (200, 2))]
    df = spark.createDataFrame(pairs, "a long, b long")
    got = {(r["a"], r["b"]): r["z"] for r in
           df.select("a", "b", zorder_key(F.col("a"), F.col("b")).alias("z")).collect()}
    for a, b in pairs:
        assert got[(a, b)] == _z(a, b), (a, b)
    # locality: adjacent cells differ in low bits only
    assert _z(0, 0) == 0 and _z(0, 1) == 1 and _z(1, 0) == 2 and _z(1, 1) == 3


def test_write_zordered_files_are_disjoint_ranges(spark, tmp_path):
    rng = np.random.default_rng(5)
    rows = [(i, int(r), int(c)) for i, (r, c) in
            enumerate(rng.integers(0, 1024, (20000, 2)))]
    df = spark.createDataFrame(rows, "row_id long, tile_row long, tile_col long")
    path = str(tmp_path / "zsorted")
    write_zordered(df, path, n_files=8)

    # per-file: z keys are sorted within, and file ranges are disjoint
    # (repartitionByRange guarantees the partitioning, sortWithinPartitions
    # the order — together they give Z-ORDER BY file layout)
    ranges = []
    for f in sorted(glob.glob(path + "/part-*.parquet")):
        part = spark.read.parquet(f).collect()
        if not part:
            continue
        zs = [_z(r["tile_row"], r["tile_col"]) for r in part]
        assert zs == sorted(zs), f
        ranges.append((min(zs), max(zs)))
    ranges.sort()
    assert len(ranges) >= 4
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2  # disjoint
    # nothing lost
    assert spark.read.parquet(path).count() == len(rows)


def test_write_zordered_rejects_out_of_range(spark, tmp_path):
    import pytest

    df = spark.createDataFrame(
        [(1, 70000, 3), (2, 5, 9)], "row_id long, tile_row long, tile_col long"
    )
    with pytest.raises(Exception, match="65535"):
        write_zordered(df, str(tmp_path / "bad"), n_files=2)
