"""Benchmark harness.

1. Headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
   on local[$SPARK_GRAFT_CPUS]; prints ONE JSON line
   {"metric", "value", "unit", "queries", "sf", ...}.
2. North-rule scaling evidence (BASELINE.json: throughput at N and 4N
   executors, efficiency >= 0.8): the same spatial-join + tile-assignment
   job at local[8] vs local[32] on identical input; results go into the
   JSON line ("scaling") and BENCH.md.

Set SPARK_GRAFT_SKIP_SCALING=1 to skip phase 2 (e.g. quick iteration).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from veranda_spark.session import get_spark, stop_spark

HEADLINE = [
    "tile_assign",
    "pip_polygon",
    "cell_histogram",
    "knn",
    "tile_cover_counts",
    "salted_join",
    "tpch_q1",
    "join_agg",
    "sessionize",
    "doc_tokens",
    "dedup_exact",
    "ann_topk",
    "burn_in_tiles",
    "image_features",
]

SCALE_ROWS = int(os.environ.get("SPARK_GRAFT_SCALE_ROWS", "150000"))
SCALE_PARTITIONS = 64


def _run_action(df) -> int:
    return df.count()


def scaling_job(spark, n_rows: int) -> int:
    """The north-rule job: footprint-encode → cover explode (the
    spatial/tiling join) → per-tile burn-in (decode + canvas assembly) →
    tile count.  CPU-bound in Arrow UDFs, shuffle on tile_id."""
    from veranda_spark.fixtures import generate_images
    from veranda_spark.operators.raster import burn_in

    imgs = generate_images(spark, n_rows, partitions=SCALE_PARTITIONS)
    tiles = burn_in(imgs, entrymod.GRID, per_layer=False)
    return tiles.count()


def run_scaling() -> dict:
    out = {"rows": SCALE_ROWS}
    for label, cores in (("n8", 8), ("n32", 32)):
        stop_spark()
        spark = get_spark(master=f"local[{cores}]", shuffle_partitions=SCALE_PARTITIONS,
                          app_name=f"bench_scaling_{cores}")
        # warm the session (JVM/Arrow init) outside the measured window
        spark.range(1000).count()
        t0 = time.monotonic()
        n_tiles = scaling_job(spark, SCALE_ROWS)
        dt = time.monotonic() - t0
        out[label] = {
            "cores": cores,
            "sec": round(dt, 2),
            "rows_per_sec": round(SCALE_ROWS / dt, 1),
            "n_tiles": n_tiles,
        }
        spark.stop()
    stop_spark()
    eff = (out["n32"]["rows_per_sec"] / out["n8"]["rows_per_sec"]) / 4.0
    out["scaling_efficiency"] = round(eff, 3)
    return out


def write_bench_md(result: dict) -> None:
    s = result.get("scaling")
    if not s:
        return
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH.md"), "w") as f:
        f.write(
            "# BENCH — throughput + scaling evidence\n\n"
            "North-rule scaling (BASELINE.json): identical spatial-join +\n"
            "tile-assignment job (footprint encode → tile-cover join →\n"
            "per-tile burn-in) on the same deterministic input at two\n"
            "parallelism levels.\n\n"
            f"| parallelism | wall (s) | rows/s |\n|---|---|---|\n"
            f"| local[8]  | {s['n8']['sec']} | {s['n8']['rows_per_sec']} |\n"
            f"| local[32] | {s['n32']['sec']} | {s['n32']['rows_per_sec']} |\n\n"
            f"rows = {s['rows']}, tiles = {s['n32']['n_tiles']}\n\n"
            f"**scaling efficiency (N→4N) = {s['scaling_efficiency']}**"
            f" (target ≥ 0.8)\n\n"
            f"Headline per-query seconds at sf={result['sf']}: "
            f"{json.dumps(result['queries'])}\n"
        )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    stop_spark()
    spark = get_spark(master=f"local[{cpus}]", app_name="bench")
    spark.range(1000).count()  # warm-up outside measurement
    qs = entrymod.queries()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.monotonic()
        _run_action(qs[name](spark, sf_dir))
        timings[name] = round(time.monotonic() - t0, 3)
    spark.stop()

    result = {
        "metric": "headline_query_wall_sec_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": cpus,
    }
    if os.environ.get("SPARK_GRAFT_SKIP_SCALING") != "1":
        result["scaling"] = run_scaling()
        result["scaling_efficiency"] = result["scaling"]["scaling_efficiency"]
    write_bench_md(result)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
