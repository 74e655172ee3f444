"""VERDICT r2 #3 experiment: does the Arrow batch cap (1024 rows / 32 MB,
the local[32] GC fix) tax low-parallelism runs?

Runs the exact scaling job (parquet scan → tile-cover join → burn-in,
same grid/rows as bench.py) at local[2] under different Arrow batch
configs, one measurement per fresh JVM, N trials each, interleaved so
host weather hits all configs equally.  Prints per-config best/all.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONFIGS = {
    "rec1024_b32m": {"spark.sql.execution.arrow.maxRecordsPerBatch": "1024",
                     "spark.sql.execution.arrow.maxBytesPerBatch": str(32 << 20)},
    "rec4096_b128m": {"spark.sql.execution.arrow.maxRecordsPerBatch": "4096",
                      "spark.sql.execution.arrow.maxBytesPerBatch": str(128 << 20)},
    "rec2048_b64m": {"spark.sql.execution.arrow.maxRecordsPerBatch": "2048",
                     "spark.sql.execution.arrow.maxBytesPerBatch": str(64 << 20)},
}


def child(cores: int, cfg_name: str, parquet_path: str) -> None:
    from veranda_spark.grid import RegularGrid
    from veranda_spark.operators.raster import burn_in
    from veranda_spark.session import get_spark

    grid = RegularGrid(tile_cols=64, tile_rows=64, n_tile_cols=64, n_tile_rows=32)
    spark = get_spark(
        master=f"local[{cores}]",
        shuffle_partitions=2 * cores,
        app_name=f"exp_{cfg_name}",
        extra_conf={"spark.sql.adaptive.enabled": "false", **CONFIGS[cfg_name]},
    )
    imgs = spark.read.parquet(parquet_path)
    imgs.count()
    spark.range(4096, numPartitions=4 * cores).mapInPandas(lambda it: it, "id long").count()
    t0 = time.monotonic()
    burn_in(imgs, grid, per_layer=False).count()
    dt = time.monotonic() - t0
    spark.stop()
    print("EXP_RESULT " + json.dumps({"cfg": cfg_name, "cores": cores, "sec": round(dt, 2)}))


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(int(sys.argv[2]), sys.argv[3], sys.argv[4])
        return
    rows = int(os.environ.get("SPARK_GRAFT_SCALE_ROWS", "600000"))
    cores = int(os.environ.get("EXP_CORES", "2"))
    trials = int(os.environ.get("EXP_TRIALS", "3"))
    tmp = tempfile.mkdtemp(prefix="exp_n2_")
    path = os.path.join(tmp, "images")
    from veranda_spark.fixtures import generate_images
    from veranda_spark.session import get_spark, stop_spark

    spark = get_spark(master="local[32]", shuffle_partitions=128, app_name="exp_datagen")
    generate_images(spark, rows, partitions=128).write.mode("overwrite").parquet(path)
    spark.stop()
    stop_spark()

    results: dict[str, list[float]] = {k: [] for k in CONFIGS}
    for _ in range(trials):
        for cfg in CONFIGS:  # interleaved: weather hits all configs equally
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child", str(cores), cfg, path],
                capture_output=True, text=True, timeout=1800,
            )
            line = next((l for l in proc.stdout.splitlines() if l.startswith("EXP_RESULT ")), None)
            if line is None:
                raise RuntimeError(proc.stderr[-2000:])
            r = json.loads(line[len("EXP_RESULT "):])
            results[cfg].append(r["sec"])
            print(f"{cfg} cores={cores}: {r['sec']}s", flush=True)
    print(json.dumps({
        "cores": cores, "rows": rows,
        "best": {k: min(v) for k, v in results.items()},
        "all": results,
    }))


if __name__ == "__main__":
    main()
