"""Diagnostic runner for the scaling job (one fresh JVM per invocation).

Usage: python tools/diag_scale.py CORES PARQUET [SHUFFLE_PARTS] [k=v ...]
Prints DIAG_RESULT json with wall time + GC totals parsed from -Xlog:gc.
"""

import json
import os
import re
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from veranda_spark.grid import RegularGrid
from veranda_spark.session import get_spark

SCALE_GRID = RegularGrid(tile_cols=64, tile_rows=64, n_tile_cols=64, n_tile_rows=32)


def main():
    cores = int(sys.argv[1])
    parquet = sys.argv[2]
    parts = int(sys.argv[3]) if len(sys.argv) > 3 else 2 * cores
    extra = dict(kv.split("=", 1) for kv in sys.argv[4:])
    gclog = tempfile.mktemp(suffix=".gclog")
    os.environ["VERANDA_SPARK_DRIVER_JAVA_OPTS"] = f"-Xlog:gc:{gclog}"
    from veranda_spark.operators.raster import burn_in

    spark = get_spark(
        master=f"local[{cores}]",
        shuffle_partitions=parts,
        app_name=f"diag_{cores}",
        extra_conf={"spark.sql.adaptive.enabled": "false", **extra},
    )
    imgs = spark.read.parquet(parquet)
    n = imgs.count()
    spark.range(4096, numPartitions=4 * cores).mapInPandas(lambda it: it, "id long").count()
    t0 = time.monotonic()
    n_tiles = burn_in(imgs, SCALE_GRID, per_layer=False).count()
    dt = time.monotonic() - t0
    spark.stop()
    gc_total = 0.0
    gc_n = 0
    try:
        for line in open(gclog):
            m = re.search(r"Pause (?:Young|Full).*?([\d.]+)ms", line)
            if m:
                gc_total += float(m.group(1)) / 1000
                gc_n += 1
    except OSError:
        pass
    print(
        "DIAG_RESULT "
        + json.dumps(
            {
                "cores": cores,
                "parts": parts,
                "sec": round(dt, 2),
                "rows_per_sec": round(n / dt, 1),
                "n_tiles": n_tiles,
                "gc_pause_total_s": round(gc_total, 2),
                "gc_events": gc_n,
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
