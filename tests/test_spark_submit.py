"""North-rule packaging e2e: the engine runs via ``spark-submit
--py-files dist/veranda_spark.zip`` with NO repo on the import path —
the zip is the only source of the package (BASELINE.json north_rule:
"run via spark-submit --py-files").

The job generates the F0 image+caption table, burns it into a tile
grid, and prints a marker with the tile count + pixel checksum; the
test asserts the marker and cross-checks the checksum against the same
pipeline computed in-process.
"""

import os
import shutil
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

JOB = """
import numpy as np
from pyspark.sql import SparkSession

# the zip on --py-files must satisfy these imports
from veranda_spark.fixtures import generate_images
from veranda_spark.grid import RegularGrid
from veranda_spark.operators.raster import burn_in

spark = SparkSession.builder.getOrCreate()
spark.conf.set("spark.sql.shuffle.partitions", "4")
grid = RegularGrid(tile_cols=256, tile_rows=256, n_tile_cols=16, n_tile_rows=8)
imgs = generate_images(spark, 400)
tiles = burn_in(imgs, grid, per_layer=False).collect()
chk = 0
for t in tiles:
    a = np.frombuffer(t["bytes"], dtype=t["dtype"])
    chk = (chk + int(a[a != -9999].astype("uint64").sum())) % (1 << 61)
print(f"PYFILES_OK tiles={len(tiles)} chk={chk}")
spark.stop()
"""


def _spark_submit() -> str:
    import pyspark

    cand = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    if os.path.exists(cand):
        return cand
    found = shutil.which("spark-submit")
    if found:
        return found
    pytest.skip("spark-submit not on this host")


def test_pyfiles_zip_runs_under_spark_submit(spark, tmp_path):
    sys.path.insert(0, os.path.join(ROOT, "tools"))
    import build_pyfiles

    zip_path = build_pyfiles.build(str(tmp_path / "veranda_spark.zip"))
    job = tmp_path / "job.py"
    job.write_text(JOB)

    env = dict(os.environ)
    # scrub every path that could shadow the zip: the job must import
    # veranda_spark from --py-files alone
    env["PYTHONPATH"] = ""
    env.setdefault("PYSPARK_PYTHON", sys.executable)
    env.setdefault("PYSPARK_DRIVER_PYTHON", sys.executable)
    proc = subprocess.run(
        [
            _spark_submit(),
            "--master", "local[2]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.driver.memory=2g",
            "--conf", "spark.driver.extraJavaOptions=-XX:+UseParallelGC",
            "--conf", "spark.sql.execution.arrow.maxRecordsPerBatch=1024",
            "--py-files", zip_path,
            str(job),
        ],
        cwd=str(tmp_path),  # not the repo: '' in sys.path must not find it
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    marker = [l for l in proc.stdout.splitlines() if l.startswith("PYFILES_OK")]
    assert marker, f"no marker; stderr tail: {proc.stderr[-2000:]}"
    assert proc.returncode == 0

    # same pipeline in-process must give the same tile count + checksum
    import numpy as np

    from veranda_spark.fixtures import generate_images
    from veranda_spark.grid import RegularGrid
    from veranda_spark.operators.raster import burn_in

    grid = RegularGrid(tile_cols=256, tile_rows=256, n_tile_cols=16, n_tile_rows=8)
    tiles = burn_in(generate_images(spark, 400), grid, per_layer=False).collect()
    chk = 0
    for t in tiles:
        a = np.frombuffer(t["bytes"], dtype=t["dtype"])
        chk = (chk + int(a[a != -9999].astype("uint64").sum())) % (1 << 61)
    assert marker[0] == f"PYFILES_OK tiles={len(tiles)} chk={chk}"


def test_committed_zip_matches_source_tree():
    """ADVICE r5 (medium): the committed dist/veranda_spark.zip went
    stale silently.  Guard: every packaged .py must be byte-equal to the
    source tree and the file SETS must match — a stale zip fails here
    with the exact fix (`python tools/build_pyfiles.py`)."""
    import zipfile

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    zip_path = os.path.join(root, "dist", "veranda_spark.zip")
    assert os.path.exists(zip_path), "dist/veranda_spark.zip missing — run python tools/build_pyfiles.py"
    src = set()
    for dirpath, _dirs, files in os.walk(os.path.join(root, "veranda_spark")):
        if "__pycache__" in dirpath:
            continue
        for fn in files:
            if fn.endswith(".py"):
                full = os.path.join(dirpath, fn)
                src.add(os.path.relpath(full, root).replace(os.sep, "/"))
    with zipfile.ZipFile(zip_path) as zf:
        packaged = set(zf.namelist())
        assert packaged == src, (
            f"zip/source file-set drift (run python tools/build_pyfiles.py): "
            f"only-in-zip={sorted(packaged - src)} only-in-src={sorted(src - packaged)}"
        )
        stale = []
        for name in sorted(src):
            with open(os.path.join(root, name), "rb") as f:
                if zf.read(name) != f.read():
                    stale.append(name)
        assert not stale, f"stale files in dist zip (run python tools/build_pyfiles.py): {stale}"
