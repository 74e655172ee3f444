"""Package the engine for ``spark-submit --py-files`` (north rule: the
engine ships as a zip; no cluster-side install).

    python tools/build_pyfiles.py          # -> dist/veranda_spark.zip
    spark-submit --py-files dist/veranda_spark.zip your_job.py
"""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(ROOT, "dist", "veranda_spark.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        pkg = os.path.join(ROOT, "veranda_spark")
        for dirpath, _dirs, files in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for fn in sorted(files):
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    zf.write(full, os.path.relpath(full, ROOT))
    return out_path


if __name__ == "__main__":
    print(build())
