"""Package vtcomposite_spark for ``spark-submit --py-files``.

Produces a single deterministic zip of the library (no tests, no caches)
that executors unpack onto their PYTHONPATH — the standard way to ship a
pure-Python engine to a multi-executor cluster:

    python tools/package_pyfiles.py                 # -> dist/vtcomposite_spark.zip
    spark-submit --py-files dist/vtcomposite_spark.zip \
        tools/submit_job.py geocode --synthesize 100000 --out /data/rollup

Deterministic: entries are sorted and timestamps zeroed, so the same tree
always produces byte-identical artifacts (a stable cache key for
``spark.yarn.dist.files``-style upload dedupe).
"""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(ROOT, "dist", "vtcomposite_spark.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    pkg = os.path.join(ROOT, "vtcomposite_spark")
    entries = []
    for dirpath, dirnames, filenames in os.walk(pkg):
        dirnames[:] = [d for d in dirnames if d != "__pycache__"]
        for fn in filenames:
            if fn.endswith(".py"):
                full = os.path.join(dirpath, fn)
                entries.append((os.path.relpath(full, ROOT), full))
    entries.sort()
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for arcname, full in entries:
            info = zipfile.ZipInfo(arcname, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            with open(full, "rb") as f:
                zf.writestr(info, f.read())
    return out_path


if __name__ == "__main__":
    print(build())
