"""The north rule's run shape actually executes: package the library,
ship it to a FRESH spark-submit process via --py-files (cwd moved away
from the repo so the checkout itself is not importable — the zip is the
only way the executors and driver can see the engine), run a headline
job, and read the output back."""

import glob
import os
import subprocess

import duckdb

from tools.package_pyfiles import build

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_pyfiles_geocode_smoke(tmp_path):
    z = build(str(tmp_path / "vtcomposite_spark.zip"))
    out = str(tmp_path / "rollup")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the --py-files zip must be sufficient
    r = subprocess.run(
        ["spark-submit", "--master", "local[2]", "--py-files", z,
         os.path.join(REPO, "tools", "submit_job.py"),
         "geocode", "--synthesize", "3000", "--zoom", "8",
         "--out", out, "--shuffle-partitions", "4"],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=420)
    assert r.returncode == 0, r.stderr[-4000:]
    files = glob.glob(out + "/*.parquet")
    assert files
    n = duckdb.sql(f"select count(*) from '{out}/*.parquet'").fetchone()[0]
    assert n > 0
