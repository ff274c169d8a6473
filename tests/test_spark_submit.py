"""North-rule ship vehicle, end-to-end for real: the engine must run
via ``spark-submit --py-files crawlspark.zip`` (BASELINE.json
north_rule; reference ships as a binary, we ship as a zip). This test
launches an ACTUAL spark-submit subprocess — fresh JVM, fresh Python,
no repo on sys.path — with the package shipped only through
--py-files, and checks the closed-form mock-site BFS numbers
((i+k+1)%100 graph, 10 links, depth 3 → 31 pages in rounds
1/10/10/10).
"""

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest


def _make_pkg_zip(tmp_path) -> str:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    zpath = str(tmp_path / "crawlspark.zip")
    pkg = os.path.join(repo, "scrapy_rs_spark")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, dirs, files in os.walk(pkg):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, repo))
    return zpath


@pytest.mark.skipif(
    shutil.which("spark-submit") is None, reason="no spark-submit on PATH"
)
def test_spark_submit_py_files_ship_path(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    zpath = _make_pkg_zip(tmp_path)
    env = dict(os.environ)
    # the job must see the package ONLY via --py-files: strip any
    # inherited path to the checkout and run from a neutral cwd
    env.pop("PYTHONPATH", None)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    out = subprocess.run(
        [
            "spark-submit",
            "--master",
            "local[4]",
            "--conf",
            "spark.sql.shuffle.partitions=4",
            "--conf",
            "spark.ui.enabled=false",
            "--py-files",
            zpath,
            os.path.join(repo, "tools", "submit_job.py"),
            str(tmp_path / "store"),
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    last = [l for l in out.stdout.splitlines() if l.strip()][-1]
    rec = json.loads(last)
    assert rec.get("pkg") == "zip", rec  # imported from the shipped zip
    # closed-form BFS: 1 seed + 3 waves of 10 over (i+k+1)%100
    assert (rec["requests"], rec["items"], rec["errors"]) == (31, 31, 0)
    assert rec["per_round_requests"] == [0, 1, 10, 10, 10]
