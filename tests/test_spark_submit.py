"""The north-rule launch path, literally: spark-submit --py-files.

Everything else runs the job mains in-process; this packages
``mismo_spark`` into a zip and launches the curation job through the
real ``spark-submit`` binary, proving the jobs are self-contained
(imports resolved from the zip, no repo-rooted sys.path tricks)."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(
    shutil.which("spark-submit") is None, reason="spark-submit not on PATH"
)
def test_spark_submit_py_files(tmp_path):
    zpath = tmp_path / "mismo_spark.zip"
    pkg = os.path.join(REPO, "mismo_spark")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))

    out = tmp_path / "curated"
    cmd = [
        "spark-submit",
        "--master", "local[2]",
        "--conf", "spark.sql.shuffle.partitions=4",
        "--conf", "spark.ui.enabled=false",
        "--py-files", str(zpath),
        os.path.join(REPO, "jobs", "prep_training_data.py"),
        "--input", "/root/testdata/sf0.001/documents.parquet",
        "--output", str(out),
        "--id-col", "doc_id",
        "--skip-neardup",
    ]
    env = dict(os.environ)
    # the job must import mismo_spark from the --py-files zip, not the
    # repo checkout
    env.pop("PYTHONPATH", None)
    r = subprocess.run(
        cmd, capture_output=True, text=True, timeout=900, env=env,
        cwd=str(tmp_path),
    )
    assert r.returncode == 0, (r.stderr or r.stdout)[-3000:]
    counters = json.loads((out / "counters.json").read_text())
    assert counters["written_docs"] > 0
    assert counters["after_exact_dedupe"] <= counters["input_docs"]
