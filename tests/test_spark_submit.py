"""spark-submit --py-files smoke test.

The north rule's deployment shape is ``spark-submit --py-files
mhap_spark.zip`` on a real cluster (reference analog: the fat-jar
invocation in docs/source/quickstart.rst).  This test proves the repo is
actually submittable that way — the job script is copied OUTSIDE the repo
and run from a foreign cwd, so every ``mhap_spark.*`` import must resolve
from the shipped zip, exactly as on a cluster where executors only see
``--py-files``.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import zipfile
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not on this host"
)
def test_spark_submit_py_files(tmp_path):
    zip_path = tmp_path / "mhap_spark.zip"
    with zipfile.ZipFile(zip_path, "w") as z:
        for p in sorted((REPO / "mhap_spark").rglob("*.py")):
            z.write(p, p.relative_to(REPO))

    # the submitted script lives outside the repo: imports MUST come from the zip
    job = tmp_path / "job.py"
    shutil.copy(REPO / "mhap_spark" / "pipeline.py", job)

    env = {**os.environ, "PYSPARK_PYTHON": sys.executable}
    env.pop("PYTHONPATH", None)  # nothing may leak the repo onto the path
    out = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master",
            "local[4]",
            "--py-files",
            str(zip_path),
            str(job),
            "--master",
            "local[4]",
            "--rows",
            "3000",
            "--num-hashes",
            "128",
        ],
        cwd=tmp_path,
        capture_output=True,
        text=True,
        timeout=900,
        env=env,
    )
    assert out.returncode == 0, f"spark-submit failed:\n{out.stderr[-4000:]}"
    result = [l for l in out.stdout.splitlines() if l.startswith("pairs=")]
    assert result, f"no result line in stdout:\n{out.stdout[-2000:]}"
    # pairs=N clusters=M with a non-degenerate cluster count
    pairs, clusters = (int(tok.split("=")[1]) for tok in result[0].split())
    assert pairs > 0 and 0 < clusters < 3000
