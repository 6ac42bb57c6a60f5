"""Multi-executor (local-cluster) equivalence test.

The north rule's scaling criterion is phrased over EXECUTORS ("N and 4N
executors"), not threads.  ``local-cluster[n, c, m]`` is Spark's
multi-executor test master: n separate worker processes, each hosting one
executor JVM (own heap, own GC, own python-worker pool), with shuffle
blocks fetched over netty between processes — the closest single-box
realization of a real cluster.  This test pins that the full pipeline
produces BYTE-IDENTICAL results on 2 real executor JVMs as on the
in-process local master, with the package shipped to executors the
--py-files way (``addPyFile`` of a zip — cloudpickle references
``mhap_spark.*`` modules by name, so each executor's python workers must
import them from the shipped archive).

`bench.py --exec-scaling` runs the same shape at two executor counts for
the throughput criterion; this test guards the correctness half.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _child(master: str, cores: int) -> dict:
    import json

    out = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "bench.py"),
            "--pipeline-only",
            "--cores", str(cores),
            "--rows", "3000",
            "--reps", "1",
            "--master-str", master,
        ],
        capture_output=True,
        text=True,
        timeout=900,
        cwd=REPO,
    )
    assert out.returncode == 0, f"child on {master} failed:\n{out.stderr[-4000:]}"
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    assert lines, f"no JSON line from {master}:\n{out.stdout[-2000:]}"
    return json.loads(lines[-1])


def test_local_cluster_matches_local():
    lc = _child("local-cluster[2,4,4096]", cores=8)
    loc = _child("local[8]", cores=8)
    for key in ("n_candidate_pairs", "n_verified_pairs", "n_clusters"):
        assert lc[key] == loc[key], f"{key}: {lc[key]} != {loc[key]}"
    assert lc["dup_pair_recall"] == 1.0
