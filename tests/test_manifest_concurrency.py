"""Concurrency stress for the flock'd manifest read-modify-write.

The round-5 hardening made CheckpointStore manifest updates an exclusive-
flock read-modify-write (checkpoint.py:_update_manifest): two runs sharing
a base_dir must not lose each other's stage entries to a stale read.  This
test drives that claim with real concurrent PROCESSES — N workers each
performing M updates to disjoint stage keys through the public helper; a
lost update under racing would leave a key missing or a counter short.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os

from mhap_spark.checkpoint import CheckpointStore

N_WORKERS = 8
N_UPDATES = 25


def _worker(base_dir: str, worker: int) -> None:
    store = CheckpointStore(base_dir)
    for i in range(N_UPDATES):
        # each iteration bumps this worker's counter and stamps the step —
        # a torn/stale read would overwrite another worker's latest value
        def mutate(m, worker=worker, i=i):
            key = f"stage_w{worker}"
            cur = m.get(key, {"count": 0})
            m[key] = {"count": cur["count"] + 1, "last_step": i}

        store._update_manifest(mutate)


def test_concurrent_manifest_updates_lose_nothing(tmp_path):
    base = str(tmp_path / "ck")
    os.makedirs(base, exist_ok=True)
    procs = [
        mp.Process(target=_worker, args=(base, w)) for w in range(N_WORKERS)
    ]
    for p in procs:
        p.start()
    for p in procs:
        p.join(timeout=120)
    # kill any hung worker BEFORE asserting, so a flock deadlock (the
    # failure mode this test exists to catch) reports a clear timeout and
    # leaves no zombie mutating manifest.json under the asserts below
    hung = [p for p in procs if p.exitcode is None]
    for p in hung:
        p.kill()
        p.join()
    assert not hung, f"{len(hung)} workers timed out after 120s (flock deadlock?)"
    assert all(p.exitcode == 0 for p in procs), [p.exitcode for p in procs]
    with open(os.path.join(base, "manifest.json")) as f:
        m = json.load(f)
    for w in range(N_WORKERS):
        entry = m[f"stage_w{w}"]
        assert entry["count"] == N_UPDATES, f"lost updates for worker {w}"
        assert entry["last_step"] == N_UPDATES - 1
