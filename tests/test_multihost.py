"""Two-process jax.distributed rehearsal, run for real in CI.

Exercises parallel/distribute.py init_distributed with process_count=2
(reference parity: lhrs/CustomTrainer/utils/distribute.py:525-573): host
collectives, cross-process data sharding, a genuine SPMD train step over a
2-process × 4-device mesh, and the rank-merged eval-shard write protocol.
"""

import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.timeout(420)
def test_two_process_rehearsal(tmp_path):
    env = dict(os.environ)
    env["LHRS_COORD_PORT"] = "12517"
    env["LHRS_REHEARSAL_DIR"] = str(tmp_path)
    # the parent conftest pins jax to 8 CPU devices via jax.config (not env),
    # so the subprocesses configure their own 4-device CPU backends
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools",
                                      "multihost_rehearsal.py")],
        cwd=ROOT, env=env, capture_output=True, text=True, timeout=400)
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-2000:])
    assert "multihost rehearsal passed" in proc.stdout
    # the rank-merged artifact exists and holds both ranks' records
    import json

    with open(tmp_path / "rehearsal_result.json") as fh:
        merged = json.load(fh)
    assert sorted(r["rank"] for r in merged) == [0, 1]
