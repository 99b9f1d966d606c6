"""Small generative-fuzz campaign (slow): random layer topologies through the
CLI vs the oracle with strict stream diffs. The full tool is
tests/fuzz_cfgs.py (run it directly for bigger campaigns)."""

import os
import subprocess
import sys

import pytest


@pytest.mark.slow
def test_random_topology_stream_parity(oracle, tmp_path):
    env = dict(os.environ, FUZZ_OUT=str(tmp_path), JAX_PLATFORMS="cpu",
               PYTHONPATH=os.path.dirname(os.path.dirname(
                   os.path.abspath(__file__))))
    res = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__),
                                      "fuzz_cfgs.py"), "4", "7000"],
        capture_output=True, text=True, timeout=1200, env=env)
    assert res.returncode == 0, res.stderr[-1000:]
    assert "0 failures" in res.stdout, res.stdout[-2000:]
