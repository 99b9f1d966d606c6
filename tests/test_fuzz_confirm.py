"""The f64 two-sided noise-confirmation gate (tests/fuzz_confirm.py +
fuzz_cfgs._confirm_f64).

The fuzzer's ULP classifier accepts ±1 print deltas; round-4's VERDICT
pointed out a logic bug producing small integer deltas would slip through
the same gate. The confirming rerun closes that: a disputed field must be
boundary-adjacent at f64. These tests prove the gate's discrimination
directly — a fabricated off-by-one "oracle" (a stand-in for a repo logic
bug) passes the old classifier but is REJECTED by the confirm; the true
oracle output is accepted.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
CFG = os.path.join(HERE, "data", "mini-res.cfg")
IMG = os.path.join(HERE, "data", "dog160.png")
NAMES = "/root/reference/bin/coco.names"


@pytest.fixture(scope="module")
def weights(tmp_path_factory):
    from yolo2_light_tpu.cfg import parse_network_cfg
    from yolo2_light_tpu.weights import random_params, save_weights
    p = str(tmp_path_factory.mktemp("w") / "mini.weights")
    spec = parse_network_cfg(CFG, batch=1)
    save_weights(spec, random_params(spec, seed=7), p)
    return p


@pytest.fixture(scope="module")
def ours_stdout(weights):
    r = subprocess.run(
        [sys.executable, "-m", "yolo2_light_tpu", "detector", "test",
         NAMES, CFG, weights, IMG, "-thresh", "0.3", "-dont_show"],
        capture_output=True, text=True, timeout=600, cwd=REPO,
        env={**os.environ, "YOLO2_TPU_PLATFORM": "cpu",
             "PYTHONPATH": REPO})
    assert r.returncode == 0, r.stderr[-1000:]
    return [l for l in r.stdout.splitlines() if "Predicted in" not in l]


def _confirm(oracle_lines, weights):
    sys.path.insert(0, HERE)
    from fuzz_cfgs import _confirm_f64
    return _confirm_f64(NAMES, CFG, weights, IMG, 0.3, False, oracle_lines)


@pytest.mark.slow
def test_confirm_accepts_true_noise_free_case(weights, ours_stdout):
    # the f32 CLI output IS the oracle here (mini-res is byte-exact vs the
    # compiled reference on this workload); f64 vs it must land in the noise
    # class with every residue boundary-adjacent
    ok, msg = _confirm(ours_stdout, weights)
    assert ok, msg


@pytest.mark.slow
def test_confirm_rejects_fabricated_off_by_one(weights, ours_stdout):
    # a +1 width on one detection passes the old +-1 classifier but is NOT
    # boundary-adjacent at f64 -> the two-sided gate must reject
    sys.path.insert(0, HERE)
    from fuzz_cfgs import _boundary_dist, _ulp_class_only
    import re

    fake, bumped = [], False
    for line in ours_stdout:
        m = re.search(r"width: (\s*-?\d+)", line)
        if m and not bumped:
            w = int(m.group(1))
            line = line.replace(f"width: {m.group(1)}",
                                f"width: {w + 1:4.0f}".replace(".", ""))
            # keep the printf %4.0f column shape
            line = re.sub(r"width: \s*(-?\d+)",
                          lambda mm: "width: {:4.0f}".format(
                              float(mm.group(1))), line)
            bumped = True
        fake.append(line)
    assert bumped, "no boxed detection line to perturb"
    assert _ulp_class_only(fake, ours_stdout), (
        "the fabricated delta must pass the old single-sided classifier "
        "for this test to mean anything")
    ok, msg = _confirm(fake, weights)
    assert not ok, f"gate accepted a fabricated off-by-one: {msg}"
    assert "boundary" in msg or "not lowering noise" in msg, msg


def test_boundary_dist():
    sys.path.insert(0, HERE)
    from fuzz_cfgs import _boundary_dist
    assert _boundary_dist(12.5) == 0.0
    assert _boundary_dist(-3.5) == 0.0
    assert abs(_boundary_dist(7.0) - 0.5) < 1e-12
    assert abs(_boundary_dist(-7.2) - 0.3) < 1e-9
    assert _boundary_dist(0.4999) < 2e-4
