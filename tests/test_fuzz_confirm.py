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


def _det(name, pct, x, y, w, h):
    return (f"{name}: {pct}%\t(left_x: {x:4d}   top_y: {y:4d}   "
            f"width: {w:4d}   height: {h:4d})")


def test_classifier_subprecision_flips_uncapped():
    """Degenerate exp-amplified nets print boxes ~1e5-1e6 counts tall; a
    ±1 flip there is <=1e-5 RELATIVE and must not count against the 5%
    print-precision residue cap (round-5 campaign, net seed 2148: 12/200
    such flips, all sub-precision)."""
    sys.path.insert(0, HERE)
    from fuzz_cfgs import _ulp_class_only
    oracle = [_det("aaa", 40 + i % 9, 3 + i, -50000 - 7 * i, 20, 100000 + 13 * i)
              for i in range(100)]
    ours = [l for l in oracle]
    import re as _re
    for i in range(0, 16, 2):    # 8 flips: > the 5% precision cap, within
        #                          the 10% overall residue bound
        ours[i] = _re.sub(r"height: (\s*\d+)",
                          lambda m: f"height: {int(m.group(1)) + 1}", ours[i])
    assert _ulp_class_only(oracle, ours)
    # the same 8 flips at PRINT precision (small heights) must be capped
    oracle_s = [_det("aaa", 40 + i % 9, 3 + i, 5 + i, 20, 30 + i)
                for i in range(100)]
    ours_s = [l for l in oracle_s]
    for i in range(0, 16, 2):
        ours_s[i] = _re.sub(r"height: (\s*\d+)",
                            lambda m: f"height: {int(m.group(1)) + 1}",
                            ours_s[i])
    assert not _ulp_class_only(oracle_s, ours_s)


def test_classifier_relative_bound_and_tie_cap():
    """At exp-amplified magnitudes the per-coordinate bound is RELATIVE
    (<=1e-5: a 1.4e6-count box legitimately moves several printed counts on
    ~1e-6 ULP noise), but a 0.1%-relative systematic error must reject —
    and must not escape through the nms_tie class (same-class equal-conf
    heavy-overlap pairs are capped at 2%: real tie flips are rare)."""
    sys.path.insert(0, HERE)
    from fuzz_cfgs import _ulp_class_only
    oracle = [_det("aaa", 40 + i % 9, 3 + i, -700000 - 9 * i, 20,
                   1400000 + 13 * i) for i in range(100)]
    drift = [l for l in oracle]
    import re as _re
    for i in range(0, 16, 2):    # 8 flips of 2-4 counts at ~1.4e6
        drift[i] = _re.sub(r"height: (\s*\d+)",
                           lambda m: f"height: {int(m.group(1)) + 4}",
                           drift[i])
    assert _ulp_class_only(oracle, drift)
    bug = [_re.sub(r"height: (\s*\d+)",
                   lambda m: f"height: {int(int(m.group(1)) * 1.001)}", l)
           for l in oracle]
    assert not _ulp_class_only(oracle, bug)


def test_classifier_suppression_singleton():
    """A line-count delta of one, where the singleton overlaps a same-class
    det of >= its confidence (its would-be suppressor), is the documented
    IoU-boundary suppression flip; without such a suppressor it must be
    rejected (round-5 campaign, net seed 2166)."""
    sys.path.insert(0, HERE)
    from fuzz_cfgs import _ulp_class_only
    base = [_det("bbb", 60 + i % 20, 10 * i, 40, 8, 9) for i in range(20)]
    # ours keeps an extra det overlapping base[0] (same class, lower conf)
    extra_ok = _det("bbb", 55, 2, 41, 8, 9)       # overlaps det at x=0..8
    assert _ulp_class_only(base, base + [extra_ok])
    assert _ulp_class_only(base + [extra_ok], base)   # either side
    # an extra det overlapping NOTHING is a real bug, not suppression noise
    extra_bad = _det("bbb", 55, 500, 500, 8, 9)
    assert not _ulp_class_only(base, base + [extra_bad])
    # an EXACT DUPLICATE print is a total NMS failure, never a threshold
    # flip (IoU 1.0 is nowhere near the nms threshold) — e == s must not
    # self-match as the suppressor (round-5 review hardening)
    assert not _ulp_class_only(base, base + [base[5]])
    # two singletons blow the max(1, n/100) budget at n=20
    assert not _ulp_class_only(base, base + [extra_ok, extra_ok])


def test_classifier_checks_secondary_class_lines():
    """A diff confined to secondary 'name: NN%' continuation lines was
    previously invisible to the classifier (round-5 review): a corrupted
    percentage must now reject."""
    sys.path.insert(0, HERE)
    from fuzz_cfgs import _ulp_class_only
    box = _det("aaa", 80, 10, 10, 20, 20)
    oracle = [box, "bbb: 23%", box, "ccc: 31%"]
    ours_ok = [box, "bbb: 24%", box, "ccc: 31%"]      # ±1 print flip
    ours_bad = [box, "bbb: 87%", box, "ccc: 31%"]     # corrupted pct
    assert _ulp_class_only(oracle, oracle)
    assert _ulp_class_only(oracle, ours_ok)
    assert not _ulp_class_only(oracle, ours_bad)
    # a dropped extras line with MATCHED dets is a real bug unless its pct
    # sits at the detect threshold (existence flips with the class prob) —
    # 23% is far from thresh 30% -> reject; 31% is adjacent -> accept
    assert not _ulp_class_only(oracle, [box, box, "ccc: 31%"])
    assert _ulp_class_only(oracle, [box, "bbb: 23%", box])
    # threshold-existence flips never stack without bound... but each must
    # be adjacent: dropping BOTH lines still fails on the 23% one
    assert not _ulp_class_only(oracle, [box, box])


def test_boundary_dist():
    sys.path.insert(0, HERE)
    from fuzz_cfgs import _boundary_dist
    assert _boundary_dist(12.5) == 0.0
    assert _boundary_dist(-3.5) == 0.0
    assert abs(_boundary_dist(7.0) - 0.5) < 1e-12
    assert abs(_boundary_dist(-7.2) - 0.3) < 1e-9
    assert _boundary_dist(0.4999) < 2e-4
