"""Legacy box-gradient math vs central finite differences.

The reference validates its own box gradients by finite differences
(src/box.c:136-208 — test_dintersect / test_dunion / test_box print analytic
vs "Manual" probe-step quotients). This file runs the same idea as asserts,
over randomized box pairs, plus the reference-exact quirks:

* ``diou`` must equal ``b - a`` ALWAYS — the reference's guard is
  ``if(i <= 0 || 1)`` (box.c:216), i.e. unconditional.
* ``encode_box``/``decode_box`` are exact inverses (box.c:350-368).
"""

import numpy as np
import pytest

from yolo2_light_tpu.post import boxes_legacy as BL


def _fd(fn, a, b, eps=1e-4):
    """Central finite-difference gradient of scalar fn(a, b) w.r.t. a."""
    g = np.zeros(4, np.float64)
    for k in range(4):
        ap, am = a.astype(np.float64).copy(), a.astype(np.float64).copy()
        ap[k] += eps
        am[k] -= eps
        g[k] = (fn(ap, b) - fn(am, b)) / (2 * eps)
    return g


def _inter(a, b):
    w = min(a[0] + a[2] / 2, b[0] + b[2] / 2) - max(a[0] - a[2] / 2,
                                                    b[0] - b[2] / 2)
    h = min(a[1] + a[3] / 2, b[1] + b[3] / 2) - max(a[1] - a[3] / 2,
                                                    b[1] - b[3] / 2)
    return 0.0 if (w < 0 or h < 0) else w * h


def _union(a, b):
    return a[2] * a[3] + b[2] * b[3] - _inter(a, b)


def _pairs(n=64, seed=0):
    """Random overlapping pairs with no edge-order tie near the probe step
    (a tie inside +-eps puts the finite difference astride the subgradient
    kink, where no single-sided analytic value can match)."""
    rng = np.random.RandomState(seed)
    out = []
    while len(out) < n:
        a = np.array([rng.uniform(-1, 1), rng.uniform(-1, 1),
                      rng.uniform(0.3, 1.5), rng.uniform(0.3, 1.5)], np.float32)
        b = np.array([a[0] + rng.uniform(-0.4, 0.4),
                      a[1] + rng.uniform(-0.4, 0.4),
                      rng.uniform(0.3, 1.5), rng.uniform(0.3, 1.5)], np.float32)
        if _inter(a, b) <= 1e-3:
            continue
        edges_a = [a[0] - a[2] / 2, a[0] + a[2] / 2,
                   a[1] - a[3] / 2, a[1] + a[3] / 2]
        edges_b = [b[0] - b[2] / 2, b[0] + b[2] / 2,
                   b[1] - b[3] / 2, b[1] + b[3] / 2]
        if min(abs(ea - eb) for ea in edges_a for eb in edges_b) < 1e-3:
            continue
        out.append((a, b))
    return out


@pytest.mark.parametrize("fn,scalar", [
    (BL.dintersect, _inter),
    (BL.dunion, _union),
])
def test_gradients_match_finite_differences(fn, scalar):
    for a, b in _pairs():
        got = fn(a, b)
        want = _fd(scalar, a, b)
        np.testing.assert_allclose(got, want, atol=5e-3, err_msg=f"{a} {b}")


def test_diou_analytic_matches_finite_differences():
    # the dead branch's math relative to d((1 - IoU)^2)/d(a): the reference
    # formula (box.c:227-232) drops the chain-rule minus sign, so it equals
    # the NEGATIVE of the loss gradient (the descent direction) — its own
    # test_box printout shows the flip and never asserts; we pin it exactly
    def loss(a, b):
        iou = _inter(a, b) / _union(a, b)
        return (1 - iou) ** 2

    for a, b in _pairs(32, seed=1):
        got = BL.diou_analytic(a, b)
        want = -_fd(loss, a, b)
        np.testing.assert_allclose(got, want, atol=5e-3, err_msg=f"{a} {b}")


def test_diou_is_unconditionally_the_delta_branch():
    # box.c:216 `if(i <= 0 || 1)`: even heavily-overlapping boxes take the
    # early return, so diou == b - a everywhere
    rng = np.random.RandomState(2)
    a = rng.rand(100, 4).astype(np.float32) + 0.1
    b = a + rng.randn(100, 4).astype(np.float32) * 0.05   # mostly overlapping
    np.testing.assert_array_equal(BL.diou(a, b), b - a)


def test_derivative_disjoint_is_pure_approach():
    # fully-disjoint boxes: d_center snaps to the approach direction, d_w = 0
    a = np.array([0.0, 0.0, 1.0, 1.0], np.float32)
    b = np.array([5.0, 0.0, 1.0, 1.0], np.float32)   # b far right of a
    d = BL.derivative(a, b)
    assert d[0] == 1.0 and d[2] == 0.0, d
    d = BL.derivative(b, a)                           # a far LEFT of b
    assert d[0] == -1.0 and d[2] == 0.0, d


def test_box_rmse():
    a = np.array([[0, 0, 1, 1], [1, 2, 3, 4]], np.float32)
    b = np.array([[3, 4, 1, 1], [1, 2, 3, 4]], np.float32)
    np.testing.assert_allclose(BL.box_rmse(a, b), [5.0, 0.0], atol=1e-6)


def test_encode_decode_roundtrip():
    rng = np.random.RandomState(3)
    boxes = np.stack([rng.uniform(-2, 2, 200), rng.uniform(-2, 2, 200),
                      rng.uniform(0.05, 4, 200), rng.uniform(0.05, 4, 200)],
                     axis=-1).astype(np.float32)
    anchors = np.stack([rng.uniform(-2, 2, 200), rng.uniform(-2, 2, 200),
                        rng.uniform(0.1, 4, 200), rng.uniform(0.1, 4, 200)],
                       axis=-1).astype(np.float32)
    enc = BL.encode_box(boxes, anchors)
    dec = BL.decode_box(enc, anchors)
    np.testing.assert_allclose(dec, boxes, rtol=2e-5, atol=2e-5)
    # the coding itself, spot value: centered-on-anchor same-size box -> zeros
    z = BL.encode_box(anchors, anchors)
    np.testing.assert_allclose(z, np.zeros_like(z), atol=1e-7)
