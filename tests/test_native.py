"""Native C++ components vs the NumPy reference implementations."""

import numpy as np
import pytest

from yolo2_light_tpu.native import (get_lib, nms_sort_native, resize_hwc_native)


@pytest.fixture(scope="module")
def lib():
    l = get_lib()
    if l is None:
        pytest.skip("no g++ toolchain")
    return l


def _numpy_nms(bbox, prob, objectness, classes, thresh):
    """Pure-NumPy do_nms_sort (the pre-native implementation) as oracle."""
    from yolo2_light_tpu.post.boxes import box_iou
    live = objectness != 0
    idx_live = np.nonzero(live)[0]
    b = bbox[idx_live]
    p = prob[idx_live]
    iou = box_iou(b, b)
    for k in range(classes):
        order = np.argsort(-p[:, k], kind="stable")
        for oi, i in enumerate(order):
            if p[i, k] == 0:
                continue
            rest = order[oi + 1:]
            p[rest[iou[i, rest] > thresh], k] = 0.0
    out = prob.copy()
    out[idx_live] = p
    return out


def test_native_nms_matches_numpy(lib):
    rng = np.random.RandomState(0)
    n, classes = 200, 7
    bbox = np.stack([rng.uniform(0, 1, n), rng.uniform(0, 1, n),
                     rng.uniform(0.05, 0.5, n), rng.uniform(0.05, 0.5, n)],
                    axis=1).astype(np.float32)
    prob = rng.rand(n, classes).astype(np.float32)
    prob[prob < 0.5] = 0.0
    objectness = (rng.rand(n) > 0.1).astype(np.float32)
    expected = _numpy_nms(bbox, prob.copy(), objectness, classes, 0.45)
    got = np.ascontiguousarray(prob.copy())
    order = nms_sort_native(bbox, got, objectness, 0.45)
    assert order is not None
    # continuous probs -> no exact ties, so the simple per-class-stable-sort
    # oracle above predicts the same suppression as the reference's carried
    # permutation (tie cases: tests/test_nms_tie_order.py)
    np.testing.assert_array_equal(got, expected)
    assert sorted(order.tolist()) == list(range(bbox.shape[0]))


def test_native_resize_matches_numpy(lib, monkeypatch):
    from yolo2_light_tpu.io import image as im_io
    rng = np.random.RandomState(1)
    im = rng.rand(37, 53, 3).astype(np.float32)
    native = resize_hwc_native(im, 64, 48)
    # force the numpy path for the oracle
    import yolo2_light_tpu.native as nat
    monkeypatch.setattr(nat, "_lib", None)
    monkeypatch.setattr(nat, "_lib_failed", True)
    ref = im_io.resize_image(im, 64, 48)
    np.testing.assert_allclose(native, ref, rtol=1e-6, atol=1e-6)


def test_native_resize_identity_edges(lib):
    rng = np.random.RandomState(2)
    im = rng.rand(10, 10, 3).astype(np.float32)
    out = resize_hwc_native(im, 10, 10)
    np.testing.assert_allclose(out, im, atol=1e-6)
    up = resize_hwc_native(im, 20, 20)
    # corners preserved by darknet endpoint rule
    np.testing.assert_allclose(up[0, 0], im[0, 0], atol=1e-6)
    np.testing.assert_allclose(up[-1, -1], im[-1, -1], atol=1e-6)
