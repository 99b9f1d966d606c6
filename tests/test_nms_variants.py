"""Dead NMS variants parity: do_nms_sort_v2 / do_nms vs the reference box.c code,
reached through a custom C harness (they are unreachable from the reference CLI)."""

import os
import subprocess

import numpy as np
import pytest

from yolo2_light_tpu.post.boxes import do_nms, do_nms_sort_v2

DATA = os.path.join(os.path.dirname(__file__), "data")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ORACLE_DIR = os.path.join(REPO, ".oracle")
HARNESS = os.path.join(ORACLE_DIR, "nms_variants_harness")


@pytest.fixture(scope="module")
def harness(oracle):
    if not os.path.exists(HARNESS):
        hobj = os.path.join(ORACLE_DIR, "nms_variants_harness.o")
        subprocess.run(["gcc", "-O1", "-I/root/reference/src", "-c",
                        os.path.join(DATA, "nms_variants_harness.c"), "-o", hobj],
                       check=True, capture_output=True)
        subprocess.run(["gcc", "-O1", hobj, os.path.join(ORACLE_DIR, "box.o"),
                        "-o", HARNESS, "-lm"],
                       check=True, capture_output=True)
    return HARNESS


def _run_case(harness, mode, boxes, probs, thresh, tmp_path):
    total, classes = probs.shape
    data = tmp_path / f"{mode}_{total}_{classes}.f32"
    with open(data, "wb") as f:
        boxes.astype(np.float32).tofile(f)
        probs.astype(np.float32).tofile(f)
    res = subprocess.run([harness, mode, str(data), str(total), str(classes),
                          str(thresh)], capture_output=True, text=True,
                         timeout=120)
    assert res.returncode == 0, res.stderr[-500:]
    return np.array([[float(v) for v in line.split()]
                     for line in res.stdout.splitlines()], np.float32)


def _random_case(seed, total, classes):
    rng = np.random.RandomState(seed)
    boxes = np.stack([rng.uniform(0.2, 0.8, total), rng.uniform(0.2, 0.8, total),
                      rng.uniform(0.05, 0.6, total), rng.uniform(0.05, 0.6, total)],
                     axis=1).astype(np.float32)
    probs = rng.rand(total, classes).astype(np.float32)
    # realistic sparsity: most probs zeroed, and distinct values (qsort tie order
    # in the reference is unspecified)
    probs[rng.rand(total, classes) < 0.6] = 0.0
    return boxes, probs


@pytest.mark.parametrize("seed,total,classes", [(0, 40, 5), (1, 80, 3), (2, 25, 8)])
def test_do_nms_sort_v2_parity(harness, tmp_path, seed, total, classes):
    boxes, probs = _random_case(seed, total, classes)
    ref = _run_case(harness, "v2", boxes, probs.copy(), 0.45, tmp_path)
    ours = probs.copy()
    do_nms_sort_v2(boxes, ours, classes, 0.45)
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("seed,total,classes", [(3, 40, 5), (4, 80, 3), (5, 25, 8)])
def test_do_nms_parity(harness, tmp_path, seed, total, classes):
    boxes, probs = _random_case(seed, total, classes)
    ref = _run_case(harness, "plain", boxes, probs.copy(), 0.45, tmp_path)
    ours = probs.copy()
    do_nms(boxes, ours, classes, 0.45)
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-6)


def test_do_nms_sort_uncached_iou_path_matches_cached(monkeypatch):
    """The numpy fallback's IoU-matrix cap (_IOU_CACHE_MAX_ROWS, mirroring
    native/nms.cpp's 16384-row bitset cap): above it rows are computed on
    the fly — results must be identical to the cached path, including
    nms_order, on a tie-heavy workload."""
    from yolo2_light_tpu.post import boxes as B

    rng = np.random.RandomState(11)
    n, classes = 400, 5
    bbox = np.stack([rng.rand(n), rng.rand(n),
                     rng.uniform(0.1, 0.6, n), rng.uniform(0.1, 0.6, n)],
                    axis=-1).astype(np.float32)
    obj = (rng.rand(n) > 0.1).astype(np.float32) * rng.rand(n).astype(np.float32)
    # quantized probs -> plenty of exact ties
    prob = (np.round(rng.rand(n, classes) * 8) / 8).astype(np.float32)
    prob[obj == 0] = 0

    def run(cap):
        monkeypatch.setattr(B, "_IOU_CACHE_MAX_ROWS", cap)
        # force the numpy fallback: non-contiguous prob skips the native lib
        d = B.Detections(bbox.copy(), obj.copy(),
                         np.asfortranarray(prob.copy()))
        B.do_nms_sort(d, classes, 0.45)
        return d

    a = run(1 << 20)   # cached matrix
    b = run(1)         # on-the-fly rows
    np.testing.assert_array_equal(a.prob, b.prob)
    np.testing.assert_array_equal(a.nms_order, b.nms_order)
    assert (a.prob == 0).sum() > (prob == 0).sum()   # NMS actually suppressed
