"""NMS tie-order parity: both do_nms_sort engines (native C++, numpy
fallback) must reproduce a LITERAL transcription of the reference's
do_nms_sort (src/box.c:296-328) — including the zero-objectness
swap-compaction order, the per-class sort permutation carried across
classes, and stable tie handling (glibc qsort is a stable mergesort; the
comparator returns 0 on equal probs, box.c:280-294).

Tie order is not cosmetic: among equal-prob mutually-overlapping boxes the
survivor differs with order, and a different survivor suppresses a
DIFFERENT transitive set — the generative map fuzz caught detections_count
52207 vs 52209 on a tie-degenerate 55k-box net before this was pinned.
"""

import ctypes
import os
import subprocess
import sys
import tempfile

import numpy as np
import pytest

from yolo2_light_tpu.post import boxes as post

QSORT_PROBE = r"""
#include <stdio.h>
#include <stdlib.h>
typedef struct { float key; int idx; } item;
int cmp(const void *a, const void *b) {
    float d = ((item*)a)->key - ((item*)b)->key;
    if (d < 0) return 1; else if (d > 0) return -1; return 0;
}
int main(void) {
    for (int n = 10; n <= 100000; n *= 10) {
        item *v = malloc(n * sizeof(item));
        for (int i = 0; i < n; i++) { v[i].key = (float)((i * 7) % 5); v[i].idx = i; }
        qsort(v, n, sizeof(item), cmp);
        for (int i = 1; i < n; i++)
            if (v[i].key == v[i-1].key && v[i].idx < v[i-1].idx) {
                printf("UNSTABLE at n=%d\n", n); return 1;
            }
        free(v);
    }
    printf("STABLE\n");
    return 0;
}
"""


def test_glibc_qsort_is_stable_on_ties():
    """The emulation's load-bearing assumption: THIS glibc's qsort (the one
    the oracle binary calls) keeps equal-comparing elements in order. glibc
    uses a malloc-backed mergesort (stable); if a future environment swaps in
    an unstable introsort, this test fails first and loudly."""
    with tempfile.TemporaryDirectory() as td:
        src = os.path.join(td, "probe.c")
        exe = os.path.join(td, "probe")
        with open(src, "w") as f:
            f.write(QSORT_PROBE)
        subprocess.run(["gcc", "-O2", src, "-o", exe], check=True)
        res = subprocess.run([exe], capture_output=True, text=True)
        assert res.returncode == 0 and "STABLE" in res.stdout, res.stdout


def _iou_pair(a, b):
    return float(post.box_iou(np.asarray(a, np.float32)[None],
                              np.asarray(b, np.float32)[None])[0, 0])


def _reference_nms_literal(bbox, objectness, prob, classes, thresh):
    """Line-for-line transcription of do_nms_sort (box.c:296-328) with
    Python's stable sort standing in for glibc's stable-mergesort qsort."""
    dets = [{"bbox": bbox[i], "obj": float(objectness[i]),
             "prob": prob[i].copy(), "id": i} for i in range(len(objectness))]
    k = len(dets) - 1
    i = 0
    while i <= k:                     # box.c:299-309 swap compaction
        if dets[i]["obj"] == 0:
            dets[i], dets[k] = dets[k], dets[i]
            k -= 1
        else:
            i += 1
    total = k + 1
    for kcls in range(classes):       # box.c:311-327
        dets[:total] = sorted(dets[:total],
                              key=lambda d: -d["prob"][kcls])
        for i in range(total):
            if dets[i]["prob"][kcls] == 0:
                continue
            a = dets[i]["bbox"]
            for j in range(i + 1, total):
                if _iou_pair(a, dets[j]["bbox"]) > thresh:
                    dets[j]["prob"][kcls] = 0.0
    out_prob = np.zeros_like(prob)
    for d in dets:
        out_prob[d["id"]] = d["prob"]
    return out_prob, np.array([d["id"] for d in dets], np.int64)


def _tie_heavy_candidates(rng, n, classes):
    """Clustered boxes + probs quantized to a handful of exact levels: the
    degenerate regime where suppression depends on tie order."""
    boxes = rng.rand(n, 4).astype(np.float32)
    boxes[:, 2:] = 0.1 + 0.3 * boxes[:, 2:]
    centers = rng.rand(max(1, n // 10), 2)
    boxes[:, :2] = (centers[rng.randint(0, centers.shape[0], n)]
                    + 0.02 * rng.randn(n, 2)).astype(np.float32)
    levels = np.array([0.0, 0.0, 0.3, 0.5, 0.7], np.float32)
    prob = levels[rng.randint(0, len(levels), (n, classes))]
    objectness = np.where(rng.rand(n) < 0.2, 0.0, 1.0).astype(np.float32)
    prob[objectness == 0] = 0.0
    return boxes, objectness, prob


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_native_matches_literal_reference(seed):
    from yolo2_light_tpu.native import nms_sort_native
    rng = np.random.RandomState(seed)
    boxes, obj, prob = _tie_heavy_candidates(rng, 160, 3)
    want_prob, want_order = _reference_nms_literal(
        boxes, obj, prob, 3, 0.45)
    got = prob.copy()
    order = nms_sort_native(boxes, got, obj, 0.45)
    if order is None:
        pytest.skip("native lib unavailable")
    assert (got > 0).sum() != prob.size  # something actually suppressed
    np.testing.assert_array_equal(got, want_prob)
    np.testing.assert_array_equal(order, want_order)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_numpy_fallback_matches_literal_reference(seed, monkeypatch):
    import yolo2_light_tpu.native as native
    monkeypatch.setattr(native, "nms_sort_native", lambda *a, **k: None)
    rng = np.random.RandomState(seed)
    boxes, obj, prob = _tie_heavy_candidates(rng, 160, 3)
    want_prob, want_order = _reference_nms_literal(
        boxes, obj, prob, 3, 0.45)
    dets = post.Detections(boxes, obj, prob.copy())
    post.do_nms_sort(dets, 3, 0.45)
    np.testing.assert_array_equal(dets.prob, want_prob)
    np.testing.assert_array_equal(dets.nms_order, want_order)


def test_engines_agree_and_set_order():
    """Native and numpy paths agree with each other on a bigger tie-heavy set
    and both expose nms_order (live permutation + compacted tail)."""
    import yolo2_light_tpu.native as native
    rng = np.random.RandomState(7)
    boxes, obj, prob = _tie_heavy_candidates(rng, 600, 4)
    d1 = post.Detections(boxes, obj, prob.copy())
    post.do_nms_sort(d1, 4, 0.45)
    try:
        import unittest.mock as mock
        with mock.patch.object(native, "nms_sort_native",
                               lambda *a, **k: None):
            d2 = post.Detections(boxes, obj, prob.copy())
            post.do_nms_sort(d2, 4, 0.45)
    finally:
        pass
    np.testing.assert_array_equal(d1.prob, d2.prob)
    np.testing.assert_array_equal(d1.nms_order, d2.nms_order)
    assert sorted(d1.nms_order.tolist()) == list(range(600))
    # the tail is exactly the zero-objectness dets
    nl = int((obj != 0).sum())
    assert set(d1.nms_order[nl:].tolist()) == set(np.nonzero(obj == 0)[0])
