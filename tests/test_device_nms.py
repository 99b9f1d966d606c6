"""On-device NMS must reproduce the host do_nms_sort oracle exactly."""

import os

import jax.numpy as jnp
import numpy as np

from yolo2_light_tpu.cfg import parse_network_cfg
from yolo2_light_tpu.pipeline import DetectionPipeline
from yolo2_light_tpu.post import boxes as post
from yolo2_light_tpu.weights import fuse_conv_batchnorm, random_params

DATA = os.path.join(os.path.dirname(__file__), "data")


def _random_candidates(rng, k, classes, cluster=True):
    """Candidate set shaped like a compacted decode buffer: overlapping clusters
    of boxes, sparse thresholded probs, trailing all-zero padding rows."""
    boxes = rng.rand(k, 4).astype(np.float32)
    boxes[:, 2:] = 0.05 + 0.3 * boxes[:, 2:]
    if cluster:
        # force heavy overlap: clusters of boxes jittered around shared centers
        centers = rng.rand(max(1, k // 8), 2)
        which = rng.randint(0, centers.shape[0], k)
        boxes[:, :2] = centers[which] + 0.02 * rng.randn(k, 2)
    probs = rng.rand(k, classes).astype(np.float32)
    probs[probs < 0.6] = 0.0  # sparse, like thresholded decode output
    n_pad = k // 5
    if n_pad:
        probs[-n_pad:] = 0.0  # compaction padding
    return boxes, probs


def test_nms_probs_matches_host_oracle():
    from yolo2_light_tpu.post.device_nms import nms_probs
    rng = np.random.RandomState(0)
    for trial, (k, classes) in enumerate([(64, 3), (128, 20), (37, 1),
                                          (256, 7)]):
        boxes, probs = _random_candidates(
            np.random.RandomState(trial), k, classes)
        host = post.Detections(boxes.copy(), np.ones(k, np.float32),
                               probs.copy())
        post.do_nms_sort(host, classes, 0.45)
        dev = np.asarray(nms_probs(boxes, probs, 0.45))
        np.testing.assert_array_equal(dev, host.prob, err_msg=str((k, classes)))
    # also a duplicate-prob tie case: stable sort must match the host path
    boxes = np.tile(np.array([[0.5, 0.5, 0.2, 0.2]], np.float32), (8, 1))
    probs = np.full((8, 2), 0.7, np.float32)
    host = post.Detections(boxes.copy(), np.ones(8, np.float32), probs.copy())
    post.do_nms_sort(host, 2, 0.45)
    from yolo2_light_tpu.post.device_nms import nms_probs as f
    np.testing.assert_array_equal(np.asarray(f(boxes, probs, 0.45)), host.prob)


def test_suppressed_box_does_not_suppress():
    """Sequential-greedy property: B overlaps A (suppressed) and C overlaps B but
    not A => C must survive, because the suppressed B never suppresses."""
    from yolo2_light_tpu.post.device_nms import nms_probs
    boxes = np.array([[0.30, 0.5, 0.20, 0.2],   # A (highest prob)
                      [0.36, 0.5, 0.20, 0.2],   # B: IoU(A,B)=0.54 > 0.45
                      [0.42, 0.5, 0.20, 0.2]],  # C: IoU(B,C)=0.54, IoU(A,C)=0.25
                     np.float32)
    probs = np.array([[0.9], [0.8], [0.7]], np.float32)
    out = np.asarray(nms_probs(boxes, probs, 0.45))
    expected = probs.copy()
    expected[1] = 0.0  # only B suppressed; C survives
    np.testing.assert_array_equal(out, expected)


def _pipe_pair(cfg_name, batch, seed, **kw):
    cfg = os.path.join(DATA, cfg_name)
    spec = parse_network_cfg(cfg, batch=batch)
    params = fuse_conv_batchnorm(spec, random_params(spec, seed=seed))
    host = DetectionPipeline(spec, params, thresh=0.3, nms=0.4, k=512, **kw)
    dev = DetectionPipeline(spec, params, thresh=0.3, nms=0.4, k=512,
                            device_nms=True, **kw)
    return spec, host, dev


def _assert_same(host_dets, dev_dets):
    """Same surviving detections AS A SET. The host path keeps suppressed
    rows with zeroed probs (reference semantics: do_nms_sort edits in place)
    in DECODE order; the device path drops suppressed rows and arrives
    pre-permuted to the post-NMS reference order. Order equality is pinned
    separately by test_device_nms_tie_order_matches_host_qsort_carry."""
    def visible_sorted(d):
        m = d.prob.max(-1) > 0
        rows = np.concatenate([d.bbox[m], d.prob[m]], axis=1)
        return rows[np.lexsort(rows.T[::-1])]
    np.testing.assert_allclose(visible_sorted(dev_dets),
                               visible_sorted(host_dets), rtol=1e-6)


def test_pipeline_device_nms_matches_host_nms():
    """Same jitted decode, NMS on device vs on host: identical detections
    (including with letterbox coordinate correction, whose per-axis affine
    scaling leaves IoU invariant)."""
    for cfg_name, seed in [("mini-yolo3.cfg", 1), ("mini-yolo2.cfg", 3)]:
        spec, host, dev = _pipe_pair(cfg_name, 2, seed)
        x = np.random.RandomState(42).rand(
            2, spec.net.h, spec.net.w, spec.net.c).astype(np.float32)
        for hd, dd in zip(host(x), dev(x)):
            _assert_same(hd, dd)
    # letterboxed original-image sizes exercise correct_boxes after device NMS
    spec, host, dev = _pipe_pair("mini-yolo3.cfg", 1, 1, letter=True)
    x = np.random.RandomState(7).rand(
        1, spec.net.h, spec.net.w, spec.net.c).astype(np.float32)
    sizes = [(199, 83)]
    _assert_same(host(x, im_sizes=sizes)[0], dev(x, im_sizes=sizes)[0])


def test_pipeline_device_nms_stream():
    spec, host, dev = _pipe_pair("mini-yolo3.cfg", 2, 2)
    rng = np.random.RandomState(5)
    batches = [rng.rand(2, spec.net.h, spec.net.w, spec.net.c
                        ).astype(np.float32) for _ in range(3)]
    for hlist, dlist in zip(host.stream(iter(batches)),
                            dev.stream(iter(batches))):
        for hd, dd in zip(hlist, dlist):
            _assert_same(hd, dd)


def test_pipeline_device_nms_autogrow(capsys):
    """Saturation detection must survive device NMS (pre-NMS count row): a tiny
    K grows and converges to the unsaturated result."""
    cfg = os.path.join(DATA, "mini-yolo3.cfg")
    spec = parse_network_cfg(cfg, batch=1)
    params = fuse_conv_batchnorm(spec, random_params(spec, seed=2))
    x = np.random.RandomState(0).rand(
        1, spec.net.h, spec.net.w, spec.net.c).astype(np.float32)
    big = DetectionPipeline(spec, params, thresh=0.05, nms=0.4, k=4096,
                            device_nms=True)
    small = DetectionPipeline(spec, params, thresh=0.05, nms=0.4, k=16,
                              device_nms=True)
    d_big = big(x)[0]
    d_small = small(x)[0]
    promoted = getattr(small, "_promoted", None)
    assert promoted is not None  # auto-grow actually triggered
    # grown buffer must converge to the unsaturated result
    if promoted.k >= d_big.n:
        assert d_small.n == d_big.n


def test_autogrow_past_4096_to_total_candidates(tmp_path, capsys):
    """The grow ceiling is the net's TOTAL candidate count, not 4096: a head
    with >4096 raw candidates and a saturating workload must converge to the
    full detection set with NO drop warning (the generative fuzzer caught a
    net whose detections_count diverged from the oracle at the old cap —
    the reference keeps every above-threshold box, additionally.c:4700-4712).
    device_nms pipelines keep the 4096 cap (O(K^2) IoU matrix)."""
    cfg = str(tmp_path / "bighead.cfg")
    with open(cfg, "w") as f:
        f.write("[net]\nbatch=1\nwidth=80\nheight=80\nchannels=3\n"
                "[convolutional]\nfilters=24\nsize=1\nstride=1\npad=0\n"
                "activation=linear\n"
                "[yolo]\nmask = 0,1,2\n"
                "anchors = 10,14, 23,27, 37,58\nclasses=3\nnum=3\n")
    spec = parse_network_cfg(cfg, batch=1)
    params = fuse_conv_batchnorm(spec, random_params(spec, seed=3))
    x = np.random.RandomState(1).rand(1, 80, 80, 3).astype(np.float32)
    full = DetectionPipeline(spec, params, thresh=0.01, nms=0, k=80 * 80 * 3)
    assert full._total_candidates == 80 * 80 * 3 > 4096
    d_full = full(x)[0]
    assert d_full.n > 4096  # the workload really needs K past the old cap
    small = DetectionPipeline(spec, params, thresh=0.01, nms=0, k=256)
    d_small = small(x)[0]
    assert d_small.n == d_full.n
    chain_k = small._promoted.k
    while getattr(small._promoted, "_promoted", None) is not None:
        small = small._promoted
        chain_k = small._promoted.k
    assert chain_k == full._total_candidates  # grew to the exact ceiling
    err = capsys.readouterr().err
    assert "note: candidate buffer" in err   # grow notes printed
    assert "may be dropped" not in err       # but nothing was ever dropped
    # device_nms keeps the bounded cap
    capped = DetectionPipeline(spec, params, thresh=0.01, nms=0.4, k=256,
                               device_nms=True)
    assert capped._max_k == 4096


def test_device_nms_stream_saturation_autogrow(capsys):
    """stream() auto-grows like __call__; with device NMS the saturation
    signal is the pre-NMS flag row — a saturated tiny K re-runs the batch at
    Kx4 (recursing until unsaturated) and converges to the big-buffer result."""
    cfg = os.path.join(DATA, "mini-yolo3.cfg")
    spec = parse_network_cfg(cfg, batch=1)
    params = fuse_conv_batchnorm(spec, random_params(spec, seed=2))
    x = np.random.RandomState(0).rand(
        1, spec.net.h, spec.net.w, spec.net.c).astype(np.float32)
    big = DetectionPipeline(spec, params, thresh=0.05, nms=0.4, k=4096,
                            device_nms=True)
    d_big = big(x)[0]
    pipe = DetectionPipeline(spec, params, thresh=0.05, nms=0.4, k=16,
                             device_nms=True)
    outs = list(pipe.stream([x, x]))
    err = capsys.readouterr().err
    assert "saturated" in err
    assert getattr(pipe, "_promoted", None) is not None  # later dispatches grown
    # re-run recursion grows until unsaturated (cap 4096 == big's K), so both
    # stream batches must converge exactly to the big-buffer result
    for batch in outs:
        assert batch[0].n == d_big.n


def test_device_nms_tie_order_matches_host_qsort_carry():
    """Round-5 parity closure: on EXACT-prob ties the device NMS must pick
    the same survivors AND emit rows in the same post-NMS array order as the
    host do_nms_sort (whose qsort permutation carries class to class,
    box.c:310-317). Quantized probs + clustered boxes make thousands of exact
    ties; any independent-per-class sort order fails this."""
    from yolo2_light_tpu.post.device_nms import nms_packed

    rng = np.random.RandomState(123)
    k, classes = 160, 6
    boxes, probs = _random_candidates(rng, k, classes)
    probs = (np.round(probs * 8) / 8).astype(np.float32)   # exact ties galore
    assert len(np.unique(probs[probs > 0])) < 8             # really degenerate

    host = post.Detections(boxes.copy(), np.ones(k, np.float32), probs.copy())
    post.do_nms_sort(host, classes, 0.45)

    packed = np.concatenate(
        [boxes, np.ones((k, 1), np.float32), probs], axis=1)[None]
    out = np.asarray(nms_packed(jnp.asarray(packed), 0.45))[0]

    order = host.nms_order
    np.testing.assert_array_equal(out[:, :4], boxes[order])
    np.testing.assert_array_equal(out[:, 5:], host.prob[order])
    # the suppression really did something and ties exist among survivors
    assert (host.prob[probs > 0] == 0).any()
