"""serve_scan: the in-jit multi-frame serving loop must be bit-identical to
frame-at-a-time dispatch (each scan iteration IS the b=1 program — no
cross-frame batching), across ingest variants and precision modes."""

import os

import numpy as np
import pytest

from yolo2_light_tpu.cfg import parse_network_cfg
from yolo2_light_tpu.pipeline import DetectionPipeline
from yolo2_light_tpu.weights import fuse_conv_batchnorm, random_params

DATA = os.path.join(os.path.dirname(__file__), "data")


def _pipe(cfg_name="mini-yolo3.cfg", seed=1, **kw):
    cfg = os.path.join(DATA, cfg_name)
    spec = parse_network_cfg(cfg, batch=1)
    params = fuse_conv_batchnorm(spec, random_params(spec, seed=seed))
    if kw.pop("quantized", False):
        from yolo2_light_tpu.quant import quantize_params
        params = quantize_params(spec, params)
        return spec, DetectionPipeline(spec, params, "int8", thresh=0.3,
                                       nms=0.2, k=256, **kw)
    return spec, DetectionPipeline(spec, params, thresh=0.3, nms=0.4, k=256,
                                   **kw)


def _assert_identical(a, b):
    np.testing.assert_array_equal(a.bbox, b.bbox)
    np.testing.assert_array_equal(a.prob, b.prob)
    np.testing.assert_array_equal(a.objectness, b.objectness)


@pytest.mark.parametrize("quantized", [False, True],
                         ids=["fp32", "quantized"])
def test_serve_scan_matches_per_frame(quantized):
    spec, pipe = _pipe(seed=3, quantized=quantized)
    rng = np.random.RandomState(0)
    frames = rng.rand(5, spec.net.h, spec.net.w, spec.net.c).astype(np.float32)
    scanned = pipe.serve_scan(frames.copy())
    assert len(scanned) == 5
    for i in range(5):
        one = pipe(frames[i:i + 1])[0]
        _assert_identical(scanned[i], one)


def test_serve_scan_uint8_source_resolution():
    """uint8 ring at SOURCE dims: per-frame device resize + /255 inside the
    scan body, coordinates corrected back to source dims like __call__.

    The scan's claim is bit-identity with the b=1 PER-FRAME program (each
    scan iteration IS that program). The b=N batched program is a different
    XLA compilation — on TPU its resize/conv contractions differ by ULPs
    from b=1 (observed <=2e-6 rel on random-weight nets), so batch-vs-scan
    bit identity is asserted on the CPU backend only."""
    import jax
    spec, pipe = _pipe(seed=4)
    rng = np.random.RandomState(1)
    frames = (rng.rand(3, 96, 80, 3) * 255).astype(np.uint8)
    scanned = pipe.serve_scan(frames.copy())
    for i in range(3):
        _assert_identical(scanned[i], pipe(frames[i:i + 1])[0])
    if jax.default_backend() == "cpu":
        batch = pipe(frames)
        for s, b in zip(scanned, batch):
            _assert_identical(s, b)


def test_serve_scan_autogrow():
    """Saturating candidate buffer: the ring re-runs through the grown
    pipeline and matches the big-K result."""
    spec0 = parse_network_cfg(os.path.join(DATA, "mini-yolo3.cfg"), batch=1)
    params = fuse_conv_batchnorm(spec0, random_params(spec0, seed=2))
    rng = np.random.RandomState(2)
    frames = rng.rand(2, spec0.net.h, spec0.net.w, spec0.net.c
                      ).astype(np.float32)
    small = DetectionPipeline(spec0, params, thresh=0.05, nms=0.4, k=16)
    big = DetectionPipeline(spec0, params, thresh=0.05, nms=0.4, k=1024)
    got = small.serve_scan(frames.copy())
    want = big.serve_scan(frames.copy())
    assert small._promoted is not None  # grew
    for g, w in zip(got, want):
        _assert_identical(g, w)


def test_serve_scan_xnor_auto_matches_per_frame(tmp_path):
    """xnor_impl='auto' inside the serving ring: at b=1 the deep layers take
    the bit-packed Pallas MXU path INSIDE the lax.scan body (the latency
    regime auto exists for), and every frame matches per-frame dispatch."""
    from yolo2_light_tpu.ops.pallas_xnor import auto_prefers_mxu
    from yolo2_light_tpu.xnor import binarize_params
    text = open(os.path.join(DATA, "mini-xnor.cfg")).read().replace(
        "width=64", "width=32").replace("height=64", "height=32")
    cfg = str(tmp_path / "mini-xnor-32.cfg")
    with open(cfg, "w") as f:
        f.write(text)
    spec = parse_network_cfg(cfg, batch=1)
    assert any(getattr(l, "xnor", False)
               and auto_prefers_mxu(l.out_h * l.out_w)
               for l in spec.layers)  # a layer really takes the Pallas path
    params = binarize_params(
        spec, fuse_conv_batchnorm(spec, random_params(spec, seed=6)))
    pipe = DetectionPipeline(spec, params, thresh=0.3, nms=0.4, k=256,
                             xnor_impl="auto")
    rng = np.random.RandomState(5)
    frames = rng.rand(3, 32, 32, 3).astype(np.float32)
    scanned = pipe.serve_scan(frames.copy())
    for i in range(3):
        _assert_identical(scanned[i], pipe(frames[i:i + 1])[0])


def test_serve_scan_rejects_pp_and_mesh():
    spec, _ = _pipe(seed=1)
    params = fuse_conv_batchnorm(spec, random_params(spec, seed=1))
    import jax
    from yolo2_light_tpu.parallel.mesh import make_mesh
    if len(jax.devices()) >= 2:
        mesh = make_mesh(2)
        pipe = DetectionPipeline(spec, params, mesh=mesh)
        with pytest.raises(ValueError, match="serve_scan"):
            pipe.serve_scan(np.zeros((2, spec.net.h, spec.net.w, 3),
                                     np.float32))
    if len(jax.devices()) >= 2:  # pp construction itself needs 2 devices
        pp = DetectionPipeline(spec, params, pp_stages=2)
        with pytest.raises(ValueError, match="serve_scan"):
            pp.serve_scan(np.zeros((2, spec.net.h, spec.net.w, 3),
                                   np.float32))
    if len(jax.devices()) < 2:
        pytest.skip("mesh/pp rejection paths need >=2 devices")
