"""Tensor/data-parallel sharded inference must match unsharded numerically."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolo2_light_tpu.cfg import parse_network_cfg
from yolo2_light_tpu.models.network import Predictor
from yolo2_light_tpu.parallel.mesh import make_mesh, make_sharded_predict
from yolo2_light_tpu.weights import fuse_conv_batchnorm, random_params

DATA = os.path.join(os.path.dirname(__file__), "data")


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_forward_matches_unsharded():
    spec = parse_network_cfg(os.path.join(DATA, "mini-yolo3.cfg"), batch=2)
    params = fuse_conv_batchnorm(spec, random_params(spec, seed=0))
    x = np.random.RandomState(0).rand(2, 64, 64, 3).astype(np.float32)

    ref = Predictor(spec, params)(x)
    mesh = make_mesh(8, data=2, model=4)
    fn, sharded = make_sharded_predict(spec, params, mesh)
    out = fn(sharded, x)
    assert len(out) == len(ref)
    for o, r in zip(out, ref):
        np.testing.assert_allclose(np.asarray(o),
                                   np.asarray(r.data).reshape(o.shape),
                                   rtol=1e-4, atol=1e-5)


def _shrunk_cfg(src, tmp_path, size=128):
    """Shipped cfg at reduced spatial dims (sharding structure identical)."""
    with open(src) as f:
        text = f.read()
    text = text.replace("width=416", f"width={size}").replace(
        "height=416", f"height={size}")
    p = tmp_path / os.path.basename(src)
    p.write_text(text)
    return str(p)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_shipped_tiny_dp_tp_matches_unsharded(tmp_path):
    """A real shipped graph (yolov3-tiny: stride-1 maxpool, route, upsample, two
    yolo heads, head channels NOT divisible by the model axis) sharded dp=2 x tp=4
    must match unsharded numerics — exercises GSPMD layout propagation on the
    shapes that matter."""
    cfg = _shrunk_cfg("/root/reference/bin/yolov3-tiny.cfg", tmp_path)
    spec = parse_network_cfg(cfg, batch=2)
    params = fuse_conv_batchnorm(spec, random_params(spec, seed=2))
    x = np.random.RandomState(1).rand(2, 128, 128, 3).astype(np.float32)

    ref = Predictor(spec, params)(x)
    mesh = make_mesh(8, data=2, model=4)
    fn, sharded = make_sharded_predict(spec, params, mesh)
    out = fn(sharded, x)
    assert len(out) == len(ref) == 2
    for o, r in zip(out, ref):
        np.testing.assert_allclose(np.asarray(o),
                                   np.asarray(r.data).reshape(o.shape),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_pipeline_tensor_parallel_matches(tmp_path):
    """DetectionPipeline with a dp x tp mesh (as -parallel/-tp expose it) must
    produce the same detections as the meshless pipeline."""
    from yolo2_light_tpu.pipeline import DetectionPipeline
    cfg = _shrunk_cfg("/root/reference/bin/yolov3-tiny.cfg", tmp_path)
    spec = parse_network_cfg(cfg, batch=2)
    params = fuse_conv_batchnorm(spec, random_params(spec, seed=4))
    x = (np.random.RandomState(2).rand(2, 128, 128, 3) * 255).astype(np.uint8)

    plain = DetectionPipeline(spec, params, thresh=0.24, nms=0.4, k=512)
    mesh = make_mesh(8, data=2, model=4)
    tp = DetectionPipeline(spec, params, thresh=0.24, nms=0.4, k=512, mesh=mesh)
    d0 = plain(x)
    d1 = tp(x)
    for a, b in zip(d0, d1):
        assert a.n == b.n
        np.testing.assert_allclose(np.sort(a.prob.max(-1)),
                                   np.sort(b.prob.max(-1)), rtol=1e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_int8_pipeline_tp_sp_matches_single(tmp_path):
    """INT8 under the global mesh (dp2 x sp2 x tp2): weights_int8 shards over
    the model axis (HWIO int8, O%2==0), scalar multipliers replicate,
    producer-chaining crosses sharded layers; detections must match the
    meshless int8 pipeline (round-3 review: global mesh was fp32-only)."""
    from yolo2_light_tpu.pipeline import DetectionPipeline
    from yolo2_light_tpu.quant import quantize_params
    cfg = _shrunk_cfg("/root/reference/bin/yolov3-tiny.cfg", tmp_path)
    spec = parse_network_cfg(cfg, batch=2, quantized=True)
    params = quantize_params(
        spec, fuse_conv_batchnorm(spec, random_params(spec, seed=4)))
    x = (np.random.RandomState(2).rand(2, 128, 128, 3) * 255).astype(np.uint8)
    plain = DetectionPipeline(spec, params, "int8", thresh=0.24, nms=0.4,
                              k=512)
    mesh = make_mesh(8, data=2, model=2, space=2)
    meshed = DetectionPipeline(spec, params, "int8", thresh=0.24, nms=0.4,
                               k=512, mesh=mesh)
    d0, d1 = plain(x), meshed(x)
    for a, b in zip(d0, d1):
        assert a.n == b.n
        np.testing.assert_allclose(np.sort(a.prob.max(-1)),
                                   np.sort(b.prob.max(-1)), rtol=1e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_xnor_pipeline_tp_matches_single():
    """XNOR under the global mesh (dp2 x tp4, xnor_impl='int8' +-1 MXU
    engine): binary conv layers shard/replicate under GSPMD and detections
    match the meshless pipeline."""
    from yolo2_light_tpu.pipeline import DetectionPipeline
    from yolo2_light_tpu.xnor import binarize_params
    cfg = os.path.join(DATA, "mini-xnor.cfg")
    spec = parse_network_cfg(cfg, batch=2)
    params = binarize_params(
        spec, fuse_conv_batchnorm(spec, random_params(spec, seed=9)))
    x = (np.random.RandomState(2).rand(2, 64, 64, 3) * 255).astype(np.uint8)
    plain = DetectionPipeline(spec, params, thresh=0.3, nms=0.4, k=2048)
    mesh = make_mesh(8, data=2, model=4)
    meshed = DetectionPipeline(spec, params, thresh=0.3, nms=0.4, k=2048,
                               mesh=mesh)
    d0, d1 = plain(x), meshed(x)
    for a, b in zip(d0, d1):
        assert a.n == b.n
        np.testing.assert_allclose(np.sort(a.prob.max(-1)),
                                   np.sort(b.prob.max(-1)), rtol=1e-4)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
def test_int8_pipeline_pp_tp_matches_single(tmp_path):
    """-quantized -pp 2 -pp_tp 2: int8 stage params under per-stage GSPMD
    meshes (advisor round 3: this CLI-reachable combination was untested)."""
    from yolo2_light_tpu.pipeline import DetectionPipeline
    from yolo2_light_tpu.quant import quantize_params
    cfg = _shrunk_cfg("/root/reference/bin/yolov3-tiny.cfg", tmp_path)
    spec = parse_network_cfg(cfg, batch=2, quantized=True)
    params = quantize_params(
        spec, fuse_conv_batchnorm(spec, random_params(spec, seed=4)))
    x = (np.random.RandomState(2).rand(2, 128, 128, 3) * 255).astype(np.uint8)
    plain = DetectionPipeline(spec, params, "int8", thresh=0.24, nms=0.4,
                              k=512)
    pp = DetectionPipeline(spec, params, "int8", thresh=0.24, nms=0.4, k=512,
                           pp_stages=2, pp_tp=2, pp_microbatch=1)
    d0, d1 = plain(x), pp(x)
    for a, b in zip(d0, d1):
        assert a.n == b.n
        np.testing.assert_allclose(np.sort(a.prob.max(-1)),
                                   np.sort(b.prob.max(-1)), rtol=1e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_xnor_auto_pallas_layer_under_mesh(tmp_path):
    """xnor_impl='auto' under the global mesh with a layer that actually takes
    the Pallas MXU path: mini-xnor shrunk to 32x32 puts its deepest xnor conv
    at 8x8 out (M = 2*64 = 128 <= AUTO_MXU_MAX_PIXELS), so the bit-packed
    Pallas kernel runs INSIDE the dp2 x tp4 GSPMD program; detections must
    match the meshless all-dense pipeline (Pallas custom calls under SPMD
    partitioning are the rough edge this pins)."""
    from yolo2_light_tpu.ops.pallas_xnor import auto_prefers_mxu
    from yolo2_light_tpu.pipeline import DetectionPipeline
    from yolo2_light_tpu.xnor import binarize_params
    text = open(os.path.join(DATA, "mini-xnor.cfg")).read().replace(
        "width=64", "width=32").replace("height=64", "height=32")
    cfg = str(tmp_path / "mini-xnor-32.cfg")
    with open(cfg, "w") as f:
        f.write(text)
    spec = parse_network_cfg(cfg, batch=2)
    picked = [2 * l.out_h * l.out_w for l in spec.layers
              if getattr(l, "xnor", False)
              and auto_prefers_mxu(2 * l.out_h * l.out_w)]
    assert picked, "fixture regressed: no layer takes the Pallas MXU path"
    params = binarize_params(
        spec, fuse_conv_batchnorm(spec, random_params(spec, seed=9)))
    x = (np.random.RandomState(2).rand(2, 32, 32, 3) * 255).astype(np.uint8)
    plain = DetectionPipeline(spec, params, thresh=0.3, nms=0.4, k=2048,
                              xnor_impl="int8")
    mesh = make_mesh(8, data=2, model=4)
    meshed = DetectionPipeline(spec, params, thresh=0.3, nms=0.4, k=2048,
                               mesh=mesh, xnor_impl="auto")
    d0, d1 = plain(x), meshed(x)
    for a, b in zip(d0, d1):
        assert a.n == b.n
        np.testing.assert_allclose(np.sort(a.prob.max(-1)),
                                   np.sort(b.prob.max(-1)), rtol=1e-4)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
def test_xnor_pipeline_pp_tp_matches_single():
    """xnor cfg under -pp 2 -pp_tp 2 (binary params under per-stage GSPMD)."""
    from yolo2_light_tpu.pipeline import DetectionPipeline
    from yolo2_light_tpu.xnor import binarize_params
    cfg = os.path.join(DATA, "mini-xnor.cfg")
    spec = parse_network_cfg(cfg, batch=2)
    params = binarize_params(
        spec, fuse_conv_batchnorm(spec, random_params(spec, seed=9)))
    x = (np.random.RandomState(2).rand(2, 64, 64, 3) * 255).astype(np.uint8)
    plain = DetectionPipeline(spec, params, thresh=0.3, nms=0.4, k=2048)
    pp = DetectionPipeline(spec, params, thresh=0.3, nms=0.4, k=2048,
                           pp_stages=2, pp_tp=2, pp_microbatch=1)
    d0, d1 = plain(x), pp(x)
    for a, b in zip(d0, d1):
        assert a.n == b.n
        np.testing.assert_allclose(np.sort(a.prob.max(-1)),
                                   np.sort(b.prob.max(-1)), rtol=1e-4)


def test_make_mesh_autosplit_favors_data():
    """Auto-split contract: data parallelism gets the larger share, the model
    axis stays modest (<=2) — dp is the throughput-serving default and tp's
    collectives cost ICI bandwidth (parallel/mesh.py:make_mesh)."""
    from yolo2_light_tpu.parallel.mesh import make_mesh
    for n, want in [(8, (4, 1, 2)), (4, (2, 1, 2)), (2, (2, 1, 1)),
                    (1, (1, 1, 1))]:
        if n > len(jax.devices()):
            continue
        mesh = make_mesh(n)
        shape = (mesh.shape["data"], mesh.shape.get("space", 1),
                 mesh.shape["model"])
        assert shape == want, (n, shape)
        assert shape[0] >= shape[2]  # data >= model always


def test_stream_k_autogrow():
    """stream() saturation handling matches __call__: the saturated batch
    re-runs at Kx4 (recursing until unsaturated) and later dispatches use the
    grown pipeline — no silent detection drops (round-3 review item)."""
    from yolo2_light_tpu.pipeline import DetectionPipeline
    spec = parse_network_cfg(os.path.join(DATA, "mini-yolo3.cfg"), batch=1)
    params = fuse_conv_batchnorm(spec, random_params(spec, seed=1))
    x = np.random.RandomState(0).rand(1, 64, 64, 3).astype(np.float32)
    big = DetectionPipeline(spec, params, thresh=0.24, nms=0.4, k=4096)
    d_big = big(x)[0]
    small = DetectionPipeline(spec, params, thresh=0.24, nms=0.4, k=16)
    outs = list(small.stream([x, x, x]))
    assert getattr(small, "_promoted", None) is not None
    for batch in outs:
        assert batch[0].n == d_big.n
        np.testing.assert_allclose(np.sort(batch[0].prob.max(-1)),
                                   np.sort(d_big.prob.max(-1)), rtol=1e-5)


def test_pipeline_k_autogrow():
    from yolo2_light_tpu.pipeline import DetectionPipeline
    spec = parse_network_cfg(os.path.join(DATA, "mini-yolo3.cfg"), batch=1)
    params = fuse_conv_batchnorm(spec, random_params(spec, seed=1))
    x = np.random.RandomState(0).rand(1, 64, 64, 3).astype(np.float32)
    # random weights -> dense detections; k=16 must saturate and auto-grow
    small = DetectionPipeline(spec, params, thresh=0.24, nms=0.4, k=16)
    big = DetectionPipeline(spec, params, thresh=0.24, nms=0.4, k=4096)
    d_small = small(x)[0]
    d_big = big(x)[0]
    # after auto-grow the small pipeline must find at least 4x its original k
    assert d_small.n > 16
    # growth recurses (16 -> 64 -> 256 -> ...) until unsaturated, so the result
    # must converge exactly to the big-buffer answer
    assert d_small.n == d_big.n
    np.testing.assert_allclose(np.sort(d_small.prob.max(-1)),
                               np.sort(d_big.prob.max(-1)), rtol=1e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_pipeline_tensor_parallel_device_nms(tmp_path):
    """device_nms under a dp x tp mesh: the suppressed buffer (+ count row) is
    sharded over data and must match the meshless device-NMS pipeline."""
    from yolo2_light_tpu.pipeline import DetectionPipeline
    cfg = _shrunk_cfg("/root/reference/bin/yolov3-tiny.cfg", tmp_path)
    spec = parse_network_cfg(cfg, batch=2)
    params = fuse_conv_batchnorm(spec, random_params(spec, seed=4))
    x = (np.random.RandomState(2).rand(2, 128, 128, 3) * 255).astype(np.uint8)

    plain = DetectionPipeline(spec, params, thresh=0.24, nms=0.4, k=512,
                              device_nms=True)
    mesh = make_mesh(8, data=2, model=4)
    tp = DetectionPipeline(spec, params, thresh=0.24, nms=0.4, k=512,
                           mesh=mesh, device_nms=True)
    for a, b in zip(plain(x), tp(x)):
        assert a.n == b.n
        np.testing.assert_allclose(np.sort(a.prob.max(-1)),
                                   np.sort(b.prob.max(-1)), rtol=1e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_spatial_parallel_matches_unsharded(tmp_path):
    """Pure spatial partitioning (sp=8): activation rows sharded over the mesh,
    GSPMD halo exchanges at every 3x3 conv / maxpool — values must match the
    unsharded program. This is the axis that divides SINGLE-image work (the
    b=1 latency floor, PERF_NOTES.md), unlike dp/tp."""
    cfg = _shrunk_cfg("/root/reference/bin/yolov3-tiny.cfg", tmp_path)
    spec = parse_network_cfg(cfg, batch=2)
    params = fuse_conv_batchnorm(spec, random_params(spec, seed=2))
    x = np.random.RandomState(1).rand(2, 128, 128, 3).astype(np.float32)

    ref = Predictor(spec, params)(x)
    mesh = make_mesh(8, data=1, space=8, model=1)
    fn, sharded = make_sharded_predict(spec, params, mesh)
    out = fn(sharded, x)
    for o, r in zip(out, ref):
        np.testing.assert_allclose(np.asarray(o),
                                   np.asarray(r.data).reshape(o.shape),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_dp_sp_tp_combined_matches_unsharded(tmp_path):
    """All three axes at once (dp=2 x sp=2 x tp=2) on a real shipped graph.
    Tolerance is slightly looser than the dp x tp tests: sharded reductions
    reorder f32 adds (measured: <=4e-5 absolute on a handful of elements)."""
    cfg = _shrunk_cfg("/root/reference/bin/yolov3-tiny.cfg", tmp_path)
    spec = parse_network_cfg(cfg, batch=2)
    params = fuse_conv_batchnorm(spec, random_params(spec, seed=2))
    x = np.random.RandomState(1).rand(2, 128, 128, 3).astype(np.float32)

    ref = Predictor(spec, params)(x)
    mesh = make_mesh(8, data=2, space=2, model=2)
    fn, sharded = make_sharded_predict(spec, params, mesh)
    out = fn(sharded, x)
    for o, r in zip(out, ref):
        np.testing.assert_allclose(np.asarray(o),
                                   np.asarray(r.data).reshape(o.shape),
                                   rtol=1e-3, atol=1e-4)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
def test_spatial_times_model_kernel_bug_guard():
    """CANARY for the upstream XLA SPMD bug that forces shard_params' 1x1-only
    rule under space>1 (parallel/mesh.py): a spatially-partitioned conv whose
    KERNEL is channel-sharded miscompiles (halo contributions wrong) for any
    kh*kw > 1 on jax 0.9.0, while 1x1 convs and dots partition correctly.

    This test asserts the bug is STILL PRESENT. When a jax upgrade fixes it,
    this fails loudly -> remove the `space_size == 1 or kh*kw == 1` guard in
    shard_params and delete this test."""
    from jax import lax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    def conv(x, w):
        return lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)

    rng = np.random.RandomState(0)
    x = rng.rand(2, 16, 16, 8).astype(np.float32)
    w = rng.rand(3, 3, 8, 16).astype(np.float32)
    ref = np.asarray(conv(jnp.asarray(x), jnp.asarray(w)))

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("space", "model"))
    xd = jax.device_put(x, NamedSharding(mesh, P(None, "space", None, None)))
    wd = jax.device_put(w, NamedSharding(mesh, P(None, None, None, "model")))
    err = np.abs(np.asarray(jax.jit(conv)(xd, wd)) - ref).max()
    assert err > 1e-2, (
        f"upstream XLA fixed spatial x kernel-sharded convs (maxerr={err}): "
        "remove the 1x1-only guard in parallel/mesh.shard_params and this "
        "canary")
