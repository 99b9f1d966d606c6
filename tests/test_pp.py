"""Pipeline parallelism (parallel/pp.py): stage splitting, carried-tensor
liveness, and bit-exactness vs the single-device program at equal microbatch
size — on the 8-virtual-device CPU mesh."""

import os

import numpy as np
import pytest

DATA = os.path.join(os.path.dirname(__file__), "data")


def _setup(cfg, seed=3, quantized=False):
    from yolo2_light_tpu.apps.detect import build_params
    spec, params, mode = build_params(cfg, None, seed=seed, echo=False,
                                      quantized=quantized)
    return spec, params, mode


def _need_devices(n):
    import jax
    if len(jax.devices()) < n:
        pytest.skip(f"needs {n} devices")


def test_split_covers_all_layers_contiguously():
    from yolo2_light_tpu.parallel.pp import split_stages
    spec, _, _ = _setup(os.path.join(DATA, "mini-yolo3.cfg"))
    for n in (2, 3, 4):
        ranges = split_stages(spec, n)
        assert ranges[0][0] == 0 and ranges[-1][1] == spec.n
        for (a0, b0), (a1, _b1) in zip(ranges, ranges[1:]):
            assert b0 == a1 and a0 < b0
        assert len(ranges) == n


def test_carried_set_is_exactly_cross_boundary_liveness():
    """yolov3's long routes/shortcuts: the carried set at each boundary is
    small (a handful of feature maps) and contains exactly the indices some
    later route/shortcut/successor reads."""
    import tempfile
    from yolo2_light_tpu.parallel.pp import carried_for_boundary, split_stages
    with open("/root/reference/bin/yolov3.cfg") as f:
        text = f.read().replace("width=416", "width=128").replace(
            "height=416", "height=128")
    with tempfile.NamedTemporaryFile("w", suffix=".cfg", delete=False) as tf:
        tf.write(text)
    spec, _, _ = _setup(tf.name, seed=0)
    for _a, stop in split_stages(spec, 4)[:-1]:
        carried = carried_for_boundary(spec, stop)
        assert 1 <= len(carried) <= 4     # darknet53's residual liveness is thin
        # every carried index must really be read at/after the boundary
        from yolo2_light_tpu.models.network import _consumers
        cons = _consumers(spec)
        for j in carried:
            assert any(c >= stop for c in cons[j])


def test_replicated_pipeline_matches_single():
    """dp x pp: 2 data-parallel replicas of a 2-stage pipeline (4 devices)
    must be BIT-identical to one PipelinedPredictor at the same microbatch —
    the replica split adds no numerics (VERDICT r3 item 4: dp x pp is the
    realistic serving shape)."""
    _need_devices(4)
    from yolo2_light_tpu.parallel.pp import (PipelinedPredictor,
                                             ReplicatedPipeline)
    cfg = os.path.join(DATA, "mini-yolo3.cfg")
    spec, params, _ = _setup(cfg)
    x = np.random.RandomState(0).rand(
        4, spec.net.h, spec.net.w, spec.net.c).astype(np.float32)
    single = PipelinedPredictor(spec, params, "fp32", n_stages=2,
                                microbatch=1)
    rep = ReplicatedPipeline(spec, params, "fp32", replicas=2, n_stages=2,
                             microbatch=1)
    h0, _ = single(x)
    h1, _ = rep(x)
    assert len(h0) == len(h1)
    for a, b in zip(h0, h1):
        assert (a.index, a.kind) == (b.index, b.kind)
        np.testing.assert_array_equal(np.asarray(a.data), np.asarray(b.data))
    # replica params really live on disjoint device sets
    import jax
    devs0 = {d for p in rep.replicas[0].stage_params for v in p
             if v is not None for d in list(v.values())[0].devices()}
    devs1 = {d for p in rep.replicas[1].stage_params for v in p
             if v is not None for d in list(v.values())[0].devices()}
    assert devs0 and devs1 and not (devs0 & devs1)


def test_replicated_pipeline_three_axis_dp_pp_tp():
    """dp2 x pp2 x tp2 (8 devices): three parallelism axes composed — each
    replica is a 2-stage pipeline whose stages are 2-device GSPMD meshes."""
    _need_devices(8)
    from yolo2_light_tpu.parallel.pp import (PipelinedPredictor,
                                             ReplicatedPipeline)
    cfg = os.path.join(DATA, "mini-yolo3.cfg")
    spec, params, _ = _setup(cfg)
    x = np.random.RandomState(1).rand(
        4, spec.net.h, spec.net.w, spec.net.c).astype(np.float32)
    # reference: pp x tp at the same microbatch (tp adds the known sub-ULP
    # SPMD retiling class, so compare against the SAME tp width)
    single = PipelinedPredictor(spec, params, "fp32", n_stages=2,
                                microbatch=1, tp=2)
    rep = ReplicatedPipeline(spec, params, "fp32", replicas=2, n_stages=2,
                             microbatch=1, tp=2)
    h0, _ = single(x)
    h1, _ = rep(x)
    for a, b in zip(h0, h1):
        np.testing.assert_array_equal(np.asarray(a.data), np.asarray(b.data))


@pytest.mark.parametrize("stages,mb", [(2, 2), (4, 1), (3, 2)])
def test_pp_bit_exact_vs_single_device(stages, mb):
    _need_devices(stages)
    from yolo2_light_tpu.models.network import build_forward, params_to_device
    from yolo2_light_tpu.parallel.pp import PipelinedPredictor
    cfg = os.path.join(DATA, "mini-yolo3.cfg")
    spec, params, _ = _setup(cfg)
    rng = np.random.RandomState(0)
    x = rng.rand(4, spec.net.h, spec.net.w, spec.net.c).astype(np.float32)
    fwd = build_forward(spec, "fp32")
    dev = params_to_device(params)
    # reference = single device at the SAME microbatch size (XLA convs may
    # reassociate across batch sizes; that noise is batching, not PP)
    refs = [fwd(dev, x[m * mb:(m + 1) * mb])[0] for m in range(4 // mb)]
    pp = PipelinedPredictor(spec, params, "fp32", n_stages=stages,
                            microbatch=mb)
    heads, _aux = pp(x)
    for hi, h in enumerate(heads):
        ref = np.concatenate([np.asarray(r[hi].data) for r in refs])
        np.testing.assert_array_equal(ref, np.asarray(h.data))


def test_pp_int8_bit_exact():
    _need_devices(2)
    from yolo2_light_tpu.models.network import build_forward, params_to_device
    from yolo2_light_tpu.parallel.pp import PipelinedPredictor
    cfg = os.path.join(DATA, "mini-yolo3.cfg")
    spec, params, mode = _setup(cfg, quantized=True)
    rng = np.random.RandomState(1)
    x = rng.rand(2, spec.net.h, spec.net.w, spec.net.c).astype(np.float32)
    fwd = build_forward(spec, "int8", int8_policy="cpu")
    ref, _ = fwd(params_to_device(params), x)
    pp = PipelinedPredictor(spec, params, "int8", n_stages=2, microbatch=2)
    heads, _aux = pp(x)
    for r, h in zip(ref, heads):
        # int8's float requant epilogues may FMA-contract differently when
        # the stage boundary changes XLA fusion clusters: <=1 ULP on <1% of
        # entries (pp.py caveat b). Integer conv accumulation is exact.
        np.testing.assert_allclose(np.asarray(h.data), np.asarray(r.data),
                                   rtol=0, atol=1.3e-7)


def test_pp_params_live_on_their_stage_device():
    """Each stage's parameters are committed to that stage's device — the
    memory-scaling property PP exists for."""
    _need_devices(4)
    import jax
    from yolo2_light_tpu.parallel.pp import PipelinedPredictor
    cfg = os.path.join(DATA, "mini-yolo3.cfg")
    spec, params, _ = _setup(cfg)
    pp = PipelinedPredictor(spec, params, "fp32", n_stages=4, microbatch=1)
    for s, (a, b) in enumerate(pp.ranges):
        for i in range(a, b):
            entry = pp.stage_params[s][i]
            if entry is None:
                continue
            for v in entry.values():
                if isinstance(v, jax.Array):
                    assert set(v.devices()) == {pp.devices[s]}, (s, i)


def test_pp_detection_pipeline_matches():
    """DetectionPipeline(pp_stages=N) produces the same detections as the
    single-device pipeline run at the same microbatch size."""
    _need_devices(4)
    from yolo2_light_tpu.pipeline import DetectionPipeline
    cfg = os.path.join(DATA, "mini-yolo3.cfg")
    spec, params, mode = _setup(cfg)
    rng = np.random.RandomState(1)
    x = (rng.rand(4, spec.net.h, spec.net.w, spec.net.c) * 255).astype(
        np.uint8)
    base = DetectionPipeline(spec, params, mode, thresh=0.4, nms=0.4, k=256)
    pp = DetectionPipeline(spec, params, mode, thresh=0.4, nms=0.4, k=256,
                           pp_stages=4, pp_microbatch=2)
    # single-device reference at the SAME microbatch size (batch-size conv
    # reassociation is float noise unrelated to PP)
    d0 = base(x[:2]) + base(x[2:])
    d1 = pp(x)
    for a, b in zip(d0, d1):
        assert a.n == b.n
        np.testing.assert_allclose(b.bbox, a.bbox, rtol=0, atol=1e-6)
        np.testing.assert_allclose(b.prob, a.prob, rtol=0, atol=1e-6)


def test_pp_device_nms_same_survivors():
    """pp + -device_nms: identical SURVIVING detections to pp + host NMS
    (device NMS drops suppressed rows; host NMS keeps them with zeroed
    probs, so row counts differ by construction, like the non-PP paths)."""
    _need_devices(2)
    from yolo2_light_tpu.pipeline import DetectionPipeline
    cfg = os.path.join(DATA, "mini-yolo3.cfg")
    spec, params, mode = _setup(cfg)
    rng = np.random.RandomState(1)
    x = (rng.rand(2, spec.net.h, spec.net.w, spec.net.c) * 255).astype(
        np.uint8)
    kw = dict(thresh=0.4, nms=0.4, k=256, pp_stages=2, pp_microbatch=2)
    host = DetectionPipeline(spec, params, mode, **kw)
    dev = DetectionPipeline(spec, params, mode, device_nms=True, **kw)
    for a, b in zip(host(x), dev(x)):
        pa = np.sort(a.prob[a.prob > 0].reshape(-1))
        pb = np.sort(b.prob[b.prob > 0].reshape(-1))
        np.testing.assert_allclose(pb, pa, rtol=0, atol=1e-6)


def test_map_pipeline_parallel_matches_single(tmp_path):
    """detector map -pp S: same metrics as the single-device eval (the
    accounting consumes per-image detections; microbatch conv reassociation
    can move sub-print-precision float noise only)."""
    _need_devices(2)
    from PIL import Image
    from yolo2_light_tpu.cfg import parse_network_cfg
    from yolo2_light_tpu.weights import random_params, save_weights
    from yolo2_light_tpu.apps.map import validate_detector_map

    rng = np.random.RandomState(0)
    (tmp_path / "images").mkdir()
    (tmp_path / "labels").mkdir()
    paths = []
    for i in range(4):
        p = tmp_path / "images" / f"im{i}.png"
        Image.fromarray((rng.rand(96, 128, 3) * 255).astype(np.uint8)).save(p)
        paths.append(str(p))
        with open(tmp_path / "labels" / f"im{i}.txt", "w") as f:
            f.write("0 0.5 0.5 0.3 0.3\n")
    (tmp_path / "valid.txt").write_text("\n".join(paths) + "\n")
    (tmp_path / "n.names").write_text("aaa\nbbb\nccc\n")
    data = tmp_path / "d.data"
    data.write_text(f"classes=3\nvalid={tmp_path}/valid.txt\n"
                    f"names={tmp_path}/n.names\n")
    cfg = os.path.join(DATA, "mini-yolo3.cfg")
    spec = parse_network_cfg(cfg, batch=1)
    weights = str(tmp_path / "w.weights")
    save_weights(spec, random_params(spec, seed=11), weights)

    single = validate_detector_map(str(data), cfg, weights, thresh=0.24,
                                   batch=2, k=4096)
    pp = validate_detector_map(str(data), cfg, weights, thresh=0.24,
                               batch=4, k=4096, pipeline_parallel=2)
    assert single["unique_truth_count"] == pp["unique_truth_count"]
    assert abs(single["detections_count"] - pp["detections_count"]) <= 3
    assert abs(single["mAP"] - pp["mAP"]) < 0.02


def test_pp_composes_with_fused_engine():
    """int8_impl='fused' under pipeline stages: residual-stage runs that
    straddle a stage boundary fall back to the XLA path (build_forward
    filters them by layer_range); within-stage runs still fuse. Output
    matches the single-device fused program."""
    _need_devices(2)
    from yolo2_light_tpu.models.network import build_forward, params_to_device
    from yolo2_light_tpu.parallel.pp import PipelinedPredictor
    cfg = os.path.join(DATA, "mini-res.cfg")
    spec, params, _ = _setup(cfg, seed=5, quantized=True)
    rng = np.random.RandomState(0)
    x = rng.rand(2, spec.net.h, spec.net.w, spec.net.c).astype(np.float32)
    ref, _ = build_forward(spec, "int8", int8_policy="cpu",
                           int8_impl="fused")(params_to_device(params), x)
    pp = PipelinedPredictor(spec, params, "int8", n_stages=2, microbatch=2,
                            int8_impl="fused")
    heads, _aux = pp(x)
    for r, h in zip(ref, heads):
        np.testing.assert_allclose(np.asarray(h.data), np.asarray(r.data),
                                   rtol=0, atol=1.3e-7)


def test_pp_composes_with_turbo_device_nms_device_resize():
    """Kitchen-sink composition: source-resolution uint8 frames + int8 turbo
    + on-device NMS + pipeline stages produce the same surviving detections
    as the plain turbo pipeline (auto-grow under pp also verified: a
    saturated candidate buffer re-runs through _grown with pp args)."""
    _need_devices(2)
    from yolo2_light_tpu.pipeline import DetectionPipeline
    cfg = os.path.join(DATA, "mini-yolo3.cfg")
    spec, params, mode = _setup(cfg, quantized=True)
    rng = np.random.RandomState(1)
    src = (rng.rand(2, 96, 128, 3) * 255).astype(np.uint8)
    kw = dict(thresh=0.25, nms=0.4, k=4096, int8_policy="cpu", turbo=True)
    kit = DetectionPipeline(spec, params, mode, device_nms=True, pp_stages=2,
                            pp_microbatch=2, **kw)
    plain = DetectionPipeline(spec, params, mode, **kw)
    for a, b in zip(plain(src), kit(src)):
        pa = np.sort(a.prob[a.prob > 0].reshape(-1))
        pb = np.sort(b.prob[b.prob > 0].reshape(-1))
        assert pa.size > 100    # dense random net: a real comparison
        np.testing.assert_allclose(pb, pa, rtol=0, atol=2e-6)


def test_pp_times_tp_sharded_stages():
    """pp x tp composition: 2 stages x tp=2 sub-meshes (4 devices). Every
    stage's divisible conv kernels must REALLY shard over its model axis
    (per-device addressable shard = 1/tp of the output channels), and the
    composed output must match the single-device program (same tolerance as
    the global tp mesh test — the SPMD program may tile convs differently)."""
    _need_devices(4)
    from yolo2_light_tpu.cfg import ConvSpec
    from yolo2_light_tpu.models.network import build_forward, params_to_device
    from yolo2_light_tpu.parallel.pp import PipelinedPredictor
    cfg = os.path.join(DATA, "mini-yolo3.cfg")
    spec, params, _ = _setup(cfg)
    rng = np.random.RandomState(0)
    mb = 2
    x = rng.rand(4, spec.net.h, spec.net.w, spec.net.c).astype(np.float32)
    fwd = build_forward(spec, "fp32")
    dev = params_to_device(params)
    refs = [fwd(dev, x[m * mb:(m + 1) * mb])[0] for m in range(4 // mb)]

    pp = PipelinedPredictor(spec, params, "fp32", n_stages=2, microbatch=mb,
                            tp=2)
    # proof of sharding, not just equality: each stage's divisible kernels
    # hold half the output channels per device
    sharded_convs = 0
    for s, (a, b) in enumerate(pp.ranges):
        for i in range(a, b):
            l, p = spec.layers[i], pp.stage_params[s][i]
            if not isinstance(l, ConvSpec) or p is None:
                continue
            w = p["weights"]
            if w.shape[-1] % 2 == 0:
                shard = w.addressable_shards[0].data
                assert shard.shape[-1] == w.shape[-1] // 2, (i, w.shape)
                sharded_convs += 1
    assert sharded_convs >= 4

    heads, _aux = pp(x)
    for hi, h in enumerate(heads):
        ref = np.concatenate([np.asarray(r[hi].data) for r in refs])
        np.testing.assert_allclose(np.asarray(h.data), ref,
                                   rtol=1e-4, atol=1e-5)
