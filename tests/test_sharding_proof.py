"""Tensor/data-parallel programs must actually SHARD, not silently replicate.

test_parallel.py proves sharded == unsharded *values*; these tests inspect the
SPMD-partitioned executable itself (per-device HLO shapes, per-device parameter
bytes, collective inventory) so a GSPMD regression that replicates everything
fails loudly. See SHARDING.md for the measured inventory.
"""

import os
import re
from collections import Counter

import numpy as np
import pytest

import jax

from yolo2_light_tpu.cfg import ConvSpec, parse_network_cfg
from yolo2_light_tpu.parallel.mesh import make_mesh, make_sharded_predict
from yolo2_light_tpu.weights import fuse_conv_batchnorm, random_params

needs8 = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")

COLLECTIVES = ("all-gather", "all-reduce", "collective-permute", "all-to-all",
               "reduce-scatter")


def _tiny128(tmp_path):
    src = "/root/reference/bin/yolov3-tiny.cfg"
    text = open(src).read().replace("width=416", "width=128").replace(
        "height=416", "height=128")
    p = tmp_path / "tiny128.cfg"
    p.write_text(text)
    return str(p)


def _compiled(cfg, data, model, batch, space=1):
    spec = parse_network_cfg(cfg, batch=batch)
    params = fuse_conv_batchnorm(spec, random_params(spec, seed=2))
    mesh = make_mesh(8, data=data, model=model, space=space)
    fn, sharded = make_sharded_predict(spec, params, mesh)
    x = np.zeros((batch, spec.net.h, spec.net.w, 3), np.float32)
    compiled = fn.lower(sharded, x).compile()
    return spec, sharded, compiled, compiled.as_text()


def _conv_shapes(hlo_text):
    """Output shapes of convolution ops in the (per-device) SPMD module."""
    shapes = []
    for m in re.finditer(r"= f32\[(\d+),(\d+),(\d+),(\d+)\]\S* convolution\(",
                         hlo_text):
        shapes.append(tuple(int(g) for g in m.groups()))
    return shapes


def _dot_shapes(hlo_text):
    """1x1 convs lower as dots over flattened spatial dims: [oh*ow, out_c]."""
    return [tuple(int(g) for g in m.groups()) for m in
            re.finditer(r"= f32\[(\d+),(\d+)\]\S* dot\(", hlo_text)]


@needs8
def test_tp4_conv_compute_is_sharded(tmp_path):
    """Every tp-divisible conv must appear in the per-device HLO with
    out_channels/tp (and batch/dp) — full-size shapes would mean GSPMD
    replicated the compute."""
    spec, _, _, text = _compiled(_tiny128(tmp_path), data=2, model=4, batch=2)
    shapes = set(_conv_shapes(text))
    dots = set(_dot_shapes(text))
    missing = []
    for l in spec.layers:
        if not isinstance(l, ConvSpec) or l.n % 4 != 0:
            continue
        want = (1, l.out_h, l.out_w, l.n // 4)  # batch 2/dp2, channels n/tp4
        want_dot = (l.out_h * l.out_w, l.n // 4)  # 1x1 convs lower as dots
        if want not in shapes and want_dot not in dots:
            missing.append((l.index, want))
    assert not missing, (
        f"convs missing per-device-sharded shapes {missing}; HLO conv shapes "
        f"= {sorted(shapes)}, dot shapes = {sorted(dots)}")
    # and no conv computes at the FULL batch (dp ignored)
    assert not any(s[0] == 2 for s in shapes), shapes


@needs8
def test_tp4_weights_stay_sharded(tmp_path):
    """Per-device parameter bytes must be ~total/tp for the divisible convs
    (weights resident sharded, not replicated)."""
    spec, sharded, compiled, _ = _compiled(_tiny128(tmp_path), data=2, model=4,
                                           batch=2)
    total = sharded_bytes = replicated_bytes = 0
    for l in spec.layers:
        if not isinstance(l, ConvSpec):
            continue
        p = sharded[l.index]
        for k, v in p.items():
            full = int(np.prod(v.shape)) * v.dtype.itemsize
            per_dev = v.addressable_shards[0].data.nbytes
            total += full
            if l.n % 4 == 0 and v.shape[-1] % 4 == 0:
                assert per_dev * 4 == full, (l.index, k, per_dev, full)
                sharded_bytes += full
            else:
                replicated_bytes += full
    # yolov3-tiny at tp=4: everything but the two 255-filter head convs shards
    frac = sharded_bytes / total
    assert frac > 0.95, f"only {frac:.1%} of parameter bytes sharded"


@needs8
def test_tp4_collective_inventory(tmp_path):
    """The dpxtp program needs collectives (activation gathers / head
    reassembly) — zero would mean no sharding crosses device boundaries — but
    the count must stay bounded (~O(#convs)), not explode."""
    spec, _, _, text = _compiled(_tiny128(tmp_path), data=2, model=4, batch=2)
    counts = Counter({op: text.count(op) for op in COLLECTIVES})
    n_convs = sum(isinstance(l, ConvSpec) for l in spec.layers)
    total = sum(counts.values())
    assert total > 0, "no collectives: nothing is sharded"
    # bound: a few per conv (gather + layout all-to-alls), not quadratic
    assert total <= 6 * n_convs, (counts, n_convs)


@needs8
def test_dp8_pure_data_parallel_no_collectives(tmp_path):
    """dp=8/tp=1 is embarrassingly parallel: per-device batch must be B/8 and
    the program must contain NO collectives at all."""
    spec, _, _, text = _compiled(_tiny128(tmp_path), data=8, model=1, batch=8)
    for op in COLLECTIVES:
        assert text.count(op) == 0, f"unexpected {op} in dp-only program"
    shapes = _conv_shapes(text)
    assert shapes and all(s[0] == 1 for s in shapes), shapes


@needs8
def test_sp4_conv_rows_are_sharded(tmp_path):
    """dp=2 x sp=4: per-device conv outputs must carry H/4 rows (spatial
    partitioning really divides the per-image work) and the program must
    contain halo-exchange collective-permutes for the 3x3 windows."""
    spec, _, _, text = _compiled(_tiny128(tmp_path), data=2, model=1, batch=2,
                                 space=4)
    shapes = _conv_shapes(text)
    assert shapes, "no convolutions found in HLO"
    # the big early convs must compute on row shards: H (shapes are NHWC,
    # s[1]) must never appear at the full 128 and must appear at 128/4
    early = [s for s in shapes if s[1] == 128]
    assert not early, f"full-height 128-row convs present: replicated {early}"
    assert any(s[1] in (32, 33, 34) for s in shapes), (
        f"no ~128/4-row conv shards in HLO: {sorted(set(shapes))}")
    assert text.count("collective-permute") > 0, "no halo exchanges inserted"


@needs8
def test_sp_weights_replicated_3x3_sharded_1x1(tmp_path):
    """Under space>1 the 3x3 kernels must stay replicated (the partitioner
    bug guard) while 1x1 kernels still shard over model."""
    import jax as _jax
    from yolo2_light_tpu.parallel.mesh import make_mesh as _mm, shard_params
    spec = parse_network_cfg(_tiny128(tmp_path), batch=2)
    params = fuse_conv_batchnorm(spec, random_params(spec, seed=2))
    mesh = _mm(8, data=1, space=2, model=4)
    sharded = shard_params(spec, params, mesh)
    checked_1x1 = checked_3x3 = 0
    for l in spec.layers:
        if not isinstance(l, ConvSpec):
            continue
        p = sharded[l.index]
        for k, v in p.items():
            if getattr(v, "ndim", 0) != 4:
                continue
            per_dev = v.addressable_shards[0].data.nbytes
            full = int(np.prod(v.shape)) * v.dtype.itemsize
            if v.shape[0] * v.shape[1] == 1 and v.shape[-1] % 4 == 0:
                assert per_dev * 4 == full, (l.index, k, "1x1 not sharded")
                checked_1x1 += 1
            elif v.shape[0] * v.shape[1] > 1:
                assert per_dev == full, (l.index, k, "3x3 sharded under sp!")
                checked_3x3 += 1
    assert checked_3x3 > 0, "no 3x3 kernels checked"


@needs8
def test_int8_tp4_conv_compute_is_sharded(tmp_path):
    """INT8 convs must shard exactly like fp32 ones (round-3 review: the
    global mesh was fp32-only in practice): the per-device SPMD module holds
    s32-accumulating convolutions at out_c/tp channels, and the resident
    weights_int8 arrays shard O/tp — not silently replicate."""
    from yolo2_light_tpu.quant import quantize_params
    cfg = _tiny128(tmp_path)
    spec = parse_network_cfg(cfg, batch=2, quantized=True)
    params = quantize_params(
        spec, fuse_conv_batchnorm(spec, random_params(spec, seed=2)))
    mesh = make_mesh(8, data=2, model=4)
    fn, sharded = make_sharded_predict(spec, params, mesh, mode="int8")
    x = np.zeros((2, spec.net.h, spec.net.w, 3), np.float32)
    text = fn.lower(sharded, x).compile().as_text()

    # int8 conv outputs accumulate in s32; collect their per-device shapes
    s32_convs = set()
    for m in re.finditer(r"= s32\[(\d+),(\d+),(\d+),(\d+)\]\S* convolution\(",
                         text):
        s32_convs.add(tuple(int(g) for g in m.groups()))
    s32_dots = set(tuple(int(g) for g in m.groups()) for m in
                   re.finditer(r"= s32\[(\d+),(\d+)\]\S* dot\(", text))
    missing = []
    for l in spec.layers:
        if not isinstance(l, ConvSpec) or l.n % 4 != 0:
            continue
        if not l.quantized:
            continue  # fp32-dispatched (layer 0 / LINEAR / head convs)
        p = sharded[l.index]
        if "weights_int8" not in p:
            continue
        want = (1, l.out_h, l.out_w, l.n // 4)
        want_dot = (l.out_h * l.out_w, l.n // 4)
        if want not in s32_convs and want_dot not in s32_dots:
            missing.append((l.index, want))
        # resident int8 bytes shard O/tp
        v = p["weights_int8"]
        assert v.dtype == np.int8
        per_dev = v.addressable_shards[0].data.nbytes
        assert per_dev * 4 == v.nbytes, (l.index, per_dev, v.nbytes)
    assert not missing, (
        f"int8 convs missing sharded s32 shapes {missing}; "
        f"s32 convs={sorted(s32_convs)}, s32 dots={sorted(s32_dots)}")
    # no int8 conv computes at the full batch (dp ignored)
    assert not any(s[0] == 2 for s in s32_convs), s32_convs


@needs8
def test_pp_tp_stage_program_is_sharded(tmp_path):
    """pp x tp composition: the compiled STAGE program must itself be SPMD-
    sharded — per-device conv outputs carry out_c/tp channels and per-device
    parameter bytes halve — with a bounded collective inventory (channel
    re-layout only; no reduce-scatter, since output-channel sharding never
    splits a contraction)."""
    from yolo2_light_tpu.parallel.pp import PipelinedPredictor
    spec = parse_network_cfg(_tiny128(tmp_path), batch=1)
    params = fuse_conv_batchnorm(spec, random_params(spec, seed=2))
    pp = PipelinedPredictor(spec, params, "fp32", n_stages=2, microbatch=1,
                            tp=2)
    x = np.zeros((1, spec.net.h, spec.net.w, 3), np.float32)
    xin = jax.device_put(x, pp.placements[0])
    compiled = pp.stage_fns[0].lower(
        pp.stage_params[0], xin, {}).compile()
    text = compiled.as_text()

    a, b = pp.ranges[0]
    want = Counter()
    for l in spec.layers[a:b]:
        if isinstance(l, ConvSpec) and l.n % 2 == 0:
            want[l.n // 2] += 1
    got = Counter(s[-1] for s in _conv_shapes(text))
    got += Counter(s[-1] for s in _dot_shapes(text))
    for ch, cnt in want.items():
        assert got[ch] >= cnt, (
            f"stage program lacks {cnt} conv/dot outputs with {ch} "
            f"(=n/2) channels: {dict(got)}")

    # per-device parameter bytes: >90% of the stage's kernel bytes sharded
    total = per_dev = 0
    for i in range(a, b):
        p = pp.stage_params[0][i]
        if p is None:
            continue
        for v in p.values():
            if getattr(v, "ndim", 0) != 4:
                continue
            total += int(np.prod(v.shape)) * v.dtype.itemsize
            per_dev += v.addressable_shards[0].data.nbytes
    assert total and per_dev < 0.55 * total, (per_dev, total)

    counts = Counter()
    for c in COLLECTIVES:
        counts[c] = len(re.findall(rf"{c}\(|{c}-start\(", text))
    assert counts["reduce-scatter"] == 0, counts
    assert sum(counts.values()) <= 3 * (b - a), counts
