"""int8_impl="fused" (Pallas residual-stage kernel) vs the plain XLA int8
builder — bit-exact, through the full network builder on a darknet53-style
mini net (tests/data/mini-res.cfg).

Both forwards run JITTED: a jitted graph and the eager path differ by 1 ulp
in the leaky /10 (XLA reciprocal-multiply rewrite); the fused kernel matches
the jitted form (see tests/test_pallas_fused.py).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolo2_light_tpu.apps.detect import build_params
from yolo2_light_tpu.cfg import parse_network_cfg
from yolo2_light_tpu.models.network import (_fused_stage_runs, _int8_layer_set,
                                            build_forward, params_to_device)

DATA = os.path.join(os.path.dirname(__file__), "data")
CFG = os.path.join(DATA, "mini-res.cfg")


def _residual_cfg(tmp_path, c_trunk: int, c_mid: int, n_blocks: int) -> str:
    """Synthetic darknet53-style stage: stride-2 stem to ``c_trunk`` channels,
    ``n_blocks`` chained (1x1 c_mid -> 3x3 c_trunk -> shortcut) blocks, head."""
    block = f"""
[convolutional]
batch_normalize=1
filters={c_mid}
size=1
stride=1
pad=1
activation=leaky

[convolutional]
batch_normalize=1
filters={c_trunk}
size=3
stride=1
pad=1
activation=leaky

[shortcut]
from=-3
activation=linear
"""
    cfg = (f"[net]\nbatch=1\nsubdivisions=1\nwidth=32\nheight=32\nchannels=3\n"
           f"\n[convolutional]\nbatch_normalize=1\nfilters={c_trunk}\nsize=3\n"
           f"stride=2\npad=1\nactivation=leaky\n"
           + block * n_blocks +
           "\n[convolutional]\nsize=1\nstride=1\npad=1\nfilters=24\n"
           "activation=linear\n\n[yolo]\nmask = 0,1,2\n"
           "anchors = 10,14,  23,27,  37,58,  81,82,  135,169,  344,319\n"
           "classes=3\nnum=6\n")
    p = tmp_path / f"res{c_trunk}x{n_blocks}.cfg"
    p.write_text(cfg)
    return str(p)


def test_vmem_budget_keeps_small_stage_whole(tmp_path):
    """8 blocks at C=512/16px fit the VMEM budget -> ONE fused run."""
    spec = parse_network_cfg(_residual_cfg(tmp_path, 512, 256, 8))
    runs = _fused_stage_runs(spec, _int8_layer_set(spec, "cpu"))
    assert {s: len(r) for s, r in runs.items()} == {1: 8}


def test_vmem_budget_splits_large_stage(tmp_path):
    """4 blocks at C=1024 exceed the budget (5.2MB int8 weights per block)
    -> split into per-block runs, chained back-to-back over the stage."""
    spec = parse_network_cfg(_residual_cfg(tmp_path, 1024, 512, 4))
    runs = _fused_stage_runs(spec, _int8_layer_set(spec, "cpu"))
    assert {s: len(r) for s, r in runs.items()} == {1: 1, 4: 1, 7: 1, 10: 1}
    # chunks tile the stage contiguously: each run's shortcut feeds the next
    starts = sorted(runs)
    for a, b in zip(starts, starts[1:]):
        assert runs[a][-1][2] + 1 == b


def test_oversize_trunk_stays_on_xla_path(tmp_path):
    """When trunk+t1q alone exceed the VMEM budget (e.g. a 304px C=128
    stage from a 608 net), the run must be left unfused, not squeezed in."""
    cfg = _residual_cfg(tmp_path, 128, 64, 2).replace(".cfg", "-608.cfg")
    src = _residual_cfg(tmp_path, 128, 64, 2)
    text = open(src).read().replace("width=32", "width=608").replace(
        "height=32", "height=608")
    with open(cfg, "w") as f:
        f.write(text)
    spec = parse_network_cfg(cfg)
    assert _fused_stage_runs(spec, _int8_layer_set(spec, "cpu")) == {}


def test_fused_equals_xla_across_split_runs(tmp_path):
    """Builder equality must hold when a stage is VMEM-split into several
    kernels (trunk leaves/re-enters VMEM between chunks)."""
    cfg = _residual_cfg(tmp_path, 1024, 512, 2)
    spec = parse_network_cfg(cfg)
    runs = _fused_stage_runs(spec, _int8_layer_set(spec, "cpu"))
    assert {s: len(r) for s, r in runs.items()} == {1: 1, 4: 1}  # really split
    spec, params, _ = build_params(cfg, None, quantized=True, seed=5)
    dev = params_to_device(params)
    x = np.random.RandomState(2).rand(1, spec.net.h, spec.net.w,
                                      spec.net.c).astype(np.float32)
    plain = build_forward(spec, "int8", int8_policy="cpu")
    fused = build_forward(spec, "int8", int8_policy="cpu", int8_impl="fused")
    jp = jax.jit(lambda p, v: tuple(h.data for h in plain(p, v)[0]))
    jf = jax.jit(lambda p, v: tuple(h.data for h in fused(p, v)[0]))
    np.testing.assert_array_equal(np.asarray(jp(dev, x)[0]),
                                  np.asarray(jf(dev, x)[0]))


def test_route_on_stage_output_splits_runs(tmp_path):
    """A route tapping a MID-stage shortcut output must stop the run
    extension there (that output must materialize to HBM), while both
    halves still fuse — and the full forward stays bit-exact."""
    text = open(CFG).read().replace(
        "[convolutional]\nbatch_normalize=1\nfilters=64\nsize=3\nstride=2",
        "[route]\nlayers=-4, -1\n\n[convolutional]\nbatch_normalize=1\n"
        "filters=64\nsize=3\nstride=2", 1)
    p = tmp_path / "mini-res-routed.cfg"
    p.write_text(text)
    spec = parse_network_cfg(str(p))
    runs = _fused_stage_runs(spec, _int8_layer_set(spec, "cpu"))
    # mini-res stage 1 was blocks (2,3,4)+(5,6,7) in ONE run; the route (new
    # layer 8) reads shortcut 4 (via -4) -> split into two single-block runs
    assert runs[2] == [(2, 3, 4)]
    assert runs[5] == [(5, 6, 7)]
    spec, params, _ = build_params(str(p), None, quantized=True, seed=7)
    dev = params_to_device(params)
    x = np.random.RandomState(4).rand(1, spec.net.h, spec.net.w,
                                      spec.net.c).astype(np.float32)
    plain = build_forward(spec, "int8", int8_policy="cpu")
    fused = build_forward(spec, "int8", int8_policy="cpu", int8_impl="fused")
    jp = jax.jit(lambda q, v: tuple(h.data for h in plain(q, v)[0]))
    jf = jax.jit(lambda q, v: tuple(h.data for h in fused(q, v)[0]))
    np.testing.assert_array_equal(np.asarray(jp(dev, x)[0]),
                                  np.asarray(jf(dev, x)[0]))


def test_xnor_blocks_are_not_fused(tmp_path):
    """The fused kernel implements plain int8 conv math; an xnor=1 conv in
    the block must disqualify it (the XLA path takes the xnor branch)."""
    text = open(CFG).read().replace(
        "[convolutional]\nbatch_normalize=1\nfilters=16\nsize=1\nstride=1\n"
        "pad=1\nactivation=leaky",
        "[convolutional]\nbatch_normalize=1\nxnor=1\nfilters=16\nsize=1\n"
        "stride=1\npad=1\nactivation=leaky", 1)
    p = tmp_path / "mini-res-xnor.cfg"
    p.write_text(text)
    spec = parse_network_cfg(str(p))
    assert any(getattr(l, "xnor", False) for l in spec.layers)
    runs = _fused_stage_runs(spec, _int8_layer_set(spec, "cpu"))
    # the xnor'd first block (2,3,4) must drop out; the untouched ones remain
    assert 2 not in runs
    assert all(not spec.layers[i1].xnor and not spec.layers[i2].xnor
               for r in runs.values() for (i1, i2, _) in r)


def test_gpu_policy_never_uses_fused_kernel():
    """int8_policy='gpu' has different requant semantics than the fused
    kernel implements; the engine gate must keep it on the XLA path
    (outputs identical with and without int8_impl='fused')."""
    spec, params, _ = build_params(CFG, None, quantized=True, seed=6)
    dev = params_to_device(params)
    x = np.random.RandomState(3).rand(1, spec.net.h, spec.net.w,
                                      spec.net.c).astype(np.float32)
    plain = build_forward(spec, "int8", int8_policy="gpu")
    fused = build_forward(spec, "int8", int8_policy="gpu", int8_impl="fused")
    jp = jax.jit(lambda p, v: tuple(h.data for h in plain(p, v)[0]))
    jf = jax.jit(lambda p, v: tuple(h.data for h in fused(p, v)[0]))
    np.testing.assert_array_equal(np.asarray(jp(dev, x)[0]),
                                  np.asarray(jf(dev, x)[0]))


def test_unknown_engine_values_rejected():
    spec = parse_network_cfg(CFG)
    with pytest.raises(ValueError, match="int8_impl"):
        build_forward(spec, "int8", int8_impl="fuse")
    with pytest.raises(ValueError, match="xnor_impl"):
        build_forward(spec, "fp32", xnor_impl="palas")


def test_pattern_matcher_finds_stages():
    spec = parse_network_cfg(CFG)
    runs = _fused_stage_runs(spec, _int8_layer_set(spec, "cpu"))
    # stage 1: blocks (2,3,4)+(5,6,7) chained; stage 2: block (9,10,11)
    assert runs == {2: [(2, 3, 4), (5, 6, 7)], 9: [(9, 10, 11)]}


def test_no_residual_blocks_no_runs():
    spec = parse_network_cfg(os.path.join(DATA, "mini-yolo3.cfg"))
    runs = _fused_stage_runs(spec, _int8_layer_set(spec, "cpu"))
    assert runs == {}   # no (1x1, 3x3, shortcut) triples in this net


def test_route_consumer_blocks_fusion(tmp_path):
    """A route tapping an INTERIOR conv output must break the pattern — the
    fused kernel never materializes interior activations to HBM."""
    blockpat = """
[convolutional]
batch_normalize=1
filters=16
size=1
stride=1
pad=1
activation=leaky

[convolutional]
batch_normalize=1
filters=32
size=3
stride=1
pad=1
activation=leaky

[shortcut]
from=-3
activation=linear
"""
    head = ("[net]\nbatch=1\nsubdivisions=1\nwidth=32\nheight=32\nchannels=3\n"
            "\n[convolutional]\nbatch_normalize=1\nfilters=32\nsize=3\n"
            "stride=2\npad=1\nactivation=leaky\n")
    tail = ("\n[convolutional]\nsize=1\nstride=1\npad=1\nfilters=24\n"
            "activation=linear\n\n[yolo]\nmask = 0,1,2\n"
            "anchors = 10,14,  23,27,  37,58,  81,82,  135,169,  344,319\n"
            "classes=3\nnum=6\n")
    # control: plain residual block -> matched
    ctrl = tmp_path / "ctrl.cfg"
    ctrl.write_text(head + blockpat + tail)
    spec = parse_network_cfg(str(ctrl))
    assert _fused_stage_runs(spec, _int8_layer_set(spec, "cpu")) == {1: [(1, 2, 3)]}
    # same net + a route reading the interior 1x1 output (layer 1) -> rejected
    routed = tmp_path / "routed.cfg"
    routed.write_text(head + blockpat + "\n[route]\nlayers=-3\n" + tail)
    spec = parse_network_cfg(str(routed))
    assert _fused_stage_runs(spec, _int8_layer_set(spec, "cpu")) == {}


@pytest.mark.parametrize("batch", [1, 2])
def test_fused_equals_xla_bit_exact(batch):
    spec, params, _ = build_params(CFG, None, quantized=True, seed=3)
    dev = params_to_device(params)
    rng = np.random.RandomState(0)
    x = rng.rand(batch, spec.net.h, spec.net.w, spec.net.c).astype(np.float32)

    plain = build_forward(spec, "int8", int8_policy="cpu")
    fused = build_forward(spec, "int8", int8_policy="cpu", int8_impl="fused")
    jp = jax.jit(lambda p, v: tuple(h.data for h in plain(p, v)[0]))
    jf = jax.jit(lambda p, v: tuple(h.data for h in fused(p, v)[0]))
    h0, h1 = jp(dev, x), jf(dev, x)
    assert len(h0) == len(h1) == 1
    for a, b in zip(h0, h1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_with_chain_and_turbo_runs():
    """fused composes with int8_chain (chain targets into/out of the stage are
    simply dropped) and with turbo (f32 in/out casts around the kernel)."""
    spec, params, _ = build_params(CFG, None, quantized=True, seed=4)
    dev = params_to_device(params)
    rng = np.random.RandomState(1)
    x = rng.rand(1, spec.net.h, spec.net.w, spec.net.c).astype(np.float32)

    plain = build_forward(spec, "int8", int8_policy="cpu", int8_chain=True)
    fused = build_forward(spec, "int8", int8_policy="cpu", int8_chain=True,
                          int8_impl="fused")
    jp = jax.jit(lambda p, v: tuple(h.data for h in plain(p, v)[0]))
    jf = jax.jit(lambda p, v: tuple(h.data for h in fused(p, v)[0]))
    np.testing.assert_array_equal(np.asarray(jp(dev, x)[0]),
                                  np.asarray(jf(dev, x)[0]))

    turbo = build_forward(spec, "int8", int8_policy="cpu", int8_chain=True,
                          int8_impl="fused", residual_dtype=jnp.bfloat16)
    jt = jax.jit(lambda p, v: tuple(h.data for h in turbo(p, v)[0]))
    out = np.asarray(jt(dev, x)[0])
    assert out.dtype == np.float32
    ref = np.asarray(jp(dev, x)[0])
    # -turbo is approximate: bf16-materialized residuals occasionally flip an
    # int8 quant bin downstream. Nearly all elements must still agree tightly.
    close = np.isclose(out, ref, rtol=0.1, atol=0.1)
    assert close.mean() > 0.99, f"only {close.mean():.4f} of elements close"
    np.testing.assert_allclose(out, ref, rtol=0.5, atol=0.5)
