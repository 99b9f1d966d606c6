"""Pallas popcount XNOR conv must equal the +-1 int8 MXU formulation bit-for-bit
(both reproduce the reference bit path; see test_layers.test_xnor_conv_*)."""

import numpy as np
import pytest

import jax.numpy as jnp

from yolo2_light_tpu.models import layers as L
from yolo2_light_tpu.ops.pallas_xnor import conv2d_xnor_pallas, pack_weights


@pytest.mark.parametrize("c,m,hw", [(16, 8, 12), (32, 32, 9), (48, 24, 7)])
def test_pallas_xnor_matches_int8_path(c, m, hw):
    rng = np.random.RandomState(c + m)
    x = rng.randn(2, hw, hw, c).astype(np.float32)
    w = (rng.randn(3, 3, c, m) * 0.1).astype(np.float32)
    bias = rng.randn(m).astype(np.float32)
    mean = np.mean(np.abs(w), axis=(0, 1, 2)).astype(np.float32)
    sw = np.where(w > 0, 1, -1).astype(np.int8)

    ref = np.asarray(L.conv2d_xnor(jnp.asarray(x), jnp.asarray(sw),
                                   jnp.asarray(mean), jnp.asarray(bias),
                                   1, 1, "leaky"))

    packed, mean2, k_real = pack_weights(w)
    np.testing.assert_allclose(mean2, mean)
    out = np.asarray(conv2d_xnor_pallas(
        jnp.asarray(x), jnp.asarray(packed), jnp.asarray(mean),
        jnp.asarray(bias), size=3, stride=1, pad=1, c_real=c, k_real=k_real,
        interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("c,m,hw", [(16, 8, 12), (32, 32, 9), (48, 24, 7)])
def test_pallas_xnor_mxu_engine_matches(c, m, hw):
    """The in-kernel-unpack MXU engine must equal the popcount engine (and the
    +-1 int8 reference path) bit-for-bit on the same bit-packed operands."""
    rng = np.random.RandomState(c * m)
    x = rng.randn(2, hw, hw, c).astype(np.float32)
    w = (rng.randn(3, 3, c, m) * 0.1).astype(np.float32)
    bias = rng.randn(m).astype(np.float32)
    mean = np.mean(np.abs(w), axis=(0, 1, 2)).astype(np.float32)
    sw = np.where(w > 0, 1, -1).astype(np.int8)

    ref = np.asarray(L.conv2d_xnor(jnp.asarray(x), jnp.asarray(sw),
                                   jnp.asarray(mean), jnp.asarray(bias),
                                   1, 1, "leaky"))
    packed, _, k_real = pack_weights(w)
    out = np.asarray(conv2d_xnor_pallas(
        jnp.asarray(x), jnp.asarray(packed), jnp.asarray(mean),
        jnp.asarray(bias), size=3, stride=1, pad=1, c_real=c, k_real=k_real,
        interpret=True, engine="mxu"))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_full_net_engines_match():
    """All three XNOR engines through the full network builder (mini-xnor.cfg:
    dense first conv -> maxpool -> xnor convs -> head) must agree. On the CPU
    backend the kernels run in interpret mode inside the same-structure XLA
    graphs, so outputs match exactly."""
    import os

    from yolo2_light_tpu.cfg import parse_network_cfg
    from yolo2_light_tpu.models.network import Predictor
    from yolo2_light_tpu.weights import fuse_conv_batchnorm, random_params
    from yolo2_light_tpu.xnor import binarize_params

    cfg = os.path.join(os.path.dirname(__file__), "data", "mini-xnor.cfg")
    spec = parse_network_cfg(cfg, batch=1)
    params = binarize_params(
        spec, fuse_conv_batchnorm(spec, random_params(spec, seed=6)))
    x = np.random.RandomState(3).rand(
        1, spec.net.h, spec.net.w, spec.net.c).astype(np.float32)
    outs = {}
    for eng in ("int8", "pallas", "pallas_mxu", "auto"):
        heads = Predictor(spec, params, xnor_impl=eng)(x)
        outs[eng] = [np.asarray(h.data) for h in heads]
    for eng in ("pallas", "pallas_mxu", "auto"):
        for a, b in zip(outs["int8"], outs[eng]):
            np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-5,
                                       err_msg=eng)


def test_auto_engine_crossover():
    """xnor_impl="auto" picks the measured-fastest engine on the GEMM M
    dimension (TOTAL output pixels batch*oh*ow): bit-packed MXU at small M
    (the b=1 latency regime on deep-net layers), dense +-1 int8 elsewhere —
    including the SAME 13x13 layer once batch makes M large (on-chip sweep +
    net-level check in PERF_NOTES 'Round 4: XNOR')."""
    from yolo2_light_tpu.ops.pallas_xnor import auto_prefers_mxu

    assert auto_prefers_mxu(1 * 13 * 13)
    assert auto_prefers_mxu(1 * 19 * 19)
    assert auto_prefers_mxu(2 * 13 * 13)
    assert not auto_prefers_mxu(1 * 26 * 26)
    assert not auto_prefers_mxu(1 * 104 * 104)
    assert not auto_prefers_mxu(128 * 13 * 13)  # batch flips the choice
