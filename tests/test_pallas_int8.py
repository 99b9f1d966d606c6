"""Fused int8 conv Pallas kernels vs the XLA conv2d_int8 path (same int8 input)."""

import numpy as np
import pytest

import jax.numpy as jnp

from yolo2_light_tpu.models import layers as L
from yolo2_light_tpu.ops.pallas_int8 import (conv3x3_int8_fused,
                                             conv3x3_int8_tiled)


@pytest.mark.parametrize("c,m,hw", [(128, 128, 13), (256, 128, 8)])
def test_fused_int8_conv_matches_xla(c, m, hw):
    rng = np.random.RandomState(c)
    xi = rng.randint(-127, 128, (2, hw, hw, c)).astype(np.int8)
    w8 = rng.randint(-127, 128, (3, 3, c, m)).astype(np.int8)
    bias = rng.randn(m).astype(np.float32)
    in_mult, w_mult = 11.0, 40.0
    ref = np.asarray(L.conv2d_int8(
        jnp.zeros(xi.shape, jnp.float32), jnp.asarray(w8), jnp.asarray(bias),
        1, 1, "leaky", in_mult, w_mult, x_int8=jnp.asarray(xi)))
    out = np.asarray(conv3x3_int8_fused(
        jnp.asarray(xi), jnp.asarray(w8), bias, in_mult, w_mult,
        interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("c,m,hw,b,tb,tm", [
    (128, 256, 13, 2, 1, 128),   # uneven W+2 rows, m tiled in 2 steps
    (256, 128, 8, 4, 2, 128),    # batch tiled
    (128, 128, 7, 3, None, None),  # auto tiling, b not a power of two
])
def test_tiled_int8_conv_matches_xla(c, m, hw, b, tb, tm):
    rng = np.random.RandomState(c + hw)
    xi = rng.randint(-127, 128, (b, hw, hw, c)).astype(np.int8)
    w8 = rng.randint(-127, 128, (3, 3, c, m)).astype(np.int8)
    bias = rng.randn(m).astype(np.float32)
    in_mult, w_mult = 11.0, 40.0
    ref = np.asarray(L.conv2d_int8(
        jnp.zeros(xi.shape, jnp.float32), jnp.asarray(w8), jnp.asarray(bias),
        1, 1, "leaky", in_mult, w_mult, x_int8=jnp.asarray(xi)))
    out = np.asarray(conv3x3_int8_tiled(
        jnp.asarray(xi), jnp.asarray(w8), bias, in_mult, w_mult,
        tb=tb, tm=tm, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_full_model_int8_impl_pallas_matches_xla():
    """build_forward(int8_impl="pallas") routes eligible 3x3 convs through the
    tiled kernel and matches the XLA int8 path head-for-head."""
    import os

    from yolo2_light_tpu.cfg import parse_network_cfg
    from yolo2_light_tpu.models.network import build_forward, params_to_device
    from yolo2_light_tpu.quant import quantize_params
    from yolo2_light_tpu.weights import fuse_conv_batchnorm, random_params

    cfg = os.path.join(os.path.dirname(__file__), "data", "mini-yolo3.cfg")
    spec = parse_network_cfg(cfg, batch=1)
    params = quantize_params(
        spec, fuse_conv_batchnorm(spec, random_params(spec, seed=3)))
    p = params_to_device(params)
    x = jnp.asarray(np.random.RandomState(7).rand(
        2, spec.net.h, spec.net.w, spec.net.c).astype(np.float32))
    heads_ref, _ = build_forward(spec, "int8", int8_policy="cpu",
                                 int8_chain=True)(p, x)
    heads_pal, _ = build_forward(spec, "int8", int8_policy="cpu",
                                 int8_chain=True, int8_impl="pallas")(p, x)
    assert len(heads_ref) == len(heads_pal) >= 1
    for hr, hp in zip(heads_ref, heads_pal):
        np.testing.assert_allclose(np.asarray(hp.data), np.asarray(hr.data),
                                   rtol=1e-5, atol=1e-5)
