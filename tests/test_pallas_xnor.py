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
