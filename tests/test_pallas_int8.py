"""Fused int8 conv prototype kernel vs the XLA conv2d_int8 path (same int8 input)."""

import numpy as np
import pytest

import jax.numpy as jnp

from yolo2_light_tpu.models import layers as L
from yolo2_light_tpu.ops.pallas_int8 import conv3x3_int8_fused


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
