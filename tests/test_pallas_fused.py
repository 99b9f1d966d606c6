"""Fused residual-stage Pallas kernel vs the XLA int8-cpu path (bit-exact).

The oracle is the JITTED plain-JAX stage (models/layers.conv2d_int8 + add) —
the exact ops the production int8 path runs. Note the jitted/eager XLA
programs themselves differ by 1 ulp (XLA rewrites the leaky /10 into a
reciprocal multiply under jit); the kernel matches the jitted form exactly.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolo2_light_tpu.ops.pallas_fused import (fused_res_stage,
                                              fused_res_stage_strips,
                                              res_stage_reference)


def _mkblocks(rng, K, C, C2):
    return [dict(
        w1=rng.randint(-100, 100, (1, 1, C, C2)).astype(np.int8),
        b1=(rng.randn(C2) * 0.2).astype(np.float32),
        m1=float(rng.uniform(8, 24)), wm1=float(rng.uniform(2, 6)),
        w2=rng.randint(-100, 100, (3, 3, C2, C)).astype(np.int8),
        b2=(rng.randn(C) * 0.2).astype(np.float32),
        m2=float(rng.uniform(8, 24)), wm2=float(rng.uniform(2, 6)),
    ) for _ in range(K)]


def _ref(x, blocks):
    return np.asarray(jax.jit(lambda a: res_stage_reference(a, blocks))(x))


@pytest.mark.parametrize("H,C,C2,K", [
    (16, 32, 16, 1),
    (16, 32, 16, 2),
    (26, 64, 32, 4),    # multi-block chain, darknet53-style geometry
])
def test_whole_image_stage_bit_exact(H, C, C2, K):
    rng = np.random.RandomState(H + K)
    x = jnp.asarray(rng.randn(2, H, H, C).astype(np.float32))
    blocks = _mkblocks(rng, K, C, C2)
    out = np.asarray(jax.jit(
        lambda a: fused_res_stage(a, blocks, interpret=True))(x))
    ref = _ref(x, blocks)
    np.testing.assert_array_equal(out, ref)


@pytest.mark.parametrize("H,n_strips", [(16, 4), (24, 3), (16, 1)])
def test_strips_stage_bit_exact(H, n_strips):
    rng = np.random.RandomState(n_strips)
    C, C2 = 32, 16
    x = jnp.asarray(rng.randn(2, H, H, C).astype(np.float32))
    blocks = _mkblocks(rng, 1, C, C2)
    out = np.asarray(jax.jit(
        lambda a: fused_res_stage_strips(a, blocks, n_strips=n_strips,
                                         interpret=True))(x))
    ref = _ref(x, blocks)
    np.testing.assert_array_equal(out, ref)


def test_strips_match_whole_image():
    rng = np.random.RandomState(7)
    C, C2, H = 32, 16, 16
    x = jnp.asarray(rng.randn(1, H, H, C).astype(np.float32))
    blocks = _mkblocks(rng, 1, C, C2)
    a = np.asarray(jax.jit(
        lambda v: fused_res_stage(v, blocks, interpret=True))(x))
    b = np.asarray(jax.jit(
        lambda v: fused_res_stage_strips(v, blocks, n_strips=4,
                                         interpret=True))(x))
    np.testing.assert_array_equal(a, b)


def test_chunked_rows_bit_exact():
    """Row chunking (ch < H) must not change anything."""
    rng = np.random.RandomState(11)
    C, C2, H = 32, 16, 24
    x = jnp.asarray(rng.randn(1, H, H, C).astype(np.float32))
    blocks = _mkblocks(rng, 2, C, C2)
    a = np.asarray(jax.jit(
        lambda v: fused_res_stage(v, blocks, ch=8, interpret=True))(x))
    ref = _ref(x, blocks)
    np.testing.assert_array_equal(a, ref)
