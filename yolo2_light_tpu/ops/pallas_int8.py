"""Prototype: fused INT8 3x3 convolution Pallas kernel (whole feature map in VMEM).

Motivation (see CLAUDE.md perf state): the XLA int8 path materializes the int32 conv
result before the requant epilogue; fusing requant/dequant/bias/leaky into the matmul
keeps everything in VMEM and emits 1-byte (or 4-byte f32) outputs directly. This
kernel targets the late yolov3 layers whose full maps fit VMEM (<= ~26x26x1024).

Shape domain: stride 1, pad 1, 3x3, one grid step per batch image, H*W and C such
that x[(H+2)*(W+2)*C]int8 + w[9*C*M]int8 + acc[H*W*M]int32 fit in ~16MB VMEM.

Semantics: identical to models/layers.conv2d_int8 (cpu flavor) given the same
pre-quantized int8 input — see tests/test_pallas_int8.py.

Status: experimental, NOT wired into the model builder. Measured on TPU v5e
(b=8, 26x26x512->512): bit-exact vs XLA but 0.676 ms vs XLA's 0.628 ms — XLA's
int8 conv already fuses the requant epilogue and its schedules beat this naive
whole-map 9-matmul kernel, so the remaining int8-vs-bf16 gap is NOT epilogue
materialization. Kept as the validated starting point (and negative result) for
any future int8 conv kernel work.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, bias_ref, scale_ref, out_ref, *, h: int, w: int,
            leaky: bool, r_mult: int):
    """x [H+2, W+2, C] int8 (pre-padded); w [9*C, M] int8 (tap-major); bias [1, M]
    f32; scale [1, 1] f32 (= R_MULT/(in_mult*w_mult)); out [H*W, M] f32."""
    c = x_ref.shape[-1]
    m = out_ref.shape[-1]
    acc = jnp.zeros((h * w, m), jnp.int32)
    for t in range(9):
        dy, dx = t // 3, t % 3
        patch = x_ref[0, dy:dy + h, dx:dx + w, :].reshape(h * w, c)
        acc = acc + jnp.dot(patch, w_ref[t * c:(t + 1) * c, :],
                            preferred_element_type=jnp.int32)
    # requant: trunc-div r_mult (power of two -> sign-fix + shift), clamp int16
    # (reference int8-cpu semantics)
    shift = r_mult.bit_length() - 1
    q = (acc + ((acc >> 31) & (r_mult - 1))) >> shift
    q = jnp.clip(q, -(256 * 128 - 1), 256 * 128 - 1)
    y = q.astype(jnp.float32) * scale_ref[0, 0] + bias_ref[0, :]
    if leaky:
        y = jnp.where(y > 0, y, y / 10.0)
    out_ref[0, :, :] = y


def conv3x3_int8_fused(x_int8, weights_int8, biases, input_mult, weights_mult,
                       *, activation: str = "leaky", r_mult: int = 32,
                       interpret=None):
    """x_int8: [B,H,W,C] int8 (already quantized); weights_int8: HWIO [3,3,C,M];
    returns f32 [B,H,W,M] — equal to conv2d_int8(..., x_int8=x_int8) for
    stride=1/pad=1."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, w, c = x_int8.shape
    m = weights_int8.shape[-1]
    xp = jnp.pad(x_int8, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # tap-major [9*C, M]
    wt = jnp.asarray(weights_int8).reshape(9 * c, m)
    bias = jnp.asarray(biases, jnp.float32).reshape(1, m)
    scale = jnp.full((1, 1), r_mult / (input_mult * weights_mult), jnp.float32)
    leaky = activation == "leaky"
    if activation not in ("leaky", "linear"):
        raise NotImplementedError(activation)

    out = pl.pallas_call(
        functools.partial(_kernel, h=h, w=w, leaky=leaky, r_mult=r_mult),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h + 2, w + 2, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * c, m), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, h * w, m), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h * w, m), jnp.float32),
        interpret=interpret,
    )(xp, wt, bias, scale)
    return out.reshape(b, h, w, m)
