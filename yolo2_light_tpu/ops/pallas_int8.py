"""Fused INT8 3x3 convolution Pallas kernels.

Motivation (CLAUDE.md perf state / VERDICT r2 item 2): the XLA int8 conv path
runs yolov3's mid-net shapes at ~100-160 T effective vs the chip's measured
251 Tops chained-GEMM peak; the reference's identity is hand kernels beating
the obvious formulation (src/gpu.cu:1566-2002). Two generations here:

* :func:`conv3x3_int8_fused` (v1, round 2): whole feature map per grid step,
  9 strided-slice dots. Bit-exact but LOST to XLA (0.676 vs 0.628 ms on the
  26x26x512->512 b=8 probe) — each strided [h, w, C] slice of the padded
  [H+2, W+2, C] buffer forces a Mosaic relayout copy before it can feed the
  MXU. Kept as the validated baseline.

* :func:`conv3x3_int8_tiled` (v2, round 3): implicit GEMM on CONTIGUOUS taps.
  The padded image is viewed flat as [(H+3)*(W+2), C]; the tap (dy, dx)
  contribution to every output position is then the single contiguous row
  range [dy*(W+2)+dx : +H*(W+2)] — no strided relayout at all. The GEMM
  computes an [H*(W+2), M] frame whose 2 junk columns per row are sliced off
  (fused into the consumer) after the kernel. Grid is (B/TB, M/TM) with the
  m axis innermost: the image block stays VMEM-resident across all m steps
  while weight tiles stream (double-buffered by the Pallas pipeline), and the
  requant+bias+leaky epilogue runs in-register. Semantics: identical to
  models/layers.conv2d_int8 (cpu flavor) given the same pre-quantized int8
  input — see tests/test_pallas_int8.py.

Measured verdict (bench_conv_chain.py, chained-int8 regime, b=32 rep=300,
round 3): XLA's own conv lowering runs 237-268 Tops effective on the three
square mid-net tiles — at/above the 251 Tops practical chained-GEMM peak —
while v2 reaches 167-172 T and v1 137-169 T. XLA wins on every shape, so it
stays the default; these kernels are kept as a validated opt-in
(build_forward(..., int8_impl="pallas")) and as the documented negative
result: on TPU the "hand kernel beats the obvious formulation" identity of
the reference (src/gpu.cu:1566-2002) does not transfer to int8 convs — XLA's
implicit-GEMM conv emitter is already at the per-shape roofline, and the
end-to-end gap is early-stage HBM traffic (PERF_NOTES.md round 3).
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


# ---------------------------------------------------------------------------
# v2: contiguous-tap implicit GEMM, batch/M tiled, weights streamed
# ---------------------------------------------------------------------------


def _kernel_tiled(x_ref, w_ref, bias_ref, scale_ref, out_ref, *, h: int,
                  wp: int, c: int, tb: int, leaky: bool, r_mult: int):
    """x [TB, (H+3)*(W+2), C] int8 (flat padded rows); w [9*C, TM] int8
    (tap-major); bias [1, TM] f32; scale [1,1] f32; out [TB, H*WP, TM] f32,
    WP = W+2 (the 2 junk columns per row are sliced off by the caller)."""
    tm = out_ref.shape[-1]
    shift = r_mult.bit_length() - 1
    for i in range(tb):
        xf = x_ref[i]                       # [(H+3)*WP, C], contiguous
        acc = jnp.zeros((h * wp, tm), jnp.int32)
        for t in range(9):
            dy, dx = t // 3, t % 3
            off = dy * wp + dx
            # contiguous row range: tap (dy,dx) for every output position
            acc = acc + jnp.dot(xf[off:off + h * wp, :],
                                w_ref[t * c:(t + 1) * c, :],
                                preferred_element_type=jnp.int32)
        # requant: trunc-div r_mult (power of two -> sign-fix + shift),
        # int16 clamp, dequant, bias, x/10 leaky (reference int8-cpu semantics)
        q = (acc + ((acc >> 31) & (r_mult - 1))) >> shift
        q = jnp.clip(q, -(256 * 128 - 1), 256 * 128 - 1)
        y = q.astype(jnp.float32) * scale_ref[0, 0] + bias_ref[0, :]
        if leaky:
            y = jnp.where(y > 0, y, y / 10.0)
        out_ref[i] = y


def conv3x3_int8_tiled(x_int8, weights_int8, biases, input_mult, weights_mult,
                       *, activation: str = "leaky", r_mult: int = 32,
                       tb: int | None = None, tm: int | None = None,
                       interpret=None):
    """v2 kernel. x_int8: [B,H,W,C] int8 (pre-quantized); weights_int8 HWIO
    [3,3,C,M]; returns f32 [B,H,W,M] == conv2d_int8(semantics="cpu") for
    stride=1/pad=1. ``tb``/``tm`` tile the batch/output-channel grid."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, w, c = x_int8.shape
    m = weights_int8.shape[-1]
    wp = w + 2
    if tb is None:
        # per-image VMEM: f32 out block + int32 acc + int8 image rows; keep the
        # total under ~3MB — the Pallas pipeline double-buffers blocks, and an
        # 8MB budget overflowed VMEM (remote tpu_compile_helper crash) on the
        # 52x52x256 and 13x13x1024 probes
        budget = 3 * 1024 * 1024
        tmx = tm or min(m, 256)
        per_img = h * wp * tmx * 8 + (h + 3) * wp * c
        tb = max(1, min(b, budget // max(per_img, 1)))
        while b % tb:
            tb -= 1
    if tm is None:
        tm = min(m, 256)
    while m % tm:
        tm //= 2
    assert b % tb == 0 and m % tm == 0, (b, tb, m, tm)

    # pad: 1 top + 2 bottom rows (the flat-tap trick reads up to
    # (h+2)*wp + 1 elements), 1 col each side
    xp = jnp.pad(x_int8, ((0, 0), (1, 2), (1, 1), (0, 0)))
    xp = xp.reshape(b, (h + 3) * wp, c)
    wt = jnp.asarray(weights_int8).reshape(9 * c, m)   # tap-major [9C, M]
    bias = jnp.asarray(biases, jnp.float32).reshape(1, m)
    scale = jnp.full((1, 1), r_mult / (input_mult * weights_mult), jnp.float32)
    leaky = activation == "leaky"
    if activation not in ("leaky", "linear"):
        raise NotImplementedError(activation)

    out = pl.pallas_call(
        functools.partial(_kernel_tiled, h=h, wp=wp, c=c, tb=tb, leaky=leaky,
                          r_mult=r_mult),
        grid=(b // tb, m // tm),   # m innermost: image resident, weights stream
        in_specs=[
            pl.BlockSpec((tb, (h + 3) * wp, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * c, tm), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((tb, h * wp, tm), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h * wp, m), jnp.float32),
        interpret=interpret,
    )(xp, wt, bias, scale)
    # strip the junk columns (x >= W); fuses into the consumer
    return out.reshape(b, h, wp, m)[:, :, :w, :]
