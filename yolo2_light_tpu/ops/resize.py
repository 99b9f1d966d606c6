"""On-device darknet-exact bilinear resize.

Same math, op order, and endpoint rules as the host implementation
(io/image.resize_image — reference: resize_image, src/additionally.c:3021-3064):
separable H-then-V passes, scale = (in-1)/(out-1), the last output column (and
any column when in_w == 1) copies the source edge, the last output row gets no
second tap (it keeps its (1-dy) weight even when dy > 0 — the reference's
float scale can land the last row's sample fractionally short of in_h-1).

Tap indices and fractional weights are precomputed at TRACE time with the same
numpy float32 arithmetic the host path uses, so the two paths pick identical
taps; edge taps are folded into the general gather by forcing dx=0 / ix=ix1
(1.0*v + 0.0*v == v exactly in f32 for the non-negative pixel domain).

Accuracy: <= 1 ULP from the strict-f32 oracle (gcc -O1). XLA's LLVM backend
contracts the lerp's mul+add into an FMA (measured on the CPU backend; an
HLO optimization_barrier does not stop instruction-level contraction) — the
SAME deviation the repo's own native/resize.cpp has (g++ -march=native emits
vfmadd) and the numpy fallback has (its f32-int32 index subtraction promotes
the weights to f64). All four implementations agree to 1 ULP and the
detection-print parity suite passes through any of them.

Why it exists (TPU-native serving concern, not reference parity): the serving
host is often the bottleneck, not the chip — this environment's 1-core host
spends ms/frame in resize while the TPU idles, and host work concurrent with
relay transfers starves them (PERF_NOTES.md). Shipping camera-native frames
and resizing on device frees the host entirely; with uint8 ingest it is also
MORE faithful than host-resize + re-quantize (raw sensor bytes, /255 and
f32 resize on device — exactly the reference's load path). The trade is H2D
bytes at the SOURCE resolution instead of the net's (worse through a thin
link when the source exceeds net dims; a non-issue on direct-attached hosts).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _taps(in_dim: int, out_dim: int):
    """(i0, i1, frac): int32 tap indices + f32 second-tap weights, bit-matching
    io/image.resize_image's index arithmetic (np.float32 throughout)."""
    pos = np.arange(out_dim, dtype=np.float32)
    scale = (np.float32((in_dim - 1) / (out_dim - 1))
             if out_dim > 1 else np.float32(0))
    s = pos * scale
    i0 = s.astype(np.int32)
    frac = s - i0
    i1 = np.minimum(i0 + 1, in_dim - 1)
    edge = (np.arange(out_dim) == out_dim - 1) | (in_dim == 1)
    i0 = np.where(edge, in_dim - 1, i0).astype(np.int32)
    i1 = np.where(edge, in_dim - 1, i1).astype(np.int32)
    frac = np.where(edge, np.float32(0), frac).astype(np.float32)
    return i0, i1, frac


def device_resize_image(x, w: int, h: int):
    """[B, ih, iw, C] float32 in [0,1] -> [B, h, w, C], darknet-exact."""
    ih, iw = int(x.shape[1]), int(x.shape[2])
    if (ih, iw) == (h, w):
        return x
    x = x.astype(jnp.float32)

    # horizontal pass (reference writes the edge column verbatim; dx=0 taps
    # reproduce that exactly)
    ix0, ix1, dx = _taps(iw, w)
    part = (x[:, :, ix0, :] * (1.0 - dx)[None, None, :, None]
            + x[:, :, ix1, :] * dx[None, None, :, None])

    # vertical pass: every row keeps its RAW (1-dy) first-tap weight (the
    # reference's float scale can land the last row fractionally short of
    # ih-1); only rows with `second` get the +dy second tap
    pos = np.arange(h, dtype=np.float32)
    scale = np.float32((ih - 1) / (h - 1)) if h > 1 else np.float32(0)
    s = pos * scale
    iy0 = np.minimum(s.astype(np.int32), ih - 1).astype(np.int32)
    dy_raw = (s - s.astype(np.int32)).astype(np.float32)
    second = ~((np.arange(h) == h - 1) | (ih == 1))
    iy1 = np.where(second, np.minimum(iy0 + 1, ih - 1), iy0).astype(np.int32)
    dy2 = np.where(second, dy_raw, np.float32(0)).astype(np.float32)
    out = (part[:, iy0, :, :] * (1.0 - dy_raw)[None, :, None, None]
           + part[:, iy1, :, :] * dy2[None, :, None, None])
    return out
