"""Fused residual-stage Pallas kernels (int8-cpu semantics, bit-exact).

Motivation (PERF_NOTES.md round 3, bench_stages.py): the bit-exact int8
yolov3 path is HBM-bound on its EARLY stages — the f32 residual trunk
crosses HBM several times per residual block (quantize read, shortcut
read+write, conv output write). XLA cannot fuse across the
conv->conv->add chain because each conv is a separate HLO; a Pallas
kernel CAN: it keeps the residual trunk resident in VMEM for an entire
darknet53 stage, so HBM sees exactly one f32 read of the stage input and
one f32 write of the stage output.

Per residual block (reference semantics, all bit-exact to
models/layers.conv2d_int8 semantics="cpu" — src/yolov2_forward_network_quantized.c:527-631):

    xq  = clamp(trunc(x * m1), +-127)            int8      (VPU, in-register)
    a1  = conv1x1(xq, W1)                        int32     (MXU)
    t1  = leaky10(trunc_div(a1, 32) clamp * alpha1 + b1)   (VPU)
    t1q = clamp(trunc(t1 * m2), +-127)           int8      (VMEM scratch)
    a2  = conv3x3(t1q, W2)                       int32     (MXU, 9 flat taps)
    y2  = leaky10(trunc_div(a2, 32) clamp * alpha2 + b2)   (VPU)
    x'  = x + y2                                 f32       (VPU, in-place)

The 3x3 conv uses the contiguous-tap implicit GEMM of ops/pallas_int8.py
(v2): with 1-col padding each side, tap (dy,dx)'s contribution to every
output position of a row-chunk is one contiguous row range of the flat
[rows*WP, C] view — no strided relayouts on the MXU path.

Mosaic constraints that shaped this file (learned on-chip, v5e libtpu):
  * i8 (and in general 2-D<->3-D) vector shape casts are rejected by
    infer-vector-layout — ALL compute stays on flat 2-D [rows*WP, C]
    values, accessed through ``ref.reshape`` flat views of the 3-D
    scratches.  Interpret mode cannot discharge reshaped refs, so a
    value-reshape shim (:class:`_FlatView`) emulates the same flat view
    there; every flat access is a whole-row range so both agree.
  * manual ``make_async_copy`` rejects HBM slices whose LANE extent is
    not a multiple of the 128 tiling — the wrappers therefore pad the
    image on the HOST side to [B, H+3, WP, C] (XLA fuses the pad/slice
    into neighbors) and the kernels move only FULL refs / leading-dim
    slices.  This also removes all in-kernel border bookkeeping: pad
    rows and cols arrive zeroed from HBM.  Consequence: stages with
    C < 128 (yolov3's 208p stage) cannot use this kernel — measured
    moot, XLA already sits on that stage's HBM traffic floor
    (bench_stages.py: 0.0356 ms/img vs a 0.027 ms two-transit floor).
  * the ``ref.reshape`` flat view merges the (row, col) dims, which is
    only physically contiguous when the merged col extent is a multiple
    of the SUBLANE tile — 8 for f32, 32 for the int8 t1q scratch.  The
    first on-chip attempt used WP = W+2 = 106 and faulted the TPU worker
    (the flat view's assumed strides were off the padded tile layout);
    WP is therefore rounded up to a multiple of 32 (``_round_up``), with
    the extra cols masked to zero exactly like the 1-col halo.

Two variants:
  * :func:`fused_res_stage` — whole image VMEM-resident, K blocks chained,
    grid over batch. Fits 104p (C=128) and 52p (C=256) on a ~16MB-VMEM core.
  * :func:`fused_res_stage_strips` — row-strips with a 1-row halo, single
    block (K=1), grid (batch, strips), for geometries whose whole f32
    image exceeds VMEM.

Integration: models/network.build_forward(int8_impl="fused") pattern-matches
(conv1x1 leaky int8) -> (conv3x3 leaky int8) -> (shortcut linear) runs at
trace time; everything else stays on the XLA path.

Measured verdict (v5e chip, b=128, bench_fused_stage.py — PERF_NOTES.md
round 3): bit-exact on hardware (maxerr=0 vs the XLA path) but SLOWER —
res104 0.1025 vs XLA 0.0508 ms/img, res52 0.1074 vs 0.0897. The fusion
does eliminate the trunk's HBM transits, but Mosaic's int8 dot runs at
~132 Tops vs XLA's 237-268 Tops convs, and the deficit exceeds the
traffic savings at every eligible stage. Kept as validated opt-in
(-int8_impl fused): the transform is right, the int8 GEMM rate isn't —
re-measure on future libtpu releases.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R_MULT = 32  # reference: src/yolov2_forward_network_quantized.c:13


def _round_up(n: int, m: int) -> int:
    return (n + m - 1) // m * m


def _wp(W: int) -> int:
    """Padded row width: >= W+2 (1-col halo each side) and a multiple of
    32 so the int8/f32 flat views' rows align with Mosaic's sublane tiles
    (f32 (8,128), int8 (32,128) — misaligned flat views fault on-chip)."""
    return _round_up(W + 2, 32)


def _epilogue(acc, alpha, bias, leaky: bool):
    """int8-cpu requant chain: trunc-div R_MULT (sign-fix+shift), int16 clamp,
    dequant, bias, x/10 leaky. Bit-exact to models/layers.conv2d_int8."""
    shift = R_MULT.bit_length() - 1
    q = (acc + ((acc >> 31) & (R_MULT - 1))) >> shift
    q = jnp.clip(q, -(256 * 128 - 1), 256 * 128 - 1)
    y = q.astype(jnp.float32) * alpha + bias
    if leaky:
        y = jnp.where(y > 0, y, y / 10.0)
    return y


def _quant8(x, mult):
    return jnp.clip(jnp.trunc(x * mult), -127, 127).astype(jnp.int8)


def _scal_row(m1, wm1, m2, wm2):
    """[m1, alpha1, m2, alpha2] computed with the same dtype semantics as
    models/layers.conv2d_int8 (python-float math for python floats at trace
    time; f32 device math for traced multipliers) so the requant scale is
    bit-identical to the XLA path's."""
    a1 = R_MULT / (m1 * wm1)
    a2 = R_MULT / (m2 * wm2)
    return jnp.stack([jnp.asarray(v, jnp.float32) for v in (m1, a1, m2, a2)])


class _FlatView:
    """Interpret-mode stand-in for ``ref.reshape(rows*WP, C)``: every flat
    access in :func:`_block_body` covers whole buffer rows, so it maps to a
    leading-dim ref slice plus a VALUE reshape (legal under interpret,
    where reshaped-ref discharge is unimplemented)."""

    def __init__(self, ref, WP: int, C: int):
        self.ref, self.WP, self.C = ref, WP, C

    def __getitem__(self, sl):
        a, b = sl.start, sl.stop
        assert a % self.WP == 0 and b % self.WP == 0, (a, b, self.WP)
        v = self.ref[a // self.WP: b // self.WP]
        return v.reshape(b - a, self.C)

    def __setitem__(self, sl, val):
        a, b = sl.start, sl.stop
        assert a % self.WP == 0 and b % self.WP == 0, (a, b, self.WP)
        self.ref[a // self.WP: b // self.WP] = val.reshape(
            (b - a) // self.WP, self.WP, self.C)


def _flat(ref, WP: int, C: int, interpret: bool):
    if interpret:
        return _FlatView(ref, WP, C)
    return ref.reshape(ref.shape[0] * WP, C)


def _block_body(curf, t1qf, w1, b1, w2, b2, m1, a1, m2, a2, *,
                H: int, W: int, WP: int, C: int, C2: int, CH: int,
                row_base=None, rows_total: int | None = None):
    """One residual block over the VMEM-resident trunk flat view ``curf``
    [(RT+pad)*WP, C].

    ``rows_total``: number of buffer rows whose t1 must be computed (whole
    image: H interior rows; strips: TH+2 incl. halo rows). ``row_base``:
    traced global image row of buffer row 0 (strips; None = whole-image,
    where buffer row i = image row i-1: pad rows 0 and H+1 arrive zeroed
    from the host-side pad and their t1q rows stay at their zero init).
    """
    RT = rows_total if rows_total is not None else H
    first = 1 if row_base is None else 0   # first buffer row holding t1 input

    # conv1x1 over every trunk row that conv2 will tap, quantized into t1q
    for r0 in range(0, RT, CH):
        n = min(CH, RT - r0)
        flat = curf[(first + r0) * WP: (first + r0 + n) * WP]   # [n*WP, C]
        xq = _quant8(flat, m1)
        acc = jnp.dot(xq, w1, preferred_element_type=jnp.int32)
        y = _epilogue(acc, a1, b1, leaky=True)
        idx = jax.lax.broadcasted_iota(jnp.int32, (n * WP, 1), 0)
        col_ok = ((idx % WP) >= 1) & ((idx % WP) <= W)
        if row_base is None:
            ok = col_ok
        else:
            # strips: halo rows may sit outside the image (zero padding rows
            # whose t1 would still be leaky(bias) without this mask)
            grow = row_base + (idx // WP) + r0
            ok = col_ok & (grow >= 0) & (grow < H)
        t1 = jnp.where(ok, y, 0.0)
        t1qf[(first + r0) * WP: (first + r0 + n) * WP] = _quant8(t1, m2)

    # conv3x3 (contiguous flat taps) + epilogue + in-place shortcut add.
    # Output rows are the strip/image interior: buffer rows 1..H(or TH).
    out_rows = H if row_base is None else RT - 2
    for r0 in range(0, out_rows, CH):
        n = min(CH, out_rows - r0)
        # taps for output buffer-rows r0+1..r0+n read t1q rows r0..r0+n+1;
        # +2 flat slack elements -> slice n+3 rows (buffer has the slack row)
        tr = t1qf[r0 * WP: (r0 + n + 3) * WP]
        acc = jnp.zeros((n * WP, w2.shape[-1]), jnp.int32)
        for t in range(9):
            dy, dx = divmod(t, 3)
            off = dy * WP + dx
            acc = acc + jnp.dot(tr[off: off + n * WP],
                                w2[t * C2:(t + 1) * C2, :],
                                preferred_element_type=jnp.int32)
        y2 = _epilogue(acc, a2, b2, leaky=True)
        idx = jax.lax.broadcasted_iota(jnp.int32, (n * WP, 1), 0)
        y2 = jnp.where((idx % WP) < W, y2, 0.0)
        # flat-tap output col x == image col x; the trunk stores image col x
        # at buffer col x+1 -> shift the FLAT vector right one element: each
        # buffer col 0 then receives the previous row's col W+1 (masked to 0)
        # and the first element receives the prepended zero row.
        shifted = jnp.concatenate(
            [jnp.zeros((1, C), jnp.float32), y2[: n * WP - 1]], axis=0)
        lo, hi = (r0 + 1) * WP, (r0 + 1 + n) * WP
        curf[lo:hi] = curf[lo:hi] + shifted


def _pad_input(x, WP: int):
    """[B,H,W,C] -> [B,H+3,WP,C]: 1 zero row/col before, the rest after
    (+1 spare row so the scratch shape matches t1q's flat-tap slack row;
    col padding up to the 32-aligned WP). XLA fuses this pad into the
    producer epilogue (one padded materialization)."""
    W = x.shape[2]
    return jnp.pad(x, ((0, 0), (1, 2), (1, WP - W - 1), (0, 0)))


def _stage_kernel(x_hbm, w1_ref, b1_ref, w2_ref, b2_ref, scal_ref, out_hbm,
                  cur, t1q, sem_in, sem_out, *,
                  H: int, W: int, WP: int, C: int, C2: int, K: int, CH: int,
                  interpret: bool):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        # t1q rows 0 / H+1 / H+2 are never written (first=1, RT=H) and must
        # read as zero for the conv2 border taps; the written interior is
        # fully overwritten per image -> zero once
        t1q[...] = jnp.zeros_like(t1q)

    copy_in = pltpu.make_async_copy(x_hbm.at[b], cur, sem_in)
    copy_in.start()
    copy_in.wait()

    curf = _flat(cur, WP, C, interpret)
    t1qf = _flat(t1q, WP, C2, interpret)

    def run_block(k, _):
        _block_body(curf, t1qf, w1_ref[k], b1_ref[k], w2_ref[k], b2_ref[k],
                    scal_ref[k, 0], scal_ref[k, 1],
                    scal_ref[k, 2], scal_ref[k, 3],
                    H=H, W=W, WP=WP, C=C, C2=C2, CH=CH)
        return 0

    jax.lax.fori_loop(0, K, run_block, 0)

    copy_out = pltpu.make_async_copy(cur, out_hbm.at[b], sem_out)
    copy_out.start()
    copy_out.wait()


def _prep_blocks(blocks, C):
    w1s, b1s, w2s, b2s, scals = [], [], [], [], []
    C2 = None
    for blk in blocks:
        w1 = jnp.asarray(blk["w1"]).reshape(-1, blk["w1"].shape[-1])
        C2 = w1.shape[-1]
        assert w1.shape == (C, C2), (w1.shape, C, C2)
        w2 = jnp.asarray(blk["w2"]).reshape(9 * C2, C)
        w1s.append(w1)
        w2s.append(w2)
        b1s.append(jnp.asarray(blk["b1"], jnp.float32).reshape(1, C2))
        b2s.append(jnp.asarray(blk["b2"], jnp.float32).reshape(1, C))
        scals.append(_scal_row(blk["m1"], blk["wm1"], blk["m2"], blk["wm2"]))
    return (jnp.stack(w1s), jnp.stack(b1s), jnp.stack(w2s), jnp.stack(b2s),
            jnp.stack(scals), C2)


def fused_res_stage(x, blocks, *, ch: int | None = None, interpret=None):
    """K chained residual blocks with the trunk VMEM-resident.

    ``x``: [B, H, W, C] float32. ``blocks``: list of K dicts with keys
    ``w1`` [C, C2] int8 (HWIO [1,1,C,C2] accepted), ``b1`` [C2] f32,
    ``m1``/``wm1`` floats (conv1 input/weight quant multipliers),
    ``w2`` HWIO [3, 3, C2, C] int8, ``b2`` [C] f32, ``m2``/``wm2`` floats.
    Returns f32 [B, H, W, C]. On real TPUs requires C % 128 == 0 (DMA lane
    tiling — see module docstring).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, H, W, C = x.shape
    if not interpret and C % 128:
        raise ValueError(
            f"fused_res_stage needs C % 128 == 0 on TPU (DMA lane tiling); "
            f"got C={C}")
    WP = _wp(W)
    HP = H + 3
    K = len(blocks)
    w1_all, b1_all, w2_all, b2_all, scal, C2 = _prep_blocks(blocks, C)
    if ch is None:
        # chunk rows so the int32 accumulator stays ~<=1.5MB
        ch = max(8, min(H, (1_500_000 // (WP * C * 4))))
        while H % ch:
            ch -= 1

    outp = pl.pallas_call(
        functools.partial(_stage_kernel, H=H, W=W, WP=WP, C=C, C2=C2, K=K,
                          CH=ch, interpret=interpret),
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),          # x stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),      # w1_all
            pl.BlockSpec(memory_space=pltpu.VMEM),      # b1_all
            pl.BlockSpec(memory_space=pltpu.VMEM),      # w2_all
            pl.BlockSpec(memory_space=pltpu.VMEM),      # b2_all
            pl.BlockSpec(memory_space=pltpu.SMEM),      # scal
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((B, HP, WP, C), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((HP, WP, C), jnp.float32),       # cur (trunk)
            pltpu.VMEM((HP, WP, C2), jnp.int8),         # t1q
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(_pad_input(x, WP), w1_all, b1_all, w2_all, b2_all, scal)
    return outp[:, 1: H + 1, 1: W + 1, :]


def _strips_kernel(x_hbm, w1_ref, b1_ref, w2_ref, b2_ref, scal_ref, out_hbm,
                   cur, t1q, sem_in, sem_out, *,
                   H: int, W: int, WP: int, C: int, C2: int, TH: int, CH: int,
                   interpret: bool):
    b = pl.program_id(0)
    s = pl.program_id(1)
    r0 = s * TH                # padded-buffer row of this strip's top halo

    @pl.when((b == 0) & (s == 0))
    def _():
        # only t1q's flat-slack row (TH+2) is never written; zero it once
        t1q[...] = jnp.zeros_like(t1q)

    # trunk rows needed: padded rows r0 .. r0+TH+1 (output rows + 1-row
    # halo); always in-bounds of the host-padded [HP, WP, C] input.
    copy_in = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(r0, TH + 2)], cur, sem_in)
    copy_in.start()
    copy_in.wait()

    curf = _flat(cur, WP, C, interpret)
    t1qf = _flat(t1q, WP, C2, interpret)

    _block_body(curf, t1qf, w1_ref[0], b1_ref[0], w2_ref[0], b2_ref[0],
                scal_ref[0, 0], scal_ref[0, 1], scal_ref[0, 2], scal_ref[0, 3],
                H=H, W=W, WP=WP, C=C, C2=C2, CH=CH,
                row_base=r0 - 1, rows_total=TH + 2)

    copy_out = pltpu.make_async_copy(
        cur.at[pl.ds(1, TH)], out_hbm.at[b, pl.ds(1 + r0, TH)], sem_out)
    copy_out.start()
    copy_out.wait()


def fused_res_stage_strips(x, blocks, *, n_strips: int = 4,
                           ch: int | None = None, interpret=None):
    """Single-block (K=1) variant tiled over row strips with a 1-row halo —
    for stages whose whole f32 image exceeds VMEM."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    assert len(blocks) == 1, "strip variant fuses exactly one residual block"
    B, H, W, C = x.shape
    WP = _wp(W)
    HP = H + 3
    while H % n_strips:
        n_strips -= 1
    if n_strips == 1:
        return fused_res_stage(x, blocks, ch=ch, interpret=interpret)
    TH = H // n_strips
    w1_all, b1_all, w2_all, b2_all, scal, C2 = _prep_blocks(blocks, C)
    if ch is None:
        ch = max(8, min(TH + 2, (1_500_000 // (WP * C * 4))))

    outp = pl.pallas_call(
        functools.partial(_strips_kernel, H=H, W=W, WP=WP, C=C, C2=C2, TH=TH,
                          CH=ch, interpret=interpret),
        grid=(B, n_strips),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((B, HP, WP, C), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((TH + 2, WP, C), jnp.float32),
            pltpu.VMEM((TH + 3, WP, C2), jnp.int8),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(_pad_input(x, WP), w1_all, b1_all, w2_all, b2_all, scal)
    return outp[:, 1: H + 1, 1: W + 1, :]


def res_stage_reference(x, blocks):
    """Pure-JAX reference of the same stage (the exact ops the XLA path runs:
    models/layers.conv2d_int8 cpu semantics + shortcut), for validation."""
    from ..models import layers as L
    cur = x
    for blk in blocks:
        w1 = jnp.asarray(blk["w1"]).reshape(1, 1, -1, blk["w1"].shape[-1])
        t1 = L.conv2d_int8(cur, w1, jnp.asarray(blk["b1"], jnp.float32),
                           1, 0, "leaky", blk["m1"], blk["wm1"])
        t2 = L.conv2d_int8(t1, jnp.asarray(blk["w2"]),
                           jnp.asarray(blk["b2"], jnp.float32),
                           1, 1, "leaky", blk["m2"], blk["wm2"])
        cur = cur + t2
    return cur
