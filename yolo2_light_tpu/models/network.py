"""Network forward builder: ModelSpec -> one jittable XLA program.

The whole network (every layer, both heads) traces into a single ``jit``-compiled XLA
program; layer dispatch happens at trace time over the static spec, so there is no
Python in the hot path (contrast with the reference's per-layer interpreter loop,
``yolov2_forward_network_cpu``, src/yolov2_forward_network.c:581-628).

Precision modes:

* ``fp32``   — dense convs in fp32 (or bf16-on-MXU via ``compute_dtype``); XNOR layers
  (cfg ``xnor=1``) always take the binary path, as in the reference.
* ``int8``   — convs quantized per policy:
  - ``policy="cpu"``: every conv except index 0 and LINEAR-activation convs
    (reference dispatch: src/yolov2_forward_network_quantized.c:1036-1037);
  - ``policy="gpu"``: only convs with the cfg-derived ``quantized`` eligibility flag
    (reference: parse_convolutional + yolo-lookahead, src/additionally.c:3558,3996).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..cfg import (ConvSpec, MaxpoolSpec, ModelSpec, RegionSpec, ReorgSpec,
                   RouteSpec, ShortcutSpec, SoftmaxSpec, UpsampleSpec, YoloSpec)
from . import layers as L


class HeadOutput(NamedTuple):
    """Post-activation output of a detection head, cell-major.

    ``data``: [B, H, W, n, entries] where entries = 4 coords + 1 obj + classes.
    """
    index: int
    kind: str          # "yolo" | "region"
    data: jax.Array


def _int8_layer_set(spec: ModelSpec, policy: str) -> set:
    out = set()
    for l in spec.layers:
        if not isinstance(l, ConvSpec):
            continue
        if policy == "cpu":
            if l.index >= 1 and l.activation != "linear":
                out.add(l.index)
        elif policy == "gpu":
            if l.quantized:
                out.add(l.index)
        else:
            raise ValueError(f"unknown int8 policy {policy!r}")
    return out


def _consumers(spec: ModelSpec) -> dict:
    """layer index -> indices of layers reading its output (routes read their
    sources; shortcuts read from_index and the preceding layer; every other
    non-first layer reads its predecessor)."""
    consumers: dict[int, list] = {i: [] for i in range(spec.n)}
    for l in spec.layers:
        if isinstance(l, RouteSpec):
            for j in l.layers:
                consumers[j].append(l.index)
        elif isinstance(l, ShortcutSpec):
            consumers[l.from_index].append(l.index)
            consumers[l.index - 1].append(l.index)
        elif l.index > 0:
            consumers[l.index - 1].append(l.index)
    return consumers


def _int8_chain_targets(spec: ModelSpec, int8_set: set) -> dict:
    """For each layer index, the index of the unique int8 conv reachable from its
    output through quantization-commuting ops (maxpool/route/reorg/upsample-scale-1),
    or None when absent/ambiguous. Quantization (monotone trunc+clamp) commutes
    exactly with max/concat/permute/repeat, so a producer can emit pre-quantized
    int8 activations for its downstream int8 conv; static analysis keeps only the
    unique-consumer case (a shared output feeding two int8 convs could have two
    different input multipliers)."""
    consumers = _consumers(spec)
    targets: dict[int, object] = {}

    def target_of(i: int):
        """int8-conv consumer index wanted from layer i's OUTPUT (memoized)."""
        if i in targets:
            return targets[i]
        wanted = set()
        for c in consumers.get(i, []):
            lc = spec.layers[c]
            if isinstance(lc, ConvSpec):
                if c in int8_set:
                    wanted.add(c)
            elif isinstance(lc, (MaxpoolSpec, RouteSpec, ReorgSpec)):
                t = target_of(c)
                if t is not None:
                    wanted.add(t)
            elif isinstance(lc, UpsampleSpec) and lc.scale == 1.0:
                t = target_of(c)
                if t is not None:
                    wanted.add(t)
            # shortcut/heads need float only
        targets[i] = wanted.pop() if len(wanted) == 1 else None
        return targets[i]

    for i in range(spec.n - 1, -1, -1):
        target_of(i)
    return targets


def _quantize_i8(x, mult):
    return jnp.clip(jnp.trunc(x * mult), -127, 127).astype(jnp.int8)


def _trunk_targets(spec: ModelSpec, int8_set: set) -> dict:
    """int8-residual-trunk scale analysis (``residual_dtype="int8"``): for each
    layer index, the NEAREST downstream int8 conv whose
    ``input_quant_multipler`` scales this layer's materialized activation —
    reachable through maxpool/route/reorg/upsample AND (unlike the bit-exact
    chain analysis) shortcut layers, since the residual trunk is exactly the
    tensors shortcuts keep alive. Multi-consumer ambiguity resolves to the
    smallest target index (nearest in program order): the scale choice only
    bounds the residual materialization error, it does not need the
    uniqueness producer-side emission does. Reference precedent for an
    int8-chained trunk: the old fully-int8 pipeline,
    src/yolov2_forward_network_quantized.c:636-801."""
    consumers = _consumers(spec)
    targets: dict[int, object] = {}

    def target_of(i: int):
        if i in targets:
            return targets[i]
        targets[i] = None   # guard (consumers only point forward, but be safe)
        wanted = set()
        for c in consumers.get(i, []):
            lc = spec.layers[c]
            if isinstance(lc, ConvSpec):
                if c in int8_set:
                    wanted.add(c)
            elif (isinstance(lc, (MaxpoolSpec, RouteSpec, ReorgSpec,
                                  ShortcutSpec))
                  or (isinstance(lc, UpsampleSpec) and lc.scale == 1.0)):
                # non-unit upsample scale multiplies values AFTER this
                # producer, so the consumer's calibrated multiplier does not
                # apply to the pre-scale tensor — stop, keep float (same
                # reasoning as the chain analysis above)
                t = target_of(c)
                if t is not None:
                    wanted.add(t)
        targets[i] = min(wanted) if wanted else None
        return targets[i]

    for i in range(spec.n - 1, -1, -1):
        target_of(i)
    return targets


def resolve_residual_dtype(turbo):
    """Map the ``-turbo`` family flag to ``build_forward``'s residual_dtype:
    False -> None, True/"bf16" -> jnp.bfloat16, "int8" -> "int8"."""
    if not turbo:
        return None
    if turbo is True or turbo == "bf16":
        return jnp.bfloat16
    if turbo == "int8":
        return "int8"
    raise ValueError(f"unknown turbo mode {turbo!r} "
                     "(expected False, True, 'bf16', or 'int8')")


_FUSED_VMEM_BUDGET = 12 << 20   # leave ~4MB of the ~16MB core for temporaries


def _fused_stage_runs(spec: ModelSpec, int8_set: set) -> dict:
    """Trace-time pattern match for ``int8_impl="fused"``: maximal runs of
    darknet53 residual blocks

        conv1x1(leaky, int8) -> conv3x3(leaky, int8) -> shortcut(linear, from=-3)

    whose INTERIOR outputs feed nothing outside the run (so the fused Pallas
    kernel may keep the whole trunk VMEM-resident — ops/pallas_fused.py).
    Returns {start_conv_index: [(i_conv1, i_conv2, i_shortcut), ...]}; runs are
    split so per-run weights + trunk + t1q stay under a VMEM budget (a run
    whose FIXED footprint alone busts the budget is left on the XLA path).
    """
    consumers = _consumers(spec)

    def block_at(i):
        """(i, i+1, i+2) is a fusible residual block starting at conv index i."""
        if i + 2 >= spec.n:
            return None
        l1, l2, ls = spec.layers[i], spec.layers[i + 1], spec.layers[i + 2]
        if not (isinstance(l1, ConvSpec) and l1.size == 1 and l1.stride == 1
                and l1.pad == 0 and l1.activation == "leaky" and i in int8_set
                and not l1.xnor):
            return None
        if not (isinstance(l2, ConvSpec) and l2.size == 3 and l2.stride == 1
                and l2.pad == 1 and l2.activation == "leaky"
                and (i + 1) in int8_set and not l2.xnor
                and l2.n == l1.c):   # 3x3 output must match the trunk width
            return None
        if not (isinstance(ls, ShortcutSpec) and ls.from_index == i - 1
                and ls.activation == "linear"):
            return None
        # interior conv outputs must feed only the block itself
        if consumers[i] != [i + 1] or consumers[i + 1] != [i + 2]:
            return None
        return (i, i + 1, i + 2)

    runs: dict[int, list] = {}
    i = 1
    while i + 2 < spec.n:
        blk = block_at(i)
        if blk is None:
            i += 1
            continue
        run = [blk]
        # extend: previous shortcut output may feed ONLY the next block
        while True:
            e = run[-1][2]
            nxt = block_at(e + 1)
            if nxt is None or sorted(consumers[e]) != [e + 1, e + 3]:
                break
            run.append(nxt)
        # split the run under the VMEM budget (weights dominate at C>=512)
        l1 = spec.layers[run[0][0]]
        C, C2 = l1.c, l1.n
        H, W = l1.h, l1.w
        WP = (W + 2 + 31) // 32 * 32
        fixed = (H + 3) * WP * (C * 4 + C2)            # trunk f32 + t1q int8
        per_block = C * C2 + 9 * C2 * C + 4 * (C + C2)  # int8 weights + f32 biases
        kmax = (_FUSED_VMEM_BUDGET - fixed) // per_block
        if kmax >= 1:   # fixed footprint alone busting the budget -> XLA path
            for s in range(0, len(run), kmax):
                chunk = run[s: s + kmax]
                runs[chunk[0][0]] = chunk
        i = run[-1][2] + 1
    return runs


def build_forward(spec: ModelSpec, mode: str = "fp32", *, int8_policy: str = "cpu",
                  compute_dtype=jnp.float32, capture_conv_inputs: bool = False,
                  xnor_impl: str = "int8", int8_chain: bool = False,
                  int8_impl: str = "xla", residual_dtype=None,
                  layer_range=None, carry_out=None):
    """Return ``forward(params, x)`` for the given spec.

    ``x``: [B, H, W, C] float32, NHWC, values in [0,1] (darknet image convention).
    ``params``: per-layer list — fp32/bn dicts (see weights.py), plus for int8 mode the
    quantized entries from quant.quantize_params, plus for xnor layers the entries from
    xnor.binarize_params.

    Returns ``(heads, aux)`` where ``heads`` is a tuple of HeadOutput and ``aux`` is a
    dict (contains ``conv_inputs`` list when ``capture_conv_inputs``; and ``final`` =
    last layer output).

    ``residual_dtype`` (turbo mode, TPU-native extension — NOT a reference
    semantics): when set (jnp.bfloat16), inter-layer activations are
    MATERIALIZED in that dtype while all conv/epilogue math stays f32
    in-register. bench_stages.py attributes 34% of int8 yolov3 runtime to the
    bandwidth-bound early stages whose f32 residual tensors bit-exact
    semantics requires; turbo halves that traffic for a bounded precision
    change (<= 1 bf16 ulp per materialized tensor, ~2-3 decimal digits kept).
    Head inputs are upcast back to f32 so decode math is unchanged.

    ``residual_dtype="int8"`` (turbo_int8 — the rung below bf16, int8 mode
    only): residual-trunk activations are materialized as int8 (4x smaller
    than f32) at the nearest downstream int8 conv's calibrated input
    multiplier (``_trunk_targets``); every consumer dequantizes in-register,
    so shortcut adds and head math stay f32. The error model is one extra
    quantize/dequantize round trip per materialized tensor at the SAME scale
    the consumer conv would quantize at anyway — quantified at the mAP level
    by tests/test_turbo_metric.py. Reference precedent: the old fully-int8
    pipeline chains int8 activations between layers
    (src/yolov2_forward_network_quantized.c:636-801).

    ``layer_range=(start, stop)`` (pipeline parallelism, parallel/pp.py):
    execute only ``spec.layers[start:stop]``. ``x`` is then the previous
    stage's running activation and ``forward`` takes a third argument
    ``carried`` — a dict {layer_index: output} of earlier-stage outputs that
    routes/shortcuts in this range read. ``carry_out`` (set of indices) selects
    which of this range's outputs to return in ``aux["outputs"]`` for
    downstream stages. Cross-boundary int8 producer-chaining is dropped
    (consumer-side quantization is bit-identical); fused residual runs that
    straddle the boundary fall back to the XLA path.
    """
    if int8_impl not in ("xla", "pallas", "fused"):
        raise ValueError(f"unknown int8_impl {int8_impl!r} "
                         "(expected xla, pallas, or fused)")
    if xnor_impl not in ("int8", "pallas", "pallas_mxu", "auto"):
        raise ValueError(f"unknown xnor_impl {xnor_impl!r} "
                         "(expected int8, pallas, pallas_mxu, or auto)")
    if mode == "int8" and int8_policy == "cpu_old":
        return build_forward_int8_old(spec)
    int8_set = _int8_layer_set(spec, int8_policy) if mode == "int8" else set()
    int8_resid = False
    if isinstance(residual_dtype, str):
        if residual_dtype != "int8":
            raise ValueError(f"unknown residual_dtype {residual_dtype!r}")
        int8_resid = True
    elif (residual_dtype is not None
          and jnp.dtype(residual_dtype) == jnp.dtype(jnp.int8)):
        int8_resid = True
    if int8_resid:
        if mode != "int8":
            raise ValueError(
                "residual_dtype='int8' (turbo_int8) requires int8 mode: the "
                "trunk scales come from the conv input_quant_multipler values")
        residual_dtype = None   # materialization handled by the resid_q sites
    trunk = _trunk_targets(spec, int8_set) if int8_resid else {}
    chain = _int8_chain_targets(spec, int8_set) if (
        mode == "int8" and int8_chain) else {}
    # int8_impl="fused": residual stages run as one Pallas kernel with the
    # trunk VMEM-resident (ops/pallas_fused.py) — bit-exact to the XLA path.
    # The kernel implements the CPU requant semantics only, so it gates on
    # int8_policy (the gpu flavor keeps its XLA lowering).
    fused_runs: dict[int, list] = {}
    if (mode == "int8" and int8_impl == "fused" and int8_policy == "cpu"
            and not capture_conv_inputs):
        fused_runs = _fused_stage_runs(spec, int8_set)
        if jax.default_backend() == "tpu":
            # DMA lane tiling requires the trunk channel count % 128
            fused_runs = {s: r for s, r in fused_runs.items()
                          if spec.layers[s].c % 128 == 0}
    if layer_range is not None:
        lo, hi = layer_range
        fused_runs = {st: r for st, r in fused_runs.items()
                      if st >= lo and r[-1][2] < hi}
        # pipeline stages only hold params for [lo, hi): a trunk/chain target
        # in a LATER stage has params=None here, so that tensor crosses the
        # stage boundary as float instead of int8-materializing
        trunk = {i: t for i, t in trunk.items()
                 if t is not None and lo <= t < hi}
        chain = {i: t for i, t in chain.items()
                 if t is not None and lo <= t < hi}
    fused_skip = {idx for run in fused_runs.values()
                  for blk in run for idx in blk} - set(fused_runs)

    def forward(params, x, carried=None):
        outputs: dict[int, jax.Array] = ({} if carried is None
                                         else dict(carried))
        i8_outputs: dict[int, tuple] = {}   # idx -> (int8 tensor, target conv idx)
        heads: list[HeadOutput] = []
        conv_inputs: list = []
        cur = x
        cur_i8 = None                        # (tensor, target conv idx) or None

        def emit_i8(i, value):
            """Producer-side quantization for the downstream int8 conv (fuses into
            this layer's epilogue; bit-identical to consumer-side quantize)."""
            t = chain.get(i)
            if t is None:
                return None
            pair = (_quantize_i8(value, params[t]["input_quant_multipler"]), t)
            i8_outputs[i] = pair
            return pair

        def resid_q(i, value):
            """int8 residual-trunk materialization (residual_dtype="int8"):
            the f32 epilogue value is quantized at the nearest downstream
            int8 conv's input multiplier; the returned f32 view dequantizes
            IN-REGISTER at every consumer, so the only tensor XLA
            materializes between fusions is the 1-byte q.
            Returns (f32 view, (q, target) | None)."""
            t = trunk.get(i)
            if t is None:
                return value, None
            m = params[t]["input_quant_multipler"]
            q = _quantize_i8(value, m)
            return q.astype(jnp.float32) * (1.0 / m), (q, t)

        def finish_conv(i, value):
            """Common conv epilogue: int8-residual materialization +
            producer-side int8 emission. Returns (cur, cur_i8)."""
            if not int8_resid:
                return value, emit_i8(i, value)
            view, pair = resid_q(i, value)
            if pair is not None and chain.get(i) == pair[1]:
                i8_outputs[i] = pair  # q IS the consumer's quantization
                return view, pair
            return view, emit_i8(i, view)

        body = (spec.layers if layer_range is None
                else spec.layers[layer_range[0]: layer_range[1]])
        for l in body:
            i = l.index
            if i in fused_runs:
                from ..ops.pallas_fused import fused_res_stage
                run = fused_runs[i]
                blocks = []
                for (i1, i2, _ishort) in run:
                    p1, p2 = params[i1], params[i2]
                    blocks.append(dict(
                        w1=p1["weights_int8"], b1=p1["biases"],
                        m1=p1["input_quant_multipler"],
                        wm1=p1["weights_quant_multipler"],
                        w2=p2["weights_int8"], b2=p2["biases"],
                        m2=p2["input_quant_multipler"],
                        wm2=p2["weights_quant_multipler"]))
                xin = (cur.astype(jnp.float32) if residual_dtype is not None
                       else cur)
                cur = fused_res_stage(xin, blocks)
                if residual_dtype is not None:
                    cur = cur.astype(residual_dtype)
                cur_i8 = None
                if int8_resid:
                    cur, cur_i8 = resid_q(run[-1][2], cur)
                    if cur_i8 is not None:
                        i8_outputs[run[-1][2]] = cur_i8
                outputs[run[-1][2]] = cur   # interior outputs provably unused
                continue
            if i in fused_skip:
                continue
            if isinstance(l, ConvSpec):
                p = params[i]
                if capture_conv_inputs:
                    conv_inputs.append(cur)
                # dispatch precedence matches the reference: an int8-eligible
                # conv runs the INT8 path even with xnor=1 (neither quantized
                # forward has an xnor branch — yolov2_forward_network_
                # quantized.c:527-631, yolov2_forward_network_gpu.cu:143-315);
                # xnor is honored only on float-dispatched convs (layer 0 /
                # LINEAR / gpu-ineligible), caught by the generative fuzzer
                if l.xnor and i not in int8_set:
                    # per-layer engine choice: all engines are bit-identical
                    # (tests/test_pallas_xnor.py + on-chip sweep), so "auto"
                    # is purely a speed pick on the GEMM M dimension = TOTAL
                    # output pixels batch*oh*ow — the bit-packed MXU kernel
                    # wins only when M is small (latency regime); at batch the
                    # dense conv regains the lead at every geometry
                    # (ops/pallas_xnor.auto_prefers_mxu, PERF_NOTES r4 XNOR)
                    impl = xnor_impl
                    if impl == "auto":
                        from ..ops.pallas_xnor import auto_prefers_mxu
                        impl = ("pallas_mxu" if auto_prefers_mxu(
                            cur.shape[0] * l.out_h * l.out_w) else "int8")
                    if (impl in ("pallas", "pallas_mxu")
                            and l.stride == 1 and l.pad == 1
                            and "packed_weights" in p):
                        from ..ops.pallas_xnor import conv2d_xnor_pallas
                        cur = conv2d_xnor_pallas(
                            cur, p["packed_weights"], p["mean_arr"],
                            p["biases"], size=l.size, stride=l.stride,
                            pad=l.pad, c_real=l.c,
                            k_real=l.size * l.size * l.c,
                            activation=l.activation,
                            engine="mxu" if impl == "pallas_mxu"
                            else "popcount")
                    else:
                        cur = L.conv2d_xnor(
                            cur, p["sign_weights"], p["mean_arr"], p["biases"],
                            l.stride, l.pad, l.activation)
                    cur, cur_i8 = finish_conv(i, cur)
                elif i in int8_set:
                    xi8 = (cur_i8[0] if cur_i8 is not None and cur_i8[1] == i
                           else None)
                    if (int8_impl == "pallas" and int8_policy == "cpu"
                            and l.size == 3 and l.stride == 1 and l.pad == 1
                            and l.activation in ("leaky", "linear")):
                        from ..ops.pallas_int8 import conv3x3_int8_tiled
                        if xi8 is None:
                            xi8 = _quantize_i8(
                                cur, p["input_quant_multipler"])
                        cur = conv3x3_int8_tiled(
                            xi8, p["weights_int8"], p["biases"],
                            p["input_quant_multipler"],
                            p["weights_quant_multipler"],
                            activation=l.activation)
                    else:
                        cur = L.conv2d_int8(
                            cur, p["weights_int8"], p["biases"], l.stride,
                            l.pad, l.activation, p["input_quant_multipler"],
                            p["weights_quant_multipler"],
                            semantics=int8_policy, x_int8=xi8,
                            out_dtype=residual_dtype)
                    cur, cur_i8 = finish_conv(i, cur)
                else:
                    bn = None
                    if "scales" in p:
                        bn = (p["scales"], p["rolling_mean"], p["rolling_variance"])
                    cur = L.conv2d_fp32(cur, p["weights"], p["biases"], l.stride,
                                        l.pad, l.activation, bn=bn,
                                        compute_dtype=compute_dtype)
                    if residual_dtype is not None:
                        cur = cur.astype(residual_dtype)
                    cur, cur_i8 = finish_conv(i, cur)
            elif isinstance(l, MaxpoolSpec):
                # quantize commutes with max -> pool the int8 chain directly
                if cur_i8 is not None and chain.get(i) == cur_i8[1]:
                    cur_i8 = (L.maxpool(cur_i8[0], l.size, l.stride, l.pad,
                                        l.out_w, l.out_h), cur_i8[1])
                    i8_outputs[i] = cur_i8
                else:
                    cur_i8 = None
                cur = L.maxpool(cur, l.size, l.stride, l.pad, l.out_w, l.out_h)
            elif isinstance(l, RouteSpec):
                t = chain.get(i)
                srcs = [i8_outputs.get(j) for j in l.layers]
                if l.out_c == 0:
                    # degenerate flat concat (mismatched spatial dims) — float
                    # only; nothing downstream can consume an image anyway
                    srcs = [None]
                if t is not None and all(
                        s is not None and s[1] == t for s in srcs):
                    cur_i8 = (jnp.concatenate([s[0] for s in srcs], axis=-1), t)
                    i8_outputs[i] = cur_i8
                else:
                    cur_i8 = None
                cur = L.route([outputs[j] for j in l.layers])
            elif isinstance(l, ReorgSpec):
                if cur_i8 is not None and chain.get(i) == cur_i8[1]:
                    cur_i8 = (L.reorg(cur_i8[0], l.stride, l.reverse), cur_i8[1])
                    i8_outputs[i] = cur_i8
                else:
                    cur_i8 = None
                cur = L.reorg(cur, l.stride, l.reverse)
            elif isinstance(l, UpsampleSpec):
                if (cur_i8 is not None and chain.get(i) == cur_i8[1]
                        and l.scale == 1.0):
                    cur_i8 = (L.upsample(cur_i8[0], l.stride, 1.0), cur_i8[1])
                    i8_outputs[i] = cur_i8
                else:
                    cur_i8 = None
                cur = L.upsample(cur, l.stride, l.scale)
            elif isinstance(l, ShortcutSpec):
                # no producer-side int8 emit here: measured a no-op (0.421 vs
                # 0.422 ms/img) — XLA already fuses the downstream conv's
                # consumer-side quantize into the shortcut epilogue, so the
                # conv reads 1-byte activations either way (PERF_NOTES.md
                # round 3)
                cur_i8 = None
                cur = L.shortcut(cur, outputs[l.from_index], l.activation)
                if int8_resid:
                    # turbo_int8: the shortcut output IS the residual trunk —
                    # materialize it int8; the (q, target) pair doubles as
                    # the downstream conv's pre-quantized input
                    cur, cur_i8 = resid_q(i, cur)
                    if cur_i8 is not None:
                        i8_outputs[i] = cur_i8
            elif isinstance(l, YoloSpec):
                cur_i8 = None
                if residual_dtype is not None:
                    cur = cur.astype(jnp.float32)   # head math stays f32
                b, h, w, _ = cur.shape
                y = L.yolo_head(cur, l.n, l.classes)
                cur = y
                heads.append(HeadOutput(i, "yolo",
                                        y.reshape(b, h, w, l.n, 5 + l.classes)))
            elif isinstance(l, RegionSpec):
                cur_i8 = None
                if residual_dtype is not None:
                    cur = cur.astype(jnp.float32)   # head math stays f32
                tree_groups = None
                if l.softmax_tree is not None:
                    from ..tree import softmax_groups
                    tree_groups = [gs for _, gs in softmax_groups(l.softmax_tree)]
                y5 = L.region_head(cur, l.n, l.classes, l.coords, l.softmax,
                                   softmax_tree_groups=tree_groups)
                b, h, w = y5.shape[:3]
                cur = y5.reshape(b, h, w, -1)
                heads.append(HeadOutput(i, "region", y5))
            elif isinstance(l, SoftmaxSpec):
                cur_i8 = None
                if residual_dtype is not None:
                    cur = cur.astype(jnp.float32)   # head math stays f32
                sm_groups = None
                if l.softmax_tree is not None:
                    from ..tree import softmax_groups
                    sm_groups = [gs for _, gs in softmax_groups(l.softmax_tree)]
                cur = L.softmax_layer(cur.reshape(cur.shape[0], -1),
                                      l.groups, l.temperature,
                                      tree_groups=sm_groups)
            else:
                raise NotImplementedError(f"layer {type(l).__name__}")
            outputs[i] = cur
        aux = {"final": cur}
        if capture_conv_inputs:
            aux["conv_inputs"] = conv_inputs
        if carry_out is not None:
            aux["outputs"] = {j: outputs[j] for j in carry_out}
        return tuple(heads), aux

    return forward


def build_forward_int8_old(spec: ModelSpec):
    """Legacy fully-INT8 pipeline (reference: yolov2_forward_network_q_old +
    network_predict_quantized_old, src/yolov2_forward_network_quantized.c:1092-1211
    — present in the reference but unreachable from its CLI).

    int8 activations chain between layers; conv layers with LINEAR activation (and
    layer 0) run fp32; after layer 0 the int8 chain re-quantizes with the
    reference's hardcoded 3.88677 scale (src/yolov2_forward_network_quantized.c:1147).
    Only conv/maxpool/route/reorg/region layers are supported, exactly like the
    reference's dispatch (upsample/shortcut/yolo are commented out there).
    """
    def forward(params, x):
        float_outs: dict[int, jax.Array] = {}
        int8_outs: dict[int, jax.Array] = {}
        heads: list[HeadOutput] = []
        cur_f = x
        cur_i8 = jnp.clip(jnp.trunc(x * 0.0), -127, 127).astype(jnp.int8)
        for l in spec.layers:
            i = l.index
            if isinstance(l, ConvSpec):
                p = params[i]
                if i >= 1 and l.activation != "linear":
                    nxt = spec.layers[i + 1] if i + 1 < spec.n else None
                    cur_f, cur_i8 = L.conv2d_int8_old(
                        cur_i8, p["weights_int8"], p["biases_quant"],
                        p["output_multipler"], l.stride, l.pad, l.activation)
                    del nxt  # return_float computed unconditionally (both outputs)
                else:
                    bn = None
                    if "scales" in p:
                        bn = (p["scales"], p["rolling_mean"],
                              p["rolling_variance"])
                    cur_f = L.conv2d_fp32(cur_f, p["weights"], p["biases"],
                                          l.stride, l.pad, l.activation, bn=bn)
                    cur_i8 = jnp.zeros(cur_f.shape, jnp.int8)
                    if i == 0:
                        # hardcoded re-quantization of layer-0 output
                        cur_i8 = jnp.clip(jnp.trunc(cur_f * 3.88677),
                                          -127, 127).astype(jnp.int8)
            elif isinstance(l, MaxpoolSpec):
                cur_i8 = L.maxpool_int8_old(cur_i8, l.size, l.stride, l.pad,
                                            l.out_w, l.out_h)
                cur_f = jnp.zeros(cur_i8.shape, jnp.float32)
            elif isinstance(l, RouteSpec):
                cur_i8 = jnp.concatenate([int8_outs[j] for j in l.layers],
                                         axis=-1)
                cur_f = jnp.zeros(cur_i8.shape, jnp.float32)
            elif isinstance(l, ReorgSpec):
                cur_i8 = L.reorg(cur_i8, l.stride, l.reverse)
                cur_f = jnp.zeros(cur_i8.shape, jnp.float32)
            elif isinstance(l, RegionSpec):
                y5 = L.region_head(cur_f, l.n, l.classes, l.coords, l.softmax)
                b, h, w = y5.shape[:3]
                cur_f = y5.reshape(b, h, w, -1)
                heads.append(HeadOutput(i, "region", y5))
            else:
                raise NotImplementedError(
                    f"{type(l).__name__} is not supported by the reference's "
                    "old INT8 pipeline (src/yolov2_forward_network_quantized.c:"
                    "1121-1133 comments it out)")
            float_outs[i] = cur_f
            int8_outs[i] = cur_i8
        return tuple(heads), {"final": cur_f}

    return forward


def params_to_device(params: list) -> list:
    """Move a params list onto the default device as jnp arrays."""
    return jax.tree_util.tree_map(jnp.asarray, params)


class Predictor:
    """Convenience wrapper: jitted end-to-end forward for a fixed spec/mode.

    This is the TPU analog of the reference's ``network_predict_cpu``
    (src/yolov2_forward_network.c:632) family: one call, image(s) in, head maps out.
    """

    def __init__(self, spec: ModelSpec, params: list, mode: str = "fp32", *,
                 int8_policy: str = "cpu", compute_dtype=jnp.float32,
                 xnor_impl: str = "int8", int8_chain: bool = True,
                 turbo: bool = False, int8_impl: str = "xla"):
        self.spec = spec
        self.mode = mode
        self.params = params_to_device(params)
        fwd = build_forward(spec, mode, int8_policy=int8_policy,
                            compute_dtype=compute_dtype, xnor_impl=xnor_impl,
                            int8_chain=int8_chain, int8_impl=int8_impl,
                            residual_dtype=resolve_residual_dtype(turbo))
        # jit only carries arrays; head metadata (index/kind) is static and reattached
        self._head_meta = [(l.index, "yolo" if isinstance(l, YoloSpec) else "region")
                           for l in spec.layers
                           if isinstance(l, (YoloSpec, RegionSpec))]
        self._jitted = jax.jit(
            lambda p, x: tuple(h.data for h in fwd(p, x)[0]))

    def __call__(self, x) -> tuple:
        datas = self._jitted(self.params, jnp.asarray(x))
        return tuple(HeadOutput(i, k, d)
                     for (i, k), d in zip(self._head_meta, datas))

    def head_specs(self):
        return [l for l in self.spec.layers if isinstance(l, (YoloSpec, RegionSpec))]
