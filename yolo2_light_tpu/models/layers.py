"""Pure-functional TPU-native layer ops (NHWC), matching darknet layer semantics.

Every function here is a pure JAX function traced into one XLA program by the network
builder. Layout is NHWC (TPU-preferred); the darknet reference is NCHW — parity is at the
level of values, with layout conversion at the framework boundary.

Reference semantics (AlexeyAB/yolo2_light, cited per function):

* activations: ``src/additionally.h:66-165``
* conv forward (conv+BN+bias+act "4 layers in 1"): ``src/yolov2_forward_network.c:30-263``
* maxpool (inference path, ``-pad/2`` window offset): ``src/additionally.c:1041-1133``
* route: ``src/yolov2_forward_network.c:318-334``
* reorg: ``src/yolov2_forward_network.c:337-376``
* upsample: ``src/yolov2_forward_network.c:380-408``
* shortcut: ``src/yolov2_forward_network.c:410-450``
* yolo head: ``src/yolov2_forward_network.c:453-473``
* region head: ``src/yolov2_forward_network.c:511-576``
* INT8 conv: ``src/yolov2_forward_network_quantized.c:527-631``
* XNOR binarization: ``src/additionally.c:111-136``
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax import lax

# ---------------------------------------------------------------------------
# Activations (reference: src/additionally.h:66-165)
# ---------------------------------------------------------------------------


def _stair(x):
    n = jnp.floor(x)
    even = jnp.mod(n, 2) == 0
    return jnp.where(even, jnp.floor(x / 2.0), (x - n) + jnp.floor(x / 2.0))


_SELU_ALPHA = 1.6732632423543772848170429916717
_SELU_SCALE = 1.0507009873554804934193349852946

ACTIVATION_FNS = {
    "linear": lambda x: x,
    "logistic": lambda x: 1.0 / (1.0 + jnp.exp(-x)),
    "loggy": lambda x: 2.0 / (1.0 + jnp.exp(-x)) - 1.0,
    "relu": lambda x: x * (x > 0),
    "elu": lambda x: jnp.where(x >= 0, x, jnp.exp(x) - 1.0),
    "selu": lambda x: jnp.where(x >= 0, _SELU_SCALE * x,
                                _SELU_SCALE * _SELU_ALPHA * (jnp.exp(x) - 1.0)),
    "relie": lambda x: jnp.where(x > 0, x, 0.01 * x),
    "ramp": lambda x: x * (x > 0) + 0.1 * x,
    "leaky": lambda x: jnp.where(x > 0, x, 0.1 * x),
    "tanh": lambda x: (jnp.exp(2 * x) - 1.0) / (jnp.exp(2 * x) + 1.0),
    "plse": lambda x: jnp.where(
        x < -4, 0.01 * (x + 4),
        jnp.where(x > 4, 0.01 * (x - 4) + 1.0, 0.125 * x + 0.5)),
    "stair": _stair,
    "hardtan": lambda x: jnp.clip(x, -1.0, 1.0),
    "lhtan": lambda x: jnp.where(
        x < 0, 0.001 * x, jnp.where(x > 1, 0.001 * (x - 1) + 1.0, x)),
}


def activate(x: jax.Array, name: str) -> jax.Array:
    return ACTIVATION_FNS[name](x)


# ---------------------------------------------------------------------------
# Convolution (+ BN + bias + activation epilogue)
# ---------------------------------------------------------------------------

_DIMNUMS = ("NHWC", "HWIO", "NHWC")


def _trunc_div_pow2(acc, d: int):
    """C-style truncate-toward-zero division of int32 by a power of two, as
    adds+shifts: ``(acc + (acc<0 ? d-1 : 0)) >> log2(d)``.

    Bit-identical to ``where(acc>=0, acc//d, -((-acc)//d))`` but ~1.4x faster
    end-to-end on TPU: the three-consumer where/negate/div graph defeats XLA's
    epilogue fusion, the two-op shift form fuses into the conv output
    (measured: yolov3-416 int8 0.677 -> 0.492 ms/img, PERF_NOTES.md)."""
    assert d > 0 and (d & (d - 1)) == 0, d
    shift = d.bit_length() - 1
    return (acc + ((acc >> 31) & (d - 1))) >> shift


def conv2d_fp32(x, weights, biases, stride: int, pad: int, activation: str,
                bn=None, compute_dtype=jnp.float32):
    """Dense conv + optional (unfused) BN + bias + activation.

    BN math (reference: src/yolov2_forward_network.c:222-239):
      y = (conv - rolling_mean) / (sqrt(rolling_variance) + 1e-6) * scales + bias
    with epsilon added OUTSIDE the sqrt.

    ``compute_dtype=float32`` runs the MXU at full fp32 precision (Precision.HIGHEST;
    XLA's DEFAULT would silently drop to bf16 passes — wrong for darknet parity).
    ``compute_dtype=bfloat16`` is the fast MXU path (accumulate f32).
    ``compute_dtype=float64`` (x64 mode, CPU) accumulates f64 — the fuzz
    noise-confirmation oracle (tests/fuzz_cfgs.py), not a serving mode.
    """
    xc = x.astype(compute_dtype)
    wc = weights.astype(compute_dtype)
    precision = (lax.Precision.DEFAULT if compute_dtype == jnp.bfloat16
                 else lax.Precision.HIGHEST)
    acc_dtype = (jnp.float64 if compute_dtype == jnp.float64
                 else jnp.float32)
    y = lax.conv_general_dilated(
        xc, wc, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=_DIMNUMS, preferred_element_type=acc_dtype,
        precision=precision)
    if bn is not None:
        scales, rolling_mean, rolling_variance = bn
        denom = jnp.sqrt(rolling_variance) + 1e-6
        y = (y - rolling_mean) / denom * scales
    y = y + biases
    return activate(y, activation)


def conv2d_int8(x, weights_int8, biases, stride: int, pad: int, activation: str,
                input_mult: float, weights_mult: float, r_mult: int = 32,
                semantics: str = "cpu", x_int8=None, out_dtype=None):
    """INT8 conv path, in either of the reference's two flavors.

    ``semantics="cpu"`` (reference: forward_convolutional_layer_q,
    src/yolov2_forward_network_quantized.c:527-631):

      1. quantize input: int8 = clamp(trunc(x * input_mult), +-127)
         (C float->int16 cast truncates toward zero, then max_abs clamp)
      2. int8 conv, int32 accumulation over the full K
      3. requantize: q = clamp(trunc_div(acc, R_MULT), +-32767)   (int16 store)
      4. dequant: y = q * ALPHA1, ALPHA1 = R_MULT / (input_mult * weights_mult)
      5. y += float bias
      6. LEAKY is x>0 ? x : x/10 on this path (NOT 0.1*x)

    ``semantics="gpu"`` (reference: forward_convolutional_layer_gpu_cudnn_quantized,
    src/yolov2_forward_network_gpu.cu:143-315 — the cuDNN INT8x4 path behind the
    53.60% mAP headline): same input quantization, then
    y = leaky_0.1( acc_int32 * (1/(input_mult*weights_mult)) + bias ) — no R_MULT
    requant/clamp, standard 0.1 leaky (src/gpu.cu:465).
    """
    if x_int8 is not None:
        xi = x_int8   # pre-quantized by the producer (int8 chaining; identical math)
    else:
        xi = jnp.trunc(x * input_mult)
        xi = jnp.clip(xi, -127, 127).astype(jnp.int8)
    acc = lax.conv_general_dilated(
        xi, weights_int8, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=_DIMNUMS, preferred_element_type=jnp.int32)
    if semantics == "gpu":
        y = acc.astype(jnp.float32) * (1.0 / (input_mult * weights_mult)) + biases
        y = activate(y, activation)
        return y if out_dtype is None else y.astype(out_dtype)
    # C integer division truncates toward zero; R_MULT is a power of two
    q = _trunc_div_pow2(acc, r_mult)
    q = jnp.clip(q, -(256 * 128 - 1), 256 * 128 - 1)
    alpha1 = r_mult / (input_mult * weights_mult)
    y = q.astype(jnp.float32) * alpha1 + biases
    if activation == "leaky":
        y = jnp.where(y > 0, y, y / 10.0)
    elif activation != "linear":
        y = activate(y, activation)
    # out_dtype (turbo mode): the epilogue math stays f32 in-register; only the
    # MATERIALIZED tensor narrows (halves the HBM traffic the residual trunk
    # is bound by — PERF_NOTES.md round 3). None = exact f32 storage.
    return y if out_dtype is None else y.astype(out_dtype)


def conv2d_xnor(x, sign_weights_int8, mean_arr, biases, stride: int, pad: int,
                activation: str):
    """XNOR (BIT1) conv as a +-1 int8 MXU matmul — mathematically identical to the
    reference's popcount GEMM ``(2*popcount(xnor) - K) * mean``
    (reference: src/additionally.c:1185-1242, src/gpu.cu:1566-1741).

    Input binarized to +-1 by (x > 0) (reference: binarize_cpu,
    src/additionally.c:128-135); weights pre-binarized to sign(+-1) with the
    per-filter mean |w| factored out into ``mean_arr``
    (reference: binarize_weights, src/additionally.c:113-126 represents them
    as +-mean directly; we factor the scalar out of the matmul).

    Padding parity: the reference's bit path (taken when stride==1 and pad==1) writes
    0-bits for spatial padding, which decode to -1 after the (2*cnt - K) transform —
    see im2col_cpu_custom_bin (src/additionally.c:883-1002) and the exact-K tail
    correction in gemm_nn_custom_bin_mean_transposed (src/additionally.c:1504-1534).
    For any other stride/pad the reference falls back to the binarized FLOAT conv
    whose im2col pads with 0.0 (contributing zero). We replicate both cases.
    """
    xb = jnp.where(x > 0, jnp.int8(1), jnp.int8(-1))
    if stride == 1 and pad == 1:
        # bit path: padding counts as -1
        xb = jnp.pad(xb, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                     constant_values=-1)
        padding = [(0, 0), (0, 0)]
    else:
        padding = [(pad, pad), (pad, pad)]
    acc = lax.conv_general_dilated(
        xb, sign_weights_int8, (stride, stride), padding,
        dimension_numbers=_DIMNUMS, preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * mean_arr + biases
    return activate(y, activation)


def conv2d_int8_old(x_int8, weights_int8, biases_quant, output_multipler,
                    stride: int, pad: int, activation: str,
                    r_mult: int = 32):
    """Legacy fully-INT8 conv (reference: forward_convolutional_layer_q_old,
    src/yolov2_forward_network_quantized.c:636-801 — kept in the reference but
    unreachable from its CLI; reproduced for capability parity).

    int8 in -> int8/float out, all-integer chaining:
      q1 = clamp(trunc_div(acc_int32, R_MULT), +-32767)
      q2 = trunc(q1 * output_multipler)            (int16 store)
      q3 = trunc(q2 + biases_quant)                (quantized float bias)
      q4 = leaky: q3>0 ? q3 : trunc_div(q3, 10)
      returns (float_out = q4/16, int8_out = clamp(q4, +-127))
    """
    acc = lax.conv_general_dilated(
        x_int8, weights_int8, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=_DIMNUMS, preferred_element_type=jnp.int32)
    q = _trunc_div_pow2(acc, r_mult)
    q = jnp.clip(q, -(256 * 128 - 1), 256 * 128 - 1).astype(jnp.float32)
    q = jnp.trunc(q * output_multipler)
    q = jnp.trunc(q + biases_quant)
    if activation == "leaky":
        q = jnp.where(q > 0, q, jnp.trunc(q / 10.0))
    elif activation != "linear":
        raise NotImplementedError(activation)
    float_out = q / 16.0
    int8_out = jnp.clip(q, -127, 127).astype(jnp.int8)
    return float_out, int8_out


def maxpool_int8_old(x_int8, size: int, stride: int, pad: int,
                     out_w: int, out_h: int):
    """Legacy int8 maxpool (reference: forward_maxpool_layer_q,
    src/yolov2_forward_network_quantized.c:806-849): window origin at ``-pad``
    (NOT -pad/2 like the fp32 path), out-of-bounds values are MIN_INT8."""
    h, w = x_int8.shape[1], x_int8.shape[2]
    lo = pad
    hi_h = max(0, (out_h - 1) * stride + size - lo - h)
    hi_w = max(0, (out_w - 1) * stride + size - lo - w)
    y = lax.reduce_window(
        x_int8.astype(jnp.int32), -128, lax.max,
        window_dimensions=(1, size, size, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (lo, hi_h), (lo, hi_w), (0, 0)))
    return y[:, :out_h, :out_w, :].astype(jnp.int8)


# ---------------------------------------------------------------------------
# Maxpool
# ---------------------------------------------------------------------------


def maxpool(x, size: int, stride: int, pad: int, out_w: int, out_h: int):
    """Darknet maxpool: out = (in + pad - size)//stride + 1, window origin at
    ``-pad//2`` (reference: forward_maxpool_layer_avx, src/additionally.c:1041-1133:
    ``w_offset = -pad/2``). Padding is asymmetric: ``pad//2`` at the start and whatever
    the output extent needs at the end; out-of-bounds positions contribute -FLT_MAX.
    """
    h, w = x.shape[1], x.shape[2]
    lo = pad // 2
    hi_h = max(0, (out_h - 1) * stride + size - lo - h)
    hi_w = max(0, (out_w - 1) * stride + size - lo - w)
    if jnp.issubdtype(x.dtype, jnp.integer):
        # int8-chained pooling: OOB positions take iinfo.min, never beating a
        # real (>= -127) value — exact commute with the float path's -inf
        init = x.dtype.type(jnp.iinfo(x.dtype).min)
    else:
        init = -jnp.inf
    return lax.reduce_window(
        x, init, lax.max,
        window_dimensions=(1, size, size, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (lo, hi_h), (lo, hi_w), (0, 0)))


# ---------------------------------------------------------------------------
# Structural layers
# ---------------------------------------------------------------------------


def route(outputs: list) -> jax.Array:
    """Channel concat (reference memcpy-concat: src/yolov2_forward_network.c:318-334).

    When sources share spatial dims this is an NHWC channel concat. When they
    don't, the reference still memcpy-concats the raw CHW buffers into one flat
    vector (out dims zeroed at parse, src/additionally.c:2461-2466); we
    reproduce that as a [B, sum(sizes)] flat concat in darknet CHW order. No
    shipped model hits the flat case, but cfgs may."""
    shapes = {(o.shape[1], o.shape[2]) for o in outputs}
    if len(shapes) != 1:
        return jnp.concatenate(
            [jnp.transpose(o, (0, 3, 1, 2)).reshape(o.shape[0], -1)
             for o in outputs], axis=1)
    return jnp.concatenate(outputs, axis=-1)


def reorg(x, stride: int, reverse: bool = False):
    """Darknet reorg (reference: forward_reorg_layer_cpu,
    src/yolov2_forward_network.c:337-376).

    Forward (non-reverse), NCHW semantics:
      out[b, off*C + c, j, i] = x[b, c, j*s + off//s, i*s + off%s],  off in [0, s*s)
    i.e. each s x s spatial block is distributed across s*s channel groups, offset-major.
    NHWC equivalent below; validated element-wise against the reference loop in tests.
    """
    b, h, w, c = x.shape
    s = stride
    if not reverse:
        # [B,H,W,C] -> [B, H/s, s(oy), W/s, s(ox), C] -> [B, H/s, W/s, oy, ox, C]
        y = x.reshape(b, h // s, s, w // s, s, c)
        y = y.transpose(0, 1, 3, 2, 4, 5)
        return y.reshape(b, h // s, w // s, s * s * c)
    else:
        # exact inverse
        y = x.reshape(b, h, w, s, s, c // (s * s))
        y = y.transpose(0, 1, 3, 2, 4, 5)
        return y.reshape(b, h * s, w * s, c // (s * s))


def upsample(x, stride: int, scale: float = 1.0):
    """Nearest-neighbor upsample x stride, scaled (reference: upsample_cpu,
    src/yolov2_forward_network.c:380-396)."""
    y = jnp.repeat(jnp.repeat(x, stride, axis=1), stride, axis=2)
    if scale != 1.0:
        y = y * scale
    return y


def shortcut(x, from_out, activation: str):
    """Residual add (reference: shortcut_cpu + forward_shortcut_layer_cpu,
    src/yolov2_forward_network.c:410-450). Handles the general strided/sampled case;
    every shipped model uses the same-dims fast path."""
    if x.shape == from_out.shape:
        y = x + from_out
    else:
        b, h2, w2, c2 = x.shape
        _, h1, w1, c1 = from_out.shape
        stride = max(1, w1 // w2)
        sample = max(1, w2 // w1)
        minw, minh, minc = min(w1, w2), min(h1, h2), min(c1, c2)
        add = from_out[:, : minh * stride: stride, : minw * stride: stride, :minc]
        y = x.at[:, : minh * sample: sample, : minw * sample: sample, :minc].add(add)
    return activate(y, activation)


# ---------------------------------------------------------------------------
# Detection heads
# ---------------------------------------------------------------------------


def yolo_head(x, n: int, classes: int):
    """YOLOv3 head: logistic on x,y and obj+classes; w,h raw
    (reference: forward_yolo_layer_cpu, src/yolov2_forward_network.c:453-473).

    Input [B,H,W,n*(5+classes)] -> output same shape/layout with activations applied.
    The channel layout (anchor-major, entry within) matches darknet's ``entry_index``
    (src/additionally.c:4200-4205) once NHWC<->NCHW is accounted for.
    """
    b, h, w, _ = x.shape
    y = x.reshape(b, h, w, n, 5 + classes)
    sig = jax.nn.sigmoid
    y = jnp.concatenate(
        [sig(y[..., 0:2]), y[..., 2:4], sig(y[..., 4:])], axis=-1)
    return y.reshape(b, h, w, n * (5 + classes))


def region_head(x, n: int, classes: int, coords: int, do_softmax: bool,
                softmax_tree_groups=None):
    """YOLOv2 region head: logistic on t0; softmax over classes
    (reference: forward_region_layer_cpu, src/yolov2_forward_network.c:511-576).
    x,y remain raw here — their logistic is applied at box-decode time
    (reference: get_region_box_cpu, src/yolov2_forward_network.c:653-661).

    Returns [B,H,W,n,(coords+1+classes)] — cell-major like the reference's
    flattened layout.
    """
    b, h, w, _ = x.shape
    y = x.reshape(b, h, w, n, coords + 1 + classes)
    t0 = jax.nn.sigmoid(y[..., coords:coords + 1])
    cls = y[..., coords + 1:]
    if softmax_tree_groups:
        parts = []
        start = 0
        for gs in softmax_tree_groups:
            parts.append(jax.nn.softmax(cls[..., start:start + gs], axis=-1))
            start += gs
        cls = jnp.concatenate(parts, axis=-1)
    elif do_softmax:
        cls = jax.nn.softmax(cls, axis=-1)
    return jnp.concatenate([y[..., :coords], t0, cls], axis=-1)


def softmax_layer(x, groups: int, temperature: float, tree_groups=None):
    """[softmax] layer. The reference never dispatches its forward (the
    constructor comments it out, src/additionally.c:2313) — ours executes it:
    softmax_cpu semantics (src/yolov2_forward_network.c:476-491), or the grouped
    softmax_tree variant (:494-505) when the cfg supplies ``tree=``."""
    b = x.shape[0]
    if tree_groups:
        flat = x.reshape(b, -1)
        parts, start = [], 0
        for gs in tree_groups:
            parts.append(jax.nn.softmax(flat[:, start:start + gs] / temperature,
                                        axis=-1))
            start += gs
        return jnp.concatenate(parts, axis=-1)
    y = x.reshape(b, groups, -1)
    y = jax.nn.softmax(y / temperature, axis=-1)
    return y.reshape(b, -1)
