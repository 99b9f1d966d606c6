"""Layer-level unit tests: each JAX op vs a direct NumPy port of the reference's loop
semantics (the loops here are spec oracles transcribed from the cited reference lines,
used only as test fixtures)."""

import numpy as np
import pytest

import jax.numpy as jnp

from yolo2_light_tpu.models import layers as L


def _nchw(x_nhwc):
    return np.transpose(x_nhwc, (0, 3, 1, 2))


def _nhwc(x_nchw):
    return np.transpose(x_nchw, (0, 2, 3, 1))


# ---- reference-semantics NumPy oracles ------------------------------------


def ref_maxpool(x_nchw, size, stride, pad, out_w, out_h):
    """Oracle for src/additionally.c:1041-1133 (w_offset = -pad/2)."""
    b, c, h, w = x_nchw.shape
    off = -(pad // 2)
    out = np.full((b, c, out_h, out_w), -np.inf, np.float32)
    for i in range(out_h):
        for j in range(out_w):
            for n in range(size):
                for m in range(size):
                    ch, cw = off + i * stride + n, off + j * stride + m
                    if 0 <= ch < h and 0 <= cw < w:
                        out[:, :, i, j] = np.maximum(out[:, :, i, j],
                                                     x_nchw[:, :, ch, cw])
    return out


def ref_reorg(x_nchw, stride):
    """Oracle for src/yolov2_forward_network.c:337-376 (forward)."""
    b, c, h, w = x_nchw.shape
    s = stride
    out_c, out_h, out_w = c * s * s, h // s, w // s
    in_c = out_c // (s * s)
    out = np.zeros((b, out_c, out_h, out_w), np.float32)
    xf = x_nchw.reshape(b, -1)
    for bi in range(b):
        for k in range(out_c):
            for j in range(out_h):
                for i in range(out_w):
                    c2 = k % in_c
                    offset = k // in_c
                    w2 = i * s + offset % s
                    h2 = j * s + offset // s
                    out[bi, k, j, i] = xf[bi, w2 + w * (h2 + h * c2)]
    return out


def ref_upsample(x_nchw, stride, scale):
    b, c, h, w = x_nchw.shape
    out = np.zeros((b, c, h * stride, w * stride), np.float32)
    for j in range(h * stride):
        for i in range(w * stride):
            out[:, :, j, i] = scale * x_nchw[:, :, j // stride, i // stride]
    return out


def ref_conv(x_nchw, w_oihw, stride, pad):
    """Direct convolution (spec oracle for the GEMM conv path)."""
    b, c, h, w = x_nchw.shape
    n, _, ks, _ = w_oihw.shape
    oh = (h + 2 * pad - ks) // stride + 1
    ow = (w + 2 * pad - ks) // stride + 1
    xp = np.pad(x_nchw, ((0, 0), (0, 0), (pad, pad), (pad, pad)))
    out = np.zeros((b, n, oh, ow), np.float32)
    for oy in range(oh):
        for ox in range(ow):
            patch = xp[:, :, oy * stride: oy * stride + ks,
                       ox * stride: ox * stride + ks]
            out[:, :, oy, ox] = np.einsum("bchw,nchw->bn", patch, w_oihw)
    return out


# ---- tests -----------------------------------------------------------------


@pytest.mark.parametrize("size,stride,pad,w", [
    (2, 2, 1, 8),      # standard yolov3-tiny downsample pool
    (2, 1, 1, 13),     # stride-1 'same' pool (yolov3-tiny layer 11)
    (5, 1, 4, 13),     # SPP pools
    (9, 1, 8, 13),
    (13, 1, 12, 13),
    (3, 2, 2, 9),
])
def test_maxpool_matches_reference(size, stride, pad, w):
    rng = np.random.RandomState(0)
    x = rng.randn(2, w, w, 3).astype(np.float32)
    out_w = (w + pad - size) // stride + 1
    ours = np.asarray(L.maxpool(jnp.asarray(x), size, stride, pad, out_w, out_w))
    ref = _nhwc(ref_maxpool(_nchw(x), size, stride, pad, out_w, out_w))
    np.testing.assert_allclose(ours, ref, rtol=0, atol=0)


@pytest.mark.parametrize("stride,h,c", [(2, 8, 4), (2, 26, 64), (3, 9, 2)])
def test_reorg_matches_reference(stride, h, c):
    rng = np.random.RandomState(1)
    x = rng.randn(2, h, h, c).astype(np.float32)
    ours = np.asarray(L.reorg(jnp.asarray(x), stride))
    ref = _nhwc(ref_reorg(_nchw(x), stride))
    np.testing.assert_array_equal(ours, ref)


def test_reorg_reverse_roundtrip():
    rng = np.random.RandomState(2)
    x = rng.randn(1, 8, 8, 4).astype(np.float32)
    y = L.reorg(jnp.asarray(x), 2, reverse=False)
    back = L.reorg(y, 2, reverse=True)
    np.testing.assert_array_equal(np.asarray(back), x)


def test_upsample_matches_reference():
    rng = np.random.RandomState(3)
    x = rng.randn(2, 5, 7, 3).astype(np.float32)
    ours = np.asarray(L.upsample(jnp.asarray(x), 2, 1.0))
    ref = _nhwc(ref_upsample(_nchw(x), 2, 1.0))
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("stride,pad,ks", [(1, 1, 3), (2, 1, 3), (1, 0, 1), (2, 0, 1)])
def test_conv_fp32_matches_direct(stride, pad, ks):
    rng = np.random.RandomState(4)
    x = rng.randn(2, 9, 9, 5).astype(np.float32)
    w_oihw = rng.randn(7, 5, ks, ks).astype(np.float32)
    w_hwio = np.transpose(w_oihw, (2, 3, 1, 0))
    bias = rng.randn(7).astype(np.float32)
    ours = np.asarray(L.conv2d_fp32(jnp.asarray(x), jnp.asarray(w_hwio),
                                    jnp.asarray(bias), stride, pad, "leaky"))
    ref = ref_conv(_nchw(x), w_oihw, stride, pad) + bias[None, :, None, None]
    ref = np.where(ref > 0, ref, 0.1 * ref)
    np.testing.assert_allclose(ours, _nhwc(ref), rtol=2e-5, atol=2e-5)


def test_conv_bn_unfused_matches_fused():
    """BN-in-epilogue must equal BN folded into weights (same reference math)."""
    from yolo2_light_tpu.cfg import parse_network_cfg
    rng = np.random.RandomState(5)
    x = rng.randn(1, 8, 8, 4).astype(np.float32)
    w = rng.randn(3, 3, 4, 6).astype(np.float32)
    bias = rng.randn(6).astype(np.float32)
    scales = rng.uniform(0.5, 1.5, 6).astype(np.float32)
    mean = rng.randn(6).astype(np.float32) * 0.1
    var = rng.uniform(0.2, 2.0, 6).astype(np.float32)
    unfused = np.asarray(L.conv2d_fp32(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(bias), 1, 1, "leaky",
        bn=(jnp.asarray(scales), jnp.asarray(mean), jnp.asarray(var))))
    denom = np.sqrt(var) + 1e-6
    w_f = w * (scales / denom)[None, None, None, :]
    b_f = bias - scales * mean / denom
    fused = np.asarray(L.conv2d_fp32(
        jnp.asarray(x), jnp.asarray(w_f), jnp.asarray(b_f), 1, 1, "leaky"))
    np.testing.assert_allclose(unfused, fused, rtol=1e-4, atol=1e-5)


def test_shortcut_same_dims():
    rng = np.random.RandomState(6)
    x = rng.randn(1, 6, 6, 4).astype(np.float32)
    f = rng.randn(1, 6, 6, 4).astype(np.float32)
    ours = np.asarray(L.shortcut(jnp.asarray(x), jnp.asarray(f), "linear"))
    np.testing.assert_allclose(ours, x + f, rtol=1e-6)


def test_shortcut_strided():
    """General strided case (reference: shortcut_cpu, w1>w2)."""
    rng = np.random.RandomState(7)
    x = rng.randn(1, 3, 3, 2).astype(np.float32)      # out
    f = rng.randn(1, 6, 6, 4).astype(np.float32)      # from (larger)
    ours = np.asarray(L.shortcut(jnp.asarray(x), jnp.asarray(f), "linear"))
    ref = x.copy()
    for k in range(2):
        for j in range(3):
            for i in range(3):
                ref[0, j, i, k] += f[0, j * 2, i * 2, k]
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_yolo_head_activations():
    rng = np.random.RandomState(8)
    n, classes = 3, 4
    x = rng.randn(1, 2, 2, n * (5 + classes)).astype(np.float32)
    y = np.asarray(L.yolo_head(jnp.asarray(x), n, classes)).reshape(
        1, 2, 2, n, 5 + classes)
    xr = x.reshape(1, 2, 2, n, 5 + classes)
    sig = lambda v: 1 / (1 + np.exp(-v))
    np.testing.assert_allclose(y[..., 0:2], sig(xr[..., 0:2]), rtol=1e-5)
    np.testing.assert_allclose(y[..., 2:4], xr[..., 2:4], rtol=1e-6)
    np.testing.assert_allclose(y[..., 4:], sig(xr[..., 4:]), rtol=1e-5)


def test_region_head_softmax():
    rng = np.random.RandomState(9)
    n, classes, coords = 2, 5, 4
    x = rng.randn(1, 3, 3, n * (coords + 1 + classes)).astype(np.float32)
    y = np.asarray(L.region_head(jnp.asarray(x), n, classes, coords, True))
    xr = x.reshape(1, 3, 3, n, coords + 1 + classes)
    np.testing.assert_allclose(y[..., :coords], xr[..., :coords], rtol=1e-6)
    sig = lambda v: 1 / (1 + np.exp(-v))
    np.testing.assert_allclose(y[..., coords], sig(xr[..., coords]), rtol=1e-5)
    cls = xr[..., coords + 1:]
    e = np.exp(cls - cls.max(axis=-1, keepdims=True))
    np.testing.assert_allclose(y[..., coords + 1:], e / e.sum(-1, keepdims=True),
                               rtol=1e-5)
    np.testing.assert_allclose(y[..., coords + 1:].sum(-1), 1.0, rtol=1e-5)


def test_int8_conv_semantics():
    """INT8 path: trunc-quantize, int32 acc, trunc-div R_MULT, clamp, dequant, x/10
    leaky (reference: src/yolov2_forward_network_quantized.c:527-631)."""
    rng = np.random.RandomState(10)
    x = rng.randn(1, 6, 6, 4).astype(np.float32)
    w8 = rng.randint(-127, 128, (3, 3, 4, 8)).astype(np.int8)
    bias = rng.randn(8).astype(np.float32)
    in_mult, w_mult = 13.7, 52.0
    ours = np.asarray(L.conv2d_int8(jnp.asarray(x), jnp.asarray(w8),
                                    jnp.asarray(bias), 1, 1, "leaky",
                                    in_mult, w_mult))
    xi = np.clip(np.trunc(x * in_mult), -127, 127).astype(np.int32)
    acc = ref_conv(_nchw(xi).astype(np.float32),
                   np.transpose(w8, (3, 2, 0, 1)).astype(np.float32),
                   1, 1).astype(np.int64)
    q = np.clip(np.trunc(acc / 32).astype(np.int64), -32767, 32767)
    y = q.astype(np.float32) * (32.0 / (in_mult * w_mult)) + bias[None, :, None, None]
    y = np.where(y > 0, y, y / 10.0)
    np.testing.assert_allclose(ours, _nhwc(y), rtol=1e-5, atol=1e-5)


def test_xnor_conv_equals_popcount_math():
    """+-1 int8 conv == (2*popcount(xnor) - K) * mean formula."""
    rng = np.random.RandomState(11)
    x = rng.randn(1, 6, 6, 8).astype(np.float32)
    w = rng.randn(3, 3, 8, 4).astype(np.float32) * 0.1
    mean = np.mean(np.abs(w), axis=(0, 1, 2)).astype(np.float32)
    sw = np.where(w > 0, 1, -1).astype(np.int8)
    bias = rng.randn(4).astype(np.float32)
    ours = np.asarray(L.conv2d_xnor(jnp.asarray(x), jnp.asarray(sw),
                                    jnp.asarray(mean), jnp.asarray(bias),
                                    1, 1, "leaky"))
    # popcount formulation: bit path pads with 0-bits == -1 values
    xb = np.where(x > 0, 1.0, -1.0).astype(np.float32)
    xb = np.pad(xb, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-1.0)
    acc = ref_conv(_nchw(xb), np.transpose(sw, (3, 2, 0, 1)).astype(np.float32), 1, 0)
    y = acc * mean[None, :, None, None] + bias[None, :, None, None]
    y = np.where(y > 0, y, 0.1 * y)
    np.testing.assert_allclose(ours, _nhwc(y), rtol=1e-4, atol=1e-4)


def test_activations_against_scalar_formulas():
    x = np.linspace(-5, 5, 101).astype(np.float32)
    jx = jnp.asarray(x)
    cases = {
        "linear": x,
        "leaky": np.where(x > 0, x, 0.1 * x),
        "relu": np.maximum(x, 0),
        "logistic": 1 / (1 + np.exp(-x)),
        "relie": np.where(x > 0, x, 0.01 * x),
        "ramp": x * (x > 0) + 0.1 * x,
        "tanh": np.tanh(x),
        "hardtan": np.clip(x, -1, 1),
        "elu": np.where(x >= 0, x, np.exp(x) - 1),
    }
    for name, ref in cases.items():
        np.testing.assert_allclose(np.asarray(L.activate(jx, name)), ref,
                                   rtol=1e-5, atol=1e-6, err_msg=name)


def test_int8_conv_gpu_semantics():
    """GPU INT8x4 flavor: no R_MULT requant, 0.1 leaky
    (reference: src/yolov2_forward_network_gpu.cu:143-315)."""
    rng = np.random.RandomState(12)
    x = rng.randn(1, 6, 6, 4).astype(np.float32)
    w8 = rng.randint(-127, 128, (3, 3, 4, 8)).astype(np.int8)
    bias = rng.randn(8).astype(np.float32)
    in_mult, w_mult = 13.7, 52.0
    ours = np.asarray(L.conv2d_int8(jnp.asarray(x), jnp.asarray(w8),
                                    jnp.asarray(bias), 1, 1, "leaky",
                                    in_mult, w_mult, semantics="gpu"))
    xi = np.clip(np.trunc(x * in_mult), -127, 127).astype(np.int32)
    acc = ref_conv(_nchw(xi).astype(np.float32),
                   np.transpose(w8, (3, 2, 0, 1)).astype(np.float32), 1, 1)
    y = acc * (1.0 / (in_mult * w_mult)) + bias[None, :, None, None]
    y = np.where(y > 0, y, 0.1 * y)
    np.testing.assert_allclose(ours, _nhwc(y), rtol=1e-5, atol=1e-5)


def test_letterbox_correct_boxes():
    """letter=True coordinate correction (reference: correct_yolo_boxes,
    src/additionally.c:4287-4297)."""
    from yolo2_light_tpu.post.boxes import correct_boxes
    # image 200x100 letterboxed into 416x416: new_w=416, new_h=208
    b = np.array([[0.5, 0.5, 0.25, 0.25]], np.float32)
    out = correct_boxes(b, 200, 100, 416, 416, relative=True, letter=True)
    new_h = (100 * 416) // 200
    np.testing.assert_allclose(out[0, 0], 0.5, rtol=1e-6)
    np.testing.assert_allclose(
        out[0, 1], (0.5 - (416 - new_h) / 2 / 416) / (new_h / 416), rtol=1e-5)
    np.testing.assert_allclose(out[0, 2], 0.25, rtol=1e-6)
    np.testing.assert_allclose(out[0, 3], 0.25 * 416 / new_h, rtol=1e-5)


def test_letterbox_image_geometry():
    from yolo2_light_tpu.io.image import letterbox_image
    im = np.ones((100, 200, 3), np.float32)
    out = letterbox_image(im, 416, 416)
    assert out.shape == (416, 416, 3)
    new_h = (100 * 416) // 200
    top = (416 - new_h) // 2
    np.testing.assert_allclose(out[top + 1, 208], 1.0)
    np.testing.assert_allclose(out[top - 1, 208], 0.5)  # gray border
