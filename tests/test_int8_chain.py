"""int8 chaining (producer-fused quantization) must be bit-identical to the
unchained int8 forward — quantization commutes exactly with max/concat/permute."""

import os

import numpy as np
import pytest

from yolo2_light_tpu.apps.detect import build_params
from yolo2_light_tpu.models.network import build_forward, params_to_device

DATA = os.path.join(os.path.dirname(__file__), "data")
BIN = "/root/reference/bin"


@pytest.mark.parametrize("cfg,policy", [
    (os.path.join(DATA, "mini-yolo3.cfg"), "cpu"),
    (os.path.join(DATA, "mini-yolo2.cfg"), "cpu"),
    pytest.param(os.path.join(BIN, "yolov3-tiny.cfg"), "cpu",
                 marks=pytest.mark.slow),
    pytest.param(os.path.join(BIN, "yolov2-voc.cfg"), "gpu",
                 marks=pytest.mark.slow),
])
def test_chained_equals_unchained(cfg, policy):
    spec, params, _ = build_params(cfg, None, quantized=True, seed=13)
    dev = params_to_device(params)
    rng = np.random.RandomState(0)
    x = rng.rand(1, spec.net.h, spec.net.w, spec.net.c).astype(np.float32)

    plain = build_forward(spec, "int8", int8_policy=policy)
    chained = build_forward(spec, "int8", int8_policy=policy, int8_chain=True)
    h0, _ = plain(dev, x)
    h1, _ = chained(dev, x)
    assert len(h0) == len(h1)
    for a, b in zip(h0, h1):
        np.testing.assert_array_equal(np.asarray(a.data), np.asarray(b.data))


def test_turbo_residual_bf16_close_to_exact():
    """Turbo mode (residual_dtype=bf16, TPU-native extension): bounded
    precision change only — head outputs track the exact int8 path within
    bf16 materialization error, and head dtype stays f32."""
    import jax.numpy as jnp

    cfg = os.path.join(DATA, "mini-yolo3.cfg")
    spec, params, _ = build_params(cfg, None, quantized=True, seed=5)
    dev = params_to_device(params)
    rng = np.random.RandomState(2)
    x = rng.rand(2, spec.net.h, spec.net.w, spec.net.c).astype(np.float32)

    exact = build_forward(spec, "int8", int8_policy="cpu", int8_chain=True)
    turbo = build_forward(spec, "int8", int8_policy="cpu", int8_chain=True,
                          residual_dtype=jnp.bfloat16)
    h0, _ = exact(dev, x)
    h1, _ = turbo(dev, x)
    assert len(h0) == len(h1) >= 1
    for a, b in zip(h0, h1):
        assert b.data.dtype == np.float32
        av, bv = np.asarray(a.data), np.asarray(b.data)
        # post-sigmoid/exp head entries live in O(1) ranges; bf16 keeps ~2-3
        # decimal digits per materialized tensor, and a value sitting on an
        # int8 quantization-bin boundary can flip one bin (observed: <0.1% of
        # entries, <=0.08 absolute on the mini net) — same effect class as the
        # device calibrate method's one-bin deviation
        np.testing.assert_allclose(bv, av, rtol=0.1, atol=0.1)
        assert np.mean(np.abs(bv - av)) < 2e-2
