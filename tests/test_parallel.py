"""Tensor/data-parallel sharded inference must match unsharded numerically."""

import os

import numpy as np
import pytest

import jax

from yolo2_light_tpu.cfg import parse_network_cfg
from yolo2_light_tpu.models.network import Predictor
from yolo2_light_tpu.parallel.mesh import make_mesh, make_sharded_predict
from yolo2_light_tpu.weights import fuse_conv_batchnorm, random_params

DATA = os.path.join(os.path.dirname(__file__), "data")


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_forward_matches_unsharded():
    spec = parse_network_cfg(os.path.join(DATA, "mini-yolo3.cfg"), batch=2)
    params = fuse_conv_batchnorm(spec, random_params(spec, seed=0))
    x = np.random.RandomState(0).rand(2, 64, 64, 3).astype(np.float32)

    ref = Predictor(spec, params)(x)
    mesh = make_mesh(8, data=2, model=4)
    fn, sharded = make_sharded_predict(spec, params, mesh)
    out = fn(sharded, x)
    assert len(out) == len(ref)
    for o, r in zip(out, ref):
        np.testing.assert_allclose(np.asarray(o),
                                   np.asarray(r.data).reshape(o.shape),
                                   rtol=1e-4, atol=1e-5)


def test_pipeline_k_autogrow():
    from yolo2_light_tpu.pipeline import DetectionPipeline
    spec = parse_network_cfg(os.path.join(DATA, "mini-yolo3.cfg"), batch=1)
    params = fuse_conv_batchnorm(spec, random_params(spec, seed=1))
    x = np.random.RandomState(0).rand(1, 64, 64, 3).astype(np.float32)
    # random weights -> dense detections; k=16 must saturate and auto-grow
    small = DetectionPipeline(spec, params, thresh=0.24, nms=0.4, k=16)
    big = DetectionPipeline(spec, params, thresh=0.24, nms=0.4, k=4096)
    d_small = small(x)[0]
    d_big = big(x)[0]
    # after auto-grow the small pipeline must find at least 4x its original k
    assert d_small.n > 16
    # and within one grow step of the fully-unsaturated result
    assert d_small.n == d_big.n or d_small.n >= 64
