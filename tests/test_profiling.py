"""Profiling utilities."""

import os

import numpy as np

from yolo2_light_tpu.cfg import parse_network_cfg
from yolo2_light_tpu.utils.profiling import layer_cost_table, profile_layers
from yolo2_light_tpu.weights import fuse_conv_batchnorm, random_params

DATA = os.path.join(os.path.dirname(__file__), "data")


def test_layer_cost_table():
    spec = parse_network_cfg("/root/reference/bin/yolov3-tiny.cfg", batch=1)
    table = layer_cost_table(spec)
    assert "total" in table and "BFLOPs" in table
    # yolov3-tiny is ~5.57 BFLOPs per the reference construction prints
    total = float(table.splitlines()[-1].split()[1])
    assert 5.0 < total < 6.0


def test_profile_layers_runs():
    spec = parse_network_cfg(os.path.join(DATA, "mini-yolo3.cfg"), batch=1)
    params = fuse_conv_batchnorm(spec, random_params(spec, seed=0))
    x = np.random.rand(1, 64, 64, 3).astype(np.float32)
    rows = profile_layers(spec, params, x, iters=1)
    assert len(rows) == spec.n
    assert all(r[3] >= 0 for r in rows)
