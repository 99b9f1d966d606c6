"""Degenerate route flat-concat parity: sources with mismatched spatial dims are
memcpy-concatenated as raw CHW buffers by the reference (make_route_layer zeroes
out dims, src/additionally.c:2461-2466; forward_route_layer_cpu,
src/yolov2_forward_network.c:318-334). Verified against a C harness linked to the
oracle objects, since no CLI-reachable head can follow a zero-dim route."""

import os
import subprocess

import numpy as np
import pytest

from yolo2_light_tpu.cfg import parse_network_cfg
from yolo2_light_tpu.weights import (fuse_conv_batchnorm, load_weights,
                                     random_params, save_weights)

DATA = os.path.join(os.path.dirname(__file__), "data")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ORACLE_DIR = os.path.join(REPO, ".oracle")
HARNESS = os.path.join(ORACLE_DIR, "route_flat_harness")
CFG = os.path.join(DATA, "mini-routeflat.cfg")


@pytest.fixture(scope="module")
def harness(oracle):
    if not os.path.exists(HARNESS):
        hobj = os.path.join(ORACLE_DIR, "route_flat_harness.o")
        subprocess.run(["gcc", "-O1", "-I/root/reference/src", "-c",
                        os.path.join(DATA, "route_flat_harness.c"), "-o", hobj],
                       check=True, capture_output=True)
        objs = [os.path.join(ORACLE_DIR, o) for o in
                ("additionally.o", "box.o", "yolov2_forward_network.o",
                 "yolov2_forward_network_quantized.o")]
        subprocess.run(["gcc", "-O1", hobj] + objs +
                       ["-o", HARNESS, "-lm", "-pthread"],
                       check=True, capture_output=True)
    return HARNESS


def test_spec_zeroes_dims():
    spec = parse_network_cfg(CFG, batch=1)
    route = spec.layers[-1]
    assert (route.out_w, route.out_h, route.out_c) == (0, 0, 0)
    assert route.outputs == 8 * 8 * 4 + 4 * 4 * 2


def test_route_flat_concat_parity(harness, tmp_path):
    spec = parse_network_cfg(CFG, batch=1)
    weights = str(tmp_path / "w.weights")
    save_weights(spec, random_params(spec, seed=13), weights)

    rng = np.random.RandomState(5)
    x_hwc = rng.rand(spec.net.h, spec.net.w, spec.net.c).astype(np.float32)
    inp = str(tmp_path / "in.f32")
    np.transpose(x_hwc, (2, 0, 1)).astype(np.float32).tofile(inp)

    n_out = spec.layers[-1].outputs
    res = subprocess.run([harness, CFG, weights, inp, str(n_out)],
                         capture_output=True, text=True, timeout=300)
    assert res.returncode == 0, res.stderr[-800:]
    ref_out = np.array([float(l.split()[1]) for l in res.stdout.splitlines()
                        if l.startswith("OUT ")], np.float32)
    assert ref_out.size == n_out

    from yolo2_light_tpu.models.network import build_forward, params_to_device
    params = fuse_conv_batchnorm(spec, load_weights(spec, weights))
    fwd = build_forward(spec)
    _, aux = fwd(params_to_device(params), x_hwc[None])
    ours = np.asarray(aux["final"]).reshape(-1)
    assert ours.shape == ref_out.shape
    np.testing.assert_allclose(ours, ref_out, rtol=1e-4, atol=2e-5)
