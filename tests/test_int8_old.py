"""Legacy fully-INT8 pipeline parity: our int8_policy="cpu_old" forward vs the
reference's (CLI-unreachable) network_predict_quantized_old, driven through a custom
C harness linked against the reference objects."""

import os
import subprocess

import numpy as np
import pytest

from yolo2_light_tpu.apps.detect import build_params
from yolo2_light_tpu.cfg import parse_network_cfg
from yolo2_light_tpu.weights import random_params, save_weights

DATA = os.path.join(os.path.dirname(__file__), "data")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ORACLE_DIR = os.path.join(REPO, ".oracle")
HARNESS = os.path.join(ORACLE_DIR, "darknet_old")


@pytest.fixture(scope="module")
def harness(oracle):
    """Build the old-pipeline harness against the oracle objects."""
    if not os.path.exists(HARNESS):
        hobj = os.path.join(ORACLE_DIR, "harness.o")
        subprocess.run(["gcc", "-O1", "-I/root/reference/src", "-c",
                        os.path.join(DATA, "old_int8_harness.c"), "-o", hobj],
                       check=True, capture_output=True)
        objs = [os.path.join(ORACLE_DIR, o) for o in
                ("additionally.o", "box.o", "yolov2_forward_network.o",
                 "yolov2_forward_network_quantized.o")]
        subprocess.run(["gcc", "-O1", hobj] + objs +
                       ["-o", HARNESS, "-lm", "-pthread"],
                       check=True, capture_output=True)
    return HARNESS


def test_int8_old_pipeline_parity(harness, tmp_path):
    cfg = os.path.join(DATA, "mini-calib.cfg")  # conv/maxpool/route/reorg/region
    spec = parse_network_cfg(cfg, batch=1)
    weights = str(tmp_path / "w.weights")
    save_weights(spec, random_params(spec, seed=41), weights)

    rng = np.random.RandomState(3)
    x_hwc = rng.rand(spec.net.h, spec.net.w, spec.net.c).astype(np.float32)
    # harness consumes darknet CHW
    inp = str(tmp_path / "in.f32")
    np.transpose(x_hwc, (2, 0, 1)).astype(np.float32).tofile(inp)

    n_out = spec.outputs
    res = subprocess.run([harness, cfg, weights, inp, str(n_out)],
                         capture_output=True, text=True, timeout=300)
    assert res.returncode == 0, res.stderr[-800:]
    ref_out = np.array([float(l.split()[1]) for l in res.stdout.splitlines()
                        if l.startswith("OUT ")], np.float32)
    assert ref_out.size == n_out

    spec2, params, _ = build_params(cfg, weights, quantized=True)
    from yolo2_light_tpu.models.network import build_forward, params_to_device
    fwd = build_forward(spec2, "int8", int8_policy="cpu_old")
    heads, aux = fwd(params_to_device(params), x_hwc[None])
    # region head output, flattened cell-major == darknet's flattened l.output
    ours = np.asarray(heads[0].data[0]).reshape(-1)
    assert ours.size == n_out
    # integer chain is exact; region softmax/logistic adds float noise
    np.testing.assert_allclose(ours, ref_out, rtol=2e-4, atol=2e-4)
