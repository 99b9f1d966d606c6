"""Calibration parity: entropy-calibration multipliers written to
input_calibration.txt must match the reference binary's on the same net/images."""

import os
import re
import subprocess

import numpy as np
import pytest

from yolo2_light_tpu.cfg import parse_network_cfg
from yolo2_light_tpu.weights import random_params, save_weights

DATA = os.path.join(os.path.dirname(__file__), "data")


@pytest.fixture(scope="module")
def calib_dataset(tmp_path_factory):
    from PIL import Image
    root = tmp_path_factory.mktemp("calibds")
    rng = np.random.RandomState(5)
    paths = []
    for i in range(4):
        arr = (rng.rand(80, 100, 3) * 255).astype(np.uint8)
        p = root / f"im{i}.png"
        Image.fromarray(arr).save(p)
        paths.append(str(p))
    valid = root / "valid.txt"
    valid.write_text("\n".join(paths) + "\n")
    names = root / "mini.names"
    names.write_text("aaa\nbbb\nccc\n")
    data = root / "mini.data"
    data.write_text(f"classes=3\nvalid={valid}\nnames={names}\n")
    return str(data)


def test_calibrate_parity(oracle, calib_dataset, tmp_path):
    cfg = os.path.join(DATA, "mini-calib.cfg")
    spec = parse_network_cfg(cfg, batch=1)
    weights = str(tmp_path / "w.weights")
    save_weights(spec, random_params(spec, seed=21), weights)

    # oracle writes input_calibration.txt into its cwd; needs max_num+1 images to
    # trigger the save (counter > max_num)
    res = subprocess.run(
        [oracle, "detector", "calibrate", calib_dataset, cfg, weights,
         "-input_calibration", "2"],
        capture_output=True, text=True, timeout=600,
        cwd=str(tmp_path), stdin=subprocess.DEVNULL)
    calfile = tmp_path / "input_calibration.txt"
    assert calfile.exists(), (res.stdout[-800:], res.stderr[-800:])
    oracle_line = calfile.read_text()

    from yolo2_light_tpu.apps.calibrate import validate_calibrate
    ours = validate_calibrate(calib_dataset, cfg, weights, input_calibration=2,
                              out_path=str(tmp_path / "ours_calibration.txt"))

    ovals = [float(v) for v in re.findall(r"([\d.eE+-]+),", oracle_line)]
    assert len(ovals) == len(ours)
    for o, u in zip(ovals, ours):
        assert abs(o - u) <= 0.02 * max(abs(o), 1e-6) + 1e-4, (ovals, ours)

    # the bit-exact host sweep must also match
    ours_host = validate_calibrate(
        calib_dataset, cfg, weights, input_calibration=2,
        out_path=str(tmp_path / "ours_host_calibration.txt"), method="host")
    for o, u in zip(ovals, ours_host):
        assert abs(o - u) <= 0.02 * max(abs(o), 1e-6) + 1e-4, (ovals, ours_host)


def test_entropy_calibration_device_matches_host():
    """Device KL sweep (f32, vmapped) vs host f64 sweep on assorted activation
    distributions: same or one-bin-adjacent threshold."""
    import jax.numpy as jnp

    from yolo2_light_tpu.quant import (activation_histogram,
                                       entropy_calibration,
                                       entropy_calibration_multipliers)
    rng = np.random.RandomState(0)
    cases = [
        rng.randn(40000).astype(np.float32) * 12.0,
        np.abs(rng.randn(40000)).astype(np.float32) * 40.0 + 8.0,
        rng.exponential(25.0, 40000).astype(np.float32),
        rng.rand(40000).astype(np.float32) * 250.0,
    ]
    hists = jnp.stack([activation_histogram(jnp.asarray(c)) for c in cases])
    dev = np.asarray(entropy_calibration_multipliers(hists))
    for c, d in zip(cases, dev):
        host = entropy_calibration(c, 1.0 / 16, 4096)
        # multiplier = 127/((idx+.5)/16); one-bin slack ~= 1/(2*idx) relative
        assert abs(d - host) <= 0.02 * host, (float(d), host)


def test_calibrate_host_file_byte_parity(oracle, calib_dataset, tmp_path):
    """-calib_method host is the bit-exact oracle mode: the written
    input_calibration.txt must match the reference's BYTE-FOR-BYTE
    (same %g-formatted multipliers, same ', 16' tail —
    src/yolov2_forward_network.c:754-771)."""
    cfg = os.path.join(DATA, "mini-calib.cfg")
    spec = parse_network_cfg(cfg, batch=1)
    weights = str(tmp_path / "w.weights")
    save_weights(spec, random_params(spec, seed=21), weights)

    res = subprocess.run(
        [oracle, "detector", "calibrate", calib_dataset, cfg, weights,
         "-input_calibration", "2"],
        capture_output=True, text=True, timeout=600,
        cwd=str(tmp_path), stdin=subprocess.DEVNULL)
    calfile = tmp_path / "input_calibration.txt"
    assert calfile.exists(), (res.stdout[-800:], res.stderr[-800:])

    from yolo2_light_tpu.apps.calibrate import validate_calibrate
    ours_path = tmp_path / "ours_calibration.txt"
    validate_calibrate(calib_dataset, cfg, weights, input_calibration=2,
                       out_path=str(ours_path), method="host")
    assert ours_path.read_text() == calfile.read_text()


def test_calibrate_host_streams_identical(oracle, calib_dataset, tmp_path):
    """-calib_method host: the calibrate CLI's stdout AND stderr byte-match
    the oracle — per-layer ' mult = ' lines from inside entropy_calibration
    (quantized.c:1387), ' multiplier = '/' res_mult = ' accumulator lines
    (yolov2_forward_network.c:788,797), the save banner and the final
    'input_calibration = ... 16 \\n ---------------------------' tail
    (:754-771), and the stderr loader progress numbers."""
    import subprocess
    import sys as _sys

    cfg = os.path.join(DATA, "mini-calib.cfg")
    spec = parse_network_cfg(cfg, batch=1)
    weights = str(tmp_path / "w.weights")
    save_weights(spec, random_params(spec, seed=21), weights)

    args = ["detector", "calibrate", calib_dataset, cfg, weights,
            "-input_calibration", "2"]
    res_o = subprocess.run([oracle] + args, capture_output=True, text=True,
                           timeout=600, cwd=str(tmp_path),
                           stdin=subprocess.DEVNULL)
    assert res_o.returncode == 0, res_o.stderr[-800:]
    ours_dir = tmp_path / "ours"
    ours_dir.mkdir()
    env = dict(os.environ, YOLO2_TPU_PLATFORM="cpu",
               PYTHONPATH=os.path.dirname(os.path.dirname(
                   os.path.abspath(__file__))))
    res_u = subprocess.run(
        [_sys.executable, "-m", "yolo2_light_tpu"] + args
        + ["-calib_method", "host"],
        capture_output=True, text=True, timeout=600, cwd=str(ours_dir),
        env=env, stdin=subprocess.DEVNULL)
    assert res_u.returncode == 0, res_u.stderr[-800:]
    assert res_u.stdout == res_o.stdout
    from .util_parity import assert_streams_match
    assert_streams_match(res_u.stderr, res_o.stderr,
                         context="calibrate stderr")
