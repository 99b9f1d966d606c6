"""App-level tests: CLI dispatch, demo on a synthetic video, map/calibrate smoke."""

import os
import subprocess
import sys

import numpy as np
import pytest

DATA = os.path.join(os.path.dirname(__file__), "data")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _gen_weights(cfg, seed, tmpdir):
    from yolo2_light_tpu.cfg import parse_network_cfg
    from yolo2_light_tpu.weights import random_params, save_weights
    spec = parse_network_cfg(cfg, batch=1)
    path = os.path.join(tmpdir, "w.weights")
    save_weights(spec, random_params(spec, seed=seed), path)
    return path


def test_demo_on_synthetic_video(tmp_path):
    cv2 = pytest.importorskip("cv2")
    # 12-frame synthetic video
    vid = str(tmp_path / "in.mp4")
    wr = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"mp4v"), 10, (128, 96))
    rng = np.random.RandomState(0)
    for _ in range(12):
        wr.write((rng.rand(96, 128, 3) * 255).astype(np.uint8))
    wr.release()

    cfg = os.path.join(DATA, "mini-yolo3.cfg")
    weights = _gen_weights(cfg, 3, str(tmp_path))
    out = str(tmp_path / "out.mp4")
    from yolo2_light_tpu.apps.demo import demo
    n = demo(cfg, weights, 0.4, vid, ["aaa", "bbb", "ccc"],
             out_filename=out, dont_show=True, max_frames=10)
    assert n == 10
    assert os.path.getsize(out) > 1000
    cap = cv2.VideoCapture(out)
    assert cap.isOpened()
    frames = 0
    while cap.read()[0]:
        frames += 1
    assert frames == 10


def test_cli_usage_errors():
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    r = subprocess.run([sys.executable, "-m", "yolo2_light_tpu"],
                       capture_output=True, text=True, env=env, cwd=REPO)
    assert "usage" in r.stderr
    r = subprocess.run([sys.executable, "-m", "yolo2_light_tpu", "detector"],
                       capture_output=True, text=True, env=env, cwd=REPO)
    assert "usage" in r.stderr
    r = subprocess.run([sys.executable, "-m", "yolo2_light_tpu", "nope"],
                       capture_output=True, text=True, env=env, cwd=REPO)
    assert "Not an option" in r.stderr


def test_cli_missing_files():
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    r = subprocess.run([sys.executable, "-m", "yolo2_light_tpu", "detector",
                        "test", "/nope.names", "/nope.cfg"],
                       capture_output=True, text=True, env=env, cwd=REPO)
    assert r.returncode == 1
    assert "Couldn't open file" in r.stderr


def test_params_cache_roundtrip(tmp_path):
    from yolo2_light_tpu.cfg import parse_network_cfg
    from yolo2_light_tpu.weights import (fuse_conv_batchnorm, load_params_cache,
                                         random_params, save_params_cache)
    cfg = os.path.join(DATA, "mini-yolo3.cfg")
    spec = parse_network_cfg(cfg, batch=1)
    params = fuse_conv_batchnorm(spec, random_params(spec, seed=0))
    p = str(tmp_path / "cache.npz")
    save_params_cache(params, p)
    back = load_params_cache(p, spec.n)
    for a, b in zip(params, back):
        assert (a is None) == (b is None)
        if a is not None:
            assert set(a) == set(b)
            for k in a:
                np.testing.assert_array_equal(np.asarray(a[k]), b[k])
