"""End-to-end parity: our TPU framework vs the compiled reference binary, same cfg +
same (randomly generated, round-tripped) weights + same PNG image.

Covers: FP32 yolo pipeline, FP32 region/reorg/shortcut pipeline, INT8 quantized
pipeline, XNOR bit pipeline.
"""

import os

import numpy as np
import pytest

from yolo2_light_tpu.cfg import parse_network_cfg
from yolo2_light_tpu.weights import random_params, save_weights

from .util_parity import (assert_detections_match, run_oracle_detect,
                          run_ours_detect)

DATA = os.path.join(os.path.dirname(__file__), "data")
IMAGE = os.path.join(DATA, "dog160.png")
ORACLE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), ".oracle")


@pytest.fixture(scope="session")
def names_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("names") / "mini.names"
    p.write_text("aaa\nbbb\nccc\n")
    return str(p)


def _gen_weights(cfg, seed, tmpdir, scale=None):
    spec = parse_network_cfg(cfg, batch=1)
    params = random_params(spec, seed=seed, scale=scale)
    path = os.path.join(tmpdir, f"w{os.path.basename(cfg)}.{seed}.weights")
    save_weights(spec, params, path)
    return path


@pytest.mark.parametrize("seed", [1, 2])
def test_fp32_yolo_pipeline(oracle, names_file, tmp_path, seed):
    cfg = os.path.join(DATA, "mini-yolo3.cfg")
    weights = _gen_weights(cfg, seed, str(tmp_path))
    otext = run_oracle_detect(oracle, names_file, cfg, weights, IMAGE)
    utext = run_ours_detect(["aaa", "bbb", "ccc"], cfg, weights, IMAGE)
    assert_detections_match(otext, utext, context=f"fp32 yolo seed={seed}")


@pytest.mark.parametrize("seed", [3])
def test_fp32_region_pipeline(oracle, names_file, tmp_path, seed):
    cfg = os.path.join(DATA, "mini-yolo2.cfg")
    weights = _gen_weights(cfg, seed, str(tmp_path))
    otext = run_oracle_detect(oracle, names_file, cfg, weights, IMAGE)
    utext = run_ours_detect(["aaa", "bbb", "ccc"], cfg, weights, IMAGE)
    assert_detections_match(otext, utext, context=f"fp32 region seed={seed}")


@pytest.mark.parametrize("seed", [4])
def test_int8_pipeline(oracle, names_file, tmp_path, seed):
    cfg = os.path.join(DATA, "mini-yolo3.cfg")
    weights = _gen_weights(cfg, seed, str(tmp_path))
    otext = run_oracle_detect(oracle, names_file, cfg, weights, IMAGE,
                              quantized=True)
    utext = run_ours_detect(["aaa", "bbb", "ccc"], cfg, weights, IMAGE,
                            quantized=True)
    assert_detections_match(otext, utext, conf_tol=3, px_tol=4,
                            context=f"int8 seed={seed}")


@pytest.mark.parametrize("seed", [5])
def test_xnor_pipeline(oracle, names_file, tmp_path, seed):
    cfg = os.path.join(DATA, "mini-xnor.cfg")
    weights = _gen_weights(cfg, seed, str(tmp_path))
    otext = run_oracle_detect(oracle, names_file, cfg, weights, IMAGE)
    utext = run_ours_detect(["aaa", "bbb", "ccc"], cfg, weights, IMAGE)
    assert_detections_match(otext, utext, context=f"xnor seed={seed}")


def test_print_rounding_matches_c_round():
    """The detection print uses C99 round() semantics: half AWAY from zero and
    sign-preserving — a left_x in (-0.5, 0) prints as '-0' under %4.0f
    (reference main.c:93; caught by a CLI diff against the oracle)."""
    import numpy as np
    from yolo2_light_tpu.post.boxes import Detections, _c_round, format_detections

    assert f"{_c_round(-0.4):4.0f}" == "  -0"
    assert f"{_c_round(0.4):4.0f}" == "   0"
    assert f"{_c_round(2.5):4.0f}" == "   3"      # half away from zero
    assert f"{_c_round(-2.5):4.0f}" == "  -3"
    assert f"{_c_round(3.5):4.0f}" == "   4"      # banker's would give 4 too
    assert f"{_c_round(0.49999999999999994):4.0f}" == "   0"  # fl(|v|+0.5)==1.0

    # end-to-end: a box whose left edge lands in (-0.5, 0) pixels
    dets = Detections(
        bbox=np.array([[0.05, 0.5, 0.102, 0.4]], np.float32),  # left = -0.001
        objectness=np.array([0.9], np.float32),
        prob=np.array([[0.9]], np.float32))
    out = format_detections(dets, ["aaa"], 0.24, 100, 100)
    assert "left_x:   -0" in out


def test_predictions_png_pixel_parity(oracle, names_file, tmp_path):
    """The saved predictions.png must match the oracle PIXEL-FOR-PIXEL:
    same boxes, same palette colors, same prob-ascending draw layering
    (compare_by_probs, main.c:73-78,107), same 255*val uint8 truncation
    (save_image_png, additionally.c:3218). PNG encoders differ (stb vs PIL)
    so the comparison decodes both."""
    import subprocess
    from PIL import Image
    from yolo2_light_tpu.apps.detect import build_predictor, detect_image
    from yolo2_light_tpu.io import image as im_io
    from yolo2_light_tpu.cfg import parse_network_cfg
    from yolo2_light_tpu.weights import random_params, save_weights

    cfg = os.path.join(DATA, "mini-yolo3.cfg")
    spec = parse_network_cfg(cfg, batch=1)
    weights = str(tmp_path / "w.weights")
    save_weights(spec, random_params(spec, seed=11), weights)
    rng = np.random.RandomState(3)
    img = str(tmp_path / "img.png")
    Image.fromarray((rng.rand(80, 100, 3) * 255).astype(np.uint8)).save(img)

    # oracle writes predictions.png into its CWD
    res = subprocess.run(
        [oracle, "detector", "test", names_file, cfg, weights, img,
         "-thresh", "0.24", "-dont_show"],
        capture_output=True, text=True, timeout=600, cwd=str(tmp_path))
    assert res.returncode == 0, res.stderr[-1500:]
    oracle_px = np.asarray(
        Image.open(tmp_path / "predictions.png").convert("RGB"))

    names = ["aaa", "bbb", "ccc"]
    spec2, pred = build_predictor(cfg, weights)
    dets, im, _ = detect_image(pred, spec2, img, 0.24, 0.4, names)
    im_io.draw_detections(im, dets, names, 0.24, 3)
    ours = str(tmp_path / "ours.png")
    im_io.save_image_png(im, ours)
    ours_px = np.asarray(Image.open(ours).convert("RGB"))

    assert oracle_px.shape == ours_px.shape
    np.testing.assert_array_equal(ours_px, oracle_px)


def test_quantized_ignores_xnor_on_int8_dispatched_convs(oracle, names_file,
                                                         tmp_path):
    """-quantized dispatch precedence: an int8-eligible conv runs the INT8
    path even with xnor=1 (neither reference quantized forward has an xnor
    branch); xnor is honored only on float-dispatched convs. Streams must
    byte-match the oracle on an xnor cfg run with -quantized."""
    import subprocess
    import sys as _sys
    from PIL import Image
    from yolo2_light_tpu.cfg import parse_network_cfg
    from yolo2_light_tpu.weights import random_params, save_weights

    cfg = os.path.join(DATA, "mini-xnor.cfg")
    spec = parse_network_cfg(cfg, batch=1)
    weights = str(tmp_path / "w.weights")
    save_weights(spec, random_params(spec, seed=9), weights)
    img = str(tmp_path / "i.png")
    rng = np.random.RandomState(2)
    Image.fromarray((rng.rand(64, 64, 3) * 255).astype(np.uint8)).save(img)

    args = ["detector", "test", names_file, cfg, weights, img,
            "-thresh", "0.3", "-dont_show", "-quantized"]
    res_o = subprocess.run([oracle] + args, capture_output=True, text=True,
                           timeout=300, cwd=os.path.dirname(oracle))
    assert res_o.returncode == 0, res_o.stderr[-800:]
    env = dict(os.environ, YOLO2_TPU_PLATFORM="cpu")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    res_u = subprocess.run([_sys.executable, "-m", "yolo2_light_tpu"] + args,
                           capture_output=True, text=True, timeout=300,
                           cwd=repo, env=env)
    assert res_u.returncode == 0, res_u.stderr[-800:]
    strip = lambda t: [l for l in t.splitlines() if "Predicted in" not in l]
    assert strip(res_u.stdout) == strip(res_o.stdout)
    from .util_parity import assert_streams_match
    assert_streams_match(res_u.stderr, res_o.stderr,
                         context="quantized-xnor stderr")
