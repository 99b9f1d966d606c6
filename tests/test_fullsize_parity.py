"""Full-scale shipped-cfg parity vs the reference binary (random round-tripped
weights, PNG input). Slower than the mini-cfg tests; covers the real model graphs:
yolov3-tiny (stride-1 pool, route, upsample, 2 heads), yolov2-voc (reorg + region +
softmax), full yolov3 (75 convs, 23 shortcuts, 3 heads)."""

import os

import pytest

from yolo2_light_tpu.cfg import parse_network_cfg
from yolo2_light_tpu.weights import random_params, save_weights

from .util_parity import (assert_detections_match, run_oracle_detect,
                          run_ours_detect)

BIN = "/root/reference/bin"
DATA = os.path.join(os.path.dirname(__file__), "data")
IMAGE = os.path.join(DATA, "dog160.png")


def _names(tmp_path, n):
    p = tmp_path / "n.names"
    p.write_text("\n".join(f"c{i}" for i in range(n)) + "\n")
    return str(p), [f"c{i}" for i in range(n)]


def _run_pair(oracle, cfg, seed, tmp_path, n_classes, thresh):
    spec = parse_network_cfg(cfg, batch=1)
    weights = str(tmp_path / "w.weights")
    # damp deep-net logit blowup so detection counts stay testable
    params = random_params(spec, seed=seed)
    save_weights(spec, params, weights)
    names_file, names = _names(tmp_path, n_classes)
    otext = run_oracle_detect(oracle, names_file, cfg, weights, IMAGE,
                              thresh=thresh)
    utext = run_ours_detect(names, cfg, weights, IMAGE, thresh=thresh)
    return otext, utext


def test_yolov3_tiny_fullsize(oracle, tmp_path):
    otext, utext = _run_pair(oracle, os.path.join(BIN, "yolov3-tiny.cfg"),
                             7, tmp_path, 80, thresh=0.6)
    assert_detections_match(otext, utext, px_tol=4, context="yolov3-tiny-416")


def test_yolov2_voc_fullsize(oracle, tmp_path):
    otext, utext = _run_pair(oracle, os.path.join(BIN, "yolov2-voc.cfg"),
                             8, tmp_path, 20, thresh=0.5)
    assert_detections_match(otext, utext, px_tol=4, context="yolov2-voc-416")


@pytest.mark.slow
def test_yolov3_fullsize(oracle, tmp_path):
    otext, utext = _run_pair(oracle, os.path.join(BIN, "yolov3.cfg"),
                             9, tmp_path, 80, thresh=0.6)
    assert_detections_match(otext, utext, px_tol=6, max_unmatched_frac=0.05,
                            context="yolov3-416")


@pytest.mark.slow
def test_yolov3_spp_fullsize(oracle, tmp_path):
    """SPP block: route-of-maxpools (5/9/13 stride-1) + 3 heads."""
    otext, utext = _run_pair(oracle, os.path.join(BIN, "yolov3-spp.cfg"),
                             10, tmp_path, 80, thresh=0.6)
    assert_detections_match(otext, utext, px_tol=6, max_unmatched_frac=0.05,
                            context="yolov3-spp-416")


@pytest.mark.slow
def test_yolov3_tiny_int8_fullsize(oracle, tmp_path):
    """Full-size INT8 pipeline with the shipped input_calibration scales."""
    cfg = os.path.join(BIN, "yolov3-tiny.cfg")
    spec = parse_network_cfg(cfg, batch=1)
    weights = str(tmp_path / "w.weights")
    save_weights(spec, random_params(spec, seed=12), weights)
    names_file, names = _names(tmp_path, 80)
    from .util_parity import run_oracle_detect, run_ours_detect
    otext = run_oracle_detect(oracle, names_file, cfg, weights, IMAGE,
                              thresh=0.5, quantized=True)
    utext = run_ours_detect(names, cfg, weights, IMAGE, thresh=0.5,
                            quantized=True)
    assert_detections_match(otext, utext, conf_tol=3, px_tol=5,
                            max_unmatched_frac=0.05,
                            context="yolov3-tiny-416-int8")


@pytest.mark.slow
def test_xnor_shipped_cfg_fullsize(oracle, tmp_path):
    """Shipped tiny-yolo-obj_xnor.cfg (BIT1 convs at 416) vs the reference's
    CPU bit-GEMM path."""
    cfg = os.path.join(BIN, "tiny-yolo-obj_xnor.cfg")
    spec = parse_network_cfg(cfg, batch=1)
    weights = str(tmp_path / "w.weights")
    save_weights(spec, random_params(spec, seed=14), weights)
    head = spec.layers[-1]
    names_file, names = _names(tmp_path, head.classes)
    from .util_parity import run_oracle_detect, run_ours_detect
    otext = run_oracle_detect(oracle, names_file, cfg, weights, IMAGE,
                              thresh=0.5)
    utext = run_ours_detect(names, cfg, weights, IMAGE, thresh=0.5)
    assert_detections_match(otext, utext, px_tol=5, max_unmatched_frac=0.05,
                            context="tiny-yolo-obj-xnor-416")


@pytest.mark.slow
def test_yolov3_openimages_fullsize(oracle, tmp_path):
    """yolov3-openimages: 601 classes, 608x608, same 106-layer graph with a
    wider head (completes the shipped-model-zoo oracle coverage).

    Head conv weights are damped: at this depth/width raw random weights
    saturate thousands of detections at conf=100% with exp-overflow boxes,
    and the oracle's unstable qsort then makes NMS tie-breaking chaotic —
    damping yields varied finite confidences like trained weights."""
    from yolo2_light_tpu.cfg import ConvSpec, YoloSpec

    cfg = os.path.join(BIN, "yolov3-openimages.cfg")
    spec = parse_network_cfg(cfg, batch=1)
    params = random_params(spec, seed=21)
    for l in spec.layers:
        if isinstance(l, YoloSpec):
            conv = spec.layers[l.index - 1]
            if isinstance(conv, ConvSpec):
                params[conv.index]["weights"] = \
                    params[conv.index]["weights"] * 0.05
    weights = str(tmp_path / "w.weights")
    save_weights(spec, params, weights)
    names_file, names = _names(tmp_path, 601)
    otext = run_oracle_detect(oracle, names_file, cfg, weights, IMAGE,
                              thresh=0.3)
    utext = run_ours_detect(names, cfg, weights, IMAGE, thresh=0.3)
    assert_detections_match(otext, utext, px_tol=4,
                            context="yolov3-openimages-608")
