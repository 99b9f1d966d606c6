"""Metric-level (mAP) error bar for ``-turbo`` (round-3 review item 5).

``-turbo`` materializes inter-conv activations in bf16 (math stays f32);
the per-tensor bound is <=1 bf16 ulp (models/network.py, tests/
test_int8_chain.py). This test rolls the bound up to the DETECTION METRIC
level on the most hostile workload available without real weights:
random-weight networks produce hundreds of dense, barely-above-threshold
boxes per image, so any numeric perturbation is maximally amplified into
threshold/NMS flips.

Methodology (self-labeled mAP): ground truth = the int8 pipeline's OWN
detections. Then mAP(int8) measures only eval-chain noise, and the drop
from any variant measures exactly how many detections that variant moved
materially (class flip, conf across threshold, or IoU < 0.5 vs itself).

Measured (8 images, 160x160 shrunk yolov3-tiny, ~235 boxes/image):
  int8 (self)  mAP 0.863   (eval-chain noise floor)
  int8+turbo   mAP 0.745   (-0.118)
  fp32         mAP 0.712   (-0.151)
i.e. even under maximal chaos amplification, turbo's metric-level
perturbation is SMALLER than the int8<->fp32 mode difference itself; on
real weights (sparse, confident detections) the expected delta is ~0 —
see tests/test_real_weights.py's turbo regime row and PERF_NOTES.md.
"""

import os

import numpy as np
import pytest

DATA = os.path.join(os.path.dirname(__file__), "data")


@pytest.mark.slow
def test_turbo_map_delta_bounded_by_mode_delta(tmp_path):
    from PIL import Image

    from yolo2_light_tpu.apps.detect import build_params
    from yolo2_light_tpu.apps.map import validate_detector_map
    from yolo2_light_tpu.cfg import parse_network_cfg
    from yolo2_light_tpu.pipeline import DetectionPipeline
    from yolo2_light_tpu.weights import random_params, save_weights

    root = tmp_path
    (root / "images").mkdir()
    (root / "labels").mkdir()
    src = open("/root/reference/bin/yolov3-tiny.cfg").read()
    src = src.replace("width=416", "width=160").replace(
        "height=416", "height=160")
    src = src.replace("classes=80", "classes=3").replace(
        "filters=255", "filters=24")
    cfgp = str(root / "tiny.cfg")
    open(cfgp, "w").write(src)
    spec = parse_network_cfg(cfgp, batch=1)
    wp = str(root / "w.weights")
    save_weights(spec, random_params(spec, seed=5), wp)

    # self-label: the int8 pipeline's own detections become ground truth
    spec_q, params_q, mode = build_params(cfgp, wp, quantized=True, echo=False)
    pipe = DetectionPipeline(spec_q, params_q, mode, thresh=0.24, nms=0.45,
                             k=4096)
    rng = np.random.RandomState(0)
    paths = []
    for i in range(6):
        arr = (rng.rand(160, 160, 3) * 255).astype(np.uint8)
        p = str(root / "images" / f"im{i}.png")
        Image.fromarray(arr).save(p)
        paths.append(p)
        dets = pipe(arr[None].astype(np.float32) / 255.0)[0]
        with open(root / "labels" / f"im{i}.txt", "w") as f:
            for b in range(dets.n):
                if dets.prob[b].max() < 0.24:
                    continue
                cid = int(dets.prob[b].argmax())
                x, y, w, h = dets.bbox[b]
                if not (0 < x < 1 and 0 < y < 1 and 0 < w < 1 and 0 < h < 1):
                    continue
                f.write(f"{cid} {x:.6f} {y:.6f} {w:.6f} {h:.6f}\n")
    (root / "valid.txt").write_text("\n".join(paths) + "\n")
    (root / "n.names").write_text("aaa\nbbb\nccc\n")
    data = str(root / "d.data")
    open(data, "w").write(f"classes=3\nvalid={root}/valid.txt\n"
                          f"names={root}/n.names\n")

    import contextlib
    import io

    def run(**kw):
        with contextlib.redirect_stdout(io.StringIO()), \
                contextlib.redirect_stderr(io.StringIO()):
            return validate_detector_map(data, cfgp, wp, thresh=0.24,
                                         batch=3, k=4096, **kw)

    r_i8 = run(quantized=True)
    r_tb = run(quantized=True, turbo=True)
    r_t8 = run(quantized=True, turbo="int8")
    r_fp = run()
    assert r_i8["mAP"] > 0.8  # eval-chain noise floor sanity
    turbo_delta = abs(r_tb["mAP"] - r_i8["mAP"])
    turbo8_delta = abs(r_t8["mAP"] - r_i8["mAP"])
    mode_delta = abs(r_fp["mAP"] - r_i8["mAP"])
    # the headline claim: turbo perturbs the metric LESS than switching
    # precision modes does, even on a chaos-amplifying workload
    assert turbo_delta < mode_delta, (turbo_delta, mode_delta)
    assert turbo_delta < 0.2, turbo_delta
    # turbo keeps the vast majority of detections in place (IoU>=0.5 + class)
    assert r_tb["tp"] / max(1, r_i8["tp"]) > 0.85
    # turbo_int8 (int8-materialized residual trunk): one extra quantize round
    # trip per trunk tensor at the consumer's own calibrated scale — coarser
    # than bf16, so the bound is looser, but it must still keep the bulk of
    # detections in place even on this chaos-amplifying workload
    assert turbo8_delta < max(0.25, 2.0 * mode_delta), (turbo8_delta,
                                                        mode_delta)
    assert r_t8["tp"] / max(1, r_i8["tp"]) > 0.7, (r_t8["tp"], r_i8["tp"])
