"""mAP harness parity: synthetic labeled dataset evaluated by both the compiled
reference binary and our map app with identical weights; printed metrics must match."""

import os
import re
import subprocess

import numpy as np
import pytest

from yolo2_light_tpu.cfg import parse_network_cfg
from yolo2_light_tpu.weights import random_params, save_weights

DATA = os.path.join(os.path.dirname(__file__), "data")


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    """6 random PNG images under images/ + random labels under labels/."""
    from PIL import Image
    root = tmp_path_factory.mktemp("mapds")
    (root / "images").mkdir()
    (root / "labels").mkdir()
    rng = np.random.RandomState(0)
    paths = []
    for i in range(6):
        arr = (rng.rand(96, 128, 3) * 255).astype(np.uint8)
        p = root / "images" / f"im{i}.png"
        Image.fromarray(arr).save(p)
        paths.append(str(p))
        # 1-3 random truth boxes
        with open(root / "labels" / f"im{i}.txt", "w") as f:
            for _ in range(rng.randint(1, 4)):
                cid = rng.randint(0, 3)
                x, y = rng.uniform(0.2, 0.8, 2)
                w, h = rng.uniform(0.1, 0.4, 2)
                f.write(f"{cid} {x:.6f} {y:.6f} {w:.6f} {h:.6f}\n")
    valid = root / "valid.txt"
    valid.write_text("\n".join(paths) + "\n")
    names = root / "mini.names"
    names.write_text("aaa\nbbb\nccc\n")
    data = root / "mini.data"
    data.write_text(f"classes=3\nvalid={valid}\nnames={names}\n")
    return {"root": root, "data": str(data), "names": str(names)}


def _parse_map_output(text: str) -> dict:
    out = {}
    m = re.search(r"detections_count = (\d+), unique_truth_count = (\d+)", text)
    out["detections_count"] = int(m.group(1))
    out["unique_truth_count"] = int(m.group(2))
    out["ap"] = [float(v) for v in re.findall(r"ap = ([\d.]+) %", text)]
    m = re.search(r"TP = (\d+), FP = (\d+), FN = (\d+), average IoU = ([\d.]+) %",
                  text)
    out["tp"], out["fp"], out["fn"] = int(m.group(1)), int(m.group(2)), int(m.group(3))
    out["avg_iou"] = float(m.group(4))
    m = re.search(r"precision = ([\d.]+), recall = ([\d.]+), F1-score = ([\d.-]+)",
                  text)
    out["precision"], out["recall"] = float(m.group(1)), float(m.group(2))
    m = re.search(r"\(mAP\) = ([\d.]+)", text)
    out["mAP"] = float(m.group(1))
    return out


def test_map_parity(oracle, dataset, tmp_path):
    cfg = os.path.join(DATA, "mini-yolo3.cfg")
    spec = parse_network_cfg(cfg, batch=1)
    weights = str(tmp_path / "w.weights")
    save_weights(spec, random_params(spec, seed=11), weights)

    res = subprocess.run(
        [oracle, "detector", "map", dataset["data"], cfg, weights,
         "-thresh", "0.24"],
        capture_output=True, text=True, timeout=600)
    assert res.returncode == 0, res.stderr[-1500:]
    oracle_metrics = _parse_map_output(res.stdout)

    from yolo2_light_tpu.apps.map import validate_detector_map
    # k >= total box count so top-K compaction is lossless for this dense
    # random-weight net (real weights are sparse; default k=1024 suffices there)
    ours = validate_detector_map(dataset["data"], cfg, weights, thresh=0.24,
                                 batch=3, k=4096)

    assert oracle_metrics["unique_truth_count"] == ours["unique_truth_count"]
    # detection records and threshold TP/FP within small tolerance (fp32 noise can
    # move borderline boxes across thresholds)
    assert abs(oracle_metrics["detections_count"] - ours["detections_count"]) <= 3
    assert abs(oracle_metrics["tp"] - ours["tp"]) <= 1
    assert abs(oracle_metrics["fp"] - ours["fp"]) <= 3
    assert abs(oracle_metrics["mAP"] - ours["mAP"]) < 0.02
    assert abs(oracle_metrics["avg_iou"] - ours["avg_iou"] * 100) < 2.0


def test_map_data_parallel_matches_single(dataset, tmp_path):
    """Sharded (8-virtual-device) evaluation must give identical metrics."""
    import jax
    if len(jax.devices()) < 8:
        import pytest
        pytest.skip("needs 8 devices")
    cfg = os.path.join(DATA, "mini-yolo3.cfg")
    spec = parse_network_cfg(cfg, batch=1)
    weights = str(tmp_path / "w.weights")
    save_weights(spec, random_params(spec, seed=11), weights)
    from yolo2_light_tpu.apps.map import validate_detector_map
    single = validate_detector_map(dataset["data"], cfg, weights, thresh=0.24,
                                   batch=3, k=4096)
    sharded = validate_detector_map(dataset["data"], cfg, weights, thresh=0.24,
                                    batch=8, k=4096, data_parallel=8)
    assert single["unique_truth_count"] == sharded["unique_truth_count"]
    assert single["tp"] == sharded["tp"]
    assert single["fp"] == sharded["fp"]
    assert abs(single["mAP"] - sharded["mAP"]) < 1e-6


def test_map_parity_with_difficult(oracle, dataset, tmp_path):
    """difficult= handling: dropped records still count as threshold FPs
    (reference: src/additionally.c:4739-4765)."""
    import shutil
    root = dataset["root"]
    # difficult list: same images; difficult labels = jittered copies of truths
    dif_img_dir = root / "images_dif"
    dif_lbl_dir = root / "labels_dif"
    dif_img_dir.mkdir(exist_ok=True)
    dif_lbl_dir.mkdir(exist_ok=True)
    rng = np.random.RandomState(7)
    dif_paths = []
    for p in (root / "images").iterdir():
        stem = p.stem
        dst = dif_img_dir / p.name
        if not dst.exists():
            shutil.copy(p, dst)
        dif_paths.append(str(dst).replace("images_dif", "images_dif"))
        lines = []
        for _ in range(2):
            cid = rng.randint(0, 3)
            x, y = rng.uniform(0.2, 0.8, 2)
            w, h = rng.uniform(0.15, 0.5, 2)
            lines.append(f"{cid} {x:.6f} {y:.6f} {w:.6f} {h:.6f}")
        # label path rewrite: images_dif -> labels_dif won't trigger on 'images'
        # substring first, so name dirs to satisfy label_path_for: use 'images'
        (dif_lbl_dir / f"{stem}.txt").write_text("\n".join(lines) + "\n")
    # label_path_for replaces first 'images'->'labels': images_dif -> labels_dif ✓
    dif_list = root / "difficult.txt"
    dif_list.write_text("\n".join(sorted(dif_paths)) + "\n")
    data = root / "mini_dif.data"
    data.write_text(f"classes=3\nvalid={root / 'valid.txt'}\n"
                    f"names={dataset['names']}\ndifficult={dif_list}\n")

    cfg = os.path.join(DATA, "mini-yolo3.cfg")
    spec = parse_network_cfg(cfg, batch=1)
    weights = str(tmp_path / "w.weights")
    save_weights(spec, random_params(spec, seed=11), weights)

    res = subprocess.run(
        [oracle, "detector", "map", str(data), cfg, weights, "-thresh", "0.24"],
        capture_output=True, text=True, timeout=600)
    assert res.returncode == 0, res.stderr[-1500:]
    om = _parse_map_output(res.stdout)
    from yolo2_light_tpu.apps.map import validate_detector_map
    ours = validate_detector_map(str(data), cfg, weights, thresh=0.24,
                                 batch=3, k=4096)
    assert abs(om["detections_count"] - ours["detections_count"]) <= 3
    assert abs(om["tp"] - ours["tp"]) <= 1
    assert abs(om["fp"] - ours["fp"]) <= 3
    assert abs(om["mAP"] - ours["mAP"]) < 0.02


def test_map_device_nms_matches_host_nms(dataset, tmp_path):
    """-device_nms: on-chip greedy NMS must give identical mAP metrics to the
    host NMS path (same suppression set by construction)."""
    cfg = os.path.join(DATA, "mini-yolo3.cfg")
    spec = parse_network_cfg(cfg, batch=1)
    weights = str(tmp_path / "w.weights")
    save_weights(spec, random_params(spec, seed=11), weights)
    from yolo2_light_tpu.apps.map import validate_detector_map
    host = validate_detector_map(dataset["data"], cfg, weights, thresh=0.24,
                                 batch=3, k=4096)
    dev = validate_detector_map(dataset["data"], cfg, weights, thresh=0.24,
                                batch=3, k=4096, device_nms=True)
    assert host["unique_truth_count"] == dev["unique_truth_count"]
    assert host["detections_count"] == dev["detections_count"]
    assert host["tp"] == dev["tp"]
    assert host["fp"] == dev["fp"]
    assert abs(host["mAP"] - dev["mAP"]) < 1e-9


def test_map_turbo_close_to_exact(dataset, tmp_path):
    """-turbo (bf16-materialized activations, TPU-native extension): the
    dataset-level accuracy impact must be bounded — same truth accounting and
    mAP within ~2 points of the bit-exact int8 path even on a DENSE
    random-weight net (real sparse nets sit far from decision boundaries;
    this is the adversarial case for bf16 rounding)."""
    cfg = os.path.join(DATA, "mini-yolo3.cfg")
    spec = parse_network_cfg(cfg, batch=1)
    weights = str(tmp_path / "w.weights")
    save_weights(spec, random_params(spec, seed=11), weights)
    from yolo2_light_tpu.apps.map import validate_detector_map
    exact = validate_detector_map(dataset["data"], cfg, weights, thresh=0.24,
                                  batch=3, k=4096, quantized=True)
    turbo = validate_detector_map(dataset["data"], cfg, weights, thresh=0.24,
                                  batch=3, k=4096, quantized=True, turbo=True)
    assert exact["unique_truth_count"] == turbo["unique_truth_count"]
    # bf16 materialization moves borderline boxes; the aggregate metrics
    # must stay in-family (the bound claimed by README's turbo paragraph)
    assert abs(exact["detections_count"] - turbo["detections_count"]) <= max(
        5, 0.05 * exact["detections_count"])
    assert abs(exact["mAP"] - turbo["mAP"]) < 0.02
    assert abs(exact["avg_iou"] - turbo["avg_iou"]) < 0.02


def test_map_report_text_parity(oracle, dataset, tmp_path):
    """The printed mAP block matches the oracle LINE-FOR-LINE — including the
    rank-sweep progress markers (\\r-terminated, :4803-4806) and glibc's
    '-nan' for the degenerate 0/0 F1 (additionally.c:4871-4875). Tolerance
    parsers can't see formatting drift; this can."""
    import io
    import sys as _sys

    cfg = os.path.join(DATA, "mini-yolo3.cfg")
    spec = parse_network_cfg(cfg, batch=1)
    weights = str(tmp_path / "w.weights")
    save_weights(spec, random_params(spec, seed=11), weights)

    res = subprocess.run(
        [oracle, "detector", "map", dataset["data"], cfg, weights,
         "-thresh", "0.24"],
        capture_output=True, text=True, timeout=600)
    assert res.returncode == 0, res.stderr[-1500:]

    from yolo2_light_tpu.apps.map import validate_detector_map
    buf = io.StringIO()
    old = _sys.stdout
    _sys.stdout = buf
    try:
        validate_detector_map(dataset["data"], cfg, weights, thresh=0.24,
                              batch=3, k=4096)
    finally:
        _sys.stdout = old

    def block(text):
        out, on = [], False
        for line in text.splitlines():   # \r and \n both break, like the tty
            if "detections_count" in line:
                on = True
            if on:
                out.append(line.rstrip())
            if "mean average precision" in line:
                break
        return out

    oracle_block = block(res.stdout)
    ours_block = block(buf.getvalue())
    assert oracle_block, res.stdout[-500:]
    assert ours_block == oracle_block, "\n".join(
        f"oracle: {a!r}\nours:   {b!r}" for a, b in
        zip(oracle_block, ours_block) if a != b)[:2000]


def test_map_cli_streams_identical(oracle, dataset, tmp_path):
    """The map CLI's FULL stdout (everything incl. rank markers) and stderr
    (table, loading line, nthreads=4-cadence progress numbers) byte-match the
    oracle, modulo the wall-clock line and our candidate-buffer saturation
    note (a framework extension message)."""
    import sys as _sys

    cfg = os.path.join(DATA, "mini-yolo3.cfg")
    spec = parse_network_cfg(cfg, batch=1)
    weights = str(tmp_path / "w.weights")
    save_weights(spec, random_params(spec, seed=11), weights)
    args = ["detector", "map", dataset["data"], cfg, weights,
            "-thresh", "0.24"]
    res_o = subprocess.run([oracle] + args, capture_output=True, text=True,
                           timeout=600, cwd=str(tmp_path))
    assert res_o.returncode == 0, res_o.stderr[-800:]
    env = dict(os.environ, YOLO2_TPU_PLATFORM="cpu",
               PYTHONPATH=os.path.dirname(os.path.dirname(
                   os.path.abspath(__file__))))
    res_u = subprocess.run(
        [_sys.executable, "-m", "yolo2_light_tpu"] + args
        + ["-batch", "3", "-k", "4096"],
        capture_output=True, text=True, timeout=600, cwd=str(tmp_path),
        env=env)
    assert res_u.returncode == 0, res_u.stderr[-800:]
    assert res_u.stdout == res_o.stdout

    from .util_parity import assert_streams_match
    assert_streams_match(res_u.stderr, res_o.stderr,
                         drop=("Total Detection Time",),
                         context="map stderr")


def test_map_pp_tp_matches_single(dataset, tmp_path):
    """Composed pipeline(2) x tensor(2) evaluation over 4 virtual devices:
    same matching counts; mAP within the sub-ULP SPMD reassociation class
    (pp alone is bit-exact; tp re-tiles convs — parallel/pp.py docstring)."""
    import jax
    if len(jax.devices()) < 4:
        import pytest
        pytest.skip("needs 4 devices")
    cfg = os.path.join(DATA, "mini-yolo3.cfg")
    spec = parse_network_cfg(cfg, batch=1)
    weights = str(tmp_path / "w.weights")
    save_weights(spec, random_params(spec, seed=11), weights)
    from yolo2_light_tpu.apps.map import validate_detector_map
    single = validate_detector_map(dataset["data"], cfg, weights, thresh=0.24,
                                   batch=2, k=4096)
    composed = validate_detector_map(dataset["data"], cfg, weights,
                                     thresh=0.24, batch=2, k=4096,
                                     pipeline_parallel=2, pp_tp=2)
    assert single["unique_truth_count"] == composed["unique_truth_count"]
    assert single["tp"] == composed["tp"]
    assert single["fp"] == composed["fp"]
    assert abs(single["mAP"] - composed["mAP"]) < 1e-6


def test_map_quantized_tp_sp_matches_single(dataset, tmp_path):
    """detector map -quantized -tp 2 -sp 2: int8 weights under the GLOBAL
    GSPMD mesh (weights_int8 sharded over the model axis, producer-chaining
    across sharded layers, spatial halo exchange) — metrics must match the
    meshless quantized run (round-3 review: the global mesh was fp32-only
    in practice)."""
    import jax
    if len(jax.devices()) < 8:
        import pytest
        pytest.skip("needs 8 devices")
    cfg = os.path.join(DATA, "mini-yolo3.cfg")
    spec = parse_network_cfg(cfg, batch=1)
    weights = str(tmp_path / "w.weights")
    save_weights(spec, random_params(spec, seed=11), weights)
    from yolo2_light_tpu.apps.map import validate_detector_map
    single = validate_detector_map(dataset["data"], cfg, weights, thresh=0.24,
                                   quantized=True, batch=2, k=4096)
    meshed = validate_detector_map(dataset["data"], cfg, weights, thresh=0.24,
                                   quantized=True, batch=2, k=4096,
                                   data_parallel=2, tensor_parallel=2,
                                   spatial_parallel=2)
    assert single["unique_truth_count"] == meshed["unique_truth_count"]
    assert single["tp"] == meshed["tp"]
    assert single["fp"] == meshed["fp"]
    assert abs(single["mAP"] - meshed["mAP"]) < 1e-6
