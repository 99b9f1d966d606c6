"""YOLO9000 softmax-tree: unit semantics + end-to-end oracle parity."""

import os

import numpy as np
import pytest

from yolo2_light_tpu.tree import (Tree, hierarchy_predictions, read_tree,
                                  softmax_groups)

from .util_parity import (assert_detections_match, run_oracle_detect,
                          run_ours_detect)

DATA = os.path.join(os.path.dirname(__file__), "data")
IMAGE = os.path.join(DATA, "dog160.png")

TREE_TEXT = """animal -1
vehicle -1
cat 0
dog 0
car 1
truck 1
bus 1
"""

CFG_TEMPLATE = """# mini YOLO9000-style region net with class hierarchy (test fixture)
[net]
batch=1
subdivisions=1
width=64
height=64
channels=3

[convolutional]
batch_normalize=1
filters=16
size=3
stride=1
pad=1
activation=leaky

[maxpool]
size=2
stride=2

[convolutional]
batch_normalize=1
filters=32
size=3
stride=1
pad=1
activation=leaky

[maxpool]
size=2
stride=2

[convolutional]
size=1
stride=1
pad=1
filters=60
activation=linear

[region]
anchors = 1.08,1.19,  3.42,4.41,  6.63,11.38,  9.42,5.11,  16.62,10.52
classes=7
coords=4
num=5
softmax=1
tree={tree_path}
"""


@pytest.fixture(scope="module")
def tree_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("tree") / "mini.tree"
    p.write_text(TREE_TEXT)
    return str(p)


def test_read_tree(tree_file):
    t = read_tree(tree_file)
    assert t.n == 7
    assert t.parent == (-1, -1, 0, 0, 1, 1, 1)
    assert t.leaf == (0, 0, 1, 1, 1, 1, 1)
    # groups: artifact 0-size first entry, then contiguous parent groups
    assert softmax_groups(t) == [(0, 2), (2, 2), (4, 3)]


def test_hierarchy_predictions(tree_file):
    t = read_tree(tree_file)
    p = np.array([0.8, 0.2, 0.5, 0.5, 0.1, 0.6, 0.3], np.float32)
    out = hierarchy_predictions(p, t)
    np.testing.assert_allclose(out[:2], [0.8, 0.2], rtol=1e-6)
    np.testing.assert_allclose(out[2:4], [0.4, 0.4], rtol=1e-6)   # * parent 0.8
    np.testing.assert_allclose(out[4:], [0.02, 0.12, 0.06], rtol=1e-6)
    leaves = hierarchy_predictions(p, t, only_leaves=True)
    assert leaves[0] == 0 and leaves[1] == 0


def test_tree_region_oracle_parity(oracle, tree_file, tmp_path):
    from yolo2_light_tpu.cfg import parse_network_cfg
    from yolo2_light_tpu.weights import random_params, save_weights
    cfg = str(tmp_path / "mini-tree.cfg")
    with open(cfg, "w") as f:
        f.write(CFG_TEMPLATE.format(tree_path=tree_file))
    spec = parse_network_cfg(cfg, batch=1)
    head = spec.layers[-1]
    assert head.softmax_tree is not None and head.softmax_tree.n == 7
    weights = str(tmp_path / "w.weights")
    save_weights(spec, random_params(spec, seed=31), weights)
    names_file = str(tmp_path / "t.names")
    names = ["animal", "vehicle", "cat", "dog", "car", "truck", "bus"]
    with open(names_file, "w") as f:
        f.write("\n".join(names) + "\n")
    otext = run_oracle_detect(oracle, names_file, cfg, weights, IMAGE,
                              thresh=0.3)
    utext = run_ours_detect(names, cfg, weights, IMAGE, thresh=0.3)
    assert_detections_match(otext, utext, context="yolo9000 tree")


def test_softmax_layer_tree_groups(tree_file):
    """[softmax] with tree= applies per-group softmax (the reference parses
    tree= into the layer, src/additionally.c:3695-3696, but never dispatches the
    forward; ours executes the softmax_tree grouping)."""
    import jax.numpy as jnp

    from yolo2_light_tpu.models.layers import softmax_layer
    from yolo2_light_tpu.tree import softmax_groups

    t = read_tree(tree_file)
    gs = [g for _, g in softmax_groups(t)]
    x = np.random.RandomState(0).randn(2, t.n).astype(np.float32)
    y = np.asarray(softmax_layer(jnp.asarray(x), 1, 1.0, tree_groups=gs))
    start = 0
    for g in gs:
        seg = y[:, start:start + g]
        np.testing.assert_allclose(seg.sum(-1), 1.0, rtol=1e-5)
        e = np.exp(x[:, start:start + g]
                   - x[:, start:start + g].max(-1, keepdims=True))
        np.testing.assert_allclose(seg, e / e.sum(-1, keepdims=True), rtol=1e-5)
        start += g


MAP_CFG_TEMPLATE = """# mini YOLO9000-with-map region net (test fixture)
# the reference map decode loops a hard-coded 200 entries
# (src/yolov2_forward_network.c:694-698) so classes must be >= 200
[net]
batch=1
subdivisions=1
width=64
height=64
channels=3

[convolutional]
batch_normalize=1
filters=16
size=3
stride=2
pad=1
activation=leaky

[maxpool]
size=2
stride=2

[convolutional]
size=1
stride=1
pad=1
filters=430
activation=linear

[region]
anchors = 1.08,1.19,  3.42,4.41
classes=210
coords=4
num=2
softmax=1
tree={tree_path}
map={map_path}
"""


def test_region_map_decode_oracle_parity(oracle, tmp_path):
    """class_map (cfg map=) region decode vs the reference's get_region_boxes_cpu
    called with a real map (CLI-unreachable; custom harness like the old-INT8 one)."""
    import subprocess

    from yolo2_light_tpu.cfg import parse_network_cfg
    from yolo2_light_tpu.models.network import Predictor
    from yolo2_light_tpu.post import boxes as post
    from yolo2_light_tpu.weights import random_params, save_weights

    # synthetic 210-node tree: 10 roots, 20 children each (children contiguous)
    lines = [f"root{r} -1" for r in range(10)]
    for r in range(10):
        lines += [f"leaf{r}_{c} {r}" for c in range(20)]
    tree_path = str(tmp_path / "big.tree")
    with open(tree_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    # 200-entry map: child indices in a scrambled order
    rng = np.random.RandomState(5)
    map_ids = rng.permutation(np.arange(10, 210)).tolist()
    map_path = str(tmp_path / "t.map")
    with open(map_path, "w") as f:
        f.write("\n".join(str(i) for i in map_ids) + "\n")

    cfg = str(tmp_path / "mini-map.cfg")
    with open(cfg, "w") as f:
        f.write(MAP_CFG_TEMPLATE.format(tree_path=tree_path, map_path=map_path))
    spec = parse_network_cfg(cfg, batch=1)
    head = spec.layers[-1]
    assert head.class_map == tuple(map_ids)
    weights = str(tmp_path / "w.weights")
    save_weights(spec, random_params(spec, seed=13), weights)

    # build the harness against the oracle objects
    oracle_dir = os.path.dirname(oracle)
    harness = os.path.join(oracle_dir, "region_map_harness")
    if not os.path.exists(harness):
        hobj = os.path.join(oracle_dir, "region_map_harness.o")
        subprocess.run(["gcc", "-O1", "-I/root/reference/src", "-c",
                        os.path.join(DATA, "region_map_harness.c"), "-o", hobj],
                       check=True, capture_output=True)
        objs = [os.path.join(oracle_dir, o) for o in
                ("additionally.o", "box.o", "yolov2_forward_network.o",
                 "yolov2_forward_network_quantized.o")]
        subprocess.run(["gcc", "-O1", hobj] + objs +
                       ["-o", harness, "-lm", "-pthread"],
                       check=True, capture_output=True)

    # hierarchy path-probs of a random 10x20 tree are ~1/200; threshold below that
    thresh = 0.002
    x_hwc = np.random.RandomState(3).rand(64, 64, 3).astype(np.float32)
    inp = str(tmp_path / "in.f32")
    np.transpose(x_hwc, (2, 0, 1)).astype(np.float32).tofile(inp)
    res = subprocess.run([harness, cfg, weights, inp, map_path, str(thresh)],
                         capture_output=True, text=True, timeout=300)
    assert res.returncode == 0, res.stderr[-800:]

    total = head.out_w * head.out_h * head.n
    ref_boxes = np.zeros((total, 4), np.float32)
    ref_probs = np.zeros((total, 200), np.float32)
    for line in res.stdout.splitlines():
        parts = line.split()
        if parts[0] == "BOX":
            ref_boxes[int(parts[1])] = [float(v) for v in parts[2:6]]
        elif parts[0] == "PROB":
            ref_probs[int(parts[1]), int(parts[2])] = float(parts[3])

    from yolo2_light_tpu.weights import fuse_conv_batchnorm, load_weights
    params = fuse_conv_batchnorm(spec, load_weights(spec, weights))
    heads = Predictor(spec, params)(x_hwc[None])
    dets = post.get_network_boxes([np.asarray(h.data[0]) for h in heads],
                                  [head], 1, 1, 64, 64, thresh)
    np.testing.assert_allclose(dets.bbox, ref_boxes, rtol=2e-4, atol=2e-5)
    ours = dets.prob[:, :200]
    assert np.all(dets.prob[:, 200:] == 0)
    # entries past the prob > thresh boundary must agree; boundary flips from float
    # noise are tolerated only within a hair of the threshold
    both = (ours > 0) & (ref_probs > 0)
    np.testing.assert_allclose(ours[both], ref_probs[both], rtol=2e-4, atol=2e-5)
    flipped = (ours > 0) != (ref_probs > 0)
    if flipped.any():
        vals = np.maximum(ours[flipped], ref_probs[flipped])
        assert np.all(np.abs(vals - thresh) < 1e-4), vals
    # the map decode must actually fire (nonzero probs exist)
    assert (ref_probs > 0).sum() > 0


def test_region_map_device_decode_matches_host(tmp_path):
    """DetectionPipeline (device decode) must apply the class_map exactly like
    the host path."""
    from yolo2_light_tpu.cfg import parse_network_cfg
    from yolo2_light_tpu.models.network import Predictor
    from yolo2_light_tpu.pipeline import DetectionPipeline
    from yolo2_light_tpu.post import boxes as post
    from yolo2_light_tpu.weights import fuse_conv_batchnorm, random_params

    lines = [f"root{r} -1" for r in range(10)]
    for r in range(10):
        lines += [f"leaf{r}_{c} {r}" for c in range(20)]
    tree_path = str(tmp_path / "big.tree")
    with open(tree_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    rng = np.random.RandomState(5)
    map_ids = rng.permutation(np.arange(10, 210)).tolist()
    map_path = str(tmp_path / "t.map")
    with open(map_path, "w") as f:
        f.write("\n".join(str(i) for i in map_ids) + "\n")
    cfg = str(tmp_path / "mini-map.cfg")
    with open(cfg, "w") as f:
        f.write(MAP_CFG_TEMPLATE.format(tree_path=tree_path, map_path=map_path))

    spec = parse_network_cfg(cfg, batch=1)
    params = fuse_conv_batchnorm(spec, random_params(spec, seed=13))
    x = np.random.RandomState(7).rand(1, 64, 64, 3).astype(np.float32)

    pred = Predictor(spec, params)
    heads = pred(x)
    host = post.get_network_boxes([np.asarray(h.data[0]) for h in heads],
                                  pred.head_specs(), 64, 64, 64, 64, 0.002)
    post.do_nms_sort(host, 210, 0.4)
    pipe = DetectionPipeline(spec, params, thresh=0.002, nms=0.4, k=4096)
    dev = pipe(x)[0]
    hp = host.prob[host.prob.max(-1) > 0]
    dp = dev.prob[dev.prob.max(-1) > 0]
    assert hp.shape[0] == dp.shape[0] > 0
    np.testing.assert_allclose(np.sort(hp.max(-1)), np.sort(dp.max(-1)),
                               rtol=1e-5)


def test_tree_device_decode_matches_host(tree_file, tmp_path):
    """DetectionPipeline (device decode) must apply the hierarchy exactly like the
    host path for YOLO9000 models."""
    import numpy as np

    from yolo2_light_tpu.cfg import parse_network_cfg
    from yolo2_light_tpu.models.network import Predictor
    from yolo2_light_tpu.pipeline import DetectionPipeline
    from yolo2_light_tpu.post import boxes as post
    from yolo2_light_tpu.weights import (fuse_conv_batchnorm, random_params)

    cfg = str(tmp_path / "mini-tree.cfg")
    with open(cfg, "w") as f:
        f.write(CFG_TEMPLATE.format(tree_path=tree_file))
    spec = parse_network_cfg(cfg, batch=1)
    params = fuse_conv_batchnorm(spec, random_params(spec, seed=31))

    x = np.random.RandomState(7).rand(1, 64, 64, 3).astype(np.float32)
    pred = Predictor(spec, params)
    heads = pred(x)
    host = post.get_network_boxes([np.asarray(h.data[0]) for h in heads],
                                  pred.head_specs(), 64, 64, 64, 64, 0.3)
    post.do_nms_sort(host, 7, 0.4)

    pipe = DetectionPipeline(spec, params, thresh=0.3, nms=0.4, k=4096)
    dev = pipe(x)[0]
    hp = host.prob[host.prob.max(-1) > 0]
    dp = dev.prob[dev.prob.max(-1) > 0]
    assert hp.shape[0] == dp.shape[0]
    np.testing.assert_allclose(
        np.sort(hp.max(-1)), np.sort(dp.max(-1)), rtol=1e-5)
