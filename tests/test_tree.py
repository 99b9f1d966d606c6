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
