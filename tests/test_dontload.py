"""dontload / dontloadscales loader semantics.

Reference: load_weights_upto_cpu skips dontload layers entirely
(src/additionally.c:3522) and load_convolutional_weights_cpu skips the BN
stats for dontloadscales (src/additionally.c:3463); skipped layers keep their
construction-time state — glibc-rand() weights, zero biases, scales=1
(src/additionally.c:2746-2752,2797-2800).
"""

import dataclasses
import os

import numpy as np
import pytest

from yolo2_light_tpu.cfg import ConvSpec, parse_network_cfg
from yolo2_light_tpu.utils.crand import GlibcRand, darknet_conv_init
from yolo2_light_tpu.weights import load_weights, random_params, save_weights

from .util_parity import (assert_detections_match, run_oracle_detect,
                          run_ours_detect)

DATA = os.path.join(os.path.dirname(__file__), "data")
CFG = os.path.join(DATA, "mini-dontload.cfg")
IMAGE = os.path.join(DATA, "dog160.png")


def test_glibc_rand_bit_exact():
    # The well-known glibc TYPE_3 sequence for the default seed.
    g = GlibcRand(1)
    assert [g.rand() for _ in range(5)] == [
        1804289383, 846930886, 1681692777, 1714636915, 1957747793]
    # srand(0) is remapped to seed 1 by glibc.
    g0 = GlibcRand(0)
    assert g0.rand() == 1804289383


def test_spec_parses_dontload():
    spec = parse_network_cfg(CFG, batch=1)
    flags = [getattr(l, "dontload", False) for l in spec.layers]
    assert sum(flags) == 1
    idx = flags.index(True)
    assert isinstance(spec.layers[idx], ConvSpec)
    assert not spec.layers[idx].batch_normalize


def test_byte_aligned_load_with_skipped_layer(tmp_path):
    """save_weights skips dontload layers; load_weights realigns and fills the
    construction-time init."""
    spec = parse_network_cfg(CFG, batch=1)
    params = random_params(spec, seed=7)
    path = str(tmp_path / "w.weights")
    save_weights(spec, params, path)

    idx = next(i for i, l in enumerate(spec.layers)
               if getattr(l, "dontload", False))
    skipped_bytes = 4 * (spec.layers[idx].n
                         + spec.layers[idx].n * spec.layers[idx].c
                         * spec.layers[idx].size ** 2)
    # the file must be smaller by exactly the skipped layer's bytes
    spec_noskip = dataclasses.replace(
        spec, layers=tuple(
            dataclasses.replace(l, dontload=False)
            if isinstance(l, ConvSpec) else l for l in spec.layers))
    path_full = str(tmp_path / "wfull.weights")
    save_weights(spec_noskip, params, path_full)
    assert os.path.getsize(path_full) - os.path.getsize(path) == skipped_bytes

    loaded = load_weights(spec, path)
    init = darknet_conv_init(spec)
    for i, l in enumerate(spec.layers):
        if not isinstance(l, ConvSpec):
            continue
        if i == idx:
            np.testing.assert_array_equal(loaded[i]["weights"], init[i])
            np.testing.assert_array_equal(loaded[i]["biases"],
                                          np.zeros(l.n, np.float32))
        else:
            # layers after the skip must still be byte-aligned
            np.testing.assert_array_equal(loaded[i]["weights"],
                                          params[i]["weights"])
            np.testing.assert_array_equal(loaded[i]["biases"],
                                          params[i]["biases"])


def test_dontloadscales_byte_alignment(tmp_path):
    """A BN conv with dontloadscales=1 reads biases+weights but not the BN
    stats; following layers stay aligned; init stats are scales=1/mean=0/var=0."""
    spec = parse_network_cfg(CFG, batch=1)
    # flip dontloadscales on the first BN conv, clear the dontload layer to
    # isolate the scales path
    new_layers = []
    flipped = None
    for l in spec.layers:
        if isinstance(l, ConvSpec) and l.dontload:
            l = dataclasses.replace(l, dontload=False)
        if (flipped is None and isinstance(l, ConvSpec) and l.batch_normalize):
            l = dataclasses.replace(l, dontloadscales=True)
            flipped = l.index
        new_layers.append(l)
    spec2 = dataclasses.replace(spec, layers=tuple(new_layers))
    params = random_params(spec2, seed=9)
    path = str(tmp_path / "w.weights")
    save_weights(spec2, params, path)
    loaded = load_weights(spec2, path)
    l = spec2.layers[flipped]
    np.testing.assert_array_equal(loaded[flipped]["scales"],
                                  np.ones(l.n, np.float32))
    np.testing.assert_array_equal(loaded[flipped]["rolling_variance"],
                                  np.zeros(l.n, np.float32))
    np.testing.assert_array_equal(loaded[flipped]["weights"],
                                  params[flipped]["weights"])
    for i, l2 in enumerate(spec2.layers):
        if isinstance(l2, ConvSpec) and i != flipped:
            np.testing.assert_array_equal(loaded[i]["weights"],
                                          params[i]["weights"])


@pytest.mark.parametrize("seed", [11])
def test_dontload_oracle_parity(oracle, tmp_path, seed):
    """End-to-end: the oracle keeps its glibc-rand init for the dontload conv;
    our loader reproduces those exact weights, so detections must match."""
    spec = parse_network_cfg(CFG, batch=1)
    params = random_params(spec, seed=seed)
    weights = str(tmp_path / "w.weights")
    save_weights(spec, params, weights)
    names_file = str(tmp_path / "mini.names")
    with open(names_file, "w") as f:
        f.write("aaa\nbbb\nccc\n")
    otext = run_oracle_detect(oracle, names_file, CFG, weights, IMAGE)
    utext = run_ours_detect(["aaa", "bbb", "ccc"], CFG, weights, IMAGE)
    assert_detections_match(otext, utext, context=f"dontload seed={seed}")
