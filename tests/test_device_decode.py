"""Device decode/compaction must reproduce the host decode path exactly."""

import os

import numpy as np

from yolo2_light_tpu.cfg import parse_network_cfg
from yolo2_light_tpu.models.network import Predictor
from yolo2_light_tpu.pipeline import DetectionPipeline
from yolo2_light_tpu.post import boxes as post
from yolo2_light_tpu.weights import fuse_conv_batchnorm, random_params

DATA = os.path.join(os.path.dirname(__file__), "data")


def _match(host_dets, dev_dets):
    """Same surviving (class,conf) multiset and matching boxes."""
    hp = host_dets.prob[host_dets.prob.max(-1) > 0]
    dp = dev_dets.prob[dev_dets.prob.max(-1) > 0]
    assert hp.shape[0] == dp.shape[0], (hp.shape, dp.shape)
    # sort rows by max prob for comparison
    horder = np.argsort(-hp.max(-1), kind="stable")
    dorder = np.argsort(-dp.max(-1), kind="stable")
    np.testing.assert_allclose(hp[horder], dp[dorder], rtol=1e-5, atol=1e-6)


def _run(cfg_name, seed, thresh=0.3):
    cfg = os.path.join(DATA, cfg_name)
    spec = parse_network_cfg(cfg, batch=1)
    params = fuse_conv_batchnorm(spec, random_params(spec, seed=seed))

    rng = np.random.RandomState(42)
    x = rng.rand(1, spec.net.h, spec.net.w, spec.net.c).astype(np.float32)

    # host path
    pred = Predictor(spec, params)
    heads = pred(x)
    host_dets = post.get_network_boxes(
        [np.asarray(h.data[0]) for h in heads], pred.head_specs(),
        spec.net.w, spec.net.h, spec.net.w, spec.net.h, thresh)
    post.do_nms_sort(host_dets, pred.head_specs()[-1].classes, 0.4)

    # device path
    pipe = DetectionPipeline(spec, params, thresh=thresh, nms=0.4, k=2048)
    dev_dets = pipe(x)[0]
    return host_dets, dev_dets


def test_device_decode_yolo_matches_host():
    _match(*_run("mini-yolo3.cfg", seed=1))


def test_device_decode_region_matches_host():
    _match(*_run("mini-yolo2.cfg", seed=3))


def test_pipeline_batched():
    cfg = os.path.join(DATA, "mini-yolo3.cfg")
    spec = parse_network_cfg(cfg, batch=4)
    params = fuse_conv_batchnorm(spec, random_params(spec, seed=2))
    pipe = DetectionPipeline(spec, params, thresh=0.3, k=4096)
    x = np.random.RandomState(0).rand(4, spec.net.h, spec.net.w,
                                      spec.net.c).astype(np.float32)
    dets = pipe(x)
    assert len(dets) == 4
    # identical inputs -> identical detections
    x2 = np.stack([x[0]] * 4)
    d2 = pipe(x2)
    for d in d2[1:]:
        np.testing.assert_allclose(d.prob, d2[0].prob, rtol=1e-6)


def test_stream_matches_call_and_order():
    cfg = os.path.join(DATA, "mini-yolo3.cfg")
    spec = parse_network_cfg(cfg, batch=2)
    params = fuse_conv_batchnorm(spec, random_params(spec, seed=2))
    pipe = DetectionPipeline(spec, params, thresh=0.3, k=4096)
    rng = np.random.RandomState(1)
    batches = [rng.rand(2, 64, 64, 3).astype(np.float32) for _ in range(3)]
    direct = [pipe(b) for b in batches]
    streamed = list(pipe.stream(iter(batches), depth=2, workers=1))
    assert len(streamed) == 3
    for dlist, slist in zip(direct, streamed):
        for d, s in zip(dlist, slist):
            np.testing.assert_allclose(d.prob, s.prob, rtol=1e-6)
            np.testing.assert_allclose(d.bbox, s.bbox, rtol=1e-6)


def test_stream_with_im_sizes():
    cfg = os.path.join(DATA, "mini-yolo3.cfg")
    spec = parse_network_cfg(cfg, batch=1)
    params = fuse_conv_batchnorm(spec, random_params(spec, seed=2))
    pipe = DetectionPipeline(spec, params, thresh=0.3, k=4096)
    x = np.random.RandomState(0).rand(1, 64, 64, 3).astype(np.float32)
    sizes = [[(128, 96)]]
    (out,) = list(pipe.stream([x], im_sizes_iter=iter(sizes)))
    ref = pipe(x, im_sizes=[(128, 96)])
    np.testing.assert_allclose(out[0].bbox, ref[0].bbox, rtol=1e-6)


def test_yuv420_ingest_matches_rgb():
    """YUV420 ingest must produce the same detections as the equivalent RGB."""
    import jax.numpy as jnp
    from yolo2_light_tpu.pipeline import yuv420_to_rgb
    rng = np.random.RandomState(0)
    h, w = 64, 64
    yuv = rng.randint(0, 256, (2, h * 3 // 2, w), dtype=np.uint8)
    rgb_dev = np.asarray(yuv420_to_rgb(jnp.asarray(yuv)))
    # reference conversion in numpy
    y = yuv[:, :h, :].astype(np.float32)
    u = yuv[:, h:h + h // 4, :].reshape(2, h // 2, w // 2).astype(np.float32)
    v = yuv[:, h + h // 4:, :].reshape(2, h // 2, w // 2).astype(np.float32)
    u = np.repeat(np.repeat(u, 2, 1), 2, 2) - 128
    v = np.repeat(np.repeat(v, 2, 1), 2, 2) - 128
    ref = np.stack([y + 1.402 * v,
                    y - 0.344136 * u - 0.714136 * v,
                    y + 1.772 * u], axis=-1)
    ref = np.clip(ref, 0, 255) / 255.0
    np.testing.assert_allclose(rgb_dev, ref, atol=1e-4)

    # end-to-end: yuv through the pipeline == converted rgb through the pipeline
    cfg = os.path.join(DATA, "mini-yolo3.cfg")
    spec = parse_network_cfg(cfg, batch=2)
    params = fuse_conv_batchnorm(spec, random_params(spec, seed=2))
    pipe = DetectionPipeline(spec, params, thresh=0.3, k=4096)
    d_yuv = pipe(yuv)
    d_rgb = pipe(ref.astype(np.float32))
    for a, b in zip(d_yuv, d_rgb):
        np.testing.assert_allclose(a.prob, b.prob, rtol=1e-4, atol=1e-5)
