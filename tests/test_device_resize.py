"""On-device darknet-exact bilinear resize (ops/resize.py) and the pipeline's
source-resolution auto-resize ingest.

The host oracle is io/image.resize_image (reference: resize_image,
src/additionally.c:3021-3064). The device path agrees to <= 1 f32 ULP — XLA
contracts the lerp into an FMA, the same deviation class as the repo's own
native resize (g++ -march=native) vs the strict-f32 gcc -O1 oracle; see the
ops/resize.py module docstring."""

import os

import numpy as np
import pytest

from yolo2_light_tpu.io.image import resize_image
from yolo2_light_tpu.ops.resize import device_resize_image

DATA = os.path.join(os.path.dirname(__file__), "data")
ULP = 1.3e-7  # one f32 ULP at 1.0, the pixel domain's top


@pytest.mark.parametrize("src,dst", [
    ((480, 640), (416, 416)),   # camera downsize (the demo's shape)
    ((96, 128), (416, 416)),    # upsize
    ((416, 416), (96, 160)),    # anisotropic downsize
    ((33, 47), (32, 32)),       # off-by-one fractional scales
    ((7, 5), (13, 13)),         # tiny
    ((1, 9), (8, 8)),           # degenerate in_h == 1 (no second tap ever)
    ((9, 1), (8, 8)),           # degenerate in_w == 1 (edge copy every col)
])
def test_device_resize_matches_host(src, dst):
    rng = np.random.RandomState(7)
    im = rng.rand(*src, 3).astype(np.float32)
    host = resize_image(im, dst[1], dst[0])
    dev = np.asarray(device_resize_image(im[None], dst[1], dst[0]))[0]
    assert dev.shape == host.shape
    np.testing.assert_allclose(dev, host, rtol=0, atol=ULP)


def test_device_resize_endpoint_rules():
    """Darknet endpoint rule: corners copy through exactly; identity dims
    return the input untouched."""
    rng = np.random.RandomState(8)
    im = rng.rand(10, 12, 3).astype(np.float32)
    up = np.asarray(device_resize_image(im[None], 24, 20))[0]
    np.testing.assert_array_equal(up[0, 0], im[0, 0])
    np.testing.assert_array_equal(up[-1, -1], im[-1, -1])
    np.testing.assert_array_equal(up[0, -1], im[0, -1])
    np.testing.assert_array_equal(up[-1, 0], im[-1, 0])
    same = device_resize_image(im[None], 12, 10)
    np.testing.assert_array_equal(np.asarray(same)[0], im)


def test_pipeline_auto_resizes_source_frames():
    """Source-resolution uint8 frames through the pipeline must produce the
    same detections as host-resized float frames, with coordinates corrected
    to the SOURCE dims by default (reference passes im.w/im.h,
    src/main.c:222)."""
    from yolo2_light_tpu.apps.detect import build_params
    from yolo2_light_tpu.pipeline import DetectionPipeline

    cfg = os.path.join(DATA, "mini-yolo3.cfg")
    spec, params, mode = build_params(cfg, None, seed=3)
    pipe = DetectionPipeline(spec, params, mode, thresh=0.4, nms=0.4, k=256)

    rng = np.random.RandomState(1)
    src = (rng.rand(2, 96, 128, 3) * 255).astype(np.uint8)

    dets_dev = pipe(src)  # auto device resize + source-dim correction
    host = np.stack([resize_image(f.astype(np.float32) / 255.0,
                                  spec.net.w, spec.net.h) for f in src])
    dets_host = pipe(host, im_sizes=[(128, 96)] * 2)

    for a, b in zip(dets_dev, dets_host):
        assert a.n == b.n
        np.testing.assert_allclose(a.bbox, b.bbox, rtol=0, atol=1e-4)
        np.testing.assert_allclose(a.prob, b.prob, rtol=0, atol=1e-4)


def test_pipeline_auto_resize_yuv_source():
    """Planar YUV420 at source resolution: converted then device-resized; the
    default im_sizes derive from the YUV packing's true dims."""
    from yolo2_light_tpu.apps.detect import build_params
    from yolo2_light_tpu.pipeline import DetectionPipeline

    cfg = os.path.join(DATA, "mini-yolo3.cfg")
    spec, params, mode = build_params(cfg, None, seed=3)
    pipe = DetectionPipeline(spec, params, mode, thresh=0.4, nms=0.4, k=256)
    rng = np.random.RandomState(2)
    yuv = (rng.rand(2, 96 * 3 // 2, 128) * 255).astype(np.uint8)
    dets = pipe(yuv)
    assert len(dets) == 2
    for d in dets:
        if d.n:
            # boxes are relative; source-dim correction happened (no crash,
            # finite coords)
            assert np.isfinite(d.bbox).all()


def test_demo_device_resize(tmp_path):
    """-device_resize: raw frames ship to the device; output video matches the
    host-resize run's frame count and writes valid frames."""
    cv2 = pytest.importorskip("cv2")
    vid = str(tmp_path / "in.mp4")
    wr = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"mp4v"), 10, (128, 96))
    rng = np.random.RandomState(0)
    for _ in range(8):
        wr.write((rng.rand(96, 128, 3) * 255).astype(np.uint8))
    wr.release()

    from yolo2_light_tpu.cfg import parse_network_cfg
    from yolo2_light_tpu.weights import random_params, save_weights
    cfg = os.path.join(DATA, "mini-yolo3.cfg")
    spec = parse_network_cfg(cfg, batch=1)
    weights = str(tmp_path / "w.weights")
    save_weights(spec, random_params(spec, seed=3), weights)

    out = str(tmp_path / "out.mp4")
    from yolo2_light_tpu.apps.demo import demo
    n = demo(cfg, weights, 0.4, vid, ["aaa", "bbb", "ccc"],
             out_filename=out, dont_show=True, max_frames=6,
             device_resize=True)
    assert n == 6
    cap = cv2.VideoCapture(out)
    frames = 0
    while cap.read()[0]:
        frames += 1
    assert frames == 6


def test_device_resize_under_sharded_mesh():
    """Source-resolution ingest composes with the dp x sp x tp mesh: the
    resize's row gather lives upstream of the spatial sharding and GSPMD
    handles the re-shard; detections match the meshless run."""
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from yolo2_light_tpu.apps.detect import build_params
    from yolo2_light_tpu.pipeline import DetectionPipeline
    from yolo2_light_tpu.parallel.mesh import make_mesh

    cfg = os.path.join(DATA, "mini-yolo3.cfg")
    spec, params, mode = build_params(cfg, None, seed=3)
    mesh = make_mesh(8, data=2, space=2, model=2)
    pipe = DetectionPipeline(spec, params, mode, thresh=0.4, nms=0.4, k=256,
                             mesh=mesh)
    rng = np.random.RandomState(1)
    src = (rng.rand(2, 96, 128, 3) * 255).astype(np.uint8)
    dets = pipe(src)
    pipe0 = DetectionPipeline(spec, params, mode, thresh=0.4, nms=0.4, k=256)
    dets0 = pipe0(src)
    for a, b in zip(dets, dets0):
        assert a.n == b.n
        np.testing.assert_allclose(a.bbox, b.bbox, rtol=0, atol=1e-5)
