"""Golden-frame test for the video-path label overlay
(reference: draw_detections_cv_v3 composes a comma-joined labelstr and draws it
with a filled background above the box, src/main.c:274-357)."""

import numpy as np

from yolo2_light_tpu.io import image as im_io
from yolo2_light_tpu.post.boxes import Detections


def _frame(h=200, w=200):
    return np.full((h, w, 3), 0.5, np.float32)


def _det(probs):
    return Detections(
        bbox=np.array([[0.5, 0.5, 0.4, 0.4]], np.float32),
        objectness=np.array([0.9], np.float32),
        prob=np.array([probs], np.float32))


def test_label_background_and_text_placement():
    im = _frame()
    dets = _det([0.8, 0.0, 0.6])  # classes 0 and 2 above thresh
    im_io.draw_detections_cv(im, dets, ["aaa", "bbb", "ccc"], 0.5, 3)

    h, w = 200, 200
    left, right = int(0.3 * w), int(0.7 * w)
    top = int(0.3 * h)
    font_size = h / 1000.0
    bg_top = int(top - (10 + 25 * font_size))

    # color of the FIRST class above thresh (class 0)
    offset = 0 * 123457 % 3
    rgb = np.array([im_io.get_color(2, offset, 3),
                    im_io.get_color(1, offset, 3),
                    im_io.get_color(0, offset, 3)], np.float32)

    # the filled label background must carry the class color (away from text)
    bg_px = im[bg_top + 1, right - 2]
    assert np.allclose(bg_px, rgb, atol=2 / 255), (bg_px, rgb)
    # black text pixels must exist inside the background band
    band = im[bg_top:top + 1, left:right + 1]
    assert (band.sum(axis=-1) < 0.2).any(), "no text pixels drawn"
    # and none above it (frame untouched there up to uint8 re-quantization)
    assert np.allclose(im[0:bg_top - 1, :, :], 0.5, atol=2 / 255)


def test_comma_joined_label_is_wider_than_single():
    im1, im2 = _frame(), _frame()
    im_io.draw_detections_cv(im1, _det([0.8, 0.0, 0.0]),
                             ["aaa", "bbb", "ccc"], 0.5, 3)
    im_io.draw_detections_cv(im2, _det([0.8, 0.0, 0.6]),
                             ["aaa", "bbb", "ccc"], 0.5, 3)
    black1 = int((im1.sum(axis=-1) < 0.2).sum())
    black2 = int((im2.sum(axis=-1) < 0.2).sum())
    # "aaa, ccc" must paint strictly more text pixels than "aaa"
    assert black2 > black1 > 0


def test_image_path_unchanged_no_text():
    """The single-image path keeps boxes-only (reference passes alphabet=NULL
    to draw_detections_v3, src/main.c:156-159)."""
    im = _frame()
    im_io.draw_detections(im, _det([0.8, 0.0, 0.0]), ["aaa", "bbb", "ccc"],
                          0.5, 3)
    assert not (im.sum(axis=-1) < 0.2).any()
