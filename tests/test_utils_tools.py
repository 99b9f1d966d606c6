"""Aux tooling: distribution viz, VOC label converter."""

import os
import xml.etree.ElementTree as ET

import numpy as np


def test_draw_distribution(tmp_path):
    from yolo2_light_tpu.utils.distribution import draw_distribution
    rng = np.random.RandomState(0)
    arr = rng.randn(10000).astype(np.float32) * 0.05
    out = str(tmp_path / "dist.png")
    mult = draw_distribution(arr, "weights", out_path=out)
    assert os.path.getsize(out) > 500
    from yolo2_light_tpu.quant import get_multiplier
    assert mult == get_multiplier(arr, 8)


def test_draw_distribution_show_headless_noop(tmp_path, monkeypatch):
    """show=True on a headless host (no DISPLAY) must silently fall back to
    the PNG — the cv window branch (cvShowImage/cvWaitKey(0), reference
    src/yolov2_forward_network_quantized.c:164-165) is display-gated."""
    from yolo2_light_tpu.utils.distribution import draw_distribution
    monkeypatch.delenv("DISPLAY", raising=False)
    arr = np.linspace(-0.5, 0.5, 512, dtype=np.float32)
    out = str(tmp_path / "dist.png")
    mult = draw_distribution(arr, "t", out_path=out, show=True)
    assert os.path.getsize(out) > 500 and mult > 0


def test_draw_distribution_geometry(tmp_path):
    """Pin the drawn geometry to the reference formulas
    (src/yolov2_forward_network_quantized.c:96-169): bar j spans
    x in [j*W/32, (j+1)*W/32], height H*log2(count[j])//max over log2 counts
    from the bottom; the red multiplier marker sits at column
    int(log2(1/(mult*start)))*W/32 spanning the full height."""
    from PIL import Image

    from yolo2_light_tpu.quant import get_distribution, get_multiplier
    from yolo2_light_tpu.utils.distribution import draw_distribution
    rng = np.random.RandomState(1)
    arr = rng.randn(4096).astype(np.float32) * 0.1
    out = str(tmp_path / "dist.png")
    mult = draw_distribution(arr, out_path=out)
    px = np.asarray(Image.open(out).convert("RGB"))
    img_h, img_w = px.shape[:2]
    assert (img_w, img_h) == (1200, 800)

    count = get_distribution(arr, 32, 1.0 / 65536)
    bars = np.log2(np.maximum(count, 1)).astype(int)
    max_count = int(bars.max())
    marker_x = int(np.log2(1.0 / (mult * (1.0 / 65536)))) * img_w // 32

    # marker: full-height red column at the computed x
    col = px[:, marker_x]
    assert (col == (255, 32, 32)).all(axis=-1).mean() > 0.9
    for j in range(32):
        x_mid = (j * img_w // 32 + (j + 1) * img_w // 32) // 2
        if abs(x_mid - marker_x) <= 1:
            continue
        y_top = img_h - img_h * int(bars[j]) // max_count
        if bars[j] > 0:
            # fill color just below the bar top, background just above
            assert tuple(px[min(img_h - 1, y_top + 2), x_mid]) == (128, 64, 32), j
        if y_top > 60:  # above the bar (below the title band) is background
            probe = px[max(0, y_top - 10), x_mid]
            assert tuple(probe) != (128, 64, 32), j
    assert mult == get_multiplier(arr, 8)


def test_voc_label_converter(tmp_path):
    from yolo2_light_tpu.utils.voc_label import main
    root = tmp_path / "VOCdevkit"
    ann = root / "VOC2007" / "Annotations"
    isets = root / "VOC2007" / "ImageSets" / "Main"
    ann.mkdir(parents=True)
    isets.mkdir(parents=True)
    xml = """<annotation><size><width>100</width><height>200</height><depth>3</depth></size>
    <object><name>dog</name><difficult>0</difficult>
      <bndbox><xmin>10</xmin><xmax>50</xmax><ymin>20</ymin><ymax>120</ymax></bndbox></object>
    <object><name>cat</name><difficult>1</difficult>
      <bndbox><xmin>1</xmin><xmax>2</xmax><ymin>1</ymin><ymax>2</ymax></bndbox></object>
    </annotation>"""
    (ann / "000001.xml").write_text(xml)
    (isets / "test.txt").write_text("000001\n")
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        main(["--root", "VOCdevkit", "--sets", "2007,test"])
    finally:
        os.chdir(cwd)
    label = (root / "VOC2007" / "labels" / "000001.txt").read_text().strip()
    parts = label.split("\n")
    assert len(parts) == 1  # difficult cat excluded
    vals = parts[0].split()
    assert vals[0] == "11"  # dog class id
    np.testing.assert_allclose([float(v) for v in vals[1:]],
                               [0.3, 0.35, 0.4, 0.5], atol=1e-5)
    assert (tmp_path / "2007_test.txt").read_text().strip().endswith("000001.jpg")

    # --difficult (reference voc_label_difficult.py): inverted filter,
    # difficult_ prefixes on label file, list file, and jpg paths
    os.chdir(tmp_path)
    try:
        main(["--root", "VOCdevkit", "--sets", "2007,test", "--difficult"])
    finally:
        os.chdir(cwd)
    dlabel = (root / "VOC2007" / "labels" / "difficult_000001.txt"
              ).read_text().strip()
    dparts = dlabel.split("\n")
    assert len(dparts) == 1
    assert dparts[0].split()[0] == "7"  # cat — the DIFFICULT box, kept
    dlist = (tmp_path / "difficult_2007_test.txt").read_text().strip()
    assert dlist.endswith("difficult_000001.jpg")
