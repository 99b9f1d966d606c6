"""Weight/activation distribution visualization for quantization debugging.

Reference: draw_distribution (src/yolov2_forward_network_quantized.c:96-169) draws a
log2-count histogram over the 32 doubling ranges [1/65536 * 2^j, ...) with a marker
line at the optimal INT8 multiplier, in an OpenCV window. This version renders the
same bars/marker to a PNG (headless-friendly) via PIL.
"""

from __future__ import annotations

import numpy as np

from ..quant import get_distribution, get_multiplier


def draw_distribution(arr: np.ndarray, name: str | None = None,
                      out_path: str = "distribution.png",
                      img_w: int = 1200, img_h: int = 800) -> float:
    """Render the distribution histogram; returns the optimal multiplier."""
    from PIL import Image, ImageDraw
    number_of_ranges = 32
    start_range = 1.0 / 65536
    count = get_distribution(arr, number_of_ranges, start_range).astype(np.float64)
    multiplier = get_multiplier(arr, 8)

    # log2 bars like the reference (log2(0) clamps to 0 via int cast of -inf guard)
    with np.errstate(divide="ignore"):
        bars = np.log2(np.maximum(count, 1)).astype(int)
    max_count = max(1, bars.max())

    img = Image.new("RGB", (img_w, img_h), (0, 0, 0))
    d = ImageDraw.Draw(img)
    for j in range(number_of_ranges):
        x1 = j * img_w // number_of_ranges
        x2 = (j + 1) * img_w // number_of_ranges
        y2 = img_h - img_h * int(bars[j]) // max_count
        d.rectangle([x1, min(img_h, y2), x2, img_h], fill=(128, 64, 32),
                    outline=(32, 32, 32))
    index_multiplier = int(np.log2(1.0 / (multiplier * start_range)))
    x = index_multiplier * img_w // number_of_ranges
    d.line([(x, 0), (x, img_h)], fill=(255, 32, 32), width=1)
    label = f"optimal multiplier = {multiplier:g}"
    if name:
        label = f"{name}: {label}"
    d.text((10, 10), label, fill=(255, 255, 255))
    img.save(out_path)
    return multiplier
