"""``detector demo`` — video detection (reference: demo(), src/main.c:450-573).

The reference pipelines one fetch pthread against one detect pthread with triple
image buffering (src/main.c:490-572). Here a producer thread feeds capture+resize
into a bounded queue while micro-batches stream through the fused TPU pipeline
(DetectionPipeline.stream, depth=2): H2D, device compute, D2H and host NMS all
overlap — the same overlap, plus device batching.

``frame_skip`` reproduces the reference's ``-s`` delay semantics (src/main.c:453,
563-570): every frame is detected, but the displayed/saved image and the FPS
counter only advance every ``frame_skip + 1`` frames.
"""

from __future__ import annotations

import queue
import sys
import threading
import time

import numpy as np

from ..io import image as im_io
from ..pipeline import DetectionPipeline
from .detect import build_params


def _frames(cap, netw, neth, q, stop, uint8_ingest: bool,
            device_resize: bool):
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
        rgb = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)  # uint8, source dims
        if device_resize:
            # ship the RAW frame; /255 + darknet-exact bilinear run on device
            # (pipeline auto-resize) — no host resize, and uint8 here is the
            # camera's native precision (no re-quantization step at all)
            sized = rgb if uint8_ingest else rgb.astype(np.float32) / 255.0
        else:
            sized = im_io.resize_image(rgb.astype(np.float32) / 255.0,
                                       netw, neth)
            if uint8_ingest:
                # ship uint8: 4x fewer H2D bytes per frame (a measured 6x e2e
                # FPS win through the relay). The cost is <=1/510 per-pixel
                # ingest error from re-quantizing the resized frame — a
                # deliberate speed/accuracy trade for the bf16 demo mode
                # (which is already non-parity); fp32 and -quantized runs
                # keep float ingest
                sized = (sized * 255.0 + 0.5).astype(np.uint8)
        if not offer((rgb, sized)):
            return
    offer(None)


def demo(cfgfile: str, weightfile, thresh: float, filename, names, *,
         quantized: bool = False, out_filename=None, dont_show: bool = True,
         cam_index: int = 0, int8_policy: str = "cpu", max_frames=None,
         compute_dtype=None, prefix=None, frame_skip: int = 0,
         batch: int = 0, params_cache=None, device_nms: bool = False,
         k: int = 256, uint8_ingest=None, turbo: bool = False,
         int8_impl: str = "xla", device_resize: bool = False,
         pipeline_parallel: int = 0, pp_tp: int = 1) -> int:
    """Returns number of frames processed. Dense convs default to bf16 on the MXU
    (real-time video favors speed; non-quantized frames then also ship as
    uint8 — 4x fewer H2D bytes at <=1/510 per-pixel ingest error); pass
    compute_dtype=jnp.float32 for full fp32 with float ingest.
    ``batch``: frames per device step (default: 4 for file sources — throughput;
    1 for cameras — latency).
    ``device_resize``: ship frames at SOURCE resolution and run the
    darknet-exact bilinear resize on device (ops/resize.py) — frees the
    serving host of per-frame resize work; uint8 ingest then carries the
    camera's raw bytes (no re-quantization error), so it defaults ON. H2D
    bytes scale with the source instead of the net dims — prefer it on
    direct-attached hosts or when the source is near/below net size."""
    import cv2
    import jax.numpy as jnp

    print("Demo", flush=True)  # main.c:456
    spec, params, mode = build_params(cfgfile, weightfile, quantized=quantized,
                                      params_cache=params_cache,
                                      quant_banner=True)  # main.c:467
    nms = 0.2 if quantized else 0.4
    # the reference's quantized forward printf's a per-conv line EVERY frame
    # (network_predict_quantized from inside the detect thread); static per
    # net, so synthesise once and print per frame with the object lines
    from .detect import forward_echo
    conv_echo = forward_echo(spec) if quantized else ""
    cd = compute_dtype if compute_dtype is not None else jnp.bfloat16
    pipe = DetectionPipeline(spec, params, mode, thresh=thresh, nms=nms,
                             int8_policy=int8_policy, k=k,
                             compute_dtype=cd, device_nms=device_nms,
                             turbo=turbo, int8_impl=int8_impl,
                             pp_stages=max(0, pipeline_parallel),
                             pp_tp=pp_tp, pp_microbatch=1)
    classes = pipe.classes
    if batch <= 0:
        batch = 4 if filename else 1

    if filename:
        print(f"video file: {filename}", flush=True)  # main.c:468-470
        # CVSTUBV1 raw-BGR streams (sniffed by magic) bypass cv2's codecs:
        # deterministic bytes for parity tests and decode-free benchmark ingest
        from ..io.rawvideo import RawVideoCapture, is_rawvideo
        cap = (RawVideoCapture(filename) if is_rawvideo(filename)
               else cv2.VideoCapture(filename))
    else:
        cap = cv2.VideoCapture(cam_index)
    if not cap.isOpened():
        # reference: error("Couldn't connect to webcam.\n"), main.c:476
        print("Couldn't connect to webcam.", file=sys.stderr)
        return 0

    writer = None
    if out_filename:
        fps_in = cap.get(cv2.CAP_PROP_FPS) or 25
        w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
        h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
        writer = cv2.VideoWriter(out_filename,
                                 cv2.VideoWriter_fourcc(*"mp4v"), fps_in, (w, h))

    q: queue.Queue = queue.Queue(maxsize=2 * batch + 2)
    stop = threading.Event()
    # quantized runs keep float ingest: the int8 path's input quantization is
    # otherwise bit-exact and uint8 pre-rounding would perturb it. An explicit
    # uint8_ingest=True/False (CLI -uint8_ingest/-no_uint8_ingest) overrides,
    # decoupling ingest precision from compute dtype.
    if uint8_ingest is None:
        # device_resize ships raw camera bytes — uint8 is then the EXACT
        # source representation (the /255 and resize happen on device in f32),
        # so it is safe for every compute mode including -quantized
        uint8_ingest = (True if device_resize
                        else cd == jnp.bfloat16 and not quantized)
    t = threading.Thread(target=_frames,
                         args=(cap, spec.net.w, spec.net.h, q, stop,
                               uint8_ingest, device_resize), daemon=True)
    t.start()

    # rgb frames ride alongside the device batches; stream() yields in submission
    # order and prefetches at most `depth` batches, so this stays small
    rgb_batches: list = []

    def pairs():
        """(stacked device batch, padded im_sizes) tuples; rgb frames stashed in
        rgb_batches for the FIFO result loop."""
        done = False
        while not done:
            rgbs, sizeds = [], []
            while len(sizeds) < batch:
                item = q.get()
                if item is None:
                    done = True
                    break
                rgbs.append(item[0])
                sizeds.append(item[1])
            if not sizeds:
                return
            rgb_batches.append(rgbs)
            szs = [(r.shape[1], r.shape[0]) for r in rgbs]
            while len(sizeds) < batch:
                # pad the tail batch to the compiled batch size (one jit program
                # for the whole stream); extras are dropped by the rgb zip
                sizeds.append(sizeds[-1])
                szs.append(szs[-1])
            yield np.stack(sizeds), szs

    count = 0
    fps = 0.0
    delay = frame_skip
    before = time.time()
    stop_all = False
    last_bgr = None  # the reference's disp/show_img analog: the most recently
    #                  drawn frame, re-saved on gated iterations
    try:
        import io as _io
        import itertools
        # tee keeps batches and sizes in lockstep no matter how stream()
        # interleaves its pulls from the two iterators
        p1, p2 = itertools.tee(pairs())
        for dets_list in pipe.stream((b for b, _ in p1),
                                     im_sizes_iter=(s for _, s in p2),
                                     depth=2, workers=1):
            rgbs = rgb_batches.pop(0)
            for rgb, dets in zip(rgbs, dets_list):
                count += 1
                # EVERY detected frame prints its object lines (the reference
                # echoes from inside the per-frame detect thread, main.c:294,
                # regardless of the display delay gate)
                buf = _io.StringIO()
                im_io.echo_detections_cv(dets, names, thresh, classes,
                                         rgb.shape[1], rgb.shape[0], buf)
                objects = buf.getvalue()
                # reference delay gate (src/main.c:553-557): the drawn frame
                # only ADVANCES when delay hits 0; gated iterations reuse it.
                # The first frame primes it regardless (the reference detects
                # and assigns disp/show_img before the loop, main.c:496-504),
                # so -prefix output starts at count 1 like the oracle's.
                # Cadence matches the reference (one fresh frame per
                # frame_skip+1 counts); PHASE intentionally differs by one:
                # the reference writes disp before reassigning it, so its
                # fresh frame first shows the iteration AFTER the advance —
                # we drop that pipeline-buffering lag and show it at the
                # advance itself (main.c:538-548)
                if delay == 0 or last_bgr is None:
                    # video path draws class-name label text like the
                    # reference's draw_detections_cv_v3 (src/main.c:274-357).
                    # frames ride the queue as uint8 and convert lazily here —
                    # skipped (delay-gated) frames never pay the f32 pass, and
                    # the final PNG/BGR quantizes back to uint8 anyway
                    rgbf = rgb.astype(np.float32) / 255.0
                    im_io.draw_detections_cv(rgbf, dets, names, thresh,
                                             classes)
                    last_bgr = cv2.cvtColor(
                        (np.clip(rgbf, 0, 1) * 255).astype(np.uint8),
                        cv2.COLOR_RGB2BGR)
                    if writer is not None:
                        # writer cadence: one frame per (frame_skip+1) source
                        # frames, same as the reference's non-NULL show_img
                        # writes — phase one iteration earlier (see above)
                        writer.write(last_bgr)
                    if not prefix and not dont_show:
                        cv2.imshow("Demo", last_bgr)
                if prefix:
                    # reference -prefix saves EVERY count as PNG, repeating the
                    # stale frame between advances (main.c:538-542 saves disp,
                    # which only changes when delay==0)
                    if last_bgr is not None:
                        cv2.imwrite(f"{prefix}_{count:08d}.png", last_bgr)
                elif not dont_show:
                    # the reference polls the key every iteration (main.c:535)
                    if cv2.waitKey(1) == 27:
                        stop_all = True
                # screen-clear + FPS + "Objects:" header, once per frame like
                # the reference (main.c:431-435, byte-exact block). The
                # reference prints the object lines BEFORE its header (they
                # land under the PREVIOUS frame's header on screen); we print
                # header-then-objects — the same terminal rendering, raw
                # streams differing by exactly one block rotation
                # (tests/test_demo_parity.py pins both)
                print(f"\033[2J\033[1;1H\nFPS:{fps:.1f}\nObjects:\n\n"
                      f"{conv_echo}{objects}", flush=True, end="")
                delay -= 1
                if delay < 0:
                    delay = frame_skip
                    after = time.time()
                    # reference FPS is 1/window over the (frame_skip+1)-frame
                    # window — displayed-frames/s, not source-frames/s
                    # (main.c:563-570)
                    fps = 1.0 / max(after - before, 1e-6)
                    before = after
                if max_frames is not None and count >= max_frames:
                    stop_all = True
                if stop_all:
                    break
            if stop_all:
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
