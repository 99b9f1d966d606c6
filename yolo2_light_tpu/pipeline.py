"""Fused frame->boxes serving pipeline: (optional uint8 normalize) + network forward +
on-device decode/compaction (+ optionally greedy NMS, ``device_nms=True``) in ONE
jitted XLA program; host does only exact NMS (or, with device NMS, none) +
formatting over <=K candidates.

This is the TPU-native answer to the reference's predict->get_network_boxes->NMS chain
(src/main.c:199-230). Two transfer optimizations matter on real hardware:

* inputs ship as uint8 ([0,255]) and are normalized to [0,1] on device — 4x less H2D
  than fp32 (the reference ships fp32, src/yolov2_forward_network_gpu.cu:556-558);
* the device returns ONE packed [K, 4+1+classes] candidate buffer per image instead
  of full head maps (tens of MB) or multiple buffers (round trip per buffer).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .cfg import ModelSpec, RegionSpec, YoloSpec
from .models.network import (build_forward, params_to_device,
                             resolve_residual_dtype)
from .post import boxes as post
from .post.device_decode import decode_and_compact_packed


def _fetch_packed(raw):
    """D2H fetch of a packed candidate buffer, as ONE host transfer. Always
    f32 on the host in production (any packed_dtype upcasts); a float64
    buffer stays f64 — that only exists under the fuzz noise-confirmation
    rerun (tests/fuzz_confirm.py), which needs full-precision host math."""
    a = np.asarray(raw)
    return a if a.dtype == np.float64 else a.astype(np.float32)


def yuv420_to_rgb(x):
    """Planar YUV420 (I420) [B, H*3/2, W] uint8 -> RGB f32 [B,H,W,3] in [0,1].

    BT.601 full-range conversion on device; U/V planes are nearest-upsampled 2x.
    Half the host->device bytes of uint8 RGB — the natural ingest format for
    camera/video sources (codecs emit YUV, not RGB)."""
    b, h32, w = x.shape
    h = (h32 * 2) // 3
    y = x[:, :h, :].astype(jnp.float32)
    u = x[:, h: h + h // 4, :].reshape(b, h // 2, w // 2).astype(jnp.float32)
    v = x[:, h + h // 4:, :].reshape(b, h // 2, w // 2).astype(jnp.float32)
    u = jnp.repeat(jnp.repeat(u, 2, axis=1), 2, axis=2) - 128.0
    v = jnp.repeat(jnp.repeat(v, 2, axis=1), 2, axis=2) - 128.0
    r = y + 1.402 * v
    g = y - 0.344136 * u - 0.714136 * v
    bch = y + 1.772 * u
    rgb = jnp.stack([r, g, bch], axis=-1)
    return jnp.clip(rgb, 0.0, 255.0) * (1.0 / 255.0)


class DetectionPipeline:
    """End-to-end detector: ``__call__(images) -> list[Detections]``.

    ``images``: [B,H,W,C] uint8 (preferred, [0,255]) or float32 in [0,1].
    Frames whose spatial dims differ from the net's are resized ON DEVICE with
    the darknet-exact bilinear (ops/resize.py) — ship raw camera frames and
    keep the serving host out of the resize entirely (all frames of a batch
    share one source size; one jit program per distinct source size).

    ``device_nms=True`` fuses exact greedy NMS (post/device_nms.py) into the
    jitted program: the packed buffer arrives pre-suppressed and the host skips
    ``do_nms_sort`` entirely — same detections (tests/test_device_nms.py), no
    host post-processing beyond coordinate correction and formatting.
    """

    def __init__(self, spec: ModelSpec, params: list, mode: str = "fp32", *,
                 thresh: float = 0.24, nms: float = 0.4, k: int = 256,
                 int8_policy: str = "cpu", compute_dtype=jnp.float32,
                 letter: bool = False, packed_dtype=jnp.float32,
                 xnor_impl: str = "int8", mesh=None, device_nms: bool = False,
                 turbo: bool = False, int8_impl: str = "xla",
                 pp_stages: int = 0, pp_microbatch: int = 1, pp_tp: int = 1):
        import threading
        self.spec = spec
        self.thresh = thresh
        self.nms = nms
        self.k = k
        self._grow_lock = threading.Lock()
        self.letter = letter
        self.device_nms = bool(device_nms and nms)
        self._mode = mode
        self._int8_policy = int8_policy
        self._compute_dtype = compute_dtype
        self._xnor_impl = xnor_impl
        self._int8_impl = int8_impl
        self._turbo = turbo   # False | True/"bf16" | "int8" (turbo_int8)
        self._mesh = mesh
        self._packed_dtype = packed_dtype
        self._pp_stages = int(pp_stages)
        self._pp_microbatch = int(pp_microbatch)
        self._pp_tp = max(1, int(pp_tp))
        if pp_stages > 1 and mesh is not None:
            raise ValueError("pp_stages and mesh are mutually exclusive "
                             "(pipeline stages own whole devices)")
        self._pp = None
        if pp_stages > 1:
            # pipeline parallelism (parallel/pp.py): the forward runs stage-
            # split across devices; ingest jits on the first stage's device
            # and decode/NMS on the last — so the packed buffer still leaves
            # from ONE device
            from .parallel.pp import PipelinedPredictor
            self._pp = PipelinedPredictor(
                spec, params, mode, n_stages=pp_stages,
                microbatch=max(1, pp_microbatch), int8_policy=int8_policy,
                compute_dtype=compute_dtype, xnor_impl=xnor_impl,
                int8_impl=int8_impl, turbo=turbo, tp=self._pp_tp)
        if mesh is not None and (mesh.shape.get("model", 1) > 1
                                 or mesh.shape.get("space", 1) > 1):
            # tensor-parallel: shard straight from the host params —
            # params_to_device would commit everything to device 0 first and
            # shard_params' np.asarray would then fetch it all back (a wasted
            # full-weights round trip through the ~60MB/s relay)
            from .parallel.mesh import shard_params
            self.params = shard_params(spec, params, mesh)
        elif self._pp is not None:
            # stage params already committed per device by PipelinedPredictor;
            # keep the host copy (used only by _grown re-construction)
            self.params = params
        else:
            self.params = params_to_device(params)
        self.head_specs = [l for l in spec.layers
                           if isinstance(l, (YoloSpec, RegionSpec))]
        self.classes = self.head_specs[-1].classes
        # total raw candidates the net can produce (sum over heads of
        # h*w*anchors): decode's top_k clamps to this N, so K >= N cannot
        # drop a detection — it is the saturation auto-grow ceiling (the
        # reference has no cap at all, its host arrays are dynamic;
        # additionally.c keeps every above-threshold box). device_nms keeps
        # a 4096 cap: its per-image [K,K] IoU matrix is O(K^2) memory
        # (post/device_nms.py:72).
        self._total_candidates = sum(l.out_h * l.out_w * l.n
                                     for l in self.head_specs)
        fwd = build_forward(spec, mode, int8_policy=int8_policy,
                            compute_dtype=compute_dtype, xnor_impl=xnor_impl,
                            int8_chain=True, int8_impl=int8_impl,
                            residual_dtype=resolve_residual_dtype(turbo))
        netw, neth = spec.net.w, spec.net.h
        head_specs = self.head_specs

        use_device_nms = self.device_nms
        nms_thresh = nms

        def ingest(x):
            if x.ndim == 3:
                # planar YUV420 ingest [B, H*3/2, W] uint8 — camera/codec-native,
                # half the H2D bytes of RGB; BT.601 conversion on device
                x = yuv420_to_rgb(x)
            if x.dtype == jnp.uint8:
                x = x.astype(jnp.float32) * (1.0 / 255.0)
            if x.shape[1] != neth or x.shape[2] != netw:
                # source-resolution frames: darknet-exact bilinear resize ON
                # DEVICE (ops/resize.py) — the reference resizes every input to
                # net dims on the host (src/main.c:188, additionally.c:3021);
                # shipping raw camera bytes instead frees the serving host and,
                # with uint8 ingest, removes the resize-then-requantize error
                from .ops.resize import device_resize_image
                x = device_resize_image(x, netw, neth)
            return x

        def post(head_datas):
            # BOTH paths build the buffer in DECODE order (the reference
            # NMS's tie-break order — post/device_decode.py): the host path
            # runs do_nms_sort over it; device NMS seeds its carried-qsort
            # permutation from it and returns rows already permuted to the
            # reference's POST-NMS order (post/device_nms.py, round 5)
            packed = decode_and_compact_packed(list(head_datas),
                                               head_specs, netw, neth, thresh,
                                               k, decode_order=True)
            if use_device_nms:
                # NMS on chip (post/device_nms.py): the buffer leaves the device
                # already suppressed. Suppression zeroes probs, which would hide
                # buffer saturation from the host — so a PRE-NMS saturation
                # FLAG (1.0 iff every slot held a candidate) rides along as one
                # extra all-zero row (still a single D2H buffer; 0/1 survives
                # any packed_dtype exactly, unlike a raw count, which would
                # round in bf16/f16 for larger k)
                from .post.device_nms import nms_packed
                if packed_dtype != packed.dtype:
                    # host-path parity: host NMS sees post-D2H packed_dtype
                    # values, so round through packed_dtype before suppressing
                    # to keep both paths picking the same suppression set
                    packed = packed.astype(packed_dtype).astype(packed.dtype)
                score = jnp.max(packed[..., 5:], axis=-1)
                if packed.shape[1] == k:
                    saturated = jnp.all(score > 0, axis=-1)
                else:
                    # buffer holds EVERY decoded candidate (total N < k):
                    # all-nonzero is not truncation
                    saturated = jnp.zeros(packed.shape[0], bool)
                packed = nms_packed(packed, nms_thresh)
                extra = jnp.zeros((packed.shape[0], 1, packed.shape[2]),
                                  packed.dtype)
                extra = extra.at[:, 0, 0].set(saturated.astype(packed.dtype))
                packed = jnp.concatenate([packed, extra], axis=1)
            return packed.astype(packed_dtype)

        def run(p, x):
            heads, _ = fwd(p, ingest(x))
            return post([h.data for h in heads])

        self._run = run  # uncompiled body, reused by serve_scan's in-jit loop
        self._serve_jit = None
        self._pp_ingest = jax.jit(ingest)
        self._pp_post = jax.jit(post)

        if mesh is not None:
            # data-parallel sharding over the batch axis: each chip runs the net
            # on its shard of images (no collectives; SURVEY §2.8 — the idiomatic
            # TPU analog of the reference's 4-thread loader). A "model" axis > 1
            # additionally shards conv output channels tensor-parallel: GSPMD
            # propagates the channel sharding and inserts all-gathers only where
            # routes/heads demand (parallel/mesh.py). A "space" axis > 1 shards
            # activation ROWS (spatial partitioning, GSPMD halo exchanges) —
            # the axis that divides single-image latency; not compatible with
            # planar-YUV ingest (its H*3/2 packing has no clean row sharding).
            from jax.sharding import NamedSharding, PartitionSpec as P
            from .parallel.mesh import x_partition_spec
            x_sharding = NamedSharding(mesh, x_partition_spec(mesh))
            out_sharding = NamedSharding(mesh, P("data", None, None))
            self._jitted = jax.jit(run, in_shardings=(None, x_sharding),
                                   out_shardings=out_sharding)
            self.data_parallel = int(mesh.shape["data"])
        else:
            self._jitted = jax.jit(run)
            self.data_parallel = 1

    def raw(self, images):
        """Packed device output [B,K,4+1+classes] — still on device."""
        if self._pp is not None:
            dev0, devN = self._pp.placements[0], self._pp.placements[-1]
            x = self._pp_ingest(jax.device_put(jnp.asarray(images), dev0))
            heads, _ = self._pp(x)
            datas = [jax.device_put(h.data, devN) for h in heads]
            return self._pp_post(datas)
        return self._jitted(self.params, jnp.asarray(images))

    def dispatch(self, images):
        """Start a batch asynchronously: H2D + enqueue the jitted program.
        Returns a ticket for :meth:`collect`. Do host work (e.g. load the next
        batch) BETWEEN dispatch and collect — the device crunches meanwhile,
        and on a single-core host the collect-side relay transfer must run on
        a QUIET host or it starves under CPU contention (measured 1.6s -> 41s
        per 11MB fetch with loader threads active; PERF_NOTES)."""
        promoted = getattr(self, "_promoted", None)
        if promoted is not None:
            return promoted.dispatch(images)
        return (self, self.raw(images), images)

    def collect(self, ticket, im_sizes=None):
        """Blocking half of :meth:`dispatch`: one D2H fetch, saturation
        handling (auto-grow re-run of the kept input batch), host finish."""
        pipe, raw_dev, images = ticket
        if im_sizes is None:
            # device-resized source frames: coordinates correct back to the
            # SOURCE dims by default, matching the reference's im.w/im.h
            # arguments (src/main.c:222)
            shp = np.shape(images)
            if len(shp) == 3:                       # planar YUV420 [B,H*3/2,W]
                sw, sh = shp[2], shp[1] * 2 // 3
            else:
                sw, sh = shp[2], shp[1]
            if (sw, sh) != (pipe.spec.net.w, pipe.spec.net.h):
                im_sizes = [(sw, sh)] * shp[0]
        packed = _fetch_packed(raw_dev)        # one D2H transfer
        if pipe._saturated(packed) and pipe.k < pipe._max_k:
            grown = pipe._grow_and_promote()
            return grown(images, im_sizes)
        return pipe._finish_batch(packed, im_sizes)

    @property
    def _max_k(self) -> int:
        """Auto-grow ceiling: the net's total candidate count (K >= N cannot
        drop anything), bounded at 4096 under device_nms (O(K^2) IoU)."""
        return (min(4096, self._total_candidates) if self.device_nms
                else self._total_candidates)

    def _saturated(self, packed: np.ndarray) -> bool:
        """True when this pipeline's candidate buffer filled for any image of
        an already-fetched packed batch (detections may have been dropped)."""
        if self.k >= self._total_candidates:
            # K covers every decodable candidate: full slots just mean every
            # candidate passed the threshold — nothing can have been dropped
            return False
        rows = self.k + 1 if self.device_nms else self.k  # +1: flag row
        if packed.shape[1] != rows:
            return False
        if self.device_nms:
            return bool((packed[:, -1, 0] > 0).any())
        return bool((packed[:, :, 5:].max(axis=-1) > 0).all(axis=-1).any())

    def _grow_and_promote(self) -> "DetectionPipeline":
        """Build (or reuse) the Kx4 pipeline and promote future dispatches to
        it. Thread-safe: stream() grows from finish-worker threads."""
        import sys
        with self._grow_lock:
            new_k = min(self._max_k, self.k * 4)
            print(f"note: candidate buffer K={self.k} saturated; re-running "
                  f"batch with K={new_k} (future batches use the grown buffer)",
                  file=sys.stderr)
            grown = self._grown(new_k)
            # promote: saturating workloads shouldn't pay a double forward
            # per batch
            self._promoted = grown
            return grown

    def _finish_batch(self, packed: np.ndarray, im_sizes=None):
        """Per-image host finish over an already-fetched packed batch."""
        netw, neth = self.spec.net.w, self.spec.net.h
        out = []
        for i in range(packed.shape[0]):
            w, h = im_sizes[i] if im_sizes is not None else (netw, neth)
            out.append(self._finish(packed[i], w, h))
        return out

    def serve_scan(self, frames, im_sizes=None):
        """In-jit multi-frame serving loop: ONE dispatch runs a resident ring
        of N frames SEQUENTIALLY at b=1 semantics (``lax.scan`` over the
        leading axis) and returns every frame's detections from ONE packed
        D2H fetch.

        This is the single-chip analog of the reference's persistent pinned
        staging (src/yolov2_forward_network_gpu.cu:547-572): instead of paying
        the per-dispatch overhead (relay round trip + program launch) once per
        frame, the whole ring pays it once. Each scan iteration is the exact
        b=1 program — no cross-frame batching, so results are bit-identical
        to frame-at-a-time calls (tests/test_serve_scan.py); what remains per
        frame is the chip-side fixed cost of the 107-layer graph itself
        (bench_latency.py measures both components; PERF_NOTES 'Single-image
        latency').

        ``frames``: [N, H, W, C] f32/uint8 (or planar YUV420 [N, H*3/2, W]) —
        any source size (device auto-resize applies per frame). Returns
        list[Detections], saturation auto-grow included.

        The ring is NOT donated: the only output is the packed detection
        buffer, whose shape/dtype can never alias the ring, so donation would
        be an XLA no-op that just warns; scan consumes the ring read-only.
        """
        if self._pp is not None or self._mesh is not None:
            raise ValueError("serve_scan is the single-device serving loop; "
                             "compose pp/mesh with batch dispatch instead")
        promoted = getattr(self, "_promoted", None)
        if promoted is not None:
            return promoted.serve_scan(frames, im_sizes)
        if self._serve_jit is None:
            run = self._run

            def serve(p, ring):
                def body(carry, frame):
                    return carry, run(p, frame[None])[0]
                _, packed = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                                         ring)
                return packed

            self._serve_jit = jax.jit(serve)
        raw = self._serve_jit(self.params, jnp.asarray(frames))
        if im_sizes is None:
            shp = np.shape(frames)
            if len(shp) == 3:                       # planar YUV420 [N,H*3/2,W]
                sw, sh = shp[2], shp[1] * 2 // 3
            else:
                sw, sh = shp[2], shp[1]
            if (sw, sh) != (self.spec.net.w, self.spec.net.h):
                im_sizes = [(sw, sh)] * shp[0]
        packed = _fetch_packed(raw)            # one D2H transfer
        if self._saturated(packed) and self.k < self._max_k:
            grown = self._grow_and_promote()
            return grown.serve_scan(frames, im_sizes)
        return self._finish_batch(packed, im_sizes)

    def __call__(self, images, im_sizes=None):
        """Full pipeline for a batch. ``im_sizes``: list of (w,h) original image sizes
        for coordinate correction (defaults to net dims). Returns list[Detections]
        after exact per-class NMS.

        If the candidate buffer saturates (all K slots used — detections may have
        been dropped), the batch transparently re-runs with K x4, up to the
        net's total candidate count (4096 under device_nms).
        """
        return self.collect(self.dispatch(images), im_sizes)

    def _grown(self, new_k: int) -> "DetectionPipeline":
        """A pipeline identical to this one but with a larger candidate buffer
        (cached so repeated saturation doesn't recompile every batch)."""
        cached = getattr(self, "_grown_cache", None)
        if cached is None or cached.k != new_k:
            cached = DetectionPipeline(
                self.spec, self.params, self._mode, thresh=self.thresh,
                nms=self.nms, k=new_k, int8_policy=self._int8_policy,
                compute_dtype=self._compute_dtype, letter=self.letter,
                xnor_impl=self._xnor_impl, mesh=self._mesh,
                packed_dtype=self._packed_dtype, device_nms=self.device_nms,
                turbo=self._turbo, int8_impl=self._int8_impl,
                pp_stages=self._pp_stages, pp_microbatch=self._pp_microbatch,
                pp_tp=self._pp_tp)
            self._grown_cache = cached
        return cached

    def stream(self, batches, im_sizes_iter=None, depth: int = 2,
               workers: int = 1):
        """Pipelined streaming inference: keeps ``depth`` batches in flight on the
        device AND runs the host finish stage (D2H fetch + NMS) in ``workers``
        threads, so H2D, device compute, D2H and host NMS all overlap. One worker
        is optimal on relay-attached chips (concurrent fetches contend); more can
        help with direct-attached hardware (the
        TPU-native analog of the reference demo's fetch/detect thread pair,
        src/main.c:490-572; the native C++ NMS releases the GIL during the call).

        ``batches``: iterable of [B,H,W,C] arrays. Yields lists of Detections in
        submission order. Saturation auto-grows the candidate buffer exactly
        like ``__call__``: the saturated batch re-runs at Kx4 (one extra
        forward) and every LATER dispatch uses the grown pipeline; batches
        already in flight at the old K re-run individually if they also
        saturated. Size ``k`` up front to avoid the re-run cost.
        """
        import threading
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        # At most ONE old-K in-flight batch re-runs at a time: several
        # concurrent full forwards on worker threads starve the in-flight
        # relay transfers ~25x on this 1-core host (CLAUDE.md starvation
        # gotcha; round-4 advisor finding).
        rerun_lock = threading.Lock()

        def finish_batch(pipe, packed_dev, sizes, xb):
            packed = _fetch_packed(packed_dev)
            if pipe._saturated(packed) and pipe.k < pipe._max_k:
                grown = pipe._grow_and_promote()
                with rerun_lock:
                    return grown(xb, sizes)
            return pipe._finish_batch(packed, sizes)

        it = iter(batches)
        sizes_it = iter(im_sizes_iter) if im_sizes_iter is not None else None
        inflight: deque = deque()
        done = False
        with ThreadPoolExecutor(max_workers=max(1, workers)) as pool:
            while True:
                while not done and len(inflight) < depth:
                    try:
                        xb = next(it)
                    except StopIteration:
                        done = True
                        break
                    sizes = (next(sizes_it) if sizes_it is not None else None)
                    src = self
                    while getattr(src, "_promoted", None) is not None:
                        src = src._promoted
                    inflight.append(pool.submit(finish_batch, src,
                                                src.raw(xb), sizes, xb))
                if not inflight:
                    return
                yield inflight.popleft().result()

    def _finish(self, packed_i: np.ndarray, w: int, h: int):
        saturated = False
        if self.device_nms:
            # last row is the pre-NMS saturation flag (see run()); probs are
            # already suppressed on device, so no host NMS
            saturated = packed_i[-1, 0] > 0
            packed_i = packed_i[:-1]
        boxes = packed_i[:, :4]
        obj = packed_i[:, 4]
        probs = packed_i[:, 5:]
        keep = probs.max(axis=-1) > 0
        if (self.k < self._total_candidates
                and (saturated or (keep.all()
                                   and packed_i.shape[0] == self.k))):
            import sys
            print(f"warning: candidate buffer K={self.k} saturated; "
                  "some detections may be dropped (raise k)", file=sys.stderr)
        boxes, obj, probs = boxes[keep], obj[keep], probs[keep]
        # dtype follows the packed buffer: f32 in production; f64 only under
        # packed_dtype=float64 (the fuzz noise-confirmation map rerun)
        dt = np.float64 if packed_i.dtype == np.float64 else np.float32
        boxes = post.correct_boxes(boxes.astype(dt), w, h,
                                   self.spec.net.w, self.spec.net.h,
                                   relative=True, letter=self.letter)
        dets = post.Detections(boxes.astype(dt), obj.astype(dt),
                               probs.astype(dt))
        if self.nms and not self.device_nms:
            post.do_nms_sort(dets, self.classes, self.nms)
        return dets
