"""Benchmark: yolov3-416 inference throughput on one TPU chip.

Prints ONE JSON line (value = median of 5 runs; spread_min/max document relay noise):
  {"metric": "yolov3-416_fp32_img_s", "value": N, "unit": "img/s", "vs_baseline": R,
   "spread_min": N, "spread_max": N}

Baseline: the reference publishes no GPU fps; its fastest in-code CPU number is the
AVX2 INT8 conv pipeline at ~0.8 FPS / image (src/yolov2_forward_network_quantized.c:212,
see BASELINE.md). vs_baseline is img/s relative to that 0.8 img/s.

All non-JSON output goes to stderr.
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_IMG_S = 0.8  # reference AVX2 INT8 CPU, ~1.35 s/img


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_once(fn, args, iters=10):
    import jax
    # warmup (compile + 2 steady)
    for _ in range(3):
        out = fn(*args)
        jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def median_spread(run, n=5):
    """Median-of-n with (min, max): the relay's throughput is noisy run-to-run,
    and best-of-N enshrines single-run highs (round-1 lesson). ``run()`` returns
    a duration; result is (median, min, max)."""
    ts = sorted(run() for _ in range(n))
    return ts[n // 2], ts[0], ts[-1]


def sparse_head_biases(spec, params):
    """Push objectness/t0 biases of the head convs to -6 so random-weight nets
    produce realistically sparse detections (sigmoid(-12) ~ 6e-6 < thresh)."""
    from yolo2_light_tpu.cfg import ConvSpec, RegionSpec, YoloSpec
    for l in spec.layers:
        if isinstance(l, (YoloSpec, RegionSpec)):
            conv = spec.layers[l.index - 1]
            if not isinstance(conv, ConvSpec):
                continue
            p = params[conv.index]
            entries = l.out_c // l.n
            # damp the head conv so logits stay small despite the random deep net
            p["weights"] = np.asarray(p["weights"]) * 0.02
            b = np.asarray(p["biases"]).copy() * 0.02
            obj_entry = 4 if isinstance(l, YoloSpec) else l.coords
            for a in range(l.n):
                b[a * entries + obj_entry] = -8.0
            p["biases"] = b
    return params


def main():
    import jax
    import jax.numpy as jnp

    from yolo2_light_tpu.cfg import parse_network_cfg
    from yolo2_light_tpu.pipeline import DetectionPipeline
    from yolo2_light_tpu.weights import fuse_conv_batchnorm, random_params

    cfg = "/root/reference/bin/yolov3.cfg"
    if not os.path.exists(cfg):
        cfg = os.path.join(os.path.dirname(__file__), "tests/data/mini-yolo3.cfg")

    spec = parse_network_cfg(cfg, batch=1)
    params = sparse_head_biases(
        spec, fuse_conv_batchnorm(spec, random_params(spec, seed=0)))
    log(f"device: {jax.devices()[0]}")

    best = (0.0, None, 0.0, 0.0)
    for batch in (32, 64):
        pipe = DetectionPipeline(spec, params, thresh=0.24, nms=0.4, k=64,
                                 compute_dtype=jnp.bfloat16,
                                 packed_dtype=jnp.float16)
        x = (np.random.rand(batch, spec.net.h, spec.net.w, spec.net.c)
             * 255).astype(np.uint8)
        n_batches = 8

        def run():
            # streamed frame->boxes: H2D/compute/D2H/host-NMS overlapped
            t0 = time.perf_counter()
            for dets in pipe.stream([x] * n_batches, depth=2, workers=1):
                pass
            return (time.perf_counter() - t0) / n_batches

        try:
            pipe(x)  # warmup/compile
            run()
            dt, dt_min, dt_max = median_spread(run, 5)
        except Exception as e:  # OOM at large batch etc.
            log(f"batch={batch} failed: {e}")
            continue
        img_s = batch / dt
        log(f"fp32(bf16 MXU) streamed frame->boxes batch={batch}: "
            f"{dt * 1e3:.2f} ms/batch -> {img_s:.1f} img/s "
            f"(min {batch / dt_max:.1f}, max {batch / dt_min:.1f})")
        if img_s > best[0]:
            best = (img_s, batch, batch / dt_max, batch / dt_min)

    # Emit the primary metric NOW: the secondary probes below take minutes
    # through the relay (fresh compiles, per-line median-of-5) and a truncated
    # run must not lose the driver-facing JSON line.
    value = round(best[0], 2)
    print(json.dumps({
        "metric": "yolov3-416_fp32_img_s",
        "value": value,                      # median of 5 runs
        "unit": "img/s",
        "vs_baseline": round(value / BASELINE_IMG_S, 1),
        "spread_min": round(best[2], 2),
        "spread_max": round(best[3], 2),
    }), flush=True)

    # secondary: INT8 streamed e2e (reference CPU semantics, chained activations)
    try:
        from yolo2_light_tpu.quant import quantize_params
        qparams = quantize_params(spec, params)
        batch = 32
        # float-side convs (layer 0 + linear heads) ride the bf16 MXU; the int8
        # convs themselves are exact int32-accumulation semantics either way
        pipe = DetectionPipeline(spec, qparams, "int8", thresh=0.24, nms=0.2,
                                 k=64, int8_policy="cpu",
                                 compute_dtype=jnp.bfloat16,
                                 packed_dtype=jnp.float16)
        x = (np.random.rand(batch, spec.net.h, spec.net.w, spec.net.c)
             * 255).astype(np.uint8)
        n_batches = 8
        pipe(x)

        def run_i8():
            t0 = time.perf_counter()
            for dets in pipe.stream([x] * n_batches, depth=2, workers=1):
                pass
            return (time.perf_counter() - t0) / n_batches

        run_i8()
        dt, dt_min, dt_max = median_spread(run_i8, 5)
        log(f"int8(cpu semantics) streamed batch={batch}: {dt * 1e3:.2f} "
            f"ms/batch -> {batch / dt:.1f} img/s "
            f"(min {batch / dt_max:.1f}, max {batch / dt_min:.1f})")
    except Exception as e:
        log(f"int8 probe failed: {e}")

    # secondary: camera-native YUV420 ingest (half the H2D bytes of RGB)
    try:
        batch = 64
        pipe = DetectionPipeline(spec, params, thresh=0.24, nms=0.4, k=64,
                                 compute_dtype=jnp.bfloat16,
                                 packed_dtype=jnp.float16)
        yuv = (np.random.rand(batch, spec.net.h * 3 // 2, spec.net.w)
               * 255).astype(np.uint8)
        n_batches = 8
        pipe(yuv)

        def run_yuv():
            # depth 3: the yuv payload is half of RGB's, so a deeper in-flight
            # queue overlaps relay transfers without congesting it (RGB at
            # depth>=3 measured slower — congestion; yuv 165->176 img/s)
            t0 = time.perf_counter()
            for dets in pipe.stream([yuv] * n_batches, depth=3, workers=1):
                pass
            return (time.perf_counter() - t0) / n_batches

        run_yuv()
        dt, dt_min, dt_max = median_spread(run_yuv, 5)
        log(f"yuv420-ingest streamed batch={batch}: {dt * 1e3:.2f} ms/batch "
            f"-> {batch / dt:.1f} img/s "
            f"(min {batch / dt_max:.1f}, max {batch / dt_min:.1f})")
    except Exception as e:
        log(f"yuv420 probe failed: {e}")

    # secondary: device-resident throughput (input already on-chip) — what the
    # chip itself sustains without this environment's ~60MB/s host tunnel
    try:
        import jax.numpy as jnp
        from yolo2_light_tpu.models.network import build_forward, params_to_device
        fwd = build_forward(spec, "fp32", compute_dtype=jnp.bfloat16)
        p = params_to_device(params)
        REP = 10
        batch = 128  # throughput peaks at b=128 (batch sweep in PERF_NOTES.md)

        def dev_loop(x):
            def body(i, acc):
                heads, _ = fwd(p, x + acc * 1e-12)  # defeat loop hoisting
                # consume EVERY head's FULL output: a slice-only carry lets XLA
                # DCE the unconsumed head branches / narrow the final convs
                # (PERF_NOTES.md methodology trap #2)
                return acc + sum(jnp.sum(h.data) for h in heads) * 1e-9
            return jax.lax.fori_loop(0, REP, body, 0.0)

        f = jax.jit(dev_loop)
        x = jnp.asarray(np.random.rand(batch, spec.net.h, spec.net.w,
                                       spec.net.c).astype(np.float32))
        float(f(x))

        def run_dev():
            t0 = time.perf_counter()
            float(f(x))
            return (time.perf_counter() - t0) / REP

        dt, dt_min, dt_max = median_spread(run_dev, 5)
        log(f"device-resident fp32(bf16) forward: {dt * 1e3 / batch:.3f} ms/img "
            f"-> {batch / dt:.0f} img/s "
            f"(min {batch / dt_max:.0f}, max {batch / dt_min:.0f})")
    except Exception as e:
        log(f"device-resident probe failed: {e}")

    # secondary: INT8 device-resident (bit-exact reference cpu semantics; float-
    # side convs on the bf16 MXU) — the fastest yolov3 mode on-chip since the
    # shift-based requant (PERF_NOTES.md)
    try:
        from yolo2_light_tpu.quant import quantize_params as _qp
        fwd8 = build_forward(spec, "int8", int8_policy="cpu", int8_chain=True,
                             compute_dtype=jnp.bfloat16)
        p8 = params_to_device(_qp(spec, params))
        batch = 128  # 0.420 ms/img at b=128; plateau ~0.413 through b=384

        def dev_loop8(x):
            def body(i, acc):
                heads, _ = fwd8(p8, x + acc * 1e-12)
                # full consumption of all heads (see fp32 probe note)
                return acc + sum(jnp.sum(h.data) for h in heads) * 1e-9
            return jax.lax.fori_loop(0, REP, body, 0.0)

        f8 = jax.jit(dev_loop8)
        x = jnp.asarray(np.random.rand(batch, spec.net.h, spec.net.w,
                                       spec.net.c).astype(np.float32))
        float(f8(x))

        def run_dev8():
            t0 = time.perf_counter()
            float(f8(x))
            return (time.perf_counter() - t0) / REP

        dt, dt_min, dt_max = median_spread(run_dev8, 5)
        log(f"device-resident int8(cpu semantics) forward: "
            f"{dt * 1e3 / batch:.3f} ms/img -> {batch / dt:.0f} img/s "
            f"(min {batch / dt_max:.0f}, max {batch / dt_min:.0f})")
    except Exception as e:
        log(f"device-resident int8 probe failed: {e}")

if __name__ == "__main__":
    main()
