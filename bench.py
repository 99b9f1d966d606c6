"""Benchmark: yolov3-416 inference throughput on one TPU chip.

Prints ONE JSON line on stdout; everything else goes to stderr.

Primary metric (re-based in round 3, see README "Performance"): streamed
frame->boxes throughput with camera-native YUV420 uint8 ingest at batch 64,
depth-3 in-flight queueing — the strongest *stable* end-to-end configuration
through this environment's ~60 MB/s host<->TPU relay (RGB ingest doubles the
H2D bytes and rides the relay's congestion moods; rounds 1-2 showed 30%
run-to-run swings). The run adaptively doubles the number of batches until the
min/max spread over the median drops under 10% (or a cap), and reports the
achieved spread.

Parsed secondary fields (same JSON line):
  * ``int8_device_ms_img`` / ``bf16_device_ms_img`` — device-resident forward
    latency per image at batch 128 (full-head-consumption in-jit loop; the
    chip's own capability, independent of the relay; ~1% spread).
After the JSON line, stderr-only extras re-measure the rounds-1/2 RGB-ingest
primary and the int8 streamed config for round-over-round comparability
(after, so a truncated run never loses the driver-facing line).

Baseline: the reference publishes no GPU fps; its fastest in-code CPU number is
the AVX2 INT8 conv pipeline at ~0.8 FPS/img
(src/yolov2_forward_network_quantized.c:212, see BASELINE.md). vs_baseline is
primary img/s over 0.8.

Methodology traps (cost this project three times, PERF_NOTES.md): fori_loop
inputs must depend on the carry (LICM), the carry must consume EVERY head's
full output (slice-narrowing/DCE), and sub-ms ops must amortize the 25-30 ms
relay RTT over in-jit iterations.
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_IMG_S = 0.8  # reference AVX2 INT8 CPU, ~1.35 s/img


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _enable_compile_cache():
    try:
        import jax
        d = os.path.expanduser("~/.cache/yolo2_light_tpu/xla")
        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


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


def device_resident_ms_img(spec, params, mode, batch=128, rep=10, runs=5,
                           **build_kw):
    """Device-resident forward latency per image: in-jit fori_loop whose input
    depends on the carry (no LICM) and whose carry consumes every head's full
    output (no DCE/slice narrowing). One D2H fetch per run amortized over rep
    iterations. Returns (median_ms, min_ms, max_ms)."""
    import jax
    import jax.numpy as jnp
    from yolo2_light_tpu.models.network import build_forward, params_to_device

    fwd = build_forward(spec, mode, **build_kw)
    p = params_to_device(params)

    def dev_loop(x):
        def body(i, acc):
            heads, _ = fwd(p, x + acc * 1e-12)
            return acc + sum(jnp.sum(h.data) for h in heads) * 1e-9
        return jax.lax.fori_loop(0, rep, body, 0.0)

    f = jax.jit(dev_loop)
    x = jnp.asarray(np.random.RandomState(0).rand(
        batch, spec.net.h, spec.net.w, spec.net.c).astype(np.float32))
    float(f(x))  # compile + settle (block via host fetch: relay-safe)

    def run():
        t0 = time.perf_counter()
        float(f(x))
        return (time.perf_counter() - t0) / rep

    dt, dt_min, dt_max = median_spread(run, runs)
    return (dt * 1e3 / batch, dt_min * 1e3 / batch, dt_max * 1e3 / batch)


def streamed_img_s(pipe, x, depth, n_batches, runs):
    """Streamed frame->boxes throughput; returns (median, min, max) img/s."""
    batch = x.shape[0]

    def run():
        t0 = time.perf_counter()
        for _ in pipe.stream([x] * n_batches, depth=depth, workers=1):
            pass
        return (time.perf_counter() - t0) / n_batches

    dt, dt_min, dt_max = median_spread(run, runs)
    return batch / dt, batch / dt_max, batch / dt_min


def main():
    _enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from yolo2_light_tpu.cfg import parse_network_cfg
    from yolo2_light_tpu.pipeline import DetectionPipeline
    from yolo2_light_tpu.quant import quantize_params
    from yolo2_light_tpu.weights import fuse_conv_batchnorm, random_params

    cfg = "/root/reference/bin/yolov3.cfg"
    if not os.path.exists(cfg):
        cfg = os.path.join(os.path.dirname(__file__), "tests/data/mini-yolo3.cfg")

    spec = parse_network_cfg(cfg, batch=1)
    params = sparse_head_biases(
        spec, fuse_conv_batchnorm(spec, random_params(spec, seed=0)))
    log(f"device: {jax.devices()[0]}")

    extra = {}

    # --- parsed secondary: device-resident chip capability (stable, ~1%) ----
    try:
        ms, ms_min, ms_max = device_resident_ms_img(
            spec, quantize_params(spec, params), "int8", int8_policy="cpu",
            int8_chain=True, compute_dtype=jnp.bfloat16)
        extra["int8_device_ms_img"] = round(ms, 3)
        extra["int8_device_ms_img_spread"] = [round(ms_min, 3), round(ms_max, 3)]
        log(f"device-resident int8(cpu semantics, bit-exact): {ms:.3f} ms/img "
            f"-> {1e3 / ms:.0f} img/s (spread {ms_min:.3f}-{ms_max:.3f})")
    except Exception as e:
        log(f"device-resident int8 probe failed: {e}")
    try:
        ms, ms_min, ms_max = device_resident_ms_img(
            spec, params, "fp32", compute_dtype=jnp.bfloat16)
        extra["bf16_device_ms_img"] = round(ms, 3)
        extra["bf16_device_ms_img_spread"] = [round(ms_min, 3), round(ms_max, 3)]
        log(f"device-resident fp32(bf16 MXU): {ms:.3f} ms/img "
            f"-> {1e3 / ms:.0f} img/s (spread {ms_min:.3f}-{ms_max:.3f})")
    except Exception as e:
        log(f"device-resident bf16 probe failed: {e}")

    # --- PRIMARY: streamed frame->boxes, YUV420 uint8 ingest, depth 3 --------
    # camera-native planar YUV420 [B, H*3/2, W] halves the H2D bytes of RGB;
    # depth-3 queueing overlaps relay transfers (PERF_NOTES.md). Adaptive:
    # double n_batches (amortizing relay mood swings) until spread < 10%.
    batch = 64
    pipe = DetectionPipeline(spec, params, thresh=0.24, nms=0.4, k=64,
                             compute_dtype=jnp.bfloat16,
                             packed_dtype=jnp.float16)
    yuv = (np.random.RandomState(1).rand(batch, spec.net.h * 3 // 2, spec.net.w)
           * 255).astype(np.uint8)
    pipe(yuv)  # compile
    value = spread_lo = spread_hi = 0.0
    spread_pct = 100.0
    n_batches = 16
    for attempt in range(3):
        img_s, lo, hi = streamed_img_s(pipe, yuv, depth=3,
                                       n_batches=n_batches, runs=7)
        spread_pct = 100.0 * (hi - lo) / img_s
        log(f"PRIMARY yuv420 streamed b={batch} depth=3 n_batches={n_batches}: "
            f"{img_s:.1f} img/s (min {lo:.1f}, max {hi:.1f}, "
            f"spread {spread_pct:.1f}%)")
        value, spread_lo, spread_hi = img_s, lo, hi
        if spread_pct < 10.0:
            break
        n_batches *= 2

    print(json.dumps({
        "metric": "yolov3-416_yuv420_stream_img_s",
        "value": round(value, 2),            # median of 7 runs
        "unit": "img/s",
        "vs_baseline": round(value / BASELINE_IMG_S, 1),
        "spread_min": round(spread_lo, 2),
        "spread_max": round(spread_hi, 2),
        "spread_pct": round(spread_pct, 1),
        "n_batches": n_batches,
        **extra,
    }), flush=True)

    # --- stderr-only extras (comparability with rounds 1-2) -----------------
    try:
        x = (np.random.RandomState(2).rand(32, spec.net.h, spec.net.w,
                                           spec.net.c) * 255).astype(np.uint8)
        pipe(x)
        img_s, lo, hi = streamed_img_s(pipe, x, depth=2, n_batches=8, runs=5)
        log(f"rgb streamed b=32 depth=2 (rounds-1/2 primary): {img_s:.1f} "
            f"img/s (min {lo:.1f}, max {hi:.1f})")
    except Exception as e:
        log(f"rgb probe failed: {e}")
    try:
        qparams = quantize_params(spec, params)
        pipe8 = DetectionPipeline(spec, qparams, "int8", thresh=0.24, nms=0.2,
                                  k=64, int8_policy="cpu",
                                  compute_dtype=jnp.bfloat16,
                                  packed_dtype=jnp.float16)
        yuv8 = yuv[:32]
        pipe8(yuv8)
        img_s, lo, hi = streamed_img_s(pipe8, yuv8, depth=3, n_batches=8,
                                       runs=5)
        log(f"int8(cpu semantics) yuv streamed b=32: {img_s:.1f} img/s "
            f"(min {lo:.1f}, max {hi:.1f})")
    except Exception as e:
        log(f"int8 streamed probe failed: {e}")


if __name__ == "__main__":
    main()
