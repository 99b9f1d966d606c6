"""b=1 serving latency: the in-jit multi-frame scan experiment (VERDICT r3 #2).

bench_latency.py fit device-resident yolov3-416 as t(b) = fixed + slope*b with
fixed = 0.7-0.9 ms — a PER-FORWARD floor measured inside an in-jit fori_loop,
i.e. already free of host dispatch. serve_scan (pipeline.py) is the serving
realization: ONE dispatch runs a resident ring of N frames sequentially at b=1
semantics (the analog of the reference's persistent pinned staging,
/root/reference/src/yolov2_forward_network_gpu.cu:547-572). This bench answers
two questions on the real chip:

1. What does a FULL serving iteration cost per frame (uint8 ingest -> forward
   -> decode+topK -> device NMS), once per-dispatch overhead is amortized?
   Measured by DIFFERENCING two ring sizes: t(N2)-t(N1) over N2-N1 frames
   cancels the constant dispatch + relay-RTT + scalar-fetch overhead exactly.
2. Can the 0.7-0.9 ms fixed floor be reduced by cutting op COUNT at b=1 with
   the fused residual-stage Pallas kernel (-int8_impl fused)? At b=128 it
   loses 2x to XLA on GEMM throughput (Mosaic int8 dot ~132 T vs XLA conv
   237-268 T, PERF_NOTES), but at b=1 the trunk is launch/fixed-cost-bound,
   not FLOPs-bound — fewer, larger kernels may win where faster GEMMs don't.

Methodology notes (the three traps, PERF_NOTES): every iteration consumes its
full packed output into the scan carry (no DCE), each iteration reads a
DIFFERENT ring frame (nothing loop-invariant to hoist), and the only D2H per
run is one scalar (no 11MB packed fetch poisoning the timing through the
~60MB/s relay).

Usage: python bench_serve.py [--modes int8,int8_fused,...] [--rings 16,128]
JSON lines on stdout; progress on stderr.
"""

import json
import os
import sys
import time

import numpy as np

N_SMALL, N_BIG = 16, 128
RUNS = 5


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def median_spread(run, n=RUNS):
    ts = sorted(run() for _ in range(n))
    return ts[n // 2], ts[0], ts[-1]


def build_bodies(spec, params, qparams, mode):
    """(label, body(p, frame)->scalar, params) for one measured mode.

    ``serve``-prefixed modes run the FULL serving program via the pipeline's
    own jit body (ingest+forward+decode+NMS — what a deployed frame pays);
    ``fwd``-prefixed ones run the bare forward (comparable to
    bench_latency.py's fixed+slope fit).
    """
    import jax.numpy as jnp
    from yolo2_light_tpu.models.network import build_forward
    from yolo2_light_tpu.pipeline import DetectionPipeline

    serve = mode.startswith("serve_")
    name = mode.split("_", 1)[1]
    quant = name.startswith("int8")
    kw = dict(compute_dtype=jnp.bfloat16)
    if "fused" in name:
        kw["int8_impl"] = "fused"
    turbo = "turbo" in name
    p_in = qparams if quant else params

    if serve:
        pipe = DetectionPipeline(
            spec, p_in, "int8" if quant else "fp32", thresh=0.24, nms=0.4,
            k=64, device_nms=True, turbo=turbo, int8_policy="cpu", **kw)
        run = pipe._run

        def body(p, frame):
            packed = run(p, frame[None])[0]
            return jnp.sum(packed.astype(jnp.float32))

        return body, pipe.params
    fwd = build_forward(spec, "int8" if quant else "fp32",
                        int8_policy="cpu", int8_chain=True,
                        residual_dtype=jnp.bfloat16 if turbo else None, **kw)

    def body(p, frame):
        heads, _ = fwd(p, frame[None].astype(jnp.float32) * (1.0 / 255.0))
        return sum(jnp.sum(h.data.astype(jnp.float32)) for h in heads)

    from yolo2_light_tpu.models.network import params_to_device
    return body, params_to_device(p_in)


def measure(body, p, spec, n):
    """Median wall seconds for ONE dispatch of an n-frame scan (scalar D2H)."""
    import jax
    import jax.numpy as jnp

    def loop(ring):
        def step(acc, frame):
            return acc + body(p, frame) * 1e-9, None
        acc, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32), ring)
        return acc

    f = jax.jit(loop)
    ring = jnp.asarray((np.random.RandomState(0).rand(
        n, spec.net.h, spec.net.w, spec.net.c) * 255).astype(np.uint8))
    t0 = time.perf_counter()
    float(f(ring))  # compile (block via host fetch: relay-safe)
    log(f"  compiled n={n} in {time.perf_counter() - t0:.1f}s")

    def run():
        t0 = time.perf_counter()
        float(f(ring))
        return time.perf_counter() - t0

    return median_spread(run)


def main():
    modes = ["serve_int8", "fwd_int8", "fwd_int8_fused"]
    rings = [N_SMALL, N_BIG]
    cfg = "/root/reference/bin/yolov3.cfg"
    for a in sys.argv[1:]:
        if a.startswith("--modes="):
            modes = a.split("=", 1)[1].split(",")
        if a.startswith("--rings="):
            rings = [int(x) for x in a.split("=", 1)[1].split(",")]
        if a.startswith("--cfg="):
            cfg = a.split("=", 1)[1]

    cache = os.path.expanduser("~/.cache/yolo2_light_tpu/xla")
    os.makedirs(cache, exist_ok=True)
    import jax
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import sparse_head_biases
    from yolo2_light_tpu.cfg import parse_network_cfg
    from yolo2_light_tpu.quant import quantize_params
    from yolo2_light_tpu.weights import fuse_conv_batchnorm, random_params

    t0 = time.time()
    log(f"device: {jax.devices()[0]}")
    spec = parse_network_cfg(cfg, batch=1)
    params = sparse_head_biases(
        spec, fuse_conv_batchnorm(spec, random_params(spec, seed=0)))
    qparams = quantize_params(spec, params)

    for mode in modes:
        body, p = build_bodies(spec, params, qparams, mode)
        res = {}
        for n in rings:
            med, lo, hi = measure(body, p, spec, n)
            res[n] = med
            log(f"{mode} n={n}: {med * 1e3:.1f} ms/dispatch "
                f"({lo * 1e3:.1f}-{hi * 1e3:.1f})")
        if len(rings) >= 2:
            n1, n2 = rings[0], rings[-1]
            per_frame = (res[n2] - res[n1]) / (n2 - n1) * 1e3
            dispatch = res[n1] * 1e3 - per_frame * n1
            print(json.dumps({
                "mode": mode, "per_frame_ms": round(per_frame, 4),
                "dispatch_overhead_ms": round(dispatch, 2),
                "rings": {str(n): round(res[n] * 1e3, 2) for n in rings},
            }), flush=True)
    log(f"total {time.time() - t0:.0f}s")


if __name__ == "__main__":
    main()
