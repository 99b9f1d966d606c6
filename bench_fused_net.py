"""Integrated fused-stage engine vs XLA through the FULL yolov3 builder.

bench_fused_stage.py measured the kernels standalone; this drives
models/network.build_forward(int8_impl="fused") end-to-end on the real
chip: pattern-matched stages (res104 K=2, res52 K=8, res26 K=7+1,
res13 K=1 x4 after VMEM splitting) run as Pallas kernels, everything else
XLA. Asserts bit-exactness against the default engine and reports both
latencies under the full-head-consumption fori harness (PERF_NOTES.md
methodology).

Usage: python bench_fused_net.py [batch] [rep]
"""

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from yolo2_light_tpu.cfg import parse_network_cfg
    from yolo2_light_tpu.models.network import (_fused_stage_runs,
                                                _int8_layer_set,
                                                build_forward,
                                                params_to_device)
    from yolo2_light_tpu.quant import quantize_params
    from yolo2_light_tpu.weights import fuse_conv_batchnorm, random_params

    cache = os.path.expanduser("~/.cache/yolo2_light_tpu/xla")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    rep = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    cfg = "/root/reference/bin/yolov3.cfg"
    spec = parse_network_cfg(cfg, batch=1)
    params = quantize_params(
        spec, fuse_conv_batchnorm(spec, random_params(spec, seed=0)))
    dev = params_to_device(params)
    log(f"device: {jax.devices()[0]}  batch={batch} rep={rep}")

    runs = _fused_stage_runs(spec, _int8_layer_set(spec, "cpu"))
    # mirror build_forward's gate: the C%128 DMA-tiling filter applies on TPU
    # only (interpret mode has no lane-tiling limit)
    if jax.default_backend() == "tpu":
        eligible = {s: r for s, r in runs.items()
                    if spec.layers[s].c % 128 == 0}
    else:
        eligible = runs
    log(f"pattern-matched runs: {len(runs)} "
        f"({sum(len(r) for r in runs.values())} blocks); "
        f"eligible on this backend: {len(eligible)} "
        f"({sum(len(r) for r in eligible.values())} blocks)")

    results = {"batch": batch, "rep": rep,
               "fused_runs": len(eligible),
               "fused_blocks": sum(len(r) for r in eligible.values())}
    outs = {}
    x_small = jnp.asarray(np.random.RandomState(0).rand(
        2, spec.net.h, spec.net.w, spec.net.c).astype(np.float32))
    x = jnp.asarray(np.random.RandomState(1).rand(
        batch, spec.net.h, spec.net.w, spec.net.c).astype(np.float32))

    for impl in ["xla", "fused"]:
        fwd = build_forward(spec, "int8", int8_policy="cpu", int8_chain=True,
                            compute_dtype=jnp.bfloat16, int8_impl=impl)
        f1 = jax.jit(lambda p, v, fwd=fwd: tuple(
            h.data for h in fwd(p, v)[0]))
        t0 = time.perf_counter()
        outs[impl] = [np.asarray(h) for h in f1(dev, x_small)]
        log(f"{impl}: b=2 forward (incl. compile) {time.perf_counter()-t0:.1f}s")

        def loop(v, fwd=fwd):
            def body(i, acc):
                heads, _ = fwd(dev, v + acc * 1e-12)
                return acc + sum(jnp.sum(h.data) for h in heads) * 1e-9
            return jax.lax.fori_loop(0, rep, body, 0.0)

        f = jax.jit(loop)
        t0 = time.perf_counter()
        float(f(x))
        log(f"{impl}: loop compiled+settled in {time.perf_counter()-t0:.1f}s")
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(f(x))
            ts.append((time.perf_counter() - t0) / rep)
        ms = sorted(ts)[2] * 1e3 / batch
        results[f"{impl}_ms_img"] = round(ms, 4)
        log(f"{impl}: {ms:.4f} ms/img (b={batch})")

    exact = all(np.array_equal(a, b) for a, b in zip(outs["xla"],
                                                     outs["fused"]))
    results["bit_exact"] = bool(exact)
    if not exact:
        results["maxerr"] = float(max(
            np.abs(a - b).max() for a, b in zip(outs["xla"], outs["fused"])))
    log(f"bit_exact={exact}")
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
