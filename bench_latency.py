"""Single-image latency attribution: device-resident batch sweep + linear fit.

VERDICT r2 item 7: b=1 bf16 runs 1.46 ms/img vs 0.588 at b=128 — why, and can
it be <1.0? This sweeps device-resident yolov3-416 latency over small batches
and fits t(b) = fixed + slope*b: ``fixed`` is the per-DISPATCH floor (per-HLO
launch overhead x ~107 fused layers + small-tile MXU padding at 13x13), the
part batching amortizes. The in-jit chain (rep iterations, carry-dependent,
full-head consumption) excludes relay RTT; the camera path additionally pays
~25-30 ms relay round trip per frame, which dwarfs any chip-side win — see
PERF_NOTES.md "Single-image latency".

Usage: python bench_latency.py [rep]
JSON summary on stdout; progress on stderr.
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
    from yolo2_light_tpu.models.network import build_forward, params_to_device
    from yolo2_light_tpu.quant import quantize_params
    from yolo2_light_tpu.weights import fuse_conv_batchnorm, random_params

    cache = os.path.expanduser("~/.cache/yolo2_light_tpu/xla")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    rep = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    spec = parse_network_cfg("/root/reference/bin/yolov3.cfg", batch=1)
    params = fuse_conv_batchnorm(spec, random_params(spec, seed=0))
    qparams = quantize_params(spec, params)
    log(f"device: {jax.devices()[0]}  rep={rep}")

    batches = [1, 2, 4, 8]
    out = {}
    for mode, p_all, kw in [
        ("bf16", params, dict(compute_dtype=jnp.bfloat16)),
        ("int8", qparams, dict(int8_policy="cpu", int8_chain=True,
                               compute_dtype=jnp.bfloat16)),
    ]:
        fwd = build_forward(spec, "fp32" if mode == "bf16" else "int8", **kw)
        p = params_to_device(p_all)
        per_b = {}
        for b in batches:
            x = jnp.asarray(np.random.RandomState(0).rand(
                b, spec.net.h, spec.net.w, spec.net.c).astype(np.float32))

            def loop(x):
                def body(i, acc):
                    heads, _ = fwd(p, x + acc * 1e-12)
                    return acc + sum(jnp.sum(h.data) for h in heads) * 1e-9
                return jax.lax.fori_loop(0, rep, body, 0.0)

            f = jax.jit(loop)
            float(f(x))  # compile (block via host fetch)
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                float(f(x))
                ts.append((time.perf_counter() - t0) / rep)
            ms = sorted(ts)[2] * 1e3
            per_b[b] = round(ms, 3)
            log(f"{mode} b={b}: {ms:.3f} ms/batch = {ms / b:.3f} ms/img")
        # least-squares t(b) = fixed + slope*b
        bs = np.array(batches, float)
        ys = np.array([per_b[b] for b in batches])
        slope, fixed = np.polyfit(bs, ys, 1)
        log(f"{mode}: fixed {fixed:.3f} ms/dispatch + {slope:.3f} ms/img "
            f"(b=1 is {per_b[1] / max(slope, 1e-9):.1f}x the marginal img cost)")
        out[mode] = {"ms_per_batch": per_b, "fixed_ms": round(float(fixed), 3),
                     "slope_ms_per_img": round(float(slope), 3)}

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
