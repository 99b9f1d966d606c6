"""Fused residual-stage Pallas kernel vs XLA, at yolov3's stage geometries.

bench_stages.py attribution (b=128, int8, chip): res208x1 0.0356 ms/img,
res104x2 0.0587, res52x8 0.0971 — the first two are HBM-bound on the f32
trunk XLA must materialize twice per block; the fused kernel reads/writes the
trunk exactly once per stage. This measures both implementations standalone
under the chained-fori methodology (PERF_NOTES.md traps).

Usage: python bench_fused_stage.py [batch] [rep] [stage ...]
stages: res208 res104 res52 (default: res208 res104)
"""

import functools
import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


STAGES = {
    # name: (H, C, C2, K, strips)
    "res208": (208, 64, 32, 1, 4),
    "res104": (104, 128, 64, 2, 0),
    "res52": (52, 256, 128, 8, 0),
}


def main():
    import jax
    import jax.numpy as jnp

    from yolo2_light_tpu.ops.pallas_fused import (fused_res_stage,
                                                  fused_res_stage_strips,
                                                  res_stage_reference)

    cache = os.path.expanduser("~/.cache/yolo2_light_tpu/xla")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    rep = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    names = sys.argv[3:] or ["res208", "res104"]
    log(f"device: {jax.devices()[0]}  batch={batch} rep={rep}")

    results = {}
    for name in names:
        H, C, C2, K, strips = STAGES[name]
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(batch, H, H, C).astype(np.float32))
        blocks = [dict(
            w1=rng.randint(-100, 100, (1, 1, C, C2)).astype(np.int8),
            b1=(rng.randn(C2) * 0.2).astype(np.float32),
            m1=float(rng.uniform(8, 24)), wm1=float(rng.uniform(2, 6)),
            w2=rng.randint(-100, 100, (3, 3, C2, C)).astype(np.int8),
            b2=(rng.randn(C) * 0.2).astype(np.float32),
            m2=float(rng.uniform(8, 24)), wm2=float(rng.uniform(2, 6)),
        ) for _ in range(K)]

        def xla_stage(v):
            return res_stage_reference(v, blocks)

        if strips:
            pallas_stage = functools.partial(
                fused_res_stage_strips, blocks=blocks, n_strips=strips,
                interpret=False)
        else:
            pallas_stage = functools.partial(
                fused_res_stage, blocks=blocks, interpret=False)

        entry = {}
        outs = {}
        for impl, fn in [("xla", xla_stage), ("pallas", pallas_stage)]:
            def loop(v):
                def body(i, acc):
                    y = fn(v + acc * 1e-12)
                    return acc + jnp.sum(y) * 1e-30
                return jax.lax.fori_loop(0, rep, body, 0.0)

            try:
                f = jax.jit(loop)
                t0 = time.perf_counter()
                float(f(x))
                log(f"{name}/{impl}: compiled in {time.perf_counter()-t0:.1f}s")
                ts = []
                for _ in range(5):
                    t0 = time.perf_counter()
                    float(f(x))
                    ts.append((time.perf_counter() - t0) / rep)
                ms = sorted(ts)[2] * 1e3 / batch
                flops = K * (2 * H * H * C * C2 + 18 * H * H * C2 * C)
                entry[impl] = {"ms_img": round(ms, 5),
                               "tops": round(flops / (ms * 1e-3) / 1e12, 1)}
                log(f"{name}/{impl}: {ms:.4f} ms/img  "
                    f"({entry[impl]['tops']} Tops eff)")
                outs[impl] = np.asarray(jax.jit(fn)(x))
            except Exception as e:
                entry[impl] = {"error": str(e)[:400]}
                log(f"{name}/{impl}: FAILED {str(e)[:400]}")
        if "xla" in outs and "pallas" in outs:
            exact = bool(np.array_equal(outs["xla"], outs["pallas"]))
            entry["bit_exact"] = exact
            if not exact:
                entry["maxerr"] = float(np.abs(outs["xla"] - outs["pallas"]).max())
            log(f"{name}: bit_exact={entry.get('bit_exact')} "
                f"maxerr={entry.get('maxerr', 0)}")
        results[name] = entry

    print(json.dumps({"batch": batch, "rep": rep, "stages": results}),
          flush=True)


if __name__ == "__main__":
    main()
