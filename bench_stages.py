"""Stage attribution: where does yolov3-416 int8 spend its 0.42 ms/img?

bench_conv_chain.py shows XLA's chained int8 convs run at 237-268 Tops on the
mid-net tiles — essentially the 251 Tops measured practical peak — yet the
full model runs at ~157 T (0.42 ms/img, b=128). This measures device-resident
prefixes of the network truncated at the darknet53 stage boundaries; the
difference between consecutive prefixes is that stage's cost, attributing the
end-to-end gap (early bandwidth-bound layers? heads? routes/upsamples?).

Usage: python bench_stages.py [batch] [rep] [mode]
JSON summary on stdout; progress on stderr.
"""

import dataclasses
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

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    rep = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    mode = sys.argv[3] if len(sys.argv) > 3 else "int8"

    spec = parse_network_cfg("/root/reference/bin/yolov3.cfg", batch=1)
    params = fuse_conv_batchnorm(spec, random_params(spec, seed=0))
    if mode == "int8":
        params = quantize_params(spec, params)
        kw = dict(int8_policy="cpu", int8_chain=True,
                  compute_dtype=jnp.bfloat16)
    else:
        kw = dict(compute_dtype=jnp.bfloat16)
    log(f"device: {jax.devices()[0]}  batch={batch} rep={rep} mode={mode}")

    # darknet53 stage boundaries (layer index = first layer NOT included):
    # stem 416² ends after conv1(s2); then res stages at 208/104/52/26/13;
    # 75+ = heads/routes/upsamples
    cuts = [("stem416", 2), ("res208x1", 5), ("res104x2", 12),
            ("res52x8", 37), ("res26x8", 62), ("res13x4", 75),
            ("heads", spec.n)]

    x = jnp.asarray(np.random.RandomState(0).rand(
        batch, spec.net.h, spec.net.w, spec.net.c).astype(np.float32))

    out = {}
    prev_ms = 0.0
    for name, k in cuts:
        sub = dataclasses.replace(spec, layers=tuple(spec.layers[:k]))
        fwd = build_forward(sub, mode, **kw)
        p = params_to_device(params[:k])

        def loop(x):
            def body(i, acc):
                heads, aux = fwd(p, x + acc * 1e-12)
                tot = sum(jnp.sum(h.data) for h in heads) if heads else (
                    jnp.sum(aux["final"]))
                return acc + tot * 1e-9
            return jax.lax.fori_loop(0, rep, body, 0.0)

        f = jax.jit(loop)
        float(f(x))  # compile
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(f(x))
            ts.append((time.perf_counter() - t0) / rep)
        ms = sorted(ts)[2] * 1e3 / batch
        out[name] = {"cum_ms_img": round(ms, 4),
                     "stage_ms_img": round(ms - prev_ms, 4)}
        log(f"prefix {name} (layers<{k}): {ms:.4f} ms/img cumulative, "
            f"stage +{ms - prev_ms:.4f}")
        prev_ms = ms

    print(json.dumps({"batch": batch, "rep": rep, "mode": mode,
                      "stages": out}), flush=True)


if __name__ == "__main__":
    main()
