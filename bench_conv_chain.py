"""Chained-INT8 conv microbenchmark: XLA conv vs the Pallas kernels.

The per-shape harness in bench_conv_shapes.py is overhead-dominated (each
iteration re-quantizes the f32 input and sums the full f32 output, ~2x the
conv's own bytes), compressing all variants to within ~10%. This harness
instead times the DEPLOYMENT regime directly: an int8 chain where each
iteration is conv -> requant-to-int8 -> next conv input (square shapes so the
output feeds back). Every variant pays the identical f32->int8 requant, so
the difference is the conv formulation itself. LICM cannot hoist (the input
is the carry) and nothing can be DCE'd (the carry is fetched).

Usage: python bench_conv_chain.py [batch] [rep]
All output on stderr except a final JSON summary line on stdout.
"""

import functools
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

    from yolo2_light_tpu.models.layers import conv2d_int8
    from yolo2_light_tpu.ops.pallas_int8 import (conv3x3_int8_fused,
                                                 conv3x3_int8_tiled)

    cache = os.path.expanduser("~/.cache/yolo2_light_tpu/xla")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    rep = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    log(f"device: {jax.devices()[0]}  batch={batch} rep={rep}")

    # square (C==M) stand-ins for yolov3's 3x3 mid-net tiles
    shapes = [(52, 256), (26, 512), (13, 1024)]
    in_mult, w_mult = 16.0, 4.0

    def quant(y):
        return jnp.clip(jnp.trunc(y * in_mult), -127, 127).astype(jnp.int8)

    results = {}
    for (h, c) in shapes:
        rng = np.random.RandomState(0)
        xi = jnp.asarray(rng.randint(-127, 128, (batch, h, h, c)).astype(np.int8))
        w8 = jnp.asarray(rng.randint(-16, 17, (3, 3, c, c)).astype(np.int8))
        bias = jnp.asarray(rng.randn(c).astype(np.float32))
        gops = 2.0 * batch * h * h * c * c * 9 / 1e9

        variants = {
            "xla": lambda x8: conv2d_int8(
                jnp.zeros(x8.shape, jnp.float32), w8, bias, 1, 1, "leaky",
                in_mult, w_mult, x_int8=x8),
            "pallas_v1": lambda x8: conv3x3_int8_fused(
                x8, w8, bias, in_mult, w_mult),
        }
        for tm in (256, 512):
            if c % tm == 0:
                variants[f"pallas_v2_tm{tm}"] = functools.partial(
                    lambda x8, tm=tm: conv3x3_int8_tiled(
                        x8, w8, bias, in_mult, w_mult, tm=tm))

        ref = None
        shape_res = {}
        for name, fn in variants.items():
            try:
                outv = np.asarray(fn(xi))
                if ref is None:
                    ref = outv
                else:
                    d = float(np.max(np.abs(outv - ref)))
                    if d > 1e-3:
                        log(f"{h}x{h}x{c} {name}: WRONG (max diff {d})")
                        continue
            except Exception as e:
                log(f"{h}x{h}x{c} {name}: failed {type(e).__name__}: "
                    f"{str(e)[:200]}")
                continue

            def loop(x8, fn=fn):
                def body(i, carry):
                    return quant(fn(carry))
                return jax.lax.fori_loop(0, rep, body, x8)

            f = jax.jit(loop)
            float(jnp.sum(jnp.abs(f(xi).astype(jnp.int32))))  # compile+fetch
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                float(jnp.sum(jnp.abs(f(xi).astype(jnp.int32))))
                ts.append((time.perf_counter() - t0) / rep)
            dt = sorted(ts)[2]
            tops = gops / dt / 1e3
            shape_res[name] = round(tops, 1)
            log(f"{h}x{h}x{c} {name}: {dt * 1e3:.3f} ms/conv "
                f"({tops:.0f} Tops eff, min {gops / max(ts) / 1e3:.0f}, "
                f"max {gops / min(ts) / 1e3:.0f})")
        results[f"{h}x{h}x{c}"] = shape_res

    print(json.dumps({"batch": batch, "rep": rep, "tops_eff": results}),
          flush=True)


if __name__ == "__main__":
    main()
