"""Per-shape INT8 conv microbenchmark: XLA conv vs the Pallas kernels.

Targets the yolov3-416 3x3 stride-1 mid-net shapes where PERF_NOTES.md pins
XLA at ~100 T effective vs the 251 Tops measured chained-GEMM peak. Follows
the three methodology rules (PERF_NOTES.md): carry-dependent loop input (no
LICM), full-output consumption (no slice narrowing/DCE), and many in-jit
iterations per host fetch (amortize the 25-30 ms relay RTT).

Usage: python bench_conv_shapes.py [batch] [rep]
All output on stderr except a final JSON summary line on stdout.
"""

import functools
import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import os

    import jax
    import jax.numpy as jnp

    cache = os.path.expanduser("~/.cache/yolo2_light_tpu/xla")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from yolo2_light_tpu.models.layers import conv2d_int8
    from yolo2_light_tpu.ops.pallas_int8 import (conv3x3_int8_fused,
                                                 conv3x3_int8_tiled)

    # rep must amortize the 25-30 ms relay RTT: at rep=10 the RTT alone adds
    # ~2.5 ms/conv and every variant reads ~20 Tops (measured; trap #3)
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    rep = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    log(f"device: {jax.devices()[0]}  batch={batch} rep={rep}")

    # (H, C_in, C_out): yolov3's residual-block 3x3 convs (x8, x8, x4 repeats)
    shapes = [(52, 128, 256), (26, 256, 512), (13, 512, 1024)]
    in_mult, w_mult = 16.0, 4.0

    results = {}
    for (h, c, m) in shapes:
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.rand(batch, h, h, c).astype(np.float32) * 4 - 2)
        w8 = jnp.asarray(rng.randint(-16, 17, (3, 3, c, m)).astype(np.int8))
        bias = jnp.asarray(rng.randn(m).astype(np.float32))
        gops = 2.0 * batch * h * h * c * m * 9 / 1e9

        def quant(xf):
            return jnp.clip(jnp.trunc(xf * in_mult), -127, 127).astype(jnp.int8)

        variants = {
            "xla": lambda xf: conv2d_int8(xf, w8, bias, 1, 1, "leaky",
                                          in_mult, w_mult),
            "pallas_v1": lambda xf: conv3x3_int8_fused(
                quant(xf), w8, bias, in_mult, w_mult),
        }
        for tm in (256, 512):
            if m % tm == 0:
                variants[f"pallas_v2_tm{tm}"] = functools.partial(
                    lambda xf, tm=tm: conv3x3_int8_tiled(
                        quant(xf), w8, bias, in_mult, w_mult, tm=tm))

        # correctness gate first (cheap single call, compare to xla)
        ref = None
        shape_res = {}
        for name, fn in variants.items():
            try:
                out = jax.block_until_ready(fn(x))
                outv = np.asarray(out)
                if ref is None:
                    ref = outv
                else:
                    d = float(np.max(np.abs(outv - ref)))
                    if d > 1e-3:
                        log(f"{h}x{h}x{c}->{m} {name}: WRONG (max diff {d})")
                        continue
            except Exception as e:
                log(f"{h}x{h}x{c}->{m} {name}: failed {type(e).__name__}: "
                    f"{str(e)[:200]}")
                continue

            def loop(xf, fn=fn):
                def body(i, acc):
                    y = fn(xf + acc * 1e-12)
                    return acc + jnp.sum(y) * 1e-12
                return jax.lax.fori_loop(0, rep, body, 0.0)

            f = jax.jit(loop)
            float(f(x))  # compile
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                float(f(x))
                ts.append((time.perf_counter() - t0) / rep)
            dt = sorted(ts)[2]
            tops = gops / dt / 1e3
            shape_res[name] = round(tops, 1)
            log(f"{h}x{h}x{c}->{m} {name}: {dt * 1e3:.3f} ms "
                f"({tops:.0f} Tops eff, min {gops / max(ts) / 1e3:.0f}, "
                f"max {gops / min(ts) / 1e3:.0f})")
        results[f"{h}x{h}x{c}->{m}"] = shape_res

    print(json.dumps({"batch": batch, "rep": rep, "tops_eff": results}),
          flush=True)


if __name__ == "__main__":
    main()
