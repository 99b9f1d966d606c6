"""XNOR kernel micro-benchmark: Pallas popcount GEMM vs MXU +-1 int8 formulation.

Both compute the same BIT1 convolution (bit-identical results); this compares
throughput and validates correctness on the current backend. Run on the TPU:

    python bench_xnor.py [c] [m] [hw]
"""

import os
import sys
import time

import numpy as np


def main():
    import jax

    # persistent XLA cache: Pallas shapes go through the remote-compile relay
    # (minutes cold); cache them like bench.py does
    cache = os.path.expanduser("~/.cache/yolo2_light_tpu/xla")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from yolo2_light_tpu.models import layers as L
    from yolo2_light_tpu.ops.pallas_xnor import conv2d_xnor_pallas, pack_weights

    c = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    hw = int(sys.argv[3]) if len(sys.argv) > 3 else 52
    # optional 4th arg: comma list of MXU-engine tile specs "tn" or "tn:tm"
    # (0 = the VMEM-aware auto default, _auto_tiles)
    tns = ([tuple(int(v) for v in (t + ":0").split(":")[:2])
            for t in sys.argv[4].split(",")]
           if len(sys.argv) > 4 else [(0, 0)])

    rng = np.random.RandomState(0)
    x = rng.randn(1, hw, hw, c).astype(np.float32)
    w = (rng.randn(3, 3, c, m) * 0.1).astype(np.float32)
    bias = rng.randn(m).astype(np.float32)
    mean = np.mean(np.abs(w), axis=(0, 1, 2)).astype(np.float32)
    sw = np.where(w > 0, 1, -1).astype(np.int8)
    packed, _, k_real = pack_weights(w)

    REP = 50

    def loop(f):
        def g(x):
            def body(i, acc):
                return acc + jnp.sum(f(x + acc * 1e-12))
            return jax.lax.fori_loop(0, REP, body, 0.0)
        return jax.jit(g)

    f_int8 = loop(lambda x: L.conv2d_xnor(
        x, jnp.asarray(sw), jnp.asarray(mean), jnp.asarray(bias), 1, 1, "leaky"))
    f_pal = loop(lambda x: conv2d_xnor_pallas(
        x, jnp.asarray(packed), jnp.asarray(mean), jnp.asarray(bias),
        size=3, stride=1, pad=1, c_real=c, k_real=k_real))
    f_pmx = {t: loop(lambda x, t=t: conv2d_xnor_pallas(
        x, jnp.asarray(packed), jnp.asarray(mean), jnp.asarray(bias),
        size=3, stride=1, pad=1, c_real=c, k_real=k_real, engine="mxu",
        tn=t[0] or None, tm=t[1] or None)) for t in tns}
    xj = jnp.asarray(x)

    a = np.asarray(jax.jit(lambda x: L.conv2d_xnor(
        x, jnp.asarray(sw), jnp.asarray(mean), jnp.asarray(bias), 1, 1,
        "leaky"))(xj))
    b = np.asarray(jax.jit(lambda x: conv2d_xnor_pallas(
        x, jnp.asarray(packed), jnp.asarray(mean), jnp.asarray(bias),
        size=3, stride=1, pad=1, c_real=c, k_real=k_real))(xj))
    print(f"bit-identical: {np.array_equal(a, b)} (maxdiff "
          f"{np.abs(a - b).max():g})")
    bm = np.asarray(jax.jit(lambda x: conv2d_xnor_pallas(
        x, jnp.asarray(packed), jnp.asarray(mean), jnp.asarray(bias),
        size=3, stride=1, pad=1, c_real=c, k_real=k_real, engine="mxu"))(xj))
    print(f"bit-identical (pallas_mxu): {np.array_equal(a, bm)} (maxdiff "
          f"{np.abs(a - bm).max():g})")

    for name, f in ([("mxu_int8", f_int8), ("pallas_popcount", f_pal)]
                    + [(f"pallas_mxu tn={t[0] or 'auto'} tm={t[1] or 'auto'}",
                        f_pmx[t]) for t in tns]):
        for _ in range(2):
            _ = float(f(xj))
        t0 = time.perf_counter()
        iters = 5
        for _ in range(iters):
            _ = float(f(xj))
        dt = (time.perf_counter() - t0) / iters / REP
        print(f"{name}: {dt * 1e3:.3f} ms/conv "
              f"(c={c}, m={m}, {hw}x{hw}, weights "
              f"{'32x packed' if name.startswith('pallas') else 'int8 +-1'})")


if __name__ == "__main__":
    main()
