"""Probe: does the v5e's MXU int4 path beat int8 through XLA?

Motivation: the bit-exact int8 path is at its traffic floor (PERF_NOTES.md
round 3) and XLA's int8 convs sit on the measured 251-Tops practical peak,
so the only remaining headroom on the quantized path would be a NARROWER
MXU dtype. jnp.int4 exists (ml_dtypes); this measures whether XLA lowers
int4 x int4 -> int32 contractions to anything faster than int8 on this
chip, using the same chained-dependency methodology as bench_conv_chain.py
(carry-dependent input, full-output consumption, rep>=100 amortizing the
25-30 ms relay RTT).

Shapes: the big-tile roofline (8192^2) plus yolov3's mid-net GEMM shapes
(spatial*batch x C x C from the 52/26/13-pixel stages at b=32).

Outcome recorded in PERF_NOTES.md. If int4 ~2x int8 -> an opt-in
"turbo-int4" mode is worth building; if it matches int8 (XLA upcasting
to the int8 MXU path) or loses, the probe documents the negative result.
"""

import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def chained_gemm_rate(M, K, N, dtype_name, rep=100, runs=5):
    """Tops for a chained x@w -> requant -> x@w loop at the given int dtype."""
    import jax
    import jax.numpy as jnp

    dt = {"int8": jnp.int8, "int4": jnp.int4}[dtype_name]
    lim = 127 if dtype_name == "int8" else 7
    rng = np.random.RandomState(0)
    # K must match M for chaining: use square-ish x [M,K] @ w [K,K].
    # Ship int8 and cast ON DEVICE: the axon relay's device_put has no int4
    # handler (UNIMPLEMENTED, measured 2026-08-18), but an on-device
    # int8->int4 convert is fine and never crosses the host boundary.
    try:
        x0 = jax.jit(lambda a: a.astype(dt))(
            jnp.asarray(rng.randint(-lim, lim + 1, (M, K)).astype(np.int8)))
        w = jax.jit(lambda a: a.astype(dt))(
            jnp.asarray(rng.randint(-lim, lim + 1, (K, K)).astype(np.int8)))
        jax.block_until_ready(w)
    except Exception as e:
        return None, f"device int4 cast failed: {type(e).__name__}: {str(e)[:160]}"

    shift = max(0, int(np.ceil(np.log2(K * lim))) - 2)

    def loop(x):
        def body(i, carry):
            x, acc = carry
            y = jax.lax.dot_general(
                x, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            # requant back to the narrow dtype, carry-dependent
            xn = jnp.clip((y + acc) >> shift, -lim, lim).astype(dt)
            return (xn, acc + jnp.sum(y) % 3)
        xf, acc = jax.lax.fori_loop(0, rep, body, (x, jnp.int32(0)))
        return jnp.sum(xf.astype(jnp.int32)) + acc

    f = jax.jit(loop)
    try:
        int(f(x0))  # compile
    except Exception as e:
        return None, f"{type(e).__name__}: {str(e)[:200]}"
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        int(f(x0))
        ts.append(time.perf_counter() - t0)
    dt_s = sorted(ts)[len(ts) // 2] / rep
    tops = 2 * M * K * K / dt_s / 1e12
    return tops, f"{dt_s * 1e3:.3f} ms/iter"


def main():
    import jax
    log(f"device: {jax.devices()[0]}")
    shapes = [
        (8192, 8192, 8192),   # roofline tile
        (2704 * 8, 256, 256),  # 52^2 stage rows (b=8 chunk), C=256
        (676 * 32, 512, 512),  # 26^2 stage, b=32
        (169 * 32, 1024, 1024),  # 13^2 stage, b=32
    ]
    # dtype-major order, int8 FIRST: a failed int4 compile POISONS the axon
    # process (every later probe in-process fails UNIMPLEMENTED, including
    # plain int8 — measured 2026-08-18), so all int8 measurements must land
    # before the first int4 attempt.
    for d in ("int8", "int4"):
        for M, K, N in shapes:
            tops, note = chained_gemm_rate(M, K, N, d,
                                           rep=100 if M < 8192 else 30)
            if tops is None:
                log(f"[{M}x{K}x{K}] {d}: FAILED {note}")
            else:
                log(f"[{M}x{K}x{K}] {d}: {tops:.1f} Tops  ({note})")


if __name__ == "__main__":
    main()
