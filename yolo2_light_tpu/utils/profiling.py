"""Profiling / tracing utilities.

The reference's observability is ad-hoc (SURVEY §5): wall-clock prints around predict
(src/main.c:197-220), per-layer BFLOPs at construction (src/additionally.c:2903-2907),
and an OpenCL per-kernel profiler (KernelLauncher::run(profile),
src/OpenCL/include/kernel_launcher.h:89). TPU-native equivalents:

* :func:`layer_cost_table` — static per-layer BFLOPs/params/activation-bytes table
  (the construction-time table, extended);
* :func:`profile_layers` — measured per-layer device time via incremental jitted
  prefixes (run layers [0..i] and difference the timings — robust to XLA fusing the
  whole net into one computation, at the cost of O(n^2) compiled work);
* :func:`trace` — context manager around ``jax.profiler`` for full XLA traces
  viewable in TensorBoard/XProf (the real tool for kernel-level analysis).
"""

from __future__ import annotations

import contextlib
import time


from ..cfg import ConvSpec, ModelSpec


def layer_cost_table(spec: ModelSpec) -> str:
    """Static cost table: BFLOPs, params, output activation MB per layer."""
    lines = ["idx  type            BFLOPs    params     out-MB"]
    total_bf = 0.0
    total_p = 0
    for l in spec.layers:
        name = type(l).__name__.replace("Spec", "").lower()
        bf = l.bflops if isinstance(l, ConvSpec) else 0.0
        par = (l.n * l.c * l.size * l.size + l.n) if isinstance(l, ConvSpec) else 0
        out_mb = l.outputs * 4 / 1e6
        total_bf += bf
        total_p += par
        lines.append(f"{l.index:3d}  {name:12s} {bf:9.3f} {par:9d} {out_mb:9.2f}")
    lines.append(f"total {total_bf:.3f} BFLOPs, {total_p / 1e6:.1f}M params")
    return "\n".join(lines)


def profile_layers(spec: ModelSpec, params: list, x, *, iters: int = 3,
                   mode: str = "fp32", compute_dtype=None) -> list:
    """Measured cumulative device time after each layer.

    Returns [(index, layer_name, cumulative_ms, delta_ms)]. Each prefix [0..i] is
    jitted and timed separately (block via host fetch); per-layer delta is the
    difference of consecutive prefixes. Noise from fixed dispatch overhead cancels
    in the deltas; negative deltas are clamped to 0.
    """
    import jax
    import jax.numpy as jnp

    from ..models.network import build_forward, params_to_device

    cd = compute_dtype if compute_dtype is not None else jnp.float32
    dev_params = params_to_device(params)
    xd = jnp.asarray(x)
    results = []
    prev = 0.0
    for i in range(spec.n):
        sub = ModelSpec(net=spec.net, layers=spec.layers[: i + 1])
        # routes/shortcuts may reference earlier layers only — prefix is closed
        try:
            fwd = build_forward(sub, mode, compute_dtype=cd)
        except Exception:
            continue

        def run(p, xx):
            _, aux = fwd(p, xx)
            return jnp.sum(aux["final"])

        f = jax.jit(run)
        float(f(dev_params, xd))  # compile + warm
        t0 = time.perf_counter()
        for _ in range(iters):
            float(f(dev_params, xd))
        cum = (time.perf_counter() - t0) / iters * 1e3
        delta = max(0.0, cum - prev)
        prev = cum
        results.append((i, type(spec.layers[i]).__name__.replace("Spec", ""),
                        cum, delta))
    return results


@contextlib.contextmanager
def trace(log_dir: str):
    """XLA profiler trace (view with TensorBoard/XProf)."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
