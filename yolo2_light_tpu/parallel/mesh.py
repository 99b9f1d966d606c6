"""Multi-chip sharding: data-parallel batch + tensor-parallel conv channels over a
``jax.sharding.Mesh``.

The reference is single-device (SURVEY §2.8: no collectives anywhere); its only
parallelism is SIMD/OpenMP/pthread pipelining. The TPU-native analog scales the same
inference program over ICI with GSPMD: annotate shardings, let XLA insert collectives.

Mesh axes:
  * ``data``  — batch dimension of activations (embarrassingly parallel images)
  * ``model`` — output-channel dimension of conv weights (tensor parallel); XLA
    propagates the channel sharding through the network and inserts all-gathers/psums
    only where layout changes demand it (routes, heads).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..cfg import ConvSpec, ModelSpec
from ..models.network import build_forward


def make_mesh(n_devices: int | None = None, data: int | None = None,
              model: int | None = None) -> Mesh:
    """Build a (data, model) mesh over the first n devices."""
    devs = jax.devices()
    n = n_devices or len(devs)
    if data is None or model is None:
        # favor data parallelism; model axis takes what divides evenly
        model = 1
        for cand in (4, 2, 1):
            if n % cand == 0 and cand <= n:
                model = cand
                break
        data = n // model
    grid = np.array(devs[: data * model]).reshape(data, model)
    return Mesh(grid, ("data", "model"))


def shard_params(spec: ModelSpec, params: list, mesh: Mesh) -> list:
    """Place conv params on the mesh: weights sharded over output channels on
    ``model`` where divisible, replicated otherwise."""
    model_size = mesh.shape["model"]
    out = []
    for i, l in enumerate(spec.layers):
        p = params[i]
        if p is None or not isinstance(l, ConvSpec):
            out.append(p)
            continue
        q = {}
        for k, v in p.items():
            if not isinstance(v, jax.Array):
                # keep device arrays as-is: device_put with an identical
                # sharding below is then a no-op (re-sharding an already-placed
                # pytree, e.g. pipeline auto-grow, must not bounce via host)
                v = np.asarray(v)
            if v.ndim == 4 and v.shape[-1] % model_size == 0:
                ps = P(None, None, None, "model")      # HWIO: shard O
            elif v.ndim == 1 and v.shape[0] % model_size == 0 and v.shape[0] > 1:
                ps = P("model")
            else:
                ps = P()
            q[k] = jax.device_put(v, NamedSharding(mesh, ps))
        out.append(q)
    return out


def make_sharded_predict(spec: ModelSpec, params: list, mesh: Mesh,
                         mode: str = "fp32", compute_dtype=jnp.float32):
    """Jitted batched forward with batch sharded over ``data`` and conv channels over
    ``model``. Returns (fn, sharded_params); call as fn(sharded_params, x)."""
    fwd = build_forward(spec, mode, compute_dtype=compute_dtype)
    sharded = shard_params(spec, params, mesh)
    x_sharding = NamedSharding(mesh, P("data", None, None, None))

    def step(p, x):
        heads, _ = fwd(p, x)
        return tuple(h.data for h in heads)

    jitted = jax.jit(step, in_shardings=(None, x_sharding))
    return jitted, sharded
