"""Multi-chip sharding: data-parallel batch + spatial-parallel rows +
tensor-parallel conv channels over a ``jax.sharding.Mesh``.

The reference is single-device (SURVEY §2.8: no collectives anywhere); its only
parallelism is SIMD/OpenMP/pthread pipelining. The TPU-native analog scales the same
inference program over ICI with GSPMD: annotate shardings, let XLA insert collectives.

Mesh axes:
  * ``data``  — batch dimension of activations (embarrassingly parallel images)
  * ``space`` — activation ROW (H) dimension (spatial partitioning). GSPMD
    partitions every conv/maxpool spatially and inserts halo exchanges
    (collective-permutes of the 1-row borders 3x3 windows need) on ICI. This is
    the conv-net analog of sequence parallelism — it divides the work of a
    SINGLE image, so it is the only axis that cuts b=1 latency (the measured
    ~0.7-0.9 ms dispatch+tile floor at b=1, PERF_NOTES.md) rather than just
    scaling throughput.
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
              model: int | None = None, space: int | None = None) -> Mesh:
    """Build a (data, space, model) mesh over the first n devices.

    Unspecified axes default to 1 except when ALL are unspecified, where the
    auto-split favors data parallelism with a modest model axis (throughput
    serving); pass ``space=`` explicitly for latency-oriented sharding."""
    devs = jax.devices()
    n = n_devices or len(devs)
    if data is None and model is None and space is None:
        # favor data parallelism: the model axis stays modest (at most 2) and
        # only when the device count leaves data with the larger share
        model = 2 if n % 2 == 0 and n >= 4 else 1
        data = n // model
        space = 1
    else:
        data, model, space = data or 1, model or 1, space or 1
    if data * space * model > len(devs):
        raise ValueError(
            f"mesh data={data} x space={space} x model={model} needs "
            f"{data * space * model} devices, have {len(devs)}")
    grid = np.array(devs[: data * space * model]).reshape(data, space, model)
    return Mesh(grid, ("data", "space", "model"))


def x_partition_spec(mesh: Mesh) -> P:
    """PartitionSpec for NHWC activations on this mesh: batch over ``data``,
    rows over ``space`` (both no-ops when the axis has size 1)."""
    return P("data", "space" if mesh.shape.get("space", 1) > 1 else None,
             None, None)


def shard_params(spec: ModelSpec, params: list, mesh: Mesh) -> list:
    """Place conv params on the mesh: weights sharded over output channels on
    ``model`` where divisible, replicated otherwise.

    When the mesh also has a ``space`` axis (>1), only 1x1 kernels shard over
    ``model``: XLA's SPMD partitioner miscompiles a spatially-partitioned conv
    whose KERNEL is channel-sharded (jax 0.9.0: the halo-exchange path drops /
    double-counts border contributions for any kh*kw > 1 kernel; 1x1 convs and
    dots are correct — minimal repro in tests/test_parallel.py::
    test_spatial_times_model_kernel_bug_guard). Keeping spatial kernels
    replicated sidesteps the bug and matches the usual spatial-partitioning
    design (conv-net weights are tiny next to early-stage activations)."""
    model_size = mesh.shape["model"]
    space_size = mesh.shape.get("space", 1)
    out = []
    for i, l in enumerate(spec.layers):
        p = params[i]
        if p is None or not isinstance(l, ConvSpec):
            out.append(p)
            continue
        # a layer's channel vectors (biases/means) shard with its kernel: a
        # model-sharded bias added to the unsharded output of a replicated
        # 3x3 kernel would just force a per-call gather
        kernel_shards = any(
            v.ndim == 4 and v.shape[-1] % model_size == 0
            and (space_size == 1 or v.shape[0] * v.shape[1] == 1)
            for v in p.values() if hasattr(v, "ndim"))
        q = {}
        for k, v in p.items():
            if not isinstance(v, jax.Array):
                # keep device arrays as-is: device_put with an identical
                # sharding below is then a no-op (re-sharding an already-placed
                # pytree, e.g. pipeline auto-grow, must not bounce via host)
                v = np.asarray(v)
            if (v.ndim == 4 and v.shape[-1] % model_size == 0
                    and (space_size == 1 or v.shape[0] * v.shape[1] == 1)):
                ps = P(None, None, None, "model")      # HWIO: shard O
            elif (v.ndim == 1 and v.shape[0] % model_size == 0
                    and v.shape[0] > 1 and kernel_shards):
                ps = P("model")
            else:
                ps = P()
            q[k] = jax.device_put(v, NamedSharding(mesh, ps))
        out.append(q)
    return out


def make_sharded_predict(spec: ModelSpec, params: list, mesh: Mesh,
                         mode: str = "fp32", compute_dtype=jnp.float32):
    """Jitted batched forward with batch sharded over ``data``, rows over
    ``space``, and conv channels over ``model``. Returns (fn, sharded_params);
    call as fn(sharded_params, x)."""
    fwd = build_forward(spec, mode, compute_dtype=compute_dtype)
    sharded = shard_params(spec, params, mesh)
    x_sharding = NamedSharding(mesh, x_partition_spec(mesh))

    def step(p, x):
        heads, _ = fwd(p, x)
        return tuple(h.data for h in heads)

    jitted = jax.jit(step, in_shardings=(None, x_sharding))
    return jitted, sharded
