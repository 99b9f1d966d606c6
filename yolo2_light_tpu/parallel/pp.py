"""Pipeline parallelism: stage-split inference across devices with
microbatch overlap.

The reference is single-device (SURVEY §2.8). The mesh axes in
parallel/mesh.py scale out WITHIN every layer (dp batches / sp rows / tp
channels); this module adds the remaining classic axis: the LAYER dimension.
The network splits into ``n_stages`` contiguous, BFLOPs-balanced layer
ranges, each stage's parameters live on their own device, and microbatches
flow through the stages in a GPipe-style wavefront — while device s computes
microbatch m, device s-1 computes m+1. JAX's async dispatch does the
overlap: every stage step and inter-device activation transfer is enqueued
without blocking, so the Python scheduler only defines the dependency order.

When pipeline parallelism is the right tool (vs dp/tp/sp): the model's
weights don't fit one device, or a serving deployment wants >1 chip at
LOW batch without paying tp's per-layer collectives — PP's only
communication is one activation tensor per stage boundary per microbatch,
riding ICI point-to-point. For yolov3-sized nets dp is usually better; this
exists so the parallelism inventory is complete and correct (tested
bit-exact vs the single-device program), and it composes with the darknet
graph's long-range routes/shortcuts via carried-tensor liveness analysis.

Stage boundaries never need halo or replication logic: build_forward's
``layer_range``/``carried`` support executes an arbitrary contiguous range
given the live set of earlier outputs (models/network.py), and the split
only carries tensors a later route/shortcut actually reads
(:func:`carried_for_boundary` — on yolov3 a 2-stage split carries 2-3
feature maps).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..cfg import ConvSpec, ModelSpec
from ..models.network import (_consumers, build_forward,
                              resolve_residual_dtype)


def _bflops(l) -> float:
    if isinstance(l, ConvSpec):
        return l.bflops
    return 0.0


def split_stages(spec: ModelSpec, n_stages: int) -> list:
    """Contiguous layer ranges [(start, stop), ...], BFLOPs-balanced: stage s
    ends at the first layer where cumulative cost reaches (s+1)/n of total."""
    total = sum(_bflops(l) for l in spec.layers) or float(spec.n)
    bounds = []
    acc = 0.0
    start = 0
    for l in spec.layers:
        acc += _bflops(l) if total != float(spec.n) else 1.0
        if (len(bounds) < n_stages - 1
                and acc >= total * (len(bounds) + 1) / n_stages
                and l.index + 1 < spec.n):
            bounds.append((start, l.index + 1))
            start = l.index + 1
    bounds.append((start, spec.n))
    return bounds


def carried_for_boundary(spec: ModelSpec, stop: int) -> set:
    """Layer indices < stop whose outputs some layer >= stop still reads
    (routes/shortcuts/sequential-successor)."""
    consumers = _consumers(spec)
    return {j for j in range(stop) if any(c >= stop for c in consumers[j])}


class PipelinedPredictor:
    """Stage-split predictor: ``__call__(x[B]) -> (heads, aux)`` with outputs
    BIT-IDENTICAL (fp32 mode, measured on mini + full yolov3) to the
    single-device ``build_forward`` program run at the same microbatch size
    — the stage split itself adds no numerics; the only cross-stage
    semantic effect is dropped int8 producer-chaining, bit-identical to
    consumer-side quantization by construction. Two float-noise caveats,
    both properties of XLA program shape rather than of the pipeline:
    (a) XLA's convs may reassociate differently at different BATCH sizes,
    so microbatched results can differ from a full-batch single program
    (measured 2.6e-5 over 107 layers on CPU — the reference always runs
    b=1, where this is moot); (b) int8 mode's float requant epilogues can
    FMA-contract differently when a stage boundary changes fusion clusters
    (<=1 ULP on <1% of entries — the same cross-program class as the XNOR
    caveat in ops/pallas_xnor.py).

    ``devices``: one per stage (defaults to ``jax.devices()[:n_stages]``);
    with ``tp > 1``, ``n_stages * tp`` devices, consumed ``tp`` per stage.
    ``microbatch``: rows per pipeline step (B must divide evenly).
    ``tp``: tensor-parallel width WITHIN each stage — every stage becomes a
    ``tp``-device model-axis mesh (conv output channels GSPMD-sharded exactly
    as parallel/mesh.py does globally), composing the layer axis (pp) with
    the channel axis (tp). Inter-stage transfers reshard via ``device_put``
    between the stage meshes. Unlike pure pp, tp>1 is NOT bit-identical to
    the single-device program: the SPMD-partitioned executable tiles its
    convs differently, the same sub-ULP reassociation class as the global tp
    mesh (measured 2.4e-7 max abs on mini-yolo3 fp32 — caveat (a) above).
    """

    def __init__(self, spec: ModelSpec, params: list, mode: str = "fp32", *,
                 n_stages: int = 2, microbatch: int = 1, devices=None,
                 int8_policy: str = "cpu", compute_dtype=jnp.float32,
                 xnor_impl: str = "int8", int8_impl: str = "xla",
                 turbo: bool = False, tp: int = 1):
        self.spec = spec
        self.n_stages = n_stages
        self.microbatch = microbatch
        self.tp = tp
        need = n_stages * tp
        devs = devices if devices is not None else jax.devices()[:need]
        if len(devs) < need:
            raise ValueError(f"need {need} devices, have {len(devs)}")
        if tp > 1:
            import numpy as np
            from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
            self.stage_meshes = [
                Mesh(np.array(devs[s * tp:(s + 1) * tp]).reshape(1, 1, tp),
                     ("data", "space", "model")) for s in range(n_stages)]
            # device_put target per stage: replicated-on-mesh for activations
            # (GSPMD propagates the channel sharding from the weights)
            self.placements = [NamedSharding(m, P())
                               for m in self.stage_meshes]
        else:
            self.stage_meshes = None
            self.placements = list(devs[:n_stages])
        self.devices = devs[:need]
        self.ranges = split_stages(spec, n_stages)
        self.carried_sets = [carried_for_boundary(spec, stop)
                             for (_s, stop) in self.ranges[:-1]] + [set()]

        # per-stage params: only that stage's layer entries, committed to the
        # stage's device (cross-stage int8 chain targets may read a later
        # stage's multiplier — chain is disabled per-stage via layer_range
        # carrying no i8 state, so per-stage params are self-contained)
        self.stage_params = []
        for s, (a, b) in enumerate(self.ranges):
            p = [None] * spec.n
            for i in range(a, b):
                if params[i] is not None:
                    p[i] = params[i]
            if tp > 1:
                from .mesh import shard_params
                p = shard_params(spec, p, self.stage_meshes[s])
            else:
                p = [jax.device_put(v, self.placements[s])
                     if v is not None else None for v in p]
            self.stage_params.append(p)

        from ..cfg import RegionSpec, YoloSpec
        self.stage_fns = []
        self.stage_head_meta = []
        consumers = _consumers(spec)
        self._needed = [
            {j for j in range(a) if any(c >= a for c in consumers[j])}
            for (a, _b) in self.ranges]
        for s, (a, b) in enumerate(self.ranges):
            fwd = build_forward(spec, mode, int8_policy=int8_policy,
                                compute_dtype=compute_dtype,
                                xnor_impl=xnor_impl, int8_impl=int8_impl,
                                residual_dtype=resolve_residual_dtype(turbo),
                                layer_range=(a, b),
                                carry_out=self.carried_sets[s])

            def stage(p, x, carried, _fwd=fwd):
                heads, aux = _fwd(p, x, carried)
                # jit carries arrays only; head metadata reattached below
                return (tuple(h.data for h in heads), aux["final"],
                        aux.get("outputs", {}))

            self.stage_fns.append(jax.jit(stage))
            self.stage_head_meta.append(
                [(l.index, "yolo" if isinstance(l, YoloSpec) else "region")
                 for l in spec.layers[a:b]
                 if isinstance(l, (YoloSpec, RegionSpec))])

    def __call__(self, x):
        from ..models.network import HeadOutput
        x = jnp.asarray(x)
        B = x.shape[0]
        mb = self.microbatch
        if B % mb:
            raise ValueError(f"batch {B} not divisible by microbatch {mb}")
        M = B // mb
        n = self.n_stages

        # wavefront schedule: at step k, stage s works on microbatch k-s.
        # All calls are async — JAX queues each stage's step on its device as
        # soon as its (transferred) inputs exist, so stages overlap in time.
        cur = [None] * M               # running activation per microbatch
        carried = [dict() for _ in range(M)]
        head_datas = [[] for _ in range(M)]
        for k in range(M + n - 1):
            for s in range(min(k, n - 1), -1, -1):
                m = k - s
                if m < 0 or m >= M:
                    continue
                dev = self.placements[s]
                if s == 0:
                    xin = jax.device_put(x[m * mb:(m + 1) * mb], dev)
                else:
                    xin = jax.device_put(cur[m], dev)
                car = {j: jax.device_put(v, dev)
                       for j, v in carried[m].items()
                       if j in self._needed[s]}
                datas, final, outs = self.stage_fns[s](
                    self.stage_params[s], xin, car)
                cur[m] = final
                carried[m].update(outs)
                head_datas[m].extend(datas)

        # reassemble full-batch heads in head order (concat microbatches)
        meta = [hm for metas in self.stage_head_meta for hm in metas]
        dev_last = self.placements[-1]
        out = []
        for hi, (idx, kind) in enumerate(meta):
            data = jnp.concatenate(
                [jax.device_put(head_datas[m][hi], dev_last)
                 for m in range(M)], axis=0)
            out.append(HeadOutput(idx, kind, data))
        return tuple(out), {"final": cur}

    def head_specs(self):
        from ..cfg import RegionSpec, YoloSpec
        return [l for l in self.spec.layers
                if isinstance(l, (YoloSpec, RegionSpec))]


class ReplicatedPipeline:
    """Data-parallel pipeline replicas: dp x pp (x tp) — the realistic
    multi-chip serving shape (VERDICT r3 item 4). ``replicas`` independent
    :class:`PipelinedPredictor` copies each own ``n_stages * tp`` devices; a
    batch splits evenly across replicas and every replica's wavefront runs
    CONCURRENTLY (JAX async dispatch queues all stage steps without blocking,
    so the R wavefronts interleave across disjoint devices with no
    cross-replica communication — data parallelism needs none for inference,
    SURVEY §2.8).

    Numerics: bit-identical (fp32) to a single PipelinedPredictor at the same
    microbatch size — each replica runs the SAME per-stage programs on its
    batch shard, so the replica split adds no reassociation
    (tests/test_pp.py::test_replicated_pipeline_matches_single).
    """

    def __init__(self, spec: ModelSpec, params: list, mode: str = "fp32", *,
                 replicas: int = 2, n_stages: int = 2, microbatch: int = 1,
                 devices=None, tp: int = 1, **kw):
        per = n_stages * tp
        need = replicas * per
        devs = devices if devices is not None else jax.devices()[:need]
        if len(devs) < need:
            raise ValueError(f"need {need} devices "
                             f"({replicas} replicas x {n_stages} stages x "
                             f"tp {tp}), have {len(devs)}")
        self.spec = spec
        self.replicas = [
            PipelinedPredictor(spec, params, mode, n_stages=n_stages,
                               microbatch=microbatch,
                               devices=devs[r * per:(r + 1) * per], tp=tp,
                               **kw)
            for r in range(replicas)]
        self.ranges = self.replicas[0].ranges

    def __call__(self, x):
        from ..models.network import HeadOutput
        x = jnp.asarray(x)
        B, R = x.shape[0], len(self.replicas)
        if B % R:
            raise ValueError(f"batch {B} not divisible by {R} replicas")
        sh = B // R
        # all replicas dispatch before any result is read: the R wavefronts
        # overlap in wall-clock across their disjoint device sets
        outs = [rep(x[r * sh:(r + 1) * sh])
                for r, rep in enumerate(self.replicas)]
        anchor = self.replicas[0].placements[-1]
        heads = []
        for hi, h0 in enumerate(outs[0][0]):
            data = jnp.concatenate(
                [jax.device_put(o[0][hi].data, anchor) for o in outs], axis=0)
            heads.append(HeadOutput(h0.index, h0.kind, data))
        finals = [f for o in outs for f in o[1]["final"]]
        return tuple(heads), {"final": finals}

    def head_specs(self):
        return self.replicas[0].head_specs()
