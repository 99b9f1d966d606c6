"""Communication-volume accounting for the sharded inference programs.

The structural sharding proofs (tests/test_sharding_proof.py) show the SPMD
program *shards*; this module quantifies what sharding *costs*: per-device
collective byte volumes extracted from the compiled (per-device) HLO, plus a
roofline projection of multi-chip throughput from those volumes and the
measured single-chip compute time. This is the only multi-chip *performance*
evidence obtainable on a 1-chip relay — the reference has no analog (it is
single-device end to end, SURVEY §2.8).

Byte semantics: for every collective instruction we record the bytes of its
per-device RESULT (the tensor the op materializes on each participant).
``wire_bytes`` converts result bytes to per-device ICI traffic with the
standard ring/bidirectional factors:

  * all-gather:         result V held by each device, (n-1)/n of it received
  * reduce-scatter:     result V/n from a V input: (n-1) x result received
  * all-reduce:         ring = reduce-scatter + all-gather: 2 (n-1)/n x V
  * all-to-all:         (n-1)/n of the result crosses links
  * collective-permute: the whole result is received (halo bands)

The projection model (``project_throughput``) is a two-resource roofline:
per-image compute time scales 1/N off the measured single-chip ms/img, and
per-image ICI time is wire bytes over the per-chip ICI bandwidth. Reported
both with perfect compute/comm overlap (max) and with none (sum) — real
hardware lands between. ICI_BW_V5E is the public one-way per-link figure
(4.5e10 B/s, "How to Scale Your Model"); a 2D-torus chip has 4 links but a
1D ring uses one pair, so the conservative default is ONE link's worth.
"""

from __future__ import annotations

import re
from collections import defaultdict

ICI_BW_V5E = 4.5e10   # bytes/s one-way per link, TPU v5e

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "f16": 2, "bf16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
}

COLLECTIVE_OPS = ("all-gather", "all-reduce", "reduce-scatter",
                  "collective-permute", "all-to-all")

_OP_RE = re.compile(
    r"=\s+(?P<result>.*?)\s+"
    r"(?P<op>all-gather|all-reduce|reduce-scatter|collective-permute|"
    r"all-to-all)(?P<suffix>-start|-done)?\(")
_ARRAY_RE = re.compile(r"(?P<dt>[a-z]+\d*)\[(?P<dims>[\d,]*)\]")


def _array_bytes(dt: str, dims: str) -> int:
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * _DTYPE_BYTES[dt]


_GROUPS_EXPLICIT_RE = re.compile(r"replica_groups=\{\{([^}]*)\}")
_GROUPS_IOTA_RE = re.compile(r"replica_groups=\[(\d+),(\d+)\]<=")


def _group_size(line: str):
    """Participant count of the collective on this HLO line, from its
    replica_groups — explicit ``{{0,1},{2,3}}`` (first group's element
    count) or iota ``[G,S]<=[N]`` (S devices per group). None when absent
    or empty (= all devices)."""
    m = _GROUPS_IOTA_RE.search(line)
    if m:
        return int(m.group(2))
    m = _GROUPS_EXPLICIT_RE.search(line)
    if m and m.group(1).strip():
        return len(m.group(1).split(","))
    return None


def collective_volumes(hlo_text: str) -> dict:
    """Per-op-class {op: {"count": int, "result_bytes": int,
    "group_bytes": {group_size: bytes}}} from the SPMD (per-device) HLO
    text. Async pairs are counted once: the ``-start`` op carries the result
    type (last array in its result tuple); ``-done`` ops are skipped. Bytes
    are per device per program execution. ``group_bytes`` buckets by the
    collective's OWN participant count (its replica_groups): on a mixed
    data x model mesh a model-axis all-gather runs over the model subgroup,
    not the whole mesh — ring factors must use the subgroup size (round-5
    review; key None = no/empty replica_groups = all devices)."""
    out: dict = defaultdict(lambda: {"count": 0, "result_bytes": 0,
                                     "group_bytes": defaultdict(int)})
    for line in hlo_text.splitlines():
        m = _OP_RE.search(line)
        if not m or m.group("suffix") == "-done":
            continue
        arrays = _ARRAY_RE.findall(m.group("result"))
        if not arrays:
            continue
        if m.group("suffix") == "-start":
            # async result tuple = (operand aliases..., result): take the last
            arrays = arrays[-1:]
            nbytes = _array_bytes(*arrays[0])
        else:
            nbytes = sum(_array_bytes(dt, dims) for dt, dims in arrays)
        rec = out[m.group("op")]
        rec["count"] += 1
        rec["result_bytes"] += nbytes
        rec["group_bytes"][_group_size(line)] += nbytes
    return {op: {**rec, "group_bytes": dict(rec["group_bytes"])}
            for op, rec in out.items()}


def wire_bytes(volumes: dict, n: int) -> float:
    """Per-device ICI traffic (bytes received per program execution) from the
    result-byte inventory, with the ring factors from the module docstring.
    Each collective's ring factor uses ITS participant count (the
    replica_groups bucket), falling back to ``n`` for buckets without one —
    on a mixed mesh the model-axis subgroup is smaller than the mesh."""
    total = 0.0
    for op, rec in volumes.items():
        buckets = rec.get("group_bytes") or {None: rec["result_bytes"]}
        for g, v in buckets.items():
            g = g or n
            if g <= 1 and op != "collective-permute":
                continue          # single-participant group: nothing crosses
            if op == "all-gather":
                total += v * (g - 1) / g
            elif op == "reduce-scatter":
                total += v * (g - 1)
            elif op == "all-reduce":
                total += 2 * v * (g - 1) / g
            elif op == "all-to-all":
                total += v * (g - 1) / g
            elif op == "collective-permute":
                total += v
    return total


def measure_mesh_comm(spec, params, mesh, *, mode="fp32", batch=1,
                      compute_dtype=None):
    """Compile the sharded program on ``mesh`` and return
    (volumes, wire_bytes_per_image) for one device. ``batch`` is the GLOBAL
    batch; per-image normalization divides by the images a step processes."""
    import jax.numpy as jnp
    import numpy as np

    from .mesh import make_sharded_predict

    kw = {"compute_dtype": compute_dtype} if compute_dtype is not None else {}
    fn, sharded = make_sharded_predict(spec, params, mesh, mode=mode, **kw)
    x = np.zeros((batch, spec.net.h, spec.net.w, spec.net.c), np.float32)
    text = fn.lower(sharded, x).compile().as_text()
    vols = collective_volumes(text)
    n = 1
    for ax in ("data", "space", "model"):
        n *= mesh.shape.get(ax, 1)
    # one device's compiled program processes batch/n_data images (the data
    # axis shards the global batch), so ITS wire bytes normalize by those —
    # dividing by the global batch would under-report per-image ICI traffic
    # by the data-axis factor on mixed meshes (round-5 review)
    images_per_device = max(1, batch // mesh.shape.get("data", 1))
    per_image = wire_bytes(vols, n) / images_per_device
    return vols, per_image


def pp_boundary_bytes(spec, ranges, dtype_bytes=4) -> list:
    """Analytic pp handoff volume per stage boundary, PER IMAGE
    (microbatch=1): bytes of every live tensor crossing the boundary — the
    running activation plus route/shortcut carries, exactly
    ``parallel.pp.carried_for_boundary``'s liveness set. Unlike the GSPMD
    axes this is point-to-point (device_put, no collectives), so it comes
    from layer shapes, not HLO."""
    from .pp import carried_for_boundary

    out = []
    for s in range(len(ranges) - 1):
        stop = ranges[s][1]
        nbytes = 0
        for idx in sorted(carried_for_boundary(spec, stop)):
            l = spec.layers[idx]
            nbytes += l.out_h * l.out_w * l.out_c * dtype_bytes
        out.append(nbytes)
    return out


def project_throughput(single_chip_ms_img: float, per_image_wire: dict,
                       ici_bw: float = ICI_BW_V5E) -> list:
    """Roofline projection rows: for each (axis, N) -> per-image wire bytes,
    return dicts with compute/comm ms and projected img/s (overlap and
    no-overlap). ``per_image_wire`` maps (label, n_chips) -> bytes/image."""
    rows = []
    for (label, n), bytes_img in sorted(per_image_wire.items(),
                                        key=lambda kv: (kv[0][0], kv[0][1])):
        t_comp = single_chip_ms_img / n
        t_comm = bytes_img / ici_bw * 1e3
        overlap = 1e3 / max(t_comp, t_comm)
        serial = 1e3 / (t_comp + t_comm)
        rows.append({
            "mesh": label, "chips": n,
            "wire_mb_img": bytes_img / 1e6,
            "compute_ms_img": t_comp, "comm_ms_img": t_comm,
            "img_s_overlap": overlap, "img_s_serial": serial,
            "comm_bound": t_comm > t_comp,
        })
    return rows
