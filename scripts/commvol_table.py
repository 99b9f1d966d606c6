"""Generate SHARDING.md's communication-volume + projected-scaling table.

Compiles the sharded yolov3-416 inference program per mesh shape on the
8-virtual-device CPU backend, extracts per-device collective byte volumes
from the SPMD HLO (parallel/commvol.py), and prints a markdown table of
projected multi-chip throughput/latency on v5e ICI — the only multi-chip
performance evidence obtainable on a 1-chip relay. Run:

    python scripts/commvol_table.py

Single-chip compute anchors (BENCH/PERF_NOTES, measured on the real chip):
int8 0.420 ms/img, bf16 0.588 ms/img. tp/sp rows use the volume of the
matching mode's program; pp handoffs are analytic layer shapes (point-to-
point, no collectives).
"""

import json
import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")   # sitecustomize override (CLAUDE.md)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402

from yolo2_light_tpu.cfg import parse_network_cfg  # noqa: E402
from yolo2_light_tpu.parallel.commvol import (  # noqa: E402
    ICI_BW_V5E, collective_volumes, measure_mesh_comm, pp_boundary_bytes,
    project_throughput, wire_bytes)
from yolo2_light_tpu.parallel.mesh import make_mesh  # noqa: E402
from yolo2_light_tpu.parallel.pp import split_stages  # noqa: E402
from yolo2_light_tpu.quant import quantize_params  # noqa: E402
from yolo2_light_tpu.weights import (fuse_conv_batchnorm,  # noqa: E402
                                     random_params)

CFG = "/root/reference/bin/yolov3.cfg"
INT8_MS, BF16_MS = 0.420, 0.588


def main():
    spec = parse_network_cfg(CFG, batch=1)
    params = fuse_conv_batchnorm(spec, random_params(spec, seed=2))
    spec_q = parse_network_cfg(CFG, batch=1, quantized=True)
    qparams = quantize_params(spec_q, fuse_conv_batchnorm(
        spec_q, random_params(spec_q, seed=2)))

    wire, details = {}, {}
    for n in (2, 4, 8):
        for axis in ("model", "space"):
            label = {"model": "tp", "space": "sp"}[axis]
            kw = {axis: n}
            # int8 under sp hits the spatial-partitioner 3x3 guard; use the
            # fp32/bf16 program there (same f32 trunk tensors -turbo ships)
            if axis == "model":
                mesh = make_mesh(n, data=1, **kw)
                vols, per_img = measure_mesh_comm(
                    spec_q, qparams, mesh, mode="int8",
                    compute_dtype=jnp.bfloat16, batch=1)
                base_ms = INT8_MS
            else:
                mesh = make_mesh(n, data=1, **kw)
                vols, per_img = measure_mesh_comm(
                    spec, params, mesh, mode="fp32",
                    compute_dtype=jnp.bfloat16, batch=1)
                base_ms = BF16_MS
            wire[(label, n)] = per_img
            details[f"{label}{n}"] = {
                "volumes": vols, "wire_bytes_img": per_img, "base_ms": base_ms}
            print(f"measured {label}={n}: {per_img / 1e6:.2f} MB/img wire, "
                  f"{ {k: v['count'] for k, v in vols.items()} }",
                  file=sys.stderr)

    rows = []
    for (label, n), per_img in sorted(wire.items()):
        base = INT8_MS if label == "tp" else BF16_MS
        rows += project_throughput(base, {(label, n): per_img})

    # dp: zero collectives (asserted by test_sharding_proof) -> linear
    for n in (2, 4, 8):
        rows.append({"mesh": "dp", "chips": n, "wire_mb_img": 0.0,
                     "compute_ms_img": INT8_MS, "comm_ms_img": 0.0,
                     "img_s_overlap": n * 1e3 / INT8_MS,
                     "img_s_serial": n * 1e3 / INT8_MS, "comm_bound": False})

    # pp: analytic point-to-point handoffs; the wavefront makes throughput
    # 1/max(stage) with handoff overlapped by async dispatch
    for n in (2, 4, 8):
        ranges = split_stages(spec, n)
        bb = pp_boundary_bytes(spec, ranges)
        worst = max(bb)
        t_comp = INT8_MS          # per-image work unchanged, pipelined
        t_comm = worst / ICI_BW_V5E * 1e3
        rows.append({"mesh": "pp", "chips": n,
                     "wire_mb_img": sum(bb) / 1e6,
                     "compute_ms_img": t_comp / n, "comm_ms_img": t_comm,
                     "img_s_overlap": 1e3 / max(t_comp / n, t_comm),
                     "img_s_serial": 1e3 / (t_comp / n + t_comm),
                     "comm_bound": t_comm > t_comp / n})

    print("\n| mesh | chips | wire MB/img | compute ms | ICI ms | "
          "proj img/s (overlap) | proj img/s (serial) | bound |")
    print("|---|---|---|---|---|---|---|---|")
    for r in sorted(rows, key=lambda r: (r["mesh"], r["chips"])):
        print(f"| {r['mesh']} | {r['chips']} | {r['wire_mb_img']:.2f} | "
              f"{r['compute_ms_img']:.3f} | {r['comm_ms_img']:.3f} | "
              f"{r['img_s_overlap']:.0f} | {r['img_s_serial']:.0f} | "
              f"{'ICI' if r['comm_bound'] else 'compute'} |")

    with open(os.path.join(os.path.dirname(__file__), "..",
                           "commvol_yolov3_416.json"), "w") as f:
        json.dump({"rows": rows, "details": {
            k: {"wire_bytes_img": v["wire_bytes_img"],
                "base_ms": v["base_ms"],
                "volumes": v["volumes"]} for k, v in details.items()},
            "ici_bw": ICI_BW_V5E}, f, indent=1)
    print("\nwrote commvol_yolov3_416.json", file=sys.stderr)


if __name__ == "__main__":
    main()
