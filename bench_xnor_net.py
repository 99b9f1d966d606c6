"""Full-net XNOR engine comparison on tiny-yolo-obj_xnor (416 input).

Device-resident forward ms/img (bench.device_resident_ms_img harness: in-jit
fori_loop, carry-dependent input, full-head consumption) for each
-xnor_kernel engine. The per-shape sweep (bench_xnor.py, PERF_NOTES 'Round 4:
XNOR') showed the bit-packed MXU kernel wins when the GEMM M dimension
(TOTAL output pixels batch*oh*ow) is <= 19^2 and loses above; "auto" picks
per layer on that M — this measures the net-level payoff of the mix at b=1
(latency regime: deep layers pick MXU) and confirms at batch it matches the
all-dense engine (M large everywhere -> same program).

Usage: python bench_xnor_net.py [batch] [engines,comma,list]
"""

import os
import sys

import numpy as np


def main():
    import jax

    cache = os.path.expanduser("~/.cache/yolo2_light_tpu/xla")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import device_resident_ms_img
    from yolo2_light_tpu.cfg import parse_network_cfg
    from yolo2_light_tpu.weights import fuse_conv_batchnorm, random_params
    from yolo2_light_tpu.xnor import binarize_params

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    engines = (sys.argv[2].split(",") if len(sys.argv) > 2
               else ["int8", "auto", "pallas_mxu"])

    cfg = "/root/reference/bin/tiny-yolo-obj_xnor.cfg"
    spec = parse_network_cfg(cfg, batch=1)
    params = binarize_params(
        spec, fuse_conv_batchnorm(spec, random_params(spec, seed=0)))
    print(f"net {spec.net.w}x{spec.net.h}, batch {batch}", flush=True)
    import jax.numpy as jnp
    # small batches must amortize the ~27ms relay RTT over many in-jit
    # iterations (PERF_NOTES methodology traps) or they measure the relay
    rep = 10 if batch >= 32 else 300
    for eng in engines:
        ms, lo, hi = device_resident_ms_img(
            spec, params, "fp32", batch=batch, xnor_impl=eng,
            compute_dtype=jnp.bfloat16, rep=rep)
        print(f"xnor_kernel={eng}: {ms:.4f} ms/img "
              f"(spread {lo:.4f}-{hi:.4f}) -> {1e3 / ms:.0f} img/s",
              flush=True)


if __name__ == "__main__":
    main()
