"""f64 noise-confirmation oracle for the cfg fuzzer (two-sided acceptance).

The fuzzer classifies some oracle-vs-ours diffs as "irreducible XLA-vs-libm
ULP noise" (sub-ULP sigmoid/FMA differences surfacing as print-boundary
flips or near-equal reordering). That acceptance used to be single-sided — a
logic bug producing small integer deltas would slip through the same gate.
This script is the confirming run: the SAME repo logic at float64
(x64 mode, ``compute_dtype=float64`` end to end — conv accumulation, host
decode, NMS, print math), whose own lowering noise is ~2^-29 below f32's.
If the divergence really lives in f32 lowering, then (a) the f64 output must
sit inside the same noise class vs the oracle, and (b) every still-disputed
printed field must be BOUNDARY-ADJACENT at f64: the true value sits within
noise distance of the print-rounding boundary, which is WHY two correct f32
implementations can round it differently. A logic bug reproduces at f64 with
fields uniformly far from boundaries and fails (b).

Usage (the fuzzer spawns this; x64 must be enabled before jax imports):

    python tests/fuzz_confirm.py <names> <cfg> <weights> <img> <thresh> \
        [-quantized]                                      # detect mode
    python tests/fuzz_confirm.py --map <datacfg> <cfg> <weights> <thresh> \
        [-quantized]                                      # map mode

Detect mode stdout: the detect app's detection lines, each main line
followed by ``#RAW <prob*100> <left> <top> <width> <height>``
(full-precision f64 pre-rounding values; secondary class lines get
``#RAW <prob*100>``). Map mode stdout: the map app's report block, computed
with f64 convs AND an f64 packed buffer/host chain (packed_dtype=float64 —
the one configuration where pipeline host math stays f64 end to end).
"""

import os
import sys

os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax

jax.config.update("jax_platforms", "cpu")    # sitecustomize override
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _min_quant_boundary_rel(spec, params, img) -> float:
    """Quantized-path mechanism evidence: the minimum RELATIVE distance of
    any int8 conv input element's ``x * input_quant_multipler`` to its
    trunc-toward-zero integer boundary, computed at f64. When this is at
    f32-ULP scale (<= ~1e-6), two correct f32 implementations can land the
    element in DIFFERENT int8 bins (the preceding float-side conv differs by
    ULPs), and the integer divergence propagates to the printed fields —
    irreducible cross-implementation noise specific to -quantized
    (confirmed on campaign net seed 2166: an element at 96.000004, 4e-8
    from its boundary, moved one conf print by 1%)."""
    import jax.numpy as jnp

    from yolo2_light_tpu.io.image import load_image, resize_image, to_batch
    from yolo2_light_tpu.models.network import (_int8_layer_set,
                                                build_forward,
                                                params_to_device)
    from yolo2_light_tpu.cfg import ConvSpec

    f = build_forward(spec, "int8", int8_policy="cpu",
                      capture_conv_inputs=True)
    im = load_image(img)
    x = to_batch(resize_image(im, spec.net.w, spec.net.h))
    _, aux = f(params_to_device(params), jnp.asarray(x, jnp.float64))
    iset = _int8_layer_set(spec, "cpu")
    convs = [l for l in spec.layers if isinstance(l, ConvSpec)]
    best = float("inf")
    for l, xin in zip(convs, aux["conv_inputs"]):
        if l.index not in iset:
            continue
        v = np.asarray(xin, np.float64) * float(
            params[l.index]["input_quant_multipler"])
        frac = np.abs(v - np.trunc(v))
        d = np.minimum(frac, 1.0 - frac)
        nz = np.abs(v) > 1e-3     # near-zero elements quantize to 0 either way
        rel = np.where(nz, d / np.maximum(np.abs(v), 1e-12), np.inf)
        best = min(best, float(rel.min()))
    return best


def main(names_file, cfg, weights, img, thresh, quantized):
    import jax.numpy as jnp

    from yolo2_light_tpu.apps.detect import build_params, detect_image
    from yolo2_light_tpu.datacfg import load_names
    from yolo2_light_tpu.models.network import Predictor
    from yolo2_light_tpu.post.boxes import _c_round, in_reference_order

    names = load_names(names_file)
    spec, params, mode = build_params(cfg, weights, quantized, echo=False)
    pred = Predictor(spec, params, mode, compute_dtype=jnp.float64)
    nms = 0.2 if quantized else 0.4   # reference: src/main.c:174,213
    dets, im, _ = detect_image(pred, spec, img, thresh, nms, names)
    if quantized:
        print(f"#QBOUND {_min_quant_boundary_rel(spec, params, img)!r}")
    assert dets.n == 0 or dets.prob.dtype == np.float64, dets.prob.dtype
    dets = in_reference_order(dets)
    im_w, im_h = im.shape[1], im.shape[0]

    # format_detections' loop, with a #RAW sidecar per printed line
    best_class = np.full(dets.n, -1)
    best_prob = np.full(dets.n, thresh, np.float64)
    for j in range(dets.prob.shape[1]):
        better = dets.prob[:, j] > best_prob
        best_class[better] = j
        best_prob[better] = dets.prob[better, j]
    sel = np.nonzero(best_class >= 0)[0]
    lefts = dets.bbox[sel, 0] - dets.bbox[sel, 2] / 2
    out = []
    for i in sel[np.argsort(lefts, kind="stable")]:
        bc = best_class[i]
        x, y, bw, bh = (float(v) for v in dets.bbox[i])
        p = float(dets.prob[i, bc]) * 100
        raw = [p, (x - bw / 2) * im_w, (y - bh / 2) * im_h,
               bw * im_w, bh * im_h]
        out.append(f"{names[bc]}: {p:.0f}%"
                   + "\t(left_x: {:4.0f}   top_y: {:4.0f}   width: {:4.0f}   "
                     "height: {:4.0f})".format(*(_c_round(v)
                                                 for v in raw[1:])))
        out.append("#RAW " + " ".join(repr(v) for v in raw))
        for j in range(dets.prob.shape[1]):
            if dets.prob[i, j] > thresh and j != bc:
                pj = float(dets.prob[i, j]) * 100
                out.append(f"{names[j]}: {pj:.0f}%")
                out.append(f"#RAW {pj!r}")
    print("\n".join(out))


def main_map(datacfg, cfg, weights, thresh, quantized):
    import jax.numpy as jnp

    from yolo2_light_tpu.apps.map import validate_detector_map

    validate_detector_map(datacfg, cfg, weights, thresh=thresh,
                          quantized=quantized, compute_dtype=jnp.float64,
                          packed_dtype=jnp.float64)


if __name__ == "__main__":
    a = sys.argv[1:]
    quantized = "-quantized" in a
    a = [x for x in a if x != "-quantized"]
    if a[0] == "--map":
        main_map(a[1], a[2], a[3], float(a[4]), quantized)
    else:
        main(a[0], a[1], a[2], a[3], float(a[4]), quantized)
