"""Single-image detection app (reference: test_detector_cpu, src/main.c:156-247).

Pipeline: parse cfg -> load weights -> fuse BN -> (binarize XNOR) -> (quantize INT8)
-> resize image (darknet bilinear) -> jitted forward -> decode -> NMS -> print + draw.
"""

from __future__ import annotations

import time

import numpy as np

from ..cfg import parse_network_cfg
from ..io import image as im_io
from ..models.network import Predictor
from ..post import boxes as post
from ..quant import quantize_params
from ..weights import fuse_conv_batchnorm, load_weights, random_params
from ..xnor import binarize_params


def build_params(cfgfile: str, weightfile, quantized: bool = False,
                 batch: int = 1, seed: int = 0, params_cache=None,
                 echo: bool = True, quant_banner: bool = False):
    """Shared init chain (reference: src/main.c:160-171 and :4552-4561):
    parse -> load/init -> BN-fuse -> XNOR-binarize -> (INT8-quantize).

    ``echo``: print the reference's construction-time stderr (layer table,
    "Loading weights from ...Done!") — on by default because this IS the
    app-level init chain; pass False for silent library use.

    ``params_cache``: optional directory; the fully transformed pytree is cached
    as .npz keyed by (weights path, mtime, size, quantized, cfg content digest)
    so repeated CLI runs skip load+fuse+binarize+quantize (SURVEY §5
    checkpoint/resume analog — the reference re-reads/transforms .weights every
    run). The cfg digest matters: the transforms bake cfg state into the params
    (input_calibration= scales into the INT8 multipliers, per-layer xnor= flags
    into binarization), so e.g. pasting a fresh `detector calibrate` line into
    the cfg — or two cfgs sharing one .weights — must miss the cache."""
    spec = parse_network_cfg(cfgfile, batch=batch, quantized=quantized,
                             echo_table=echo)
    mode = "int8" if quantized else "fp32"

    cpath = None
    if params_cache and weightfile:
        import hashlib
        import os
        from ..weights import load_params_cache
        st = os.stat(weightfile)
        with open(cfgfile, "rb") as f:
            cfg_digest = hashlib.sha1(f.read()).hexdigest()
        key = hashlib.sha1(
            f"{os.path.abspath(weightfile)}:{st.st_mtime_ns}:{st.st_size}:"
            f"{quantized}:{cfg_digest}".encode()).hexdigest()[:16]
        os.makedirs(params_cache, exist_ok=True)
        cpath = os.path.join(params_cache, f"params_{key}.npz")
        if os.path.exists(cpath):
            return spec, load_params_cache(cpath, spec.n), mode

    if weightfile:
        params = load_weights(spec, weightfile, verbose=echo)
    else:
        params = random_params(spec, seed=seed)
    params = fuse_conv_batchnorm(spec, params)
    params = binarize_params(spec, params)
    if quantized:
        if echo and quant_banner:
            # test/demo print this banner before quantization; the map app
            # does not (reference: main.c:169,467 vs additionally.c:4560)
            print("\n\n Quantinization! \n")
        params = quantize_params(spec, params, echo=echo)
    if cpath:
        from ..weights import save_params_cache
        save_params_cache(params, cpath)
    return spec, params, mode


class _PipelinedAdapter:
    """Predictor-interface shim over PipelinedPredictor: heads-only __call__
    (the pipeline additionally returns its carried-state aux, which the apps
    never consume)."""

    def __init__(self, ppred):
        self._pp = ppred
        self.spec = ppred.spec

    def __call__(self, x):
        heads, _aux = self._pp(x)
        return heads

    def head_specs(self):
        return self._pp.head_specs()


def build_predictor(cfgfile: str, weightfile, quantized: bool = False,
                    int8_policy: str = "cpu", batch: int = 1,
                    compute_dtype=None, seed: int = 0, xnor_impl: str = "int8",
                    params_cache=None, turbo: bool = False,
                    int8_impl: str = "xla", pp_stages: int = 0,
                    pp_tp: int = 1):
    import jax.numpy as jnp
    spec, params, mode = build_params(cfgfile, weightfile, quantized,
                                      batch=batch, seed=seed,
                                      params_cache=params_cache,
                                      quant_banner=True)
    cd = compute_dtype if compute_dtype is not None else jnp.float32
    if pp_stages and pp_stages > 1:
        from ..parallel.pp import PipelinedPredictor
        pred = _PipelinedAdapter(PipelinedPredictor(
            spec, params, mode, n_stages=pp_stages, microbatch=1,
            int8_policy=int8_policy, compute_dtype=cd, xnor_impl=xnor_impl,
            turbo=turbo, int8_impl=int8_impl, tp=max(1, pp_tp)))
    else:
        pred = Predictor(spec, params, mode, int8_policy=int8_policy,
                         compute_dtype=cd, xnor_impl=xnor_impl, turbo=turbo,
                         int8_impl=int8_impl)
    return spec, pred


def forward_echo(spec) -> str:
    """The quantized forward's per-layer stdout block, one line per conv
    (reference: every quantized forward printf's '%d - CONVOLUTIONAL ...
    l.size' per conv and ' layer: 4 ' for standalone softmax,
    yolov2_forward_network_quantized.c:1039,1070). Synthesised from the spec
    at print time — the demo prints it per FRAME (one reference forward per
    frame) even though frames run batched on device."""
    from ..cfg import ConvSpec, SoftmaxSpec
    parts = []
    for l in spec.layers:
        if isinstance(l, ConvSpec):
            parts.append(f"\n {l.index} - CONVOLUTIONAL \t\t l.size = {l.size}  \n")
        elif isinstance(l, SoftmaxSpec):
            parts.append("\n layer: 4 \n")
    return "".join(parts)


def detect_image(pred, spec, filename: str, thresh: float, nms: float,
                 names, letter: bool = False, echo_layers: bool = False):
    """Run one image through the predictor; returns (dets, image, elapsed).
    ``letter`` selects aspect-preserving letterbox preprocessing + the matching
    coordinate correction (the reference app always stretches, src/main.c:189).
    ``echo_layers``: print the quantized forward's per-layer stdout lines
    (every conv prints '%d - CONVOLUTIONAL ... l.size', standalone softmax
    hits the else branch — yolov2_forward_network_q, :1039,1070)."""
    im = im_io.load_image(filename, 3)
    if letter:
        sized = im_io.letterbox_image(im, spec.net.w, spec.net.h)
    else:
        sized = im_io.resize_image(im, spec.net.w, spec.net.h)
    t0 = time.time()
    heads = pred(im_io.to_batch(sized))
    head_outputs = [np.asarray(h.data[0]) for h in heads]
    elapsed = time.time() - t0
    if echo_layers:
        print(forward_echo(spec), end="")
    head_specs = pred.head_specs()
    dets = post.get_network_boxes(head_outputs, head_specs,
                                  im.shape[1], im.shape[0],
                                  spec.net.w, spec.net.h, thresh,
                                  relative=True, letter=letter)
    # reference uses the final layer's classes (0 for a headless net, where
    # there are no detections and NMS is a no-op; src/main.c:192-228)
    classes = head_specs[-1].classes if head_specs else 0
    if nms:
        post.do_nms_sort(dets, classes, nms)
    return dets, im, elapsed


def run(names, cfgfile: str, weightfile, filename, thresh: float = 0.24,
        quantized: bool = False, dont_show: bool = True,
        int8_policy: str = "cpu", save_path: str = "predictions",
        letter: bool = False, xnor_impl: str = "int8",
        compute_dtype=None, params_cache=None, turbo: bool = False,
        int8_impl: str = "xla", pp_stages: int = 0, pp_tp: int = 1) -> str:
    """Single-image detect; with no filename, loops reading image paths from stdin
    (reference: test_detector_cpu while(1) fgets loop, src/main.c:176-186)."""
    spec, pred = build_predictor(cfgfile, weightfile, quantized,
                                 int8_policy=int8_policy, xnor_impl=xnor_impl,
                                 compute_dtype=compute_dtype,
                                 params_cache=params_cache, turbo=turbo,
                                 int8_impl=int8_impl, pp_stages=pp_stages,
                                 pp_tp=pp_tp)
    nms = 0.2 if quantized else 0.4  # reference: src/main.c:174,213
    head_specs = pred.head_specs()
    classes = head_specs[-1].classes if head_specs else 0
    text = ""
    while True:
        fname = filename
        if fname is None:
            import sys
            print("Enter Image Path: ", end="", flush=True)
            line = sys.stdin.readline()
            if not line:
                return text
            fname = line.strip()
            if not fname:
                continue
        dets, im, elapsed = detect_image(pred, spec, fname, thresh, nms, names,
                                         letter=letter, echo_layers=quantized)
        note = ""
        if elapsed > 2.0:
            note = " (first call includes XLA compilation; repeat runs are warm)"
        print(f"{fname}: Predicted in {elapsed:f} seconds.{note}")
        text = post.format_detections(dets, names, thresh, im.shape[1],
                                      im.shape[0])
        if text:
            print(text)
        im_io.draw_detections(im, dets, names, thresh, classes)
        im_io.save_image_png(im, save_path)
        if not dont_show:
            # show_image analog (main.c:234): interactive window when a
            # display exists; otherwise fall through to the reference's
            # non-OpenCV branch (stderr note + re-save)
            import sys
            rgb = np.clip(im * 255.0, 0, 255).astype(np.uint8)
            if not im_io.show_image_window(rgb, "predictions"):
                print(f"Not compiled with OpenCV, saving to {save_path}.png "
                      "instead", file=sys.stderr)
                im_io.save_image_png(im, save_path)
        if filename is not None:
            return text
