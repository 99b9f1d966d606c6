"""``detector calibrate`` app — produce INT8 ``input_calibration`` scales via KL
entropy calibration over a dataset.

Reference: validate_calibrate_valid (src/additionally.c:4902-5001) +
network_calibrate_cpu (src/yolov2_forward_network.c:731-831).

Per image, per conv layer: multiplier = entropy_calibration(conv_input, 1/16, 4096).
The per-layer result written to input_calibration.txt reproduces the reference's
accumulator indexing faithfully, including its quirks:

* multipliers for image k (k = 1..max_num) land in slot ``k + i*max_num`` of a flat
  array — so image max_num's multiplier for layer i lands in layer i+1's slot 0;
* the saved value is the mean of slots 0..max_num-1 of the layer's stripe, i.e. the
  mean over images 1..max_num-1 of this layer plus (for conv layers after the first)
  the final-image multiplier of the *previous* conv layer.

Deviation (documented): the reference only WRITES input_calibration.txt when
the valid list exceeds max_num images (the save triggers on image max_num+1
and the app exits inside that forward, src/yolov2_forward_network.c:753-773);
with a list of exactly max_num it silently produces nothing. We always save
after max_num images — strictly more useful, same multipliers.

Deviation (documented): the reference's calibration forward only executes
conv/maxpool/route/reorg/region layers, silently leaving upsample/shortcut/yolo
outputs as zeros (src/yolov2_forward_network.c:779-830 has no cases for them), which
corrupts downstream activations on yolov3-style nets. We run the full correct forward
instead; for nets made only of handled layer types the two agree exactly.
"""

from __future__ import annotations

import sys

import numpy as np

from ..cfg import ConvSpec
from ..datacfg import read_data_cfg
from ..io import image as im_io
from ..models.network import build_forward, params_to_device
from ..quant import entropy_calibration
from .detect import build_params


def calibrate_multipliers(spec, params, image_arrays, max_num: int,
                          method: str = "device") -> list:
    """Run calibration over ``image_arrays`` (iterable of [H,W,C] float32, already
    resized — consumed lazily, never materialized); returns the per-conv-layer
    saved multipliers (reference accumulator semantics). ``max_num`` = number of
    images used (reference default 1000).

    ``method="device"`` (default): per image, ONE jitted program runs the forward,
    builds per-conv |activation| histograms on device, and sweeps the KL
    thresholds vmapped — only n_convs floats come back to the host. ~100x the
    throughput of the reference's host sweep; multipliers can differ from the
    bit-exact path by one threshold bin (~0.03%).
    ``method="host"``: fetch activations and run the f64 host sweep
    (quant.entropy_calibration) — bit-parity with the reference oracle.
    """
    import jax

    from ..quant import activation_histogram, entropy_calibration_multipliers

    fwd = build_forward(spec, "fp32", capture_conv_inputs=True)
    dev_params = params_to_device(params)
    if method == "device":
        def step(p, x):
            conv_inputs = fwd(p, x)[1]["conv_inputs"]
            hists = jnp_stack([activation_histogram(ci) for ci in conv_inputs])
            return entropy_calibration_multipliers(hists)

        import jax.numpy as jnp
        jnp_stack = jnp.stack
        jitted = jax.jit(step)
    else:
        jitted = jax.jit(lambda p, x: fwd(p, x)[1]["conv_inputs"])

    conv_specs = [l for l in spec.layers if isinstance(l, ConvSpec)]
    conv_indices = [l.index for l in conv_specs]
    conv_sizes = [l.inputs for l in conv_specs]
    n_stripes = spec.n + 1  # +1: last conv's image-max_num write spills past its stripe
    arr = np.zeros(n_stripes * max_num, np.float32)

    counter = 0
    for img in image_arrays:
        if counter >= max_num:
            break
        if counter % 4 == 0:
            # loader-batch progress (reference nthreads=4 pipeline prints the
            # leading image index per batch, additionally.c:4955)
            print(f"{counter + 4}", file=sys.stderr)
        counter += 1
        if method == "device":
            mults = np.asarray(jitted(dev_params, img[None]))
            conv_inputs = None
        else:
            conv_inputs = jitted(dev_params, img[None])
            mults = None
        for k, (li, size) in enumerate(zip(conv_indices, conv_sizes)):
            if conv_inputs is not None:
                # host sweep per layer, with its " mult = ..." line printing
                # right before this layer's " multiplier = ..." line like the
                # reference's in-place call (yolov2_forward_network.c:787-788)
                mult = float(entropy_calibration(
                    np.asarray(conv_inputs[k]), 1.0 / 16, 4096, echo=True))
            else:
                mult = float(mults[k])
            # reference printf -> STDOUT (yolov2_forward_network.c:788)
            print(f" multiplier = {mult:f}, l.inputs = {size} \n")
            # reference indexes by LAYER index i, not conv ordinal; stripes follow
            # layer indices (src/yolov2_forward_network.c:792)
            arr[counter + li * max_num] = mult
            if counter >= max_num:
                stripe_vals = arr[li * max_num: li * max_num + max_num]
                res = float(stripe_vals.mean())
                arr[li * max_num] = res
                print(f" res_mult = {res:f}, max_num = {max_num} ")
    if counter == max_num and max_num % 4 == 0:
        # the reference's save triggers on the (max_num+1)th image, whose
        # loader batch prints its index before the exit (additionally.c:4955)
        print(f"{max_num + 4}", file=sys.stderr)
    return [float(arr[li * max_num]) for li in conv_indices]


def validate_calibrate(datacfg: str, cfgfile: str, weightfile, *,
                       input_calibration: int = 0,
                       out_path: str = "input_calibration.txt",
                       method: str = "device") -> list:
    options = read_data_cfg(datacfg)
    valid_images = options.get("valid", "data/train.txt")
    print(f"valid={valid_images} ")        # printf -> stdout (additionally.c:4907)
    if not input_calibration:
        print("\n -input_calibration <number> - isn't specified in command line, "
              "will be used 1000 images \n")   # additionally.c:4912
        input_calibration = 1000

    spec, params, _ = build_params(cfgfile, weightfile, quantized=False)
    with open(valid_images) as f:
        paths = [l.strip() for l in f if l.strip()]
    max_num = min(input_calibration, len(paths))

    # streamed: one image in flight at a time (a 1000x416x416 fp32 list would be
    # ~2 GB); the device step consumes each as it loads
    imgs = (im_io.resize_image(im_io.load_image(p, 3), spec.net.w, spec.net.h)
            for p in paths[:max_num])
    mults = calibrate_multipliers(spec, params, imgs, max_num, method=method)

    # reference: save banner, then prints each value as it writes the file,
    # ending "16 \n ---------------------------" with no trailing newline
    # (yolov2_forward_network.c:754-771)
    print("\n\n Saving coefficients to the input_calibration.txt file... \n")
    line = "input_calibration = " + "".join(f"{m:g}, " for m in mults) + "16"
    with open(out_path, "w") as f:
        f.write(line)
    print(line + " \n ---------------------------", end="", flush=True)
    return mults
