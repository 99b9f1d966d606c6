"""Command-line driver with the reference's interface
(reference: main/run_detector, src/main.c:584-667).

Usage mirrors the reference binary:

    yolo2-light-tpu detector test  <names> <cfg> [weights] [image] [flags]
    yolo2-light-tpu detector map   <datacfg> <cfg> [weights] [flags]
    yolo2-light-tpu detector calibrate <datacfg> <cfg> [weights] [flags]
    yolo2-light-tpu detector demo  <names> <cfg> [weights] [video] [flags]

Flags: -thresh F (default .25 like the reference; the shipped scripts pass .24),
-iou_thresh F, -quantized, -bf16, -fp32 (demo: full-fp32 convs + float ingest —
the reference-exact video path; demo otherwise defaults to bf16 for speed),
-dont_show, -letterbox, -out_filename S,
-save PATH, -c CAM_INDEX, -s FRAME_SKIP (demo), -int8_policy cpu|gpu|cpu_old,
-device_nms (map/demo: greedy NMS on device, fused into the XLA program),
-k N (map/demo: initial candidate-buffer size; saturation auto-grows to the
net's total candidate count — size up front only to skip the re-run cost;
with -device_nms the ceiling is 4096, its IoU matrix is O(K^2)),
-xnor_kernel int8|pallas|pallas_mxu|auto (auto: per-layer fastest measured
engine — bit-identical either way), -batch N (map/demo device batch),
-int8_impl xla|fused|pallas (-quantized conv engine; "fused" runs darknet53
residual stages as single Pallas kernels with the trunk VMEM-resident,
bit-exact on hardware but measured slower than the default XLA engine —
ops/pallas_fused.py, PERF_NOTES.md),
-uint8_ingest / -no_uint8_ingest (demo: force/disable uint8 frame shipping
independently of compute dtype),
-device_resize (demo: ship SOURCE-resolution frames; the darknet-exact
bilinear resize runs on device — frees the serving host, and uint8 ingest
then carries raw camera bytes with no re-quantization),
-parallel N -tp M -sp K
(map sharding: data x tensor x spatial mesh axes),
-pp S (test/map/demo: pipeline parallelism — BFLOPs-balanced layer stages on S
devices, GPipe wavefront microbatching; parallel/pp.py),
-pp_tp T (with -pp: tensor-parallel width INSIDE each pipeline stage — every
stage becomes a T-device model-axis mesh, S*T devices total),
-params_cache DIR (converted-weights cache),
-input_calibration N / -calib_method device|host (calibrate), -profile DIR, -i N,
-turbo (TPU-native extension: materialize inter-layer activations as bf16 —
all conv/epilogue math stays f32 in-register; measured 0.420 -> 0.393 ms/img
int8 and 0.588 -> 0.506 bf16 device-resident. NOT reference-exact: values at
an int8 quantization-bin boundary can flip one bin, like -calib_method
device; see PERF_NOTES.md round 3),
-turbo_int8 (with -quantized: the rung below -turbo — residual-trunk
activations materialize as int8 at the consumer conv's calibrated input
multiplier, 4x less HBM traffic than f32; math stays f32/int32 in-register
and heads are f32. Bounded non-exact mode quantified at the mAP level by
tests/test_turbo_metric.py; see models/network.py residual_dtype="int8").
"""

from __future__ import annotations

import sys


def _find_flag(args, name):
    if name in args:
        args.remove(name)
        return True
    return False


def _find_value(args, name, default, cast=str):
    if name in args:
        i = args.index(name)
        val = args[i + 1]
        del args[i:i + 2]
        return cast(val)
    return default


def _enable_compile_cache():
    """Persistent XLA compilation cache: repeat CLI invocations skip the (expensive,
    possibly remote) compile step."""
    import os
    try:
        import jax
        d = os.path.expanduser("~/.cache/yolo2_light_tpu/xla")
        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


class _TrackedStream:
    """Transparent stream wrapper recording the last write time (shared by the
    stall watchdog, so steady progress output suppresses the hint)."""

    def __init__(self, stream, state):
        self._stream = stream
        self._state = state

    def write(self, data):
        import time
        self._state["last"] = time.monotonic()
        return self._stream.write(data)

    def __getattr__(self, name):
        return getattr(self._stream, name)


def main(argv=None) -> int:
    # Backend override: some TPU plugins (axon) install a sitecustomize that
    # clobbers the JAX_PLATFORMS env var, so an env var alone cannot force the
    # CPU backend; the config call below is applied before any jax.devices()
    # commits the backend. Used to run the CLI on TPU-less hosts and to drive
    # the multi-device mesh flags (-parallel/-tp/-sp) on virtual CPU devices
    # (with XLA_FLAGS=--xla_force_host_platform_device_count=N).
    import os
    plat = os.environ.get("YOLO2_TPU_PLATFORM")
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)
    _enable_compile_cache()
    # long-stall hint: first compiles legitimately take minutes through a
    # remote-compile relay, but a relay outage blocks even device discovery
    # indefinitely — tell the user which is plausible instead of hanging mute.
    # The hint only fires after 3 min of SILENCE (any stdout/stderr output
    # resets the window), so long-but-chatty runs (large map evals) stay clean.
    import threading
    import time
    state = {"last": time.monotonic()}
    stop = threading.Event()

    def _watch():
        while not stop.wait(15.0):
            if time.monotonic() - state["last"] >= 180.0:
                print(
                    "note: 3 min without output — normal for first-run XLA "
                    "compilation; if this persists >10 min, the TPU/relay may "
                    "be unavailable", file=sys.__stderr__)
                return

    out, err = sys.stdout, sys.stderr
    sys.stdout = _TrackedStream(out, state)
    sys.stderr = _TrackedStream(err, state)
    watchdog = threading.Thread(target=_watch, daemon=True)
    watchdog.start()
    try:
        return _main(argv)
    except FileNotFoundError as e:
        # reference: file_error() prints and exit(0)s — yes, zero
        # (src/additionally.c:1610-1614)
        print(f"Couldn't open file: {e.filename or e}", file=sys.stderr)
        return 0
    except ValueError as e:
        # bad flag values (unknown -int8_impl/-xnor_kernel/-int8_policy, ...)
        print(f"Error: {e}", file=sys.stderr)
        return 1
    finally:
        stop.set()
        sys.stdout, sys.stderr = out, err


def _main(argv=None) -> int:
    args = list(sys.argv[1:] if argv is None else argv)
    if len(args) < 1:
        print("usage: yolo2-light-tpu <function>", file=sys.stderr)
        return 0
    if args[0] != "detector":
        print(f"Not an option: {args[0]}", file=sys.stderr)
        return 1
    args = args[1:]

    dont_show = _find_flag(args, "-dont_show")
    bf16 = _find_flag(args, "-bf16")
    fp32 = _find_flag(args, "-fp32")  # demo: full fp32 + float ingest (the
    #                                   reference-exact video path; demo
    #                                   otherwise defaults to bf16 for speed)
    turbo = _find_flag(args, "-turbo")
    turbo_int8 = _find_flag(args, "-turbo_int8")
    if turbo and turbo_int8:
        print("error: -turbo and -turbo_int8 are mutually exclusive (bf16 "
              "vs int8 residual materialization)", file=sys.stderr)
        return 1
    if turbo_int8:
        turbo = "int8"   # the rung below -turbo: int8 residual trunk
    quantized = _find_flag(args, "-quantized")
    if turbo_int8 and not quantized:
        print("error: -turbo_int8 requires -quantized (the residual trunk "
              "quantizes at the int8 convs' calibrated input multipliers)",
              file=sys.stderr)
        return 1
    letterbox = _find_flag(args, "-letterbox")
    thresh = _find_value(args, "-thresh", 0.25, float)
    iou_thresh = _find_value(args, "-iou_thresh", 0.5, float)
    cam_index = _find_value(args, "-c", 0, int)       # src/main.c:591
    frame_skip = _find_value(args, "-s", 0, int)      # src/main.c:594
    prefix = _find_value(args, "-prefix", None)
    out_filename = _find_value(args, "-out_filename", None)
    save_path = _find_value(args, "-save", "predictions")
    int8_policy = _find_value(args, "-int8_policy", "cpu")
    # conv-engine selection for -quantized: xla (default), fused (Pallas
    # residual-stage kernel, bit-exact — ops/pallas_fused.py), pallas
    # (experimental per-conv kernel, ops/pallas_int8.py)
    int8_impl = _find_value(args, "-int8_impl", "xla")
    device_nms = _find_flag(args, "-device_nms")
    device_resize = _find_flag(args, "-device_resize")
    # demo ingest precision override (default: uint8 under bf16, float otherwise)
    uint8_ingest = None
    if _find_flag(args, "-uint8_ingest"):
        uint8_ingest = True
    if _find_flag(args, "-no_uint8_ingest"):
        uint8_ingest = False
    topk = _find_value(args, "-k", 0, int)  # candidate-buffer K (map/demo)
    xnor_kernel = _find_value(args, "-xnor_kernel", "int8")
    device_index = _find_value(args, "-i", 0, int)
    if device_index:
        # reference: -i selects the GPU (src/main.c:653-661); here the device
        import jax
        try:
            jax.config.update("jax_default_device", jax.devices()[device_index])
        except IndexError:
            print(f"device index {device_index} out of range "
                  f"({len(jax.devices())} devices)", file=sys.stderr)
            return 1
    input_calibration = _find_value(args, "-input_calibration", 0, int)
    calib_method = _find_value(args, "-calib_method", "device")
    params_cache = _find_value(args, "-params_cache", None)
    batch = _find_value(args, "-batch", 0, int)
    data_parallel = _find_value(args, "-parallel", 0, int)
    tensor_parallel = _find_value(args, "-tp", 0, int)
    spatial_parallel = _find_value(args, "-sp", 0, int)
    pipeline_parallel = _find_value(args, "-pp", 0, int)
    pp_tensor_parallel = _find_value(args, "-pp_tp", 1, int)
    profile_dir = _find_value(args, "-profile", None)
    if pp_tensor_parallel > 1 and pipeline_parallel <= 1:
        # -pp_tp is only consumed inside pipeline stages; silently ignoring it
        # would give a user who asked for tensor sharding a single-device run
        print("error: -pp_tp requires -pp S with S > 1 (tensor parallelism "
              "inside pipeline stages); for a global tensor axis use -tp",
              file=sys.stderr)
        return 1

    if len(args) < 2:
        print("usage: yolo2-light-tpu detector [test/map/calibrate/demo] "
              "[names/datacfg] [cfg] [weights (optional)]", file=sys.stderr)
        return 1

    sub = args[0]
    if device_nms and sub in ("test", "calibrate"):
        # -device_nms is only consumed by map/demo (the test app is the
        # host-post oracle path); silently ignoring it would tell a user
        # their NMS ran on device when it didn't (same class as the -pp_tp
        # guard above)
        print("error: -device_nms applies to detector map/demo only "
              "(detector test uses the reference host post-processing path)",
              file=sys.stderr)
        return 1
    obj_names = args[1]
    cfg = args[2] if len(args) > 2 else None
    weights = args[3] if len(args) > 3 else None
    filename = args[4] if len(args) > 4 else None
    if cfg is None:
        print("error: missing cfg file", file=sys.stderr)
        return 1

    compute_dtype = None
    if bf16:
        import jax.numpy as jnp
        compute_dtype = jnp.bfloat16
    elif fp32:
        import jax.numpy as jnp
        compute_dtype = jnp.float32
    if sub == "test":
        from ..datacfg import load_names
        from .detect import run
        names = load_names(obj_names)
        if profile_dir:
            from ..utils.profiling import trace
            with trace(profile_dir):
                run(names, cfg, weights, filename, thresh=thresh,
                    quantized=quantized, dont_show=dont_show,
                    int8_policy=int8_policy, save_path=save_path,
                    letter=letterbox, xnor_impl=xnor_kernel,
                    compute_dtype=compute_dtype, params_cache=params_cache,
                    turbo=turbo, int8_impl=int8_impl,
                    pp_stages=pipeline_parallel, pp_tp=pp_tensor_parallel)
        else:
            run(names, cfg, weights, filename, thresh=thresh, quantized=quantized,
                dont_show=dont_show, int8_policy=int8_policy, save_path=save_path,
                letter=letterbox, xnor_impl=xnor_kernel,
                compute_dtype=compute_dtype, params_cache=params_cache,
                turbo=turbo, int8_impl=int8_impl,
                pp_stages=pipeline_parallel, pp_tp=pp_tensor_parallel)
        return 0
    elif sub == "map":
        from .map import validate_detector_map
        kw = {}
        if batch > 0:
            kw["batch"] = batch
        if topk > 0:
            kw["k"] = topk
        validate_detector_map(obj_names, cfg, weights, thresh=thresh,
                              quantized=quantized, iou_thresh=iou_thresh,
                              int8_policy=int8_policy,
                              data_parallel=data_parallel,
                              tensor_parallel=tensor_parallel,
                              spatial_parallel=spatial_parallel,
                              pipeline_parallel=pipeline_parallel,
                              pp_tp=pp_tensor_parallel,
                              compute_dtype=compute_dtype,
                              params_cache=params_cache,
                              device_nms=device_nms, turbo=turbo,
                              int8_impl=int8_impl, **kw)
        return 0
    elif sub == "calibrate":
        if bf16:
            print("note: calibrate always runs fp32 (calibration statistics are "
                  "precision-sensitive); -bf16 ignored", file=sys.stderr)
        if calib_method == "device":
            # the vectorized device sweep can land one threshold bin off the
            # reference's serial accumulation (~0.03% multiplier deviation);
            # the host method is the bit-exact oracle path (quant.py docs)
            print("note: -calib_method device (default) is fast but may differ "
                  "from the reference by one threshold bin; use -calib_method "
                  "host for bit-exact calibration", file=sys.stderr)
        from .calibrate import validate_calibrate
        validate_calibrate(obj_names, cfg, weights,
                           input_calibration=input_calibration,
                           method=calib_method)
        return 0
    elif sub == "demo":
        from ..datacfg import load_names
        from .demo import demo
        names = load_names(obj_names)
        demo(cfg, weights, thresh, filename, names, quantized=quantized,
             out_filename=out_filename, dont_show=dont_show,
             int8_policy=int8_policy, compute_dtype=compute_dtype,
             prefix=prefix, cam_index=cam_index, frame_skip=frame_skip,
             batch=batch, params_cache=params_cache, device_nms=device_nms,
             uint8_ingest=uint8_ingest, turbo=turbo, int8_impl=int8_impl,
             device_resize=device_resize,
             pipeline_parallel=pipeline_parallel, pp_tp=pp_tensor_parallel,
             **({"k": topk} if topk > 0 else {}))
        return 0
    print(f"Not an option: {sub}", file=sys.stderr)
    return 1


if __name__ == "__main__":
    sys.exit(main())
