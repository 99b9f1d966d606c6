"""Benchmark: yolov3-416 inference throughput on one TPU chip.

Prints the driver-facing JSON metric line on stdout — INCREMENTALLY: the
line is emitted immediately after the primary measurement and RE-EMITTED
(enriched) after every secondary probe that completes. The driver takes the
last parseable line, so a run truncated at any point after the primary still
scores. Round 4 lost its metric (`BENCH_r04.json rc=124 parsed=null`)
because the single print sat after a worst-case ~80 min of init retries and
secondary probes; this structure makes that impossible. Everything that is
not the JSON line goes to stderr.

Wall-clock policy:
  * Backend init gets its own budget (YOLO2_BENCH_INIT_BUDGET, default 2700 s)
    because relay wedges recover in ~5-30 min (CLAUDE.md) and a wedge at
    capture time must not cost the round its metric.
  * The PRIMARY gets its own budget too (YOLO2_BENCH_PRIMARY_BUDGET, default
    2400 s, per-attempt cap 1800 s): a cold-cache full-net compile through
    the remote-compile relay has measured >900 s under congestion
    (2026-08-20: attempt 1 at 900 s + attempt 2 at the deadline's 270 s
    leftover both starved — the one number the round MUST capture cannot
    share the secondaries' window).
  * The secondaries' deadline (YOLO2_BENCH_DEADLINE, default 1200 s) starts
    AFTER the primary line is emitted. Each secondary is skipped outright
    when the remaining window is smaller than its floor, and is abandoned
    via a daemon-thread timeout bounded by the remaining window, so the
    final (already-emitted) JSON line is never at risk.
  * YOLO2_BENCH_WEDGE=<section> simulates a relay wedge inside that section
    (used by tests/test_bench_emit.py to prove a wedged run still yields a
    parsed line inside a driver-budget window).
  * YOLO2_BENCH_FAST=1 + YOLO2_BENCH_CFG=<mini cfg> + YOLO2_BENCH_PLATFORM=cpu
    shrink every probe for the CI-style self-test.

Primary metric (re-based in round 3): device-resident INT8 throughput at
batch 128 — bit-exact reference-cpu semantics, full-head-consumption in-jit
loop. This measures the CHIP, reproducibly: 0.420 ms/img with 0.1-0.3%
run-to-run spread across rounds and sessions. Rounds 1-2 used streamed
end-to-end throughput as the primary, and it whipsawed 109 -> 76 img/s on
pure tunnel noise while every chip-side number improved (VERDICT r2): the
axon relay (~60 MB/s, one ~25-30 ms RTT per fetch, multi-minute congestion
moods) is a dev-environment artifact, not part of the framework — a
production TPU serving deployment feeds from device/ICI-resident sources.

Parsed fields (one JSON line, re-emitted as fields accrue):
  * value — img/s = 1000 / int8_device_ms_img (primary).
  * int8_device_ms_img / int8_turbo_device_ms_img / bf16_device_ms_img
    (+ *_spread) — device-resident forward latency per image at b=128.
  * yuv_stream_img_s (+ _spread) — streamed frame->boxes with camera-native
    planar YUV420 uint8 ingest, b=64 depth-3 (halves H2D bytes vs RGB; the
    strongest e2e config, PERF_NOTES.md).
  * serve_b1_ms_frame — chip-side per-frame cost of the in-jit b=1 serving
    ring (serve_scan: full ingest+forward+decode+device-NMS, dispatch and
    relay RTT cancelled by ring differencing — bench_serve.py, round 4).
  * sections_skipped — probes never run because the deadline machinery left
    too little window, so a shortened line is self-describing.
  * sections_failed — probes that RAN and raised (compile error, wedge
    timeout); kept separate from skips so a real regression can't be filed
    as a relay-time artifact (round-5 review).

Baseline: the reference publishes no GPU fps; its fastest in-code CPU number
is the AVX2 INT8 conv pipeline at ~0.8 FPS/img
(src/yolov2_forward_network_quantized.c:212, see BASELINE.md). vs_baseline is
primary img/s over 0.8.

Methodology traps (cost this project three times, PERF_NOTES.md): fori_loop
inputs must depend on the carry (LICM), the carry must consume EVERY head's
full output (slice-narrowing/DCE), and sub-ms ops must amortize the 25-30 ms
relay RTT over in-jit iterations.
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_IMG_S = 0.8  # reference AVX2 INT8 CPU, ~1.35 s/img

START = time.monotonic()
FAST = os.environ.get("YOLO2_BENCH_FAST") == "1"
WEDGE = os.environ.get("YOLO2_BENCH_WEDGE", "")
INIT_BUDGET = float(os.environ.get("YOLO2_BENCH_INIT_BUDGET",
                                   "60" if FAST else "2700"))
PRIMARY_BUDGET = float(os.environ.get("YOLO2_BENCH_PRIMARY_BUDGET",
                                      "120" if FAST else "2400"))
MEASURE_BUDGET = float(os.environ.get("YOLO2_BENCH_DEADLINE", "1200"))

_deadline = None  # set once the backend is up


def remaining():
    return (_deadline - time.monotonic()) if _deadline else MEASURE_BUDGET


def log(*a):
    print(*a, file=sys.stderr, flush=True)


RESULT = {}


def emit():
    """(Re-)print the driver-facing JSON line. Called after the primary and
    after every completed secondary: the driver takes the last parseable
    line, so truncation at any later point cannot lose the metric."""
    print(json.dumps(RESULT), flush=True)


def wedge_guard(section):
    """Test hook: simulate a relay wedge inside ``section`` (sleeps forever;
    the surrounding with_timeout abandons the daemon thread)."""
    if WEDGE == section:
        log(f"[wedge-sim] sleeping inside section {section!r}")
        time.sleep(10 ** 6)


def _enable_compile_cache():
    try:
        import jax
        d = os.path.expanduser("~/.cache/yolo2_light_tpu/xla")
        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def with_timeout(fn, seconds, label):
    """Run ``fn()`` in a daemon thread; on timeout raise instead of hanging.

    The relay occasionally WEDGES mid-probe (CLAUDE.md): a blocked device
    fetch is unkillable, but the main thread can abandon it and still emit
    the driver-facing JSON line. The wedged daemon thread dies with the
    process."""
    import threading
    box = {}

    def work():
        try:
            box["val"] = fn()
        except Exception as e:   # surfaced as the probe's failure
            box["err"] = e

    t = threading.Thread(target=work, daemon=True, name=label)
    t.start()
    t.join(seconds)
    if t.is_alive():
        raise TimeoutError(f"{label}: no result in {seconds:.0f}s (relay wedge?)")
    if "err" in box:
        raise box["err"]
    return box["val"]


def section(name, floor=60.0):
    """Deadline gate for one secondary probe: returns the with_timeout budget,
    or None (and records the skip) when the remaining window is too small."""
    if FAST:
        floor /= 10.0   # mini-cfg CPU probes finish in seconds
    left = remaining()
    if left < floor:
        log(f"section {name!r} skipped: {left:.0f}s left < {floor:.0f}s floor")
        RESULT.setdefault("sections_skipped", []).append(name)
        return None
    return min(900.0, left - floor / 2)


def median_spread(run, n=5):
    """Median-of-n with (min, max): the relay's throughput is noisy run-to-run,
    and best-of-N enshrines single-run highs (round-1 lesson). ``run()`` returns
    a duration; result is (median, min, max)."""
    if FAST:
        n = min(n, 2)
    ts = sorted(run() for _ in range(n))
    return ts[n // 2], ts[0], ts[-1]


def sparse_head_biases(spec, params):
    """Push objectness/t0 biases of the head convs to -6 so random-weight nets
    produce realistically sparse detections (sigmoid(-12) ~ 6e-6 < thresh)."""
    from yolo2_light_tpu.cfg import ConvSpec, RegionSpec, YoloSpec
    for l in spec.layers:
        if isinstance(l, (YoloSpec, RegionSpec)):
            conv = spec.layers[l.index - 1]
            if not isinstance(conv, ConvSpec):
                continue
            p = params[conv.index]
            entries = l.out_c // l.n
            # damp the head conv so logits stay small despite the random deep net
            p["weights"] = np.asarray(p["weights"]) * 0.02
            b = np.asarray(p["biases"]).copy() * 0.02
            obj_entry = 4 if isinstance(l, YoloSpec) else l.coords
            for a in range(l.n):
                b[a * entries + obj_entry] = -8.0
            p["biases"] = b
    return params


def device_resident_ms_img(spec, params, mode, batch=128, rep=10, runs=5,
                           **build_kw):
    """Device-resident forward latency per image: in-jit fori_loop whose input
    depends on the carry (no LICM) and whose carry consumes every head's full
    output (no DCE/slice narrowing). One D2H fetch per run amortized over rep
    iterations. Returns (median_ms, min_ms, max_ms)."""
    import jax
    import jax.numpy as jnp
    from yolo2_light_tpu.models.network import build_forward, params_to_device

    if FAST:
        batch, rep, runs = 4, 2, 2
    fwd = build_forward(spec, mode, **build_kw)
    p = params_to_device(params)

    def dev_loop(x):
        def body(i, acc):
            heads, _ = fwd(p, x + acc * 1e-12)
            return acc + sum(jnp.sum(h.data) for h in heads) * 1e-9
        return jax.lax.fori_loop(0, rep, body, 0.0)

    f = jax.jit(dev_loop)
    x = jnp.asarray(np.random.RandomState(0).rand(
        batch, spec.net.h, spec.net.w, spec.net.c).astype(np.float32))
    float(f(x))  # compile + settle (block via host fetch: relay-safe)

    def run():
        t0 = time.perf_counter()
        float(f(x))
        return (time.perf_counter() - t0) / rep

    dt, dt_min, dt_max = median_spread(run, runs)
    return (dt * 1e3 / batch, dt_min * 1e3 / batch, dt_max * 1e3 / batch)


def streamed_img_s(pipe, x, depth, n_batches, runs):
    """Streamed frame->boxes throughput; returns (median, min, max) img/s."""
    batch = x.shape[0]

    def run():
        t0 = time.perf_counter()
        for _ in pipe.stream([x] * n_batches, depth=depth, workers=1):
            pass
        return (time.perf_counter() - t0) / n_batches

    dt, dt_min, dt_max = median_spread(run, runs)
    return batch / dt, batch / dt_max, batch / dt_min


def relay_socket_state():
    # Two distinct relay failure modes (diagnosed 2026-08-18):
    #  * WEDGE — the listener is up but blocked; recovers in ~5-30 min.
    #  * GONE  — no relay listener at all: the host-side relay process died
    #    (or the VM rebooted and it never came back). jax.devices() still
    #    hangs either way (the axon client retries internally), so probe the
    #    sockets directly to tell the operator which mode this is.
    # The relay's ports are dynamic (fresh-VM reboot moved them 2297 ->
    # 8082..8107), so enumerate loopback LISTEN ports from /proc/net/tcp
    # instead of probing a hardcoded one.
    import socket
    try:
        ports = set()
        with open("/proc/net/tcp") as f:
            next(f)
            for line in f:
                parts = line.split()
                local, state = parts[1], parts[3]
                if state != "0A":     # TCP_LISTEN
                    continue
                addr, port = local.split(":")
                if addr == "0100007F":  # 127.0.0.1
                    ports.add(int(port, 16))
    except Exception as e:
        return f"port scan failed: {type(e).__name__}"
    # our own inference-side listeners aren't the relay; the relay owns
    # a BLOCK of loopback ports. No loopback listeners at all => GONE.
    if not ports:
        return "NO loopback listeners (relay process gone — host-side restart needed)"
    probe = sorted(ports)[0]
    s = socket.socket()
    s.settimeout(4)
    try:
        s.connect(("127.0.0.1", probe))
        return f"{len(ports)} loopback listeners (e.g. :{probe}), connect ok"
    except Exception as e:
        return f"{len(ports)} listeners but :{probe} connect failed ({type(e).__name__})"
    finally:
        s.close()


def main():
    global _deadline
    _enable_compile_cache()
    import jax
    import jax.numpy as jnp

    # The axon sitecustomize force-selects the TPU platform; the CI self-test
    # must be able to pin the CPU backend (env var alone is overridden).
    plat = os.environ.get("YOLO2_BENCH_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)

    from yolo2_light_tpu.cfg import parse_network_cfg
    from yolo2_light_tpu.pipeline import DetectionPipeline
    from yolo2_light_tpu.quant import quantize_params
    from yolo2_light_tpu.weights import fuse_conv_batchnorm, random_params

    cfg = os.environ.get("YOLO2_BENCH_CFG") or "/root/reference/bin/yolov3.cfg"
    if not os.path.exists(cfg):
        cfg = os.path.join(os.path.dirname(__file__), "tests/data/mini-yolo3.cfg")

    spec = parse_network_cfg(cfg, batch=1)
    params = sparse_head_biases(
        spec, fuse_conv_batchnorm(spec, random_params(spec, seed=0)))
    qparams = quantize_params(spec, params)

    log(f"relay sockets: {relay_socket_state()}")
    # Relay wedges recover by themselves in ~5-30 min (CLAUDE.md); give
    # backend init its own budget (default 45 min) of bounded attempts — a
    # wedge at capture time must not cost the round its metric. Each blocked
    # jax.devices() call is abandoned in its daemon thread; a later attempt
    # returns as soon as the relay recovers. MEASUREMENT time is budgeted
    # separately from when the device comes up, so a late recovery still
    # gets a full capture window.
    dev, attempt = None, 0
    while dev is None:
        attempt += 1
        left = INIT_BUDGET - (time.monotonic() - START)
        if left <= 5:
            break
        try:
            dev = with_timeout(lambda: jax.devices()[0], min(900.0, left),
                               f"backend init (attempt {attempt})")
        except Exception as e:
            log(f"backend init attempt {attempt} failed: {e}")
    if dev is None:
        log(f"FATAL: TPU backend unavailable for {INIT_BUDGET:.0f}s; no metric "
            "this run — the relay is down, not the framework. Re-run when it "
            "recovers.")
        sys.exit(2)
    log(f"device: {dev}")

    # --- PRIMARY: device-resident int8 (bit-exact cpu semantics) ------------
    # Its own budget, NOT the secondaries' deadline: a cold-cache compile
    # through the remote-compile relay has measured >900 s under congestion,
    # and the primary is the one number the round must capture. Retries help
    # because an abandoned attempt's daemon thread can still finish the
    # server-side compile and populate the persistent XLA cache for the next
    # attempt. If the primary truly cannot be measured there is no honest
    # value to print — exit 2.
    prim = None
    prim_start = time.monotonic()
    attempt = 0
    while prim is None:
        attempt += 1
        left = PRIMARY_BUDGET - (time.monotonic() - prim_start)
        if left <= 30:
            break
        try:
            prim = with_timeout(
                lambda: device_resident_ms_img(
                    spec, qparams, "int8", int8_policy="cpu",
                    int8_chain=True, compute_dtype=jnp.bfloat16),
                min(1800.0, left),
                f"primary int8 probe (attempt {attempt})")
        except Exception as e:
            log(f"primary int8 probe attempt {attempt} failed: {e}")
    if prim is None:
        log("FATAL: primary probe unmeasurable; no honest metric to emit.")
        sys.exit(2)
    _deadline = time.monotonic() + MEASURE_BUDGET  # secondaries' window
    ms, ms_min, ms_max = prim
    value = 1e3 / ms
    RESULT.update({
        "metric": "yolov3-416_int8_device_img_s",
        "value": round(value, 1),            # median of 5 runs, b=128
        "unit": "img/s",
        "vs_baseline": round(value / BASELINE_IMG_S, 1),
        "int8_device_ms_img": round(ms, 3),
        "int8_device_ms_img_spread": [round(ms_min, 3), round(ms_max, 3)],
    })
    log(f"PRIMARY device-resident int8(cpu semantics, bit-exact): "
        f"{ms:.3f} ms/img -> {value:.0f} img/s "
        f"(spread {ms_min:.3f}-{ms_max:.3f})")
    emit()  # the driver-facing line exists from this point on

    # --- parsed secondary: turbo (bf16-materialized activations, f32 math) --
    budget = section("turbo")
    if budget:
        try:
            def turbo_probe():
                wedge_guard("turbo")
                return device_resident_ms_img(
                    spec, qparams, "int8", int8_policy="cpu",
                    int8_chain=True, compute_dtype=jnp.bfloat16,
                    residual_dtype=jnp.bfloat16)

            tms, tms_min, tms_max = with_timeout(turbo_probe, budget,
                                                 "turbo probe")
            RESULT["int8_turbo_device_ms_img"] = round(tms, 3)
            RESULT["int8_turbo_device_ms_img_spread"] = [round(tms_min, 3),
                                                         round(tms_max, 3)]
            log(f"device-resident int8 TURBO (-turbo, bf16 residuals): "
                f"{tms:.3f} ms/img -> {1e3 / tms:.0f} img/s "
                f"(spread {tms_min:.3f}-{tms_max:.3f})")
            emit()
        except Exception as e:
            log(f"device-resident turbo probe failed: {e}")
            RESULT.setdefault("sections_failed", []).append("turbo")

    # --- parsed secondary: turbo_int8 (int8-materialized residual trunk) ----
    budget = section("turbo_int8")
    if budget:
        try:
            def turbo8_probe():
                wedge_guard("turbo_int8")
                return device_resident_ms_img(
                    spec, qparams, "int8", int8_policy="cpu",
                    int8_chain=True, compute_dtype=jnp.bfloat16,
                    residual_dtype="int8")

            i8ms, i8min, i8max = with_timeout(turbo8_probe, budget,
                                              "turbo_int8 probe")
            RESULT["int8_turbo8_device_ms_img"] = round(i8ms, 3)
            RESULT["int8_turbo8_device_ms_img_spread"] = [round(i8min, 3),
                                                          round(i8max, 3)]
            log(f"device-resident int8 TURBO_INT8 (int8 residual trunk): "
                f"{i8ms:.3f} ms/img -> {1e3 / i8ms:.0f} img/s "
                f"(spread {i8min:.3f}-{i8max:.3f})")
            emit()
        except Exception as e:
            log(f"device-resident turbo_int8 probe failed: {e}")
            RESULT.setdefault("sections_failed", []).append("turbo_int8")

    # --- parsed secondary: bf16 device-resident -----------------------------
    budget = section("bf16")
    if budget:
        try:
            def bf16_probe():
                wedge_guard("bf16")
                return device_resident_ms_img(
                    spec, params, "fp32", compute_dtype=jnp.bfloat16)

            bms, bms_min, bms_max = with_timeout(bf16_probe, budget,
                                                 "bf16 probe")
            RESULT["bf16_device_ms_img"] = round(bms, 3)
            RESULT["bf16_device_ms_img_spread"] = [round(bms_min, 3),
                                                   round(bms_max, 3)]
            log(f"device-resident fp32(bf16 MXU): {bms:.3f} ms/img "
                f"-> {1e3 / bms:.0f} img/s (spread {bms_min:.3f}-{bms_max:.3f})")
            emit()
        except Exception as e:
            log(f"device-resident bf16 probe failed: {e}")
            RESULT.setdefault("sections_failed", []).append("bf16")

    # --- parsed secondary: streamed frame->boxes, YUV420 uint8, depth 3 -----
    # camera-native planar YUV420 [B, H*3/2, W] halves the H2D bytes of RGB
    # (PERF_NOTES.md); still rides the relay's moods — spread is documented,
    # not fought (n_batches=64 amortizes minute-scale congestion windows)
    batch = 8 if FAST else 64
    n_batches = 4 if FAST else 64
    pipe = yuv = None
    budget = section("yuv", floor=120.0)
    if budget:
        try:
            pipe = DetectionPipeline(spec, params, thresh=0.24, nms=0.4, k=64,
                                     compute_dtype=jnp.bfloat16,
                                     packed_dtype=jnp.float16)
            yuv = (np.random.RandomState(1).rand(
                batch, spec.net.h * 3 // 2,
                spec.net.w) * 255).astype(np.uint8)
            def yuv_compile():
                wedge_guard("yuv")
                return pipe(yuv)

            with_timeout(yuv_compile, budget, "yuv compile")  # compile
            img_s, lo, hi = with_timeout(
                lambda: streamed_img_s(pipe, yuv, depth=3,
                                       n_batches=n_batches, runs=5),
                min(1200.0, max(60.0, remaining() - 30)), "yuv streamed probe")
            spread_pct = 100.0 * (hi - lo) / img_s
            RESULT["yuv_stream_img_s"] = round(img_s, 1)
            RESULT["yuv_stream_img_s_spread"] = [round(lo, 1), round(hi, 1)]
            log(f"yuv420 streamed b={batch} depth=3 n_batches={n_batches}: "
                f"{img_s:.1f} img/s (min {lo:.1f}, max {hi:.1f}, "
                f"spread {spread_pct:.1f}%)")
            emit()
        except Exception as e:
            log(f"yuv streamed probe failed: {e}")
            RESULT.setdefault("sections_failed", []).append("yuv")

    # --- parsed secondary: b=1 serving per-frame (serve_scan ring diff) -----
    # one dispatch runs a resident ring of N frames at b=1 semantics (full
    # ingest+forward+decode+device-NMS per frame); differencing two ring
    # sizes cancels dispatch + relay RTT exactly (bench_serve.py, r4 #2)
    budget = section("serve", floor=120.0)
    if budget:
        try:
            from bench_serve import build_bodies, measure
            body, p = build_bodies(spec, params, qparams, "serve_int8")
            ring_sizes = (2, 6) if FAST else (16, 128)
            rings = {}
            for n in ring_sizes:
                def ring_probe(n=n):
                    wedge_guard("serve")
                    return measure(body, p, spec, n)

                med, _, _ = with_timeout(
                    ring_probe,
                    min(900.0, max(60.0, remaining() - 30)),
                    f"serve ring {n}")
                rings[n] = med
            n0, n1 = ring_sizes
            per_frame = (rings[n1] - rings[n0]) / (n1 - n0) * 1e3
            RESULT["serve_b1_ms_frame"] = round(per_frame, 3)
            log(f"b=1 serving (serve_scan ring diff, full decode+NMS): "
                f"{per_frame:.3f} ms/frame "
                f"(dispatch overhead {rings[n0] * 1e3 - per_frame * n0:.1f} ms "
                f"amortized)")
            emit()
        except Exception as e:
            log(f"serve probe failed: {e}")
            RESULT.setdefault("sections_failed", []).append("serve")

    # --- stderr-only extras (comparability with rounds 1-2) -----------------
    if pipe is not None and section("rgb_extra", floor=120.0):
        try:
            x = (np.random.RandomState(2).rand(32, spec.net.h, spec.net.w,
                                               spec.net.c) * 255).astype(np.uint8)
            pipe(x)
            img_s, lo, hi = streamed_img_s(pipe, x, depth=2, n_batches=8, runs=5)
            log(f"rgb streamed b=32 depth=2 (rounds-1/2 primary): {img_s:.1f} "
                f"img/s (min {lo:.1f}, max {hi:.1f})")
        except Exception as e:
            log(f"rgb probe failed: {e}")
    if yuv is not None and section("int8_stream_extra", floor=120.0):
        try:
            pipe8 = DetectionPipeline(spec, qparams, "int8", thresh=0.24,
                                      nms=0.2, k=64, int8_policy="cpu",
                                      compute_dtype=jnp.bfloat16,
                                      packed_dtype=jnp.float16)
            yuv8 = yuv[:min(32, batch)]
            pipe8(yuv8)
            img_s, lo, hi = streamed_img_s(pipe8, yuv8, depth=3, n_batches=8,
                                           runs=5)
            log(f"int8(cpu semantics) yuv streamed b={yuv8.shape[0]}: "
                f"{img_s:.1f} img/s (min {lo:.1f}, max {hi:.1f})")
        except Exception as e:
            log(f"int8 streamed probe failed: {e}")

    emit()  # final authoritative line (identical to the last incremental one)
    log(f"total wall: {time.monotonic() - START:.0f}s")


if __name__ == "__main__":
    main()
