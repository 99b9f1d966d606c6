"""bench.py's incremental-emission contract (round-5 item 1).

Round 4 scored ``BENCH_r04.json rc=124 parsed=null`` because the single JSON
print sat after a worst-case ~80 min of init retries + secondary probes; the
driver's window closed first despite a healthy chip. bench.py now emits the
driver-facing line immediately after the primary and re-emits it after every
secondary, with a global measurement deadline and per-section daemon-thread
timeouts. These tests prove the contract the way the VERDICT asked: a
SIMULATED RELAY WEDGE (``YOLO2_BENCH_WEDGE=<section>`` sleeps forever inside
that probe's daemon thread) still yields a parseable metric line within a
driver-budget wall clock.

Both runs use the FAST knobs (mini cfg, CPU backend, shrunk batch/reps) so
the proof lives in the fast suite.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MINI_CFG = os.path.join(REPO, "tests/data/mini-yolo3.cfg")


def run_bench(wedge="", deadline="600", timeout=300):
    env = dict(
        os.environ,
        YOLO2_BENCH_FAST="1",
        YOLO2_BENCH_PLATFORM="cpu",
        YOLO2_BENCH_CFG=MINI_CFG,
        YOLO2_BENCH_INIT_BUDGET="60",
        YOLO2_BENCH_DEADLINE=deadline,
        YOLO2_BENCH_WEDGE=wedge,
    )
    t0 = time.monotonic()
    r = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                       capture_output=True, text=True, timeout=timeout,
                       env=env, cwd=REPO)
    wall = time.monotonic() - t0
    assert r.returncode == 0, (r.returncode, r.stderr[-3000:])
    lines = [ln for ln in r.stdout.splitlines() if ln.strip()]
    assert lines, r.stderr[-3000:]
    # every stdout line is a JSON object (all logging goes to stderr), and
    # the driver's last-parseable-line rule lands on the enriched final one
    parsed = [json.loads(ln) for ln in lines]
    return parsed, wall, r.stderr


def check_metric(j):
    assert j["metric"] == "yolov3-416_int8_device_img_s"
    assert j["unit"] == "img/s"
    assert j["value"] > 0
    assert j["vs_baseline"] > 0
    assert j["int8_device_ms_img"] > 0


def test_bench_emits_incrementally():
    parsed, _, err = run_bench()
    # the primary-only line exists from the first emission on: truncation at
    # ANY later point still leaves the driver a parseable metric
    assert len(parsed) >= 3, (len(parsed), err[-2000:])
    for j in parsed:
        check_metric(j)
    final = parsed[-1]
    # secondaries accrued onto the re-emitted line
    assert "int8_turbo_device_ms_img" in final, final
    assert "int8_turbo8_device_ms_img" in final, final
    assert "bf16_device_ms_img" in final, final
    # fields only ever accrue: each re-emission is a superset of the previous
    for a, b in zip(parsed, parsed[1:]):
        assert set(a) <= set(b), (a, b)


def test_bench_survives_simulated_wedge():
    """A relay wedge inside a secondary probe (sleeping daemon thread) must
    cost only that section, recorded in sections_failed (the probe RAN and
    was abandoned — distinct from a deadline skip, round-5 review) — the
    driver still gets the metric line, inside a bounded wall clock."""
    parsed, wall, err = run_bench(wedge="turbo", deadline="30")
    final = parsed[-1]
    check_metric(final)
    assert "turbo" in final.get("sections_failed", []), (final, err[-2000:])
    # the wedged probe was abandoned by its deadline, not waited out
    assert wall < 240, wall
