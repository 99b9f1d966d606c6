"""Demo terminal-UI parity vs the compiled reference demo (src/main.c:450-573).

The reference demo needs OpenCV; the `demo_oracle` fixture (tests/conftest.py)
compiles it against the deterministic C-API stub in tests/data/cvstub whose
capture feeds raw CVSTUBV1 frames — the exact bytes io/rawvideo.py feeds our
demo (the video analog of the PNG rule for image parity: codecs differ per
host, raw bytes don't).

Stream model (src/main.c:431-446,563-571): per detected frame the reference's
detect thread prints [quantized per-conv lines] + [object lines, main.c:294,
343-345] + [screen-clear/FPS/Objects header]. Our demo prints the header FIRST
(header + conv + objects) — the same terminal rendering, with the raw streams
differing by exactly ONE header-block rotation (the reference's header lands
under the previous frame's objects on screen). FPS values are wall-clock and
normalised. Everything else — banners, 'video file:', object lines with C
truncation/clamping, per-frame cadence incl. under -s frame_skip — is
byte-strict.
"""

import os
import re
import subprocess
import sys

import numpy as np
import pytest

from .util_parity import clean_stream

DATA = os.path.join(os.path.dirname(__file__), "data")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

HDR = "\033[2J\033[1;1H\nFPS:#\nObjects:\n\n"
_FPS_RE = re.compile(r"FPS:\S*")


def _make_inputs(tmp_path, n_frames=6, seed=0):
    """Tiny net + CVSTUBV1 video AT NET DIMS (the stub's cvResize only
    supports same-size copies, making the reference's resize an identity —
    anything else would need a bit-exact OpenCV INTER_LINEAR)."""
    from yolo2_light_tpu.cfg import parse_network_cfg
    from yolo2_light_tpu.io.rawvideo import write_rawvideo
    from yolo2_light_tpu.weights import random_params, save_weights

    cfg = os.path.join(DATA, "mini-yolo3.cfg")
    spec = parse_network_cfg(cfg, batch=1)
    weights = str(tmp_path / "w.weights")
    save_weights(spec, random_params(spec, seed=3), weights)
    rng = np.random.RandomState(seed)
    frames = [(rng.rand(spec.net.h, spec.net.w, 3) * 255).astype(np.uint8)
              for _ in range(n_frames)]
    vid = str(tmp_path / "in.cvs")
    write_rawvideo(vid, frames, fps=10)
    names = str(tmp_path / "names.txt")
    with open(names, "w") as f:
        f.write("aaa\nbbb\nccc\n")
    return names, cfg, weights, vid


def _run_demo_pair(demo_oracle, tmp_path, extra, ours_extra=()):
    names, cfg, weights, vid = _make_inputs(tmp_path)
    args = ["detector", "demo", names, cfg, weights, vid,
            "-dont_show", "-thresh", "0.4"] + list(extra)
    res_o = subprocess.run([demo_oracle] + args, capture_output=True,
                           text=True, timeout=600, cwd=str(tmp_path))
    # stream end is error("Stream closed.") -> exit(-1) (additionally.c:1595)
    assert res_o.returncode == 255, res_o.stderr[-800:]
    env = dict(os.environ, YOLO2_TPU_PLATFORM="cpu", PYTHONPATH=REPO)
    res_u = subprocess.run(
        [sys.executable, "-m", "yolo2_light_tpu"] + args + list(ours_extra),
        capture_output=True, text=True, timeout=600, cwd=str(tmp_path),
        env=env)
    assert res_u.returncode == 0, res_u.stderr[-800:]
    return res_o, res_u


def _assert_demo_stdout(ours: str, oracle: str):
    """Byte-strict after FPS normalisation and the documented one-header-block
    rotation: ours = prefix + (HDR + frame_i)*, oracle = prefix + (frame_i +
    HDR)* — moving our first header to the end must reproduce the oracle."""
    o = _FPS_RE.sub("FPS:#", ours)
    r = _FPS_RE.sub("FPS:#", oracle)
    assert HDR in o, "our demo printed no FPS/Objects header block"
    rot = o.replace(HDR, "", 1) + HDR
    if rot != r:
        import difflib
        diff = "\n".join(difflib.unified_diff(
            r.splitlines(), rot.splitlines(), "oracle", "ours-rotated",
            lineterm=""))
        raise AssertionError(f"demo stdout diff (post-rotation)\n{diff[:4000]}")


def _assert_demo_stderr(ours: str, oracle: str):
    """Strict line diff (cfg echo, layer table, loading line) modulo
    environment log noise; the oracle's trailing 'Stream closed.:' perror
    line is its abnormal stream-end exit — ours ends cleanly."""
    a = [l for l in clean_stream(oracle)
         if not l.startswith("Stream closed.:")]
    b = clean_stream(ours, ours=True)
    if a != b:
        import difflib
        diff = "\n".join(difflib.unified_diff(a, b, "oracle", "ours",
                                              lineterm=""))
        raise AssertionError(f"demo stderr diff\n{diff[:4000]}")


def test_demo_cli_streams_fp32(demo_oracle, tmp_path):
    """fp32 demo: full stdout (banners, 'video file:', per-frame object lines,
    FPS/Objects blocks) and stderr byte-match the compiled reference demo.
    -fp32 selects the reference-exact video path (demo defaults to bf16)."""
    res_o, res_u = _run_demo_pair(demo_oracle, tmp_path, [],
                                  ours_extra=["-fp32"])
    _assert_demo_stdout(res_u.stdout, res_o.stdout)
    _assert_demo_stderr(res_u.stderr, res_o.stderr)


def test_demo_cli_streams_quantized(demo_oracle, tmp_path):
    """-quantized demo: the quantization banner, per-FRAME per-conv forward
    echo ('N - CONVOLUTIONAL ... l.size'), object lines (int8-cpu bit-exact
    with fp32 float-side convs) and header cadence all match."""
    res_o, res_u = _run_demo_pair(demo_oracle, tmp_path, ["-quantized"],
                                  ours_extra=["-fp32"])
    _assert_demo_stdout(res_u.stdout, res_o.stdout)
    _assert_demo_stderr(res_u.stderr, res_o.stderr)


def test_demo_cli_streams_frame_skip(demo_oracle, tmp_path):
    """-s 2: every frame still detects and prints (only the DISPLAYED frame
    and the FPS update are delay-gated, main.c:553-570) — stream shape is
    unchanged modulo the normalised FPS values."""
    res_o, res_u = _run_demo_pair(demo_oracle, tmp_path, ["-s", "2"],
                                  ours_extra=["-fp32"])
    _assert_demo_stdout(res_u.stdout, res_o.stdout)
    _assert_demo_stderr(res_u.stderr, res_o.stderr)


# ---------------------------------------------------------------- rawvideo

def test_rawvideo_roundtrip(tmp_path):
    from yolo2_light_tpu.io.rawvideo import (RawVideoCapture, is_rawvideo,
                                             write_rawvideo)
    rng = np.random.RandomState(7)
    frames = [(rng.rand(12, 16, 3) * 255).astype(np.uint8) for _ in range(4)]
    path = str(tmp_path / "v.cvs")
    write_rawvideo(path, frames, fps=9)
    assert is_rawvideo(path)
    cap = RawVideoCapture(path)
    assert cap.isOpened()
    # cv2-compatible C-era property ids (highgui_c.h)
    assert cap.get(3) == 16 and cap.get(4) == 12 and cap.get(5) == 9
    got = []
    while True:
        ok, frame = cap.read()
        if not ok:
            assert frame is None
            break
        got.append(frame)
    cap.release()
    assert len(got) == 4
    for a, b in zip(frames, got):
        np.testing.assert_array_equal(a, b)


def test_rawvideo_rejects_non_magic(tmp_path):
    from yolo2_light_tpu.io.rawvideo import RawVideoCapture, is_rawvideo
    p = tmp_path / "not.cvs"
    p.write_bytes(b"\x89PNG\r\n\x1a\nxxxxxxxxxxxxxxxx")
    assert not is_rawvideo(str(p))
    assert not is_rawvideo(str(tmp_path / "missing.cvs"))
    assert not RawVideoCapture(str(p)).isOpened()
    assert not RawVideoCapture(str(tmp_path / "missing.cvs")).isOpened()
    assert RawVideoCapture(str(p)).read() == (False, None)


def test_rawvideo_shape_mismatch_raises(tmp_path):
    from yolo2_light_tpu.io.rawvideo import write_rawvideo
    frames = [np.zeros((8, 8, 3), np.uint8), np.zeros((8, 9, 3), np.uint8)]
    with pytest.raises(ValueError):
        write_rawvideo(str(tmp_path / "bad.cvs"), frames)
