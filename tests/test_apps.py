"""App-level tests: CLI dispatch, demo on a synthetic video, map/calibrate smoke."""

import os
import subprocess
import sys

import numpy as np
import pytest

DATA = os.path.join(os.path.dirname(__file__), "data")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _gen_weights(cfg, seed, tmpdir):
    from yolo2_light_tpu.cfg import parse_network_cfg
    from yolo2_light_tpu.weights import random_params, save_weights
    spec = parse_network_cfg(cfg, batch=1)
    path = os.path.join(tmpdir, "w.weights")
    save_weights(spec, random_params(spec, seed=seed), path)
    return path


def test_demo_on_synthetic_video(tmp_path):
    cv2 = pytest.importorskip("cv2")
    # 12-frame synthetic video
    vid = str(tmp_path / "in.mp4")
    wr = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"mp4v"), 10, (128, 96))
    rng = np.random.RandomState(0)
    for _ in range(12):
        wr.write((rng.rand(96, 128, 3) * 255).astype(np.uint8))
    wr.release()

    cfg = os.path.join(DATA, "mini-yolo3.cfg")
    weights = _gen_weights(cfg, 3, str(tmp_path))
    out = str(tmp_path / "out.mp4")
    from yolo2_light_tpu.apps.demo import demo
    n = demo(cfg, weights, 0.4, vid, ["aaa", "bbb", "ccc"],
             out_filename=out, dont_show=True, max_frames=10)
    assert n == 10
    assert os.path.getsize(out) > 1000
    cap = cv2.VideoCapture(out)
    assert cap.isOpened()
    frames = 0
    while cap.read()[0]:
        frames += 1
    assert frames == 10


def test_demo_frame_skip(tmp_path):
    """-s frame_skip: every frame is detected but only every (s+1)-th is written
    (reference delay semantics, src/main.c:453,563-570)."""
    cv2 = pytest.importorskip("cv2")
    vid = str(tmp_path / "in.mp4")
    wr = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"mp4v"), 10, (128, 96))
    rng = np.random.RandomState(1)
    for _ in range(12):
        wr.write((rng.rand(96, 128, 3) * 255).astype(np.uint8))
    wr.release()

    cfg = os.path.join(DATA, "mini-yolo3.cfg")
    weights = _gen_weights(cfg, 3, str(tmp_path))
    out = str(tmp_path / "out.mp4")
    from yolo2_light_tpu.apps.demo import demo
    prefix = str(tmp_path / "frm")
    n = demo(cfg, weights, 0.4, vid, ["aaa", "bbb", "ccc"],
             out_filename=out, dont_show=True, frame_skip=2, prefix=prefix)
    assert n == 12
    cap = cv2.VideoCapture(out)
    frames = 0
    while cap.read()[0]:
        frames += 1
    # frame 1 primes the drawn buffer (reference's pre-loop fetch/detect);
    # thereafter the delay gate advances at frames 3, 6, 9, 12
    assert frames == 5
    # -prefix saves EVERY count (PNG) from count 1, repeating the stale frame
    # between advances (reference saves disp each iteration, main.c:538-542):
    # e.g. 2 byte-equal to 1 (stale), 3 a fresh advance, 4/5 byte-equal to 3
    saved = sorted(os.listdir(tmp_path))
    pngs = [f for f in saved if f.startswith("frm_") and f.endswith(".png")]
    assert pngs == [f"frm_{i:08d}.png" for i in range(1, 13)]
    raw1 = open(tmp_path / "frm_00000001.png", "rb").read()
    assert open(tmp_path / "frm_00000002.png", "rb").read() == raw1
    raw3 = open(tmp_path / "frm_00000003.png", "rb").read()
    assert raw3 != raw1
    assert open(tmp_path / "frm_00000004.png", "rb").read() == raw3
    assert open(tmp_path / "frm_00000005.png", "rb").read() == raw3
    assert open(tmp_path / "frm_00000006.png", "rb").read() != raw3


def test_params_cache_roundtrip(tmp_path):
    """-params_cache: second build loads the transformed pytree from .npz and
    matches the fresh transform exactly (incl. quantized/binarized fields)."""
    import numpy as np

    from yolo2_light_tpu.apps.detect import build_params
    cfg = os.path.join(DATA, "mini-yolo3.cfg")
    weights = _gen_weights(cfg, 7, str(tmp_path))
    cache = str(tmp_path / "pcache")

    spec1, fresh, mode1 = build_params(cfg, weights, quantized=True)
    spec2, miss, mode2 = build_params(cfg, weights, quantized=True,
                                      params_cache=cache)
    assert os.listdir(cache)
    spec3, hit, mode3 = build_params(cfg, weights, quantized=True,
                                     params_cache=cache)
    assert mode1 == mode2 == mode3 == "int8"
    for a, b in zip(fresh, hit):
        if a is None:
            assert b is None
            continue
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]), k)


def test_params_cache_misses_on_cfg_change(tmp_path):
    """The cache key must include the cfg contents: input_calibration= scales are
    baked into the quantized params, so editing the cfg (e.g. pasting a fresh
    calibration line) with an unchanged .weights must NOT hit the stale entry."""
    import numpy as np

    from yolo2_light_tpu.apps.detect import build_params
    src = os.path.join(DATA, "mini-yolo3.cfg")
    weights = _gen_weights(src, 7, str(tmp_path))
    cache = str(tmp_path / "pcache")

    text = open(src).read()
    cfg1 = str(tmp_path / "a.cfg")
    open(cfg1, "w").write(text)
    _, p1, _ = build_params(cfg1, weights, quantized=True, params_cache=cache)
    n_entries = len(os.listdir(cache))

    # same path, different calibration scales -> different quant multipliers
    assert "input_calibration=" in text
    import re
    text2 = re.sub(r"input_calibration=.*",
                   "input_calibration=3, 3, 3, 3, 3, 3, 3, 3", text)
    assert text2 != text
    open(cfg1, "w").write(text2)
    _, p2, _ = build_params(cfg1, weights, quantized=True, params_cache=cache)
    assert len(os.listdir(cache)) == n_entries + 1  # miss -> new entry
    changed = any(
        a is not None and "input_quant_multipler" in a
        and not np.array_equal(np.asarray(a["input_quant_multipler"]),
                               np.asarray(b["input_quant_multipler"]))
        for a, b in zip(p1, p2))
    assert changed


def test_cli_usage_errors():
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    r = subprocess.run([sys.executable, "-m", "yolo2_light_tpu"],
                       capture_output=True, text=True, env=env, cwd=REPO)
    assert "usage" in r.stderr
    r = subprocess.run([sys.executable, "-m", "yolo2_light_tpu", "detector"],
                       capture_output=True, text=True, env=env, cwd=REPO)
    assert "usage" in r.stderr
    r = subprocess.run([sys.executable, "-m", "yolo2_light_tpu", "nope"],
                       capture_output=True, text=True, env=env, cwd=REPO)
    assert "Not an option" in r.stderr


def test_cli_pp_tp_without_pp_errors(capsys):
    """-pp_tp T without -pp S (S>1) must error loudly, not silently run
    single-device (advisor round 3): pp_tp is only consumed inside pipeline
    stages."""
    from yolo2_light_tpu.apps.cli import _main
    rc = _main(["detector", "test", "n.names", "c.cfg", "w.weights",
                "-pp_tp", "2"])
    assert rc == 1
    assert "-pp_tp requires -pp" in capsys.readouterr().err


def test_cli_device_nms_on_test_errors(capsys):
    """-device_nms is consumed only by map/demo; on detector test (the
    host-post oracle path) it must error loudly, not silently run host NMS
    while claiming device NMS (same class as the -pp_tp guard)."""
    from yolo2_light_tpu.apps.cli import _main
    for sub in ("test", "calibrate"):
        rc = _main(["detector", sub, "n.names", "c.cfg", "w.weights",
                    "-device_nms"])
        assert rc == 1
        assert "map/demo only" in capsys.readouterr().err


def test_cli_missing_files():
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    r = subprocess.run([sys.executable, "-m", "yolo2_light_tpu", "detector",
                        "test", "/nope.names", "/nope.cfg"],
                       capture_output=True, text=True, env=env, cwd=REPO)
    # reference file_error() prints then exit(0) (additionally.c:1610-1614)
    assert r.returncode == 0
    assert "Couldn't open file" in r.stderr


def test_params_cache_npz_roundtrip(tmp_path):
    from yolo2_light_tpu.cfg import parse_network_cfg
    from yolo2_light_tpu.weights import (fuse_conv_batchnorm, load_params_cache,
                                         random_params, save_params_cache)
    cfg = os.path.join(DATA, "mini-yolo3.cfg")
    spec = parse_network_cfg(cfg, batch=1)
    params = fuse_conv_batchnorm(spec, random_params(spec, seed=0))
    p = str(tmp_path / "cache.npz")
    save_params_cache(params, p)
    back = load_params_cache(p, spec.n)
    for a, b in zip(params, back):
        assert (a is None) == (b is None)
        if a is not None:
            assert set(a) == set(b)
            for k in a:
                np.testing.assert_array_equal(np.asarray(a[k]), b[k])


def test_cli_stdin_loop(tmp_path):
    from yolo2_light_tpu.cfg import parse_network_cfg
    from yolo2_light_tpu.weights import random_params, save_weights
    cfg = os.path.join(DATA, "mini-yolo3.cfg")
    spec = parse_network_cfg(cfg, batch=1)
    weights = str(tmp_path / "w.weights")
    save_weights(spec, random_params(spec, seed=1), weights)
    names = str(tmp_path / "n.names")
    with open(names, "w") as f:
        f.write("a\nb\nc\n")
    img = os.path.join(DATA, "dog160.png")
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    r = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu');"
         "from yolo2_light_tpu.apps.cli import main; main()",
         "detector", "test", names, cfg, weights, "-thresh", "0.5",
         "-dont_show", "-save", str(tmp_path / "pred")],
        input=f"{img}\n\n{img}\n", capture_output=True, text=True, env=env,
        cwd=REPO, timeout=300)
    assert r.stdout.count("Predicted in") == 2, (r.stdout, r.stderr[-500:])
    assert r.stdout.count("Enter Image Path:") >= 3


def test_cli_turbo_int8_flag_gates(capsys):
    """-turbo_int8 without -quantized, and -turbo combined with -turbo_int8,
    must error loudly at the CLI (round-5 review): the former previously
    surfaced as a deep build_forward ValueError, the latter silently picked
    int8."""
    from yolo2_light_tpu.apps.cli import _main
    rc = _main(["detector", "test", "n.names", "c.cfg", "w.weights",
                "-turbo_int8"])
    assert rc == 1
    assert "-turbo_int8 requires -quantized" in capsys.readouterr().err
    rc = _main(["detector", "test", "n.names", "c.cfg", "w.weights",
                "-quantized", "-turbo", "-turbo_int8"])
    assert rc == 1
    assert "mutually exclusive" in capsys.readouterr().err


def test_parser_error_paths(tmp_path):
    import pytest as _pytest

    from yolo2_light_tpu.cfg import parse_network_cfg
    # no [net] first section
    bad = tmp_path / "bad.cfg"
    bad.write_text("[convolutional]\nfilters=8\n")
    with _pytest.raises(ValueError, match="net"):
        parse_network_cfg(str(bad))
    # empty cfg
    empty = tmp_path / "empty.cfg"
    empty.write_text("\n")
    with _pytest.raises(ValueError, match="no sections"):
        parse_network_cfg(str(empty))
    # yolo filters mismatch
    mismatch = tmp_path / "mm.cfg"
    mismatch.write_text("""[net]
width=32
height=32
channels=3
[convolutional]
filters=10
size=1
activation=linear
[yolo]
classes=3
num=3
mask=0,1,2
""")
    with _pytest.raises(ValueError, match="doesn't correspond"):
        parse_network_cfg(str(mismatch))


def test_cli_k_flag_reaches_pipeline(tmp_path, monkeypatch):
    """-k N on the map subcommand must size the candidate buffer."""
    import yolo2_light_tpu.apps.map as map_app
    seen = {}
    def fake_map(*a, **kw):
        seen.update(kw)
        return {}
    monkeypatch.setattr(map_app, "validate_detector_map", fake_map)
    from yolo2_light_tpu.apps.cli import _main
    rc = _main(["detector", "map", "d.data", "c.cfg", "w.weights",
                "-k", "2048", "-batch", "4"])
    assert rc == 0
    assert seen["k"] == 2048 and seen["batch"] == 4


def test_missing_image_matches_reference(oracle, tmp_path):
    """A missing/undecodable image prints the reference's load_image_stb
    failure ('Cannot load image "<path>"' + 'STB Reason: can't fopen') and
    exits 0 (src/additionally.c:3084-3090) — not the file_error path."""
    import subprocess
    import sys as _sys
    cfg = os.path.join(DATA, "mini-yolo3.cfg")
    weights = _gen_weights(cfg, 3, str(tmp_path))
    names = str(tmp_path / "n.names")
    with open(names, "w") as f:
        f.write("aaa\nbbb\nccc\n")
    missing = str(tmp_path / "nope.png")
    args = ["detector", "test", names, cfg, weights, missing, "-dont_show"]
    res_o = subprocess.run([oracle] + args, capture_output=True, text=True,
                           timeout=300, cwd=str(tmp_path))
    env = dict(os.environ, YOLO2_TPU_PLATFORM="cpu", PYTHONPATH=REPO)
    res_u = subprocess.run([_sys.executable, "-m", "yolo2_light_tpu"] + args,
                           capture_output=True, text=True, timeout=300,
                           cwd=str(tmp_path), env=env)
    assert res_u.returncode == res_o.returncode == 0
    tail = f'Cannot load image "{missing}"\nSTB Reason: can\'t fopen\n'
    assert res_o.stderr.endswith(tail)
    assert res_u.stderr.endswith(tail)


def test_show_image_no_opencv_note(oracle, tmp_path):
    """Without -dont_show the headless path prints the reference's
    'Not compiled with OpenCV, saving to predictions.png instead' stderr note
    (show_image, additionally.c:3236-3243); streams byte-match the oracle."""
    import subprocess
    import sys as _sys
    from PIL import Image
    cfg = os.path.join(DATA, "mini-yolo3.cfg")
    weights = _gen_weights(cfg, 3, str(tmp_path))
    names = str(tmp_path / "n.names")
    with open(names, "w") as f:
        f.write("aaa\nbbb\nccc\n")
    img = str(tmp_path / "i.png")
    rng = np.random.RandomState(1)
    Image.fromarray((rng.rand(64, 64, 3) * 255).astype(np.uint8)).save(img)
    args = ["detector", "test", names, cfg, weights, img, "-thresh", "0.4"]
    res_o = subprocess.run([oracle] + args, capture_output=True, text=True,
                           timeout=300, cwd=str(tmp_path))
    env = dict(os.environ, YOLO2_TPU_PLATFORM="cpu", PYTHONPATH=REPO)
    res_u = subprocess.run([_sys.executable, "-m", "yolo2_light_tpu"] + args,
                           capture_output=True, text=True, timeout=300,
                           cwd=str(tmp_path), env=env)
    from .util_parity import assert_streams_match
    assert_streams_match(res_u.stderr, res_o.stderr, context="show stderr")
    strip = lambda t: [l for l in t.splitlines() if "Predicted in" not in l]
    assert strip(res_u.stdout) == strip(res_o.stdout)
    assert "Not compiled with OpenCV" in res_u.stderr
