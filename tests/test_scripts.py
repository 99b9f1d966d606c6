"""Launcher-script smoke test (scripts/ — TPU-native analogs of the
reference's bin/*.sh / bin/*.cmd smoke scripts, SURVEY.md §4.3)."""

import os
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_tiny_yolo_int8_launcher_smoke(tmp_path):
    """tiny-yolo-int8.sh runs the full stack (weights fallback -> parse ->
    int8 forward -> decode -> NMS -> print) and prints detection lines in
    the reference format."""
    env = dict(os.environ, YOLO2_TPU_PLATFORM="cpu",
               TMPDIR=str(tmp_path))
    out = subprocess.run(
        ["sh", os.path.join(REPO, "scripts", "tiny-yolo-int8.sh")],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "Predicted in" in out.stdout
    # random weights still yield the reference's "name: NN%" line format
    assert any("%" in l and ":" in l for l in out.stdout.splitlines())
