"""Test configuration: force JAX onto a virtual 8-device CPU mesh (no TPU needed),
and provide the reference-oracle binary fixture."""

import os
import subprocess
import sys

# Must be set before jax import anywhere in the test process.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The axon TPU plugin (sitecustomize) overrides JAX_PLATFORMS env; the config
# update is authoritative. Set YOLO2_TPU_TESTS=1 to run the suite against the
# real TPU backend instead (slower; exercises Mosaic/XLA-TPU numerics).
if os.environ.get("YOLO2_TPU_TESTS") != "1":
    jax.config.update("jax_platforms", "cpu")

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"
ORACLE_DIR = os.path.join(REPO, ".oracle")
ORACLE_BIN = os.path.join(ORACLE_DIR, "darknet")

sys.path.insert(0, REPO)


def _build_oracle() -> str:
    """Compile the reference (read-only mount) into .oracle/darknet as the golden
    oracle. Objects/binary live under the repo; no reference sources are copied."""
    os.makedirs(ORACLE_DIR, exist_ok=True)
    srcs = ["main.c", "additionally.c", "box.c", "yolov2_forward_network.c",
            "yolov2_forward_network_quantized.c"]
    objs = []
    for s in srcs:
        obj = os.path.join(ORACLE_DIR, s.replace(".c", ".o"))
        objs.append(obj)
        if not os.path.exists(obj):
            subprocess.run(
                ["gcc", "-O1", f"-I{REFERENCE}/src", "-c",
                 os.path.join(REFERENCE, "src", s), "-o", obj],
                check=True, capture_output=True)
    subprocess.run(["gcc", "-O1"] + objs + ["-o", ORACLE_BIN, "-lm", "-pthread"],
                   check=True, capture_output=True)
    return ORACLE_BIN


@pytest.fixture(scope="session")
def oracle():
    """Path to the compiled reference binary (built once, cached)."""
    if not os.path.exists(ORACLE_BIN):
        _build_oracle()
    return ORACLE_BIN


DEMO_ORACLE_BIN = os.path.join(ORACLE_DIR, "darknet_demo")


def _build_demo_oracle() -> str:
    """Reference binary with the REAL demo() compiled in: -DOPENCV selects the
    video path (src/main.c:450-573), satisfied by the deterministic OpenCV
    C-API stub (tests/data/cvstub) whose capture feeds raw CVSTUBV1 frames —
    identical bytes to what io/rawvideo.py feeds our demo, the video analog of
    the PNG rule for image parity. -DNDEBUG turns error()'s assert(0)
    (src/additionally.c:1595-1600) into the plain exit(-1) path, so the demo's
    stream-end is a clean 'Stream closed.:' perror line instead of an abort
    with build-path-dependent assert text."""
    demo_dir = os.path.join(ORACLE_DIR, "demo")
    os.makedirs(demo_dir, exist_ok=True)
    cvstub = os.path.join(REPO, "tests", "data", "cvstub")
    srcs = [os.path.join(REFERENCE, "src", s) for s in
            ["main.c", "additionally.c", "box.c", "yolov2_forward_network.c",
             "yolov2_forward_network_quantized.c"]]
    srcs.append(os.path.join(cvstub, "cvstub.c"))
    objs = []
    for s in srcs:
        obj = os.path.join(demo_dir, os.path.basename(s).replace(".c", ".o"))
        objs.append(obj)
        if not os.path.exists(obj):
            subprocess.run(
                ["gcc", "-O1", "-DNDEBUG", "-DOPENCV", f"-I{cvstub}",
                 f"-I{REFERENCE}/src", "-c", s, "-o", obj],
                check=True, capture_output=True)
    subprocess.run(["gcc", "-O1"] + objs + ["-o", DEMO_ORACLE_BIN,
                    "-lm", "-pthread"], check=True, capture_output=True)
    return DEMO_ORACLE_BIN


@pytest.fixture(scope="session")
def demo_oracle():
    """Path to the reference demo binary built against the OpenCV stub."""
    if not os.path.exists(DEMO_ORACLE_BIN):
        _build_demo_oracle()
    return DEMO_ORACLE_BIN


@pytest.fixture(scope="session")
def reference_bin():
    return os.path.join(REFERENCE, "bin")
