"""Communication-volume accounting (parallel/commvol.py).

Two layers of proof:
1. the HLO byte extractor is calibrated against hand-built shard_map programs
   whose collective volumes are known exactly;
2. the sharded yolov3-416 inference program's measured per-image wire volume
   is asserted against the design's expectations (slow: full-net compile),
   which is what SHARDING.md's projected-scaling table is generated from
   (scripts/commvol_table.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from yolo2_light_tpu.parallel.commvol import (collective_volumes,
                                              pp_boundary_bytes, wire_bytes)

needs8 = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


def _hlo(fn, *args):
    return jax.jit(fn).lower(*args).compile().as_text()


@needs8
def test_extractor_all_gather_bytes():
    mesh = Mesh(np.array(jax.devices()[:4]), ("x",))
    x = np.zeros((4, 128), np.float32)

    @jax.jit
    def f(x):
        def body(x):
            return jax.lax.all_gather(x, "x", axis=0, tiled=True)
        return shard_map(body, mesh=mesh, in_specs=P("x"), out_specs=P(),
                         check_vma=False)(x)

    vols = collective_volumes(jax.jit(f).lower(x).compile().as_text())
    assert "all-gather" in vols, vols
    # result = the gathered [4,128] f32 on each device (+ possibly a tiled
    # layout copy, but exactly one all-gather instruction)
    assert vols["all-gather"]["count"] == 1, vols
    assert vols["all-gather"]["result_bytes"] == 4 * 128 * 4, vols
    # ring wire: (n-1)/n of the result received per device
    assert wire_bytes(vols, 4) == pytest.approx(4 * 128 * 4 * 3 / 4)


@needs8
def test_extractor_psum_and_permute_bytes():
    mesh = Mesh(np.array(jax.devices()[:4]), ("x",))
    x = np.zeros((4, 64), np.float32)

    def psum_body(x):
        return jax.lax.psum(x, "x")

    def perm_body(x):
        return jax.lax.ppermute(x, "x", [(i, (i + 1) % 4) for i in range(4)])

    for body, op, want in [
        (psum_body, "all-reduce", 64 * 4),          # per-device result [64]
        (perm_body, "collective-permute", 64 * 4),  # per-device band [1,64]
    ]:
        def f(x, body=body):
            return shard_map(body, mesh=mesh, in_specs=P("x"),
                             out_specs=P("x"))(x)

        vols = collective_volumes(jax.jit(f).lower(x).compile().as_text())
        assert op in vols, (op, vols)
        assert vols[op]["count"] == 1, (op, vols)
        assert vols[op]["result_bytes"] == want, (op, vols)


def test_extractor_parses_async_start_done_once():
    # synthetic HLO: async all-gather pair + a done must count ONCE, with the
    # -start's result tuple contributing only its final (gathered) array
    text = """
  %ag = (f32[2,8]{1,0}, f32[8,8]{1,0}) all-gather-start(f32[2,8]{1,0} %p), dimensions={0}
  %agd = f32[8,8]{1,0} all-gather-done((f32[2,8]{1,0}, f32[8,8]{1,0}) %ag)
  %ar = f32[16]{0} all-reduce(f32[16]{0} %q), to_apply=%add
"""
    vols = collective_volumes(text)
    assert vols["all-gather"] == {"count": 1, "result_bytes": 8 * 8 * 4,
                                  "group_bytes": {None: 8 * 8 * 4}}
    assert vols["all-reduce"] == {"count": 1, "result_bytes": 16 * 4,
                                  "group_bytes": {None: 16 * 4}}


def test_extractor_group_sizes_and_ring_factors():
    """Ring factors must use each collective's OWN participant count (its
    replica_groups), not the mesh size (round-5 review): a model-axis
    all-gather on a data x model mesh runs over the model subgroup."""
    text = """
  %a = f32[8,8]{1,0} all-gather(f32[2,8]{1,0} %p), replica_groups={{0,1},{2,3}}, dimensions={0}
  %b = f32[16]{0} all-reduce(f32[16]{0} %q), replica_groups=[2,4]<=[8], to_apply=%add
  %c = f32[16]{0} all-reduce(f32[16]{0} %r), replica_groups={}, to_apply=%add
"""
    vols = collective_volumes(text)
    assert vols["all-gather"]["group_bytes"] == {2: 256}
    assert vols["all-reduce"]["group_bytes"] == {4: 64, None: 64}
    w = wire_bytes(vols, 8)
    expect = 256 * (1 / 2) + 2 * 64 * (3 / 4) + 2 * 64 * (7 / 8)
    assert abs(w - expect) < 1e-9, (w, expect)


def test_pp_boundary_bytes_analytic():
    from yolo2_light_tpu.cfg import parse_network_cfg
    from yolo2_light_tpu.parallel.pp import split_stages

    spec = parse_network_cfg("/root/reference/bin/yolov3.cfg", batch=1)
    ranges = split_stages(spec, 4)
    vols = pp_boundary_bytes(spec, ranges)
    assert len(vols) == 3
    # every boundary moves at least the running activation and far less than
    # a full 416x416x3 image's worth of f32 trunk replication
    for v in vols:
        assert 0 < v < 64 << 20, vols


@needs8
def test_per_image_normalizes_by_device_batch():
    """Mixed data x model mesh (round-5 review): per-device wire bytes must
    normalize by the images THAT device processes (batch/n_data), not the
    global batch. Each device runs the same per-image tp program on
    (data=2, model=2, batch=2) as on (data=1, model=2, batch=1), so the
    per-image volumes must agree; the old global-batch division halved the
    mixed-mesh number."""
    from yolo2_light_tpu.cfg import parse_network_cfg
    from yolo2_light_tpu.parallel.commvol import measure_mesh_comm
    from yolo2_light_tpu.parallel.mesh import make_mesh
    from yolo2_light_tpu.weights import fuse_conv_batchnorm, random_params

    spec = parse_network_cfg("tests/data/mini-yolo3.cfg", batch=1)
    params = fuse_conv_batchnorm(spec, random_params(spec, seed=3))
    _, tp_only = measure_mesh_comm(spec, params,
                                   make_mesh(2, data=1, model=2), batch=1)
    _, mixed = measure_mesh_comm(spec, params,
                                 make_mesh(4, data=2, model=2), batch=2)
    assert tp_only > 0 and mixed > 0
    rel = abs(mixed - tp_only) / tp_only
    assert rel < 0.3, (mixed, tp_only, rel)


@needs8
@pytest.mark.slow
def test_yolov3_416_tp4_wire_volume():
    """The headline byte count behind SHARDING.md's projection table: the
    tp=4 sharded yolov3-416 program's per-image wire volume must stay in the
    design's envelope — more than the trivial floor (something crosses ICI),
    less than the total activation footprint (GSPMD didn't fall into
    gather-everything-everywhere)."""
    from yolo2_light_tpu.cfg import ConvSpec, parse_network_cfg
    from yolo2_light_tpu.parallel.commvol import measure_mesh_comm
    from yolo2_light_tpu.parallel.mesh import make_mesh
    from yolo2_light_tpu.weights import fuse_conv_batchnorm, random_params

    spec = parse_network_cfg("/root/reference/bin/yolov3.cfg", batch=1)
    params = fuse_conv_batchnorm(spec, random_params(spec, seed=2))
    mesh = make_mesh(4, data=1, model=4)
    vols, per_image = measure_mesh_comm(spec, params, mesh, batch=1)

    # total f32 activation bytes the net produces per image (the cost of
    # all-gathering EVERY conv input at full channels — the naive ceiling)
    act_bytes = sum(l.out_h * l.out_w * l.out_c * 4 for l in spec.layers
                    if isinstance(l, ConvSpec))
    assert per_image > 1 << 20, (per_image, vols)       # >1 MB: really sharded
    assert per_image < act_bytes, (per_image, act_bytes, vols)
    assert vols.get("all-gather", {}).get("count", 0) > 0, vols
