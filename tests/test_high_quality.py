"""model_quality="high" (~296k triangles) coverage.

The reference ships high_king.obj (9,248 tris) / high_soldier.obj (20,480)
and selects them via conf.json model_quality (main.cpp:209-216 area,
conf.json:29-31 "note_2"). The full 296,344-tri scene runs through the
clustered megakernel on TPU — the dense leaf-row-group tables keep its
14k-node BVH inside SMEM/VMEM budgets (kernels/cluster.py); the recorded
render + throughput live in assets/renders/chessboard_high.png and PERF.md.

CPU-side, interpret-mode walks over a 14k-node tree are minutes-per-chunk,
so the tests here split the evidence:
  1. the full-scene PACK compiles with the dense (8, 128) tri blocks and
     passes the cluster-table invariants (host-side, fast);
  2. a high_soldier mesh (20,480 tris) renders end-to-end through the SAME
     leaf-64/tpg-8 dense layout (MCPT_CLUSTER_LEAF=64) in interpret mode.
"""

import dataclasses
import os

import numpy as np
import pytest

MODELS = os.environ.get("MCPT_MODELS_DIR", "/root/reference/models")

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(MODELS, "high_king.obj")),
    reason="reference high-quality models not available",
)


@pytest.mark.slow
def test_high_quality_pack_compiles_dense():
    from benchmarks.run import config_5
    from mcpt_tpu.kernels.megakernel import mega_supported

    sc, _, _, _ = config_5()
    pack = sc.compile()
    assert pack.tri_sc.shape[0] >= 296_000
    assert pack.n_cl_nodes > 0 and mega_supported(pack)
    # dense leaf-row-group layout: at leaf 64 the tri blocks are (8, 128)
    # (the padded 16-lane layout would need >160 MB VMEM for this scene)
    assert pack.cl_tris.shape[1] == 128
    assert pack.cl_groups == 1
    # VMEM budget: tri + uv tables stay well under the 128 MiB budget
    vmem_mb = (pack.cl_tris.size + pack.cl_uv.size) * 4 / 2**20
    assert vmem_mb < 80, vmem_mb


@pytest.mark.slow
def test_high_soldier_renders_dense_leaf64(monkeypatch):
    """End-to-end render of a high-quality mesh through the dense tpg-8
    cluster layout (exactly the layout the 296k scene uses on TPU)."""
    monkeypatch.setenv("MCPT_CLUSTER_LEAF", "64")
    from mcpt_tpu.builtin_scenes import CORNELL_LIGHT, _mesh
    from mcpt_tpu.camera import Camera
    from mcpt_tpu.kernels.megakernel import mega_supported, render_mega
    from mcpt_tpu.materials import make_light_material, standard_materials
    from mcpt_tpu.scene import Scene, TriangleMesh

    mats = standard_materials()
    # high_soldier.obj lives at raw coords x 399..553, y 0..268, z 172..326
    cam = Camera(
        width=16, height=8, fov=45,
        position=(476.0, 200.0, -300.0), target=(476.0, 130.0, 250.0),
        up=(0, 1, 0),
    )
    sc = Scene(cam)
    sc.add(
        TriangleMesh.from_obj(
            os.path.join(MODELS, "high_soldier.obj"),
            mats["rough_white_conductor"],
        )
    )
    # ceiling quad (y=548) shifted over the soldier
    sc.add(_mesh(CORNELL_LIGHT, make_light_material(20.0), "light",
                 translation=(200, -100, 0)))
    pack = sc.compile()
    assert pack.n_cl_nodes > 0 and mega_supported(pack)
    assert pack.cl_tris.shape[1] == 128 and pack.cl_groups == 1  # dense
    img, stats = render_mega(
        pack, cam, spp=1, seed=0, max_bounces=2, interpret=True
    )
    assert np.isfinite(img).all()
    assert img.max() > 0.0
    assert stats["rays"] > 16 * 8 * 3
