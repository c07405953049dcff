"""model_quality="high" (~296k triangles) end-to-end coverage.

The reference ships high_king.obj (9,248 tris) / high_soldier.obj (20,480)
and selects them via conf.json model_quality (main.cpp:209-216 area,
conf.json:29-31 "note_2"). The full scene (14 soldiers + king + diamond +
floor/wall/light = 296,344 tris) runs through the clustered megakernel —
the dense leaf-row-group tables keep its 14k-node BVH + 7k leaf groups
inside SMEM/VMEM budgets (kernels/cluster.py). The TPU-scale render is
recorded by benchmarks (assets/renders/chessboard_high.png, PERF.md);
this test proves the PATH end-to-end at reduced render size on CPU.
"""

import os

import numpy as np
import pytest

MODELS = os.environ.get("MCPT_MODELS_DIR", "/root/reference/models")

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(MODELS, "high_king.obj")),
    reason="reference high-quality models not available",
)


@pytest.mark.slow
def test_high_quality_scene_renders():
    from benchmarks.run import config_5
    from mcpt_tpu.kernels.megakernel import mega_supported, render_mega

    sc, _, _, _ = config_5()
    pack = sc.compile()
    assert pack.tri_sc.shape[0] >= 296_000
    assert pack.n_cl_nodes > 0 and mega_supported(pack)
    # dense leaf-row-group layout: at leaf 64 the tri blocks are (8, 128)
    assert pack.cl_tris.shape[1] == 128
    import dataclasses

    cam = dataclasses.replace(sc.camera, width=24, height=14)
    img, stats = render_mega(
        pack, cam, spp=1, seed=0, max_bounces=2, interpret=True
    )
    assert np.isfinite(img).all()
    assert img.max() > 0.0  # something is lit
    assert stats["rays"] > 24 * 14 * 3  # NEE fans actually ran
