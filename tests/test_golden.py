"""Statistical golden-image parity vs the reference's checked-in render.

The reference is not seed-controllable (SURVEY.md §5), so comparison is
statistical: mean RGB and downscaled structural correlation at reduced spp.
"""

import dataclasses
import os

import numpy as np
import pytest

from mcpt_tpu.builtin_scenes import demo_scene
from mcpt_tpu.film import tonemap
from mcpt_tpu.io.png import read_png
from mcpt_tpu.render import render_radiance

GOLDEN = "/root/reference/cornellbox_demo.png"

pytestmark = pytest.mark.skipif(
    not os.path.exists(GOLDEN), reason="reference golden image absent"
)


@pytest.mark.slow
def test_demo_matches_golden_statistics():
    golden = read_png(GOLDEN)[:, :, :3].astype(np.float32)
    sc = demo_scene()
    cam = dataclasses.replace(sc.camera, width=96, height=96)
    fb, _ = render_radiance(
        sc.compile(), cam, spp=48, max_bounces=8, method="dense", spp_chunk=16
    )
    ours = tonemap(fb)[:, :, :3].astype(np.float32)
    g = golden.reshape(96, 4, 96, 4, 3).mean(axis=(1, 3))
    # Mean brightness within 4/255 per channel.
    np.testing.assert_allclose(
        ours.reshape(-1, 3).mean(axis=0), g.reshape(-1, 3).mean(axis=0), atol=4.0
    )
    # Structural correlation (noise at spp=48 bounds this from ~0.94).
    corr = np.corrcoef(g.ravel(), ours.ravel())[0, 1]
    assert corr > 0.9, corr
