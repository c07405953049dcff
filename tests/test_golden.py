"""Statistical golden-image parity vs the reference's checked-in render.

The reference is not seed-controllable (SURVEY.md §5), so comparison is
statistical, at three granularities (bounds calibrated against measured
seed-to-seed noise at spp=48: per-tile |diff| p95 ≈ 9/255, max ≈ 13/255;
quadrant-mean noise ≈ 1.5/255):

- whole-image mean within 2.5/255 per channel + structural correlation —
  tight enough that a 5% global shading bias (≈ +3.4/255 after gamma)
  FAILS, which test_golden_detects_injected_bias verifies by injection;
- every 12x12 tile mean within 24/255 (gross local errors; the worst
  tile sits on the rough-dielectric mid sphere at ~20/255 — the
  f32-scale-robust shadow offsets eliminate phantom self-intersection
  vertices the golden's double-precision renderer never had, shifting
  marginal Dirac/rough-dielectric paths);
- every quadrant mean within 6.5/255. The top-left quadrant carries a
  measured ~4-6/255 SYSTEMATIC gap vs the golden, root-caused in round 4
  by BUILDING AND RUNNING the reference itself (g++ + a minimal Eigen
  shim, DEMO scene, spp=512):
    * the fresh reference render matches the checked-in golden to
      0.37/255 (quad max) — the golden is authentic and current, and the
      old "correlated default-seeded RNG" attribution is FALSIFIED (the
      golden's high-frequency noise floor equals ours: 5.35 vs 5.37);
    * the gap is the reference's two-sided shadow visibility band
      |t_nearest − dist| < 1e-4 (Scene.cpp:73-75): at demo scale in f32
      (ULP(500) ≈ 6e-5) a few ULPs of intersection rounding push
      genuinely-visible light samples out of the band. Our robust
      one-sided predicate keeps them: rendering with the band verbatim
      (MCPT_VIS_PARITY=1) lands ~6/255 BELOW the fresh reference (our
      Woop t-rounding loses even more samples to the band), while the
      robust form lands ~4/255 above — bracketing the reference between
      the two predicates. The brightness surplus is a deliberate,
      documented correctness improvement, not a bug (PARITY.md row 3).
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


def _tiles(img, n=12):
    return img.reshape(n, 96 // n, n, 96 // n, 3).mean(axis=(1, 3))


def _quadrants(img):
    return img.reshape(2, 48, 2, 48, 3).mean(axis=(1, 3))


@pytest.fixture(scope="module")
def rendered():
    sc = demo_scene()
    cam = dataclasses.replace(sc.camera, width=96, height=96)
    fb, _ = render_radiance(
        sc.compile(), cam, spp=48, max_bounces=8, method="dense", spp_chunk=16
    )
    return fb


@pytest.fixture(scope="module")
def golden_small():
    golden = read_png(GOLDEN)[:, :, :3].astype(np.float32)
    return golden.reshape(96, 4, 96, 4, 3).mean(axis=(1, 3))


@pytest.mark.slow
def test_demo_matches_golden_statistics(rendered, golden_small):
    ours = tonemap(rendered)[:, :, :3].astype(np.float32)
    g = golden_small
    # Mean brightness within 2.5/255 per channel (calibrated: current gap
    # 0.3, seed noise ~0.8; a 5% shading bias shifts ~3.4).
    np.testing.assert_allclose(
        ours.reshape(-1, 3).mean(axis=0), g.reshape(-1, 3).mean(axis=0), atol=2.5
    )
    # Structural correlation (noise at spp=48 bounds this from ~0.94).
    corr = np.corrcoef(g.ravel(), ours.ravel())[0, 1]
    assert corr > 0.9, corr


@pytest.mark.slow
def test_demo_golden_per_region(rendered, golden_small):
    ours = tonemap(rendered)[:, :, :3].astype(np.float32)
    g = golden_small
    tile_d = np.abs(_tiles(ours) - _tiles(g)).max(-1)
    assert tile_d.max() < 24.0, float(tile_d.max())
    quad_d = np.abs(_quadrants(ours) - _quadrants(g)).max(-1)
    assert quad_d.max() < 6.5, float(quad_d.max())


@pytest.mark.slow
def test_golden_detects_injected_bias(rendered, golden_small):
    """The golden check must actually CATCH a 5% shading bug: inject a 5%
    linear brightness error and assert the whole-mean bound fails
    (sensitivity validation — a statistical test that cannot reject a
    deliberate bug proves nothing)."""
    bad = np.array(rendered, copy=True) * 1.05
    ours = tonemap(bad)[:, :, :3].astype(np.float32)
    dm = np.abs(
        ours.reshape(-1, 3).mean(axis=0) - golden_small.reshape(-1, 3).mean(axis=0)
    )
    assert dm.max() >= 2.5, (
        f"golden mean check failed to detect an injected 5% bias: {dm}"
    )


def test_fresh_reference_matches_checked_in_golden():
    """Provenance lock: the spp-512 render produced by BUILDING AND RUNNING
    the reference (benchmarks/ref_oracle/build_and_run.sh, round 4) must
    keep matching the checked-in golden — this pins the golden's
    authenticity (quad means agreed to 0.37/255 when rendered) and guards
    the archived artifact against accidental regeneration drift."""
    fresh_path = os.path.join(
        os.path.dirname(__file__), "data", "reference_fresh_demo_spp512.png"
    )
    if not os.path.exists(fresh_path):
        pytest.skip("fresh reference render not archived")
    fresh = read_png(fresh_path)[:, :, :3].astype(np.float64)
    gold = read_png(GOLDEN)[:, :, :3].astype(np.float64)
    q = lambda x: x.reshape(2, 192, 2, 192, 3).mean(axis=(1, 3))
    assert np.abs(q(fresh) - q(gold)).max() < 1.0
    corr = np.corrcoef(fresh.mean(-1).ravel(), gold.mean(-1).ravel())[0, 1]
    assert corr > 0.99, corr
