"""The reference's exact shipped conf.json, end to end (VERDICT r4 item 3).

Every user of the reference runs `RayTracing ../conf.json` with the checked-in
`/root/reference/conf.json:1-55` (1920x1080, spp=32, DoF on, sky env map,
model_quality low, DLS=32, RR=0.4). These tests parse THAT file verbatim —
not a synthetic dict — through `load_config`/`build_scene` in both parity
modes and pin the scene that comes out; plus a structural check of the
archived TPU artifacts rendered from it (`python -m mcpt_tpu --conf
/root/reference/conf.json`, assets/renders/refconf_*.png).

The repo root also ships its own `conf.json` (same key set, envMap pointing
at the procedural sky stand-in) so the README quick-start is runnable as
written; it must build identically.
"""

import os

import numpy as np
import pytest

from mcpt_tpu.config import build_scene, load_config
from mcpt_tpu.io.png import read_png

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_CONF = "/root/reference/conf.json"
REF_MODELS = "/root/reference/models"


def _ref_available():
    return os.path.exists(REF_CONF) and os.path.isdir(REF_MODELS)


@pytest.mark.skipif(not _ref_available(), reason="reference mount absent")
def test_reference_conf_verbatim_strict_parity():
    """Strict parity = what the reference binary actually does with its own
    shipped tree: DLS stays 4 (dead key, Scene.hpp:28), the missing
    models/envoMaps/sky.png falls back to the background (Scene.hpp:42-46),
    renderer.path is ignored (main.cpp:191)."""
    conf = load_config(REF_CONF)
    scene, opts = build_scene(conf, models_dir=REF_MODELS, strict_parity=True)
    cam = scene.camera
    assert (cam.width, cam.height) == (1920, 1080)
    assert cam.use_dof and abs(cam.aperture_radius - 10.0) < 1e-9
    assert abs(cam.focal_distance - 3036.98) < 1e-6
    assert opts["spp"] == 32
    assert scene.n_dir_sample == 4  # directLightSample is a dead key
    assert scene.env_pixels is None  # sky.png missing -> background
    assert abs(scene.rr_rate - 0.4) < 1e-9
    pack = scene.compile()
    # chessboard scene: floor + light + king + 14 soldiers + diamond,
    # low quality => tens of thousands of triangles on the clustered path
    assert 30_000 < pack.n_tris < 60_000
    assert pack.n_cl_nodes > 0
    assert pack.n_emitters >= 2  # the area light's triangles


@pytest.mark.skipif(not _ref_available(), reason="reference mount absent")
def test_reference_conf_verbatim_fixed_mode():
    """Fixed mode honors DLS=32 and substitutes the repo's procedural sky
    for the missing sky.png (the reference's published sky artifact used
    one), so the shipped config renders the published look."""
    conf = load_config(REF_CONF)
    scene, opts = build_scene(
        conf, models_dir=REF_MODELS, strict_parity=False
    )
    assert scene.n_dir_sample == 32
    assert scene.env_pixels is not None and scene.env_pixels.shape[2] == 3
    assert opts["spp"] == 32


def test_repo_conf_quickstart_builds():
    """The repo root's own conf.json (README quick-start) must parse and
    build with the reference meshes when available; without the mount it
    must still parse."""
    conf = load_config(os.path.join(REPO, "conf.json"))
    assert conf["renderer"]["spp"] == 32
    assert conf["camera"]["width"] == 1920
    if not _ref_available():
        pytest.skip("reference models absent")
    scene, _ = build_scene(
        conf, models_dir=REF_MODELS, strict_parity=False
    )
    assert scene.env_pixels is not None  # assets/sky.png resolves
    assert scene.camera.use_dof


def _tile_means(img, ty=12, tx=24):
    h, w = img.shape[:2]
    lum = img[: h - h % ty, : w - w % tx].astype(np.float64).mean(axis=2)
    return lum.reshape(ty, h // ty, tx, w // tx).mean(axis=(1, 3))


def test_refconf_strict_artifact_structure():
    """Archived verbatim-config render (strict parity, env fallback):
    geometry band present and brighter than the empty background top."""
    path = os.path.join(REPO, "assets", "renders", "refconf_strict.png")
    if not os.path.exists(path):
        pytest.skip("artifact not rendered yet")
    img = read_png(path)[:, :, :3]
    t = _tile_means(img)
    assert np.isfinite(t).all() and t.max() > 10.0
    # mirror-floor band (bottom half) carries the scene's light; the top
    # rows are background-only in the dark fallback
    assert t[7:].mean() > 1.5 * t[:3].mean()


def test_refconf_sky_artifact_structure():
    """Archived fixed-mode render (sky + DLS=32 + DoF): sky band bright at
    the top, scene band distinct below."""
    path = os.path.join(REPO, "assets", "renders", "refconf_sky.png")
    if not os.path.exists(path):
        pytest.skip("artifact not rendered yet")
    img = read_png(path)[:, :, :3]
    t = _tile_means(img)
    assert np.isfinite(t).all()
    # equirect sky fills the upper rows with a bright band
    assert t[:3].mean() > 60.0
    # the geometry band differs from the sky (not a flat image)
    assert abs(t[8:].mean() - t[:3].mean()) > 5.0
