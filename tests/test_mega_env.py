"""Environment-map megakernel tests (interpret mode on CPU).

The regen megakernel handles env scenes with a two-tier scheme
(kernels/megakernel.py): primary misses are counted in-kernel and shaded by
a deferred full-resolution bilinear pass reproducing the kernel's camera
draws bit-exactly (_primary_env_mean), while secondary bounces sample a
16x32 SMEM mip (nearest texel). The wavefront integrator — which samples
the full-res map per reference Scene.hpp:60-99 — is the parity oracle.
"""

import dataclasses

import numpy as np
import pytest

from mcpt_tpu.builtin_scenes import demo_scene
from mcpt_tpu.camera import Camera
from mcpt_tpu.kernels.megakernel import (
    ENV_MIP_H,
    ENV_MIP_W,
    ENV_MIP_ROWS,
    env_mip_table,
    mega_supported,
    render_mega,
)
from mcpt_tpu.render import render_radiance
from mcpt_tpu.scene import Scene


def _gradient_env(h=64, w=128):
    """Smooth low-frequency equirect map (distinct per channel)."""
    v = np.linspace(0.0, 1.0, h)[:, None]
    u = np.linspace(0.0, 1.0, w, endpoint=False)[None, :]
    img = np.stack(
        [
            0.2 + 0.6 * v * np.ones_like(u),
            0.3 + 0.4 * (0.5 + 0.5 * np.sin(2 * np.pi * u)) * np.ones_like(v),
            0.8 - 0.5 * v * np.ones_like(u),
        ],
        axis=-1,
    )
    return img.astype(np.float32)


def test_env_mip_table_preserves_means():
    env = _gradient_env()
    tab = np.asarray(env_mip_table(env))
    assert tab.shape == (3 * ENV_MIP_ROWS, 128)
    mip = tab.reshape(3, ENV_MIP_H, ENV_MIP_W).transpose(1, 2, 0)
    # global mean preserved exactly (row-stochastic resample weights)
    assert np.allclose(mip.mean((0, 1)), env.mean((0, 1)), atol=1e-3)
    # texel (row, col) layout round-trips: top row mean == source top band
    assert np.allclose(
        mip[0].mean(0), env[: 64 // ENV_MIP_H].mean((0, 1)), atol=1e-3
    )


def test_pure_sky_matches_wavefront():
    """No geometry: every sample is a primary miss; the megakernel's
    deferred pass must reproduce the wavefront's full-res env image within
    jitter noise (the maps are smooth, so the tolerance is tight)."""
    cam = Camera(
        width=16, height=8, fov=60,
        position=(0.0, 0.0, 0.0), target=(0.0, 0.0, 5.0), up=(0, 1, 0),
    )
    sc = Scene(cam)
    sc.env_pixels = _gradient_env()
    pack = sc.compile()
    assert pack.use_env and mega_supported(pack)
    img, stats = render_mega(pack, cam, spp=8, seed=0, max_bounces=3, interpret=True)
    ref, _ = render_radiance(
        pack, cam, 8, method="dense", max_bounces=3, tile_pixels=16 * 8
    )
    assert np.isfinite(img).all()
    # every sample missed -> rays == primaries only
    assert stats["rays"] == 16 * 8 * 3 * 8
    # per-pixel agreement: sub-pixel jitter over a smooth map
    assert np.abs(img - ref).max() < 0.02
    assert abs(img.mean() - ref.mean()) < 5e-3


@pytest.mark.parametrize("dof", [False, True])
def test_mega_env_matches_wavefront(dof):
    """Demo Cornell box + procedural-sky env map through the megakernel:
    whole-image and per-quadrant means agree with the wavefront integrator
    (primary misses exact, secondary env via the mip)."""
    from mcpt_tpu.sky import generate_sky

    sc = demo_scene()
    sc.env_pixels = np.clip(generate_sky(64, 32), 0.0, 1.0).astype(np.float32)
    sc.camera = dataclasses.replace(
        sc.camera, width=16, height=8, use_dof=dof,
        focal_distance=900.0, aperture_radius=20.0,
    )
    pack = sc.compile()
    assert mega_supported(pack)
    img, _ = render_mega(
        pack, sc.camera, spp=16, seed=0, max_bounces=4, interpret=True
    )
    ref, _ = render_radiance(
        pack, sc.camera, 32, method="dense", max_bounces=4, tile_pixels=16 * 8
    )
    assert np.isfinite(img).all()
    assert abs(img.mean() - ref.mean()) / max(ref.mean(), 1e-9) < 0.15
    # quadrant means (coarse spatial agreement at low spp)
    for i in range(2):
        for j in range(2):
            a = img[i * 4 : (i + 1) * 4, j * 8 : (j + 1) * 8].mean()
            b = ref[i * 4 : (i + 1) * 4, j * 8 : (j + 1) * 8].mean()
            assert abs(a - b) / max(b, 1e-9) < 0.4, (i, j, a, b)


def test_mega_env_deterministic():
    sc = demo_scene()
    sc.env_pixels = _gradient_env()
    pack = sc.compile()
    cam = dataclasses.replace(sc.camera, width=8, height=8)
    a, _ = render_mega(pack, cam, spp=2, seed=3, max_bounces=2, interpret=True)
    b, _ = render_mega(pack, cam, spp=2, seed=3, max_bounces=2, interpret=True)
    c, _ = render_mega(pack, cam, spp=2, seed=4, max_bounces=2, interpret=True)
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)


def test_mega_env_requires_regen():
    sc = demo_scene()
    sc.env_pixels = _gradient_env()
    pack = sc.compile()
    cam = dataclasses.replace(sc.camera, width=8, height=8)
    with pytest.raises(ValueError):
        render_mega(pack, cam, spp=1, interpret=True, regen=False)


def test_mega_env_sharded_8dev():
    import jax

    sc = demo_scene()
    sc.env_pixels = _gradient_env()
    pack = sc.compile()
    cam = dataclasses.replace(sc.camera, width=8, height=8)
    single, _ = render_mega(pack, cam, spp=2, seed=5, max_bounces=2, interpret=True)
    from mcpt_tpu.kernels.megakernel import render_mega_sharded

    sharded, st = render_mega_sharded(
        pack, cam, spp=2, seed=5, max_bounces=2, interpret=True,
        devices=jax.devices()[:8],
    )
    assert st["devices"] == 8
    assert np.allclose(single, sharded, atol=1e-6)


def test_mega_env_structured_map_bounded_error():
    """Bound the two-tier env approximation on STRUCTURED maps (VERDICT r3
    weak-item 6): the in-kernel secondary lookup is a 16x32 nearest-texel
    mip, so a map with features FINER than one 11.25-degree texel is
    box-averaged for bounce rays while the wavefront oracle samples the
    full-res map bilinearly on every miss (Scene.hpp:60-99). Primary misses
    go through the deferred full-res pass and stay exact regardless of map
    content (test_pure_sky_matches_wavefront).

    Two adversarial maps: a 2x2-pixel checker (5.6-degree period — strictly
    sub-texel, the mip sees ~the 0.5 mean everywhere) and a point sun (one
    20.0-radiance texel on a dark sky — concentrated energy the mip smears
    over its texel). The whole-image mean error of the mega render vs the
    wavefront oracle must stay within the documented bound; the measured
    values are recorded next to the mip constants (megakernel.py)."""
    sc_base = demo_scene()
    cam = dataclasses.replace(sc_base.camera, width=16, height=8)

    def run(env):
        sc = demo_scene()
        sc.env_pixels = env
        sc.camera = cam
        pack = sc.compile()
        img, _ = render_mega(
            pack, cam, spp=16, seed=0, max_bounces=4, interpret=True
        )
        ref, _ = render_radiance(
            pack, cam, 32, method="dense", max_bounces=4,
            tile_pixels=16 * 8,
        )
        assert np.isfinite(img).all()
        return float(img.mean()), float(ref.mean())

    # 2x2-px checker on 64x128 (5.6 deg period, sub-texel)
    yy, xx = np.meshgrid(np.arange(64) // 2, np.arange(128) // 2,
                         indexing="ij")
    checker = np.where(((yy + xx) % 2) == 0, 0.95, 0.05).astype(np.float32)
    checker = np.repeat(checker[:, :, None], 3, axis=2)
    a, b = run(checker)
    # measured 0.82% (round 4); bound at ~2x measured so a 3x error
    # regression in the secondary-env mip path fails CI
    assert abs(a - b) / max(b, 1e-9) < 0.02, (a, b)

    # point sun: single 20.0 texel at 45N, dark 0.02 sky
    sun = np.full((64, 128, 3), 0.02, np.float32)
    sun[16, 32] = 20.0
    a, b = run(sun)
    # measured 2.6% (round 4); bound at ~2x measured
    assert abs(a - b) / max(b, 1e-9) < 0.05, (a, b)
