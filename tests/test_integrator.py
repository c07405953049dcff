"""Integrator semantics: terminal cases, determinism, scan/while parity, and
a statistical cross-check against the independent scalar oracle."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcpt_tpu.builtin_scenes import demo_scene
from mcpt_tpu.camera import Camera, generate_rays
from mcpt_tpu.integrator import trace_paths
from mcpt_tpu.materials import Material, MaterialType, make_light_material
from mcpt_tpu.render import render_radiance
from mcpt_tpu.scene import Scene, TriangleMesh
from tests.oracle import OracleScene


def _quad(y, size, material, flip=False):
    c = [
        [-size, y, -size], [size, y, -size], [size, y, size], [-size, y, size]
    ]
    f1, f2 = ([0, 2, 1], [0, 3, 2]) if flip else ([0, 1, 2], [0, 2, 3])
    pos = np.array([[c[i] for i in f1], [c[i] for i in f2]], np.float32)
    return TriangleMesh(
        positions=pos, texcoords=np.zeros((2, 3, 2), np.float32), material=material
    )


def _lane_batch(o, d, chans=3):
    b = o.shape[0]
    o3 = jnp.repeat(o, chans, axis=0)
    d3 = jnp.repeat(d, chans, axis=0)
    chan = jnp.tile(jnp.arange(chans, dtype=jnp.int32), b)
    lam = jnp.asarray([0.7, 0.5461, 0.4358])[chan]
    return o3, d3, lam, chan


def test_miss_returns_background():
    sc = Scene()
    sc.add(_quad(0.0, 1.0, Material()))
    sc.set_background((0.1, 0.5, 0.9))
    pack = sc.compile()
    o = jnp.array([[0.0, 5.0, 0.0]], jnp.float32)
    d = jnp.array([[0.0, 1.0, 0.0]], jnp.float32)  # up, away from the quad
    o3, d3, lam, chan = _lane_batch(o, d)
    rad, _ = trace_paths(pack, o3, d3, lam, chan, jax.random.key(0), max_bounces=3)
    np.testing.assert_allclose(np.asarray(rad), [0.1, 0.5, 0.9], atol=1e-6)


def test_depth0_emitter_hit_clamped():
    sc = Scene()
    light = make_light_material(1.0)
    sc.add(_quad(2.0, 1.0, light, flip=True))  # normal down toward camera
    pack = sc.compile()
    o = jnp.array([[0.0, 0.0, 0.0]], jnp.float32)
    d = jnp.array([[0.0, 1.0, 0.0]], jnp.float32)
    o3, d3, lam, chan = _lane_batch(o, d)
    rad, _ = trace_paths(pack, o3, d3, lam, chan, jax.random.key(0), max_bounces=3)
    # Scene.cpp:102-107: clamp(0,1, emit*|wo·n|); emission >> 1 -> exactly 1.
    np.testing.assert_allclose(np.asarray(rad), 1.0, atol=1e-6)


def test_determinism_and_scan_while_parity():
    pack = demo_scene().compile()
    cam = demo_scene().camera
    ids = jnp.arange(512, dtype=jnp.int32) + 384 * 200
    o, d = generate_rays(cam, ids, jax.random.key(3))
    o3, d3, lam, chan = _lane_batch(o, d)
    r1, s1 = trace_paths(pack, o3, d3, lam, chan, jax.random.key(7), max_bounces=5, early_exit=True)
    r2, s2 = trace_paths(pack, o3, d3, lam, chan, jax.random.key(7), max_bounces=5, early_exit=True)
    r3, s3 = trace_paths(pack, o3, d3, lam, chan, jax.random.key(7), max_bounces=5, early_exit=False)
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r3))
    assert int(s1.rays) == int(s3.rays)
    r4, _ = trace_paths(pack, o3, d3, lam, chan, jax.random.key(8), max_bounces=5)
    assert np.abs(np.asarray(r1) - np.asarray(r4)).max() > 0  # key matters


def test_shadowing_blocks_direct_light():
    light = make_light_material(3.0)
    floor_mat = Material(MaterialType.ROUGH_CONDUCTOR, roughness=0.8,
                         base_reflectance=(0.9, 0.9, 0.9))
    blocker = Material(MaterialType.ROUGH_CONDUCTOR, roughness=1.0)

    def build(with_blocker):
        sc = Scene()
        sc.add(_quad(4.0, 1.0, light))
        sc.add(_quad(0.0, 4.0, floor_mat, flip=True))
        if with_blocker:
            sc.add(_quad(2.0, 2.0, blocker, flip=True))  # between light and floor
        return sc

    o = jnp.array([[0.0, 1.0, -6.0]], jnp.float32)
    d = jnp.array([[0.0, -0.15, 0.98]], jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o3, d3, lam, chan = _lane_batch(o, d)

    vals = []
    for wb in (False, True):
        pack = build(wb).compile()
        acc = 0.0
        for k in range(64):
            r, _ = trace_paths(pack, o3, d3, lam, chan, jax.random.key(k), max_bounces=2)
            acc += float(np.asarray(r).mean())
        vals.append(acc / 64)
    assert vals[1] < vals[0] * 0.3  # blocker kills most direct light


def test_disable_shadow_matches_visibility_off():
    light = make_light_material(3.0)
    floor_mat = Material(MaterialType.ROUGH_CONDUCTOR, roughness=0.8,
                         base_reflectance=(0.9, 0.9, 0.9))
    blocker = Material(MaterialType.ROUGH_CONDUCTOR, roughness=1.0)
    sc = Scene()
    sc.add(_quad(4.0, 1.0, light))
    sc.add(_quad(0.0, 4.0, floor_mat, flip=True))
    sc.add(_quad(2.0, 2.0, blocker, flip=True))
    sc.enable_shadow = False
    pack = sc.compile()
    o = jnp.array([[0.0, 1.0, -6.0]], jnp.float32)
    d = jnp.array([[0.0, -0.15, 0.98]], jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o3, d3, lam, chan = _lane_batch(o, d)
    r, _ = trace_paths(pack, o3, d3, lam, chan, jax.random.key(0), max_bounces=1)
    # With shadows off the (occluded) floor still gets NEE light.
    assert float(np.asarray(r).mean()) > 0.0


@pytest.mark.slow
def test_statistical_match_vs_oracle():
    """MC mean of the vectorized wavefront must match the recursive scalar
    oracle on a small rough-conductor + light scene (independent RNGs)."""
    light = make_light_material(2.0)
    floor_mat = Material(MaterialType.ROUGH_CONDUCTOR, roughness=0.5,
                         base_reflectance=(0.8, 0.6, 0.4))
    sc = Scene()
    sc.add(_quad(4.0, 1.5, light))
    sc.add(_quad(0.0, 5.0, floor_mat, flip=True))
    sc.set_rr_rate(0.6)
    pack = sc.compile()
    oracle = OracleScene(sc)

    o_np = np.array([0.0, 2.0, -6.0])
    d_np = np.array([0.0, -0.3, 1.0])
    d_np /= np.linalg.norm(d_np)

    rng = np.random.default_rng(0)
    n_oracle = 1200
    ref = np.zeros(3)
    for chan in range(3):
        ref[chan] = np.mean(
            [oracle.cast_ray(o_np, d_np, 0, chan, rng) for _ in range(n_oracle)]
        )

    o = jnp.asarray(o_np, jnp.float32)[None, :]
    d = jnp.asarray(d_np, jnp.float32)[None, :]
    o3, d3, lam, chan = _lane_batch(o, d)
    acc = np.zeros(3)
    n_ours = 4000
    for k in range(n_ours // 8):
        keys = jax.random.fold_in(jax.random.key(11), k)
        o8 = jnp.repeat(o3, 8, axis=0)
        d8 = jnp.repeat(d3, 8, axis=0)
        lam8 = jnp.tile(lam, 8)
        chan8 = jnp.tile(chan, 8)
        r, _ = trace_paths(pack, o8, d8, lam8, chan8, keys, max_bounces=10)
        acc += np.asarray(r).reshape(8, 3).sum(axis=0)
    ours = acc / n_ours
    # Agreement within combined MC error (~3 sigma).
    np.testing.assert_allclose(ours, ref, rtol=0.12, atol=0.01)


@pytest.mark.slow
def test_sphere_light_vs_oracle():
    """Emissive SPHERE lights (reference capability Sphere.hpp:60-74, unused
    by its scenes): wavefront integrator vs the independent scalar oracle on
    a sphere-lit rough floor, plus megakernel mean parity."""
    from mcpt_tpu.scene import Sphere

    light = make_light_material(3.0)
    floor_mat = Material(MaterialType.ROUGH_CONDUCTOR, roughness=0.5,
                         base_reflectance=(0.8, 0.6, 0.4))
    sc = Scene()
    sc.add(_quad(0.0, 5.0, floor_mat, flip=True))
    sc.add(Sphere((0.0, 4.0, 1.5), 0.8, light, "slight"))
    sc.set_rr_rate(0.6)
    pack = sc.compile()
    assert pack.n_sph_emitters == 1
    assert float(np.asarray(pack.emit_total_area)) == pytest.approx(
        4.0 * np.pi * 0.8**2, rel=1e-5
    )
    oracle = OracleScene(sc)

    o_np = np.array([0.0, 2.0, -6.0])
    d_np = np.array([0.0, -0.3, 1.0])
    d_np /= np.linalg.norm(d_np)
    rng = np.random.default_rng(0)
    n_oracle = 900
    ref = np.zeros(3)
    for chan in range(3):
        ref[chan] = np.mean(
            [oracle.cast_ray(o_np, d_np, 0, chan, rng) for _ in range(n_oracle)]
        )

    o = jnp.asarray(o_np, jnp.float32)[None, :]
    d = jnp.asarray(d_np, jnp.float32)[None, :]
    o3, d3, lam, chan = _lane_batch(o, d)
    acc = np.zeros(3)
    n_ours = 2400
    for k in range(n_ours // 8):
        keys = jax.random.fold_in(jax.random.key(11), k)
        o8 = jnp.repeat(o3, 8, axis=0)
        d8 = jnp.repeat(d3, 8, axis=0)
        lam8 = jnp.tile(lam, 8)
        chan8 = jnp.tile(chan, 8)
        r, _ = trace_paths(pack, o8, d8, lam8, chan8, keys, max_bounces=10)
        acc += np.asarray(r).reshape(8, 3).sum(axis=0)
    ours = acc / n_ours
    assert ref.mean() > 0.01  # the sphere light actually lights the floor
    np.testing.assert_allclose(ours, ref, rtol=0.15, atol=0.015)

    # megakernel NEE sphere branch: camera render mean parity vs wavefront
    from mcpt_tpu.kernels.megakernel import render_mega

    cam = Camera(
        width=16, height=8, fov=60,
        position=(0.0, 2.0, -6.0), target=(0.0, 1.0, 0.0), up=(0, 1, 0),
    )
    img, _ = render_mega(pack, cam, spp=16, seed=0, max_bounces=4, interpret=True)
    ref_img, _ = render_radiance(
        pack, cam, 32, method="dense", max_bounces=4, tile_pixels=16 * 8
    )
    assert np.isfinite(img).all()
    assert abs(img.mean() - ref_img.mean()) / max(ref_img.mean(), 1e-9) < 0.2


def test_render_radiance_shapes_and_tiles():
    sc = demo_scene()
    cam = dataclasses.replace(sc.camera, width=21, height=13)
    fb, stats = render_radiance(
        sc.compile(), cam, spp=2, max_bounces=2, tile_pixels=64, spp_chunk=2
    )
    assert fb.shape == (13, 21, 3)
    assert np.isfinite(fb).all()
    assert stats["rays"] > 21 * 13 * 2 * 3
