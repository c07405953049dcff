"""Intersection engine: unit cases + three-way parity (dense/BVH/brute)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcpt_tpu.builtin_scenes import demo_scene
from mcpt_tpu.constants import T_MAX
from mcpt_tpu.intersect import (
    intersect_brute,
    intersect_bvh,
    intersect_dense,
    surface_at,
)
from mcpt_tpu.materials import Material
from mcpt_tpu.scene import Scene, Sphere, TriangleMesh


def _single_tri_scene():
    pos = np.array([[[0, 0, 0], [1, 0, 0], [0, 1, 0]]], np.float32)
    sc = Scene()
    sc.add(TriangleMesh(positions=pos, texcoords=np.zeros((1, 3, 2), np.float32)))
    return sc.compile()


def test_triangle_hit_miss_edges():
    pack = _single_tri_scene()
    o = jnp.array(
        [
            [0.25, 0.25, -1.0],  # inside
            [0.9, 0.9, -1.0],  # outside (u+v>1)
            [0.0, 0.0, -1.0],  # corner (inclusive bounds -> hit)
            [0.25, 0.25, 1.0],  # behind, pointing away
        ],
        jnp.float32,
    )
    d = jnp.array([[0, 0, 1], [0, 0, 1], [0, 0, 1], [0, 0, 1]], jnp.float32)
    hit = intersect_dense(pack, o, d)
    assert np.asarray(hit.prim).tolist() == [0, -1, 0, -1]
    np.testing.assert_allclose(np.asarray(hit.t)[0], 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hit.u)[0], 0.25, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hit.v)[0], 0.25, atol=1e-5)
    # Backface: reference Möller-Trumbore is two-sided (|det| test only).
    hit_back = intersect_dense(pack, jnp.array([[0.25, 0.25, 1.0]]), jnp.array([[0.0, 0.0, -1.0]]))
    assert int(hit_back.prim[0]) == 0


def test_sphere_cases():
    sc = Scene()
    sc.add(Sphere((0.0, 0.0, 5.0), 1.0, Material()))
    pack = sc.compile()
    o = jnp.array([[0, 0, 0], [0, 0, 5], [0, 3, 0]], jnp.float32)
    d = jnp.array([[0, 0, 1], [0, 0, 1], [0, 0, 1]], jnp.float32)
    hit = intersect_dense(pack, o, d)
    t = np.asarray(hit.t)
    assert abs(t[0] - 4.0) < 1e-4  # outside -> near root
    assert abs(t[1] - 1.0) < 1e-4  # inside -> far root
    assert t[2] >= T_MAX  # miss
    surf = surface_at(pack, o, d, hit)
    n = np.asarray(surf.n)
    np.testing.assert_allclose(n[0], [0, 0, -1], atol=1e-5)  # outward normal
    np.testing.assert_allclose(n[1], [0, 0, 1], atol=1e-5)


@pytest.mark.parametrize("seed", [0, 7])
def test_three_way_parity_demo_scene(seed):
    pack = demo_scene().compile()
    key = jax.random.key(seed)
    b = 4096
    o = jnp.array([[278.0, 273.0, -600.0]]) + jax.random.uniform(
        key, (b, 3), minval=-250, maxval=250
    )
    d = jax.random.normal(jax.random.fold_in(key, 1), (b, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    hd = intersect_dense(pack, o, d)
    hb = intersect_bvh(pack, o, d)
    hr = intersect_brute(pack, o, d)
    assert (np.asarray(hd.prim) == np.asarray(hr.prim)).all()
    assert (np.asarray(hb.prim) == np.asarray(hr.prim)).all()
    tm = np.asarray(hr.t) < 1e30
    np.testing.assert_allclose(
        np.asarray(hd.t)[tm], np.asarray(hr.t)[tm], rtol=1e-3, atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(hb.t)[tm], np.asarray(hr.t)[tm], rtol=1e-3, atol=2e-3
    )
    # Barycentrics agree where a triangle won.
    tri_mask = tm & (np.asarray(hr.prim) < pack.tri_v0.shape[0])
    np.testing.assert_allclose(
        np.asarray(hd.u)[tri_mask], np.asarray(hr.u)[tri_mask], atol=2e-3
    )


def test_surface_uv_interpolation():
    pos = np.array([[[0, 0, 0], [2, 0, 0], [0, 2, 0]]], np.float32)
    uv = np.array([[[0, 0], [1, 0], [0, 1]]], np.float32)
    m = Material(textured=True)
    sc = Scene()
    sc.add(TriangleMesh(positions=pos, texcoords=uv, material=m))
    pack = sc.compile()
    o = jnp.array([[0.5, 1.0, -1.0]], jnp.float32)
    d = jnp.array([[0, 0, 1]], jnp.float32)
    hit = intersect_dense(pack, o, d)
    surf = surface_at(pack, o, d, hit)
    np.testing.assert_allclose(np.asarray(surf.uv)[0], [0.25, 0.5], atol=1e-5)
