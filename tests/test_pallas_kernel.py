"""Pallas intersect kernel vs the dense reference path (interpret mode on
CPU; the same kernel runs compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcpt_tpu.builtin_scenes import demo_scene
from mcpt_tpu.intersect import intersect_dense
from mcpt_tpu.kernels.intersect_pallas import intersect_tris_pallas


@pytest.fixture(scope="module")
def pack():
    return demo_scene().compile()


def test_kernel_matches_dense_triangles(pack):
    key = jax.random.key(1)
    b = 1024
    o = jnp.array([[278.0, 273.0, -600.0]]) + jax.random.uniform(
        key, (b, 3), minval=-250, maxval=250
    )
    d = jax.random.normal(jax.random.fold_in(key, 1), (b, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    t, prim, u, v = intersect_tris_pallas(pack.tri_kern, o, d, interpret=True)
    hd = intersect_dense(pack, o, d)
    prim_d = np.asarray(hd.prim)
    n_tris = pack.tri_v0.shape[0]
    tri_mask = prim_d < n_tris  # ignore lanes where a sphere won
    expected = np.where(prim_d[tri_mask] < 0, -1, prim_d[tri_mask])
    assert (np.asarray(prim)[tri_mask] == expected).all()
    hitm = tri_mask & (prim_d >= 0)
    np.testing.assert_allclose(np.asarray(t)[hitm], np.asarray(hd.t)[hitm],
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(u)[hitm], np.asarray(hd.u)[hitm], atol=1e-3)
    np.testing.assert_allclose(np.asarray(v)[hitm], np.asarray(hd.v)[hitm], atol=1e-3)


def test_kernel_pads_odd_batch(pack):
    o = jnp.array([[278.0, 273.0, -600.0]] * 3, jnp.float32)
    d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]], jnp.float32), (3, 1))
    t, prim, u, v = intersect_tris_pallas(pack.tri_kern, o, d, interpret=True)
    assert t.shape == (3,)
    assert (np.asarray(prim) >= 0).all()  # camera axis hits the box


def _rand_rays(b, key=7):
    k = jax.random.key(key)
    o = jnp.array([[278.0, 273.0, -600.0]]) + jax.random.uniform(
        k, (b, 3), minval=-250, maxval=250
    )
    d = jax.random.normal(jax.random.fold_in(k, 1), (b, 3))
    return o, d / jnp.linalg.norm(d, axis=-1, keepdims=True)


def test_mm_kernel_matches_dense(pack):
    from mcpt_tpu.kernels.intersect_pallas import intersect_tris_pallas_mm

    o, d = _rand_rays(1024)
    t, prim, u, v = intersect_tris_pallas_mm(pack.tri_kern, o, d, interpret=True)
    hd = intersect_dense(pack, o, d)
    prim_d = np.asarray(hd.prim)
    n_tris = pack.tri_v0.shape[0]
    tri_mask = prim_d < n_tris
    expected = np.where(prim_d[tri_mask] < 0, -1, prim_d[tri_mask])
    assert (np.asarray(prim)[tri_mask] == expected).all()
    hitm = tri_mask & (prim_d >= 0)
    np.testing.assert_allclose(
        np.asarray(t)[hitm], np.asarray(hd.t)[hitm], rtol=1e-4, atol=1e-3
    )
    np.testing.assert_allclose(np.asarray(u)[hitm], np.asarray(hd.u)[hitm], atol=1e-3)
    np.testing.assert_allclose(np.asarray(v)[hitm], np.asarray(hd.v)[hitm], atol=1e-3)


def test_mm_occlusion_t_matches_nearest(pack):
    from mcpt_tpu.kernels.intersect_pallas import intersect_tris_pallas_mm

    o, d = _rand_rays(512, key=11)
    t_full = intersect_tris_pallas_mm(pack.tri_kern, o, d, interpret=True)[0]
    t_occ = intersect_tris_pallas_mm(
        pack.tri_kern, o, d, interpret=True, occlusion=True
    )[0]
    np.testing.assert_allclose(np.asarray(t_occ), np.asarray(t_full), rtol=1e-6)


def test_occlude_t_matches_intersect(pack):
    from mcpt_tpu.intersect import occlude_t, intersect

    o, d = _rand_rays(512, key=13)
    for method in ("dense", "bvh", "pallas"):
        t_occ = occlude_t(pack, o, d, method=method)
        t_full = intersect(pack, o, d, method="dense").t
        np.testing.assert_allclose(
            np.asarray(t_occ), np.asarray(t_full), rtol=1e-4, atol=1e-3,
            err_msg=method,
        )
