"""BSDF math: formula parity vs an independent scalar oracle, sampling
distribution checks, Fresnel physics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcpt_tpu import bsdf
from mcpt_tpu.materials import Material, MaterialType
from mcpt_tpu.scene import Scene, TriangleMesh
from tests.oracle import OracleScene


def _lane(mat: Material, b=1):
    """MatLane for a single material replicated over b lanes."""
    pos = np.array([[[0, 0, 0], [1, 0, 0], [0, 1, 0]]], np.float32)
    sc = Scene()
    sc.add(TriangleMesh(positions=pos, texcoords=np.zeros((1, 3, 2), np.float32), material=mat))
    pack = sc.compile()
    return pack, bsdf.gather_material(pack, jnp.zeros(b, jnp.int32))


def _rand_dirs(key, b):
    v = jax.random.normal(key, (b, 3))
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


@pytest.mark.parametrize(
    "mtype",
    [
        MaterialType.ROUGH_CONDUCTOR,
        MaterialType.ROUGH_DIELECTRIC,
        MaterialType.SMOOTH_CONDUCTOR,
        MaterialType.SMOOTH_DIELECTRIC,
    ],
)
@pytest.mark.parametrize("is_reflect", [True, False])
def test_eval_pdf_match_oracle(mtype, is_reflect):
    mat = Material(mtype, roughness=0.3, ior_a=1.5, ior_b=0.02,
                   base_reflectance=(0.9, 0.7, 0.5))
    sc = Scene()
    pos = np.array([[[0, 0, 0], [1, 0, 0], [0, 1, 0]]], np.float32)
    sc.add(TriangleMesh(positions=pos, texcoords=np.zeros((1, 3, 2), np.float32), material=mat))
    oracle = OracleScene(sc)
    pack, m = _lane(mat, b=256)
    key = jax.random.key(int(mtype) * 2 + is_reflect)
    wi = _rand_dirs(key, 256)
    wo = _rand_dirs(jax.random.fold_in(key, 1), 256)
    n = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (256, 3))
    chan = jnp.tile(jnp.arange(3, dtype=jnp.int32), 86)[:256]
    lam = jnp.asarray([0.7, 0.5461, 0.4358])[chan]
    uv = jnp.full((256, 2), 0.4)
    isr = jnp.full(256, is_reflect, bool)
    ev = np.asarray(bsdf.eval_bsdf(m, wi, wo, n, lam, uv, chan, isr))
    pv = np.asarray(bsdf.pdf(m, wi, wo, n, lam, isr))
    wi_n, wo_n = np.asarray(wi, np.float64), np.asarray(wo, np.float64)
    n_np = np.array([0.0, 0.0, 1.0])
    for i in range(0, 256, 17):
        ev_ref = oracle.eval(mat, wi_n[i], wo_n[i], n_np, int(chan[i]), np.full(2, 0.4), is_reflect)
        pv_ref = oracle.pdf(mat, wi_n[i], wo_n[i], n_np, int(chan[i]), is_reflect)
        np.testing.assert_allclose(ev[i], ev_ref, rtol=2e-3, atol=1e-5)
        np.testing.assert_allclose(pv[i], pv_ref, rtol=2e-3, atol=1e-5)


def test_fresnel_physics():
    mat = Material(MaterialType.SMOOTH_DIELECTRIC, ior_a=1.5, ior_b=0.0)
    _, m = _lane(mat, b=3)
    n = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (3, 3))
    lam = jnp.full(3, 0.5461)
    # Normal incidence from outside: ((n-1)/(n+1))^2 = 0.04.
    inc = jnp.array([[0, 0, -1.0], [0, 0, -1.0], [0.9798, 0, 0.2]], jnp.float32)
    inc = inc / jnp.linalg.norm(inc, axis=-1, keepdims=True)
    kr = np.asarray(bsdf.fresnel(m, inc, n, lam))
    np.testing.assert_allclose(kr[0], 0.04, atol=1e-4)
    # TIR: from inside (cosi>0) at a grazing angle beyond critical.
    assert kr[2] == 1.0
    # Conductors always 1.
    _, mc = _lane(Material(MaterialType.ROUGH_CONDUCTOR), b=1)
    krc = np.asarray(bsdf.fresnel(mc, inc[:1], n[:1], lam[:1]))
    assert krc[0] == 1.0


def test_refract_snell_and_tir():
    mat = Material(MaterialType.SMOOTH_DIELECTRIC, ior_a=1.5, ior_b=0.0)
    _, m = _lane(mat, b=2)
    n = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (2, 3))
    lam = jnp.full(2, 0.5461)
    inc = jnp.array([[np.sin(0.5), 0, -np.cos(0.5)], [0.9798, 0, 0.2]], jnp.float32)
    inc = inc / jnp.linalg.norm(inc, axis=-1, keepdims=True)
    out = np.asarray(bsdf.refract(m, inc, n, lam))
    # Snell: sin(theta_t) = sin(0.5)/1.5.
    np.testing.assert_allclose(out[0, 0], np.sin(0.5) / 1.5, atol=1e-5)
    assert out[0, 2] < 0
    np.testing.assert_allclose(np.linalg.norm(out[0]), 1.0, atol=1e-5)
    # TIR from inside -> zero vector (Material.hpp:240).
    np.testing.assert_allclose(out[1], 0.0)


def test_ggx_sampling_distribution():
    """Empirical CDF of cos(theta_h) must match the inverse-transform map
    cos = sqrt((1-u)/(1+(a^2-1)u)) (Material.hpp:111-123)."""
    mat = Material(MaterialType.ROUGH_CONDUCTOR, roughness=0.5)
    _, m = _lane(mat, b=200000)
    n = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (200000, 3))
    key = jax.random.key(0)
    x = jax.random.uniform(key, (200000, 2))
    h = bsdf.sample_microfacet_normal(m, n, x[:, 0], x[:, 1])
    cos_t = np.sort(np.asarray(h[:, 2]))
    u = np.linspace(0.001, 0.999, 97)
    a2 = 0.25
    cos_map = np.sqrt((1 - u) / (1 + (a2 - 1) * u))
    # Quantiles of cos_t should match cos_map (decreasing in u).
    emp = np.quantile(cos_t, 1 - u)
    np.testing.assert_allclose(emp, cos_map, atol=5e-3)


def test_chessboard_reflectance():
    uv = jnp.array(
        [[0.36, 0.05], [0.46, 0.05], [0.36, 0.14], [0.05, 0.5], [0.66, 0.05], [0.40, 0.70]],
        jnp.float32,
    )
    r = np.asarray(bsdf.chessboard_reflectance(uv))
    # col=int((u-.05)*10), row=int(v*12): (3,0)->odd: 0.9? (3+0)%2=1 -> 0.9
    assert r[0] == pytest.approx(0.9)
    assert r[1] == pytest.approx(0.1)  # col 4,row 0 -> even
    assert r[2] == pytest.approx(0.1)  # col 3,row 1 -> even
    assert r[3] == pytest.approx(0.1)  # col 0 outside board
    assert r[4] == pytest.approx(0.1)  # col 6 outside board
    assert r[5] == pytest.approx(0.1)  # row 8 outside board


def test_dirac_eval_mirror_only():
    mat = Material(MaterialType.SMOOTH_CONDUCTOR, base_reflectance=(0.8, 0.8, 0.8))
    _, m = _lane(mat, b=2)
    n = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (2, 3))
    wo = jnp.array([[0.6, 0, 0.8], [0.6, 0, 0.8]], jnp.float32)
    wi = jnp.array([[-0.6, 0, 0.8], [0.0, 0.6, 0.8]], jnp.float32)
    chan = jnp.zeros(2, jnp.int32)
    lam = jnp.full(2, 0.7)
    ev = np.asarray(
        bsdf.eval_bsdf(m, wi, wo, n, lam, jnp.zeros((2, 2)), chan, jnp.ones(2, bool))
    )
    assert ev[0] > 0.8  # mirror pair -> Schlick(0.8 at cos=0.8)
    assert ev[1] == 0.0  # non-mirror pair -> Dirac zero
