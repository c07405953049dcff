"""Light sampling distribution + environment map sampling."""

import jax
import jax.numpy as jnp
import numpy as np

from mcpt_tpu.envmap import sample_env
from mcpt_tpu.lights import sample_light
from mcpt_tpu.materials import Material, MaterialType, make_light_material
from mcpt_tpu.scene import Scene, TriangleMesh


def _light_quad(y, size, brightness, offset=(0.0, 0.0)):
    v = np.array(
        [
            [[-size + offset[0], y, -size + offset[1]],
             [size + offset[0], y, -size + offset[1]],
             [size + offset[0], y, size + offset[1]]],
            [[-size + offset[0], y, -size + offset[1]],
             [size + offset[0], y, size + offset[1]],
             [-size + offset[0], y, size + offset[1]]],
        ],
        np.float32,
    )
    return TriangleMesh(
        positions=v,
        texcoords=np.zeros((2, 3, 2), np.float32),
        material=make_light_material(brightness),
    )


def test_light_samples_on_emitter_with_mesh_pdf():
    sc = Scene()
    sc.add(_light_quad(5.0, 2.0, 1.0))
    pack = sc.compile()
    key = jax.random.key(0)
    u = jax.random.uniform(key, (5000, 4))
    ls = sample_light(pack, u)
    p = np.asarray(ls.p)
    assert np.allclose(p[:, 1], 5.0, atol=1e-5)
    assert (np.abs(p[:, [0, 2]]) <= 2.0 + 1e-5).all()
    # pdf = 1/mesh_area = 1/16.
    np.testing.assert_allclose(np.asarray(ls.pdf), 1.0 / 16.0, rtol=1e-5)
    # Winding gives a downward-facing light, like the reference ceiling light.
    np.testing.assert_allclose(np.asarray(ls.n), [[0, -1, 0]] * 5000, atol=1e-6)
    # Emission is the light SPD.
    assert np.asarray(ls.emit)[0, 0] > 20


def test_two_mesh_lights_area_weighted_pick():
    sc = Scene()
    sc.add(_light_quad(5.0, 2.0, 1.0))  # area 16
    sc.add(_light_quad(9.0, 1.0, 2.0, offset=(10.0, 0.0)))  # area 4
    pack = sc.compile()
    key = jax.random.key(1)
    u = jax.random.uniform(key, (20000, 4))
    ls = sample_light(pack, u)
    frac_small = float((np.asarray(ls.p)[:, 1] > 7.0).mean())
    assert abs(frac_small - 0.2) < 0.02  # 4 / (16+4)
    # pdf is 1/owning-mesh-area (reference quirk): 1/4 for the small light.
    pdfs = np.asarray(ls.pdf)
    small = np.asarray(ls.p)[:, 1] > 7.0
    np.testing.assert_allclose(pdfs[small], 0.25, rtol=1e-5)
    np.testing.assert_allclose(pdfs[~small], 1.0 / 16.0, rtol=1e-5)


def test_env_constant_and_bilinear():
    sc = Scene()
    sc.add(_light_quad(5.0, 1.0, 1.0))
    sc.set_background((0.2, 0.4, 0.6))
    pack = sc.compile()
    dirs = jnp.array([[0, 1, 0], [1, 0, 0], [0, -1, 0]], jnp.float32)
    out = np.asarray(sample_env(pack, dirs))
    np.testing.assert_allclose(out, [[0.2, 0.4, 0.6]] * 3, atol=1e-6)

    # 2x4 gradient map: verify exact texel fetch at texel centers.
    sc.env_pixels = np.arange(2 * 4 * 3, dtype=np.float32).reshape(2, 4, 3) / 24.0
    pack2 = sc.compile()
    # dir +y -> theta=0 -> v=0 -> y=-0.5 -> clamped row 0; phi from x axis.
    up = np.asarray(sample_env(pack2, jnp.array([[0.0, 1.0, 0.0]])))
    assert up.shape == (1, 3)
    # Horizontal dir (0,0,-1): phi=atan2(-1,0)=-pi/2 -> u=0.25 -> x=0.5
    # v=0.5 -> y=0.5 -> row interp between rows 0,1 at sy=0.5, cols 0,1 sx=.5.
    h = np.asarray(sample_env(pack2, jnp.array([[0.0, 0.0, -1.0]])))
    manual = (
        sc.env_pixels[0, 0] + sc.env_pixels[0, 1] + sc.env_pixels[1, 0] + sc.env_pixels[1, 1]
    ) / 4.0
    np.testing.assert_allclose(h[0], manual, atol=1e-6)


def test_env_longitude_wrap():
    sc = Scene()
    sc.add(_light_quad(5.0, 1.0, 1.0))
    sc.env_pixels = np.random.default_rng(0).uniform(size=(8, 16, 3)).astype(np.float32)
    pack = sc.compile()
    # phi = pi (dir -x): u=1 -> wraps to column 0 boundary; just check finite
    # and within [min, max] of the map.
    out = np.asarray(sample_env(pack, jnp.array([[-1.0, 0.0, 0.0]])))
    assert np.isfinite(out).all()
    assert (out >= sc.env_pixels.min() - 1e-6).all()
    assert (out <= sc.env_pixels.max() + 1e-6).all()
