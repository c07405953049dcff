"""Camera basis and primary-ray generation (Renderer.cpp:44-76 semantics)."""

import jax
import jax.numpy as jnp
import numpy as np

from mcpt_tpu.camera import Camera, generate_rays


def test_lookat_orthonormal_and_mirrored_x():
    cam = Camera(position=(278, 273, -800), target=(278, 273, 0), up=(0, 1, 0))
    o = cam.orientation()
    np.testing.assert_allclose(o.T @ o, np.eye(3), atol=1e-6)
    # forward = +z, left = up x forward = (1,0,0)... for up=(0,1,0), fwd=(0,0,1):
    np.testing.assert_allclose(o[:, 2], [0, 0, 1], atol=1e-6)
    np.testing.assert_allclose(o[:, 0], [1, 0, 0], atol=1e-6)


def test_center_pixel_points_forward():
    cam = Camera(width=101, height=101, fov=40,
                 position=(0, 0, 0), target=(0, 0, 10))
    ids = jnp.array([50 * 101 + 50], jnp.int32)
    o, d = generate_rays(cam, ids, jax.random.key(0))
    d = np.asarray(d)[0]
    assert d[2] > 0.99  # nearly forward
    np.testing.assert_allclose(np.asarray(o)[0], 0.0, atol=1e-6)


def test_screen_mapping_mirror():
    """x = (1-2(i+u)/w)*aspect*tan — pixel i=0 maps to +x (mirrored)."""
    cam = Camera(width=100, height=100, fov=90, position=(0, 0, 0), target=(0, 0, 1))
    ids = jnp.array([0, 99], jnp.int32)  # leftmost and rightmost of row 0
    _, d = generate_rays(cam, ids, jax.random.key(1))
    d = np.asarray(d)
    assert d[0, 0] > 0  # column 0 -> +x in camera space
    assert d[1, 0] < 0


def test_dof_rays_converge_at_focal_plane():
    cam = Camera(
        width=64, height=64, fov=40, position=(0, 0, 0), target=(0, 0, 1),
        use_dof=True, focal_distance=50.0, aperture_radius=2.0,
    )
    ids = jnp.full(512, 32 * 64 + 32, jnp.int32)  # same center pixel
    o, d = generate_rays(cam, ids, jax.random.key(2))
    o, d = np.asarray(o, np.float64), np.asarray(d, np.float64)
    # Origins are spread on the aperture disk.
    spread = np.linalg.norm(o - o.mean(axis=0), axis=1)
    assert spread.max() > 0.5
    # Points at t where the ray crosses z=focal_distance cluster tightly
    # (up to pixel jitter).
    t = (50.0 - o[:, 2]) / d[:, 2]
    pts = o + t[:, None] * d
    assert pts[:, 0].std() < 0.5  # focal blur of one pixel footprint
    assert o[:, 0].std() > 0.5  # much larger than aperture spread


def test_pinhole_deterministic_given_key():
    cam = Camera(width=16, height=16)
    ids = jnp.arange(256, dtype=jnp.int32)
    o1, d1 = generate_rays(cam, ids, jax.random.key(5))
    o2, d2 = generate_rays(cam, ids, jax.random.key(5))
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
