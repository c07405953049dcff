"""Camera model and primary-ray generation.

LookAt basis per the reference `src/Camera.hpp:17-24` (columns = left, up,
forward with left = up x forward — note the mirrored x that pairs with the
``1 - 2(i+u)/w`` screen mapping of `src/Renderer.cpp:47,67`), pinhole and
thin-lens depth-of-field sampling per `src/Renderer.cpp:44-76`.

Ray generation is fully batched: given flat pixel ids and a PRNG key it emits
(B, 3) origins and directions in one fused computation — this replaces the
reference's per-pixel scalar loop.
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class Camera:
    """Immutable & hashable so it can be a static jit argument (ray-generation
    code specializes on resolution and the DoF toggle). Update with
    ``dataclasses.replace``. Defaults per Camera.hpp:10-16."""

    width: int = 1280
    height: int = 960
    fov: float = 40.0
    position: tuple = (0.0, 0.0, 0.0)
    target: tuple = (0.0, 0.0, 1.0)
    up: tuple = (0.0, 1.0, 0.0)
    use_dof: bool = False
    focal_distance: float = 100.0
    aperture_radius: float = 5.0

    def __post_init__(self):
        object.__setattr__(self, "position", tuple(float(x) for x in self.position))
        object.__setattr__(self, "target", tuple(float(x) for x in self.target))
        object.__setattr__(self, "up", tuple(float(x) for x in self.up))

    def orientation(self) -> np.ndarray:
        """3x3 with columns (left, up', forward); Camera.hpp:17-24."""
        pos = np.asarray(self.position, dtype=np.float64)
        target = np.asarray(self.target, dtype=np.float64)
        up = np.asarray(self.up, dtype=np.float64)
        forward = target - pos
        forward = forward / np.linalg.norm(forward)
        left = np.cross(up, forward)
        left = left / np.linalg.norm(left)
        new_up = np.cross(forward, left)
        new_up = new_up / np.linalg.norm(new_up)
        return np.stack([left, new_up, forward], axis=1).astype(np.float32)


def generate_rays_c(camera: Camera, pixel_ids, key):
    """Primary rays for flat pixel indices ``m`` (row-major, i=m%W, j=m//W).

    Component form (the hot path): returns (o, d) as 3-tuples of (B,)
    arrays; directions are unit length. Sampling matches Renderer.cpp:44-76:
    uniform jitter within the pixel, and for DoF a concentric aperture-disk
    sample r=R*sqrt(u), th=2*pi*u with the focal point at
    ``(x, y, 1) * focal_distance`` in camera space.
    """
    w, h = camera.width, camera.height
    scale = jnp.float32(np.tan(np.deg2rad(camera.fov * 0.5)))
    aspect = jnp.float32(w / float(h))
    om = camera.orientation()  # 3x3 numpy; entries become jit constants

    i = (pixel_ids % w).astype(jnp.float32)
    j = (pixel_ids // w).astype(jnp.float32)
    b = pixel_ids.shape[0]
    u = jax.random.uniform(key, (b, 4), dtype=jnp.float32)

    x = (1.0 - 2.0 * (i + u[:, 0]) / w) * aspect * scale
    y = (1.0 - 2.0 * (j + u[:, 1]) / h) * scale
    one = jnp.ones_like(x)

    def rot(v):
        """orientation @ v, componentwise with scalar constants."""
        return (
            om[0, 0] * v[0] + om[0, 1] * v[1] + om[0, 2] * v[2],
            om[1, 0] * v[0] + om[1, 1] * v[1] + om[1, 2] * v[2],
            om[2, 0] * v[0] + om[2, 1] * v[1] + om[2, 2] * v[2],
        )

    if camera.use_dof:
        fd = jnp.float32(camera.focal_distance)
        r = jnp.float32(camera.aperture_radius) * jnp.sqrt(u[:, 2])
        theta = 2.0 * jnp.pi * u[:, 3]
        dx = r * jnp.cos(theta)
        dy = r * jnp.sin(theta)
        lens = (dx, dy, jnp.zeros_like(dx))
        lens_w = rot(lens)
        origins = tuple(
            jnp.float32(camera.position[k]) + lens_w[k] for k in range(3)
        )
        dirs = (x * fd - dx, y * fd - dy, one * fd)
    else:
        dirs = (x, y, one)
        origins = tuple(
            jnp.broadcast_to(jnp.float32(camera.position[k]), x.shape)
            for k in range(3)
        )
    inv = 1.0 / jnp.sqrt(dirs[0] ** 2 + dirs[1] ** 2 + dirs[2] ** 2)
    dirs = (dirs[0] * inv, dirs[1] * inv, dirs[2] * inv)
    # World-space direction: orientation * dir (Renderer.cpp:76).
    return origins, rot(dirs)


def generate_rays(camera: Camera, pixel_ids, key):
    """(B, 3)-row wrapper over `generate_rays_c` (tests/back-compat)."""
    o, d = generate_rays_c(camera, pixel_ids, key)
    return jnp.stack(o, axis=-1), jnp.stack(d, axis=-1)
