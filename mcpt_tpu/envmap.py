"""Equirectangular environment map sampling.

Reference: `src/Scene.hpp:60-99` — spherical direction→UV with longitude wrap
and latitude clamp, bilinear filtering, constant background fallback on
ray miss (`src/Scene.cpp:88-95`). Fully batched gather; the map is replicated
per device (it is small relative to HBM).
"""

import jax.numpy as jnp

from mcpt_tpu.utils.vec import safe_normalize


def sample_env(pack, dirs):
    """(B,3) RGB radiance for directions (B,3)."""
    if not pack.use_env:
        return jnp.broadcast_to(pack.background, dirs.shape)
    h, w = pack.env_pixels.shape[:2]
    d = safe_normalize(dirs)
    phi = jnp.arctan2(d[:, 2], d[:, 0])
    theta = jnp.arccos(jnp.clip(d[:, 1], -1.0, 1.0))
    u = (phi + jnp.pi) / (2.0 * jnp.pi)
    v = theta / jnp.pi
    u = u - jnp.floor(u)
    v = jnp.clip(v, 0.0, 1.0)
    x = u * w - 0.5
    y = v * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    sx = (x - x0)[:, None]
    sy = (y - y0)[:, None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x0w = jnp.mod(x0i, w)
    x1w = jnp.mod(x0i + 1, w)
    y0c = jnp.clip(y0i, 0, h - 1)
    y1c = jnp.clip(y0i + 1, 0, h - 1)
    c00 = pack.env_pixels[y0c, x0w]
    c10 = pack.env_pixels[y0c, x1w]
    c01 = pack.env_pixels[y1c, x0w]
    c11 = pack.env_pixels[y1c, x1w]
    c0 = c00 * (1.0 - sx) + c10 * sx
    c1 = c01 * (1.0 - sx) + c11 * sx
    return c0 * (1.0 - sy) + c1 * sy
