"""Equirectangular environment map sampling.

Reference: `src/Scene.hpp:60-99` — spherical direction→UV with longitude wrap
and latitude clamp, bilinear filtering, constant background fallback on
ray miss (`src/Scene.cpp:88-95`). Fully batched gather; the map is replicated
per device (it is small relative to HBM).
"""

import jax.numpy as jnp

from mcpt_tpu.utils.vec import safe_normalize, safe_normalize3


def sample_env_chan_c(pack, dc, chan):
    """Per-lane single-channel env radiance (component form).

    The integrator traces one wavelength per lane (WaveLen.hpp semantics), so
    it only ever needs `extract(chan, env(d))`; fetching just that channel
    (flat scalar gathers) halves the lookup traffic and removes the (B,3)
    lerp chain + one-hot extract."""
    if not pack.use_env:
        return jnp.where(
            chan == 0,
            pack.background[0],
            jnp.where(chan == 1, pack.background[1], pack.background[2]),
        ) * jnp.ones_like(dc[0])
    h, w = pack.env_pixels.shape[:2]
    d = safe_normalize3(dc)
    phi = jnp.arctan2(d[2], d[0])
    theta = jnp.arccos(jnp.clip(d[1], -1.0, 1.0))
    u = (phi + jnp.pi) / (2.0 * jnp.pi)
    v = theta / jnp.pi
    u = u - jnp.floor(u)
    v = jnp.clip(v, 0.0, 1.0)
    x = u * w - 0.5
    y = v * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    sx = x - x0
    sy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x0w = jnp.mod(x0i, w)
    x1w = jnp.mod(x0i + 1, w)
    y0c = jnp.clip(y0i, 0, h - 1)
    y1c = jnp.clip(y0i + 1, 0, h - 1)
    flat = pack.env_pixels.reshape(-1)
    base00 = (y0c * w + x0w) * 3 + chan
    base10 = (y0c * w + x1w) * 3 + chan
    base01 = (y1c * w + x0w) * 3 + chan
    base11 = (y1c * w + x1w) * 3 + chan
    c00 = flat[base00]
    c10 = flat[base10]
    c01 = flat[base01]
    c11 = flat[base11]
    c0 = c00 * (1.0 - sx) + c10 * sx
    c1 = c01 * (1.0 - sx) + c11 * sx
    return c0 * (1.0 - sy) + c1 * sy


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
