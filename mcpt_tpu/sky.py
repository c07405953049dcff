"""Procedural equirectangular sky generator.

The reference's `models/envoMaps/sky.png` is absent from the public mount
(`.MISSING_LARGE_BLOBS`), so the "sky" configs need a stand-in equirect
environment map (SURVEY.md §7 hard-part 6). This synthesizes a plausible
clear-sky: horizon-to-zenith gradient, sun disk with glow, ground haze.

    python -m mcpt_tpu.sky assets/sky.png [width]
"""

import sys

import numpy as np


def generate_sky(
    width: int = 1024,
    height: int = 512,
    sun_dir=(0.35, 0.45, 0.6),
    zenith=(0.18, 0.38, 0.78),
    horizon=(0.78, 0.87, 0.98),
    ground=(0.25, 0.22, 0.20),
    sun_intensity: float = 18.0,
) -> np.ndarray:
    """(H, W, 3) float32 linear radiance in [0, ~sun_intensity]."""
    sd = np.asarray(sun_dir, np.float64)
    sd = sd / np.linalg.norm(sd)
    v = (np.arange(height) + 0.5) / height  # theta/pi
    u = (np.arange(width) + 0.5) / width  # (phi+pi)/2pi
    theta = v * np.pi
    phi = u * 2 * np.pi - np.pi
    st = np.sin(theta)[:, None]
    y = np.cos(theta)[:, None] * np.ones((1, width))
    x = st * np.cos(phi)[None, :]
    z = st * np.sin(phi)[None, :]

    up = np.clip(y, 0.0, 1.0)
    sky = (
        np.asarray(zenith)[None, None, :] * (up**0.7)[:, :, None]
        + np.asarray(horizon)[None, None, :] * (1 - up**0.7)[:, :, None]
    )
    below = y < 0
    g = np.asarray(ground)[None, None, :] * (1 + 0.5 * y)[:, :, None]
    img = np.where(below[:, :, None], g, sky)

    cos_sun = x * sd[0] + y * sd[1] + z * sd[2]
    disk = np.clip((cos_sun - 0.9995) / 0.0005, 0.0, 1.0)
    glow = np.clip(cos_sun, 0.0, 1.0) ** 350
    img = img + (sun_intensity * disk + 1.5 * glow)[:, :, None] * np.array(
        [1.0, 0.95, 0.85]
    )
    return img.astype(np.float32)


def write_sky_png(path, width: int = 1024) -> None:
    """Tonemapped 8-bit PNG (the reference env loader reads 8-bit PNGs and
    maps to [0,1], Scene.hpp:49-56; intensity >1 is lost, as it would be for
    any PNG map the reference loaded)."""
    from mcpt_tpu.io.png import write_png

    img = generate_sky(width, width // 2)
    out = np.clip(img * 255.0, 0, 255).astype(np.uint8)  # sun saturates
    write_png(path, out)


if __name__ == "__main__":
    path = sys.argv[1] if len(sys.argv) > 1 else "sky.png"
    width = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    write_sky_png(path, width)
    print(f"wrote {path}")
