"""Headline benchmark: Cornell-box scene at 1080p on one chip.

Prints ONE JSON line:
  {"metric": "rays_per_s", "value": N, "unit": "rays/s", "vs_baseline": R}

Baseline derivation (BASELINE.md): the reference renders the 1080p chessboard
scene in 2h at spp=2048 with RR=0.4 and 4 NEE samples per vertex
(README.md:19-22; Scene.hpp:28; conf.json:24), i.e.
1920*1080*2048*3 ≈ 1.274e10 wavelength-paths / 7200 s ≈ 1.77e6 paths/s.
Each path traces 1 primary ray plus, per vertex (mean path length
1/(1-0.4) ≈ 1.667), 4 shadow rays and (if RR survives, p=0.4) 1 bounce ray:
rays/path ≈ 1 + 1.667*4 + 0.667 ≈ 8.33  →  baseline ≈ 1.48e7 rays/s.

We count rays identically on our side (PathStats.rays: primary + 4 shadow +
1 bounce per vertex) and render the DEMO Cornell-box scene (all four material
classes, mesh + sphere primitives; main.cpp:99-129) at 1920x1080 — the
driver's metric scene ("rays/s/chip at 1080p Cornell box").

Env knobs: BENCH_SPP (default 4), BENCH_TILE (default 116 rows),
BENCH_METHOD (default auto).
"""

import json
import os
import time

BASELINE_RAYS_PER_S = 1.48e7


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from mcpt_tpu.builtin_scenes import demo_scene
    from mcpt_tpu.render import _render_tile

    spp = int(os.environ.get("BENCH_SPP", "4"))
    rows = int(os.environ.get("BENCH_TILE", "116"))
    method = os.environ.get("BENCH_METHOD", "auto")
    width, height = 1920, 1080
    max_bounces = 8

    sc = demo_scene()
    pack = sc.compile()
    cam = dataclasses.replace(sc.camera, width=width, height=height)
    tile_pixels = rows * width
    n_tiles = (width * height + tile_pixels - 1) // tile_pixels
    key = jax.random.key(0)

    # Warmup/compile on the first tile.
    ids0 = jnp.arange(tile_pixels, dtype=jnp.int32)
    fb, rays = _render_tile(pack, cam, ids0, key, spp, max_bounces, method)
    fb.block_until_ready()

    total_rays = 0
    t0 = time.monotonic()
    for tile in range(n_tiles):
        lo = tile * tile_pixels
        ids = jnp.minimum(
            jnp.arange(lo, lo + tile_pixels, dtype=jnp.int32), width * height - 1
        )
        fb, rays = _render_tile(
            pack, cam, ids, jax.random.fold_in(key, tile), spp, max_bounces, method
        )
        total_rays += int(rays)
    fb.block_until_ready()
    elapsed = time.monotonic() - t0

    rays_per_s = total_rays / elapsed
    print(
        json.dumps(
            {
                "metric": "rays_per_s",
                "value": round(rays_per_s, 1),
                "unit": "rays/s",
                "vs_baseline": round(rays_per_s / BASELINE_RAYS_PER_S, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
