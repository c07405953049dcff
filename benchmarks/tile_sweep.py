"""Chunk-tile-shape sweep on the clustered chessboard scene (perf probe).

Renders the dark chessboard at reduced spp once per MCPT_MEGA_TILE shape
(0 = scanline order) and prints one JSON line per shape. All shapes produce
bitwise-identical images (checked for the first pair) — this only measures
the ray-coherence effect on the cluster walk.

  BENCH_SPP (default 16), BENCH_W/H (default 1920x1080), TILE_SHAPES
  (comma list, default "0,16x32,8x64,32x16,16x64")
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from benchmarks.chessboard import MODELS, chessboard_conf


def main():
    import jax

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(repo, ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mcpt_tpu.config import build_scene
    from mcpt_tpu.kernels.megakernel import render_mega

    spp = int(os.environ.get("BENCH_SPP", "16"))
    w = int(os.environ.get("BENCH_W", "1920"))
    h = int(os.environ.get("BENCH_H", "1080"))
    shapes = os.environ.get(
        "TILE_SHAPES", "0,16x32,8x64,32x16,16x64"
    ).split(",")

    conf = chessboard_conf("dark", w, h, spp)
    sc, _ = build_scene(conf, models_dir=MODELS)
    pack = sc.compile()

    ref_img = None
    for shape in shapes:
        os.environ["MCPT_MEGA_TILE"] = shape
        t0 = time.monotonic()
        render_mega(pack, sc.camera, spp, seed=7, max_bounces=8)
        warm = time.monotonic() - t0
        img, stats = render_mega(pack, sc.camera, spp, seed=0, max_bounces=8)
        if ref_img is None:
            ref_img = img
        print(
            json.dumps(
                {
                    "tile": shape,
                    "elapsed_s": round(stats["elapsed_s"], 2),
                    "rays_per_s": round(stats["rays_per_s"], 1),
                    "warmup_s": round(warm, 1),
                    "bitwise_equal_first": bool(np.array_equal(ref_img, img)),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
