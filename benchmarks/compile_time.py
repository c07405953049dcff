"""Megakernel Mosaic compile-time harness.

The kernel's compile time is independent of image size (one block shape),
so a tiny render exercises the same compile as the 1080p bench. Run with
the persistent cache DISABLED to measure a cold compile:

    python benchmarks/compile_time.py [--spp 4] [--mb 8] [--regen 1]

Prints compile seconds + a tiny-render time. Used to track VERDICT r2
item 5 (compile-time diet: target < 180 s cold).
"""

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--mb", type=int, default=8)
    ap.add_argument("--regen", type=int, default=1)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--cache", type=int, default=0, help="1 = allow cache")
    args = ap.parse_args()

    import jax

    if args.cache:
        jax.config.update("jax_compilation_cache_dir", ".jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mcpt_tpu.builtin_scenes import demo_scene
    from mcpt_tpu.kernels.megakernel import CHUNK, trace_mega_block

    sc = demo_scene()
    pack = sc.compile()
    cam = dataclasses.replace(sc.camera, width=args.size, height=args.size)
    lanes = -(-(args.size * args.size * 3) // CHUNK) * CHUNK

    t0 = time.monotonic()
    r, rays, _ = trace_mega_block(
        pack, cam, 0, 0, args.spp, lanes, args.mb, False, bool(args.regen),
        True,
    )
    jax.block_until_ready((r, rays))
    t_compile = time.monotonic() - t0
    t0 = time.monotonic()
    r, rays, _ = trace_mega_block(
        pack, cam, 1, 0, args.spp, lanes, args.mb, False, bool(args.regen),
        True,
    )
    jax.block_until_ready((r, rays))
    t_run = time.monotonic() - t0
    print(
        f"compile+first-run: {t_compile:.1f}s  warm-run: {t_run*1e3:.1f}ms  "
        f"(size={args.size} spp={args.spp} mb={args.mb} regen={args.regen})"
    )


if __name__ == "__main__":
    main()
