"""Multi-device scaling efficiency benchmark.

Renders the same pixel workload with 1..N devices of the current backend
(real TPU mesh, or virtual CPU devices via
XLA_FLAGS=--xla_force_host_platform_device_count=8) and reports throughput
and efficiency vs 1 device. Lanes are data-parallel; the scene is replicated;
ideal efficiency is ~100% minus the final gather.

  python -m benchmarks.scaling [--pixels 65536] [--spp 4]
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pixels", type=int, default=65536)
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--max-bounces", type=int, default=6)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from mcpt_tpu.builtin_scenes import demo_scene
    from mcpt_tpu.parallel.mesh import make_mesh, replicate_pack, shard_lanes
    from mcpt_tpu.render import _render_tile

    sc = demo_scene()
    pack0 = sc.compile()
    cam = sc.camera
    n_all = len(jax.devices())
    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_all]
    base = None
    for n in sizes:
        mesh = make_mesh(n)
        pack = replicate_pack(pack0, mesh)
        ids = jnp.arange(args.pixels, dtype=jnp.int32) % (cam.width * cam.height)
        ids = shard_lanes(mesh, ids)
        key = jax.random.key(0)
        fb, rays = _render_tile(pack, cam, ids, key, args.spp, args.max_bounces, "auto")
        fb.block_until_ready()
        t0 = time.monotonic()
        reps = 3
        for r in range(reps):
            fb, rays = _render_tile(
                pack, cam, ids, jax.random.fold_in(key, r), args.spp,
                args.max_bounces, "auto",
            )
        fb.block_until_ready()
        dt = (time.monotonic() - t0) / reps
        rps = int(rays) / dt
        if base is None:
            base = rps
        print(
            json.dumps(
                {
                    "devices": n,
                    "rays_per_s": round(rps, 1),
                    "speedup": round(rps / base, 2),
                    "efficiency": round(rps / (base * n), 3),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
