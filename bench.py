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

We count rays identically (primary + per-vertex 1 bounce + 4 shadow) and
render the DEMO Cornell-box scene (all four material classes, mesh + sphere
primitives; main.cpp:99-129) at 1920x1080 — the driver's metric scene
("rays/s/chip at 1080p Cornell box").

The render runs through the path-regeneration megakernel
(mcpt_tpu/kernels/megakernel.py): the full path tracer in one Pallas kernel
per ~1M-lane block, so the timed section is 6 dispatches regardless of spp.
A full warmup render (different seed) is excluded from the timing; the
compile happens once (all blocks share one shape).

Env knobs: BENCH_SPP (default 2048 — the reference's own headline configs
are spp=2048, and higher spp keeps lanes at full occupancy longer: the r5
sweep measured +10% from 256 -> 512, +1-5% 512 -> 1024, +6% 1024 -> 2048
with the 4-way interleave), BENCH_MB (max bounces, default 8).
Fallback: MCPT_BENCH_WAVEFRONT=1 times the tile-based wavefront path instead.
"""

import json
import os
import sys
import time

BASELINE_RAYS_PER_S = 1.48e7


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import dataclasses

    import jax

    # Persistent compilation cache: the megakernel's Mosaic compile is
    # minutes-long; cache it across bench invocations (repo-local dir).
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception as e:  # cache is an optimization, never fatal
        log(f"compilation cache unavailable: {e}")

    from mcpt_tpu.builtin_scenes import demo_scene

    spp = int(os.environ.get("BENCH_SPP", "2048"))
    max_bounces = int(os.environ.get("BENCH_MB", "8"))
    width, height = 1920, 1080

    sc = demo_scene()
    pack = sc.compile()
    cam = dataclasses.replace(sc.camera, width=width, height=height)
    log(f"bench: backend={jax.default_backend()} spp={spp} mb={max_bounces}")

    if os.environ.get("MCPT_BENCH_WAVEFRONT", "0") == "1":
        from mcpt_tpu.render import render_radiance

        t0 = time.monotonic()
        _, w_stats = render_radiance(pack, cam, spp, key=jax.random.key(0))
        log(f"wavefront render: {time.monotonic() - t0:.1f}s")
        rays_per_s = w_stats["rays_per_s"]
    else:
        from mcpt_tpu.kernels.megakernel import render_mega

        t0 = time.monotonic()
        _, stats = render_mega(
            pack, cam, spp, seed=7, max_bounces=max_bounces
        )
        log(f"warmup (compile + full render): {time.monotonic() - t0:.1f}s")
        # The official number must be robust to chip contention / remote
        # queue noise (BENCH_r03 swung 1.7x on one noisy render): run
        # several timed renders and report the MEDIAN.  Every repeat uses
        # the identical compiled shape, so no recompiles enter the timing.
        n_rep = int(os.environ.get("BENCH_REPEATS", "3"))
        samples = []
        for rep in range(n_rep):
            _, stats = render_mega(
                pack, cam, spp, seed=1 + rep, max_bounces=max_bounces
            )
            samples.append(stats["rays_per_s"])
            log(
                f"timed render {rep + 1}/{n_rep}: {stats['elapsed_s']:.2f}s "
                f"rays={stats['rays']} -> {stats['rays_per_s']:.3e} rays/s"
            )
        samples.sort()
        rays_per_s = samples[len(samples) // 2]
        spread = (samples[-1] - samples[0]) / rays_per_s if rays_per_s else 0.0
        log(
            f"median {rays_per_s:.3e} rays/s  min {samples[0]:.3e}  "
            f"max {samples[-1]:.3e}  spread {100 * spread:.1f}%"
        )

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
