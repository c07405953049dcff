"""Hardware ablation probe for the regen megakernel (perf-debug only).

Renders the DEMO scene once per process with components stubbed out via env
vars, printing one JSON line with the timed wall-clock — the deltas between
variants attribute kernel time to components (images are WRONG for any
non-empty ablation; never use outside perf work). Run each variant in its
own process: the ablate set is baked in at trace time.

  MCPT_MEGA_ABLATE   comma set: mat,mfn,nee_eval,bounce_eval,isect,rng
  MCPT_BENCH_SHADOW  0 disables the NEE occlusion fan
  MCPT_BENCH_NDIR    overrides n_dir_sample (0 = NEE off entirely)
  MCPT_MEGA_UNROLL   iteration unroll factor (default 2)
  BENCH_SPP / BENCH_W / BENCH_H / BENCH_MB

Driver loop: benchmarks/run_ablate.sh (or call this directly).
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache",
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    from mcpt_tpu.builtin_scenes import demo_scene
    from mcpt_tpu.kernels.megakernel import render_mega

    spp = int(os.environ.get("BENCH_SPP", "128"))
    w = int(os.environ.get("BENCH_W", "960"))
    h = int(os.environ.get("BENCH_H", "540"))
    mb = int(os.environ.get("BENCH_MB", "8"))

    sc = demo_scene()
    pack = sc.compile()
    if os.environ.get("MCPT_BENCH_SHADOW", "1") == "0":
        pack = pack.replace(enable_shadow=False)
    ndir = os.environ.get("MCPT_BENCH_NDIR")
    if ndir is not None:
        pack = pack.replace(n_dir_sample=int(ndir))
    cam = dataclasses.replace(sc.camera, width=w, height=h)

    t0 = time.monotonic()
    render_mega(pack, cam, spp, seed=7, max_bounces=mb)
    warm = time.monotonic() - t0
    times = []
    for rep in range(3):
        _, stats = render_mega(pack, cam, spp, seed=1 + rep, max_bounces=mb)
        times.append(stats["elapsed_s"])
    times.sort()
    print(
        json.dumps(
            {
                "variant": {
                    k: os.environ.get(k, "")
                    for k in (
                        "MCPT_MEGA_ABLATE",
                        "MCPT_BENCH_SHADOW",
                        "MCPT_BENCH_NDIR",
                        "MCPT_MEGA_UNROLL",
                    )
                },
                "elapsed_median_s": round(times[1], 3),
                "elapsed_all": [round(t, 3) for t in times],
                "warmup_s": round(warm, 1),
                "spp": spp,
                "size": [w, h],
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
