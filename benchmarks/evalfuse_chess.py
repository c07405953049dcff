"""A/B the select-before-compute BSDF eval (megakernel._EVAL_FUSED).

The r5-final eval fusion replaces two half-vector normalizes and two full
unpolarized Fresnel evaluations per `_eval_bsdf` call with one of each by
selecting the candidate (reflect/refract, rough/smooth) BEFORE the
expensive math — bitwise-identical output (verified by image hash on CPU),
pure op-count reduction in the block that runs 5x per path vertex (4 NEE
evals + 1 bounce eval). This measures it with the interleaved-median
methodology (host/TPU drift is ~10% between minutes, so back-to-back
per-variant timing is unusable for <10% deltas).

  python -m benchmarks.evalfuse_chess --spp 256 --reps 3          # clustered
  python -m benchmarks.evalfuse_chess --demo --spp 512 --reps 3   # SMEM demo
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=256)
    ap.add_argument("--width", type=int, default=960)
    ap.add_argument("--height", type=int, default=540)
    ap.add_argument("--mb", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument(
        "--demo", action="store_true",
        help="measure the SMEM demo Cornell scene instead of the clustered "
        "chessboard (1080p unless --width/--height given)",
    )
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mcpt_tpu.kernels import megakernel as mk

    if args.demo:
        from mcpt_tpu.builtin_scenes import demo_scene

        sc = demo_scene()
        w = args.width if args.width != 960 else 1920
        h = args.height if args.height != 540 else 1080
        cam = dataclasses.replace(sc.camera, width=w, height=h)
    else:
        from benchmarks.chessboard import MODELS, chessboard_conf
        from mcpt_tpu.config import build_scene

        conf = chessboard_conf("dark", args.width, args.height, args.spp)
        sc, _ = build_scene(conf, models_dir=MODELS)
        cam = sc.camera
    pack = sc.compile()

    variants = [True, False]
    times = {v: [] for v in variants}
    for rep in range(args.reps):
        for v in variants:
            mk._EVAL_FUSED = v
            if rep == 0:  # warm the XLA/Mosaic cache for this variant
                mk.render_mega(pack, cam, args.spp, seed=0, max_bounces=args.mb)
            t0 = time.monotonic()
            _, stats = mk.render_mega(
                pack, cam, args.spp, seed=1 + rep, max_bounces=args.mb
            )
            dt = time.monotonic() - t0
            times[v].append(dt)
            print(
                json.dumps(
                    {"metric": "evalfuse", "fused": v, "rep": rep,
                     "elapsed_s": round(dt, 3),
                     "rays_per_s": round(stats["rays_per_s"], 1)}
                ),
                flush=True,
            )
    mk._EVAL_FUSED = True
    meds = {}
    for v in variants:
        meds[v] = sorted(times[v])[args.reps // 2]
        print(
            json.dumps(
                {"metric": "evalfuse_median", "fused": v,
                 "median_s": round(meds[v], 3),
                 "spread_pct": round(
                     100.0 * (max(times[v]) - min(times[v])) / meds[v], 1)}
            ),
            flush=True,
        )
    print(
        json.dumps(
            {"metric": "evalfuse_speedup",
             "value": round(meds[False] / meds[True], 4)}
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
