"""Clustered-kernel unroll/stream sweep (flagship chessboard).

The r5 clean probes (ablate_chess --variants control,novisfan,pair2x)
showed the cluster walks cost ~0% — the kernel is bound by per-vertex
VPU math + per-iteration framework, so the demo kernel's framework-
amortization levers (deeper unroll, interleave slots) apply here after
all. This sweeps MCPT_MEGA_UNROLL (and optionally MCPT_MEGA_STREAMS)
with the interleaved-median methodology.

  python -m benchmarks.unroll_chess --spp 256 --reps 3 --unrolls 2,4,8
"""

import argparse
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
    ap.add_argument("--unrolls", default="2,4,8")
    ap.add_argument(
        "--split", type=int, default=0,
        help="MCPT_MEGA_SPLIT for every point (0 = leave default)",
    )
    args = ap.parse_args()
    if args.split:
        os.environ["MCPT_MEGA_SPLIT"] = str(args.split)

    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from benchmarks.chessboard import MODELS, chessboard_conf
    from mcpt_tpu.config import build_scene
    from mcpt_tpu.kernels import megakernel as mk

    conf = chessboard_conf("dark", args.width, args.height, args.spp)
    sc, _ = build_scene(conf, models_dir=MODELS)
    pack = sc.compile()

    unrolls = [int(u) for u in args.unrolls.split(",")]
    times = {u: [] for u in unrolls}
    for rep in range(args.reps):
        for u in unrolls:
            os.environ["MCPT_MEGA_UNROLL"] = str(u)
            if rep == 0:
                mk.render_mega(
                    pack, sc.camera, args.spp, seed=0, max_bounces=args.mb
                )
            t0 = time.monotonic()
            _, stats = mk.render_mega(
                pack, sc.camera, args.spp, seed=1 + rep, max_bounces=args.mb
            )
            dt = time.monotonic() - t0
            times[u].append(dt)
            print(
                json.dumps(
                    {"metric": "chess_unroll", "unroll": u, "rep": rep,
                     "elapsed_s": round(dt, 3),
                     "rays_per_s": round(stats["rays_per_s"], 1)}
                ),
                flush=True,
            )
    for u in unrolls:
        med = sorted(times[u])[args.reps // 2]
        print(
            json.dumps(
                {"metric": "chess_unroll_median", "unroll": u,
                 "median_s": round(med, 3),
                 "spread_pct": round(
                     100.0 * (max(times[u]) - min(times[u])) / med, 1)}
            ),
            flush=True,
        )
    os.environ.pop("MCPT_MEGA_UNROLL", None)


if __name__ == "__main__":
    main()
