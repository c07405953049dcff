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
    ap.add_argument(
        "--splits", default="",
        help="interleave-sweep MCPT_MEGA_SPLIT at the FIRST --unrolls value "
        "(e.g. --unrolls 4 --splits 1,2); overrides --split",
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
    if args.splits:
        points = [(unrolls[0], int(s)) for s in args.splits.split(",")]
    else:
        points = [(u, args.split) for u in unrolls]
    times = {p: [] for p in points}
    for rep in range(args.reps):
        for u, s in points:
            os.environ["MCPT_MEGA_UNROLL"] = str(u)
            if s:
                os.environ["MCPT_MEGA_SPLIT"] = str(s)
            if rep == 0:
                mk.render_mega(
                    pack, sc.camera, args.spp, seed=0, max_bounces=args.mb
                )
            t0 = time.monotonic()
            _, stats = mk.render_mega(
                pack, sc.camera, args.spp, seed=1 + rep, max_bounces=args.mb
            )
            dt = time.monotonic() - t0
            times[(u, s)].append(dt)
            print(
                json.dumps(
                    {"metric": "chess_unroll", "unroll": u, "split": s,
                     "rep": rep, "elapsed_s": round(dt, 3),
                     "rays_per_s": round(stats["rays_per_s"], 1)}
                ),
                flush=True,
            )
    for u, s in points:
        t = times[(u, s)]
        med = sorted(t)[args.reps // 2]
        print(
            json.dumps(
                {"metric": "chess_unroll_median", "unroll": u, "split": s,
                 "median_s": round(med, 3),
                 "spread_pct": round(100.0 * (max(t) - min(t)) / med, 1)}
            ),
            flush=True,
        )
    os.environ.pop("MCPT_MEGA_UNROLL", None)
    os.environ.pop("MCPT_MEGA_SPLIT", None)


if __name__ == "__main__":
    main()
