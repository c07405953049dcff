"""Hardware attribution for the CLUSTERED chessboard megakernel.

benchmarks/ablate_mega.py attributes the SMEM demo kernel (fan 23% /
nearest 24% / shading 16% / framework 29%, r4); this probe answers the same
question for the flagship chessboard scene (38.5k tris, clustered-BVH
walks), where the cost structure is completely different: the two tree
walks (nearest-hit `cluster_query_chunk` + shadow-fan
`cluster_occlude_fan`) dominate, not the SMEM table sweeps.

Method: 960x540 spp=16 dark renders (~200M rays, ~15 s each at r4 rates),
one timed render per variant after a warm-up compile render. Variants stub
components via MCPT_MEGA_ABLATE (wrong images — timings only) or drop the
fan via includeShadow=False:

  control        full kernel
  isect          both walks stubbed (constant hit)   -> walk total
  noshadow       includeShadow=False                 -> fan walk + NEE shade
  shading        nee_eval,mat,mfn,bounce_eval        -> GGX/material eval

Run: python -m benchmarks.ablate_chess [--spp 16] [--width 960]
Prints one JSON line per variant; deltas vs control are the attribution.
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
    ap.add_argument("--spp", type=int, default=16)
    ap.add_argument("--width", type=int, default=960)
    ap.add_argument("--height", type=int, default=540)
    ap.add_argument("--mb", type=int, default=8)
    ap.add_argument(
        "--variants", default="control,isect,noshadow,shading",
        help="comma list from {control,isect,noshadow,shading,unmerged,"
        "novisfan,pair2x,neeval}",
    )
    ap.add_argument(
        "--reps", type=int, default=1,
        help="timed renders per variant, ROUND-ROBIN interleaved across "
        "variants (median reported): the host/TPU environment drifts by "
        "~10%% between minutes, so back-to-back per-variant timing is "
        "unusable for <10%% deltas",
    )
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from benchmarks.chessboard import MODELS, chessboard_conf
    from mcpt_tpu.config import build_scene

    def build(shadow=True):
        conf = chessboard_conf("dark", args.width, args.height, args.spp)
        if not shadow:
            conf["scene"]["includeShadow"] = False
        sc, _ = build_scene(conf, models_dir=MODELS)
        return sc, sc.compile()

    sc, pack = build()
    ABLATE = {
        "control": "",
        "isect": "isect",
        "noshadow": "",
        "shading": "nee_eval,mat,mfn,bounce_eval",
        "unmerged": "unmerged",
        # clean probes (identical path structure, only radiance wrong):
        "novisfan": "novisfan",  # fan walk skipped -> delta = fan cost
        "pair2x": "pair2x",  # fan+nearest walk doubled -> delta = walk cost
        "neeval": "nee_eval",  # NEE BSDF eval stubbed -> delta = NEE shading
    }
    from mcpt_tpu.kernels import megakernel as mk

    variants = args.variants.split(",")
    packs = {
        v: (pack if v != "noshadow" else build(shadow=False)[1])
        for v in variants
    }
    times = {v: [] for v in variants}
    for rep in range(args.reps):
        for variant in variants:
            os.environ["MCPT_MEGA_ABLATE"] = ABLATE[variant]
            p = packs[variant]
            if rep == 0:  # warm compile (cached from rep 0 onwards)
                mk.render_mega(
                    p, sc.camera, args.spp, seed=0, max_bounces=args.mb
                )
            t0 = time.monotonic()
            _, stats = mk.render_mega(
                p, sc.camera, args.spp, seed=1 + rep, max_bounces=args.mb
            )
            dt = time.monotonic() - t0
            times[variant].append(dt)
            print(
                json.dumps(
                    {
                        "metric": "chess_ablate",
                        "variant": variant,
                        "rep": rep,
                        "elapsed_s": round(dt, 3),
                        "rays_per_s": round(stats["rays_per_s"], 1),
                    }
                ),
                flush=True,
            )
    ctrl = sorted(times["control"])[args.reps // 2] if "control" in times \
        else None
    for variant in variants:
        med = sorted(times[variant])[args.reps // 2]
        print(
            json.dumps(
                {
                    "metric": "chess_ablate_median",
                    "variant": variant,
                    "median_s": round(med, 3),
                    "spread_pct": round(
                        100.0
                        * (max(times[variant]) - min(times[variant]))
                        / med,
                        1,
                    ),
                    "delta_vs_control_pct": (
                        round(100.0 * (ctrl - med) / ctrl, 1)
                        if ctrl is not None else None
                    ),
                }
            ),
            flush=True,
        )
    os.environ.pop("MCPT_MEGA_ABLATE", None)


if __name__ == "__main__":
    main()
