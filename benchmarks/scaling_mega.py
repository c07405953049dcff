"""Simulated multi-chip scaling for the MEGAKERNEL path.

Real multi-chip hardware is not available in this image, so this measures
the two quantities that determine scaling efficiency of the data-parallel
sharded render (render_mega_sharded) on the 8-virtual-CPU mesh — paths are
independent, the only collective is the final framebuffer gather, so
efficiency = work_balance x (1 - padding_overhead):

1. WORK BALANCE: per-device traced-ray totals from an actual sharded render
   (small image, interpret mode). Device d owns a contiguous lane range, so
   imbalance reflects real scene structure (sky rows terminate early,
   interior rows bounce).
2. LANE ROUND-UP: per-device lanes round to CHUNK (=1024); pad lanes trace
   wrapped-pixel work. Reported analytically for 1080p across mesh sizes.

  python -m benchmarks.scaling_mega [--width 192] [--height 108] [--spp 2]

Prints JSON lines; results recorded in PERF.md.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=192)
    ap.add_argument("--height", type=int, default=108)
    ap.add_argument("--spp", type=int, default=2)
    ap.add_argument("--max-bounces", type=int, default=6)
    args = ap.parse_args()

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )
    import dataclasses

    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from mcpt_tpu.builtin_scenes import demo_scene
    from mcpt_tpu.kernels.megakernel import CHUNK, render_mega_sharded

    sc = demo_scene()
    pack = sc.compile()
    cam = dataclasses.replace(sc.camera, width=args.width, height=args.height)

    for nd in (2, 4, 8):
        devs = jax.devices()[:nd]
        _, st = render_mega_sharded(
            pack, cam, args.spp, seed=0, max_bounces=args.max_bounces,
            interpret=True, devices=devs,
        )
        pr = np.asarray(st["per_device_rays"], np.float64)
        balance = float(pr.mean() / pr.max())
        print(
            json.dumps(
                {
                    "metric": "mega_sharded_work_balance",
                    "devices": nd,
                    "per_device_rays": [int(x) for x in pr],
                    "balance_eff": round(balance, 4),
                    "pad_lanes": st["pad_lanes"],
                }
            ),
            flush=True,
        )

    # analytic lane round-up at 1080p (and the small size above)
    for w, h in ((args.width, args.height), (1920, 1080)):
        lanes = w * h * 3
        row = {"metric": "mega_sharded_lane_padding", "size": f"{w}x{h}"}
        for nd in (2, 4, 8, 16, 64, 256):
            per_dev = -(-lanes // (nd * CHUNK)) * CHUNK
            row[f"nd{nd}"] = round(nd * per_dev / lanes - 1.0, 5)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
