"""Mid-scale cluster-walk sweep (VERDICT r4 item 9).

`pick_leaf_size` (kernels/cluster.py) returns the smallest leaf size whose
node table fits SMEM; the measured endpoints were 38.5k tris (leaf 16
fastest under tile-coherent chunks) and 296k (leaf 64, the only fit). This
sweep fills the middle: chessboard scenes built from the HIGH-quality
soldier mesh (20,480 tris each) with a variable soldier count give ~41k
and ~145k triangle scenes; each renders 960x540 spp=16 dark through the
clustered megakernel at several MCPT_CLUSTER_LEAF values.

One process per (scene, leaf) measurement — the Mosaic kernel is cached
per shape, and leaf changes the tables, so each point recompiles; run via:

  python -m benchmarks.midscale --soldiers 4 --leaf 32

or sweep everything (serial, same process — fine for relative numbers
since each point is its own compile + timed render):

  python -m benchmarks.midscale --sweep
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MODELS = os.environ.get("MCPT_MODELS_DIR", "/root/reference/models")


def midscale_conf(n_soldiers: int, width=960, height=540):
    return {
        "camera": {"width": width, "height": height, "fov": 70,
                   "position": [278, 150, -2550], "target": [278, 0, 0],
                   "useDOF": False},
        "renderer": {"spp": 16},
        "scene": {
            "RussianRouletteRate": 0.4,
            "model_quality": "high",
            "kingMaterial": "gold_conductor",
            "soldierLeftRowPosition": [-559, 0, -200],
            "soldierRightRowPosition": [160, 0, -200],
            "soldierXSpacing": 0.0, "soldierYSpacing": 0.0,
            "soldierZSpacing": -356.0,
            "soldierCountPerRow": n_soldiers,
            "soldierMaterials": (
                ["smooth_glass"] * n_soldiers
                + ["rough_white_conductor"] * n_soldiers
            ),
            "floorMaterial": "silver_mirror", "floor_isTextured": True,
            "lightPosition": [278, 1300, 0], "lightBrightness": 100.0,
            "addDiamond": False,
        },
    }


def measure(n_soldiers: int, leaf: int, spp=16, mb=8):
    if leaf:
        os.environ["MCPT_CLUSTER_LEAF"] = str(leaf)
    else:
        os.environ.pop("MCPT_CLUSTER_LEAF", None)
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from mcpt_tpu.config import build_scene
    from mcpt_tpu.kernels.megakernel import mega_supported, render_mega

    conf = midscale_conf(n_soldiers)
    sc, _ = build_scene(conf, models_dir=MODELS, strict_parity=False)
    pack = sc.compile()
    assert pack.n_cl_nodes > 0 and mega_supported(pack)
    t0 = time.monotonic()
    render_mega(pack, sc.camera, spp, seed=7, max_bounces=mb)  # warm
    warm = time.monotonic() - t0
    best = 0.0
    for rep in range(2):
        _, st = render_mega(pack, sc.camera, spp, seed=rep, max_bounces=mb)
        best = max(best, st["rays_per_s"])
    return {
        "metric": "midscale_rays_per_s",
        "soldiers": n_soldiers,
        "n_tris": int(pack.n_tris),
        "leaf": leaf,
        "value": round(best, 1),
        "unit": "rays/s",
        "warmup_s": round(warm, 1),
        "spp": spp,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--soldiers", type=int, default=2)
    ap.add_argument("--leaf", type=int, default=0, help="0 = heuristic")
    ap.add_argument("--sweep", action="store_true")
    args = ap.parse_args()
    if args.sweep:
        for ns, leaves in ((1, (16, 32, 64)), (3, (32, 64))):
            for lf in leaves:
                print(json.dumps(measure(ns, lf)), flush=True)
    else:
        print(json.dumps(measure(args.soldiers, args.leaf)), flush=True)


if __name__ == "__main__":
    main()
