"""Benchmark suite: the five BASELINE.json configs.

  python -m benchmarks.run                # all configs, tiny-spp smoke
  python -m benchmarks.run --config 3     # one config
  python -m benchmarks.run --full         # full spp (long!)

Each run prints one JSON line: config name, resolution, spp, wall seconds,
rays/s, wavelength-paths/s. `--full` uses the BASELINE spp values; default
scales spp down so a whole sweep finishes in minutes (throughput numbers are
per-ray and stay representative — the integrator's cost is per-sample).
"""

import argparse
import json
import os
import time

import numpy as np

MODELS = os.environ.get("MCPT_MODELS_DIR", "/root/reference/models")
SKY = os.path.join(os.path.dirname(__file__), "..", "assets", "sky.png")


def _cornell(width, height, spp, dls=4):
    from mcpt_tpu.builtin_scenes import demo_scene

    sc = demo_scene()
    sc.n_dir_sample = dls
    return sc, width, height, spp


def config_1():
    """Cornell box DEMO, 256x256, spp=32, no DoF."""
    return _cornell(256, 256, 32)


def config_2():
    """Cornell box materials test, spp=128, direct light samples=8."""
    return _cornell(256, 256, 128, dls=8)


def config_3():
    """Chessboard scene (low-poly), 960x540, spp=256, env map background."""
    from mcpt_tpu.config import build_scene, load_config

    conf = {
        "camera": {"width": 960, "height": 540, "fov": 70,
                   "position": [278, 150, -2550], "target": [278, 0, 0],
                   "useDOF": False},
        "renderer": {"spp": 256},
        "scene": {
            "RussianRouletteRate": 0.4,
            "envMap": SKY if os.path.exists(SKY) else [0.24, 0.67, 0.84],
            "model_quality": "low",
            "kingMaterial": "gold_conductor",
            "soldierLeftRowPosition": [-559, 0, -200],
            "soldierRightRowPosition": [160, 0, -200],
            "soldierXSpacing": 0.0, "soldierYSpacing": 0.0, "soldierZSpacing": -356.0,
            "soldierCountPerRow": 7,
            "soldierMaterials": ["smooth_glass"] * 7 + ["rough_white_conductor"] * 7,
            "floorMaterial": "silver_mirror", "floor_isTextured": True,
            "lightPosition": [278, 1300, 0], "lightBrightness": 100.0,
        },
    }
    sc, opts = build_scene(conf, models_dir=MODELS)
    return sc, 960, 540, 256


def config_4():
    """Chessboard + diamond, DoF on, spp=512."""
    from mcpt_tpu.config import build_scene

    conf = {
        "camera": {"width": 960, "height": 540, "fov": 70,
                   "position": [278, 150, -2550], "target": [278, 0, 0],
                   "useDOF": True, "focusDistance": 3036.98, "apertureRadius": 10},
        "renderer": {"spp": 512},
        "scene": {
            "RussianRouletteRate": 0.4,
            "model_quality": "low",
            "kingMaterial": "gold_conductor",
            "addDiamond": True,
            "floorMaterial": "silver_mirror", "floor_isTextured": True,
            "lightPosition": [278, 1300, 0], "lightBrightness": 100.0,
        },
    }
    sc, opts = build_scene(conf, models_dir=MODELS)
    return sc, 960, 540, 512


def config_5():
    """Full final scene: high-poly, 1920x1080, spp=2048, DLS=32, RR=0.4, DoF."""
    from mcpt_tpu.config import build_scene

    conf = {
        "camera": {"width": 1920, "height": 1080, "fov": 70,
                   "position": [278, 150, -2550], "target": [278, 0, 0],
                   "useDOF": True, "focusDistance": 3036.98, "apertureRadius": 10},
        "renderer": {"spp": 2048},
        "scene": {
            "RussianRouletteRate": 0.4,
            "directLightSample": 32,
            "model_quality": "high",
            "kingMaterial": "gold_conductor",
            "soldierLeftRowPosition": [-559, 0, -200],
            "soldierRightRowPosition": [160, 0, -200],
            "soldierXSpacing": 0.0, "soldierYSpacing": 0.0, "soldierZSpacing": -356.0,
            "soldierCountPerRow": 7,
            "soldierMaterials": ["smooth_glass"] * 7 + ["rough_white_conductor"] * 7,
            "floorMaterial": "silver_mirror", "floor_isTextured": True,
            "lightPosition": [278, 1300, 0], "lightBrightness": 100.0,
            "addDiamond": True,
        },
    }
    # DLS=32 is what the README *claims*; apply it for real (strict_parity
    # keeps the reference's actual 4 — the benchmark states the claimed one).
    sc, opts = build_scene(conf, models_dir=MODELS, strict_parity=False)
    return sc, 1920, 1080, 2048


CONFIGS = {1: config_1, 2: config_2, 3: config_3, 4: config_4, 5: config_5}


def run_one(idx: int, full: bool, max_bounces: int = 8):
    import dataclasses

    import jax

    from mcpt_tpu.kernels.megakernel import mega_supported, render_mega
    from mcpt_tpu.render import render_radiance

    sc, w, h, spp = CONFIGS[idx]()
    if not full:
        spp = max(2, min(spp, 8))
        w, h = max(64, w // 4), max(64, h // 4)
    cam = dataclasses.replace(sc.camera, width=w, height=h)
    pack = sc.compile()
    use_mega = mega_supported(pack) and jax.default_backend() == "tpu"
    if use_mega:
        fb, stats = render_mega(pack, cam, spp, max_bounces=max_bounces)
    else:
        fb, stats = render_radiance(
            pack, cam, spp, key=jax.random.key(0), max_bounces=max_bounces
        )
    out = {
        "config": idx,
        "name": CONFIGS[idx].__doc__.split(".")[0],
        "width": w,
        "height": h,
        "spp": spp,
        "path": "megakernel" if use_mega else "wavefront",
        "wall_s": round(stats["elapsed_s"], 2),
        "rays_per_s": round(stats["rays_per_s"], 1),
        "mean_radiance": [round(float(x), 5) for x in fb.mean(axis=(0, 1))],
    }
    print(json.dumps(out), flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=int, default=None)
    ap.add_argument("--full", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--max-bounces", type=int, default=8)
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    ids = [args.config] if args.config else sorted(CONFIGS)
    for i in ids:
        run_one(i, args.full, args.max_bounces)


if __name__ == "__main__":
    main()
