"""Chessboard flagship renders (the reference's published final scenes).

Renders the conf.json "final product" scene (main.cpp:130-330) through the
CLUSTERED megakernel at 1920x1080 and records throughput + artifacts:

  python -m benchmarks.chessboard --variant dark          # no DoF, dark bg
  python -m benchmarks.chessboard --variant sky           # DoF + sky env map
  python -m benchmarks.chessboard --compare               # mega vs wavefront

Artifacts:
  assets/renders/chessboard_<variant>.png       tonemapped render
  tests/data/chessboard_<variant>_tiles.npy     24x13 linear tile means
                                                (consumed by
                                                tests/test_golden_chessboard.py)

Reference goldens: /root/reference/final_render_result_dark_without_dof.png
and final_render_result_sky_with_dof.png (README.md:18-27). Exact colors are
NOT reproducible — the dark variant's background config is unpublished and
the sky variant's sky.png asset is missing from the mount
(.MISSING_LARGE_BLOBS) — so the golden comparison is structural
(tile-mean correlation), with the darks' background estimated from the
golden's own sky band.

Each run prints one JSON line with rays/s (recorded in PERF.md).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

MODELS = os.environ.get("MCPT_MODELS_DIR", "/root/reference/models")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SKY = os.path.join(REPO, "assets", "sky.png")

# Estimated from the dark golden's own top background band: mean
# (65.9, 61.1, 56.2)/255 display → linear^(1/0.45) ≈ (0.049, 0.042, 0.035).
# The golden's true env is an (unpublished) gradient with a top-center
# halo; a flat color matches its mean level only, so the golden test
# compares background-subtracted structure (test_golden_chessboard.py).
DARK_BG = [0.049, 0.042, 0.035]


def chessboard_conf(variant: str, width=1920, height=1080, spp=256):
    conf = {
        "camera": {
            "width": width, "height": height, "fov": 70,
            "position": [278, 150, -2550], "target": [278, 0, 0],
            "up": [0, 1, 0],
            "useDOF": variant == "sky",
            "focusDistance": 3036.98, "apertureRadius": 10,
        },
        "renderer": {"spp": spp},
        "scene": {
            "includeShadow": True,
            "RussianRouletteRate": 0.4,
            "envMap": SKY if variant == "sky" else DARK_BG,
            "model_quality": "low",
            "kingPosition": [0, 0, 0],
            "kingMaterial": "gold_conductor",
            "soldierLeftRowPosition": [-559, 0, -200],
            "soldierRightRowPosition": [160, 0, -200],
            "soldierXSpacing": 0, "soldierYSpacing": 0,
            "soldierZSpacing": -356, "soldierCountPerRow": 7,
            "soldierMaterials": ["smooth_glass"] * 7
            + ["rough_white_conductor"] * 7,
            "wallMaterial": "rough_white_conductor",
            "floorMaterial": "silver_mirror",
            "floor_isTextured": True,
            "lightPosition": [278, 1300, 0],
            "lightBrightness": 100.0,
            "addDiamond": True,
        },
    }
    return conf


def tile_means(img: np.ndarray, tw=24, th=13) -> np.ndarray:
    """(th, tw, 3) block means of an (H, W, 3) image (trailing partial
    blocks folded into the last tile)."""
    h, w = img.shape[:2]
    ys = np.linspace(0, h, th + 1).astype(int)
    xs = np.linspace(0, w, tw + 1).astype(int)
    out = np.zeros((th, tw, 3), np.float64)
    for i in range(th):
        for j in range(tw):
            out[i, j] = img[ys[i] : ys[i + 1], xs[j] : xs[j + 1]].mean((0, 1))
    return out.astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="dark", choices=["dark", "sky"])
    ap.add_argument("--spp", type=int, default=256)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--mb", type=int, default=8)
    ap.add_argument(
        "--compare", action="store_true",
        help="also render 480x270 through megakernel AND wavefront and "
        "report the mean deviation (clustered-shadow validation)",
    )
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mcpt_tpu.config import build_scene
    from mcpt_tpu.film import save_png
    from mcpt_tpu.kernels.megakernel import mega_supported, render_mega

    conf = chessboard_conf(args.variant, args.width, args.height, args.spp)
    sc, _ = build_scene(conf, models_dir=MODELS)
    pack = sc.compile()
    assert pack.n_cl_nodes > 0 and mega_supported(pack)

    if args.compare:
        import dataclasses

        from mcpt_tpu.render import render_radiance

        # 192x108 x spp256 = 5.3M camera samples (more than 480x270 x
        # spp32) while keeping each WAVEFRONT dispatch at 6912 lanes
        # (2304-pixel tiles): XLA's native dynamic-gather over the ~19k-row
        # BVH table reproducibly crashes the TPU worker at >=49k-lane
        # dispatches (environment bug — the identical program runs on CPU;
        # see PERF.md "wavefront big-scene gathers"). 192x108 also reuses
        # the megakernel block shape cached by the scaling/repro runs, so
        # no fresh multi-minute remote Mosaic compile is queued.
        cam_s = dataclasses.replace(sc.camera, width=192, height=108)
        img_m, st_m = render_mega(pack, cam_s, 256, seed=0, max_bounces=args.mb)
        img_w, st_w = render_radiance(
            pack, cam_s, 256, max_bounces=args.mb, key=jax.random.key(0),
            tile_pixels=2304,
        )
        dev = abs(float(img_m.mean()) - float(img_w.mean())) / max(
            float(img_w.mean()), 1e-9
        )
        print(
            json.dumps(
                {
                    "metric": "chessboard_mega_vs_wavefront_mean_dev",
                    "value": round(dev, 4),
                    "mega_mean": float(img_m.mean()),
                    "wavefront_mean": float(img_w.mean()),
                    "mega_rays_per_s": round(st_m["rays_per_s"], 1),
                    "wavefront_rays_per_s": round(st_w["rays_per_s"], 1),
                }
            )
        )
        return

    t0 = time.monotonic()
    img, stats = render_mega(
        pack, sc.camera, args.spp, seed=0, max_bounces=args.mb
    )
    total = time.monotonic() - t0

    os.makedirs(os.path.join(REPO, "assets", "renders"), exist_ok=True)
    os.makedirs(os.path.join(REPO, "tests", "data"), exist_ok=True)
    png = os.path.join(REPO, "assets", "renders", f"chessboard_{args.variant}.png")
    save_png(png, img)
    np.save(
        os.path.join(REPO, "tests", "data", f"chessboard_{args.variant}_tiles.npy"),
        tile_means(img),
    )
    print(
        json.dumps(
            {
                "metric": "chessboard_rays_per_s",
                "variant": args.variant,
                "value": round(stats["rays_per_s"], 1),
                "unit": "rays/s",
                "spp": args.spp,
                "elapsed_s": round(stats["elapsed_s"], 2),
                "total_s": round(total, 2),
                "output": png,
            }
        )
    )


if __name__ == "__main__":
    main()
