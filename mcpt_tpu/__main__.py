"""CLI entry: `python -m mcpt_tpu` — the reference `RayTracing` binary's role.

  python -m mcpt_tpu --conf conf.json            # config-driven chess scene
  python -m mcpt_tpu --demo --spp 64             # built-in Cornell DEMO scene
  python -m mcpt_tpu --demo --width 256 --height 256 --out img.png

Prints the render wall-clock as H:M:S.ms like main.cpp:336-348.
"""

import argparse
import sys

from mcpt_tpu.builtin_scenes import demo_scene
from mcpt_tpu.config import DEFAULT_MODELS_DIR, build_scene, load_config
from mcpt_tpu.render import render
from mcpt_tpu.utils.progress import format_duration


def main(argv=None):
    p = argparse.ArgumentParser(prog="mcpt_tpu")
    p.add_argument("--conf", default=None, help="conf.json path (chess scene)")
    p.add_argument("--demo", action="store_true", help="built-in Cornell DEMO scene")
    p.add_argument("--models-dir", default=DEFAULT_MODELS_DIR)
    p.add_argument("--spp", type=int, default=None)
    p.add_argument("--width", type=int, default=None)
    p.add_argument("--height", type=int, default=None)
    p.add_argument("--out", default=None)
    p.add_argument("--max-bounces", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--method", default="auto", choices=["auto", "pallas", "dense", "bvh"])
    p.add_argument(
        "--engine",
        default="auto",
        choices=["auto", "mega", "wavefront"],
        help="auto picks the single-Pallas-kernel megakernel whenever the "
        "scene supports it (all reference scene classes do); wavefront is "
        "the tile-based oracle path (supports --checkpoint resume)",
    )
    p.add_argument("--checkpoint", default=None, help="resumable render state file")
    p.add_argument(
        "--no-strict-parity",
        action="store_true",
        help="fix the reference's dead-key config quirks (see config.py)",
    )
    p.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = p.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    if args.demo:
        scene = demo_scene()
        opts = {"spp": 2048, "output": "./output.png"}
    elif args.conf:
        conf = load_config(args.conf)
        scene, opts = build_scene(
            conf, models_dir=args.models_dir, strict_parity=not args.no_strict_parity
        )
    else:
        p.error("need --conf or --demo")

    import dataclasses

    import jax

    cam = scene.camera
    if args.width:
        cam = dataclasses.replace(cam, width=args.width)
    if args.height:
        cam = dataclasses.replace(cam, height=args.height)
    spp = args.spp if args.spp is not None else opts["spp"]
    out = args.out if args.out is not None else opts["output"]

    print(f"SPP: {spp}")
    engine = args.engine
    if engine == "mega" and args.checkpoint:
        p.error(
            "--engine mega does not support --checkpoint "
            "(use --engine wavefront for resumable renders)"
        )
    pack = None
    if engine in ("auto", "mega") and not args.checkpoint:
        from mcpt_tpu.kernels.megakernel import mega_supported, render_mega

        pack = scene.compile()
        if mega_supported(pack):
            engine = "mega"
            from mcpt_tpu.film import save_png

            fb, stats = render_mega(
                pack, cam, spp, seed=args.seed, max_bounces=args.max_bounces
            )
            if out:
                save_png(out, fb)
            stats.setdefault(
                "wavelength_paths_per_s",
                stats["wavelength_paths"] / max(stats["elapsed_s"], 1e-9),
            )
        elif args.engine == "mega":
            p.error("scene not supported by the megakernel")
        else:
            engine = "wavefront"
    else:
        engine = "wavefront"
    if engine == "wavefront":
        # reuse the pack if the auto path already compiled the scene
        fb, stats = render(
            pack if pack is not None else scene,
            cam,
            spp,
            key=jax.random.key(args.seed),
            out_path=out,
            max_bounces=args.max_bounces,
            method=args.method,
            progress=True,
            checkpoint_path=args.checkpoint,
        )
    print(f"Writing image to {out}")
    print(
        f"Rendering finished in {format_duration(stats['elapsed_s'])} "
        f"({stats['rays_per_s']:.3e} rays/s, "
        f"{stats['wavelength_paths_per_s']:.3e} wavelength-paths/s, "
        f"engine={engine})"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
