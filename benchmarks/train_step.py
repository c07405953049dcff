"""Differentiable-mode timing: forward and forward+backward ms/spp on TPU.

BASELINE.md names "fwd+bwd ms/spp" as a driver metric. The reference has no
gradients at all (forward-only C++, SURVEY.md §7 item 9), so this measures
the TPU build's *extra* capability: `diff.py`'s detached-sampling estimator
through the wavefront integrator in scan mode (`early_exit=False`; the
megakernel is forward-only — Pallas kernels have no reverse-mode rule).

Prints one JSON line:
  {"fwd_ms_per_spp": ..., "fwd_bwd_ms_per_spp": ..., "lanes": ..., ...}

Methodology: the DEMO Cornell scene, a fixed 8,192-pixel batch (24,576
wavelength lanes), max_bounces=4, Adam step. Per-spp cost is linear in spp
(the spp axis is a lax.scan), so spp=4 timed renders give stable ms/spp.

  BENCH_PIXELS / BENCH_SPP / BENCH_MB override the defaults.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(repo, ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mcpt_tpu.builtin_scenes import demo_scene
    from mcpt_tpu.diff import make_train_step, params_from_pack, render_lanes

    n_pix = int(os.environ.get("BENCH_PIXELS", "8192"))
    spp = int(os.environ.get("BENCH_SPP", "4"))
    mb = int(os.environ.get("BENCH_MB", "4"))

    sc = demo_scene()
    pack = sc.compile()
    cam = sc.camera
    ids = jnp.arange(n_pix, dtype=jnp.int32)
    key = jax.random.key(0)

    # ---- forward (differentiable estimator, no grad)
    fwd = jax.jit(
        lambda k: render_lanes(pack, cam, ids, k, spp=spp, max_bounces=mb)
    )
    fwd(key).block_until_ready()  # compile
    reps = []
    for r in range(3):
        t0 = time.monotonic()
        fwd(jax.random.key(r + 1)).block_until_ready()
        reps.append(time.monotonic() - t0)
    fwd_s = sorted(reps)[1]

    # ---- forward + backward + Adam update
    target = jnp.zeros((cam.width * cam.height, 3), jnp.float32)
    init_fn, step = make_train_step(
        pack, cam, target, spp=spp, max_bounces=mb
    )
    params, opt_state = init_fn()
    params, opt_state, loss = step(params, opt_state, ids, key)  # compile
    jax.block_until_ready(loss)
    reps = []
    for r in range(3):
        t0 = time.monotonic()
        out = step(params, opt_state, ids, jax.random.key(r + 10))
        jax.block_until_ready(out[2])
        reps.append(time.monotonic() - t0)
    bwd_s = sorted(reps)[1]

    n_params = sum(
        int(jnp.size(x)) for x in jax.tree_util.tree_leaves(
            params_from_pack(pack)
        )
    )
    print(
        json.dumps(
            {
                "metric": "train_step_ms_per_spp",
                "fwd_ms_per_spp": round(1e3 * fwd_s / spp, 2),
                "fwd_bwd_ms_per_spp": round(1e3 * bwd_s / spp, 2),
                "bwd_over_fwd": round(bwd_s / fwd_s, 2),
                "pixels": n_pix,
                "lanes": n_pix * 3,
                "spp": spp,
                "max_bounces": mb,
                "n_params": n_params,
                "backend": jax.default_backend(),
                "loss": float(loss),
            }
        )
    )


def main_hybrid():
    """--hybrid: the megakernel-forward hybrid step vs the all-wavefront
    step at MATCHED residual spp (diff.make_train_step_hybrid).

    The all-wavefront step renders residual AND gradient with the
    differentiable scan at `spp_res` (one correlated pass — the standard
    single-estimator step); the hybrid renders the residual with the
    megakernel at `spp_res` and pulls it back through a `spp_grad`-sample
    wavefront VJP. Same image (BENCH_W x BENCH_H full frame), same Adam
    update. Prints one JSON line with both per-step walls and the
    megakernel's fwd ms/spp for the BASELINE table.
    """
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(repo, ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mcpt_tpu.builtin_scenes import demo_scene
    from mcpt_tpu.diff import (
        make_train_step, make_train_step_hybrid, params_from_pack,
    )
    from mcpt_tpu.kernels.megakernel import render_mega

    w = int(os.environ.get("BENCH_W", "128"))
    h = int(os.environ.get("BENCH_H", "64"))
    spp_res = int(os.environ.get("BENCH_SPP", "16"))
    spp_grad = int(os.environ.get("BENCH_SPP_GRAD", "2"))
    mb = int(os.environ.get("BENCH_MB", "4"))

    sc = demo_scene()
    pack = sc.compile()
    cam = dataclasses.replace(sc.camera, width=w, height=h)
    n_pix = w * h
    p_true = params_from_pack(pack)._replace(light_scale=jnp.float32(1.5))
    from mcpt_tpu.diff import apply_params

    target_img, _ = render_mega(
        apply_params(pack, p_true), cam, min(64, 4 * spp_res), seed=9,
        max_bounces=mb,
    )
    target_img = np.asarray(target_img)

    # ---- megakernel forward alone (the "fwd ms/spp" headline)
    t0 = time.monotonic()
    render_mega(pack, cam, spp_res, seed=1, max_bounces=mb)  # warm
    warm = time.monotonic() - t0
    reps = []
    for r in range(3):
        t0 = time.monotonic()
        render_mega(pack, cam, spp_res, seed=2 + r, max_bounces=mb)
        reps.append(time.monotonic() - t0)
    mega_fwd_s = sorted(reps)[1]

    # ---- hybrid step
    init_fn, hstep = make_train_step_hybrid(
        pack, cam, target_img, spp_res=spp_res, spp_grad=spp_grad,
        max_bounces=mb,
    )
    params, opt_state = init_fn()
    params, opt_state, hloss = hstep(
        params, opt_state, jax.random.key(0), seed=0
    )  # compile
    reps = []
    for r in range(3):
        t0 = time.monotonic()
        params, opt_state, hloss = hstep(
            params, opt_state, jax.random.key(r + 1), seed=r + 1
        )
        reps.append(time.monotonic() - t0)
    hybrid_s = sorted(reps)[1]

    # ---- all-wavefront step at the same residual spp
    ids = jnp.arange(n_pix, dtype=jnp.int32)
    init_fn, wstep = make_train_step(
        pack, cam, target_img.reshape(n_pix, 3), spp=spp_res,
        max_bounces=mb,
    )
    params, opt_state = init_fn()
    params, opt_state, wloss = wstep(
        params, opt_state, ids, jax.random.key(0)
    )  # compile
    jax.block_until_ready(wloss)
    reps = []
    for r in range(3):
        t0 = time.monotonic()
        out = wstep(params, opt_state, ids, jax.random.key(r + 1))
        jax.block_until_ready(out[2])
        reps.append(time.monotonic() - t0)
    wave_s = sorted(reps)[1]

    print(
        json.dumps(
            {
                "metric": "hybrid_train_step",
                "mega_fwd_ms_per_spp": round(1e3 * mega_fwd_s / spp_res, 3),
                "hybrid_step_s": round(hybrid_s, 3),
                "wavefront_step_s": round(wave_s, 3),
                "speedup_at_matched_residual_spp": round(wave_s / hybrid_s, 2),
                "pixels": n_pix,
                "lanes": n_pix * 3,
                "spp_res": spp_res,
                "spp_grad": spp_grad,
                "max_bounces": mb,
                "backend": jax.default_backend(),
                "hybrid_loss": float(hloss),
                "wavefront_loss": float(wloss),
                "warmup_s": round(warm, 1),
            }
        )
    )


if __name__ == "__main__":
    if "--hybrid" in sys.argv:
        main_hybrid()
    else:
        main()
