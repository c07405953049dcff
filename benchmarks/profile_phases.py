"""Phase-level timing on real hardware: where does a render tile's time go?

Times, at the bench tile size (222,720 px x 3 chan = 668,160 lanes):
  - intersect_c (nearest-hit kernel) alone
  - occlude_t_c (shadow batch, n_dir_sample x lanes)
  - one full trace_paths_c call (the whole integrator)
  - one _render_tile call (integrator + camera + spp scan)

Run on the TPU:  python benchmarks/profile_phases.py
"""

import dataclasses
import os
import time

import jax
import jax.numpy as jnp

from mcpt_tpu.builtin_scenes import demo_scene
from mcpt_tpu.camera import generate_rays_c
from mcpt_tpu.constants import WAVELEN_UM
from mcpt_tpu.integrator import trace_paths_c
from mcpt_tpu.intersect import intersect_c, occlude_t_c
from mcpt_tpu.render import _render_tile


def timeit(label, fn, n=3):
    """Times fn(i) with the iteration index i — every call site folds i into
    its PRNG key (or perturbs an input) so no two timed calls are
    byte-identical: the target TPU stack memoizes identical executions (see
    benchmarks/ablate_bounce.py timing rules) and would otherwise report
    wildly inflated throughput.
    """
    out = fn(0)
    jax.block_until_ready(out)
    t0 = time.monotonic()
    for i in range(n):
        out = fn(i + 1)
    jax.block_until_ready(out)
    dt = (time.monotonic() - t0) / n
    print(f"{label:40s} {dt*1e3:10.1f} ms")
    return dt


def main():
    rows = int(os.environ.get("BENCH_TILE", "116"))
    spp = int(os.environ.get("BENCH_SPP", "4"))
    method = os.environ.get("BENCH_METHOD", "auto")
    width, height = 1920, 1080
    sc = demo_scene()
    pack = sc.compile()
    cam = dataclasses.replace(sc.camera, width=width, height=height)
    tile_px = rows * width
    b = tile_px * 3
    key = jax.random.key(0)
    print(f"backend={jax.default_backend()} tile_px={tile_px} lanes={b}")

    ids = jnp.arange(tile_px, dtype=jnp.int32)
    o, d = generate_rays_c(cam, ids, key)
    rep = lambda x: jnp.repeat(x, 3, axis=0)
    o3 = tuple(rep(x) for x in o)
    d3 = tuple(rep(x) for x in d)
    chan = jnp.tile(jnp.arange(3, dtype=jnp.int32), tile_px)
    lam = jnp.asarray(WAVELEN_UM)[chan]
    jax.block_until_ready((o3, d3))

    bump = lambda c, i: (c[0] + jnp.float32(i) * 1e-7, c[1], c[2])

    isect = jax.jit(lambda o, d: intersect_c(pack, o, d, method=method).t)
    dt = timeit(f"intersect_c B={b}", lambda i: isect(bump(o3, i), d3))
    print(f"  -> {b/dt/1e6:.1f} Mrays/s")

    s = pack.n_dir_sample
    osb = tuple(jnp.tile(x, s) for x in o3)
    dsb = tuple(jnp.tile(x, s) for x in d3)
    occl = jax.jit(lambda o, d: occlude_t_c(pack, o, d, method=method))
    dt = timeit(f"occlude_t_c B={b*s}", lambda i: occl(bump(osb, i), dsb))
    print(f"  -> {b*s/dt/1e6:.1f} Mrays/s")

    for mb in (1, 2, 4, 8):
        tr = jax.jit(
            lambda o, d, k, mb=mb: trace_paths_c(
                pack, o, d, lam, chan, k, max_bounces=mb, method=method
            )[0]
        )
        dt = timeit(
            f"trace_paths_c mb={mb} B={b}",
            lambda i: tr(o3, d3, jax.random.fold_in(key, i)),
        )

    dt = timeit(
        f"_render_tile spp={spp} mb=8",
        lambda i: _render_tile(
            pack, cam, ids, jax.random.fold_in(key, i), spp, 8, method
        ),
        n=2,
    )
    # rays/s using the integrator's own count
    fb, rays = _render_tile(pack, cam, ids, key, spp, 8, method)
    print(f"  -> {int(rays)/dt/1e6:.2f} Mrays/s end-to-end")


if __name__ == "__main__":
    main()
