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


def timeit(label, fn, *args, n=3, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.monotonic()
    for _ in range(n):
        out = fn(*args, **kw)
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

    isect = jax.jit(lambda o, d: intersect_c(pack, o, d, method=method).t)
    dt = timeit(f"intersect_c B={b}", isect, o3, d3)
    print(f"  -> {b/dt/1e6:.1f} Mrays/s")

    s = pack.n_dir_sample
    osb = tuple(jnp.tile(x, s) for x in o3)
    dsb = tuple(jnp.tile(x, s) for x in d3)
    occl = jax.jit(lambda o, d: occlude_t_c(pack, o, d, method=method))
    dt = timeit(f"occlude_t_c B={b*s}", occl, osb, dsb)
    print(f"  -> {b*s/dt/1e6:.1f} Mrays/s")

    for mb in (1, 2, 4, 8):
        tr = jax.jit(
            lambda o, d, mb=mb: trace_paths_c(
                pack, o, d, lam, chan, key, max_bounces=mb, method=method
            )[0]
        )
        dt = timeit(f"trace_paths_c mb={mb} B={b}", tr, o3, d3)
    rays = None

    dt = timeit(
        f"_render_tile spp={spp} mb=8",
        _render_tile,
        pack,
        cam,
        ids,
        key,
        spp,
        8,
        method,
        n=2,
    )
    # rays/s using the integrator's own count
    fb, rays = _render_tile(pack, cam, ids, key, spp, 8, method)
    print(f"  -> {int(rays)/dt/1e6:.2f} Mrays/s end-to-end")


if __name__ == "__main__":
    main()
