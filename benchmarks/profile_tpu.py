"""Quick on-chip timing breakdown: intersect variants + full tile step.

python -m benchmarks.profile_tpu
"""

import dataclasses
import time

import jax
import jax.numpy as jnp

from mcpt_tpu.builtin_scenes import demo_scene
from mcpt_tpu.camera import generate_rays
from mcpt_tpu.integrator import trace_paths
from mcpt_tpu.intersect import intersect
from mcpt_tpu.render import _render_tile


def timeit(fn, *args, n=10, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.monotonic()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.monotonic() - t0) / n


def main():
    sc = demo_scene()
    pack = sc.compile()
    print("tris:", pack.tri_v0.shape, "spheres:", pack.sph_r.shape,
          "bvh nodes:", pack.bvh_fat.shape, "backend:", jax.default_backend())

    key = jax.random.key(0)
    for b in (1 << 16, 1 << 18, 1 << 20):
        o = jax.random.normal(key, (b, 3), jnp.float32)
        d = o / jnp.linalg.norm(o, axis=-1, keepdims=True)
        o = o * 0.1
        for method in ("dense", "bvh", "pallas"):
            f = jax.jit(lambda o, d, m=method: intersect(pack, o, d, method=m))
            try:
                dt = timeit(f, o, d)
                print(f"intersect {method:7s} B={b:8d}: {dt*1e3:8.2f} ms  "
                      f"{b/dt/1e6:9.1f} Mrays/s")
            except Exception as e:  # noqa: BLE001
                print(f"intersect {method:7s} B={b:8d}: FAILED {type(e).__name__}: {e}")

    # Full integrator on one batch (no spp scan).
    cam = dataclasses.replace(sc.camera, width=1920, height=1080)
    for rows in (29, 58, 116):
        tile_pixels = rows * 1920
        ids = jnp.arange(tile_pixels, dtype=jnp.int32)
        for spp in (1, 4):
            dt = timeit(_render_tile, pack, cam, ids, key, spp, 8, "dense", n=3)
            lanes = tile_pixels * 3 * spp
            print(f"render_tile rows={rows} spp={spp}: {dt*1e3:8.1f} ms  "
                  f"{lanes/dt/1e6:7.2f} Mlanes/s")

    # trace_paths alone, early_exit on/off.
    tile_pixels = 116 * 1920
    ids = jnp.arange(tile_pixels, dtype=jnp.int32)
    o, d = generate_rays(cam, ids, key)
    o3 = jnp.repeat(o, 3, axis=0)
    d3 = jnp.repeat(d, 3, axis=0)
    chan = jnp.tile(jnp.arange(3, dtype=jnp.int32), tile_pixels)
    from mcpt_tpu.constants import WAVELEN_UM
    lam = jnp.asarray(WAVELEN_UM)[chan]
    for ee in (True, False):
        f = jax.jit(lambda k: trace_paths(pack, o3, d3, lam, chan, k,
                                          max_bounces=8, method="dense",
                                          early_exit=ee)[0])
        dt = timeit(f, key, n=3)
        print(f"trace_paths early_exit={ee}: {dt*1e3:8.1f} ms  "
              f"{o3.shape[0]/dt/1e6:7.2f} Mlanes/s")


if __name__ == "__main__":
    main()
