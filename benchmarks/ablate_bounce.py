"""Ablation timing of trace_paths via scene knobs (NEE count, shadows, cap).

Timing rules learned the hard way on the axon remote TPU:
- every timed call gets a DISTINCT key (identical repeat calls can return
  in ~0 time — some layer memoizes identical executions),
- every call's result is forced to host (float(r.sum())) before the clock
  stops.
"""

import time

import jax
import jax.numpy as jnp

import mcpt_tpu.integrator as integ
from mcpt_tpu.builtin_scenes import demo_scene

B = 668160


def bench(tag, fn, n=4):
    keys = [jax.random.fold_in(jax.random.key(7), i) for i in range(n + 1)]
    float(fn(keys[0])[0].sum())  # warm/compile
    t0 = time.monotonic()
    for k in keys[1:]:
        float(fn(k)[0].sum())
    dt = (time.monotonic() - t0) / n
    print(f"{tag:42s} {dt*1e3:8.1f} ms")
    return dt


def main():
    key = jax.random.key(0)
    sc = demo_scene()
    o = jnp.tile(jnp.asarray(sc.camera.position, jnp.float32), (B, 1))
    kd = jax.random.normal(key, (B, 3))
    d = kd / jnp.linalg.norm(kd, axis=-1, keepdims=True)
    lam = jnp.full((B,), 0.55)
    chan = jnp.zeros((B,), jnp.int32)

    def runner(pack, mb, ee=True):
        return lambda k: integ.trace_paths(
            pack, o, d, lam, chan, k, max_bounces=mb, method="pallas", early_exit=ee
        )

    pack = sc.compile()
    full = bench("full S=4 shadow mb=8", runner(pack, 8))
    bench("full S=4 shadow mb=4", runner(pack, 4))
    bench("full S=4 shadow mb=2", runner(pack, 2))
    bench("full S=4 shadow mb=1", runner(pack, 1))
    bench("scan (no early-exit) mb=8", runner(pack, 8, ee=False))

    sc.n_dir_sample = 1
    s1 = bench("S=1 shadow mb=8", runner(sc.compile(), 8))
    sc.enable_shadow = False
    bench("S=1 noshadow mb=8", runner(sc.compile(), 8))
    sc.n_dir_sample = 4
    s4ns = bench("S=4 noshadow mb=8", runner(sc.compile(), 8))
    print(f"\nNEE S=4→1 saves {1e3*(full-s1):.1f} ms; shadows cost {1e3*(full-s4ns):.1f} ms")


if __name__ == "__main__":
    main()
