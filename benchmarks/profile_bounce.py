"""Micro-profile of the integrator's per-bounce components on the demo scene.

Times each hot sub-stage at the bench batch size to find where the
end-to-end rays/s is lost relative to the raw intersect kernel throughput.
"""

import time

import jax
import jax.numpy as jnp

from mcpt_tpu.builtin_scenes import demo_scene
from mcpt_tpu.bsdf import eval_bsdf, fresnel, gather_material, pdf, sample_microfacet_normal
from mcpt_tpu.integrator import direct_lighting_c, trace_paths
from mcpt_tpu.intersect import intersect, occlude_t, surface_at


def timeit(name, fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.monotonic()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.monotonic() - t0) / n
    print(f"{name:34s} {dt*1e3:9.2f} ms")
    return dt


def main():
    sc = demo_scene()
    pack = sc.compile()
    b = 116 * 1920 * 3 * 4 // 4  # bench tile lanes per spp-chunk approximation
    b = 668160  # 116*1920*3 lanes at spp organized per-chunk; match prior profiling
    key = jax.random.key(0)
    o = jnp.tile(jnp.asarray(sc.camera.position, jnp.float32), (b, 1))
    kd = jax.random.normal(key, (b, 3))
    d = kd / jnp.linalg.norm(kd, axis=-1, keepdims=True)
    lam = jnp.full((b,), 0.55, jnp.float32)
    chan = jnp.zeros((b,), jnp.int32)

    print(f"batch = {b} lanes, scene tris = {pack.tri_v0.shape[0]}")

    f_int = jax.jit(lambda o, d: intersect(pack, o, d, method="pallas"))
    t_int = timeit("intersect (pallas)", f_int, o, d)
    f_occ = jax.jit(lambda o, d: occlude_t(pack, o, d, method="pallas"))
    timeit("occlude_t (pallas)", f_occ, o, d)

    hit = f_int(o, d)
    f_surf = jax.jit(lambda h: surface_at(pack, o, d, h))
    timeit("surface_at", f_surf, hit)
    surf = f_surf(hit)

    f_mat = jax.jit(lambda m: gather_material(pack, m))
    timeit("gather_material", f_mat, surf.mat)
    m = f_mat(surf.mat)

    xi = jax.random.uniform(key, (b, 4))
    f_mfn = jax.jit(lambda: sample_microfacet_normal(m, surf.n, xi[:, 0], xi[:, 1]))
    timeit("sample_microfacet_normal", f_mfn)
    mfn = f_mfn()

    f_fres = jax.jit(lambda: fresnel(m, d, mfn, lam))
    timeit("fresnel", f_fres)

    wo = -d
    f_ev = jax.jit(lambda: eval_bsdf(m, d, wo, surf.n, lam, surf.uv, chan, jnp.ones(b, bool)))
    timeit("eval_bsdf", f_ev)
    f_pdf = jax.jit(lambda: pdf(m, d, wo, surf.n, lam, jnp.ones(b, bool)))
    timeit("pdf", f_pdf)

    c3 = lambda a: (a[:, 0], a[:, 1], a[:, 2])
    f_dl = jax.jit(
        lambda k: direct_lighting_c(
            pack, k, c3(wo), c3(surf.p), c3(surf.n),
            (surf.uv[:, 0], surf.uv[:, 1]), m, lam, chan,
            jnp.ones(b, bool), "pallas",
        )
    )
    t_dl = timeit("direct_lighting (4 NEE)", f_dl, key)

    # Whole path trace at bench shapes.
    f_tp = jax.jit(
        lambda o, d, k: trace_paths(pack, o, d, lam, chan, k, max_bounces=8, method="pallas")
    )
    t_tp = timeit("trace_paths (8 bounces)", f_tp, o, d, key, n=5)

    rays_per_call = b * (1 + 0)  # intersect rays
    print(f"\nintersect alone:  {b / t_int / 1e6:8.1f} Mrays/s")
    print(f"NEE (4 shadow):   {4 * b / t_dl / 1e6:8.1f} Mrays/s (shadow rays)")
    print(f"trace_paths:      {b / t_tp / 1e6:8.1f} Mpaths/s")


if __name__ == "__main__":
    main()
