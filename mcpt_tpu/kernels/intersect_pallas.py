"""Fused Pallas ray-triangle intersection kernel.

The pure-XLA dense path (intersect.py) materializes (B, 3T) intermediates in
HBM — measured bandwidth-bound at ~3e7 rays/s. This kernel keeps the whole
triangle table and the ray batch in VMEM and keeps every per-(ray, triangle)
temporary in registers. HBM traffic drops to ~40 B per ray total.

Semantics are identical to intersect.py's dense path (same unit-triangle
transform computed through the EPS-guarded determinant, same reference
accept rules, Triangle.hpp:222-252).

Hard-won constraints of the axon remote Mosaic compiler (each violation
either hangs the compile service for ~30 min or OOMs VMEM):
- NO grid / BlockSpec index_maps — the whole call is one program invocation
  with `lax.fori_loop`s inside (grid kernels hang the compiler);
- NO narrow trailing dims on big arrays — a (B, 3) array in VMEM pads its
  lane dim 3→128 (40x memory blowup, "Used 192M of 128M vmem"); rays and
  results are laid out (8, B) / (8, B) component-major instead;
- NO lane→sublane relayouts — rays live on the LANE axis end-to-end and
  triangles on the SUBLANE axis: every per-(ray,tri) op is an (8, 128) tile
  (8 triangles × 128 rays), reductions are along sublanes.

Layouts:
  rays:  (8, B)  rows o0,o1,o2,d0,d1,d2,-,-      (B multiple of 128)
  tris:  (T, 16) cols w00..w22, c0..c2, nr2, valid (T multiple of 8)
  out:   (8, B)  rows t, prim, u, v, -,-,-,-
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mcpt_tpu.constants import EPSILON, T_MAX

RAY_BLK = 128  # rays per chunk (lane axis)
TRI_BLK = 8  # triangles per chunk (sublane axis)
TRI_MM_BLK = 128  # triangles per chunk in the MXU (matmul) kernel
# Lanes per pallas_call. The whole (8, MEGA) ray buffer + (8, MEGA) output
# live in VMEM (no grid/BlockSpec streaming — grid kernels hang this image's
# remote Mosaic compiler), so MEGA bounds VMEM use. Bigger batches are
# lax.map'ed over MEGA-sized slices — each map step is a serialized
# dispatch + slice copies, so MEGA should comfortably cover one render
# tile's NEE batch (tile lanes × n_dir_sample). The MM kernel at 1<<20 uses
# 2 × 32 MB; the SC kernel 6 × 4 + 4 × 4 MB — both fit this chip's VMEM
# (compiler budget reports 128 MB).
MEGA = 1 << 20


def _kernel(rays_ref, tri_ref, out_ref, *, n_tri_chunks, n_ray_chunks):
    subl = jax.lax.broadcasted_iota(jnp.int32, (TRI_BLK, RAY_BLK), 0)

    def ray_body(rc, _):
        off = rc * RAY_BLK
        o0 = rays_ref[0:1, pl.ds(off, RAY_BLK)]
        o1 = rays_ref[1:2, pl.ds(off, RAY_BLK)]
        o2 = rays_ref[2:3, pl.ds(off, RAY_BLK)]
        d0 = rays_ref[3:4, pl.ds(off, RAY_BLK)]
        d1 = rays_ref[4:5, pl.ds(off, RAY_BLK)]
        d2 = rays_ref[5:6, pl.ds(off, RAY_BLK)]

        def tri_body(tc, acc):
            t_best, prim_best, u_best, v_best = acc
            r0 = tc * TRI_BLK
            blk = tri_ref[pl.ds(r0, TRI_BLK), :]  # (8, 16)
            w = [blk[:, k : k + 1] for k in range(9)]
            c0 = blk[:, 9:10]
            c1 = blk[:, 10:11]
            c2 = blk[:, 11:12]
            nr2 = blk[:, 12:13]
            valid = blk[:, 13:14]

            dp0 = d0 * w[0] + d1 * w[1] + d2 * w[2]
            dp1 = d0 * w[3] + d1 * w[4] + d2 * w[5]
            dp2 = d0 * w[6] + d1 * w[7] + d2 * w[8]
            op0 = o0 * w[0] + o1 * w[1] + o2 * w[2] - c0
            op1 = o0 * w[3] + o1 * w[4] + o2 * w[5] - c1
            op2 = o0 * w[6] + o1 * w[7] + o2 * w[8] - c2

            det = -dp2 * nr2
            det_g = jnp.where(jnp.abs(det) >= EPSILON, det, 1.0)
            t_hit = op2 * nr2 / det_g
            u = op0 + t_hit * dp0
            v = op1 + t_hit * dp1
            ok = (
                (jnp.abs(det) >= EPSILON)
                & (u >= 0.0)
                & (u <= 1.0)
                & (v >= 0.0)
                & (u + v <= 1.0)
                & (t_hit >= 0.0)
                & (valid > 0.5)
            )
            t_cand = jnp.where(ok, t_hit, T_MAX)

            chunk_min = jnp.min(t_cand, axis=0, keepdims=True)  # (1, 128)
            is_min = t_cand == chunk_min
            sub_pick = jnp.min(
                jnp.where(is_min, subl, jnp.int32(TRI_BLK)), axis=0, keepdims=True
            )
            sel = subl == sub_pick
            u_sel = jnp.sum(jnp.where(sel, u, 0.0), axis=0, keepdims=True)
            v_sel = jnp.sum(jnp.where(sel, v, 0.0), axis=0, keepdims=True)

            better = chunk_min < t_best
            prim_cand = (r0 + sub_pick).astype(jnp.float32)
            return (
                jnp.where(better, chunk_min, t_best),
                jnp.where(better, prim_cand, prim_best),
                jnp.where(better, u_sel, u_best),
                jnp.where(better, v_sel, v_best),
            )

        init = (
            jnp.full((1, RAY_BLK), T_MAX, jnp.float32),
            jnp.full((1, RAY_BLK), -1.0, jnp.float32),
            jnp.zeros((1, RAY_BLK), jnp.float32),
            jnp.zeros((1, RAY_BLK), jnp.float32),
        )
        t_best, prim_best, u_best, v_best = lax.fori_loop(
            0, n_tri_chunks, tri_body, init
        )
        out_ref[0:1, pl.ds(off, RAY_BLK)] = t_best
        out_ref[1:2, pl.ds(off, RAY_BLK)] = prim_best
        out_ref[2:3, pl.ds(off, RAY_BLK)] = u_best
        out_ref[3:4, pl.ds(off, RAY_BLK)] = v_best
        return 0

    lax.fori_loop(0, n_ray_chunks, ray_body, 0)


def _kernel_mm(rays_ref, tri_ref, out_ref, *, n_tri_chunks, n_ray_chunks, occlusion):
    """MXU variant: the 18-madd world→unit-triangle transform of every
    (ray, triangle) pair is six (T,3)@(3,128) matmuls per chunk instead of
    broadcast VPU mul-adds; accept tests run on (TRI_MM_BLK, 128) tiles.

    occlusion=True skips the winner (prim, u, v) bookkeeping and emits only
    the nearest t — shadow rays are ~4/5 of all rays traced and only need
    the |t − dist| < EPS visibility test (Scene.cpp:73-75).
    """
    subl = jax.lax.broadcasted_iota(jnp.int32, (TRI_MM_BLK, RAY_BLK), 0)

    def ray_body(rc, _):
        off = rc * RAY_BLK
        oc = rays_ref[0:3, pl.ds(off, RAY_BLK)]  # (3, 128)
        dc = rays_ref[3:6, pl.ds(off, RAY_BLK)]  # (3, 128)

        def tri_body(tc, acc):
            t_best, prim_best, u_best, v_best = acc
            r0 = tc * TRI_MM_BLK
            blk = tri_ref[pl.ds(r0, TRI_MM_BLK), :]  # (T, 16)
            w0 = blk[:, 0:3]
            w1 = blk[:, 3:6]
            w2 = blk[:, 6:9]
            c0 = blk[:, 9:10]
            c1 = blk[:, 10:11]
            c2 = blk[:, 11:12]
            nr2 = blk[:, 12:13]
            valid = blk[:, 13:14]

            # Precision.HIGHEST: the MXU's default f32 matmul truncates
            # operands to bf16 (measured p99 ~1% t error — fatal for the
            # |t−dist|<EPS visibility test); HIGHEST selects the multi-pass
            # full-f32 algorithm.
            mm = lambda a, b: jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=lax.Precision.HIGHEST,
            )
            dp0 = mm(w0, dc)
            dp1 = mm(w1, dc)
            dp2 = mm(w2, dc)
            op0 = mm(w0, oc) - c0
            op1 = mm(w1, oc) - c1
            op2 = mm(w2, oc) - c2

            det = -dp2 * nr2
            det_g = jnp.where(jnp.abs(det) >= EPSILON, det, 1.0)
            t_hit = op2 * nr2 / det_g
            u = op0 + t_hit * dp0
            v = op1 + t_hit * dp1
            ok = (
                (jnp.abs(det) >= EPSILON)
                & (u >= 0.0)
                & (u <= 1.0)
                & (v >= 0.0)
                & (u + v <= 1.0)
                & (t_hit >= 0.0)
                & (valid > 0.5)
            )
            t_cand = jnp.where(ok, t_hit, T_MAX)
            chunk_min = jnp.min(t_cand, axis=0, keepdims=True)  # (1, 128)
            better = chunk_min < t_best
            t_new = jnp.where(better, chunk_min, t_best)
            if occlusion:
                return (t_new, prim_best, u_best, v_best)

            is_min = t_cand == chunk_min
            sub_pick = jnp.min(
                jnp.where(is_min, subl, jnp.int32(TRI_MM_BLK)),
                axis=0,
                keepdims=True,
            )
            sel = subl == sub_pick
            u_sel = jnp.sum(jnp.where(sel, u, 0.0), axis=0, keepdims=True)
            v_sel = jnp.sum(jnp.where(sel, v, 0.0), axis=0, keepdims=True)
            prim_cand = (r0 + sub_pick).astype(jnp.float32)
            return (
                t_new,
                jnp.where(better, prim_cand, prim_best),
                jnp.where(better, u_sel, u_best),
                jnp.where(better, v_sel, v_best),
            )

        init = (
            jnp.full((1, RAY_BLK), T_MAX, jnp.float32),
            jnp.full((1, RAY_BLK), -1.0, jnp.float32),
            jnp.zeros((1, RAY_BLK), jnp.float32),
            jnp.zeros((1, RAY_BLK), jnp.float32),
        )
        t_best, prim_best, u_best, v_best = lax.fori_loop(
            0, n_tri_chunks, tri_body, init
        )
        out_ref[0:1, pl.ds(off, RAY_BLK)] = t_best
        if not occlusion:
            out_ref[1:2, pl.ds(off, RAY_BLK)] = prim_best
            out_ref[2:3, pl.ds(off, RAY_BLK)] = u_best
            out_ref[3:4, pl.ds(off, RAY_BLK)] = v_best
        return 0

    lax.fori_loop(0, n_ray_chunks, ray_body, 0)


# ---------------------------------------------------------------------------
# Scalar-constant (SC) kernel: triangles/spheres as SMEM scalars, rays dense
# on (sublane, lane) tiles.
#
# The MXU formulation above runs the 18-madd unit-triangle transform as K=3
# matmuls — 3/128 of the systolic depth, and Precision.HIGHEST multiplies the
# pass count. Profiled at 88 Mrays/s (T=128, B=668K) it is VPU/MXU-latency
# bound, not FLOP bound. This kernel instead:
#   - holds each primitive's 13 constants as SMEM *scalars* (the scalar core
#     runs ahead of the VPU, so the loads are free),
#   - keeps rays dense on full (CH_ROWS, 128) f32 tiles (the (1,128)-row
#     layout of `_kernel` uses 1/8 of every VPU issue),
#   - loops primitives per ray chunk with running (t, prim, u, v)
#     accumulators — no cross-sublane reductions, no one-hot winner picks,
#   - folds the sphere quadratic into the same kernel, removing the jnp
#     (B,S) postlude entirely.
# ~40 VPU ops per (ray, primitive) pair ⇒ ~20 Gpairs/s speed-of-light on one
# v5e core; measured ~6x the MXU kernel on the 36-triangle demo scene (which
# the MXU path also pads to 128 triangles).
# ---------------------------------------------------------------------------

CH_ROWS = 8  # ray rows per chunk: (8, 128) = 1024 rays per primitive loop
SC_MAX_TRIS = 1024  # SMEM budget: (1024, 16) f32 = 64 KB


def _tri_candidate(tri_ref, i, o0, o1, o2, d0, d1, d2):
    """t (T_MAX on miss), u, v of ray-tile vs triangle i — exact dense-path
    arithmetic (same op order: dp2·nr2 guard, t through the guarded det)."""
    w00 = tri_ref[i, 0]
    w01 = tri_ref[i, 1]
    w02 = tri_ref[i, 2]
    w10 = tri_ref[i, 3]
    w11 = tri_ref[i, 4]
    w12 = tri_ref[i, 5]
    w20 = tri_ref[i, 6]
    w21 = tri_ref[i, 7]
    w22 = tri_ref[i, 8]
    c0 = tri_ref[i, 9]
    c1 = tri_ref[i, 10]
    c2 = tri_ref[i, 11]
    nr2 = tri_ref[i, 12]
    dp2 = d0 * w20 + d1 * w21 + d2 * w22
    op2 = o0 * w20 + o1 * w21 + o2 * w22 - c2
    det = -(dp2 * nr2)
    okd = jnp.abs(det) >= EPSILON
    det_g = jnp.where(okd, det, 1.0)
    t_hit = op2 * nr2 / det_g
    dp0 = d0 * w00 + d1 * w01 + d2 * w02
    op0 = o0 * w00 + o1 * w01 + o2 * w02 - c0
    u = op0 + t_hit * dp0
    dp1 = d0 * w10 + d1 * w11 + d2 * w12
    op1 = o0 * w10 + o1 * w11 + o2 * w12 - c1
    v = op1 + t_hit * dp1
    ok = (
        okd
        & (u >= 0.0)
        & (u <= 1.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t_hit >= 0.0)
    )
    return jnp.where(ok, t_hit, T_MAX), u, v


def _sph_candidate(sph_ref, s, o0, o1, o2, d0, d1, d2, a_ok, a_safe):
    """t (T_MAX on miss) of ray-tile vs sphere s (global.hpp:20-35 q-form)."""
    cx = sph_ref[s, 0]
    cy = sph_ref[s, 1]
    cz = sph_ref[s, 2]
    r = sph_ref[s, 3]
    l0 = o0 - cx
    l1 = o1 - cy
    l2 = o2 - cz
    bq = 2.0 * (d0 * l0 + d1 * l1 + d2 * l2)
    cq = l0 * l0 + l1 * l1 + l2 * l2 - r * r
    disc = bq * bq - 4.0 * a_safe * cq
    ok = (disc >= 0.0) & a_ok & (r > 0.0)
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    q = jnp.where(bq > 0.0, -0.5 * (bq + sq), -0.5 * (bq - sq))
    qs = jnp.where(jnp.abs(q) > 1e-10, q, 1.0)
    x0 = q / a_safe
    x1 = cq / qs
    lo = jnp.minimum(x0, x1)
    hi = jnp.maximum(x0, x1)
    t = jnp.where(lo < 0.0, hi, lo)
    ok &= t >= 0.0
    return jnp.where(ok, t, T_MAX)


def _kernel_sc(
    o0_ref,
    o1_ref,
    o2_ref,
    d0_ref,
    d1_ref,
    d2_ref,
    tri_ref,
    sph_ref,
    out_ref,
    *,
    n_tris,
    n_sph,
    n_chunks,
    sph_base,
    occlusion,
):
    """o/d refs: six (R, 128) VMEM component planes (free reshapes of flat
    (B,) arrays — the hot path never builds (B,3) rows, so no transposes);
    tri_ref: (T8, 16) SMEM; sph_ref: (S, 4) SMEM;
    out_ref: (1|4, R, 128) VMEM [t, prim, u, v]."""

    def ray_body(rc, _):
        r0 = rc * CH_ROWS
        o0 = o0_ref[pl.ds(r0, CH_ROWS), :]
        o1 = o1_ref[pl.ds(r0, CH_ROWS), :]
        o2 = o2_ref[pl.ds(r0, CH_ROWS), :]
        d0 = d0_ref[pl.ds(r0, CH_ROWS), :]
        d1 = d1_ref[pl.ds(r0, CH_ROWS), :]
        d2 = d2_ref[pl.ds(r0, CH_ROWS), :]
        tri_args = (o0, o1, o2, d0, d1, d2)

        t0 = jnp.full((CH_ROWS, RAY_BLK), T_MAX, jnp.float32)
        # Sphere per-ray invariants, hoisted out of the sphere loop
        # (_sphere_t semantics: a=|d|² with the a>1e-12 TIR guard).
        a = d0 * d0 + d1 * d1 + d2 * d2
        a_ok = a > 1e-12
        a_safe = jnp.maximum(a, 1e-12)

        if occlusion:
            def tri_body(i, t_best):
                t_cand, _, _ = _tri_candidate(tri_ref, i, *tri_args)
                return jnp.minimum(t_cand, t_best)

            def sph_body(s, t_best):
                t_cand = _sph_candidate(sph_ref, s, *tri_args, a_ok, a_safe)
                return jnp.minimum(t_cand, t_best)

            t_best = lax.fori_loop(0, n_tris, tri_body, t0)
            t_best = lax.fori_loop(0, n_sph, sph_body, t_best)
            out_ref[0, pl.ds(r0, CH_ROWS), :] = t_best
            return 0

        def tri_body(i, acc):
            t_best, prim_best, u_best, v_best = acc
            t_cand, u, v = _tri_candidate(tri_ref, i, *tri_args)
            better = t_cand < t_best
            return (
                jnp.where(better, t_cand, t_best),
                jnp.where(better, i.astype(jnp.float32), prim_best),
                jnp.where(better, u, u_best),
                jnp.where(better, v, v_best),
            )

        def sph_body(s, acc):
            t_best, prim_best, u_best, v_best = acc
            t_cand = _sph_candidate(sph_ref, s, *tri_args, a_ok, a_safe)
            better = t_cand < t_best
            return (
                jnp.where(better, t_cand, t_best),
                jnp.where(better, (sph_base + s).astype(jnp.float32), prim_best),
                jnp.where(better, 0.0, u_best),
                jnp.where(better, 0.0, v_best),
            )

        z = jnp.zeros((CH_ROWS, RAY_BLK), jnp.float32)
        init = (t0, jnp.full((CH_ROWS, RAY_BLK), -1.0, jnp.float32), z, z)
        acc = lax.fori_loop(0, n_tris, tri_body, init)
        acc = lax.fori_loop(0, n_sph, sph_body, acc)
        t_best, prim_best, u_best, v_best = acc
        out_ref[0, pl.ds(r0, CH_ROWS), :] = t_best
        out_ref[1, pl.ds(r0, CH_ROWS), :] = prim_best
        out_ref[2, pl.ds(r0, CH_ROWS), :] = u_best
        out_ref[3, pl.ds(r0, CH_ROWS), :] = v_best
        return 0

    lax.fori_loop(0, n_chunks, ray_body, 0)


def _pad_comp(x, b_pad):
    b = x.shape[0]
    if b_pad == b:
        return x.reshape(b_pad // RAY_BLK, RAY_BLK)
    return jnp.pad(x, (0, b_pad - b)).reshape(b_pad // RAY_BLK, RAY_BLK)


@functools.partial(
    jax.jit, static_argnames=("sph_base", "interpret", "occlusion")
)
def intersect_prims_pallas_c(
    tri_sc, sph_geom, sph_base, oc, dc, interpret=False, occlusion=False
):
    """Nearest hit over ALL primitives (triangles + spheres) in one kernel.

    tri_sc: (T8, 16) scalar table; sph_geom: (S, 4) [c, r]; sph_base: the
    prim-id offset of sphere 0 (= the padded triangle-table length, so ids
    match the shading tables). oc, dc: component tuples of (B,) arrays —
    marshalling into the kernel's (R, 128) planes is a pad + free reshape,
    never a transpose. Returns (t, prim, u, v); occlusion=True returns only
    t (prim/u/v are None).
    """
    b = oc[0].shape[0]
    blk = CH_ROWS * RAY_BLK
    b_pad = -(-b // blk) * blk
    if b_pad > MEGA:
        b_pad = -(-b_pad // MEGA) * MEGA
    planes = [_pad_comp(x, b_pad) for x in (*oc, *dc)]
    n_out = 1 if occlusion else 4
    kernel = functools.partial(
        _kernel_sc,
        n_tris=tri_sc.shape[0],
        n_sph=sph_geom.shape[0],
        sph_base=sph_base,
        occlusion=occlusion,
    )

    def call(pls):
        rows = pls[0].shape[0]
        return pl.pallas_call(
            functools.partial(kernel, n_chunks=rows // CH_ROWS),
            out_shape=jax.ShapeDtypeStruct((n_out, rows, RAY_BLK), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6
            + [
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
        )(*pls, tri_sc, sph_geom)

    r_mega = MEGA // RAY_BLK
    if b_pad <= MEGA:
        out = call(planes)
    else:
        n_mega = b_pad // MEGA
        outs = jax.lax.map(
            lambda i: call(
                [
                    lax.dynamic_slice(p, (i * r_mega, 0), (r_mega, RAY_BLK))
                    for p in planes
                ]
            ),
            jnp.arange(n_mega),
        )
        out = outs.transpose(1, 0, 2, 3)
    out = out.reshape(n_out, b_pad)
    t = out[0, :b]
    if occlusion:
        return t, None, None, None
    prim = out[1, :b].astype(jnp.int32)
    prim = jnp.where(t < T_MAX, prim, -1)
    return t, prim, out[2, :b], out[3, :b]


def intersect_prims_pallas(
    tri_sc, sph_geom, sph_base, o, d, interpret=False, occlusion=False
):
    """(B, 3)-row wrapper over `intersect_prims_pallas_c` (tests/back-compat)."""
    oc = (o[:, 0], o[:, 1], o[:, 2])
    dc = (d[:, 0], d[:, 1], d[:, 2])
    return intersect_prims_pallas_c(
        tri_sc, sph_geom, sph_base, oc, dc, interpret=interpret, occlusion=occlusion
    )


def _pad_rays(o, d):
    b = o.shape[0]
    b_pad = ((b + RAY_BLK - 1) // RAY_BLK) * RAY_BLK
    if b_pad > MEGA:
        b_pad = ((b_pad + MEGA - 1) // MEGA) * MEGA
    rays = jnp.zeros((8, b_pad), jnp.float32)
    return rays.at[0:3, :b].set(o.T).at[3:6, :b].set(d.T), b_pad


def _dispatch(kernel, rays, tri_t, b_pad, interpret):
    """Run the grid-free kernel on ≤MEGA-lane slices (VMEM bound); lax.map
    over slices for bigger batches."""

    def call(blk):
        n_lanes = blk.shape[1]
        return pl.pallas_call(
            functools.partial(kernel, n_ray_chunks=n_lanes // RAY_BLK),
            out_shape=jax.ShapeDtypeStruct((8, n_lanes), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
        )(blk, tri_t)

    if b_pad <= MEGA:
        return call(rays)
    n_mega = b_pad // MEGA
    outs = jax.lax.map(
        lambda i: call(lax.dynamic_slice(rays, (0, i * MEGA), (8, MEGA))),
        jnp.arange(n_mega),
    )
    return jnp.transpose(outs, (1, 0, 2)).reshape(8, b_pad)


@functools.partial(jax.jit, static_argnames=("interpret", "occlusion"))
def intersect_tris_pallas_mm(tri_kern, o, d, interpret=False, occlusion=False):
    """MXU-formulated nearest-hit (or occlusion) kernel.

    tri_kern: (16, T) scene table, T a multiple of TRI_MM_BLK.
    Returns (t, prim, u, v) like `intersect_tris_pallas`; in occlusion mode
    prim/u/v are garbage (only t is written) — callers use t alone.
    """
    t_cnt = tri_kern.shape[1]
    assert t_cnt % TRI_MM_BLK == 0, t_cnt
    b = o.shape[0]
    rays, b_pad = _pad_rays(o, d)
    tri_t = jnp.transpose(tri_kern)  # (T, 16)
    kernel = functools.partial(
        _kernel_mm, n_tri_chunks=t_cnt // TRI_MM_BLK, occlusion=occlusion
    )
    out = _dispatch(kernel, rays, tri_t, b_pad, interpret)
    t = out[0, :b]
    prim = out[1, :b].astype(jnp.int32)
    prim = jnp.where(t < T_MAX, prim, -1)
    return t, prim, out[2, :b], out[3, :b]


@functools.partial(jax.jit, static_argnames=("interpret",))
def intersect_tris_pallas(tri_kern, o, d, interpret: bool = False):
    """Nearest triangle hit for a ray batch.

    tri_kern: (16, T) scene table (T multiple of 128 >= TRI_BLK).
    o, d: (B, 3) rays.
    Returns (t (B,), prim (B,) int32 [-1 miss], u (B,), v (B,)).
    """
    t_cnt = tri_kern.shape[1]
    assert t_cnt % TRI_BLK == 0, t_cnt
    b = o.shape[0]
    rays, b_pad = _pad_rays(o, d)
    tri_t = jnp.transpose(tri_kern)  # (T, 16); tiny, folded by XLA
    kernel = functools.partial(_kernel, n_tri_chunks=t_cnt // TRI_BLK)
    out = _dispatch(kernel, rays, tri_t, b_pad, interpret)
    t = out[0, :b]
    prim = out[1, :b].astype(jnp.int32)
    prim = jnp.where(t < T_MAX, prim, -1)
    return t, prim, out[2, :b], out[3, :b]
