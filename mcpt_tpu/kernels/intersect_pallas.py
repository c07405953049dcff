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
# remote Mosaic compiler), so MEGA bounds VMEM use: 2 × 8 MB at 1<<18.
# Bigger batches are lax.map'ed over MEGA-sized slices.
MEGA = 1 << 18


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
