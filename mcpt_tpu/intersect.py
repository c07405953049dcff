"""Ray-scene intersection: dense MXU path, stackless BVH path, brute oracle.

Semantics reproduce the reference exactly:
- Möller-Trumbore triangle test with the ``|det| < EPSILON`` miss and
  inclusive barycentric bounds, accepting t >= 0 (`src/Triangle.hpp:222-252`),
- analytic sphere quadratic with the numerically-stable q-form of
  `solveQuadratic` (`src/Sphere.hpp:26-48`, `src/global.hpp:20-35`),
- AABB slab test with ±EPSILON slack (`src/Bounds3.hpp:95-108`),
- nearest hit wins (`src/BVH.cpp:113-115`).

The *implementations* are TPU-native:
- **Dense path** (small scenes): each triangle carries a precomputed
  world→unit-triangle affine transform (rows of [e1|e2|e1×e2]⁻¹, built in
  scene.py), so transforming a ray batch against every triangle is two
  ``(B,3) @ (3,3T)`` matmuls that run on the MXU, followed by elementwise
  accept tests and an argmin. No per-triangle cross products at trace time.
- **BVH path** (large scenes): lockstep traversal — every ray in the batch
  walks its own node pointer through the threaded flat BVH inside one
  `lax.while_loop`; leaves test up to `leaf_size` primitives per visit with
  gathered geometry. No recursion, no stack, fixed-shape state.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from mcpt_tpu.constants import EPSILON, T_MAX
from mcpt_tpu.utils.gather import gather_rows

_HI = lax.Precision.HIGHEST


class Hit(NamedTuple):
    """Nearest-hit record. prim: triangle index, or n_tris + sphere index,
    or -1 for a miss. t is T_MAX on miss. (u,v) are the triangle barycentrics
    of the winner (0 for spheres/misses) — carried here so shading never
    recomputes the intersection."""

    t: jnp.ndarray  # (B,)
    prim: jnp.ndarray  # (B,) int32
    u: jnp.ndarray  # (B,)
    v: jnp.ndarray  # (B,)


class Surface(NamedTuple):
    """Shading info at the nearest hit (reference Intersection.hpp:12-29)."""

    happened: jnp.ndarray  # (B,) bool
    p: jnp.ndarray  # (B, 3) hit coordinates
    n: jnp.ndarray  # (B, 3) geometric normal (not flipped; two-sided BSDF)
    uv: jnp.ndarray  # (B, 2) interpolated texture coords
    mat: jnp.ndarray  # (B,) int32 material id
    emissive: jnp.ndarray  # (B,) bool
    t: jnp.ndarray  # (B,)


class SurfaceC(NamedTuple):
    """Component-form Surface: p/n are 3-tuples of (B,), uv a 2-tuple —
    the hot-path layout (see utils/vec.py)."""

    happened: jnp.ndarray  # (B,) bool
    p: tuple  # ((B,),)*3
    n: tuple  # ((B,),)*3
    uv: tuple  # ((B,),)*2
    mat: jnp.ndarray  # (B,) int32
    emissive: jnp.ndarray  # (B,) bool
    t: jnp.ndarray  # (B,)


# ---------------------------------------------------------------------------
# Sphere test (shared)
# ---------------------------------------------------------------------------


def _sphere_t(pack, o, d):
    """(B,S) hit distances against all spheres; T_MAX on miss."""
    L = o[:, None, :] - pack.sph_c[None, :, :]  # (B,S,3)
    a = jnp.sum(d * d, axis=-1)[:, None]  # (B,1)
    b = 2.0 * jnp.einsum("bi,bsi->bs", d, L, precision=_HI)
    c = jnp.sum(L * L, axis=-1) - (pack.sph_r * pack.sph_r)[None, :]
    disc = b * b - 4.0 * a * c
    # a = |d|² = 0 for zero-direction (TIR) rays: 0/0 below would NaN the
    # whole reverse pass; such rays can never legitimately hit.
    ok = (disc >= 0.0) & (pack.sph_r > 0.0)[None, :] & (a > 1e-12)
    a_safe = jnp.maximum(a, 1e-12)
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    # global.hpp:20-35 stable form: q = -(b ± sqrt)/2, roots q/a and c/q.
    q = jnp.where(b > 0.0, -0.5 * (b + sq), -0.5 * (b - sq))
    qs = jnp.where(jnp.abs(q) > 1e-10, q, 1.0)  # grad-safe reciprocal
    x0 = q / a_safe
    x1 = c / qs
    t0 = jnp.minimum(x0, x1)
    t1 = jnp.maximum(x0, x1)
    t = jnp.where(t0 < 0.0, t1, t0)
    ok &= t >= 0.0
    return jnp.where(ok, t, T_MAX)


# ---------------------------------------------------------------------------
# Dense (matmul) triangle path
# ---------------------------------------------------------------------------


def intersect_dense(pack, o, d) -> Hit:
    """Nearest hit via MXU-batched unit-triangle transforms.

    Two (B,3)@(3,3T) matmuls produce ray origin/direction in every triangle's
    barycentric frame; t = -o'_z/d'_z, (u,v) = o'_xy + t d'_xy.
    """
    t_cnt = pack.tri_v0.shape[0]
    wf = pack.tri_w.reshape(t_cnt * 3, 3)  # rows (t, i)
    dp = jnp.dot(d, wf.T, precision=_HI).reshape(-1, t_cnt, 3)
    op = jnp.dot(o, wf.T, precision=_HI).reshape(-1, t_cnt, 3) - pack.tri_c[None]
    dz = dp[:, :, 2]
    oz = op[:, :, 2]
    # Reference det-epsilon miss: det = e1·(d×e2) = -d'_z·|e1×e2|²
    # (Triangle.hpp:228), tested as |det| < EPSILON. t is computed THROUGH
    # the guarded det (t = o'_z·nr2/det ≡ -o'_z/d'_z on accepted lanes): the
    # raw 1/d'_z form has unbounded reverse-mode partials on rejected lanes
    # (d'_z ~ det/nr2 can be ~1e-19 for large triangles), which turn the
    # zero cotangents of masked lanes into 0·inf = NaN under grad.
    det = -dz * pack.tri_nr2[None, :]
    det_g = jnp.where(jnp.abs(det) >= EPSILON, det, 1.0)
    t_hit = oz * pack.tri_nr2[None, :] / det_g
    u = op[:, :, 0] + t_hit * dp[:, :, 0]
    v = op[:, :, 1] + t_hit * dp[:, :, 1]
    ok = (
        (jnp.abs(det) >= EPSILON)
        & (u >= 0.0)
        & (u <= 1.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t_hit >= 0.0)
        & pack.tri_valid[None, :]
    )
    t_arr = jnp.where(ok, t_hit, T_MAX)

    sph_t = _sphere_t(pack, o, d)
    all_t = jnp.concatenate([t_arr, sph_t], axis=1)
    prim = jnp.argmin(all_t, axis=1).astype(jnp.int32)
    t_best = jnp.take_along_axis(all_t, prim[:, None], axis=1)[:, 0]
    is_tri = prim < t_cnt
    tid = jnp.where(is_tri, prim, 0)[:, None]
    u_best = jnp.where(is_tri, jnp.take_along_axis(u, tid, axis=1)[:, 0], 0.0)
    v_best = jnp.where(is_tri, jnp.take_along_axis(v, tid, axis=1)[:, 0], 0.0)
    prim = jnp.where(t_best < T_MAX, prim, -1)
    return Hit(t=t_best, prim=prim, u=u_best, v=v_best)


# ---------------------------------------------------------------------------
# Gathered single-primitive tests (BVH leaves)
# ---------------------------------------------------------------------------


def _tri_test_gather(pack, pid, o, d):
    """Per-lane Möller-Trumbore against gathered triangle `pid` (B,)."""
    row = pack.tri_mt[pid]  # one fused 9-float gather
    v0 = row[:, 0:3]
    e1 = row[:, 3:6]
    e2 = row[:, 6:9]
    pvec = jnp.cross(d, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    # EPS-guarded reciprocal: grad-safe (see intersect_dense comment).
    det_safe = jnp.where(jnp.abs(det) >= EPSILON, det, 1.0)
    inv = 1.0 / det_safe
    tvec = o - v0
    u = jnp.sum(tvec * pvec, axis=-1) * inv
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(d * qvec, axis=-1) * inv
    t = jnp.sum(e2 * qvec, axis=-1) * inv
    ok = (
        (jnp.abs(det) >= EPSILON)
        & (u >= 0.0)
        & (u <= 1.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t >= 0.0)
        & pack.tri_valid[pid]
    )
    return jnp.where(ok, t, T_MAX), u, v


def _sphere_test_gather(pack, sid, o, d):
    """Per-lane quadratic against gathered sphere `sid` (B,)."""
    row = pack.sph_geom[sid]
    c0 = row[:, 0:3]
    r = row[:, 3]
    L = o - c0
    a = jnp.sum(d * d, axis=-1)
    b = 2.0 * jnp.sum(d * L, axis=-1)
    c = jnp.sum(L * L, axis=-1) - r * r
    disc = b * b - 4.0 * a * c
    ok = (disc >= 0.0) & (r > 0.0) & (a > 1e-12)
    a_safe = jnp.maximum(a, 1e-12)
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    q = jnp.where(b > 0.0, -0.5 * (b + sq), -0.5 * (b - sq))
    qs = jnp.where(jnp.abs(q) > 1e-10, q, 1.0)  # grad-safe reciprocal
    x0 = q / a_safe
    x1 = c / qs
    t0 = jnp.minimum(x0, x1)
    t1 = jnp.maximum(x0, x1)
    t = jnp.where(t0 < 0.0, t1, t0)
    ok &= t >= 0.0
    return jnp.where(ok, t, T_MAX)


# ---------------------------------------------------------------------------
# Stackless lockstep BVH traversal
# ---------------------------------------------------------------------------


def intersect_bvh(pack, o, d) -> Hit:
    """Every lane walks the threaded BVH in lockstep inside one while_loop.

    One fat-row gather per node visit (bounds + miss link + inlined leaf
    prim ids, see scene.py `bvh_fat`) and one 9-float gather per leaf slot
    (`tri_mt`) — gathers, not FLOPs, dominate TPU traversal cost.
    """
    b = o.shape[0]
    n_tris = pack.tri_v0.shape[0]
    dinv = 1.0 / d
    leaf_size = pack.bvh_fat.shape[1] - 8

    def cond(state):
        return jnp.any(state[0] >= 0)

    def body(state):
        node, t_best, prim_best, u_best, v_best = state
        active = node >= 0
        nidx = jnp.maximum(node, 0)
        row = pack.bvh_fat[nidx]  # (B, 8+L)
        nmin = row[:, 0:3]
        nmax = row[:, 3:6]
        miss = row[:, 6].astype(jnp.int32)
        count = row[:, 7]
        # Slab test with EPSILON slack (Bounds3.hpp:95-108).
        vt1 = (nmin - o) * dinv
        vt2 = (nmax - o) * dinv
        tmin = jnp.max(jnp.minimum(vt1, vt2), axis=-1)
        tmax = jnp.min(jnp.maximum(vt1, vt2), axis=-1)
        hit_box = (tmin - EPSILON <= tmax) & (tmax >= -EPSILON) & active
        # Early-out: a box farther than the current best can't improve the
        # nearest hit (pure optimization; never changes the result).
        hit_box &= tmin - EPSILON <= t_best

        is_leaf = (count > 0.0) & hit_box
        for s in range(leaf_size):
            pid = row[:, 8 + s].astype(jnp.int32)
            slot_ok = is_leaf & (pid >= 0)
            pid = jnp.where(slot_ok, pid, 0)
            is_tri = pid < n_tris
            t_tri, u_tri, v_tri = _tri_test_gather(
                pack, jnp.minimum(pid, n_tris - 1), o, d
            )
            sid = jnp.clip(pid - n_tris, 0, pack.sph_r.shape[0] - 1)
            t_sph = _sphere_test_gather(pack, sid, o, d)
            t_cand = jnp.where(is_tri, t_tri, t_sph)
            t_cand = jnp.where(slot_ok, t_cand, T_MAX)
            better = t_cand < t_best
            t_best = jnp.where(better, t_cand, t_best)
            prim_best = jnp.where(better, pid, prim_best)
            u_best = jnp.where(better & is_tri, u_tri, jnp.where(better, 0.0, u_best))
            v_best = jnp.where(better & is_tri, v_tri, jnp.where(better, 0.0, v_best))

        interior_hit = hit_box & (count <= 0.0)
        nxt = jnp.where(interior_hit, node + 1, miss)
        nxt = jnp.where(active, nxt, -1)
        return nxt, t_best, prim_best, u_best, v_best

    node0 = jnp.zeros(b, jnp.int32)
    t0 = jnp.full(b, T_MAX, jnp.float32)
    p0 = jnp.full(b, -1, jnp.int32)
    z0 = jnp.zeros(b, jnp.float32)
    node, t_best, prim_best, u_best, v_best = lax.while_loop(
        cond, body, (node0, t0, p0, z0, z0)
    )
    prim_best = jnp.where(t_best < T_MAX, prim_best, -1)
    return Hit(t=t_best, prim=prim_best, u=u_best, v=v_best)


def intersect_pallas_c(pack, oc, dc) -> Hit:
    """All primitives (triangles + spheres) in one fused SC Pallas kernel.

    The scalar-constant kernel loops primitives as SMEM scalars over dense
    (8,128) ray tiles — ~6x the MXU-matmul kernel on small scenes (which
    additionally pads triangles to 128). Scenes whose triangle table exceeds
    the kernel's SMEM budget fall back to the MXU kernel."""
    from mcpt_tpu.kernels.intersect_pallas import (
        SC_MAX_TRIS,
        intersect_prims_pallas_c,
        intersect_tris_pallas_mm,
    )

    interpret = jax.default_backend() != "tpu"
    n_tris = pack.tri_v0.shape[0]
    if pack.tri_sc.shape[0] <= SC_MAX_TRIS:
        t_best, prim, u, v = intersect_prims_pallas_c(
            pack.tri_sc, pack.sph_geom, n_tris, oc, dc, interpret=interpret
        )
        return Hit(t=t_best, prim=prim, u=u, v=v)
    o = jnp.stack(oc, axis=-1)
    d = jnp.stack(dc, axis=-1)
    t_tri, prim_tri, u, v = intersect_tris_pallas_mm(
        pack.tri_kern, o, d, interpret=interpret
    )
    sph_t = _sphere_t(pack, o, d)
    s_min = jnp.min(sph_t, axis=1)
    s_arg = jnp.argmin(sph_t, axis=1).astype(jnp.int32)
    sph_wins = s_min < t_tri
    t_best = jnp.where(sph_wins, s_min, t_tri)
    prim = jnp.where(sph_wins, n_tris + s_arg, prim_tri)
    prim = jnp.where(t_best < T_MAX, prim, -1)
    u = jnp.where(sph_wins, 0.0, u)
    v = jnp.where(sph_wins, 0.0, v)
    return Hit(t=t_best, prim=prim, u=u, v=v)


def intersect_pallas(pack, o, d) -> Hit:
    return intersect_pallas_c(
        pack, (o[:, 0], o[:, 1], o[:, 2]), (d[:, 0], d[:, 1], d[:, 2])
    )


# Triangle-table size above which the all-pairs paths give way to the BVH.
DENSE_MAX_TRIS = 4096

# Gate: the fused Pallas kernel is the default small-scene path on TPU —
# validated on hardware (exact t/prim agreement with the dense path; ~4x
# faster at B=1M: 43 vs 11.6 Mrays/s on v5e). Export MCPT_PALLAS=0 to fall
# back to the pure-XLA dense path.
import os

_USE_PALLAS = os.environ.get("MCPT_PALLAS", "1") == "1"


def _resolve_method(pack, method: str) -> str:
    if method == "auto":
        if pack.tri_v0.shape[0] <= DENSE_MAX_TRIS:
            use_pallas = _USE_PALLAS and jax.default_backend() == "tpu"
            method = "pallas" if use_pallas else "dense"
        else:
            method = "bvh"
    return method


def intersect_c(pack, oc, dc, method: str = "auto") -> Hit:
    """Component-form nearest hit: oc/dc are 3-tuples of (B,) arrays."""
    method = _resolve_method(pack, method)
    if method == "pallas":
        return intersect_pallas_c(pack, oc, dc)
    o = jnp.stack(oc, axis=-1)
    d = jnp.stack(dc, axis=-1)
    if method == "dense":
        return intersect_dense(pack, o, d)
    if method == "bvh":
        return intersect_bvh(pack, o, d)
    raise ValueError(f"unknown intersect method {method!r}")


def intersect(pack, o, d, method: str = "auto") -> Hit:
    method = _resolve_method(pack, method)
    if method == "pallas":
        return intersect_pallas(pack, o, d)
    if method == "dense":
        return intersect_dense(pack, o, d)
    if method == "bvh":
        return intersect_bvh(pack, o, d)
    raise ValueError(f"unknown intersect method {method!r}")


def occlude_t_c(pack, oc, dc, method: str = "auto") -> jnp.ndarray:
    """Nearest-hit distance only (T_MAX on miss) — the shadow-ray query.

    Visibility in the reference is `|t_nearest − dist| < EPSILON`
    (Scene.cpp:73-75); it never needs the winning primitive or its
    barycentrics, so the Pallas path runs an occlusion kernel that skips all
    winner bookkeeping (~25% fewer VPU ops on 4/5 of all rays traced)."""
    method = _resolve_method(pack, method)
    if method == "pallas":
        from mcpt_tpu.kernels.intersect_pallas import (
            SC_MAX_TRIS,
            intersect_prims_pallas_c,
            intersect_tris_pallas_mm,
        )

        interpret = jax.default_backend() != "tpu"
        if pack.tri_sc.shape[0] <= SC_MAX_TRIS:
            return intersect_prims_pallas_c(
                pack.tri_sc,
                pack.sph_geom,
                pack.tri_v0.shape[0],
                oc,
                dc,
                interpret=interpret,
                occlusion=True,
            )[0]
        o = jnp.stack(oc, axis=-1)
        d = jnp.stack(dc, axis=-1)
        t_tri = intersect_tris_pallas_mm(
            pack.tri_kern, o, d, interpret=interpret, occlusion=True
        )[0]
        return jnp.minimum(t_tri, jnp.min(_sphere_t(pack, o, d), axis=1))
    return intersect_c(pack, oc, dc, method=method).t


def occlude_t(pack, o, d, method: str = "auto") -> jnp.ndarray:
    return occlude_t_c(
        pack, (o[:, 0], o[:, 1], o[:, 2]), (d[:, 0], d[:, 1], d[:, 2]), method=method
    )


# ---------------------------------------------------------------------------
# Shading info
# ---------------------------------------------------------------------------


def surface_at_c(pack, oc, dc, hit: Hit) -> SurfaceC:
    """Shading info for the winning primitive per lane (component form).

    One one-hot MXU gather against the fused tri_shade / sph_shade tables
    (see utils/gather.py — native TPU gathers measured 10-30x slower);
    barycentrics come from the Hit record, so nothing is re-intersected.
    """
    n_tris = pack.tri_v0.shape[0]
    happened = hit.prim >= 0
    is_tri = happened & (hit.prim < n_tris)
    tid = jnp.where(is_tri, hit.prim, -1)
    sid = jnp.where(happened & ~is_tri, hit.prim - n_tris, -1)

    # Missed lanes keep p = o: o + d*T_MAX overflows every downstream
    # computation fed from p (shadow-ray transforms hit inf, and inf*0 from
    # their masks poisons reverse-mode with NaNs).
    t_eff = jnp.where(happened, hit.t, 0.0)
    p = (oc[0] + dc[0] * t_eff, oc[1] + dc[1] * t_eff, oc[2] + dc[2] * t_eff)

    ts = gather_rows(pack.tri_shade, tid)  # (B, 11); zero row when not a tri
    u = hit.u
    v = hit.v
    w0 = 1.0 - u - v
    uv_tri = (
        w0 * ts[:, 3] + u * ts[:, 5] + v * ts[:, 7],
        w0 * ts[:, 4] + u * ts[:, 6] + v * ts[:, 8],
    )
    ss = gather_rows(pack.sph_shade, sid)  # (B, 5); zero row when not a sphere
    ns = (p[0] - ss[:, 0], p[1] - ss[:, 1], p[2] - ss[:, 2])
    inv = 1.0 / jnp.maximum(
        jnp.sqrt(ns[0] * ns[0] + ns[1] * ns[1] + ns[2] * ns[2]), 1e-20
    )
    n_sph = (ns[0] * inv, ns[1] * inv, ns[2] * inv)

    n = (
        jnp.where(is_tri, ts[:, 0], n_sph[0]),
        jnp.where(is_tri, ts[:, 1], n_sph[1]),
        jnp.where(is_tri, ts[:, 2], n_sph[2]),
    )
    zero = jnp.zeros_like(u)
    uv = (
        jnp.where(is_tri, uv_tri[0], zero),
        jnp.where(is_tri, uv_tri[1], zero),
    )
    mat = jnp.where(is_tri, ts[:, 9], ss[:, 3]).astype(jnp.int32)
    mat = jnp.where(happened, mat, 0)
    emissive = happened & (jnp.where(is_tri, ts[:, 10], ss[:, 4]) > 0.5)
    return SurfaceC(
        happened=happened, p=p, n=n, uv=uv, mat=mat, emissive=emissive, t=hit.t
    )


def surface_at(pack, o, d, hit: Hit) -> Surface:
    """(B, 3)-row wrapper over `surface_at_c` (tests/back-compat)."""
    sc = surface_at_c(
        pack, (o[:, 0], o[:, 1], o[:, 2]), (d[:, 0], d[:, 1], d[:, 2]), hit
    )
    return Surface(
        happened=sc.happened,
        p=jnp.stack(sc.p, axis=-1),
        n=jnp.stack(sc.n, axis=-1),
        uv=jnp.stack(sc.uv, axis=-1),
        mat=sc.mat,
        emissive=sc.emissive,
        t=sc.t,
    )


# ---------------------------------------------------------------------------
# Brute-force oracle (tests only): direct per-(ray, tri) Möller-Trumbore
# ---------------------------------------------------------------------------


def intersect_brute(pack, o, d) -> Hit:
    def one(o1, d1):
        pvec = jnp.cross(d1[None, :], pack.tri_e2)
        det = jnp.sum(pack.tri_e1 * pvec, axis=-1)
        det_safe = jnp.where(jnp.abs(det) > 0.0, det, 1.0)
        inv = 1.0 / det_safe
        tvec = o1[None, :] - pack.tri_v0
        u = jnp.sum(tvec * pvec, axis=-1) * inv
        qvec = jnp.cross(tvec, pack.tri_e1)
        v = jnp.sum(d1[None, :] * qvec, axis=-1) * inv
        t = jnp.sum(pack.tri_e2 * qvec, axis=-1) * inv
        ok = (
            (jnp.abs(det) >= EPSILON)
            & (u >= 0.0)
            & (u <= 1.0)
            & (v >= 0.0)
            & (u + v <= 1.0)
            & (t >= 0.0)
            & pack.tri_valid
        )
        return jnp.where(ok, t, T_MAX), u, v

    t_tri, u, v = jax.vmap(one)(o, d)
    t_cnt = pack.tri_v0.shape[0]
    sph_t = _sphere_t(pack, o, d)
    all_t = jnp.concatenate([t_tri, sph_t], axis=1)
    prim = jnp.argmin(all_t, axis=1).astype(jnp.int32)
    t_best = jnp.take_along_axis(all_t, prim[:, None], axis=1)[:, 0]
    is_tri = prim < t_cnt
    tid = jnp.where(is_tri, prim, 0)[:, None]
    u_best = jnp.where(is_tri, jnp.take_along_axis(u, tid, axis=1)[:, 0], 0.0)
    v_best = jnp.where(is_tri, jnp.take_along_axis(v, tid, axis=1)[:, 0], 0.0)
    prim = jnp.where(t_best < T_MAX, prim, -1)
    return Hit(t=t_best, prim=prim, u=u_best, v=v_best)
