"""Area-light sampling over emitter mesh triangles.

Reproduces the reference's two-stage pick exactly:
1. emitter mesh chosen with probability ∝ its total area
   (`Scene::sampleLight`, Scene.cpp:23-37),
2. triangle within the mesh chosen by the BVH area-descent with its √u warp
   (`BVHAccel::Sample`, BVH.cpp:131-135: p = sqrt(u)·rootArea, first leaf
   whose inclusive cumulative area exceeds p),
3. barycentric point with x=√u warp (`Triangle::Sample`, Triangle.hpp:71-76),
4. reported pdf = 1/mesh_area — NOT 1/total_area — which is the reference's
   net effect (leaf pdf 1/triArea × leaf area, ÷ root area; BVH.cpp:118-135).

Device-side this is two vectorized prefix-sum searches over flat emitter
arrays — no tree descent.
"""

from typing import NamedTuple

import jax.numpy as jnp

from mcpt_tpu.utils.gather import gather_rows


class LightSample(NamedTuple):
    p: jnp.ndarray  # (B, 3) point on the light
    n: jnp.ndarray  # (B, 3) light normal
    emit: jnp.ndarray  # (B, 3) emission RGB
    pdf: jnp.ndarray  # (B,) area pdf (1/mesh_area)


class LightSampleC(NamedTuple):
    """Component-form light sample; emit is the per-lane channel scalar."""

    p: tuple  # ((B,),)*3
    n: tuple  # ((B,),)*3
    emit: jnp.ndarray  # (B,) emission at the lane's channel
    pdf: jnp.ndarray  # (B,)


def _sphere_point(row, u2, u3):
    """Uniform point on an emissive sphere row (c = cols 0:3, r = col 3):
    y = 1-2a, azimuth 2πb — pdf 1/(4πr²) (see scene.py emitter notes)."""
    ys = 1.0 - 2.0 * u2
    s = jnp.sqrt(jnp.maximum(1.0 - ys * ys, 0.0))
    ph = 2.0 * jnp.pi * u3
    dv = (s * jnp.cos(ph), ys, s * jnp.sin(ph))
    r = row[:, 3]
    p = (row[:, 0] + r * dv[0], row[:, 1] + r * dv[1], row[:, 2] + r * dv[2])
    return p, dv


def sample_light_c(pack, u, chan) -> LightSampleC:
    """Component/hot-path variant of `sample_light`: identical two-stage
    area-weighted pick, but the gathered row is sliced into (B,) components
    (no (B,3) assembly) and only the lane's emission channel is extracted."""
    ls = _pick(pack, u)
    row, mesh_area, x, y = ls
    w0 = 1.0 - x
    wx = x * (1.0 - y)
    wy = x * y
    # p = v0*(1-x) + (v0+e1)*x(1-y) + (v0+e2)*xy  ==  v0 + e1*x(1-y) + e2*xy
    p = (
        row[:, 0] + row[:, 3] * wx + row[:, 6] * wy,
        row[:, 1] + row[:, 4] * wx + row[:, 7] * wy,
        row[:, 2] + row[:, 5] * wx + row[:, 8] * wy,
    )
    n = (row[:, 9], row[:, 10], row[:, 11])
    if pack.n_sph_emitters:
        is_se = row[:, 16] > 0.5
        ps, ns = _sphere_point(row, u[:, 2], u[:, 3])
        p = tuple(jnp.where(is_se, ps[i], p[i]) for i in range(3))
        n = tuple(jnp.where(is_se, ns[i], n[i]) for i in range(3))
    emit = jnp.where(
        chan == 0, row[:, 12], jnp.where(chan == 1, row[:, 13], row[:, 14])
    )
    pdf = 1.0 / jnp.maximum(mesh_area, 1e-20)
    return LightSampleC(p=p, n=n, emit=emit, pdf=pdf)
    # NOTE: p here folds the (1-x)+x(1-y)+xy = 1 weights of v0 analytically;
    # bit-identical reassociation is covered by test_lights_env tolerances.


def _pick(pack, u):
    """Shared two-stage emitter pick; returns (fat row, mesh_area, x, y)."""
    e = pack.emt_tri.shape[0]
    target = u[:, 0] * pack.emit_total_area
    mesh = jnp.clip(
        jnp.searchsorted(pack.lmesh_cum, target, side="left"),
        0,
        pack.lmesh_cum.shape[0] - 1,
    ).astype(jnp.int32)
    idx = jnp.arange(e, dtype=jnp.int32)
    same_mesh = pack.emt_mesh[None, :] == mesh[:, None]  # (B, E)
    mesh_area = jnp.max(
        jnp.where(same_mesh, pack.emt_mesh_area[None, :], 0.0), axis=1
    )
    p_tgt = jnp.sqrt(u[:, 1]) * mesh_area
    hit = same_mesh & (p_tgt[:, None] < pack.emt_intra_cum[None, :])
    cand = jnp.where(hit, idx[None, :], e)
    sel = jnp.min(cand, axis=1)
    last = jnp.max(jnp.where(same_mesh, idx[None, :], -1), axis=1)
    sel = jnp.where(sel >= e, last, sel).astype(jnp.int32)
    sel = jnp.clip(sel, 0, e - 1)
    row = gather_rows(pack.emt_fat, sel)
    x = jnp.sqrt(u[:, 2])
    y = u[:, 3]
    return row, mesh_area, x, y


def sample_light(pack, u):
    """u: (B, 4) uniforms → LightSample. Requires pack.n_emitters > 0.

    Stage 1: mesh pick, first mesh with target <= cumulative area
    (Scene.cpp:28-36; inclusive bound via searchsorted 'left').
    Stage 2: triangle within mesh, p = sqrt(u)*meshArea, first emitter tri
    of that mesh with p < intra_cum (BVH.cpp:120-135 area descent).
    Stage 3: point in triangle with the sqrt warp (Triangle.hpp:71-76);
    geometry/emission from one fused one-hot gather (emt_fat layout in
    scene.py: v0, e1, e2, n, emit, 1/mesh_area).
    """
    row, mesh_area, xs, ys = _pick(pack, u)
    v0, e1v, e2v = row[:, 0:3], row[:, 3:6], row[:, 6:9]
    x = xs[:, None]
    y = ys[:, None]
    p = v0 * (1.0 - x) + (v0 + e1v) * (x * (1.0 - y)) + (v0 + e2v) * (x * y)
    n = row[:, 9:12]
    if pack.n_sph_emitters:
        is_se = (row[:, 16] > 0.5)[:, None]
        ps, ns = _sphere_point(row, u[:, 2], u[:, 3])
        p = jnp.where(is_se, jnp.stack(ps, -1), p)
        n = jnp.where(is_se, jnp.stack(ns, -1), n)
    pdf = 1.0 / jnp.maximum(mesh_area, 1e-20)
    return LightSample(p=p, n=n, emit=row[:, 12:15], pdf=pdf)
