"""Single-kernel ("megakernel") TPU path tracer.

One `pallas_call` renders a block of up to MEGA_LANES (pixel, channel) lanes
end-to-end: camera-ray generation, the full bounce loop (nearest-hit
intersection, GGX microfacet shading, next-event-estimation shadow rays,
Russian roulette), the reference's nested per-level firefly-clamp recursion,
and the spp loop — all inside one kernel invocation.

Why: device traces of the wavefront JAX integrator (integrator.py) show
~70% of per-bounce time in XLA elementwise fusions streaming (B,) and (S,B)
temporaries through HBM (light-sample tables, BSDF partials, one-hot gather
matrices), not in the intersection kernels. Here every per-lane quantity
lives in vector registers / VMEM scratch for the whole path; the only HBM
traffic is the final per-lane radiance + ray-count planes (8 B per lane).

Semantics = `Scene::castRay` / `Scene::directLighting`
(src/Scene.cpp:56-184) with the same re-expressions as integrator.py
(bounce cap + reverse clamp fold; see its module docstring), and camera
sampling per src/Renderer.cpp:44-76. Differences vs the JAX wavefront path:

- RNG is a counter-based murmur3-finalizer hash keyed on
  (pixel-or-lane, sample, bounce, use-site) — deterministic, reproducible,
  independent of block/tile sizes, and like the reference the three spectral
  lanes of a pixel share one primary camera ray (camera draws key on the
  *pixel*, path draws on the *lane*). Stream identity differs from the
  threefry draws of integrator.py, so images agree statistically (same
  estimator, same means), not bitwise.
- Environment maps run two-tier (regen kernel only): primary misses are
  counted per lane (output plane 2) and shaded by a deferred full-resolution
  bilinear pass that reproduces the kernel's camera draws bit-exactly
  (_primary_env_mean) — exact for fully-sky pixels, sub-pixel-approximate at
  geometry edges; secondary bounces sample a 16x32 SMEM mip by nearest texel
  (TPU has no per-lane gather; the mip select-loop costs ~5 ops/texel). The
  wavefront integrator remains the full-res parity oracle.

Scene tables live in SMEM (scalar memory): the scalar core streams
primitive/material/emitter constants ahead of the VPU while every vector op
runs on dense (8, 128) ray tiles. Scenes above MEGA_MAX_TRIS triangles fall
back to the wavefront path.

Hard constraints inherited from kernels/intersect_pallas.py (this image's
remote Mosaic compiler): no grid/BlockSpecs (fori_loop over ray chunks
instead), no narrow trailing dims, rays stay on the lane axis end-to-end.
"""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mcpt_tpu.constants import (
    CLAMP_DIRECT,
    CLAMP_INDIRECT,
    EPSILON,
    REL_EPS,
    T_MAX,
    WAVELEN_UM,
)
from mcpt_tpu.kernels.cluster import (
    N_RES,
    R_EM,
    R_MAT,
    R_N0,
    R_N1,
    R_N2,
    R_SPH,
    R_T,
    R_UVX,
    R_UVY,
    cluster_fan_and_near,
    cluster_occlude_fan,
    cluster_query_chunk,
)

CH_ROWS = 8  # ray rows per chunk: one (8, 128) register tile
LANE = 128
CHUNK = CH_ROWS * LANE  # 1024 lanes per inner chunk
MEGA_LANES = 1 << 20  # lanes per pallas_call (VMEM: 2 out planes = 8 MB)
MEGA_MAX_TRIS = 1024  # SMEM triangle-table budget ((1024, 25) f32 = 100 KB)

# Forward-fold constants (regen kernel): the identity map's C (any value
# ≥ a+5 ≈ 20 works — after the first compose C ≤ 20 always) and the cap on
# the composed weight product W (prevents inf/NaN in W·leaf for pathological
# w chains; the cap only binds where the map is saturated anyway).
FOLD_BIG = 1.0e30
FOLD_W_CAP = 1.0e30

# In-kernel environment-map mip (secondary bounces only; primary misses are
# shaded full-res by a deferred pass — see render_mega). 16x32 equirect
# texels = 11.25° each; K must be a multiple of 128 lanes.
# Measured approximation error vs the full-res wavefront oracle
# (tests/test_mega_env.py::test_mega_env_structured_map_bounded_error,
# demo box, whole-image mean): smooth gradient/sky maps ≤0.5%; a 5.6°
# (strictly sub-texel) checkerboard 0.82%; a single-texel 20x point sun
# on a dark sky 2.6% (the worst case: concentrated energy smeared over
# one 11.25° texel). CI bounds sit at 10%/15% over those measurements.
ENV_MIP_H = 16
ENV_MIP_W = 32
ENV_MIP_K = ENV_MIP_H * ENV_MIP_W
ENV_MIP_ROWS = ENV_MIP_K // 128  # SMEM rows per channel plane
# θ-row boundaries expressed in cos θ = d_y, so the row pick needs no acos:
# row = #{r : y < cos(πr/H)} = floor(θ·H/π).
_ENV_COS_BOUNDS = tuple(
    float(np.cos(np.pi * r / ENV_MIP_H)) for r in range(1, ENV_MIP_H)
)

_U = jnp.uint32


# ---------------------------------------------------------------------------
# Counter-based RNG: murmur3 finalizer (constant shifts only — Mosaic lowers
# these on the VPU; uint32->f32 casts are unsupported so unit floats go
# through a 24-bit int32 mantissa path).
# ---------------------------------------------------------------------------


# Perf-debug only (MCPT_MEGA_ABLATE=rng): degrade the murmur finalizer to
# identity to measure the RNG's share of kernel time (draw values still vary
# via the multiplicative key mix, but are NOT uniform-quality).
_RNG_CHEAP = "rng" in os.environ.get("MCPT_MEGA_ABLATE", "")
# r5 experiment: select-before-compute BSDF eval — ONE half-vector
# normalize + ONE full Fresnel per eval instead of two of each
# (bitwise-identical output; −19% of _eval_bsdf's jaxpr primitives, −24% of
# its sqrt/rsqrt/div). Measured NEUTRAL-to-−1% on both kernels
# (benchmarks/evalfuse_chess.py: demo 0.99x, clustered within drift noise):
# the VPU has spare issue slots in this kernel, and selecting the candidate
# first SERIALIZES work the two-normalize form issued in parallel — op
# count is not the bound here (see PERF.md "eval fusion"). Default stays
# the measured-headline program; =1 enables the fused form.
_EVAL_FUSED = os.environ.get("MCPT_EVAL_FUSED", "0") != "0"


def _murmur(x):
    if _RNG_CHEAP:
        return x
    x = x ^ (x >> _U(16))
    x = x * _U(0x85EBCA6B)
    x = x ^ (x >> _U(13))
    x = x * _U(0xC2B2AE35)
    x = x ^ (x >> _U(16))
    return x


def _unit(x):
    """uint32 bits -> float32 in [0, 1)."""
    bits = (x >> _U(8)).astype(jnp.int32)  # < 2^24: exact & sign-safe
    return bits.astype(jnp.float32) * jnp.float32(1.0 / 16777216.0)


def _draw(key_tile, ctr):
    """One uniform per lane: key_tile is the per-lane uint32 id (pixel or
    lane), ctr a uint32 scalar folding (seed, sample, depth, use-site)."""
    return _unit(_murmur(key_tile * _U(0x9E3779B1) + ctr))


# ---------------------------------------------------------------------------
# Tile-math helpers (all operate on (8, 128) f32 tiles)
# ---------------------------------------------------------------------------


def _dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _sub(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def _add(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def _scale(a, s):
    return (a[0] * s, a[1] * s, a[2] * s)


def _neg(a):
    return (-a[0], -a[1], -a[2])


def _where3(c, a, b):
    return (
        jnp.where(c, a[0], b[0]),
        jnp.where(c, a[1], b[1]),
        jnp.where(c, a[2], b[2]),
    )


def _cross(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def _normalize(a):
    inv = jax.lax.rsqrt(jnp.maximum(_dot(a, a), 1e-20))
    return _scale(a, inv)


def _ssqrt(x):
    return jnp.sqrt(jnp.maximum(x, 1e-12))


def _reflect(wo, n):
    # Material.hpp:195-197: 2(wo.n)n - wo
    s = 2.0 * _dot(wo, n)
    return _sub(_scale(n, s), wo)


def _atan2_poly(z, x):
    """atan2(z, x) on tiles — Mosaic has no inverse-trig lowering, so use an
    odd minimax polynomial on q = min/max ∈ [0,1] (max err ~1e-5 rad, i.e.
    ~1e-4 of an ENV_MIP_W texel) + octant reconstruction."""
    ax = jnp.abs(x)
    az = jnp.abs(z)
    mx = jnp.maximum(ax, az)
    mn = jnp.minimum(ax, az)
    q = mn / jnp.maximum(mx, 1e-20)
    q2 = q * q
    a = q * (
        0.99997726
        + q2
        * (
            -0.33262347
            + q2
            * (0.19354346 + q2 * (-0.11643287 + q2 * (0.05265332 - q2 * 0.01172120)))
        )
    )
    a = jnp.where(az > ax, jnp.float32(0.5 * np.pi) - a, a)
    a = jnp.where(x < 0.0, jnp.float32(np.pi) - a, a)
    return jnp.where(z < 0.0, -a, a)


def _env_mip_lookup(env_ref, wi, is_r, is_g, is_b):
    """Per-lane single-channel env radiance from the SMEM mip (nearest
    texel). Direction→UV mapping matches envmap.sample_env_chan_c
    (reference Scene.hpp:60-99): phi = atan2(z, x), theta = acos(y) — the
    θ row comes from counting precomputed cos-boundaries (no acos needed).

    The per-lane gather is a scalar-broadcast select loop over the K mip
    texels (TPU has no per-lane dynamic gather): ~5 vector ops per texel.
    Used only for SECONDARY env lookups (bounce rays); primary misses are
    deferred to a full-resolution XLA pass (render_mega)."""
    inv = jax.lax.rsqrt(jnp.maximum(_dot(wi, wi), 1e-20))
    y = wi[1] * inv
    row = jnp.zeros_like(y)
    for b in _ENV_COS_BOUNDS:
        row += jnp.where(y < b, 1.0, 0.0)
    phi = _atan2_poly(wi[2] * inv, wi[0] * inv)
    u = (phi + jnp.float32(np.pi)) * jnp.float32(0.5 / np.pi)
    col = jnp.clip(jnp.floor(u * ENV_MIP_W), 0.0, ENV_MIP_W - 1)
    idx = row * ENV_MIP_W + col

    def body(k, acc):
        sel = idx == k.astype(jnp.float32)
        pr = k >> 7
        pc = k & 127
        val = (
            is_r * env_ref[pr, pc]
            + is_g * env_ref[ENV_MIP_ROWS + pr, pc]
            + is_b * env_ref[2 * ENV_MIP_ROWS + pr, pc]
        )
        return jnp.where(sel, val, acc)

    return lax.fori_loop(0, ENV_MIP_K, body, jnp.zeros_like(y))


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------

def _lane_to_pixel(lane, cam):
    """(virtual lane) -> (pixel id, channel, fi, fj, actual lane, stream).

    Without tiling the virtual lane IS pixel*3+chan (pixel-major scanline
    order: a 1024-lane chunk covers a ~341x1 pixel strip; stream is 0).
    With cam["tile"] = (TW, TH, TPR, S) the virtual pixel axis is permuted
    into TWxTH tiles over a padded W x (H*S) grid: virtual row j maps to
    real row j//S and SAMPLE STREAM j%S — each pixel owns S lanes, each
    rendering the samples s ≡ stream (mod S) of its budget. A chunk's
    spatial footprint shrinks S-fold (8x64 virtual tile at S=8 = an 8x8
    PIXEL block), which is what bounds the clustered walks (PERF.md); the
    union of BVH nodes per chunk shrinks with it. RNG keys and camera
    math use the ACTUAL pixel/lane/sample ids, so tiled/streamed renders
    are bitwise identical to the plain render; the host scatters (and
    stream-sums) the virtually-ordered output planes back to image order
    (render_mega).
    """
    vp = lane // 3
    chan = lane - vp * 3
    tile = cam.get("tile")
    if tile is None:
        pix = vp
        fi = (pix % cam["width"]).astype(jnp.float32)
        fj = (pix // cam["width"]).astype(jnp.float32)
        return pix, chan, fi, fj, lane, jnp.zeros_like(pix)
    tw, th, tpr, s_streams = tile
    tidx = vp // (tw * th)
    wp = vp - tidx * (tw * th)
    ty = tidx // tpr
    tx = tidx - ty * tpr
    yi = wp // tw
    xi = wp - yi * tw
    i = tx * tw + xi
    jv = ty * th + yi
    j = jv // s_streams
    stream = jv - j * s_streams
    pix = j * cam["width"] + i
    return (
        pix, chan, i.astype(jnp.float32), j.astype(jnp.float32),
        pix * 3 + chan, stream,
    )



def _intersect_tile(tri_ref, sph_ref, n_tris, n_sph, o, d, occlusion, textured=True):
    """Brute-force nearest hit of one ray tile against every primitive.

    Returns t only (occlusion=True) or the fused surface record
    (t, n, uv, mat, emissive, is_sphere-center) — the shading row is
    accumulated *inside* the winner select, so no gather ever happens.
    Arithmetic identical to kernels/intersect_pallas.py `_tri_candidate` /
    `_sph_candidate` (reference Triangle.hpp:222-252, global.hpp:20-35).
    textured=False (no material in the scene samples uv) skips the
    barycentric texcoord interpolation and its two winner accumulators.
    """
    o0, o1, o2 = o
    d0, d1, d2 = d
    shape = o0.shape
    t0 = jnp.full(shape, T_MAX, jnp.float32)

    a = d0 * d0 + d1 * d1 + d2 * d2
    a_ok = a > 1e-12
    a_safe = jnp.maximum(a, 1e-12)

    def tri_t(i):
        w20 = tri_ref[i, 6]
        w21 = tri_ref[i, 7]
        w22 = tri_ref[i, 8]
        c2 = tri_ref[i, 11]
        nr2 = tri_ref[i, 12]
        dp2 = d0 * w20 + d1 * w21 + d2 * w22
        op2 = o0 * w20 + o1 * w21 + o2 * w22 - c2
        det = -(dp2 * nr2)
        okd = jnp.abs(det) >= EPSILON
        det_g = jnp.where(okd, det, 1.0)
        t_hit = op2 * nr2 / det_g
        w00 = tri_ref[i, 0]
        w01 = tri_ref[i, 1]
        w02 = tri_ref[i, 2]
        c0 = tri_ref[i, 9]
        dp0 = d0 * w00 + d1 * w01 + d2 * w02
        op0 = o0 * w00 + o1 * w01 + o2 * w02 - c0
        u = op0 + t_hit * dp0
        w10 = tri_ref[i, 3]
        w11 = tri_ref[i, 4]
        w12 = tri_ref[i, 5]
        c1 = tri_ref[i, 10]
        dp1 = d0 * w10 + d1 * w11 + d2 * w12
        op1 = o0 * w10 + o1 * w11 + o2 * w12 - c1
        v = op1 + t_hit * dp1
        # No `valid`-column check: the packer (scene.py tri_kern[12])
        # guarantees padding/degenerate rows carry nr2 = 0, so det = 0
        # fails the |det| >= EPS test unconditionally. All hit conditions
        # fold into one min-chain sign test (u <= 1 is implied by u >= 0,
        # v >= 0, u + v <= 1).
        m = jnp.minimum(
            jnp.minimum(u, v),
            jnp.minimum(
                jnp.minimum(1.0 - (u + v), t_hit),
                jnp.abs(det) - EPSILON,
            ),
        )
        return jnp.where(m >= 0.0, t_hit, T_MAX), u, v

    def sph_t(s):
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

    if occlusion:
        def tri_body(i, t_best):
            t_cand, _, _ = tri_t(i)
            return jnp.minimum(t_cand, t_best)

        def sph_body(s, t_best):
            return jnp.minimum(sph_t(s), t_best)

        t_best = lax.fori_loop(0, n_tris, tri_body, t0)
        t_best = lax.fori_loop(0, n_sph, sph_body, t_best)
        return t_best

    zero = jnp.zeros(shape, jnp.float32)

    def tri_body(i, acc):
        (t_best, n0, n1, n2, uvx, uvy, mat, em, is_sph, sc0, sc1, sc2) = acc
        t_cand, u, v = tri_t(i)
        better = t_cand < t_best
        if textured:
            w0 = 1.0 - u - v
            # barycentric texcoord interp (Triangle.hpp:245-249) folded into
            # the winner select: cols 17..22 are t0,t1,t2 (x,y interleaved).
            uvx_c = w0 * tri_ref[i, 17] + u * tri_ref[i, 19] + v * tri_ref[i, 21]
            uvy_c = w0 * tri_ref[i, 18] + u * tri_ref[i, 20] + v * tri_ref[i, 22]
            uvx = jnp.where(better, uvx_c, uvx)
            uvy = jnp.where(better, uvy_c, uvy)
        return (
            jnp.where(better, t_cand, t_best),
            jnp.where(better, tri_ref[i, 14], n0),
            jnp.where(better, tri_ref[i, 15], n1),
            jnp.where(better, tri_ref[i, 16], n2),
            uvx,
            uvy,
            jnp.where(better, tri_ref[i, 23], mat),
            jnp.where(better, tri_ref[i, 24], em),
            jnp.where(better, 0.0, is_sph),
            jnp.where(better, 0.0, sc0),
            jnp.where(better, 0.0, sc1),
            jnp.where(better, 0.0, sc2),
        )

    def sph_body(s, acc):
        (t_best, n0, n1, n2, uvx, uvy, mat, em, is_sph, sc0, sc1, sc2) = acc
        t_cand = sph_t(s)
        better = t_cand < t_best
        if textured:
            uvx = jnp.where(better, 0.0, uvx)
            uvy = jnp.where(better, 0.0, uvy)
        return (
            jnp.where(better, t_cand, t_best),
            jnp.where(better, 0.0, n0),
            jnp.where(better, 0.0, n1),
            jnp.where(better, 0.0, n2),
            uvx,
            uvy,
            jnp.where(better, sph_ref[s, 4], mat),
            jnp.where(better, sph_ref[s, 5], em),
            jnp.where(better, 1.0, is_sph),
            jnp.where(better, sph_ref[s, 0], sc0),
            jnp.where(better, sph_ref[s, 1], sc1),
            jnp.where(better, sph_ref[s, 2], sc2),
        )

    init = (t0,) + (zero,) * 11
    acc = lax.fori_loop(0, n_tris, tri_body, init)
    acc = lax.fori_loop(0, n_sph, sph_body, acc)
    (t_best, n0, n1, n2, uvx, uvy, mat, em, is_sph, sc0, sc1, sc2) = acc

    happened = t_best < T_MAX
    t_eff = jnp.where(happened, t_best, 0.0)
    p = (o0 + d0 * t_eff, o1 + d1 * t_eff, o2 + d2 * t_eff)
    nsph = _normalize((p[0] - sc0, p[1] - sc1, p[2] - sc2))
    use_sph = is_sph > 0.5
    n = (
        jnp.where(use_sph, nsph[0], n0),
        jnp.where(use_sph, nsph[1], n1),
        jnp.where(use_sph, nsph[2], n2),
    )
    return t_best, happened, p, n, (uvx, uvy), mat, em > 0.5


def _occlude_shared_origin(tri_ref, sph_ref, n_tris, n_sph, o, ds, dists):
    """Visibility of S shadow rays sharing one origin (the NEE fan: all
    n_dir_sample shadow rays leave the same ε-offset surface point,
    Scene.cpp:56-82). Returns a list of bool tiles: True when nothing
    blocks the ray closer than its light-sample distance.

    Re-expression of the reference's `|t_nearest − dist| < EPSILON` check
    (Scene.cpp:73-75): the sampled point lies ON the light, so the nearest
    hit equals dist unless some primitive intersects at t < dist − ε —
    identical up to measure-zero grazing hits of the light triangle itself.
    Tracking "any blocker" instead of the nearest t removes the per-(tri,
    dir) division: every Möller-Trumbore condition is multiplied through by
    |det| (t = q/det with q = op2·nr2 shared across the fan). Shadow
    directions are unit by construction (lights.py normalizes), so the
    sphere quadratic runs with a = 1 — no divisions there either. One
    primitive loop computes the origin-dependent terms ONCE per tri and
    reuses them for every ray."""
    o0, o1, o2 = o
    shape = o0.shape
    s_cnt = len(ds)
    # Carried masks are f32 0/1 (via max-accumulate): Mosaic fails to
    # legalize fori_loop yields of i1 vectors.
    blocked0 = [jnp.zeros(shape, jnp.float32) for _ in range(s_cnt)]
    # relative epsilon: f32-safe at any light distance (see the wavefront
    # visibility comment in integrator.direct_lighting_c)
    xs = [
        dists[si] - jnp.maximum(EPSILON, REL_EPS * dists[si])
        for si in range(s_cnt)
    ]

    def tri_body(i, blocked):
        w20 = tri_ref[i, 6]
        w21 = tri_ref[i, 7]
        w22 = tri_ref[i, 8]
        w00 = tri_ref[i, 0]
        w01 = tri_ref[i, 1]
        w02 = tri_ref[i, 2]
        w10 = tri_ref[i, 3]
        w11 = tri_ref[i, 4]
        w12 = tri_ref[i, 5]
        nr2 = tri_ref[i, 12]
        op2 = o0 * w20 + o1 * w21 + o2 * w22 - tri_ref[i, 11]
        op0 = o0 * w00 + o1 * w01 + o2 * w02 - tri_ref[i, 9]
        op1 = o0 * w10 + o1 * w11 + o2 * w12 - tri_ref[i, 10]
        q = op2 * nr2  # t·det, shared across the fan
        out = []
        for si in range(s_cnt):
            d0, d1, d2 = ds[si]
            dp2 = d0 * w20 + d1 * w21 + d2 * w22
            det = -(dp2 * nr2)
            dets = jnp.abs(det)
            qs = jnp.where(det < 0.0, -q, q)  # t·|det|
            dp0 = d0 * w00 + d1 * w01 + d2 * w02
            u_s = op0 * dets + qs * dp0  # u·|det|
            dp1 = d0 * w10 + d1 * w11 + d2 * w12
            v_s = op1 * dets + qs * dp1  # v·|det|
            # All ≥-conditions folded into one min-chain sign test; the two
            # strict conditions (t < dist−ε, i.e. x·dets − qs > 0) keep
            # their own compare. dets ≥ EPSILON rides the min as dets−ε ≥ 0.
            m = jnp.minimum(
                jnp.minimum(qs, dets - EPSILON),
                jnp.minimum(
                    jnp.minimum(u_s, v_s), dets - (u_s + v_s)
                ),
            )
            ok = (m >= 0.0) & (xs[si] * dets - qs > 0.0)
            out.append(jnp.maximum(blocked[si], ok.astype(jnp.float32)))
        return tuple(out)

    def sph_body(s, blocked):
        cx = sph_ref[s, 0]
        cy = sph_ref[s, 1]
        cz = sph_ref[s, 2]
        r = sph_ref[s, 3]
        l0 = o0 - cx
        l1 = o1 - cy
        l2 = o2 - cz
        cq = l0 * l0 + l1 * l1 + l2 * l2 - r * r
        r_ok = r > 0.0
        out = []
        for si in range(s_cnt):
            d0, d1, d2 = ds[si]
            # unit direction ⇒ a = 1: t² + 2(d·l)t + cq = 0. Keep the
            # cancellation-robust q-form (global.hpp:20-35): roots are
            # (q, cq/q) with q = -(hb + sign(hb)·√disc) — the naive
            # -hb ± √disc form loses the small root to cancellation on
            # grazing/distant spheres and can flip silhouette shadows.
            hb = d0 * l0 + d1 * l1 + d2 * l2  # b/2
            disc = hb * hb - cq
            ok = (disc >= 0.0) & r_ok
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            q = jnp.where(hb > 0.0, -(hb + sq), -(hb - sq))
            qs_ = jnp.where(jnp.abs(q) > 1e-10, q, 1.0)
            x0 = q  # a = 1
            x1 = cq / qs_
            lo = jnp.minimum(x0, x1)
            hi = jnp.maximum(x0, x1)
            t = jnp.where(lo < 0.0, hi, lo)
            ok &= (t >= 0.0) & (t < xs[si])
            out.append(jnp.maximum(blocked[si], ok.astype(jnp.float32)))
        return tuple(out)

    blocked = lax.fori_loop(0, n_tris, tri_body, tuple(blocked0))
    blocked = lax.fori_loop(0, n_sph, sph_body, blocked)
    return [b < 0.5 for b in blocked]


def _fan_and_nearest(
    tri_ref, occ_ref, sph_ref, n_tris, n_occ, n_sph, fans, nexts,
    textured=True,
):
    """Fused NEE-fan occlusion + next-ray nearest hit in ONE table sweep,
    for one or more independent path slots.

    The regen kernel's two hottest blocks — the S-ray shared-origin shadow
    fan (`_occlude_shared_origin`) and the per-lane nearest-hit intersect
    (`_intersect_tile`) — both brute-force the same SMEM scene tables every
    path vertex. Fusing them pays the per-primitive loop machinery once and
    shares each SPHERE row's scalar loads between fan and intersect (the
    triangle tables differ: the fan sweeps the statically culled occluder
    subset `occ_ref` while the intersect sweeps the full `tri_ref`, so their
    rows pair up positionally for the first min(n_occ, n_tris) trips and the
    remainder runs intersect-only). With the 2-slot sample interleave
    (trace_mega_block nsplit) BOTH slots' fans and next rays ride the same
    sweep — the per-row scalar loads amortize over 10 rays instead of 5.
    Arithmetic is identical to the standalone sweeps (reference:
    Scene.cpp:56-82 fan + Triangle.hpp:222-252 nearest), so per-sample
    results are bitwise-equal to running them separately.

    fans: list over slots of (o_f, ds, dists) — ds/dists lists of per-sample
    direction/distance tiles (ds may be empty: no fan for that slot).
    nexts: list over slots of (o, d).
    Returns (vis_per_slot, hit_per_slot): vis like _occlude_shared_origin,
    hit like _intersect_tile(occlusion=False).
    """
    n_slots = len(nexts)
    shape = nexts[0][1][0].shape
    t0 = jnp.full(shape, T_MAX, jnp.float32)
    zero = jnp.zeros(shape, jnp.float32)
    aa = []
    for o, d in nexts:
        d0, d1, d2 = d
        a = d0 * d0 + d1 * d1 + d2 * d2
        aa.append((a > 1e-12, jnp.maximum(a, 1e-12)))
    xs_all = [
        [
            dists[si] - jnp.maximum(EPSILON, REL_EPS * dists[si])
            for si in range(len(dists))
        ]
        for (_, _, dists) in fans
    ]

    def fan_tri(i, k, blocked):
        # == _occlude_shared_origin.tri_body on occ_ref row i, slot k
        o0f, o1f, o2f = fans[k][0]
        ds = fans[k][1]
        xs = xs_all[k]
        w20 = occ_ref[i, 6]
        w21 = occ_ref[i, 7]
        w22 = occ_ref[i, 8]
        w00 = occ_ref[i, 0]
        w01 = occ_ref[i, 1]
        w02 = occ_ref[i, 2]
        w10 = occ_ref[i, 3]
        w11 = occ_ref[i, 4]
        w12 = occ_ref[i, 5]
        nr2 = occ_ref[i, 12]
        op2 = o0f * w20 + o1f * w21 + o2f * w22 - occ_ref[i, 11]
        op0 = o0f * w00 + o1f * w01 + o2f * w02 - occ_ref[i, 9]
        op1 = o0f * w10 + o1f * w11 + o2f * w12 - occ_ref[i, 10]
        q = op2 * nr2
        out = []
        for si in range(len(ds)):
            e0, e1, e2 = ds[si]
            dp2 = e0 * w20 + e1 * w21 + e2 * w22
            det = -(dp2 * nr2)
            dets = jnp.abs(det)
            qs = jnp.where(det < 0.0, -q, q)
            dp0 = e0 * w00 + e1 * w01 + e2 * w02
            u_s = op0 * dets + qs * dp0
            dp1 = e0 * w10 + e1 * w11 + e2 * w12
            v_s = op1 * dets + qs * dp1
            m = jnp.minimum(
                jnp.minimum(qs, dets - EPSILON),
                jnp.minimum(jnp.minimum(u_s, v_s), dets - (u_s + v_s)),
            )
            ok = (m >= 0.0) & (xs[si] * dets - qs > 0.0)
            out.append(jnp.maximum(blocked[si], ok.astype(jnp.float32)))
        return tuple(out)

    def near_tri(i, k, acc):
        # == _intersect_tile.tri_body on tri_ref row i, slot k
        o0, o1, o2 = nexts[k][0]
        d0, d1, d2 = nexts[k][1]
        (t_best, n0, n1, n2, uvx, uvy, mat, em, is_sph, sc0, sc1, sc2) = acc
        w20 = tri_ref[i, 6]
        w21 = tri_ref[i, 7]
        w22 = tri_ref[i, 8]
        c2 = tri_ref[i, 11]
        nr2 = tri_ref[i, 12]
        dp2 = d0 * w20 + d1 * w21 + d2 * w22
        op2 = o0 * w20 + o1 * w21 + o2 * w22 - c2
        det = -(dp2 * nr2)
        okd = jnp.abs(det) >= EPSILON
        det_g = jnp.where(okd, det, 1.0)
        t_hit = op2 * nr2 / det_g
        w00 = tri_ref[i, 0]
        w01 = tri_ref[i, 1]
        w02 = tri_ref[i, 2]
        dp0 = d0 * w00 + d1 * w01 + d2 * w02
        op0 = o0 * w00 + o1 * w01 + o2 * w02 - tri_ref[i, 9]
        u = op0 + t_hit * dp0
        w10 = tri_ref[i, 3]
        w11 = tri_ref[i, 4]
        w12 = tri_ref[i, 5]
        dp1 = d0 * w10 + d1 * w11 + d2 * w12
        op1 = o0 * w10 + o1 * w11 + o2 * w12 - tri_ref[i, 10]
        v = op1 + t_hit * dp1
        m = jnp.minimum(
            jnp.minimum(u, v),
            jnp.minimum(
                jnp.minimum(1.0 - (u + v), t_hit), jnp.abs(det) - EPSILON
            ),
        )
        t_cand = jnp.where(m >= 0.0, t_hit, T_MAX)
        better = t_cand < t_best
        if textured:
            w0 = 1.0 - u - v
            uvx_c = (
                w0 * tri_ref[i, 17] + u * tri_ref[i, 19] + v * tri_ref[i, 21]
            )
            uvy_c = (
                w0 * tri_ref[i, 18] + u * tri_ref[i, 20] + v * tri_ref[i, 22]
            )
            uvx = jnp.where(better, uvx_c, uvx)
            uvy = jnp.where(better, uvy_c, uvy)
        return (
            jnp.where(better, t_cand, t_best),
            jnp.where(better, tri_ref[i, 14], n0),
            jnp.where(better, tri_ref[i, 15], n1),
            jnp.where(better, tri_ref[i, 16], n2),
            uvx,
            uvy,
            jnp.where(better, tri_ref[i, 23], mat),
            jnp.where(better, tri_ref[i, 24], em),
            jnp.where(better, 0.0, is_sph),
            jnp.where(better, 0.0, sc0),
            jnp.where(better, 0.0, sc1),
            jnp.where(better, 0.0, sc2),
        )

    def both_tri(i, carry):
        blocked, accs = carry
        return (
            tuple(fan_tri(i, k, blocked[k]) for k in range(n_slots)),
            tuple(near_tri(i, k, accs[k]) for k in range(n_slots)),
        )

    def near_only(i, accs):
        return tuple(near_tri(i, k, accs[k]) for k in range(n_slots))

    def fan_only(i, blocked):
        return tuple(fan_tri(i, k, blocked[k]) for k in range(n_slots))

    def both_sph(s, carry):
        blocked, accs = carry
        cx = sph_ref[s, 0]
        cy = sph_ref[s, 1]
        cz = sph_ref[s, 2]
        r = sph_ref[s, 3]
        r_ok = r > 0.0
        new_blocked = []
        new_accs = []
        for k in range(n_slots):
            # fan half (== _occlude_shared_origin.sph_body); origin o_f
            o0f, o1f, o2f = fans[k][0]
            ds = fans[k][1]
            xs = xs_all[k]
            l0f = o0f - cx
            l1f = o1f - cy
            l2f = o2f - cz
            cqf = l0f * l0f + l1f * l1f + l2f * l2f - r * r
            out = []
            for si in range(len(ds)):
                e0, e1, e2 = ds[si]
                hb = e0 * l0f + e1 * l1f + e2 * l2f
                disc = hb * hb - cqf
                ok = (disc >= 0.0) & r_ok
                sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                q = jnp.where(hb > 0.0, -(hb + sq), -(hb - sq))
                qs_ = jnp.where(jnp.abs(q) > 1e-10, q, 1.0)
                x1 = cqf / qs_
                lo = jnp.minimum(q, x1)
                hi = jnp.maximum(q, x1)
                t = jnp.where(lo < 0.0, hi, lo)
                ok &= (t >= 0.0) & (t < xs[si])
                out.append(
                    jnp.maximum(blocked[k][si], ok.astype(jnp.float32))
                )
            new_blocked.append(tuple(out))
            # nearest half (== _intersect_tile.sph_t/sph_body); origin o
            o0, o1, o2 = nexts[k][0]
            d0, d1, d2 = nexts[k][1]
            a_ok, a_safe = aa[k]
            (t_best, n0, n1, n2, uvx, uvy, mat, em, is_sph, sc0, sc1,
             sc2) = accs[k]
            l0 = o0 - cx
            l1 = o1 - cy
            l2 = o2 - cz
            bq = 2.0 * (d0 * l0 + d1 * l1 + d2 * l2)
            cq = l0 * l0 + l1 * l1 + l2 * l2 - r * r
            disc = bq * bq - 4.0 * a_safe * cq
            ok = (disc >= 0.0) & a_ok & r_ok
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            q = jnp.where(bq > 0.0, -0.5 * (bq + sq), -0.5 * (bq - sq))
            qs = jnp.where(jnp.abs(q) > 1e-10, q, 1.0)
            x0 = q / a_safe
            x1 = cq / qs
            lo = jnp.minimum(x0, x1)
            hi = jnp.maximum(x0, x1)
            t = jnp.where(lo < 0.0, hi, lo)
            ok &= t >= 0.0
            t_cand = jnp.where(ok, t, T_MAX)
            better = t_cand < t_best
            if textured:
                uvx = jnp.where(better, 0.0, uvx)
                uvy = jnp.where(better, 0.0, uvy)
            new_accs.append((
                jnp.where(better, t_cand, t_best),
                jnp.where(better, 0.0, n0),
                jnp.where(better, 0.0, n1),
                jnp.where(better, 0.0, n2),
                uvx,
                uvy,
                jnp.where(better, sph_ref[s, 4], mat),
                jnp.where(better, sph_ref[s, 5], em),
                jnp.where(better, 1.0, is_sph),
                jnp.where(better, sph_ref[s, 0], sc0),
                jnp.where(better, sph_ref[s, 1], sc1),
                jnp.where(better, sph_ref[s, 2], sc2),
            ))
        return tuple(new_blocked), tuple(new_accs)

    blocked = tuple(
        tuple(zero for _ in range(len(fans[k][1]))) for k in range(n_slots)
    )
    accs = tuple(((t0,) + (zero,) * 11) for _ in range(n_slots))
    n_both = min(n_occ, n_tris)
    blocked, accs = lax.fori_loop(0, n_both, both_tri, (blocked, accs))
    if n_tris > n_both:
        accs = lax.fori_loop(n_both, n_tris, near_only, accs)
    if n_occ > n_both:
        blocked = lax.fori_loop(n_both, n_occ, fan_only, blocked)
    blocked, accs = lax.fori_loop(0, n_sph, both_sph, (blocked, accs))

    vis_out = []
    hit_out = []
    for k in range(n_slots):
        (t_best, n0, n1, n2, uvx, uvy, mat, em, is_sph, sc0, sc1,
         sc2) = accs[k]
        o0, o1, o2 = nexts[k][0]
        d0, d1, d2 = nexts[k][1]
        happened = t_best < T_MAX
        t_eff = jnp.where(happened, t_best, 0.0)
        p = (o0 + d0 * t_eff, o1 + d1 * t_eff, o2 + d2 * t_eff)
        nsph = _normalize((p[0] - sc0, p[1] - sc1, p[2] - sc2))
        use_sph = is_sph > 0.5
        n = (
            jnp.where(use_sph, nsph[0], n0),
            jnp.where(use_sph, nsph[1], n1),
            jnp.where(use_sph, nsph[2], n2),
        )
        vis_out.append([b < 0.5 for b in blocked[k]])
        hit_out.append(
            (t_best, happened, p, n, (uvx, uvy), mat, em > 0.5)
        )
    return vis_out, hit_out



def _gather_mat(mat_ref, n_mats, mat_id, chan):
    """Per-lane material params by a select loop over the (small) material
    table (mat_fat layout, scene.py): returns a dict of (8,128) tiles with
    refl/emission already channel-picked."""
    zero = jnp.zeros_like(mat_id)
    acc = {
        "mtype": zero,
        "ior_a": zero,
        "ior_b": zero,
        "rough": zero,
        "refl": zero,
        "emit": zero,
        "textured": zero,
        "dirac": zero,
    }
    is_r = chan == 0
    is_g = chan == 1

    def body(m, acc):
        sel = mat_id == m.astype(jnp.float32)
        refl = jnp.where(
            is_r, mat_ref[m, 4], jnp.where(is_g, mat_ref[m, 5], mat_ref[m, 6])
        )
        emit = jnp.where(
            is_r, mat_ref[m, 7], jnp.where(is_g, mat_ref[m, 8], mat_ref[m, 9])
        )
        return {
            "mtype": jnp.where(sel, mat_ref[m, 0], acc["mtype"]),
            "ior_a": jnp.where(sel, mat_ref[m, 1], acc["ior_a"]),
            "ior_b": jnp.where(sel, mat_ref[m, 2], acc["ior_b"]),
            "rough": jnp.where(sel, mat_ref[m, 3], acc["rough"]),
            "refl": jnp.where(sel, refl, acc["refl"]),
            "emit": jnp.where(sel, emit, acc["emit"]),
            "textured": jnp.where(sel, mat_ref[m, 10], acc["textured"]),
            "dirac": jnp.where(sel, mat_ref[m, 11], acc["dirac"]),
        }

    return lax.fori_loop(0, n_mats, body, acc)


# Material-type masks (materials.MaterialType order: SMOOTH_CONDUCTOR=0,
# ROUGH_CONDUCTOR=1, SMOOTH_DIELECTRIC=2, ROUGH_DIELECTRIC=3).
def _is_conductor(mtype):
    return mtype < 1.5


def _is_rough(mtype):
    return (jnp.abs(mtype - 1.0) < 0.25) | (jnp.abs(mtype - 3.0) < 0.25)


def _chessboard(u, v):
    """Material.hpp:134-151 with C semantics (trunc toward zero, signed rem)."""
    col = jnp.trunc((u - 0.05) * 10.0)
    row = jnp.trunc(v * 12.0)
    in_board = (col >= 3.0) & (col <= 5.0) & (row <= 7.0)
    s = col + row
    is_white = (s - jnp.trunc(s * 0.5) * 2.0) == 1.0
    return jnp.where(in_board & is_white, 0.9, 0.1)


def _reflectance(m, uv):
    return jnp.where(m["textured"] > 0.5, _chessboard(uv[0], uv[1]), m["refl"])


def _fresnel_schlick(cos_theta, f0):
    inv = 1.0 - cos_theta
    c2 = inv * inv
    return f0 + (1.0 - f0) * c2 * c2 * inv


def _fresnel(m, ior, incident, nrm):
    """Material.hpp:198-226; conductors return 1."""
    cosi = jnp.clip(_dot(incident, nrm), -1.0, 1.0)
    outside = cosi <= 0.0
    etai = jnp.where(outside, 1.0, ior)
    etat = jnp.where(outside, ior, 1.0)
    sint = etai / etat * _ssqrt(1.0 - cosi * cosi)
    tir = sint >= 1.0
    sint_s = jnp.where(tir, 0.0, sint)
    cost = _ssqrt(1.0 - sint_s * sint_s)
    aci = jnp.abs(cosi)
    rs_den = jnp.maximum(etat * aci + etai * cost, 1e-6)
    rp_den = jnp.maximum(etai * aci + etat * cost, 1e-6)
    rs = (etat * aci - etai * cost) / rs_den
    rp = (etai * aci - etat * cost) / rp_den
    kr = 0.5 * (rs * rs + rp * rp)
    kr = jnp.where(tir, 1.0, kr)
    return jnp.where(_is_conductor(m["mtype"]), 1.0, kr)


def _refract(ior, incident, nrm):
    """Material.hpp:227-242; zero vector on TIR."""
    cosi = jnp.clip(_dot(incident, nrm), -1.0, 1.0)
    entering = cosi < 0.0
    etai = jnp.where(entering, 1.0, ior)
    etat = jnp.where(entering, ior, 1.0)
    n = _where3(entering, nrm, _neg(nrm))
    ci = jnp.abs(cosi)
    eta = etai / etat
    k = 1.0 - eta * eta * (1.0 - ci * ci)
    ok = k >= 0.0
    coef = eta * ci - _ssqrt(jnp.where(ok, k, 1.0))
    out = _add(_scale(incident, eta), _scale(n, coef))
    zero = jnp.zeros_like(out[0])
    return _where3(ok, out, (zero, zero, zero))


def _d_ggx(h, n, alpha):
    noh = jnp.abs(_dot(n, h))
    good = noh > EPSILON
    noh_s = jnp.where(good, noh, 1.0)
    tan2 = (1.0 - noh_s * noh_s) / (noh_s * noh_s)
    denom = (noh_s * noh_s) * (alpha + tan2)
    denom = jnp.where(jnp.abs(denom) > 0.0, denom, 1.0)
    d = alpha * alpha / (jnp.pi * denom * denom)
    return jnp.where(good, d, 0.0)


def _g1(v, n, alpha):
    nov = jnp.abs(_dot(n, v))
    good = nov > EPSILON
    nov_s = jnp.where(good, nov, 1.0)
    tan_t = _ssqrt(1.0 - nov_s * nov_s) / nov_s
    at = alpha * tan_t
    g = 2.0 / (1.0 + jnp.sqrt(1.0 + at * at))
    g = jnp.where(tan_t == 0.0, 1.0, g)
    return jnp.where(good, g, 0.0)


def _tangent_frame(n):
    nx, ny, nz = n
    ax = jnp.abs(nx) > jnp.abs(ny)
    lx = jnp.sqrt(jnp.maximum(nx * nx + nz * nz, 1e-30))
    ly = jnp.sqrt(jnp.maximum(ny * ny + nz * nz, 1e-30))
    zero = jnp.zeros_like(nx)
    tx = _where3(ax, (-nz / lx, zero, nx / lx), (zero, nz / ly, -ny / ly))
    return tx, _cross(n, tx)


def _sample_mfn(m, n, xi1, xi2):
    """GGX NDF half-vector sample for rough lanes, n for smooth
    (Material.hpp:111-123, 268-281)."""
    alpha = m["rough"]
    phi = 2.0 * jnp.pi * xi1
    a2 = alpha * alpha
    cos_t = _ssqrt(
        jnp.maximum(1.0 - xi2, 0.0) / jnp.maximum(1.0 + (a2 - 1.0) * xi2, 1e-20)
    )
    sin_t = _ssqrt(1.0 - cos_t * cos_t)
    hx = sin_t * jnp.cos(phi)
    hy = sin_t * jnp.sin(phi)
    t, b = _tangent_frame(n)
    h = _normalize(
        _add(_add(_scale(t, hx), _scale(b, hy)), _scale(n, cos_t))
    )
    return _where3(_is_rough(m["mtype"]), h, n)


def _half_reflect(wi, wo, n):
    h = _normalize(_add(wi, wo))
    return _where3(_dot(wi, n) > 0.0, h, _neg(h))


def _eval_bsdf(m, ior, refl, wi, wo, n, is_reflect):
    """Material::eval (Material.hpp:330-408) — see bsdf.eval_bsdf_c.

    `refl` is the (chessboard-resolved) reflectance, hoisted by the caller
    (it is wi-independent, and NEE calls eval once per light sample).
    Unlike the reference / bsdf.py, the half vector is SELECTED by the
    reflect/refract branch *before* the expensive D/G1/Fresnel terms — the
    unselected branch's value is never read, so one D, two G1 and two
    Fresnel evaluations replace the reference's 2/4/4 with identical output.
    MCPT_EVAL_FUSED=1 pushes the same trick one level further (select the
    half-vector candidate before NORMALIZING, and the Fresnel normal by the
    rough/smooth material select: one normalize + one Fresnel, still
    bitwise-identical) — measured neutral on both kernels, see _EVAL_FUSED.
    """
    win = _dot(wi, n)
    won = _dot(wo, n)
    same_side = win * won > 0.0
    eta = jnp.where(win > 0.0, ior, 1.0 / ior)
    alpha = m["rough"]
    nwi = _neg(wi)
    conductor = _is_conductor(m["mtype"])

    rough_m = _is_rough(m["mtype"])
    hv = _sub(nwi, _scale(wo, eta))
    if _EVAL_FUSED:
        # Select the half-vector CANDIDATE before normalizing: the reflect
        # and refract half-vectors differ only pre-normalization (wi+wo vs
        # −wi−η·wo), so one normalize + one sign-fix replaces two of each
        # (bitwise-identical per lane — the unselected candidate was never
        # read). Same trick as selecting h before D/G1/F.
        h0 = _normalize(_where3(is_reflect, _add(wi, wo), hv))
        # (bool-valued jnp.where lowers to an i8->i1 trunci Mosaic rejects)
        keep = (is_reflect & (win > 0.0)) | (~is_reflect & (_dot(h0, n) > 0.0))
        h = _where3(keep, h0, _neg(h0))
    else:  # MCPT_EVAL_FUSED=0: pre-r5-final two-normalize form (perf A/B)
        h_r = _half_reflect(wi, wo, n)
        h_t0 = _normalize(hv)
        h_t = _where3(_dot(h_t0, n) > 0.0, h_t0, _neg(h_t0))
        h = _where3(is_reflect, h_r, h_t)

    d_h = _d_ggx(h, n, alpha)
    g_h = _g1(wi, h, alpha) * _g1(wo, h, alpha)
    # ONE full unpolarized Fresnel instead of two: the rough branches read
    # it at the microfacet normal h, the smooth (Dirac) branches at the
    # macro normal n, and the final material select (`_is_rough`) only ever
    # reads one of them per lane — so evaluate at the per-lane selected
    # normal. Bitwise-identical; saves ~25 VPU ops per eval × 5 evals/vertex.
    if _EVAL_FUSED:
        f_u = _fresnel(m, ior, nwi, _where3(rough_m, h, n))  # conductors → 1
    else:
        f_u = None
    f_h = f_u if _EVAL_FUSED else _fresnel(m, ior, nwi, h)

    # rough reflect (valid only on is_reflect lanes, where h == h_r)
    f_r = jnp.where(conductor, _fresnel_schlick(jnp.abs(_dot(h, wo)), refl), f_h)
    denom_r = 4.0 * jnp.abs(win) * jnp.abs(won) + EPSILON
    rough_reflect = jnp.where(same_side, f_r * d_h * g_h / denom_r, 0.0)

    # rough refract (valid only on ~is_reflect lanes, where h == h_t);
    # Walter eq. 21 with the reference's sign placement.
    hol = _dot(h, wi)
    hov = _dot(h, wo)
    den = hol + eta * hov
    den = den * den * jnp.abs(win * won)
    den = jnp.maximum(den, 1e-10)
    rough_refract = (1.0 - f_h) * d_h * g_h * eta * eta * jnp.abs(hol * hov) / den
    rough_refract = jnp.where(
        conductor | same_side | (win * won == 0.0), 0.0, rough_refract
    )

    # smooth (Dirac) branches: f_u was evaluated at n on smooth lanes
    aligned = _dot(h, n) >= 1.0 - EPSILON
    f_sm = f_u if _EVAL_FUSED else _fresnel(m, ior, nwi, n)
    smooth_reflect = jnp.where(
        same_side & aligned,
        jnp.where(conductor, _fresnel_schlick(jnp.abs(won), refl), f_sm),
        0.0,
    )
    smooth_refract = jnp.where(
        (~conductor) & (~same_side) & (win * won != 0.0) & aligned,
        1.0 - f_sm,
        0.0,
    )

    rough = jnp.where(is_reflect, rough_reflect, rough_refract)
    smooth = jnp.where(is_reflect, smooth_reflect, smooth_refract)
    return jnp.where(rough_m, rough, smooth)


def _pdf(m, ior, wi, wo, n, is_reflect):
    """Material::pdf (Material.hpp:285-328)."""
    eta = jnp.where(_dot(wi, n) > 0.0, ior, 1.0 / ior)
    h_r = _half_reflect(wi, wo, n)
    jac_r = 1.0 / jnp.maximum(4.0 * jnp.abs(_dot(h_r, wo)), 1e-8)
    hv = _sub(_neg(wi), _scale(wo, eta))
    h_t = _normalize(hv)
    d1 = jnp.maximum(_dot(hv, hv), 1e-12)
    jac_t = eta * eta * jnp.abs(_dot(h_t, wo)) / d1
    h = _where3(is_reflect, h_r, h_t)
    jac = jnp.where(is_reflect, jac_r, jac_t)
    d = _d_ggx(h, n, m["rough"])
    p_rough = d * _dot(n, h) * jac

    h_sm_t = _where3(_dot(h_t, n) > 0.0, h_t, _neg(h_t))
    h_sm = _where3(is_reflect, _normalize(_add(wi, wo)), h_sm_t)
    p_smooth = jnp.where(jnp.abs(_dot(h_sm, n)) > 1.0 - EPSILON, 1.0, 0.0)
    return jnp.where(_is_rough(m["mtype"]), p_rough, p_smooth)


def _vertex_pre(ctx, draw, d, p, n, uv, mat_id, happened, emissive, depth0):
    """Occlusion-independent half of per-vertex shading: material gather, GGX
    microfacet-normal sample + Fresnel split, NEE light-sample generation
    (directions/distances only — no visibility), Russian roulette, the
    stochastic reflect/refract branch, and the indirect weight
    (Scene.cpp:56-182 minus the shadow fan and the next-bounce intersect).

    Returns the _process_vertex dict extended with `samples`, `p_dl` and the
    shading context (`m`, `ior`, `refl`, `inner`, `kr`, `wo`) so the caller
    can schedule the fan itself (the merged-sweep regen path occludes the
    fan and intersects the next ray in ONE table sweep) and finish with
    `_nee_shade`.

    `draw(use)` returns one uniform tile per use-site id (the two kernels key
    their counters differently); `depth0` masks the eye-emitter special case.
    Everything is computed for every lane; the caller applies liveness masks.
    """
    chan = ctx["chan"]
    lam = ctx["lam"]
    ablate = ctx.get("ablate", frozenset())
    wo = _neg(d)
    if "mat" in ablate:  # perf-debug: constant material (see trace_mega_block)
        zero = jnp.zeros_like(lam)
        m = {
            "mtype": zero + 1.0, "ior_a": zero + 1.5, "ior_b": zero,
            "rough": zero + 0.5, "refl": zero + 0.7, "emit": zero,
            "textured": zero, "dirac": zero,
        }
    else:
        m = _gather_mat(ctx["mat_ref"], ctx["n_mats"], mat_id, chan)
    ior = m["ior_a"] + m["ior_b"] / (lam * lam)
    b_leaf = jnp.clip(m["emit"] * jnp.abs(_dot(wo, n)), 0.0, 1.0)
    is_b = depth0 & happened & emissive

    # microfacet normal + fresnel split (Scene.cpp:109-110)
    xi0 = draw(1)
    xi1 = draw(2)
    xi2 = draw(3)
    xi3 = draw(4)
    if "mfn" in ablate:  # perf-debug: no microfacet sample / fresnel
        mfn = n
        kr = jnp.full_like(lam, 0.8)
    else:
        mfn = _sample_mfn(m, n, xi0, xi1)
        kr = _fresnel(m, ior, d, mfn)

    # ---- NEE (Scene.cpp:56-82,113-119): sample all S lights first, occlude
    # the whole shadow fan in ONE shared-origin primitive loop, then shade.
    # scale-relative self-intersection offset (see integrator.trace_paths:
    # absolute 1e-4 is sub-ULP at large scene coordinates in f32)
    off_scale = jnp.maximum(
        EPSILON,
        REL_EPS
        * jnp.maximum(
            jnp.abs(p[0]), jnp.maximum(jnp.abs(p[1]), jnp.abs(p[2]))
        ),
    )
    p_dl = _add(p, _scale(n, off_scale))
    inner = _dot(wo, n) < 0.0
    refl = _reflectance(m, uv) if ctx["textured"] else m["refl"]
    x = lam  # shape/dtype template
    l_dir_raw = jnp.zeros_like(x)
    if ctx["n_emitters"] > 0:
        samples = []
        for si in range(ctx["n_dir_sample"]):
            base = 16 + 4 * si
            v0_ = draw(base)
            v1_ = draw(base + 1)
            v2_ = draw(base + 2)
            v3_ = draw(base + 3)
            # stage 1: mesh by cumulative area (Scene.cpp:28-36)
            target = v0_ * ctx["total_area"]
            lcum_ref = ctx["lcum_ref"]

            def mesh_body(li, acc):
                return acc + jnp.where(lcum_ref[li, 0] < target, 1.0, 0.0)

            mesh = lax.fori_loop(
                0, ctx["n_lmesh"], mesh_body, jnp.zeros_like(x)
            )
            # stage 2: emitter triangle within mesh (BVH.cpp:120-135 area
            # descent, sqrt warp), as ONE fori over emitter rows so kernel
            # code size and Mosaic compile time stay flat in the emitter
            # count (a tessellated light is hundreds of rows). The
            # cumulative bound is compared as a FRACTION of the mesh area
            # (emeta col 3, precomputed host-side) so no per-row
            # mesh-area pass is needed; the area itself is recovered from
            # the winning row's 1/mesh_area column.
            emeta_ref = ctx["emeta_ref"]
            emt_ref = ctx["emt_ref"]
            sv1 = jnp.sqrt(v1_)
            n_cols = 17 if ctx["n_sph_emitters"] else 16

            def pick_body(ei, carry):
                found = carry[0]
                same = emeta_ref[ei, 0] == mesh
                take = same & (found < 0.5)
                # First same-mesh row whose inclusive bound fires wins; if
                # none fires, the LAST same-mesh row is the fallback
                # (BVH.cpp:131-135): keep overwriting until found.
                new_row = tuple(
                    jnp.where(take, emt_ref[ei, c_], carry[1 + c_])
                    for c_ in range(n_cols)
                )
                found = jnp.maximum(
                    found,
                    (same & (sv1 < emeta_ref[ei, 3])).astype(jnp.float32),
                )
                return (found,) + new_row

            carry = lax.fori_loop(
                0,
                ctx["n_emitters"],
                pick_body,
                (jnp.zeros_like(x),) * (1 + n_cols),
            )
            row = list(carry[1:])
            mesh_area = 1.0 / jnp.maximum(row[15], 1e-30)
            xs = jnp.sqrt(v2_)
            ys = v3_
            wx = xs * (1.0 - ys)
            wy = xs * ys
            lp = (
                row[0] + row[3] * wx + row[6] * wy,
                row[1] + row[4] * wx + row[7] * wy,
                row[2] + row[5] * wx + row[8] * wy,
            )
            ln = (row[9], row[10], row[11])
            if ctx["n_sph_emitters"]:
                # emissive-sphere row: uniform surface point, c + r·dir
                # (scene.py emitter notes; pdf 1/(4πr²) rides mesh_area)
                is_se = row[16] > 0.5
                ysp = 1.0 - 2.0 * v2_
                ssp = jnp.sqrt(jnp.maximum(1.0 - ysp * ysp, 0.0))
                php = 2.0 * jnp.pi * v3_
                dv = (ssp * jnp.cos(php), ysp, ssp * jnp.sin(php))
                lp = _where3(
                    is_se,
                    (
                        row[0] + row[3] * dv[0],
                        row[1] + row[3] * dv[1],
                        row[2] + row[3] * dv[2],
                    ),
                    lp,
                )
                ln = _where3(is_se, dv, ln)
            emit_l = jnp.where(
                chan == 0, row[12], jnp.where(chan == 1, row[13], row[14])
            )
            delta = _sub(lp, p_dl)
            # dist stays sqrt-then-divide (NOT rsqrt): it feeds the
            # occlusion fans' `t < dist − ε` bound, which is ULP-marginal
            # at scene scale. NOTE the megakernel fans (SMEM and clustered)
            # intentionally use the robust "any blocker strictly closer"
            # predicate rather than the wavefront/reference
            # |t_nearest − dist| < ε form, which loses grazing samples to
            # float error on TPU (PARITY.md row 3); megakernel-vs-wavefront
            # comparisons are therefore statistical, not bitwise.
            dist = jnp.sqrt(jnp.maximum(_dot(delta, delta), 1e-20))
            inv_dist = 1.0 / dist
            ws = _scale(delta, inv_dist)
            samples.append((ws, dist, inv_dist, emit_l, mesh_area, ln))
    else:
        samples = []

    # ---- RR + stochastic reflect/refract (Scene.cpp:121-159)
    rr_kill = xi2 >= ctx["rr_rate"]
    branch_reflect = xi3 < kr
    womfn = _dot(wo, mfn)
    sign_reflect = jnp.where(womfn < 0.0, -1.0, 1.0)
    sign = jnp.where(branch_reflect, sign_reflect, -sign_reflect)
    p_new = _add(p, _scale(n, off_scale * sign))
    wi = _where3(branch_reflect, _reflect(wo, mfn), _refract(ior, d, mfn))

    if "bounce_eval" in ablate:  # perf-debug: constant bounce BSDF/pdf
        ev = jnp.full_like(lam, 0.5)
        pv = jnp.ones_like(lam)
    else:
        ev = _eval_bsdf(m, ior, refl, wi, wo, n, branch_reflect)
        pv = _pdf(m, ior, wi, wo, n, branch_reflect)
    pv_ok = jnp.abs(pv) > 1e-10
    w_rough = jnp.where(
        pv_ok,
        ev * jnp.abs(_dot(wo, n)) / jnp.where(pv_ok, pv, 1.0) * ctx["inv_rr"],
        0.0,
    )
    w = jnp.where(m["dirac"] > 0.5, ev * ctx["inv_rr"], w_rough)

    if ctx["use_env"]:
        # secondary env radiance along the bounce direction (mip, nearest);
        # primary misses are deferred to the full-res pass, so the miss leaf
        # (bg_l) is zero here and the kernel counts the miss instead.
        env_wi = _env_mip_lookup(
            ctx["env_ref"], wi, ctx["is_r"], ctx["is_g"], ctx["is_b"]
        )
        bg_l = jnp.zeros_like(ev)
        env_ind = env_wi * ev * ctx["inv_rr"]
    else:
        bg = ctx["bg"]
        bg_l = jnp.where(chan == 0, bg[0], jnp.where(chan == 1, bg[1], bg[2]))
        env_ind = bg_l * ev * ctx["inv_rr"]

    return {
        "w": w,
        "p_new": p_new,
        "wi": wi,
        "rr_kill": rr_kill,
        "is_b": is_b,
        "b_leaf": b_leaf,
        "bg_l": bg_l,
        "env_ind": env_ind,
        # occlusion-phase inputs / shading context for _nee_shade
        "samples": samples,
        "p_dl": p_dl,
        "m": m,
        "ior": ior,
        "refl": refl,
        "inner": inner,
        "kr": kr,
        "wo": wo,
    }


def _nee_shade(ctx, n, V, vis):
    """Finish NEE given per-sample visibility: the BSDF-weighted direct
    light sum of Scene.cpp:76-78 over `V["samples"]` (from `_vertex_pre`),
    masked by `vis` (one bool tile per sample, or None ⇒ all visible)."""
    ablate = ctx.get("ablate", frozenset())
    lam = ctx["lam"]
    l_dir_raw = jnp.zeros_like(lam)
    for si in range(len(V["samples"])):
        ws, dist, inv_dist, emit_l, mesh_area, ln = V["samples"][si]
        if "nee_eval" in ablate:  # perf-debug: constant NEE BSDF
            ev = jnp.full_like(lam, 0.1)
        else:
            ev = _eval_bsdf(
                V["m"], V["ior"], V["refl"], ws, V["wo"], n, ~V["inner"]
            )
        # Scene.cpp:76-78: ... / dist² / pdf / S with the area pdf
        # = 1/mesh_area (lights.py), i.e. ×mesh_area.
        contrib = (
            emit_l
            * ev
            * _dot(ws, n)
            * -_dot(ws, ln)
            * (inv_dist * inv_dist)
            * mesh_area
            * jnp.float32(1.0 / ctx["n_dir_sample"])
        )
        if vis is not None:
            contrib = jnp.where(vis[si], contrib, 0.0)
        l_dir_raw += contrib
    return jnp.where(V["inner"], 1.0 - V["kr"], V["kr"]) * l_dir_raw


def _process_vertex(ctx, draw, d, p, n, uv, mat_id, happened, emissive, depth0):
    """_vertex_pre + the kernel-owned shadow fan + _nee_shade: the original
    all-in-one per-vertex shading used by the lockstep kernel and the
    clustered regen path (the SMEM regen path schedules the fan itself via
    the merged `_fan_and_nearest` sweep)."""
    V = _vertex_pre(ctx, draw, d, p, n, uv, mat_id, happened, emissive, depth0)
    vis = None
    if V["samples"] and ctx["enable_shadow"]:
        # mask=happened: dead/miss lanes' garbage origins must not
        # inflate the clustered fan's shaft-cull box
        vis = ctx["occlude_fan"](
            V["p_dl"],
            [s_[0] for s_ in V["samples"]],
            [s_[1] for s_ in V["samples"]],
            happened,
        )
    V["l_dir"] = _nee_shade(ctx, n, V, vis)
    return V




def _make_intersect_fns(
    tri_ref,
    occ_ref,
    sph_ref,
    cn_ref,
    ct_ref,
    cuv_ref,
    res_ref,
    n_tris,
    n_occ,
    n_sph,
    clustered,
    any_textured,
    ablate=frozenset(),
    cl_groups=1,
):
    """(isect(o,d) -> fused hit tuple, occlude_fan(o, ds, dists) -> [t]) on
    (8,128) chunk tiles: SMEM brute loop for small scenes, clustered-BVH
    walk (kernels/cluster.py) for big ones. Both produce the same fused
    surface record, so the rest of the kernel is scene-size agnostic.

    The shadow fan tests occ_ref — the statically culled occluder subset of
    the triangle table (scene.py: boundary geometry that provably cannot
    block any vertex→light segment is dropped)."""
    if "isect" in ablate:  # perf-debug: constant hit, no occluders
        def isect(o, d):
            # values derive from o so nothing constant-folds into layouts
            # Mosaic can't legalize
            zero = o[0] * 0.0
            one = zero + 1.0
            p = _add(o, d)
            return (
                one, one > 0.5, p, (zero, one, zero), (zero, zero), zero,
                zero > 0.5,
            )

        def occlude_fan(o, ds, dists, mask=None):
            return [(o[0] * 0.0 + 1.0) > 0.5 for _ in ds]

        def fan_near(fans, nexts, masks=None):
            vis_l = [occlude_fan(o_f, ds, dists) for (o_f, ds, dists) in fans]
            hit_l = [isect(o, d) for (o, d) in nexts]
            return vis_l, hit_l

        return isect, occlude_fan, fan_near
    if not clustered:

        def isect(o, d):
            return _intersect_tile(
                tri_ref, sph_ref, n_tris, n_sph, o, d, False,
                textured=any_textured,
            )

        def occlude_fan(o, ds, dists, mask=None):
            # brute fan: every occluder is tested anyway, no shaft cull
            return _occlude_shared_origin(
                occ_ref, sph_ref, n_occ, n_sph, o, ds, dists
            )

        def fan_near(fans, nexts, masks=None):
            return _fan_and_nearest(
                tri_ref, occ_ref, sph_ref, n_tris, n_occ, n_sph,
                fans, nexts, textured=any_textured,
            )

        return isect, occlude_fan, fan_near

    tpg = ct_ref.shape[1] // 16  # leaf-row-group tiles per block

    def _read_hit(o, d):
        # materialize the fused hit tuple from the nearest-query result rows
        t = res_ref[R_T]
        happened = t < T_MAX
        t_eff = jnp.where(happened, t, 0.0)
        p = (o[0] + d[0] * t_eff, o[1] + d[1] * t_eff, o[2] + d[2] * t_eff)
        n0 = res_ref[R_N0]
        n1 = res_ref[R_N1]
        n2 = res_ref[R_N2]
        is_sph = res_ref[R_SPH] > 0.5
        nsph = _normalize((p[0] - n0, p[1] - n1, p[2] - n2))
        n = (
            jnp.where(is_sph, nsph[0], n0),
            jnp.where(is_sph, nsph[1], n1),
            jnp.where(is_sph, nsph[2], n2),
        )
        uv = (res_ref[R_UVX], res_ref[R_UVY])
        return t, happened, p, n, uv, res_ref[R_MAT], res_ref[R_EM] > 0.5

    def isect(o, d):
        cluster_query_chunk(
            cn_ref,
            ct_ref,
            cuv_ref,
            sph_ref,
            res_ref,
            o,
            d,
            n_sph=n_sph,
            occlusion=False,
            textured=any_textured,
            tpg=tpg,
            groups=cl_groups,
        )
        return _read_hit(o, d)

    def fan_near(fans, nexts, masks=None):
        # fused paired-walk fan + nearest (cluster.cluster_fan_and_near).
        # Multi-slot (nsplit interleave) runs one fused walk per slot
        # sequentially and materializes each slot's results (ref reads are
        # value copies) before the next slot's walk reuses res_ref — the
        # r5 clean probes measured the walks at ~0% of kernel time, so
        # slot interleave buys vertex/framework amortization, not walk
        # sharing.
        vis_l = []
        hit_l = []
        for k in range(len(nexts)):
            o_f, ds, dists = fans[k]
            o_n, d_n = nexts[k]
            if "novisfan" in ablate:
                # timing probe: skip the fan walk, force full visibility.
                # The fan result feeds only radiance (never path
                # decisions: RR, bounce dirs and hits are fan-independent)
                # so iteration counts and traversal are EXACTLY those of
                # the real render — the control-minus-novisfan delta is
                # the fan walk's true cost.
                vis_l.append([(o_f[0] * 0.0 + 1.0) > 0.5 for _ in ds])
                hit_l.append(isect(o_n, d_n))
                continue
            reps = 2 if "pair2x" in ablate else 1
            for _ in range(reps):
                # "pair2x" timing probe: run the paired walk twice (the
                # second pass recomputes identical results) — the delta
                # over control is the full fan+nearest walk cost with
                # unchanged paths.
                cluster_fan_and_near(
                    cn_ref, ct_ref, cuv_ref, sph_ref, res_ref,
                    o_f, ds, dists, o_n, d_n,
                    n_sph=n_sph,
                    mask=masks[k] if masks else None,
                    textured=any_textured,
                    tpg=tpg,
                    groups=cl_groups,
                )
            vis_l.append(
                [res_ref[N_RES + si] < 0.5 for si in range(len(ds))]
            )
            hit_l.append(_read_hit(o_n, d_n))
        return vis_l, hit_l

    def occlude_fan(o, ds, dists, mask=None):
        # single-walk robust fan (see cluster.cluster_occlude_fan): one
        # traversal for all S samples, "any blocker at t < dist − ε"
        # predicate matching _occlude_shared_origin, shaft-culled by the
        # masked origin/target AABB. The returned tiles are materialized
        # ref reads (copies), safe across res_ref reuse.
        return cluster_occlude_fan(
            cn_ref, ct_ref, sph_ref, res_ref, o, ds, dists, n_sph=n_sph,
            mask=mask, tpg=tpg, groups=cl_groups,
        )

    return isect, occlude_fan, fan_near


def _mega_kernel(
    scal_ref,  # (1, 8) SMEM int32: [seed, lane_offset, spp, ...]
    tri_ref,  # (T8, 25) SMEM f32 (layout in mega_tables)
    occ_ref,  # (T8o, 16) SMEM f32 occluder subset (shadow fan)
    sph_ref,  # (S, 6) SMEM f32: c, r, mat, emissive
    mat_ref,  # (M, 13) SMEM f32 (mat_fat)
    emt_ref,  # (E, 16) SMEM f32 (emt_fat)
    emeta_ref,  # (E, 3) SMEM f32: mesh ordinal, intra_cum, mesh_area
    lcum_ref,  # (L, 1) SMEM f32 cumulative mesh areas
    par_ref,  # (1, 8) SMEM f32: [bg_r, bg_g, bg_b, rr, inv_rr, total_area]
    env_ref,  # (3*ENV_MIP_ROWS, 128) SMEM env mip planes (dummy when unused)
    cn_ref,  # (R, 128) SMEM cluster-BVH node rows (dummy when not clustered)
    ct_ref,  # (8*NT, 16) VMEM cluster triangle tiles
    cuv_ref,  # (8*NT, 8) VMEM cluster uv tiles
    out_ref,  # (2, R, 128) VMEM f32: [mean radiance, ray count]
    rec_ref,  # scratch (max_bounces, 4, 8, 128) VMEM records
    res_ref,  # scratch (N_RES, 8, 128) VMEM cluster-query results
    *,
    n_chunks,
    n_tris,
    n_occ,
    n_sph,
    n_sph_emitters,
    n_mats,
    n_emitters,
    n_lmesh,
    max_bounces,
    n_dir_sample,
    enable_shadow,
    any_textured,
    clustered,
    cl_groups,
    use_env,
    ablate,
    unroll,  # regen-only; ignored here
    nsplit,  # regen-only; ignored here
    cam,  # dict of static camera floats
):
    assert not use_env, "env scenes require the regen kernel"
    seed = scal_ref[0, 0].astype(jnp.uint32)
    lane_off = scal_ref[0, 1]
    # per-lane sample BUDGET; with stream splitting (cam["tile"][3] = S > 1)
    # a lane renders every S-th sample of its pixel, so spp = spp_total / S
    spp = scal_ref[0, 2]
    lane_stride = scal_ref[0, 3]
    spp_total = scal_ref[0, 4]

    row_iota = jax.lax.broadcasted_iota(jnp.int32, (CH_ROWS, LANE), 0)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (CH_ROWS, LANE), 1)

    bg = (par_ref[0, 0], par_ref[0, 1], par_ref[0, 2])
    rr_rate = par_ref[0, 3]
    inv_rr = par_ref[0, 4]
    total_area = par_ref[0, 5]
    n_streams = cam["tile"][3] if cam.get("tile") else 1

    def chunk_body(rc, _):
        r0 = rc * CH_ROWS
        # strided lane assignment: lane = off + idx*stride. stride=1 for the
        # single-chip render; the sharded render interleaves devices
        # (stride = n_devices) so every device samples the whole image and
        # per-device work stays balanced (sky rows terminate early, interior
        # rows bounce — contiguous ranges were ~83% balanced at 8 devices).
        vlane = lane_off + ((r0 + row_iota) * LANE + col_iota) * lane_stride
        pix, chan, fi, fj, lane, stream = _lane_to_pixel(vlane, cam)
        pix_u = pix.astype(jnp.uint32)
        lane_u = lane.astype(jnp.uint32)
        lam = jnp.where(
            chan == 0,
            jnp.float32(WAVELEN_UM[0]),
            jnp.where(
                chan == 1, jnp.float32(WAVELEN_UM[1]), jnp.float32(WAVELEN_UM[2])
            ),
        )

        def rot(v):
            om = cam["om"]
            return (
                om[0][0] * v[0] + om[0][1] * v[1] + om[0][2] * v[2],
                om[1][0] * v[0] + om[1][1] * v[1] + om[1][2] * v[2],
                om[2][0] * v[0] + om[2][1] * v[1] + om[2][2] * v[2],
            )

        ctx = {
            "tri_ref": tri_ref,
            "sph_ref": sph_ref,
            "mat_ref": mat_ref,
            "emt_ref": emt_ref,
            "emeta_ref": emeta_ref,
            "lcum_ref": lcum_ref,
            "n_tris": n_tris,
            "n_sph": n_sph,
            "n_mats": n_mats,
            "n_emitters": n_emitters,
            "n_lmesh": n_lmesh,
            "n_dir_sample": n_dir_sample,
            "enable_shadow": enable_shadow,
            "textured": any_textured,
            "chan": chan,
            "lam": lam,
            "bg": bg,
            "rr_rate": rr_rate,
            "inv_rr": inv_rr,
            "total_area": total_area,
            "n_sph_emitters": n_sph_emitters,
            "ablate": ablate,
            "use_env": use_env,
            "env_ref": env_ref,
            "is_r": (chan == 0).astype(jnp.float32),
            "is_g": (chan == 1).astype(jnp.float32),
            "is_b": (chan == 2).astype(jnp.float32),
        }
        _isect, _ofan, _fan_near = _make_intersect_fns(
            tri_ref, occ_ref, sph_ref, cn_ref, ct_ref, cuv_ref, res_ref,
            n_tris, n_occ, n_sph, clustered, any_textured, ablate=ablate,
            cl_groups=cl_groups,
        )
        ctx["occlude_fan"] = _ofan

        def spp_body(s, acc):
            rad_acc, ray_acc = acc
            su = jnp.uint32(0x9E3779B9) * (s.astype(jnp.uint32) + _U(1)) + seed

            # ---- camera ray (Renderer.cpp:44-76); draws key on the PIXEL so
            # the three channel lanes share one primary ray.
            u0 = _draw(pix_u, _murmur(su + _U(101)))
            u1 = _draw(pix_u, _murmur(su + _U(102)))
            x = (1.0 - 2.0 * (fi + u0) / cam["width"]) * cam["xscale"]
            y = (1.0 - 2.0 * (fj + u1) / cam["height"]) * cam["yscale"]
            one = jnp.ones_like(x)
            if cam["use_dof"]:
                u2 = _draw(pix_u, _murmur(su + _U(103)))
                u3 = _draw(pix_u, _murmur(su + _U(104)))
                r = cam["aperture"] * jnp.sqrt(u2)
                theta = 2.0 * jnp.pi * u3
                dx = r * jnp.cos(theta)
                dy = r * jnp.sin(theta)
                lens_w = rot((dx, dy, jnp.zeros_like(dx)))
                o = (
                    cam["pos"][0] + lens_w[0],
                    cam["pos"][1] + lens_w[1],
                    cam["pos"][2] + lens_w[2],
                )
                fd = cam["focal"]
                dirs = (x * fd - dx, y * fd - dy, one * fd)
            else:
                o = (
                    jnp.broadcast_to(jnp.float32(cam["pos"][0]), x.shape),
                    jnp.broadcast_to(jnp.float32(cam["pos"][1]), x.shape),
                    jnp.broadcast_to(jnp.float32(cam["pos"][2]), x.shape),
                )
                dirs = (x, y, one)
            d = rot(_normalize(dirs))

            hit0 = _isect(o, d)
            # Carried masks are f32 (0/1): Mosaic fails to legalize loop
            # yields of i1 vectors.
            hit0 = hit0[:1] + (hit0[1].astype(jnp.float32),) + hit0[2:6] + (
                hit0[6].astype(jnp.float32),
            )
            alive0 = jnp.ones_like(x)

            def depth_body(depth, state):
                # Whole-chunk early exit: when every lane is dead (edge
                # chunks miss everything at depth 0; dark chunks die to RR)
                # the remaining depths are skipped. Stale rec_ref slots above
                # the last written depth are harmless: every lane's final
                # record is terminal, and the reverse fold resets L at any
                # terminal slot, destroying garbage above it.
                return lax.cond(
                    jnp.max(state[3]) > 0.5,
                    _depth_live,
                    lambda a: a[1],
                    (depth, state),
                )

            def _depth_live(args):
                depth, state = args
                o, d, hit, alive_f, rays = state
                alive = alive_f > 0.5
                du = _murmur(su + depth.astype(jnp.uint32) * _U(0x85EBCA77))
                t, happened_f, p, n, uv, mat_id, emissive_f = hit
                happened = happened_f > 0.5
                emissive = emissive_f > 0.5

                V = _process_vertex(
                    ctx,
                    lambda use: _draw(lane_u, du + _U(use)),
                    d,
                    p,
                    n,
                    uv,
                    mat_id,
                    happened,
                    emissive,
                    depth == 0,
                )
                l_dir = V["l_dir"]
                w = V["w"]
                is_b = V["is_b"]
                at_vertex = alive & happened & ~is_b

                nxt = _isect(V["p_new"], V["wi"])
                nxt_happened = nxt[1]
                nxt_emissive = nxt[6]
                cont = at_vertex & ~V["rr_kill"] & nxt_happened & ~nxt_emissive
                nxt = nxt[:1] + (nxt[1].astype(jnp.float32),) + nxt[2:6] + (
                    nxt[6].astype(jnp.float32),
                )

                leaf = jnp.where(
                    ~alive,
                    0.0,
                    jnp.where(
                        ~happened,
                        V["bg_l"],
                        jnp.where(
                            is_b,
                            V["b_leaf"],
                            jnp.where(
                                V["rr_kill"],
                                l_dir,
                                jnp.clip(l_dir, 0.0, CLAMP_DIRECT)
                                + jnp.clip(V["env_ind"], 0.0, CLAMP_INDIRECT),
                            ),
                        ),
                    ),
                )
                terminal = ~cont
                # 3-field record: rec0 = leaf (terminal) / l_dir (interior),
                # rec1 = w, rec2 = terminal flag — the fold never reads a
                # terminal's l_dir/w, so leaf shares rec0 (25% less record
                # traffic than separate l_dir/w/leaf/term planes).
                rec_ref[depth, 0] = jnp.where(
                    terminal, leaf, jnp.where(alive, l_dir, 0.0)
                )
                rec_ref[depth, 1] = w
                rec_ref[depth, 2] = terminal.astype(jnp.float32)
                # Ray accounting matches the regen kernel / bench.py formula:
                # n_dir shadow rays per vertex + one bounce ray per uncapped
                # RR survivor (the per-sample primary is rays0).
                survive = at_vertex & ~V["rr_kill"] & (depth < max_bounces - 1)
                rays = rays + jnp.where(
                    at_vertex, jnp.float32(n_dir_sample), 0.0
                ) + survive.astype(jnp.float32)
                return (V["p_new"], V["wi"], nxt, cont.astype(jnp.float32), rays)

            rays0 = jnp.ones_like(x)  # the primary ray per lane
            state = (o, d, hit0, alive0, rays0)
            state = lax.fori_loop(0, max_bounces, depth_body, state)
            rays_f = state[4]

            # ---- reverse clamp fold (Scene.cpp:180-183 nesting)
            def fold_body(k, l_next):
                dd = max_bounces - 1 - k
                r0 = rec_ref[dd, 0]
                w = rec_ref[dd, 1]
                term = rec_ref[dd, 2] > 0.5
                return jnp.where(
                    term,
                    r0,
                    jnp.clip(r0, 0.0, CLAMP_DIRECT)
                    + jnp.clip(w * l_next, 0.0, CLAMP_INDIRECT),
                )

            radiance = lax.fori_loop(
                0, max_bounces, fold_body, jnp.zeros_like(x)
            )
            return (rad_acc + radiance, ray_acc + rays_f)

        zero = jnp.zeros((CH_ROWS, LANE), jnp.float32)
        rad, rays = lax.fori_loop(0, spp, spp_body, (zero, zero))
        out_ref[0, pl.ds(r0, CH_ROWS), :] = rad / spp_total.astype(
            jnp.float32
        )
        out_ref[1, pl.ds(r0, CH_ROWS), :] = rays
        return 0

    lax.fori_loop(0, n_chunks, chunk_body, 0)


def _mega_kernel_regen(
    scal_ref,
    tri_ref,
    occ_ref,
    sph_ref,
    mat_ref,
    emt_ref,
    emeta_ref,
    lcum_ref,
    par_ref,
    env_ref,
    cn_ref,
    ct_ref,
    cuv_ref,
    out_ref,
    rec_ref,
    res_ref,
    *,
    n_chunks,
    n_tris,
    n_occ,
    n_sph,
    n_sph_emitters,
    n_mats,
    n_emitters,
    n_lmesh,
    max_bounces,
    n_dir_sample,
    enable_shadow,
    any_textured,
    clustered,
    cl_groups,
    use_env,
    ablate,
    unroll,
    nsplit,
    cam,
):
    """Path-regeneration variant: each lane runs its own sample stream.

    The v1 kernel advances the whole chunk through max_bounces lockstep
    depths per sample, so lanes killed by Russian roulette idle (~60% of all
    lane-depths at rr=0.7). Here every lane that terminates folds its
    records, accumulates, and immediately spawns its next camera sample —
    lanes stay at ~100% occupancy until their spp budget runs out.

    Mechanics:
    - per-lane depth/sample counters (d_lane, s_lane); one shared intersect
      per iteration serves bounce rays and freshly spawned camera rays alike;
    - a vertex's contribution cannot be finalized until its bounce ray's hit
      is known (the reference's "indirect ray reached an emitter/missed → env
      color" rule, Scene.cpp:145-176), so survivors carry the PENDING
      env-terminal radiance, finalized next iteration;
    - the nested firefly-clamp fold (Scene.cpp:180-183) runs FORWARD in
      closed form: with every weight and l_dir term ≥ 0, the per-vertex map
      x ↦ clamp15(l_dir) + clamp(w·x, 0, 5) = min(a+5, a + w·max(0, x))
      (a = clamp15(l_dir)) belongs to the min-affine family
      g(x) = min(C, B + W·max(0, x)), which is CLOSED under composition:
        (C1,B1,W1)∘(C2,B2,W2) = (min(C1, B1+W1·C2), B1+W1·B2, W1·W2).
      Each lane carries the root-to-current-prefix composition (3 tiles) and
      evaluates min(C, B + W·max(0, leaf)) at termination — exactly the
      reference's nested-clamp value, with NO per-depth record slots, no
      read-modify-write one-hot scatter, and no reverse fold (the ablation
      study attributed ~half the kernel's runtime to exactly that record
      machinery). Depth-0 terminals bypass the map (identity), preserving
      the reference's unclamped depth-0 returns (e.g. raw possibly-negative
      l_dir on an RR kill, Scene.cpp:129);
    - RNG counters fold (lane, s_lane, d_lane, use) per draw — fully
      deterministic and independent of scheduling; camera draws key on
      (pixel, s_lane) so the three channel lanes still share each sample's
      primary ray even though they desynchronize.
    """
    seed = scal_ref[0, 0].astype(jnp.uint32)
    lane_off = scal_ref[0, 1]
    # per-lane sample BUDGET; with stream splitting (cam["tile"][3] = S > 1)
    # a lane renders every S-th sample of its pixel, so spp = spp_total / S
    spp = scal_ref[0, 2]
    lane_stride = scal_ref[0, 3]
    spp_total = scal_ref[0, 4]
    # The fan + next-ray intersect fuse into ONE sweep per vertex: SMEM
    # scenes via the merged table sweep (_fan_and_nearest), clustered
    # scenes via the merged single tree walk (cluster_fan_and_near).
    # MCPT_MEGA_ABLATE=unmerged restores the two-sweep schedule for A/Bs
    # (bitwise-identical output either way).
    merged = "unmerged" not in ablate
    # in-lane sample interleave slots: merged path only
    if not merged:
        nsplit = 1

    row_iota = jax.lax.broadcasted_iota(jnp.int32, (CH_ROWS, LANE), 0)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (CH_ROWS, LANE), 1)

    bg = (par_ref[0, 0], par_ref[0, 1], par_ref[0, 2])
    rr_rate = par_ref[0, 3]
    inv_rr = par_ref[0, 4]
    total_area = par_ref[0, 5]
    n_streams = cam["tile"][3] if cam.get("tile") else 1

    def chunk_body(rc, _):
        r0 = rc * CH_ROWS
        # strided lane assignment: lane = off + idx*stride. stride=1 for the
        # single-chip render; the sharded render interleaves devices
        # (stride = n_devices) so every device samples the whole image and
        # per-device work stays balanced (sky rows terminate early, interior
        # rows bounce — contiguous ranges were ~83% balanced at 8 devices).
        vlane = lane_off + ((r0 + row_iota) * LANE + col_iota) * lane_stride
        pix, chan, fi, fj, lane, stream = _lane_to_pixel(vlane, cam)
        pix_u = pix.astype(jnp.uint32)
        lane_u = lane.astype(jnp.uint32)
        lam = jnp.where(
            chan == 0,
            jnp.float32(WAVELEN_UM[0]),
            jnp.where(
                chan == 1, jnp.float32(WAVELEN_UM[1]), jnp.float32(WAVELEN_UM[2])
            ),
        )

        def rot(v):
            om = cam["om"]
            return (
                om[0][0] * v[0] + om[0][1] * v[1] + om[0][2] * v[2],
                om[1][0] * v[0] + om[1][1] * v[1] + om[1][2] * v[2],
                om[2][0] * v[0] + om[2][1] * v[1] + om[2][2] * v[2],
            )

        ctx = {
            "tri_ref": tri_ref,
            "sph_ref": sph_ref,
            "mat_ref": mat_ref,
            "emt_ref": emt_ref,
            "emeta_ref": emeta_ref,
            "lcum_ref": lcum_ref,
            "n_tris": n_tris,
            "n_sph": n_sph,
            "n_mats": n_mats,
            "n_emitters": n_emitters,
            "n_lmesh": n_lmesh,
            "n_dir_sample": n_dir_sample,
            "enable_shadow": enable_shadow,
            "textured": any_textured,
            "chan": chan,
            "lam": lam,
            "bg": bg,
            "rr_rate": rr_rate,
            "inv_rr": inv_rr,
            "total_area": total_area,
            "n_sph_emitters": n_sph_emitters,
            "ablate": ablate,
            "use_env": use_env,
            "env_ref": env_ref,
            "is_r": (chan == 0).astype(jnp.float32),
            "is_g": (chan == 1).astype(jnp.float32),
            "is_b": (chan == 2).astype(jnp.float32),
        }
        _isect, _ofan, _fan_near = _make_intersect_fns(
            tri_ref, occ_ref, sph_ref, cn_ref, ct_ref, cuv_ref, res_ref,
            n_tris, n_occ, n_sph, clustered, any_textured, ablate=ablate,
            cl_groups=cl_groups,
        )
        ctx["occlude_fan"] = _ofan

        def cam_ray(s_vec, slot=0):
            """Camera ray of per-lane BUDGET index s_vec (Renderer.cpp:44-76);
            the ACTUAL sample id is stream + (slot + s_vec*nsplit)*S, so
            draws key on (pixel, actual sample) only — identical streams
            regardless of how samples are split across lanes (lane-level
            streams S) or within a lane (interleave slots nsplit)."""
            s_act = stream + (slot + s_vec * nsplit) * n_streams
            mix = (
                s_act.astype(jnp.uint32) * _U(0x0ED5AD4D)
                + seed * _U(0x01000193)
            )
            camdraw = lambda c: _unit(
                _murmur(pix_u * _U(0x9E3779B1) + mix + _U(c))
            )
            u0 = camdraw(0x51ED2701)
            u1 = camdraw(0x51ED2702)
            x = (1.0 - 2.0 * (fi + u0) / cam["width"]) * cam["xscale"]
            y = (1.0 - 2.0 * (fj + u1) / cam["height"]) * cam["yscale"]
            one = jnp.ones_like(x)
            if cam["use_dof"]:
                u2 = camdraw(0x51ED2703)
                u3 = camdraw(0x51ED2704)
                r = cam["aperture"] * jnp.sqrt(u2)
                theta = 2.0 * jnp.pi * u3
                dx = r * jnp.cos(theta)
                dy = r * jnp.sin(theta)
                lens_w = rot((dx, dy, jnp.zeros_like(dx)))
                o = (
                    cam["pos"][0] + lens_w[0],
                    cam["pos"][1] + lens_w[1],
                    cam["pos"][2] + lens_w[2],
                )
                fd = cam["focal"]
                dirs = (x * fd - dx, y * fd - dy, one * fd)
            else:
                o = (
                    jnp.broadcast_to(jnp.float32(cam["pos"][0]), x.shape),
                    jnp.broadcast_to(jnp.float32(cam["pos"][1]), x.shape),
                    jnp.broadcast_to(jnp.float32(cam["pos"][2]), x.shape),
                )
                dirs = (x, y, one)
            return o, rot(_normalize(dirs))

        def _pack_hit(h):
            # Slim loop-carried hit: t is never used downstream, uv is
            # all-zeros for untextured scenes, and (mat, happened, emissive)
            # pack into one small-integer f32 tile (mat·4 + hap·2 + em) —
            # trimming the fori-carried state (register/VMEM pressure
            # dominates this kernel, see PERF.md).
            code = (
                h[5] * 4.0
                + h[1].astype(jnp.float32) * 2.0
                + h[6].astype(jnp.float32)
            )
            out = h[2] + h[3]
            if any_textured:
                out = out + h[4]
            return out + (code,)

        def _unpack_hit(hit):
            p = hit[0:3]
            n = hit[3:6]
            if any_textured:
                uv = hit[6:8]
                code = hit[8]
            else:
                z = jnp.zeros_like(hit[0])
                uv = (z, z)
                code = hit[6]
            half = jnp.floor(code * 0.5)
            em_f = code - 2.0 * half
            happened_f = half - 2.0 * jnp.floor(half * 0.5)
            mat_id = jnp.floor(half * 0.5)
            return happened_f, p, n, uv, mat_id, em_f

        # ---- initial state: every lane spawns sample 0. The per-lane
        # (sample, depth, has_pend) counters share one i32 tile
        # (s·64 + depth·2 + pend); the fold prefix starts at the identity
        # map (C=FOLD_BIG, B=0, W=1). The ray ORIGIN is not carried: the
        # next origin is rebuilt each iteration (camera respawn or p_new)
        # and consumed by the same iteration's intersect.
        izero = jnp.zeros((CH_ROWS, LANE), jnp.int32)
        fzero = jnp.zeros((CH_ROWS, LANE), jnp.float32)
        fone = jnp.ones((CH_ROWS, LANE), jnp.float32)
        n_hit = 9 if any_textured else 7
        per_slot = 8 + n_hit  # d(3) + hit + code + fC/fB/fW + pend
        if merged and nsplit > 1:
            # Interleave slots: slot k owns samples k + v*nsplit, budget
            # ceil((spp - k)/nsplit) (no divisibility requirement — a slot
            # with zero budget just idles). State = nsplit slot blocks +
            # shared (rad, rays[, m0]).
            spp_k = [
                (spp + jnp.int32(nsplit - 1 - k)) // jnp.int32(nsplit)
                for k in range(nsplit)
            ]
            sl0 = []
            rays0 = fzero
            for k in range(nsplit):
                ok_, dk_ = cam_ray(izero, k)
                hitk = _pack_hit(_isect(ok_, dk_))
                sl0 += [
                    *dk_, *hitk, izero, fone * jnp.float32(FOLD_BIG),
                    fzero, fone, fzero,
                ]
                # each slot with a nonzero budget spawns its sample 0
                rays0 = rays0 + (izero < spp_k[k]).astype(jnp.float32)
            state0 = tuple(sl0) + (fzero, rays0) + (
                (fzero,) if use_env else ()
            )
        else:
            spp_k = [spp]
            o0, d0 = cam_ray(izero)
            hit0 = _pack_hit(_isect(o0, d0))
            state0 = (
                d0,
                hit0,
                izero,  # code: s_lane*64 + d_lane*2 + has_pend
                fone * jnp.float32(FOLD_BIG),  # fold C
                fzero,  # fold B
                fone,  # fold W
                fzero,  # pend_rad (prefix-folded env-terminal radiance)
                fzero,  # rad
                fone,  # rays (sample-0 primary)
            ) + ((fzero,) if use_env else ())  # primary-miss (deferred)

        def iter_body(it, state):
            # `unroll` path-segments per loop trip: amortizes the loop/cond
            # machinery and the all-done reduction over several segments
            # (the ablation study shows per-iteration framework overhead,
            # not shading flops, bounds this kernel). Running a segment
            # past completion is a no-op state-wise, so the coarser
            # early-exit granularity is harmless.
            def _live_n(args):
                _, s = args
                for _ in range(unroll):
                    s = _iter_live((0, s))
                return s

            # code = s_lane*64 + ... so min(code) < spp*64 ⟺ min(s_lane) < spp
            if merged and nsplit > 1:
                live = jnp.bool_(False)
                for k in range(nsplit):
                    code_k = state[k * per_slot + 3 + n_hit]
                    live = live | (jnp.min(code_k) < spp_k[k] * 64)
            else:
                live = jnp.min(state[2]) < spp * 64
            return lax.cond(live, _live_n, lambda a: a[1], (it, state))

        def _iter_live(args):
            _, state = args
            if merged and nsplit > 1:
                return _iter_live_m(state)
            (d, hit, code, fC, fB, fW, pend_rad, rad, rays, *m0_t) = state
            m0 = m0_t[0] if use_env else None
            s_lane = code >> 6
            d_lane = (code >> 1) & 31
            active = s_lane < spp
            happened_f, p, n, uv, mat_id, em_f = _unpack_hit(hit)
            happened = happened_f > 0.5
            emissive = em_f > 0.5
            has_pend = ((code & 1) > 0) & active

            # 1. finalize the pending record using this iteration's hit:
            # bounce ray missed or reached an emitter → env-rule terminal
            # (Scene.cpp:145-176); otherwise the path continues here.
            ended_env = has_pend & (~happened | emissive)

            # 2. vertex processing (skipped state-wise for ended_env lanes)
            proc = active & ~ended_env
            # Chunk-coherent fast path: a "vertex" lane is one whose hit
            # needs shading (proc, hit something non-emissive — emissive
            # proc hits imply d_lane==0, the eye-emitter case, because a
            # pending lane hitting an emitter lands in ended_env instead).
            # Border chunks of the image miss everything every sample and
            # chunks late in their spp budget often hold only misses /
            # eye-emitter hits — for those, the whole NEE fan + BSDF +
            # RR block is skipped; only the leaf values are produced.
            is_vertex = proc & happened & ~emissive
            do_vertex = jnp.max(is_vertex.astype(jnp.float32)) > 0.5
            zf = jnp.zeros_like(fC)

            def _respawn_ray(survive, wi, p_cont):
                """done lanes' next camera ray vs survivors' bounce ray:
                shared by both cond branches in merged mode (each branch
                must know its next ray BEFORE the fused table sweep)."""
                write_now = proc & ~survive
                done_now = active & (write_now | ended_env)
                s_new = s_lane + done_now.astype(jnp.int32)
                need_spawn = done_now & (s_new < spp)
                oc, dc = cam_ray(s_new)
                o_n = _where3(need_spawn, oc, p_cont)
                d_n = _where3(need_spawn, dc, _where3(survive, wi, d))
                return o_n, d_n, need_spawn

            def _full_vertex_merged(_):
                s_act = stream + s_lane * n_streams
                draw = lambda use: _unit(
                    _murmur(
                        lane_u * _U(0x9E3779B1)
                        + s_act.astype(jnp.uint32) * _U(0x0ED5AD4D)
                        + d_lane.astype(jnp.uint32) * _U(0x9E3779B9)
                        + seed * _U(0x01000193)
                        + _U((use * 0x632BE59B) & 0xFFFFFFFF)
                    )
                )
                V = _vertex_pre(
                    ctx, draw, d, p, n, uv, mat_id, happened, emissive,
                    d_lane == 0,
                )
                at_vertex = proc & happened & ~V["is_b"]
                survive_raw = at_vertex & ~V["rr_kill"]
                capped = survive_raw & (d_lane == max_bounces - 1)
                survive = survive_raw & ~capped
                o_n, d_n, _ = _respawn_ray(survive, V["wi"], V["p_new"])
                # ONE fused sweep: S-ray shadow fan + next-ray nearest hit
                # (VERDICT r4: the two sweeps shared per-primitive loop
                # machinery and sphere-row loads — pay them once).
                if enable_shadow and V["samples"]:
                    vis_l, hit_l = _fan_near(
                        [(
                            V["p_dl"],
                            [s_[0] for s_ in V["samples"]],
                            [s_[1] for s_ in V["samples"]],
                        )],
                        [(o_n, d_n)],
                        masks=[happened],
                    )
                    vis, hit_t = vis_l[0], hit_l[0]
                else:
                    vis = None
                    hit_t = _isect(o_n, d_n)
                l_dir = _nee_shade(ctx, n, V, vis)
                leaf_now = jnp.where(
                    ~happened,
                    V["bg_l"],
                    jnp.where(
                        V["is_b"],
                        V["b_leaf"],
                        jnp.where(
                            capped,
                            jnp.clip(l_dir, 0.0, CLAMP_DIRECT),
                            l_dir,
                        ),
                    ),
                )
                a_t = jnp.clip(l_dir, 0.0, CLAMP_DIRECT)
                new_pend_leaf = a_t + jnp.clip(
                    V["env_ind"], 0.0, CLAMP_INDIRECT
                )
                return (
                    a_t,
                    V["w"],
                    leaf_now,
                    survive.astype(jnp.float32),
                    at_vertex.astype(jnp.float32),
                    new_pend_leaf,
                ) + d_n + _pack_hit(hit_t)

            def _cheap_vertex_merged(_):
                emit = zf

                def mgather(mi, acc):
                    e = jnp.where(
                        chan == 0,
                        ctx["mat_ref"][mi, 7],
                        jnp.where(
                            chan == 1,
                            ctx["mat_ref"][mi, 8],
                            ctx["mat_ref"][mi, 9],
                        ),
                    )
                    return jnp.where(
                        mat_id == mi.astype(jnp.float32), e, acc
                    )

                emit = lax.fori_loop(0, ctx["n_mats"], mgather, emit)
                won = -(d[0] * n[0] + d[1] * n[1] + d[2] * n[2])
                b_leaf = jnp.clip(emit * jnp.abs(won), 0.0, 1.0)
                if use_env:
                    bg_l = zf
                else:
                    bg_l = jnp.where(
                        chan == 0,
                        bg[0],
                        jnp.where(chan == 1, bg[1], bg[2]),
                    )
                leaf_now = jnp.where(~happened, bg_l, b_leaf)
                nothing = zf > 0.5
                o_n, d_n, _ = _respawn_ray(nothing, d, p)
                hit_t = _isect(o_n, d_n)
                return (zf, zf, leaf_now, zf, zf, zf) + d_n + _pack_hit(
                    hit_t
                )

            def _full_vertex(_):
                s_act = stream + s_lane * n_streams
                draw = lambda use: _unit(
                    _murmur(
                        lane_u * _U(0x9E3779B1)
                        + s_act.astype(jnp.uint32) * _U(0x0ED5AD4D)
                        + d_lane.astype(jnp.uint32) * _U(0x9E3779B9)
                        + seed * _U(0x01000193)
                        + _U((use * 0x632BE59B) & 0xFFFFFFFF)
                    )
                )
                V = _process_vertex(
                    ctx, draw, d, p, n, uv, mat_id, happened, emissive,
                    d_lane == 0,
                )
                at_vertex = proc & happened & ~V["is_b"]
                survive_raw = at_vertex & ~V["rr_kill"]
                capped = survive_raw & (d_lane == max_bounces - 1)
                survive = survive_raw & ~capped
                # terminal-now leaf: miss → bg; eye-emitter → clamped
                # emission; RR kill → RAW l_dir (Scene.cpp:129,156);
                # bounce-cap → the v1 fold value clamp15(l_dir) +
                # clamp5(w·0) = clamp15(l_dir).
                leaf_now = jnp.where(
                    ~happened,
                    V["bg_l"],
                    jnp.where(
                        V["is_b"],
                        V["b_leaf"],
                        jnp.where(
                            capped,
                            jnp.clip(V["l_dir"], 0.0, CLAMP_DIRECT),
                            V["l_dir"],
                        ),
                    ),
                )
                a_t = jnp.clip(V["l_dir"], 0.0, CLAMP_DIRECT)
                new_pend_leaf = a_t + jnp.clip(
                    V["env_ind"], 0.0, CLAMP_INDIRECT
                )
                return (
                    a_t,
                    V["w"],
                    leaf_now,
                    survive.astype(jnp.float32),
                    at_vertex.astype(jnp.float32),
                    new_pend_leaf,
                ) + V["p_new"] + V["wi"]

            def _cheap_vertex(_):
                # No shading needed anywhere in the chunk: proc lanes are
                # misses (leaf = bg) or eye-emitter hits (leaf = clamped
                # emission, Scene.cpp:102-107). Only the emission channel
                # of the material table is gathered.
                emit = zf

                def mgather(mi, acc):
                    e = jnp.where(
                        chan == 0,
                        ctx["mat_ref"][mi, 7],
                        jnp.where(
                            chan == 1,
                            ctx["mat_ref"][mi, 8],
                            ctx["mat_ref"][mi, 9],
                        ),
                    )
                    return jnp.where(
                        mat_id == mi.astype(jnp.float32), e, acc
                    )

                emit = lax.fori_loop(0, ctx["n_mats"], mgather, emit)
                won = -(d[0] * n[0] + d[1] * n[1] + d[2] * n[2])
                b_leaf = jnp.clip(emit * jnp.abs(won), 0.0, 1.0)
                if use_env:
                    # primary-miss radiance is deferred (counted in m0)
                    bg_l = zf
                else:
                    bg_l = jnp.where(
                        chan == 0,
                        bg[0],
                        jnp.where(chan == 1, bg[1], bg[2]),
                    )
                leaf_now = jnp.where(~happened, bg_l, b_leaf)
                return (zf, zf, leaf_now, zf, zf, zf) + p + d

            # "nocond" (perf-probe): always run the full vertex path —
            # identical output (the cheap branch is only a border/tail
            # chunk fast path); measures the lax.cond join cost.
            if merged:
                if "nocond" in ablate:
                    res_t = _full_vertex_merged(0)
                else:
                    res_t = lax.cond(
                        do_vertex, _full_vertex_merged, _cheap_vertex_merged,
                        0,
                    )
                (a_t, w_t, leaf_now, survive_f, at_vertex_f,
                 new_pend_leaf) = res_t[:6]
                d_next = res_t[6:9]
                hit_next = tuple(res_t[9:])
            else:
                if "nocond" in ablate:
                    res_t = _full_vertex(0)
                else:
                    res_t = lax.cond(
                        do_vertex, _full_vertex, _cheap_vertex, 0
                    )
                (a_t, w_t, leaf_now, survive_f, at_vertex_f, new_pend_leaf,
                 pn0, pn1, pn2, wi0, wi1, wi2) = res_t
            survive = survive_f > 0.5
            at_vertex = at_vertex_f > 0.5
            write_now = proc & ~survive

            # 3. terminal contributions through the composed prefix map.
            # A depth-0 terminal bypasses the map (prefix = identity,
            # reference returns the raw — possibly negative — depth-0 value);
            # deeper terminals evaluate min(C, B + W·max(0, leaf)), which is
            # exactly the reference's nested clamp fold of the whole path
            # (see the kernel docstring for the closure proof).
            f_id = d_lane == 0
            ev_now = jnp.minimum(fC, fB + fW * jnp.maximum(leaf_now, 0.0))
            contrib = jnp.where(f_id, leaf_now, ev_now)
            done_now = active & (write_now | ended_env)
            rad = rad + jnp.where(
                done_now, jnp.where(ended_env, pend_rad, contrib), 0.0
            )

            # pending env-terminal radiance for survivors: the value this
            # path takes if its bounce ray misses / reaches an emitter
            # (pend_leaf ≥ 0 by construction, so no max(0,·) needed)
            ev_pend = jnp.minimum(fC, fB + fW * new_pend_leaf)
            pend_rad = jnp.where(
                survive, jnp.where(f_id, new_pend_leaf, ev_pend), pend_rad
            )
            # compose this vertex's interior map f(x) = a + min(5, w·max(0,x))
            # into the prefix; W is capped so W·leaf can never overflow to
            # inf (the cap only matters for pathological w products where
            # the map is saturated anyway)
            cC = jnp.minimum(fC, fB + fW * (a_t + CLAMP_INDIRECT))
            cB = fB + fW * a_t
            cW = jnp.minimum(fW * w_t, jnp.float32(FOLD_W_CAP))

            # primary-miss count: these lanes' radiance is deferred to the
            # full-res env pass (their leaf_now is 0 when use_env)
            if use_env:
                pm = proc & ~happened & f_id
                m0 = m0 + pm.astype(jnp.float32)

            # 4. respawn for lanes whose path just ended (prefix → identity)
            s_new = s_lane + done_now.astype(jnp.int32)
            need_spawn = done_now & (s_new < spp)
            fC = jnp.where(
                need_spawn, jnp.float32(FOLD_BIG), jnp.where(survive, cC, fC)
            )
            fB = jnp.where(need_spawn, 0.0, jnp.where(survive, cB, fB))
            fW = jnp.where(need_spawn, 1.0, jnp.where(survive, cW, fW))
            if not merged:
                oc, dc = cam_ray(s_new)
                # dead (budget-exhausted) lanes fall through to p_new/pn —
                # any finite ray is fine, their results are masked
                o = _where3(need_spawn, oc, (pn0, pn1, pn2))
                d = _where3(
                    need_spawn, dc, _where3(survive, (wi0, wi1, wi2), d)
                )
            d_new = jnp.where(
                done_now, 0, jnp.where(survive, d_lane + 1, d_lane)
            )
            code = (s_new << 6) | (d_new << 1) | survive.astype(jnp.int32)
            # Ray accounting matches bench.py's baseline formula: 1 primary
            # per camera sample, n_dir shadow rays per vertex, and a bounce
            # ray only when one is actually traced (RR survivor, not
            # bounce-capped) — BASELINE.md's "1 + 1.667*4 + 0.667" model.
            rays = (
                rays
                + jnp.where(at_vertex, jnp.float32(n_dir_sample), 0.0)
                + survive_f
                + need_spawn.astype(jnp.float32)
            )

            # 5. one shared intersect: bounce rays and fresh camera rays.
            # Merged mode already intersected the next ray inside the cond
            # branches (fused with the shadow fan's table sweep).
            if merged:
                d = d_next
                hit = hit_next
            else:
                hit = _pack_hit(_isect(o, d))
            return (
                d, hit, code, fC, fB, fW, pend_rad, rad, rays,
            ) + ((m0,) if use_env else ())

        def _iter_live_m(state):
            """nsplit-slot interleaved iteration (merged SMEM path): unpack
            every slot, ONE cheap/full cond over the union, ONE fused table
            sweep serving every slot's shadow fan + next ray, then per-slot
            fold/respawn updates into shared rad/rays accumulators. Per-
            sample arithmetic is identical to the single-slot kernel (same
            draw keys on the actual sample id); only the per-lane f32
            accumulation order differs."""
            slots = [
                state[k * per_slot : (k + 1) * per_slot]
                for k in range(nsplit)
            ]
            tail = state[nsplit * per_slot :]
            rad, rays = tail[0], tail[1]
            m0 = tail[2] if use_env else None
            zf = fzero
            U = []
            any_vertex = None
            for k in range(nsplit):
                st = slots[k]
                code = st[3 + n_hit]
                s_lane = code >> 6
                d_lane = (code >> 1) & 31
                active = s_lane < spp_k[k]
                happened_f, p, n_s, uv, mat_id, em_f = _unpack_hit(
                    st[3 : 3 + n_hit]
                )
                happened = happened_f > 0.5
                emissive = em_f > 0.5
                has_pend = ((code & 1) > 0) & active
                ended_env = has_pend & (~happened | emissive)
                proc = active & ~ended_env
                is_vertex = proc & happened & ~emissive
                U.append({
                    "d": st[0:3], "fC": st[4 + n_hit], "fB": st[5 + n_hit],
                    "fW": st[6 + n_hit], "pend": st[7 + n_hit],
                    "s_lane": s_lane, "d_lane": d_lane, "active": active,
                    "p": p, "n": n_s, "uv": uv, "mat_id": mat_id,
                    "happened": happened, "emissive": emissive,
                    "ended_env": ended_env, "proc": proc,
                })
                iv = is_vertex.astype(jnp.float32)
                any_vertex = (
                    iv if any_vertex is None else jnp.maximum(any_vertex, iv)
                )
            do_vertex = jnp.max(any_vertex) > 0.5

            def _respawn_m(k, u, survive, wi, p_cont):
                write_now = u["proc"] & ~survive
                done_now = u["active"] & (write_now | u["ended_env"])
                s_new = u["s_lane"] + done_now.astype(jnp.int32)
                need_spawn = done_now & (s_new < spp_k[k])
                oc, dc = cam_ray(s_new, k)
                o_n = _where3(need_spawn, oc, p_cont)
                d_n = _where3(need_spawn, dc, _where3(survive, wi, u["d"]))
                return o_n, d_n

            def _full_m(_):
                fans = []
                nxts = []
                mids = []
                for k in range(nsplit):
                    u = U[k]
                    s_act = stream + (k + u["s_lane"] * nsplit) * n_streams
                    draw = (lambda sa, dl: lambda use: _unit(
                        _murmur(
                            lane_u * _U(0x9E3779B1)
                            + sa.astype(jnp.uint32) * _U(0x0ED5AD4D)
                            + dl.astype(jnp.uint32) * _U(0x9E3779B9)
                            + seed * _U(0x01000193)
                            + _U((use * 0x632BE59B) & 0xFFFFFFFF)
                        )
                    ))(s_act, u["d_lane"])
                    V = _vertex_pre(
                        ctx, draw, u["d"], u["p"], u["n"], u["uv"],
                        u["mat_id"], u["happened"], u["emissive"],
                        u["d_lane"] == 0,
                    )
                    at_vertex = u["proc"] & u["happened"] & ~V["is_b"]
                    survive_raw = at_vertex & ~V["rr_kill"]
                    capped = survive_raw & (u["d_lane"] == max_bounces - 1)
                    survive = survive_raw & ~capped
                    o_n, d_n = _respawn_m(
                        k, u, survive, V["wi"], V["p_new"]
                    )
                    fans.append((
                        V["p_dl"],
                        [s_[0] for s_ in V["samples"]],
                        [s_[1] for s_ in V["samples"]],
                    ))
                    nxts.append((o_n, d_n))
                    mids.append((V, at_vertex, survive, capped))
                if enable_shadow and n_dir_sample > 0 and n_emitters > 0:
                    vis_l, hit_l = _fan_near(
                        fans, nxts,
                        masks=[U[k]["happened"] for k in range(nsplit)],
                    )
                else:
                    vis_l = [None] * nsplit
                    hit_l = [
                        _isect(nxts[k][0], nxts[k][1])
                        for k in range(nsplit)
                    ]
                out = ()
                for k in range(nsplit):
                    u = U[k]
                    V, at_vertex, survive, capped = mids[k]
                    l_dir = _nee_shade(ctx, u["n"], V, vis_l[k])
                    leaf_now = jnp.where(
                        ~u["happened"],
                        V["bg_l"],
                        jnp.where(
                            V["is_b"],
                            V["b_leaf"],
                            jnp.where(
                                capped,
                                jnp.clip(l_dir, 0.0, CLAMP_DIRECT),
                                l_dir,
                            ),
                        ),
                    )
                    a_t = jnp.clip(l_dir, 0.0, CLAMP_DIRECT)
                    new_pend = a_t + jnp.clip(
                        V["env_ind"], 0.0, CLAMP_INDIRECT
                    )
                    out = out + (
                        a_t, V["w"], leaf_now,
                        survive.astype(jnp.float32),
                        at_vertex.astype(jnp.float32), new_pend,
                    ) + nxts[k][1] + _pack_hit(hit_l[k])
                return out

            def _cheap_m(_):
                def mgather(mi, accs):
                    e = jnp.where(
                        chan == 0,
                        ctx["mat_ref"][mi, 7],
                        jnp.where(
                            chan == 1,
                            ctx["mat_ref"][mi, 8],
                            ctx["mat_ref"][mi, 9],
                        ),
                    )
                    return tuple(
                        jnp.where(
                            U[k]["mat_id"] == mi.astype(jnp.float32), e,
                            accs[k],
                        )
                        for k in range(nsplit)
                    )

                emits = lax.fori_loop(
                    0, ctx["n_mats"], mgather, (zf,) * nsplit
                )
                if use_env:
                    bg_l = zf
                else:
                    bg_l = jnp.where(
                        chan == 0, bg[0],
                        jnp.where(chan == 1, bg[1], bg[2]),
                    )
                out = ()
                nothing = zf > 0.5
                for k in range(nsplit):
                    u = U[k]
                    d_k = u["d"]
                    n_s = u["n"]
                    won = -(
                        d_k[0] * n_s[0] + d_k[1] * n_s[1] + d_k[2] * n_s[2]
                    )
                    b_leaf = jnp.clip(emits[k] * jnp.abs(won), 0.0, 1.0)
                    leaf_now = jnp.where(~u["happened"], bg_l, b_leaf)
                    o_n, d_n = _respawn_m(k, u, nothing, d_k, u["p"])
                    hit_t = _isect(o_n, d_n)
                    out = out + (zf, zf, leaf_now, zf, zf, zf) + d_n + (
                        _pack_hit(hit_t)
                    )
                return out

            if "nocond" in ablate:
                res = _full_m(0)
            else:
                res = lax.cond(do_vertex, _full_m, _cheap_m, 0)
            stride = 9 + n_hit
            new_state = ()
            for k in range(nsplit):
                u = U[k]
                rk = res[k * stride : (k + 1) * stride]
                (a_t, w_t, leaf_now, survive_f, at_vertex_f,
                 new_pend) = rk[:6]
                d_n = tuple(rk[6:9])
                hit_n = tuple(rk[9:])
                survive = survive_f > 0.5
                at_vertex = at_vertex_f > 0.5
                write_now = u["proc"] & ~survive
                f_id = u["d_lane"] == 0
                fC, fB, fW, pend = u["fC"], u["fB"], u["fW"], u["pend"]
                ev_now = jnp.minimum(
                    fC, fB + fW * jnp.maximum(leaf_now, 0.0)
                )
                contrib = jnp.where(f_id, leaf_now, ev_now)
                done_now = u["active"] & (write_now | u["ended_env"])
                rad = rad + jnp.where(
                    done_now,
                    jnp.where(u["ended_env"], pend, contrib),
                    0.0,
                )
                ev_pend = jnp.minimum(fC, fB + fW * new_pend)
                pend = jnp.where(
                    survive, jnp.where(f_id, new_pend, ev_pend), pend
                )
                cC = jnp.minimum(fC, fB + fW * (a_t + CLAMP_INDIRECT))
                cB = fB + fW * a_t
                cW = jnp.minimum(fW * w_t, jnp.float32(FOLD_W_CAP))
                if use_env:
                    pm = u["proc"] & ~u["happened"] & f_id
                    m0 = m0 + pm.astype(jnp.float32)
                s_new = u["s_lane"] + done_now.astype(jnp.int32)
                need_spawn = done_now & (s_new < spp_k[k])
                fC = jnp.where(
                    need_spawn, jnp.float32(FOLD_BIG),
                    jnp.where(survive, cC, fC),
                )
                fB = jnp.where(
                    need_spawn, 0.0, jnp.where(survive, cB, fB)
                )
                fW = jnp.where(
                    need_spawn, 1.0, jnp.where(survive, cW, fW)
                )
                d_new = jnp.where(
                    done_now, 0,
                    jnp.where(survive, u["d_lane"] + 1, u["d_lane"]),
                )
                code = (
                    (s_new << 6) | (d_new << 1) | survive.astype(jnp.int32)
                )
                rays = (
                    rays
                    + jnp.where(
                        at_vertex, jnp.float32(n_dir_sample), 0.0
                    )
                    + survive_f
                    + need_spawn.astype(jnp.float32)
                )
                new_state = new_state + d_n + hit_n + (
                    code, fC, fB, fW, pend
                )
            return new_state + (rad, rays) + ((m0,) if use_env else ())

        total_iters = (
            spp_k[0] * jnp.int32(max_bounces + 1) + jnp.int32(unroll - 1)
        ) // jnp.int32(unroll)
        state = lax.fori_loop(0, total_iters, iter_body, state0)
        if merged and nsplit > 1:
            base = nsplit * per_slot
            rad, rays = state[base], state[base + 1]
            m0_out = state[base + 2] if use_env else None
        else:
            rad, rays = state[7], state[8]
            m0_out = state[9] if use_env else None
        out_ref[0, pl.ds(r0, CH_ROWS), :] = rad / spp_total.astype(
            jnp.float32
        )
        out_ref[1, pl.ds(r0, CH_ROWS), :] = rays
        if use_env:
            out_ref[2, pl.ds(r0, CH_ROWS), :] = m0_out
        return 0

    lax.fori_loop(0, n_chunks, chunk_body, 0)


# ---------------------------------------------------------------------------
# Host-side wrappers
# ---------------------------------------------------------------------------


def mega_supported(pack) -> bool:
    """Small scenes brute-force from SMEM; big ones use the clustered BVH
    (built by scene.compile above 1024 triangles). Env-map scenes run on
    the regen kernel: secondary bounces sample an in-kernel SMEM mip and
    primary misses are deferred to a full-res XLA pass (render_mega)."""
    small = pack.tri_sc.shape[0] <= MEGA_MAX_TRIS
    return small or pack.n_cl_nodes > 0


def _block_lanes(pack) -> int:
    """Lanes per pallas_call: clustered and env scenes halve the block so
    the cluster tables / third (miss-count) output plane stay inside the
    VMEM budget."""
    if pack.n_cl_nodes > 0 or pack.use_env:
        return MEGA_LANES // 2
    return MEGA_LANES


def _resample_weights(n_src: int, n_dst: int):
    """(n_dst, n_src) row-stochastic area-overlap weights: exact box average
    when downsampling, linear-ish when upsampling — local means preserved."""
    s0 = jnp.arange(n_src, dtype=jnp.float32)[None, :] / n_src
    s1 = (jnp.arange(n_src, dtype=jnp.float32)[None, :] + 1.0) / n_src
    d0 = jnp.arange(n_dst, dtype=jnp.float32)[:, None] / n_dst
    d1 = (jnp.arange(n_dst, dtype=jnp.float32)[:, None] + 1.0) / n_dst
    return (
        jnp.maximum(0.0, jnp.minimum(s1, d1) - jnp.maximum(s0, d0)) * n_dst
    )


def env_mip_table(env_pixels):
    """(3*ENV_MIP_ROWS, 128) SMEM channel-plane layout of the in-kernel env
    mip: plane c rows [c*ENV_MIP_ROWS, (c+1)*ENV_MIP_ROWS), texel t at
    (t >> 7, t & 127) within the plane, t = row*ENV_MIP_W + col."""
    ow = _resample_weights(env_pixels.shape[0], ENV_MIP_H)
    oc = _resample_weights(env_pixels.shape[1], ENV_MIP_W)
    mip = jnp.einsum("rh,hwc,sw->rsc", ow, env_pixels, oc)
    return mip.transpose(2, 0, 1).reshape(3 * ENV_MIP_ROWS, 128)


def mega_tables(pack):
    """SMEM tables for the kernel, built from the ScenePack by cheap concats
    (tiny: tens of rows). Layouts:
      tri: cols 0-13 = tri_sc (w 9, c 3, nr2, valid), 14-16 normal,
           17-22 uv t0,t1,t2, 23 mat, 24 emissive
      sph: c(3), r, mat, emissive
    """
    t8 = pack.tri_sc.shape[0]
    tri = jnp.concatenate(
        [pack.tri_sc[:, :14], pack.tri_shade[:t8, :]], axis=1
    )
    sph = jnp.concatenate([pack.sph_geom, pack.sph_shade[:, 3:5]], axis=1)
    emeta = jnp.stack(
        [
            pack.emt_mesh.astype(jnp.float32),
            pack.emt_intra_cum,
            pack.emt_mesh_area,
            # inclusive cumulative area as a fraction of the mesh area: the
            # kernel's intra-mesh pick compares sqrt(u) against this
            # directly (no per-row mesh-area fetch)
            pack.emt_intra_cum / jnp.maximum(pack.emt_mesh_area, 1e-20),
        ],
        axis=1,
    )
    # lmesh_cum is zero-padded past the real light-mesh count; the kernel's
    # "count cum < target" pick must never count pad rows, so they become +big.
    lcum = jnp.where(pack.lmesh_cum > 0.0, pack.lmesh_cum, T_MAX)[:, None]
    par = jnp.stack(
        [
            pack.background[0],
            pack.background[1],
            pack.background[2],
            pack.rr_rate,
            pack.inv_rr,
            pack.emit_total_area,
            jnp.float32(0.0),
            jnp.float32(0.0),
        ]
    )[None, :]
    if pack.n_cl_nodes > 0:
        cn, ct, cuv = pack.cl_nodes, pack.cl_tris, pack.cl_uv
        # the SMEM brute-force table is unused on the clustered path and
        # would blow the 1 MB SMEM budget — ship a dummy
        tri = jnp.zeros((8, 25), jnp.float32)
    else:
        cn = jnp.zeros((1, 128), jnp.float32)
        ct = jnp.zeros((8, 16), jnp.float32)
        cuv = jnp.zeros((8, 8), jnp.float32)
    if pack.use_env:
        env = env_mip_table(pack.env_pixels)
    else:
        env = jnp.zeros((1, 128), jnp.float32)
    return (
        tri, pack.tri_occ_sc, sph, pack.mat_fat, pack.emt_fat, emeta, lcum,
        par, env, cn, ct, cuv,
    )


def _cam_static(camera, tile=None):
    om = camera.orientation()
    return {
        "tile": tile,
        "width": camera.width,
        "height": camera.height,
        "xscale": float(
            np.tan(np.deg2rad(camera.fov * 0.5)) * camera.width / camera.height
        ),
        "yscale": float(np.tan(np.deg2rad(camera.fov * 0.5))),
        "om": tuple(tuple(float(om[i, j]) for j in range(3)) for i in range(3)),
        "pos": tuple(float(v) for v in camera.position),
        "use_dof": bool(camera.use_dof),
        "focal": float(camera.focal_distance),
        "aperture": float(camera.aperture_radius),
    }


@functools.partial(jax.jit, static_argnames=("camera", "spp"))
def _primary_env_mean(pack, camera, spp, seed):
    """(H*W, 3) mean full-resolution bilinear env radiance over each pixel's
    spp jittered (and DoF-sampled) primary-ray directions, reproducing
    _mega_kernel_regen's cam_ray murmur draws bit-exactly.

    The regen kernel defers primary-miss shading: it counts misses per lane
    (out plane 2) and leaves their radiance 0; render_mega adds
    miss_count/spp × this image. For fully-sky pixels that is EXACT (every
    sample missed, and this mean runs over exactly the sample set the kernel
    traced, full-res bilinear per Scene.hpp:60-99 semantics); for partial
    (geometry-edge) pixels it approximates the missed subset's env mean by
    the all-sample mean — a sub-pixel-scale bias far below sensor
    quantization for any smooth map."""
    from mcpt_tpu.envmap import sample_env

    cam = _cam_static(camera)
    w, h = camera.width, camera.height
    pix = jnp.arange(w * h, dtype=jnp.uint32)
    fi = (pix % _U(w)).astype(jnp.float32)
    fj = (pix // _U(w)).astype(jnp.float32)
    seed_u = jnp.asarray(seed, jnp.int32).astype(jnp.uint32)
    om = cam["om"]

    def body(s, acc):
        mix = s.astype(jnp.uint32) * _U(0x0ED5AD4D) + seed_u * _U(0x01000193)
        camdraw = lambda c: _unit(_murmur(pix * _U(0x9E3779B1) + mix + _U(c)))
        u0 = camdraw(0x51ED2701)
        u1 = camdraw(0x51ED2702)
        x = (1.0 - 2.0 * (fi + u0) / cam["width"]) * cam["xscale"]
        y = (1.0 - 2.0 * (fj + u1) / cam["height"]) * cam["yscale"]
        one = jnp.ones_like(x)
        if cam["use_dof"]:
            u2 = camdraw(0x51ED2703)
            u3 = camdraw(0x51ED2704)
            r = cam["aperture"] * jnp.sqrt(u2)
            theta = 2.0 * jnp.pi * u3
            dx = r * jnp.cos(theta)
            dy = r * jnp.sin(theta)
            fd = cam["focal"]
            dirs = (x * fd - dx, y * fd - dy, one * fd)
        else:
            dirs = (x, y, one)
        v = _normalize(dirs)
        d = tuple(
            om[i][0] * v[0] + om[i][1] * v[1] + om[i][2] * v[2]
            for i in range(3)
        )
        return acc + sample_env(pack, jnp.stack(d, axis=-1))

    tot = lax.fori_loop(
        0, spp, body, jnp.zeros((w * h, 3), jnp.float32)
    )
    return tot / jnp.float32(spp)


@functools.partial(
    jax.jit,
    static_argnames=(
        "camera", "n_lanes", "max_bounces", "interpret", "regen",
        "any_textured", "tile",
    ),
)
def trace_mega_block(
    pack,
    camera,
    seed,
    lane_offset,
    spp,
    n_lanes,
    max_bounces=8,
    interpret=False,
    regen=True,
    any_textured=True,
    lane_stride=1,
    tile=None,
):
    """One kernel dispatch over `n_lanes` lanes starting at `lane_offset`.

    Returns (mean radiance (n_lanes,), ray count (n_lanes,)). n_lanes must be
    a multiple of CHUNK (=1024). regen=True uses the path-regeneration
    kernel (fastest); regen=False the lockstep spp × depth kernel.
    """
    assert n_lanes % CHUNK == 0, n_lanes
    # the regen kernel packs the per-lane depth into 5 bits of the counter
    assert max_bounces <= 32, max_bounces
    n_streams = tile[3] if tile else 1
    # stream splitting divides each pixel's sample budget across S lanes;
    # only the regen kernel understands per-lane budgets. _pick_tile clamps
    # S to divide spp (spp itself is traced here, so no divisibility check).
    assert regen or n_streams == 1, "stream splitting requires regen=True"
    # spp may be a tracer (the block fn is jitted with spp dynamic); the
    # divisibility contract can only be checked for concrete callers.
    if isinstance(spp, int):
        assert spp % n_streams == 0, (spp, n_streams)
    spp_eff = spp // n_streams
    (tri, occ, sph, mat, emt, emeta, lcum, par, env, cn, ct,
     cuv) = mega_tables(pack)
    clustered = pack.n_cl_nodes > 0
    rows = n_lanes // LANE
    scal = jnp.concatenate(
        [
            jnp.asarray(seed, jnp.int32).reshape(1),
            jnp.asarray(lane_offset, jnp.int32).reshape(1),
            jnp.asarray(spp_eff, jnp.int32).reshape(1),
            jnp.asarray(lane_stride, jnp.int32).reshape(1),
            jnp.asarray(spp, jnp.int32).reshape(1),
            jnp.zeros(3, jnp.int32),
        ]
    )[None, :]
    kernel = functools.partial(
        _mega_kernel_regen if regen else _mega_kernel,
        n_chunks=rows // CH_ROWS,
        n_tris=tri.shape[0],
        n_occ=occ.shape[0],
        n_sph=sph.shape[0],
        n_sph_emitters=pack.n_sph_emitters,
        n_mats=mat.shape[0],
        n_emitters=pack.n_emitters,
        n_lmesh=lcum.shape[0],
        max_bounces=max_bounces,
        n_dir_sample=pack.n_dir_sample if pack.n_emitters else 0,
        enable_shadow=pack.enable_shadow,
        any_textured=any_textured,
        clustered=clustered,
        cl_groups=pack.cl_groups,
        use_env=pack.use_env,
        # Perf-debug only: MCPT_MEGA_ABLATE=mat,mfn,nee_eval,bounce_eval
        # stubs out kernel components to attribute runtime (results are
        # wrong images; never set in production).
        ablate=frozenset(
            s for s in os.environ.get("MCPT_MEGA_ABLATE", "").split(",") if s
        ),
        # SMEM scenes profit from deep unrolling once the fused sweep slims
        # the loop body (r5 sweep at 1080p spp512: u2 7.05e8, u4 ~7.1e8,
        # u8 7.71e8 rays/s). Clustered scenes: the r5 clean probes showed
        # the walks cost ~0% — the iteration is bound by per-vertex VPU
        # math + framework, which unrolling amortizes: the 960x540 spp256
        # chessboard sweep measured u4 ~5-7% over u2 in every window (u8
        # within noise of u4 but doubles program size), so clustered
        # defaults to u4.
        unroll=int(
            os.environ.get(
                "MCPT_MEGA_UNROLL", "4" if clustered else "8"
            )
        ),
        # In-lane sample interleave: each lane carries `nsplit` independent
        # path slots. SMEM scenes ride ONE fused table sweep (per-row
        # scalar loads amortize over 2x the rays); clustered scenes run one
        # paired tree walk per slot (the r5 clean probes measured the
        # walks at ~0% of kernel time) — in both cases the per-trip
        # framework and the vertex block's fixed costs amortize over
        # `nsplit` vertices. Slot k owns samples k + v*nsplit, draws key
        # on the actual sample id, so each sample's radiance is identical
        # to the unsplit kernel (only the per-lane f32 accumulation order
        # changes; MCPT_MEGA_SPLIT=1 restores the single-slot kernel for
        # bitwise cross-path tests).
        nsplit=max(
            1,
            int(
                os.environ.get(
                    "MCPT_MEGA_SPLIT", "1" if clustered else "4"
                )
            ),
        ),
        cam=_cam_static(camera, tile),
    )
    from mcpt_tpu.kernels.cluster import N_RES as _N_RES

    n_planes = 3 if pack.use_env else 2
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_planes, rows, LANE), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 11
        + [
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            # per-depth record slots: only the lockstep kernel uses them
            # (the regen kernel folds forward in closed form)
            pltpu.VMEM(
                (1 if regen else max_bounces, 3, CH_ROWS, LANE), jnp.float32
            ),
            # the clustered occlusion fan parks one blocked-plane per NEE
            # sample in res_ref; the merged single-walk regen path keeps
            # the fan rows (offset N_RES) live alongside the nearest-query
            # result rows, so clustered scenes need N_RES + n_dir_sample
            pltpu.VMEM(
                (
                    _N_RES + pack.n_dir_sample
                    if pack.n_cl_nodes
                    else max(_N_RES, pack.n_dir_sample),
                    CH_ROWS,
                    LANE,
                ),
                jnp.float32,
            ),
        ],
        interpret=interpret,
    )(scal, tri, occ, sph, mat, emt, emeta, lcum, par, env, cn, ct, cuv)
    flat = out.reshape(n_planes, n_lanes)
    return flat[0], flat[1], (flat[2] if pack.use_env else None)



# Chunk tile footprint for clustered scenes: a 1024-lane chunk covers ~2/3
# of one 8x64-pixel tile instead of a 341x1 scanline strip (the 2026-08 sweep
# measured 8x64 fastest: +30% over scanline on the chessboard; 16x32 and
# 16x64 within 3%). Override with MCPT_MEGA_TILE=0 (off) or "WxH".
TILE_W = 8
TILE_H = 64


def _pick_tile(pack, camera, spp=None, regen=True):
    """Tile geometry (tw, th, tpr, wpad, hpad, streams) for clustered
    scenes, else None. Small (SMEM brute-force) scenes gain nothing from
    ray coherence — every chunk tests every primitive — so they keep
    scanline order.

    `streams` (MCPT_MEGA_STREAMS, default 8 for clustered regen renders)
    splits each pixel's sample budget across S lanes so a chunk's pixel
    footprint shrinks S-fold (see _lane_to_pixel); S is clamped to a
    power of two dividing spp, 1 for the lockstep kernel."""
    mode = os.environ.get("MCPT_MEGA_TILE", "auto")
    if mode == "0":
        return None
    if "x" in mode:
        tw, th = (int(v) for v in mode.split("x"))
    elif pack.n_cl_nodes <= 0:
        return None
    else:
        tw, th = TILE_W, TILE_H
    streams = int(os.environ.get("MCPT_MEGA_STREAMS", "8"))
    if not regen:
        streams = 1
    while streams > 1 and (spp is None or spp % streams):
        streams //= 2
    tpr = -(-camera.width // tw)
    hpad = -(-(camera.height * streams) // th) * th
    return tw, th, tpr, tw * tpr, hpad, streams


def _scatter_virtual(plane_flat, tile, w, h):
    """Scatter a virtually-ordered (lanes_v,) lane plane back to (h, w, 3)
    image order (inverse of _lane_to_pixel's tile permutation), SUMMING a
    pixel's S sample-stream lanes; virtual pixels padded past the image
    edge are dropped."""
    tw, th, tpr, wpad, hpad, streams = tile
    arr = np.asarray(plane_flat)[: wpad * hpad * 3].reshape(-1, 3)
    vp = np.arange(wpad * hpad)
    tidx, wp = np.divmod(vp, tw * th)
    ty, tx = np.divmod(tidx, tpr)
    yi, xi = np.divmod(wp, tw)
    ii = tx * tw + xi
    jj = (ty * th + yi) // streams
    valid = (ii < w) & (jj < h)
    img = np.zeros((h, w, 3), np.float64)
    np.add.at(img, (jj[valid], ii[valid]), arr[valid])
    return img.astype(arr.dtype)


def render_mega_sharded(
    pack,
    camera,
    spp,
    seed=0,
    *,
    devices=None,
    max_bounces=8,
    interpret=None,
    regen=True,
):
    """Multi-chip megakernel render: lane blocks data-parallel over devices.

    The scene pack is replicated; the (pixel × channel) lane axis is split
    into contiguous per-device block ranges and each device runs the same
    megakernel on its range (lane_offset is a traced scalar, so every device
    shares ONE compiled kernel). Paths are independent — the only collective
    is the framebuffer gather shard_map performs on the way out, exactly the
    communication structure SURVEY.md §2 prescribes for this workload.

    Returns ((H, W, 3) radiance, stats). Works on any 1-D device list
    (TPU chips over ICI, or the 8-virtual-CPU test mesh with interpret=True).
    """
    import time

    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    if not mega_supported(pack):
        raise ValueError("scene not supported by megakernel (too many tris)")
    if pack.use_env and not regen:
        raise ValueError("env-map scenes require the regen megakernel")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    devices = list(devices if devices is not None else jax.devices())
    nd = len(devices)
    w, h = camera.width, camera.height
    tile = _pick_tile(pack, camera, spp=spp, regen=regen)
    if tile:
        lanes = tile[3] * tile[4] * 3  # wpad * hpad * 3 virtual lanes
        tile_static = tile[:3] + (tile[5],)
    else:
        lanes = w * h * 3
        tile_static = None
    per_dev = -(-lanes // (nd * CHUNK)) * CHUNK
    any_t = bool(np.asarray(pack.mat_textured).any())
    mesh = Mesh(np.array(devices), ("shard",))
    # Interleaved assignment: device d owns lanes d, d+nd, d+2nd, ... so
    # every device samples the whole image (balanced work); the counter RNG
    # keys on the absolute lane id, so results are assignment-invariant.
    offsets = jnp.arange(nd, dtype=jnp.int32)
    seed_arr = jnp.asarray(seed, jnp.int32)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            jax.tree_util.tree_map(lambda _: P(), pack),
            P("shard"),
            P(),
        ),
        out_specs=(
            (P("shard"), P("shard"), P("shard"))
            if pack.use_env
            else (P("shard"), P("shard"))
        ),
        # pallas_call's out_shape carries no varying-mesh-axes info
        check_vma=False,
    )
    def run(pack_l, off_l, seed_l):
        rads, rays, misses = [], [], []
        done = 0
        while done < per_dev:
            n = min(_block_lanes(pack), per_dev - done)
            r, ry, m = trace_mega_block(
                pack_l,
                camera,
                seed_l,
                off_l[0] + done * nd,
                spp,
                n,
                max_bounces,
                interpret,
                regen,
                any_t,
                lane_stride=nd,
                tile=tile_static,
            )
            rads.append(r)
            rays.append(ry)
            if m is not None:
                misses.append(m)
            done += n
        out = (jnp.concatenate(rads), jnp.concatenate(rays))
        if pack.use_env:
            out = out + (jnp.concatenate(misses),)
        return out

    t0 = time.monotonic()
    with mesh:
        res = run(pack, offsets, seed_arr)
    # De-interleave: device-major (nd, per_dev) -> lane-major flat.
    def _delace(x):
        return np.asarray(x).reshape(nd, per_dev).T.ravel()

    rad = _delace(res[0])
    rays = _delace(res[1])
    # Pad lanes trace real (wrapped-pixel) paths; count only image lanes.
    if tile:
        img = _scatter_virtual(rad, tile, w, h)
        total_rays = float(_scatter_virtual(rays, tile, w, h).sum())
    else:
        img = rad[:lanes].reshape(h, w, 3)
        total_rays = float(rays[:lanes].sum())
    # Per-device TOTAL traced work (including wrapped-pad lanes): the
    # work-imbalance diagnostic for the scaling benchmark.
    per_dev_rays = np.asarray(res[1]).reshape(nd, per_dev).sum(axis=1)
    if pack.use_env:
        miss = _delace(res[2])
        env_mean = np.asarray(
            _primary_env_mean(pack, camera, spp, seed_arr)
        ).reshape(h, w, 3)
        miss_img = (
            _scatter_virtual(miss, tile, w, h)
            if tile
            else miss[:lanes].reshape(h, w, 3)
        )
        img = img + (miss_img / spp) * env_mean
    elapsed = time.monotonic() - t0
    stats = {
        "elapsed_s": elapsed,
        "rays": int(total_rays),
        "rays_per_s": total_rays / max(elapsed, 1e-9),
        "devices": nd,
        "per_device_rays": per_dev_rays.tolist(),
        "pad_lanes": int(nd * per_dev - lanes),
    }
    return img, stats


def render_mega(
    pack, camera, spp, seed=0, *, max_bounces=8, interpret=None, regen=True
):
    """Full-image render through the megakernel.

    Returns ((H, W, 3) float32 linear radiance, stats dict). Requires
    `mega_supported(pack)`.
    """
    import time

    if not mega_supported(pack):
        raise ValueError("scene not supported by megakernel (too many tris)")
    if pack.use_env and not regen:
        raise ValueError("env-map scenes require the regen megakernel")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    w, h = camera.width, camera.height
    tile = _pick_tile(pack, camera, spp=spp, regen=regen)
    if tile:
        tw, th, tpr, wpad, hpad, streams = tile
        lanes = wpad * hpad * 3
        tile_static = (tw, th, tpr, streams)
    else:
        lanes = w * h * 3
        tile_static = None
    # Whole blocks of blk_lanes plus ONE chunk-rounded remainder block: pad
    # lanes trace real (wrapped) paths, so rounding the remainder up to a
    # full MEGA block burned up to 12.5% of the render at 1080p (6.22M lanes
    # -> 7 blocks). The remainder's second kernel shape is one extra
    # (persistently cached) compile.
    blk_lanes = _block_lanes(pack)
    if os.environ.get("MCPT_MEGA_FULLBLOCKS", "0") == "1":  # perf A/B only
        lanes_pad = (
            -(-lanes // blk_lanes) * blk_lanes
            if lanes > blk_lanes
            else -(-lanes // CHUNK) * CHUNK
        )
    else:
        lanes_pad = -(-lanes // CHUNK) * CHUNK
    any_t = bool(np.asarray(pack.mat_textured).any())
    t0 = time.monotonic()
    rad = np.zeros(lanes_pad, np.float32)
    miss = np.zeros(lanes_pad, np.float32)
    rays_arr = np.zeros(lanes_pad, np.float32)
    off = 0
    while off < lanes_pad:
        n = min(blk_lanes, lanes_pad - off)
        r, rays, m = trace_mega_block(
            pack, camera, seed, off, spp, n, max_bounces, interpret, regen,
            any_t, tile=tile_static,
        )
        rad[off : off + n] = np.asarray(r)
        rays_arr[off : off + n] = np.asarray(rays)
        if m is not None:
            miss[off : off + n] = np.asarray(m)
        off += n
    # Pad lanes trace real (wrapped-pixel) paths; count image lanes only.
    if tile:
        img = _scatter_virtual(rad, tile, w, h)
        total_rays = float(_scatter_virtual(rays_arr, tile, w, h).sum())
    else:
        img = rad[:lanes].reshape(h, w, 3)
        total_rays = float(rays_arr[:lanes].sum())
    if pack.use_env:
        # deferred primary-miss env shading at full texture resolution
        env_mean = np.asarray(
            _primary_env_mean(pack, camera, spp, jnp.asarray(seed, jnp.int32))
        ).reshape(h, w, 3)
        miss_img = (
            _scatter_virtual(miss, tile, w, h)
            if tile
            else miss[:lanes].reshape(h, w, 3)
        )
        img = img + (miss_img / spp) * env_mean
    elapsed = time.monotonic() - t0
    stats = {
        "elapsed_s": elapsed,
        "rays": int(total_rays),
        "rays_per_s": total_rays / max(elapsed, 1e-9),
        "camera_samples": w * h * spp,
        # Each lane traces spp // streams samples under sample-stream
        # splitting (the lane axis carries the S-fold expansion), so the
        # true traced-path count is lanes * spp_per_lane, not lanes * spp.
        "wavelength_paths": lanes
        * (spp // (tile_static[3] if tile_static else 1)),
    }
    return img, stats
