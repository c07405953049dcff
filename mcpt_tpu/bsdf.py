"""GGX microfacet BSDF: sample / pdf / eval / fresnel / refract, branchless.

Functional transcription of the *math* of the reference `src/Material.hpp`
(every formula cited below), evaluated as masked lane-parallel array code: all
four material types are computed for every lane and combined with
``jnp.where`` — no data-dependent branching, so XLA fuses the whole shading
stage into the wavefront loop.

Faithfulness notes (kept bit-for-bit deliberately; these define the
reference's look even where they deviate from Walter et al.):
- D_GGX uses ``alpha + tan²θ`` (not alpha²) inside the square
  (Material.hpp:26-34),
- eval's Smith G is evaluated around the *half-vector* h, not the macro
  normal (Material.hpp:348,365),
- the rough-refraction BTDF is Walter eq. 21 with the reference's sign/abs
  placement (Material.hpp:354-372),
- smooth materials have Dirac pdf/eval with a ``h·n > 1-EPSILON`` gate
  (Material.hpp:311-328, 375-404),
- dispersion is 2-term Cauchy ``ior = A + B/λ²`` with λ in micrometers
  (Material.hpp:178-183),
- the procedural chessboard reflectance (Material.hpp:134-151) including its
  C-truncation and signed-modulo corner cases.

Lane material parameters are gathered once per path vertex into a `MatLane`.

Layout: the core implementations (``*_c``) take 3-vectors as COMPONENT
TUPLES of (B,) arrays and uv as a (u, v) tuple — the TPU-fast form (see
utils/vec.py for why). The (B, 3)-row functions kept for API/tests are thin
wrappers over the cores.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from mcpt_tpu.constants import EPSILON
from mcpt_tpu.materials import MaterialType
from mcpt_tpu.utils.gather import gather_rows
from mcpt_tpu.utils.vec import (
    add3,
    cross3,
    dot3,
    neg3,
    rows3,
    safe_normalize3,
    scale3,
    sub3,
    v3,
    where3,
)


def _ssqrt(x, eps: float = 1e-12):
    """sqrt with a floor: d/dx sqrt(x) -> inf at 0 turns masked-out lanes
    into NaN gradients (0 * inf) in reverse mode; the floor keeps every
    cotangent finite while changing forward values by < 1e-6."""
    return jnp.sqrt(jnp.maximum(x, eps))


_SMOOTH_COND = int(MaterialType.SMOOTH_CONDUCTOR)
_ROUGH_COND = int(MaterialType.ROUGH_CONDUCTOR)
_SMOOTH_DIEL = int(MaterialType.SMOOTH_DIELECTRIC)
_ROUGH_DIEL = int(MaterialType.ROUGH_DIELECTRIC)


class MatLane(NamedTuple):
    """Material parameters gathered per lane (B,)-shaped unless noted."""

    mtype: jnp.ndarray
    ior_a: jnp.ndarray
    ior_b: jnp.ndarray
    rough: jnp.ndarray
    refl: jnp.ndarray  # (B, 3)
    emission: jnp.ndarray  # (B, 3)
    textured: jnp.ndarray  # bool
    dirac: jnp.ndarray  # bool
    emissive: jnp.ndarray  # bool

    @property
    def is_conductor(self):
        return (self.mtype == _SMOOTH_COND) | (self.mtype == _ROUGH_COND)

    @property
    def is_rough(self):
        return (self.mtype == _ROUGH_COND) | (self.mtype == _ROUGH_DIEL)


def gather_material(pack, mat_ids) -> MatLane:
    """One fused one-hot gather against mat_fat (layout in scene.py)."""
    rows = gather_rows(pack.mat_fat, mat_ids)
    return MatLane(
        mtype=rows[:, 0].astype(jnp.int32),
        ior_a=rows[:, 1],
        ior_b=rows[:, 2],
        rough=rows[:, 3],
        refl=rows[:, 4:7],
        emission=rows[:, 7:10],
        textured=rows[:, 10] > 0.5,
        dirac=rows[:, 11] > 0.5,
        emissive=rows[:, 12] > 0.5,
    )


def repeat_material(m: MatLane, s: int) -> MatLane:
    """Repeat every lane s times (NEE fan-out) — cheap (B,)-array repeats
    instead of re-gathering at B*s."""
    rep = lambda x: jnp.repeat(x, s, axis=0)
    return MatLane(*(rep(f) for f in m))


def ior_of(m: MatLane, lam):
    """2-term Cauchy dispersion (Material.hpp:178-183)."""
    return m.ior_a + m.ior_b / (lam * lam)


# ---------------------------------------------------------------------------
# Microfacet terms (component cores)
# ---------------------------------------------------------------------------


def d_ggx_c(h, n, alpha):
    """Reference D (Material.hpp:26-34): α² / (π (NoH²(α + tan²θ))²)."""
    noh = jnp.abs(dot3(n, h))
    good = noh > EPSILON
    noh_s = jnp.where(good, noh, 1.0)
    tan2 = (1.0 - noh_s * noh_s) / (noh_s * noh_s)
    denom = (noh_s * noh_s) * (alpha + tan2)
    denom = jnp.where(jnp.abs(denom) > 0.0, denom, 1.0)
    d = alpha * alpha / (jnp.pi * denom * denom)
    return jnp.where(good, d, 0.0)


def g1_smith_c(v, n, alpha):
    """Height-correlated-free Smith G1 (Material.hpp:38-69)."""
    nov = jnp.abs(dot3(n, v))
    good = nov > EPSILON
    nov_s = jnp.where(good, nov, 1.0)
    tan_t = _ssqrt(1.0 - nov_s * nov_s) / nov_s
    at = alpha * tan_t
    g = 2.0 / (1.0 + jnp.sqrt(1.0 + at * at))
    g = jnp.where(tan_t == 0.0, 1.0, g)
    return jnp.where(good, g, 0.0)


def g_smith_c(wi, wo, n, alpha):
    """Product of the two G1s (Material.hpp:70-77)."""
    return g1_smith_c(wi, n, alpha) * g1_smith_c(wo, n, alpha)


def chessboard_reflectance_uv(u, v):
    """Procedural chessboard (Material.hpp:134-151), C-semantics intact:
    int() truncates toward zero and (col+row)%2 keeps the dividend's sign."""
    col = jnp.trunc((u - 0.05) * 10.0).astype(jnp.int32)
    row = jnp.trunc(v * 12.0).astype(jnp.int32)
    in_board = (col >= 3) & (col <= 5) & (row <= 7)
    is_white = lax.rem(col + row, 2) == 1
    return jnp.where(in_board & is_white, 0.9, 0.1)


def _chan_pick(chan, r, g, b):
    """Per-lane channel select from three (B,) components — two selects,
    no one-hot, no gather."""
    return jnp.where(chan == 0, r, jnp.where(chan == 1, g, b))


def reflectance_c(m: MatLane, uv, chan):
    """Per-wavelength scalar reflectance (Material.hpp:134-151); uv=(u,v)."""
    base = _chan_pick(chan, m.refl[:, 0], m.refl[:, 1], m.refl[:, 2])
    return jnp.where(m.textured, chessboard_reflectance_uv(uv[0], uv[1]), base)


def fresnel_schlick(cos_theta, f0):
    """Schlick approximation (Material.hpp:80-86)."""
    inv = 1.0 - cos_theta
    c2 = inv * inv
    return f0 + (1.0 - f0) * c2 * c2 * inv


def fresnel_c(m: MatLane, incident, nrm, lam):
    """Unpolarized dielectric Fresnel with TIR; conductors return 1
    (Material.hpp:198-226). ``incident`` points INTO the surface (the ray
    direction), matching `Scene.cpp:110`'s call with ray.direction."""
    cosi = jnp.clip(dot3(incident, nrm), -1.0, 1.0)
    ior = ior_of(m, lam)
    outside = cosi <= 0.0
    etai = jnp.where(outside, 1.0, ior)
    etat = jnp.where(outside, ior, 1.0)
    sint = etai / etat * _ssqrt(1.0 - cosi * cosi)
    tir = sint >= 1.0
    sint_s = jnp.where(tir, 0.0, sint)
    cost = _ssqrt(1.0 - sint_s * sint_s)
    aci = jnp.abs(cosi)
    rs_den = jnp.maximum(etat * aci + etai * cost, 1e-6)  # grad-safe
    rp_den = jnp.maximum(etai * aci + etat * cost, 1e-6)
    rs = (etat * aci - etai * cost) / rs_den
    rp = (etai * aci - etat * cost) / rp_den
    kr = 0.5 * (rs * rs + rp * rp)
    kr = jnp.where(tir, 1.0, kr)
    return jnp.where(m.is_conductor, 1.0, kr)


def refract_c(m: MatLane, incident, nrm, lam):
    """Snell refraction; zero vector on TIR (Material.hpp:227-242).
    ``incident`` is the ray direction (into the surface)."""
    cosi = jnp.clip(dot3(incident, nrm), -1.0, 1.0)
    ior = ior_of(m, lam)
    entering = cosi < 0.0
    etai = jnp.where(entering, 1.0, ior)
    etat = jnp.where(entering, ior, 1.0)
    n = where3(entering, nrm, neg3(nrm))
    ci = jnp.abs(cosi)
    eta = etai / etat
    k = 1.0 - eta * eta * (1.0 - ci * ci)
    ok = k >= 0.0
    k_s = jnp.where(ok, k, 1.0)  # double-where: keep sqrt grad finite
    coef = eta * ci - _ssqrt(k_s)
    out = add3(scale3(incident, eta), scale3(n, coef))
    zero = jnp.zeros_like(out[0])
    return where3(ok, out, (zero, zero, zero))


# ---------------------------------------------------------------------------
# Sampling (component cores)
# ---------------------------------------------------------------------------


def tangent_frame_c(n):
    """Hughes-Möller-style frame exactly as Material.hpp:95-106."""
    nx, ny, nz = n
    ax = jnp.abs(nx) > jnp.abs(ny)
    lx = jnp.sqrt(jnp.maximum(nx * nx + nz * nz, 1e-30))
    ly = jnp.sqrt(jnp.maximum(ny * ny + nz * nz, 1e-30))
    zero = jnp.zeros_like(nx)
    tx = where3(ax, (-nz / lx, zero, nx / lx), (zero, nz / ly, -ny / ly))
    bt = cross3(n, tx)
    return tx, bt


def sample_ggx_h_c(n, alpha, xi1, xi2):
    """GGX NDF importance sample of the half vector (Material.hpp:111-123)."""
    phi = 2.0 * jnp.pi * xi1
    a2 = alpha * alpha
    cos_t = _ssqrt(
        jnp.maximum(1.0 - xi2, 0.0) / jnp.maximum(1.0 + (a2 - 1.0) * xi2, 1e-20)
    )
    sin_t = _ssqrt(1.0 - cos_t * cos_t)
    hx = sin_t * jnp.cos(phi)
    hy = sin_t * jnp.sin(phi)
    t, b = tangent_frame_c(n)
    h = add3(add3(scale3(t, hx), scale3(b, hy)), scale3(n, cos_t))
    return safe_normalize3(h)


def sample_mfn_c(m: MatLane, n, xi1, xi2):
    """Material::sample (Material.hpp:268-281): GGX h for rough, n for smooth."""
    h = sample_ggx_h_c(n, m.rough, xi1, xi2)
    return where3(m.is_rough, h, n)


# ---------------------------------------------------------------------------
# pdf / eval (component cores)
# ---------------------------------------------------------------------------


def _half_reflect_c(wi, wo, n):
    h = safe_normalize3(add3(wi, wo))
    return where3(dot3(wi, n) > 0.0, h, neg3(h))


def _half_refract_c(wi, wo, n, eta):
    hv = sub3(neg3(wi), scale3(wo, eta))
    h = safe_normalize3(hv)
    return hv, h


def pdf_c(m: MatLane, wi, wo, n, lam, is_reflect):
    """Material::pdf (Material.hpp:285-328) with half-vector Jacobians."""
    ior = ior_of(m, lam)
    eta = jnp.where(dot3(wi, n) > 0.0, ior, 1.0 / ior)

    # rough. Denominator floors are grad-safe (1/u² in the VJP must not
    # overflow f32); lanes they touch have pdf→inf, i.e. weight→0, and are
    # firefly-clamped anyway, so forward output is unchanged.
    h_r = _half_reflect_c(wi, wo, n)
    jac_r = 1.0 / jnp.maximum(4.0 * jnp.abs(dot3(h_r, wo)), 1e-8)
    hv, h_t = _half_refract_c(wi, wo, n, eta)
    d1 = jnp.maximum(dot3(hv, hv), 1e-12)
    jac_t = eta * eta * jnp.abs(dot3(h_t, wo)) / d1
    h = where3(is_reflect, h_r, h_t)
    jac = jnp.where(is_reflect, jac_r, jac_t)
    d = d_ggx_c(h, n, m.rough)
    p_rough = d * dot3(n, h) * jac

    # smooth (Dirac): 1 iff the half vector aligns with n.
    h_sm_t = where3(dot3(h_t, n) > 0.0, h_t, neg3(h_t))
    h_sm = where3(is_reflect, safe_normalize3(add3(wi, wo)), h_sm_t)
    p_smooth = jnp.where(jnp.abs(dot3(h_sm, n)) > 1.0 - EPSILON, 1.0, 0.0)

    return jnp.where(m.is_rough, p_rough, p_smooth)


def eval_bsdf_c(m: MatLane, wi, wo, n, lam, uv, chan, is_reflect):
    """Material::eval (Material.hpp:330-408).

    wi = incoming_light (toward the light / next vertex),
    wo = outgoing_view, n = macro normal; all unit, component tuples.
    """
    win = dot3(wi, n)
    won = dot3(wo, n)
    same_side = win * won > 0.0
    ior = ior_of(m, lam)
    eta = jnp.where(win > 0.0, ior, 1.0 / ior)
    alpha = m.rough
    nwi = neg3(wi)

    # ---- rough reflect (Material.hpp:337-353)
    h_r = _half_reflect_c(wi, wo, n)
    f_cond = fresnel_schlick(jnp.abs(dot3(h_r, wo)), reflectance_c(m, uv, chan))
    f_diel_r = fresnel_c(m, nwi, h_r, lam)
    f_r = jnp.where(m.is_conductor, f_cond, f_diel_r)
    d_r = d_ggx_c(h_r, n, alpha)
    g_r = g_smith_c(wi, wo, h_r, alpha)
    denom_r = 4.0 * jnp.abs(win) * jnp.abs(won) + EPSILON
    rough_reflect = jnp.where(same_side, f_r * d_r * g_r / denom_r, 0.0)

    # ---- rough refract (Material.hpp:354-372), Walter eq. 21
    hv, h_t0 = _half_refract_c(wi, wo, n, eta)
    h_t = where3(dot3(h_t0, n) > 0.0, h_t0, neg3(h_t0))
    f_t = fresnel_c(m, nwi, h_t, lam)
    d_t = d_ggx_c(h_t, n, alpha)
    g_t = g_smith_c(wi, wo, h_t, alpha)
    hol = dot3(h_t, wi)
    hov = dot3(h_t, wo)
    den = hol + eta * hov
    den = den * den * jnp.abs(win * won)
    den = jnp.maximum(den, 1e-10)  # grad-safe; affected lanes clamp to <=5
    rough_refract = (1.0 - f_t) * d_t * g_t * eta * eta * jnp.abs(hol * hov) / den
    rough_refract = jnp.where(
        m.is_conductor | same_side | (win * won == 0.0), 0.0, rough_refract
    )

    # ---- smooth reflect (Material.hpp:379-390)
    h_sr = _half_reflect_c(wi, wo, n)
    aligned_r = dot3(h_sr, n) >= 1.0 - EPSILON
    f_sm_cond = fresnel_schlick(jnp.abs(won), reflectance_c(m, uv, chan))
    f_sm_diel = fresnel_c(m, nwi, n, lam)
    smooth_reflect = jnp.where(
        same_side & aligned_r,
        jnp.where(m.is_conductor, f_sm_cond, f_sm_diel),
        0.0,
    )

    # ---- smooth refract (Material.hpp:391-403)
    aligned_t = dot3(h_t, n) >= 1.0 - EPSILON
    smooth_refract = jnp.where(
        (~m.is_conductor) & (~same_side) & (win * won != 0.0) & aligned_t,
        1.0 - fresnel_c(m, nwi, n, lam),
        0.0,
    )

    rough = jnp.where(is_reflect, rough_reflect, rough_refract)
    smooth = jnp.where(is_reflect, smooth_reflect, smooth_refract)
    return jnp.where(m.is_rough, rough, smooth)


# ---------------------------------------------------------------------------
# (B, 3)-row wrappers — public API and tests; cores above are the hot path.
# ---------------------------------------------------------------------------


def d_ggx(h, n, alpha):
    return d_ggx_c(v3(h), v3(n), alpha)


def g1_smith(v, n, alpha):
    return g1_smith_c(v3(v), v3(n), alpha)


def g_smith(wi, wo, n, alpha):
    return g_smith_c(v3(wi), v3(wo), v3(n), alpha)


def chessboard_reflectance(uv):
    return chessboard_reflectance_uv(uv[:, 0], uv[:, 1])


def reflectance_of(m: MatLane, uv, chan):
    return reflectance_c(m, (uv[:, 0], uv[:, 1]), chan)


def fresnel(m: MatLane, incident, nrm, lam):
    return fresnel_c(m, v3(incident), v3(nrm), lam)


def refract(m: MatLane, incident, nrm, lam):
    return rows3(refract_c(m, v3(incident), v3(nrm), lam))


def tangent_frame(n):
    t, b = tangent_frame_c(v3(n))
    return rows3(t), rows3(b)


def sample_ggx_h(n, alpha, xi1, xi2):
    return rows3(sample_ggx_h_c(v3(n), alpha, xi1, xi2))


def sample_microfacet_normal(m: MatLane, n, xi1, xi2):
    return rows3(sample_mfn_c(m, v3(n), xi1, xi2))


def pdf(m: MatLane, wi, wo, n, lam, is_reflect):
    return pdf_c(m, v3(wi), v3(wo), v3(n), lam, is_reflect)


def eval_bsdf(m: MatLane, wi, wo, n, lam, uv, chan, is_reflect):
    return eval_bsdf_c(
        m, v3(wi), v3(wo), v3(n), lam, (uv[:, 0], uv[:, 1]), chan, is_reflect
    )
