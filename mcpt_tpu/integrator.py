"""Wavefront path-tracing integrator.

Semantics = the reference's recursive `Scene::castRay` (`src/Scene.cpp:85-184`)
and `Scene::directLighting` (`src/Scene.cpp:56-82`), re-expressed for a vector
machine:

- The unbounded recursion (terminated only by Russian roulette,
  Scene.cpp:121-129) becomes a **fixed-trip `lax.scan` over bounces** on a ray
  pool; every lane carries (origin, direction, nearest-hit, alive).
- The reference applies its firefly clamps **per recursion level** to the
  *already-recursed* indirect value (`l_ind ∈ [0,5]`, `l_dir ∈ [0,15]`,
  Scene.cpp:180-183), which is non-linear and cannot be folded into a forward
  throughput product. We therefore record per-bounce (l_dir, weight, leaf,
  terminal) and run a **reverse scan** that reproduces the nested-clamp
  recursion *exactly* (up to the bounce cap):

      L_d = terminal_d ? leaf_d : clamp15(l_dir_d) + clamp5(w_d · L_{d+1})

  with the reference's terminal cases encoded in `leaf`:
    * primary miss  → env/background radiance (Scene.cpp:88-95),
    * depth-0 emitter hit → clamp(0,1, emission_λ * |wo·n|) (Scene.cpp:102-107),
    * RR kill → *unclamped* l_dir (Scene.cpp:129,156 — the early return skips
      the final clamps),
    * bounce ray missed or hit an emitter → clamp15(l_dir) +
      clamp5(env(wi)·eval·invRr) (Scene.cpp:145-149,172-176 — indirect rays
      that reach the light return the env color; emitters contribute only via
      NEE and the depth-0 eye hit),
    * bounce cap reached while alive → clamp15(l_dir) (truncation; the
      reference has no cap, the bias is rrRate^max_bounces).

- One intersect per bounce: the reference re-traces the same ray inside the
  recursive call (Scene.cpp:134+137); we carry the child intersection in the
  scan state instead.
- RNG is counter-based `jax.random` keyed on (pixel-lane, bounce, use-site):
  fully deterministic, reproducible, and parallel — replacing the reference's
  thread-indexed (and accidentally default-seeded, global.hpp:14 static-in-
  header) mt19937s.
- All 3-vectors flow as COMPONENT TUPLES of (B,) arrays (utils/vec.py): the
  (B,3)-row form cost >50% of device time in XLA reshape/copy relayouts at
  Pallas boundaries and NEE repeats.
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from mcpt_tpu.bsdf import (
    _chan_pick,
    eval_bsdf_c,
    fresnel_c,
    gather_material,
    pdf_c,
    refract_c,
    sample_mfn_c,
)
from mcpt_tpu.constants import CLAMP_DIRECT, CLAMP_INDIRECT, EPSILON, REL_EPS, T_MAX
from mcpt_tpu.envmap import sample_env_chan_c
from mcpt_tpu.intersect import Hit, intersect_c, occlude_t_c, surface_at_c
from mcpt_tpu.lights import sample_light_c
from mcpt_tpu.utils.gather import gather_rows
from mcpt_tpu.utils.vec import (
    add3,
    dot3,
    neg3,
    reflect3,
    scale3,
    sub3,
    where3,
)


def _detach_hit(hit: Hit) -> Hit:
    """Detached-sampling estimator: hit distances/barycentrics are treated as
    fixed by the sampled path. Gradients flow through every per-vertex
    shading term (eval/pdf/Fresnel/emission, incl. the reparameterized GGX
    draw); the second-order hit-point-motion terms are dropped — validated
    against finite differences to agree to ~1e-5 relative (test_diff.py).
    Keeping them is also numerically untenable: the masked-out lanes of the
    intersection tests have unbounded reverse-mode partials."""
    return Hit(
        t=jax.lax.stop_gradient(hit.t),
        prim=hit.prim,
        u=jax.lax.stop_gradient(hit.u),
        v=jax.lax.stop_gradient(hit.v),
    )


def direct_lighting_c(pack, key, wo, p, n, uv, m, lam, chan, is_reflect, method):
    """NEE estimator, Scene.cpp:56-82. Returns the *un-weighted* sum (the
    caller applies the kr / (1-kr) fresnel weight of Scene.cpp:114-119).

    Each lane draws `n_dir_sample` light samples; the (S, B) problem keeps
    sample-plane-major layout so per-lane data broadcasts instead of
    repeating, and the shadow rays flatten to one (S*B,) kernel batch.
    `m` is the caller's MatLane at B — never re-gathered at B*S.
    """
    if pack.n_emitters == 0:
        return jnp.zeros(p[0].shape[0], jnp.float32)
    b = p[0].shape[0]
    s = pack.n_dir_sample

    # (S, B) plane-major layout: sample s of every lane is one contiguous
    # plane, so every per-lane quantity (surface point, normal, material,
    # uv, λ, channel) BROADCASTS (B,) -> (S,B) inside fused elementwise ops —
    # no jnp.repeat materializations at B*S (the repeats were ~23 relayout
    # copies per bounce in device traces). The only (S*B,) buffers actually
    # built are the six shadow-ray planes the Pallas kernel needs anyway.
    u = jax.random.uniform(key, (s * b, 4), dtype=jnp.float32)
    chan_sb = jnp.broadcast_to(chan, (s, b))
    ls = sample_light_c(pack, u, chan_sb.reshape(-1))
    lp = tuple(x.reshape(s, b) for x in ls.p)
    ln = tuple(x.reshape(s, b) for x in ls.n)
    emit = ls.emit.reshape(s, b)
    lpdf = ls.pdf.reshape(s, b)

    delta = sub3(lp, p)  # (S,B) via broadcast
    dist = jnp.sqrt(jnp.maximum(dot3(delta, delta), 1e-20))
    inv_dist = 1.0 / dist
    ws = scale3(delta, inv_dist)

    if pack.enable_shadow:
        flat = lambda c: tuple(x.reshape(s * b) for x in c)
        p_sb = tuple(jnp.broadcast_to(x, (s, b)) for x in p)
        sh_t = occlude_t_c(pack, flat(p_sb), flat(ws), method=method)
        sh_t = sh_t.reshape(s, b)
        # Occluder test. The reference uses |t_nearest − dist| < EPSILON
        # (Scene.cpp:73-75) with DOUBLE t (Intersection.hpp:16); in f32 an
        # absolute 1e-4 is below one ULP once dist exceeds ~1700 (the
        # chessboard light sits 1500-2500 units away), so the shadow ray's
        # own hit ON the light loses the comparison for ~5% of genuinely
        # visible samples (measured). The robust, scale-free form: no hit
        # strictly closer than the light sample by a RELATIVE margin. It
        # differs from the reference only for blockers within eps·dist of
        # the light surface — geometry effectively ON the light.
        # MCPT_VIS_PARITY=1 (parity experiments only): the reference's
        # two-sided band verbatim, INCLUDING its f32 failure mode — the
        # nearest hit is the light itself, but a few ULPs of rounding can
        # push |t − dist| past the absolute 1e-4 and drop a genuinely
        # visible sample. Used to attribute the golden-vs-ours brightness
        # gap (see PARITY.md).
        import os as _os

        if _os.environ.get("MCPT_VIS_PARITY", "0") == "1":
            visible = jnp.abs(sh_t - dist) < EPSILON
        else:
            visible = sh_t >= dist - jnp.maximum(EPSILON, REL_EPS * dist)
    else:
        visible = jnp.ones((s, b), bool)

    ev = eval_bsdf_c(m, ws, wo, n, lam, uv, chan, is_reflect)
    # Scene.cpp:76-78: emit · eval · (ws·n) · (−ws·n_light) / dist² / pdf / S.
    contrib = (
        emit
        * ev
        * dot3(ws, n)
        * -dot3(ws, ln)
        * (inv_dist * inv_dist)
        / lpdf
        / jnp.float32(s)
    )
    contrib = jnp.where(visible, contrib, 0.0)
    return jnp.sum(contrib, axis=0)


class PathStats(NamedTuple):
    rays: jnp.ndarray  # () total rays traced (primary + shadow + bounce)


@partial(jax.jit, static_argnames=("max_bounces", "method", "early_exit"))
def trace_paths_c(
    pack,
    o,
    d,
    lam,
    chan,
    key,
    max_bounces: int = 8,
    method: str = "auto",
    early_exit: bool = True,
):
    """Radiance for a batch of primary rays (component form).

    o, d: 3-tuples of (B,); lam: (B,) wavelength in µm; chan: (B,) int32 RGB
    channel. Returns (radiance (B,), PathStats).

    early_exit=True runs the bounce loop as a `lax.while_loop` that stops as
    soon as every lane has terminated (RR kills ~(1-rrRate) of lanes per
    bounce, and whole-miss tiles exit after one step) — identical results,
    large speedup. Use early_exit=False (pure scan) when the computation must
    be differentiable (lax.while_loop has no reverse-mode rule).
    """
    b = o[0].shape[0]
    hit0 = _detach_hit(intersect_c(pack, o, d, method=method))
    alive0 = jnp.ones(b, bool)
    shadow_rays_per_vertex = pack.n_dir_sample if pack.n_emitters else 0

    def body(carry, depth):
        o, d, hit, alive = carry
        kd = jax.random.fold_in(key, depth)
        surf = surface_at_c(pack, o, d, hit)
        happened = surf.happened
        wo = neg3(d)

        # Terminal A: miss → env/background (Scene.cpp:88-95).
        env_leaf = sample_env_chan_c(pack, d, chan)
        # Terminal B: depth-0 emitter hit (Scene.cpp:102-107).
        m = gather_material(pack, surf.mat)
        emit_lane = _chan_pick(chan, m.emission[:, 0], m.emission[:, 1], m.emission[:, 2])
        b_leaf = jnp.clip(emit_lane * jnp.abs(dot3(wo, surf.n)), 0.0, 1.0)
        is_b = (depth == 0) & happened & surf.emissive

        at_vertex = alive & happened & ~is_b

        # Microfacet normal + Fresnel split (Scene.cpp:109-110).
        xi = jax.random.uniform(jax.random.fold_in(kd, 0), (b, 4), dtype=jnp.float32)
        mfn = sample_mfn_c(m, surf.n, xi[:, 0], xi[:, 1])
        kr = fresnel_c(m, d, mfn, lam)

        # NEE from the ε-offset point (Scene.cpp:113-119).
        # Self-intersection offset, SCALE-RELATIVE: the reference offsets
        # by an absolute EPSILON in double (Scene.cpp:113-128) where 1e-4 is
        # always many ULPs; in f32 at chessboard-scale coordinates (~2e3)
        # 1e-4 is BELOW one ULP and the offset vanishes, letting shadow and
        # bounce rays re-hit their own surface on a rounding coin-flip.
        off_scale = jnp.maximum(
            EPSILON,
            REL_EPS
            * jnp.maximum(
                jnp.abs(surf.p[0]),
                jnp.maximum(jnp.abs(surf.p[1]), jnp.abs(surf.p[2])),
            ),
        )
        p_dl = add3(surf.p, scale3(surf.n, off_scale))
        inner = dot3(wo, surf.n) < 0.0
        l_dir_raw = direct_lighting_c(
            pack,
            jax.random.fold_in(kd, 1),
            wo,
            p_dl,
            surf.n,
            surf.uv,
            m,
            lam,
            chan,
            ~inner,
            method,
        )
        l_dir = jnp.where(inner, 1.0 - kr, kr) * l_dir_raw

        # Russian roulette + stochastic reflect/refract (Scene.cpp:121-159).
        rr_kill = xi[:, 2] >= pack.rr_rate
        branch_reflect = xi[:, 3] < kr
        womfn = dot3(wo, mfn)
        sign_reflect = jnp.where(womfn < 0.0, -1.0, 1.0)
        sign = jnp.where(branch_reflect, sign_reflect, -sign_reflect)
        p_new = add3(surf.p, scale3(surf.n, off_scale * sign))

        wi = where3(
            branch_reflect,
            reflect3(wo, mfn),
            refract_c(m, d, mfn, lam),
        )
        nxt = _detach_hit(intersect_c(pack, p_new, wi, method=method))
        nxt_emissive = (nxt.prim >= 0) & (
            gather_rows(pack.prim_emissive, jnp.maximum(nxt.prim, 0))[:, 0] > 0.5
        )

        ev = eval_bsdf_c(m, wi, wo, surf.n, lam, surf.uv, chan, branch_reflect)
        pv = pdf_c(m, wi, wo, surf.n, lam, branch_reflect)
        # Indirect weight (Scene.cpp:135-144,162-171). Note the reference's
        # |wo·n| cosine (not |wi·n|) — kept verbatim. Zero the weight when the
        # pdf underflows (measure-zero events that would inf/NaN in C++ too).
        pv_ok = jnp.abs(pv) > 1e-10  # grad-safe reciprocal threshold
        w_rough = jnp.where(
            pv_ok,
            ev * jnp.abs(dot3(wo, surf.n)) / jnp.where(pv_ok, pv, 1.0) * pack.inv_rr,
            0.0,
        )
        w = jnp.where(m.dirac, ev * pack.inv_rr, w_rough)

        cont = at_vertex & ~rr_kill & (nxt.prim >= 0) & ~nxt_emissive
        env_ind = sample_env_chan_c(pack, wi, chan) * ev * pack.inv_rr

        leaf = jnp.where(
            ~alive,
            0.0,
            jnp.where(
                ~happened,
                env_leaf,
                jnp.where(
                    is_b,
                    b_leaf,
                    jnp.where(
                        rr_kill,
                        l_dir,  # raw early return (Scene.cpp:129,156)
                        jnp.clip(l_dir, 0.0, CLAMP_DIRECT)
                        + jnp.clip(env_ind, 0.0, CLAMP_INDIRECT),
                    ),
                ),
            ),
        )
        terminal = ~cont
        n_rays = jnp.sum(jnp.where(at_vertex, 1 + shadow_rays_per_vertex, 0))
        carry = (p_new, wi, nxt, cont)
        return carry, (l_dir, w, leaf, terminal, n_rays)

    carry0 = (o, d, hit0, alive0)
    if early_exit:
        # while_loop over bounces: stop when the whole pool is dead. Records
        # live in preallocated (D, B) buffers updated in place.
        rec0 = (
            jnp.zeros((max_bounces, b), jnp.float32),  # l_dir
            jnp.zeros((max_bounces, b), jnp.float32),  # w
            jnp.zeros((max_bounces, b), jnp.float32),  # leaf
            jnp.ones((max_bounces, b), bool),  # terminal
            jnp.zeros((max_bounces,), jnp.int32),  # ray counts
        )

        def w_cond(state):
            depth, carry, _ = state
            return (depth < max_bounces) & jnp.any(carry[3])

        def w_body(state):
            depth, carry, recs = state
            carry, (l_dir, w, leaf, terminal, n_rays) = body(carry, depth)
            recs = (
                recs[0].at[depth].set(l_dir),
                recs[1].at[depth].set(w),
                recs[2].at[depth].set(leaf),
                recs[3].at[depth].set(terminal),
                recs[4].at[depth].set(n_rays),
            )
            return depth + 1, carry, recs

        _, _, (l_dirs, ws, leaves, terminals, ray_counts) = lax.while_loop(
            w_cond, w_body, (jnp.int32(0), carry0, rec0)
        )
    else:
        _, (l_dirs, ws, leaves, terminals, ray_counts) = lax.scan(
            body, carry0, jnp.arange(max_bounces)
        )

    # Reverse fold reproducing the nested per-level clamps (Scene.cpp:180-183).
    def fold(l_next, rec):
        l_dir, w, leaf, terminal = rec
        l_here = jnp.where(
            terminal,
            leaf,
            jnp.clip(l_dir, 0.0, CLAMP_DIRECT)
            + jnp.clip(w * l_next, 0.0, CLAMP_INDIRECT),
        )
        return l_here, None

    radiance, _ = lax.scan(
        fold,
        jnp.zeros(b, jnp.float32),
        (l_dirs, ws, leaves, terminals),
        reverse=True,
    )
    stats = PathStats(rays=jnp.sum(ray_counts) + b)
    return radiance, stats


@partial(jax.jit, static_argnames=("max_bounces", "method", "early_exit"))
def trace_paths(
    pack,
    o,
    d,
    lam,
    chan,
    key,
    max_bounces: int = 8,
    method: str = "auto",
    early_exit: bool = True,
):
    """(B, 3)-row wrapper over `trace_paths_c` (tests/back-compat)."""
    return trace_paths_c(
        pack,
        (o[:, 0], o[:, 1], o[:, 2]),
        (d[:, 0], d[:, 1], d[:, 2]),
        lam,
        chan,
        key,
        max_bounces=max_bounces,
        method=method,
        early_exit=early_exit,
    )
