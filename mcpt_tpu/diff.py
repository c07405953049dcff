"""Differentiable rendering and inverse-rendering optimization.

The reference renderer is forward-only; this module is a capability the TPU
build adds on top (SURVEY.md §7 item 9): gradients of rendered radiance with
respect to the *continuous* scene parameters

    roughness, Cauchy iorA/iorB, base_reflectance (per material),
    and a global light-brightness scale,

via the detached-sampling estimator: all discrete/stochastic decisions
(microfacet-normal draws, reflect/refract branch, Russian roulette, light
picks) are treated as fixed by the RNG, and gradients flow pathwise through
eval/pdf/Fresnel/emission terms. Visibility discontinuities are not
differentiated (standard for this estimator class).

The integrator must run in scan mode (`early_exit=False`) — `lax.while_loop`
has no reverse-mode rule.

`make_train_step` builds an optax SGD/Adam step whose gradients are averaged
over a lane batch; under `shard_map` on a `Mesh` the average becomes a
`jax.lax.pmean` over the lane axis — the TPU analogue of gradient all-reduce.
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from mcpt_tpu.camera import generate_rays
from mcpt_tpu.constants import WAVELEN_UM
from mcpt_tpu.integrator import trace_paths
from mcpt_tpu.parallel.mesh import LANE_AXIS


class SceneParams(NamedTuple):
    """Differentiable parameter pytree (rows match the pack material table)."""

    rough: jnp.ndarray  # (M,)
    ior_a: jnp.ndarray  # (M,)
    ior_b: jnp.ndarray  # (M,)
    refl: jnp.ndarray  # (M, 3)
    light_scale: jnp.ndarray  # ()


def params_from_pack(pack) -> SceneParams:
    return SceneParams(
        rough=pack.mat_rough,
        ior_a=pack.mat_ior_a,
        ior_b=pack.mat_ior_b,
        refl=pack.mat_refl,
        light_scale=jnp.float32(1.0),
    )


def apply_params(pack, p: SceneParams):
    """Rebuild the pack's material-dependent tables from params (all jnp ops,
    so the whole render stays differentiable w.r.t. p)."""
    emission = pack.mat_emission * p.light_scale
    mat_fat = jnp.concatenate(
        [
            pack.mat_fat[:, 0:1],
            p.ior_a[:, None],
            p.ior_b[:, None],
            p.rough[:, None],
            p.refl,
            emission,
            pack.mat_fat[:, 10:13],
        ],
        axis=1,
    )
    emt_fat = jnp.concatenate(
        [pack.emt_fat[:, 0:12], pack.emt_fat[:, 12:15] * p.light_scale,
         pack.emt_fat[:, 15:17]],
        axis=1,
    )
    return pack.replace(
        mat_rough=p.rough,
        mat_ior_a=p.ior_a,
        mat_ior_b=p.ior_b,
        mat_refl=p.refl,
        mat_emission=emission,
        mat_fat=mat_fat,
        emt_fat=emt_fat,
    )


def render_lanes(pack, camera, pixel_ids, key, *, spp: int = 1,
                 max_bounces: int = 4, method: str = "dense"):
    """Differentiable mean radiance (P, 3) for a pixel batch."""
    p = pixel_ids.shape[0]
    chan = jnp.tile(jnp.arange(3, dtype=jnp.int32), p)
    lam = jnp.asarray(WAVELEN_UM)[chan]

    def one(acc, k):
        k1, k2 = jax.random.split(k)
        o, d = generate_rays(camera, pixel_ids, k1)
        o3 = jnp.repeat(o, 3, axis=0)
        d3 = jnp.repeat(d, 3, axis=0)
        rad, _ = trace_paths(
            pack, o3, d3, lam, chan, k2,
            max_bounces=max_bounces, method=method, early_exit=False,
        )
        return acc + rad.reshape(p, 3), None

    keys = jax.random.split(key, spp)
    fb, _ = jax.lax.scan(one, jnp.zeros((p, 3), jnp.float32), keys)
    return fb / jnp.float32(spp)


def make_train_step(pack, camera, target, optimizer=None, *, spp=1,
                    max_bounces=3, method="dense", mesh=None, param_mask=None):
    """Inverse rendering: fit SceneParams so the render matches `target`.

    target: (H*W, 3) linear radiance. Returns (init_fn, step_fn) where
    step_fn(params, opt_state, pixel_ids, key) -> (params, opt_state, loss).
    When `mesh` is given, the step is shard_map'ed: pixel_ids sharded over
    the lane axis, params/opt_state replicated, gradients pmean'd over ICI.
    `param_mask`: optional SceneParams of 0/1 floats selecting which
    parameters may move (inverse problems are often ill-posed otherwise —
    e.g. reflectance can mimic light brightness).
    """
    optimizer = optimizer or optax.adam(1e-2)
    target = jnp.asarray(target, jnp.float32)

    def loss_fn(params, pixel_ids, key):
        fb = render_lanes(
            apply_params(pack, params), camera, pixel_ids, key,
            spp=spp, max_bounces=max_bounces, method=method,
        )
        return jnp.mean((fb - target[pixel_ids]) ** 2)

    def local_step(params, opt_state, pixel_ids, key):
        loss, grads = jax.value_and_grad(loss_fn)(params, pixel_ids, key)
        if param_mask is not None:
            grads = jax.tree_util.tree_map(
                lambda g, m: g * m, grads, param_mask
            )
        if mesh is not None:
            grads = jax.tree_util.tree_map(
                lambda g: jax.lax.pmean(g, LANE_AXIS), grads
            )
            loss = jax.lax.pmean(loss, LANE_AXIS)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    if mesh is None:
        step = jax.jit(local_step)
    else:
        from jax import shard_map

        step = jax.jit(
            shard_map(
                local_step,
                mesh=mesh,
                in_specs=(P(), P(), P(LANE_AXIS), P()),
                out_specs=(P(), P(), P()),
                check_vma=False,
            )
        )

    def init_fn():
        params = params_from_pack(pack)
        return params, optimizer.init(params)

    return init_fn, step


def make_train_step_hybrid(pack, camera, target_img, optimizer=None, *,
                           spp_res=64, spp_grad=1, max_bounces=4,
                           method="dense", param_mask=None):
    """Megakernel-forward hybrid train step (BASELINE "fwd+bwd" north star).

    The megakernel is forward-only (Pallas kernels carry no reverse-mode
    rule), but an MSE inverse problem only needs gradients through a
    LINEARIZED surrogate: with the residual cotangent R = 2·(I − target)/N
    held fixed, ∇θ mean((I(θ) − target)²) = ⟨R, ∂I/∂θ⟩ — a VJP of the
    render at cotangent R. The hybrid step therefore

      1. renders I(θ) with the MEGAKERNEL at high spp (`spp_res`) — ~2
         orders of magnitude cheaper per spp than the differentiable
         wavefront scan (PERF.md), so the residual is low-noise AND drawn
         from sample paths independent of the gradient pass (a
         single-estimator step at low spp biases E[R·∂I] by the Cov(I, ∂I)
         term — the standard decorrelation argument; the hybrid gives the
         decorrelated residual nearly for free);
      2. pulls R back through the wavefront detached-sampling estimator at
         `spp_grad` via jax.vjp (pathwise gradients, visibility
         discontinuities not differentiated — same estimator class as
         make_train_step);
      3. applies the optax update on the host-side params.

    Returns (init_fn, step_fn); step_fn(params, opt_state, key, seed) ->
    (params, opt_state, loss) with loss = the megakernel-rendered MSE.
    `target_img`: (H, W, 3) linear radiance. The megakernel render runs
    eagerly (its Pallas dispatch is jitted with the pack tables traced, so
    per-step parameter updates reuse the compiled kernel); the VJP+update
    runs as one jitted function.
    """
    import numpy as np

    from mcpt_tpu.kernels.megakernel import render_mega

    optimizer = optimizer or optax.adam(1e-2)
    target_img = jnp.asarray(target_img, jnp.float32)
    h, w = target_img.shape[:2]
    n_pix = h * w
    pixel_ids = jnp.arange(n_pix, dtype=jnp.int32)

    @jax.jit
    def grad_and_update(params, opt_state, resid, key):
        def render_flat(p):
            return render_lanes(
                apply_params(pack, p), camera, pixel_ids, key,
                spp=spp_grad, max_bounces=max_bounces, method=method,
            )

        _, vjp = jax.vjp(render_flat, params)
        (grads,) = vjp(resid)
        if param_mask is not None:
            grads = jax.tree_util.tree_map(
                lambda g, m: g * m, grads, param_mask
            )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state

    def step(params, opt_state, key, seed):
        img, _ = render_mega(
            apply_params(pack, params), camera, spp_res, seed=seed,
            max_bounces=max_bounces,
        )
        diff = jnp.asarray(img) - target_img
        loss = float(np.mean(np.asarray(diff) ** 2))
        resid = (2.0 / n_pix) * diff.reshape(n_pix, 3)
        params, opt_state = grad_and_update(params, opt_state, resid, key)
        return params, opt_state, loss

    def init_fn():
        params = params_from_pack(pack)
        return params, optimizer.init(params)

    return init_fn, step


# ---------------------------------------------------------------------------
# Train-state persistence (orbax)
# ---------------------------------------------------------------------------


def save_train_state(path, params: SceneParams, opt_state, step: int) -> None:
    """Checkpoint the inverse-rendering state (orbax, async-safe layout)."""
    import orbax.checkpoint as ocp

    ckpt = ocp.StandardCheckpointer()
    ckpt.save(
        path,
        {"params": params._asdict(), "opt_state": opt_state, "step": step},
        force=True,
    )
    ckpt.wait_until_finished()


def load_train_state(path, like_params: SceneParams, like_opt_state):
    import orbax.checkpoint as ocp

    ckpt = ocp.StandardCheckpointer()
    template = {
        "params": like_params._asdict(),
        "opt_state": like_opt_state,
        "step": 0,
    }
    restored = ckpt.restore(path, template)
    return (
        SceneParams(**restored["params"]),
        restored["opt_state"],
        int(restored["step"]),
    )
