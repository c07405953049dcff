"""Differentiable rendering: finite-difference gradient checks and an
inverse-rendering convergence smoke test."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcpt_tpu.camera import Camera
from mcpt_tpu.diff import (
    SceneParams,
    apply_params,
    make_train_step,
    params_from_pack,
    render_lanes,
)
from mcpt_tpu.materials import Material, MaterialType, make_light_material
from mcpt_tpu.scene import Scene, TriangleMesh


def _quad(y, size, material, flip=False):
    c = [[-size, y, -size], [size, y, -size], [size, y, size], [-size, y, size]]
    f1, f2 = ([0, 2, 1], [0, 3, 2]) if flip else ([0, 1, 2], [0, 2, 3])
    pos = np.array([[c[i] for i in f1], [c[i] for i in f2]], np.float32)
    return TriangleMesh(
        positions=pos, texcoords=np.zeros((2, 3, 2), np.float32), material=material
    )


@pytest.fixture(scope="module")
def setup():
    light = make_light_material(2.0)
    floor = Material(
        MaterialType.ROUGH_CONDUCTOR, roughness=0.5, base_reflectance=(0.8, 0.6, 0.4)
    )
    sc = Scene()
    sc.add(_quad(4.0, 1.5, light))
    sc.add(_quad(0.0, 5.0, floor, flip=True))
    sc.set_rr_rate(0.6)
    cam = Camera(
        width=8, height=8, fov=60, position=(0.0, 2.0, -6.0), target=(0.0, 1.0, 0.0)
    )
    return sc.compile(), cam


def _mean_radiance(pack, cam, params, key):
    fb = render_lanes(
        apply_params(pack, params), cam, jnp.arange(64, dtype=jnp.int32), key,
        spp=2, max_bounces=3, method="dense",
    )
    return jnp.mean(fb)


def test_fd_gradients_match(setup):
    """Pathwise gradients vs central differences with FIXED RNG — the
    detached-sampling estimator must agree on smooth parameters."""
    pack, cam = setup
    key = jax.random.key(0)
    p0 = params_from_pack(pack)

    f = jax.jit(lambda p: _mean_radiance(pack, cam, p, key))
    grads = jax.jit(jax.grad(lambda p: _mean_radiance(pack, cam, p, key)))(p0)

    # light_scale: analytic vs FD.
    eps = 1e-3
    for field, idx in [("light_scale", None), ("refl", (None))]:
        pass
    g_light = float(grads.light_scale)
    fp = f(p0._replace(light_scale=jnp.float32(1 + eps)))
    fm = f(p0._replace(light_scale=jnp.float32(1 - eps)))
    fd = float((fp - fm) / (2 * eps))
    assert g_light != 0.0
    np.testing.assert_allclose(g_light, fd, rtol=0.05)

    # base_reflectance of the floor material (find its row).
    refl = np.asarray(p0.refl)
    row = int(np.argmax(refl.sum(axis=1)))
    e = np.zeros_like(refl)
    e[row, 0] = eps
    fp = f(p0._replace(refl=jnp.asarray(refl + e)))
    fm = f(p0._replace(refl=jnp.asarray(refl - e)))
    fd_r = float((fp - fm) / (2 * eps))
    g_r = float(np.asarray(grads.refl)[row, 0])
    if abs(fd_r) > 1e-6:
        np.testing.assert_allclose(g_r, fd_r, rtol=0.08, atol=1e-5)

    # roughness (pathwise through eval/pdf and the reparameterized GGX draw).
    rough = np.asarray(p0.rough)
    rrow = row
    er = np.zeros_like(rough)
    er[rrow] = eps
    fp = f(p0._replace(rough=jnp.asarray(rough + er)))
    fm = f(p0._replace(rough=jnp.asarray(rough - er)))
    fd_a = float((fp - fm) / (2 * eps))
    g_a = float(np.asarray(grads.rough)[rrow])
    if abs(fd_a) > 1e-5:
        np.testing.assert_allclose(g_a, fd_a, rtol=0.15, atol=1e-4)


def test_inverse_rendering_recovers_brightness(setup):
    """Optimize light_scale to match a target rendered at a different scale."""
    pack, cam = setup
    key = jax.random.key(1)
    ids = jnp.arange(64, dtype=jnp.int32)
    p_true = params_from_pack(pack)._replace(light_scale=jnp.float32(1.6))
    target = render_lanes(
        apply_params(pack, p_true), cam, ids, key, spp=4, max_bounces=3
    )

    import optax

    mask = SceneParams(
        rough=jnp.zeros_like(p_true.rough),
        ior_a=jnp.zeros_like(p_true.ior_a),
        ior_b=jnp.zeros_like(p_true.ior_b),
        refl=jnp.zeros_like(p_true.refl),
        light_scale=jnp.float32(1.0),
    )
    init_fn, step = make_train_step(
        pack, cam, np.asarray(target), optax.adam(1e-1), spp=2, max_bounces=3,
        param_mask=mask,
    )
    params, opt_state = init_fn()
    for k in range(80):
        params, opt_state, loss = step(
            params, opt_state, ids, jax.random.fold_in(key, k)
        )
    assert abs(float(params.light_scale) - 1.6) < 0.25, float(params.light_scale)


def test_hybrid_train_step_megakernel_forward(setup):
    """make_train_step_hybrid: megakernel-rendered residual + wavefront VJP
    must move light_scale toward the target and reduce the (megakernel) MSE
    (BASELINE "fwd+bwd" north star — see benchmarks/train_step.py --hybrid
    for the measured speedup on hardware)."""
    import optax

    from mcpt_tpu.diff import make_train_step_hybrid
    from mcpt_tpu.kernels.megakernel import mega_supported, render_mega

    pack, cam = setup
    assert mega_supported(pack)
    p_true = params_from_pack(pack)._replace(light_scale=jnp.float32(1.6))
    target_img, _ = render_mega(
        apply_params(pack, p_true), cam, 8, seed=3, max_bounces=3,
        interpret=True,
    )
    mask = SceneParams(
        rough=jnp.zeros_like(p_true.rough),
        ior_a=jnp.zeros_like(p_true.ior_a),
        ior_b=jnp.zeros_like(p_true.ior_b),
        refl=jnp.zeros_like(p_true.refl),
        light_scale=jnp.float32(1.0),
    )
    init_fn, step = make_train_step_hybrid(
        pack, cam, np.asarray(target_img), optax.adam(1e-1), spp_res=4,
        spp_grad=2, max_bounces=3, param_mask=mask,
    )
    params, opt_state = init_fn()
    losses = []
    key = jax.random.key(5)
    for k in range(10):
        params, opt_state, loss = step(
            params, opt_state, jax.random.fold_in(key, k), seed=k
        )
        losses.append(loss)
    assert all(np.isfinite(l) for l in losses), losses
    # the step must climb toward the brighter target and improve the fit
    assert float(params.light_scale) > 1.15, float(params.light_scale)
    assert min(losses[-3:]) < losses[0], losses
