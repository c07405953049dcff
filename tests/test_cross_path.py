"""Estimator-level cross-path guard: megakernel vs wavefront in CI.

The at-scale clustered-vs-SMEM bitwise guard (test_megakernel.py) catches
traversal/occlusion divergence, but anything the two megakernel paths SHARE
(NEE weighting, the clamp fold, RR compensation, camera math, Scene.cpp:
56-182 semantics) can only regress against the INDEPENDENT wavefront
integrator (integrator.py). VERDICT r4 item 6: put a bound in CI that a 5%
estimator regression actually fails.

Method: DEMO Cornell scene at 64x48, fixed seeds (the comparison is
DETERMINISTIC across runs; Monte-Carlo noise only enters when a code change
legitimately reshuffles RNG streams — in that case re-baseline). The
megakernel renders spp=32; the wavefront pools 4 seeds x spp=16 (=64 spp).
Measured deviation at these seeds: 0.24% (2026-08-21, CPU); the combined
estimator sigma is ~1.3%, so the 3% bound is >2 sigma against a reseed and
a 5% radiance-scale regression measures 3.9% at the same seeds —
deterministically outside. The sensitivity leg proves exactly that by
scaling the emitter radiance 5% on one side and asserting the SAME
comparison fails.
"""

import dataclasses

import jax
import numpy as np
import pytest

from mcpt_tpu.builtin_scenes import demo_scene
from mcpt_tpu.kernels.megakernel import render_mega
from mcpt_tpu.render import render_radiance

BOUND = 0.03


@pytest.fixture(scope="module")
def setup():
    sc = demo_scene()
    pack = sc.compile()
    cam = dataclasses.replace(sc.camera, width=64, height=48)
    means = []
    for s in range(4):
        ref, _ = render_radiance(
            pack, cam, 16, key=jax.random.key(s), max_bounces=6,
            tile_pixels=64 * 48,
        )
        means.append(float(np.asarray(ref).mean()))
    return pack, cam, float(np.mean(means))


@pytest.mark.slow
def test_mega_vs_wavefront_estimator_bound(setup):
    pack, cam, wave_mean = setup
    img, _ = render_mega(
        pack, cam, spp=32, seed=11, max_bounces=6, interpret=True
    )
    dev = abs(float(img.mean()) - wave_mean) / wave_mean
    assert dev < BOUND, (float(img.mean()), wave_mean, dev)


@pytest.mark.slow
def test_mega_vs_wavefront_bound_is_discriminating(setup):
    """A 5% radiance-scale estimator shift must FAIL the same comparison
    (here injected via the emitter table — every NEE and emitter-hit term
    scales together, the worst disguised regression class)."""
    pack, cam, wave_mean = setup
    pert = pack.replace(
        emt_fat=pack.emt_fat.at[:, 12:15].mul(1.05),
        mat_emission=pack.mat_emission * 1.05,
        mat_fat=pack.mat_fat.at[:, 7:10].mul(1.05),
    )
    img, _ = render_mega(
        pert, cam, spp=32, seed=11, max_bounces=6, interpret=True
    )
    dev = abs(float(img.mean()) - wave_mean) / wave_mean
    assert dev > BOUND, (float(img.mean()), wave_mean, dev)
