"""Sharded rendering on the 8-device virtual mesh must equal single-device."""

import dataclasses

import jax
import numpy as np
import pytest

from mcpt_tpu.builtin_scenes import demo_scene
from mcpt_tpu.parallel.mesh import make_mesh, render_sharding
from mcpt_tpu.render import render_radiance


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_render_matches_single_device():
    sc = demo_scene()
    pack = sc.compile()
    cam = dataclasses.replace(sc.camera, width=32, height=24)
    kw = dict(spp=4, max_bounces=3, method="dense", spp_chunk=4, tile_pixels=768)
    fb1, s1 = render_radiance(pack, cam, **kw)
    mesh = make_mesh(8)
    fb8, s8 = render_radiance(pack, cam, sharding=render_sharding(mesh), **kw)
    np.testing.assert_allclose(fb8, fb1, atol=1e-5)
    assert s1["rays"] == s8["rays"]


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
