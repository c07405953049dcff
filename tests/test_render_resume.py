"""Checkpoint/resume: an interrupted render continued from its checkpoint
must equal the uninterrupted render exactly (deterministic keys)."""

import dataclasses

import numpy as np

from mcpt_tpu.builtin_scenes import demo_scene
from mcpt_tpu.render import render_radiance


def test_resume_equals_uninterrupted(tmp_path, monkeypatch):
    sc = demo_scene()
    pack = sc.compile()
    cam = dataclasses.replace(sc.camera, width=16, height=16)
    kw = dict(spp=8, max_bounces=2, method="dense", spp_chunk=1, tile_pixels=256)

    fb_ref, _ = render_radiance(pack, cam, **kw)

    # Interrupt after 3 chunks by raising from the tile loop.
    ckpt = str(tmp_path / "state.npz")
    calls = {"n": 0}
    import sys

    import mcpt_tpu.render  # noqa: F401  (package attr shadows the module)

    R = sys.modules["mcpt_tpu.render"]
    orig = R._render_tile

    def bomb(*a, **k):
        calls["n"] += 1
        if calls["n"] > 3:
            raise KeyboardInterrupt
        return orig(*a, **k)

    monkeypatch.setattr(R, "_render_tile", bomb)
    try:
        render_radiance(pack, cam, checkpoint_path=ckpt, **kw)
    except KeyboardInterrupt:
        pass
    monkeypatch.setattr(R, "_render_tile", orig)

    # NB: checkpoints are written every 16 chunks; with spp_chunk=1 and an
    # interrupt at chunk 3 nothing was persisted, so the resume re-renders
    # from scratch — still must equal the reference image.
    fb_resumed, _ = render_radiance(pack, cam, checkpoint_path=ckpt, **kw)
    np.testing.assert_allclose(fb_resumed, fb_ref, atol=1e-6)


def test_resume_from_real_checkpoint(tmp_path, monkeypatch):
    sc = demo_scene()
    pack = sc.compile()
    cam = dataclasses.replace(sc.camera, width=16, height=16)
    kw = dict(spp=40, max_bounces=2, method="dense", spp_chunk=1, tile_pixels=256)
    fb_ref, _ = render_radiance(pack, cam, **kw)

    ckpt = str(tmp_path / "state.npz")
    calls = {"n": 0}
    import sys

    import mcpt_tpu.render  # noqa: F401  (package attr shadows the module)

    R = sys.modules["mcpt_tpu.render"]
    orig = R._render_tile

    def bomb(*a, **k):
        calls["n"] += 1
        if calls["n"] > 20:  # past the 16-chunk checkpoint write
            raise KeyboardInterrupt
        return orig(*a, **k)

    monkeypatch.setattr(R, "_render_tile", bomb)
    try:
        render_radiance(pack, cam, checkpoint_path=ckpt, **kw)
    except KeyboardInterrupt:
        pass
    monkeypatch.setattr(R, "_render_tile", orig)
    import os

    assert os.path.exists(ckpt)  # real persisted state
    fb_resumed, _ = render_radiance(pack, cam, checkpoint_path=ckpt, **kw)
    np.testing.assert_allclose(fb_resumed, fb_ref, atol=1e-5)
    assert not os.path.exists(ckpt)  # cleaned up on completion
