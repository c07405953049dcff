"""Render driver: tiles × spp-chunks over a jitted wavefront step.

Replaces the reference's OpenMP pixel loop (`src/Renderer.cpp:36-90`) with:
- flat lanes = (pixel-tile × spp-sub-samples × 3 wavelengths), all advanced by
  one `lax.scan`-based integrator invocation per (tile, chunk) — thousands of
  pixels per dispatch instead of one C++ iteration per pixel;
- the 3 spectral channels traced as independent lanes sharing one primary ray
  (`src/Renderer.cpp:77-79` semantics) — the λ axis is data, not a loop;
- deterministic threefry keys per (tile, chunk) — re-running with the same
  key reproduces the image bit-for-bit, which the reference cannot do (§5 of
  SURVEY.md: its RNG is default-seeded per translation unit);
- optional sharding of the lane axis over a `jax.sharding.Mesh` (the scene
  pack is replicated; lanes are embarrassingly parallel, the only
  communication is framebuffer assembly);
- tile-level checkpointing: the accumulated framebuffer + completed-chunk
  cursor make a crash-resumable render (the reference loses everything,
  SURVEY.md §5).
"""

import os
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from mcpt_tpu.camera import Camera, generate_rays_c
from mcpt_tpu.constants import WAVELEN_UM
from mcpt_tpu.integrator import trace_paths_c
from mcpt_tpu.utils.profiling import device_trace
from mcpt_tpu.utils.progress import ProgressBar


@partial(
    jax.jit,
    static_argnames=("camera", "n_sub", "max_bounces", "method"),
)
def _render_tile(pack, camera, pixel_ids, key, n_sub, max_bounces, method):
    """Mean radiance over n_sub camera samples for one pixel tile.

    Returns ((P,3) radiance, total ray count).
    """
    lam = jnp.asarray(WAVELEN_UM)
    p = pixel_ids.shape[0]
    chan = jnp.tile(jnp.arange(3, dtype=jnp.int32), p)
    lam_lane = lam[chan]

    def one_sample(acc, k):
        fb_acc, ray_acc = acc
        k1, k2 = jax.random.split(k)
        o, d = generate_rays_c(camera, pixel_ids, k1)
        # Fusing camera-ray generation into the integrator program SIGSEGVs
        # the TPU (Mosaic/XLA) compiler as of libtpu in this image; a fusion
        # barrier here costs one (P,)x6 materialization and avoids it.
        o, d = jax.lax.optimization_barrier((o, d))
        rep = lambda x: jnp.repeat(x, 3, axis=0)
        o3 = (rep(o[0]), rep(o[1]), rep(o[2]))
        d3 = (rep(d[0]), rep(d[1]), rep(d[2]))
        rad, stats = trace_paths_c(
            pack, o3, d3, lam_lane, chan, k2, max_bounces=max_bounces, method=method
        )
        return (fb_acc + rad.reshape(p, 3), ray_acc + stats.rays), None

    keys = jax.random.split(key, n_sub)
    (fb, rays), _ = jax.lax.scan(
        one_sample, (jnp.zeros((p, 3), jnp.float32), jnp.zeros((), jnp.int32)), keys
    )
    return fb / jnp.float32(n_sub), rays


def render_radiance(
    scene_or_pack,
    camera: Camera,
    spp: int,
    key=None,
    *,
    max_bounces: int = 8,
    method: str = "auto",
    tile_pixels: int = 65536,
    spp_chunk: int = 8,
    progress: bool = False,
    checkpoint_path: str | None = None,
    sharding=None,
    trace_dir: str | None = None,
):
    """Full-image linear radiance (H, W, 3) numpy array + stats dict."""
    pack = scene_or_pack.compile() if hasattr(scene_or_pack, "compile") else scene_or_pack
    if key is None:
        key = jax.random.key(0)
    w, h = camera.width, camera.height
    n_pix = w * h
    tile_pixels = min(tile_pixels, n_pix)
    n_tiles = (n_pix + tile_pixels - 1) // tile_pixels
    spp_chunk = max(1, min(spp_chunk, spp))
    n_chunks = (spp + spp_chunk - 1) // spp_chunk

    fb = np.zeros((n_pix, 3), np.float64)
    chunk_weights = np.zeros(n_tiles, np.float64)
    total_rays = 0
    start_chunk = np.zeros(n_tiles, np.int64)

    ckpt = None
    if checkpoint_path and os.path.exists(checkpoint_path):
        ckpt = np.load(checkpoint_path)
        fb = ckpt["fb"].astype(np.float64)
        chunk_weights = ckpt["chunk_weights"]
        start_chunk = ckpt["start_chunk"]
        total_rays = int(ckpt["total_rays"])

    if sharding is not None:
        pack = jax.device_put(pack, jax.tree_util.tree_map(lambda _: sharding.rep, pack))

    bar = ProgressBar() if progress else None
    t0 = time.monotonic()
    work = 0
    total_work = n_tiles * n_chunks
    trace_cm = device_trace(trace_dir)
    trace_cm.__enter__()
    for tile in range(n_tiles):
        lo = tile * tile_pixels
        hi = min(lo + tile_pixels, n_pix)
        ids = np.arange(lo, lo + tile_pixels, dtype=np.int32)
        ids = np.minimum(ids, n_pix - 1)  # pad the last tile
        ids_dev = jnp.asarray(ids)
        if sharding is not None:
            ids_dev = jax.device_put(ids_dev, sharding.lanes)
        for chunk in range(int(start_chunk[tile]), n_chunks):
            sub = min(spp_chunk, spp - chunk * spp_chunk)
            k = jax.random.fold_in(jax.random.fold_in(key, tile), chunk)
            tile_fb, rays = _render_tile(
                pack, camera, ids_dev, k, sub, max_bounces, method
            )
            fb[lo:hi] += np.asarray(tile_fb)[: hi - lo] * sub
            chunk_weights[tile] += sub
            total_rays += int(rays)
            work += 1
            if bar:
                bar.update(work / total_work)
            if checkpoint_path and (chunk + 1) % 16 == 0:
                start_chunk[tile] = chunk + 1
                np.savez(
                    checkpoint_path,
                    fb=fb,
                    chunk_weights=chunk_weights,
                    start_chunk=start_chunk,
                    total_rays=total_rays,
                )
        start_chunk[tile] = n_chunks
        fb[lo:hi] /= max(chunk_weights[tile], 1.0)
    trace_cm.__exit__(None, None, None)
    if bar:
        bar.finish()
    elapsed = time.monotonic() - t0
    stats = {
        "elapsed_s": elapsed,
        "rays": total_rays,
        "rays_per_s": total_rays / max(elapsed, 1e-9),
        "camera_samples": n_pix * spp,
        "wavelength_paths": n_pix * spp * 3,
        "wavelength_paths_per_s": n_pix * spp * 3 / max(elapsed, 1e-9),
    }
    if checkpoint_path and os.path.exists(checkpoint_path):
        os.remove(checkpoint_path)
    return fb.reshape(h, w, 3).astype(np.float32), stats


def render(scene, camera=None, spp: int | None = None, key=None, out_path=None, **kw):
    """High-level entry: scene (+its camera) → PNG on disk + stats."""
    from mcpt_tpu.film import save_png

    camera = camera if camera is not None else scene.camera
    spp = spp if spp is not None else 32
    fb, stats = render_radiance(scene, camera, spp, key, **kw)
    if out_path:
        save_png(out_path, fb)
        stats["output"] = str(out_path)
    return fb, stats
