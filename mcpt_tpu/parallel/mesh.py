"""Device-mesh parallelism for rendering and inverse rendering.

The reference's only parallelism is an OpenMP pixel loop on 8 shared-memory
threads (`src/Renderer.cpp:36`, SURVEY.md §2 parallelism table). The
TPU-native equivalent: lanes (pixel × spp × λ) are data-parallel across a 1-D
`jax.sharding.Mesh`; the scene pack (triangles, BVH, materials, env map) is
replicated — it is small relative to HBM; the only cross-chip communication
is the final framebuffer assembly (an all-gather XLA inserts automatically)
and a `psum` for gradients / scalar metrics in the differentiable path
(diff.py). ICI-only; no DCN traffic for single-slice renders.

Multi-host: call `jax.distributed.initialize()` before building the mesh;
everything below is expressed in global arrays so the same code runs 1-chip,
8-chip, or multi-host.
"""

from typing import NamedTuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

LANE_AXIS = "shard"


class RenderSharding(NamedTuple):
    """Placement pair used by render.render_radiance(sharding=...)."""

    rep: NamedSharding  # scene pack: replicated
    lanes: NamedSharding  # lane-batch arrays: split on axis 0


def render_sharding(mesh: Mesh) -> "RenderSharding":
    return RenderSharding(
        rep=NamedSharding(mesh, P()), lanes=NamedSharding(mesh, P(LANE_AXIS))
    )


def make_mesh(n_devices: int | None = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (LANE_AXIS,))


def lane_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for (B, ...) lane-major arrays: split axis 0 over the mesh."""
    return NamedSharding(mesh, P(LANE_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def replicate_pack(pack, mesh: Mesh):
    """Place every scene array replicated on all devices of the mesh."""
    rep = replicated_sharding(mesh)
    return jax.device_put(pack, jax.tree_util.tree_map(lambda _: rep, pack))


def shard_lanes(mesh: Mesh, *arrays):
    """Place lane-batch arrays sharded over the mesh (batch dim must divide)."""
    sh = lane_sharding(mesh)
    out = tuple(jax.device_put(a, sh) for a in arrays)
    return out if len(out) > 1 else out[0]
