"""Multi-host bootstrap and failure-tolerant rendering.

The reference is a single process with no failure handling — a crash loses
the whole render (SURVEY.md §5). Here:

- `init_distributed()`: `jax.distributed.initialize` wrapper (coordinator
  discovery via env or explicit args) so the same render code runs on
  multi-host TPU slices; the mesh in parallel/mesh.py then spans all hosts
  and collectives ride ICI within a slice / DCN across slices.
- Render-level fault tolerance is the tile checkpoint in render.py: the
  accumulated framebuffer + per-tile chunk cursor is the complete resumable
  state, so a preempted/restarted job continues where it stopped (standard
  JAX restart-on-failure model; there is no in-band elastic recovery on TPU).
"""

import os


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize multi-host JAX. Returns True if distributed mode is active.

    No-ops (returns False) when neither args nor the standard environment
    (JAX_COORDINATOR_ADDRESS / auto TPU metadata) indicate multi-host.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if coordinator_address is None and num_processes is None:
        # Single-host TPU pods still auto-discover via the TPU runtime when
        # jax.distributed.initialize() is called with no args, but calling it
        # on a plain single chip raises; only do so when asked.
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def is_primary() -> bool:
    import jax

    return jax.process_index() == 0
