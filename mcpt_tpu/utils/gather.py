"""Fast row-gather for TPU.

XLA lowers `table[idx]` for per-lane row gathers into a slow dynamic-gather on
TPU (measured ~25 ms for 196K lanes over a 10-row material table — dominating
the whole shading stage). For small tables a one-hot matmul runs on the MXU
instead and is ~an order of magnitude faster; with `Precision.HIGHEST` the
result is bit-exact (verified in tests/test_gather.py).

Tables larger than ONEHOT_MAX rows (e.g. BVH node arrays for large meshes)
fall back to the native gather.
"""

import jax
import jax.numpy as jnp
from jax import lax

ONEHOT_MAX = 2048


def gather_rows(table, idx):
    """table: (N, K) — any dtype castable to f32 losslessly for N<=ONEHOT_MAX
    (ints < 2^24, bools, f32). idx: (B,) int. Out-of-range indices return a
    zero row (one-hot is all-zero), which callers mask anyway."""
    n = table.shape[0]
    if n <= ONEHOT_MAX:
        oh = jax.nn.one_hot(idx, n, dtype=jnp.float32)
        return jnp.dot(oh, table.astype(jnp.float32), precision=lax.Precision.HIGHEST)
    return table[idx].astype(jnp.float32)
