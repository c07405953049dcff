"""One-hot MXU gather must be bit-exact vs native indexing."""

import jax
import jax.numpy as jnp
import numpy as np

from mcpt_tpu.utils.gather import gather_rows


def test_onehot_gather_bit_exact():
    key = jax.random.key(0)
    table = jax.random.normal(key, (64, 24), dtype=jnp.float32) * 1e3
    idx = jax.random.randint(jax.random.fold_in(key, 1), (4096,), 0, 64)
    got = jax.jit(gather_rows)(table, idx)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(table)[np.asarray(idx)])


def test_out_of_range_returns_zero_row():
    table = jnp.arange(12.0).reshape(4, 3)
    idx = jnp.array([-1, 0, 4], dtype=jnp.int32)
    got = np.asarray(gather_rows(table, idx))
    np.testing.assert_array_equal(got[0], 0.0)
    np.testing.assert_array_equal(got[1], [0, 1, 2])
    np.testing.assert_array_equal(got[2], 0.0)


def test_int_and_bool_tables():
    table = jnp.array([[3, 1], [7, 0], [255, 1]], dtype=jnp.int32)
    got = np.asarray(gather_rows(table, jnp.array([2, 0])))
    np.testing.assert_array_equal(got, [[255, 1], [3, 1]])
