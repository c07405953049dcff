"""Train-state checkpoint roundtrip (orbax)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from mcpt_tpu.builtin_scenes import demo_scene
from mcpt_tpu.diff import (
    load_train_state,
    params_from_pack,
    save_train_state,
)


def test_roundtrip(tmp_path):
    pack = demo_scene().compile()
    params = params_from_pack(pack)._replace(light_scale=jnp.float32(1.37))
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)
    path = str(tmp_path / "ckpt")
    save_train_state(path, params, opt_state, step=7)
    p2, o2, s2 = load_train_state(path, params_from_pack(pack), opt.init(params_from_pack(pack)))
    assert s2 == 7
    np.testing.assert_allclose(float(p2.light_scale), 1.37)
    np.testing.assert_allclose(np.asarray(p2.rough), np.asarray(params.rough))
