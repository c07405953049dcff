"""Native (C++) OBJ loader and BVH builder vs the pure-Python references."""

import os
import time

import numpy as np
import pytest

from mcpt_tpu.bvh import build_bvh
from mcpt_tpu.io.obj import load_obj
from mcpt_tpu.native.native import bvh_build_native, native_available, obj_load_native

pytestmark = pytest.mark.skipif(
    not native_available(), reason="g++ unavailable / native build failed"
)


def test_obj_native_matches_python(tmp_path):
    obj = tmp_path / "m.obj"
    obj.write_text(
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "vt 0 0\nvt 1 0\nvt 1 1\nvt 0 1\n"
        "vn 0 0 1\n"
        "f 1/1/1 2/2/1 3/3/1 4/4/1\n"
        "f -4//-1 -3//-1 -2//-1\n"
    )
    a = load_obj(obj)
    b = obj_load_native(obj)
    for k in ("positions", "texcoords", "normals"):
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)


@pytest.mark.skipif(
    not os.path.exists("/root/reference/models/low_soldier.obj"),
    reason="reference mount absent",
)
def test_obj_native_real_mesh_parity_and_speed():
    path = "/root/reference/models/low_soldier.obj"
    t0 = time.monotonic()
    a = load_obj(path)
    t_py = time.monotonic() - t0
    t0 = time.monotonic()
    b = obj_load_native(path)
    t_nat = time.monotonic() - t0
    np.testing.assert_allclose(a["positions"], b["positions"], atol=1e-6)
    np.testing.assert_allclose(a["texcoords"], b["texcoords"], atol=1e-6)
    assert a["positions"].shape[0] == 2560  # SURVEY.md §2 item 18
    assert t_nat < t_py  # native must actually be faster


@pytest.mark.parametrize("method", ["median", "sah"])
def test_bvh_native_structural_invariants(method):
    rng = np.random.default_rng(5)
    n = 777
    lo = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
    hi = lo + rng.uniform(0.01, 2.0, (n, 3)).astype(np.float32)
    bvh = bvh_build_native(lo, hi, leaf_size=4, method=method)
    assert sorted(bvh.prim_ids.tolist()) == list(range(n))
    leaves = np.nonzero(bvh.leaf_start >= 0)[0]
    spans = sorted((int(bvh.leaf_start[i]), int(bvh.leaf_count[i])) for i in leaves)
    cursor = 0
    for s, c in spans:
        assert s == cursor and 1 <= c <= 4
        cursor += c
    assert cursor == n
    # Parent boxes contain children; prims inside their leaf box.
    for i in range(bvh.n_nodes):
        if bvh.leaf_start[i] < 0:
            left = i + 1
            right = int(bvh.node_miss[left])
            for c in (left, right):
                assert (bvh.node_min[i] <= bvh.node_min[c] + 1e-5).all()
                assert (bvh.node_max[i] >= bvh.node_max[c] - 1e-5).all()
        else:
            ids = bvh.prim_ids[
                bvh.leaf_start[i] : bvh.leaf_start[i] + bvh.leaf_count[i]
            ]
            assert (lo[ids] >= bvh.node_min[i] - 1e-5).all()
            assert (hi[ids] <= bvh.node_max[i] + 1e-5).all()


def test_bvh_native_traversal_equivalence():
    """Native-built tree must produce identical nearest hits via the device
    traversal as the Python-built tree."""
    import jax
    import jax.numpy as jnp

    from mcpt_tpu.intersect import intersect_brute, intersect_bvh
    from mcpt_tpu.materials import Material
    from mcpt_tpu.scene import Scene, TriangleMesh

    rng = np.random.default_rng(9)
    f = 200
    a = rng.uniform(-5, 5, (f, 3)).astype(np.float32)
    pos = np.stack([a, a + rng.normal(0, 1, (f, 3)), a + rng.normal(0, 1, (f, 3))], axis=1)
    sc = Scene()
    sc.add(TriangleMesh(positions=pos.astype(np.float32),
                        texcoords=np.zeros((f, 3, 2), np.float32)))
    pack = sc.compile()  # uses native builder when available
    key = jax.random.key(0)
    o = jax.random.uniform(key, (512, 3), minval=-8, maxval=8)
    d = jax.random.normal(jax.random.fold_in(key, 1), (512, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    hb = intersect_bvh(pack, o, d)
    hr = intersect_brute(pack, o, d)
    assert (np.asarray(hb.prim) == np.asarray(hr.prim)).mean() > 0.998
