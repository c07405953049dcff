"""BVH builder structural invariants + traversal equivalence on random soup."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcpt_tpu.bvh import build_bvh
from mcpt_tpu.intersect import intersect_brute, intersect_bvh
from mcpt_tpu.materials import Material
from mcpt_tpu.scene import Scene, Sphere, TriangleMesh


@pytest.mark.parametrize("method", ["median", "sah"])
@pytest.mark.parametrize("n", [1, 2, 5, 64, 333])
def test_structure_invariants(method, n):
    rng = np.random.default_rng(n)
    lo = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
    hi = lo + rng.uniform(0.01, 2.0, (n, 3)).astype(np.float32)
    bvh = build_bvh(lo, hi, leaf_size=4, method=method)
    # Every primitive appears exactly once across leaves.
    assert sorted(bvh.prim_ids.tolist()) == list(range(n))
    # Leaf ranges tile prim_ids.
    leaves = np.nonzero(bvh.leaf_start >= 0)[0]
    spans = sorted(
        (int(bvh.leaf_start[i]), int(bvh.leaf_count[i])) for i in leaves
    )
    cursor = 0
    for s, c in spans:
        assert s == cursor and c >= 1
        cursor += c
    assert cursor == n
    # Parent AABBs contain their children (walk via hit-successor layout).
    for i in range(bvh.n_nodes):
        if bvh.leaf_start[i] < 0:
            left = i + 1
            right = int(bvh.node_miss[left])
            for c in (left, right):
                assert (bvh.node_min[i] <= bvh.node_min[c] + 1e-6).all()
                assert (bvh.node_max[i] >= bvh.node_max[c] - 1e-6).all()
            # Leaf prims inside the leaf box.
            if bvh.leaf_start[c] >= 0:
                ids = bvh.prim_ids[
                    bvh.leaf_start[c] : bvh.leaf_start[c] + bvh.leaf_count[c]
                ]
                assert (lo[ids] >= bvh.node_min[c] - 1e-6).all()
                assert (hi[ids] <= bvh.node_max[c] + 1e-6).all()


def test_traversal_equivalence_random_soup():
    rng = np.random.default_rng(3)
    f = 300
    a = rng.uniform(-5, 5, (f, 3)).astype(np.float32)
    b = a + rng.normal(0, 1, (f, 3)).astype(np.float32)
    c = a + rng.normal(0, 1, (f, 3)).astype(np.float32)
    pos = np.stack([a, b, c], axis=1)
    sc = Scene()
    sc.add(TriangleMesh(positions=pos, texcoords=np.zeros((f, 3, 2), np.float32)))
    sc.add(Sphere((0.0, 0.0, 0.0), 1.5, Material()))
    pack = sc.compile(bvh_leaf_size=4, bvh_method="sah")
    key = jax.random.key(0)
    n = 2048
    o = jax.random.uniform(key, (n, 3), minval=-8, maxval=8)
    d = jax.random.normal(jax.random.fold_in(key, 1), (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    hb = intersect_bvh(pack, o, d)
    hr = intersect_brute(pack, o, d)
    assert (np.asarray(hb.prim) == np.asarray(hr.prim)).mean() > 0.999
    tm = np.asarray(hr.t) < 1e30
    same = np.asarray(hb.prim) == np.asarray(hr.prim)
    np.testing.assert_allclose(
        np.asarray(hb.t)[tm & same], np.asarray(hr.t)[tm & same], rtol=1e-3, atol=1e-3
    )
