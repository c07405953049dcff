"""Megakernel (kernels/megakernel.py) tests — interpret mode on CPU.

The megakernel's RNG streams are its own (counter-based murmur3), so images
are compared to the wavefront integrator statistically: whole-image means at
matched spp must agree within Monte-Carlo noise. On TPU the same kernels are
additionally validated against the reference golden image (see bench.py and
the round-2 verification logs); here interpret mode checks the kernel logic
end-to-end without Mosaic.
"""

import dataclasses

import numpy as np
import pytest

from mcpt_tpu.builtin_scenes import demo_scene
from mcpt_tpu.kernels.megakernel import (
    mega_supported,
    mega_tables,
    render_mega,
)
from mcpt_tpu.render import render_radiance

W, H = 16, 8
SPP = 8
MB = 4


@pytest.fixture(scope="module")
def pack():
    return demo_scene().compile()


@pytest.fixture(scope="module")
def cam():
    return dataclasses.replace(demo_scene().camera, width=W, height=H)


@pytest.fixture(scope="module")
def ref_img(pack, cam):
    img, _ = render_radiance(
        pack, cam, 32, method="dense", max_bounces=MB, tile_pixels=W * H
    )
    return img


@pytest.mark.parametrize("regen", [False, True])
def test_mega_matches_wavefront_mean(pack, cam, ref_img, regen):
    img, stats = render_mega(
        pack, cam, spp=SPP, seed=0, max_bounces=MB, interpret=True, regen=regen
    )
    assert img.shape == (H, W, 3)
    assert np.isfinite(img).all()
    # Border columns see only background (= black) in this camera setup.
    assert img[:, :2].max() == 0.0
    assert img[:, 4:12].mean() > 0.05
    # Whole-image mean vs the wavefront integrator at higher spp: the pooled
    # estimate has ~10% relative noise at these sizes.
    ref_mean = ref_img.mean()
    assert abs(img.mean() - ref_mean) / ref_mean < 0.35
    # Ray accounting: every camera sample contributes 1 primary ray plus
    # (1 + 4 NEE) per path vertex; vertices ∈ [0, MB].
    lanes = W * H * 3
    assert stats["rays"] >= lanes * SPP
    assert stats["rays"] <= lanes * SPP * (1 + 5 * MB)


def test_mega_eval_fused_bitwise(pack, cam, monkeypatch):
    """MCPT_EVAL_FUSED=1 (select-before-compute half-vector normalize +
    single Fresnel in _eval_bsdf) must be BITWISE-identical to the default
    two-normalize/two-Fresnel form — the unselected candidate is never
    read (megakernel.py _EVAL_FUSED; measured perf-neutral, PERF.md
    'eval fusion')."""
    from mcpt_tpu.kernels import megakernel as mk

    monkeypatch.setattr(mk, "_EVAL_FUSED", False)
    a, _ = render_mega(pack, cam, spp=4, seed=9, max_bounces=3, interpret=True)
    monkeypatch.setattr(mk, "_EVAL_FUSED", True)
    b, _ = render_mega(pack, cam, spp=4, seed=9, max_bounces=3, interpret=True)
    assert np.array_equal(np.asarray(a), np.asarray(b))


def test_mega_deterministic(pack, cam):
    a, _ = render_mega(
        pack, cam, spp=2, seed=3, max_bounces=2, interpret=True
    )
    b, _ = render_mega(
        pack, cam, spp=2, seed=3, max_bounces=2, interpret=True
    )
    c, _ = render_mega(
        pack, cam, spp=2, seed=4, max_bounces=2, interpret=True
    )
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)


def test_mega_tables_layout(pack):
    (tri, occ, sph, mat, emt, emeta, lcum, par, env, cn, ct,
     cuv) = mega_tables(pack)
    assert tri.shape[1] == 25  # 14 geom + 11 shade cols
    assert occ.shape[1] == 16 and occ.shape[0] % 8 == 0
    # the demo Cornell box statically culls its boundary geometry
    # (floor/ceiling/back/light = 8 tris) from the shadow-fan table
    assert occ.shape[0] < tri.shape[0]
    assert sph.shape[1] == 6
    assert mat.shape[1] == 13
    assert emt.shape[1] == 17  # 16 + is_sphere flag col
    assert emeta.shape[1] == 4  # mesh, intra_cum, mesh_area, intra_frac
    # pad rows of the light-mesh cumulative areas must be +inf-like
    assert float(np.asarray(lcum).min()) > 0.0


def test_mega_supported_gating(pack):
    assert mega_supported(pack)
    # env-map scenes are supported since round 3 (regen kernel only)
    sc = demo_scene()
    sc.env_pixels = np.zeros((4, 8, 3), np.float32)
    env_pack = sc.compile()
    assert mega_supported(env_pack)
    with pytest.raises(ValueError):
        render_mega(env_pack, sc.camera, spp=1, interpret=True, regen=False)


def test_mega_sharded_8dev(pack, cam):
    """Data-parallel megakernel over the 8-virtual-CPU mesh: the sharded
    render must equal the single-call render exactly (counter-based RNG is
    independent of lane-block scheduling)."""
    import jax

    single, s1 = render_mega(
        pack, cam, spp=2, seed=5, max_bounces=2, interpret=True
    )
    from mcpt_tpu.kernels.megakernel import render_mega_sharded

    sharded, s8 = render_mega_sharded(
        pack,
        cam,
        spp=2,
        seed=5,
        max_bounces=2,
        interpret=True,
        devices=jax.devices()[:8],
    )
    assert s8["devices"] == 8
    assert np.array_equal(single, sharded)
    # ray accounting excludes pad lanes on both paths → exact agreement
    assert s1["rays"] == s8["rays"]


def test_mega_textured_chessboard():
    """A textured (procedural chessboard) floor exercises the textured=True
    kernel specialization; means must match the wavefront path."""
    import dataclasses

    from mcpt_tpu.builtin_scenes import (
        CORNELL_FLOOR,
        CORNELL_LIGHT,
        _mesh,
        demo_scene,
    )
    from mcpt_tpu.materials import Material, MaterialType, make_light_material
    from mcpt_tpu.scene import Scene

    base = demo_scene()
    floor_mat = Material(
        mtype=MaterialType.ROUGH_CONDUCTOR,
        roughness=0.9,
        base_reflectance=(0.5, 0.5, 0.5),
        textured=True,
        name="chessboard",
    )
    sc = Scene(base.camera)
    sc.add(_mesh(CORNELL_FLOOR, floor_mat, "floor"))
    sc.add(_mesh(CORNELL_LIGHT, make_light_material(3.9), "light"))
    pack = sc.compile()
    cam = dataclasses.replace(base.camera, width=W, height=H)

    img, _ = render_mega(pack, cam, spp=16, seed=0, max_bounces=MB, interpret=True)
    ref, _ = render_radiance(
        pack, cam, 32, method="dense", max_bounces=MB, tile_pixels=W * H
    )
    assert np.isfinite(img).all()
    assert img.max() > 0.0
    assert abs(img.mean() - ref.mean()) / max(ref.mean(), 1e-6) < 0.35


def test_mega_clustered_equals_smem_demo(pack, cam):
    """Force the demo scene through the CLUSTERED path (cluster_threshold=8)
    and compare with the SMEM brute path. Same murmur draws, same estimator,
    same occlusion predicate — images must agree except for ULP-level
    nearest-hit winner flips on a handful of lanes. This cross-validates the
    clustered intersect AND the single-walk clustered occlusion fan
    (cluster.cluster_occlude_fan) against the SMEM implementations on
    identical sampling decisions — far tighter than wavefront-vs-mega
    statistics."""
    pack_c = demo_scene().compile(cluster_threshold=8)
    assert pack_c.n_cl_nodes > 0
    a, _ = render_mega(pack, cam, spp=6, seed=1, max_bounces=4, interpret=True)
    b, _ = render_mega(
        pack_c, cam, spp=6, seed=1, max_bounces=4, interpret=True
    )
    diff = np.abs(a - b)
    assert (diff > 1e-3).mean() < 0.02, float((diff > 1e-3).mean())
    assert abs(a.mean() - b.mean()) < 5e-3


def test_mega_clustered_equals_smem_at_chessboard_scale():
    """The r3 shadow-epsilon bug class was SCALE-dependent (absolute 1e-4
    epsilons go sub-ULP in f32 beyond ~1.7e3-unit coordinates), so the
    clustered-vs-SMEM cross-validation must also run at chessboard-scale
    coordinates. Same construction as test_mega_clustered_equals_smem_demo
    but with every coordinate scaled x4 (scene spans ~2200 units like the
    conf.json chessboard): identical murmur draws through both intersect/
    occlusion implementations, so agreement is deterministic (no
    Monte-Carlo noise) — a shadow-predicate or traversal regression of ANY
    magnitude flips blocked bits and fails the bitwise-level comparison.

    The injection arm proves sensitivity: shrinking the cluster nodes' AABBs
    by 10% (a traversal bug that misses blockers near box faces) must break
    the agreement."""
    import dataclasses

    from mcpt_tpu import builtin_scenes as B
    from mcpt_tpu.camera import Camera
    from mcpt_tpu.materials import make_light_material, standard_materials
    from mcpt_tpu.scene import Scene, Sphere

    k = 4.0
    mats = standard_materials()
    camera = Camera(
        width=48, height=48, fov=40.0,
        position=(278.0 * k, 273.0 * k, -800.0 * k),
        target=(278.0 * k, 273.0 * k, 0.0),
        up=(0.0, 1.0, 0.0),
    )
    sc = Scene(camera)
    for quads, m, name in [
        (B.CORNELL_FLOOR, mats["rough_white_conductor"], "back"),
        (B.CORNELL_SHORTBOX, mats["green_mirror"], "shortbox"),
        (B.CORNELL_TALLBOX, mats["rough_plastic"], "tallbox"),
        (B.CORNELL_LEFT, mats["rough_red_conductor"], "left"),
        (B.CORNELL_RIGHT, mats["gold_conductor"], "right"),
        (B.CORNELL_LIGHT, make_light_material(3.9), "light"),
    ]:
        sc.add(B._mesh(np.asarray(quads) * k, m, name))
    sc.add(Sphere((400.0 * k, 90.0 * k, 3.0 * k), 80.0 * k,
                  mats["smooth_glass"], "big"))
    sc.add(Sphere((250.0 * k, 260.0 * k, 230.0 * k), 60.0 * k,
                  mats["clear_rough_plastic"], "mid"))

    pack_s = sc.compile()
    pack_c = sc.compile(cluster_threshold=8)
    assert pack_s.n_cl_nodes == 0 and pack_c.n_cl_nodes > 0
    a, _ = render_mega(
        pack_s, camera, spp=4, seed=3, max_bounces=4, interpret=True
    )
    b, _ = render_mega(
        pack_c, camera, spp=4, seed=3, max_bounces=4, interpret=True
    )
    diff = np.abs(a - b)
    mismatch = float((diff > 1e-3).mean())
    assert mismatch < 0.02, mismatch
    assert abs(a.mean() - b.mean()) < 5e-3

    # Injection: drop every 4th triangle from the cluster tiles (zero its
    # valid + nr2 columns) — the "missed blocker / missed hit" regression
    # class. The comparison above must catch the resulting light leak
    # (validates the guard's sensitivity). Node-box perturbations are NOT a
    # useful injection here: the walk descends on the 1024-ray union, which
    # is insensitive to box changes (measured 0.07% flips at 10% shrink).
    raw = np.array(pack_c.cl_tris)
    raw[::4, 12::16] = 0.0  # nr2 (every tile col): det test rejects
    raw[::4, 13::16] = 0.0  # valid
    pack_bad = pack_c.replace(cl_tris=raw)
    c, _ = render_mega(
        pack_bad, camera, spp=4, seed=3, max_bounces=4, interpret=True
    )
    bad_mismatch = float((np.abs(a - c) > 1e-3).mean())
    assert bad_mismatch > 0.05, bad_mismatch


def test_mega_many_light_tessellated(pack, cam):
    """A 64-triangle tessellated ceiling light: the kernel's emitter pick is
    a lax.fori over emitter rows (compile-flat in E), and must match the
    wavefront integrator's searchsorted pick statistically."""
    from mcpt_tpu.builtin_scenes import CORNELL_FLOOR, _mesh
    from mcpt_tpu.materials import make_light_material, standard_materials
    from mcpt_tpu.scene import Scene, TriangleMesh

    # tessellate the Cornell light quad into an 8x4 grid (64 tris)
    x0, x1, z0, z1, y = 213.0, 343.0, 227.0, 332.0, 548.7
    xs = np.linspace(x0, x1, 9)
    zs = np.linspace(z0, z1, 5)
    tris = []
    for i in range(8):
        for j in range(4):
            a = [xs[i], y, zs[j]]
            b = [xs[i + 1], y, zs[j]]
            c = [xs[i + 1], y, zs[j + 1]]
            d = [xs[i], y, zs[j + 1]]
            tris.append([a, b, c])
            tris.append([a, c, d])
    light = TriangleMesh(
        np.asarray(tris, np.float32),
        np.zeros((64, 3, 2), np.float32),
        make_light_material(3.9),
        "tess_light",
    )
    mats = standard_materials()
    sc = Scene(demo_scene().camera)
    sc.add(_mesh(CORNELL_FLOOR, mats["rough_white_conductor"], "walls"))
    sc.add(light)
    p = sc.compile()
    assert p.n_emitters == 64
    img, _ = render_mega(pack=p, camera=cam, spp=8, seed=0, max_bounces=3,
                         interpret=True)
    ref, _ = render_radiance(
        p, cam, 16, method="dense", max_bounces=3, tile_pixels=W * H
    )
    assert np.isfinite(img).all()
    assert img.max() > 0.0
    assert abs(img.mean() - ref.mean()) / max(ref.mean(), 1e-6) < 0.3


def test_occluder_cull_is_lossless(pack, cam):
    """The static shadow-fan cull (scene.py tri_occ_sc) only removes
    triangles that provably cannot block any vertex→light segment, so
    rendering with the culled table must be BITWISE equal to rendering
    with the full triangle table as occluders."""
    full = dataclasses.replace(pack, tri_occ_sc=pack.tri_sc)
    a, sa = render_mega(pack, cam, spp=4, seed=2, max_bounces=3, interpret=True)
    b, sb = render_mega(full, cam, spp=4, seed=2, max_bounces=3, interpret=True)
    assert np.array_equal(a, b)
    assert sa["rays"] == sb["rays"]


@pytest.mark.parametrize("regen", [False, True])
def test_mega_no_phantom_padding_triangle(regen):
    """Triangle counts not divisible by 8 pad tri_sc with synthetic rows.
    The packer must zero their nr2 column (scene.py tri_kern[12]) so the
    min-chain intersectors — which carry no valid-column test — cannot hit a
    phantom unit triangle at the world origin. Regression: a 3-triangle
    scene viewed through the origin must render pure background."""
    from mcpt_tpu.camera import Camera
    from mcpt_tpu.materials import Material, make_light_material
    from mcpt_tpu.scene import Scene, TriangleMesh

    cam = Camera(
        width=8, height=8, fov=40,
        position=(0.3, 0.3, -2.0), target=(0.3, 0.3, 0.0), up=(0, 1, 0),
    )
    sc = Scene(cam)
    # One ordinary triangle + a 2-triangle light, all far outside the
    # frustum: 3 real rows -> 5 padding rows in the 8-row kernel table.
    tri = np.array([[[50, 0, 10], [51, 0, 10], [50, 1, 10]]], np.float32)
    quad = np.array(
        [
            [[50, 5, 10], [51, 5, 10], [51, 5, 11]],
            [[50, 5, 10], [51, 5, 11], [50, 5, 11]],
        ],
        np.float32,
    )
    zuv = np.zeros((1, 3, 2), np.float32)
    sc.add(TriangleMesh(tri, zuv, Material(), "tri"))
    sc.add(
        TriangleMesh(
            quad, np.zeros((2, 3, 2), np.float32), make_light_material(5.0),
            "light",
        )
    )
    pack = sc.compile()
    assert pack.tri_sc.shape[0] == 8
    # padding rows really carry nr2 = 0
    assert np.asarray(pack.tri_sc)[3:, 12].max() == 0.0
    img, stats = render_mega(
        pack, cam, spp=4, seed=0, max_bounces=3, interpret=True, regen=regen
    )
    assert np.array_equal(img, np.zeros_like(img))
    # Every camera sample must miss: exactly 1 primary ray per sample and
    # zero shadow/bounce rays. A phantom hit would add n_dir_sample rays.
    assert stats["rays"] == 8 * 8 * 3 * 4


def test_cluster_tables_invariants():
    """Every real triangle appears exactly once across cluster tiles; node
    rows round-trip; leaf tile ranges stay in bounds (kernels/cluster.py)."""
    from mcpt_tpu.builtin_scenes import CORNELL_FLOOR, CORNELL_LIGHT, _mesh
    from mcpt_tpu.camera import Camera
    from mcpt_tpu.materials import make_light_material, standard_materials
    from mcpt_tpu.scene import Scene, TriangleMesh

    mats = standard_materials()
    sc = Scene(Camera())
    mesh = TriangleMesh.from_obj(
        "/root/reference/models/low_king.obj",
        mats["gold_conductor"],
        translation=(278, 80, 100),
        zoom=60.0,
    )
    sc.add(mesh)
    sc.add(_mesh(CORNELL_FLOOR, mats["rough_white_conductor"], "walls"))
    sc.add(_mesh(CORNELL_LIGHT, make_light_material(3.9), "light"))
    pack = sc.compile()
    assert pack.n_cl_nodes > 0
    # 12-nodes-per-row, 10-col packed layout with premultiplied links
    # (kernels/cluster.py build_cluster_tables)
    raw = np.asarray(pack.cl_nodes)
    idx = np.arange(pack.n_cl_nodes)
    r_i, c_i = idx // 12, (idx % 12) * 10

    def col(k):
        return raw[r_i, c_i + k]

    def dec(enc):
        e = enc.astype(np.int64)
        return np.where(e < 0, -1, (e >> 7) * 12 + (e & 127) // 10)

    # leaf-row-group tri layout: `groups` blocks of (8, tpg*16) per leaf,
    # tile j's attr a at lane j*16+a (cluster.ClusterTables docstring)
    tris = np.asarray(pack.cl_tris)
    tpg = tris.shape[1] // 16
    groups = pack.cl_groups
    n_groups = tris.shape[0] // 8

    # valid slots across all tile columns == real (unpadded) triangle count
    n_real = int(np.asarray(pack.tri_valid).sum())
    n_valid = sum(
        int((tris[:, j * 16 + 13] > 0.5).sum()) for j in range(tpg)
    )
    assert n_valid == n_real

    # each leaf's [gbase, gbase+groups) in bounds; union covers all groups
    covered = np.zeros(n_groups, bool)
    for n in range(pack.n_cl_nodes):
        k = int(col(8)[n])
        if k > 0:
            b = int(col(9)[n])
            assert 0 <= b and b + groups <= n_groups
            assert not covered[b : b + groups].any()  # exclusive
            covered[b : b + groups] = True
    assert covered.all()

    # links decode to in-range ordinals; miss chains terminate at -1, and
    # every interior node's hit link is its DFS successor
    miss = dec(col(6))
    assert (miss < pack.n_cl_nodes).all() and (miss >= -1).all()
    hitl = dec(col(7))
    interior = col(8) == 0
    assert (hitl[interior & (idx + 1 < pack.n_cl_nodes)] >= 0).all()
    nxt = hitl[interior]
    exp = np.where(idx[interior] + 1 < pack.n_cl_nodes, idx[interior] + 1, -1)
    assert (nxt == exp).all()

    # normals derivable from Woop rows match tri_shade on valid rows
    for j in range(tpg):
        c = j * 16
        w2 = tris[:, c + 6 : c + 9]
        nr2 = tris[:, c + 12 : c + 13]
        n_derived = w2 * np.sqrt(np.maximum(nr2, 0.0))
        lens = np.linalg.norm(n_derived[tris[:, c + 13] > 0.5], axis=1)
        assert np.allclose(lens, 1.0, atol=1e-4)


def test_mega_clustered_matches_dense(tmp_path):
    """Mid-size scene (2.4k tris) through the clustered megakernel path vs
    the dense wavefront path — means agree within Monte-Carlo noise."""
    import dataclasses

    from mcpt_tpu.builtin_scenes import CORNELL_FLOOR, CORNELL_LIGHT, _mesh
    from mcpt_tpu.camera import Camera
    from mcpt_tpu.materials import make_light_material, standard_materials
    from mcpt_tpu.scene import Scene, TriangleMesh

    mats = standard_materials()
    cam = Camera(
        width=W, height=H, fov=40,
        position=(278, 273, -800), target=(278, 273, 0), up=(0, 1, 0),
    )
    sc = Scene(cam)
    sc.add(
        TriangleMesh.from_obj(
            "/root/reference/models/low_king.obj",
            mats["gold_conductor"],
            translation=(278, 80, 100),
            zoom=60.0,
        )
    )
    sc.add(_mesh(CORNELL_FLOOR, mats["rough_white_conductor"], "walls"))
    sc.add(_mesh(CORNELL_LIGHT, make_light_material(3.9), "light"))
    pack = sc.compile()
    assert pack.n_cl_nodes > 0 and mega_supported(pack)
    img, _ = render_mega(
        pack, cam, spp=8, seed=0, max_bounces=3, interpret=True
    )
    ref, _ = render_radiance(
        pack, cam, 16, method="dense", max_bounces=3, tile_pixels=W * H
    )
    assert np.isfinite(img).all()
    assert abs(img.mean() - ref.mean()) / max(ref.mean(), 1e-6) < 0.3


def test_mega_stream_split_equivalent(monkeypatch):
    """Sample-stream splitting (MCPT_MEGA_STREAMS): each pixel's sample
    budget spreads over S lanes (lane stream q renders samples ≡ q mod S),
    shrinking a chunk's pixel footprint S-fold for the clustered walks.
    The RNG keys on the ACTUAL (pixel, sample) ids, so the sample SET —
    and the traced-ray count — is identical; the image matches the
    unsplit render except on ULP-tied nearest-hit ties, where the
    regrouped chunks visit leaves in a different order and the winner
    select may pick the other co-incident triangle (same class the
    clustered-vs-SMEM comparison tolerates)."""
    import dataclasses

    sc = demo_scene()
    pack = sc.compile(cluster_threshold=8)
    cam = dataclasses.replace(sc.camera, width=33, height=21)

    monkeypatch.setenv("MCPT_MEGA_STREAMS", "1")
    img1, st1 = render_mega(
        pack, cam, spp=4, seed=5, max_bounces=3, interpret=True
    )
    monkeypatch.setenv("MCPT_MEGA_STREAMS", "4")
    img4, st4 = render_mega(
        pack, cam, spp=4, seed=5, max_bounces=3, interpret=True
    )
    diff = np.abs(img1 - img4)
    assert float((diff.max(-1) > 1e-3).mean()) < 0.01
    assert abs(float(img1.mean() - img4.mean())) < 5e-3
    assert st1["rays"] == st4["rays"]


def test_mega_clustered_merged_walk_bitwise(monkeypatch):
    """The clustered regen kernel fuses the NEE fan + next-ray nearest hit
    into ONE tree walk (cluster.cluster_fan_and_near). Per-(ray, primitive)
    arithmetic is verbatim from the two standalone walks, every leaf
    predicate is exact, and DFS visit order is preserved — so over-visits
    from the union descent only add losing candidates and the output must
    be BITWISE equal to the two-walk schedule (MCPT_MEGA_ABLATE=unmerged),
    not merely statistically close."""
    sc = demo_scene()
    pack = sc.compile(cluster_threshold=8)
    assert pack.n_cl_nodes > 0
    cam = dataclasses.replace(sc.camera, width=33, height=21)

    monkeypatch.setenv("MCPT_MEGA_ABLATE", "unmerged")
    img_u, st_u = render_mega(
        pack, cam, spp=4, seed=7, max_bounces=4, interpret=True
    )
    monkeypatch.delenv("MCPT_MEGA_ABLATE")
    img_m, st_m = render_mega(
        pack, cam, spp=4, seed=7, max_bounces=4, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(img_m), np.asarray(img_u))
    assert st_m["rays"] == st_u["rays"]


def test_mega_clustered_nsplit_equivalent(monkeypatch):
    """Clustered in-lane interleave (MCPT_MEGA_SPLIT=2 on a clustered
    scene): slot k renders samples k + v*2 through its own paired
    fan+nearest walk; draws key on the actual sample id, so the sample SET
    is identical to the single-slot kernel and the image matches except
    per-lane f32 accumulation order."""
    sc = demo_scene()
    pack = sc.compile(cluster_threshold=8)
    assert pack.n_cl_nodes > 0
    cam = dataclasses.replace(sc.camera, width=33, height=21)

    monkeypatch.setenv("MCPT_MEGA_SPLIT", "1")
    img1, st1 = render_mega(
        pack, cam, spp=4, seed=9, max_bounces=4, interpret=True
    )
    monkeypatch.setenv("MCPT_MEGA_SPLIT", "2")
    img2, st2 = render_mega(
        pack, cam, spp=4, seed=9, max_bounces=4, interpret=True
    )
    diff = np.abs(np.asarray(img1) - np.asarray(img2))
    assert float((diff.max(-1) > 1e-3).mean()) < 0.01, diff.max()
    assert abs(float(img1.mean() - img2.mean())) < 5e-3
    assert st1["rays"] == st2["rays"]
