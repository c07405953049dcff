"""Scene compiler: pack invariants, Woop transforms, material dedup,
emitter tables."""

import numpy as np

from mcpt_tpu.builtin_scenes import demo_scene
from mcpt_tpu.materials import Material, MaterialType, standard_materials


def test_pack_shapes_and_padding():
    pack = demo_scene().compile()
    t = pack.tri_v0.shape[0]
    assert t % 64 == 0
    assert int(np.asarray(pack.tri_valid).sum()) == 32  # 3+1+1 quads *2 + boxes 5*2*2
    assert pack.n_spheres == 3
    assert pack.n_emitters == 2  # light quad = 2 triangles


def test_woop_transform_maps_vertices_to_unit_corners():
    pack = demo_scene().compile()
    v0 = np.asarray(pack.tri_v0)
    e1 = np.asarray(pack.tri_e1)
    e2 = np.asarray(pack.tri_e2)
    w = np.asarray(pack.tri_w)
    c = np.asarray(pack.tri_c)
    valid = np.asarray(pack.tri_valid)
    for i in np.nonzero(valid)[0][:8]:
        # W(v0) - c = 0 ; W(v0+e1) - c = (1,0,0) ; W(v0+e2) - c = (0,1,0)
        np.testing.assert_allclose(w[i] @ v0[i] - c[i], 0, atol=1e-4)
        np.testing.assert_allclose(w[i] @ (v0[i] + e1[i]) - c[i], [1, 0, 0], atol=1e-3)
        np.testing.assert_allclose(w[i] @ (v0[i] + e2[i]) - c[i], [0, 1, 0], atol=1e-3)


def test_material_table_dedup_and_defaults():
    pack = demo_scene().compile()
    # 8 shared materials + light = 9 rows (green_mirror etc. deduped by id).
    assert pack.mat_type.shape[0] == 9
    em = np.asarray(pack.mat_emissive)
    assert em.sum() == 1  # only the light emits


def test_material_defaults_match_reference():
    m = Material(MaterialType.ROUGH_CONDUCTOR)
    assert (m.ior_a, m.ior_b, m.roughness) == (1.74, 0.1, 1.0)
    md = Material(MaterialType.ROUGH_DIELECTRIC)
    assert md.roughness == 0.2  # Material.hpp:253-255
    assert Material(MaterialType.SMOOTH_CONDUCTOR).is_dirac
    assert not Material(MaterialType.ROUGH_DIELECTRIC).is_dirac


def test_standard_material_library():
    mats = standard_materials()
    assert len(mats) == 9
    assert mats["gold_conductor"].mtype == MaterialType.SMOOTH_CONDUCTOR
    assert mats["smooth_glass"].ior_a == 1.7
    assert mats["rough_plastic"].roughness == 0.4
    assert not mats["rough_plastic"].has_emission


def test_emitter_tables():
    pack = demo_scene().compile()
    emt_tri = np.asarray(pack.emt_tri)[: pack.n_emitters]
    tri_mat = np.asarray(pack.tri_mat)
    em = np.asarray(pack.mat_emissive)
    assert em[tri_mat[emt_tri]].all()
    # Light quad is 130x105 (cornell light): area = 13650.
    np.testing.assert_allclose(float(pack.emit_total_area), 13650.0, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(pack.emt_mesh_area)[: pack.n_emitters], 13650.0, rtol=1e-4
    )
