"""Config loader: reference key semantics incl. documented quirks
(main.cpp:147-294; SURVEY.md §5)."""

import numpy as np
import pytest

from mcpt_tpu.config import _is_v3, build_scene

pytestmark = pytest.mark.skipif(
    not __import__("os").path.exists("/root/reference/models/low_king.obj"),
    reason="reference model assets absent",
)

MODELS = "/root/reference/models"


def _base_conf(**scene):
    return {
        "camera": {"width": 64, "height": 48, "fov": 70,
                   "position": [278, 150, -2550], "target": [278, 0, 0]},
        "renderer": {"spp": 7, "output": "x.png"},
        "scene": scene,
    }


def test_is_v3():
    assert _is_v3([1, 2, 3])
    assert _is_v3([1.0, 2, 3.5])
    assert not _is_v3([1, 2])
    assert not _is_v3([1, 2, "a"])
    assert not _is_v3([True, 1, 2])
    assert not _is_v3("abc")


def test_camera_and_renderer_keys():
    sc, opts = build_scene(_base_conf(), models_dir=MODELS)
    assert (sc.camera.width, sc.camera.height, sc.camera.fov) == (64, 48, 70.0)
    assert sc.camera.position == (278.0, 150.0, -2550.0)
    assert opts == {"spp": 7, "output": "x.png"}


def test_quirk_adddiamond_false_still_adds():
    sc, _ = build_scene(_base_conf(addDiamond=False), models_dir=MODELS)
    assert any(m.name == "diamond" for m in sc.meshes)  # main.cpp:197-199
    sc2, _ = build_scene(
        _base_conf(addDiamond=False), models_dir=MODELS, strict_parity=False
    )
    assert not any(m.name == "diamond" for m in sc2.meshes)


def test_quirk_renderer_path_ignored():
    conf = _base_conf()
    del conf["renderer"]["output"]
    conf["renderer"]["path"] = "y.png"
    _, opts = build_scene(conf, models_dir=MODELS)
    assert opts["output"] == "./output.png"  # default; path never read
    _, opts2 = build_scene(conf, models_dir=MODELS, strict_parity=False)
    assert opts2["output"] == "y.png"


def test_quirk_direct_light_sample():
    sc, _ = build_scene(_base_conf(directLightSample=32), models_dir=MODELS)
    assert sc.n_dir_sample == 4  # Scene.hpp:28; setter never called
    sc2, _ = build_scene(
        _base_conf(directLightSample=32), models_dir=MODELS, strict_parity=False
    )
    assert sc2.n_dir_sample == 32


def test_quirk_light_brightness_float_gate():
    sc, _ = build_scene(_base_conf(lightBrightness=100), models_dir=MODELS)
    # int 100 rejected by is_number_float (main.cpp:279) -> default scale 1.
    light = next(m for m in sc.meshes if m.material.has_emission)
    assert max(light.material.emission) < 60
    sc2, _ = build_scene(_base_conf(lightBrightness=100.0), models_dir=MODELS)
    light2 = next(m for m in sc2.meshes if m.material.has_emission)
    assert max(light2.material.emission) > 1000


def test_soldier_grid_and_materials():
    sc, _ = build_scene(
        _base_conf(
            soldierLeftRowPosition=[-559, 0, -200],
            soldierRightRowPosition=[160, 0, -200],
            soldierXSpacing=0.0,
            soldierYSpacing=0.0,
            soldierZSpacing=-356.0,
            soldierCountPerRow=2,
            soldierMaterials=["smooth_glass", "smooth_glass",
                              "rough_white_conductor", "rough_white_conductor"],
        ),
        models_dir=MODELS,
    )
    soldiers = [m for m in sc.meshes if m.name == "soldier"]
    assert len(soldiers) == 4
    # Left soldiers at x=-559 with z stepped by -356.
    zs = sorted(
        float(m.positions[..., 2].mean()) for m in soldiers
    )
    assert zs[0] < zs[-1]
    names = {m.material.name for m in soldiers}
    assert names == {"smooth_glass", "rough_white_conductor"}


def test_env_color_fallback_and_rr():
    sc, _ = build_scene(
        _base_conf(envMap=[0.2, 0.3, 0.4], RussianRouletteRate=0.4,
                   includeShadow=False),
        models_dir=MODELS,
    )
    np.testing.assert_allclose(sc.background, [0.2, 0.3, 0.4])
    assert sc.rr_rate == pytest.approx(0.4)
    assert sc.enable_shadow is False


def test_rr_clamped_to_099():
    sc, _ = build_scene(_base_conf(RussianRouletteRate=1.5), models_dir=MODELS)
    assert sc.rr_rate == pytest.approx(0.99)  # Scene.hpp:110-113


def test_backwall_not_added():
    sc, _ = build_scene(_base_conf(), models_dir=MODELS)
    assert not any(m.name == "backwall" for m in sc.meshes)  # main.cpp:312
