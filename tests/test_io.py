"""PNG codec and OBJ loader tests (capability parity with vendored lodepng /
OBJ_Loader; SURVEY.md §2 items 19-21)."""

import os

import numpy as np
import pytest

from mcpt_tpu.io.obj import load_obj
from mcpt_tpu.io.png import read_png, write_png


def test_png_roundtrip_rgb(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (37, 53, 3), dtype=np.uint8)
    p = tmp_path / "rgb.png"
    write_png(p, img)
    out = read_png(p)
    np.testing.assert_array_equal(out, img)


def test_png_roundtrip_rgba_and_gray(tmp_path):
    rng = np.random.default_rng(1)
    rgba = rng.integers(0, 256, (16, 9, 4), dtype=np.uint8)
    gray = rng.integers(0, 256, (8, 8), dtype=np.uint8)
    pa, pg = tmp_path / "a.png", tmp_path / "g.png"
    write_png(pa, rgba)
    write_png(pg, gray)
    np.testing.assert_array_equal(read_png(pa), rgba)
    np.testing.assert_array_equal(read_png(pg)[:, :, 0], gray)


@pytest.mark.skipif(
    not os.path.exists("/root/reference/cornellbox_demo.png"),
    reason="reference mount absent",
)
def test_png_decode_real_file():
    img = read_png("/root/reference/cornellbox_demo.png")
    assert img.shape[0] == 384 and img.shape[1] == 384
    assert img[:, :, :3].mean() > 10  # not all black


def test_obj_quads_and_formats(tmp_path):
    obj = tmp_path / "m.obj"
    obj.write_text(
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "vt 0 0\nvt 1 0\nvt 1 1\nvt 0 1\n"
        "vn 0 0 1\n"
        "f 1/1/1 2/2/1 3/3/1 4/4/1\n"  # quad -> 2 triangles (fan)
        "f -4//-1 -3//-1 -2//-1\n"  # negative indices, no texcoords
    )
    m = load_obj(obj)
    assert m["positions"].shape == (3, 3, 3)
    np.testing.assert_allclose(m["positions"][0, 2], [1, 1, 0])
    np.testing.assert_allclose(m["positions"][1], [[0, 0, 0], [1, 1, 0], [0, 1, 0]])
    np.testing.assert_allclose(m["texcoords"][0, 1], [1, 0])
    np.testing.assert_allclose(m["texcoords"][2], 0)  # absent vt -> zeros
    np.testing.assert_allclose(m["normals"][2, 0], [0, 0, 1])


@pytest.mark.skipif(
    not os.path.exists("/root/reference/models/low_king.obj"),
    reason="reference mount absent",
)
def test_obj_real_mesh():
    m = load_obj("/root/reference/models/low_king.obj")
    # SURVEY.md §2 item 18: low_king has 2,312 triangles.
    assert m["positions"].shape[0] == 2312
