"""Scene description and the scene→flat-device-buffer compiler.

Host side: `TriangleMesh` / `Sphere` / `Scene` mirror the capability of the
reference's object graph (`src/Triangle.hpp:83-135` mesh loading with
``zoom*v + translation``, `src/Sphere.hpp`, `src/Scene.hpp:24-152` container
with emitter split, RR rate, shadow toggle, NEE sample count, env map).

Device side: `Scene.compile()` produces a `ScenePack` — one flat
struct-of-arrays pytree holding every triangle, sphere, material row, emitter
record, BVH node and the environment map. No objects, no pointers; primitive
``i`` is a row. Triangles additionally carry a precomputed world-to-unit-
triangle ("Woop") affine transform so that batched ray-triangle intersection
becomes two matmuls (see intersect.py) that run on the MXU.
"""

from dataclasses import dataclass, field
from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import struct

from mcpt_tpu.bvh import build_bvh
from mcpt_tpu.camera import Camera
from mcpt_tpu.constants import EPSILON
from mcpt_tpu.io.obj import load_obj
from mcpt_tpu.io.png import read_png
from mcpt_tpu.materials import Material


# ---------------------------------------------------------------------------
# Host-side scene objects
# ---------------------------------------------------------------------------


@dataclass
class TriangleMesh:
    """An OBJ mesh instance: world pos = zoom * v + translation
    (reference: Triangle.hpp:106). Flat per-face normals e1×e2
    (Triangle.hpp:50-56); texcoords kept only if the material is textured
    (Triangle.hpp:115-122)."""

    positions: np.ndarray  # (F, 3, 3) world-space triangle vertices
    texcoords: np.ndarray  # (F, 3, 2)
    material: Material = field(default_factory=Material)
    name: str = ""

    @classmethod
    def from_obj(
        cls,
        path,
        material: Optional[Material] = None,
        translation=(0.0, 0.0, 0.0),
        zoom: float = 1.0,
        name: str = "",
    ) -> "TriangleMesh":
        from mcpt_tpu.native.native import obj_load_native

        mesh = obj_load_native(path)
        if mesh is None:
            mesh = load_obj(path)
        material = material if material is not None else Material()
        pos = mesh["positions"] * np.float32(zoom) + np.asarray(
            translation, dtype=np.float32
        )
        tc = (
            mesh["texcoords"]
            if material.textured
            else np.zeros_like(mesh["texcoords"])
        )
        return cls(positions=pos, texcoords=tc, material=material, name=name or str(path))

    @property
    def areas(self) -> np.ndarray:
        e1 = self.positions[:, 1] - self.positions[:, 0]
        e2 = self.positions[:, 2] - self.positions[:, 0]
        return 0.5 * np.linalg.norm(np.cross(e1, e2), axis=-1)

    @property
    def area(self) -> float:
        return float(self.areas.sum())

    @property
    def has_emit(self) -> bool:
        return self.material.has_emission


@dataclass
class Sphere:
    """Analytic sphere (reference: src/Sphere.hpp)."""

    center: tuple
    radius: float
    material: Material = field(default_factory=Material)
    name: str = ""

    @property
    def area(self) -> float:
        return float(4.0 * np.pi * self.radius * self.radius)

    @property
    def has_emit(self) -> bool:
        return self.material.has_emission


# ---------------------------------------------------------------------------
# Device-side flat scene
# ---------------------------------------------------------------------------


@struct.dataclass
class ScenePack:
    """Flat device representation of a scene. All arrays jnp, float32/int32.

    Triangles (T = padded triangle count):
      tri_v0/e1/e2/n: geometry; tri_w: (T,3,3) rows of the inverse of the
      matrix [e1|e2|nraw] (Woop transform); tri_c = tri_w @ v0; tri_nr2 =
      |e1×e2|² so the reference's Möller-Trumbore det-epsilon miss test
      (Triangle.hpp:228) can be reproduced exactly from d'_z.
    """

    # triangles
    tri_v0: jnp.ndarray  # (T, 3)
    tri_e1: jnp.ndarray  # (T, 3)
    tri_e2: jnp.ndarray  # (T, 3)
    tri_n: jnp.ndarray  # (T, 3) unit geometric normal
    tri_w: jnp.ndarray  # (T, 3, 3)
    tri_c: jnp.ndarray  # (T, 3)
    tri_nr2: jnp.ndarray  # (T,) |e1 x e2|^2
    tri_uv: jnp.ndarray  # (T, 3, 2) texcoords t0,t1,t2
    tri_mat: jnp.ndarray  # (T,) int32
    tri_valid: jnp.ndarray  # (T,) bool (False on padding rows)
    # spheres
    sph_c: jnp.ndarray  # (S, 3)
    sph_r: jnp.ndarray  # (S,)
    sph_mat: jnp.ndarray  # (S,) int32
    # material table
    mat_type: jnp.ndarray  # (M,) int32 (MaterialType)
    mat_ior_a: jnp.ndarray  # (M,)
    mat_ior_b: jnp.ndarray  # (M,)
    mat_rough: jnp.ndarray  # (M,)
    mat_refl: jnp.ndarray  # (M, 3)
    mat_emission: jnp.ndarray  # (M, 3)
    mat_textured: jnp.ndarray  # (M,) bool
    mat_emissive: jnp.ndarray  # (M,) bool
    mat_dirac: jnp.ndarray  # (M,) bool
    # emitter sampling (mesh-light triangles, grouped by owning mesh)
    emt_tri: jnp.ndarray  # (E,) int32 triangle index
    emt_mesh: jnp.ndarray  # (E,) int32 owning emitter-mesh ordinal
    emt_intra_cum: jnp.ndarray  # (E,) inclusive cumulative area within mesh
    emt_mesh_area: jnp.ndarray  # (E,) total area of the owning mesh
    lmesh_cum: jnp.ndarray  # (L,) inclusive cumulative mesh areas
    emit_total_area: jnp.ndarray  # () scalar
    # Fused shading tables (single one-hot MXU gather per lookup; layouts
    # documented in _build_fat_tables). Derived from the arrays above.
    mat_fat: jnp.ndarray  # (M, 13)
    tri_shade: jnp.ndarray  # (T, 11)
    sph_shade: jnp.ndarray  # (S, 5)
    prim_emissive: jnp.ndarray  # (T + S, 1) float 0/1
    emt_fat: jnp.ndarray  # (E, 17): tri v0/e1/e2/n | sph c/(r,0,0), emit, 1/area, is_sph
    # Pallas kernel layout: triangles along the lane (last) axis.
    # Rows: 9 Woop matrix entries (row-major), c0..c2, nr2, valid; padded to 16.
    tri_kern: jnp.ndarray  # (16, T)
    # Traversal gather tables: one fat row per BVH node
    # [min(3), max(3), miss, leaf_count, prim_0..prim_{L-1}] (prims -1-padded,
    # interior nodes have leaf_count 0), and Möller-Trumbore triangle rows
    # [v0(3), e1(3), e2(3)] + sphere rows [c(3), r]. One gather per node
    # visit / per leaf slot instead of 5-6 (TPU gathers dominate traversal).
    bvh_fat: jnp.ndarray  # (N, 8 + L)
    tri_mt: jnp.ndarray  # (T, 9)
    sph_geom: jnp.ndarray  # (S, 4)
    # Scalar-constant Pallas kernel table: same columns as tri_kern rows
    # (w00..w22, c0..c2, nr2, valid, pad, pad) but triangle-major and padded
    # only to a multiple of 8 — the kernel loops over triangles as SMEM
    # scalars, so padding to the 128-lane tile would waste 3.5x work on
    # small scenes.
    tri_sc: jnp.ndarray  # (T8, 16)
    # Occluder-only subset of tri_sc rows for the NEE shadow fan (statically
    # culled boundary geometry removed; see compile()); dummy for clustered
    # scenes, which occlude through the BVH.
    tri_occ_sc: jnp.ndarray  # (T8o, 16)
    # environment
    env_pixels: jnp.ndarray  # (H, W, 3) float32; (1,1,3) dummy when unused
    background: jnp.ndarray  # (3,)
    # integrator parameters (traced)
    rr_rate: jnp.ndarray  # () float32
    inv_rr: jnp.ndarray  # () float32
    # static structure
    n_tris: int = struct.field(pytree_node=False, default=0)
    n_spheres: int = struct.field(pytree_node=False, default=0)
    n_emitters: int = struct.field(pytree_node=False, default=0)
    n_sph_emitters: int = struct.field(pytree_node=False, default=0)
    use_env: bool = struct.field(pytree_node=False, default=False)
    enable_shadow: bool = struct.field(pytree_node=False, default=True)
    n_dir_sample: int = struct.field(pytree_node=False, default=4)
    # flattened BVH (threaded layout; see bvh.py)
    bvh_min: jnp.ndarray = None
    bvh_max: jnp.ndarray = None
    bvh_miss: jnp.ndarray = None
    bvh_leaf_start: jnp.ndarray = None
    bvh_leaf_count: jnp.ndarray = None
    bvh_prims: jnp.ndarray = None
    bvh_leaf_size: int = struct.field(pytree_node=False, default=4)
    # clustered-BVH megakernel tables (kernels/cluster.py); None for small
    # scenes that brute-force from SMEM
    cl_nodes: jnp.ndarray = None  # (R, 128) SMEM node rows
    # leaf-row-group layout (kernels/cluster.py ClusterTables): `cl_groups`
    # blocks of (8, tpg*16) per leaf, tpg = cl_tris.shape[1] // 16
    cl_tris: jnp.ndarray = None  # (n_leaves*cl_groups*8, tpg*16) VMEM
    cl_uv: jnp.ndarray = None  # (n_leaves*cl_groups*8, tpg*8) (dummy if untextured)
    n_cl_nodes: int = struct.field(pytree_node=False, default=0)
    cl_groups: int = struct.field(pytree_node=False, default=1)


def _round_up(x: int, m: int) -> int:
    return ((max(x, 1) + m - 1) // m) * m


class Scene:
    """Host-side scene container (reference: Scene.hpp:24-152).

    Defaults: rr_rate=0.7, n_dir_sample=4, enable_shadow=True
    (Scene.hpp:25-28). `add` splits emitters by material emission like
    Scene::Add (Scene.hpp:104-109).
    """

    def __init__(self, camera: Optional[Camera] = None):
        self.camera = camera if camera is not None else Camera()
        self.meshes: list[TriangleMesh] = []
        self.spheres: list[Sphere] = []
        self.rr_rate = 0.7
        self.enable_shadow = True
        self.n_dir_sample = 4
        self.background = np.zeros(3, dtype=np.float32)
        self.env_pixels: Optional[np.ndarray] = None  # (H, W, 3) float in [0,1]

    def add(self, obj) -> None:
        if isinstance(obj, TriangleMesh):
            self.meshes.append(obj)
        elif isinstance(obj, Sphere):
            self.spheres.append(obj)
        else:
            raise TypeError(f"cannot add {type(obj)!r} to scene")

    def set_rr_rate(self, rr: float) -> None:
        # min(rr, 0.99) like Scene::setRrRate (Scene.hpp:110-113).
        self.rr_rate = min(float(rr), 0.99)

    def load_env_map(self, path) -> None:
        """Equirect PNG → float RGB in [0,1] (Scene.hpp:39-57)."""
        img = read_png(path)
        if img.shape[2] == 1:
            img = np.repeat(img, 3, axis=2)
        self.env_pixels = img[:, :, :3].astype(np.float32) / 255.0

    def set_background(self, color) -> None:
        self.background = np.asarray(color, dtype=np.float32)

    # -- compilation -------------------------------------------------------

    def compile(
        self,
        bvh_leaf_size: int = 4,
        bvh_method: str = "sah",
        tri_pad: int = 128,
        cluster_threshold: int = 1024,
    ) -> ScenePack:
        # Material table: dedupe by object identity.
        mats: list[Material] = []
        mat_index: dict[int, int] = {}
        for obj in [*self.meshes, *self.spheres]:
            if id(obj.material) not in mat_index:
                mat_index[id(obj.material)] = len(mats)
                mats.append(obj.material)
        if not mats:
            mats = [Material()]

        # Triangles: concatenate all meshes.
        pos_list, uv_list, mid_list = [], [], []
        # Emitter bookkeeping: (mesh ordinal, tri global idx, area).
        emt_tri, emt_mesh, emt_area, emt_mesh_area, lmesh_areas = [], [], [], [], []
        tri_cursor = 0
        for mesh in self.meshes:
            f = mesh.positions.shape[0]
            pos_list.append(mesh.positions.astype(np.float32))
            uv_list.append(mesh.texcoords.astype(np.float32))
            mid_list.append(
                np.full(f, mat_index[id(mesh.material)], dtype=np.int32)
            )
            if mesh.has_emit:
                ordinal = len(lmesh_areas)
                areas = mesh.areas.astype(np.float64)
                lmesh_areas.append(float(areas.sum()))
                emt_tri.extend(range(tri_cursor, tri_cursor + f))
                emt_mesh.extend([ordinal] * f)
                emt_area.extend(areas.tolist())
                emt_mesh_area.extend([float(areas.sum())] * f)
            tri_cursor += f
        # Emissive spheres: each is its own "light mesh" (one emitter row)
        # with area 4πr² (Sphere.hpp:24 area member). Sampling is uniform
        # over the sphere surface with pdf 1/area — the reference's
        # Sphere::Sample (Sphere.hpp:64-74) draws (θ, φ) uniformly, which
        # clusters samples at the poles while still reporting the uniform
        # pdf; since no reference scene ever instantiates an emissive
        # sphere (main.cpp:303-309) there is no golden to match, so the
        # correct uniform-area sampler is used (see PARITY.md).
        sph_emit_rows = []  # (sphere index, light-mesh ordinal, area)
        for si, sph in enumerate(self.spheres):
            if sph.has_emit:
                sph_emit_rows.append((si, len(lmesh_areas), sph.area))
                lmesh_areas.append(sph.area)

        n_tris = tri_cursor
        t_pad = _round_up(n_tris, tri_pad)
        pos = (
            np.concatenate(pos_list, axis=0)
            if pos_list
            else np.zeros((0, 3, 3), np.float32)
        )
        uv = (
            np.concatenate(uv_list, axis=0)
            if uv_list
            else np.zeros((0, 3, 2), np.float32)
        )
        mid = np.concatenate(mid_list) if mid_list else np.zeros(0, np.int32)

        v0 = np.zeros((t_pad, 3), np.float32)
        e1 = np.zeros((t_pad, 3), np.float32)
        e2 = np.zeros((t_pad, 3), np.float32)
        e2[:, 1] = 1.0  # make padding rows' [e1|e2|n] trivially non-singular
        e1[:, 0] = 1.0
        uvs = np.zeros((t_pad, 3, 2), np.float32)
        tmat = np.zeros(t_pad, np.int32)
        valid = np.zeros(t_pad, bool)
        if n_tris:
            v0[:n_tris] = pos[:, 0]
            e1[:n_tris] = pos[:, 1] - pos[:, 0]
            e2[:n_tris] = pos[:, 2] - pos[:, 0]
            uvs[:n_tris] = uv
            tmat[:n_tris] = mid
            valid[:n_tris] = True

        nraw = np.cross(e1, e2)
        nr2 = np.sum(nraw * nraw, axis=-1)
        nlen = np.sqrt(np.maximum(nr2, 1e-30))
        n_unit = nraw / nlen[:, None]
        # Degenerate (zero-area) real triangles can't be hit; invalidate them
        # so the singular matrix below never sees them.
        degenerate = nr2 < 1e-24
        valid &= ~degenerate
        basis = np.stack([e1, e2, nraw], axis=-1)  # (T,3,3) columns
        basis[degenerate] = np.eye(3, dtype=np.float32)
        w = np.linalg.inv(basis.astype(np.float64)).astype(np.float32)
        c = np.einsum("tij,tj->ti", w, v0).astype(np.float32)

        # Spheres.
        n_spheres = len(self.spheres)
        s_pad = max(n_spheres, 1)
        sph_c = np.zeros((s_pad, 3), np.float32)
        sph_r = np.zeros(s_pad, np.float32)  # radius 0 ⇒ unhittable padding
        sph_mat = np.zeros(s_pad, np.int32)
        for i, s in enumerate(self.spheres):
            sph_c[i] = np.asarray(s.center, np.float32)
            sph_r[i] = np.float32(s.radius)
            sph_mat[i] = mat_index[id(s.material)]

        # Material table arrays.
        m = len(mats)
        mat_type = np.array([int(x.mtype) for x in mats], np.int32)
        mat_ior_a = np.array([x.ior_a for x in mats], np.float32)
        mat_ior_b = np.array([x.ior_b for x in mats], np.float32)
        mat_rough = np.array([x.roughness for x in mats], np.float32)
        mat_refl = np.array([x.base_reflectance for x in mats], np.float32)
        mat_emission = np.array([x.emission for x in mats], np.float32)
        mat_textured = np.array([x.textured for x in mats], bool)
        mat_emissive = np.array([x.has_emission for x in mats], bool)
        mat_dirac = np.array([x.is_dirac for x in mats], bool)

        # Emitters. Intra-mesh inclusive cumulative areas reproduce the
        # reference's BVH-area-descent light pick with its sqrt(u) warp
        # (BVH.cpp:118-135); pdf is 1/mesh_area (BVH.cpp:122-135 net effect).
        n_tri_emitters = len(emt_tri)
        n_emitters = n_tri_emitters + len(sph_emit_rows)
        e_pad = max(n_emitters, 1)
        a_emt_tri = np.zeros(e_pad, np.int32)
        a_emt_mesh = np.full(e_pad, -1, np.int32)
        a_intra = np.zeros(e_pad, np.float32)
        a_mesh_area = np.ones(e_pad, np.float32)
        if n_tri_emitters:
            a_emt_tri[:n_tri_emitters] = emt_tri
            a_emt_mesh[:n_tri_emitters] = emt_mesh
            intra = np.zeros(n_tri_emitters, np.float64)
            acc: dict[int, float] = {}
            for i in range(n_tri_emitters):
                k = emt_mesh[i]
                acc[k] = acc.get(k, 0.0) + emt_area[i]
                intra[i] = acc[k]
            a_intra[:n_tri_emitters] = intra.astype(np.float32)
            a_mesh_area[:n_tri_emitters] = np.asarray(emt_mesh_area, np.float32)
        for k, (si, ordinal, area) in enumerate(sph_emit_rows):
            r_i = n_tri_emitters + k
            a_emt_tri[r_i] = -1
            a_emt_mesh[r_i] = ordinal
            a_intra[r_i] = area  # single-row "mesh": inclusive cum = area
            a_mesh_area[r_i] = area
        l_pad = max(len(lmesh_areas), 1)
        a_lmesh_cum = np.zeros(l_pad, np.float32)
        if lmesh_areas:
            a_lmesh_cum[: len(lmesh_areas)] = np.cumsum(lmesh_areas)
        total_area = float(sum(lmesh_areas))

        # Environment map.
        if self.env_pixels is not None:
            env = self.env_pixels.astype(np.float32)
            use_env = True
        else:
            env = np.zeros((1, 1, 3), np.float32)
            use_env = False

        # Unified BVH over triangles + spheres (prim id >= t_pad ⇒ sphere).
        prim_min = np.concatenate(
            [
                np.minimum(np.minimum(v0, v0 + e1), v0 + e2)[:n_tris],
                sph_c[:n_spheres] - sph_r[:n_spheres, None],
            ]
        )
        prim_max = np.concatenate(
            [
                np.maximum(np.maximum(v0, v0 + e1), v0 + e2)[:n_tris],
                sph_c[:n_spheres] + sph_r[:n_spheres, None],
            ]
        )
        from mcpt_tpu.native.native import bvh_build_native

        flat = bvh_build_native(
            prim_min, prim_max, leaf_size=bvh_leaf_size, method=bvh_method
        )
        if flat is None:
            flat = build_bvh(
                prim_min, prim_max, leaf_size=bvh_leaf_size, method=bvh_method
            )
        # Remap prim ids: triangles stay, spheres shift to >= t_pad.
        prim_ids = flat.prim_ids.copy()
        prim_ids[prim_ids >= n_tris] += t_pad - n_tris
        p_pad = _round_up(prim_ids.shape[0], 8)
        a_prims = np.full(p_pad, -1, np.int32)
        a_prims[: prim_ids.shape[0]] = prim_ids

        # Fused shading tables.
        mat_fat = np.concatenate(
            [
                mat_type[:, None].astype(np.float32),
                mat_ior_a[:, None],
                mat_ior_b[:, None],
                mat_rough[:, None],
                mat_refl,
                mat_emission,
                mat_textured[:, None].astype(np.float32),
                mat_dirac[:, None].astype(np.float32),
                mat_emissive[:, None].astype(np.float32),
            ],
            axis=1,
        ).astype(np.float32)
        tri_emissive = mat_emissive[tmat] & valid
        tri_shade = np.concatenate(
            [
                n_unit.astype(np.float32),
                uvs.reshape(t_pad, 6),
                tmat[:, None].astype(np.float32),
                tri_emissive[:, None].astype(np.float32),
            ],
            axis=1,
        ).astype(np.float32)
        sph_emissive = mat_emissive[sph_mat] & (sph_r > 0)
        sph_shade = np.concatenate(
            [
                sph_c,
                sph_mat[:, None].astype(np.float32),
                sph_emissive[:, None].astype(np.float32),
            ],
            axis=1,
        ).astype(np.float32)
        prim_emissive = np.concatenate([tri_emissive, sph_emissive]).astype(
            np.float32
        )[:, None]
        # Fused emitter rows (17 cols). Triangle rows: v0, e1, e2, n,
        # emission, 1/mesh_area, 0. Sphere rows: center, (radius,0,0), 0,
        # 0, emission, 1/area, 1 — the samplers branch on col 16.
        emt_fat = np.zeros((e_pad, 17), np.float32)
        if n_tri_emitters:
            ti = a_emt_tri[:n_tri_emitters]
            emt_fat[:n_tri_emitters, 0:3] = v0[ti]
            emt_fat[:n_tri_emitters, 3:6] = e1[ti]
            emt_fat[:n_tri_emitters, 6:9] = e2[ti]
            emt_fat[:n_tri_emitters, 9:12] = n_unit[ti].astype(np.float32)
            emt_fat[:n_tri_emitters, 12:15] = mat_emission[tmat[ti]]
        for k, (si, ordinal, area) in enumerate(sph_emit_rows):
            r_i = n_tri_emitters + k
            emt_fat[r_i, 0:3] = sph_c[si]
            emt_fat[r_i, 3] = sph_r[si]
            emt_fat[r_i, 12:15] = mat_emission[sph_mat[si]]
            emt_fat[r_i, 16] = 1.0
        emt_fat[:, 15] = 1.0 / np.maximum(a_mesh_area, 1e-20)

        tri_kern = np.zeros((16, t_pad), np.float32)
        tri_kern[0:9] = w.reshape(t_pad, 9).T
        tri_kern[9:12] = c.T
        # nr2 is zeroed on padding/degenerate rows so every kernel's
        # |det| >= EPSILON test rejects them unconditionally (det = -dp2*nr2).
        # Kernels that fold all hit conditions into a min-chain and drop the
        # explicit valid-column check (megakernel._intersect_tile,
        # _occlude_shared_origin, intersect_pallas._tri_candidate) depend on
        # this invariant.
        tri_kern[12] = np.where(valid, nr2, 0.0).astype(np.float32)
        tri_kern[13] = valid.astype(np.float32)
        t8 = _round_up(n_tris, 8)
        tri_sc = np.ascontiguousarray(tri_kern[:, :t8].T)  # (T8, 16)

        # Static occluder cull for the megakernel's NEE shadow fan (small
        # scenes only — the fan brute-tests every primitive): a triangle can
        # never block a (path vertex -> light sample) segment if ALL
        # primitive surfaces lie on one side of its plane, because both
        # segment endpoints lie on primitives (path vertices on surfaces,
        # light samples on emitter triangles) and a segment with endpoints
        # on one side cannot cross the plane. In enclosed box scenes this
        # drops the boundary floor/walls/ceiling/light from the fan's hot
        # loop (~1/3 of its primitives). The reference has no analogue (its
        # BVH visits and rejects these per ray, BVH.cpp:95-116).
        if 0 < n_tris <= 1024:
            pts = pos.reshape(-1, 3).astype(np.float64)
            diag = float(np.linalg.norm(pts.max(0) - pts.min(0)))
            # The margin must dominate the kernel's scale-relative shadow
            # -origin offset max(EPSILON, REL_EPS*max|p|) (constants.REL_EPS)
            # or a small scene far from the origin could offset a shadow
            # origin past a culled boundary plane and leak light.
            from mcpt_tpu.constants import REL_EPS as _REL_EPS

            coord_max = float(np.abs(pts).max()) if pts.size else 0.0
            eps_o = max(
                1e-3, 1e-5 * diag, 4.0 * EPSILON, 2.0 * _REL_EPS * coord_max
            )
            nrm = n_unit[:n_tris].astype(np.float64)
            dpl = np.einsum("td,td->t", nrm, v0[:n_tris].astype(np.float64))
            s = pts @ nrm.T - dpl[None, :]  # (P, T) signed distances
            smin = s.min(axis=0)
            smax = s.max(axis=0)
            if n_spheres:
                scn = sph_c[:n_spheres].astype(np.float64) @ nrm.T - dpl[None, :]
                rr_ = sph_r[:n_spheres].astype(np.float64)[:, None]
                smin = np.minimum(smin, (scn - rr_).min(axis=0))
                smax = np.maximum(smax, (scn + rr_).max(axis=0))
            one_side = (smin >= -eps_o) | (smax <= eps_o)
            occ_valid = valid[:n_tris] & ~one_side
            occ_idx = np.nonzero(occ_valid)[0]
            t8o = _round_up(int(occ_idx.size), 8)
            tri_occ_sc = np.zeros((t8o, 16), np.float32)
            if occ_idx.size:
                tri_occ_sc[: occ_idx.size] = tri_kern[:, occ_idx].T
        else:
            # clustered scenes occlude through the BVH; ship a dummy
            tri_occ_sc = np.zeros((8, 16), np.float32)

        # Traversal gather tables (see ScenePack docstring).
        leaf_cap = max(int(flat.leaf_count.max()) if flat.leaf_count.size else 1, 1)
        n_nodes = flat.node_min.shape[0]
        bvh_fat = np.full((n_nodes, 8 + leaf_cap), -1.0, np.float32)
        bvh_fat[:, 0:3] = flat.node_min
        bvh_fat[:, 3:6] = flat.node_max
        bvh_fat[:, 6] = flat.node_miss
        bvh_fat[:, 7] = np.maximum(flat.leaf_count, 0)
        leaves_idx = np.nonzero(flat.leaf_start >= 0)[0]
        if leaves_idx.size and prim_ids.size:
            starts = flat.leaf_start[leaves_idx][:, None]
            counts = flat.leaf_count[leaves_idx][:, None]
            cols = np.arange(leaf_cap)[None, :]
            slot = np.minimum(starts + cols, max(prim_ids.shape[0] - 1, 0))
            vals = np.where(cols < counts, prim_ids[slot].astype(np.float32), -1.0)
            bvh_fat[leaves_idx, 8:] = vals
        tri_mt = np.concatenate([v0, e1, e2], axis=1).astype(np.float32)
        sph_geom = np.concatenate([sph_c, sph_r[:, None]], axis=1).astype(np.float32)

        # Clustered-BVH tables for the big-scene megakernel (kernels/cluster
        # .py): built only when the triangle table exceeds the SMEM
        # brute-force budget; a SECOND, wider-leaf BVH build keeps the node
        # table inside the 1 MB SMEM.
        cl_nodes = cl_tris = cl_uv = None
        n_cl_nodes = 0
        cl_groups = 1
        cl_textured = False
        # cluster_threshold below the SMEM budget forces the clustered path
        # on small scenes — used by tests to cross-validate the two
        # megakernel intersect/occlusion implementations on one scene.
        if n_tris > cluster_threshold:
            from mcpt_tpu.kernels.cluster import (
                build_cluster_tables,
                pick_leaf_size,
            )

            cleaf = pick_leaf_size(n_tris)
            cflat = bvh_build_native(
                prim_min, prim_max, leaf_size=cleaf, method=bvh_method
            )
            if cflat is None:
                cflat = build_bvh(
                    prim_min, prim_max, leaf_size=cleaf, method=bvh_method
                )
            cl_textured = bool(np.any(mat_textured))
            ct = build_cluster_tables(
                cflat, n_tris, tri_kern, tri_shade, cl_textured
            )
            cl_nodes = jnp.asarray(ct.nodes)
            cl_tris = jnp.asarray(ct.tris)
            cl_uv = jnp.asarray(ct.uv)
            n_cl_nodes = ct.n_nodes
            cl_groups = ct.groups

        rr = np.float32(self.rr_rate)
        return ScenePack(
            cl_nodes=cl_nodes,
            cl_tris=cl_tris,
            cl_uv=cl_uv,
            n_cl_nodes=n_cl_nodes,
            cl_groups=cl_groups,
            tri_v0=jnp.asarray(v0),
            tri_e1=jnp.asarray(e1),
            tri_e2=jnp.asarray(e2),
            tri_n=jnp.asarray(n_unit.astype(np.float32)),
            tri_w=jnp.asarray(w),
            tri_c=jnp.asarray(c),
            tri_nr2=jnp.asarray(nr2.astype(np.float32)),
            tri_uv=jnp.asarray(uvs),
            tri_mat=jnp.asarray(tmat),
            tri_valid=jnp.asarray(valid),
            sph_c=jnp.asarray(sph_c),
            sph_r=jnp.asarray(sph_r),
            sph_mat=jnp.asarray(sph_mat),
            mat_type=jnp.asarray(mat_type),
            mat_ior_a=jnp.asarray(mat_ior_a),
            mat_ior_b=jnp.asarray(mat_ior_b),
            mat_rough=jnp.asarray(mat_rough),
            mat_refl=jnp.asarray(mat_refl),
            mat_emission=jnp.asarray(mat_emission),
            mat_textured=jnp.asarray(mat_textured),
            mat_emissive=jnp.asarray(mat_emissive),
            mat_dirac=jnp.asarray(mat_dirac),
            mat_fat=jnp.asarray(mat_fat),
            tri_shade=jnp.asarray(tri_shade),
            sph_shade=jnp.asarray(sph_shade),
            prim_emissive=jnp.asarray(prim_emissive),
            emt_fat=jnp.asarray(emt_fat),
            tri_kern=jnp.asarray(tri_kern),
            tri_sc=jnp.asarray(tri_sc),
            tri_occ_sc=jnp.asarray(tri_occ_sc),
            bvh_fat=jnp.asarray(bvh_fat),
            tri_mt=jnp.asarray(tri_mt),
            sph_geom=jnp.asarray(sph_geom),
            emt_tri=jnp.asarray(a_emt_tri),
            emt_mesh=jnp.asarray(a_emt_mesh),
            emt_intra_cum=jnp.asarray(a_intra),
            emt_mesh_area=jnp.asarray(a_mesh_area),
            lmesh_cum=jnp.asarray(a_lmesh_cum),
            emit_total_area=jnp.float32(total_area),
            env_pixels=jnp.asarray(env),
            background=jnp.asarray(self.background, dtype=jnp.float32),
            rr_rate=rr,
            inv_rr=np.float32(1.0 / max(self.rr_rate, 1e-6)),
            n_tris=t_pad,
            n_spheres=s_pad,
            n_emitters=n_emitters,
            n_sph_emitters=len(sph_emit_rows),
            use_env=use_env,
            enable_shadow=bool(self.enable_shadow),
            n_dir_sample=int(self.n_dir_sample),
            bvh_min=jnp.asarray(flat.node_min),
            bvh_max=jnp.asarray(flat.node_max),
            bvh_miss=jnp.asarray(flat.node_miss),
            bvh_leaf_start=jnp.asarray(flat.leaf_start),
            bvh_leaf_count=jnp.asarray(flat.leaf_count),
            bvh_prims=jnp.asarray(a_prims),
            bvh_leaf_size=max(flat.max_leaf_count, 1),
        )
