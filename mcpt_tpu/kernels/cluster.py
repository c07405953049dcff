"""Clustered-BVH tables for the big-scene megakernel intersect.

Big scenes (> the SMEM brute-force budget) cannot hold their triangle table
in SMEM, and per-lane BVH traversal cannot vectorize on a TPU (no per-lane
gather). The TPU-native structure used here:

- the threaded (miss-link) BVH **node table lives in SMEM**, packed 8 nodes
  per 128-float row (SMEM rows are 512-byte strided on this chip, so narrow
  tables waste capacity 16x);
- the **scalar core walks the tree once per 128-ray bundle** (stackless,
  miss-links), testing each node's AABB against all 128 rays with a dozen
  VPU ops and descending if ANY ray hits — chunk-collective culling;
- **leaves are clusters of 8-triangle tiles in VMEM**: a leaf visit loads
  (8, 16) triangle rows with one vector load and tests 8 triangles x 128
  rays per VPU op (triangles on sublanes, rays on lanes — full utilization);
- triangle rows carry the Woop transform + material id, so shading data is
  winner-selected in-kernel like the small-scene path. The geometric normal
  is NOT stored: the Woop inverse's third row is (e1xe2)/|e1xe2|^2, so
  n = w2 * sqrt(nr2) (exactly the reference's flat normal, Triangle.hpp:50-56).
- spheres are never clustered — scenes have a handful and the kernel brute
  -tests them per bundle (Sphere.hpp:26-48 math, like the small-scene path).

Built from the same flattened BVH used by the wavefront path (bvh.py /
native builder), with prims permuted into leaf order.
"""

import numpy as np

# SMEM node-table budget: rows are 512 B strided; keep under ~0.93 MB.
# Nodes pack 12-per-row at 10 columns each (cols 120-127 unused); node
# addresses are stored PREMULTIPLIED as enc = row*128 + (n%12)*10 in the
# hit/miss link columns, so the walk decodes row/col with one shift+mask
# and never divides. 22,320 nodes cover ~350k tris at leaf 64 (the
# high-quality chessboard's ~296k fits without the leaf-128 fallback).
MAX_NODE_ROWS = 1860
NODES_PER_ROW = 12
NODE_COLS = 10  # [min3, max3, miss_enc, hit_enc, n_tiles, tile_base]
TILE = 8  # triangles per cluster tile (sublane dimension)
CH_SUB = 8  # sublane rowgroups per (8, 128) ray chunk


class ClusterTables:
    """Host-side numpy tables; scene.compile() stores them on the pack.

    Triangle/uv data uses the LEAF-ROW-GROUP layout: each leaf owns
    `groups` consecutive (8, TPG*16) blocks (8 tri sublanes x TPG
    side-by-side tiles on lanes, tile j's attr a at lane j*16+a). At
    leaf 64 (TPG=8) the block is a fully DENSE (8, 128) VMEM tile — the
    naive (8*n_tiles, 16) layout padded its 16-lane minor dim 8x to 128,
    which alone overflowed VMEM on ~300k-triangle scenes. Kernel-side the
    per-tile lane offsets are STATIC (unrolled j loop), which Mosaic
    requires (dynamic lane slicing is unsupported).
    """

    def __init__(self, nodes, tris, uv, n_nodes, n_tiles, textured, groups):
        self.nodes = nodes  # (R, 128) f32 SMEM layout
        self.tris = tris  # (n_leaves*groups*8, TPG*16) f32 VMEM blocks
        self.uv = uv  # (n_leaves*groups*8, TPG*8) f32 or dummy
        self.n_nodes = n_nodes
        self.n_tiles = n_tiles
        self.textured = textured
        self.groups = groups  # row-groups per leaf


def pick_leaf_size(n_tris: int) -> int:
    """Leaf size for the cluster BVH.

    The walk serializes one scalar-core step (+ a vector→scalar mask sync)
    per node, and a path-regeneration chunk holds 1024 mutually incoherent
    rays whose union of node sets approaches the whole tree — so node
    count, not per-leaf triangle work, bounds big-scene throughput. Larger
    leaves trade vectorized 8-tri tile tests (cheap) for fewer serial node
    steps (expensive). MCPT_CLUSTER_LEAF overrides for experiments.
    """
    import os

    override = os.environ.get("MCPT_CLUSTER_LEAF")
    budget = NODES_PER_ROW * MAX_NODE_ROWS
    if override:
        leaf = int(override)
        if leaf not in (8, 16, 32, 64, 128):
            raise ValueError(
                f"MCPT_CLUSTER_LEAF={override!r}: must be one of 8/16/32/64/128"
            )
        nodes = 2 * (2 * n_tris // leaf + 1)
        if nodes > budget:
            raise ValueError(
                f"MCPT_CLUSTER_LEAF={leaf} needs ~{nodes} BVH nodes for "
                f"{n_tris} tris, over the {budget} SMEM node budget — use "
                "a larger leaf size"
            )
        return leaf
    for leaf in (16, 32, 64, 128):
        # Smallest leaf (>= 16) whose node table fits the SMEM budget.
        # With tile-coherent chunks the 2026-08 1080p chessboard sweep
        # measured leaf 16 fastest (13.5e6 rays/s vs 11.1e6 at 64 and
        # ~10e6 at 8): coherent rowgroups reach few leaves, so per-leaf
        # tile work outweighs the extra serial node steps until leaf 8.
        # Mid-scale validation (benchmarks/midscale.py, r5): at 50k tris
        # leaf 16/32/64 are indistinguishable within the spp-16 probe's
        # noise; at 132k tris leaf 32 (the heuristic's pick) beat leaf 64
        # ~2x in both measured windows — smallest-fitting is confirmed at
        # both mid-scale endpoints.
        # Leaf 128's small-lane-count compiles also wedge the remote
        # Mosaic service in this image — it is only ever a last resort.
        # median-split builds ~2*ceil(T/leaf)-1 nodes, leaves 60-100% full.
        if 2 * (2 * n_tris // leaf + 1) <= budget:
            return leaf
    raise ValueError(f"scene too large for cluster tables: {n_tris} tris")


def build_cluster_tables(
    flat, t_pad, tri_kern, tri_shade, any_textured
) -> ClusterTables:
    """flat: FlatBVH (node_min/max/miss/leaf_start/leaf_count, prim_ids with
    sphere ids >= t_pad); tri_kern: (16, T) kernel columns (w9, c3, nr2,
    valid); tri_shade: (T, 11) (n3, uv6, mat, emissive)."""
    node_min = np.asarray(flat.node_min, np.float32)
    node_max = np.asarray(flat.node_max, np.float32)
    miss = np.asarray(flat.node_miss, np.int64)
    leaf_start = np.asarray(flat.leaf_start, np.int64)
    leaf_count = np.asarray(flat.leaf_count, np.int64)
    prim_ids = np.asarray(flat.prim_ids, np.int64)
    n_nodes = node_min.shape[0]
    if n_nodes > NODES_PER_ROW * MAX_NODE_ROWS:
        raise ValueError(f"{n_nodes} BVH nodes exceed the SMEM node budget")

    tk = np.asarray(tri_kern, np.float32)  # (16, T)
    ts = np.asarray(tri_shade, np.float32)  # (T, 11)

    # tiles-per-group: the widest leaf decides (lane width TPG*16 <= 128;
    # leaves above 64 tris span `groups` row-groups)
    max_tiles = 1
    for n in range(n_nodes):
        if leaf_start[n] >= 0:
            ids = prim_ids[leaf_start[n] : leaf_start[n] + leaf_count[n]]
            max_tiles = max(max_tiles, -(-int((ids < t_pad).sum()) // TILE))
    groups = -(-max_tiles // 8)
    tpg = min(max_tiles, 8)

    leaf_blocks = []
    uv_blocks = []
    group_base = np.zeros(n_nodes, np.float32)
    n_tiles_of = np.zeros(n_nodes, np.float32)
    cursor = 0  # in row-groups
    n_tiles = 0
    for n in range(n_nodes):
        if leaf_start[n] < 0:
            continue
        ids = prim_ids[leaf_start[n] : leaf_start[n] + leaf_count[n]]
        ids = ids[ids < t_pad]  # spheres are brute-tested separately
        if ids.size == 0:
            continue
        k = -(-ids.size // TILE)
        group_base[n] = cursor
        n_tiles_of[n] = k
        n_tiles += k
        blk = np.zeros((groups * TILE, tpg * 16), np.float32)
        uvb = np.zeros((groups * TILE, tpg * 8), np.float32)
        for t in range(k):
            sub = ids[t * TILE : (t + 1) * TILE]
            m = sub.size
            gg, j = t // 8, t % 8
            r0 = gg * TILE
            c0 = j * 16
            blk[r0 : r0 + m, c0 : c0 + 13] = tk[0:13, sub].T  # w9, c3, nr2
            blk[r0 : r0 + m, c0 + 13] = tk[13, sub]  # valid
            blk[r0 : r0 + m, c0 + 14] = ts[sub, 9]  # mat id
            blk[r0 : r0 + m, c0 + 15] = ts[sub, 10]  # emissive
            uvb[r0 : r0 + m, j * 8 : j * 8 + 6] = ts[sub, 3:9]
        leaf_blocks.append(blk)
        uv_blocks.append(uvb)
        cursor += groups

    if not leaf_blocks:
        tris = np.zeros((TILE, 16), np.float32)
        uv = np.zeros((TILE, 8), np.float32)
        n_tiles = 1
    else:
        tris = np.concatenate(leaf_blocks, axis=0)
        uv = (
            np.concatenate(uv_blocks, axis=0)
            if any_textured
            else np.zeros((TILE, 8), np.float32)
        )

    # Pack nodes 12-per-row at 10 cols (SMEM rows are 128 floats; cols
    # 120-127 unused). Link columns store PREMULTIPLIED addresses
    # enc(n) = (n//12)*128 + (n%12)*10 (exact in f32: < 2^24), enc(-1) = -1,
    # so the walk decodes row = enc>>7, col = enc&127 — no integer divide.
    def enc(n):
        return np.where(n < 0, -1.0, (n // 12) * 128 + (n % 12) * 10).astype(
            np.float32
        )

    rows = -(-n_nodes // NODES_PER_ROW)
    nodes = np.zeros((rows, 128), np.float32)
    idx = np.arange(n_nodes)
    r_i = idx // NODES_PER_ROW
    c_i = (idx % NODES_PER_ROW) * NODE_COLS
    for k in range(3):
        nodes[r_i, c_i + k] = node_min[:, k]
        nodes[r_i, c_i + 3 + k] = node_max[:, k]
    nodes[r_i, c_i + 6] = enc(miss)
    nxt = np.where(idx + 1 < n_nodes, idx + 1, -1)
    nodes[r_i, c_i + 7] = enc(nxt)  # DFS-next (descend target; leaf: unused)
    nodes[r_i, c_i + 8] = n_tiles_of
    nodes[r_i, c_i + 9] = group_base
    return ClusterTables(
        nodes, tris, uv, n_nodes, n_tiles, any_textured, groups
    )


# ---------------------------------------------------------------------------
# Kernel-side query (used inside the megakernel; (1, 128) ray bundles)
# ---------------------------------------------------------------------------

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

from mcpt_tpu.constants import EPSILON, REL_EPS, T_MAX

# res_ref field rows
R_T, R_N0, R_N1, R_N2, R_UVX, R_UVY, R_MAT, R_EM, R_SPH = range(9)
N_RES = 9


def _sph_t_bundle(sph_ref, s, o, d, a_ok, a_safe):
    """Sphere quadratic on a (1,128) bundle (global.hpp:20-35 q-form)."""
    o0, o1, o2 = o
    d0, d1, d2 = d
    cx = sph_ref[s, 0]
    cy = sph_ref[s, 1]
    cz = sph_ref[s, 2]
    r = sph_ref[s, 3]
    l0 = o0 - cx
    l1 = o1 - cy
    l2 = o2 - cz
    bq = 2.0 * (d0 * l0 + d1 * l1 + d2 * l2)
    cq = l0 * l0 + l1 * l1 + l2 * l2 - r * r
    disc = bq * bq - 4.0 * a_safe * cq
    ok = (disc >= 0.0) & a_ok & (r > 0.0)
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    q = jnp.where(bq > 0.0, -0.5 * (bq + sq), -0.5 * (bq - sq))
    qs = jnp.where(jnp.abs(q) > 1e-10, q, 1.0)
    x0 = q / a_safe
    x1 = cq / qs
    lo = jnp.minimum(x0, x1)
    hi = jnp.maximum(x0, x1)
    t = jnp.where(lo < 0.0, hi, lo)
    ok &= t >= 0.0
    return jnp.where(ok, t, T_MAX)


def cluster_occlude_fan(
    cn_ref,
    ct_ref,
    sph_ref,
    res_ref,
    o,
    ds,
    dists,
    *,
    n_sph,
    mask=None,
    tpg=1,
    groups=1,
):
    """Visibility of S unit-direction shadow rays sharing one origin (the
    NEE fan, Scene.cpp:56-82) against the clustered BVH + brute spheres, in
    ONE tree walk. Returns a list of bool tiles: True = nothing blocks the
    ray strictly closer than its light-sample distance.

    Robust predicate: "any blocker at t < dist − ε" — the same re-expression
    of the reference's `|t_nearest − dist| < EPSILON` check used by the SMEM
    fan (megakernel._occlude_shared_origin), which the |t−dist| form loses
    to float error on grazing samples at scene scale. Blocked flags (f32
    0/1) live in res_ref[0..S-1].

    Single-walk design: the S fan rays all lead to the same light, so their
    per-sample node sets nearly coincide — one walk over the UNION visits
    ~1/S the nodes of S separate walks, the per-tile origin terms
    (op0/op1/op2, q = t·det) are computed ONCE per triangle tile instead of
    once per (tile, sample), and the per-(tri, sample) test is the
    division-free min-chain (conditions multiplied through by |det|).
    Blocked lanes drop out of the node mask, and the walk abandons once
    every (sample, lane) is blocked.

    Shaft cull: every tested segment runs from a fan origin to a light
    sample, so the whole fan lives inside the AABB of {origins} ∪ {targets}
    (targets = o + d·dist). That box is computed ONCE per walk (masked to
    real lanes — `mask` excludes dead lanes whose garbage origins would
    blow the box up) and every node is prescreened against it with six
    SCALAR compares: nodes outside the shaft take their miss link with no
    vector work and no vector→scalar sync. Shadow rays are ~80% of all
    traced rays and the light is small, so on big scenes this prunes most
    of the tree per walk.
    """
    o0, o1, o2 = o
    s_cnt = len(ds)
    zero = jnp.zeros((CH_SUB, 128), jnp.float32)
    for si in range(s_cnt):
        res_ref[si] = zero
    # relative epsilon: f32-safe at any light distance (see the wavefront
    # visibility comment in integrator.direct_lighting_c)
    xs = [
        dists[si] - jnp.maximum(EPSILON, REL_EPS * dists[si])
        for si in range(s_cnt)
    ]
    dinv = [
        (1.0 / ds[si][0], 1.0 / ds[si][1], 1.0 / ds[si][2])
        for si in range(s_cnt)
    ]
    rg_pow = jnp.exp2(
        jax.lax.broadcasted_iota(jnp.int32, (CH_SUB, 1), 0).astype(jnp.float32)
    )

    # ---- shaft AABB (scalar node prescreen; see docstring)
    big = jnp.float32(3.0e37)
    if mask is None:
        mask = jnp.ones_like(o0) > 0.5
    shaft_min = []
    shaft_max = []
    for k in range(3):
        comps = [o[k]] + [
            o[k] + ds[si][k] * dists[si] for si in range(s_cnt)
        ]
        lo = jnp.float32(big)
        hi = jnp.float32(-big)
        for c in comps:
            lo = jnp.minimum(lo, jnp.min(jnp.where(mask, c, big)))
            hi = jnp.maximum(hi, jnp.max(jnp.where(mask, c, -big)))
        # EPSILON covers the slab tests' own slack
        shaft_min.append(lo - EPSILON)
        shaft_max.append(hi + EPSILON)

    # ---- brute spheres (unit dirs => a = 1; robust q-form roots)
    def sphb(s, _):
        cx = sph_ref[s, 0]
        cy = sph_ref[s, 1]
        cz = sph_ref[s, 2]
        r = sph_ref[s, 3]
        l0 = o0 - cx
        l1 = o1 - cy
        l2 = o2 - cz
        cq = l0 * l0 + l1 * l1 + l2 * l2 - r * r
        r_ok = r > 0.0
        for si in range(s_cnt):
            d0, d1, d2 = ds[si]
            hb = d0 * l0 + d1 * l1 + d2 * l2
            disc = hb * hb - cq
            ok = (disc >= 0.0) & r_ok
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            q = jnp.where(hb > 0.0, -(hb + sq), -(hb - sq))
            qs_ = jnp.where(jnp.abs(q) > 1e-10, q, 1.0)
            lo = jnp.minimum(q, cq / qs_)
            hi = jnp.maximum(q, cq / qs_)
            t = jnp.where(lo < 0.0, hi, lo)
            ok &= (t >= 0.0) & (t < xs[si])
            res_ref[si] = jnp.maximum(res_ref[si], ok.astype(jnp.float32))
        return 0

    lax.fori_loop(0, n_sph, sphb, 0)

    def leaf_visit(rg, gbase, smask):
        """Test every tile of one leaf (leaf-row-group layout: `groups`
        blocks of (8, tpg*16), tile j's attr a at static lane j*16+a)
        against ray rowgroup rg's fan samples."""
        ro0 = jax.lax.slice_in_dim(o0, rg, rg + 1, axis=0)
        ro1 = jax.lax.slice_in_dim(o1, rg, rg + 1, axis=0)
        ro2 = jax.lax.slice_in_dim(o2, rg, rg + 1, axis=0)

        if True:
            for gg in range(groups):
                blk = ct_ref[pl.ds((gbase + gg) * TILE, TILE), :]
                for j in range(tpg):
                    c = j * 16
                    nr2 = blk[:, c + 12 : c + 13]
                    op2 = (
                        ro0 * blk[:, c + 6 : c + 7]
                        + ro1 * blk[:, c + 7 : c + 8]
                        + ro2 * blk[:, c + 8 : c + 9]
                        - blk[:, c + 11 : c + 12]
                    )
                    op0 = (
                        ro0 * blk[:, c + 0 : c + 1]
                        + ro1 * blk[:, c + 1 : c + 2]
                        + ro2 * blk[:, c + 2 : c + 3]
                        - blk[:, c + 9 : c + 10]
                    )
                    op1 = (
                        ro0 * blk[:, c + 3 : c + 4]
                        + ro1 * blk[:, c + 4 : c + 5]
                        + ro2 * blk[:, c + 5 : c + 6]
                        - blk[:, c + 10 : c + 11]
                    )
                    q = op2 * nr2  # t·det, shared across the fan
                    for si in range(s_cnt):

                        @pl.when(((smask >> si) & 1) > 0)
                        def _():
                            d0 = jax.lax.slice_in_dim(
                                ds[si][0], rg, rg + 1, axis=0
                            )
                            d1 = jax.lax.slice_in_dim(
                                ds[si][1], rg, rg + 1, axis=0
                            )
                            d2 = jax.lax.slice_in_dim(
                                ds[si][2], rg, rg + 1, axis=0
                            )
                            x_d = jax.lax.slice_in_dim(
                                xs[si], rg, rg + 1, axis=0
                            )
                            dp2 = (
                                d0 * blk[:, c + 6 : c + 7]
                                + d1 * blk[:, c + 7 : c + 8]
                                + d2 * blk[:, c + 8 : c + 9]
                            )
                            det = -(dp2 * nr2)
                            dets = jnp.abs(det)
                            qs = jnp.where(det < 0.0, -q, q)  # t·|det|
                            dp0 = (
                                d0 * blk[:, c + 0 : c + 1]
                                + d1 * blk[:, c + 1 : c + 2]
                                + d2 * blk[:, c + 2 : c + 3]
                            )
                            u_s = op0 * dets + qs * dp0
                            dp1 = (
                                d0 * blk[:, c + 3 : c + 4]
                                + d1 * blk[:, c + 4 : c + 5]
                                + d2 * blk[:, c + 5 : c + 6]
                            )
                            v_s = op1 * dets + qs * dp1
                            m = jnp.minimum(
                                jnp.minimum(qs, dets - EPSILON),
                                jnp.minimum(
                                    jnp.minimum(u_s, v_s), dets - (u_s + v_s)
                                ),
                            )
                            blocked8 = (m >= 0.0) & (x_d * dets - qs > 0.0)
                            hit_any = jnp.max(
                                blocked8.astype(jnp.float32),
                                axis=0,
                                keepdims=True,
                            )
                            cur = res_ref[si, rg : rg + 1, :]
                            res_ref[si, rg : rg + 1, :] = jnp.maximum(
                                cur, hit_any
                            )

    def cond(n):
        return n >= 0

    def body(n):
        # n is the premultiplied node address enc = row*128 + col
        row = n >> 7
        c0 = n & 127
        mn0 = cn_ref[row, c0 + 0]
        mn1 = cn_ref[row, c0 + 1]
        mn2 = cn_ref[row, c0 + 2]
        mx0 = cn_ref[row, c0 + 3]
        mx1 = cn_ref[row, c0 + 4]
        mx2 = cn_ref[row, c0 + 5]
        miss = cn_ref[row, c0 + 6].astype(jnp.int32)
        hit_enc = cn_ref[row, c0 + 7].astype(jnp.int32)
        n_tiles = cn_ref[row, c0 + 8].astype(jnp.int32)
        tbase = cn_ref[row, c0 + 9].astype(jnp.int32)

        # scalar shaft prescreen: a node disjoint from the fan's shaft AABB
        # cannot contain a blocker for any (lane, sample) segment — take the
        # miss link with zero vector work and no vector→scalar sync
        shaft_ok = (
            (mn0 <= shaft_max[0])
            & (mx0 >= shaft_min[0])
            & (mn1 <= shaft_max[1])
            & (mx1 >= shaft_min[1])
            & (mn2 <= shaft_max[2])
            & (mx2 >= shaft_min[2])
        )

        def _culled(_):
            return miss

        def _tested(_):
            # per-sample slab tests; union mask over samples drives
            # descent. Leaves test ALL samples (smask constant): most
            # shadow samples stay unblocked, so per-sample settled-skip
            # masks saved little leaf work while costing S full
            # vector->scalar reductions per node.
            rgmask = jnp.zeros((CH_SUB, 1), jnp.float32)
            # all-samples mask; (1 << 32) - 1 overflows int32 when the fan
            # carries 32 samples (directLightSample=32 configs) — use -1
            # (all bits set) instead.
            smask = jnp.int32(-1 if s_cnt >= 32 else (1 << s_cnt) - 1)
            for si in range(s_cnt):
                iv0, iv1, iv2 = dinv[si]
                va0 = (mn0 - o0) * iv0
                vb0 = (mx0 - o0) * iv0
                va1 = (mn1 - o1) * iv1
                vb1 = (mx1 - o1) * iv1
                va2 = (mn2 - o2) * iv2
                vb2 = (mx2 - o2) * iv2
                tmin = jnp.maximum(
                    jnp.maximum(jnp.minimum(va0, vb0), jnp.minimum(va1, vb1)),
                    jnp.minimum(va2, vb2),
                )
                tmax = jnp.minimum(
                    jnp.minimum(jnp.maximum(va0, vb0), jnp.maximum(va1, vb1)),
                    jnp.maximum(va2, vb2),
                )
                live = res_ref[si] < 0.5
                hit = (
                    (tmin - EPSILON <= tmax)
                    & (tmax >= -EPSILON)
                    & (tmin - EPSILON <= xs[si])
                    & live
                )
                # per-sample lane reduction then sublane max: measured
                # FASTER than folding the samples elementwise first (both
                # a bool-| and an f32-max union chain lost ~7% — the
                # per-sample reduces apparently pipeline better here)
                rg_si = jnp.max(hit.astype(jnp.float32), axis=1, keepdims=True)
                rgmask = jnp.maximum(rgmask, rg_si)

            rgm = jnp.sum(rgmask * rg_pow).astype(jnp.int32)
            any_hit = rgm > 0
            is_leaf = n_tiles > 0

            @pl.when(any_hit & is_leaf)
            def _():
                for rg in range(CH_SUB):

                    @pl.when(((rgm >> rg) & 1) > 0)
                    def _():
                        leaf_visit(rg, tbase, smask)

            return jnp.where(any_hit & (n_tiles == 0), hit_enc, miss)

        return lax.cond(shaft_ok, _tested, _culled, 0)

    lax.while_loop(cond, body, jnp.int32(0))
    return [res_ref[si] < 0.5 for si in range(s_cnt)]


def cluster_query_chunk(
    cn_ref,
    ct_ref,
    cuv_ref,
    sph_ref,
    res_ref,
    o,
    d,
    *,
    n_sph,
    occlusion,
    textured,
    dist=None,
    tpg=1,
    groups=1,
):
    """Nearest hit (or occlusion t) of one 1024-ray chunk against the
    clustered BVH + brute spheres. Results land in res_ref[field, :, :].

    The scalar core chases the threaded miss-links ONCE per (8, 128) chunk;
    each node's AABB is slab-tested against all 1024 rays in a dozen full
    VPU ops (Bounds3.hpp:95-108 semantics incl. the running-t cull). The
    single vector->scalar sync per node returns an 8-bit mask of which
    sublane rowgroups hit, so leaf tiles (8 triangles x 128 rays, full VPU
    utilization) run only for rowgroups that actually reached the leaf.
    occlusion=True tracks only the nearest t and abandons the walk once
    every ray is blocked closer than its light sample `dist`.
    """
    o0, o1, o2 = o
    d0, d1, d2 = d
    dinv0 = 1.0 / d0
    dinv1 = 1.0 / d1
    dinv2 = 1.0 / d2
    subl = jax.lax.broadcasted_iota(jnp.int32, (TILE, 128), 0)
    # 2^rg weights, built from iota (pallas kernels may not capture
    # array-literal constants)
    rg_pow = jnp.exp2(
        jax.lax.broadcasted_iota(jnp.int32, (CH_SUB, 1), 0).astype(jnp.float32)
    )

    # ---- brute spheres seed the accumulators (and the t-cull)
    a = d0 * d0 + d1 * d1 + d2 * d2
    a_ok = a > 1e-12
    a_safe = jnp.maximum(a, 1e-12)
    t0 = jnp.full((CH_SUB, 128), T_MAX, jnp.float32)
    if occlusion:

        def sphb(s, tb):
            return jnp.minimum(tb, _sph_t_bundle(sph_ref, s, o, d, a_ok, a_safe))

        res_ref[R_T] = lax.fori_loop(0, n_sph, sphb, t0)
    else:
        zero = jnp.zeros((CH_SUB, 128), jnp.float32)

        def sphb(s, acc):
            tb, sm, se, sx, sy, sz, sf = acc
            t_c = _sph_t_bundle(sph_ref, s, o, d, a_ok, a_safe)
            bt = t_c < tb
            return (
                jnp.where(bt, t_c, tb),
                jnp.where(bt, sph_ref[s, 4], sm),
                jnp.where(bt, sph_ref[s, 5], se),
                jnp.where(bt, sph_ref[s, 0], sx),
                jnp.where(bt, sph_ref[s, 1], sy),
                jnp.where(bt, sph_ref[s, 2], sz),
                jnp.where(bt, 1.0, sf),
            )

        tb, sm, se, sx, sy, sz, sf = lax.fori_loop(
            0, n_sph, sphb, (t0,) + (zero,) * 6
        )
        res_ref[R_T] = tb
        res_ref[R_MAT] = sm
        res_ref[R_EM] = se
        # sphere centers parked in the normal slots; finalized by the caller
        res_ref[R_N0] = sx
        res_ref[R_N1] = sy
        res_ref[R_N2] = sz
        res_ref[R_SPH] = sf
        res_ref[R_UVX] = zero
        res_ref[R_UVY] = zero

    def leaf_visit(rg, gbase):
        """Test every tile of one leaf (leaf-row-group layout: `groups`
        blocks of (8, tpg*16), tile j's attr a at static lane j*16+a)
        against ray rowgroup rg (128 rays)."""
        ro0 = jax.lax.slice_in_dim(o0, rg, rg + 1, axis=0)
        ro1 = jax.lax.slice_in_dim(o1, rg, rg + 1, axis=0)
        ro2 = jax.lax.slice_in_dim(o2, rg, rg + 1, axis=0)
        rd0 = jax.lax.slice_in_dim(d0, rg, rg + 1, axis=0)
        rd1 = jax.lax.slice_in_dim(d1, rg, rg + 1, axis=0)
        rd2 = jax.lax.slice_in_dim(d2, rg, rg + 1, axis=0)

        # Winner accumulators live in registers across the leaf's static
        # tile loop; res_ref is read once before and written once after
        # (the per-tile read-modify-writes were ~9 VMEM round-trips per
        # tile).
        acc_t = res_ref[R_T, rg : rg + 1, :]
        if not occlusion:
            acc = {
                k: res_ref[k, rg : rg + 1, :]
                for k in (R_N0, R_N1, R_N2, R_MAT, R_EM, R_SPH, R_UVX, R_UVY)
            }
        for gg in range(groups):
            blk = ct_ref[pl.ds((gbase + gg) * TILE, TILE), :]
            if textured and not occlusion:
                uvb = cuv_ref[pl.ds((gbase + gg) * TILE, TILE), :]
            for j in range(tpg):
                c = j * 16
                dp2 = (
                    rd0 * blk[:, c + 6 : c + 7]
                    + rd1 * blk[:, c + 7 : c + 8]
                    + rd2 * blk[:, c + 8 : c + 9]
                )
                op2 = (
                    ro0 * blk[:, c + 6 : c + 7]
                    + ro1 * blk[:, c + 7 : c + 8]
                    + ro2 * blk[:, c + 8 : c + 9]
                    - blk[:, c + 11 : c + 12]
                )
                nr2 = blk[:, c + 12 : c + 13]
                det = -(dp2 * nr2)
                okd = jnp.abs(det) >= EPSILON
                t_hit = op2 * nr2 / jnp.where(okd, det, 1.0)
                dp0 = (
                    rd0 * blk[:, c + 0 : c + 1]
                    + rd1 * blk[:, c + 1 : c + 2]
                    + rd2 * blk[:, c + 2 : c + 3]
                )
                op0 = (
                    ro0 * blk[:, c + 0 : c + 1]
                    + ro1 * blk[:, c + 1 : c + 2]
                    + ro2 * blk[:, c + 2 : c + 3]
                    - blk[:, c + 9 : c + 10]
                )
                u = op0 + t_hit * dp0
                dp1 = (
                    rd0 * blk[:, c + 3 : c + 4]
                    + rd1 * blk[:, c + 4 : c + 5]
                    + rd2 * blk[:, c + 5 : c + 6]
                )
                op1 = (
                    ro0 * blk[:, c + 3 : c + 4]
                    + ro1 * blk[:, c + 4 : c + 5]
                    + ro2 * blk[:, c + 5 : c + 6]
                    - blk[:, c + 10 : c + 11]
                )
                v = op1 + t_hit * dp1
                ok = (
                    okd
                    & (u >= 0.0)
                    & (u <= 1.0)
                    & (v >= 0.0)
                    & (u + v <= 1.0)
                    & (t_hit >= 0.0)
                    & (blk[:, c + 13 : c + 14] > 0.5)
                )
                t_cand = jnp.where(ok, t_hit, T_MAX)  # (8,128): tris x rays
                tmin8 = jnp.min(t_cand, axis=0, keepdims=True)
                better = tmin8 < acc_t
                if occlusion:
                    acc_t = jnp.where(better, tmin8, acc_t)
                    continue
                is_min = t_cand == tmin8
                pick = jnp.min(
                    jnp.where(is_min, subl, jnp.int32(TILE)),
                    axis=0,
                    keepdims=True,
                )
                sel = (subl == pick).astype(jnp.float32)

                def pick_col(col):
                    return jnp.sum(sel * col, axis=0, keepdims=True)

                s_nr = jnp.sqrt(jnp.maximum(nr2, 0.0))
                acc_t = jnp.where(better, tmin8, acc_t)

                def upd(k, val):
                    acc[k] = jnp.where(better, val, acc[k])

                # flat normal = Woop row 2 x |e1xe2| (Triangle.hpp:50-56)
                upd(R_N0, pick_col(blk[:, c + 6 : c + 7] * s_nr))
                upd(R_N1, pick_col(blk[:, c + 7 : c + 8] * s_nr))
                upd(R_N2, pick_col(blk[:, c + 8 : c + 9] * s_nr))
                upd(
                    R_MAT,
                    pick_col(
                        jnp.broadcast_to(
                            blk[:, c + 14 : c + 15], (TILE, 128)
                        )
                    ),
                )
                upd(
                    R_EM,
                    pick_col(
                        jnp.broadcast_to(
                            blk[:, c + 15 : c + 16], (TILE, 128)
                        )
                    ),
                )
                upd(R_SPH, jnp.zeros((1, 128), jnp.float32))
                if textured:
                    cu = j * 8
                    u_s = jnp.sum(sel * u, axis=0, keepdims=True)
                    v_s = jnp.sum(sel * v, axis=0, keepdims=True)
                    w_s = 1.0 - u_s - v_s

                    def uv_col(cc):
                        return pick_col(
                            jnp.broadcast_to(
                                uvb[:, cu + cc : cu + cc + 1], (TILE, 128)
                            )
                        )

                    uvx = w_s * uv_col(0) + u_s * uv_col(2) + v_s * uv_col(4)
                    uvy = w_s * uv_col(1) + u_s * uv_col(3) + v_s * uv_col(5)
                    upd(R_UVX, uvx)
                    upd(R_UVY, uvy)
        res_ref[R_T, rg : rg + 1, :] = acc_t
        if not occlusion:
            for k in (R_N0, R_N1, R_N2, R_MAT, R_EM, R_SPH, R_UVX, R_UVY):
                res_ref[k, rg : rg + 1, :] = acc[k]

    def cond(n):
        return n >= 0

    def body(n):
        # n is the premultiplied node address enc = row*128 + col
        row = n >> 7
        c0 = n & 127
        mn0 = cn_ref[row, c0 + 0]
        mn1 = cn_ref[row, c0 + 1]
        mn2 = cn_ref[row, c0 + 2]
        mx0 = cn_ref[row, c0 + 3]
        mx1 = cn_ref[row, c0 + 4]
        mx2 = cn_ref[row, c0 + 5]
        miss = cn_ref[row, c0 + 6].astype(jnp.int32)
        hit_enc = cn_ref[row, c0 + 7].astype(jnp.int32)
        n_tiles = cn_ref[row, c0 + 8].astype(jnp.int32)
        tbase = cn_ref[row, c0 + 9].astype(jnp.int32)

        va0 = (mn0 - o0) * dinv0
        vb0 = (mx0 - o0) * dinv0
        va1 = (mn1 - o1) * dinv1
        vb1 = (mx1 - o1) * dinv1
        va2 = (mn2 - o2) * dinv2
        vb2 = (mx2 - o2) * dinv2
        tmin = jnp.maximum(
            jnp.maximum(jnp.minimum(va0, vb0), jnp.minimum(va1, vb1)),
            jnp.minimum(va2, vb2),
        )
        tmax = jnp.minimum(
            jnp.minimum(jnp.maximum(va0, vb0), jnp.maximum(va1, vb1)),
            jnp.maximum(va2, vb2),
        )
        tb = res_ref[R_T]
        hit = (tmin - EPSILON <= tmax) & (tmax >= -EPSILON) & (
            tmin - EPSILON <= tb
        )
        # ONE vector->scalar sync: an 8-bit mask of rowgroups with any hit
        rg_any = jnp.max(hit.astype(jnp.float32), axis=1, keepdims=True)
        mask = jnp.sum(rg_any * rg_pow).astype(jnp.int32)
        any_hit = mask > 0
        is_leaf = n_tiles > 0

        @pl.when(any_hit & is_leaf)
        def _():
            for rg in range(CH_SUB):

                @pl.when(((mask >> rg) & 1) > 0)
                def _():
                    leaf_visit(rg, tbase)

        nxt = jnp.where(any_hit & (n_tiles == 0), hit_enc, miss)
        if occlusion and dist is not None:
            # abandon once every ray is blocked closer than its light
            # sample; t only changes at leaves, so check there only.
            def _check(nxt0):
                tb2 = res_ref[R_T]
                still = jnp.max((tb2 >= dist - EPSILON).astype(jnp.float32))
                return jnp.where(still == 0.0, jnp.int32(-1), nxt0)

            nxt = lax.cond(any_hit & is_leaf, _check, lambda x: x, nxt)
        return nxt

    lax.while_loop(cond, body, jnp.int32(0))


def cluster_fan_and_near(
    cn_ref,
    ct_ref,
    cuv_ref,
    sph_ref,
    res_ref,
    o_f,
    ds,
    dists,
    o_n,
    d_n,
    *,
    n_sph,
    mask=None,
    textured,
    tpg=1,
    groups=1,
    fan_base=N_RES,
):
    """Fused NEE-fan occlusion + next-ray nearest hit in ONE tree walk
    (the clustered analogue of megakernel._fan_and_nearest).

    The regen iteration's two cluster walks — the S-ray shadow fan from the
    current vertex (`cluster_occlude_fan`) and the next ray's nearest hit
    (`cluster_query_chunk`) — traverse the SAME tree from nearly the same
    origins, so their node sets overlap heavily. One walk over the union

    - chases the threaded miss-links and fetches each node's 10 scalars
      ONCE instead of twice,
    - issues ONE vector→scalar rowgroup-mask sync per node instead of two
      (the sync serializes the scalar core against the VPU — with the
      shaft-culled fan the per-node vector work is small, so the sync is a
      large fraction of every node step),
    - shares each sphere row's scalar loads between the fan tests and the
      nearest-t accumulation.

    Per-(ray, primitive) arithmetic is copied verbatim from the two
    standalone walks and every leaf predicate is exact, so over-visiting
    (a node entered for the fan but not the nearest ray, or vice versa)
    only adds tests that lose — results are bitwise-identical to the
    two-walk schedule (MCPT_MEGA_ABLATE=unmerged restores it for A/Bs).

    Fan blocked flags land in res_ref[fan_base + si]; nearest results in
    res_ref[R_T..R_SPH] exactly like cluster_query_chunk(occlusion=False).
    The nearest ray's per-node slab cull keeps its running-t bound
    (Bounds3.hpp:95-108 semantics); the fan keeps the shaft-AABB scalar
    prescreen — a node outside the shaft skips ALL fan vector work via a
    zero rowgroup-mask branch, while the nearest slab still runs.
    """
    fo0, fo1, fo2 = o_f
    no0, no1, no2 = o_n
    nd0, nd1, nd2 = d_n
    s_cnt = len(ds)
    zero = jnp.zeros((CH_SUB, 128), jnp.float32)
    for si in range(s_cnt):
        res_ref[fan_base + si] = zero
    xs = [
        dists[si] - jnp.maximum(EPSILON, REL_EPS * dists[si])
        for si in range(s_cnt)
    ]
    dinv = [
        (1.0 / ds[si][0], 1.0 / ds[si][1], 1.0 / ds[si][2])
        for si in range(s_cnt)
    ]
    ndinv0 = 1.0 / nd0
    ndinv1 = 1.0 / nd1
    ndinv2 = 1.0 / nd2
    subl = jax.lax.broadcasted_iota(jnp.int32, (TILE, 128), 0)
    rg_pow = jnp.exp2(
        jax.lax.broadcasted_iota(jnp.int32, (CH_SUB, 1), 0).astype(jnp.float32)
    )

    # ---- shaft AABB over the fan's {origins} ∪ {targets} (see
    # cluster_occlude_fan; mask excludes dead lanes' garbage origins)
    big = jnp.float32(3.0e37)
    if mask is None:
        mask = jnp.ones_like(fo0) > 0.5
    shaft_min = []
    shaft_max = []
    for k in range(3):
        comps = [o_f[k]] + [
            o_f[k] + ds[si][k] * dists[si] for si in range(s_cnt)
        ]
        lo = jnp.float32(big)
        hi = jnp.float32(-big)
        for c in comps:
            lo = jnp.minimum(lo, jnp.min(jnp.where(mask, c, big)))
            hi = jnp.maximum(hi, jnp.max(jnp.where(mask, c, -big)))
        shaft_min.append(lo - EPSILON)
        shaft_max.append(hi + EPSILON)

    # ---- brute spheres: ONE loop seeds the nearest accumulators AND the
    # fan blocked flags (per-row scalar loads shared; per-query math is
    # verbatim cluster_query_chunk / cluster_occlude_fan)
    a = nd0 * nd0 + nd1 * nd1 + nd2 * nd2
    a_ok = a > 1e-12
    a_safe = jnp.maximum(a, 1e-12)
    t0 = jnp.full((CH_SUB, 128), T_MAX, jnp.float32)

    def sphb(s, acc):
        tb, sm, se, sx, sy, sz, sf = acc
        cx = sph_ref[s, 0]
        cy = sph_ref[s, 1]
        cz = sph_ref[s, 2]
        r = sph_ref[s, 3]
        # nearest (general-a q-form, _sph_t_bundle math)
        t_c = _sph_t_bundle(sph_ref, s, o_n, d_n, a_ok, a_safe)
        bt = t_c < tb
        # fan (unit dirs => a = 1)
        l0 = fo0 - cx
        l1 = fo1 - cy
        l2 = fo2 - cz
        cq = l0 * l0 + l1 * l1 + l2 * l2 - r * r
        r_ok = r > 0.0
        for si in range(s_cnt):
            d0, d1, d2 = ds[si]
            hb = d0 * l0 + d1 * l1 + d2 * l2
            disc = hb * hb - cq
            ok = (disc >= 0.0) & r_ok
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            q = jnp.where(hb > 0.0, -(hb + sq), -(hb - sq))
            qs_ = jnp.where(jnp.abs(q) > 1e-10, q, 1.0)
            lo = jnp.minimum(q, cq / qs_)
            hi = jnp.maximum(q, cq / qs_)
            t = jnp.where(lo < 0.0, hi, lo)
            ok &= (t >= 0.0) & (t < xs[si])
            res_ref[fan_base + si] = jnp.maximum(
                res_ref[fan_base + si], ok.astype(jnp.float32)
            )
        return (
            jnp.where(bt, t_c, tb),
            jnp.where(bt, sph_ref[s, 4], sm),
            jnp.where(bt, sph_ref[s, 5], se),
            jnp.where(bt, cx, sx),
            jnp.where(bt, cy, sy),
            jnp.where(bt, cz, sz),
            jnp.where(bt, 1.0, sf),
        )

    tb, sm, se, sx, sy, sz, sf = lax.fori_loop(
        0, n_sph, sphb, (t0,) + (zero,) * 6
    )
    res_ref[R_T] = tb
    res_ref[R_MAT] = sm
    res_ref[R_EM] = se
    res_ref[R_N0] = sx
    res_ref[R_N1] = sy
    res_ref[R_N2] = sz
    res_ref[R_SPH] = sf
    res_ref[R_UVX] = zero
    res_ref[R_UVY] = zero

    def leaf_near(rg, gbase):
        # verbatim cluster_query_chunk.leaf_visit (occlusion=False)
        ro0 = jax.lax.slice_in_dim(no0, rg, rg + 1, axis=0)
        ro1 = jax.lax.slice_in_dim(no1, rg, rg + 1, axis=0)
        ro2 = jax.lax.slice_in_dim(no2, rg, rg + 1, axis=0)
        rd0 = jax.lax.slice_in_dim(nd0, rg, rg + 1, axis=0)
        rd1 = jax.lax.slice_in_dim(nd1, rg, rg + 1, axis=0)
        rd2 = jax.lax.slice_in_dim(nd2, rg, rg + 1, axis=0)
        acc_t = res_ref[R_T, rg : rg + 1, :]
        acc = {
            k: res_ref[k, rg : rg + 1, :]
            for k in (R_N0, R_N1, R_N2, R_MAT, R_EM, R_SPH, R_UVX, R_UVY)
        }
        for gg in range(groups):
            blk = ct_ref[pl.ds((gbase + gg) * TILE, TILE), :]
            if textured:
                uvb = cuv_ref[pl.ds((gbase + gg) * TILE, TILE), :]
            for j in range(tpg):
                c = j * 16
                dp2 = (
                    rd0 * blk[:, c + 6 : c + 7]
                    + rd1 * blk[:, c + 7 : c + 8]
                    + rd2 * blk[:, c + 8 : c + 9]
                )
                op2 = (
                    ro0 * blk[:, c + 6 : c + 7]
                    + ro1 * blk[:, c + 7 : c + 8]
                    + ro2 * blk[:, c + 8 : c + 9]
                    - blk[:, c + 11 : c + 12]
                )
                nr2 = blk[:, c + 12 : c + 13]
                det = -(dp2 * nr2)
                okd = jnp.abs(det) >= EPSILON
                t_hit = op2 * nr2 / jnp.where(okd, det, 1.0)
                dp0 = (
                    rd0 * blk[:, c + 0 : c + 1]
                    + rd1 * blk[:, c + 1 : c + 2]
                    + rd2 * blk[:, c + 2 : c + 3]
                )
                op0 = (
                    ro0 * blk[:, c + 0 : c + 1]
                    + ro1 * blk[:, c + 1 : c + 2]
                    + ro2 * blk[:, c + 2 : c + 3]
                    - blk[:, c + 9 : c + 10]
                )
                u = op0 + t_hit * dp0
                dp1 = (
                    rd0 * blk[:, c + 3 : c + 4]
                    + rd1 * blk[:, c + 4 : c + 5]
                    + rd2 * blk[:, c + 5 : c + 6]
                )
                op1 = (
                    ro0 * blk[:, c + 3 : c + 4]
                    + ro1 * blk[:, c + 4 : c + 5]
                    + ro2 * blk[:, c + 5 : c + 6]
                    - blk[:, c + 10 : c + 11]
                )
                v = op1 + t_hit * dp1
                ok = (
                    okd
                    & (u >= 0.0)
                    & (u <= 1.0)
                    & (v >= 0.0)
                    & (u + v <= 1.0)
                    & (t_hit >= 0.0)
                    & (blk[:, c + 13 : c + 14] > 0.5)
                )
                t_cand = jnp.where(ok, t_hit, T_MAX)
                tmin8 = jnp.min(t_cand, axis=0, keepdims=True)
                better = tmin8 < acc_t
                is_min = t_cand == tmin8
                pick = jnp.min(
                    jnp.where(is_min, subl, jnp.int32(TILE)),
                    axis=0,
                    keepdims=True,
                )
                sel = (subl == pick).astype(jnp.float32)

                def pick_col(col):
                    return jnp.sum(sel * col, axis=0, keepdims=True)

                s_nr = jnp.sqrt(jnp.maximum(nr2, 0.0))
                acc_t = jnp.where(better, tmin8, acc_t)

                def upd(k, val):
                    acc[k] = jnp.where(better, val, acc[k])

                upd(R_N0, pick_col(blk[:, c + 6 : c + 7] * s_nr))
                upd(R_N1, pick_col(blk[:, c + 7 : c + 8] * s_nr))
                upd(R_N2, pick_col(blk[:, c + 8 : c + 9] * s_nr))
                upd(
                    R_MAT,
                    pick_col(
                        jnp.broadcast_to(
                            blk[:, c + 14 : c + 15], (TILE, 128)
                        )
                    ),
                )
                upd(
                    R_EM,
                    pick_col(
                        jnp.broadcast_to(
                            blk[:, c + 15 : c + 16], (TILE, 128)
                        )
                    ),
                )
                upd(R_SPH, jnp.zeros((1, 128), jnp.float32))
                if textured:
                    u_s = jnp.sum(sel * u, axis=0, keepdims=True)
                    v_s = jnp.sum(sel * v, axis=0, keepdims=True)
                    w_s = 1.0 - u_s - v_s

                    def uv_col(cc):
                        return pick_col(
                            jnp.broadcast_to(
                                uvb[:, j * 8 + cc : j * 8 + cc + 1],
                                (TILE, 128),
                            )
                        )

                    uvx = w_s * uv_col(0) + u_s * uv_col(2) + v_s * uv_col(4)
                    uvy = w_s * uv_col(1) + u_s * uv_col(3) + v_s * uv_col(5)
                    upd(R_UVX, uvx)
                    upd(R_UVY, uvy)
        res_ref[R_T, rg : rg + 1, :] = acc_t
        for k in (R_N0, R_N1, R_N2, R_MAT, R_EM, R_SPH, R_UVX, R_UVY):
            res_ref[k, rg : rg + 1, :] = acc[k]

    def leaf_fan(rg, gbase, smask):
        # verbatim cluster_occlude_fan.leaf_visit, rows at fan_base
        ro0 = jax.lax.slice_in_dim(fo0, rg, rg + 1, axis=0)
        ro1 = jax.lax.slice_in_dim(fo1, rg, rg + 1, axis=0)
        ro2 = jax.lax.slice_in_dim(fo2, rg, rg + 1, axis=0)
        for gg in range(groups):
            blk = ct_ref[pl.ds((gbase + gg) * TILE, TILE), :]
            for j in range(tpg):
                c = j * 16
                nr2 = blk[:, c + 12 : c + 13]
                op2 = (
                    ro0 * blk[:, c + 6 : c + 7]
                    + ro1 * blk[:, c + 7 : c + 8]
                    + ro2 * blk[:, c + 8 : c + 9]
                    - blk[:, c + 11 : c + 12]
                )
                op0 = (
                    ro0 * blk[:, c + 0 : c + 1]
                    + ro1 * blk[:, c + 1 : c + 2]
                    + ro2 * blk[:, c + 2 : c + 3]
                    - blk[:, c + 9 : c + 10]
                )
                op1 = (
                    ro0 * blk[:, c + 3 : c + 4]
                    + ro1 * blk[:, c + 4 : c + 5]
                    + ro2 * blk[:, c + 5 : c + 6]
                    - blk[:, c + 10 : c + 11]
                )
                q = op2 * nr2
                for si in range(s_cnt):

                    @pl.when(((smask >> si) & 1) > 0)
                    def _():
                        d0 = jax.lax.slice_in_dim(
                            ds[si][0], rg, rg + 1, axis=0
                        )
                        d1 = jax.lax.slice_in_dim(
                            ds[si][1], rg, rg + 1, axis=0
                        )
                        d2 = jax.lax.slice_in_dim(
                            ds[si][2], rg, rg + 1, axis=0
                        )
                        x_d = jax.lax.slice_in_dim(xs[si], rg, rg + 1, axis=0)
                        dp2 = (
                            d0 * blk[:, c + 6 : c + 7]
                            + d1 * blk[:, c + 7 : c + 8]
                            + d2 * blk[:, c + 8 : c + 9]
                        )
                        det = -(dp2 * nr2)
                        dets = jnp.abs(det)
                        qs = jnp.where(det < 0.0, -q, q)
                        dp0 = (
                            d0 * blk[:, c + 0 : c + 1]
                            + d1 * blk[:, c + 1 : c + 2]
                            + d2 * blk[:, c + 2 : c + 3]
                        )
                        u_s = op0 * dets + qs * dp0
                        dp1 = (
                            d0 * blk[:, c + 3 : c + 4]
                            + d1 * blk[:, c + 4 : c + 5]
                            + d2 * blk[:, c + 5 : c + 6]
                        )
                        v_s = op1 * dets + qs * dp1
                        m = jnp.minimum(
                            jnp.minimum(qs, dets - EPSILON),
                            jnp.minimum(
                                jnp.minimum(u_s, v_s), dets - (u_s + v_s)
                            ),
                        )
                        blocked8 = (m >= 0.0) & (x_d * dets - qs > 0.0)
                        hit_any = jnp.max(
                            blocked8.astype(jnp.float32),
                            axis=0,
                            keepdims=True,
                        )
                        cur = res_ref[fan_base + si, rg : rg + 1, :]
                        res_ref[fan_base + si, rg : rg + 1, :] = jnp.maximum(
                            cur, hit_any
                        )
    # ---- paired lockstep walk: the fan and the nearest query each chase
    # their OWN node sequence (exactly the nodes the standalone walks
    # visit — a union walk was measured 4.7% SLOWER: the fan points at the
    # light while the bounce ray points elsewhere, so the union over-visits
    # and every node pays both queries' vector work). Advancing both walks
    # in one straight-line loop trip instead lets the two dependency
    # chains interleave on the scalar core / VPU, and the two rowgroup
    # masks ride ONE vector→scalar sync per trip (encoded in one scalar:
    # low byte = nearest, high byte = fan): trips = max(N_fan, N_near)
    # instead of N_fan + N_near at ~the per-trip cost of one walk. A walk
    # that finishes first parks at node 0 with its effects masked until
    # the other drains.

    def _fetch(enc):
        row = enc >> 7
        c0 = enc & 127
        return (
            cn_ref[row, c0 + 0],
            cn_ref[row, c0 + 1],
            cn_ref[row, c0 + 2],
            cn_ref[row, c0 + 3],
            cn_ref[row, c0 + 4],
            cn_ref[row, c0 + 5],
            cn_ref[row, c0 + 6].astype(jnp.int32),
            cn_ref[row, c0 + 7].astype(jnp.int32),
            cn_ref[row, c0 + 8].astype(jnp.int32),
            cn_ref[row, c0 + 9].astype(jnp.int32),
        )

    def cond(c):
        return (c[0] >= 0) | (c[1] >= 0)

    def body(c):
        nf, nn = c
        fval = nf >= 0
        nval = nn >= 0
        (fmn0, fmn1, fmn2, fmx0, fmx1, fmx2, fmiss, fhit_enc, fnt, ftb) = (
            _fetch(jnp.maximum(nf, 0))
        )
        (mn0, mn1, mn2, mx0, mx1, mx2, miss, hit_enc, n_tiles, tbase) = (
            _fetch(jnp.maximum(nn, 0))
        )

        # nearest-ray slab with running-t cull (Bounds3.hpp:95-108)
        va0 = (mn0 - no0) * ndinv0
        vb0 = (mx0 - no0) * ndinv0
        va1 = (mn1 - no1) * ndinv1
        vb1 = (mx1 - no1) * ndinv1
        va2 = (mn2 - no2) * ndinv2
        vb2 = (mx2 - no2) * ndinv2
        tmin = jnp.maximum(
            jnp.maximum(jnp.minimum(va0, vb0), jnp.minimum(va1, vb1)),
            jnp.minimum(va2, vb2),
        )
        tmax = jnp.minimum(
            jnp.minimum(jnp.maximum(va0, vb0), jnp.maximum(va1, vb1)),
            jnp.maximum(va2, vb2),
        )
        tb2 = res_ref[R_T]
        hit_n = (
            (tmin - EPSILON <= tmax)
            & (tmax >= -EPSILON)
            & (tmin - EPSILON <= tb2)
        )
        rg_near = jnp.max(
            hit_n.astype(jnp.float32), axis=1, keepdims=True
        ) * jnp.where(nval, 1.0, 0.0)

        # fan slabs, masked by the scalar shaft prescreen (a node disjoint
        # from the fan's shaft AABB cannot contain a blocker; computing the
        # slabs unconditionally keeps the body straight-line — the union
        # descent rarely reaches shaft-culled nodes anyway)
        shaft_ok = (
            fval
            & (fmn0 <= shaft_max[0])
            & (fmx0 >= shaft_min[0])
            & (fmn1 <= shaft_max[1])
            & (fmx1 >= shaft_min[1])
            & (fmn2 <= shaft_max[2])
            & (fmx2 >= shaft_min[2])
        )
        rg_fan = jnp.zeros((CH_SUB, 1), jnp.float32)
        for si in range(s_cnt):
            iv0, iv1, iv2 = dinv[si]
            fa0 = (fmn0 - fo0) * iv0
            fb0 = (fmx0 - fo0) * iv0
            fa1 = (fmn1 - fo1) * iv1
            fb1 = (fmx1 - fo1) * iv1
            fa2 = (fmn2 - fo2) * iv2
            fb2 = (fmx2 - fo2) * iv2
            ftmin = jnp.maximum(
                jnp.maximum(jnp.minimum(fa0, fb0), jnp.minimum(fa1, fb1)),
                jnp.minimum(fa2, fb2),
            )
            ftmax = jnp.minimum(
                jnp.minimum(jnp.maximum(fa0, fb0), jnp.maximum(fa1, fb1)),
                jnp.maximum(fa2, fb2),
            )
            live = res_ref[fan_base + si] < 0.5
            hit = (
                (ftmin - EPSILON <= ftmax)
                & (ftmax >= -EPSILON)
                & (ftmin - EPSILON <= xs[si])
                & live
            )
            rg_si = jnp.max(hit.astype(jnp.float32), axis=1, keepdims=True)
            rg_fan = jnp.maximum(rg_fan, rg_si)
        rg_fan = rg_fan * jnp.where(shaft_ok, 1.0, 0.0)

        # ONE sync for both walks: low byte = nearest mask, high = fan mask
        rgm = jnp.sum(
            (rg_near + 256.0 * rg_fan) * rg_pow
        ).astype(jnp.int32)
        m_near = rgm & 255
        m_fan = rgm >> 8
        any_n = m_near > 0
        any_f = m_fan > 0
        leaf_n = n_tiles > 0
        leaf_f = fnt > 0
        smask = jnp.int32(-1 if s_cnt >= 32 else (1 << s_cnt) - 1)

        @pl.when(any_n & leaf_n)
        def _():
            for rg in range(CH_SUB):

                @pl.when(((m_near >> rg) & 1) > 0)
                def _():
                    leaf_near(rg, tbase)

        @pl.when(any_f & leaf_f)
        def _():
            for rg in range(CH_SUB):

                @pl.when(((m_fan >> rg) & 1) > 0)
                def _():
                    leaf_fan(rg, ftb, smask)

        nxt_n = jnp.where(
            nval, jnp.where(any_n & (n_tiles == 0), hit_enc, miss), -1
        )
        nxt_f = jnp.where(
            fval, jnp.where(any_f & (fnt == 0), fhit_enc, fmiss), -1
        )
        return (nxt_f, nxt_n)

    lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(0)))
