"""Fused whole-path Pallas kernel: the entire Kajiya trace in one launch.

Second-generation TPU megakernel (supersedes the original one-kernel-per-
bounce design, since removed).  Two measured facts drove the redesign:

* a [1, 1024] ray row occupies one (8, 128) VMEM tile with 7/8 of its
  sublanes padding — a trivial kernel over 2025 such rows costs 4.7 ms at
  1080p in pure per-step overhead;
* dense [8, 1024] tiles with the pairwise search as 3D [prims, 8, 1024]
  broadcasts run the same arithmetic at full VPU rate (~30x faster).

So rays live on full (8, 1024) tiles — S=8 sublanes x L=1024 lanes = 8192
rays per grid step — and the WHOLE bounce loop runs inside one kernel
(unrolled, groups of <=8 bounces), so between bounces nothing ray-sized
touches HBM at all.  Ray generation (pixel decode, AA jitter, all three
reference camera models — assets/shaders/camera.glsl:29-99) can also run
in-kernel for the display path, making the film the only ray-sized HBM
traffic of a frame.

This is the TPU re-design of the reference's per-pixel GLSL megakernel
(assets/shaders/compute_pass.comp + integrators.glsl:547-677): same bounce
semantics — closest-hit over every primitive family, winner-attribute
select, emission/sky accumulation, normal flip + eta handling, Lambert/
mirror/dielectric dispatch with the stochastic Fresnel branch, counter-based
RNG keyed (pixel, frame, salt) — identical sampling decisions to the XLA
integrators up to fma rounding.

The gradient pairing (ops.fast_grad) saves per-bounce input states + hit
records from the forward and runs `bwd_path` — the whole-chain pullback as
ONE kernel: per bounce (reversed, unrolled) it rebuilds the differentiable
replay from the recorded (family, index) and applies ``jax.vjp`` inside the
kernel trace; scene-table cotangents are masked sublane+lane reductions
accumulated across the sequential grid.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..scene.scene import Scene
from .intersect import triangle_precompute

S = 8      # ray sublanes per tile
L = 1024   # ray lanes per tile
TILE = S * L
MAX_GROUP = 8   # bounces unrolled per kernel launch
TRI_CHUNK = 16  # triangle rows per search step (bounds [T,S,L] temps)

# Cluster-culled mesh path (SMEM-resident triangles; see pack_cull).
CULL_K = 16        # triangles per cluster (leaf-order window)
CULL_G = 64        # clusters per supergroup
CULL_MAX_TRIS = 8192   # SMEM capacity bound (17 f32 tables, measured on v5e)

_BIG = 3.0e38
_DENOM_EPS = 1e-30
_TWO_PI = 6.283185307179586
_EPSILON = 5e-3  # surface offset (compute_pass.comp:9)
_WHITE = (1.0, 1.0, 1.0)
_BLUE = (0.2, 0.3, 0.7)   # sky gradient (integrators.glsl:570-571)

TRI_FIELDS = (
    "nx", "ny", "nz", "e0x", "e0y", "e0z", "e1x", "e1y", "e1z",
    "v0n", "v0e0", "v0e1", "g00", "g11", "g01", "inv_det", "mat",
)
SPH_FIELDS = ("cx", "cy", "cz", "rad", "mat")
PLN_FIELDS = ("nx", "ny", "nz", "doff", "mat")
MAT_FIELDS = ("ar", "ag", "ab", "er", "eg", "eb", "ior", "kind")

# Raw (vertex-level) differentiable tables for the backward.
DIFF_FIELDS = (
    "tv0x", "tv0y", "tv0z", "tv1x", "tv1y", "tv1z", "tv2x", "tv2y", "tv2z",
    "scx", "scy", "scz", "srad",
    "pnx", "pny", "pnz", "pd",
    "mar", "mag", "mab", "mer", "meg", "meb", "mior",
)
NONDIFF_FIELDS = ("tmat", "smat", "pmat", "mkind")

# Camera parameter vector layout (SMEM f32[24]).
CAM_M = 0          # 0..15: camera matrix, row-major (camera.cpp:132-155)
CAM_ASPECT = 16
CAM_PROJ = 17      # pinhole: 1/tan(hfov/2); ortho: scale
CAM_INV_W = 18
CAM_INV_H = 19
CAM_W = 20
PINHOLE, ORTHO, SPHERICAL = 0, 1, 2


def _col(arr, align=8, fill=0.0):
    """[rows] -> [rows_padded, 1, 1] f32 column for 3D broadcasting."""
    arr = jnp.asarray(arr, jnp.float32)
    n = arr.shape[0]
    pad = (-n) % align if n else align
    if pad:
        arr = jnp.concatenate([arr, jnp.full((pad,), fill, jnp.float32)])
    return arr.reshape(-1, 1, 1)


def _tri_fields(scene: Scene) -> dict:
    """Flat [T] per-triangle search fields (precomputed metric-tensor form,
    assets/shaders/intersection.glsl:267-323) — shared by the VMEM row path
    and the SMEM culled path so both round identically."""
    pre = triangle_precompute(scene.tri_v0, scene.tri_v1, scene.tri_v2)
    return dict(
        nx=pre["n"][:, 0], ny=pre["n"][:, 1], nz=pre["n"][:, 2],
        e0x=pre["e0"][:, 0], e0y=pre["e0"][:, 1], e0z=pre["e0"][:, 2],
        e1x=pre["e1"][:, 0], e1y=pre["e1"][:, 1], e1z=pre["e1"][:, 2],
        v0n=pre["v0n"], v0e0=pre["v0e0"], v0e1=pre["v0e1"],
        g00=pre["g00"], g11=pre["g11"], g01=pre["g01"],
        inv_det=pre["inv_det"], mat=scene.tri_mat.astype(jnp.float32),
    )


def pack_cull(scene: Scene) -> tuple[tuple, dict]:
    """SMEM tables for the cluster-culled mesh path.

    The VMEM row layout costs one (8,128) tile — 4 KB — per triangle scalar,
    capping the row path near 1k triangles.  Meshes instead keep their
    triangle tables *dense in SMEM* (scalar loads broadcast to the VPU for
    free) and cull work per ray tile: leaf-ordered triangles are windowed
    into clusters of CULL_K with AABBs, clusters into supergroups of CULL_G,
    and the kernel slab-tests supergroup→cluster boxes against the live rays
    to build a compacted cluster work list before any triangle math runs.

    Requires a BVH-attached scene (triangles already permuted into leaf
    order, bvh.h:72-79, so consecutive windows are spatially tight).

    Returns (17 flat f32[Tp] triangle tables + 12 bound tables, meta).
    """
    t = scene.num_triangles
    if not (0 < t <= CULL_MAX_TRIS):
        raise ValueError(f"culled path supports 1..{CULL_MAX_TRIS} triangles")
    tp = -(-t // CULL_K) * CULL_K
    fields = _tri_fields(scene)

    def flat(a):
        a = jnp.asarray(a, jnp.float32)
        return jnp.pad(a, (0, tp - t)) if tp != t else a

    tri_tabs = tuple(flat(fields[k]) for k in TRI_FIELDS)

    bmin = jnp.minimum(jnp.minimum(scene.tri_v0, scene.tri_v1), scene.tri_v2)
    bmax = jnp.maximum(jnp.maximum(scene.tri_v0, scene.tri_v1), scene.tri_v2)
    eps = 1e-4 * jnp.max(bmax) - 1e-4 * jnp.min(bmin) + 1e-6
    # Padded triangles collapse to the last real one's bounds (never grow).
    pad_tri = ((0, tp - t), (0, 0))
    bmin = jnp.pad(bmin, pad_tri, mode="edge")
    bmax = jnp.pad(bmax, pad_tri, mode="edge")
    n_clu = tp // CULL_K
    cb0 = jnp.min(bmin.reshape(n_clu, CULL_K, 3), axis=1) - eps
    cb1 = jnp.max(bmax.reshape(n_clu, CULL_K, 3), axis=1) + eps
    n_sup = -(-n_clu // CULL_G)
    pad_c = ((0, n_sup * CULL_G - n_clu), (0, 0))
    sb0 = jnp.min(jnp.pad(cb0, pad_c, mode="edge").reshape(n_sup, CULL_G, 3),
                  axis=1)
    sb1 = jnp.max(jnp.pad(cb1, pad_c, mode="edge").reshape(n_sup, CULL_G, 3),
                  axis=1)
    bound_tabs = tuple(a[:, k] for a in (sb0, sb1) for k in range(3)) + tuple(
        a[:, k] for a in (cb0, cb1) for k in range(3)
    )
    meta = dict(n_clu=n_clu, n_sup=n_sup, num_tri=t)
    return tri_tabs + bound_tabs, meta


def pack_fwd(scene: Scene, culled: bool = False) -> tuple[tuple, dict]:
    """Forward search tables (precomputed triangle form) as [rows,1,1].

    With ``culled`` the triangle family is excluded (it lives in SMEM via
    pack_cull); only spheres/planes/materials are packed."""
    t, s, p = scene.num_triangles, scene.num_spheres, scene.num_planes
    if t and not culled:
        tri = _tri_fields(scene)
    else:
        tri = {k: jnp.zeros((1,), jnp.float32) for k in TRI_FIELDS}
    chunk = min(-(-max(t, 1) // 8) * 8, TRI_CHUNK) if not culled else 8
    tri_cols = tuple(_col(tri[k], align=chunk) for k in TRI_FIELDS)

    if s:
        sph = dict(cx=scene.sph_center[:, 0], cy=scene.sph_center[:, 1],
                   cz=scene.sph_center[:, 2], rad=scene.sph_radius,
                   mat=scene.sph_mat.astype(jnp.float32))
    else:
        sph = {k: jnp.zeros((1,), jnp.float32) for k in SPH_FIELDS}
    sph_cols = tuple(_col(sph[k]) for k in SPH_FIELDS)

    if p:
        pln = dict(nx=scene.pln_normal[:, 0], ny=scene.pln_normal[:, 1],
                   nz=scene.pln_normal[:, 2], doff=scene.pln_d,
                   mat=scene.pln_mat.astype(jnp.float32))
    else:
        pln = {k: jnp.zeros((1,), jnp.float32) for k in PLN_FIELDS}
    pln_cols = tuple(_col(pln[k]) for k in PLN_FIELDS)

    m = scene.materials
    if m.count:
        mats = dict(ar=m.albedo[:, 0], ag=m.albedo[:, 1], ab=m.albedo[:, 2],
                    er=m.emission[:, 0], eg=m.emission[:, 1],
                    eb=m.emission[:, 2], ior=m.ior,
                    kind=m.kind.astype(jnp.float32))
    else:
        mats = {k: jnp.zeros((1,), jnp.float32) for k in MAT_FIELDS}
        mats["ior"] = jnp.ones((1,), jnp.float32)
    mat_cols = tuple(_col(mats[k]) for k in MAT_FIELDS)

    meta = dict(
        tri_chunk=chunk, tri_rows=tri_cols[0].shape[0],
        sph_rows=sph_cols[0].shape[0], pln_rows=pln_cols[0].shape[0],
        mat_rows=mat_cols[0].shape[0],
        has_tri=t > 0 and not culled, has_sph=s > 0, has_pln=p > 0,
        culled=False,
    )
    return tri_cols + sph_cols + pln_cols + mat_cols, meta


def pack_bwd(scene: Scene) -> tuple[tuple, dict]:
    """Raw differentiable tables + id tables for the pullback."""
    t, s, p = scene.num_triangles, scene.num_spheres, scene.num_planes
    m = scene.materials.count

    def fam(n, comps, matcol):
        if n:
            return comps, matcol
        return (tuple(jnp.zeros((1,), jnp.float32) for _ in comps),
                jnp.zeros((1,), jnp.float32))

    tri, tmat = fam(
        t,
        tuple(scene.tri_v0[:, k] for k in range(3))
        + tuple(scene.tri_v1[:, k] for k in range(3))
        + tuple(scene.tri_v2[:, k] for k in range(3)),
        scene.tri_mat.astype(jnp.float32) if t else None,
    )
    sph, smat = fam(
        s, tuple(scene.sph_center[:, k] for k in range(3)) + (scene.sph_radius,),
        scene.sph_mat.astype(jnp.float32) if s else None,
    )
    pln, pmat = fam(
        p, tuple(scene.pln_normal[:, k] for k in range(3)) + (scene.pln_d,),
        scene.pln_mat.astype(jnp.float32) if p else None,
    )
    if m:
        mats = (scene.materials.albedo[:, 0], scene.materials.albedo[:, 1],
                scene.materials.albedo[:, 2],
                scene.materials.emission[:, 0], scene.materials.emission[:, 1],
                scene.materials.emission[:, 2], scene.materials.ior)
        mkind = scene.materials.kind.astype(jnp.float32)
    else:
        mats = tuple(jnp.zeros((1,), jnp.float32) for _ in range(7))
        mkind = jnp.zeros((1,), jnp.float32)

    diff = tuple(_col(c) for c in tri + sph + pln + mats)
    nondiff = tuple(_col(c) for c in (tmat, smat, pmat, mkind))
    meta = dict(
        tri_rows=diff[0].shape[0], sph_rows=diff[9].shape[0],
        pln_rows=diff[13].shape[0], mat_rows=diff[17].shape[0],
        num_tri=t, num_sph=s, num_pln=p, num_mat=max(m, 1),
        has_tri=t > 0, has_sph=s > 0, has_pln=p > 0,
    )
    return diff + nondiff, meta


def _pcg3d(x, y, z):
    M = jnp.uint32(1664525)
    A = jnp.uint32(1013904223)
    x = x * M + A
    y = y * M + A
    z = z * M + A
    x = x + y * z
    y = y + z * x
    z = z + x * y
    x = x ^ (x >> 16)
    y = y ^ (y >> 16)
    z = z ^ (z >> 16)
    x = x + y * z
    y = y + z * x
    z = z + x * y
    return x, y, z


def _unit(bits):
    # Mosaic lacks a u32->f32 cast; the top 24 bits fit in i32.  lax's
    # bitcast (not pltpu's) lowers both in-kernel AND as a plain XLA op —
    # the big-mesh mode drivers run this same shading math between chunked
    # launches, where pltpu.bitcast has no evaluation rule.
    shifted = jax.lax.bitcast_convert_type(bits >> jnp.uint32(8), jnp.int32)
    return shifted.astype(jnp.float32) * jnp.float32(1.0 / 16777216.0)


def _safe_div(num, den):
    return num / jnp.where(jnp.abs(den) < _DENOM_EPS, _DENOM_EPS, den)


def _rsqrt_safe(x):
    return jax.lax.rsqrt(jnp.maximum(x, 1e-30))


def _rng(pix, frame, salt):
    a, b, c = _pcg3d(pix, frame, jnp.asarray(salt, jnp.uint32))
    return _unit(a), _unit(b), _unit(c)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _culled_tris(cull, meta, ox, oy, oz, dx, dy, dz, mint, live,
                 scratch, carry, tri_base=0):
    """Cluster-culled triangle closest-hit for SMEM-resident meshes.

    Phase 1 walks supergroup→cluster AABBs with per-lane slab tests against
    the live ray tile and appends hit cluster ids to a compacted SMEM work
    list; phase 2 runs the metric-tensor triangle test per triangle of each
    listed cluster, with every per-triangle scalar loaded from SMEM (a free
    broadcast on the VPU), re-pruning each cluster against the tightening
    per-lane ``t_best`` first.  Folds into the winner carry like the row
    path.

    Two cheap refinements (both measured):
    * lanes whose rays miss the mesh ROOT AABB are masked out of every
      listing test — a sky ray can never gain from any cluster;
    * _search runs planes/spheres BEFORE this walk, so their hits give every
      lane a t_best ceiling entering phase 2 and the ``tmax`` re-prune fires
      from the first cluster.

    Measured negative results (reverted; see BASELINE.md): near-first
    ordering of the work list via counting sort + an early break once every
    live lane's winner beats the next cluster's entry bound.  Per-tile stats
    at 1080p/8 bounces (subdiv-3 icosphere): ~25 of 81 clusters listed, the
    break fired on 0.4%, ordering improved the t_best re-prune only 25→21
    still-passed — less than the sort + per-cluster reduce cost (172 →
    222 ms/frame).  The union of clusters needed by 8192 rays per tile is
    irreducible under any-lane tile semantics.

    Returns (carry, (listed, processed, still_passed)) scalar i32 counters
    for the stats outputs (processed == listed here; kept for shape parity
    with experimental walk variants).
    """
    tabs = cull[:17]
    (s0x, s0y, s0z, s1x, s1y, s1z,
     c0x, c0y, c0z, c1x, c1y, c1z) = cull[17:29]
    n_clu, n_sup = meta["n_clu"], meta["n_sup"]
    hitlist_ref = scratch[0]

    def inv(c):
        return 1.0 / jnp.where(jnp.abs(c) < _DENOM_EPS, _DENOM_EPS, c)

    ivx, ivy, ivz = inv(dx), inv(dy), inv(dz)

    def slab(x0, y0, z0, x1, y1, z1):
        fx0 = (x0 - ox) * ivx
        fx1 = (x1 - ox) * ivx
        fy0 = (y0 - oy) * ivy
        fy1 = (y1 - oy) * ivy
        fz0 = (z0 - oz) * ivz
        fz1 = (z1 - oz) * ivz
        t0 = jnp.maximum(
            jnp.maximum(jnp.minimum(fx0, fx1), jnp.minimum(fy0, fy1)),
            jnp.maximum(jnp.minimum(fz0, fz1), mint),
        )
        t1 = jnp.minimum(
            jnp.minimum(jnp.maximum(fx0, fx1), jnp.maximum(fy0, fy1)),
            jnp.maximum(fz0, fz1),
        )
        return t0, t1

    # Root-box lane mask (fold the supergroup bounds once per bounce).
    def fold_min(tab):
        return jax.lax.fori_loop(
            0, n_sup, lambda s2, m: jnp.minimum(m, tab[s2]),
            jnp.float32(_BIG))

    def fold_max(tab):
        return jax.lax.fori_loop(
            0, n_sup, lambda s2, m: jnp.maximum(m, tab[s2]),
            jnp.float32(-_BIG))

    rt0, rt1 = slab(fold_min(s0x), fold_min(s0y), fold_min(s0z),
                    fold_max(s1x), fold_max(s1y), fold_max(s1z))
    cull_live = live & (rt1 >= rt0)

    def slab_any(x0, y0, z0, x1, y1, z1, tmax=None):
        t0, t1 = slab(x0, y0, z0, x1, y1, z1)
        ok = (t1 >= t0) & cull_live
        if tmax is not None:
            # A cluster whose entry distance exceeds the lane's current
            # winner can't improve it — prunes occluded clusters as t_best
            # tightens during the phase-2 walk.
            ok &= t0 < tmax
        return jnp.any(ok)

    def sup_body(s2, count):
        hit = slab_any(s0x[s2], s0y[s2], s0z[s2], s1x[s2], s1y[s2], s1z[s2])

        def scan(count):
            def clu_body(c, count):
                h = slab_any(c0x[c], c0y[c], c0z[c], c1x[c], c1y[c], c1z[c])

                @pl.when(h)
                def _():
                    hitlist_ref[count] = c

                return count + jnp.where(h, 1, 0)

            hi = jnp.minimum((s2 + 1) * CULL_G, n_clu)
            return jax.lax.fori_loop(s2 * CULL_G, hi, clu_body, count)

        return jax.lax.cond(hit, scan, lambda c: c, count)

    count = jax.lax.cond(
        jnp.any(cull_live),
        lambda: jax.lax.fori_loop(0, n_sup, sup_body, jnp.int32(0)),
        lambda: jnp.int32(0),
    )

    def clu_work(k, state):
        nstill, carry = state
        c = hitlist_ref[k]
        still = slab_any(c0x[c], c0y[c], c0z[c], c1x[c], c1y[c], c1z[c],
                         tmax=carry[0])

        def tri_one(j, carry):
            t_best, wnx, wny, wnz, wmat, wfam, widx = carry
            i = c * CULL_K + j
            nx, ny, nz = tabs[0][i], tabs[1][i], tabs[2][i]
            e0x, e0y, e0z = tabs[3][i], tabs[4][i], tabs[5][i]
            e1x, e1y, e1z = tabs[6][i], tabs[7][i], tabs[8][i]
            v0n, v0e0, v0e1 = tabs[9][i], tabs[10][i], tabs[11][i]
            g00, g11, g01 = tabs[12][i], tabs[13][i], tabs[14][i]
            inv_det, mat_i = tabs[15][i], tabs[16][i]
            dn = nx * dx + ny * dy + nz * dz
            on = nx * ox + ny * oy + nz * oz
            de0 = e0x * dx + e0y * dy + e0z * dz
            de1 = e1x * dx + e1y * dy + e1z * dz
            oe0 = e0x * ox + e0y * oy + e0z * oz
            oe1 = e1x * ox + e1y * oy + e1z * oz
            dn_safe = jnp.where(jnp.abs(dn) < _DENOM_EPS, _DENOM_EPS, dn)
            t = (v0n - on) / dn_safe
            b0 = oe0 + t * de0 - v0e0
            b1 = oe1 + t * de1 - v0e1
            u = inv_det * (g11 * b0 - g01 * b1)
            v = inv_det * (g00 * b1 - g01 * b0)
            valid = ((mint < t) & (t < t_best) & (u > 0.0)
                     & (v > 0.0) & (u + v < 1.0))
            t_best = jnp.where(valid, t, t_best)
            wnx = jnp.where(valid, nx, wnx)
            wny = jnp.where(valid, ny, wny)
            wnz = jnp.where(valid, nz, wnz)
            wmat = jnp.where(valid, mat_i, wmat)
            wfam = jnp.where(valid, 0, wfam)
            widx = jnp.where(valid, tri_base + i, widx)
            return (t_best, wnx, wny, wnz, wmat, wfam, widx)

        carry = jax.lax.cond(
            still,
            lambda cc: jax.lax.fori_loop(0, CULL_K, tri_one, cc),
            lambda cc: cc,
            carry,
        )
        return nstill + jnp.where(still, 1, 0), carry

    nstill, carry = jax.lax.fori_loop(
        0, count, clu_work, (jnp.int32(0), carry)
    )
    return carry, (count, count, nstill)


def _culled_tris_rows(bounds, tri_ref, meta, ox, oy, oz, dx, dy, dz, mint,
                      live, scratch, carry, tri_base=0,
                      n_sup_dyn=None, n_clu_dyn=None, subs=1,
                      k_tris=None):
    """Cluster-culled closest-hit with a ROW-SLICED triangle fold.

    Same listing phase as _culled_tris (SMEM bounds, per-lane slab tests,
    compacted tile work list, t_best re-prune per cluster), but phase 2
    folds each listed cluster's CULL_K triangles as one [CULL_K, S, L]
    row-path step: the triangle fields come from a VMEM table shaped
    a triangle-row x field-lane VMEM block via ONE dynamic 16-row pl.ds
    slice per cluster (then 17 static lane extracts), and the winner folds
    with the min+iota-select of _search.pick.  This replaces the
    17-SMEM-scalar-loads × 16-triangle scalar loop per cluster — the
    scalar core was ~30% of walk time and fat [8,1024] vector ops hide
    the wider [16,S,L] intermediates.

    ``tri_ref`` is a VMEM block [BIG_CHUNK_T, 128]: field k of the
    cluster's triangle j at [cc*CULL_K + j, k] (pack_cull_chunked's
    VMEM-feasible layout).  ``bounds`` are the 12 SMEM bound
    views (6 supergroup + 6 cluster).  ``n_sup_dyn``/``n_clu_dyn`` (traced
    i32) clamp the listing loops to the streamed chunk's REAL counts —
    inverted-box padding would pass the orientation-agnostic slab test and
    must never be listed (pack_cull_chunked).

    Matches _culled_tris' candidate set, visit order, and first-row
    tie-break exactly; one sign-bit caveat: the winner-field select is a
    masked sum, so a selected value of -0.0 lands as +0.0 (-0.0 + 0.0),
    where the sequential walk's where-select would keep the sign bit.
    Numerically identical everywhere (-0.0 == +0.0; shading uses the
    normal only in products and compares).

    Returns (carry, (listed, processed, still_passed))."""
    (s0x, s0y, s0z, s1x, s1y, s1z,
     c0x, c0y, c0z, c1x, c1y, c1z) = bounds
    n_clu, n_sup = meta["n_clu"], meta["n_sup"]
    n_sup_eff = n_sup if n_sup_dyn is None else n_sup_dyn
    n_clu_eff = n_clu if n_clu_dyn is None else n_clu_dyn
    hitlist_ref = scratch[0]

    def inv(c):
        return 1.0 / jnp.where(jnp.abs(c) < _DENOM_EPS, _DENOM_EPS, c)

    ivx, ivy, ivz = inv(dx), inv(dy), inv(dz)

    def slab(x0, y0, z0, x1, y1, z1):
        fx0 = (x0 - ox) * ivx
        fx1 = (x1 - ox) * ivx
        fy0 = (y0 - oy) * ivy
        fy1 = (y1 - oy) * ivy
        fz0 = (z0 - oz) * ivz
        fz1 = (z1 - oz) * ivz
        t0 = jnp.maximum(
            jnp.maximum(jnp.minimum(fx0, fx1), jnp.minimum(fy0, fy1)),
            jnp.maximum(jnp.minimum(fz0, fz1), mint),
        )
        t1 = jnp.minimum(
            jnp.minimum(jnp.maximum(fx0, fx1), jnp.maximum(fy0, fy1)),
            jnp.maximum(fz0, fz1),
        )
        return t0, t1

    def fold_min(tab):
        return jax.lax.fori_loop(
            0, n_sup, lambda s2, m: jnp.minimum(m, tab[s2]),
            jnp.float32(_BIG))

    def fold_max(tab):
        return jax.lax.fori_loop(
            0, n_sup, lambda s2, m: jnp.maximum(m, tab[s2]),
            jnp.float32(-_BIG))

    rt0, rt1 = slab(fold_min(s0x), fold_min(s0y), fold_min(s0z),
                    fold_max(s1x), fold_max(s1y), fold_max(s1z))
    cull_live = live & (rt1 >= rt0)

    def slab_any(x0, y0, z0, x1, y1, z1, tmax=None):
        t0, t1 = slab(x0, y0, z0, x1, y1, z1)
        ok = (t1 >= t0) & cull_live
        if tmax is not None:
            ok &= t0 < tmax
        return jnp.any(ok)

    def sup_body(s2, count):
        hit = slab_any(s0x[s2], s0y[s2], s0z[s2], s1x[s2], s1y[s2], s1z[s2])

        def scan(count):
            def clu_body(c, count):
                h = slab_any(c0x[c], c0y[c], c0z[c], c1x[c], c1y[c], c1z[c])

                @pl.when(h)
                def _():
                    hitlist_ref[count] = c

                return count + jnp.where(h, 1, 0)

            hi = jnp.minimum((s2 + 1) * CULL_G, n_clu_eff)
            return jax.lax.fori_loop(s2 * CULL_G, hi, clu_body, count)

        return jax.lax.cond(hit, scan, lambda c: c, count)

    count = jax.lax.cond(
        jnp.any(cull_live),
        lambda: jax.lax.fori_loop(0, n_sup_eff, sup_body, jnp.int32(0)),
        lambda: jnp.int32(0),
    )

    K = CULL_K if k_tris is None else k_tris

    # Per-sub-block ray views: the fold and its t_best re-prune run on
    # [S, lanes/subs] lane slices (one native vreg at subs=BIG_L//BIG_SUB),
    # each holding consecutive post-sort rays (_flat_to_btile layout), so a
    # cluster only pays triangle math for the sub-blocks whose OWN rays can
    # touch it — the listing above stays tile-wide.  Bit-identical to the
    # tile-wide fold: a lane whose slab test passes always gets the fold
    # (its sub-block's any includes it), and a skipped fold cannot change
    # lanes whose slab fails (triangle-in-box conservativity) or whose
    # entry t0 >= t_best (no closer hit possible).
    if subs == 1:
        subsl = [slice(None)]
    else:
        subw = ox.shape[-1] // subs
        subsl = [slice(j * subw, (j + 1) * subw) for j in range(subs)]

    def make_fold(rayc):
        oxs, oys, ozs, dxs, dys, dzs = rayc
        oxb, oyb, ozb = oxs[None], oys[None], ozs[None]
        dxb, dyb, dzb = dxs[None], dys[None], dzs[None]

        def fold_cluster(cc, carry):
            t_best = carry[0]
            base = cc * K
            blk = tri_ref[pl.ds(base, K), :]        # [K, 128] triangle rows

            def col(k):
                return blk[:, k:k + 1][:, :, None]  # field lane -> [K, 1, 1]

            nx, ny, nz = col(0), col(1), col(2)
            e0x, e0y, e0z = col(3), col(4), col(5)
            e1x, e1y, e1z = col(6), col(7), col(8)
            v0n, v0e0, v0e1 = col(9), col(10), col(11)
            g00, g11, g01 = col(12), col(13), col(14)
            inv_det, mat_i = col(15), col(16)
            dn = nx * dxb + ny * dyb + nz * dzb
            on = nx * oxb + ny * oyb + nz * ozb
            de0 = e0x * dxb + e0y * dyb + e0z * dzb
            de1 = e1x * dxb + e1y * dyb + e1z * dzb
            oe0 = e0x * oxb + e0y * oyb + e0z * ozb
            oe1 = e1x * oxb + e1y * oyb + e1z * ozb
            dn_safe = jnp.where(jnp.abs(dn) < _DENOM_EPS, _DENOM_EPS, dn)
            t = (v0n - on) / dn_safe
            b0 = oe0 + t * de0 - v0e0
            b1 = oe1 + t * de1 - v0e1
            u = inv_det * (g11 * b0 - g01 * b1)
            v = inv_det * (g00 * b1 - g01 * b0)
            valid = ((mint < t) & (t < t_best[None]) & (u > 0.0)
                     & (v > 0.0) & (u + v < 1.0))
            tm = jnp.where(valid, t, _BIG)

            # min + first-row iota select (== ascending sequential updates).
            t_best, wnx, wny, wnz, wmat, wfam, widx = carry
            cmin = jnp.min(tm, axis=0)
            rows = jax.lax.broadcasted_iota(jnp.int32, tm.shape, 0)
            first = jnp.min(
                jnp.where(tm == cmin[None], rows, jnp.int32(2**30)), axis=0)
            oh = rows == first[None]

            def sel(colv):
                return jnp.sum(jnp.where(oh, colv, 0.0), axis=0)

            better = cmin < t_best
            t_best = jnp.where(better, cmin, t_best)
            wnx = jnp.where(better, sel(nx), wnx)
            wny = jnp.where(better, sel(ny), wny)
            wnz = jnp.where(better, sel(nz), wnz)
            wmat = jnp.where(better, sel(mat_i), wmat)
            wfam = jnp.where(better, 0, wfam)
            widx = jnp.where(better, tri_base + base + first, widx)
            return (t_best, wnx, wny, wnz, wmat, wfam, widx)

        return fold_cluster

    def make_still(rayc, livec):
        oxs, oys, ozs, dxs, dys, dzs = rayc
        ivxs, ivys, ivzs = inv(dxs), inv(dys), inv(dzs)

        def still(box, tmax):
            x0, y0, z0, x1, y1, z1 = box
            fx0 = (x0 - oxs) * ivxs
            fx1 = (x1 - oxs) * ivxs
            fy0 = (y0 - oys) * ivys
            fy1 = (y1 - oys) * ivys
            fz0 = (z0 - ozs) * ivzs
            fz1 = (z1 - ozs) * ivzs
            t0 = jnp.maximum(
                jnp.maximum(jnp.minimum(fx0, fx1), jnp.minimum(fy0, fy1)),
                jnp.maximum(jnp.minimum(fz0, fz1), mint),
            )
            t1 = jnp.minimum(
                jnp.minimum(jnp.maximum(fx0, fx1), jnp.maximum(fy0, fy1)),
                jnp.maximum(fz0, fz1),
            )
            return jnp.any((t1 >= t0) & livec & (t0 < tmax))

        return still

    folds, stills = [], []
    for sl in subsl:
        rayc = (ox[:, sl], oy[:, sl], oz[:, sl],
                dx[:, sl], dy[:, sl], dz[:, sl])
        folds.append(make_fold(rayc))
        stills.append(make_still(rayc, cull_live[:, sl]))

    carries = tuple(tuple(a[:, sl] for a in carry) for sl in subsl)

    def clu_work(k, state):
        nstill = state[0]
        subc = state[1]
        c = hitlist_ref[k]
        box = (c0x[c], c0y[c], c0z[c], c1x[c], c1y[c], c1z[c])
        out = []
        any_still = jnp.int32(0)
        for j in range(subs):
            st = stills[j](box, subc[j][0])
            c7 = jax.lax.cond(
                st, lambda cc, _f=folds[j]: _f(c, cc),
                lambda cc: cc, subc[j])
            out.append(c7)
            any_still = any_still | st.astype(jnp.int32)
        return (nstill + any_still, tuple(out))

    nstill, carries = jax.lax.fori_loop(
        0, count, clu_work, (jnp.int32(0), carries)
    )
    if subs == 1:
        carry = carries[0]
    else:
        carry = tuple(
            jnp.concatenate([carries[j][i] for j in range(subs)], axis=1)
            for i in range(7))
    return carry, (count, count, nstill)


def _search(tri, sph, pln, meta, ox, oy, oz, dx, dy, dz, mint,
            cull=None, live=None, cull_scratch=None):
    """Closest-hit over all families.  Ray comps are [S, L] (or any 2-D
    tile shape — shape-generic); returns winner (t, nx, ny, nz, mat, fam,
    idx), same shape."""
    rshape = ox.shape
    t_best = jnp.full(rshape, _BIG, jnp.float32)
    wnx = jnp.zeros(rshape, jnp.float32)
    wny = jnp.zeros(rshape, jnp.float32)
    wnz = jnp.zeros(rshape, jnp.float32)
    wmat = jnp.zeros(rshape, jnp.float32)
    wfam = jnp.full(rshape, -1, jnp.int32)
    widx = jnp.full(rshape, -1, jnp.int32)

    oxb, oyb, ozb = ox[None], oy[None], oz[None]
    dxb, dyb, dzb = dx[None], dy[None], dz[None]

    def pick(carry, tm, rows_n, cols, fam_id, base, normal_fn):
        """Fold a candidate block [R,S,L] into the winner state."""
        t_best, wnx, wny, wnz, wmat, wfam, widx = carry
        cmin = jnp.min(tm, axis=0)
        rows = jax.lax.broadcasted_iota(jnp.int32, (rows_n,) + rshape, 0)
        first = jnp.min(
            jnp.where(tm == cmin[None], rows, jnp.int32(2**30)), axis=0
        )
        oh = rows == first[None]

        def sel(col):
            return jnp.sum(jnp.where(oh, col, 0.0), axis=0)

        better = cmin < t_best
        nx, ny, nz = normal_fn(cmin, sel)
        t_best = jnp.where(better, cmin, t_best)
        wnx = jnp.where(better, nx, wnx)
        wny = jnp.where(better, ny, wny)
        wnz = jnp.where(better, nz, wnz)
        wmat = jnp.where(better, sel(cols["mat"]), wmat)
        wfam = jnp.where(better, fam_id, wfam)
        widx = jnp.where(better, base + first, widx)
        return (t_best, wnx, wny, wnz, wmat, wfam, widx)

    carry = (t_best, wnx, wny, wnz, wmat, wfam, widx)

    if meta["has_tri"]:
        chunk = meta["tri_chunk"]
        n_chunks = meta["tri_rows"] // chunk

        def tri_body(c, carry):
            cols = {k: tri[k][pl.ds(c * chunk, chunk)] for k in TRI_FIELDS}
            nx, ny, nz = cols["nx"], cols["ny"], cols["nz"]
            dn = nx * dxb + ny * dyb + nz * dzb
            on = nx * oxb + ny * oyb + nz * ozb
            de0 = cols["e0x"] * dxb + cols["e0y"] * dyb + cols["e0z"] * dzb
            de1 = cols["e1x"] * dxb + cols["e1y"] * dyb + cols["e1z"] * dzb
            oe0 = cols["e0x"] * oxb + cols["e0y"] * oyb + cols["e0z"] * ozb
            oe1 = cols["e1x"] * oxb + cols["e1y"] * oyb + cols["e1z"] * ozb
            dn_safe = jnp.where(jnp.abs(dn) < _DENOM_EPS, _DENOM_EPS, dn)
            t = (cols["v0n"] - on) / dn_safe
            b0 = oe0 + t * de0 - cols["v0e0"]
            b1 = oe1 + t * de1 - cols["v0e1"]
            u = cols["inv_det"] * (cols["g11"] * b0 - cols["g01"] * b1)
            v = cols["inv_det"] * (cols["g00"] * b1 - cols["g01"] * b0)
            valid = ((mint < t) & (t < carry[0][None]) & (u > 0.0)
                     & (v > 0.0) & (u + v < 1.0))
            tm = jnp.where(valid, t, _BIG)

            def tri_normal(cmin, sel):
                return sel(nx), sel(ny), sel(nz)

            return pick(carry, tm, chunk, cols, 0, c * chunk, tri_normal)

        carry = jax.lax.fori_loop(0, n_chunks, tri_body, carry)

    if meta["has_sph"]:
        rows_n = meta["sph_rows"]
        cx, cy, cz = sph["cx"], sph["cy"], sph["cz"]
        rad = sph["rad"]
        ocx, ocy, ocz = oxb - cx, oyb - cy, ozb - cz
        dd = dxb * dxb + dyb * dyb + dzb * dzb
        bh = dxb * ocx + dyb * ocy + dzb * ocz
        ct = ocx * ocx + ocy * ocy + ocz * ocz - rad * rad
        disc = bh * bh - dd * ct
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        dd_safe = jnp.where(jnp.abs(dd) < _DENOM_EPS, _DENOM_EPS, dd)
        t0 = (-bh - sq) / dd_safe
        t1 = (-bh + sq) / dd_safe
        tn = jnp.where((t0 > mint) & (t0 < carry[0][None]), t0, _BIG)
        tf = jnp.where((t1 > mint) & (t1 < carry[0][None]), t1, _BIG)
        ts = jnp.where((disc > 0.0) & (rad > 0.0), jnp.minimum(tn, tf), _BIG)

        def sph_normal(cmin, sel):
            # normal = pos - center (unnormalized, as the XLA path)
            return (ox + cmin * dx - sel(cx), oy + cmin * dy - sel(cy),
                    oz + cmin * dz - sel(cz))

        carry = pick(carry, ts, rows_n, sph, 1, 0, sph_normal)

    if meta["has_pln"]:
        rows_n = meta["pln_rows"]
        nx, ny, nz = pln["nx"], pln["ny"], pln["nz"]
        dn = nx * dxb + ny * dyb + nz * dzb
        on = nx * oxb + ny * oyb + nz * ozb
        dn_safe = jnp.where(jnp.abs(dn) < _DENOM_EPS, _DENOM_EPS, dn)
        tp = (pln["doff"] - on) / dn_safe
        pvalid = (nx * nx + ny * ny + nz * nz) > 0.0
        tp = jnp.where((tp > mint) & (tp < carry[0][None]) & pvalid, tp, _BIG)

        def pln_normal(cmin, sel):
            return sel(nx), sel(ny), sel(nz)

        carry = pick(carry, tp, rows_n, pln, 2, 0, pln_normal)

    cull_stats = (jnp.int32(0),) * 3
    if meta.get("culled"):
        # Triangles LAST: plane/sphere hits give every lane a t_best
        # ceiling before the cluster walk, feeding its per-lane and
        # early-break prunes.
        carry, cull_stats = _culled_tris(
            cull, meta, ox, oy, oz, dx, dy, dz, mint,
            live, cull_scratch, carry
        )

    return carry, cull_stats


def _mat_fetch(mat, meta, wmat):
    """Winner-material table fetch (one-hot select-sum).

    Shape-generic over the winner id array: [S, L] inside the kernels,
    [grid, S, L] when the big-mesh mode drivers run the same shading math
    as XLA ops between chunked search launches."""
    rows = meta["mat_rows"]
    mrows = jax.lax.broadcasted_iota(jnp.int32, (rows,) + wmat.shape, 0)
    is_m = mrows == wmat.astype(jnp.int32)[None]

    def mfetch(name):
        col = mat[name].reshape((rows,) + (1,) * wmat.ndim)
        return jnp.sum(jnp.where(is_m, col, 0.0), axis=0)

    return {k: mfetch(k) for k in MAT_FIELDS}


def _shade_geom(pix, frame, salt, ox, oy, oz, dx, dy, dz, winner, ior, kind):
    """Shared hit geometry + scatter directions for every bounce integrator:
    hit point, flipped unit normal, Lambert/mirror/dielectric candidate
    directions with the stochastic Fresnel branch — the exact math of
    brdf.shade_and_scatter (material.glsl / integrators.glsl:591-668)."""
    t_best, wnx, wny, wnz = winner[0], winner[1], winner[2], winner[3]
    px = ox + t_best * dx
    py = oy + t_best * dy
    pz = oz + t_best * dz
    inv_nl = _rsqrt_safe(wnx * wnx + wny * wny + wnz * wnz)
    nX, nY, nZ = wnx * inv_nl, wny * inv_nl, wnz * inv_nl
    inv_dl = _rsqrt_safe(dx * dx + dy * dy + dz * dz)
    iX, iY, iZ = dx * inv_dl, dy * inv_dl, dz * inv_dl

    cos_view = iX * nX + iY * nY + iZ * nZ
    flipped = cos_view > 0.0
    cos_in = jnp.abs(cos_view)
    nX = jnp.where(flipped, -nX, nX)
    nY = jnp.where(flipped, -nY, nY)
    nZ = jnp.where(flipped, -nZ, nZ)
    eta = jnp.where(flipped, ior, 1.0 / jnp.maximum(ior, 1e-8))

    ru, rv, rw = _rng(pix, frame, salt)

    phi = _TWO_PI * ru
    cos_t = 1.0 - 2.0 * rv
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    lamX = nX + sin_t * jnp.cos(phi)
    lamY = nY + sin_t * jnp.sin(phi)
    lamZ = nZ + cos_t

    refX = iX + 2.0 * cos_in * nX
    refY = iY + 2.0 * cos_in * nY
    refZ = iZ + 2.0 * cos_in * nZ

    cos_out_sqr = 1.0 - eta * eta * (1.0 - cos_in * cos_in)
    cos_out = jnp.sqrt(jnp.maximum(0.0, cos_out_sqr))
    r_perp = (eta * cos_in - cos_out) / (eta * cos_in + cos_out)
    r_par = (cos_in - eta * cos_out) / (cos_in + eta * cos_out)
    f_refl = 0.5 * (r_perp * r_perp + r_par * r_par)
    refl = (cos_out_sqr <= 0.0) | (rw < f_refl)
    k = eta * cos_in - cos_out
    dieX = jnp.where(refl, refX, eta * iX + k * nX)
    dieY = jnp.where(refl, refY, eta * iY + k * nY)
    dieZ = jnp.where(refl, refZ, eta * iZ + k * nZ)
    die_off = jnp.where(refl, _EPSILON, -_EPSILON)

    is_lam = kind == 0.0
    is_mir = kind == 1.0

    out_dx = jnp.where(is_lam, lamX, jnp.where(is_mir, refX, dieX))
    out_dy = jnp.where(is_lam, lamY, jnp.where(is_mir, refY, dieY))
    out_dz = jnp.where(is_lam, lamZ, jnp.where(is_mir, refZ, dieZ))
    off = jnp.where(is_lam | is_mir, _EPSILON, die_off)
    return dict(
        px=px, py=py, pz=pz, nX=nX, nY=nY, nZ=nZ, iX=iX, iY=iY, iZ=iZ,
        out_dx=out_dx, out_dy=out_dy, out_dz=out_dz, off=off,
        is_lam=is_lam, is_mir=is_mir,
    )


def _sky_add(rr, rg, rb, cr, cg, cb, tr, tg, tb, sky_t, mask):
    rr = jnp.where(mask, rr + cr + tr * (_WHITE[0] + (_BLUE[0] - _WHITE[0]) * sky_t), rr)
    rg = jnp.where(mask, rg + cg + tg * (_WHITE[1] + (_BLUE[1] - _WHITE[1]) * sky_t), rg)
    rb = jnp.where(mask, rb + cb + tb * (_WHITE[2] + (_BLUE[2] - _WHITE[2]) * sky_t), rb)
    return rr, rg, rb


def _shade(mat, meta, pix, frame, salt, state, winner):
    """One Kajiya bounce's shading at the winner hit.  state/winner [S, L]."""
    (ox, oy, oz, dx, dy, dz, tr, tg, tb, cr, cg, cb,
     rr, rg, rb, active) = state
    t_best, wnx, wny, wnz, wmat, wfam, widx = winner
    hit = wfam >= 0

    # Kajiya shifts d.y into [0,1] (integrators.glsl:579)
    miss_now = active & ~hit
    rr, rg, rb = _sky_add(rr, rg, rb, cr, cg, cb, tr, tg, tb,
                          dy * 0.5 + 0.5, miss_now)
    active = active & hit

    m = _mat_fetch(mat, meta, wmat)
    alb_r, alb_g, alb_b = m["ar"], m["ag"], m["ab"]

    cr = jnp.where(active, cr + tr * m["er"], cr)
    cg = jnp.where(active, cg + tg * m["eg"], cg)
    cb = jnp.where(active, cb + tb * m["eb"], cb)

    g = _shade_geom(pix, frame, salt, ox, oy, oz, dx, dy, dz, winner,
                    m["ior"], m["kind"])

    ox = jnp.where(active, g["px"] + g["off"] * g["nX"], ox)
    oy = jnp.where(active, g["py"] + g["off"] * g["nY"], oy)
    oz = jnp.where(active, g["pz"] + g["off"] * g["nZ"], oz)
    dx = jnp.where(active, g["out_dx"], dx)
    dy = jnp.where(active, g["out_dy"], dy)
    dz = jnp.where(active, g["out_dz"], dz)
    tr = jnp.where(active, tr * alb_r, tr)
    tg = jnp.where(active, tg * alb_g, tg)
    tb = jnp.where(active, tb * alb_b, tb)
    return (ox, oy, oz, dx, dy, dz, tr, tg, tb, cr, cg, cb,
            rr, rg, rb, active)


def _shade_whitted(mat, meta, pix, frame, salt, state, winner, search):
    """One Whitted bounce (models/integrators.py integrator_whitted,
    integrators.glsl:254-403): direct Lambert lighting with a hard shadow
    ray (the in-kernel ``search`` closure), Lambert lanes terminate,
    specular lanes scatter on.  Sky uses RAW d.y (glsl mix extrapolates)."""
    (ox, oy, oz, dx, dy, dz, tr, tg, tb, cr, cg, cb,
     rr, rg, rb, active) = state
    wmat, wfam = winner[4], winner[5]
    hit = wfam >= 0

    miss_now = active & ~hit
    rr, rg, rb = _sky_add(rr, rg, rb, cr, cg, cb, tr, tg, tb, dy, miss_now)
    active = active & hit

    m = _mat_fetch(mat, meta, wmat)
    cr = jnp.where(active, cr + tr * m["er"], cr)
    cg = jnp.where(active, cg + tg * m["eg"], cg)
    cb = jnp.where(active, cb + tb * m["eb"], cb)

    g = _shade_geom(pix, frame, salt, ox, oy, oz, dx, dy, dz, winner,
                    m["ior"], m["kind"])
    nX, nY, nZ = g["nX"], g["nY"], g["nZ"]

    # Lambert lanes: shadow ray toward the directional light, terminate.
    is_lam = active & g["is_lam"]
    sox = g["px"] + _EPSILON * nX
    soy = g["py"] + _EPSILON * nY
    soz = g["pz"] + _EPSILON * nZ
    ones = jnp.ones_like(nX)
    sw = search((sox, soy, soz),
                (_LDIR[0] * ones, _LDIR[1] * ones, _LDIR[2] * ones), is_lam)
    in_shadow = (sw[5] >= 0) & is_lam
    cos_l = jnp.maximum(0.0, _LDIR[0] * nX + _LDIR[1] * nY + _LDIR[2] * nZ)
    lit = _LIGHT_I * cos_l
    lam_r = jnp.where(in_shadow, cr, cr + tr * m["ar"] * lit)
    lam_g = jnp.where(in_shadow, cg, cg + tg * m["ag"] * lit)
    lam_b = jnp.where(in_shadow, cb, cb + tb * m["ab"] * lit)
    rr = jnp.where(is_lam, rr + lam_r, rr)
    rg = jnp.where(is_lam, rg + lam_g, rg)
    rb = jnp.where(is_lam, rb + lam_b, rb)
    active = active & ~is_lam

    ox = jnp.where(active, g["px"] + g["off"] * nX, ox)
    oy = jnp.where(active, g["py"] + g["off"] * nY, oy)
    oz = jnp.where(active, g["pz"] + g["off"] * nZ, oz)
    dx = jnp.where(active, g["out_dx"], dx)
    dy = jnp.where(active, g["out_dy"], dy)
    dz = jnp.where(active, g["out_dz"], dz)
    tr = jnp.where(active, tr * m["ar"], tr)
    tg = jnp.where(active, tg * m["ag"], tg)
    tb = jnp.where(active, tb * m["ab"], tb)
    return (ox, oy, oz, dx, dy, dz, tr, tg, tb, cr, cg, cb,
            rr, rg, rb, active)


def _shade_cook(mat, meta, pix, frame, salt, state, winner, final):
    """One Cook bounce (integrator_cook, integrators.glsl:407-543): lanes
    whose previous bounce was a Lambert scatter terminate on this hit's
    emission; everything else scatters like Kajiya.  Returns (state,
    final')."""
    (ox, oy, oz, dx, dy, dz, tr, tg, tb, cr, cg, cb,
     rr, rg, rb, active) = state
    wmat, wfam = winner[4], winner[5]
    hit = wfam >= 0

    miss_now = active & ~hit
    rr, rg, rb = _sky_add(rr, rg, rb, cr, cg, cb, tr, tg, tb, dy, miss_now)
    active = active & hit

    m = _mat_fetch(mat, meta, wmat)

    fin_now = active & final
    rr = jnp.where(fin_now, rr + cr + tr * m["er"], rr)
    rg = jnp.where(fin_now, rg + cg + tg * m["eg"], rg)
    rb = jnp.where(fin_now, rb + cb + tb * m["eb"], rb)
    active = active & ~final

    cr = jnp.where(active, cr + tr * m["er"], cr)
    cg = jnp.where(active, cg + tg * m["eg"], cg)
    cb = jnp.where(active, cb + tb * m["eb"], cb)

    g = _shade_geom(pix, frame, salt, ox, oy, oz, dx, dy, dz, winner,
                    m["ior"], m["kind"])
    final = active & g["is_lam"]

    ox = jnp.where(active, g["px"] + g["off"] * g["nX"], ox)
    oy = jnp.where(active, g["py"] + g["off"] * g["nY"], oy)
    oz = jnp.where(active, g["pz"] + g["off"] * g["nZ"], oz)
    dx = jnp.where(active, g["out_dx"], dx)
    dy = jnp.where(active, g["out_dy"], dy)
    dz = jnp.where(active, g["out_dz"], dz)
    tr = jnp.where(active, tr * m["ar"], tr)
    tg = jnp.where(active, tg * m["ag"], tg)
    tb = jnp.where(active, tb * m["ab"], tb)
    return (ox, oy, oz, dx, dy, dz, tr, tg, tb, cr, cg, cb,
            rr, rg, rb, active), final


def _gen_rays_inkernel(cam_ref, pix, frame, jitter_salt, mode):
    """In-kernel AA jitter + camera ray, mirroring rng.uniform2 +
    models.camera.generate_rays_soa for the static camera mode."""
    ju32, jv32, _ = _pcg3d(pix, frame, jnp.asarray(jitter_salt, jnp.uint32))
    ju, jv = _unit(ju32), _unit(jv32)

    width = cam_ref[CAM_W]
    inv_w = cam_ref[CAM_INV_W]
    inv_h = cam_ref[CAM_INV_H]
    pix_f = pltpu.bitcast(pix, jnp.int32).astype(jnp.float32)
    ys = jnp.floor(pix_f * (1.0 / width) )
    rem = pix_f - ys * width
    under = rem < 0.0
    ys = jnp.where(under, ys - 1.0, ys)
    rem = jnp.where(under, rem + width, rem)
    over = rem >= width
    ys = jnp.where(over, ys + 1.0, ys)
    rem = jnp.where(over, rem - width, rem)
    xs = rem

    cx = (xs + ju) * inv_w
    cy = 1.0 - (ys + jv) * inv_h

    def m(r, c):
        return cam_ref[CAM_M + 4 * r + c]

    ones = jnp.ones_like(cx)
    if mode == PINHOLE:
        u = cam_ref[CAM_ASPECT] * (2.0 * cx - 1.0)
        v = 2.0 * cy - 1.0
        w = cam_ref[CAM_PROJ]
        dx = m(0, 0) * u + m(0, 1) * v + m(0, 2) * w
        dy = m(1, 0) * u + m(1, 1) * v + m(1, 2) * w
        dz = m(2, 0) * u + m(2, 1) * v + m(2, 2) * w
        inv = jax.lax.rsqrt(jnp.maximum(dx * dx + dy * dy + dz * dz, 1e-30))
        return (m(0, 3) * ones, m(1, 3) * ones, m(2, 3) * ones,
                dx * inv, dy * inv, dz * inv)
    if mode == ORTHO:
        u = cam_ref[CAM_ASPECT] * (2.0 * cx - 1.0) * cam_ref[CAM_PROJ]
        v = (2.0 * cy - 1.0) * cam_ref[CAM_PROJ]
        ox = m(0, 0) * u + m(0, 1) * v + m(0, 3)
        oy = m(1, 0) * u + m(1, 1) * v + m(1, 3)
        oz = m(2, 0) * u + m(2, 1) * v + m(2, 3)
        return (ox, oy, oz, m(0, 2) * ones, m(1, 2) * ones, m(2, 2) * ones)
    phi = cx * _TWO_PI
    theta = cy * (0.5 * _TWO_PI)
    sin_t = jnp.sin(theta)
    lx = sin_t * jnp.cos(phi)
    lz = sin_t * jnp.sin(phi)  # .xzy swizzle (camera.glsl:95)
    ly = jnp.cos(theta)
    dx = m(0, 0) * lx + m(0, 1) * ly + m(0, 2) * lz
    dy = m(1, 0) * lx + m(1, 1) * ly + m(1, 2) * lz
    dz = m(2, 0) * lx + m(2, 1) * ly + m(2, 2) * lz
    return (m(0, 3) * ones, m(1, 3) * ones, m(2, 3) * ones, dx, dy, dz)


def make_path_kernel(meta, mint, nb, *, gen_rays, cam_mode,
                     carry_in, collect, style, is_last, stats=False,
                     integ="kajiya"):
    """Whole-path kernel for one bounce group (nb <= MAX_GROUP bounces).

    RNG counters (frame, salt_base, jitter_salt) arrive as traced SMEM
    scalars, so ONE compilation serves every frame, AA sample, spp rank and
    bounce-group offset.  With ``stats`` (culled path diagnostics) three
    extra outputs carry per-tile cluster counters summed over the group's
    bounces: listed, processed (pre-break), still-passed (triangle loops
    actually run).

    ``integ`` selects the bounce integrator: "kajiya" (default), "whitted"
    (direct-light + shadow ray, Lambert terminates), or "cook" (Lambert
    scatters exactly once more; the terminate flag rides the active row as a
    0/1/2 trit)."""

    def kernel(ctl_ref, *refs):
        pos = 0
        cam_ref = None
        if gen_rays:
            cam_ref = refs[pos]
            pos += 1
        # Triangle tables stay refs (sliced per chunk inside the search);
        # the small families are materialized whole.
        tri = dict(zip(TRI_FIELDS, refs[pos:pos + 17]))
        sph = dict(zip(SPH_FIELDS, refs[pos + 17:pos + 22]))
        pln = dict(zip(PLN_FIELDS, refs[pos + 22:pos + 27]))
        mat = dict(zip(MAT_FIELDS, refs[pos + 27:pos + 35]))
        for d in (sph, pln, mat):
            for k in d:
                d[k] = d[k][...]
        pos += 35
        cull = cull_scratch = None
        if meta.get("culled"):
            cull = refs[pos:pos + 29]   # SMEM: 17 tri tables + 12 bounds
            pos += 29
            cull_scratch = refs[-1:]    # SMEM: compacted work list
            refs = refs[:-1]
        pix_ref = refs[pos]
        pos += 1
        frame = ctl_ref[0]
        salt_base = ctl_ref[1]
        jitter_salt = ctl_ref[2]
        pix = pix_ref[0]

        if gen_rays:
            ox, oy, oz, dx, dy, dz = _gen_rays_inkernel(
                cam_ref, pix, frame, jitter_salt, cam_mode
            )
        else:
            (ox_r, oy_r, oz_r, dx_r, dy_r, dz_r) = refs[pos:pos + 6]
            pos += 6
            ox, oy, oz = ox_r[0], oy_r[0], oz_r[0]
            dx, dy, dz = dx_r[0], dy_r[0], dz_r[0]
        if carry_in:
            (tr_r, tg_r, tb_r, cr_r, cg_r, cb_r,
             rr_r, rg_r, rb_r, act_r) = refs[pos:pos + 10]
            pos += 10
            tr, tg, tb = tr_r[0], tg_r[0], tb_r[0]
            cr, cg, cb = cr_r[0], cg_r[0], cb_r[0]
            rr, rg, rb = rr_r[0], rg_r[0], rb_r[0]
            active = act_r[0] > 0.0
            final = act_r[0] > 1.5
        else:
            ones = jnp.ones(pix.shape, jnp.float32)
            zeros = jnp.zeros(pix.shape, jnp.float32)
            tr = tg = tb = ones
            # Whitted starts its path color at the ambient term
            # (integrators.glsl:272; models/integrators.py init).
            amb = jnp.full(pix.shape, _AMBIENT, jnp.float32)
            cr = cg = cb = amb if integ == "whitted" else zeros
            rr = rg = rb = zeros
            active = jnp.ones(pix.shape, bool)
            final = jnp.zeros(pix.shape, bool)

        outs = refs[pos:]
        carry_out = outs[:16]
        if stats:
            stat_outs = outs[-3:]
            outs = outs[:-3]
        state_outs = outs[16:] if collect else ()

        stat_acc = [jnp.int32(0)] * 3
        state = (ox, oy, oz, dx, dy, dz, tr, tg, tb, cr, cg, cb,
                 rr, rg, rb, active)
        for b in range(nb):
            if collect:
                # Save the 13 bounce-input fields: o, d, thr, col, active.
                sl = slice(b * pix.shape[0], (b + 1) * pix.shape[0])
                for f, val in enumerate(state[:12]):
                    state_outs[f][0, sl, :] = val
                state_outs[12][0, sl, :] = state[15].astype(jnp.float32)
            winner, cull_stats = _search(tri, sph, pln, meta, *state[:6],
                                         mint, cull=cull, live=state[15],
                                         cull_scratch=cull_scratch)
            stat_acc = [a + s for a, s in zip(stat_acc, cull_stats)]
            if collect:
                hitmask = state[15] & (winner[5] >= 0)
                state_outs[13][0, sl, :] = jnp.where(hitmask, winner[5], -1)
                state_outs[14][0, sl, :] = jnp.where(hitmask, winner[6], -1)
            salt = salt_base + jnp.uint32(b * 4)
            if integ == "whitted":
                def shadow_search(o3, d3, mask):
                    w, st2 = _search(tri, sph, pln, meta, *o3, *d3, mint,
                                     cull=cull, live=mask,
                                     cull_scratch=cull_scratch)
                    for j in range(3):
                        stat_acc[j] = stat_acc[j] + st2[j]
                    return w
                state = _shade_whitted(mat, meta, pix, frame, salt, state,
                                       winner, shadow_search)
            elif integ == "cook":
                state, final = _shade_cook(mat, meta, pix, frame, salt,
                                           state, winner, final)
            else:
                state = _shade(mat, meta, pix, frame, salt, state, winner)

        (ox, oy, oz, dx, dy, dz, tr, tg, tb, cr, cg, cb,
         rr, rg, rb, active) = state
        if is_last and integ == "cook":
            # A Lambert scatter on the last bounce still resolves: one more
            # search, terminate on emission or sky (integrators.glsl:483-487,
            # mirrored from models/integrators.py integrator_cook tail).
            fin = active & final
            tw, tail_stats = _search(tri, sph, pln, meta, ox, oy, oz,
                                     dx, dy, dz, mint, cull=cull, live=fin,
                                     cull_scratch=cull_scratch)
            stat_acc = [a + s2 for a, s2 in zip(stat_acc, tail_stats)]
            m2 = _mat_fetch(mat, meta, tw[4])
            hit2 = tw[5] >= 0
            sky_r = _WHITE[0] + (_BLUE[0] - _WHITE[0]) * dy
            sky_g = _WHITE[1] + (_BLUE[1] - _WHITE[1]) * dy
            sky_b = _WHITE[2] + (_BLUE[2] - _WHITE[2]) * dy
            rr = jnp.where(fin, rr + cr + tr * jnp.where(hit2, m2["er"], sky_r), rr)
            rg = jnp.where(fin, rg + cg + tg * jnp.where(hit2, m2["eg"], sky_g), rg)
            rb = jnp.where(fin, rb + cb + tb * jnp.where(hit2, m2["eb"], sky_b), rb)
            active = active & ~final
            final = jnp.zeros(pix.shape, bool)
        if is_last and style == "standard":
            rr = jnp.where(active, rr + cr, rr)
            rg = jnp.where(active, rg + cg, rg)
            rb = jnp.where(active, rb + cb, rb)
        act_enc = jnp.where(active, jnp.where(final, 2.0, 1.0), 0.0)
        for ref, val in zip(
            carry_out,
            (ox, oy, oz, dx, dy, dz, tr, tg, tb, cr, cg, cb, rr, rg, rb,
             act_enc),
        ):
            ref[0] = val
        if stats:
            for ref, val in zip(stat_outs, stat_acc):
                ref[0] = jnp.full(pix.shape, val, jnp.float32)

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "meta_key", "mint", "nb", "gen_rays", "cam_mode",
    "carry_in", "collect", "style", "is_last", "interpret", "stats",
    "integ"))
def _path_call(frame, salt_base, jitter_salt, cam_params, tables, cull_tables,
               pix, rays, carry, meta_key, mint, nb, gen_rays, cam_mode,
               carry_in, collect, style, is_last, interpret, stats=False,
               integ="kajiya"):
    meta = dict(meta_key)
    grid = pix.shape[0]
    kern = make_path_kernel(
        meta, mint, nb, gen_rays=gen_rays, cam_mode=cam_mode,
        carry_in=carry_in, collect=collect, style=style, is_last=is_last,
        stats=stats, integ=integ,
    )

    def tab_spec(v):
        return pl.BlockSpec(v.shape, lambda i: (0, 0, 0),
                            memory_space=pltpu.VMEM)

    grid_, rs, rl = pix.shape
    row = pl.BlockSpec((1, rs, rl), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    srow = pl.BlockSpec((1, nb * rs, rl), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    args = [None]  # ctl placeholder, filled below
    if gen_rays:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args.append(cam_params)
    in_specs += [tab_spec(v) for v in tables]
    args += list(tables)
    scratch = []
    if meta.get("culled"):
        in_specs += [pl.BlockSpec(memory_space=pltpu.SMEM)] * len(cull_tables)
        args += list(cull_tables)
        scratch.append(pltpu.SMEM((meta["n_clu"],), jnp.int32))
    in_specs.append(row)
    args.append(pix)
    if not gen_rays:
        in_specs += [row] * 6
        args += list(rays)
    if carry_in:
        in_specs += [row] * 10
        args += list(carry)

    out_shapes = [jax.ShapeDtypeStruct((grid, rs, rl), jnp.float32)] * 16
    out_specs = [row] * 16
    if collect:
        out_shapes += [jax.ShapeDtypeStruct((grid, nb * rs, rl), jnp.float32)] * 13
        out_shapes += [jax.ShapeDtypeStruct((grid, nb * rs, rl), jnp.int32)] * 2
        out_specs += [srow] * 15
    if stats:
        out_shapes += [jax.ShapeDtypeStruct((grid, rs, rl), jnp.float32)] * 3
        out_specs += [row] * 3
    ctl = jnp.stack([
        jnp.asarray(frame, jnp.uint32),
        jnp.asarray(salt_base, jnp.uint32),
        jnp.asarray(jitter_salt, jnp.uint32),
    ])
    args[0] = ctl
    return pl.pallas_call(
        kern, grid=(grid,),
        in_specs=in_specs, out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes), interpret=interpret,
        scratch_shapes=scratch,
    )(*args)


# ---------------------------------------------------------------------------
# Backward (whole-chain pullback, one kernel per bounce group)
# ---------------------------------------------------------------------------


def make_bwd_kernel(meta, nb, *, style, is_last, is_first):
    """Pullback over one bounce group (reversed in-kernel, unrolled)."""
    tri_rows = meta["tri_rows"]
    sph_rows = meta["sph_rows"]
    pln_rows = meta["pln_rows"]
    mat_rows = meta["mat_rows"]

    def kernel(ctl_ref, *refs):
        difftab = tuple(r[...] for r in refs[:24])
        tmat, smat, pmat, mkind = (r[...] for r in refs[24:28])
        pix_ref = refs[28]
        states = refs[29:42]   # 13 saved fields, [1, nb*S, L]
        fam_ref, idx_ref = refs[42], refs[43]
        g_rows = refs[44:47]   # res cotangent (constant through the chain)
        cot_in = refs[47:59]   # incoming (o,d,thr,col) cotangents
        cot_out = refs[59:71]
        gtab_refs = refs[71:95]

        frame = ctl_ref[0]
        salt_base = ctl_ref[1]
        pix = pix_ref[0]
        grr, grg, grb = g_rows[0][0], g_rows[1][0], g_rows[2][0]

        def bounce_field(ref, b):
            return ref[0, b * S:(b + 1) * S, :]

        if is_last:
            zeros = jnp.zeros((S, L), jnp.float32)
            gox = goy = goz = gdx = gdy = gdz = zeros
            gtr = gtg = gtb = zeros
            if style == "standard":
                act_in = bounce_field(states[12], nb - 1) > 0.0
                fam_l = bounce_field(fam_ref, nb - 1)
                act_fin = act_in & (fam_l >= 0)
                gcr = jnp.where(act_fin, grr, 0.0)
                gcg = jnp.where(act_fin, grg, 0.0)
                gcb = jnp.where(act_fin, grb, 0.0)
            else:
                gcr = gcg = gcb = zeros
        else:
            (gox, goy, goz, gdx, gdy, gdz,
             gtr, gtg, gtb, gcr, gcg, gcb) = (r[0] for r in cot_in)

        gtabs = None
        for b in reversed(range(nb)):
            fam = bounce_field(fam_ref, b)
            idx = bounce_field(idx_ref, b)
            act_in = bounce_field(states[12], b) > 0.0
            hit = fam >= 0
            active = act_in & hit
            miss_now = act_in & ~hit

            ru, rv, rw = _rng(pix, frame, salt_base + jnp.uint32(b * 4))

            def onehot(rows, safe_idx):
                ri = jax.lax.broadcasted_iota(jnp.int32, (rows, S, L), 0)
                return ri == safe_idx[None]

            def sel(oh, col):
                return jnp.sum(jnp.where(oh, col, 0.0), axis=0)

            mat_id = jnp.zeros((S, L), jnp.int32)
            tri_oh = sph_oh = pln_oh = None
            m_tri = m_sph = m_pln = None
            if meta["has_tri"]:
                tri_oh = onehot(tri_rows, jnp.clip(idx, 0, meta["num_tri"] - 1))
                m_tri = fam == 0
                mat_id = jnp.where(m_tri, sel(tri_oh, tmat).astype(jnp.int32),
                                   mat_id)
            if meta["has_sph"]:
                sph_oh = onehot(sph_rows, jnp.clip(idx, 0, meta["num_sph"] - 1))
                m_sph = fam == 1
                mat_id = jnp.where(m_sph, sel(sph_oh, smat).astype(jnp.int32),
                                   mat_id)
            if meta["has_pln"]:
                pln_oh = onehot(pln_rows, jnp.clip(idx, 0, meta["num_pln"] - 1))
                m_pln = fam == 2
                mat_id = jnp.where(m_pln, sel(pln_oh, pmat).astype(jnp.int32),
                                   mat_id)
            mat_oh = onehot(mat_rows, jnp.clip(mat_id, 0, meta["num_mat"] - 1))
            kind = sel(mat_oh, mkind)
            is_lam = kind == 0.0
            is_mir = kind == 1.0

            # The winner-attribute lookups run OUTSIDE the vjp'd function, so
            # autodiff only ever sees [S, L] values: the transpose of the
            # [rows,1,1]->[rows,S,L] broadcast is a single reduce over axes
            # (1, 2), which the Mosaic compiler cannot lower (layout.h check,
            # reproduced on v5e).  The lookup pullback is hand-written below
            # as masked two-step reductions instead.
            zeros_sl = jnp.zeros((S, L), jnp.float32)
            lk = []
            lk += ([sel(tri_oh, c) for c in difftab[0:9]]
                   if meta["has_tri"] else [zeros_sl] * 9)
            lk += ([sel(sph_oh, c) for c in difftab[9:13]]
                   if meta["has_sph"] else [zeros_sl] * 4)
            lk += ([sel(pln_oh, c) for c in difftab[13:17]]
                   if meta["has_pln"] else [zeros_sl] * 4)
            lk += [sel(mat_oh, c) for c in difftab[17:24]]

            def f(ox, oy, oz, dx, dy, dz, tr, tg, tb, cr, cg, cb, *tabs):
                (v0x, v0y, v0z, v1x, v1y, v1z, v2x, v2y, v2z,
                 cx, cy, cz, r, lnx, lny, lnz, doff,
                 alb_r, alb_g, alb_b, em_r, em_g, em_b, ior) = tabs

                t = jnp.zeros((S, L), jnp.float32)
                wnx = jnp.zeros((S, L), jnp.float32)
                wny = jnp.zeros((S, L), jnp.float32)
                wnz = jnp.zeros((S, L), jnp.float32)

                if meta["has_tri"]:
                    e0x, e0y, e0z = v1x - v0x, v1y - v0y, v1z - v0z
                    e1x, e1y, e1z = v2x - v0x, v2y - v0y, v2z - v0z
                    nx = e0y * e1z - e0z * e1y
                    ny = e0z * e1x - e0x * e1z
                    nz = e0x * e1y - e0y * e1x
                    dn = dx * nx + dy * ny + dz * nz
                    t_t = _safe_div(
                        (v0x - ox) * nx + (v0y - oy) * ny + (v0z - oz) * nz, dn
                    )
                    t = jnp.where(m_tri, jnp.clip(t_t, -1e6, 1e6), t)
                    wnx = jnp.where(m_tri, nx, wnx)
                    wny = jnp.where(m_tri, ny, wny)
                    wnz = jnp.where(m_tri, nz, wnz)

                if meta["has_sph"]:
                    ocx, ocy, ocz = ox - cx, oy - cy, oz - cz
                    dd = dx * dx + dy * dy + dz * dz
                    bh = dx * ocx + dy * ocy + dz * ocz
                    ct = ocx * ocx + ocy * ocy + ocz * ocz - r * r
                    disc = jnp.maximum(bh * bh - dd * ct, 1e-12)
                    sq = jnp.sqrt(disc)
                    t0 = _safe_div(-bh - sq, dd)
                    t1 = _safe_div(-bh + sq, dd)
                    t_s = jnp.where(t0 > 0.0, t0, t1)
                    t_s = jnp.where(m_sph, jnp.clip(t_s, -1e6, 1e6), 0.0)
                    t = jnp.where(m_sph, t_s, t)
                    wnx = jnp.where(m_sph, ox + t_s * dx - cx, wnx)
                    wny = jnp.where(m_sph, oy + t_s * dy - cy, wny)
                    wnz = jnp.where(m_sph, oz + t_s * dz - cz, wnz)

                if meta["has_pln"]:
                    dn = dx * lnx + dy * lny + dz * lnz
                    t_p = _safe_div(doff - (ox * lnx + oy * lny + oz * lnz), dn)
                    t = jnp.where(m_pln, jnp.clip(t_p, -1e6, 1e6), t)
                    wnx = jnp.where(m_pln, lnx, wnx)
                    wny = jnp.where(m_pln, lny, wny)
                    wnz = jnp.where(m_pln, lnz, wnz)

                sky_t = dy * 0.5 + 0.5
                ra = jnp.where(miss_now, cr + tr * (_WHITE[0] + (_BLUE[0] - _WHITE[0]) * sky_t), 0.0)
                ga = jnp.where(miss_now, cg + tg * (_WHITE[1] + (_BLUE[1] - _WHITE[1]) * sky_t), 0.0)
                ba = jnp.where(miss_now, cb + tb * (_WHITE[2] + (_BLUE[2] - _WHITE[2]) * sky_t), 0.0)

                cr2 = jnp.where(active, cr + tr * em_r, cr)
                cg2 = jnp.where(active, cg + tg * em_g, cg)
                cb2 = jnp.where(active, cb + tb * em_b, cb)

                px = ox + t * dx
                py = oy + t * dy
                pz = oz + t * dz
                inv_nl = _rsqrt_safe(wnx * wnx + wny * wny + wnz * wnz)
                nX, nY, nZ = wnx * inv_nl, wny * inv_nl, wnz * inv_nl
                inv_dl = _rsqrt_safe(dx * dx + dy * dy + dz * dz)
                iX, iY, iZ = dx * inv_dl, dy * inv_dl, dz * inv_dl

                cos_view = iX * nX + iY * nY + iZ * nZ
                flipped = cos_view > 0.0
                cos_in = jnp.abs(cos_view)
                nX = jnp.where(flipped, -nX, nX)
                nY = jnp.where(flipped, -nY, nY)
                nZ = jnp.where(flipped, -nZ, nZ)
                eta = jnp.where(flipped, ior, 1.0 / jnp.maximum(ior, 1e-8))

                phi = _TWO_PI * ru
                cos_t = 1.0 - 2.0 * rv
                sin_t = jnp.sqrt(jnp.maximum(1e-12, 1.0 - cos_t * cos_t))
                lamX = nX + sin_t * jnp.cos(phi)
                lamY = nY + sin_t * jnp.sin(phi)
                lamZ = nZ + cos_t

                refX = iX + 2.0 * cos_in * nX
                refY = iY + 2.0 * cos_in * nY
                refZ = iZ + 2.0 * cos_in * nZ

                cos_out_sqr = 1.0 - eta * eta * (1.0 - cos_in * cos_in)
                cos_out = jnp.sqrt(jnp.maximum(1e-12, cos_out_sqr))
                r_perp = (eta * cos_in - cos_out) / (eta * cos_in + cos_out)
                r_par = (cos_in - eta * cos_out) / (cos_in + eta * cos_out)
                f_refl = 0.5 * (r_perp * r_perp + r_par * r_par)
                refl = jax.lax.stop_gradient(
                    (cos_out_sqr <= 0.0) | (rw < f_refl)
                )
                k = eta * cos_in - cos_out
                dieX = jnp.where(refl, refX, eta * iX + k * nX)
                dieY = jnp.where(refl, refY, eta * iY + k * nY)
                dieZ = jnp.where(refl, refZ, eta * iZ + k * nZ)
                die_off = jnp.where(refl, _EPSILON, -_EPSILON)

                out_dx = jnp.where(is_lam, lamX, jnp.where(is_mir, refX, dieX))
                out_dy = jnp.where(is_lam, lamY, jnp.where(is_mir, refY, dieY))
                out_dz = jnp.where(is_lam, lamZ, jnp.where(is_mir, refZ, dieZ))
                off = jnp.where(is_lam | is_mir, _EPSILON, die_off)

                ox2 = jnp.where(active, px + off * nX, ox)
                oy2 = jnp.where(active, py + off * nY, oy)
                oz2 = jnp.where(active, pz + off * nZ, oz)
                dx2 = jnp.where(active, out_dx, dx)
                dy2 = jnp.where(active, out_dy, dy)
                dz2 = jnp.where(active, out_dz, dz)
                tr2 = jnp.where(active, tr * alb_r, tr)
                tg2 = jnp.where(active, tg * alb_g, tg)
                tb2 = jnp.where(active, tb * alb_b, tb)
                return (ox2, oy2, oz2, dx2, dy2, dz2, tr2, tg2, tb2,
                        cr2, cg2, cb2, ra, ga, ba)

            primals = tuple(
                bounce_field(states[f], b) for f in range(12)
            ) + tuple(lk)
            _, pullback = jax.vjp(f, *primals)
            cots = pullback((gox, goy, goz, gdx, gdy, gdz, gtr, gtg, gtb,
                             gcr, gcg, gcb, grr, grg, grb))
            (gox, goy, goz, gdx, gdy, gdz,
             gtr, gtg, gtb, gcr, gcg, gcb) = cots[:12]

            # Hand pullback of the lookups: scatter each looked-up value's
            # [S, L] cotangent back to its table rows via the one-hot mask,
            # reducing sublanes and lanes in two single-axis sums.
            def scatter(oh, g):
                gb = jnp.where(oh, g[None], 0.0)
                return jnp.sum(
                    jnp.sum(gb, axis=2, keepdims=True), axis=1, keepdims=True
                )

            step = []
            for i in range(24):
                oh = (tri_oh if i < 9 else sph_oh if i < 13
                      else pln_oh if i < 17 else mat_oh)
                if oh is None:
                    step.append(jnp.zeros_like(difftab[i]))
                else:
                    step.append(scatter(oh, cots[12 + i]))
            gtabs = step if gtabs is None else tuple(
                a + s for a, s in zip(gtabs, step)
            )

        for ref, val in zip(cot_out, (gox, goy, goz, gdx, gdy, gdz,
                                      gtr, gtg, gtb, gcr, gcg, gcb)):
            ref[0] = val

        @pl.when(pl.program_id(0) == 0)
        def _init():
            for r in gtab_refs:
                r[...] = jnp.zeros(r.shape, r.dtype)

        for r, val in zip(gtab_refs, gtabs):
            r[...] = r[...] + val

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "meta_key", "nb", "style", "is_last", "is_first", "interpret"))
def _bwd_call(frame, salt_base, tables, pix, states, fam, idx, g_rows, cot_in,
              meta_key, nb, style, is_last, is_first, interpret):
    meta = dict(meta_key)
    grid = pix.shape[0]
    kern = make_bwd_kernel(meta, nb, style=style,
                           is_last=is_last, is_first=is_first)

    def tab_spec(v):
        return pl.BlockSpec(v.shape, lambda i: (0, 0, 0),
                            memory_space=pltpu.VMEM)

    row = pl.BlockSpec((1, S, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    srow = pl.BlockSpec((1, nb * S, L), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    in_specs = ([pl.BlockSpec(memory_space=pltpu.SMEM)]
                + [tab_spec(v) for v in tables]
                + [row] + [srow] * 15 + [row] * 15)
    out_shapes = tuple(
        [jax.ShapeDtypeStruct((grid, S, L), jnp.float32)] * 12
        + [jax.ShapeDtypeStruct(t.shape, jnp.float32) for t in tables[:24]]
    )
    out_specs = tuple([row] * 12 + [tab_spec(t) for t in tables[:24]])
    ctl = jnp.stack([
        jnp.asarray(frame, jnp.uint32), jnp.asarray(salt_base, jnp.uint32)
    ])
    return pl.pallas_call(
        kern, grid=(grid,), in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shapes, interpret=interpret,
    )(ctl, *tables, pix, *states, fam, idx, *g_rows, *cot_in)


# ---------------------------------------------------------------------------
# Host-side driver
# ---------------------------------------------------------------------------


def _to_tiles(x, fill=0.0):
    """Flat [N] -> [grid, S, L] (padded)."""
    x = jnp.asarray(x)
    n = x.shape[0]
    pad = (-n) % TILE
    if pad:
        x = jnp.concatenate([x, jnp.full((pad,), fill, x.dtype)])
    return x.reshape(-1, S, L)


# Measured NEGATIVE result (reverted; kept for the record): a per-lane-group
# cluster walk — re-laying each tile so every [8,128] vreg holds 1024
# sort-adjacent rays, then walking each vreg's own (much smaller) cluster
# union.  The probe (benchmarks/bigmesh_cull_probe.py) shows per-group
# unions 1.9-3.1x smaller than the tile union, but the kernel measured
# SLOWER both ways it was built (per-group lists: 294 vs 226 ms at the
# heavy bounce; tile-list + per-group still-checks: same): the VPU triangle
# math it saves is cheaper than the scalar-core loop/branch overhead it
# adds (8x the cluster-visit control flow, 17 SMEM scalar loads per
# triangle no longer amortized over 8 vregs).  Fat [8,1024] tiles keep the
# scalar core off the critical path — the same lesson as round 1's
# [1,1024]-row experiment.


def _from_tiles(x, n):
    return x.reshape(-1)[:n]


def _groups(max_bounces):
    nb = int(max_bounces)
    out = []
    start = 0
    while start < nb:
        g = min(MAX_GROUP, nb - start)
        out.append((start, g))
        start += g
    return out


class PathTracer:
    """Whole-path fused tracer for a scene: the TPU megakernel.

    Scenes with an attached BVH route their triangles through the SMEM
    cluster-culled mesh path (pack_cull) — leaf-ordered clusters, per-tile
    compacted work lists — which scales to CULL_MAX_TRIS triangles; scenes
    without one use the VMEM row path (fastest for small counts)."""

    def __init__(self, scene: Scene, mint: float = 0.0):
        self.scene = scene
        self.mint = float(mint)
        culled = (scene.bvh is not None
                  and 0 < scene.num_triangles <= CULL_MAX_TRIS)
        self.tables, self.meta = pack_fwd(scene, culled=culled)
        if culled:
            self.cull_tables, cull_meta = pack_cull(scene)
            self.meta.update(cull_meta)
            self.meta["culled"] = True
        else:
            self.cull_tables = None
        self.meta_key = tuple(sorted(self.meta.items()))

    def trace(self, pixel, origin, direction, frame, salt_base, max_bounces,
              style="reference", interpret=False, collect_states=False,
              gen_rays=False, cam_params=None, cam_mode=PINHOLE,
              jitter_salt=0, stats=False, integ="kajiya"):
        """Trace full paths.  Returns (r, g, b) flat [N] radiance — plus,
        with ``collect_states``, the residual record for bwd_path.

        With ``gen_rays`` the kernel generates camera rays itself from the
        pixel ids (origin/direction are ignored; pass None) — cam_params is
        the f32[24] vector from camera_params().  ``integ`` selects the
        bounce integrator (kajiya/whitted/cook); hit-record collection is a
        Kajiya-only path."""
        if integ != "kajiya" and collect_states:
            raise ValueError("hit records are a Kajiya-only path")
        n = pixel.shape[0]
        tiles = _to_ctiles if self.meta.get("culled") else _to_tiles
        pix = tiles(pixel)
        if gen_rays:
            rays = None
        else:
            if isinstance(origin, tuple):
                o0, o1, o2 = origin
                d0, d1, d2 = direction
            else:
                o0, o1, o2 = origin[:, 0], origin[:, 1], origin[:, 2]
                d0, d1, d2 = direction[:, 0], direction[:, 1], direction[:, 2]
            rays = tuple(tiles(c) for c in (o0, o1, o2, d0, d1, d2))

        frame = jnp.asarray(frame, jnp.uint32)
        groups = _groups(max_bounces)
        carry = None
        records = []
        stat_rows = []
        for gi, (start, g) in enumerate(groups):
            outs = _path_call(
                frame,
                jnp.asarray(salt_base, jnp.uint32) + jnp.uint32(start * 4),
                jnp.asarray(jitter_salt, jnp.uint32),
                cam_params, self.tables, self.cull_tables, pix,
                rays if gi == 0 else tuple(carry[:6]),
                tuple(carry[6:]) if gi > 0 else None,
                self.meta_key, self.mint, g,
                gen_rays and gi == 0, cam_mode,
                gi > 0, collect_states, style, gi == len(groups) - 1,
                interpret, stats, integ,
            )
            if stats:
                stat_rows.append(tuple(o[:, 0, 0] for o in outs[-3:]))
                outs = outs[:-3]
            carry = outs[:16]
            if collect_states:
                records.append((g, outs[16:29], outs[29], outs[30]))

        rr, rg, rb = carry[12], carry[13], carry[14]
        res = (_from_tiles(rr, n), _from_tiles(rg, n), _from_tiles(rb, n))
        if stats:
            # Per-tile (listed, processed, still-passed) cluster counts
            # summed over all bounces: [grid] each.
            agg = tuple(sum(r[i] for r in stat_rows) for i in range(3))
            if collect_states:
                return res, dict(pix=pix, groups=tuple(records)), agg
            return res, agg
        if collect_states:
            record = dict(pix=pix, groups=tuple(records))
            return res, record
        return res

    def trace_primary(self, pixel, frame, mode, *, cam_params, cam_mode,
                      salt_base, jitter_salt, nrays=1, interpret=False):
        """Single-intersection debug integrator (mode in PRIMARY_MODES) with
        in-kernel ray generation — see make_primary_kernel."""
        n = pixel.shape[0]
        pix = (_to_ctiles if self.meta.get("culled") else _to_tiles)(pixel)
        r, g, b = _primary_call(
            jnp.asarray(frame, jnp.uint32),
            jnp.asarray(salt_base, jnp.uint32),
            jnp.asarray(jitter_salt, jnp.uint32),
            cam_params, self.tables, self.cull_tables, pix,
            self.meta_key, self.mint, int(mode), cam_mode, int(nrays),
            interpret,
        )
        return _from_tiles(r, n), _from_tiles(g, n), _from_tiles(b, n)

    def hits_from_record(self, record, n, max_bounces):
        """Per-bounce (fams, idxs) i32[B, N] from a collect_states record —
        the flat hit-record layout of the SoA replay path."""
        fams, idxs = [], []
        for g, _, fam, idx in record["groups"]:
            rs = fam.shape[1] // g
            for b in range(g):
                fams.append(_from_tiles(fam[:, b * rs:(b + 1) * rs, :], n))
                idxs.append(_from_tiles(idx[:, b * rs:(b + 1) * rs, :], n))
        return jnp.stack(fams), jnp.stack(idxs)


def bwd_path(scene, record, frame, g_rows, salt_base: int, style: str,
             interpret: bool = False):
    """Whole-chain pullback from a collect_states record.

    g_rows: (gr, gg, gb) cotangent tiles [grid, S, L].  Returns
    (gtabs 24-tuple in DIFF_FIELDS order, g_origin rows, g_direction rows).
    """
    tables, meta = pack_bwd(scene)
    meta_key = tuple(sorted(meta.items()))
    frame = jnp.asarray(frame, jnp.uint32)
    pix = record["pix"]
    groups = record["groups"]

    zero = jnp.zeros_like(g_rows[0])
    cot = (zero,) * 12
    gtabs = None
    start = sum(g for g, _, _, _ in groups)
    for gi in reversed(range(len(groups))):
        g, states, fam, idx = groups[gi]
        start -= g
        outs = _bwd_call(
            frame,
            jnp.asarray(salt_base, jnp.uint32) + jnp.uint32(start * 4),
            tables, pix, tuple(states), fam, idx, tuple(g_rows),
            tuple(cot), meta_key, g, style,
            gi == len(groups) - 1, gi == 0, interpret,
        )
        cot = outs[:12]
        step = outs[12:]
        gtabs = step if gtabs is None else tuple(
            a + s for a, s in zip(gtabs, step)
        )
    return gtabs, cot[0:3], cot[3:6]


def scene_grads_from_tables(scene, gtabs):
    """Unpad [rows,1,1] table-grad columns to scene-shaped leaf grads."""
    g = {k: v[:, 0, 0] for k, v in zip(DIFF_FIELDS, gtabs)}
    t, s, p = scene.num_triangles, scene.num_spheres, scene.num_planes
    m = scene.materials.count

    def v3(a, b, c, n):
        return jnp.stack([g[a][:n], g[b][:n], g[c][:n]], axis=-1)

    zero3 = jnp.zeros((0, 3), jnp.float32)
    out = {}
    out["tri_v0"] = v3("tv0x", "tv0y", "tv0z", t) if t else zero3
    out["tri_v1"] = v3("tv1x", "tv1y", "tv1z", t) if t else zero3
    out["tri_v2"] = v3("tv2x", "tv2y", "tv2z", t) if t else zero3
    out["sph_center"] = v3("scx", "scy", "scz", s) if s else zero3
    out["sph_radius"] = g["srad"][:s]
    out["pln_normal"] = v3("pnx", "pny", "pnz", p) if p else zero3
    out["pln_d"] = g["pd"][:p]
    out["albedo"] = v3("mar", "mag", "mab", m)
    out["emission"] = v3("mer", "meg", "meb", m)
    out["ior"] = g["mior"][:m]
    return out


def camera_params(cam, cfg) -> jnp.ndarray:
    """f32[24] camera/film parameter vector for in-kernel ray generation."""
    from ..core.math import PI
    from ..models.camera import ORTHO as CAM_ORTHO
    from ..models.camera import camera_matrix

    m = camera_matrix(cam)
    if cam.mode == CAM_ORTHO:
        proj = cam.scale
    else:
        proj = 1.0 / jnp.tan(0.5 * cam.fov * (PI / 180.0))
    return jnp.concatenate([
        m.reshape(16),
        jnp.asarray([cam.aspect], jnp.float32),
        jnp.asarray(proj, jnp.float32).reshape(1),
        jnp.asarray([1.0 / cfg.width, 1.0 / cfg.height,
                     float(cfg.width)], jnp.float32),
        jnp.zeros((3,), jnp.float32),
    ]).astype(jnp.float32)


# ---------------------------------------------------------------------------
# Big-mesh chunked path: beyond SMEM capacity (CULL_MAX_TRIS), one launch
# per bounce streams the triangle tables chunk-by-chunk through SMEM
# ---------------------------------------------------------------------------

BIG_CHUNK_T = 4096                       # triangles streamed per chunk step
# Chunked-path cluster width.  32 measured faster than the SMEM path's 16
# at ico5 1080p x 8 (339.9 vs 355.9 ms same-session, bit-identical): the
# walk is bound by per-cluster-visit FIXED cost (round-5 diagnosis), so
# fewer, fatter clusters win even though their looser boxes list more
# triangles.  The SMEM culled path keeps CULL_K=16 (its scalar fold pays
# per TRIANGLE, not per cluster).
BIG_CULL_K = 32
BIG_CHUNK_CLU = BIG_CHUNK_T // BIG_CULL_K  # clusters per chunk
BIG_CHUNK_SUP = BIG_CHUNK_CLU // CULL_G    # supergroups per chunk
BIG_BOUND_PAD = 1024  # bound-table strides (XLA tiles 1D arrays at T(1024))


# Routing threshold for BVH meshes: ABOVE this the chunked manual-DMA path
# serves the scene (the SMEM culled whole-path kernel still has capacity to
# CULL_MAX_TRIS, but the chunked path measured FASTER well below it:
# ico3/1,282 tris 1080p x8 — culled fused 152.3 ms vs chunked 123.9 ms,
# benchmarks/culled_vs_chunked.py; rows-fold walk + block-major tiles beat
# the SMEM scalar fold).  Small meshes (rabbit-class) keep the fused
# whole-path kernel, whose single launch wins when the walk is trivial.
BIG_ROUTE_TRIS = 1024


def is_bigmesh(scene: Scene) -> bool:
    """True when a scene routes through the chunked big-mesh path — the ONE
    capacity rule shared by the display, sharded, and gradient paths."""
    return (scene.bvh is not None
            and scene.num_triangles > min(BIG_ROUTE_TRIS, CULL_MAX_TRIS))


def pack_cull_chunked(scene: Scene) -> tuple[tuple, dict]:
    """Chunked SMEM tables for meshes beyond CULL_MAX_TRIS.

    Same leaf-ordered cluster/supergroup structure as pack_cull, reshaped to
    [n_chunks, BIG_CHUNK_*] so a second grid axis streams one chunk's tables
    through SMEM per step (double-buffered by the Pallas pipeline; the whole
    mesh never has to fit).  Padded clusters get INVERTED boxes (+inf/-inf);
    note an inverted box still PASSES the orientation-agnostic slab test
    (per-axis min/max normalisation turns (+B,-B) into (-B,+B)), so the
    walk and the tile cull must never test padded entries: both clamp their
    listing loops to the per-chunk real counts in ``chunk_counts``.

    Bound tables are FLAT 1D with per-chunk strides (XLA tiles 1D arrays
    at T(1024), so every stride is a 1024-multiple): 6 supergroup + 6
    cluster bound tables [n_chunks * BIG_BOUND_PAD] (entries beyond
    BIG_CHUNK_SUP/BIG_CHUNK_CLU are inverted-box padding).  Triangle
    fields are packed TRIANGLE-ROW x FIELD-LANE: [n_chunks*BIG_CHUNK_T,
    128] f32 with field k of triangle i at [c*BIG_CHUNK_T+i, k] (lanes
    17..127 zero) — rows land on dense (8,128) VMEM tiles, so one chunk's
    block costs BIG_CHUNK_T*512 B (2 MB at 4096).  A [rows,1,1] column
    layout pads every row to a full tile: 17*4096 rows was a 70 MB scoped
    VMEM block, over the 16 MB limit at compile time (measured;
    benchmarks/layout_probe.py pins both layouts at equal fold
    throughput).

    Returns (tables, meta, (sup_lo, sup_hi, sup_counts)) where sup_lo/
    sup_hi [n_chunks, BIG_CHUNK_SUP, 3] are the unpadded supergroup boxes
    used by the XLA-side per-tile chunk cull (_bigmesh_chunk_worklist) and
    sup_counts is the static per-chunk real supergroup count that bounds
    its listing loop.
    """
    t = scene.num_triangles
    if t < 1:
        raise ValueError("chunked path needs triangles")
    tp = -(-t // BIG_CULL_K) * BIG_CULL_K
    n_clu = tp // BIG_CULL_K
    n_chunks = -(-n_clu // BIG_CHUNK_CLU)
    clu_pad = n_chunks * BIG_CHUNK_CLU - n_clu
    tri_pad = n_chunks * BIG_CHUNK_T - tp

    fields = _tri_fields(scene)

    def flat(a):
        a = jnp.asarray(a, jnp.float32)
        return jnp.pad(a, (0, tp - t + tri_pad))

    tri_tabs = tuple(flat(fields[k]) for k in TRI_FIELDS)
    # Raw vertex lanes (17..25) for the chunked Hart march: iq triangle
    # distance needs v0/v1/v2, not the metric-tensor search fields.
    # Edge-padded (duplicate last triangle) — a zero-padded triangle at the
    # origin would poison the min-distance fold; duplicates are harmless.
    vert_tabs = tuple(
        jnp.pad(jnp.asarray(v[:, k], jnp.float32),
                (0, tp - t + tri_pad), mode="edge")
        for v in (scene.tri_v0, scene.tri_v1, scene.tri_v2)
        for k in range(3)
    )

    bmin = jnp.minimum(jnp.minimum(scene.tri_v0, scene.tri_v1), scene.tri_v2)
    bmax = jnp.maximum(jnp.maximum(scene.tri_v0, scene.tri_v1), scene.tri_v2)
    eps = 1e-4 * jnp.max(bmax) - 1e-4 * jnp.min(bmin) + 1e-6
    pad_tri = ((0, tp - t), (0, 0))
    bmin = jnp.pad(bmin, pad_tri, mode="edge")
    bmax = jnp.pad(bmax, pad_tri, mode="edge")
    cb0 = jnp.min(bmin.reshape(n_clu, BIG_CULL_K, 3), axis=1) - eps
    cb1 = jnp.max(bmax.reshape(n_clu, BIG_CULL_K, 3), axis=1) + eps
    # Padded clusters: inverted boxes — identity elements for the min/max
    # bound folds, but NOT slab-proof (see docstring); never tested because
    # every listing loop is clamped to the real per-chunk counts below.
    cb0 = jnp.concatenate([cb0, jnp.full((clu_pad, 3), _BIG, jnp.float32)])
    cb1 = jnp.concatenate([cb1, jnp.full((clu_pad, 3), -_BIG, jnp.float32)])
    cb0c = cb0.reshape(n_chunks, BIG_CHUNK_CLU, 3)
    cb1c = cb1.reshape(n_chunks, BIG_CHUNK_CLU, 3)
    sb0 = jnp.min(cb0c.reshape(n_chunks, BIG_CHUNK_SUP, CULL_G, 3), axis=2)
    sb1 = jnp.max(cb1c.reshape(n_chunks, BIG_CHUNK_SUP, CULL_G, 3), axis=2)
    sup_pad = ((0, 0), (0, BIG_BOUND_PAD - BIG_CHUNK_SUP), (0, 0))
    sb0 = jnp.pad(sb0, sup_pad, constant_values=_BIG)
    sb1 = jnp.pad(sb1, sup_pad, constant_values=-_BIG)
    # Per-chunk ROOT box in the (never slab-tested: all listing loops are
    # clamped to the real counts) last slot of the supergroup strides, so
    # the Hart kernel reads it instead of re-folding all BIG_CHUNK_SUP
    # bounds at every (tile, chunk) grid step (ADVICE r3).  The slot must
    # BE padding: if a BIG_CHUNK_T/CULL_K/CULL_G retune ever pushes
    # BIG_CHUNK_SUP to BIG_BOUND_PAD, the write would silently clobber a
    # real supergroup box (ADVICE r4).
    assert BIG_CHUNK_SUP < BIG_BOUND_PAD, (
        "chunk root-box slot BIG_BOUND_PAD-1 must be supergroup padding")
    sb0 = sb0.at[:, -1].set(jnp.min(sb0[:, :BIG_CHUNK_SUP], axis=1))
    sb1 = sb1.at[:, -1].set(jnp.max(sb1[:, :BIG_CHUNK_SUP], axis=1))
    clu_pad2 = ((0, 0), (0, BIG_BOUND_PAD - BIG_CHUNK_CLU), (0, 0))
    cb0c = jnp.pad(cb0c, clu_pad2, constant_values=_BIG)
    cb1c = jnp.pad(cb1c, clu_pad2, constant_values=-_BIG)
    bound_tabs = tuple(
        a[:, :, k].reshape(-1) for a in (sb0, sb1) for k in range(3)
    ) + tuple(a[:, :, k].reshape(-1) for a in (cb0c, cb1c) for k in range(3))
    meta = dict(n_chunks=n_chunks, num_tri=t)
    # Real (unpadded) supergroup/cluster counts per chunk: the walk and the
    # tile cull clamp their listing loops to these so inverted-box padding
    # is never slab-tested (it would pass — see docstring).  The last
    # chunk's padding otherwise costs every tile up to BIG_CHUNK_CLU
    # spurious cluster folds per bounce.
    clu_cnt = [min(BIG_CHUNK_CLU, n_clu - c * BIG_CHUNK_CLU)
               for c in range(n_chunks)]
    sup_cnt = tuple(-(-cc // CULL_G) for cc in clu_cnt)
    # Stride 1024 (not 2): XLA tiles 1-D arrays at T(1024) — same rule
    # that sizes BIG_BOUND_PAD — and Mosaic block shapes must match.
    counts = jnp.zeros((n_chunks, 1024), jnp.int32)
    counts = counts.at[:, 0].set(jnp.asarray(sup_cnt, jnp.int32))
    counts = counts.at[:, 1].set(jnp.asarray(clu_cnt, jnp.int32))
    counts = counts.reshape(-1)
    sup_boxes = (sb0[:, :BIG_CHUNK_SUP], sb1[:, :BIG_CHUNK_SUP], sup_cnt)
    # Consolidated chunk operands (the kernel re-evaluates every operand's
    # index map and copy-elision check at every grid step; with
    # tiles x chunk-slot grids, 29 separate tables were a measurable slice
    # of the no-walk floor):
    #   bounds_packed  SMEM [n_chunks * 12*BIG_BOUND_PAD] — 6 supergroup +
    #                  6 cluster bound strides per chunk (listing phase)
    #   tri_lanes      VMEM [n_chunks * BIG_CHUNK_T, 128] — triangle-row x
    #                  field-lane block per chunk (docstring layout note)
    #   counts         SMEM [n_chunks * 1024] — (sup_cnt, clu_cnt) in
    #                  slots 0/1 of each chunk's 1024-int stride
    bounds_packed = jnp.concatenate(
        [v.reshape(n_chunks, -1) for v in bound_tabs], axis=1
    ).reshape(-1)
    all_lanes = tri_tabs + vert_tabs
    tri_lanes = jnp.pad(jnp.stack(all_lanes, axis=1),
                        ((0, 0), (0, 128 - len(all_lanes))))
    return (bounds_packed, tri_lanes, counts), meta, sup_boxes


class _OffsetView:
    """Scalar-indexed window into the packed chunk table (SMEM ref): view
    k's element i is the packed ref's element base_k + i.  Lets the culled
    walk keep its 29-table indexing while the pipeline moves ONE operand."""

    __slots__ = ("ref", "base")

    def __init__(self, ref, base):
        self.ref = ref
        self.base = base

    def __getitem__(self, i):
        return self.ref[self.base + i]


def make_bigmesh_kernel(meta, mint, *, style, is_last, collect=False,
                        search_only=False):
    """One bounce of the big-mesh path.  Grid (tiles, chunk slots), slots
    inner: slot 0 seeds the winner with the dense sphere/plane search, each
    slot below the tile's work-list count folds ONE listed chunk's clusters
    through the per-lane culled walk (_culled_tris with a global
    triangle-index base), the last slot shades and writes the next bounce
    state.  The chunk walked at slot j is wl[tile, j] (scalar-prefetch ref;
    _bigmesh_chunk_worklist) — slots at/beyond the count repeat the last
    listed chunk id, so the Pallas pipeline elides their table DMAs (block
    index unchanged) and ``pl.when`` skips their triangle math: per-tile
    work is proportional to LISTED chunks, not mesh size.  The winner carry
    lives in VMEM scratch across slot steps.  With ``collect``, two extra
    outputs carry this bounce's hit records (family, global index; -1 where
    inactive/miss) for the replay-from-hits backward (ops.fast_grad).

    With ``search_only`` the last slot skips shading and writes the raw
    winner instead (7 outputs: t/nx/ny/nz/mat f32, fam/idx i32) — the
    chunked closest-hit primitive under the big-mesh debug-integrator and
    Whitted/Cook drivers (BigMeshTracer.search_tiles), whose shading runs
    as XLA ops between launches."""
    n_chunks = meta["n_chunks"]
    chunk_meta = dict(meta, n_clu=BIG_CHUNK_CLU, n_sup=BIG_CHUNK_SUP)

    def kernel(wl_ref, cnt_ref, ctl_ref, *refs):
        tri = dict(zip(TRI_FIELDS, refs[0:17]))       # dummy (has_tri False)
        sph = dict(zip(SPH_FIELDS, refs[17:22]))
        pln = dict(zip(PLN_FIELDS, refs[22:27]))
        mat = dict(zip(MAT_FIELDS, refs[27:35]))
        for d in (sph, pln, mat):
            for k in d:
                d[k] = d[k][...]
        # Packed chunk operands: SMEM bound strides + the VMEM
        # triangle-row x field-lane block + SMEM (sup, clu) counts.
        bounds_views = tuple(
            _OffsetView(refs[35], j * BIG_BOUND_PAD) for j in range(12)
        )
        tri_rows_ref = refs[36]
        cnts_ref = refs[37]      # (sup_cnt, clu_cnt) of the streamed chunk
        pix_ref = refs[38]
        state_refs = refs[39:55]
        n_out = 7 if search_only else (18 if collect else 16)
        outs = refs[55:55 + n_out]
        rec_outs = ()
        scratch_at = 55 + n_out
        if collect and not search_only:
            rec_outs, outs = outs[16:], outs[:16]
        winf, wini, hitlist = (refs[scratch_at], refs[scratch_at + 1],
                               refs[scratch_at + 2])

        t = pl.program_id(0)
        c = pl.program_id(1)
        frame = ctl_ref[0]
        salt = ctl_ref[1]
        pix = pix_ref[0]
        (ox, oy, oz, dx, dy, dz, tr, tg, tb, cr, cg, cb,
         rr, rg, rb, act_f) = (r[0] for r in state_refs)
        active = act_f > 0.0

        @pl.when(c == 0)
        def _seed():
            carry0, _ = _search(tri, sph, pln, meta, ox, oy, oz, dx, dy, dz,
                                mint)
            for j in range(5):
                winf[j] = carry0[j]
            wini[0] = carry0[5]
            wini[1] = carry0[6]

        @pl.when(c < cnt_ref[t])
        def _walk():
            carry = (winf[0], winf[1], winf[2], winf[3], winf[4],
                     wini[0], wini[1])
            carry, _ = _culled_tris_rows(
                bounds_views, tri_rows_ref, chunk_meta,
                ox, oy, oz, dx, dy, dz, mint,
                active, (hitlist,), carry,
                tri_base=wl_ref[t, c] * BIG_CHUNK_T,
                n_sup_dyn=cnts_ref[0], n_clu_dyn=cnts_ref[1],
                k_tris=BIG_CULL_K,
            )
            for j in range(5):
                winf[j] = carry[j]
            wini[0] = carry[5]
            wini[1] = carry[6]

        @pl.when(c == n_chunks - 1)
        def _finish():
            carry = (winf[0], winf[1], winf[2], winf[3], winf[4],
                     wini[0], wini[1])
            if search_only:
                for ref, val in zip(outs, carry):
                    ref[0] = val
                return
            state = (ox, oy, oz, dx, dy, dz, tr, tg, tb, cr, cg, cb,
                     rr, rg, rb, active)
            if collect:
                hitmask = active & (carry[5] >= 0)
                rec_outs[0][0] = jnp.where(hitmask, carry[5], -1)
                rec_outs[1][0] = jnp.where(hitmask, carry[6], -1)
            new = _shade(mat, meta, pix, frame, salt, state, carry)
            (ox2, oy2, oz2, dx2, dy2, dz2, tr2, tg2, tb2, cr2, cg2, cb2,
             rr2, rg2, rb2, active2) = new
            if is_last and style == "standard":
                rr2 = jnp.where(active2, rr2 + cr2, rr2)
                rg2 = jnp.where(active2, rg2 + cg2, rg2)
                rb2 = jnp.where(active2, rb2 + cb2, rb2)
            for ref, val in zip(outs, (
                ox2, oy2, oz2, dx2, dy2, dz2, tr2, tg2, tb2,
                cr2, cg2, cb2, rr2, rg2, rb2, active2.astype(jnp.float32),
            )):
                ref[0] = val

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "meta_key", "mint", "style", "is_last", "interpret", "collect",
    "search_only"))
def _bigmesh_call(frame, salt, tables, chunk_tables, pix, state, wl, cnt,
                  meta_key, mint, style, is_last, interpret, collect=False,
                  search_only=False):
    meta = dict(meta_key)
    grid, rs, rl = pix.shape
    n_chunks = meta["n_chunks"]
    kern = make_bigmesh_kernel(meta, mint, style=style, is_last=is_last,
                               collect=collect, search_only=search_only)

    def tab_spec(v):
        return pl.BlockSpec(v.shape, lambda t, c, wl_, cnt_: (0, 0, 0),
                            memory_space=pltpu.VMEM)

    def chunk_spec(v):
        stride = v.shape[0] // n_chunks
        # The chunk streamed at slot (t, c) is wl[t, c]; repeated trailing
        # ids make the pipeline skip the copy (same block as previous step).
        # bounds_packed/counts are 1-D scalar data (SMEM); tri_lanes is the
        # [rows, 128] VMEM block the fold slices with pl.ds (dense (8,128)
        # tiles — see pack_cull_chunked's layout note).
        if v.ndim == 1:
            return pl.BlockSpec(
                (stride,), lambda t, c, wl_, cnt_: (wl_[t, c],),
                memory_space=pltpu.SMEM)
        return pl.BlockSpec(
            (stride, 128), lambda t, c, wl_, cnt_: (wl_[t, c], 0),
            memory_space=pltpu.VMEM)

    row = pl.BlockSpec((1, rs, rl), lambda t, c, wl_, cnt_: (t, 0, 0),
                       memory_space=pltpu.VMEM)
    in_specs = ([pl.BlockSpec(memory_space=pltpu.SMEM)]
                + [tab_spec(v) for v in tables]
                + [chunk_spec(v) for v in chunk_tables]
                + [row] * 17)
    if search_only:
        out_shapes = (
            [jax.ShapeDtypeStruct((grid, rs, rl), jnp.float32)] * 5
            + [jax.ShapeDtypeStruct((grid, rs, rl), jnp.int32)] * 2)
        n_out = 7
    else:
        out_shapes = [
            jax.ShapeDtypeStruct((grid, rs, rl), jnp.float32)
            for _ in range(16)
        ]
        n_out = 16
        if collect:
            out_shapes += [jax.ShapeDtypeStruct((grid, rs, rl), jnp.int32)] * 2
            n_out = 18
    ctl = jnp.stack([jnp.asarray(frame, jnp.uint32),
                     jnp.asarray(salt, jnp.uint32)])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(grid, n_chunks),
        in_specs=in_specs, out_specs=tuple([row] * n_out),
        scratch_shapes=[
            pltpu.VMEM((5, rs, rl), jnp.float32),   # winner t/normal/mat
            pltpu.VMEM((2, rs, rl), jnp.int32),     # winner fam/idx
            pltpu.SMEM((BIG_CHUNK_CLU,), jnp.int32),  # tile cluster list
        ],
    )
    return pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=tuple(out_shapes), interpret=interpret,
    )(wl, cnt, ctl, *tables, *chunk_tables, pix, *state)


BIG_DMA_GRID = True   # route big-mesh launches through the (tiles,)-grid
                      # manual-DMA kernel (False: (tiles, chunks) pipeline)

# Big-mesh ray-tile shape.  The fused small-scene kernels keep fat
# (8, 1024) tiles (S, L above); the big-mesh path runs narrower
# BLOCK-MAJOR tiles — each tile holds BIG_S*BIG_L CONSECUTIVE post-sort
# rays, shrinking the per-tile cluster union on fan-out bounces
# (benchmarks/bigmesh_block_probe.py) at more per-tile listing control
# flow; affordable only under the (tiles,)-grid DMA kernel's small
# per-tile floor.  Measured ico5 1080p x8 same-session sweep
# (BASELINE.md round 4): L=1024 412 ms, L=512 361 ms, L=256 412 ms,
# L=128 519 ms — the scalar listing loop and per-visit costs overtake
# the fold savings below 4096-ray tiles; 512 is the sweet spot.
# A/B via benchmarks/bigmesh_scaling.py --biglanes=N.
BIG_S = 8
BIG_L = 512

# SMEM culled-path (<= CULL_MAX_TRIS) ray-tile shape — same block-major
# lever as BIG_S/BIG_L, A/B'd independently because the whole-path fused
# kernel amortizes per-tile work differently than the per-bounce chunked
# launches.
CULL_S = 8
CULL_L = 1024


def _block_dims_for(tile):
    if tile == 8192:
        return 128, 64
    if tile == 1024:
        return 32, 32
    bw = 1 << (tile.bit_length() // 2)
    return bw, tile // bw


def bigmesh_block_dims():
    """Screen-block (bw, bh) whose bw*bh pixels fill ONE big-mesh ray
    tile — primary tiles then cover compact screen rectangles, which is
    what keeps the per-tile cluster cull tight (render._block_grid)."""
    return _block_dims_for(BIG_S * BIG_L)


def culled_block_dims():
    """Screen-block (bw, bh) for the SMEM culled path's ray tiles."""
    return _block_dims_for(CULL_S * CULL_L)


def _to_ctiles(x, fill=0.0):
    """Flat [N] -> [grid, CULL_S, CULL_L] (padded): culled-path tiles."""
    x = jnp.asarray(x)
    n = x.shape[0]
    tile = CULL_S * CULL_L
    pad = (-n) % tile
    if pad:
        x = jnp.concatenate([x, jnp.full((pad,), fill, x.dtype)])
    return x.reshape(-1, CULL_S, CULL_L)


# Sub-block width (lanes).  The walk's listing runs tile-wide, but the
# triangle FOLD and its t_best re-prune run per [BIG_S, BIG_SUB] sub-block
# (one native f32 vreg at 8x128), each holding BIG_S*BIG_SUB CONSECUTIVE
# post-sort rays — the round-3 block probe's 2-4.4x fewer fold firings at
# 1024-ray granularity, WITHOUT shrinking the tile (the round-4 BIG_L sweep
# showed per-tile listing/DMA costs overtake fold savings below 4096-ray
# tiles).  Requires the transposed tile layout below so a lane slice is a
# consecutive ray range.
#
# MEASURED NEGATIVE at ico5 1080p x 8 (round 5, same-session A/B):
# sub-block fold 440.7 ms vs tile-wide 355.9 ms (+24%), outputs
# bit-identical (checksums equal).  The per-FIRE fixed cost (16-row table
# load, 17 field extracts, loop control) exceeds the [8,512]-wide lane
# math, so multiplying fires by ~1.6x (4 sub-blocks at ~0.4x pass rate
# each) loses even though total lane-math shrinks 2.5x.  Same failure
# family as round 3's masked folds — the walk is bound by per-cluster
# FIXED cost, not per-lane triangle math.  Kept behind BIG_SUBFOLD for
# re-evaluation if the fire cost ever shrinks (e.g. MXU-form dot folds).
BIG_SUB = 128
BIG_SUBFOLD = False  # True: per-sub-block fold (measured slower, above);
                     # A/B via benchmarks/bigmesh_scaling.py --subfold=1


def _flat_to_btile(x, shape):
    """Rank-ordered flat (already padded) -> the big-mesh tile layout.

    Position [t, s, j*BIG_SUB + l] holds rank t*S*L + j*S*BIG_SUB +
    s*BIG_SUB + l: each [S, BIG_SUB] lane sub-block is a CONSECUTIVE
    rank range (the sub-block fold's coherence contract)."""
    g, s, l = shape
    if BIG_SUB >= l:
        return x.reshape(shape)
    return (x.reshape(g, l // BIG_SUB, s, BIG_SUB)
            .transpose(0, 2, 1, 3).reshape(shape))


def _btile_to_flat(y):
    """Inverse of _flat_to_btile: tile layout -> rank-ordered flat."""
    g, s, l = y.shape
    if BIG_SUB >= l:
        return y.reshape(-1)
    return (y.reshape(g, s, l // BIG_SUB, BIG_SUB)
            .transpose(0, 2, 1, 3).reshape(-1))


def _to_btiles(x, fill=0.0):
    """Flat [N] -> [grid, BIG_S, BIG_L] (padded): the big-mesh tile shape.
    Tiles hold consecutive rays of the caller's (post-sort) order — the
    block-major layout — with lane sub-blocks consecutive too
    (_flat_to_btile)."""
    x = jnp.asarray(x)
    n = x.shape[0]
    tile = BIG_S * BIG_L
    pad = (-n) % tile
    if pad:
        x = jnp.concatenate([x, jnp.full((pad,), fill, x.dtype)])
    return _flat_to_btile(x, (x.shape[0] // tile, BIG_S, BIG_L))


def _from_btiles(y, n):
    """Inverse of _to_btiles: tile layout -> flat [n] in caller order."""
    return _btile_to_flat(y)[:n]


def make_bigmesh_dma_kernel(meta, mint, *, style, is_last, collect=False,
                            search_only=False):
    """(tiles,)-grid variant of make_bigmesh_kernel: ONE grid step per ray
    tile; the tile's LISTED chunks stream through manual DMAs inside an
    in-kernel ``fori_loop(0, cnt[t])`` — triangle rows HBM->VMEM double-
    buffered, the chunk's 12 bound strides HBM->SMEM single-buffered (SMEM
    is tiled (2,128): a size-1 leading-axis slice of a (2,N) SMEM scratch
    fails alignment, and at 48 KB/chunk the un-overlapped copy costs
    microseconds — benchmarks/dma_chunk_probe.py smemdma).

    Motivation (measured, BASELINE.md round 3): the (tiles, chunk-slots)
    pipeline pays ~5.5 us of per-grid-step operand machinery for every
    chunk SLOT whether or not the tile listed the chunk — an 8-9 ms
    no-walk floor per bounce at ico5 that scales with mesh size.  Here the
    grid has no chunk axis: per-tile cost is proportional to the LISTED
    chunk count alone, and the winner carry rides fori_loop registers
    instead of VMEM scratch round-trips.  Semantics (seed search, walk
    order, shading, collect/search_only outputs) match make_bigmesh_kernel
    exactly — parity pinned by tests/test_bigmesh_modes.py running both.
    Reference analog: the traversal skips subtrees the ray can't touch
    (intersection.glsl:361-463)."""
    chunk_meta = dict(meta, n_clu=BIG_CHUNK_CLU, n_sup=BIG_CHUNK_SUP)
    bstride = 12 * BIG_BOUND_PAD
    n_chunks = meta["n_chunks"]

    def kernel(wl_ref, cnt_ref, ctl_ref, *refs):
        # Mosaic/XLA reserve ~12 B of SMEM per (operand x grid step) for
        # pipeline bookkeeping — EVERY operand, constant-indexed tables
        # included: 39 operands x 2040 block-major tiles measured 1.08 MB
        # against the 1 MB SMEM budget.  So this kernel takes the fewest
        # possible operands: the 17 triangle search tables are dummies on
        # the chunked path (pack_fwd culled=True) and are built in-kernel;
        # each small family rides ONE [rows, n_fields] lane-table; state
        # and outputs ride one packed 4-D block each.
        tri = {k: jnp.zeros((1, 1, 1), jnp.float32) for k in TRI_FIELDS}

        def unpack(ref, fields):
            a = ref[...]
            return {k: a[:, j:j + 1][:, :, None]
                    for j, k in enumerate(fields)}

        sph = unpack(refs[0], SPH_FIELDS)
        pln = unpack(refs[1], PLN_FIELDS)
        mat = unpack(refs[2], MAT_FIELDS)
        bounds_hbm = refs[3]      # [n_chunks * 12*BIG_BOUND_PAD] f32, HBM
        tri_rows_hbm = refs[4]    # [n_chunks * BIG_CHUNK_T, 128] f32, HBM
        cnts_ref = refs[5]        # FULL [n_chunks * 1024] i32, SMEM
        pix_ref = refs[6]
        state_ref = refs[7]       # PACKED [1, 16, rs, rl] f32
        if search_only:
            outs = refs[8:10]     # f32 [1,5,rs,rl], i32 [1,2,rs,rl]
            scratch_at = 10
        elif collect:
            outs = refs[8:10]     # f32 [1,16,rs,rl], i32 [1,2,rs,rl]
            scratch_at = 10
        else:
            outs = refs[8:9]
            scratch_at = 9
        hitlist = refs[scratch_at]
        tri_vmem = refs[scratch_at + 1]
        bnd_smem = refs[scratch_at + 2]
        tsem = refs[scratch_at + 3]
        bsem = refs[scratch_at + 4]
        res = refs[scratch_at + 5]   # SMEM (8,): resident ids + pending

        t = pl.program_id(0)
        frame = ctl_ref[0]
        salt = ctl_ref[1]
        pix = pix_ref[0]
        (ox, oy, oz, dx, dy, dz, tr, tg, tb, cr, cg, cb,
         rr, rg, rb, act_f) = (state_ref[0, i] for i in range(16))
        active = act_f > 0.0
        n = cnt_ref[t]

        def wl_at(j):
            # wl arrives FLAT [tiles * n_chunks]: SMEM tiles 2-D arrays
            # (2,128), padding a [tiles, n_chunks] list to 128 lanes/row —
            # 1.02 MB of the 1 MB SMEM at 2040 tiles (measured OOM).
            return wl_ref[t * n_chunks + j]

        # Resident-chunk DMA elision: scratch persists across grid steps,
        # so a buffer already holding the wanted chunk (common — the
        # post-sort tile order makes consecutive tiles list overlapping
        # chunk sequences) skips its copy entirely.  res[0:2]=tri slot
        # ids, res[2]=bounds id, res[3:5]/res[5]=in-flight flags (a wait
        # must only run if the matching start did).
        @pl.when(t == 0)
        def _():
            for k in range(3):
                res[k] = -1
            for k in range(3, 6):
                res[k] = 0

        def tri_desc(c, slot):
            return pltpu.make_async_copy(
                tri_rows_hbm.at[pl.ds(c * BIG_CHUNK_T, BIG_CHUNK_T), :],
                tri_vmem.at[slot],
                tsem.at[slot],
            )

        def bnd_desc(c):
            return pltpu.make_async_copy(
                bounds_hbm.at[pl.ds(c * bstride, bstride)],
                bnd_smem,
                bsem,
            )

        def start_tri(slot, j):
            c = wl_at(j)

            @pl.when(res[slot] != c)
            def _():
                tri_desc(c, slot).start()
                res[slot] = c
                res[3 + slot] = 1

        def wait_tri(slot, j):
            @pl.when(res[3 + slot] == 1)
            def _():
                tri_desc(wl_at(j), slot).wait()
                res[3 + slot] = 0

        def start_bnd(j):
            c = wl_at(j)

            @pl.when(res[2] != c)
            def _():
                bnd_desc(c).start()
                res[2] = c
                res[5] = 1

        def wait_bnd(j):
            @pl.when(res[5] == 1)
            def _():
                bnd_desc(wl_at(j)).wait()
                res[5] = 0

        # Whole-tile early exit (round 5): once the wavefront sorts pack
        # dead rays to the tail, most tiles of late bounces have NO live
        # lane — yet the un-gated body still paid the seed search + shade
        # (~8 ms/bounce no-walk floor at ico5, 64 ms/frame measured).  A
        # tile with every lane dead is EXACTLY a passthrough: _shade with
        # active all-false changes nothing (every update is
        # where(active,...)) and collect emits -1s.  search_only keeps the
        # un-gated body — its per-lane winner outputs are real values even
        # for dead lanes, which the pipeline-kernel parity pins.
        tile_live = jnp.any(active) if not search_only else None

        def body():
            @pl.when(n > 0)
            def _():
                start_tri(0, 0)
                start_bnd(0)

            # Seed: dense sphere/plane search overlaps the chunk-0 DMAs.
            carry0, _ = _search(tri, sph, pln, meta, ox, oy, oz, dx, dy, dz,
                                mint)

            bounds_views = tuple(
                _OffsetView(bnd_smem, j * BIG_BOUND_PAD) for j in range(12)
            )

            def loop(j, carry):
                slot = jax.lax.rem(j, 2)
                c = wl_at(j)

                @pl.when(j + 1 < n)
                def _():
                    start_tri(1 - slot, j + 1)

                wait_bnd(j)
                wait_tri(slot, j)
                carry, _ = _culled_tris_rows(
                    bounds_views, tri_vmem.at[slot], chunk_meta,
                    ox, oy, oz, dx, dy, dz, mint,
                    active, (hitlist,), carry,
                    tri_base=c * BIG_CHUNK_T,
                    n_sup_dyn=cnts_ref[c * 1024],
                    n_clu_dyn=cnts_ref[c * 1024 + 1],
                    subs=(BIG_L // BIG_SUB) if BIG_SUBFOLD else 1,
                    k_tris=BIG_CULL_K,
                )

                # The walk reads bnd_smem throughout (single buffer): the
                # next chunk's bounds copy may start only after it
                # finishes.
                @pl.when(j + 1 < n)
                def _():
                    start_bnd(j + 1)

                return carry

            carry = jax.lax.fori_loop(0, n, loop, carry0)

            if search_only:
                for i in range(5):
                    outs[0][0, i] = carry[i]
                outs[1][0, 0] = carry[5]
                outs[1][0, 1] = carry[6]
                return
            state = (ox, oy, oz, dx, dy, dz, tr, tg, tb, cr, cg, cb,
                     rr, rg, rb, active)
            if collect:
                hitmask = active & (carry[5] >= 0)
                outs[1][0, 0] = jnp.where(hitmask, carry[5], -1)
                outs[1][0, 1] = jnp.where(hitmask, carry[6], -1)
            new = _shade(mat, meta, pix, frame, salt, state, carry)
            (ox2, oy2, oz2, dx2, dy2, dz2, tr2, tg2, tb2, cr2, cg2, cb2,
             rr2, rg2, rb2, active2) = new
            if is_last and style == "standard":
                rr2 = jnp.where(active2, rr2 + cr2, rr2)
                rg2 = jnp.where(active2, rg2 + cg2, rg2)
                rb2 = jnp.where(active2, rb2 + cb2, rb2)
            for i, val in enumerate((
                ox2, oy2, oz2, dx2, dy2, dz2, tr2, tg2, tb2,
                cr2, cg2, cb2, rr2, rg2, rb2, active2.astype(jnp.float32),
            )):
                outs[0][0, i] = val

        if search_only:
            body()
            return

        @pl.when(tile_live)
        def _():
            body()

        @pl.when(~tile_live)
        def _():
            outs[0][...] = state_ref[...]
            if collect:
                outs[1][...] = jnp.full(outs[1].shape, -1, jnp.int32)

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "meta_key", "mint", "style", "is_last", "interpret", "collect",
    "search_only"))
def _bigmesh_dma_call(frame, salt, tables, chunk_tables, pix, state, wl, cnt,
                      meta_key, mint, style, is_last, interpret,
                      collect=False, search_only=False):
    meta = dict(meta_key)
    assert not meta.get("has_tri"), "chunked path packs tris via chunk tables"
    grid, rs, rl = pix.shape
    kern = make_bigmesh_dma_kernel(meta, mint, style=style, is_last=is_last,
                                   collect=collect, search_only=search_only)
    bounds_packed, tri_lanes, counts = chunk_tables

    # Family lane-tables: one operand per family (see the kernel's SMEM
    # bookkeeping note).  tables[17:35] are the [rows,1,1] pack_fwd columns.
    def fam_pack(cols):
        return jnp.concatenate([v.reshape(-1, 1) for v in cols], axis=1)

    sph_p = fam_pack(tables[17:22])
    pln_p = fam_pack(tables[22:27])
    mat_p = fam_pack(tables[27:35])

    def tab_spec(v):
        return pl.BlockSpec(v.shape, lambda t, wl_, cnt_: (0,) * v.ndim,
                            memory_space=pltpu.VMEM)

    row = pl.BlockSpec((1, rs, rl), lambda t, wl_, cnt_: (t, 0, 0),
                       memory_space=pltpu.VMEM)

    def pack_spec(k):
        return pl.BlockSpec((1, k, rs, rl), lambda t, wl_, cnt_: (t, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    in_specs = ([pl.BlockSpec(memory_space=pltpu.SMEM)]
                + [tab_spec(v) for v in (sph_p, pln_p, mat_p)]
                + [pl.BlockSpec(memory_space=pltpu.HBM),   # bounds strides
                   pl.BlockSpec(memory_space=pltpu.HBM),   # triangle rows
                   pl.BlockSpec(memory_space=pltpu.SMEM)]  # counts, whole
                + [row, pack_spec(16)])
    # State and outputs are PACKED 4-D operands (one f32 block + one i32
    # block) — see the kernel's SMEM-machinery note.
    state_p = jnp.stack(state, axis=1)                     # [grid,16,rs,rl]
    if search_only:
        out_shapes = [jax.ShapeDtypeStruct((grid, 5, rs, rl), jnp.float32),
                      jax.ShapeDtypeStruct((grid, 2, rs, rl), jnp.int32)]
        out_specs = [pack_spec(5), pack_spec(2)]
    elif collect:
        out_shapes = [jax.ShapeDtypeStruct((grid, 16, rs, rl), jnp.float32),
                      jax.ShapeDtypeStruct((grid, 2, rs, rl), jnp.int32)]
        out_specs = [pack_spec(16), pack_spec(2)]
    else:
        out_shapes = [jax.ShapeDtypeStruct((grid, 16, rs, rl), jnp.float32)]
        out_specs = [pack_spec(16)]
    ctl = jnp.stack([jnp.asarray(frame, jnp.uint32),
                     jnp.asarray(salt, jnp.uint32)])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(grid,),
        in_specs=in_specs, out_specs=tuple(out_specs),
        scratch_shapes=[
            pltpu.SMEM((BIG_CHUNK_CLU,), jnp.int32),       # tile cluster list
            pltpu.VMEM((2, BIG_CHUNK_T, 128), jnp.float32),  # tri dbl-buffer
            pltpu.SMEM((12 * BIG_BOUND_PAD,), jnp.float32),  # chunk bounds
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SMEM((8,), jnp.int32),   # resident ids + pending flags
        ],
    )
    outs = pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=tuple(out_shapes), interpret=interpret,
    )(wl.reshape(-1), cnt, ctl, sph_p, pln_p, mat_p, bounds_packed,
      tri_lanes, counts, pix, state_p)
    # Unpack to the pipeline call's flat output convention.
    if search_only:
        f, i = outs
        return tuple(f[:, k] for k in range(5)) + (i[:, 0], i[:, 1])
    if collect:
        f, i = outs
        return tuple(f[:, k] for k in range(16)) + (i[:, 0], i[:, 1])
    (f,) = outs
    return tuple(f[:, k] for k in range(16))


def _bigmesh_launch(*args, **kw):
    """Dispatch a big-mesh bounce launch to the (tiles,)-grid manual-DMA
    kernel (BIG_DMA_GRID, the default) or the (tiles, chunks) pipeline."""
    call = _bigmesh_dma_call if BIG_DMA_GRID else _bigmesh_call
    return call(*args, **kw)


def _morton7(q):
    """Spread the low 7 bits of i32 ``q`` so consecutive bits land 3 apart
    (the standard 3D Morton bit-interleave magic)."""
    q = (q | (q << 16)) & 0x030000FF
    q = (q | (q << 8)) & 0x0300F00F
    q = (q | (q << 4)) & 0x030C30C3
    q = (q | (q << 2)) & 0x09249249
    return q


_DEAD_KEY = jnp.int32(0x40000000)


def _bigmesh_sort_key(state, lo, inv_ext):
    """Wavefront coherence key for live rays: direction OCTANT major (3
    bits), origin Morton code minor (21 bits, 7/axis over the scene box).

    After one Lambert bounce, ray directions fan out everywhere, so a tile
    of raster-adjacent rays needs ~half of all clusters (the round-1
    measured union bound, BASELINE.md).  Sorting by octant-then-origin
    re-packs each [8,1024] kernel tile into a frustum-ish bundle — same
    direction signs, compact origins — so the per-tile cluster cull bites
    again.  Origin-only Morton keys were measured insufficient in round 1
    (direction fan-out defeats origin locality); the octant bits are the
    load-bearing difference.  Dead rays key to +inf-ish so whole tiles go
    idle (the kernel's any-live gate skips their walk entirely)."""
    ox, oy, oz, dx, dy, dz = state[:6]
    live = state[15] > 0.0
    octant = ((dx < 0.0).astype(jnp.int32) * 4
              + ((dy < 0.0).astype(jnp.int32) * 2)
              + (dz < 0.0).astype(jnp.int32))

    def q(o, k):
        f = (o - lo[k]) * inv_ext[k] * 128.0
        return jnp.clip(f, 0.0, 127.0).astype(jnp.int32)

    m = ((_morton7(q(ox, 0)) << 2) | (_morton7(q(oy, 1)) << 1)
         | _morton7(q(oz, 2)))
    return jnp.where(live, (octant << 21) | m, _DEAD_KEY)


def _bigmesh_chunk_worklist(state, sup_lo, sup_hi, sup_counts, mint):
    """Per-tile chunk work lists for the big-mesh launch.

    Any-lane slab tests of each tile's live rays against every chunk's
    supergroup AABBs — the SAME slab math as the kernel's in-chunk
    supergroup walk (_culled_tris.slab), so a chunk skipped here is exactly
    one whose in-kernel walk would have listed zero clusters for this tile:
    tile-culled and full-walk images are bit-identical.  This is the third
    cull level (tile→chunk here; supergroup→cluster in-kernel) that makes
    big-mesh frame time scale with the chunks a tile's ray bundle actually
    touches instead of with mesh size; the between-bounce wavefront sort
    (_bigmesh_sort_key) is what keeps those bundles compact after Lambert
    fan-out.

    Returns (wl i32[grid, n_chunks], cnt i32[grid]): wl[:, :cnt] lists hit
    chunk ids ascending (the full walk's visit order), and slots at/beyond
    cnt repeat the last listed id so their table DMAs are elided (block
    index unchanged between consecutive grid steps).  Tiles with no live
    rays (or no chunk overlap) get cnt 0.
    """
    ox, oy, oz, dx, dy, dz = state[:6]
    live = state[15] > 0.0
    n_chunks = sup_lo.shape[0]

    def inv(c):
        return 1.0 / jnp.where(jnp.abs(c) < _DENOM_EPS, _DENOM_EPS, c)

    ivx, ivy, ivz = inv(dx), inv(dy), inv(dz)

    def box_ok(lo, hi):
        fx0 = (lo[0] - ox) * ivx
        fx1 = (hi[0] - ox) * ivx
        fy0 = (lo[1] - oy) * ivy
        fy1 = (hi[1] - oy) * ivy
        fz0 = (lo[2] - oz) * ivz
        fz1 = (hi[2] - oz) * ivz
        t0 = jnp.maximum(
            jnp.maximum(jnp.minimum(fx0, fx1), jnp.minimum(fy0, fy1)),
            jnp.maximum(jnp.minimum(fz0, fz1), mint),
        )
        t1 = jnp.minimum(
            jnp.minimum(jnp.maximum(fx0, fx1), jnp.maximum(fy0, fy1)),
            jnp.maximum(fz0, fz1),
        )
        return (t1 >= t0) & live

    # One fused pass over the ray state: every box test is elementwise, the
    # per-ray results pack into chunk-bitmask words, and a single
    # bitwise-OR reduction folds the tile.  (The obvious per-chunk
    # any-reduce formulations pay a full state re-read per reduce — both a
    # lax.map and an unrolled jnp.stack measured 3-4 ms/bounce at 1080p;
    # XLA does not horizontally fuse separate reductions.)
    n_words = -(-n_chunks // 31)
    mask_cols = []
    for w in range(n_words):
        bits = jnp.zeros_like(ox, jnp.int32)
        for ci in range(w * 31, min((w + 1) * 31, n_chunks)):
            hit = jnp.zeros_like(ox, bool)
            # Static clamp to the chunk's real supergroups: inverted-box
            # padding would pass box_ok for every ray (per-axis min/max is
            # orientation-agnostic), permanently listing the last chunk.
            for s in range(sup_counts[ci]):
                hit = hit | box_ok(sup_lo[ci, s], sup_hi[ci, s])
            bits = bits | (hit.astype(jnp.int32) << (ci - w * 31))
        word = jnp.bitwise_or.reduce(
            bits.reshape(bits.shape[0], -1), axis=1)     # [grid]
        mask_cols += [
            (word >> (ci - w * 31)) & 1
            for ci in range(w * 31, min((w + 1) * 31, n_chunks))
        ]
    mask = jnp.stack(mask_cols, axis=1) > 0              # [grid, n_chunks]
    ids = jax.lax.broadcasted_iota(jnp.int32, mask.shape, 1)
    cnt = mask.sum(axis=1, dtype=jnp.int32)
    wl = jax.lax.sort(jnp.where(mask, ids, jnp.int32(n_chunks)), dimension=1)
    last = jnp.max(jnp.where(mask, ids, -1), axis=1)
    wl = jnp.where(wl >= n_chunks, jnp.maximum(last, 0)[:, None], wl)
    return wl, cnt


def _bigmesh_full_worklist(grid, n_chunks):
    """The cull-off work list: every chunk, every tile (the pre-cull walk)."""
    wl = jnp.broadcast_to(
        jnp.arange(n_chunks, dtype=jnp.int32)[None], (grid, n_chunks))
    return wl, jnp.full((grid,), n_chunks, jnp.int32)


def make_bigmesh_hart_kernel(meta):
    """One Hart march step's scene min-distance over streamed chunks.

    Grid (tiles, chunks); a VMEM d2min scratch carries the running squared
    minimum across chunk slots, the last slot writes sqrt.  Clusters are
    DISTANCE-culled: a cluster's AABB distance lower-bounds every member
    triangle's distance, so skipping clusters with box_d2 >= d2min is
    EXACT (cannot change the min), unlike an approximate cull.  Triangle
    distances come from the raw-vertex lanes (17..25) of the chunk table
    (pack_cull_chunked) via the shared iq form (_tri_dist2,
    distance_functions.glsl:28-61)."""
    n_chunks = meta["n_chunks"]

    def kernel(*refs):
        bounds = tuple(_OffsetView(refs[0], j * BIG_BOUND_PAD)
                       for j in range(12))
        tri_ref = refs[1]
        cnts_ref = refs[2]
        px, py, pz = (r[0] for r in refs[3:6])
        live = refs[6][0] > 0.0
        out_ref = refs[7]
        d2min_ref = refs[8]

        c = pl.program_id(1)
        (s0x, s0y, s0z, s1x, s1y, s1z,
         c0x, c0y, c0z, c1x, c1y, c1z) = bounds

        @pl.when(c == 0)
        def _init():
            d2min_ref[0] = jnp.full(d2min_ref.shape[1:], _BIG, jnp.float32)

        def box_d2(lx, ly, lz, hx, hy, hz):
            ex = jnp.maximum(jnp.maximum(lx - px, px - hx), 0.0)
            ey = jnp.maximum(jnp.maximum(ly - py, py - hy), 0.0)
            ez = jnp.maximum(jnp.maximum(lz - pz, pz - hz), 0.0)
            return ex * ex + ey * ey + ez * ez

        @pl.when(jnp.any(live))
        def _fold():
            # Chunk root box precomputed host-side into the last supergroup
            # bound slot (pack_cull_chunked) — no per-grid-step refold.
            root = BIG_BOUND_PAD - 1
            root_d2 = box_d2(s0x[root], s0y[root], s0z[root],
                             s1x[root], s1y[root], s1z[root])
            d2min = d2min_ref[0]

            def clu_body(cc, d2min):
                bd2 = box_d2(c0x[cc], c0y[cc], c0z[cc],
                             c1x[cc], c1y[cc], c1z[cc])
                near = jnp.any(live & (bd2 < d2min))

                def fold(d2min):
                    blk = tri_ref[pl.ds(cc * BIG_CULL_K, BIG_CULL_K), :]

                    def col(k):
                        return blk[:, k:k + 1][:, :, None]

                    d2 = _tri_dist2(
                        px[None], py[None], pz[None],
                        col(17), col(18), col(19),
                        col(20), col(21), col(22),
                        col(23), col(24), col(25),
                    )
                    return jnp.minimum(d2min, jnp.min(d2, axis=0))

                return jax.lax.cond(near, fold, lambda v: v, d2min)

            d2min_ref[0] = jax.lax.cond(
                jnp.any(live & (root_d2 < d2min)),
                lambda v: jax.lax.fori_loop(0, cnts_ref[1], clu_body, v),
                lambda v: v, d2min)

        @pl.when(c == n_chunks - 1)
        def _out():
            out_ref[0] = jnp.sqrt(d2min_ref[0])

    return kernel


@functools.partial(jax.jit, static_argnames=("meta_key", "interpret"))
def _bigmesh_hart_call(chunk_tables, p3, live, meta_key, interpret):
    meta = dict(meta_key)
    grid = live.shape[0]
    n_chunks = meta["n_chunks"]
    kern = make_bigmesh_hart_kernel(meta)

    def chunk_spec(v):
        stride = v.shape[0] // n_chunks
        if v.ndim == 1:
            return pl.BlockSpec((stride,), lambda t, c: (c,),
                                memory_space=pltpu.SMEM)
        return pl.BlockSpec((stride, 128), lambda t, c: (c, 0),
                            memory_space=pltpu.VMEM)

    grid2, rs, rl = p3[0].shape
    row = pl.BlockSpec((1, rs, rl), lambda t, c: (t, 0, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern, grid=(grid, n_chunks),
        in_specs=[chunk_spec(v) for v in chunk_tables] + [row] * 4,
        out_specs=row,
        out_shape=jax.ShapeDtypeStruct((grid, rs, rl), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, rs, rl), jnp.float32)],
        interpret=interpret,
    )(*chunk_tables, *p3, live)


class BigMeshTracer:
    """Whole-path tracer for meshes beyond CULL_MAX_TRIS.

    One kernel launch per bounce (ray state rides HBM rows between bounces
    — ~0.2 ms/bounce at 1080p, negligible at big-mesh frame times); within a
    launch a second grid axis streams the leaf-ordered triangle tables
    through SMEM chunk by chunk.  Same bounce semantics as PathTracer.

    Between bounces, live rays are re-sorted by (direction octant, origin
    Morton) with ONE variadic lax.sort over key + all carries (~0.2 ms at
    1080p; an argsort+gather formulation costs 270 ms — TPU gathers run
    <1 Gelem/s).  This is the wavefront-coherence move the fused small-mesh
    kernel can't afford (it would have to relaunch per bounce, measured 79%
    slower at 1.3k tris) but the chunked path gets almost for free since it
    relaunches anyway.  Per-lane results are invariant to tile composition
    (a cluster a lane's slab test passes is always walked; winner selects
    are per-lane), so sorted and unsorted images match."""

    def __init__(self, scene: Scene, mint: float = 0.0):
        if scene.bvh is None:
            raise ValueError("BigMeshTracer needs a BVH-attached scene "
                             "(leaf-ordered triangles)")
        self.scene = scene
        self.mint = float(mint)
        self.tables, self.meta = pack_fwd(scene, culled=True)
        self.chunk_tables, cm, self.sup_boxes = pack_cull_chunked(scene)
        self.meta.update(cm)
        self.meta_key = tuple(sorted(self.meta.items()))
        # Scene box for origin quantization (bounce origins sit on surfaces;
        # the floor plane may extend beyond — clipped to the box edge).
        bmin = jnp.minimum(jnp.minimum(scene.tri_v0.min(axis=0),
                                       scene.tri_v1.min(axis=0)),
                           scene.tri_v2.min(axis=0))
        bmax = jnp.maximum(jnp.maximum(scene.tri_v0.max(axis=0),
                                       scene.tri_v1.max(axis=0)),
                           scene.tri_v2.max(axis=0))
        self._box_lo = bmin
        self._box_inv = 1.0 / jnp.maximum(bmax - bmin, 1e-6)

    def trace(self, pixel, origin, direction, frame, salt_base, max_bounces,
              style="reference", interpret=False, collect_hits=False,
              sort_rays=True, tile_cull=True, sort_bounces=None):
        """Trace full paths -> (r, g, b) flat [N] radiance.

        With ``collect_hits`` also returns (fams, idxs) i32[B, N] per-bounce
        hit records in the replay-from-hits layout (ops.fast_grad); hit
        records are emitted in the caller's ray order regardless of
        ``sort_rays`` (each bounce's records are written before the next
        re-sort and unsorted with the same slot keys).

        ``sort_bounces`` caps how many between-bounce re-sorts run (the
        first N transitions); the sort network costs ~30 ms at 1080p per
        bounce, and past the first few transitions the surviving rays are
        already packed (most tiles fully idle) so re-sorting stops paying.
        Round-5 sweeps (same session, sums bit-identical): mesh-1282
        sortb 0/1/2/3 = 143.9/121.7/110.0/121.8 ms; ico5 sortb 2/3 =
        397.0/360.8 — so the None default resolves to 2 on single-chunk
        scenes and 3 beyond (the 3rd re-sort pays only once the chunk
        walk is deep enough).
        Each sort also costs ~240 s of XLA compile (the 19-operand
        variadic sort expander, ~8 s/operand measured; sort-free traces
        compile in 4-14 s), which is why the gradient path disables
        sorting on single-chunk scenes (ops.fast_grad).

        ``tile_cull`` routes each bounce through per-tile chunk work lists
        (_bigmesh_chunk_worklist): only the chunks a tile's ray bundle can
        touch are streamed and walked, making frame time track the touched
        set instead of mesh size.  Bit-identical to the full walk (the cull
        is exactly the kernel's own supergroup listing test hoisted to tile
        granularity)."""
        n = pixel.shape[0]
        pix = _to_btiles(pixel)
        if isinstance(origin, tuple):
            o0, o1, o2 = origin
            d0, d1, d2 = direction
        else:
            o0, o1, o2 = origin[:, 0], origin[:, 1], origin[:, 2]
            d0, d1, d2 = direction[:, 0], direction[:, 1], direction[:, 2]
        ones = jnp.ones_like(pix, jnp.float32)
        zeros = jnp.zeros_like(pix, jnp.float32)
        state = tuple(_to_btiles(v) for v in (o0, o1, o2, d0, d1, d2)) + (
            ones, ones, ones, zeros, zeros, zeros, zeros, zeros, zeros, ones,
        )
        frame = jnp.asarray(frame, jnp.uint32)
        nb = int(max_bounces)
        if sort_bounces is None:
            sort_bounces = 3 if self.meta["n_chunks"] > 1 else 2
        shape = pix.shape
        total = pix.size
        # slot = position in the caller's ray order; rides the sorts so the
        # film (and per-bounce hit records) can be restored at the end.
        slot = _flat_to_btile(jnp.arange(total, dtype=jnp.int32), shape)

        def by_slot_flat(slot, vals):
            """Restore caller order: sort by slot -> rank-ordered flat."""
            flat = jax.lax.sort(
                [slot.reshape(-1)] + [v.reshape(-1) for v in vals],
                num_keys=1)
            return [v[:n] for v in flat[1:]]

        fams, idxs = [], []
        n_chunks = self.meta["n_chunks"]
        salt0 = jnp.asarray(salt_base, jnp.uint32)
        # Wavefront re-sorts run after the first sort_bounces transitions
        # (fan-out packing + dead-ray compaction); later bounces inherit
        # the order (rays never revive, so idle tiles stay idle).  The
        # sort costs 20-30 ms at 1080p (19 carries through the network).
        n_sorted = min(sort_bounces, nb - 1) if sort_rays else 0

        # The WHOLE bounce loop is one lax.scan: the bounce body (work
        # list + launch + conditional sort) traces and compiles ONCE.
        # Bounce-unrolled launches were the compile-time driver (VERDICT
        # r4 item 3): each unrolled Pallas launch is a separate ~90 s
        # Mosaic compile on the tunnel — measured 276 s at sortb=3
        # unrolled vs 14 s for the all-scanned sortb=0 loop.  is_last is
        # always False — the standard-style tail runs in XLA after the
        # loop (identical math: every kernel-side update was masked by
        # the same ``active``).
        def body(carry, b_tr):
            state, pix_c, slot_c = carry
            if tile_cull:
                wl, cnt = _bigmesh_chunk_worklist(
                    state, *self.sup_boxes, self.mint)
            else:
                wl, cnt = _bigmesh_full_worklist(pix_c.shape[0], n_chunks)
            outs = _bigmesh_launch(
                frame, salt0 + jnp.asarray(b_tr, jnp.uint32) * 4,
                self.tables, self.chunk_tables, pix_c, state, wl, cnt,
                self.meta_key, self.mint, style,
                False, interpret, collect_hits,
            )
            state = outs[:16]
            # Hit records + the slot map at emission time (each bounce's
            # records are in that bounce's CURRENT ray order).
            rec = ((outs[16], outs[17], slot_c) if collect_hits else None)

            if n_sorted > 0:
                def do_sort(args):
                    state, pix_c, slot_c = args
                    key = _bigmesh_sort_key(
                        state, self._box_lo, self._box_inv)
                    ops = [key.reshape(-1), pix_c.reshape(-1),
                           slot_c.reshape(-1)]
                    ops += [s.reshape(-1) for s in state]
                    srt = jax.lax.sort(ops, num_keys=1)
                    return (
                        tuple(_flat_to_btile(s, shape) for s in srt[3:]),
                        _flat_to_btile(srt[1], shape),
                        _flat_to_btile(srt[2], shape),
                    )

                state, pix_c, slot_c = jax.lax.cond(
                    b_tr < jnp.uint32(n_sorted), do_sort, lambda a: a,
                    (state, pix_c, slot_c))
            return (state, pix_c, slot_c), rec

        bs = jnp.arange(nb, dtype=jnp.uint32)
        (state, pix, slot), recs = jax.lax.scan(body, (state, pix, slot),
                                                bs)
        if collect_hits:
            for j in range(nb):
                if n_sorted > 0:
                    fam_b, idx_b = by_slot_flat(
                        recs[2][j], (recs[0][j], recs[1][j]))
                else:
                    fam_b = _from_btiles(recs[0][j], n)
                    idx_b = _from_btiles(recs[1][j], n)
                fams.append(fam_b)
                idxs.append(idx_b)
        rr, rg, rb = state[12], state[13], state[14]
        if style == "standard":
            act = state[15] > 0.0
            rr = jnp.where(act, rr + state[9], rr)
            rg = jnp.where(act, rg + state[10], rg)
            rb = jnp.where(act, rb + state[11], rb)
        if n_sorted > 0:
            res = tuple(by_slot_flat(slot, (rr, rg, rb)))
        else:
            res = (_from_btiles(rr, n), _from_btiles(rg, n),
                   _from_btiles(rb, n))
        if collect_hits:
            return res, (jnp.stack(fams), jnp.stack(idxs))
        return res

    # -- big-mesh debug-integrator / Whitted / Cook drivers ---------------
    # The chunked launches do the searches; the SAME shading/finalize math
    # as the fused small-mesh kernels (_primary_finalize, _shade_whitted,
    # _shade_cook — all shape-generic jnp) runs as XLA ops between
    # launches, so mode semantics match the kernel-resident paths and the
    # XLA integrators by construction.  Reference: any integrator runs on
    # any scene, compute_pass.comp:68-99.

    def _mat_dict(self):
        return dict(zip(MAT_FIELDS, self.tables[27:35]))

    def search_tiles(self, pix, o3, d3, live, frame, interpret=False,
                     tile_cull=True):
        """Chunked closest-hit over the full scene in tile space.

        o3/d3: ray components [grid, S, L]; live: bool [grid, S, L].
        Returns the winner 7-tuple (t, nx, ny, nz, mat, fam, idx), fam -1
        on miss — the occlusion/shadow primitive of the mode drivers."""
        z = jnp.zeros_like(o3[0])
        state = tuple(o3) + tuple(d3) + (z,) * 9 + (
            live.astype(jnp.float32),)
        if tile_cull:
            wl, cnt = _bigmesh_chunk_worklist(
                state, *self.sup_boxes, self.mint)
        else:
            wl, cnt = _bigmesh_full_worklist(
                pix.shape[0], self.meta["n_chunks"])
        return _bigmesh_launch(
            jnp.asarray(frame, jnp.uint32), jnp.uint32(0), self.tables,
            self.chunk_tables, pix, state, wl, cnt, self.meta_key,
            self.mint, "reference", False, interpret, search_only=True)

    def trace_primary(self, pixel, origin, direction, frame, mode, *,
                      salt_base, nrays=1, interpret=False, tile_cull=True):
        """Single-intersection debug integrators (binary/color/depth/
        normal/Utah/AO/Appel) for big meshes: one chunked closest-hit
        launch + the shared XLA finalize; AO probes and Appel's shadow are
        further chunked occlusion launches.  Rays arrive from the XLA
        raygen (render.py), so jitter matches the XLA integrators."""
        n = pixel.shape[0]
        pix = _to_btiles(pixel)
        o3 = tuple(_to_btiles(origin[:, k]) for k in range(3))
        d3 = tuple(_to_btiles(direction[:, k]) for k in range(3))
        frame = jnp.asarray(frame, jnp.uint32)
        live = jnp.ones_like(o3[0], bool)

        def search(o3s, d3s, mask):
            return self.search_tiles(pix, o3s, d3s, mask, frame,
                                     interpret=interpret,
                                     tile_cull=tile_cull)

        winner = search(o3, d3, live)
        r, g, b = _primary_finalize(
            mode, nrays, self._mat_dict(), self.meta, pix, frame,
            jnp.asarray(salt_base, jnp.uint32), o3 + d3, winner, search)
        return tuple(_from_btiles(v, n) for v in (r, g, b))

    def trace_shaded(self, pixel, origin, direction, frame, integ, *,
                     salt_base, max_bounces, style="reference",
                     interpret=False, tile_cull=True):
        """Whitted/Cook bounce loops for big meshes: per bounce one
        chunked closest-hit launch, then the same _shade_whitted /
        _shade_cook math as the fused kernel in XLA (Whitted adds one
        chunked shadow launch per bounce; Cook one tail resolve launch,
        integrators.glsl:483-487)."""
        n = pixel.shape[0]
        pix = _to_btiles(pixel)
        o3 = tuple(_to_btiles(origin[:, k]) for k in range(3))
        d3 = tuple(_to_btiles(direction[:, k]) for k in range(3))
        ones = jnp.ones_like(pix, jnp.float32)
        zeros = jnp.zeros_like(pix, jnp.float32)
        # Whitted starts its path color at the ambient term
        # (integrators.glsl:270; integrator_whitted init).
        amb = jnp.full_like(ones, _AMBIENT)
        col0 = amb if integ == "whitted" else zeros
        state = o3 + d3 + (ones, ones, ones, col0, col0, col0,
                           zeros, zeros, zeros, ones)
        frame = jnp.asarray(frame, jnp.uint32)
        mat = self._mat_dict()
        final = jnp.zeros_like(pix, bool)

        def search(o3s, d3s, mask):
            return self.search_tiles(pix, o3s, d3s, mask, frame,
                                     interpret=interpret,
                                     tile_cull=tile_cull)

        nb = int(max_bounces)
        for b in range(nb):
            salt = jnp.asarray(salt_base, jnp.uint32) + jnp.uint32(b * 4)
            winner = search(state[:3], state[3:6], state[15] > 0.0)
            st = state[:15] + (state[15] > 0.0,)
            if integ == "whitted":
                st = _shade_whitted(mat, self.meta, pix, frame, salt,
                                    st, winner, search)
            else:
                st, final = _shade_cook(mat, self.meta, pix, frame, salt,
                                        st, winner, final)
            state = st[:15] + (st[15].astype(jnp.float32),)

        active = state[15] > 0.0
        rr, rg, rb = state[12], state[13], state[14]
        if integ == "cook":
            # Tail resolve: a final Lambert scatter still terminates on
            # emission or sky (mirrors make_path_kernel's is_last tail).
            (ox, oy, oz, dx, dy, dz, tr, tg, tb,
             cr, cg, cb) = state[:12]
            fin = active & final
            tw = search((ox, oy, oz), (dx, dy, dz), fin)
            m2 = _mat_fetch(mat, self.meta, tw[4])
            hit2 = tw[5] >= 0
            sky_r = _WHITE[0] + (_BLUE[0] - _WHITE[0]) * dy
            sky_g = _WHITE[1] + (_BLUE[1] - _WHITE[1]) * dy
            sky_b = _WHITE[2] + (_BLUE[2] - _WHITE[2]) * dy
            rr = jnp.where(fin, rr + cr + tr * jnp.where(hit2, m2["er"],
                                                         sky_r), rr)
            rg = jnp.where(fin, rg + cg + tg * jnp.where(hit2, m2["eg"],
                                                         sky_g), rg)
            rb = jnp.where(fin, rb + cb + tb * jnp.where(hit2, m2["eb"],
                                                         sky_b), rb)
            active = active & ~final
        if style == "standard":
            rr = jnp.where(active, rr + state[9], rr)
            rg = jnp.where(active, rg + state[10], rg)
            rb = jnp.where(active, rb + state[11], rb)
        return tuple(_from_btiles(v, n) for v in (rr, rg, rb))

    def trace_hart(self, pixel, origin, direction, *, mint=0.0,
                   interpret=False):
        """Hart iteration heat map for big meshes: the XLA sphere-trace
        loop (ops/sdf.py sphere_trace; distance_functions.glsl:70-116)
        with each step's scene min-distance computed by the chunked
        distance kernel (make_bigmesh_hart_kernel, exact cluster distance
        culling).  Whole-film convergence still pays the remaining
        launches' floors; the per-tile live gate skips their folds."""
        n = pixel.shape[0]
        # Fat (8,1024) tiles regardless of BIG_L: the march kernel keeps
        # the (tiles, chunks) grid, whose per-step SMEM bookkeeping cost
        # (see make_bigmesh_dma_kernel) scales with tiles x chunks — 8x
        # the tiles would overflow SMEM, and the distance fold gains
        # nothing from narrower tiles.
        o3 = tuple(_to_tiles(origin[:, k]) for k in range(3))
        d3 = tuple(_to_tiles(direction[:, k]) for k in range(3))
        t0 = jnp.float32(mint)
        px, py, pz = (o + t0 * d for o, d in zip(o3, d3))
        iters = jnp.full(px.shape, MARCH_ITER, jnp.int32)
        done = jnp.zeros(px.shape, bool)
        for i in range(MARCH_ITER):
            dist = _bigmesh_hart_call(
                self.chunk_tables, (px, py, pz),
                (~done).astype(jnp.float32), self.meta_key, interpret)
            stop = dist < MARCH_EPS   # maxt = inf (integrator_hart)
            iters = jnp.where((~done) & stop, i, iters)
            adv = (~done) & ~stop
            px = jnp.where(adv, px + dist * d3[0], px)
            py = jnp.where(adv, py + dist * d3[1], py)
            pz = jnp.where(adv, pz + dist * d3[2], pz)
            done = done | stop
        val = iters.astype(jnp.float32) * (1.0 / (MARCH_ITER - 1))
        v = _from_tiles(val, n)
        return v, v, v


# ---------------------------------------------------------------------------
# Primary-hit integrator kernel: the single-intersection debug modes
# (binary/color/depth/normal/Utah/AO/Appel) at full kernel rate
# ---------------------------------------------------------------------------

# Mode ids match models.integrators.INTEGRATOR_NAMES.
PRIMARY_MODES = frozenset((0, 1, 2, 3, 4, 5, 6))

# Directional light of the debug integrators (integrators.glsl; the XLA
# constants in models/integrators.py) — normalize(0.5, 1.0, 0.3).
_LNORM = (0.5 * 0.5 + 1.0 * 1.0 + 0.3 * 0.3) ** 0.5
_LDIR = (0.5 / _LNORM, 1.0 / _LNORM, 0.3 / _LNORM)
_AMBIENT = 0.1
_LIGHT_I = 1.0


def _primary_finalize(mode, nrays, mat, meta, pix, frame, salt_base,
                      rays, winner, search):
    """Debug-integrator finalize from a primary-hit winner — the mode
    branches of the reference's single-intersection integrators
    (integrators.glsl:24-250; XLA parity: models/integrators.py).

    Pure jnp and shape-generic: runs inside make_primary_kernel on [S, L]
    tiles AND as XLA ops on [grid, S, L] arrays between chunked launches
    (BigMeshTracer's big-mesh mode drivers).  ``search(o3, d3, mask) ->
    winner`` supplies the AO probe / Appel shadow occlusion searches.
    Returns (r, g, b)."""
    ox, oy, oz, dx, dy, dz = rays
    t, wnx, wny, wnz, wmat, wfam, widx = winner
    hit = wfam >= 0
    hit_f = hit.astype(jnp.float32)
    inv_nl = _rsqrt_safe(wnx * wnx + wny * wny + wnz * wnz)
    # Normalized, zeroed on miss — isect_from_hit's convention.
    nX = jnp.where(hit, wnx * inv_nl, 0.0)
    nY = jnp.where(hit, wny * inv_nl, 0.0)
    nZ = jnp.where(hit, wnz * inv_nl, 0.0)

    mtab = _mat_fetch(mat, meta, wmat)

    def mfetch(name):
        return mtab[name]

    if mode == 0:       # binary (integrators.glsl:24-38)
        r = g = b = hit_f
    elif mode == 1:     # color (42-59)
        r = jnp.where(hit, mfetch("ar"), 0.0)
        g = jnp.where(hit, mfetch("ag"), 0.0)
        b = jnp.where(hit, mfetch("ab"), 0.0)
    elif mode == 2:     # depth (63-82): 1/(|d| t); miss -> 0
        inv_d = _rsqrt_safe(dx * dx + dy * dy + dz * dz)
        r = g = b = jnp.where(hit, inv_d / jnp.maximum(t, 1e-30), 0.0)
    elif mode == 3:     # normal (86-102)
        r = 0.5 * nX + 0.5 * hit_f
        g = 0.5 * nY + 0.5 * hit_f
        b = 0.5 * nZ + 0.5 * hit_f
    elif mode == 4:     # Utah (106-148): headlight-free raster shading
        facing = (dx * nX + dy * nY + dz * nZ) < 0.0
        fX = jnp.where(facing, nX, -nX)
        fY = jnp.where(facing, nY, -nY)
        fZ = jnp.where(facing, nZ, -nZ)
        cos_l = jnp.maximum(
            0.0, _LDIR[0] * fX + _LDIR[1] * fY + _LDIR[2] * fZ)
        # sky uses RAW d.y (glsl mix extrapolates outside [0,1])
        sky_r = _WHITE[0] + (_BLUE[0] - _WHITE[0]) * dy
        sky_g = _WHITE[1] + (_BLUE[1] - _WHITE[1]) * dy
        sky_b = _WHITE[2] + (_BLUE[2] - _WHITE[2]) * dy
        r = jnp.where(hit, _AMBIENT + mfetch("er")
                      + mfetch("ar") * (_LIGHT_I * cos_l), sky_r)
        g = jnp.where(hit, _AMBIENT + mfetch("eg")
                      + mfetch("ag") * (_LIGHT_I * cos_l), sky_g)
        b = jnp.where(hit, _AMBIENT + mfetch("eb")
                      + mfetch("ab") * (_LIGHT_I * cos_l), sky_b)
    elif mode == 5:     # AO (152-200): nrays cosine probes
        inv_dl = _rsqrt_safe(dx * dx + dy * dy + dz * dz)
        iX, iY, iZ = dx * inv_dl, dy * inv_dl, dz * inv_dl
        facing = (iX * nX + iY * nY + iZ * nZ) < 0.0
        fX = jnp.where(facing, nX, -nX)
        fY = jnp.where(facing, nY, -nY)
        fZ = jnp.where(facing, nZ, -nZ)
        px = ox + t * dx + _EPSILON * fX
        py = oy + t * dy + _EPSILON * fY
        pz = oz + t * dz + _EPSILON * fZ
        acc = jnp.zeros_like(dx)
        for i in range(nrays):
            ru, rv, _ = _rng(pix, frame, salt_base + jnp.uint32(i * 4))
            phi = _TWO_PI * ru
            cos_t = 1.0 - 2.0 * rv
            sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
            sX = fX + sin_t * jnp.cos(phi)
            sY = fY + sin_t * jnp.sin(phi)
            sZ = fZ + cos_t
            pw = search((px, py, pz), (sX, sY, sZ), hit)
            acc = acc + ((pw[5] >= 0) & hit).astype(jnp.float32)
        ao = 1.0 - acc * (1.0 / nrays)
        r = g = b = jnp.where(hit, ao, 0.0)
    else:               # Appel (204-250): hard shadow; miss -> white
        inv_dl = _rsqrt_safe(dx * dx + dy * dy + dz * dz)
        iX, iY, iZ = dx * inv_dl, dy * inv_dl, dz * inv_dl
        flip = (iX * nX + iY * nY + iZ * nZ) > 0.0
        fX = jnp.where(flip, -nX, nX)
        fY = jnp.where(flip, -nY, nY)
        fZ = jnp.where(flip, -nZ, nZ)
        px = ox + t * dx + _EPSILON * fX
        py = oy + t * dy + _EPSILON * fY
        pz = oz + t * dz + _EPSILON * fZ
        ones = jnp.ones_like(dx)
        sw = search((px, py, pz),
                    (_LDIR[0] * ones, _LDIR[1] * ones, _LDIR[2] * ones),
                    hit)
        shadow = (sw[5] >= 0) & hit
        cos_l = jnp.maximum(
            0.0, _LDIR[0] * fX + _LDIR[1] * fY + _LDIR[2] * fZ)
        lit = jnp.where(shadow, 0.0, _LIGHT_I * cos_l)
        r = g = b = jnp.where(hit, lit, 1.0)
    return r, g, b


def make_primary_kernel(meta, mint, *, mode, cam_mode, nrays):
    """One-search debug integrator kernel (XLA parity: the matching
    integrator_* in models/integrators.py).  In-kernel ray generation; AO
    runs ``nrays`` cosine probe occlusion searches, Appel one shadow
    search."""

    def kernel(ctl_ref, *refs):
        cam_ref = refs[0]
        tri = dict(zip(TRI_FIELDS, refs[1:18]))
        sph = dict(zip(SPH_FIELDS, refs[18:23]))
        pln = dict(zip(PLN_FIELDS, refs[23:28]))
        mat = dict(zip(MAT_FIELDS, refs[28:36]))
        for d in (sph, pln, mat):
            for k in d:
                d[k] = d[k][...]
        pos = 36
        cull = cull_scratch = None
        if meta.get("culled"):
            cull = refs[pos:pos + 29]
            pos += 29
            cull_scratch = refs[-1:]
            refs = refs[:-1]
        pix_ref = refs[pos]
        outs = refs[pos + 1:pos + 4]

        frame = ctl_ref[0]
        salt_base = ctl_ref[1]
        jitter_salt = ctl_ref[2]
        pix = pix_ref[0]

        ox, oy, oz, dx, dy, dz = _gen_rays_inkernel(
            cam_ref, pix, frame, jitter_salt, cam_mode
        )
        live = jnp.ones(pix.shape, bool)

        def search(o3, d3, mask):
            winner, _ = _search(tri, sph, pln, meta, *o3, *d3, mint,
                                cull=cull, live=mask,
                                cull_scratch=cull_scratch)
            return winner

        winner = search((ox, oy, oz), (dx, dy, dz), live)
        r, g, b = _primary_finalize(
            mode, nrays, mat, meta, pix, frame, salt_base,
            (ox, oy, oz, dx, dy, dz), winner, search)

        outs[0][0] = r
        outs[1][0] = g
        outs[2][0] = b

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "meta_key", "mint", "mode", "cam_mode", "nrays", "interpret"))
def _primary_call(frame, salt_base, jitter_salt, cam_params, tables,
                  cull_tables, pix, meta_key, mint, mode, cam_mode, nrays,
                  interpret):
    meta = dict(meta_key)
    grid = pix.shape[0]
    kern = make_primary_kernel(meta, mint, mode=mode, cam_mode=cam_mode,
                               nrays=nrays)
    _, rs, rl = pix.shape

    def tab_spec(v):
        return pl.BlockSpec(v.shape, lambda i: (0, 0, 0),
                            memory_space=pltpu.VMEM)

    row = pl.BlockSpec((1, rs, rl), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM)]
    args = [None, cam_params]
    in_specs += [tab_spec(v) for v in tables]
    args += list(tables)
    scratch = []
    if meta.get("culled"):
        in_specs += [pl.BlockSpec(memory_space=pltpu.SMEM)] * len(cull_tables)
        args += list(cull_tables)
        scratch.append(pltpu.SMEM((meta["n_clu"],), jnp.int32))
    in_specs.append(row)
    args.append(pix)
    ctl = jnp.stack([
        jnp.asarray(frame, jnp.uint32),
        jnp.asarray(salt_base, jnp.uint32),
        jnp.asarray(jitter_salt, jnp.uint32),
    ])
    args[0] = ctl
    return pl.pallas_call(
        kern, grid=(grid,),
        in_specs=in_specs,
        out_specs=tuple([row] * 3),
        out_shape=tuple(
            jax.ShapeDtypeStruct((grid, rs, rl), jnp.float32)
            for _ in range(3)
        ),
        interpret=interpret, scratch_shapes=scratch,
    )(*args)


# ---------------------------------------------------------------------------
# Hart sphere-trace kernel (mode 10): the march-iteration heat map
# ---------------------------------------------------------------------------

MARCH_ITER = 32   # reference: compute_pass.comp:10
MARCH_EPS = 0.1   # reference: compute_pass.comp:11


def pack_hart(scene: Scene) -> tuple[tuple, dict]:
    """Raw-vertex SMEM tables for the in-kernel SDF march: 9 flat f32[Tp]
    component tables (v0/v1/v2 xyz).  Padding repeats the last triangle
    (duplicates are harmless under the min-distance reduce)."""
    t = scene.num_triangles
    tp = max(-(-max(t, 1) // 8) * 8, 8)

    def flat(col):
        a = jnp.asarray(col, jnp.float32)
        if t == 0:
            return jnp.full((tp,), 1e15, jnp.float32)
        return jnp.pad(a, (0, tp - t), mode="edge")

    tabs = tuple(
        flat(v[:, k]) for v in (scene.tri_v0, scene.tri_v1, scene.tri_v2)
        for k in range(3)
    )
    return tabs, dict(hart_rows=tp, num_tri=t)


def _tri_dist2(px, py, pz,
               ax, ay, az, bx, by, bz, cx, cy, cz):
    """Squared iq unsigned triangle distance (distance_functions.glsl:28-61),
    broadcast-generic: vertex comps broadcast against point comps — SMEM
    scalars vs [S,L] tiles in make_hart_kernel, [K,1,1] lane columns vs
    [1,S,L] tiles in the chunked big-mesh march."""
    bax, bay, baz = bx - ax, by - ay, bz - az
    cbx, cby, cbz = cx - bx, cy - by, cz - bz
    acx, acy, acz = ax - cx, ay - cy, az - cz
    # nor = cross(ba, ac)
    nx = bay * acz - baz * acy
    ny = baz * acx - bax * acz
    nz = bax * acy - bay * acx
    pax, pay, paz = px - ax, py - ay, pz - az
    pbx, pby, pbz = px - bx, py - by, pz - bz
    pcx, pcy, pcz = px - cx, py - cy, pz - cz

    def edge_sign(ex, ey, ez, qx, qy, qz):
        # sign(dot(cross(e, nor), q))
        cxx = ey * nz - ez * ny
        cyy = ez * nx - ex * nz
        czz = ex * ny - ey * nx
        return jnp.sign(cxx * qx + cyy * qy + czz * qz)

    edge_region = (
        edge_sign(bax, bay, baz, pax, pay, paz)
        + edge_sign(cbx, cby, cbz, pbx, pby, pbz)
        + edge_sign(acx, acy, acz, pcx, pcy, pcz)
    ) < 2.0

    def edge_dist(ex, ey, ez, qx, qy, qz):
        e2 = jnp.maximum(ex * ex + ey * ey + ez * ez, 1e-20)
        h = jnp.clip((ex * qx + ey * qy + ez * qz) / e2, 0.0, 1.0)
        rx, ry, rz = ex * h - qx, ey * h - qy, ez * h - qz
        return rx * rx + ry * ry + rz * rz

    d_edge = jnp.minimum(
        jnp.minimum(edge_dist(bax, bay, baz, pax, pay, paz),
                    edge_dist(cbx, cby, cbz, pbx, pby, pbz)),
        edge_dist(acx, acy, acz, pcx, pcy, pcz),
    )
    dn = nx * pax + ny * pay + nz * paz
    d_face = dn * dn / jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-20)
    return jnp.where(edge_region, d_edge, d_face)


def make_hart_kernel(meta, mint, *, cam_mode):
    """Sphere tracing over the scene triangle SDF (ops/sdf.py sphere_trace,
    distance_functions.glsl:70-116): MARCH_ITER steps of iq triangle
    distance (SMEM-scalar triangles), output = iterations / (MARCH_ITER-1).
    A whole-tile all-done check skips remaining iterations' VPU work."""
    n_tri = max(meta["num_tri"], 1)

    def kernel(ctl_ref, *refs):
        cam_ref = refs[0]
        tabs = refs[1:10]
        pix_ref = refs[10]
        outs = refs[11:14]

        frame = ctl_ref[0]
        jitter_salt = ctl_ref[2]
        pix = pix_ref[0]
        ox, oy, oz, dx, dy, dz = _gen_rays_inkernel(
            cam_ref, pix, frame, jitter_salt, cam_mode
        )

        def scene_dist(px, py, pz):
            def tri_body(j, best):
                d2 = _tri_dist2(
                    px, py, pz,
                    tabs[0][j], tabs[1][j], tabs[2][j],
                    tabs[3][j], tabs[4][j], tabs[5][j],
                    tabs[6][j], tabs[7][j], tabs[8][j],
                )
                return jnp.minimum(best, d2)

            d2 = jax.lax.fori_loop(
                0, n_tri, tri_body, jnp.full((S, L), _BIG, jnp.float32))
            return jnp.sqrt(d2)

        t0 = jnp.full((S, L), jnp.float32(mint))
        px = ox + t0 * dx
        py = oy + t0 * dy
        pz = oz + t0 * dz

        # March loop statically unrolled (Mosaic cannot legalize the
        # cond-in-fori-in-fori nest); each step skips its triangle sweep
        # once every lane has converged.
        iters = jnp.full((S, L), MARCH_ITER, jnp.int32)
        done = jnp.zeros((S, L), bool)
        for i in range(MARCH_ITER):
            dist = jax.lax.cond(
                jnp.all(done),
                lambda _: jnp.zeros((S, L), jnp.float32),
                lambda _: scene_dist(px, py, pz),
                None,
            )
            stop = dist < MARCH_EPS   # maxt = inf (integrator_hart)
            newly = (~done) & stop
            iters = jnp.where(newly, i, iters)
            adv = (~done) & ~stop
            px = jnp.where(adv, px + dist * dx, px)
            py = jnp.where(adv, py + dist * dy, py)
            pz = jnp.where(adv, pz + dist * dz, pz)
            done = done | stop
        val = iters.astype(jnp.float32) * (1.0 / (MARCH_ITER - 1))
        for o in outs:
            o[0] = val

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "meta_key", "mint", "cam_mode", "interpret"))
def _hart_call(frame, jitter_salt, cam_params, tabs, pix, meta_key, mint,
               cam_mode, interpret):
    meta = dict(meta_key)
    grid = pix.shape[0]
    kern = make_hart_kernel(meta, mint, cam_mode=cam_mode)
    row = pl.BlockSpec((1, S, L), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    in_specs = ([pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
                + [pl.BlockSpec(memory_space=pltpu.SMEM)] * 9 + [row])
    ctl = jnp.stack([jnp.asarray(frame, jnp.uint32), jnp.uint32(0),
                     jnp.asarray(jitter_salt, jnp.uint32)])
    return pl.pallas_call(
        kern, grid=(grid,), in_specs=in_specs,
        out_specs=tuple([row] * 3),
        out_shape=tuple(
            jax.ShapeDtypeStruct((grid, S, L), jnp.float32) for _ in range(3)
        ),
        interpret=interpret,
    )(ctl, cam_params, *tabs, pix)


def trace_hart(scene, pixel, frame, *, cam_params, cam_mode, jitter_salt,
               mint=0.0, interpret=False):
    """Hart heat map via the march kernel -> (r, g, b) flat [N]."""
    tabs, meta = pack_hart(scene)
    n = pixel.shape[0]
    pix = _to_tiles(pixel)
    r, g, b = _hart_call(
        jnp.asarray(frame, jnp.uint32), jnp.asarray(jitter_salt, jnp.uint32),
        cam_params, tabs, pix, tuple(sorted(meta.items())), float(mint),
        cam_mode, interpret,
    )
    return _from_tiles(r, n), _from_tiles(g, n), _from_tiles(b, n)
