"""Pallas megakernel: one full Kajiya bounce per kernel launch.

This is the TPU re-design of the reference's per-pixel megakernel
(assets/shaders/compute_pass.comp + integrators.glsl:547-677): the entire
bounce — closest-hit search over every primitive family, winner-attribute
selection, normal/eta handling, material dispatch (Lambert/mirror/dielectric),
counter-based RNG, sky/emission accumulation — runs as one fused VPU program
per 1024-ray tile.  Nothing ray-sized touches HBM between bounce stages, which
is worth ~10x over the XLA op-by-op pipeline (each materialized [N,3] buffer
costs ~4ms at 1080p from (8,128) tile padding).

Everything lives in component-SoA [1, BR] vectors (rays on the lane axis) and
[P, 1] scene-table columns (primitives on the sublane axis); the pairwise
search tile is [chunk, BR].

RNG is the same PCG3D counter hash as the XLA path, keyed (pixel, frame,
salt), so megakernel and XLA renders are sample-identical up to fma rounding.

The kernel is forward-only (no autodiff rule): rendering/display use it;
gradient paths use the XLA integrators.  (A custom-VJP pairing is the
follow-up: forward megakernel + saved hit ids, XLA backward from hits.)
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..scene.scene import Scene
from .intersect import triangle_precompute

BR = 1024  # rays per program (lane axis)
BT_MAX = 256  # max triangle-chunk rows (sublane axis)

_BIG = 3.0e38  # effectively +inf, avoids inf-inf NaN traps in selects
_DENOM_EPS = 1e-30
_TWO_PI = 6.283185307179586
_EPSILON = 5e-3  # surface offset (compute_pass.comp:9)
# Sky gradient endpoints (integrators.glsl:570-571).
_WHITE = (1.0, 1.0, 1.0)
_BLUE = (0.2, 0.3, 0.7)

# Material kinds (material.h:11-16).
_LAMBERT, _MIRROR, _DIELECTRIC = 0.0, 1.0, 2.0

TRI_FIELDS = (
    "nx", "ny", "nz",
    "e0x", "e0y", "e0z",
    "e1x", "e1y", "e1z",
    "v0n", "v0e0", "v0e1",
    "g00", "g11", "g01", "inv_det",
    "mat",
)
SPH_FIELDS = ("cx", "cy", "cz", "rad", "mat")
PLN_FIELDS = ("nx", "ny", "nz", "doff", "mat")
MAT_FIELDS = ("ar", "ag", "ab", "er", "eg", "eb", "ior", "kind")


def _pad_col(arr, align=8, fill=0.0):
    arr = jnp.asarray(arr, jnp.float32)
    n = arr.shape[0]
    pad = (-n) % align if n else align
    if pad:
        arr = jnp.concatenate([arr, jnp.full((pad,), fill, jnp.float32)])
    return arr.reshape(-1, 1)


def pack_scene(scene: Scene) -> dict:
    """Scene tables as sublane-major [rows, 1] columns for the kernel.

    Empty families get one inert row (zero normal / zero radius -> never a
    valid hit) so kernel shapes stay static and nonzero.
    """
    packed = {}
    t = scene.num_triangles
    if t:
        pre = triangle_precompute(scene.tri_v0, scene.tri_v1, scene.tri_v2)
        vals = dict(
            nx=pre["n"][:, 0], ny=pre["n"][:, 1], nz=pre["n"][:, 2],
            e0x=pre["e0"][:, 0], e0y=pre["e0"][:, 1], e0z=pre["e0"][:, 2],
            e1x=pre["e1"][:, 0], e1y=pre["e1"][:, 1], e1z=pre["e1"][:, 2],
            v0n=pre["v0n"], v0e0=pre["v0e0"], v0e1=pre["v0e1"],
            g00=pre["g00"], g11=pre["g11"], g01=pre["g01"],
            inv_det=pre["inv_det"],
            mat=scene.tri_mat.astype(jnp.float32),
        )
    else:
        vals = {k: jnp.zeros((1,), jnp.float32) for k in TRI_FIELDS}
    chunk = min(-(-max(t, 1) // 8) * 8, BT_MAX)
    for k in TRI_FIELDS:
        packed[f"tri_{k}"] = _pad_col(vals[k], align=chunk)
    packed["__tri_chunk__"] = chunk

    s = scene.num_spheres
    if s:
        sv = dict(
            cx=scene.sph_center[:, 0], cy=scene.sph_center[:, 1],
            cz=scene.sph_center[:, 2], rad=scene.sph_radius,
            mat=scene.sph_mat.astype(jnp.float32),
        )
    else:
        sv = {k: jnp.zeros((1,), jnp.float32) for k in SPH_FIELDS}
    for k in SPH_FIELDS:
        packed[f"sph_{k}"] = _pad_col(sv[k])

    p = scene.num_planes
    if p:
        pv = dict(
            nx=scene.pln_normal[:, 0], ny=scene.pln_normal[:, 1],
            nz=scene.pln_normal[:, 2], doff=scene.pln_d,
            mat=scene.pln_mat.astype(jnp.float32),
        )
    else:
        pv = {k: jnp.zeros((1,), jnp.float32) for k in PLN_FIELDS}
    for k in PLN_FIELDS:
        packed[f"pln_{k}"] = _pad_col(pv[k])

    m = scene.materials
    if m.count:
        mv = dict(
            ar=m.albedo[:, 0], ag=m.albedo[:, 1], ab=m.albedo[:, 2],
            er=m.emission[:, 0], eg=m.emission[:, 1], eb=m.emission[:, 2],
            ior=m.ior, kind=m.kind.astype(jnp.float32),
        )
    else:
        mv = {k: jnp.zeros((1,), jnp.float32) for k in MAT_FIELDS}
        mv["ior"] = jnp.ones((1,), jnp.float32)
    for k in MAT_FIELDS:
        packed[f"mat_{k}"] = _pad_col(mv[k])
    return packed


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
    # Mosaic lacks a u32->f32 cast; the top-24-bit value fits in i32, so
    # bitcast to i32 first (same bits, supported cast to f32).
    shifted = pltpu.bitcast(bits >> jnp.uint32(8), jnp.int32)
    return shifted.astype(jnp.float32) * jnp.float32(1.0 / 16777216.0)


def _select_row(value_col, row_idx, rows_iota):
    """Pick value_col[row_idx] per lane: sum of a one-row mask (the in-kernel
    'gather' — dynamic per-lane indexing is not a VPU primitive)."""
    return jnp.sum(
        jnp.where(rows_iota == row_idx, value_col, 0.0), axis=0, keepdims=True
    )


def make_kernel(meta: dict, salt_base: int, mint: float):
    """Build the bounce kernel for static scene sizes/salt."""
    tri_chunk = meta["tri_chunk"]
    n_tri_chunks = meta["tri_rows"] // tri_chunk
    sph_rows = meta["sph_rows"]
    pln_rows = meta["pln_rows"]
    mat_rows = meta["mat_rows"]
    n_names = 17 + 5 + 5 + 8  # table refs

    def kernel(frame_ref, *refs):
        tri = dict(zip(TRI_FIELDS, refs[:17]))
        sph = dict(zip(SPH_FIELDS, refs[17:22]))
        pln = dict(zip(PLN_FIELDS, refs[22:27]))
        mat = dict(zip(MAT_FIELDS, refs[27:35]))
        (pix_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
         tr_ref, tg_ref, tb_ref, cr_ref, cg_ref, cb_ref,
         rr_ref, rg_ref, rb_ref, act_ref) = refs[35:52]
        (ox_o, oy_o, oz_o, dx_o, dy_o, dz_o,
         tr_o, tg_o, tb_o, cr_o, cg_o, cb_o,
         rr_o, rg_o, rb_o, act_o, fam_o, idx_o) = refs[52:70]

        frame = frame_ref[0]
        ox, oy, oz = ox_ref[0], oy_ref[0], oz_ref[0]
        dx, dy, dz = dx_ref[0], dy_ref[0], dz_ref[0]

        # ------------------------------------------------ closest-hit search
        t_best = jnp.full((1, BR), _BIG, jnp.float32)
        wnx = jnp.zeros((1, BR), jnp.float32)  # winner geometric normal
        wny = jnp.zeros((1, BR), jnp.float32)
        wnz = jnp.zeros((1, BR), jnp.float32)
        wmat = jnp.zeros((1, BR), jnp.float32)
        wfam = jnp.full((1, BR), -1, jnp.int32)  # hit record for the VJP replay
        widx = jnp.full((1, BR), -1, jnp.int32)

        def tri_body(c, carry):
            t_best, wnx, wny, wnz, wmat, wfam, widx = carry
            sl = pl.ds(c * tri_chunk, tri_chunk)

            def col(name):
                return tri[name][sl, :]

            nx, ny, nz = col("nx"), col("ny"), col("nz")
            dn = nx * dx + ny * dy + nz * dz
            on = nx * ox + ny * oy + nz * oz
            de0 = col("e0x") * dx + col("e0y") * dy + col("e0z") * dz
            de1 = col("e1x") * dx + col("e1y") * dy + col("e1z") * dz
            oe0 = col("e0x") * ox + col("e0y") * oy + col("e0z") * oz
            oe1 = col("e1x") * ox + col("e1y") * oy + col("e1z") * oz
            dn_safe = jnp.where(jnp.abs(dn) < _DENOM_EPS, _DENOM_EPS, dn)
            t = (col("v0n") - on) / dn_safe
            b0 = oe0 + t * de0 - col("v0e0")
            b1 = oe1 + t * de1 - col("v0e1")
            u = col("inv_det") * (col("g11") * b0 - col("g01") * b1)
            v = col("inv_det") * (col("g00") * b1 - col("g01") * b0)
            valid = (mint < t) & (t < t_best) & (u > 0.0) & (v > 0.0) & (u + v < 1.0)
            tm = jnp.where(valid, t, _BIG)
            cmin = jnp.min(tm, axis=0, keepdims=True)
            rows = jax.lax.broadcasted_iota(jnp.int32, (tri_chunk, BR), 0)
            first = jnp.min(
                jnp.where(tm == cmin, rows, jnp.int32(2**30)), axis=0,
                keepdims=True,
            )
            better = cmin < t_best
            t_best = jnp.where(better, cmin, t_best)
            wnx = jnp.where(better, _select_row(nx, first, rows), wnx)
            wny = jnp.where(better, _select_row(ny, first, rows), wny)
            wnz = jnp.where(better, _select_row(nz, first, rows), wnz)
            wmat = jnp.where(better, _select_row(col("mat"), first, rows), wmat)
            wfam = jnp.where(better, 0, wfam)
            widx = jnp.where(better, c * tri_chunk + first, widx)
            return t_best, wnx, wny, wnz, wmat, wfam, widx

        t_best, wnx, wny, wnz, wmat, wfam, widx = jax.lax.fori_loop(
            0, n_tri_chunks, tri_body,
            (t_best, wnx, wny, wnz, wmat, wfam, widx),
        )

        # spheres (one padded block; zero radius rows never hit)
        if meta["has_spheres"]:
            cx, cy, cz = sph["cx"][:, :], sph["cy"][:, :], sph["cz"][:, :]
            rad = sph["rad"][:, :]
            ocx = ox - cx
            ocy = oy - cy
            ocz = oz - cz
            dd = dx * dx + dy * dy + dz * dz
            bh = dx * ocx + dy * ocy + dz * ocz
            ct = ocx * ocx + ocy * ocy + ocz * ocz - rad * rad
            disc = bh * bh - dd * ct
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            dd_safe = jnp.where(jnp.abs(dd) < _DENOM_EPS, _DENOM_EPS, dd)
            t0 = (-bh - sq) / dd_safe
            t1 = (-bh + sq) / dd_safe
            tn = jnp.where((t0 > mint) & (t0 < t_best), t0, _BIG)
            tf = jnp.where((t1 > mint) & (t1 < t_best), t1, _BIG)
            ts = jnp.where((disc > 0.0) & (rad > 0.0), jnp.minimum(tn, tf), _BIG)
            cmin = jnp.min(ts, axis=0, keepdims=True)
            rows = jax.lax.broadcasted_iota(jnp.int32, (sph_rows, BR), 0)
            first = jnp.min(
                jnp.where(ts == cmin, rows, jnp.int32(2**30)), axis=0,
                keepdims=True,
            )
            better = cmin < t_best
            scx = _select_row(cx, first, rows)
            scy = _select_row(cy, first, rows)
            scz = _select_row(cz, first, rows)
            smat = _select_row(sph["mat"][:, :], first, rows)
            t_best = jnp.where(better, cmin, t_best)
            # normal = pos - center (unnormalized, like the sphere family in
            # the XLA path)
            wnx = jnp.where(better, ox + t_best * dx - scx, wnx)
            wny = jnp.where(better, oy + t_best * dy - scy, wny)
            wnz = jnp.where(better, oz + t_best * dz - scz, wnz)
            wmat = jnp.where(better, smat, wmat)
            wfam = jnp.where(better, 1, wfam)
            widx = jnp.where(better, first, widx)

        if meta["has_planes"]:
            nx, ny, nz = pln["nx"][:, :], pln["ny"][:, :], pln["nz"][:, :]
            dn = nx * dx + ny * dy + nz * dz
            on = nx * ox + ny * oy + nz * oz
            dn_safe = jnp.where(jnp.abs(dn) < _DENOM_EPS, _DENOM_EPS, dn)
            tp = (pln["doff"][:, :] - on) / dn_safe
            live = (nx * nx + ny * ny + nz * nz) > 0.0
            tp = jnp.where((tp > mint) & (tp < t_best) & live, tp, _BIG)
            cmin = jnp.min(tp, axis=0, keepdims=True)
            rows = jax.lax.broadcasted_iota(jnp.int32, (pln_rows, BR), 0)
            first = jnp.min(
                jnp.where(tp == cmin, rows, jnp.int32(2**30)), axis=0,
                keepdims=True,
            )
            better = cmin < t_best
            t_best = jnp.where(better, cmin, t_best)
            wnx = jnp.where(better, _select_row(nx, first, rows), wnx)
            wny = jnp.where(better, _select_row(ny, first, rows), wny)
            wnz = jnp.where(better, _select_row(nz, first, rows), wnz)
            wmat = jnp.where(better, _select_row(pln["mat"][:, :], first, rows), wmat)
            wfam = jnp.where(better, 2, wfam)
            widx = jnp.where(better, first, widx)

        hit = t_best < _BIG
        active = act_ref[0] > 0.0
        thr_r, thr_g, thr_b = tr_ref[0], tg_ref[0], tb_ref[0]
        col_r, col_g, col_b = cr_ref[0], cg_ref[0], cb_ref[0]
        res_r, res_g, res_b = rr_ref[0], rg_ref[0], rb_ref[0]

        # ----------------------------------------------------- miss -> sky
        sky_t = dy * 0.5 + 0.5  # kajiya shift (integrators.glsl:579)
        sky_r = _WHITE[0] + (_BLUE[0] - _WHITE[0]) * sky_t
        sky_g = _WHITE[1] + (_BLUE[1] - _WHITE[1]) * sky_t
        sky_b = _WHITE[2] + (_BLUE[2] - _WHITE[2]) * sky_t
        miss_now = active & ~hit
        res_r = jnp.where(miss_now, res_r + col_r + thr_r * sky_r, res_r)
        res_g = jnp.where(miss_now, res_g + col_g + thr_g * sky_g, res_g)
        res_b = jnp.where(miss_now, res_b + col_b + thr_b * sky_b, res_b)
        active = active & hit

        # --------------------------------------------------- material fetch
        mrows = jax.lax.broadcasted_iota(jnp.int32, (mat_rows, BR), 0)
        is_m = mrows == wmat.astype(jnp.int32)  # [M, BR] one-hot by mat id

        def mfetch(name):
            return jnp.sum(
                jnp.where(is_m, mat[name][:, :], 0.0), axis=0, keepdims=True
            )

        alb_r, alb_g, alb_b = mfetch("ar"), mfetch("ag"), mfetch("ab")
        em_r, em_g, em_b = mfetch("er"), mfetch("eg"), mfetch("eb")
        ior = mfetch("ior")
        kind = mfetch("kind")

        col_r = jnp.where(active, col_r + thr_r * em_r, col_r)
        col_g = jnp.where(active, col_g + thr_g * em_g, col_g)
        col_b = jnp.where(active, col_b + thr_b * em_b, col_b)

        # ------------------------------------------------ geometry at hit
        px = ox + t_best * dx
        py = oy + t_best * dy
        pz = oz + t_best * dz
        nlen2 = wnx * wnx + wny * wny + wnz * wnz
        inv_nlen = jax.lax.rsqrt(jnp.maximum(nlen2, 1e-30))
        nX = wnx * inv_nlen
        nY = wny * inv_nlen
        nZ = wnz * inv_nlen
        dlen2 = dx * dx + dy * dy + dz * dz
        inv_dlen = jax.lax.rsqrt(jnp.maximum(dlen2, 1e-30))
        iX = dx * inv_dlen
        iY = dy * inv_dlen
        iZ = dz * inv_dlen

        cos_view = iX * nX + iY * nY + iZ * nZ
        flipped = cos_view > 0.0
        cos_in = jnp.abs(cos_view)
        nX = jnp.where(flipped, -nX, nX)
        nY = jnp.where(flipped, -nY, nY)
        nZ = jnp.where(flipped, -nZ, nZ)
        eta = jnp.where(flipped, ior, 1.0 / jnp.maximum(ior, 1e-8))

        # ------------------------------------------------------------- RNG
        pix = pix_ref[0]
        salt = jnp.uint32(salt_base)
        ru32, rv32, rw32 = _pcg3d(pix, frame, salt)
        ru, rv, rw = _unit(ru32), _unit(rv32), _unit(rw32)

        # Lambert: cosine scatter = n + uniform sphere point
        phi = _TWO_PI * ru
        cos_t = 1.0 - 2.0 * rv
        sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
        lamX = nX + sin_t * jnp.cos(phi)
        lamY = nY + sin_t * jnp.sin(phi)
        lamZ = nZ + cos_t

        # mirror reflection
        refX = iX + 2.0 * cos_in * nX
        refY = iY + 2.0 * cos_in * nY
        refZ = iZ + 2.0 * cos_in * nZ

        # dielectric
        cos_out_sqr = 1.0 - eta * eta * (1.0 - cos_in * cos_in)
        cos_out = jnp.sqrt(jnp.maximum(0.0, cos_out_sqr))
        r_perp = (eta * cos_in - cos_out) / (eta * cos_in + cos_out)
        r_par = (cos_in - eta * cos_out) / (cos_in + eta * cos_out)
        f_refl = 0.5 * (r_perp * r_perp + r_par * r_par)
        refl = (cos_out_sqr <= 0.0) | (rw < f_refl)
        k = eta * cos_in - cos_out
        rfrX = eta * iX + k * nX
        rfrY = eta * iY + k * nY
        rfrZ = eta * iZ + k * nZ
        dieX = jnp.where(refl, refX, rfrX)
        dieY = jnp.where(refl, refY, rfrY)
        dieZ = jnp.where(refl, refZ, rfrZ)
        die_off = jnp.where(refl, _EPSILON, -_EPSILON)

        is_lam = kind == _LAMBERT
        is_mir = kind == _MIRROR

        out_dx = jnp.where(is_lam, lamX, jnp.where(is_mir, refX, dieX))
        out_dy = jnp.where(is_lam, lamY, jnp.where(is_mir, refY, dieY))
        out_dz = jnp.where(is_lam, lamZ, jnp.where(is_mir, refZ, dieZ))
        off = jnp.where(is_lam | is_mir, _EPSILON, die_off)
        out_ox = px + off * nX
        out_oy = py + off * nY
        out_oz = pz + off * nZ

        # throughput *= albedo for every material kind (lambert's PI/INV_PI
        # cancel, material.glsl:78-92)
        thr_r = jnp.where(active, thr_r * alb_r, thr_r)
        thr_g = jnp.where(active, thr_g * alb_g, thr_g)
        thr_b = jnp.where(active, thr_b * alb_b, thr_b)

        ox_o[0] = jnp.where(active, out_ox, ox)
        oy_o[0] = jnp.where(active, out_oy, oy)
        oz_o[0] = jnp.where(active, out_oz, oz)
        dx_o[0] = jnp.where(active, out_dx, dx)
        dy_o[0] = jnp.where(active, out_dy, dy)
        dz_o[0] = jnp.where(active, out_dz, dz)
        tr_o[0] = thr_r
        tg_o[0] = thr_g
        tb_o[0] = thr_b
        cr_o[0] = col_r
        cg_o[0] = col_g
        cb_o[0] = col_b
        rr_o[0] = res_r
        rg_o[0] = res_g
        rb_o[0] = res_b
        act_o[0] = active.astype(jnp.float32)
        fam_o[0] = jnp.where(active, wfam, -1)
        idx_o[0] = jnp.where(active, widx, -1)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("meta_key", "salt_base", "mint", "interpret"),
)
def _bounce_call(frame, tables, state, meta_key, salt_base, mint, interpret):
    meta = dict(meta_key)
    n_tiles = state[0].shape[0]
    kern = make_kernel(meta, salt_base, mint)

    def tab_spec(v):
        return pl.BlockSpec(v.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)

    row = pl.BlockSpec((1, 1, BR), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out_shapes = tuple(
        jax.ShapeDtypeStruct((n_tiles, 1, BR), jnp.float32) for _ in range(16)
    ) + (
        jax.ShapeDtypeStruct((n_tiles, 1, BR), jnp.int32),
        jax.ShapeDtypeStruct((n_tiles, 1, BR), jnp.int32),
    )
    outs = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [tab_spec(v) for v in tables]
        + [row] * 17,
        out_specs=tuple([row] * 18),
        out_shape=out_shapes,
        interpret=interpret,
    )(frame.reshape(1), *tables, *state)
    return outs


class MegakernelRenderer:
    """Holds packed tables + metadata for a scene; renders Kajiya samples."""

    def __init__(self, scene: Scene, mint: float = 0.0):
        self.packed = pack_scene(scene)
        self.mint = float(mint)
        tri_rows = self.packed["tri_nx"].shape[0]
        self.meta = dict(
            tri_chunk=self.packed["__tri_chunk__"],
            tri_rows=tri_rows,
            sph_rows=self.packed["sph_cx"].shape[0],
            pln_rows=self.packed["pln_nx"].shape[0],
            mat_rows=self.packed["mat_ar"].shape[0],
            has_spheres=scene.num_spheres > 0,
            has_planes=scene.num_planes > 0,
        )
        self.tables = tuple(
            self.packed[f"tri_{k}"] for k in TRI_FIELDS
        ) + tuple(
            self.packed[f"sph_{k}"] for k in SPH_FIELDS
        ) + tuple(
            self.packed[f"pln_{k}"] for k in PLN_FIELDS
        ) + tuple(
            self.packed[f"mat_{k}"] for k in MAT_FIELDS
        )

    def trace(self, pixel, origin, direction, frame, salt_base, max_bounces,
              style="reference", interpret=False, collect_hits=False,
              collect_states=False):
        """Trace Kajiya paths; returns radiance components ([N],[N],[N]), or
        with ``collect_hits`` ((r,g,b), fams i32[B,N], idxs i32[B,N]) — the
        per-bounce hit records consumed by the custom-VJP backward replay.

        ``collect_states`` instead returns ((r,g,b), record) where record is
        the residual bundle for the fully-fused Pallas pullback
        (ops.backward_pk): per-bounce input-state rows (o, d, throughput,
        color, active — 13 rows each), per-bounce fam/idx hit-record rows,
        the pixel row and the final active row, all in the kernel's padded
        [n_tiles, 1, BR] layout.

        pixel u32[N]; origin/direction f32[N,3]; salt_base/max_bounces static.
        """
        n = pixel.shape[0]
        pad = (-n) % BR

        def row(x, fill=0.0):
            x = jnp.asarray(x)
            if pad:
                x = jnp.concatenate([x, jnp.full((pad,), fill, x.dtype)])
            return x.reshape(-1, 1, BR)

        if isinstance(origin, tuple):
            o0, o1, o2 = origin
            d0, d1, d2 = direction
        else:
            o0, o1, o2 = origin[:, 0], origin[:, 1], origin[:, 2]
            d0, d1, d2 = direction[:, 0], direction[:, 1], direction[:, 2]
        state = [
            row(pixel),
            row(o0), row(o1), row(o2),
            row(d0), row(d1), row(d2),
            row(jnp.ones((n,), jnp.float32)),  # thr
            row(jnp.ones((n,), jnp.float32)),
            row(jnp.ones((n,), jnp.float32)),
            row(jnp.zeros((n,), jnp.float32)),  # col
            row(jnp.zeros((n,), jnp.float32)),
            row(jnp.zeros((n,), jnp.float32)),
            row(jnp.zeros((n,), jnp.float32)),  # result
            row(jnp.zeros((n,), jnp.float32)),
            row(jnp.zeros((n,), jnp.float32)),
            row(jnp.ones((n,), jnp.float32)),  # active
        ]
        meta_key = tuple(sorted(self.meta.items()))
        frame = jnp.asarray(frame, jnp.uint32)
        fams, idxs = [], []
        saved_states, fam_rows, idx_rows = [], [], []
        for b in range(int(max_bounces)):
            if collect_states:
                # Bounce-input state: o(3), d(3), thr(3), col(3), active.
                saved_states.append(tuple(state[1:13]) + (state[16],))
            outs = _bounce_call(
                frame, self.tables, tuple(state),
                meta_key, int(salt_base) + b * 4, self.mint, interpret,
            )
            state = [state[0]] + list(outs[:16])
            if collect_states:
                fam_rows.append(outs[16])
                idx_rows.append(outs[17])
            if collect_hits:
                fams.append(outs[16].reshape(-1)[:n])
                idxs.append(outs[17].reshape(-1)[:n])

        res_r = state[13].reshape(-1)[:n]
        res_g = state[14].reshape(-1)[:n]
        res_b = state[15].reshape(-1)[:n]
        if style == "standard":
            act = state[16].reshape(-1)[:n] > 0.0
            res_r = jnp.where(act, res_r + state[10].reshape(-1)[:n], res_r)
            res_g = jnp.where(act, res_g + state[11].reshape(-1)[:n], res_g)
            res_b = jnp.where(act, res_b + state[12].reshape(-1)[:n], res_b)
        if collect_states:
            record = dict(
                pix_row=state[0],
                states=tuple(saved_states),
                fam_rows=tuple(fam_rows),
                idx_rows=tuple(idx_rows),
                act_final_row=state[16],
            )
            return (res_r, res_g, res_b), record
        if collect_hits:
            return (res_r, res_g, res_b), jnp.stack(fams), jnp.stack(idxs)
        return res_r, res_g, res_b
