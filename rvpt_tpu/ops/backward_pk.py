"""Pallas backward for the Kajiya bounce chain: the fully-fused pullback.

The fast-gradient pipeline (ops.fast_grad) pairs the forward megakernel with
a differentiable *replay from hit records*.  Its first backward implementation
(ops.replay_soa) is plain XLA: correct, but each bounce materializes dozens of
[N] intermediates to HBM because the bounce-sized fusion exceeds what XLA will
fuse — at 1080p that HBM traffic dominates the whole fwd+bwd step.

This module moves the pullback itself into Pallas.  One kernel per bounce,
run in reverse bounce order, per 1024-ray tile:

  * recompute the bounce's differentiable chain (exactly replay_soa's math:
    winner-primitive rebuild from the recorded (family, index), emission/sky,
    normal flip, Lambert/mirror/dielectric scatter with the stochastic branch
    detached) from the bounce-input state saved by the forward megakernel;
  * apply ``jax.vjp`` to that pure function *inside the kernel trace* — the
    transpose lowers to the same VPU vector ops as the forward, so nothing
    ray-sized ever leaves VMEM within a bounce;
  * pull the incoming cotangents (d loss / d bounce-output state) back to
    cotangents of the bounce-input state and of the scene tables.

Scene-table cotangents are the scatter-add "sum over rays hitting primitive
k"; on the VPU that is the transpose of the one-hot select-sum lookup — a
masked cross-lane reduction to a [rows, 1] column — accumulated across the
(sequential) grid by revisiting a constant output block.

Reference mapping: this is the hand-paired backward of the reference's
megakernel bounce loop (assets/shaders/integrators.glsl:547-677 +
intersection.glsl + material.glsl), which being a real-time GLSL tracer has
no gradients at all; gradient parity is tested against XLA autodiff of the
same replay math.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..scene.scene import Scene
from .megakernel import BR, _pad_col, _pcg3d, _unit

_DENOM_EPS = 1e-30
_EPSILON = 5e-3
_TWO_PI = 6.283185307179586
_WHITE = (1.0, 1.0, 1.0)
_BLUE = (0.2, 0.3, 0.7)

# Differentiable scene-table columns, in call order.
DIFF_FIELDS = (
    "tv0x", "tv0y", "tv0z", "tv1x", "tv1y", "tv1z", "tv2x", "tv2y", "tv2z",
    "scx", "scy", "scz", "srad",
    "pnx", "pny", "pnz", "pd",
    "mar", "mag", "mab", "mer", "meg", "meb", "mior",
)
# Non-differentiable columns (ids / kinds), packed as f32 after the diff set.
NONDIFF_FIELDS = ("tmat", "smat", "pmat", "mkind")


def pack_scene_raw(scene: Scene):
    """RAW scene tables (vertices, not precomputed edges) as [rows, 1] columns
    — the backward differentiates w.r.t. these directly.  Returns
    (diff_tables, nondiff_tables, meta)."""
    t, s, p = scene.num_triangles, scene.num_spheres, scene.num_planes
    m = scene.materials.count

    def fam(n, comps, matcol):
        if n:
            return comps, matcol
        return tuple(jnp.zeros((1,), jnp.float32) for _ in comps), jnp.zeros(
            (1,), jnp.float32
        )

    tri, tmat = fam(
        t,
        tuple(scene.tri_v0[:, k] for k in range(3))
        + tuple(scene.tri_v1[:, k] for k in range(3))
        + tuple(scene.tri_v2[:, k] for k in range(3)),
        scene.tri_mat.astype(jnp.float32) if t else None,
    )
    sph, smat = fam(
        s,
        tuple(scene.sph_center[:, k] for k in range(3)) + (scene.sph_radius,),
        scene.sph_mat.astype(jnp.float32) if s else None,
    )
    pln, pmat = fam(
        p,
        tuple(scene.pln_normal[:, k] for k in range(3)) + (scene.pln_d,),
        scene.pln_mat.astype(jnp.float32) if p else None,
    )
    if m:
        mats = (
            scene.materials.albedo[:, 0], scene.materials.albedo[:, 1],
            scene.materials.albedo[:, 2],
            scene.materials.emission[:, 0], scene.materials.emission[:, 1],
            scene.materials.emission[:, 2],
            scene.materials.ior,
        )
        mkind = scene.materials.kind.astype(jnp.float32)
    else:
        mats = tuple(jnp.zeros((1,), jnp.float32) for _ in range(7))
        mkind = jnp.zeros((1,), jnp.float32)

    diff = tuple(_pad_col(c) for c in tri + sph + pln + mats)
    nondiff = tuple(_pad_col(c) for c in (tmat, smat, pmat, mkind))
    meta = dict(
        tri_rows=diff[0].shape[0], sph_rows=diff[9].shape[0],
        pln_rows=diff[13].shape[0], mat_rows=diff[17].shape[0],
        num_tri=t, num_sph=s, num_pln=p, num_mat=max(m, 1),
        has_tri=t > 0, has_sph=s > 0, has_pln=p > 0,
    )
    return diff, nondiff, meta


def _safe_div(num, den):
    return num / jnp.where(jnp.abs(den) < _DENOM_EPS, _DENOM_EPS, den)


def _rsqrt_safe(x):
    return jax.lax.rsqrt(jnp.maximum(x, 1e-30))


def make_bwd_kernel(meta: dict, salt: int):
    """Kernel for ONE bounce's pullback at static scene sizes / RNG salt."""
    tri_rows = meta["tri_rows"]
    sph_rows = meta["sph_rows"]
    pln_rows = meta["pln_rows"]
    mat_rows = meta["mat_rows"]

    def kernel(frame_ref, *refs):
        difftab = refs[:24]
        tmat_ref, smat_ref, pmat_ref, mkind_ref = refs[24:28]
        (pix_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
         tr_ref, tg_ref, tb_ref, cr_ref, cg_ref, cb_ref,
         act_ref, fam_ref, idx_ref) = refs[28:44]
        gin = refs[44:59]  # gox..gcb (12) + grr,grg,grb (3)
        gout_rows = refs[59:71]  # cotangent rows out (12)
        gtab_refs = refs[71:95]  # 24 table-grad accumulators

        frame = frame_ref[0]
        pix = pix_ref[0]
        fam = fam_ref[0]
        idx = idx_ref[0]
        act_in = act_ref[0] > 0.0
        hit = fam >= 0
        active = act_in & hit
        miss_now = act_in & ~hit

        # ---- non-differentiable closure values -------------------------
        ru32, rv32, rw32 = _pcg3d(pix, frame, jnp.uint32(salt))
        ru, rv, rw = _unit(ru32), _unit(rv32), _unit(rw32)

        def onehot(rows, safe_idx):
            ri = jax.lax.broadcasted_iota(jnp.int32, (rows, BR), 0)
            return ri == safe_idx

        def sel(oh, col):
            return jnp.sum(jnp.where(oh, col, 0.0), axis=0, keepdims=True)

        mat_id = jnp.zeros((1, BR), jnp.int32)
        if meta["has_tri"]:
            tsafe = jnp.clip(idx, 0, meta["num_tri"] - 1)
            tri_oh = onehot(tri_rows, tsafe)
            m_tri = fam == 0
            mat_id = jnp.where(
                m_tri, sel(tri_oh, tmat_ref[...]).astype(jnp.int32), mat_id
            )
        if meta["has_sph"]:
            ssafe = jnp.clip(idx, 0, meta["num_sph"] - 1)
            sph_oh = onehot(sph_rows, ssafe)
            m_sph = fam == 1
            mat_id = jnp.where(
                m_sph, sel(sph_oh, smat_ref[...]).astype(jnp.int32), mat_id
            )
        if meta["has_pln"]:
            psafe = jnp.clip(idx, 0, meta["num_pln"] - 1)
            pln_oh = onehot(pln_rows, psafe)
            m_pln = fam == 2
            mat_id = jnp.where(
                m_pln, sel(pln_oh, pmat_ref[...]).astype(jnp.int32), mat_id
            )
        msafe = jnp.clip(mat_id, 0, meta["num_mat"] - 1)
        mat_oh = onehot(mat_rows, msafe)
        kind = sel(mat_oh, mkind_ref[...])
        is_lam = kind == 0.0
        is_mir = kind == 1.0

        # ---- the bounce as a pure function of the diff inputs ----------
        def f(ox, oy, oz, dx, dy, dz, tr, tg, tb, cr, cg, cb, *tabs):
            (tv0x, tv0y, tv0z, tv1x, tv1y, tv1z, tv2x, tv2y, tv2z,
             scx, scy, scz, srad, pnx, pny, pnz, pd,
             mar, mag, mab, mer, meg, meb, mior) = tabs

            t = jnp.zeros((1, BR), jnp.float32)
            wnx = jnp.zeros((1, BR), jnp.float32)
            wny = jnp.zeros((1, BR), jnp.float32)
            wnz = jnp.zeros((1, BR), jnp.float32)

            if meta["has_tri"]:
                v0x, v0y, v0z = sel(tri_oh, tv0x), sel(tri_oh, tv0y), sel(tri_oh, tv0z)
                v1x, v1y, v1z = sel(tri_oh, tv1x), sel(tri_oh, tv1y), sel(tri_oh, tv1z)
                v2x, v2y, v2z = sel(tri_oh, tv2x), sel(tri_oh, tv2y), sel(tri_oh, tv2z)
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
                cx, cy, cz = sel(sph_oh, scx), sel(sph_oh, scy), sel(sph_oh, scz)
                r = sel(sph_oh, srad)
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
                nx, ny, nz = sel(pln_oh, pnx), sel(pln_oh, pny), sel(pln_oh, pnz)
                doff = sel(pln_oh, pd)
                dn = dx * nx + dy * ny + dz * nz
                t_p = _safe_div(doff - (ox * nx + oy * ny + oz * nz), dn)
                t = jnp.where(m_pln, jnp.clip(t_p, -1e6, 1e6), t)
                wnx = jnp.where(m_pln, nx, wnx)
                wny = jnp.where(m_pln, ny, wny)
                wnz = jnp.where(m_pln, nz, wnz)

            # sky on miss (result is additive: return the increment)
            sky_t = dy * 0.5 + 0.5
            ra = jnp.where(
                miss_now, cr + tr * (_WHITE[0] + (_BLUE[0] - _WHITE[0]) * sky_t), 0.0
            )
            ga = jnp.where(
                miss_now, cg + tg * (_WHITE[1] + (_BLUE[1] - _WHITE[1]) * sky_t), 0.0
            )
            ba = jnp.where(
                miss_now, cb + tb * (_WHITE[2] + (_BLUE[2] - _WHITE[2]) * sky_t), 0.0
            )

            alb_r, alb_g, alb_b = sel(mat_oh, mar), sel(mat_oh, mag), sel(mat_oh, mab)
            em_r, em_g, em_b = sel(mat_oh, mer), sel(mat_oh, meg), sel(mat_oh, meb)
            ior = sel(mat_oh, mior)

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
            refl = jax.lax.stop_gradient((cos_out_sqr <= 0.0) | (rw < f_refl))
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

        primals = tuple(r[0] for r in
                        (ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                         tr_ref, tg_ref, tb_ref, cr_ref, cg_ref, cb_ref)
                        ) + tuple(r[...] for r in difftab)
        _, pullback = jax.vjp(f, *primals)
        cots = pullback(tuple(g[0] for g in gin))

        for ref, val in zip(gout_rows, cots[:12]):
            ref[0] = val

        @pl.when(pl.program_id(0) == 0)
        def _init():
            for r in gtab_refs:
                r[...] = jnp.zeros(r.shape, r.dtype)

        for r, val in zip(gtab_refs, cots[12:]):
            r[...] = r[...] + val

    return kernel


@functools.partial(
    jax.jit, static_argnames=("meta_key", "salt", "interpret")
)
def _bwd_bounce_call(frame, tables, srows, cots, meta_key, salt, interpret):
    """One bounce's pullback.  srows: 16 row arrays (pix, state 12, act, fam,
    idx); cots: 15 cotangent rows.  Returns 12 new cotangent rows + 24 scene-
    table gradient columns."""
    meta = dict(meta_key)
    n_tiles = srows[1].shape[0]
    kern = make_bwd_kernel(meta, salt)

    def tab_spec(v):
        return pl.BlockSpec(v.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)

    row = pl.BlockSpec((1, 1, BR), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out_shapes = tuple(
        jax.ShapeDtypeStruct((n_tiles, 1, BR), jnp.float32) for _ in range(12)
    ) + tuple(jax.ShapeDtypeStruct(t.shape, jnp.float32) for t in tables[:24])
    out_specs = tuple([row] * 12) + tuple(tab_spec(t) for t in tables[:24])
    return pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [tab_spec(v) for v in tables]
        + [row] * 31,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(frame.reshape(1), *tables, *srows, *cots)


def kajiya_bwd_pallas(scene, pix_row, frame, states, fam_rows, idx_rows,
                      act_final_row, g_rows, salt_base: int, style: str,
                      interpret: bool = False):
    """Full-chain pullback.

    states: per-bounce tuples of 13 input rows (o 3, d 3, thr 3, col 3, act),
    as saved by MegakernelRenderer.trace(collect_states=True);
    fam_rows/idx_rows: per-bounce i32 hit-record rows; g_rows: (gr, gg, gb)
    cotangent rows of the radiance output.  Returns (g_tables 24-tuple,
    (g_ox, g_oy, g_oz), (g_dx, g_dy, g_dz)) — table grads in DIFF_FIELDS
    order, ray grads as rows.
    """
    diff, nondiff, meta = pack_scene_raw(scene)
    tables = diff + nondiff
    meta_key = tuple(sorted(meta.items()))
    frame = jnp.asarray(frame, jnp.uint32)
    nbounce = len(states)

    zero = jnp.zeros_like(g_rows[0])
    gox = goy = goz = gdx = gdy = gdz = zero
    gtr = gtg = gtb = zero
    if style == "standard":
        # result += active_final * col_final at the end of the chain.
        af = act_final_row > 0.0
        gcr = jnp.where(af, g_rows[0], 0.0)
        gcg = jnp.where(af, g_rows[1], 0.0)
        gcb = jnp.where(af, g_rows[2], 0.0)
    else:
        gcr = gcg = gcb = zero
    gtabs = None

    for b in reversed(range(nbounce)):
        o3d3thr3col3, act = states[b][:12], states[b][12]
        srows = (pix_row,) + tuple(o3d3thr3col3) + (act, fam_rows[b], idx_rows[b])
        cots = (gox, goy, goz, gdx, gdy, gdz, gtr, gtg, gtb, gcr, gcg, gcb,
                g_rows[0], g_rows[1], g_rows[2])
        outs = _bwd_bounce_call(
            frame, tables, srows, cots, meta_key,
            int(salt_base) + b * 4, interpret,
        )
        (gox, goy, goz, gdx, gdy, gdz, gtr, gtg, gtb, gcr, gcg, gcb) = outs[:12]
        step_tabs = outs[12:]
        gtabs = step_tabs if gtabs is None else tuple(
            a + s for a, s in zip(gtabs, step_tabs)
        )

    return gtabs, (gox, goy, goz), (gdx, gdy, gdz)


def scene_grads_from_tables(scene, gtabs):
    """Unpad the 24 [rows,1] table-gradient columns back into scene-shaped
    leaf gradients: dict with tri_v0/tri_v1/tri_v2 [T,3], sph_center [S,3],
    sph_radius [S], pln_normal [P,3], pln_d [P], albedo [M,3], emission [M,3],
    ior [M]."""
    g = {k: v[:, 0] for k, v in zip(DIFF_FIELDS, gtabs)}
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
