"""Pallas TPU kernel: fused brute-force closest-hit.

The pure-XLA path (ops.intersect) materializes [rays, tris] intermediates in
HBM between the pairwise math and the masked min-reduction.  This kernel
fuses the whole test so the pairwise tile never leaves VMEM — the running
(t, index) carry is the only per-ray state.  TPU re-design of the
reference's per-pixel triangle loop (assets/shaders/intersection.glsl:708-752
/ the BVH leaf loop 387-400).

Tile layout (VPU-native):
  pairwise tile  f32[BT, BR]  — triangles on the sublane axis (BT mult of 8),
                                rays on the lane axis (BR mult of 128)
  rays           f32[n_tiles, 1, BR] per component; block (1, 1, BR)
  tris           16 x f32[T_pad, 1] precomputed scalars; whole array in VMEM
                 (sublane-major so a chunk slice broadcasts as a column)
  grid           (n_ray_tiles,)
  inner          fori_loop over T_pad/BT triangle chunks

Outputs (t f32[N], idx i32[N]) match ops.intersect's brute force (same
formula, same first-min tie-breaking).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect import triangle_precompute

BR = 1024  # rays per program instance (lane axis, multiple of 128)
BT_MAX = 256  # max triangles per inner chunk (sublane axis)
BT_ALIGN = 8  # sublane alignment

_INF = float("inf")
_DENOM_EPS = 1e-30  # python float: jnp scalars would be captured consts

# Packed triangle field order (all f32[T_pad, 1]):
FIELDS = (
    "nx", "ny", "nz",
    "e0x", "e0y", "e0z",
    "e1x", "e1y", "e1z",
    "v0n", "v0e0", "v0e1",
    "g00", "g11", "g01", "inv_det",
)


def chunk_size(n_tris: int) -> int:
    """Adaptive sublane chunk: small scenes shouldn't pay for a padded 256-row
    tile (at Cornell's 22 triangles that would be 11.6x wasted VPU work)."""
    aligned = -(-n_tris // BT_ALIGN) * BT_ALIGN
    return min(aligned, BT_MAX)


def pack_triangles(v0, v1, v2, chunk: int | None = None) -> dict:
    """Precompute per-triangle scalars, pad to a chunk multiple.

    Padding rows have a zero normal -> clamped denominator -> huge t -> never
    valid (same trick as the XLA streaming path).
    """
    pre = triangle_precompute(v0, v1, v2)
    t = v0.shape[0]
    if chunk is None:
        chunk = chunk_size(t)
    pad = (-t) % chunk
    fields = {
        "nx": pre["n"][:, 0], "ny": pre["n"][:, 1], "nz": pre["n"][:, 2],
        "e0x": pre["e0"][:, 0], "e0y": pre["e0"][:, 1], "e0z": pre["e0"][:, 2],
        "e1x": pre["e1"][:, 0], "e1y": pre["e1"][:, 1], "e1z": pre["e1"][:, 2],
        "v0n": pre["v0n"], "v0e0": pre["v0e0"], "v0e1": pre["v0e1"],
        "g00": pre["g00"], "g11": pre["g11"], "g01": pre["g01"],
        "inv_det": pre["inv_det"],
    }
    out = {}
    for k in FIELDS:
        arr = jnp.asarray(fields[k], jnp.float32)
        if pad:
            arr = jnp.concatenate([arr, jnp.zeros((pad,), jnp.float32)])
        out[k] = arr.reshape(-1, 1)  # [T_pad, 1]: sublane-major columns
    out["__count__"] = t
    out["__chunk__"] = chunk
    return out


def _kernel(mint, maxt, n_chunks, bt, *refs):
    """One program = BR rays against every triangle chunk."""
    (ox, oy, oz, dx, dy, dz) = refs[:6]
    tri = dict(zip(FIELDS, refs[6:22]))
    t_out, i_out = refs[22], refs[23]

    rox = ox[0]  # [1, BR] rows (lane axis)
    roy = oy[0]
    roz = oz[0]
    rdx = dx[0]
    rdy = dy[0]
    rdz = dz[0]

    def chunk_body(c, carry):
        t_best, i_best = carry
        sl = pl.ds(c * bt, bt)

        def col(name):
            return tri[name][sl, :]  # [BT, 1] column (sublane axis)

        nx, ny, nz = col("nx"), col("ny"), col("nz")
        e0x, e0y, e0z = col("e0x"), col("e0y"), col("e0z")
        e1x, e1y, e1z = col("e1x"), col("e1y"), col("e1z")

        dn = nx * rdx + ny * rdy + nz * rdz  # [BT, BR]
        on = nx * rox + ny * roy + nz * roz
        de0 = e0x * rdx + e0y * rdy + e0z * rdz
        de1 = e1x * rdx + e1y * rdy + e1z * rdz
        oe0 = e0x * rox + e0y * roy + e0z * roz
        oe1 = e1x * rox + e1y * roy + e1z * roz

        dn_safe = jnp.where(jnp.abs(dn) < _DENOM_EPS, _DENOM_EPS, dn)
        t = (col("v0n") - on) / dn_safe
        b0 = oe0 + t * de0 - col("v0e0")
        b1 = oe1 + t * de1 - col("v0e1")
        u = col("inv_det") * (col("g11") * b0 - col("g01") * b1)
        v = col("inv_det") * (col("g00") * b1 - col("g01") * b0)

        valid = (mint < t) & (t < maxt) & (u > 0.0) & (v > 0.0) & (u + v < 1.0)
        t_masked = jnp.where(valid, t, _INF)

        cmin = jnp.min(t_masked, axis=0, keepdims=True)  # [1, BR]
        rows = jax.lax.broadcasted_iota(jnp.int32, (bt, BR), 0)
        first = jnp.min(
            jnp.where(t_masked == cmin, rows, jnp.int32(2**30)),
            axis=0,
            keepdims=True,
        )
        better = cmin < t_best
        t_best = jnp.where(better, cmin, t_best)
        i_best = jnp.where(better, c * bt + first, i_best)
        return t_best, i_best

    t0 = jnp.full((1, BR), _INF, jnp.float32)
    i0 = jnp.full((1, BR), -1, jnp.int32)
    t_best, i_best = jax.lax.fori_loop(0, n_chunks, chunk_body, (t0, i0))
    t_out[0] = t_best
    i_out[0] = i_best


@functools.partial(jax.jit, static_argnames=("mint", "maxt", "interpret", "bt"))
def _closest_hit_padded(rays6, packed_vals, mint, maxt, interpret, bt):
    n_tiles = rays6[0].shape[0]
    t_pad = packed_vals[0].shape[0]
    n_chunks = t_pad // bt

    kern = functools.partial(_kernel, float(mint), float(maxt), n_chunks, bt)
    ray_spec = pl.BlockSpec((1, 1, BR), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    tri_spec = pl.BlockSpec((t_pad, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, 1, BR), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

    t, idx = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[ray_spec] * 6 + [tri_spec] * 16,
        out_specs=(out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((n_tiles, 1, BR), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 1, BR), jnp.int32),
        ),
        interpret=interpret,
    )(*rays6, *packed_vals)
    return t, idx


def closest_hit_pallas(origin, direction, packed: dict, mint, maxt,
                       interpret: bool = False):
    """Fused closest hit: (t[N] f32 — inf on miss, idx[N] i32 — -1 on miss).

    ``packed`` comes from :func:`pack_triangles`.  ``interpret=True`` runs the
    kernel in the Pallas interpreter (CPU test oracle).
    """
    n = origin.shape[0]
    pad = (-n) % BR
    comps = [origin[:, 0], origin[:, 1], origin[:, 2],
             direction[:, 0], direction[:, 1], direction[:, 2]]
    if pad:
        comps = [jnp.concatenate([c, jnp.zeros((pad,), c.dtype)]) for c in comps]
    rays6 = tuple(c.reshape(-1, 1, BR) for c in comps)
    packed_vals = tuple(packed[k] for k in FIELDS)

    t, idx = _closest_hit_padded(
        rays6, packed_vals, float(mint), float(maxt), interpret,
        packed["__chunk__"],
    )
    t = t.reshape(-1)[:n]
    idx = idx.reshape(-1)[:n]
    # padding triangles can never win; padding rays are dropped here
    n_real = packed["__count__"]
    miss = ~jnp.isfinite(t) | (idx >= n_real)
    return jnp.where(miss, jnp.float32(np.inf), t), jnp.where(miss, -1, idx)
