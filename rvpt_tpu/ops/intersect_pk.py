"""Pallas TPU kernel: fused brute-force closest-hit.

The pure-XLA path (ops.intersect) materializes [rays, tris] intermediates in
HBM between the matmuls and the masked min-reduction.  This kernel fuses the
whole pairwise test: a tile of rays lives in VMEM registers, the packed
triangle SoA sits in VMEM, and the [BR, BT] pairwise tile never leaves the
VPU — the running (t, index) carry is the only per-ray state.  This is the
TPU re-design of the reference's per-pixel triangle loop
(assets/shaders/intersection.glsl:708-752 / the BVH leaf loop 387-400).

Layout:
  rays    f32[n_tiles, BR] per component (caller pads N to BR)
  tris    16 x f32[T_pad] precomputed scalars (pack_triangles), whole array
          in VMEM (fine up to ~100k tris; HBM streaming is the follow-up)
  grid    (n_ray_tiles,)
  inner   fori_loop over T_pad/BT triangle chunks

Outputs (t f32[N], idx i32[N]) exactly matching ops.intersect's brute force
(same formula, same first-min tie-breaking).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect import triangle_precompute

BR = 512  # rays per program instance
BT = 512  # triangles per inner chunk

_INF = float("inf")
_DENOM_EPS = 1e-30  # python floats: jnp scalars would be captured consts in the kernel

# Packed triangle field order (all f32[T]):
FIELDS = (
    "nx", "ny", "nz",
    "e0x", "e0y", "e0z",
    "e1x", "e1y", "e1z",
    "v0n", "v0e0", "v0e1",
    "g00", "g11", "g01", "inv_det",
)


def pack_triangles(v0, v1, v2, chunk: int = BT) -> dict:
    """Precompute per-triangle scalars, pad to a chunk multiple.

    Padding rows have a zero normal -> clamped denominator -> huge t -> never
    valid (same trick as the XLA streaming path).
    """
    pre = triangle_precompute(v0, v1, v2)
    t = v0.shape[0]
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
        out[k] = arr.reshape(1, -1)  # [1, T_pad]: TPU-friendly 2D layout
    out["__count__"] = t
    return out


def _kernel(mint, maxt, n_chunks, *refs):
    """One program = BR rays against every triangle chunk."""
    (ox, oy, oz, dx, dy, dz) = refs[:6]
    tri = dict(zip(FIELDS, refs[6:22]))
    t_out, i_out = refs[22], refs[23]

    rox = ox[0, :][:, None]  # [BR,1]
    roy = oy[0, :][:, None]
    roz = oz[0, :][:, None]
    rdx = dx[0, :][:, None]
    rdy = dy[0, :][:, None]
    rdz = dz[0, :][:, None]

    def chunk_body(c, carry):
        t_best, i_best = carry
        sl = pl.ds(c * BT, BT)

        nx = tri["nx"][0, sl][None, :]  # [1,BT]
        ny = tri["ny"][0, sl][None, :]
        nz = tri["nz"][0, sl][None, :]
        e0x = tri["e0x"][0, sl][None, :]
        e0y = tri["e0y"][0, sl][None, :]
        e0z = tri["e0z"][0, sl][None, :]
        e1x = tri["e1x"][0, sl][None, :]
        e1y = tri["e1y"][0, sl][None, :]
        e1z = tri["e1z"][0, sl][None, :]

        dn = rdx * nx + rdy * ny + rdz * nz  # [BR,BT]
        on = rox * nx + roy * ny + roz * nz
        de0 = rdx * e0x + rdy * e0y + rdz * e0z
        de1 = rdx * e1x + rdy * e1y + rdz * e1z
        oe0 = rox * e0x + roy * e0y + roz * e0z
        oe1 = rox * e1x + roy * e1y + roz * e1z

        dn_safe = jnp.where(jnp.abs(dn) < _DENOM_EPS, _DENOM_EPS, dn)
        t = (tri["v0n"][0, sl][None, :] - on) / dn_safe
        b0 = oe0 + t * de0 - tri["v0e0"][0, sl][None, :]
        b1 = oe1 + t * de1 - tri["v0e1"][0, sl][None, :]
        g11 = tri["g11"][0, sl][None, :]
        g01 = tri["g01"][0, sl][None, :]
        g00 = tri["g00"][0, sl][None, :]
        inv_det = tri["inv_det"][0, sl][None, :]
        u = inv_det * (g11 * b0 - g01 * b1)
        v = inv_det * (g00 * b1 - g01 * b0)

        valid = (mint < t) & (t < maxt) & (u > 0.0) & (v > 0.0) & (u + v < 1.0)
        t_masked = jnp.where(valid, t, _INF)

        cmin = jnp.min(t_masked, axis=1)  # [BR]
        cols = jax.lax.broadcasted_iota(jnp.int32, (BR, BT), 1)
        first = jnp.min(
            jnp.where(t_masked == cmin[:, None], cols, jnp.int32(2**30)), axis=1
        )
        better = cmin < t_best
        t_best = jnp.where(better, cmin, t_best)
        i_best = jnp.where(better, c * BT + first, i_best)
        return t_best, i_best

    t0 = jnp.full((BR,), _INF)
    i0 = jnp.full((BR,), -1, jnp.int32)
    t_best, i_best = jax.lax.fori_loop(0, n_chunks, chunk_body, (t0, i0))
    t_out[0, :] = t_best
    i_out[0, :] = i_best


@functools.partial(
    jax.jit, static_argnames=("mint", "maxt", "interpret")
)
def _closest_hit_padded(rays6, packed_vals, mint, maxt, interpret):
    n_tiles = rays6[0].shape[0]
    t_pad = packed_vals[0].shape[1]
    n_chunks = t_pad // BT

    kern = functools.partial(_kernel, float(mint), float(maxt), n_chunks)
    ray_spec = pl.BlockSpec((1, BR), lambda i: (i, 0), memory_space=pltpu.VMEM)
    tri_spec = pl.BlockSpec((1, t_pad), lambda i: (0, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, BR), lambda i: (i, 0), memory_space=pltpu.VMEM)

    t, idx = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[ray_spec] * 6 + [tri_spec] * 16,
        out_specs=(out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((n_tiles, BR), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, BR), jnp.int32),
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
    rays6 = tuple(c.reshape(-1, BR) for c in comps)
    packed_vals = tuple(packed[k] for k in FIELDS)

    t, idx = _closest_hit_padded(
        rays6, packed_vals, float(mint), float(maxt), interpret
    )
    t = t.reshape(-1)[:n]
    idx = idx.reshape(-1)[:n]
    # padding triangles can never win; padding rays are dropped here
    n_real = packed["__count__"]
    miss = ~jnp.isfinite(t) | (idx >= n_real)
    return jnp.where(miss, _INF, t), jnp.where(miss, -1, idx)
