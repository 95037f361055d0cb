"""Hand-paired forward/backward for the Kajiya path tracer.

The north-star requirement (BASELINE.md): forward+backward intersection/
shading at speed-of-light.  Autodiff through the XLA integrator spends most
of its time re-searching primitives in the rematerialized backward.  This
module pairs:

  forward   = the fused whole-path Pallas kernel (ops.pathkernel), which
              also emits the per-bounce hit records (family, index) and
              bounce-input states;
  backward  = reverse-mode AD of an XLA *replay from hits*: the same bounce
              chain with every closest-hit search replaced by the O(N)
              differentiable rebuild of the recorded winner
              (ops.intersect.isect_from_hit) — no [rays x prims] work at all.

This is the "hand-derived backward through the intersection and shading
chain": the discrete search is computed once (forward, fused kernel), and the
differentiable chain is replayed exactly, reusing identical RNG streams.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.math import normalize
from ..core.types import Ray
from ..models import brdf
from ..models.integrators import _bounce_rands, _flat_scan, _sky
from ..scene.materials import gather
from .intersect import isect_from_hit
from .pathkernel import PathTracer


def kajiya_from_hits(scene, ray, pixel, frame, salt_base, fams, idxs,
                     style="reference"):
    """Differentiable replay of a Kajiya trace given per-bounce hit records.

    fams/idxs: i32[B, N] hit records (PathTracer.hits_from_record).
    Returns radiance f32[N, 3].  Matches the path kernel's output up to fma
    rounding, but is fully differentiable w.r.t. scene and rays.
    """
    n = ray.origin.shape[0]
    nbounce = fams.shape[0]

    def step(carry, x):
        o, d, col, thr, active, result = carry
        fam, idx, bounce = x
        isect = isect_from_hit(scene, Ray(o, d), fam, idx, mint=0.0)
        hit = fam >= 0
        miss_now = active & ~hit
        sky = _sky(d, half_shift=True)
        result = result + jnp.where(miss_now[:, None], col + thr * sky, 0.0)
        active = active & hit

        mat = gather(scene.materials, isect.mat)
        col = col + jnp.where(active[:, None], thr * mat.emission, 0.0)

        dir_in = normalize(d)
        u, v, w = _bounce_rands(pixel, frame, salt_base, bounce)
        pos_out, dir_out, fac = brdf.shade_and_scatter(
            isect.pos, isect.normal, dir_in, mat, u, v, w
        )
        thr = jnp.where(active[:, None], thr * fac, thr)
        o = jnp.where(active[:, None], pos_out, o)
        d = jnp.where(active[:, None], dir_out, d)
        return (o, d, col, thr, active, result), None

    init = (
        ray.origin,
        ray.direction,
        jnp.zeros((n, 3), jnp.float32),
        jnp.ones((n, 3), jnp.float32),
        jnp.ones((n,), bool),
        jnp.zeros((n, 3), jnp.float32),
    )
    (o, d, col, thr, active, result), _ = _flat_scan(
        step, init, (fams, idxs, jnp.arange(nbounce, dtype=jnp.uint32))
    )
    if style == "standard":
        result = result + jnp.where(active[:, None], col, 0.0)
    return result


def make_fast_kajiya(scene_template, salt_base: int, max_bounces: int,
                     style: str = "reference", interpret: bool = False,
                     backward: str = "auto"):
    """Build the custom-VJP Kajiya trace for scenes with this template's
    static shape.  Returns trace(scene, origin, direction, pixel, frame)
    -> radiance f32[N,3].

    ``backward`` selects the pullback implementation:
      - "pallas": fully-fused whole-chain Pallas pullback (ops.pathkernel
        .bwd_path) — in-kernel vjp of the replay chain, scene grads as masked
        sublane+lane reductions; the fast path for kernel-scale scenes.
      - "soa": XLA reverse-AD of the component-SoA replay (ops.replay_soa).
      - "auto": "pallas" when every scene table fits the kernel's one-hot
        select width, else "soa".
    """
    from .pathkernel import BigMeshTracer, is_bigmesh

    bigmesh = is_bigmesh(scene_template)
    if backward == "auto":
        backward = ("soa" if bigmesh
                    else "pallas" if scene_template.num_triangles <= 1024
                    else "soa")
    if backward == "pallas":
        return _make_fast_kajiya_pk(
            scene_template, salt_base, max_bounces, style, interpret
        )

    def _fwd_trace(scene, origin, direction, pixel, frame, salt):
        if bigmesh:
            # Chunked per-bounce kernel forward; hit records come straight
            # from its collect outputs (fams/idxs already [B, N]).
            # Single-chunk scenes skip the wavefront sorts: at 1,282 tris
            # the sorts are runtime-NEUTRAL for the gradient path (walk
            # penalty ~= sort cost + record unsorts saved) while each
            # sort instance costs ~240 s of XLA compile (round-5 sort
            # diagnosis) — sort-free, the mesh-gradient forward compiles
            # in ~15 s instead of ~250 s, which is the iteration-latency
            # fix for the inverse-rendering workflow (VERDICT r4 item 3).
            bt = BigMeshTracer(scene)
            (r, g, b), (fams, idxs) = bt.trace(
                pixel, origin, direction, frame,
                jnp.asarray(salt, jnp.uint32) + jnp.uint32(salt_base),
                max_bounces, style=style, interpret=interpret,
                collect_hits=True,
                sort_rays=bt.meta["n_chunks"] > 1,
            )
            return jnp.stack([r, g, b], axis=-1), fams, idxs
        pt = PathTracer(scene)
        (r, g, b), record = pt.trace(
            pixel, origin, direction, frame,
            jnp.asarray(salt, jnp.uint32) + jnp.uint32(salt_base),
            max_bounces, style=style, interpret=interpret,
            collect_states=True,
        )
        fams, idxs = pt.hits_from_record(record, pixel.shape[0], max_bounces)
        return jnp.stack([r, g, b], axis=-1), fams, idxs

    @jax.custom_vjp
    def trace6(scene, origin, direction, pixel, frame, salt):
        out, _, _ = _fwd_trace(scene, origin, direction, pixel, frame, salt)
        return out

    def fwd(scene, origin, direction, pixel, frame, salt):
        out, fams, idxs = _fwd_trace(
            scene, origin, direction, pixel, frame, salt
        )
        return out, (scene, origin, direction, pixel, frame, salt, fams, idxs)

    def bwd(res, g):
        scene, origin, direction, pixel, frame, salt, fams, idxs = res
        from .replay_soa import kajiya_replay_soa

        def replay(scene, o, d):
            return kajiya_replay_soa(
                scene, o, d, pixel, frame,
                jnp.asarray(salt, jnp.uint32) + jnp.uint32(salt_base),
                fams, idxs, style,
            )

        _, vjp_fn = jax.vjp(replay, scene, origin, direction)
        g_scene, g_o, g_d = vjp_fn(g)
        f0 = jax.dtypes.float0
        return (
            g_scene,
            g_o,
            g_d,
            np.zeros(pixel.shape, f0),
            np.zeros(frame.shape, f0),
            np.zeros(jnp.shape(salt), f0),
        )

    trace6.defvjp(fwd, bwd)

    def trace(scene, origin, direction, pixel, frame, salt=0):
        return trace6(scene, origin, direction, pixel, frame,
                      jnp.asarray(salt, jnp.uint32))

    return trace


def _zero_cotangent(x):
    """Zero cotangent leaf: zeros for inexact dtypes, float0 for discrete."""
    if jnp.issubdtype(jnp.result_type(x), jnp.inexact):
        return jnp.zeros_like(x)
    return np.zeros(jnp.shape(x), jax.dtypes.float0)


def _make_fast_kajiya_pk(scene_template, salt_base: int, max_bounces: int,
                         style: str, interpret: bool):
    """Custom-VJP trace whose backward is the fused Pallas pullback."""
    import dataclasses

    from .pathkernel import (PathTracer, _from_tiles, _to_tiles, bwd_path,
                             scene_grads_from_tables)

    def _fwd_trace(scene, origin, direction, pixel, frame, salt):
        pt = PathTracer(scene)
        (r, g, b), record = pt.trace(
            pixel, origin, direction, frame,
            jnp.asarray(salt, jnp.uint32) + jnp.uint32(salt_base),
            max_bounces, style=style, interpret=interpret,
            collect_states=True,
        )
        return jnp.stack([r, g, b], axis=-1), record

    @jax.custom_vjp
    def trace6(scene, origin, direction, pixel, frame, salt):
        out, _ = _fwd_trace(scene, origin, direction, pixel, frame, salt)
        return out

    def fwd(scene, origin, direction, pixel, frame, salt):
        out, record = _fwd_trace(scene, origin, direction, pixel, frame, salt)
        return out, (scene, record, frame, salt)

    def bwd(res, g):
        scene, record, frame, salt = res
        n = g.shape[0]
        g_rows = tuple(_to_tiles(g[:, k]) for k in range(3))
        gtabs, go, gd = bwd_path(
            scene, record, frame, g_rows,
            jnp.asarray(salt, jnp.uint32) + jnp.uint32(salt_base), style,
            interpret=interpret,
        )
        grads = scene_grads_from_tables(scene, gtabs)
        g_scene = jax.tree.map(_zero_cotangent, scene)
        g_scene = dataclasses.replace(
            g_scene,
            tri_v0=grads["tri_v0"], tri_v1=grads["tri_v1"],
            tri_v2=grads["tri_v2"],
            sph_center=grads["sph_center"], sph_radius=grads["sph_radius"],
            pln_normal=grads["pln_normal"], pln_d=grads["pln_d"],
            materials=dataclasses.replace(
                g_scene.materials,
                albedo=grads["albedo"], emission=grads["emission"],
                ior=grads["ior"],
            ),
        )

        def unrow(rows):
            return jnp.stack([_from_tiles(r, n) for r in rows], axis=-1)

        f0 = jax.dtypes.float0
        return (
            g_scene,
            unrow(go),
            unrow(gd),
            np.zeros((n,), f0),
            np.zeros(jnp.shape(frame), f0),
            np.zeros(jnp.shape(salt), f0),
        )

    trace6.defvjp(fwd, bwd)

    def trace(scene, origin, direction, pixel, frame, salt=0):
        """salt: extra traced u32 RNG-stream offset (e.g. per spp rank),
        added to the static salt_base."""
        return trace6(scene, origin, direction, pixel, frame,
                      jnp.asarray(salt, jnp.uint32))

    return trace
