"""Signed-distance utilities + sphere tracing (the Hart debug integrator's
engine; reference: assets/shaders/distance_functions.glsl).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.math import cross, vdot

MARCH_ITER = 32  # reference: compute_pass.comp:10
MARCH_EPS = 0.1  # reference: compute_pass.comp:11


def _dot2(v):
    return vdot(v, v)


def distance_triangle(p, a, b, c):
    """Unsigned distance from points ``p[...,3]`` to triangles ``a,b,c`` with
    matching batch shape (broadcasting allowed).  Inigo Quilez's formulation,
    as used by the reference (distance_functions.glsl:28-61)."""
    ba = b - a
    pa = p - a
    cb = c - b
    pb = p - b
    ac = a - c
    pc = p - c
    nor = cross(ba, ac)

    edge_region = (
        jnp.sign(vdot(cross(ba, nor), pa))
        + jnp.sign(vdot(cross(cb, nor), pb))
        + jnp.sign(vdot(cross(ac, nor), pc))
    ) < 2.0

    def edge_dist(e, q):
        h = jnp.clip(vdot(e, q) / jnp.maximum(_dot2(e), 1e-20), 0.0, 1.0)
        return _dot2(e * h[..., None] - q)

    d_edge = jnp.minimum(
        jnp.minimum(edge_dist(ba, pa), edge_dist(cb, pb)), edge_dist(ac, pc)
    )
    d_face = vdot(nor, pa) ** 2 / jnp.maximum(_dot2(nor), 1e-20)
    return jnp.sqrt(jnp.where(edge_region, d_edge, d_face))


def scene_distance(scene, p, tri_chunk: int = 1024):
    """Min distance from points p[N,3] to all scene triangles -> f32[N]."""
    n_tri = scene.num_triangles
    n = p.shape[0]
    if n_tri == 0:
        return jnp.full((n,), jnp.inf, jnp.float32)
    if n_tri <= tri_chunk:
        d = distance_triangle(
            p[:, None, :],
            scene.tri_v0[None, :, :],
            scene.tri_v1[None, :, :],
            scene.tri_v2[None, :, :],
        )
        return jnp.min(d, axis=1)
    pad = (-n_tri) % tri_chunk
    big = jnp.float32(1e30)
    padv = jnp.full((pad, 3), big)
    v0 = jnp.concatenate([scene.tri_v0, padv]).reshape(-1, tri_chunk, 3)
    v1 = jnp.concatenate([scene.tri_v1, padv]).reshape(-1, tri_chunk, 3)
    v2 = jnp.concatenate([scene.tri_v2, padv]).reshape(-1, tri_chunk, 3)

    def step(best, chunk):
        a, b, c = chunk
        d = distance_triangle(p[:, None, :], a[None], b[None], c[None])
        return jnp.minimum(best, jnp.min(d, axis=1)), None

    best, _ = jax.lax.scan(step, jnp.full((n,), jnp.inf, jnp.float32), (v0, v1, v2))
    return best


def sphere_trace(scene, origin, direction, mint, maxt):
    """Sphere tracing over the scene's triangle SDF
    (reference: distance_functions.glsl:70-116).

    Returns (t[N], radius[N], iters[N] i32) where iters==MARCH_ITER means the
    march never converged (matching the reference's fall-through).
    """
    n = origin.shape[0]
    t0 = jnp.full((n,), jnp.float32(mint))
    p0 = origin + t0[:, None] * direction

    def body(i, state):
        t, p, iters, radius, done = state
        dist = scene_distance(scene, p)
        stop = (dist < MARCH_EPS) | (dist > maxt)
        newly_done = (~done) & stop
        iters = jnp.where(newly_done, i, iters)
        radius = jnp.where(done, radius, dist)
        advance = (~done) & (~stop)
        t = jnp.where(advance, t + dist, t)
        p = jnp.where(advance[:, None], p + dist[:, None] * direction, p)
        done = done | stop
        return t, p, iters, radius, done

    init = (
        t0,
        p0,
        jnp.full((n,), MARCH_ITER, jnp.int32),
        jnp.full((n,), jnp.inf, jnp.float32),
        jnp.zeros((n,), bool),
    )
    t, _, iters, radius, done = jax.lax.fori_loop(0, MARCH_ITER, body, init)
    t = jnp.where(done, t, jnp.inf)
    return t, radius, iters
