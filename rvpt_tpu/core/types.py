"""Shared device-side data types (the pytree analog of the reference's
assets/shaders/structs.glsl)."""

from __future__ import annotations

import jax.numpy as jnp

from ..pytree import pytree_dataclass


@pytree_dataclass
class Ray:
    """A batch of rays, SoA: ``origin`` and ``direction`` are f32[..., 3]."""

    origin: jnp.ndarray
    direction: jnp.ndarray

    def at(self, t: jnp.ndarray) -> jnp.ndarray:
        return self.origin + t[..., None] * self.direction


@pytree_dataclass
class Isect:
    """Batched intersection record (reference: assets/shaders/intersection.glsl:59-72).

    ``t`` is +inf for misses.  ``prim`` is the flat primitive id (see
    ops.intersect for the id-space layout across triangles/spheres/planes) and
    ``mat`` the material index; both are -1/stop-gradient discrete outputs.
    """

    t: jnp.ndarray  # f32[N]
    pos: jnp.ndarray  # f32[N,3]
    normal: jnp.ndarray  # f32[N,3] (unnormalized geometric normal)
    uv: jnp.ndarray  # f32[N,2]
    prim: jnp.ndarray  # i32[N]
    mat: jnp.ndarray  # i32[N]

    @property
    def hit(self) -> jnp.ndarray:
        return jnp.isfinite(self.t)
