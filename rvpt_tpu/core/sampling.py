"""Sample mappings from [0,1)^k to spheres/hemispheres/balls.

Same closed-form inverse-transform mappings as the reference
(assets/shaders/samples_mapping.glsl:39-187), vectorized over leading batch
dims.  These are reparameterization-friendly: each output is a smooth function
of the uniforms, so gradients flow through scattered directions when the
uniforms are treated as constants (detached noise).
"""

from __future__ import annotations

import jax.numpy as jnp

from .math import TWO_PI, hemisphere_around_normal, vdot


def map_uniform_sphere(u, v):
    """[0,1)^2 -> uniform density on the unit sphere
    (reference: samples_mapping.glsl:39-60)."""
    phi = TWO_PI * u
    cos_theta = 1.0 - 2.0 * v
    sin_theta = jnp.sqrt(jnp.maximum(1e-12, 1.0 - cos_theta * cos_theta))
    return jnp.stack(
        [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta], axis=-1
    )


def map_uniform_hemisphere_simple(u, v, n):
    """Uniform hemisphere around ``n`` by sphere-sample sign flip
    (reference: samples_mapping.glsl:64-80)."""
    p = map_uniform_sphere(u, v)
    flip = vdot(n, p) < 0.0
    return jnp.where(flip[..., None], -p, p)


def map_uniform_hemisphere(u, v, n):
    """Uniform hemisphere around ``n`` via an explicit orthonormal basis
    (reference: samples_mapping.glsl:84-108)."""
    phi = TWO_PI * u
    cos_theta = v
    sin_theta = jnp.sqrt(jnp.maximum(1e-12, 1.0 - cos_theta * cos_theta))
    return hemisphere_around_normal(phi, cos_theta, sin_theta, n)


def map_cosine_hemisphere_simple(u, v, n):
    """Cosine-weighted hemisphere by offsetting a sphere sample with the
    normal; output is NOT normalized, exactly like the reference
    (samples_mapping.glsl:112-131, "lambert no tangent" trick)."""
    return n + map_uniform_sphere(u, v)


def map_cosine_hemisphere(u, v, n):
    """Cosine-weighted hemisphere via inverse-transform sampling in an ONB
    (reference: samples_mapping.glsl:135-159)."""
    phi = TWO_PI * u
    cos_theta = jnp.sqrt(jnp.maximum(1e-12, 1.0 - v))
    sin_theta = jnp.sqrt(jnp.maximum(1e-12, v))
    return hemisphere_around_normal(phi, cos_theta, sin_theta, n)


def map_uniform_ball(u, v, w):
    """[0,1)^3 -> uniform density inside the unit ball
    (reference: samples_mapping.glsl:163-187)."""
    phi = TWO_PI * u
    cos_theta = 1.0 - 2.0 * v
    sin_theta = jnp.sqrt(jnp.maximum(1e-12, 1.0 - cos_theta * cos_theta))
    r = jnp.cbrt(w)
    return r[..., None] * jnp.stack(
        [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta], axis=-1
    )
