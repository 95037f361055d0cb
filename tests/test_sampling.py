import jax.numpy as jnp
import numpy as np

from rvpt_tpu.core import rng, sampling
from rvpt_tpu.core.math import vdot

N = 200_000


def uv(seed=0):
    p = jnp.arange(N, dtype=jnp.uint32)
    u, v, w = rng.uniform3(p, seed, 0)
    return u, v, w


def test_uniform_sphere():
    u, v, _ = uv()
    p = sampling.map_uniform_sphere(u, v)
    assert np.allclose(np.linalg.norm(np.asarray(p), axis=-1), 1.0, atol=1e-5)
    # uniform: mean ~ 0, each coordinate variance 1/3
    assert np.all(np.abs(np.asarray(p).mean(axis=0)) < 0.01)
    assert np.allclose(np.asarray(p).var(axis=0), 1.0 / 3.0, atol=0.01)


def test_uniform_hemisphere_both_variants():
    n = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (N, 1))
    u, v, _ = uv(1)
    for fn in (sampling.map_uniform_hemisphere, sampling.map_uniform_hemisphere_simple):
        p = fn(u, v, n)
        cos = np.asarray(vdot(p, n))
        assert cos.min() >= -1e-6
        # E[cos theta] = 1/2 for uniform hemisphere
        assert abs(cos.mean() - 0.5) < 0.01


def test_cosine_hemisphere():
    n = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (N, 1))
    u, v, _ = uv(2)
    p = sampling.map_cosine_hemisphere(u, v, n)
    cos = np.asarray(vdot(p, n))
    assert cos.min() >= -1e-6
    # E[cos theta] = 2/3 under cosine-weighted sampling
    assert abs(cos.mean() - 2.0 / 3.0) < 0.01


def test_cosine_hemisphere_simple_unnormalized():
    """The 'simple' variant (normal + sphere point) is deliberately
    unnormalized (reference: samples_mapping.glsl:112-131) but its direction
    distribution is cosine-weighted."""
    n = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (N, 1))
    u, v, _ = uv(3)
    p = sampling.map_cosine_hemisphere_simple(u, v, n)
    pn = np.asarray(p) / np.linalg.norm(np.asarray(p), axis=-1, keepdims=True)
    assert abs(pn[:, 2].mean() - 2.0 / 3.0) < 0.01


def test_uniform_ball():
    u, v, w = uv(4)
    p = np.asarray(sampling.map_uniform_ball(u, v, w))
    r = np.linalg.norm(p, axis=-1)
    assert r.max() <= 1.0 + 1e-5
    # E[r] = 3/4 for a uniform ball
    assert abs(r.mean() - 0.75) < 0.01


def test_tilted_normal():
    n_single = jnp.array([0.6, -0.64, 0.48])
    n_single = n_single / jnp.linalg.norm(n_single)
    n = jnp.tile(n_single[None, :], (N, 1))
    u, v, _ = uv(5)
    p = sampling.map_cosine_hemisphere(u, v, n)
    cos = np.asarray(vdot(p, n))
    assert cos.min() >= -1e-5
    assert abs(cos.mean() - 2.0 / 3.0) < 0.01
