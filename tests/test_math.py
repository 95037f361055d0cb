import jax.numpy as jnp
import numpy as np
import pytest

from rvpt_tpu.core import math as M


def rand_unit(n, seed=0):
    r = np.random.default_rng(seed)
    v = r.normal(size=(n, 3)).astype(np.float32)
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def test_dot_cross_norm():
    a = jnp.array([[1.0, 2.0, 3.0]])
    b = jnp.array([[4.0, -5.0, 6.0]])
    assert np.allclose(M.vdot(a, b), [12.0])
    assert np.allclose(M.cross(a, b), np.cross(a, b))
    assert np.allclose(M.length(a), np.sqrt(14.0))
    n = M.normalize(a)
    assert np.allclose(M.length(n), 1.0, atol=1e-6)


def test_normalize_zero_guard():
    z = jnp.zeros((2, 3))
    assert np.allclose(M.normalize(z), 0.0)


def test_orthonormal_basis():
    n = jnp.asarray(rand_unit(256))
    e0, e1 = M.orthonormal_basis(n)
    assert np.allclose(M.vdot(e0, e1), 0.0, atol=1e-5)
    assert np.allclose(M.vdot(e0, n), 0.0, atol=1e-5)
    assert np.allclose(M.vdot(e1, n), 0.0, atol=1e-5)
    assert np.allclose(M.length(e0), 1.0, atol=1e-5)
    assert np.allclose(M.length(e1), 1.0, atol=1e-5)
    # right-handed: e0 x e1 == n
    assert np.allclose(M.cross(e0, e1), n, atol=1e-5)


def test_reflect():
    d = jnp.array([[1.0, -1.0, 0.0]])
    n = jnp.array([[0.0, 1.0, 0.0]])
    r = M.reflect(d, n)
    assert np.allclose(r, [[1.0, 1.0, 0.0]], atol=1e-6)


def test_refract_straight_through():
    d = jnp.array([[0.0, -1.0, 0.0]])
    n = jnp.array([[0.0, 1.0, 0.0]])
    r = M.refract(d, n, jnp.array([1.0]))
    assert np.allclose(r, d, atol=1e-6)


def test_refract_tir():
    # Grazing ray from dense medium: eta > 1 triggers TIR -> zero vector
    d = jnp.array([[0.99, -0.14106736, 0.0]])
    n = jnp.array([[0.0, 1.0, 0.0]])
    r = M.refract(d, n, jnp.array([1.5]))
    assert np.allclose(r, 0.0)


def test_refract_snell():
    # 45 degrees incidence air->glass (eta = 1/1.5)
    s = np.sin(np.pi / 4)
    d = jnp.array([[s, -s, 0.0]])
    n = jnp.array([[0.0, 1.0, 0.0]])
    eta = 1.0 / 1.5
    r = np.asarray(M.refract(d, n, jnp.array([eta])))[0]
    sin_out = r[0] / np.linalg.norm(r)
    assert np.allclose(sin_out, eta * s, atol=1e-6)


def test_spherical_roundtrip():
    phi, theta = 1.1, 0.7
    v = M.unit_spherical_to_cartesian(jnp.array(phi), jnp.array(theta))
    assert np.allclose(np.linalg.norm(v), 1.0, atol=1e-6)
    assert np.allclose(v[2], np.cos(theta), atol=1e-6)
    v2 = M.spherical_to_cartesian(jnp.array(2.0), jnp.array(phi), jnp.array(theta))
    assert np.allclose(v2, 2.0 * np.asarray(v), atol=1e-6)


def test_mix_extrapolates():
    assert np.allclose(M.mix(0.0, 1.0, 1.5), 1.5)
