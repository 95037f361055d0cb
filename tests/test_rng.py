import jax.numpy as jnp
import numpy as np

from rvpt_tpu.core import rng


def test_deterministic():
    p = jnp.arange(1000, dtype=jnp.uint32)
    a1, b1, c1 = rng.uniform3(p, 7, 3)
    a2, b2, c2 = rng.uniform3(p, 7, 3)
    assert np.array_equal(a1, a2) and np.array_equal(b1, b2) and np.array_equal(c1, c2)


def test_range_and_moments():
    p = jnp.arange(200_000, dtype=jnp.uint32)
    a, b, c = rng.uniform3(p, 0, 0)
    for x in (a, b, c):
        x = np.asarray(x)
        assert x.min() >= 0.0 and x.max() < 1.0
        assert abs(x.mean() - 0.5) < 5e-3
        assert abs(x.var() - 1.0 / 12.0) < 5e-3


def test_streams_decorrelated():
    p = jnp.arange(100_000, dtype=jnp.uint32)
    a, _, _ = rng.uniform3(p, 0, 0)
    b, _, _ = rng.uniform3(p, 0, 1)
    c, _, _ = rng.uniform3(p, 1, 0)
    corr_ab = np.corrcoef(np.asarray(a), np.asarray(b))[0, 1]
    corr_ac = np.corrcoef(np.asarray(a), np.asarray(c))[0, 1]
    assert abs(corr_ab) < 0.01
    assert abs(corr_ac) < 0.01


def test_uniform4():
    p = jnp.arange(10_000, dtype=jnp.uint32)
    a, b, c, d = rng.uniform4(p, 1, 2, 3)
    for x in (a, b, c, d):
        x = np.asarray(x)
        assert x.min() >= 0.0 and x.max() < 1.0
        assert abs(x.mean() - 0.5) < 0.02
