"""Pallas kernel correctness vs the XLA brute force (interpreter mode on the
CPU mesh; the real-TPU path is exercised by bench.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from rvpt_tpu.ops import intersect as I
from rvpt_tpu.ops import intersect_pk as PK


def random_case(n_rays, n_tri, seed):
    r = np.random.default_rng(seed)
    v0 = r.uniform(-3, 3, (n_tri, 3)).astype(np.float32)
    v1 = v0 + r.uniform(-1, 1, (n_tri, 3)).astype(np.float32)
    v2 = v0 + r.uniform(-1, 1, (n_tri, 3)).astype(np.float32)
    o = r.uniform(-4, 4, (n_rays, 3)).astype(np.float32)
    d = r.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return map(jnp.asarray, (o, d, v0, v1, v2))


@pytest.mark.parametrize("n_rays,n_tri", [(37, 5), (512, 300), (700, 600)])
def test_pallas_matches_xla(n_rays, n_tri):
    o, d, v0, v1, v2 = random_case(n_rays, n_tri, seed=n_rays + n_tri)
    t_ref, i_ref = I.closest_hit_triangles(o, d, v0, v1, v2, 1e-3, np.inf)
    packed = PK.pack_triangles(v0, v1, v2)
    t_pk, i_pk = PK.closest_hit_pallas(o, d, packed, 1e-3, np.inf, interpret=True)
    hit = np.asarray(i_ref) >= 0
    assert np.array_equal(hit, np.asarray(i_pk) >= 0)
    assert np.allclose(
        np.asarray(t_pk)[hit], np.asarray(t_ref)[hit], rtol=1e-5, atol=1e-5
    )
    # identical first-min tie-breaking
    assert np.array_equal(np.asarray(i_pk)[hit], np.asarray(i_ref)[hit])


def test_pallas_all_miss_and_empty_pad():
    o = jnp.zeros((8, 3))
    d = jnp.tile(jnp.array([0.0, 1.0, 0.0]), (8, 1))
    v0 = jnp.array([[-1.0, -5.0, 2.0]])
    v1 = jnp.array([[1.0, -5.0, 2.0]])
    v2 = jnp.array([[0.0, -5.0, 4.0]])
    packed = PK.pack_triangles(v0, v1, v2)
    t, idx = PK.closest_hit_pallas(o, d, packed, 0.0, np.inf, interpret=True)
    assert not np.isfinite(np.asarray(t)).any()
    assert (np.asarray(idx) == -1).all()
