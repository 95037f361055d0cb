import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rvpt_tpu.core.types import Ray
from rvpt_tpu.ops import intersect as I
from rvpt_tpu.scene.scene import SceneBuilder

INF = np.inf


def make_rays(o_list, d_list):
    return jnp.asarray(o_list, jnp.float32), jnp.asarray(d_list, jnp.float32)


def numpy_tri_oracle(o, d, v0, v1, v2, mint, maxt):
    """Independent NumPy implementation (3x3 solve, the reference's 'slow'
    variant intersection.glsl:170-215) used as cross-check oracle."""
    n_rays, n_tri = o.shape[0], v0.shape[0]
    t_best = np.full(n_rays, INF)
    i_best = np.full(n_rays, -1, np.int64)
    for i in range(n_rays):
        for j in range(n_tri):
            A = np.stack([d[i], v1[j] - v0[j], v2[j] - v0[j]], axis=1)
            try:
                sol = np.linalg.solve(A, o[i] - v0[j])
            except np.linalg.LinAlgError:
                continue
            t, u, v = -sol[0], sol[1], sol[2]
            if mint < t < maxt and 0 < u and 0 < v and u + v < 1 and t < t_best[i]:
                t_best[i], i_best[i] = t, j
    return t_best, i_best


def random_tris(n, seed):
    r = np.random.default_rng(seed)
    v0 = r.uniform(-2, 2, (n, 3)).astype(np.float32)
    v1 = v0 + r.uniform(-1, 1, (n, 3)).astype(np.float32)
    v2 = v0 + r.uniform(-1, 1, (n, 3)).astype(np.float32)
    return v0, v1, v2


def test_triangle_basic():
    o, d = make_rays([[0, 0, 0]], [[0, 0, 1]])
    v0 = jnp.array([[-1.0, -1.0, 5.0]])
    v1 = jnp.array([[1.0, -1.0, 5.0]])
    v2 = jnp.array([[0.0, 1.0, 5.0]])
    t, idx = I.closest_hit_triangles(o, d, v0, v1, v2, 0.0, INF)
    assert np.allclose(t, [5.0], atol=1e-5)
    assert idx[0] == 0


def test_triangle_miss_and_backface():
    o, d = make_rays([[5, 5, 0], [0, 0, 10]], [[0, 0, 1], [0, 0, 1]])
    v0 = jnp.array([[-1.0, -1.0, 5.0]])
    v1 = jnp.array([[1.0, -1.0, 5.0]])
    v2 = jnp.array([[0.0, 1.0, 5.0]])
    t, idx = I.closest_hit_triangles(o, d, v0, v1, v2, 0.0, INF)
    assert not np.isfinite(t[0]) and idx[0] == -1
    # behind the origin -> no hit
    assert not np.isfinite(t[1]) and idx[1] == -1


def test_triangle_vs_numpy_oracle():
    r = np.random.default_rng(7)
    v0, v1, v2 = random_tris(50, 3)
    o = r.uniform(-3, 3, (64, 3)).astype(np.float32)
    d = r.normal(size=(64, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    t_ref, i_ref = numpy_tri_oracle(o, d, v0, v1, v2, 1e-3, 1e9)
    t, idx = I.closest_hit_triangles(
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(v0), jnp.asarray(v1),
        jnp.asarray(v2), 1e-3, 1e9
    )
    hit_ref = np.isfinite(t_ref)
    assert np.array_equal(np.asarray(idx) >= 0, hit_ref)
    # fp32 metric-tensor vs fp32 LU solve diverge on sliver triangles; the
    # discrete outcomes (hit flags, winning index) must still agree exactly.
    assert np.allclose(np.asarray(t)[hit_ref], t_ref[hit_ref], rtol=2e-2, atol=2e-4)
    assert np.array_equal(np.asarray(idx)[hit_ref], i_ref[hit_ref])


def test_triangle_chunked_matches_unchunked():
    r = np.random.default_rng(11)
    v0, v1, v2 = random_tris(300, 5)
    o = r.uniform(-3, 3, (32, 3)).astype(np.float32)
    d = r.normal(size=(32, 3)).astype(np.float32)
    args = (jnp.asarray(o), jnp.asarray(d), jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2), 0.0, INF)
    t1, i1 = I.closest_hit_triangles(*args, tri_chunk=4096)
    t2, i2 = I.closest_hit_triangles(*args, tri_chunk=64)
    # XLA fuses the mul/add chains differently for different chunk widths
    # (fma reassociation), so values agree only to ~1e-5 relative.
    assert np.array_equal(np.asarray(i1) >= 0, np.asarray(i2) >= 0)
    hit = np.asarray(i1) >= 0
    assert np.allclose(np.asarray(t1)[hit], np.asarray(t2)[hit], rtol=1e-4, atol=1e-6)
    same = np.asarray(i1) == np.asarray(i2)
    # indices may differ only on fp near-ties; demand 90%+ agreement
    assert same[hit].mean() > 0.9


def test_sphere():
    o, d = make_rays([[0, 0, 0], [0, 0, 2.5]], [[0, 0, 1], [0, 0, 1]])
    c = jnp.array([[0.0, 0.0, 3.0]])
    r = jnp.array([0.5])
    t, idx = I.closest_hit_spheres(o, d, c, r, 1e-3, INF)
    assert np.allclose(t, [2.5, 1.0], atol=1e-5)  # outside hit & inside-exit hit
    assert np.array_equal(idx, [0, 0])


def test_plane():
    o, d = make_rays([[0, 2, 0]], [[0, -1, 0]])
    n = jnp.array([[0.0, 1.0, 0.0]])
    d_off = jnp.array([-1.0])
    t, idx = I.closest_hit_planes(o, d, n, d_off, 0.0, INF)
    assert np.allclose(t, [3.0], atol=1e-6)


def test_aabb():
    o = jnp.array([[0.0, 0.0, -5.0], [3.0, 0.0, -5.0]])
    d = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    hit = I.intersect_aabb(o, d, jnp.array([-1.0, -1.0, -1.0]), jnp.array([1.0, 1.0, 1.0]), 0.0, INF)
    assert bool(hit[0]) and not bool(hit[1])


def test_aabb_ray_inside():
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[1.0, 0.0, 0.0]])
    hit = I.intersect_aabb(o, d, jnp.array([-1.0, -1.0, -1.0]), jnp.array([1.0, 1.0, 1.0]), 0.0, INF)
    assert bool(hit[0])


def _scene():
    b = SceneBuilder()
    m = b.add_material(albedo=(1, 1, 1))
    m2 = b.add_material(albedo=(1, 0, 0))
    b.add_plane((0, 1, 0), -1.0, m)
    b.add_sphere((0, 0, 4), 1.0, m2)
    b.add_triangle((-1, -1, 2), (1, -1, 2), (0, 1, 2), m2)
    return b.build()


def test_scene_closest_family_select():
    scene = _scene()
    o, d = make_rays(
        [[0, 0, 0], [0, 5, 4], [3, 5, 0]],
        [[0, 0, 1], [0, -1, 0], [0, -1, 0]],
    )
    isect = I.intersect_scene(scene, Ray(o, d), 0.0, INF)
    # ray 0 hits the triangle at z=2 before the sphere at z=3
    assert np.allclose(isect.t[0], 2.0, atol=1e-5)
    assert isect.mat[0] == 1
    # ray 1 from above hits the sphere top (t = 5-1 = 4)
    assert np.allclose(isect.t[1], 4.0, atol=1e-4)
    # ray 2 falls to the ground plane y=-1 -> t = 6
    assert np.allclose(isect.t[2], 6.0, atol=1e-5)
    assert np.allclose(isect.normal[2], [0, 1, 0], atol=1e-6)


def test_isect_gradients_vs_fd():
    """d(t)/d(vertex) via autodiff matches finite differences (the north-star
    gradient check, BASELINE.md)."""
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])

    def t_of_dz(dz):
        v0 = jnp.array([[-1.0, -1.0, 5.0 + dz]])
        v1 = jnp.array([[1.0, -1.0, 5.0]])
        v2 = jnp.array([[0.0, 1.0, 5.0]])
        t, _, _, _ = I.triangle_isect_single(o, d, v0, v1, v2)
        return t[0]

    g = jax.grad(t_of_dz)(0.0)
    eps = 1e-3
    fd = (t_of_dz(eps) - t_of_dz(-eps)) / (2 * eps)
    assert np.allclose(g, fd, rtol=1e-3)


def test_occluded():
    scene = _scene()
    o, d = make_rays([[0, 0, 0], [0, 5, 0]], [[0, 0, 1], [0, 1, 0]])
    occ = I.occluded(scene, Ray(o, d), 0.0, INF)
    assert bool(occ[0]) and not bool(occ[1])
