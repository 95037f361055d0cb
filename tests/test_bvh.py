import dataclasses

import jax.numpy as jnp
import numpy as np

from rvpt_tpu.ops import intersect as I
from rvpt_tpu.ops import traverse as T
from rvpt_tpu.scene import bvh as B
from rvpt_tpu.scene import obj_io
from rvpt_tpu.scene.scene import SceneBuilder


def random_mesh_scene(n_tri=200, seed=0, spread=3.0):
    r = np.random.default_rng(seed)
    v0 = r.uniform(-spread, spread, (n_tri, 3)).astype(np.float32)
    v1 = v0 + r.uniform(-0.8, 0.8, (n_tri, 3)).astype(np.float32)
    v2 = v0 + r.uniform(-0.8, 0.8, (n_tri, 3)).astype(np.float32)
    b = SceneBuilder()
    m = b.add_material(albedo=(1, 1, 1))
    for i in range(n_tri):
        b.add_triangle(v0[i], v1[i], v2[i], m)
    return b.build()


def test_build_invariants():
    scene = random_mesh_scene(300, seed=1)
    v0 = np.asarray(scene.tri_v0)
    v1 = np.asarray(scene.tri_v1)
    v2 = np.asarray(scene.tri_v2)
    centers, bmin, bmax = B.triangle_bounds(v0, v1, v2)
    host = B.build_bvh(centers, bmin, bmax)
    B.validate(host, bmin, bmax)
    assert host.count.max() <= B.MAX_PRIMS_PER_LEAF or host.count.max() < 16
    # 2N-1 upper bound on node count (bvh_builder.cpp:20-26)
    assert len(host.first) <= 2 * 300 - 1


def test_build_single_and_tiny():
    for n in (1, 2, 3):
        r = np.random.default_rng(n)
        v0 = r.uniform(-1, 1, (n, 3)).astype(np.float32)
        v1 = v0 + 0.3
        v2 = v0 + np.array([0.3, 0.0, 0.1], np.float32)
        centers, bmin, bmax = B.triangle_bounds(v0, v1, v2)
        host = B.build_bvh(centers, bmin, bmax)
        B.validate(host, bmin, bmax)


def test_degenerate_identical_centers():
    """All primitives identical: binning cannot split; must still terminate
    with a valid (if deep-leafed) tree."""
    v0 = np.zeros((20, 3), np.float32)
    v1 = np.full((20, 3), 0.5, np.float32)
    v2 = np.tile(np.array([0.5, 0.0, 0.2], np.float32), (20, 1))
    centers, bmin, bmax = B.triangle_bounds(v0, v1, v2)
    host = B.build_bvh(centers, bmin, bmax)
    B.validate(host, bmin, bmax)


def test_traversal_matches_brute_force():
    scene = random_mesh_scene(257, seed=3)
    scene_bvh = B.attach_bvh(scene)
    r = np.random.default_rng(5)
    n_rays = 128
    o = jnp.asarray(r.uniform(-4, 4, (n_rays, 3)), jnp.float32)
    d = r.normal(size=(n_rays, 3))
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True), jnp.float32)

    t_bf, i_bf = I.closest_hit_triangles(
        o, d, scene_bvh.tri_v0, scene_bvh.tri_v1, scene_bvh.tri_v2, 1e-3, np.inf
    )
    t_bvh, i_bvh = T.closest_hit_bvh(scene_bvh, scene_bvh.bvh, o, d, 1e-3, np.inf)

    hit_bf = np.asarray(i_bf) >= 0
    hit_bvh = np.asarray(i_bvh) >= 0
    assert np.array_equal(hit_bf, hit_bvh)
    assert np.allclose(
        np.asarray(t_bf)[hit_bf], np.asarray(t_bvh)[hit_bf], rtol=1e-4, atol=1e-5
    )
    assert np.array_equal(np.asarray(i_bf)[hit_bf], np.asarray(i_bvh)[hit_bf])


def test_scene_with_bvh_renders_same():
    """intersect_scene must give identical hit structure with and without an
    attached BVH."""
    from rvpt_tpu.core.types import Ray

    scene = random_mesh_scene(100, seed=7)
    scene_bvh = B.attach_bvh(scene)
    r = np.random.default_rng(11)
    o = jnp.asarray(r.uniform(-4, 4, (64, 3)), jnp.float32)
    d = r.normal(size=(64, 3))
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True), jnp.float32)
    a = I.intersect_scene(scene, Ray(o, d), 1e-3, np.inf)
    b = I.intersect_scene(scene_bvh, Ray(o, d), 1e-3, np.inf)
    assert np.array_equal(np.asarray(a.hit), np.asarray(b.hit))
    h = np.asarray(a.hit)
    assert np.allclose(np.asarray(a.t)[h], np.asarray(b.t)[h], rtol=1e-4)
    assert np.allclose(
        np.asarray(a.normal)[h], np.asarray(b.normal)[h], rtol=1e-3, atol=1e-5
    )


def test_collect_aabbs_by_depth():
    scene = random_mesh_scene(64, seed=9)
    v0 = np.asarray(scene.tri_v0)
    centers, bmin, bmax = B.triangle_bounds(
        v0, np.asarray(scene.tri_v1), np.asarray(scene.tri_v2)
    )
    host = B.build_bvh(centers, bmin, bmax)
    levels = host.collect_aabbs_by_depth()
    assert len(levels) == host.max_depth() + 1
    assert levels[0].shape == (1, 6)  # root only
    total = sum(len(l) for l in levels)
    assert total == len(host.first)


def test_obj_roundtrip_and_icosphere(tmp_path):
    v, f = obj_io.make_icosphere(subdiv=1)
    assert len(f) == 80
    assert np.allclose(np.linalg.norm(v, axis=1), 1.0, atol=1e-6)
    p = str(tmp_path / "ico.obj")
    obj_io.save_obj(p, v, f)
    v2, f2 = obj_io.load_obj(p)
    assert np.allclose(v, v2, atol=1e-5)
    assert np.array_equal(f, f2)


def test_obj_parse_quads_and_negative_indices():
    txt = """
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
f 1 2 3 4
f -4 -3 -2
"""
    v, f = obj_io.parse_obj(txt)
    assert v.shape == (4, 3)
    # quad fan-triangulated into 2 + 1 explicit = 3 triangles
    assert f.shape == (3, 3)
    assert f[0].tolist() == [0, 1, 2]
    assert f[1].tolist() == [0, 2, 3]
    assert f[2].tolist() == [0, 1, 2]


def test_any_hit_matches_closest_hit():
    scene = random_mesh_scene(150, seed=21)
    sb = B.attach_bvh(scene)
    r = np.random.default_rng(22)
    o = jnp.asarray(r.uniform(-4, 4, (96, 3)), jnp.float32)
    d = r.normal(size=(96, 3))
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True), jnp.float32)
    t, idx = T.closest_hit_bvh(sb, sb.bvh, o, d, 1e-3, np.inf)
    any_ = T.any_hit_bvh(sb, sb.bvh, o, d, 1e-3, np.inf)
    assert np.array_equal(np.asarray(any_), np.asarray(idx) >= 0)
