"""Fused path kernel vs XLA Kajiya equivalence (Pallas interpreter on CPU)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from rvpt_tpu import FilmConfig, RenderSettings
from rvpt_tpu.core.types import Ray
from rvpt_tpu.models import camera as camera_mod
from rvpt_tpu.models.integrators import integrator_kajiya
from rvpt_tpu.ops.pathkernel import PathTracer
from rvpt_tpu.scene import builtin


def _rays(cfg, cam, n_seed=0):
    import jax

    from rvpt_tpu.core import rng
    from rvpt_tpu.render import _pixel_grid

    pixel, xs, ys = _pixel_grid(cfg)
    ju, jv = rng.uniform2(pixel, jnp.uint32(n_seed), jnp.uint32(0))
    cx = (xs.astype(jnp.float32) + ju) / cfg.width
    cy = 1.0 - (ys.astype(jnp.float32) + jv) / cfg.height
    return pixel, camera_mod.generate_rays(cam, cx, cy)


@pytest.mark.parametrize("style", ["reference", "standard"])
@pytest.mark.parametrize("scene_name", ["cornell", "sphere_plane"])
def test_megakernel_matches_xla(scene_name, style):
    cfg = FilmConfig(width=24, height=16)
    maker = {"cornell": builtin.cornell_box, "sphere_plane": builtin.sphere_plane}
    scene, cam = maker[scene_name](aspect=cfg.aspect)
    pixel, ray = _rays(cfg, cam)
    frame = jnp.uint32(3)
    st = RenderSettings(max_bounces=3, style=style)

    ref = np.asarray(
        integrator_kajiya(scene, ray, pixel, frame, st, salt_base=jnp.uint32(16))
    )

    mk = PathTracer(scene)
    r, g, b = mk.trace(
        pixel, ray.origin, ray.direction, frame, salt_base=16,
        max_bounces=3, style=style, interpret=True,
    )
    got = np.stack([np.asarray(r), np.asarray(g), np.asarray(b)], axis=-1)

    # identical RNG streams + identical math modulo fma rounding: images agree
    # everywhere except (rarely) single-ulp hit-decision flips
    close = np.isclose(got, ref, rtol=1e-4, atol=1e-4)
    assert close.mean() > 0.995, f"only {close.mean():.4f} of pixels match"


def test_megakernel_empty_families():
    """Triangles-only scene (no spheres/planes) and sphere-only scene both
    trace without degenerate-family artifacts."""
    from rvpt_tpu.scene.scene import SceneBuilder

    b = SceneBuilder()
    m = b.add_material(albedo=(0.5, 0.5, 0.5))
    b.add_triangle((-5, -5, 3), (5, -5, 3), (0, 8, 3), m)
    scene = b.build()
    cfg = FilmConfig(width=16, height=8)
    cam = builtin.sphere_plane(aspect=cfg.aspect)[1]
    pixel, ray = _rays(cfg, cam)
    mk = PathTracer(scene)
    r, g, bch = mk.trace(pixel, ray.origin, ray.direction, 0, 16, 2,
                         interpret=True)
    assert np.isfinite(np.asarray(r)).all()

    b2 = SceneBuilder()
    m2 = b2.add_material(albedo=(0.5, 0.5, 0.5))
    b2.add_sphere((0, 0, 4), 1.0, m2)
    scene2 = b2.build()
    mk2 = PathTracer(scene2)
    r2, _, _ = mk2.trace(pixel, ray.origin, ray.direction, 0, 16, 2,
                         interpret=True)
    assert np.isfinite(np.asarray(r2)).all()


def test_megakernel_culled_mesh_matches_xla():
    """BVH-attached mesh scenes route triangles through the SMEM
    cluster-culled path (pack_cull); result must match the XLA integrator."""
    cfg = FilmConfig(width=24, height=16)
    scene, cam = builtin.mesh_demo(subdiv=1, aspect=cfg.aspect)
    pixel, ray = _rays(cfg, cam)
    frame = jnp.uint32(3)
    st = RenderSettings(max_bounces=3)

    ref = np.asarray(
        integrator_kajiya(scene, ray, pixel, frame, st, salt_base=jnp.uint32(16))
    )
    mk = PathTracer(scene)
    assert mk.meta.get("culled"), "mesh_demo must take the culled path"
    r, g, b = mk.trace(
        pixel, ray.origin, ray.direction, frame, salt_base=16,
        max_bounces=3, interpret=True,
    )
    got = np.stack([np.asarray(r), np.asarray(g), np.asarray(b)], axis=-1)
    close = np.isclose(got, ref, rtol=1e-4, atol=1e-4)
    assert close.mean() > 0.995, f"only {close.mean():.4f} of pixels match"


def _bvh_mesh_scene(v0, v1, v2, albedo=(0.6, 0.6, 0.6)):
    """Build a BVH-attached triangle scene (routes through the culled path)."""
    from rvpt_tpu.scene.bvh import attach_bvh
    from rvpt_tpu.scene.scene import SceneBuilder

    b = SceneBuilder()
    m = b.add_material(albedo=albedo)
    for a, c, d in zip(v0, v1, v2):
        b.add_triangle(tuple(a), tuple(c), tuple(d), m)
    lm = b.add_material(albedo=(0, 0, 0), emission=(4, 4, 4))
    b.add_sphere((0.0, 6.0, 2.0), 1.0, lm)
    return attach_bvh(b.build())


@pytest.mark.parametrize("layout", ["axial", "soup"])
def test_megakernel_culled_order_and_break_sound(layout):
    """Adversarial geometry for the near-first ordering + early break:

    'axial' stacks many quads along the view axis (the break must fire only
    after the true nearest hit is found — any unsound skip shows up as a ray
    punching through to a farther quad); 'soup' scatters triangles randomly
    so counting-sort buckets collide and within-bucket order is arbitrary.
    Both must match the XLA integrator exactly (same math, same RNG)."""
    rng = np.random.default_rng(7)
    if layout == "axial":
        quads = []
        for i in range(24):  # 48 tris -> several clusters along one axis
            z = 2.0 + 0.45 * i
            s = 1.0 + 0.05 * i
            quads.append(((-s, -s, z), (s, -s, z), (s, s, z)))
            quads.append(((-s, -s, z), (s, s, z), (-s, s, z)))
        v0, v1, v2 = (np.asarray([q[k] for q in quads], np.float32)
                      for k in range(3))
    else:
        c = rng.uniform(-3, 3, size=(64, 3)).astype(np.float32)
        c[:, 2] += 5.0
        e1 = rng.normal(0, 0.7, size=(64, 3)).astype(np.float32)
        e2 = rng.normal(0, 0.7, size=(64, 3)).astype(np.float32)
        v0, v1, v2 = c, c + e1, c + e2
    scene = _bvh_mesh_scene(v0, v1, v2)

    cfg = FilmConfig(width=24, height=16)
    cam = builtin.sphere_plane(aspect=cfg.aspect)[1]
    pixel, ray = _rays(cfg, cam)
    frame = jnp.uint32(5)
    st = RenderSettings(max_bounces=4)

    ref = np.asarray(
        integrator_kajiya(scene, ray, pixel, frame, st, salt_base=jnp.uint32(16))
    )
    mk = PathTracer(scene)
    assert mk.meta.get("culled"), "scene must take the culled path"
    r, g, b = mk.trace(
        pixel, ray.origin, ray.direction, frame, salt_base=16,
        max_bounces=4, interpret=True,
    )
    got = np.stack([np.asarray(r), np.asarray(g), np.asarray(b)], axis=-1)
    close = np.isclose(got, ref, rtol=1e-4, atol=1e-4)
    assert close.mean() > 0.995, f"only {close.mean():.4f} of pixels match"


def test_bigmesh_tracer_matches_xla(monkeypatch):
    """The chunked big-mesh path (one launch per bounce, triangle tables
    streamed through SMEM) must match the XLA integrator.  BIG_CHUNK_T is
    shrunk so a small soup exercises MULTIPLE chunks, including the padded
    (inverted-box) tail clusters."""
    from rvpt_tpu.ops import pathkernel as pk

    monkeypatch.setattr(pk, "BIG_CHUNK_T", 1024)
    # 1024-tri chunks need K=16 so a chunk still holds >= one full
    # 64-cluster supergroup (at the production BIG_CULL_K=32 a 1024-tri
    # chunk has only 32 clusters).
    monkeypatch.setattr(pk, "BIG_CULL_K", 16)
    monkeypatch.setattr(pk, "BIG_CHUNK_CLU", 1024 // 16)
    monkeypatch.setattr(pk, "BIG_CHUNK_SUP", 1024 // 16 // pk.CULL_G)

    rng_np = np.random.default_rng(11)
    n_tri = 1500  # ceil(1500/16)=94 clusters -> 2 chunks of 64 at CHUNK=1024
    c = rng_np.uniform(-3, 3, size=(n_tri, 3)).astype(np.float32)
    c[:, 2] += 5.0
    e1 = rng_np.normal(0, 0.4, size=(n_tri, 3)).astype(np.float32)
    e2 = rng_np.normal(0, 0.4, size=(n_tri, 3)).astype(np.float32)
    scene = _bvh_mesh_scene(c, c + e1, c + e2)

    cfg = FilmConfig(width=24, height=16)
    cam = builtin.sphere_plane(aspect=cfg.aspect)[1]
    pixel, ray = _rays(cfg, cam)
    frame = jnp.uint32(2)
    st = RenderSettings(max_bounces=3)

    ref = np.asarray(
        integrator_kajiya(scene, ray, pixel, frame, st, salt_base=jnp.uint32(16))
    )
    bt = pk.BigMeshTracer(scene)
    assert bt.meta["n_chunks"] >= 2, "test must span multiple chunks"
    r, g, b = bt.trace(
        pixel, ray.origin, ray.direction, frame, salt_base=16,
        max_bounces=3, interpret=True,
    )
    got = np.stack([np.asarray(r), np.asarray(g), np.asarray(b)], axis=-1)
    close = np.isclose(got, ref, rtol=1e-4, atol=1e-4)
    assert close.mean() > 0.995, f"only {close.mean():.4f} of pixels match"


def test_bigmesh_display_path_matches_xla(monkeypatch):
    """render_sample_fast_chw routes >CULL_MAX_TRIS BVH scenes through the
    chunked kernel with the XLA path's exact jitter/integrator salts."""
    from rvpt_tpu.ops import intersect as intersect_mod
    from rvpt_tpu.ops import pathkernel as pk
    from rvpt_tpu.render import render_sample_chw, render_sample_fast_chw

    monkeypatch.setattr(pk, "BIG_CHUNK_T", 1024)
    # 1024-tri chunks need K=16 so a chunk still holds >= one full
    # 64-cluster supergroup (at the production BIG_CULL_K=32 a 1024-tri
    # chunk has only 32 clusters).
    monkeypatch.setattr(pk, "BIG_CULL_K", 16)
    monkeypatch.setattr(pk, "BIG_CHUNK_CLU", 1024 // 16)
    monkeypatch.setattr(pk, "BIG_CHUNK_SUP", 1024 // 16 // pk.CULL_G)
    monkeypatch.setattr(pk, "CULL_MAX_TRIS", 256)

    rng_np = np.random.default_rng(13)
    n_tri = 400
    c = rng_np.uniform(-3, 3, size=(n_tri, 3)).astype(np.float32)
    c[:, 2] += 5.0
    e1 = rng_np.normal(0, 0.4, size=(n_tri, 3)).astype(np.float32)
    e2 = rng_np.normal(0, 0.4, size=(n_tri, 3)).astype(np.float32)
    scene = _bvh_mesh_scene(c, c + e1, c + e2)
    assert scene.num_triangles > pk.CULL_MAX_TRIS

    cfg = FilmConfig(width=32, height=16)
    cam = builtin.sphere_plane(aspect=cfg.aspect)[1]
    st = RenderSettings(max_bounces=2, aa=2)

    ref = np.asarray(render_sample_chw(scene, cam, st, cfg, 1))
    # Force kernel eligibility on CPU only for the fast path (the chunked
    # kernel itself runs in interpreter mode off-TPU).
    monkeypatch.setattr(intersect_mod, "_BACKEND", "pallas")
    got = np.asarray(render_sample_fast_chw(scene, cam, st, cfg, 1))
    close = np.isclose(got, ref, rtol=1e-4, atol=1e-4)
    assert close.mean() > 0.995, f"only {close.mean():.4f} of pixels match"


def test_megakernel_culled_pack_bounds():
    """Cluster/supergroup AABBs from pack_cull must contain their triangles."""
    from rvpt_tpu.ops.pathkernel import CULL_K, pack_cull

    scene, _ = builtin.mesh_demo(subdiv=1)
    tabs, meta = pack_cull(scene)
    bounds = tabs[17:]
    c0 = np.stack([np.asarray(bounds[6 + k]) for k in range(3)], -1)
    c1 = np.stack([np.asarray(bounds[9 + k]) for k in range(3)], -1)
    v = np.stack(
        [np.asarray(scene.tri_v0), np.asarray(scene.tri_v1),
         np.asarray(scene.tri_v2)], 1,
    )  # [T,3,3]
    for t in range(scene.num_triangles):
        c = t // CULL_K
        assert (v[t].min(0) >= c0[c] - 1e-3).all()
        assert (v[t].max(0) <= c1[c] + 1e-3).all()


@pytest.mark.parametrize("mode_name", [
    "binary", "color", "depth", "normal", "utah", "ao", "appel",
])
def test_primary_kernel_matches_xla(mode_name):
    """The one-search debug-integrator kernel must reproduce the matching
    XLA integrator (same rays, same RNG probes for AO)."""
    from rvpt_tpu.models.integrators import (INTEGRATOR_NAMES,
                                             eval_integrator)
    from rvpt_tpu.ops.pathkernel import camera_params
    from rvpt_tpu.render import _INTEGRATOR_SITE, _JITTER_SITE, _pixel_grid

    mode = INTEGRATOR_NAMES[mode_name]
    cfg = FilmConfig(width=24, height=16)
    scene, cam = builtin.cornell_box(aspect=cfg.aspect)
    st = RenderSettings(max_bounces=3)
    frame = jnp.uint32(2)

    pixel, ray = _rays(cfg, cam, n_seed=2)
    ref = np.asarray(eval_integrator(
        mode, scene, ray, pixel, frame, st,
        jnp.uint32(_INTEGRATOR_SITE)))

    pt = PathTracer(scene)
    r, g, b = pt.trace_primary(
        pixel, frame, mode, cam_params=camera_params(cam, cfg),
        cam_mode=cam.mode, salt_base=_INTEGRATOR_SITE,
        jitter_salt=_JITTER_SITE, nrays=3, interpret=True,
    )
    got = np.stack([np.asarray(r), np.asarray(g), np.asarray(b)], axis=-1)
    close = np.isclose(got, ref, rtol=1e-4, atol=1e-4)
    assert close.mean() > 0.995, (
        f"{mode_name}: only {close.mean():.4f} of pixels match"
    )


def test_primary_kernel_culled_mesh():
    """Primary modes also ride the SMEM culled path for BVH scenes."""
    from rvpt_tpu.models.integrators import eval_integrator
    from rvpt_tpu.ops.pathkernel import camera_params
    from rvpt_tpu.render import _INTEGRATOR_SITE, _JITTER_SITE

    cfg = FilmConfig(width=24, height=16)
    scene, cam = builtin.mesh_demo(subdiv=1, aspect=cfg.aspect)
    st = RenderSettings(max_bounces=2)
    frame = jnp.uint32(1)
    pixel, ray = _rays(cfg, cam, n_seed=1)
    ref = np.asarray(eval_integrator(
        3, scene, ray, pixel, frame, st, jnp.uint32(_INTEGRATOR_SITE)))
    pt = PathTracer(scene)
    assert pt.meta.get("culled")
    r, g, b = pt.trace_primary(
        pixel, frame, 3, cam_params=camera_params(cam, cfg),
        cam_mode=cam.mode, salt_base=_INTEGRATOR_SITE,
        jitter_salt=_JITTER_SITE, interpret=True,
    )
    got = np.stack([np.asarray(r), np.asarray(g), np.asarray(b)], axis=-1)
    close = np.isclose(got, ref, rtol=1e-4, atol=1e-4)
    assert close.mean() > 0.995, f"only {close.mean():.4f} of pixels match"


@pytest.mark.parametrize("integ_name,mode", [("whitted", 7), ("cook", 8)])
@pytest.mark.parametrize("scene_name", ["cornell", "sphere_plane"])
def test_bounce_integ_kernel_matches_xla(scene_name, integ_name, mode):
    """Whitted/Cook as kernel-resident bounce integrators must reproduce
    their XLA counterparts (same RNG streams, same termination semantics,
    incl. Cook's final-bounce Lambert resolution)."""
    from rvpt_tpu.models.integrators import eval_integrator

    cfg = FilmConfig(width=24, height=16)
    maker = {"cornell": builtin.cornell_box, "sphere_plane": builtin.sphere_plane}
    scene, cam = maker[scene_name](aspect=cfg.aspect)
    pixel, ray = _rays(cfg, cam)
    frame = jnp.uint32(4)
    st = RenderSettings(max_bounces=3)

    ref = np.asarray(eval_integrator(
        mode, scene, ray, pixel, frame, st, jnp.uint32(16)))

    mk = PathTracer(scene)
    r, g, b = mk.trace(
        pixel, ray.origin, ray.direction, frame, salt_base=16,
        max_bounces=3, interpret=True, integ=integ_name,
    )
    got = np.stack([np.asarray(r), np.asarray(g), np.asarray(b)], axis=-1)
    close = np.isclose(got, ref, rtol=1e-4, atol=1e-4)
    assert close.mean() > 0.995, (
        f"{integ_name}: only {close.mean():.4f} of pixels match"
    )


def test_bounce_integ_kernel_multi_group():
    """Cook's terminate flag must survive the bounce-group boundary (the
    0/1/2 trit on the active carry row): 10 bounces = two kernel groups."""
    from rvpt_tpu.models.integrators import eval_integrator

    cfg = FilmConfig(width=16, height=8)
    scene, cam = builtin.cornell_box(aspect=cfg.aspect)
    pixel, ray = _rays(cfg, cam)
    frame = jnp.uint32(1)
    st = RenderSettings(max_bounces=10)
    ref = np.asarray(eval_integrator(
        8, scene, ray, pixel, frame, st, jnp.uint32(16)))
    mk = PathTracer(scene)
    r, g, b = mk.trace(
        pixel, ray.origin, ray.direction, frame, salt_base=16,
        max_bounces=10, interpret=True, integ="cook",
    )
    got = np.stack([np.asarray(r), np.asarray(g), np.asarray(b)], axis=-1)
    close = np.isclose(got, ref, rtol=1e-4, atol=1e-4)
    assert close.mean() > 0.995, f"only {close.mean():.4f} of pixels match"


@pytest.mark.parametrize("scene_name", ["cornell", "sphere_plane"])
def test_hart_kernel_matches_xla(scene_name):
    """The in-kernel SDF march must reproduce integrator_hart's iteration
    heat map (same jittered rays, same eps/iter constants)."""
    from rvpt_tpu.models.integrators import eval_integrator
    from rvpt_tpu.ops.pathkernel import camera_params, trace_hart
    from rvpt_tpu.render import _INTEGRATOR_SITE, _JITTER_SITE

    cfg = FilmConfig(width=24, height=16)
    maker = {"cornell": builtin.cornell_box, "sphere_plane": builtin.sphere_plane}
    scene, cam = maker[scene_name](aspect=cfg.aspect)
    pixel, ray = _rays(cfg, cam)
    frame = jnp.uint32(0)
    st = RenderSettings(max_bounces=2)

    ref = np.asarray(eval_integrator(
        10, scene, ray, pixel, frame, st, jnp.uint32(_INTEGRATOR_SITE)))
    r, g, b = trace_hart(
        scene, pixel, frame, cam_params=camera_params(cam, cfg),
        cam_mode=cam.mode, jitter_salt=_JITTER_SITE, interpret=True,
    )
    got = np.stack([np.asarray(r), np.asarray(g), np.asarray(b)], axis=-1)
    close = np.isclose(got, ref, rtol=1e-4, atol=1e-4)
    assert close.mean() > 0.99, f"only {close.mean():.4f} of pixels match"


def test_bigmesh_tile_cull_matches_full_walk(monkeypatch):
    """Per-tile chunk work lists (_bigmesh_chunk_worklist) are exactly the
    kernel's own supergroup listing test hoisted to tile granularity, so the
    tile-culled walk and the full chunk stream must produce bit-identical
    images and hit records."""
    from rvpt_tpu.ops import pathkernel as pk

    monkeypatch.setattr(pk, "BIG_CHUNK_T", 1024)
    # 1024-tri chunks need K=16 so a chunk still holds >= one full
    # 64-cluster supergroup (at the production BIG_CULL_K=32 a 1024-tri
    # chunk has only 32 clusters).
    monkeypatch.setattr(pk, "BIG_CULL_K", 16)
    monkeypatch.setattr(pk, "BIG_CHUNK_CLU", 1024 // 16)
    monkeypatch.setattr(pk, "BIG_CHUNK_SUP", 1024 // 16 // pk.CULL_G)

    rng_np = np.random.default_rng(23)
    n_tri = 2100  # 3 chunks at BIG_CHUNK_T=1024
    c = rng_np.uniform(-3, 3, size=(n_tri, 3)).astype(np.float32)
    c[:, 2] += 5.0
    e1 = rng_np.normal(0, 0.4, size=(n_tri, 3)).astype(np.float32)
    e2 = rng_np.normal(0, 0.4, size=(n_tri, 3)).astype(np.float32)
    scene = _bvh_mesh_scene(c, c + e1, c + e2)

    cfg = FilmConfig(width=24, height=16)
    cam = builtin.sphere_plane(aspect=cfg.aspect)[1]
    pixel, ray = _rays(cfg, cam)
    frame = jnp.uint32(5)

    bt = pk.BigMeshTracer(scene)
    assert bt.meta["n_chunks"] >= 3

    # The work list itself: listed ids ascending, trailing slots repeat the
    # last listed id (DMA elision), dead tiles count zero.
    state = tuple(
        pk._to_tiles(v)
        for v in (ray.origin[:, 0], ray.origin[:, 1], ray.origin[:, 2],
                  ray.direction[:, 0], ray.direction[:, 1],
                  ray.direction[:, 2])
    ) + (None,) * 9 + (pk._to_tiles(jnp.ones(pixel.shape[0])),)
    wl, cnt = pk._bigmesh_chunk_worklist(state, *bt.sup_boxes, 0.0)
    wl, cnt = np.asarray(wl), np.asarray(cnt)
    assert wl.shape == (state[0].shape[0], bt.meta["n_chunks"])
    for ti in range(wl.shape[0]):
        k = cnt[ti]
        assert (np.diff(wl[ti, :k]) > 0).all()
        if k:
            assert (wl[ti, k:] == wl[ti, k - 1]).all()

    for sort in (False, True):
        kw = dict(salt_base=16, max_bounces=3, interpret=True,
                  sort_rays=sort, collect_hits=True)
        full, (fams_f, idxs_f) = bt.trace(
            pixel, ray.origin, ray.direction, frame, tile_cull=False, **kw)
        culled, (fams_c, idxs_c) = bt.trace(
            pixel, ray.origin, ray.direction, frame, tile_cull=True, **kw)
        for a, b in zip(full, culled):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        np.testing.assert_array_equal(np.asarray(fams_f), np.asarray(fams_c))
        np.testing.assert_array_equal(np.asarray(idxs_f), np.asarray(idxs_c))


def test_bigmesh_sorted_matches_unsorted(monkeypatch):
    """The wavefront ray re-sort between bounces (octant+Morton key) must not
    change the image: per-lane winner selection is invariant to tile
    composition (any cluster a lane's slab test passes is always walked),
    and RNG/shading key on the pixel id riding the sort."""
    from rvpt_tpu.ops import pathkernel as pk

    monkeypatch.setattr(pk, "BIG_CHUNK_T", 1024)
    # 1024-tri chunks need K=16 so a chunk still holds >= one full
    # 64-cluster supergroup (at the production BIG_CULL_K=32 a 1024-tri
    # chunk has only 32 clusters).
    monkeypatch.setattr(pk, "BIG_CULL_K", 16)
    monkeypatch.setattr(pk, "BIG_CHUNK_CLU", 1024 // 16)
    monkeypatch.setattr(pk, "BIG_CHUNK_SUP", 1024 // 16 // pk.CULL_G)

    rng_np = np.random.default_rng(17)
    n_tri = 1500
    c = rng_np.uniform(-3, 3, size=(n_tri, 3)).astype(np.float32)
    c[:, 2] += 5.0
    e1 = rng_np.normal(0, 0.4, size=(n_tri, 3)).astype(np.float32)
    e2 = rng_np.normal(0, 0.4, size=(n_tri, 3)).astype(np.float32)
    scene = _bvh_mesh_scene(c, c + e1, c + e2)

    cfg = FilmConfig(width=24, height=16)
    cam = builtin.sphere_plane(aspect=cfg.aspect)[1]
    pixel, ray = _rays(cfg, cam)
    frame = jnp.uint32(5)

    bt = pk.BigMeshTracer(scene)
    kw = dict(salt_base=16, max_bounces=3, interpret=True)
    plain = bt.trace(pixel, ray.origin, ray.direction, frame,
                     sort_rays=False, **kw)
    srt = bt.trace(pixel, ray.origin, ray.direction, frame,
                   sort_rays=True, **kw)
    for a, b in zip(plain, srt):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)

    # hit records come back in caller order under sorting too
    (_, (fams_p, idxs_p)) = bt.trace(pixel, ray.origin, ray.direction, frame,
                                     sort_rays=False, collect_hits=True, **kw)
    (_, (fams_s, idxs_s)) = bt.trace(pixel, ray.origin, ray.direction, frame,
                                     sort_rays=True, collect_hits=True, **kw)
    np.testing.assert_array_equal(np.asarray(fams_p), np.asarray(fams_s))
    np.testing.assert_array_equal(np.asarray(idxs_p), np.asarray(idxs_s))
