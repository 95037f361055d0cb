"""Big-mesh integrator coverage: every debug/bounce mode plus split-screen
through the chunked launches.

The reference runs any of its integrators on any scene and compares up to
four in split-screen (compute_pass.comp:68-99,134-144); the chunked
big-mesh path must offer the same coverage, not just Kajiya.  The drivers
(ops.pathkernel.BigMeshTracer.trace_primary / trace_shaded) run the
chunked closest-hit kernel for every search and the SAME shading/finalize
jnp math as the fused kernels in XLA between launches, so images must
match the XLA integrators on the same rays."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from rvpt_tpu import FilmConfig, RenderSettings
from rvpt_tpu.models import camera as camera_mod
from rvpt_tpu.models.integrators import eval_integrator
from rvpt_tpu.scene import builtin


@pytest.fixture
def small_chunks(monkeypatch):
    from rvpt_tpu.ops import pathkernel as pk

    monkeypatch.setattr(pk, "BIG_CHUNK_T", 1024)
    # K=16 so a 1024-tri chunk still holds one full 64-cluster supergroup
    # (production BIG_CULL_K=32 would leave only 32 clusters per chunk).
    monkeypatch.setattr(pk, "BIG_CULL_K", 16)
    monkeypatch.setattr(pk, "BIG_CHUNK_CLU", 1024 // 16)
    monkeypatch.setattr(pk, "BIG_CHUNK_SUP", 1024 // 16 // pk.CULL_G)


def _rays(cfg, cam, n_seed=0):
    from rvpt_tpu.core import rng
    from rvpt_tpu.render import _pixel_grid

    pixel, xs, ys = _pixel_grid(cfg)
    ju, jv = rng.uniform2(pixel, jnp.uint32(n_seed), jnp.uint32(0))
    cx = (xs.astype(jnp.float32) + ju) / cfg.width
    cy = 1.0 - (ys.astype(jnp.float32) + jv) / cfg.height
    return pixel, camera_mod.generate_rays(cam, cx, cy)


def _mixed_mesh_scene(n_tri=1500, seed=11):
    """Random soup spanning >=2 shrunken chunks with Lambert + mirror +
    dielectric triangles, a floor plane and an emissive sphere, so the
    Whitted/Cook branches and the shadow/occlusion searches all fire."""
    from rvpt_tpu.scene.bvh import attach_bvh
    from rvpt_tpu.scene.scene import SceneBuilder

    rng_np = np.random.default_rng(seed)
    c = rng_np.uniform(-3, 3, size=(n_tri, 3)).astype(np.float32)
    c[:, 2] += 5.0
    e1 = rng_np.normal(0, 0.4, size=(n_tri, 3)).astype(np.float32)
    e2 = rng_np.normal(0, 0.4, size=(n_tri, 3)).astype(np.float32)

    b = SceneBuilder()
    lam = b.add_material(albedo=(0.6, 0.5, 0.4))
    mir = b.add_material(albedo=(0.9, 0.9, 0.9), kind=1)
    die = b.add_material(albedo=(1.0, 1.0, 1.0), kind=2, ior=1.5)
    mats = (lam, lam, mir, die)
    for i, (a, v1, v2) in enumerate(zip(c, c + e1, c + e2)):
        b.add_triangle(tuple(a), tuple(v1), tuple(v2), mats[i % 4])
    lm = b.add_material(albedo=(0, 0, 0), emission=(4, 4, 4))
    b.add_sphere((0.0, 6.0, 2.0), 1.0, lm)
    b.add_plane((0.0, 1.0, 0.0), -3.5, lam)
    return attach_bvh(b.build())


@pytest.mark.parametrize("mode", [0, 1, 2, 3, 4, 5, 6])
def test_bigmesh_primary_modes_match_xla(small_chunks, mode):
    """binary/color/depth/normal/Utah/AO/Appel on a multi-chunk mesh: one
    chunked search launch + the shared finalize must match the XLA
    integrator on the same rays (integrators.glsl:24-250)."""
    from rvpt_tpu.ops import pathkernel as pk

    scene = _mixed_mesh_scene()
    cfg = FilmConfig(width=24, height=16)
    cam = builtin.sphere_plane(aspect=cfg.aspect)[1]
    pixel, ray = _rays(cfg, cam)
    frame = jnp.uint32(3)
    st = RenderSettings(max_bounces=4)

    ref = np.asarray(eval_integrator(
        mode, scene, ray, pixel, frame, st, salt_base=jnp.uint32(16)))
    bt = pk.BigMeshTracer(scene)
    assert bt.meta["n_chunks"] >= 2
    r, g, b = bt.trace_primary(
        pixel, ray.origin, ray.direction, frame, mode, salt_base=16,
        nrays=st.max_bounces if mode == 5 else 1, interpret=True,
    )
    got = np.stack([np.asarray(r), np.asarray(g), np.asarray(b)], axis=-1)
    close = np.isclose(got, ref, rtol=1e-4, atol=1e-4)
    assert close.mean() > 0.995, f"mode {mode}: {close.mean():.4f} match"


@pytest.mark.parametrize("style", ["reference", "standard"])
@pytest.mark.parametrize("mode", [7, 8])
def test_bigmesh_whitted_cook_match_xla(small_chunks, mode, style):
    """Whitted (per-bounce shadow launch) and Cook (tail resolve launch)
    on a multi-chunk mesh with mirror/dielectric triangles
    (integrators.glsl:254-543), in both termination styles — the
    ``standard`` branch adds the carried throughput on still-active rays
    in the driver-side tail (trace_shaded)."""
    from rvpt_tpu.ops import pathkernel as pk

    scene = _mixed_mesh_scene()
    cfg = FilmConfig(width=24, height=16)
    cam = builtin.sphere_plane(aspect=cfg.aspect)[1]
    pixel, ray = _rays(cfg, cam)
    frame = jnp.uint32(5)
    st = RenderSettings(max_bounces=3, style=style)

    ref = np.asarray(eval_integrator(
        mode, scene, ray, pixel, frame, st, salt_base=jnp.uint32(16)))
    bt = pk.BigMeshTracer(scene)
    r, g, b = bt.trace_shaded(
        pixel, ray.origin, ray.direction, frame,
        {7: "whitted", 8: "cook"}[mode], salt_base=16,
        max_bounces=3, style=style, interpret=True,
    )
    got = np.stack([np.asarray(r), np.asarray(g), np.asarray(b)], axis=-1)
    close = np.isclose(got, ref, rtol=1e-4, atol=1e-4)
    assert close.mean() > 0.995, f"mode {mode}: {close.mean():.4f} match"


def test_bigmesh_mode_eligibility(monkeypatch, small_chunks):
    """Every integrator mode and 4-way split is kernel-eligible on a
    big-mesh scene (the reference runs any integrator on any scene,
    compute_pass.comp:68-99) — a refusal would silently fall back to the
    minutes-per-frame XLA path at 1080p."""
    from rvpt_tpu.ops import intersect as intersect_mod
    from rvpt_tpu.ops import pathkernel as pk
    from rvpt_tpu.render import _megakernel_eligible

    monkeypatch.setattr(pk, "CULL_MAX_TRIS", 256)
    monkeypatch.setattr(intersect_mod, "_BACKEND", "pallas")
    scene = _mixed_mesh_scene(n_tri=400, seed=13)
    assert pk.is_bigmesh(scene)
    for mode in range(11):
        st = RenderSettings(max_bounces=2, top_left_render_mode=mode,
                            top_right_render_mode=mode,
                            bottom_left_render_mode=mode,
                            bottom_right_render_mode=mode)
        assert _megakernel_eligible(scene, st), f"mode {mode} refused"
    st = RenderSettings(max_bounces=2, top_left_render_mode=3,
                        top_right_render_mode=10, bottom_left_render_mode=5,
                        bottom_right_render_mode=8)
    assert _megakernel_eligible(scene, st), "4-way split refused"


def test_bigmesh_search_miss_semantics(small_chunks):
    """search_tiles returns fam=-1 / t=+BIG for rays that miss everything
    and ignores dead lanes — the contract every mode driver builds on."""
    import jax.numpy as jnp

    from rvpt_tpu.ops import pathkernel as pk

    scene = _mixed_mesh_scene(n_tri=1200, seed=7)
    bt = pk.BigMeshTracer(scene)
    n = pk.TILE
    pix = pk._to_tiles(jnp.arange(n, dtype=jnp.uint32))
    up = jnp.ones((n,), jnp.float32)
    zero = jnp.zeros((n,), jnp.float32)
    # Rays pointing straight up from above the scene: all miss.
    o3 = tuple(pk._to_tiles(v) for v in (zero, up * 50.0, zero))
    d3 = tuple(pk._to_tiles(v) for v in (zero, up, zero))
    live = jnp.ones_like(o3[0], bool)
    w = bt.search_tiles(pix, o3, d3, live, jnp.uint32(0), interpret=True)
    assert bool((np.asarray(w[5]) == -1).all()), "miss must report fam -1"
    assert bool((np.asarray(w[0]) >= 1e30).all()), "miss must keep t at BIG"


def test_bigmesh_hart_matches_xla(small_chunks):
    """Hart sphere-trace heat map on a multi-chunk mesh: the chunked
    min-distance kernel + XLA march must match integrator_hart
    (distance_functions.glsl:70-116).  The cluster distance cull is exact
    (box distance lower-bounds member-triangle distance), so mismatches
    beyond fp noise indicate an unsound skip."""
    from rvpt_tpu.ops import pathkernel as pk

    scene = _mixed_mesh_scene()
    cfg = FilmConfig(width=24, height=16)
    cam = builtin.sphere_plane(aspect=cfg.aspect)[1]
    pixel, ray = _rays(cfg, cam)
    st = RenderSettings(max_bounces=2)

    ref = np.asarray(eval_integrator(
        10, scene, ray, pixel, jnp.uint32(0), st, salt_base=jnp.uint32(16)))
    bt = pk.BigMeshTracer(scene)
    r, g, b = bt.trace_hart(pixel, ray.origin, ray.direction, interpret=True)
    got = np.stack([np.asarray(r), np.asarray(g), np.asarray(b)], axis=-1)
    close = np.isclose(got, ref, rtol=1e-4, atol=1e-4)
    assert close.mean() > 0.99, f"hart: {close.mean():.4f} match"


def test_bigmesh_split_screen_matches_xla(monkeypatch, small_chunks):
    """4-way split on a big-mesh scene rides the chunked launches
    (render.py _bigmesh_chw) and matches the XLA split render
    (compute_pass.comp:134-144)."""
    from rvpt_tpu.ops import intersect as intersect_mod
    from rvpt_tpu.ops import pathkernel as pk
    from rvpt_tpu.render import render_sample_chw, render_sample_fast_chw

    monkeypatch.setattr(pk, "CULL_MAX_TRIS", 256)

    scene = _mixed_mesh_scene(n_tri=400, seed=13)
    assert pk.is_bigmesh(scene)
    cfg = FilmConfig(width=32, height=16)
    cam = builtin.sphere_plane(aspect=cfg.aspect)[1]
    st = RenderSettings(max_bounces=2, top_left_render_mode=3,
                        top_right_render_mode=9, bottom_left_render_mode=0,
                        bottom_right_render_mode=7)

    # Reference on the plain XLA backend; only the fast path gets the
    # forced kernel backend (on CPU the XLA integrators' intersects would
    # otherwise route into non-interpret pallas calls).
    ref = np.asarray(render_sample_chw(scene, cam, st, cfg, jnp.uint32(1)))
    monkeypatch.setattr(intersect_mod, "_BACKEND", "pallas")
    got = np.asarray(
        render_sample_fast_chw(scene, cam, st, cfg, jnp.uint32(1)))
    close = np.isclose(got, ref, rtol=1e-4, atol=1e-4)
    assert close.mean() > 0.995, f"split: {close.mean():.4f} match"
