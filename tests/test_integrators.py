import jax.numpy as jnp
import numpy as np
import pytest

from rvpt_tpu.config import FilmConfig, RenderSettings
from rvpt_tpu.core.types import Ray
from rvpt_tpu.models import integrators as G
from rvpt_tpu.models.camera import Camera
from rvpt_tpu.scene.materials import DIELECTRIC, LAMBERT, MIRROR
from rvpt_tpu.scene.scene import SceneBuilder

INF = np.inf


def simple_scene(emission=(0.0, 0.0, 0.0)):
    b = SceneBuilder()
    m = b.add_material(albedo=(0.5, 0.25, 0.125), emission=emission, kind=LAMBERT)
    b.add_triangle((-5, -5, 3), (5, -5, 3), (0, 8, 3), m)
    return b.build()


def rays(o_list, d_list):
    return Ray(jnp.asarray(o_list, jnp.float32), jnp.asarray(d_list, jnp.float32))


def px(n):
    return jnp.arange(n, dtype=jnp.uint32)


ST = RenderSettings(max_bounces=4)


def test_binary():
    scene = simple_scene()
    r = rays([[0, 0, 0], [0, 0, 4]], [[0, 0, 1], [0, 0, 1]])
    col = G.integrator_binary(scene, r, px(2), 0, ST)
    assert np.allclose(col, [[1, 1, 1], [0, 0, 0]])


def test_color():
    scene = simple_scene()
    r = rays([[0, 0, 0]], [[0, 0, 1]])
    col = G.integrator_color(scene, r, px(1), 0, ST)
    assert np.allclose(col, [[0.5, 0.25, 0.125]])


def test_depth():
    scene = simple_scene()
    r = rays([[0, 0, 0], [0, 0, 4]], [[0, 0, 1], [0, 0, 1]])
    col = G.integrator_depth(scene, r, px(2), 0, ST)
    assert np.allclose(col[0], 1.0 / 3.0, atol=1e-5)
    assert np.allclose(col[1], 0.0)  # miss -> 1/inf


def test_normal():
    scene = simple_scene()
    r = rays([[0, 0, 0], [0, 0, 4]], [[0, 0, 1], [0, 0, 1]])
    col = G.integrator_normal(scene, r, px(2), 0, ST)
    # triangle normal is +z for this winding: 0.5*(+z)+0.5
    assert np.allclose(col[0], [0.5, 0.5, 1.0], atol=1e-5)
    assert np.allclose(col[1], [0, 0, 0])


def test_kajiya_sky_only():
    b = SceneBuilder()
    b.add_material(albedo=(1, 1, 1))
    scene = b.build()
    r = rays([[0, 0, 0]], [[0, 1, 0]])  # straight up
    col = G.integrator_kajiya(scene, r, px(1), 0, ST)
    # miss at bounce 0: sky = mix(white, blue, 0.5*1+0.5=1) = blue
    assert np.allclose(col, [[0.2, 0.3, 0.7]], atol=1e-6)


def test_kajiya_emissive_direct():
    scene = simple_scene(emission=(2.0, 2.0, 2.0))
    r = rays([[0, 0, 0]], [[0, 0, 1]])
    st = RenderSettings(max_bounces=8)
    # Average many pixels' stochastic paths: every path picks up the direct
    # emission term 2.0 when it terminates; with the 'standard' style the
    # emission is kept even for absorbed paths.
    r_many = Ray(jnp.zeros((512, 3)), jnp.tile(jnp.array([0.0, 0.0, 1.0]), (512, 1)))
    col = G.integrator_kajiya(
        scene, r_many, px(512), 0, st.replace(style="standard")
    )
    assert np.asarray(col).mean() >= 2.0  # direct emission + bounced sky light


def test_kajiya_mirror_chain():
    """Mirror floor under an emissive ceiling: radiance = E * tint after one
    bounce."""
    b = SceneBuilder()
    m_mirror = b.add_material(albedo=(0.8, 0.8, 0.8), kind=MIRROR)
    m_emit = b.add_material(albedo=(0, 0, 0), emission=(3.0, 3.0, 3.0), kind=LAMBERT)
    b.add_plane((0, 1, 0), -1.0, m_mirror)  # floor y=-1
    b.add_triangle((-50, 5, -50), (50, 5, -50), (0, 5, 100), m_emit)  # ceiling
    scene = b.build()
    r = rays([[0, 0, 0]], [[0.6, -0.8, 0.0]])
    col = G.integrator_kajiya(scene, r, px(1), 0, RenderSettings(max_bounces=3, style="standard"))
    # path: mirror (thr=0.8) -> emissive ceiling (col += 0.8*3)
    assert np.allclose(col, [[2.4, 2.4, 2.4]], atol=1e-4)


def test_whitted_ambient_on_shadowed_lambert():
    """A Lambert floor under a huge occluder: Whitted returns ambient only."""
    b = SceneBuilder()
    m = b.add_material(albedo=(1, 1, 1), kind=LAMBERT)
    b.add_plane((0, 1, 0), -1.0, m)
    b.add_triangle((-100, 10, -100), (100, 10, -100), (0, 10, 200), m)
    scene = b.build()
    r = rays([[0, 0, 0]], [[0.0, -1.0, 0.0]])
    col = G.integrator_whitted(scene, r, px(1), 0, ST)
    assert np.allclose(col, [[G.AMBIENT] * 3], atol=1e-6)


def test_whitted_lit_lambert():
    b = SceneBuilder()
    m = b.add_material(albedo=(1.0, 1.0, 1.0), kind=LAMBERT)
    b.add_plane((0, 1, 0), -1.0, m)
    scene = b.build()
    r = rays([[0, 0, 0]], [[0.0, -1.0, 0.0]])
    col = np.asarray(G.integrator_whitted(scene, r, px(1), 0, ST))
    light_y = float(G.LIGHT_DIR[1])
    expect = G.AMBIENT + 1.0 * light_y  # albedo * intensity * cos
    assert np.allclose(col, expect, atol=1e-5)


def test_reference_termination_style():
    """Paths that exhaust the bounce budget contribute black in 'reference'
    style (integrators.glsl:675) but keep collected emission in 'standard'."""
    b = SceneBuilder()
    m = b.add_material(albedo=(0.9, 0.9, 0.9), emission=(1.0, 1.0, 1.0), kind=MIRROR)
    # mirror box: two parallel mirrors facing each other -> never terminates
    b.add_plane((0, 0, 1), 0.0, m)
    b.add_plane((0, 0, -1), -10.0, m)
    scene = b.build()
    r = rays([[0, 0, 5]], [[0, 0, 1]])
    col_ref = G.integrator_kajiya(scene, r, px(1), 0, RenderSettings(max_bounces=4))
    col_std = G.integrator_kajiya(
        scene, r, px(1), 0, RenderSettings(max_bounces=4, style="standard")
    )
    assert np.allclose(col_ref, 0.0)
    assert np.asarray(col_std).min() > 0.9  # sum of emission terms


def test_cook_lambert_two_hop():
    """Cook: Lambert scatters exactly once more then terminates on sky or
    emission."""
    b = SceneBuilder()
    m = b.add_material(albedo=(1.0, 1.0, 1.0), kind=LAMBERT)
    b.add_plane((0, 1, 0), -1.0, m)
    scene = b.build()
    n = 2048
    r = Ray(jnp.zeros((n, 3)), jnp.tile(jnp.array([0.0, -1.0, 0.0]), (n, 1)))
    col = np.asarray(G.integrator_cook(scene, r, px(n), 0, ST))
    # All scattered rays go up into the sky: mix(white, blue, y) with y the
    # *unnormalized* cosine-scatter direction (y in [0,2]) — the glsl mix
    # extrapolates, so single channels may go negative exactly like the
    # reference (clamped only at the rgba8 image store).
    assert 0.3 < col.mean() < 1.0
    assert col.max() <= 1.0 + 1e-5


def test_ao_open_plane():
    b = SceneBuilder()
    m = b.add_material(albedo=(1, 1, 1))
    b.add_plane((0, 1, 0), -1.0, m)
    scene = b.build()
    r = rays([[0, 0, 0]], [[0, -1, 0]])
    col = G.integrator_ao(scene, r, px(1), 0, RenderSettings(max_bounces=16))
    assert np.allclose(col, 1.0, atol=1e-6)  # nothing occludes a lone plane


def test_hart_heatmap_range():
    scene = simple_scene()
    r = rays([[0, 0, 0], [0, 5, 0]], [[0, 0, 1], [0, 1, 0]])
    col = np.asarray(G.integrator_hart(scene, r, px(2), 0, ST))
    assert col.min() >= 0.0
    assert col.max() <= 32.0 / 31.0 + 1e-6


def test_dielectric_straight_through():
    """A glass pane with ior=1 is invisible: ray passes straight through to an
    emissive backstop."""
    b = SceneBuilder()
    glass = b.add_material(albedo=(1.0, 1.0, 1.0), kind=DIELECTRIC, ior=1.0 + 1e-6)
    emit = b.add_material(albedo=(0, 0, 0), emission=(5.0, 5.0, 5.0), kind=LAMBERT)
    b.add_triangle((-5, -5, 2), (5, -5, 2), (0, 8, 2), glass)
    b.add_triangle((-5, -5, 4), (5, -5, 4), (0, 8, 4), emit)
    scene = b.build()
    r = rays([[0, 0, 0]], [[0, 0, 1]])
    col = G.integrator_kajiya(
        scene, r, px(1), 0, RenderSettings(max_bounces=4, style="standard")
    )
    assert np.allclose(col, 5.0, atol=0.05)
