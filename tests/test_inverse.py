"""Inverse rendering convergence (BASELINE.md config 5, small scale)."""

import jax.numpy as jnp
import numpy as np

from rvpt_tpu import FilmConfig, RenderSettings
from rvpt_tpu.render import render_sample_chw
from rvpt_tpu.scene.materials import LAMBERT
from rvpt_tpu.scene.scene import SceneBuilder
from rvpt_tpu.train import inverse


def _emissive_scene(emission):
    b = SceneBuilder()
    b.add_material(albedo=(0.0, 0.0, 0.0), emission=emission, kind=LAMBERT)
    b.add_triangle((-4, -4, 3), (4, -4, 3), (0, 6, 3), 0)
    return b.build()


def test_recover_emission_direct():
    """A directly-visible emissive triangle: emission is recovered by the
    dual-buffer gradient estimator."""
    from rvpt_tpu.models.camera import Camera

    cfg = FilmConfig(width=24, height=24)
    st = RenderSettings(max_bounces=1, style="standard")
    cam = Camera.create(aspect=1.0, fov=90.0)
    true_em = (2.0, 1.0, 0.5)
    scene_true = _emissive_scene(true_em)
    target = render_sample_chw(scene_true, cam, st, cfg, 0)

    scene_init = _emissive_scene((0.2, 0.2, 0.2))
    rec, losses = inverse.recover(
        scene_init, cam, st, cfg, None, target, steps=120, learning_rate=5e-2
    )
    got = np.asarray(rec.materials.emission)[0]
    assert np.allclose(got, true_em, atol=0.15), f"recovered {got}"


def test_dual_estimator_unbiased_direction():
    """At the true parameters the expected gradient is ~0; with dimmed
    emission it points back toward the truth (negative for emission)."""
    import dataclasses

    import jax

    from rvpt_tpu.models.camera import Camera

    cfg = FilmConfig(width=16, height=16)
    st = RenderSettings(max_bounces=1, style="standard")
    cam = Camera.create(aspect=1.0, fov=90.0)
    scene_true = _emissive_scene((2.0, 2.0, 2.0))
    target = render_sample_chw(scene_true, cam, st, cfg, 0)

    step, opt_state = inverse.make_train_step(
        scene_true, cam, st, cfg, None, target
    )
    # run one step from a dimmed start: emission must increase
    params = inverse.trainable_params(scene_true)
    dim = dict(params, emission=params["emission"] * 0.3)
    new_params, _, _ = step(dim, opt_state, jnp.uint32(0))
    assert float(new_params["emission"][0, 0]) > float(dim["emission"][0, 0])
