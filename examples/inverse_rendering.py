"""Inverse rendering demo (BASELINE.md config 5):

Recover the Cornell box's wall albedos and light emission by gradient descent
through the path tracer.  A ground-truth render is the target; the optimizer
starts from wrong materials and converges by pixel-MSE gradients that flow
through intersection, shading, and the Monte-Carlo estimator (detached
noise).  Runs sharded over all available devices.

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/inverse_rendering.py
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from rvpt_tpu import FilmConfig, RenderSettings
from rvpt_tpu.parallel import mesh as mesh_mod
from rvpt_tpu.parallel.sharded import render_sample_sharded
from rvpt_tpu.scene import builtin
from rvpt_tpu.train import inverse
from rvpt_tpu.utils.image import write_png


def main():
    cfg = FilmConfig(width=96, height=96)
    settings = RenderSettings(max_bounces=4, aa=1, style="standard")
    scene_true, camera = builtin.cornell_box(aspect=cfg.aspect)

    n_dev = len(jax.devices())
    mesh = mesh_mod.make_mesh(n_dev, 1) if n_dev > 1 else None

    # Ground truth: average several frames to tame Monte-Carlo noise.
    frames = 8
    target = jnp.zeros((3, cfg.height, cfg.width))
    for f in range(frames):
        if mesh is not None:
            img = render_sample_sharded(scene_true, camera, settings, cfg, f, mesh)
        else:
            from rvpt_tpu.render import render_sample_chw

            img = render_sample_chw(scene_true, camera, settings, cfg, f)
        target = target + img / frames

    # Perturb: gray walls, dimmed light.
    mats = scene_true.materials
    init_albedo = jnp.full_like(mats.albedo, 0.5)
    init_emission = mats.emission * 0.25
    scene_init = inverse.apply_params(
        scene_true, {"materials.albedo": init_albedo,
                     "materials.emission": init_emission}
    )

    scene_rec, losses, _ = inverse.recover(
        scene_init, camera, settings, cfg, mesh, target,
        steps=400, learning_rate=3e-2, log_every=50,
    )
    # NOTE: the reported per-step loss compares a single noisy sample to the
    # target, so it contains the Monte-Carlo variance (which GROWS as the
    # recovered emission brightens toward truth) — judge convergence by the
    # parameter errors below, not the loss curve.

    err_albedo = float(jnp.abs(
        scene_rec.materials.albedo - scene_true.materials.albedo
    ).max())
    err_emission = float(jnp.abs(
        scene_rec.materials.emission - scene_true.materials.emission
    ).max())
    print(f"final loss {losses[-1]:.6f}")
    print(f"max albedo error {err_albedo:.3f}  max emission error {err_emission:.3f}")

    os.makedirs("out", exist_ok=True)
    write_png("out/inverse_target.png", np.moveaxis(np.asarray(target), 0, -1))
    from rvpt_tpu.render import render_sample_chw

    img = render_sample_chw(scene_rec, camera, settings, cfg, 999)
    write_png("out/inverse_recovered.png", np.moveaxis(np.asarray(img), 0, -1))
    return err_albedo


if __name__ == "__main__":
    main()
