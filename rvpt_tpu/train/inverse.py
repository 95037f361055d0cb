"""Inverse rendering: recover scene parameters by gradient descent through
the path tracer (BASELINE.md config 5 / north star).

The forward model is the same sharded renderer used for display; gradients
w.r.t. the replicated material parameters are psum'd across the mesh by
shard_map's transpose, and optax applies the update — the reference has no
counterpart (its closest state is the temporal accumulation buffer).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import optax

from ..config import FilmConfig, RenderSettings
from ..parallel.sharded import render_sample_sharded
from ..render import render_sample_chw
from ..scene.scene import Scene


def trainable_params(scene: Scene) -> dict:
    """The differentiable leaves targeted by inverse rendering: material
    albedo and emission (the BASELINE.md interior-parameter targets)."""
    return {
        "albedo": scene.materials.albedo,
        "emission": scene.materials.emission,
    }


def apply_params(scene: Scene, params: dict) -> Scene:
    mats = dataclasses.replace(
        scene.materials,
        albedo=params["albedo"],
        emission=params["emission"],
    )
    return dataclasses.replace(scene, materials=mats)


def make_train_step(scene, camera, settings: RenderSettings, cfg: FilmConfig,
                    mesh, target, learning_rate: float = 2e-2):
    """Build (jitted step fn, initial optimizer state) for sharded training.

    ``target`` is channels-first f32[3,H,W] (the film layout).
    step(params, opt_state, frame) -> (params, opt_state, loss); ``frame``
    varies the RNG stream per iteration so Monte-Carlo noise decorrelates
    across optimizer steps (stochastic gradient estimates).
    """
    opt = optax.adam(learning_rate)
    opt_state = opt.init(trainable_params(scene))

    def render(p, frame):
        s = apply_params(scene, p)
        if mesh is not None:
            return render_sample_sharded(s, camera, settings, cfg, frame, mesh)
        return render_sample_chw(s, camera, settings, cfg, frame)

    @jax.jit
    def step(params, opt_state, frame):
        # Unbiased gradient of the squared error of the MEAN image via two
        # independent Monte-Carlo samples (the standard dual-buffer estimator
        # of differentiable rendering):
        #   d/dp E[X-t]^2 = 2 E[X - t] * dE[X]/dp  ~  2 (X_a - t) . dX_b/dp
        # A single-sample value_and_grad instead optimizes E[(X-t)^2] =
        # (E[X]-t)^2 + Var[X], whose variance term pulls emission DOWN (dim
        # scenes are less noisy) — observed as divergence on the Cornell box.
        img_a = jax.lax.stop_gradient(render(params, frame * 2 + 4096))
        img_b, vjp_fn = jax.vjp(lambda p: render(p, frame * 2 + 4097), params)
        residual = 2.0 * (img_a - target) / img_a.size
        (grads,) = vjp_fn(residual)
        loss = jnp.mean(jnp.square(img_a - target))
        updates, opt_state2 = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        # keep albedo physical
        params["albedo"] = jnp.clip(params["albedo"], 0.0, 1.0)
        params["emission"] = jnp.maximum(params["emission"], 0.0)
        return params, opt_state2, loss

    return step, opt_state


def recover(scene_init, camera, settings, cfg, mesh, target, steps=100,
            learning_rate=2e-2, log_every=0):
    """Run the optimization loop; returns (final scene, loss history)."""
    step, opt_state = make_train_step(
        scene_init, camera, settings, cfg, mesh, target, learning_rate
    )
    params = trainable_params(scene_init)
    losses = []
    for i in range(steps):
        params, opt_state, loss = step(params, opt_state, jnp.uint32(i))
        losses.append(float(loss))
        if log_every and i % log_every == 0:
            print(f"step {i}: loss {losses[-1]:.6f}")
    return apply_params(scene_init, params), losses
