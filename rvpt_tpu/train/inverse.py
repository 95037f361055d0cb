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

    @jax.jit
    def step(params, opt_state, frame):
        def loss_fn(p):
            s = apply_params(scene, p)
            if mesh is not None:
                img = render_sample_sharded(s, camera, settings, cfg, frame, mesh)
            else:
                img = render_sample_chw(s, camera, settings, cfg, frame)
            return jnp.mean(jnp.square(img - target))

        loss, grads = jax.value_and_grad(loss_fn)(params)
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
