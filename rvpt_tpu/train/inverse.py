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


def _make_fast_render(scene_tpl, camera, settings, cfg, mesh, interpret):
    """Image-valued render closure backed by the custom-VJP path kernel
    (ops.fast_grad): forward = fused whole-path kernel, backward = fused
    Pallas pullback.  With a mesh, runs per-shard inside shard_map — the
    shard_map transpose psums the replicated scene cotangent across chips."""
    import jax
    from jax.sharding import PartitionSpec as P

    from ..core import rng as rng_mod
    from ..models import camera as camera_mod
    from ..models.integrators import AA_STRIDE
    from ..ops.fast_grad import make_fast_kajiya
    from ..render import _INTEGRATOR_SITE, _JITTER_SITE, _pixel_grid

    trace = make_fast_kajiya(
        scene_tpl, _INTEGRATOR_SITE, settings.max_bounces,
        style=settings.style, interpret=interpret,
    )

    def shade(pixel, xs, ys, s, frame, salt_off):
        ju, jv = rng_mod.uniform2(pixel, frame, salt_off + jnp.uint32(_JITTER_SITE))
        cx = (xs.astype(jnp.float32) + ju) / cfg.width
        cy = 1.0 - (ys.astype(jnp.float32) + jv) / cfg.height
        ray = camera_mod.generate_rays(camera, cx, cy)
        img = trace(s, ray.origin, ray.direction, pixel, frame, salt=salt_off)
        return img.T  # [3, n]

    if mesh is None:

        def render_fast(s, frame):
            # Grids are built INSIDE the traced function: closing over 2M-
            # element concrete arrays embeds them as XLA constants, which
            # blows compile time up ~20x (measured 121s vs 5.5s at 1080p).
            pixel, xs, ys = _pixel_grid(cfg)
            out = shade(pixel, xs, ys, s, frame, jnp.uint32(0))
            return out.reshape(3, cfg.height, cfg.width)

        return render_fast

    from functools import partial as _partial

    from ..parallel.mesh import SPP_AXIS, TILE_AXIS
    from ..parallel.sharded import _padded_grid

    n_tiles = mesh.shape[TILE_AXIS]
    n_spp = mesh.shape[SPP_AXIS]
    n = cfg.num_pixels

    @_partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(TILE_AXIS), P(TILE_AXIS), P(TILE_AXIS), P(), P()),
        out_specs=P(None, TILE_AXIS), check_vma=False,
    )
    def tile(pixel, xs, ys, s, frame):
        rank = jax.lax.axis_index(SPP_AXIS).astype(jnp.uint32)
        out = shade(pixel, xs, ys, s, frame,
                    rank * jnp.uint32(settings.aa * AA_STRIDE))
        if n_spp > 1:
            out = jax.lax.pmean(out, SPP_AXIS)
        return out

    def render_fast(s, frame):
        # Grids built inside the trace (see the single-device comment).
        pixel, xs, ys, _ = _padded_grid(cfg, n_tiles)
        return tile(pixel, xs, ys, s, frame)[:, :n].reshape(
            3, cfg.height, cfg.width
        )

    return render_fast


def _fast_eligible(scene, settings: RenderSettings) -> bool:
    from ..render import _megakernel_eligible

    return settings.aa == 1 and _megakernel_eligible(scene, settings)


def make_train_step(scene, camera, settings: RenderSettings, cfg: FilmConfig,
                    mesh, target, learning_rate: float = 2e-2, fast="auto"):
    """Build (jitted step fn, initial optimizer state) for sharded training.

    ``target`` is channels-first f32[3,H,W] (the film layout).
    step(params, opt_state, frame) -> (params, opt_state, loss); ``frame``
    varies the RNG stream per iteration so Monte-Carlo noise decorrelates
    across optimizer steps (stochastic gradient estimates).

    ``fast``: "auto" uses the custom-VJP path-kernel renderer when the scene/
    settings fit it and the backend runs Pallas; True forces it (compiled),
    "interpret" forces it with interpreted kernels (CPU tests); False uses
    the XLA integrator path.
    """
    opt = optax.adam(learning_rate)
    opt_state = opt.init(trainable_params(scene))

    use_fast = (
        _fast_eligible(scene, settings) if fast == "auto" else bool(fast)
    )
    if use_fast:
        render_fast = _make_fast_render(
            scene, camera, settings, cfg, mesh, interpret=fast == "interpret"
        )

    def render(p, frame):
        s = apply_params(scene, p)
        if use_fast:
            return render_fast(s, frame)
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
