"""Headline benchmark: Mrays/s/chip, forward+backward, Cornell 1080p 1spp.

Prints exactly ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no numbers (BASELINE.md), so ``vs_baseline``
normalizes against the reference's implied real-time envelope: its fixed
1024x512 film at 8 bounces and 60 fps = 1024*512*8*60 ~= 252 Mrays/s
(src/rvpt/main.cpp:96-97, rvpt.h:79; a mid-range Vulkan GPU holds 60fps on
the demo scene).  value/vs_baseline therefore reads "x times the reference's
whole-frame ray throughput, while ALSO computing gradients".

Ray accounting: the wavefront design traces every lane at every bounce
(masked), so traced rays = H*W*aa*max_bounces per frame — the work actually
executed, not an upper bound.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp


def main() -> None:
    from rvpt_tpu import FilmConfig, RenderSettings
    from rvpt_tpu.render import render_sample_chw
    from rvpt_tpu.scene import builtin
    from rvpt_tpu.train.inverse import apply_params, trainable_params

    width, height, bounces, aa = 1920, 1080, 4, 1
    cfg = FilmConfig(width=width, height=height)
    settings = RenderSettings(max_bounces=bounces, aa=aa, style="standard")
    scene, camera = builtin.cornell_box(aspect=cfg.aspect)

    def loss_fn(params, frame):
        s = apply_params(scene, params)
        img = render_sample_chw(s, camera, settings, cfg, frame)
        return jnp.mean(img)

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    params = trainable_params(scene)

    # Warmup / compile.
    t0 = time.perf_counter()
    loss, grads = grad_fn(params, jnp.uint32(0))
    jax.block_until_ready((loss, grads))
    compile_s = time.perf_counter() - t0
    print(f"compile+first-step: {compile_s:.1f}s loss={float(loss):.4f}", file=sys.stderr)

    iters = 5
    t0 = time.perf_counter()
    for i in range(iters):
        loss, grads = grad_fn(params, jnp.uint32(i + 1))
    jax.block_until_ready((loss, grads))
    dt = (time.perf_counter() - t0) / iters

    rays = width * height * aa * bounces
    mrays = rays / dt / 1e6
    baseline_mrays = 1024 * 512 * 8 * 60 / 1e6  # ~252: reference envelope
    print(
        f"fwd+bwd: {dt*1e3:.1f} ms/frame on {jax.devices()[0].platform} "
        f"({jax.devices()[0]}), {mrays:.1f} Mrays/s", file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "cornell_1080p_fwd_bwd",
                "value": round(mrays, 2),
                "unit": "Mrays/s/chip",
                "vs_baseline": round(mrays / baseline_mrays, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
