"""On-chip probe: big-table (>4096-row) SoA-replay gradients.

Times the mesh-20482 fwd+bwd frame with the T-blocked one-hot MXU lookup
(`replay_soa._gather_mm_big` / `_segsum_mm_big`) and, with --check, compares
loss + grad norms against the plain-gather fallback path on the same chip.

Usage: python benchmarks/bigtable_grad_probe.py [--check] [--subdiv N]
"""

from __future__ import annotations

import argparse
import sys
import time

import jax
import jax.numpy as jnp


def run(subdiv: int, check: bool) -> None:
    from rvpt_tpu import FilmConfig
    from rvpt_tpu.core import rng
    from rvpt_tpu.models import camera as camera_mod
    from rvpt_tpu.ops.fast_grad import make_fast_kajiya
    from rvpt_tpu.render import _block_grid
    from rvpt_tpu.scene import builtin
    from rvpt_tpu.train.inverse import apply_params, trainable_params
    from rvpt_tpu.utils import compile_cache

    compile_cache.enable()
    cfg = FilmConfig(width=1920, height=1080)
    scene, cam = builtin.mesh_demo(subdiv=subdiv, aspect=cfg.aspect)
    print(f"triangles: {scene.num_triangles}", file=sys.stderr)

    pixel_np, _ = _block_grid(cfg.width, cfg.height)
    pixel = jnp.asarray(pixel_np)
    bxs = pixel % jnp.uint32(cfg.width)
    bys = pixel // jnp.uint32(cfg.width)
    jb, _ = rng.uniform2(pixel, jnp.uint32(0), jnp.uint32(0))
    cx = (bxs.astype(jnp.float32) + jb) / cfg.width
    cy = 1.0 - (bys.astype(jnp.float32) + jb) / cfg.height
    ray = camera_mod.generate_rays(cam, cx, cy)

    trace = make_fast_kajiya(scene, 16, 8, style="standard")

    def loss_fn(params, frame):
        s = apply_params(scene, params)
        img = trace(s, ray.origin, ray.direction, pixel, frame)
        return jnp.mean(img)

    def measure(tag):
        fn = jax.jit(jax.value_and_grad(loss_fn))
        params = trainable_params(scene)
        t0 = time.perf_counter()
        loss, grads = fn(params, jnp.uint32(0))
        jax.block_until_ready((loss, grads))
        print(f"[{tag}] compile+first {time.perf_counter()-t0:.1f}s "
              f"loss={float(loss):.6f}", file=sys.stderr)
        t0 = time.perf_counter()
        iters = 3
        for _ in range(iters):
            loss, grads = fn(params, jnp.uint32(1))
        jax.block_until_ready((loss, grads))
        dt = (time.perf_counter() - t0) / iters
        mrays = cfg.width * cfg.height * 8 / dt / 1e6
        print(f"[{tag}] {dt*1e3:.2f} ms/frame -> {mrays:.1f} Mrays/s",
              file=sys.stderr)
        return float(loss), grads

    from rvpt_tpu.ops import replay_soa as rs

    loss_new, g_new = measure("blocked-mm")

    if check:
        saved = rs._SEG_MM_BIG_MAX
        rs._SEG_MM_BIG_MAX = rs._SEG_MM_MAX  # force the gather fallback
        try:
            loss_old, g_old = measure("gather")
        finally:
            rs._SEG_MM_BIG_MAX = saved
        print(f"loss delta: {abs(loss_new - loss_old):.3e}", file=sys.stderr)
        leaves_n = jax.tree.leaves(g_new)
        leaves_o = jax.tree.leaves(g_old)
        worst = 0.0
        for a, b in zip(leaves_n, leaves_o):
            na = float(jnp.linalg.norm(a.astype(jnp.float32)))
            nb = float(jnp.linalg.norm(b.astype(jnp.float32)))
            d = float(jnp.linalg.norm(
                (a - b).astype(jnp.float32)))
            rel = d / max(nb, 1e-12)
            worst = max(worst, rel)
            print(f"  grad leaf norms new={na:.6e} old={nb:.6e} "
                  f"rel-delta={rel:.3e}", file=sys.stderr)
        print(f"worst rel grad delta: {worst:.3e}", file=sys.stderr)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--subdiv", type=int, default=5)
    args = ap.parse_args()
    run(args.subdiv, args.check)
