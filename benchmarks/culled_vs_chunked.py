"""A/B: SMEM culled fused whole-path kernel vs the chunked DMA path at
small-mesh scale (ico3, 1,282 tris; 1080p x 8 bounces).

The culled path folds triangles with per-triangle SMEM scalar loads inside
ONE whole-path launch (no sorts, no per-bounce relaunch); the chunked path
pays per-bounce launches + optional sorts but folds via the row-sliced
VMEM table (_culled_tris_rows) and walks only per-tile listed work.
Round-1 recorded the culled path at ~150 ms; this measures whether the
(tiles,)-grid DMA kernel's low floor flips the winner.

Run on TPU:
  PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/culled_vs_chunked.py
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp


def bench(fn, iters=4):
    t0 = time.perf_counter()
    out = fn(jnp.uint32(0))
    out.block_until_ready()
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(jnp.uint32(i + 1))
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    print(f"    [sum={float(out):.1f}]", flush=True)
    if dt < 0.01:
        t0 = time.perf_counter()
        for i in range(iters):
            out = fn(jnp.uint32(i + 1))
        out.block_until_ready()
        dt = (time.perf_counter() - t0) / iters
    return dt, compile_s


def main():
    from rvpt_tpu import FilmConfig, RenderSettings
    from rvpt_tpu.ops import pathkernel as pk
    from rvpt_tpu.render import render_sample_fast_chw
    from rvpt_tpu.scene import builtin
    from rvpt_tpu.utils import compile_cache

    compile_cache.enable()
    cfg = FilmConfig(width=1920, height=1080)
    st = RenderSettings(max_bounces=8, aa=1, style="reference")
    scene, cam = builtin.mesh_demo(subdiv=3, aspect=cfg.aspect)
    print(f"tris={scene.num_triangles}")

    # (a) current culled path
    fn = jax.jit(lambda f: render_sample_fast_chw(
        scene, cam, st, cfg, f).sum())
    dt, cs = bench(fn)
    print(f"culled fused      {dt*1e3:8.1f} ms/frame (compile {cs:.0f}s)",
          flush=True)

    # (b) chunked DMA path forced (threshold below the mesh size), with
    # different sort budgets
    pk.CULL_MAX_TRIS = 512
    assert pk.is_bigmesh(scene)
    from rvpt_tpu.render import _block_grid, jittered_camera_rays

    for sortb in (0, 1, 2, 3):
        @jax.jit
        def fn(frame, _sortb=sortb):
            pixel, _ = _block_grid(cfg.width, cfg.height,
                                   *pk.bigmesh_block_dims())
            xs = pixel % jnp.uint32(cfg.width)
            ys = pixel // jnp.uint32(cfg.width)
            bt = pk.BigMeshTracer(scene)
            ray = jittered_camera_rays(cam, cfg, pixel, xs, ys, frame,
                                       jnp.uint32(0))
            r, g, b = bt.trace(
                pixel, ray.origin, ray.direction, frame,
                salt_base=jnp.uint32(16), max_bounces=8,
                sort_rays=_sortb > 0, sort_bounces=_sortb,
            )
            return r.sum() + g.sum() + b.sum()

        dt, cs = bench(fn)
        print(f"chunked sortb={sortb}  {dt*1e3:8.1f} ms/frame "
              f"(compile {cs:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
