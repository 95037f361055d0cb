"""Big-mesh scaling benchmark: chunked kernel, with/without wavefront sort.

Measures the display path's core loop (BigMeshTracer, block-grid pixels,
in-XLA raygen) at 1080p x 8 bounces over three mesh sizes:

  icosphere subdiv 5   20,482 tris
  icosphere subdiv 6   81,920 tris
  terrain n=225       100,354 tris (incl. light quad; >=100k-tri OBJ class)

Every comparison is same-process (the TPU tunnel drifts ~25% between
sessions, BASELINE.md).  Run on the TPU with the ambient env:

  python benchmarks/bigmesh_scaling.py [--quick]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp


SORT_BOUNCES = 3


def make_fn(scene, cam, cfg, bounces, sort, cull=True):
    from rvpt_tpu.render import _block_grid, jittered_camera_rays
    from rvpt_tpu.ops.pathkernel import BigMeshTracer, bigmesh_block_dims

    @jax.jit
    def fn(frame):
        # Grid + raygen INSIDE the trace: closed-over 1080p id arrays bake
        # in as ~50 MB of HLO literals and multiply remote-compile time.
        pixel, _meta = _block_grid(cfg.width, cfg.height,
                                   *bigmesh_block_dims())
        xs = pixel % jnp.uint32(cfg.width)
        ys = pixel // jnp.uint32(cfg.width)
        bt = BigMeshTracer(scene)
        ray = jittered_camera_rays(cam, cfg, pixel, xs, ys, frame,
                                   jnp.uint32(0))
        r, g, b = bt.trace(
            pixel, ray.origin, ray.direction, frame,
            salt_base=jnp.uint32(16), max_bounces=bounces, sort_rays=sort,
            tile_cull=cull, sort_bounces=SORT_BOUNCES,
        )
        return r.sum() + g.sum() + b.sum()

    return fn


def bench(fn, iters):
    t0 = time.perf_counter()
    out = fn(jnp.uint32(0))
    out.block_until_ready()
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(jnp.uint32(i + 1))
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    # The tunnel occasionally reports ~0 ms after very long (>350 s)
    # compiles — a transport artifact, not a real measurement.  Surface
    # the result value so bogus runs are detectable, and retry once.
    print(f"    [sum={float(out):.1f}]", flush=True)
    if dt < 0.01:
        t0 = time.perf_counter()
        for i in range(iters):
            out = fn(jnp.uint32(i + 1))
        out.block_until_ready()
        dt = (time.perf_counter() - t0) / iters
        print(f"    [retry after bogus ~0 ms: {dt*1e3:.1f} ms]", flush=True)
    return dt, compile_s


def main():
    from rvpt_tpu import FilmConfig
    from rvpt_tpu.scene import builtin
    from rvpt_tpu.utils import compile_cache

    compile_cache.enable()
    quick = "--quick" in sys.argv
    for a in sys.argv[1:]:
        # A/B lever: smaller clusters list tighter (fewer triangles walked)
        # at the cost of more listing tests; see BASELINE.md.
        if a.startswith("--cullk="):
            from rvpt_tpu.ops import pathkernel as pk

            pk.BIG_CULL_K = int(a.split("=")[1])
            pk.BIG_CHUNK_CLU = pk.BIG_CHUNK_T // pk.BIG_CULL_K
            pk.BIG_CHUNK_SUP = pk.BIG_CHUNK_CLU // pk.CULL_G
            print(f"BIG_CULL_K={pk.BIG_CULL_K}")
        # A/B lever: bigger chunks halve the (tiles x chunks) grid floor
        # and the work-list cost, at coarser tile-cull granularity and a
        # 2x VMEM block (BIG_CHUNK_T=8192 -> 4 MB x2 buffers).
        if a.startswith("--chunkt="):
            from rvpt_tpu.ops import pathkernel as pk

            pk.BIG_CHUNK_T = int(a.split("=")[1])
            pk.BIG_CHUNK_CLU = pk.BIG_CHUNK_T // pk.BIG_CULL_K
            pk.BIG_CHUNK_SUP = pk.BIG_CHUNK_CLU // pk.CULL_G
            print(f"BIG_CHUNK_T={pk.BIG_CHUNK_T}")
        if a.startswith("--sortb="):
            global SORT_BOUNCES
            SORT_BOUNCES = int(a.split("=")[1])
            print(f"sort_bounces={SORT_BOUNCES}")
        # A/B lever: (tiles,)-grid manual-DMA chunk loop vs the
        # (tiles, chunks) pipeline (pathkernel.BIG_DMA_GRID).
        if a.startswith("--dma="):
            from rvpt_tpu.ops import pathkernel as pk

            pk.BIG_DMA_GRID = a.split("=")[1] not in ("0", "false")
            print(f"BIG_DMA_GRID={pk.BIG_DMA_GRID}")
        # A/B lever: block-major narrow ray tiles (BIG_S x BIG_L rays per
        # tile; 128 lanes = 1024 consecutive post-sort rays per tile).
        if a.startswith("--biglanes="):
            from rvpt_tpu.ops import pathkernel as pk

            pk.BIG_L = int(a.split("=")[1])
            print(f"BIG_L={pk.BIG_L} (tile={pk.BIG_S * pk.BIG_L} rays, "
                  f"block={pk.bigmesh_block_dims()})")
        # A/B lever: per-sub-block triangle fold (round 5) vs tile-wide.
        if a.startswith("--subfold="):
            from rvpt_tpu.ops import pathkernel as pk

            pk.BIG_SUBFOLD = a.split("=")[1] not in ("0", "false")
            print(f"BIG_SUBFOLD={pk.BIG_SUBFOLD}")
    cfg = FilmConfig(width=1920, height=1080)
    bounces = 8
    rays = cfg.num_pixels * bounces

    scenes = [("ico5", *builtin.mesh_demo(subdiv=5, aspect=cfg.aspect))]
    if not quick:
        scenes += [
            ("ico6", *builtin.mesh_demo(subdiv=6, aspect=cfg.aspect)),
            ("terrain225", *builtin.terrain_demo(n=225, aspect=cfg.aspect)),
        ]

    results = {}
    for name, scene, cam in scenes:
        combos = ([(True, True), (True, False)] if name == "ico5"
                  else [(True, True)])
        for sort, cull in combos:
            iters = 4 if (sort and cull) else 2
            fn = make_fn(scene, cam, cfg, bounces, sort, cull)
            dt, compile_s = bench(fn, iters)
            tag = (f"{name}[{scene.num_triangles}]"
                   f"{'+sort' if sort else ''}{'+cull' if cull else ''}")
            results[tag] = dt
            print(
                f"{tag:28s} {dt*1e3:9.1f} ms/frame "
                f"{rays/dt/1e6:8.1f} Mrays/s  (compile {compile_s:.1f}s)",
                flush=True,
            )
    print(results)


if __name__ == "__main__":
    main()
