"""Probe: per-tile chunk work-list selectivity of the big-mesh tile cull.

Runs BigMeshTracer bounce-by-bounce (unjitted outer loop) on the TPU and
prints, per bounce, the mean/max listed-chunk count and the fraction of idle
tiles — at the production chunk size and optionally a finer one — to show
where the cull has headroom.  Usage:

  python benchmarks/bigmesh_cull_probe.py [subdiv] [chunk_t]
"""

from __future__ import annotations

import sys

import jax.numpy as jnp
import numpy as np


def main():
    subdiv = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    chunk_t = int(sys.argv[2]) if len(sys.argv) > 2 else 0

    from rvpt_tpu import FilmConfig
    from rvpt_tpu.ops import pathkernel as pk
    from rvpt_tpu.render import _block_grid, jittered_camera_rays
    from rvpt_tpu.scene import builtin
    from rvpt_tpu.utils import compile_cache

    compile_cache.enable()
    if chunk_t:
        pk.BIG_CHUNK_T = chunk_t
        pk.BIG_CHUNK_CLU = chunk_t // pk.BIG_CULL_K
        pk.BIG_CHUNK_SUP = max(1, chunk_t // pk.BIG_CULL_K // pk.CULL_G)

    cfg = FilmConfig(width=1920, height=1080)
    scene, cam = builtin.mesh_demo(subdiv=subdiv, aspect=cfg.aspect)
    bt = pk.BigMeshTracer(scene)
    n_chunks = bt.meta["n_chunks"]
    print(f"subdiv={subdiv} tris={scene.num_triangles} "
          f"chunk_t={pk.BIG_CHUNK_T} n_chunks={n_chunks}")

    pixel_np, _ = _block_grid(cfg.width, cfg.height)
    pixel = jnp.asarray(pixel_np)
    xs = pixel % jnp.uint32(cfg.width)
    ys = pixel // jnp.uint32(cfg.width)
    frame = jnp.uint32(0)
    ray = jittered_camera_rays(cam, cfg, pixel, xs, ys, frame, jnp.uint32(0))

    pix = pk._to_tiles(pixel)
    o = ray.origin
    d = ray.direction
    ones = jnp.ones_like(pix, jnp.float32)
    zeros = jnp.zeros_like(pix, jnp.float32)
    state = tuple(
        pk._to_tiles(v)
        for v in (o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2])
    ) + (ones, ones, ones, zeros, zeros, zeros, zeros, zeros, zeros, ones)
    # Cluster boxes (leaf order) for the per-group union measurement.
    t = scene.num_triangles
    tp = -(-t // pk.CULL_K) * pk.CULL_K
    bmin = jnp.minimum(jnp.minimum(scene.tri_v0, scene.tri_v1), scene.tri_v2)
    bmax = jnp.maximum(jnp.maximum(scene.tri_v0, scene.tri_v1), scene.tri_v2)
    bmin = jnp.pad(bmin, ((0, tp - t), (0, 0)), mode="edge")
    bmax = jnp.pad(bmax, ((0, tp - t), (0, 0)), mode="edge")
    clo = jnp.min(bmin.reshape(-1, pk.CULL_K, 3), axis=1)
    chi = jnp.max(bmax.reshape(-1, pk.CULL_K, 3), axis=1)

    def group_unions(state, n_groups=8):
        """Per-tile cluster-union size: whole tile vs per-128-lane group."""
        ox, oy, oz, dx, dy, dz = state[:6]
        live = state[15] > 0.0

        def inv(c):
            return 1.0 / jnp.where(jnp.abs(c) < 1e-30, 1e-30, c)

        ivx, ivy, ivz = inv(dx), inv(dy), inv(dz)
        gshape = ox.shape[:1] + (n_groups, -1)

        def one(args):
            lo, hi = args
            fx0 = (lo[0] - ox) * ivx
            fx1 = (hi[0] - ox) * ivx
            fy0 = (lo[1] - oy) * ivy
            fy1 = (hi[1] - oy) * ivy
            fz0 = (lo[2] - oz) * ivz
            fz1 = (hi[2] - oz) * ivz
            t0 = jnp.maximum(jnp.maximum(jnp.minimum(fx0, fx1),
                                         jnp.minimum(fy0, fy1)),
                             jnp.maximum(jnp.minimum(fz0, fz1), 0.0))
            t1 = jnp.minimum(jnp.minimum(jnp.maximum(fx0, fx1),
                                         jnp.maximum(fy0, fy1)),
                             jnp.maximum(fz0, fz1))
            ok = (t1 >= t0) & live  # [grid, S, L]
            # Grouping A: lane slices [S, 128] of the tile (vreg-shaped in
            # the CURRENT layout; 8 interleaved 128-ray runs of sort order).
            oka = jnp.any(ok.reshape(ok.shape[0], ok.shape[1], n_groups, -1),
                          axis=(1, 3))       # [grid, n_groups]
            # Grouping B: sublane rows = 1024 CONTIGUOUS sorted rays (what a
            # vreg group would hold after an interleave transpose).
            okb = jnp.any(ok, axis=2)        # [grid, S]
            return jnp.any(okb, axis=1), oka, okb

        tile_any, grp_a, grp_b = __import__("jax").lax.map(one, (clo, chi))
        # tile union, and sum over groups of per-group unions
        return (tile_any.sum(axis=0), grp_a.sum(axis=(0, 2)),
                grp_b.sum(axis=(0, 2)))

    shape = pix.shape
    nb = 8
    for b in range(nb):
        wl, cnt = pk._bigmesh_chunk_worklist(state, *bt.sup_boxes, 0.0)
        c = np.asarray(cnt)
        u_tile, u_a, u_b = (np.asarray(v) for v in group_unions(state))
        print(f"bounce {b}: cnt mean {c.mean():5.2f} max {c.max():2d} "
              f"idle tiles {(c == 0).mean():.2f} "
              f"live rays {np.asarray(state[15]).mean():.2f} "
              f"clu/tile {u_tile.mean():6.1f} "
              f"grpA win {8 * u_tile.sum() / max(u_a.sum(), 1):4.2f}x "
              f"grpB win {8 * u_tile.sum() / max(u_b.sum(), 1):4.2f}x")
        outs = pk._bigmesh_call(
            frame, jnp.uint32(16 + b * 4), bt.tables, bt.chunk_tables,
            pix, state, wl, cnt, bt.meta_key, 0.0, "reference",
            b == nb - 1, False, False,
        )
        state = outs[:16]
        if b < nb - 1:
            key = pk._bigmesh_sort_key(state, bt._box_lo, bt._box_inv)
            ops = [key.reshape(-1), pix.reshape(-1)]
            ops += [s.reshape(-1) for s in state]
            srt = __import__("jax").lax.sort(ops, num_keys=1)
            pix = srt[1].reshape(shape)
            state = tuple(s.reshape(shape) for s in srt[2:])


if __name__ == "__main__":
    main()
