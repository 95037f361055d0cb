"""Probe: how much does sub-tile cull granularity shrink the walked set?

The chunked big-mesh kernel lists clusters per [8,1024]-ray TILE under
any-lane semantics (BASELINE.md: after one Lambert bounce a tile's union is
~20-30% of all clusters).  This probe replays the real bounce loop (same
kernel, same sort) and, between bounces, measures the cluster-listing count
at three granularities in pure JAX:

  tile   8192 rays  — what the kernel walks today (sum over tiles)
  blockL 1024 rays  — lane-blocks b: flat ids {s*1024 + 128b + l} (the
                      grouping a [S,128] vreg slice gives under the CURRENT
                      tile layout: 8 scattered 128-runs)
  blockM 1024 rays  — block-major: 1024 CONSECUTIVE post-sort rays (the
                      grouping a [S,128] slice gives if tiles are laid out
                      block-major)

Fold work is proportional to sum(listed)/granularity-factor, so the
headline is the ratio of per-bounce total listed counts: tile vs 8x blocks.

Run on TPU: python benchmarks/bigmesh_block_probe.py [--subdiv=5]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

S, L = 8, 1024
NB = 8


def cluster_bounds(scene):
    """Leaf-order cluster AABBs exactly as pack_cull_chunked builds them."""
    from rvpt_tpu.ops.pathkernel import CULL_K

    t = scene.num_triangles
    tp = -(-t // CULL_K) * CULL_K
    bmin = jnp.minimum(jnp.minimum(scene.tri_v0, scene.tri_v1), scene.tri_v2)
    bmax = jnp.maximum(jnp.maximum(scene.tri_v0, scene.tri_v1), scene.tri_v2)
    eps = 1e-4 * jnp.max(bmax) - 1e-4 * jnp.min(bmin) + 1e-6
    pad = ((0, tp - t), (0, 0))
    bmin = jnp.pad(bmin, pad, mode="edge")
    bmax = jnp.pad(bmax, pad, mode="edge")
    n_clu = tp // CULL_K
    c0 = jnp.min(bmin.reshape(n_clu, CULL_K, 3), axis=1) - eps
    c1 = jnp.max(bmax.reshape(n_clu, CULL_K, 3), axis=1) + eps
    return c0, c1


@jax.jit
def listed_counts(state, c0, c1, mint=0.0):
    """Per-granularity listed-cluster totals for one bounce's ray state."""
    ox, oy, oz, dx, dy, dz = (v.reshape(-1) for v in state[:6])
    live = state[15].reshape(-1) > 0.0
    eps = 1e-30

    def inv(c):
        return 1.0 / jnp.where(jnp.abs(c) < eps, eps, c)

    ivx, ivy, ivz = inv(dx), inv(dy), inv(dz)
    n = ox.shape[0]
    n_clu = c0.shape[0]

    def one_cluster(i, acc):
        tile_acc, bl_acc, bm_acc = acc
        lo, hi = c0[i], c1[i]
        fx0 = (lo[0] - ox) * ivx
        fx1 = (hi[0] - ox) * ivx
        fy0 = (lo[1] - oy) * ivy
        fy1 = (hi[1] - oy) * ivy
        fz0 = (lo[2] - oz) * ivz
        fz1 = (hi[2] - oz) * ivz
        t0 = jnp.maximum(
            jnp.maximum(jnp.minimum(fx0, fx1), jnp.minimum(fy0, fy1)),
            jnp.maximum(jnp.minimum(fz0, fz1), mint))
        t1 = jnp.minimum(
            jnp.minimum(jnp.maximum(fx0, fx1), jnp.maximum(fy0, fy1)),
            jnp.maximum(fz0, fz1))
        ok = (t1 >= t0) & live
        # tile granularity: any over 8192-ray tiles
        tile = jnp.any(ok.reshape(-1, S * L), axis=1)
        # lane-block granularity, current layout: within a tile, block b is
        # lanes [128b,128b+128) of every sublane row
        okt = ok.reshape(-1, S, 8, 128)
        bl = jnp.any(jnp.any(okt, axis=3), axis=1)       # [tiles, 8]
        # block-major: 1024 consecutive rays
        bm = jnp.any(ok.reshape(-1, S * L // 8), axis=1)  # [tiles*8]
        return (tile_acc + tile.sum(), bl_acc + bl.sum(), bm_acc + bm.sum())

    z = jnp.int32(0)
    return jax.lax.fori_loop(0, n_clu, one_cluster, (z, z, z))


def main():
    from rvpt_tpu import FilmConfig
    from rvpt_tpu.render import _block_grid, jittered_camera_rays
    from rvpt_tpu.scene import builtin
    from rvpt_tpu.ops import pathkernel as pk

    subdiv = 5
    for a in sys.argv[1:]:
        if a.startswith("--subdiv="):
            subdiv = int(a.split("=")[1])
    cfg = FilmConfig(width=1920, height=1080)
    scene, cam = builtin.mesh_demo(subdiv=subdiv, aspect=cfg.aspect)
    c0, c1 = cluster_bounds(scene)
    n_clu = c0.shape[0]
    print(f"tris={scene.num_triangles} clusters={n_clu}")

    pixel_np, _ = _block_grid(cfg.width, cfg.height)
    pixel = jnp.asarray(pixel_np)
    xs = pixel % jnp.uint32(cfg.width)
    ys = pixel // jnp.uint32(cfg.width)
    ray = jittered_camera_rays(cam, cfg, pixel, xs, ys, jnp.uint32(0),
                               jnp.uint32(0))

    bt = pk.BigMeshTracer(scene)
    pix = pk._to_tiles(pixel)
    o = ray.origin
    d = ray.direction
    ones = jnp.ones_like(pix, jnp.float32)
    zeros = jnp.zeros_like(pix, jnp.float32)
    state = tuple(pk._to_tiles(v) for v in
                  (o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2])) + (
        ones, ones, ones, zeros, zeros, zeros, zeros, zeros, zeros, ones)
    shape = pix.shape
    frame = jnp.uint32(0)
    n_tiles = shape[0]
    print(f"tiles={n_tiles} (x8 blocks = {n_tiles*8})")

    t0 = time.perf_counter()
    for b in range(NB):
        tile, bl, bm = listed_counts(state, c0, c1)
        live = int((state[15] > 0).sum())
        print(f"bounce {b}: live={live:8d}  listed/tile={int(tile):7d}  "
              f"blockL={int(bl):8d} (/8={int(bl)/8:9.1f})  "
              f"blockM={int(bm):8d} (/8={int(bm)/8:9.1f})  "
              f"win L={int(tile)/max(int(bl)/8,1):4.2f}x "
              f"M={int(tile)/max(int(bm)/8,1):4.2f}x", flush=True)
        wl, cnt = pk._bigmesh_chunk_worklist(state, *bt.sup_boxes, bt.mint)
        outs = pk._bigmesh_call(
            frame, jnp.uint32(16 + b * 4), bt.tables, bt.chunk_tables, pix,
            state, wl, cnt, bt.meta_key, bt.mint, "reference", b == NB - 1,
            False, False)
        state = outs[:16]
        if b < NB - 1 and b < 3:
            key = pk._bigmesh_sort_key(state, bt._box_lo, bt._box_inv)
            ops = [key.reshape(-1), pix.reshape(-1)]
            ops += [s.reshape(-1) for s in state]
            srt = jax.lax.sort(ops, num_keys=1)
            pix = srt[1].reshape(shape)
            state = tuple(s.reshape(shape) for s in srt[2:])
    print(f"total {time.perf_counter()-t0:.1f}s")


if __name__ == "__main__":
    main()
