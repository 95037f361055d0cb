"""Component-level timing of the big-mesh bounce loop on the TPU.

For each bounce of the ico5 1080p path, times in isolation:
  - the XLA per-tile chunk work-list computation
  - the bounce kernel, grouped vs tile-wide cluster walk
  - the between-bounce wavefront sort + interleave

Usage: python benchmarks/bigmesh_components.py [subdiv] [n_bounces]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    subdiv = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    nb = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from rvpt_tpu import FilmConfig
    from rvpt_tpu.ops import pathkernel as pk
    from rvpt_tpu.render import _block_grid, jittered_camera_rays
    from rvpt_tpu.scene import builtin
    from rvpt_tpu.utils import compile_cache

    compile_cache.enable()
    cfg = FilmConfig(width=1920, height=1080)
    scene, cam = builtin.mesh_demo(subdiv=subdiv, aspect=cfg.aspect)
    bt = pk.BigMeshTracer(scene)
    print(f"tris={scene.num_triangles} n_chunks={bt.meta['n_chunks']}")

    pixel_np, _ = _block_grid(cfg.width, cfg.height, *pk.bigmesh_block_dims())
    pixel = jnp.asarray(pixel_np)
    xs = pixel % jnp.uint32(cfg.width)
    ys = pixel // jnp.uint32(cfg.width)
    frame = jnp.uint32(0)
    ray = jittered_camera_rays(cam, cfg, pixel, xs, ys, frame, jnp.uint32(0))

    pix = pk._to_btiles(pixel)
    o, d = ray.origin, ray.direction
    ones = jnp.ones_like(pix, jnp.float32)
    zeros = jnp.zeros_like(pix, jnp.float32)
    state = tuple(
        pk._to_btiles(v)
        for v in (o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2])
    ) + (ones, ones, ones, zeros, zeros, zeros, zeros, zeros, zeros, ones)
    shape = pix.shape

    wl_fn = jax.jit(lambda st: pk._bigmesh_chunk_worklist(
        st, *bt.sup_boxes, 0.0))

    kern_jit = jax.jit(lambda sa, px, st, wl, cnt: pk._bigmesh_launch(
        frame, sa, bt.tables, bt.chunk_tables,
        px, st, wl, cnt, bt.meta_key, 0.0, "reference",
        False, False, False))

    def kern_fn(b):
        salt = jnp.uint32(16 + b * 4)
        return lambda st, wl, cnt: kern_jit(salt, pix, st, wl, cnt)

    def sort_fn(st, px):
        key = pk._bigmesh_sort_key(st, bt._box_lo, bt._box_inv)
        ops = [key.reshape(-1), px.reshape(-1)]
        ops += [s.reshape(-1) for s in st]
        srt = jax.lax.sort(ops, num_keys=1)
        px2 = pk._flat_to_btile(srt[1], shape)
        st2 = tuple(pk._flat_to_btile(s, shape) for s in srt[2:])
        return st2, px2

    def sort_key_only(st):
        key = pk._bigmesh_sort_key(st, bt._box_lo, bt._box_inv)
        return jax.lax.sort([key.reshape(-1)], num_keys=1)

    sort_j = jax.jit(sort_fn)
    sort_k = jax.jit(sort_key_only)

    for b in range(nb):
        dt_wl = timeit(wl_fn, state)
        wl, cnt = wl_fn(state)
        c = jnp.asarray(cnt)
        print(f"bounce {b}: worklist {dt_wl*1e3:6.2f} ms  "
              f"cnt mean {float(c.mean()):.2f}", flush=True)
        dt_k = timeit(kern_fn(b), state, wl, cnt, iters=4)
        print(f"  kernel           {dt_k*1e3:8.2f} ms", flush=True)
        dt_0 = timeit(kern_fn(b), state, wl,
                      jnp.zeros_like(cnt), iters=4)
        print(f"  no-walk floor    {dt_0*1e3:8.2f} ms", flush=True)
        dt_s = timeit(sort_j, state, pix, iters=4)
        dt_sk = timeit(sort_k, state, iters=4)
        print(f"  sort             {dt_s*1e3:8.2f} ms "
              f"(key-only {dt_sk*1e3:.2f} ms)", flush=True)
        outs = kern_fn(b)(state, wl, cnt)
        state = outs[:16]
        state, pix = sort_j(state, pix)


if __name__ == "__main__":
    main()
