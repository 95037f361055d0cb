"""On-chip A/B of the replay lookup/segsum kernel variants (round 5).

Sweeps (_SEG_R ray blocks per grid step) x (small resident-table kernel vs
T-blocked big kernel with range skipping) x (_TBLK window size), timing the
standalone grouped lookup, the standalone segsum, and the full replay
fwd+bwd at mesh-1282 1080p x 8.

Usage: PYTHONPATH=/root/.axon_site:/root/repo \
           python benchmarks/segsum_probe.py [subdiv]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=6):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    subdiv = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    nb = 8

    from rvpt_tpu import FilmConfig
    from rvpt_tpu.ops import replay_soa as rs
    from rvpt_tpu.ops.pathkernel import BigMeshTracer, bigmesh_block_dims
    from rvpt_tpu.render import _block_grid, jittered_camera_rays
    from rvpt_tpu.scene import builtin
    from rvpt_tpu.utils import compile_cache

    compile_cache.enable()
    cfg = FilmConfig(width=1920, height=1080)
    scene, cam = builtin.mesh_demo(subdiv=subdiv, aspect=cfg.aspect)
    t_rows = scene.num_triangles
    print(f"tris={t_rows} bounces={nb}")

    def make_rays(frame):
        pixel, _ = _block_grid(cfg.width, cfg.height,
                               *bigmesh_block_dims())
        xs = pixel % jnp.uint32(cfg.width)
        ys = pixel // jnp.uint32(cfg.width)
        ray = jittered_camera_rays(cam, cfg, pixel, xs, ys, frame,
                                   jnp.uint32(0))
        return pixel, ray

    frame = jnp.uint32(0)

    @jax.jit
    def fwd_collect(frame):
        pixel, ray = make_rays(frame)
        bt = BigMeshTracer(scene)
        (r, g, b), (fams, idxs) = bt.trace(
            pixel, ray.origin, ray.direction, frame, jnp.uint32(16), nb,
            style="standard", collect_hits=True)
        return r.sum() + g.sum() + b.sum(), fams, idxs

    _, fams, idxs = jax.block_until_ready(fwd_collect(frame))
    n = fams.shape[1]
    idx1 = jnp.clip(idxs[0], 0, t_rows - 1)
    tabs = tuple(scene.tri_v0[:, k] for k in range(3)) \
        + tuple(scene.tri_v1[:, k] for k in range(3)) \
        + tuple(scene.tri_v2[:, k] for k in range(3)) \
        + (scene.tri_mat.astype(jnp.float32),)
    gs = tuple(jnp.ones((n,), jnp.float32) for _ in range(10))

    def lookup(idx):
        return sum(o.sum() for o in rs._lookup_group(tabs, idx))

    def segsum(idx):
        if t_rows > rs._SEG_MM_MAX:
            return rs._segsum_mm_big(idx, gs, t_rows).sum()
        return rs._segsum_mm(idx, gs, t_rows).sum()

    def replay_grad(scene_in, fams, idxs):
        pixel, ray = make_rays(frame)

        def f(s):
            return rs.kajiya_replay_soa(
                s, ray.origin, ray.direction, pixel, frame,
                jnp.uint32(16), fams, idxs, "standard").sum()

        out, vjp_fn = jax.vjp(f, scene_in)
        (g,) = vjp_fn(jnp.ones(()))
        return out, jax.tree.leaves(g)[0]

    configs = [
        ("R=1 small          ", dict(R=1, MAX=4096, TBLK=1024)),
        ("R=8 small          ", dict(R=8, MAX=4096, TBLK=1024)),
        ("R=1 big TBLK=1024  ", dict(R=1, MAX=64, TBLK=1024)),
        ("R=1 big TBLK=256   ", dict(R=1, MAX=64, TBLK=256)),
        ("R=8 big TBLK=256   ", dict(R=8, MAX=64, TBLK=256)),
    ]
    base = None
    for name, c in configs:
        rs._SEG_R = c["R"]
        rs._SEG_MM_MAX = c["MAX"]
        rs._TBLK = c["TBLK"]
        lk = jax.jit(lookup)
        sg = jax.jit(segsum)
        rg = jax.jit(replay_grad)
        dt_l = timeit(lk, idx1)
        dt_s = timeit(sg, idx1)
        dt_g = timeit(rg, scene, fams, idxs, iters=3)
        out = rg(scene, fams, idxs)
        loss = float(out[0])
        if base is None:
            base = loss
        print(f"{name} lookup {dt_l*1e3:7.2f} ms  segsum {dt_s*1e3:7.2f} ms"
              f"  replay fwd+bwd {dt_g*1e3:8.2f} ms  loss {loss:.1f}"
              f" ({'ok' if abs(loss-base) < 1e-3*abs(base) else 'MISMATCH'})",
              flush=True)


if __name__ == "__main__":
    main()
