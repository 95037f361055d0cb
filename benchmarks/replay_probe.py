"""Component timing of the mesh-gradient path (SoA replay backward).

The mesh fwd+bwd rows (bench.py) cost far more than display + a
forward-sized pullback would suggest (VERDICT r4 weak item 1), and their
first compile runs 335-439 s (item 4 / missing item 3).  This probe times
the pieces in isolation on the chip, with per-piece compile times:

  - forward trace with hit-record collection (BigMeshTracer / culled)
  - replay forward alone (kajiya_replay_soa)
  - replay forward+backward (jax.vjp)
  - one _gather_mm[_big] grouped lookup at film scale
  - one _segsum_mm[_big] scatter at film scale
  - full fwd+bwd (make_fast_kajiya), the bench.py row

Usage: python benchmarks/replay_probe.py [subdiv] [n_bounces]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp


def timecompile(fn, *args, iters=4):
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    comp = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, comp


def main():
    subdiv = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    nb = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    from rvpt_tpu import FilmConfig
    from rvpt_tpu.ops import replay_soa as rs
    from rvpt_tpu.ops.fast_grad import make_fast_kajiya
    from rvpt_tpu.ops.pathkernel import BigMeshTracer, bigmesh_block_dims
    from rvpt_tpu.render import _block_grid, jittered_camera_rays
    from rvpt_tpu.scene import builtin
    from rvpt_tpu.train.inverse import apply_params, trainable_params
    from rvpt_tpu.utils import compile_cache

    compile_cache.enable()
    cfg = FilmConfig(width=1920, height=1080)
    scene, cam = builtin.mesh_demo(subdiv=subdiv, aspect=cfg.aspect)
    print(f"tris={scene.num_triangles} bounces={nb}")

    def make_rays(frame):
        # Inside-trace grid + raygen: closure arrays become HLO literals.
        pixel, _ = _block_grid(cfg.width, cfg.height,
                               *bigmesh_block_dims())
        xs = pixel % jnp.uint32(cfg.width)
        ys = pixel // jnp.uint32(cfg.width)
        ray = jittered_camera_rays(cam, cfg, pixel, xs, ys, frame,
                                   jnp.uint32(0))
        return pixel, ray

    frame = jnp.uint32(0)
    pixel, ray = make_rays(frame)
    n = pixel.shape[0]

    # -- forward + collect
    @jax.jit
    def fwd_collect(frame):
        pixel, ray = make_rays(frame)
        bt = BigMeshTracer(scene)
        (r, g, b), (fams, idxs) = bt.trace(
            pixel, ray.origin, ray.direction, frame, jnp.uint32(16), nb,
            style="standard", collect_hits=True)
        return r.sum() + g.sum() + b.sum(), fams, idxs

    dt, comp = timecompile(fwd_collect, frame)
    print(f"fwd+collect        {dt*1e3:8.2f} ms   (compile {comp:.1f}s)",
          flush=True)
    _, fams, idxs = fwd_collect(frame)
    fams = jax.block_until_ready(fams)

    # -- replay forward alone
    @jax.jit
    def replay_fwd(scene_in, fams, idxs):
        pixel, ray = make_rays(frame)
        out = rs.kajiya_replay_soa(
            scene_in, ray.origin, ray.direction, pixel, frame,
            jnp.uint32(16), fams, idxs, "standard")
        return out.sum()

    dt, comp = timecompile(replay_fwd, scene, fams, idxs)
    print(f"replay fwd         {dt*1e3:8.2f} ms   (compile {comp:.1f}s)",
          flush=True)

    # -- replay fwd+bwd
    @jax.jit
    def replay_grad(scene_in, fams, idxs):
        pixel, ray = make_rays(frame)

        # full scene-leaf vjp (what fast_grad.bwd runs)
        def f(s):
            return rs.kajiya_replay_soa(
                s, ray.origin, ray.direction, pixel, frame,
                jnp.uint32(16), fams, idxs, "standard").sum()

        out, vjp_fn = jax.vjp(f, scene_in)
        (gs,) = vjp_fn(jnp.ones(()))
        return out, jax.tree.leaves(gs)[0]

    dt, comp = timecompile(replay_grad, scene, fams, idxs)
    print(f"replay fwd+bwd     {dt*1e3:8.2f} ms   (compile {comp:.1f}s)",
          flush=True)

    # -- grouped lookup / segsum at film scale
    t_rows = scene.num_triangles
    tabs = tuple(scene.tri_v0[:, k] for k in range(3)) \
        + tuple(scene.tri_v1[:, k] for k in range(3)) \
        + tuple(scene.tri_v2[:, k] for k in range(3)) \
        + (scene.tri_mat.astype(jnp.float32),)
    idx1 = jnp.clip(idxs[0], 0, t_rows - 1)

    @jax.jit
    def one_lookup(idx):
        return sum(o.sum() for o in rs._lookup_group(tabs, idx))

    dt, comp = timecompile(one_lookup, idx1)
    print(f"lookup x10 tables  {dt*1e3:8.2f} ms   (compile {comp:.1f}s) "
          f"[{nb} bounces would be {dt*1e3*nb:.1f} ms]", flush=True)

    @jax.jit
    def one_segsum(idx):
        gs = tuple(jnp.ones((n,), jnp.float32) for _ in range(10))
        seg = rs._segsum_mm_big if t_rows > rs._SEG_MM_MAX else rs._segsum_mm
        return seg(idx, gs, t_rows).sum()

    dt, comp = timecompile(one_segsum, idx1)
    print(f"segsum x10         {dt*1e3:8.2f} ms   (compile {comp:.1f}s) "
          f"[{nb} bounces would be {dt*1e3*nb:.1f} ms]", flush=True)

    # -- the bench.py row: full fwd+bwd through make_fast_kajiya
    trace = make_fast_kajiya(scene, 16, nb, style="standard")

    def loss(params, frame):
        pixel, ray = make_rays(frame)
        s = apply_params(scene, params)
        return jnp.mean(trace(s, ray.origin, ray.direction, pixel, frame))

    g_fn = jax.jit(jax.value_and_grad(loss))
    params = trainable_params(scene)
    dt, comp = timecompile(g_fn, params, frame)
    print(f"full fwd+bwd       {dt*1e3:8.2f} ms   (compile {comp:.1f}s)",
          flush=True)


if __name__ == "__main__":
    main()
