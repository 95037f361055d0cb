"""Headline benchmark: Mrays/s/chip, forward+backward, Cornell 1080p 1spp.

Prints exactly ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no numbers (BASELINE.md), so ``vs_baseline``
normalizes against the reference's implied real-time envelope: its fixed
1024x512 film at 8 bounces and 60 fps = 1024*512*8*60 ~= 252 Mrays/s
(src/rvpt/main.cpp:96-97, rvpt.h:79; a mid-range Vulkan GPU holds 60fps on
the demo scene).  value/vs_baseline therefore reads "x times the reference's
whole-frame ray throughput, while ALSO computing gradients".

The measured step is the custom-VJP pipeline (ops.fast_grad): Pallas
megakernel forward emitting per-bounce hit records + XLA replay-from-hits
backward.  Supplementary numbers (forward-only megakernel, XLA-autodiff
fwd+bwd) go to stderr.

Ray accounting: traced rays = H*W*aa*max_bounces per frame — every lane is
traced at every bounce (masked wavefront), so this is work actually executed.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp


def main() -> None:
    from rvpt_tpu import FilmConfig, RenderSettings
    from rvpt_tpu.core import rng
    from rvpt_tpu.models import camera as camera_mod
    from rvpt_tpu.ops.fast_grad import make_fast_kajiya
    from rvpt_tpu.render import _pixel_grid, render_sample_fast_chw
    from rvpt_tpu.scene import builtin
    from rvpt_tpu.train.inverse import apply_params, trainable_params
    from rvpt_tpu.utils import compile_cache

    cached = compile_cache.enable()
    print(f"persistent compilation cache: {'on' if cached else 'off (CPU)'}",
          file=sys.stderr)

    width, height, bounces, aa = 1920, 1080, 4, 1
    cfg = FilmConfig(width=width, height=height)
    settings = RenderSettings(max_bounces=bounces, aa=aa, style="standard")
    scene, camera = builtin.cornell_box(aspect=cfg.aspect)
    rays = width * height * aa * bounces
    baseline_mrays = 1024 * 512 * 8 * 60 / 1e6  # ~252: reference envelope

    def bench(fn, *args, iters=10):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for i in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters

    # --- headline: fwd+bwd via megakernel + replay-from-hits VJP
    trace = make_fast_kajiya(scene, 16, bounces, style="standard")

    def loss_fn(params, frame):
        # Pixel grid + camera rays INSIDE the trace (iota arithmetic):
        # closed-over 1080p id/ray arrays bake into the HLO as tens of MB
        # of dense literals the tunnel's remote compiler chews on.
        pixel, xs, ys = _pixel_grid(cfg)
        ju, jv = rng.uniform2(pixel, jnp.uint32(0), jnp.uint32(0))
        cx = (xs.astype(jnp.float32) + ju) / cfg.width
        cy = 1.0 - (ys.astype(jnp.float32) + jv) / cfg.height
        ray = camera_mod.generate_rays(camera, cx, cy)
        s = apply_params(scene, params)
        img = trace(s, ray.origin, ray.direction, pixel, frame)
        return jnp.mean(img)

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    params = trainable_params(scene)
    t0 = time.perf_counter()
    loss, grads = grad_fn(params, jnp.uint32(0))
    jax.block_until_ready((loss, grads))
    print(
        f"compile+first fwd+bwd: {time.perf_counter()-t0:.1f}s "
        f"loss={float(loss):.4f}", file=sys.stderr,
    )
    dt = bench(lambda f: grad_fn(params, f), jnp.uint32(1))
    mrays = rays / dt / 1e6
    print(f"fwd+bwd (fast vjp): {dt*1e3:.2f} ms/frame -> {mrays:.1f} Mrays/s",
          file=sys.stderr)

    # --- supplementary: forward-only megakernel display path
    fwd = jax.jit(
        lambda f: render_sample_fast_chw(scene, camera, settings, cfg, f)
    )
    dt_fwd = bench(fwd, jnp.uint32(1))
    print(
        f"fwd only (megakernel): {dt_fwd*1e3:.2f} ms/frame -> "
        f"{rays/dt_fwd/1e6:.1f} Mrays/s", file=sys.stderr,
    )

    # --- supplementary: BVH mesh scene (config 4), chunked DMA path
    mesh_scene, mesh_cam = builtin.mesh_demo(subdiv=3, aspect=cfg.aspect)
    mesh_settings = RenderSettings(max_bounces=8, aa=1)
    mesh_fwd = jax.jit(
        lambda f: render_sample_fast_chw(mesh_scene, mesh_cam, mesh_settings, cfg, f)
    )
    dt_mesh = bench(mesh_fwd, jnp.uint32(1), iters=5)
    print(
        f"mesh 1282 tris, 8 bounces (chunked DMA path): {dt_mesh*1e3:.2f} "
        f"ms/frame -> {width*height*8/dt_mesh/1e6:.1f} Mrays/s",
        file=sys.stderr,
    )

    # --- supplementary: big mesh beyond SMEM capacity (chunked kernel)
    big_scene, big_cam = builtin.mesh_demo(subdiv=5, aspect=cfg.aspect)
    big_fwd = jax.jit(
        lambda f: render_sample_fast_chw(big_scene, big_cam, mesh_settings, cfg, f)
    )
    dt_big = bench(big_fwd, jnp.uint32(1), iters=2)
    print(
        f"mesh {big_scene.num_triangles} tris, 8 bounces (chunked kernel): "
        f"{dt_big*1e3:.2f} ms/frame -> {width*height*8/dt_big/1e6:.1f} Mrays/s",
        file=sys.stderr,
    )

    # --- supplementary: mesh fwd+bwd (the north-star metric on the BVH
    # scenes; VERDICT r3 gap — the culled/chunked gradient paths were only
    # ever exercised interpret-mode on CPU).  The trace runs on block-grid
    # pixel order like the display path (tight per-tile frusta); the loss
    # is a radiance mean, so pixel order is irrelevant to the value.
    from rvpt_tpu.render import _block_grid

    for label, (g_scene, g_cam), g_bounces, g_iters in (
        ("mesh-1282 fwd+bwd (SoA replay)", (mesh_scene, mesh_cam), 8, 3),
        ("mesh-20482 fwd+bwd (chunked+SoA)", (big_scene, big_cam), 8, 2),
    ):
        try:
            g_trace = make_fast_kajiya(g_scene, 16, g_bounces,
                                       style="standard")

            def g_loss(params, frame, _s=g_scene, _t=g_trace, _c=g_cam):
                # Pixel grid + rays inside the trace (iota arithmetic) —
                # see loss_fn above: closure arrays become HLO literals.
                pixel_blk, _bm = _block_grid(cfg.width, cfg.height)
                bxs = pixel_blk % jnp.uint32(cfg.width)
                bys = pixel_blk // jnp.uint32(cfg.width)
                jb, _ = rng.uniform2(pixel_blk, jnp.uint32(0),
                                     jnp.uint32(0))
                gcx = (bxs.astype(jnp.float32) + jb) / cfg.width
                gcy = 1.0 - (bys.astype(jnp.float32) + jb) / cfg.height
                _r = camera_mod.generate_rays(_c, gcx, gcy)
                s = apply_params(_s, params)
                img = _t(s, _r.origin, _r.direction, pixel_blk, frame)
                return jnp.mean(img)

            g_fn = jax.jit(jax.value_and_grad(g_loss))
            g_params = trainable_params(g_scene)
            t0 = time.perf_counter()
            loss_g, grads_g = g_fn(g_params, jnp.uint32(0))
            jax.block_until_ready((loss_g, grads_g))
            print(f"{label}: compile+first {time.perf_counter()-t0:.1f}s "
                  f"loss={float(loss_g):.4f}", file=sys.stderr)
            dt_g = bench(lambda f: g_fn(g_params, f), jnp.uint32(1),
                         iters=g_iters)
            print(f"{label}: {dt_g*1e3:.2f} ms/frame -> "
                  f"{width*height*g_bounces/dt_g/1e6:.1f} Mrays/s",
                  file=sys.stderr)
        except Exception as e:  # noqa: BLE001 — report, keep bench green
            print(f"{label}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  file=sys.stderr)

    # --- supplementary: sharded TRAINING-step overhead (the psum'd-gradient
    # path the north star scales, VERDICT r4 item 5): make_train_step fwd+bwd
    # through shard_map over all visible devices vs the unsharded step, same
    # session.  On the 1-chip TPU env this is pure shard_map machinery
    # overhead; on a real slice it becomes scaling efficiency.
    try:
        from rvpt_tpu.parallel import mesh as mesh_mod
        from rvpt_tpu.train.inverse import make_train_step

        devices = jax.devices()
        n_dev = len(devices)
        tr_target = jnp.zeros((3, height, width), jnp.float32)
        step_u, opt_u = make_train_step(
            scene, camera, settings, cfg, None, tr_target)
        tr_params = trainable_params(scene)
        dt_u = bench(lambda f: step_u(tr_params, opt_u, f),
                     jnp.uint32(1), iters=5)
        mesh1 = mesh_mod.make_mesh(n_dev, 1, devices=devices)
        step_s, opt_s = make_train_step(
            scene, camera, settings, cfg, mesh1, tr_target)
        dt_s = bench(lambda f: step_s(tr_params, opt_s, f),
                     jnp.uint32(1), iters=5)
        ovh = (dt_s * n_dev / dt_u - 1.0) * 100.0
        print(f"train step (fwd+bwd+psum grads) sharded n={n_dev}: "
              f"unsharded {dt_u*1e3:.2f} ms, sharded {dt_s*1e3:.2f} ms "
              f"-> overhead {ovh:+.1f}%", file=sys.stderr)
    except Exception as e:  # noqa: BLE001
        print(f"sharded train step: FAILED {type(e).__name__}: "
              f"{str(e)[:200]}", file=sys.stderr)

    # --- supplementary: the reference's exact default frame — 1024x512,
    # rabbit.obj (143 tris, BVH), 8 bounces, 1 spp (main.cpp:96-107).
    try:
        rb_cfg = FilmConfig(width=1024, height=512)
        rb_scene, rb_cam = builtin.rabbit(aspect=rb_cfg.aspect)
        rb_settings = RenderSettings(max_bounces=8, aa=1)
        rb_fwd = jax.jit(lambda f: render_sample_fast_chw(
            rb_scene, rb_cam, rb_settings, rb_cfg, f))
        dt_rb = bench(rb_fwd, jnp.uint32(1), iters=10)
        print(f"reference-default frame (1024x512 rabbit x8): "
              f"{dt_rb*1e3:.2f} ms/frame = {1.0/dt_rb:.0f} fps -> "
              f"{1024*512*8/dt_rb/1e6:.1f} Mrays/s", file=sys.stderr)
    except Exception as e:  # noqa: BLE001
        print(f"reference-default frame: FAILED {type(e).__name__}: "
              f"{str(e)[:200]}", file=sys.stderr)

    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.platform})", file=sys.stderr)
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


def main_sharded(width: int = 1920, height: int = 1080, bounces: int = 4,
                 iters: int = 10) -> None:
    """Scaling-efficiency harness (BASELINE.md: >=85% rays/s 1 chip -> N).

    Renders the Cornell 1080p config over a (tiles,) mesh of ALL visible
    devices through the sharded kernel path and reports rays/s/chip against
    the single-device fast path measured in the SAME run (tunnel variance
    makes cross-run comparison meaningless).  On the single-chip TPU env this
    measures sharded-path overhead (n=1); on a multi-chip slice or the
    8-device virtual CPU mesh it measures true scaling efficiency.
    """
    from rvpt_tpu import FilmConfig, RenderSettings
    from rvpt_tpu.parallel import mesh as mesh_mod
    from rvpt_tpu.parallel.sharded import render_sample_sharded_fast
    from rvpt_tpu.render import render_sample_fast_chw
    from rvpt_tpu.scene import builtin
    from rvpt_tpu.utils import compile_cache

    compile_cache.enable()
    devices = jax.devices()
    n = len(devices)
    interpret = devices[0].platform != "tpu"
    cfg = FilmConfig(width=width, height=height)
    settings = RenderSettings(max_bounces=bounces, style="standard")
    scene, camera = builtin.cornell_box(aspect=cfg.aspect)
    rays = width * height * settings.aa * bounces
    mesh = mesh_mod.make_mesh(n, 1, devices=devices)

    def bench(fn, *args):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters

    single = jax.jit(
        lambda f: render_sample_fast_chw(scene, camera, settings, cfg, f)
    )
    dt_single = bench(single, jnp.uint32(1))

    sharded = jax.jit(lambda f: render_sample_sharded_fast(
        scene, camera, settings, cfg, f, mesh, interpret=interpret))
    dt_sharded = bench(sharded, jnp.uint32(1))

    per_chip = rays / dt_sharded / n
    eff = per_chip / (rays / dt_single)
    print(
        f"single-chip: {dt_single*1e3:.2f} ms  sharded({n} dev): "
        f"{dt_sharded*1e3:.2f} ms  rays/s/chip ratio: {eff:.3f}",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": "cornell_sharded_efficiency",
        "value": round(eff, 4),
        "unit": f"rays/s/chip vs 1-chip, n={n}",
        "vs_baseline": round(eff / 0.85, 3),
    }))


if __name__ == "__main__":
    if "--sharded" in sys.argv:
        # Optional film override for CI smoke runs on the virtual CPU mesh:
        #   python bench.py --sharded 128x64
        size = next((a for a in sys.argv[1:] if "x" in a and a[0].isdigit()),
                    None)
        if size:
            w, h = (int(v) for v in size.split("x"))
            main_sharded(width=w, height=h, bounces=2, iters=2)
        else:
            main_sharded()
    else:
        main()
