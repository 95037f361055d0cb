"""Top-level frame rendering: the jitted analog of the reference's compute
megakernel dispatch (assets/shaders/compute_pass.comp:121-167 +
src/rvpt/rvpt.cpp:1005-1039).

One call renders the full film: pixel-grid generation, per-sample jitter,
camera ray generation, integrator evaluation (with the reference's
split-screen up-to-4-way comparison), AA averaging, and the temporal EMA
update — all one XLA program.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp

from .config import FilmConfig, RenderSettings
from .core import rng
from .models import camera as camera_mod
from .models.integrators import AA_STRIDE, eval_integrator
from .ops import film as film_ops

_JITTER_SITE = 0
_INTEGRATOR_SITE = 16


def _pixel_grid(cfg: FilmConfig):
    """Flat pixel ids and integer coords; id = x + y*W matches the reference's
    seeding index (assets/shaders/util.glsl:35) so RNG streams are stable
    under any sharding of the film."""
    ys, xs = jnp.meshgrid(
        jnp.arange(cfg.height, dtype=jnp.uint32),
        jnp.arange(cfg.width, dtype=jnp.uint32),
        indexing="ij",
    )
    xs = xs.reshape(-1)
    ys = ys.reshape(-1)
    pixel = xs + ys * jnp.uint32(cfg.width)
    return pixel, xs, ys


def _mode_masks(settings: RenderSettings, xs, ys, cfg: FilmConfig):
    """Split-screen quadrant selection (compute_pass.comp:134-144)."""
    sx, sy = settings.split_ratio
    px = xs.astype(jnp.float32) / cfg.width
    py = ys.astype(jnp.float32) / cfg.height
    bottom = py > sy
    right_t = px > sx
    right_b = ~(px < sx)
    tl, tr, bl, br = settings.modes()
    mode_of_pixel = jnp.where(
        bottom,
        jnp.where(right_b, br, bl),
        jnp.where(right_t, tr, tl),
    )
    return mode_of_pixel


def jittered_camera_rays(camera, cfg: FilmConfig, pixel, xs, ys, frame,
                         salt0):
    """AA-jittered camera rays for a pixel batch — THE jitter convention
    (RNG site, y flip, reciprocal film scale) shared by the XLA integrator
    path, the big-mesh display path, and the sharded big-mesh branch, so
    their images stay bit-identical."""
    ju, jv = rng.uniform2(pixel, frame, salt0 + jnp.uint32(_JITTER_SITE))
    # Jittered film coordinates, y flipped (compute_pass.comp:153-154).
    cx = (xs.astype(jnp.float32) + ju) * (1.0 / cfg.width)
    cy = 1.0 - (ys.astype(jnp.float32) + jv) * (1.0 / cfg.height)
    return camera_mod.generate_rays(camera, cx, cy)


def render_pixels(
    scene,
    camera,
    settings: RenderSettings,
    cfg: FilmConfig,
    frame,
    pixel,
    xs,
    ys,
    aa_offset=0,
):
    """Render an arbitrary batch of pixels -> f32[n,3] samples.

    This is the shard-local work unit: callers hand in (pixel ids, x, y)
    arrays — the full film (render_sample) or one tile of it
    (parallel.sharded) — and RNG streams depend only on the *global* pixel id,
    so any sharding produces bit-identical images.  ``aa_offset`` offsets the
    AA sample index (used to decorrelate spp-parallel ranks).
    """
    frame = jnp.asarray(frame, jnp.uint32)
    unique_modes = sorted(set(settings.modes()))
    n = pixel.shape[0]

    sampled = jnp.zeros((n, 3), jnp.float32)
    for i in range(settings.aa):
        salt0 = (jnp.uint32(i) + jnp.asarray(aa_offset, jnp.uint32)) * jnp.uint32(
            AA_STRIDE
        )
        ray = jittered_camera_rays(camera, cfg, pixel, xs, ys, frame, salt0)

        salt_base = salt0 + _INTEGRATOR_SITE
        if len(unique_modes) == 1:
            col = eval_integrator(
                unique_modes[0], scene, ray, pixel, frame, settings, salt_base
            )
        else:
            mode_of_pixel = _mode_masks(settings, xs, ys, cfg)
            col = jnp.zeros((n, 3), jnp.float32)
            for m in unique_modes:
                cm = eval_integrator(m, scene, ray, pixel, frame, settings, salt_base)
                col = jnp.where((mode_of_pixel == m)[:, None], cm, col)
        sampled = sampled + col

    return sampled / settings.aa


def _megakernel_eligible(scene, settings: RenderSettings) -> bool:
    """The fused Pallas bounce kernel serves the pure-Kajiya display path on
    TPU; everything else uses the XLA integrators.  BVH-attached scenes ride
    the kernel's SMEM cluster-culled mesh path up to its capacity
    (ops.pathkernel.CULL_MAX_TRIS); unattached scenes use the VMEM row path,
    whose per-triangle tile cost caps it at small counts."""
    from .ops import intersect as intersect_mod
    from .ops.pathkernel import PRIMARY_MODES, is_bigmesh

    if not intersect_mod._use_pallas(max(scene.num_triangles, 1)):
        return False
    modes = set(settings.modes())
    for mode in modes:
        if mode in PRIMARY_MODES or mode in (7, 8):
            # Big meshes ride the chunked search launches + XLA finalize
            # (BigMeshTracer.trace_primary / trace_shaded); small scenes
            # the fused primary/bounce kernels.
            pass
        elif mode == 10:
            # Hart: march kernel (raw-vertex SMEM tables) up to capacity;
            # BVH-attached big meshes ride the chunked distance kernel.
            from .ops.pathkernel import CULL_MAX_TRIS
            if scene.num_triangles > CULL_MAX_TRIS and not is_bigmesh(scene):
                return False
        elif mode != 9:
            return False
    if scene.bvh is not None:
        return True   # <= CULL_MAX_TRIS: SMEM culled; beyond: chunked path
    return scene.num_triangles <= 1024


def _block_grid(width: int, height: int, bw: int = 128, bh: int = 64):
    """Gather-free block tiling: pixel ids for a height-padded film arranged
    so each kernel tile is a compact bw x bh screen block, plus the static
    shape info to UN-block results with reshapes/transposes only.

    An index-permutation round trip (pixel[order] ... result[inv]) costs
    ~60 ms of TPU gathers at 1080p (measured on the split path); reshaping
    [nby, nbx, bh, bw] -> [nby, bh, nbx, bw] is free.  Padded rows trace
    off-screen rays (<1% waste) and are cropped.  Requires width % bw == 0
    (true for all standard films); otherwise callers fall back to
    _block_order.

    Computed with traced iota arithmetic, NOT host numpy: a 1080p numpy id
    grid closed over by a jitted caller bakes into the HLO as a 16.7 MB
    dense literal — and callers pass pixel + xs + ys, so mesh-path modules
    carried ~50 MB of literals, which the tunnel's remote compiler chewed
    on for minutes (round-5 diagnosis: 52.8 MB module, 51.9 MB literals;
    290-455 s compiles).  As iota ops the whole grid is ~10 HLO lines.
    """
    if width % bw != 0:
        return None
    hp = -(-height // bh) * bh
    ys = jax.lax.broadcasted_iota(jnp.uint32, (hp, width), 0)
    xs = jax.lax.broadcasted_iota(jnp.uint32, (hp, width), 1)
    pix = xs + ys * jnp.uint32(width)
    blocked = (
        pix.reshape(hp // bh, bh, width // bw, bw)
        .transpose(0, 2, 1, 3)
        .reshape(-1)
    )
    return blocked, (hp // bh, width // bw, bh, bw, hp)


def _unblock(flat, width: int, height: int, meta):
    """Inverse of _block_grid's layout for a flat per-pixel array."""
    nby, nbx, bh, bw, hp = meta
    return (
        flat.reshape(nby, nbx, bh, bw)
        .transpose(0, 2, 1, 3)
        .reshape(hp, width)[:height]
    )


@lru_cache(maxsize=8)
def _block_order(width: int, height: int, bw: int = 128, bh: int = 64):
    """Permutation packing each megakernel ray tile (S*L = bw*bh pixels) as
    a compact bw x bh screen block instead of a ~4-row strip of the film.

    Compact blocks give the culled mesh path (ops.pathkernel.pack_cull)
    tight primary-ray frusta, so far fewer clusters survive the per-tile
    slab cull.  Returns (order, inv) with order a permutation of row-major
    pixel ids in block order and inv its inverse.
    """
    import numpy as np

    ys, xs = np.mgrid[0:height, 0:width]
    block = (ys // bh) * (-(-width // bw)) + (xs // bw)
    order = np.lexsort((xs.ravel(), ys.ravel(), block.ravel()))
    inv = np.argsort(order)
    return order, inv


def render_sample_fast_chw(scene, camera, settings: RenderSettings,
                           cfg: FilmConfig, frame):
    """Megakernel-backed sample render -> f32[3,H,W] (forward-only; identical
    sampling decisions to the XLA path up to fma rounding).  Falls back to
    the XLA path when the settings/scene are out of the kernel's scope."""
    if not _megakernel_eligible(scene, settings):
        return render_sample_chw(scene, camera, settings, cfg, frame)
    # One jitted program per (settings, cfg, camera mode): table packing, the
    # pixel permutation gathers, and the kernel launches all fuse — unjitted,
    # the host-side re-pack + 2M-element gathers cost ~10x the kernel time.
    return _fast_chw_jit(scene, camera, settings, cfg,
                         jnp.asarray(frame, jnp.uint32))


def _trace_mode_kernel(pt, scene, camera, settings, cfg, cam_params,
                       pixel, frame, salt0, mode, interpret=None):
    """One kernel-resident integrator pass over a pixel batch -> (r, g, b).
    Jitter + camera ray generation run inside the kernels — the film output
    is the only ray-sized HBM traffic of the pass."""
    from .ops.intersect import on_tpu
    from .ops.pathkernel import PRIMARY_MODES, trace_hart

    # Off-TPU (forced-kernel tests, bench smoke) the kernels run in
    # interpret mode — same auto rule as _bigmesh_chw.  Callers inside
    # shard_map (parallel/sharded.py) pass their own flag.
    if interpret is None:
        interpret = not on_tpu()
    if mode == 10:
        return trace_hart(
            scene, pixel, frame, cam_params=cam_params,
            cam_mode=camera.mode, jitter_salt=salt0 + _JITTER_SITE,
            interpret=interpret,
        )
    if mode in PRIMARY_MODES:
        # nrays (a static jit arg) matters only to AO's probe loop;
        # pinning it to 1 elsewhere avoids recompiles on bounce changes.
        return pt.trace_primary(
            pixel, frame, mode, cam_params=cam_params,
            cam_mode=camera.mode,
            salt_base=salt0 + _INTEGRATOR_SITE,
            jitter_salt=salt0 + _JITTER_SITE,
            nrays=max(int(settings.max_bounces), 1) if mode == 5 else 1,
            interpret=interpret,
        )
    integ = {7: "whitted", 8: "cook"}.get(mode, "kajiya")
    return pt.trace(
        pixel, None, None, frame,
        salt_base=salt0 + _INTEGRATOR_SITE,
        max_bounces=settings.max_bounces, style=settings.style,
        gen_rays=True, cam_params=cam_params, cam_mode=camera.mode,
        jitter_salt=salt0 + _JITTER_SITE, integ=integ,
        interpret=interpret,
    )


@lru_cache(maxsize=8)
def _split_partition(cfg: FilmConfig, settings: RenderSettings):
    """Static per-(cfg, settings) split-screen partition as quadrant
    RECTANGLES (mode, y0, y1, x0, x1) matching _mode_masks exactly, each
    with its raster pixel ids.  Rect-based reassembly uses static slice
    updates — a flat inverse permutation costs ~60 ms of TPU gathers at
    1080p (measured)."""
    import numpy as np

    sx, sy = settings.split_ratio
    py = np.arange(cfg.height, dtype=np.float32) / cfg.height
    px = np.arange(cfg.width, dtype=np.float32) / cfg.width
    rows_b = np.nonzero(py > sy)[0]
    y_split = int(rows_b[0]) if len(rows_b) else cfg.height
    cols_t = np.nonzero(px > sx)[0]
    x_split_t = int(cols_t[0]) if len(cols_t) else cfg.width
    cols_b = np.nonzero(~(px < sx))[0]
    x_split_b = int(cols_b[0]) if len(cols_b) else cfg.width
    tl, tr, bl, br = settings.modes()
    rects = [
        (int(tl), 0, y_split, 0, x_split_t),
        (int(tr), 0, y_split, x_split_t, cfg.width),
        (int(bl), y_split, cfg.height, 0, x_split_b),
        (int(br), y_split, cfg.height, x_split_b, cfg.width),
    ]
    parts = []
    for m, y0, y1, x0, x1 in rects:
        if y1 <= y0 or x1 <= x0:
            continue
        parts.append((m, (y0, y1, x0, x1)))
    return tuple(parts)


def _rect_pixels(y0, y1, x0, x1, width):
    """Raster pixel ids of a rect as traced iota arithmetic (a closed-over
    numpy id array would bake into the HLO as a dense literal — the
    round-5 compile-time diagnosis, see _block_grid)."""
    ys = jax.lax.broadcasted_iota(jnp.uint32, (y1 - y0, x1 - x0), 0)
    xs = jax.lax.broadcasted_iota(jnp.uint32, (y1 - y0, x1 - x0), 1)
    return ((xs + jnp.uint32(x0))
            + (ys + jnp.uint32(y0)) * jnp.uint32(width)).reshape(-1)


@partial(jax.jit, static_argnames=("settings", "cfg"))
def _fast_chw_jit(scene, camera, settings: RenderSettings, cfg: FilmConfig,
                  frame):
    from .models.integrators import AA_STRIDE
    from .ops.pathkernel import PathTracer, camera_params, is_bigmesh

    if is_bigmesh(scene):
        return _bigmesh_chw(scene, camera, settings, cfg, frame)

    modes = set(settings.modes())
    pt = PathTracer(scene)
    cam_params = camera_params(camera, cfg)
    frame = jnp.asarray(frame, jnp.uint32)

    if len(modes) > 1:
        # Split-screen: each quadrant's kernel runs on exactly its own
        # pixels (RNG keys by global pixel id, so values match the XLA
        # path's compute-everything-and-select semantics); reassembly is
        # static rectangle slice updates, never a gather.
        parts = _split_partition(cfg, settings)
        out = jnp.zeros((3, cfg.height, cfg.width), jnp.float32)
        scale = 1.0 / settings.aa
        for m, (y0, y1, x0, x1) in parts:
            sub = _rect_pixels(y0, y1, x0, x1, cfg.width)
            acc = [0.0, 0.0, 0.0]
            for i in range(settings.aa):
                salt0 = i * AA_STRIDE
                r, g, b = _trace_mode_kernel(
                    pt, scene, camera, settings, cfg, cam_params,
                    sub, frame, salt0, m)
                acc = [a + c for a, c in zip(acc, (r, g, b))]
            rect = jnp.stack(
                [(a * scale).reshape(y1 - y0, x1 - x0) for a in acc])
            out = jax.lax.dynamic_update_slice(out, rect, (0, y0, x0))
        return out

    (mode,) = modes
    pixel, _, _ = _pixel_grid(cfg)
    inv = None
    block_meta = None
    if pt.meta.get("culled"):
        # Compact-block tile order: tightens the per-tile cluster cull.
        # Prefer the gather-free padded layout (reshapes only).
        from .ops.pathkernel import culled_block_dims
        cbw, cbh = culled_block_dims()
        grid = _block_grid(cfg.width, cfg.height, cbw, cbh)
        if grid is not None:
            pixel_np, block_meta = grid
            pixel = jnp.asarray(pixel_np)
        else:
            order, inv = _block_order(cfg.width, cfg.height, bw=cbw, bh=cbh)
            pixel = pixel[order]
    acc_r = acc_g = acc_b = 0.0
    for i in range(settings.aa):
        salt0 = i * AA_STRIDE
        r, g, b = _trace_mode_kernel(
            pt, scene, camera, settings, cfg, cam_params,
            pixel, frame, salt0, mode)
        acc_r = acc_r + r
        acc_g = acc_g + g
        acc_b = acc_b + b
    scale = 1.0 / settings.aa
    chans = [acc_r * scale, acc_g * scale, acc_b * scale]
    if block_meta is not None:
        chans = [_unblock(c, cfg.width, cfg.height, block_meta)
                 for c in chans]
        return jnp.stack(chans)
    if inv is not None:
        chans = [c[inv] for c in chans]
    return jnp.stack(chans).reshape(3, cfg.height, cfg.width)


def _trace_mode_bigmesh(bt, camera, settings, cfg, pixel, xs, ys, frame,
                        salt0, mode, interpret):
    """One big-mesh integrator pass over a pixel batch -> (r, g, b).

    Chunked search launches + the shared XLA shading/finalize math —
    semantics match the kernel-resident small-scene paths and the XLA
    integrators (reference: any integrator on any scene,
    compute_pass.comp:68-99).  Rays are generated in XLA with the same
    jitter salts as render_pixels, so images match the XLA path exactly."""
    from .ops.pathkernel import PRIMARY_MODES

    ray = jittered_camera_rays(camera, cfg, pixel, xs, ys, frame, salt0)
    salt_base = salt0 + jnp.uint32(_INTEGRATOR_SITE)
    if mode == 10:
        return bt.trace_hart(pixel, ray.origin, ray.direction,
                             interpret=interpret)
    if mode in PRIMARY_MODES:
        return bt.trace_primary(
            pixel, ray.origin, ray.direction, frame, mode,
            salt_base=salt_base,
            nrays=max(int(settings.max_bounces), 1) if mode == 5 else 1,
            interpret=interpret,
        )
    if mode in (7, 8):
        return bt.trace_shaded(
            pixel, ray.origin, ray.direction, frame,
            {7: "whitted", 8: "cook"}[mode], salt_base=salt_base,
            max_bounces=settings.max_bounces, style=settings.style,
            interpret=interpret,
        )
    return bt.trace(
        pixel, ray.origin, ray.direction, frame, salt_base=salt_base,
        max_bounces=settings.max_bounces, style=settings.style,
        interpret=interpret,
    )


def _bigmesh_chw(scene, camera, settings: RenderSettings, cfg: FilmConfig,
                 frame):
    """Display path for BVH meshes beyond the SMEM capacity: the chunked
    per-bounce kernels (ops.pathkernel.BigMeshTracer), any integrator mode
    and split-screen included."""
    from .ops.intersect import on_tpu
    from .ops.pathkernel import BigMeshTracer

    from .ops.pathkernel import bigmesh_block_dims

    bt = BigMeshTracer(scene)
    interpret = not on_tpu()
    frame = jnp.asarray(frame, jnp.uint32)
    modes = set(settings.modes())
    scale = 1.0 / settings.aa
    bw, bh = bigmesh_block_dims()

    if len(modes) > 1:
        # Split-screen: per-quadrant pixel batches, rect reassembly via
        # static slice updates (same scheme as the small-scene path).
        parts = _split_partition(cfg, settings)
        out = jnp.zeros((3, cfg.height, cfg.width), jnp.float32)
        for m, (y0, y1, x0, x1) in parts:
            sub = _rect_pixels(y0, y1, x0, x1, cfg.width)
            sxs = sub % jnp.uint32(cfg.width)
            sys_ = sub // jnp.uint32(cfg.width)
            acc = [0.0, 0.0, 0.0]
            for i in range(settings.aa):
                salt0 = jnp.uint32(i * AA_STRIDE)
                rgb = _trace_mode_bigmesh(
                    bt, camera, settings, cfg, sub, sxs, sys_, frame,
                    salt0, m, interpret)
                acc = [a + c for a, c in zip(acc, rgb)]
            rect = jnp.stack(
                [(a * scale).reshape(y1 - y0, x1 - x0) for a in acc])
            out = jax.lax.dynamic_update_slice(out, rect, (0, y0, x0))
        return out

    (mode,) = modes
    grid = _block_grid(cfg.width, cfg.height, bw, bh)
    inv_ord = block_meta = None
    if grid is not None:
        pixel_np, block_meta = grid
        pixel = jnp.asarray(pixel_np)
        xs = pixel % jnp.uint32(cfg.width)
        ys = pixel // jnp.uint32(cfg.width)
    else:
        pixel, xs, ys = _pixel_grid(cfg)
        order, inv_ord = _block_order(cfg.width, cfg.height, bw=bw, bh=bh)
        pixel, xs, ys = pixel[order], xs[order], ys[order]
    acc_r = acc_g = acc_b = 0.0
    for i in range(settings.aa):
        salt0 = jnp.uint32(i * AA_STRIDE)
        r, g, b = _trace_mode_bigmesh(
            bt, camera, settings, cfg, pixel, xs, ys, frame, salt0, mode,
            interpret)
        acc_r = acc_r + r
        acc_g = acc_g + g
        acc_b = acc_b + b
    chans = [acc_r * scale, acc_g * scale, acc_b * scale]
    if block_meta is not None:
        return jnp.stack(
            [_unblock(c, cfg.width, cfg.height, block_meta) for c in chans])
    chans = [c[inv_ord] for c in chans]
    return jnp.stack(chans).reshape(3, cfg.height, cfg.width)


def render_sample_chw(scene, camera, settings: RenderSettings, cfg: FilmConfig, frame):
    """Render one frame's sample image f32[3,H,W] (pre-accumulation).

    Channels-first is the TPU-native film layout (see ops.film docstring);
    this is the function the film/EMA path and benchmarks use.

    ``frame`` is a traced u32 — it seeds the stateless RNG exactly as the
    reference seeds per-pixel xorshift with wang_hash(pixel)+frame
    (util.glsl:35-36), so frame-to-frame samples decorrelate and a film reset
    replays the same sequence.
    """
    pixel, xs, ys = _pixel_grid(cfg)
    sampled = render_pixels(scene, camera, settings, cfg, frame, pixel, xs, ys)
    return sampled.T.reshape(3, cfg.height, cfg.width)


def render_sample(scene, camera, settings: RenderSettings, cfg: FilmConfig, frame):
    """Render one frame's sample image f32[H,W,3] (display layout)."""
    return jnp.moveaxis(render_sample_chw(scene, camera, settings, cfg, frame), 0, -1)


def render_frame(scene, camera, settings: RenderSettings, cfg: FilmConfig,
                 film: film_ops.Film, dirty, fast: bool = True):
    """Sample + temporal EMA accumulate; returns (new_film, image f32[3,H,W]).

    ``fast=True`` (display paths) uses the megakernel when eligible; gradient
    consumers must pass ``fast=False`` (the kernel has no autodiff rule).
    """
    frame = jnp.where(jnp.asarray(dirty), jnp.uint32(0), film.frame)
    render = render_sample_fast_chw if fast else render_sample_chw
    sample = render(scene, camera, settings, cfg, frame)
    new_film = film_ops.accumulate(film, sample, dirty)
    return new_film, new_film.accum


@partial(jax.jit, static_argnames=("settings", "cfg"), donate_argnames=("film",))
def render_frame_jit(scene, camera, settings, cfg, film, dirty):
    """Jitted steady-state frame step.  ``film`` is donated — the accumulation
    buffer is updated in place on device, the analog of the reference's
    per-frame ring of storage images (rvpt.h:193-215)."""
    return render_frame(scene, camera, settings, cfg, film, dirty)
