"""Multi-chip rendering via shard_map over a (tiles, spp) mesh.

Design (SURVEY.md §5 "distributed communication backend"):
  * Film rows/tiles are sharded over the ``tiles`` axis — pure data
    parallelism, zero cross-chip traffic during tracing because the scene and
    materials are replicated on every chip (they are tiny; the reference
    re-uploads them per frame, src/rvpt/rvpt.cpp:124-126).
  * The ``spp`` axis shards Monte-Carlo samples of the *same* pixels; ranks
    render decorrelated sample sets and a ``pmean`` over ICI combines them —
    the path-tracing analog of sequence parallelism.
  * Gradients of replicated scene parameters are all-reduced automatically:
    shard_map's transpose inserts a psum for replicated inputs, so
    ``jax.grad`` of a sharded loss needs no hand-written collectives.

RNG streams are keyed by *global* pixel id, so the sharded image is
bit-identical to the single-device one (tested).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..config import FilmConfig, RenderSettings
from ..ops import film as film_ops
from ..render import _pixel_grid, render_pixels
from .mesh import SPP_AXIS, TILE_AXIS


def _padded_grid(cfg: FilmConfig, n_tiles: int):
    """Global pixel-coordinate arrays padded to a multiple of n_tiles.

    Padding lanes replicate pixel 0 (their results are dropped on reshape) so
    any film size divides the mesh; for best balance keep H*W % n_tiles == 0.
    """
    pixel, xs, ys = _pixel_grid(cfg)
    n = pixel.shape[0]
    pad = (-n) % n_tiles
    if pad:
        pixel = jnp.concatenate([pixel, pixel[:pad]])
        xs = jnp.concatenate([xs, xs[:pad]])
        ys = jnp.concatenate([ys, ys[:pad]])
    return pixel, xs, ys, n


def render_sample_sharded(scene, camera, settings: RenderSettings,
                          cfg: FilmConfig, frame, mesh):
    """Full-film sample image rendered across the mesh -> f32[3,H,W].

    Effective samples per pixel = settings.aa * mesh.shape[spp].
    """
    n_tiles = mesh.shape[TILE_AXIS]
    n_spp = mesh.shape[SPP_AXIS]
    pixel, xs, ys, n = _padded_grid(cfg, n_tiles)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(TILE_AXIS), P(TILE_AXIS), P(TILE_AXIS), P(), P(), P()),
        out_specs=P(None, TILE_AXIS),
        # The bounce-loop scan carries are initialized from literals; the
        # varying-manual-axes checker would reject them (they only become
        # varying after the first combine with ray data), so use the legacy
        # unchecked semantics.
        check_vma=False,
    )
    def tile_render(pixel, xs, ys, scene, camera, frame):
        rank = jax.lax.axis_index(SPP_AXIS)
        sampled = render_pixels(
            scene, camera, settings, cfg, frame, pixel, xs, ys,
            aa_offset=rank.astype(jnp.uint32) * jnp.uint32(settings.aa),
        )
        if n_spp > 1:
            sampled = jax.lax.pmean(sampled, SPP_AXIS)
        return sampled.T  # [3, n_local]: channels-first film layout

    frame = jnp.asarray(frame, jnp.uint32)
    sampled = tile_render(pixel, xs, ys, scene, camera, frame)
    return sampled[:, :n].reshape(3, cfg.height, cfg.width)


def render_sample_sharded_fast(scene, camera, settings: RenderSettings,
                               cfg: FilmConfig, frame, mesh,
                               interpret: bool = False):
    """Path-kernel-backed sharded sample render -> f32[3,H,W].

    The fused whole-path Pallas kernel (ops.pathkernel) runs per shard inside
    shard_map: film tiles data-parallel over ``tiles``, decorrelated sample
    sets over ``spp`` pmean'd across ICI, scene/camera replicated.  RNG is
    keyed by global pixel id and traced salt counters, so for a 1-wide spp
    axis the sharded image is bit-identical to the single-device fast path
    (tested); spp ranks reproduce the XLA path's aa_offset salt layout.
    """
    from ..models.integrators import AA_STRIDE
    from ..ops.pathkernel import PathTracer, camera_params, is_bigmesh
    from ..render import _INTEGRATOR_SITE, _JITTER_SITE, _block_order

    n_tiles = mesh.shape[TILE_AXIS]
    n_spp = mesh.shape[SPP_AXIS]
    pixel, _, _ = _pixel_grid(cfg)
    inv_ord = block_meta = None
    bigmesh = is_bigmesh(scene)
    if scene.bvh is not None and scene.num_triangles > 0:
        # Mesh scenes (culled or chunked): arrange pixels into compact
        # screen blocks BEFORE sharding, so each shard's kernel tiles stay
        # frustum-tight (raw raster order would hand every tile a ~4-row
        # film strip).  Prefer the gather-free padded block layout.
        from ..render import _block_grid
        grid = _block_grid(cfg.width, cfg.height)
        if grid is not None:
            pixel_np, block_meta = grid
            pixel = jnp.asarray(pixel_np)
        else:
            order, inv_ord = _block_order(cfg.width, cfg.height)
            pixel = pixel[order]
    n = pixel.shape[0]
    pad = (-n) % n_tiles
    if pad:
        pixel = jnp.concatenate([pixel, pixel[:pad]])
    cp = camera_params(camera, cfg)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(TILE_AXIS), P(), P(), P()),
        out_specs=P(None, TILE_AXIS),
        check_vma=False,
    )
    def tile_render(pixel, scene, cp, frame):
        from ..ops.pathkernel import BigMeshTracer
        from ..render import jittered_camera_rays

        rank = jax.lax.axis_index(SPP_AXIS).astype(jnp.uint32)
        pt = BigMeshTracer(scene) if bigmesh else PathTracer(scene)
        acc_r = acc_g = acc_b = 0.0
        for i in range(settings.aa):
            salt0 = (jnp.uint32(i) + rank * jnp.uint32(settings.aa)) * jnp.uint32(AA_STRIDE)
            if bigmesh:
                # The chunked kernel has no in-kernel raygen; generate shard
                # rays in XLA with the display path's exact jitter salts.
                xs = pixel % jnp.uint32(cfg.width)
                ys = pixel // jnp.uint32(cfg.width)
                ray = jittered_camera_rays(
                    camera, cfg, pixel, xs, ys, frame, salt0)
                r, g, b = pt.trace(
                    pixel, ray.origin, ray.direction, frame,
                    salt_base=salt0 + jnp.uint32(_INTEGRATOR_SITE),
                    max_bounces=settings.max_bounces, style=settings.style,
                    interpret=interpret,
                )
            else:
                r, g, b = pt.trace(
                    pixel, None, None, frame,
                    salt_base=salt0 + jnp.uint32(_INTEGRATOR_SITE),
                    max_bounces=settings.max_bounces, style=settings.style,
                    gen_rays=True, cam_params=cp, cam_mode=camera.mode,
                    jitter_salt=salt0 + jnp.uint32(_JITTER_SITE),
                    interpret=interpret,
                )
            acc_r = acc_r + r
            acc_g = acc_g + g
            acc_b = acc_b + b
        inv = 1.0 / settings.aa
        sampled = jnp.stack([acc_r * inv, acc_g * inv, acc_b * inv])
        if n_spp > 1:
            sampled = jax.lax.pmean(sampled, SPP_AXIS)
        return sampled

    frame = jnp.asarray(frame, jnp.uint32)
    sampled = tile_render(pixel, scene, cp, frame)
    out = sampled[:, :n]
    if block_meta is not None:
        from ..render import _unblock
        return jnp.stack(
            [_unblock(out[k], cfg.width, cfg.height, block_meta)
             for k in range(3)])
    if inv_ord is not None:
        out = out[:, inv_ord]
    return out.reshape(3, cfg.height, cfg.width)


def _sharded_fast_eligible(scene, settings: RenderSettings) -> bool:
    """The sharded steady-state loop rides the fused path kernels whenever
    the single-device display path would (render.py _megakernel_eligible) and
    the frame is a single full-film Kajiya pass — the beauty-render hot loop.
    Split-screen / debug modes stay on the XLA integrators per shard."""
    from ..render import _megakernel_eligible

    return (set(settings.modes()) == {9}
            and _megakernel_eligible(scene, settings))


def render_frame_sharded(scene, camera, settings, cfg, film, dirty, mesh,
                         interpret: bool = False):
    """Sharded sample + EMA accumulate (film itself stays row-sharded if the
    caller placed it so; the update is elementwise).

    Kernel-eligible frames (Kajiya beauty render, including culled and
    chunked big-mesh scenes) run the fused Pallas path kernel per shard via
    render_sample_sharded_fast — the same kernels the single-chip display
    path uses (reference steady loop: rvpt.cpp:346-404); everything else
    falls back to the XLA integrators."""
    frame = jnp.where(jnp.asarray(dirty), jnp.uint32(0), film.frame)
    if _sharded_fast_eligible(scene, settings):
        sample = render_sample_sharded_fast(
            scene, camera, settings, cfg, frame, mesh, interpret=interpret)
    else:
        sample = render_sample_sharded(scene, camera, settings, cfg, frame,
                                       mesh)
    new_film = film_ops.accumulate(film, sample, dirty)
    return new_film, new_film.accum


def make_render_fn(scene, camera, settings, cfg, mesh, interpret: bool = False):
    """Jitted closure for the steady-state sharded frame loop."""

    @partial(jax.jit, donate_argnames=("film",))
    def step(scene, camera, film, dirty):
        return render_frame_sharded(scene, camera, settings, cfg, film,
                                    dirty, mesh, interpret=interpret)

    return step
