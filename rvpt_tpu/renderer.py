"""Renderer orchestration: the engine object.

TPU-native re-design of class ``RVPT`` (src/rvpt/rvpt.h:35-229,
rvpt.cpp:31-1054).  Owns the scene pytree, camera, render settings, and the
temporal film; implements the per-frame dirty check that resets accumulation
on any camera/settings change (rvpt.cpp:21-29, 102-111); exposes
reload (re-jit, the analog of reload_shaders), debug views, checkpoints, and
frame statistics.  Everything Vulkan in the reference — queues, descriptor
sets, pipelines, barriers — is jit + XLA here and needs no counterpart.
"""

from __future__ import annotations

import dataclasses
import os
from collections import deque
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import FilmConfig, RenderSettings
from .models.camera import Camera
from .ops.film import Film, to_srgb_u8
from .render import render_frame_jit
from .scene.bvh import BvhHost, attach_bvh, build_bvh, triangle_bounds
from .scene.scene import Scene
from .utils import checkpoint as ckpt
from .utils.hot_reload import SourceWatcher
from .utils.image import write_png
from .utils.timer import FrameTimer

# The reference keeps 2 frames in flight: the CPU records frame N+1 while the
# GPU executes N (rvpt.h:25, rvpt.cpp:346-404).  Here JAX's async dispatch is
# the "record"; draw() blocks only on the frame before last.
MAX_FRAMES_IN_FLIGHT = 2


def _camera_fingerprint(camera: Camera):
    return (
        tuple(np.asarray(camera.translation).tolist()),
        tuple(np.asarray(camera.rotation).tolist()),
        float(camera.fov),
        float(camera.scale),
        camera.mode,
        camera.aspect,
    )


def _state_fingerprint(camera: Camera, settings: RenderSettings):
    """The 'previous frame state' equality check (rvpt.cpp:21-29): any change
    here restarts temporal accumulation."""
    return _camera_fingerprint(camera) + (settings,)


class Renderer:
    def __init__(
        self,
        scene: Scene,
        camera: Camera,
        settings: RenderSettings | None = None,
        film: FilmConfig | None = None,
        use_bvh: bool = False,
        mesh=None,
        frames_in_flight: int = MAX_FRAMES_IN_FLIGHT,
    ) -> None:
        self.settings = settings or RenderSettings()
        self.film_cfg = film or FilmConfig()
        self.scene = attach_bvh(scene) if use_bvh else scene
        self.camera = camera
        self.mesh = mesh
        self.film = Film.create(self.film_cfg.height, self.film_cfg.width)
        self.timer = FrameTimer()
        self.frames_in_flight = max(1, int(frames_in_flight))
        self._inflight: deque = deque()
        self._prev_state = None
        self._host_bvh: Optional[BvhHost] = None
        self._image = None       # cached host HWC copy (lazy)
        self._image_dev = None   # last accumulated frame, CHW, on device
        self._sharded_step = None   # cached jitted sharded frame step
        self._sharded_key = None
        # Camera fingerprint memo: the dirty check fetches camera values to
        # host only when the camera OBJECT changed (exactly the frames that
        # reset accumulation anyway) — a per-frame np.asarray costs a ~25 ms
        # device round-trip through the TPU tunnel.
        self._fp_cam_obj = None
        self._fp_cam_val = None
        # Created eagerly so the FIRST reload() sees changes made since
        # construction (the reference's first R keypress works,
        # rvpt.cpp:444-468).
        self._watcher = SourceWatcher()

    @property
    def image(self) -> Optional[np.ndarray]:
        """Last accumulated frame as host HWC f32 (lazy device fetch)."""
        if self._image is None and self._image_dev is not None:
            self._image = np.moveaxis(np.asarray(self._image_dev), 0, -1)
        return self._image

    # ------------------------------------------------------------------ scene
    def set_scene(self, scene: Scene, use_bvh: bool = False) -> None:
        self.scene = attach_bvh(scene) if use_bvh else scene
        self._prev_state = None  # force accumulation reset
        self._host_bvh = None

    def update_camera(self, **kw) -> None:
        """Mutate camera fields (translation/rotation/fov/scale); the dirty
        check will notice and reset accumulation."""
        self.camera = dataclasses.replace(
            self.camera,
            **{
                k: (jnp.asarray(v, jnp.float32) if k != "mode" else v)
                for k, v in kw.items()
            },
        )

    # ------------------------------------------------------------------ frame
    def draw(self):
        """Render one frame: dirty-check -> jitted sample+EMA -> stats.
        Returns the accumulated image (f32[3,H,W], device array; use the
        ``image`` property for a host HWC copy)."""
        if self.camera is self._fp_cam_obj:
            cam_fp = self._fp_cam_val
        else:
            cam_fp = _camera_fingerprint(self.camera)
            self._fp_cam_obj, self._fp_cam_val = self.camera, cam_fp
        state = cam_fp + (self.settings,)
        dirty = state != self._prev_state
        self._prev_state = state

        self.timer.frame_start()
        if self.mesh is not None:
            # ONE jitted step reused every frame (film donated) — building a
            # fresh jax.jit wrapper per draw() re-traces each time.
            key = (self.settings, self.film_cfg, self.mesh)
            if self._sharded_key != key or self._sharded_step is None:
                from .parallel.sharded import make_render_fn

                self._sharded_step = make_render_fn(
                    self.scene, self.camera, self.settings, self.film_cfg,
                    self.mesh,
                )
                self._sharded_key = key
            self.film, image = self._sharded_step(
                self.scene, self.camera, self.film, dirty
            )
        else:
            self.film, image = render_frame_jit(
                self.scene, self.camera, self.settings, self.film_cfg,
                self.film, dirty,
            )
        # Frames in flight (rvpt.h:25): dispatch is async; block only on the
        # frame before last, so up to frames_in_flight-1 device frames stay
        # outstanding while the host prepares the next one.  The timer then
        # measures steady-state throughput, like the reference's frame timer
        # around its fence wait (rvpt.cpp:348,404).  The wait handle is a
        # tiny DERIVED array (film.frame + 0): the film itself is donated
        # into the next step, so its own buffers can't be blocked on later.
        self._inflight.append(self.film.frame + jnp.uint32(0))
        while len(self._inflight) >= self.frames_in_flight:
            self._inflight.popleft().block_until_ready()
        self.timer.frame_stop()
        # The image stays ON DEVICE between frames — a per-frame host fetch
        # costs ~25 ms through the TPU tunnel (measured, 512^2 film) and the
        # steady-state loop never looks at the pixels.  Host consumers
        # (save_image, debug_view) fetch lazily via the ``image`` property.
        self._image_dev = image
        self._image = None
        return image

    def flush(self) -> None:
        """Drain all in-flight frames (device sync)."""
        while self._inflight:
            self._inflight.popleft().block_until_ready()
        if self._image_dev is not None:
            self._image_dev.block_until_ready()

    @property
    def rays_per_frame(self) -> int:
        return (
            self.film_cfg.num_pixels * self.settings.aa * self.settings.max_bounces
        )

    def stats(self) -> dict:
        s = self.timer.stats(self.rays_per_frame)
        s["accumulated_frames"] = int(self.film.frame)
        return s

    # ------------------------------------------------------------- hot reload
    def reload(self) -> list[str]:
        """Source-watch re-jit — the analog of RVPT::reload_shaders
        (rvpt.cpp:444-468).  The watcher is created at construction, so the
        first call already picks up edits made since then."""
        dirty = self._watcher.reload_if_changed()
        if dirty:
            # The cached sharded step closes over (possibly stale) module
            # functions; drop it so the next draw re-closes over fresh code.
            self._sharded_step = None
            self._sharded_key = None
        return dirty

    # ------------------------------------------------------------ debug views
    def host_bvh(self) -> BvhHost:
        if self._host_bvh is None:
            v0 = np.asarray(self.scene.tri_v0)
            if len(v0) == 0:
                raise ValueError("scene has no triangles to build a BVH over")
            centers, bmin, bmax = triangle_bounds(
                v0, np.asarray(self.scene.tri_v1), np.asarray(self.scene.tri_v2)
            )
            self._host_bvh = build_bvh(centers, bmin, bmax)
        return self._host_bvh

    def debug_view(self, kind: str = "triangles", **kw) -> np.ndarray:
        """'triangles' wireframe overlay or 'bvh' AABB-by-depth overlay on the
        last rendered frame (reference debug raster + BVH views)."""
        from .utils import debug_draw

        base = self.image if self.image is not None else np.zeros(
            (self.film_cfg.height, self.film_cfg.width, 3), np.float32
        )
        if kind == "triangles":
            return debug_draw.overlay_triangles(base, self.scene, self.camera, **kw)
        if kind == "bvh":
            return debug_draw.overlay_bvh(base, self.host_bvh(), self.camera, **kw)
        raise ValueError(f"unknown debug view {kind!r}")

    # ------------------------------------------------------------ persistence
    def save_image(self, path: str) -> None:
        if self._image_dev is None:
            self.draw()
        write_png(path, np.asarray(to_srgb_u8(jnp.asarray(self.image))))

    def save_checkpoint(self, path: str) -> None:
        ckpt.save(
            path,
            {"film": self.film, "camera": self.camera, "scene": self.scene},
            meta={"settings": self.settings.to_json()},
        )

    def load_checkpoint(self, path: str) -> None:
        tree, meta = ckpt.load(
            path, {"film": self.film, "camera": self.camera, "scene": self.scene}
        )
        self.film = tree["film"]
        self.camera = tree["camera"]
        self.scene = tree["scene"]
        if meta.get("settings"):
            self.settings = RenderSettings.from_json(meta["settings"])
        # resuming continues accumulation: mark state clean
        self._prev_state = _state_fingerprint(self.camera, self.settings)
