"""Generate the golden images for test_goldens.py.

Must run under the exact test environment (8-device virtual CPU mesh):
importing conftest applies it.  XLA compiles differently for different
device-count flags and discrete shading decisions (shadow tests, material
branches) can flip on the resulting ulp differences, so goldens are only
valid for the environment they were generated in.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import conftest  # noqa: F401  (forces the CPU-mesh test environment)

import numpy as np

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")

# name -> (scene, integrator, size, frames, bounces)
# size: int (square) or (width, height).  Scenes: sphere_plane, cornell, plus
# the mesh scenes "rabbit" (the reference's demo scene, main.cpp:96-107, at
# its native 2:1 aspect) and "mesh:N" (BVH icosphere demo) — these pin the
# loaded-OBJ + BVH path the analytic goldens can't reach.
CASES = {
    "sphere_plane_kajiya": ("sphere_plane", "kajiya", 64, 4, 4),
    "rabbit_kajiya": ("rabbit", "kajiya", (256, 128), 2, 8),
    "mesh2_kajiya": ("mesh:2", "kajiya", (128, 128), 2, 8),
    "cornell_kajiya": ("cornell", "kajiya", 64, 4, 4),
    "cornell_normal": ("cornell", "normal", 64, 1, 1),
    "cornell_color": ("cornell", "color", 64, 1, 1),
    "cornell_depth": ("cornell", "depth", 64, 1, 1),
    "cornell_binary": ("cornell", "binary", 64, 1, 1),
    "cornell_utah": ("cornell", "utah", 64, 1, 1),
    "cornell_ao": ("cornell", "ao", 64, 1, 8),
    "cornell_appel": ("cornell", "appel", 64, 1, 1),
    "cornell_whitted": ("cornell", "whitted", 64, 2, 4),
    "cornell_cook": ("cornell", "cook", 64, 2, 4),
    "sphere_plane_hart": ("sphere_plane", "hart", 32, 1, 1),
    "cornell_ortho": ("cornell", "kajiya:ortho", 64, 2, 3),
    "cornell_spherical": ("cornell", "kajiya:spherical", 64, 2, 3),
}


def render_case(name: str) -> np.ndarray:
    import dataclasses

    import jax.numpy as jnp

    from rvpt_tpu import FilmConfig, RenderSettings
    from rvpt_tpu.models.camera import CAMERA_MODE_NAMES
    from rvpt_tpu.models.integrators import INTEGRATOR_NAMES
    from rvpt_tpu.ops.film import Film, chw_to_hwc, to_srgb_u8
    from rvpt_tpu.render import render_frame
    from rvpt_tpu.scene import builtin

    scene_name, integ, size, frames, bounces = CASES[name]
    cam_mode = "pinhole"
    if ":" in integ:
        integ, cam_mode = integ.split(":")
    w, h = size if isinstance(size, tuple) else (size, size)
    cfg = FilmConfig(width=w, height=h)
    if scene_name == "rabbit":
        scene, cam = builtin.rabbit(aspect=cfg.aspect)
    elif scene_name.startswith("mesh:"):
        scene, cam = builtin.mesh_demo(
            subdiv=int(scene_name.split(":")[1]), aspect=cfg.aspect
        )
    else:
        scene, cam = getattr(builtin, {
            "sphere_plane": "sphere_plane", "cornell": "cornell_box",
        }[scene_name])(aspect=cfg.aspect)
    cam = dataclasses.replace(cam, mode=CAMERA_MODE_NAMES[cam_mode])
    mode = INTEGRATOR_NAMES[integ]
    st = RenderSettings(
        max_bounces=bounces,
        camera_mode=CAMERA_MODE_NAMES[cam_mode],
        top_left_render_mode=mode, top_right_render_mode=mode,
        bottom_left_render_mode=mode, bottom_right_render_mode=mode,
    )
    film = Film.create(cfg.height, cfg.width)
    for f in range(frames):
        film, img = render_frame(scene, cam, st, cfg, film, f == 0)
    return np.asarray(to_srgb_u8(chw_to_hwc(img)))


def main() -> None:
    from rvpt_tpu.utils.image import write_png

    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name in CASES:
        img = render_case(name)
        write_png(os.path.join(GOLDEN_DIR, f"{name}.png"), img)
        print("wrote", name)


if __name__ == "__main__":
    sys.exit(main())
