import os

import numpy as np
import pytest

from rvpt_tpu import FilmConfig, RenderSettings
from rvpt_tpu.renderer import Renderer
from rvpt_tpu.scene import builtin


def make_renderer(**kw):
    cfg = FilmConfig(width=32, height=16)
    scene, cam = builtin.sphere_plane(aspect=cfg.aspect)
    st = RenderSettings(max_bounces=2)
    return Renderer(scene, cam, st, cfg, **kw)


def test_draw_accumulates_and_dirty_resets():
    r = make_renderer()
    r.draw()
    r.draw()
    assert int(r.film.frame) == 2
    # camera move -> dirty -> accumulation restarts
    r.update_camera(translation=(0.0, 0.0, -0.5))
    r.draw()
    assert int(r.film.frame) == 1
    # settings change -> dirty
    r.draw()
    r.settings = r.settings.replace(max_bounces=3)
    r.draw()
    assert int(r.film.frame) == 1


def test_stats():
    r = make_renderer()
    r.draw()
    s = r.stats()
    assert s["frames"] == 1
    assert s["avg_ms"] > 0
    assert s["mrays_per_s"] > 0
    assert s["accumulated_frames"] == 1


def test_checkpoint_roundtrip(tmp_path):
    r = make_renderer()
    r.draw()
    r.draw()
    p = str(tmp_path / "ck.npz")
    r.save_checkpoint(p)

    r2 = make_renderer()
    r2.load_checkpoint(p)
    assert int(r2.film.frame) == 2
    assert np.allclose(np.asarray(r2.film.accum), np.asarray(r.film.accum))
    # resume continues accumulation without reset
    r2.draw()
    assert int(r2.film.frame) == 3


def test_save_image(tmp_path):
    r = make_renderer()
    r.draw()
    p = str(tmp_path / "img.png")
    r.save_image(p)
    from rvpt_tpu.utils.image import read_png

    img = read_png(p)
    assert img.shape == (16, 32, 3)


def test_debug_views():
    cfg = FilmConfig(width=48, height=32)
    from rvpt_tpu.scene import obj_io

    v, f = obj_io.make_icosphere(subdiv=1)
    scene, cam = builtin.mesh_scene(v, f, aspect=cfg.aspect)
    import dataclasses

    cam = dataclasses.replace(
        cam,
        translation=np.zeros(3, np.float32) + np.array([0, 0, -3], np.float32),
        rotation=np.zeros(3, np.float32),
    )
    r = Renderer(scene, cam, RenderSettings(max_bounces=1), cfg)
    r.draw()
    tri = r.debug_view("triangles")
    assert tri.shape == (32, 48, 3)
    # the overlay must actually draw red wireframe pixels
    base = np.moveaxis(np.asarray(r.film.accum), 0, -1)
    assert (np.abs(tri - base) > 1e-3).any()
    bvh = r.debug_view("bvh")
    assert bvh.shape == (32, 48, 3)
    assert (np.abs(bvh - base) > 1e-3).any()


def test_cli_end_to_end(tmp_path):
    from rvpt_tpu.cli import main

    out = str(tmp_path / "cli.png")
    ck = str(tmp_path / "cli.npz")
    rc = main([
        "--scene", "sphere_plane", "--size", "32x16", "--frames", "2",
        "--integrator", "kajiya", "--bounces", "2", "--out", out,
        "--checkpoint", ck, "--stats",
    ])
    assert rc == 0
    assert os.path.exists(out) and os.path.exists(ck)
    # resume path
    rc = main([
        "--scene", "sphere_plane", "--size", "32x16", "--frames", "1",
        "--integrator", "kajiya", "--bounces", "2", "--out", out,
        "--resume", ck,
    ])
    assert rc == 0


def test_cli_split_and_bvh(tmp_path):
    from rvpt_tpu.cli import main

    out = str(tmp_path / "split.png")
    rc = main([
        "--scene", "cornell", "--size", "32x32", "--frames", "1",
        "--split", "normal,binary,color,depth", "--out", out,
    ])
    assert rc == 0
    rc = main([
        "--scene", "cornell", "--size", "16x16", "--frames", "1",
        "--bvh", "--out", out,
    ])
    assert rc == 0


def test_cli_bad_args():
    from rvpt_tpu.cli import main

    assert main(["--scene", "nope"]) == 2
    assert main(["--integrator", "nope"]) == 2
    assert main(["--split", "a,b"]) == 2
