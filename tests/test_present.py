"""PygamePresenter driven headlessly through SDL's dummy video driver.

The fake-backend test the reference's GLFW window can never have: real SDL
event plumbing (keys, mouse motion, clicks, quit) posted synthetically and
asserted against the InputState machine, including the cursor lock protocol
(window.cpp:260-269: Enter toggles, left-release unlocks/relocks)."""

import numpy as np
import pytest

pygame = pytest.importorskip("pygame")

from rvpt_tpu.window import Action, InputState, KeyState  # noqa: E402


@pytest.fixture()
def presenter():
    from rvpt_tpu.present import PygamePresenter

    inp = InputState()
    p = PygamePresenter(inp, 32, 16, driver="dummy")
    yield p
    p.close()


def _post_key(code, down=True):
    pygame.event.post(
        pygame.event.Event(pygame.KEYDOWN if down else pygame.KEYUP, key=code)
    )


def test_key_events_reach_input_state(presenter):
    inp = presenter.input
    _post_key(pygame.K_w)
    presenter.pump()
    inp.poll_events()
    assert inp.is_key_down("w")
    inp.poll_events()
    assert inp.is_key_held("w")
    _post_key(pygame.K_w, down=False)
    presenter.pump()
    inp.poll_events()
    assert inp.is_key_up("w")


def test_quit_event_closes(presenter):
    pygame.event.post(pygame.event.Event(pygame.QUIT))
    presenter.pump()
    assert presenter.input.should_close()


def test_cursor_lock_follows_input_state(presenter):
    inp = presenter.input
    assert presenter.mouse_grabbed  # locked by default (window.h:217)
    # left-release while locked unlocks (main.cpp:124-137 protocol is in the
    # Viewer; here we drive InputState directly)
    inp.set_mouse_window_lock(False)
    presenter.pump()
    assert not presenter.mouse_grabbed
    inp.set_mouse_window_lock(True)
    presenter.pump()
    assert presenter.mouse_grabbed


def test_locked_motion_integrates_deltas(presenter):
    inp = presenter.input
    seen = []
    inp.mouse_move_callbacks.append(lambda dx, dy: seen.append((dx, dy)))
    pygame.event.post(
        pygame.event.Event(pygame.MOUSEMOTION, pos=(5, 5), rel=(3, -2))
    )
    presenter.pump()
    assert seen == [(3.0, -2.0)]
    # unlocked motion uses absolute positions
    inp.set_mouse_window_lock(False)
    presenter.pump()
    pygame.event.post(
        pygame.event.Event(pygame.MOUSEMOTION, pos=(10, 4), rel=(7, 1))
    )
    presenter.pump()
    assert inp.mouse_x == 10.0 and inp.mouse_y == 4.0


def test_present_blits_frame(presenter):
    img = np.random.default_rng(0).uniform(size=(16, 32, 3)).astype(np.float32)
    presenter.present(img)  # must not raise under the dummy driver


def test_viewer_pygame_backend_end_to_end():
    """Full Viewer loop on the dummy driver: W key moves the camera, Enter
    release toggles the lock, Escape closes — the reference's main loop
    (main.cpp:139-155) against a real event backend."""
    from rvpt_tpu import FilmConfig, RenderSettings
    from rvpt_tpu.renderer import Renderer
    from rvpt_tpu.scene import builtin
    from rvpt_tpu.window import Viewer

    cfg = FilmConfig(width=32, height=16)
    scene, cam = builtin.sphere_plane(aspect=cfg.aspect)
    r = Renderer(scene, cam, RenderSettings(max_bounces=1), cfg)
    v = Viewer(r, backend="pygame", sdl_driver="dummy")
    try:
        z0 = float(r.camera.translation[2])
        _post_key(pygame.K_w)
        v.step(dt=0.1)   # PRESSED this frame (movement starts when HELD)
        v.step(dt=0.1)   # HELD -> camera moves
        _post_key(pygame.K_w, down=False)
        v.step(dt=0.1)
        assert float(r.camera.translation[2]) > z0  # moved forward

        assert v.input.mouse_locked
        _post_key(pygame.K_RETURN)
        v.step(dt=0.0)
        _post_key(pygame.K_RETURN, down=False)
        v.step(dt=0.0)  # enter release -> toggle lock
        assert not v.input.mouse_locked
        assert not v.presenter.mouse_grabbed

        _post_key(pygame.K_ESCAPE)
        v.step(dt=0.0)
        assert v.input.should_close()
    finally:
        v.presenter.close()
