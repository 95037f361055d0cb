"""Interactive window/input layer (rvpt_tpu.window).

Verifies the edge-triggered key state machine against the reference's
transitions (src/rvpt/window.cpp:94-137), the FPS camera controller against
main.cpp:64-86 semantics, and a headless Viewer loop end-to-end.
"""

import numpy as np
import pytest

from rvpt_tpu.models import camera as camera_mod
from rvpt_tpu.window import Action, CameraController, InputState, KeyState, Viewer


class TestInputState:
    def test_press_edge_then_held(self):
        inp = InputState()
        inp.on_key("w", Action.PRESS)
        # Events queue until the poll (GLFW delivers inside glfwPollEvents).
        assert not inp.is_key_down("w")
        inp.poll_events()
        assert inp.is_key_down("w") and not inp.is_key_held("w")
        inp.poll_events()
        assert not inp.is_key_down("w") and inp.is_key_held("w")
        inp.poll_events()  # stays held until released
        assert inp.is_key_held("w")

    def test_release_edge_clears_after_one_poll(self):
        inp = InputState()
        inp.on_key("w", Action.PRESS)
        inp.poll_events()
        inp.on_key("w", Action.RELEASE)
        inp.poll_events()
        assert inp.is_key_up("w") and not inp.is_key_held("w")
        inp.poll_events()
        assert not inp.is_key_up("w")
        assert inp._keys["w"] is KeyState.NONE

    def test_repeat_counts_as_held(self):
        inp = InputState()
        inp.on_key("w", Action.PRESS)
        inp.poll_events()
        inp.on_key("w", Action.REPEAT)
        inp.poll_events()
        assert inp.is_key_held("w")
        assert not inp.is_key_down("w")

    def test_press_while_held_does_not_retrigger_edge(self):
        inp = InputState()
        inp.on_key("w", Action.PRESS)
        inp.poll_events()
        inp.poll_events()
        inp.on_key("w", Action.PRESS)  # backend re-sends; must stay held
        inp.poll_events()
        assert inp.is_key_held("w") and not inp.is_key_down("w")

    def test_case_insensitive(self):
        inp = InputState()
        inp.on_key("W", Action.PRESS)
        inp.poll_events()
        assert inp.is_key_down("w")

    def test_mouse_move_reports_delta(self):
        inp = InputState()
        seen = []
        inp.mouse_move_callbacks.append(lambda dx, dy: seen.append((dx, dy)))
        inp.on_mouse_move(10.0, 5.0)
        inp.on_mouse_move(13.0, 3.0)
        assert seen[-1] == (3.0, -2.0)

    def test_mouse_lock_restores_position(self):
        # window.cpp:260-269: unlocking saves nothing; locking saves the
        # position, unlocking restores it.
        inp = InputState()
        inp.set_mouse_window_lock(False)
        inp.on_mouse_move(100.0, 50.0)
        inp.set_mouse_window_lock(True)   # saves (100, 50)
        inp.on_mouse_move(7.0, 8.0)
        inp.set_mouse_window_lock(False)  # restores
        assert (inp.mouse_x, inp.mouse_y) == (100.0, 50.0)


class TestCameraController:
    def make(self):
        return CameraController(), camera_mod.Camera.create(), InputState()

    def hold(self, inp, key):
        inp.on_key(key, Action.PRESS)
        inp.poll_events()
        inp.poll_events()  # PRESSED edge -> HELD

    def test_wasd_moves_camera_local_frame(self):
        ctl, cam, inp = self.make()
        # Rotate camera 90 deg yaw: forward (+z local) becomes +x world.
        cam = camera_mod.rotate(cam, (90.0, 0.0, 0.0))
        self.hold(inp, "w")
        out = ctl.update(inp, cam, dt=1.0)
        delta = np.asarray(out.translation) - np.asarray(cam.translation)
        np.testing.assert_allclose(delta, [3.0, 0.0, 0.0], atol=1e-5)

    def test_shift_is_5x(self):
        ctl, cam, inp = self.make()
        self.hold(inp, "w")
        self.hold(inp, "left_shift")
        out = ctl.update(inp, cam, dt=0.1)
        delta = np.asarray(out.translation)
        np.testing.assert_allclose(delta, [0.0, 0.0, 1.5], atol=1e-5)

    def test_space_ctrl_vertical(self):
        ctl, cam, inp = self.make()
        self.hold(inp, "space")
        out = ctl.update(inp, cam, dt=0.5)
        np.testing.assert_allclose(
            np.asarray(out.translation), [0.0, 1.5, 0.0], atol=1e-5
        )

    def test_arrow_rotation_is_tap_edge_only(self):
        # main.cpp:80-85 queries is_key_down (the PRESSED edge), so a held
        # arrow key rotates exactly once per press.
        ctl, cam, inp = self.make()
        inp.on_key("right", Action.PRESS)
        inp.poll_events()
        out = ctl.update(inp, cam, dt=0.0)
        assert float(out.rotation[0]) == pytest.approx(0.3)
        inp.poll_events()  # now HELD: no further rotation
        out2 = ctl.update(inp, out, dt=0.0)
        assert float(out2.rotation[0]) == pytest.approx(0.3)

    def test_mouse_look_only_while_locked(self):
        ctl, cam, inp = self.make()
        out = ctl.mouse_look(inp, cam, 10.0, 4.0)
        np.testing.assert_allclose(
            np.asarray(out.rotation), [3.0, -1.2, 0.0], atol=1e-6
        )
        inp.set_mouse_window_lock(False)
        out2 = ctl.mouse_look(inp, cam, 10.0, 4.0)
        np.testing.assert_allclose(np.asarray(out2.rotation), [0.0, 0.0, 0.0])

    def test_pitch_clamp(self):
        ctl = CameraController(clamp_vertical=True)
        cam = camera_mod.Camera.create(rotation=(0.0, 89.0, 0.0))
        inp = InputState()
        inp.set_mouse_window_lock(True)
        out = ctl.mouse_look(inp, cam, 0.0, -100.0)
        assert float(out.rotation[1]) == pytest.approx(90.0)


class TestViewer:
    def make_viewer(self, frames_sink):
        from rvpt_tpu import FilmConfig, RenderSettings
        from rvpt_tpu.renderer import Renderer
        from rvpt_tpu.scene import builtin

        cfg = FilmConfig(width=32, height=16)
        scene, camera = builtin.cornell_box(aspect=cfg.aspect)
        r = Renderer(scene, camera, RenderSettings(max_bounces=1), cfg)
        return Viewer(r, backend=frames_sink.append)

    def test_headless_loop_renders_and_accumulates(self):
        frames = []
        v = self.make_viewer(frames)
        n = v.run(max_frames=3)
        assert n == 3 and len(frames) == 3
        assert frames[0].shape == (16, 32, 3)
        assert int(v.renderer.film.frame) == 3

    def test_escape_closes(self):
        frames = []
        v = self.make_viewer(frames)
        v.step(dt=0.0)
        v.input.on_key("escape", Action.PRESS)
        assert v.run(max_frames=10) == 1  # one more step, then closed
        assert v.input.should_close()

    def test_camera_movement_resets_accumulation(self):
        # The dirty check (rvpt.cpp:102-111) must notice controller movement.
        frames = []
        v = self.make_viewer(frames)
        v.step(dt=0.1)
        v.step(dt=0.1)
        assert int(v.renderer.film.frame) == 2
        v.input.on_key("w", Action.PRESS)
        v.input.poll_events()  # -> held before the next step polls again
        v.step(dt=0.1)
        assert int(v.renderer.film.frame) == 1

    def test_v_toggles_debug_overlay(self):
        frames = []
        v = self.make_viewer(frames)
        v.input.on_key("v", Action.PRESS)
        v.step(dt=0.0)
        assert v.debug_overlay
        v.input.on_key("v", Action.RELEASE)
        v.step(dt=0.0)
        v.input.on_key("v", Action.PRESS)
        v.step(dt=0.0)
        assert not v.debug_overlay

    def test_i_cycles_integrator_and_resets_accumulation(self):
        # Settings hotkeys are the ImGui-panel stand-in (rvpt.cpp:270-341):
        # a settings edit must reset accumulation via the dirty fingerprint
        # (rvpt.cpp:102-111), exactly like camera movement does.
        frames = []
        v = self.make_viewer(frames)
        v.step(dt=0.0)
        v.step(dt=0.0)
        assert int(v.renderer.film.frame) == 2
        v.input.on_key("i", Action.PRESS)
        v.step(dt=0.0)
        st = v.renderer.settings
        assert st.modes() == ((9 + 1) % 11,) * 4
        assert int(v.renderer.film.frame) == 1  # reset, then drew one frame

    def test_bracket_keys_step_bounces(self):
        frames = []
        v = self.make_viewer(frames)
        assert v.renderer.settings.max_bounces == 1
        v.input.on_key("]", Action.PRESS)
        v.step(dt=0.0)
        assert v.renderer.settings.max_bounces == 2
        v.step(dt=0.0)
        assert int(v.renderer.film.frame) == 2
        v.input.on_key("left_bracket", Action.PRESS)  # pygame key name
        v.step(dt=0.0)
        assert v.renderer.settings.max_bounces == 1
        assert int(v.renderer.film.frame) == 1
        v.input.on_key("[", Action.PRESS)  # floor at 1 bounce
        v.step(dt=0.0)
        assert v.renderer.settings.max_bounces == 1

    def test_enter_release_toggles_mouse_lock(self):
        frames = []
        v = self.make_viewer(frames)
        assert v.input.mouse_locked
        v.input.on_key("enter", Action.PRESS)
        v.step(dt=0.0)
        v.input.on_key("enter", Action.RELEASE)
        v.step(dt=0.0)
        assert not v.input.mouse_locked
