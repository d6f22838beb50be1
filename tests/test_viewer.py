"""Fly camera (camera.h:113-181) + scripted live-viewer loop."""

import numpy as np

from voxtracer.render.camera import make_camera
from voxtracer.render.flycam import (STOP_ANGLE, FlyState, handle_input,
                                     to_camera)


def _mk():
    cam = make_camera(pos=(0, 0, -3), target=(0, 0, 0), aspect=1.0)
    return cam, FlyState.from_camera(cam)


def test_forward_moves_along_ahead():
    cam, fly = _mk()
    changed = handle_input(fly, {"w"}, dt_ms=100.0)
    assert changed
    np.testing.assert_allclose(fly.pos, [0, 0, -3 + 0.75], atol=1e-6)


def test_idle_frame_no_change():
    cam, fly = _mk()
    assert not handle_input(fly, set(), dt_ms=100.0)
    np.testing.assert_allclose(fly.pos, [0, 0, -3])


def test_yaw_rotates_without_translating():
    cam, fly = _mk()
    handle_input(fly, {"right"}, dt_ms=100.0)
    np.testing.assert_allclose(fly.pos, [0, 0, -3])
    new = to_camera(fly, 1.0, cam)
    ahead = np.asarray(new.ahead)
    assert abs(np.linalg.norm(ahead) - 1.0) < 1e-5
    assert ahead[0] != 0.0  # turned toward +x (right = up x ahead)


def test_pitch_clamps_at_stop_angle():
    cam, fly = _mk()
    for _ in range(2000):
        handle_input(fly, {"up"}, dt_ms=10.0)
    ahead = (fly.target - fly.pos)
    ahead = ahead / np.linalg.norm(ahead)
    # one-step overshoot allowed (reference clamp only stops further adds,
    # camera.h:126-140)
    assert ahead[1] <= STOP_ANGLE + 0.1
    before = fly.target.copy()
    handle_input(fly, {"up"}, dt_ms=10.0)
    np.testing.assert_allclose(fly.target, before)  # saturated: no-op


def test_to_camera_matches_make_camera_basis():
    """Rebuilt frustum corners equal make_camera's for a level pose
    (both implement camera.h:172-178)."""
    cam = make_camera(pos=(1, 2, -5), target=(1, 2, 0), aspect=256 / 212)
    fly = FlyState.from_camera(cam)
    rebuilt = to_camera(fly, 256 / 212, cam)
    for f in ("pos", "top_left", "top_right", "bottom_left", "ahead"):
        np.testing.assert_allclose(np.asarray(getattr(rebuilt, f)),
                                   np.asarray(getattr(cam, f)), atol=1e-5)


def test_scripted_live_loop_moves_and_resets():
    """Headless live loop: a move key resets the accumulator; idle frames
    accumulate; the loop completes without a TTY."""
    from voxtracer.scene.presets import glass_sphere_box
    from voxtracer.viewer import run_live

    scene, cfg = glass_sphere_box(32, 32)
    script = [set(), set(), {"w"}, set()]
    frames, report = run_live(scene, cfg, script=script, display=False,
                              max_frames=4)
    assert frames == 4


def test_scripted_live_material_edit():
    from voxtracer.scene.presets import glass_sphere_box
    from voxtracer.viewer import run_live

    scene, cfg = glass_sphere_box(32, 32)
    frames, _ = run_live(scene, cfg, script=[{"m"}, set()], display=False)
    assert frames == 2


def test_cli_live_scripted(tmp_path):
    from voxtracer import cli

    cli.main(["live", "--preset", "glassbox", "--width", "32", "--height",
              "32", "--script", "..w.", "--no-display"])
