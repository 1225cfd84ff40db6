import numpy as np

from tryraytrace_tpu.camera.controller import CameraController


def test_default_orientation():
    # yaw=-90, pitch=0 -> looking down -Z (camera.cpp:49-61 + camera.h).
    cam = CameraController()
    np.testing.assert_allclose(cam.dir, [0, 0, -1], atol=1e-6)
    np.testing.assert_allclose(cam.right, [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(cam.up, [0, 1, 0], atol=1e-6)


def test_get_params_viewport_basis():
    cam = CameraController()
    p = cam.get_params(1200, 800)
    aspect = 1200 / 800
    np.testing.assert_allclose(p.cx, cam.right * np.float32(0.5135 * aspect),
                               rtol=1e-6)
    np.testing.assert_allclose(p.cy, cam.up * np.float32(0.5135), rtol=1e-6)
    assert float(p.lens_radius) == 0.0  # aperture 0 -> pinhole
    assert float(p.focus_dist) == 240.0


def test_aperture_halved_into_lens_radius():
    cam = CameraController()
    cam.aperture = 1.0
    p = cam.get_params(100, 100)
    assert abs(float(p.lens_radius) - 0.5) < 1e-7  # camera.cpp:162


def test_pitch_clamped():
    cam = CameraController()
    cam.process_mouse(0.0, -10000.0)  # mouse up -> pitch rises
    assert cam.pitch == 89.0
    cam.process_mouse(0.0, 10000.0)
    assert cam.pitch == -89.0


def test_movement_keys():
    cam = CameraController(position=(0, 0, 0))
    moved = cam.update(1.0, {"w"})
    assert moved
    np.testing.assert_allclose(cam.pos, np.array([0, 0, -2.5]), atol=1e-6)
    cam.update(1.0, {"q"})
    assert cam.pos[1] == 2.5
    assert not cam.update(1.0, set())


def test_focus_aperture_keys():
    cam = CameraController()
    cam.update(1.0, {"t"})
    assert abs(cam.aperture - 0.1) < 1e-9
    cam.update(1.0, {"g"})
    cam.update(1.0, {"g"})
    assert cam.aperture == 0.0  # floor at 0 (camera.cpp:127-130)
    cam.update(1.0, {"f"})
    assert cam.focus_dist == 239.0
    for _ in range(500):
        cam.update(1.0, {"f"})
    assert cam.focus_dist == 1.0  # floor at 1 (camera.cpp:113-116)


def test_mouse_yaw_changes_dir():
    cam = CameraController()
    cam.process_mouse(900.0, 0.0)  # +90 deg yaw -> looking +X
    np.testing.assert_allclose(cam.dir, [1, 0, 0], atol=1e-5)
