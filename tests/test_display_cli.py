"""Display pipeline (drop-frame worker), app loop, and CLI tests."""

import json
import os
import time

import numpy as np
import pytest

from tryraytrace_tpu.display.pipeline import DisplayPipeline, tonemap_to_argb
from tryraytrace_tpu.display.input import InputState, ScriptedInput
from tryraytrace_tpu.camera.controller import CameraController


def test_tonemap_argb_packing():
    accum = np.zeros((2, 3), np.float32)
    accum[0] = (4.0, 0.0, 0.0)  # avg 1.0 red over 4 frames
    out = tonemap_to_argb(accum, 4)
    assert out.dtype == np.uint32
    assert out[0] == (0xFF << 24) | (255 << 16)
    assert out[1] == 0xFF000000


def test_pipeline_processes_frame():
    p = DisplayPipeline(4, 2)
    accum = np.full((8, 3), 2.0, np.float32)
    assert p.try_dispatch(accum, 2)
    deadline = time.time() + 5
    while not p.check_frame_ready():
        assert time.time() < deadline, "worker never produced a frame"
        time.sleep(0.01)
    assert (p.pixel_buffer == tonemap_to_argb(accum, 2)).all()
    p.destroy()


def test_pipeline_drop_frame_semantics():
    # Saturate with dispatches; drops must occur but no deadlock/corruption
    # (pipeline.cpp:122-137 drop-frame contract).
    p = DisplayPipeline(64, 64)
    accum = np.random.rand(64 * 64, 3).astype(np.float32)
    accepted = sum(p.try_dispatch(accum, i + 1) for i in range(200))
    assert 1 <= accepted <= 200
    time.sleep(0.2)
    p.destroy()


def test_scripted_input():
    cam = CameraController(position=(0, 0, 0))
    src = ScriptedInput([
        {"keys": ["w"]},
        {"mouse": (900.0, 0.0)},
        {"save": True},
        {},
    ])
    s1 = src.process_events(cam)
    assert s1.camera_moved and not s1.quit
    s2 = src.process_events(cam)
    assert s2.camera_moved  # mouse moved
    s3 = src.process_events(cam)
    assert s3.save_request and not s3.camera_moved
    s4 = src.process_events(cam)
    assert not s4.quit
    s5 = src.process_events(cam)
    assert s5.quit  # script exhausted


def test_app_headless_loop(tmp_path):
    from tryraytrace_tpu.config import RenderConfig
    from tryraytrace_tpu.display.app import App
    from tryraytrace_tpu.scene.cornell import create_cornell_box
    from tryraytrace_tpu.scene.model import flatten_scene
    from tryraytrace_tpu.scene.assets import checker_texture

    arrays = flatten_scene(create_cornell_box(mesh=None),
                           textures=[checker_texture(16)])
    cfg = RenderConfig(width=16, height=12, spp=1)
    script = ScriptedInput([{}, {"keys": ["w"]}, {"save": True}, {}])
    app = App(arrays, cfg, input_source=script, out_dir=str(tmp_path))
    app.run()
    # save on frame 3 + exit snapshot
    assert len(app.snapshots) == 2
    for s in app.snapshots:
        assert os.path.exists(s)
    # camera moved on frame 2 -> accumulation restarted
    assert app.renderer.spp() >= 1


def test_cli_render_and_resume(tmp_path):
    from tryraytrace_tpu.cli import main

    out = tmp_path / "img.ppm"
    ckpt = tmp_path / "state.npz"
    rc = main(["render", "--scene", "cornell-nomesh", "--width", "24",
               "--height", "16", "--frames", "2", "--out", str(out),
               "--checkpoint", str(ckpt)])
    assert rc == 0 and out.exists() and ckpt.exists()

    from tryraytrace_tpu.io.ppm import load_ppm

    img = load_ppm(out)
    assert img.shape == (16, 24, 3) and img.max() > 0

    out2 = tmp_path / "img2.ppm"
    rc = main(["render", "--scene", "cornell-nomesh", "--width", "24",
               "--height", "16", "--frames", "2", "--out", str(out2),
               "--resume", str(ckpt)])
    assert rc == 0 and out2.exists()
    # resumed render has 4 total passes; must differ less from steady
    # state (just sanity: it loads and produces an image)
    img2 = load_ppm(out2)
    assert img2.shape == (16, 24, 3)


def test_cli_info(capsys):
    from tryraytrace_tpu.cli import main

    rc = main(["info", "--scene", "cornell-nomesh"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "triangles" in out and "bvh:" in out


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp

    from tryraytrace_tpu.engine.state import (RenderState, load_checkpoint,
                                              save_checkpoint)

    st = RenderState(jnp.arange(12, dtype=jnp.float32).reshape(4, 3),
                     jnp.int32(7))
    cam = CameraController(position=(1, 2, 3))
    cam.yaw = -45.0
    cam.aperture = 0.5
    path = tmp_path / "ck.npz"
    save_checkpoint(path, st, 2, 2, camera=cam, frame_seed=9)
    st2, w, h, seed, cam2 = load_checkpoint(path)
    assert (w, h, seed) == (2, 2, 9)
    np.testing.assert_array_equal(np.asarray(st2.accum),
                                  np.asarray(st.accum))
    assert int(st2.spp) == 7
    assert cam2.yaw == -45.0 and cam2.aperture == 0.5
    np.testing.assert_allclose(cam2.pos, (1, 2, 3))


def test_checkpoint_roundtrip_orbax(tmp_path):
    # Non-.npz path -> Orbax checkpoint directory (beyond-reference
    # multi-host-friendly format; engine/state.py save_checkpoint).
    import jax.numpy as jnp

    from tryraytrace_tpu.engine.state import (RenderState, load_checkpoint,
                                              save_checkpoint)

    st = RenderState(jnp.arange(12, dtype=jnp.float32).reshape(4, 3),
                     jnp.int32(7))
    cam = CameraController(position=(1, 2, 3))
    cam.pitch = 10.0
    path = tmp_path / "ck_orbax"
    save_checkpoint(path, st, 2, 2, camera=cam, frame_seed=9)
    assert path.is_dir()
    st2, w, h, seed, cam2 = load_checkpoint(path)
    assert (w, h, seed) == (2, 2, 9)
    np.testing.assert_array_equal(np.asarray(st2.accum),
                                  np.asarray(st.accum))
    assert int(st2.spp) == 7
    assert cam2.pitch == 10.0
    np.testing.assert_allclose(cam2.pos, (1, 2, 3))


def test_app_periodic_checkpoint(tmp_path):
    from tryraytrace_tpu.config import RenderConfig
    from tryraytrace_tpu.display.app import App
    from tryraytrace_tpu.display.input import ScriptedInput
    from tryraytrace_tpu.engine.state import load_checkpoint
    from tryraytrace_tpu.scene.cornell import create_cornell_box
    from tryraytrace_tpu.scene.model import flatten_scene
    from tryraytrace_tpu.scene.assets import checker_texture

    arrays = flatten_scene(create_cornell_box(mesh=None),
                           textures=[checker_texture(16)])
    cfg = RenderConfig(width=12, height=8, spp=1)
    ck = tmp_path / "auto.npz"
    app = App(arrays, cfg, input_source=ScriptedInput([{}] * 5),
              out_dir=str(tmp_path), checkpoint_every=2,
              checkpoint_path=str(ck))
    app.run()
    assert ck.exists()
    state, w, h, seed, cam = load_checkpoint(ck)
    assert (w, h) == (12, 8)
    assert int(state.spp) >= 2


def test_pipeline_dispatch_reset_hammer():
    """SURVEY.md section 5 race-detection plan: hammer the single-slot
    mailbox with concurrent dispatch/consume interleavings from
    multiple producer threads; the pipeline must never deadlock,
    crash, or deliver a torn frame (pixel buffer writes are only
    published after frame_ready)."""
    import threading

    p = DisplayPipeline(32, 32)
    n = 32 * 32
    stop = threading.Event()
    errors = []

    def producer(tid):
        try:
            for i in range(300):
                accum = np.full((n, 3), float(tid + 1), np.float32)
                p.try_dispatch(accum, 1)
        except Exception as e:  # pragma: no cover
            errors.append(e)

    # Every value the pipeline can legitimately produce (one constant
    # per producer).  Tearing *between* whole frames is allowed -- the
    # reference's display has the same benign overwrite race -- but a
    # value outside this set would mean corrupted math or a torn word.
    valid = {int(tonemap_to_argb(
        np.full((1, 3), float(t + 1), np.float32), 1)[0])
        for t in range(4)}

    threads = [threading.Thread(target=producer, args=(t,))
               for t in range(4)]
    for t in threads:
        t.start()
    consumed = 0
    deadline = time.time() + 60  # generous: CI hosts can be saturated
    while any(t.is_alive() for t in threads) and time.time() < deadline:
        if p.check_frame_ready():
            consumed += 1
            buf = p.pixel_buffer.copy()
            assert set(np.unique(buf).tolist()) <= valid
    for t in threads:
        t.join(timeout=30)
        assert not t.is_alive()
    stop.set()
    # The last dispatched frame may still be in the worker when the
    # producers finish (seen once under a saturated host: the loop
    # above exits before the starved worker ever flips frame_ready).
    # Drain it so host load can't fail the test spuriously.
    deadline = time.time() + 30
    while consumed == 0 and time.time() < deadline:
        if p.check_frame_ready():
            consumed += 1
            buf = p.pixel_buffer.copy()
            assert set(np.unique(buf).tolist()) <= valid
        else:
            time.sleep(0.01)
    p.destroy()
    assert not errors
    assert consumed >= 1


def test_app_windowed_dummy_driver(tmp_path, monkeypatch):
    """Full pygame windowed path (blit, flip, title HUD) under SDL's
    dummy video driver -- the interactive frontend minus a monitor."""
    pytest.importorskip("pygame")
    monkeypatch.setenv("SDL_VIDEODRIVER", "dummy")

    from tryraytrace_tpu.config import RenderConfig
    from tryraytrace_tpu.display.app import App
    from tryraytrace_tpu.scene.assets import checker_texture
    from tryraytrace_tpu.scene.cornell import create_cornell_box
    from tryraytrace_tpu.scene.model import flatten_scene

    arrays = flatten_scene(create_cornell_box(mesh=None),
                           textures=[checker_texture(16)])
    app = App(arrays, RenderConfig(width=24, height=16, spp=1),
              window=True, out_dir=str(tmp_path))
    app.run(max_frames=3)
    assert app.frames_displayed >= 1
    assert len(app.snapshots) == 1
