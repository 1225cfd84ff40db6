"""Multi-host (DCN) smoke test: two OS processes join a
``jax.distributed`` cluster over the CPU/Gloo backend, render one
frame over a mesh spanning both processes through the real CLI, and
the image must be bit-identical to a single-chip render.

This is the CI stand-in for a real multi-host TPU pod (SURVEY.md §5
distributed plan): same code path (`tpurt render --coordinator ...`),
same collectives, transport swapped for Gloo.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent


def _clean_env() -> dict:
    # conftest exports XLA_FLAGS (8 forced host devices) for THIS
    # process; the workers configure their own device count through
    # init_distributed and the stale flag conflicts with it.
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    return env


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_render_matches_single_chip(tmp_path):
    w, h, spp = 16, 16, 2
    port = _free_port()
    out = tmp_path / "dist.ppm"
    base = [
        sys.executable, "-m", "tryraytrace_tpu.cli", "render",
        "--scene", "cornell-nomesh", "--width", str(w), "--height",
        str(h), "--spp", str(spp), "--frames", "1", "--sharded",
        "--coordinator", f"localhost:{port}", "--num-processes", "2",
        "--cpu-devices", "2", "--out", str(out),
    ]
    procs = [
        subprocess.Popen(base + ["--process-id", str(i)],
                         cwd=REPO, env=_clean_env(),
                         stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    logs = [p.communicate(timeout=600)[0] for p in procs]
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"process {i} failed:\n{logs[i]}"
    assert out.exists()  # written by process 0 only

    from tryraytrace_tpu.camera.controller import CameraController
    from tryraytrace_tpu.config import RenderConfig
    from tryraytrace_tpu.engine.renderer import Renderer
    from tryraytrace_tpu.io.ppm import load_ppm
    from tryraytrace_tpu.io.snapshot import tonemap_accum
    from tryraytrace_tpu.scene.assets import checker_texture
    from tryraytrace_tpu.scene.cornell import create_cornell_box
    from tryraytrace_tpu.scene.model import flatten_scene

    cfg = RenderConfig(width=w, height=h, spp=spp)
    # Same texture substitution the CLI makes for the missing
    # reference earth.ppm (cli.build_scene_arrays).
    r = Renderer(flatten_scene(create_cornell_box(mesh=None),
                               textures=[checker_texture(256)]), cfg=cfg)
    cam = CameraController()
    cam.aperture = 0.0
    cam.focus_dist = 240.0
    r.step(cam.get_params(w, h))
    ref = tonemap_accum(r.accum_host(), max(r.spp(), 1))

    np.testing.assert_array_equal(load_ppm(str(out)), ref)


def test_two_process_resume_from_checkpoint(tmp_path):
    """Multi-host --resume: the host checkpoint is distributed to each
    process's addressable shards (cli.cmd_render
    make_array_from_callback path), and frame 2 rendered over two
    processes on top of it must be bit-identical to a single-chip
    two-frame render."""
    w, h, spp = 16, 16, 2
    ck = tmp_path / "ck.npz"
    out = tmp_path / "resumed.ppm"

    def run(n_proc, extra):
        port = _free_port()
        base = [
            sys.executable, "-m", "tryraytrace_tpu.cli", "render",
            "--scene", "cornell-nomesh", "--width", str(w), "--height",
            str(h), "--spp", str(spp), "--frames", "1", "--sharded",
            "--coordinator", f"localhost:{port}",
            "--num-processes", str(n_proc), "--cpu-devices", "2",
        ] + extra
        procs = [
            subprocess.Popen(base + ["--process-id", str(i)],
                             cwd=REPO, env=_clean_env(),
                             stdout=subprocess.PIPE,
                             stderr=subprocess.STDOUT, text=True)
            for i in range(n_proc)
        ]
        logs = [p.communicate(timeout=600)[0] for p in procs]
        for i, p in enumerate(procs):
            assert p.returncode == 0, f"process {i} failed:\n{logs[i]}"

    # Frame 1 (single process, sharded over 2 CPU devices) -> checkpoint.
    run(1, ["--checkpoint", str(ck), "--out", str(tmp_path / "f1.ppm")])
    assert ck.exists()
    # Frame 2 over TWO processes, resumed from the host checkpoint.
    run(2, ["--resume", str(ck), "--out", str(out)])
    assert out.exists()

    from tryraytrace_tpu.camera.controller import CameraController
    from tryraytrace_tpu.config import RenderConfig
    from tryraytrace_tpu.engine.renderer import Renderer
    from tryraytrace_tpu.io.ppm import load_ppm
    from tryraytrace_tpu.io.snapshot import tonemap_accum
    from tryraytrace_tpu.scene.assets import checker_texture
    from tryraytrace_tpu.scene.cornell import create_cornell_box
    from tryraytrace_tpu.scene.model import flatten_scene

    cfg = RenderConfig(width=w, height=h, spp=spp)
    r = Renderer(flatten_scene(create_cornell_box(mesh=None),
                               textures=[checker_texture(256)]), cfg=cfg)
    cam = CameraController()
    cam.aperture = 0.0
    cam.focus_dist = 240.0
    params = cam.get_params(w, h)
    r.step(params)
    r.step(params)
    ref = tonemap_accum(r.accum_host(), max(r.spp(), 1))
    np.testing.assert_array_equal(load_ppm(str(out)), ref)
