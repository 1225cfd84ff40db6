"""The persistent-wave engine must produce bit-identical images to the
bounce-major engine (and therefore to the oracle) for any shading
cadence -- the state machine is a pure scheduling transform."""

import numpy as np
import pytest

from tryraytrace_tpu.camera.controller import CameraController
from tryraytrace_tpu.config import RenderConfig
from tryraytrace_tpu.engine.renderer import Renderer
from tryraytrace_tpu.scene.assets import checker_texture, cube_mesh
from tryraytrace_tpu.scene.cornell import create_cornell_box
from tryraytrace_tpu.scene.model import Object, flatten_scene


@pytest.fixture(scope="module")
def arrays():
    scene = create_cornell_box(mesh=None)
    v0, v1, v2 = cube_mesh()
    for a, b, c in zip(v0 * 14 + [40, 20, 60], v1 * 14 + [40, 20, 60],
                       v2 * 14 + [40, 20, 60]):
        scene.objects.append(Object(v0=tuple(a), v1=tuple(b), v2=tuple(c),
                                    albedo=(0.9, 0.9, 0.9), metallic=0.0,
                                    roughness=0.0, ior=1.45,
                                    transmission=1.0))
    return flatten_scene(scene, textures=[checker_texture(32)])


def _render(arrays, engine, shade_every=4, spp=2, aperture=0.0):
    cfg = RenderConfig(width=40, height=24, spp=spp, engine=engine,
                       shade_every=shade_every)
    r = Renderer(arrays, cfg=cfg)
    cam = CameraController()
    cam.aperture = aperture
    r.step(cam.get_params(40, 24), spp=spp)
    return r.accum_host()


# XLA fuses the two engines' arithmetic differently (fma contraction,
# accumulation order), so allow last-ULP drift; anything above means a
# real divergence.
_ULP = dict(rtol=2e-6, atol=1e-6)


def test_engines_identical(arrays):
    a = _render(arrays, "bounce")
    b = _render(arrays, "persistent")
    np.testing.assert_allclose(a, b, **_ULP)


@pytest.mark.parametrize("shade_every", [1, 3, 8])
def test_cadence_invariant(arrays, shade_every):
    ref = _render(arrays, "persistent", shade_every=4)
    out = _render(arrays, "persistent", shade_every=shade_every)
    np.testing.assert_allclose(ref, out, **_ULP)


@pytest.mark.weekly
def test_inline_service_steps_identical(arrays):
    # cfg.inline_service_steps only moves WHEN the inline service
    # block runs inside the unrolled body (slot-addressed RNG: timing
    # cannot change what a lane draws).  Weekly tier: measurement knob
    # (default 0 = once per body), two extra engine compiles.
    ref = _render(arrays, "persistent")
    for svc in (1, 2):
        cfg = RenderConfig(width=40, height=24, spp=2, shade_every=4,
                           inline_service_steps=svc)
        r = Renderer(arrays, cfg=cfg)
        r.step(CameraController().get_params(40, 24), spp=2)
        np.testing.assert_allclose(ref, r.accum_host(),
                                   err_msg=f"svc={svc}", **_ULP)


def test_engines_identical_with_dof(arrays):
    a = _render(arrays, "bounce", aperture=1.0)
    b = _render(arrays, "persistent", aperture=1.0)
    np.testing.assert_allclose(a, b, **_ULP)


def test_ray_stats_match(arrays):
    import jax

    from tryraytrace_tpu.engine.renderer import Renderer
    from tryraytrace_tpu.engine.wavefront import frame_ray_stats

    cam = CameraController().get_params(32, 16)
    counts = {}
    for engine in ("bounce", "persistent"):
        cfg = RenderConfig(width=32, height=16, spp=1, engine=engine)
        r = Renderer(arrays, cfg=cfg)
        tr, sh = jax.jit(
            frame_ray_stats,
            static_argnames=("width", "height", "cfg", "spp"),
        )(r.scene, r.textures, cam, 1, width=32, height=16, cfg=cfg, spp=1)
        counts[engine] = (float(tr), float(sh))
    assert counts["bounce"] == counts["persistent"]
    assert counts["bounce"][0] >= 32 * 16  # at least the camera rays


def test_chunked_wave_bit_identical(arrays):
    cfg0 = RenderConfig(width=40, height=24, spp=2)
    cfg1 = cfg0.replace(max_wave_lanes=240)
    cam = CameraController()
    p = cam.get_params(40, 24)
    outs = []
    for cfg in (cfg0, cfg1):
        r = Renderer(arrays, cfg=cfg)
        r.step(p, spp=2)
        outs.append(r.accum_host())
    np.testing.assert_array_equal(outs[0], outs[1])


def test_dual_walk_identical(arrays):
    cam = CameraController()
    cam.aperture = 0.5
    p = cam.get_params(40, 24)
    outs = []
    for dw in (False, True):
        # Dual-walk engages only under the owner scheduler (the pool
        # scheduler subsumes its idle-filling and forces single-walk).
        cfg = RenderConfig(width=40, height=24, spp=4, dual_walk=dw,
                           scheduler="owner")
        r = Renderer(arrays, cfg=cfg)
        r.step(p, spp=4)
        outs.append(r.accum_host())
    np.testing.assert_allclose(outs[0], outs[1], **_ULP)


@pytest.mark.weekly
def test_pool_scheduler_bit_identical(arrays):
    # Work stealing is a pure scheduling transform: per-pixel sums are
    # bit-equal to the owner schedule for ANY wave width / span.
    # Weekly tier: pool/quota are demoted variants (owner measured
    # faster at every operating point, BASELINE.md round 4) and this
    # matrix compiles 7 engine programs; the cheap stats cross-check
    # (test_pool_scheduler_stats_match) stays in the default tier.
    cam = CameraController()
    cam.aperture = 0.5
    p = cam.get_params(40, 24)
    base = RenderConfig(width=40, height=24, spp=4, dual_walk=False)
    outs = []
    for kw in (dict(scheduler="owner"),
               dict(scheduler="pool", max_wave_lanes=128, pool_span=450),
               dict(scheduler="pool", max_wave_lanes=64, pool_span=0),
               dict(scheduler="pool", max_wave_lanes=96, pool_span=300,
                    tail_spill=False),
               dict(scheduler="quota", max_wave_lanes=128, pool_span=450),
               dict(scheduler="quota", max_wave_lanes=64, pool_span=0),
               dict(scheduler="quota", max_wave_lanes=96, pool_span=300,
                    tail_spill=False)):
        r = Renderer(arrays, cfg=base.replace(**kw))
        r.step(p, spp=4)
        outs.append(r.accum_host())
    for other in outs[1:]:
        np.testing.assert_array_equal(outs[0], other)


def test_ladder_knobs_bit_identical(arrays):
    # spill_floor / deeper ladders are pure scheduling transforms
    # (exact lane permutations, same step graph): per-pixel sums are
    # bit-equal to the defaults (measured so at the round-4 landing).
    cam = CameraController()
    cam.aperture = 0.5
    p = cam.get_params(40, 24)
    base = RenderConfig(width=40, height=24, spp=4, dual_walk=False,
                        max_wave_lanes=256)
    outs = []
    for kw in (dict(),
               dict(spill_floor=16, spill_stages=12),
               dict(spill_floor=32, spill_stages=10)):
        r = Renderer(arrays, cfg=base.replace(**kw))
        r.step(p, spp=4)
        outs.append(r.accum_host())
    for other in outs[1:]:
        np.testing.assert_array_equal(outs[0], other)


@pytest.mark.weekly
def test_tail_unroll_mc_equivalent(arrays):
    # Weekly tier: tail_unroll is a dead knob (0 by default; deeper
    # measured no gain on chip, BASELINE.md round 4) and this is an
    # extra two engine compiles.
    # tail_unroll recompiles the tail stages' step graph, so XLA
    # re-fuses it: per-lane math is op-identical but drifts by ULPs
    # that compound along deep paths (measured max ~4e-5 at 64x48;
    # a rare sample can in principle flip an RNG branch, same budget
    # as the cross-engine invariant).  Typical pixels must agree
    # tightly; any flip tail stays rare and bounded.
    cam = CameraController()
    cam.aperture = 0.5
    p = cam.get_params(40, 24)
    base = RenderConfig(width=40, height=24, spp=4, dual_walk=False,
                        max_wave_lanes=256)
    outs = []
    for kw in (dict(), dict(tail_unroll=3)):
        r = Renderer(arrays, cfg=base.replace(**kw))
        r.step(p, spp=4)
        outs.append(np.asarray(r.accum_host()))
    d = np.abs(outs[0] - outs[1]).max(axis=-1).ravel()
    assert float(np.quantile(d, 0.99)) < 1e-4
    assert (d > 1e-4).sum() <= max(5, d.size // 250)
    assert float(d.max()) < 0.05


def test_pool_scheduler_stats_match(arrays):
    import jax
    from tryraytrace_tpu.engine.wavefront import frame_ray_stats

    cam = CameraController().get_params(32, 16)
    counts = {}
    for sched in ("owner", "pool", "quota"):
        cfg = RenderConfig(width=32, height=16, spp=2, dual_walk=False,
                           scheduler=sched, max_wave_lanes=128,
                           pool_span=256)
        r = Renderer(arrays, cfg=cfg)
        tr, sh = jax.jit(
            frame_ray_stats,
            static_argnames=("width", "height", "cfg", "spp"),
        )(r.scene, r.textures, cam, 1, width=32, height=16, cfg=cfg, spp=2)
        counts[sched] = (float(tr), float(sh))
    assert counts["owner"] == counts["pool"] == counts["quota"]


def test_dual_walk_odd_spp_falls_back(arrays):
    cfg = RenderConfig(width=16, height=12, spp=3, dual_walk=True,
                       scheduler="owner")
    r = Renderer(arrays, cfg=cfg)
    cam = CameraController()
    r.step(cam.get_params(16, 12), spp=3)
    ref = Renderer(arrays, cfg=cfg.replace(dual_walk=False))
    ref.step(cam.get_params(16, 12), spp=3)
    np.testing.assert_array_equal(r.accum_host(), ref.accum_host())


def test_dual_walk_stats_match(arrays):
    import jax
    from tryraytrace_tpu.engine.wavefront import frame_ray_stats

    cam = CameraController().get_params(32, 16)
    counts = {}
    for dw in (False, True):
        cfg = RenderConfig(width=32, height=16, spp=2, dual_walk=dw,
                           scheduler="owner")
        r = Renderer(arrays, cfg=cfg)
        tr, sh = jax.jit(
            frame_ray_stats,
            static_argnames=("width", "height", "cfg", "spp"),
        )(r.scene, r.textures, cam, 1, width=32, height=16, cfg=cfg, spp=2)
        counts[dw] = (float(tr), float(sh))
    assert counts[False] == counts[True]


def test_redirect_passes_identical(arrays):
    """quad_redirect_passes only changes visit ORDER/count (chained
    skip-register misses resolve now vs. via containment absorption);
    closest/any-hit are order-independent, so images are identical."""
    cam = CameraController()
    p = cam.get_params(40, 24)
    outs = []
    for rp in (2, 1):
        cfg = RenderConfig(width=40, height=24, spp=2,
                           quad_redirect_passes=rp)
        assert cfg.traversal == "quad"
        r = Renderer(arrays, cfg=cfg)
        r.step(p, spp=2)
        outs.append(r.accum_host())
    np.testing.assert_allclose(outs[0], outs[1], **_ULP)
