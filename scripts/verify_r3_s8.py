"""One-shot end-to-end verify for the spill_stages=8 default flip.

Renders the Cornell box through the public library surface on the
default platform (TPU here), saves a PNG for visual inspection, and
checks a tiny frame bit-compares against the NumPy oracle.
"""
import numpy as np

from tryraytrace_tpu.scene.cornell import create_cornell_box
from tryraytrace_tpu.scene.model import flatten_scene
from tryraytrace_tpu.scene.assets import checker_texture
from tryraytrace_tpu.engine.renderer import Renderer
from tryraytrace_tpu.camera.controller import CameraController
from tryraytrace_tpu.config import RenderConfig

scene = create_cornell_box()
arrays = flatten_scene(scene, textures=[checker_texture(128)])

cfg = RenderConfig(width=200, height=150, spp=2)
assert cfg.spill_stages == 8, cfg.spill_stages
r = Renderer(arrays, cfg=cfg)
cam = CameraController()
for _ in range(4):
    r.step(cam.get_params(200, 150))
img = r.image()
from PIL import Image
Image.fromarray(img).save("/tmp/verify_s8.png")
print("saved /tmp/verify_s8.png", img.shape, img.dtype,
      "mean", float(img.mean()))

# Oracle bit-compare on a tiny frame (1 step).
tiny = RenderConfig(width=64, height=48, spp=1)
rt = Renderer(arrays, cfg=tiny)
params = cam.get_params(64, 48)
rt.frame = 1
rt.step(params, spp=1)
dev = rt.accum_host().reshape(-1, 3)

from tryraytrace_tpu.oracle.cpu_renderer import oracle_render
ref = oracle_render(arrays, params, 64, 48, frame_seed=1, spp=1, cfg=tiny)
mse = float(((dev - ref) ** 2).mean())
print("oracle MSE (64x48x1spp, 1 frame):", mse)
assert mse < 1e-4, mse
print("VERIFY OK")
