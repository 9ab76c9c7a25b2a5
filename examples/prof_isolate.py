"""Isolate which render-path feature faults/costs on the real TPU.

Usage: python examples/prof_isolate.py <mode>
  raster_peels : render_frame with rasterized primary+peels, shadow loop
  shadow_kernel: render_frame traced primary, shadow-factor kernel
  both         : peels + shadow kernel
  overlay      : device FPS overlay blit alone
  trace        : baseline traced path (round-2 configuration)

Env is configured BEFORE the engine imports read it.
"""
import os
import sys
import time

mode = sys.argv[1]
os.environ.setdefault("SGE_SHADOW_KERNEL", "0")
if mode == "raster_peels":
    os.environ["SGE_RT_PRIMARY"] = "raster"
elif mode == "shadow_kernel":
    os.environ["SGE_RT_PRIMARY"] = "trace"
    os.environ["SGE_SHADOW_KERNEL"] = "1"
elif mode == "both":
    os.environ["SGE_RT_PRIMARY"] = "raster"
    os.environ["SGE_SHADOW_KERNEL"] = "1"
elif mode == "trace":
    os.environ["SGE_RT_PRIMARY"] = "trace"

sys.path.insert(0, ".")
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

if mode == "overlay":
    from swift_game_engine_tpu.render.composite import overlay_blit_device
    img = jnp.zeros((540, 960, 3), jnp.uint8)
    f = jax.jit(overlay_blit_device)
    out = jax.block_until_ready(f(img, jnp.int32(60)))
    print("overlay sum:", int(np.asarray(out).astype(np.int64).sum()))
    sys.exit(0)

from swift_game_engine_tpu.scene.demo_scene import DemoScene
from swift_game_engine_tpu.render.scene_geometry import flatten_frame
from swift_game_engine_tpu.render import rt as RT
from swift_game_engine_tpu.render.ibl import IBL
from swift_game_engine_tpu.render.camera import Camera

W, H = 960, 540
scene = DemoScene().build()
geo, lights = scene["geometry"], scene["lights"]
stepper, state = scene["stepper"], scene["state"]
cam = Camera()
cam.position = np.array([0.0, 4.0, 14.0], np.float32)
cam.target = np.array([0.0, 0.0, 0.0], np.float32)
transforms, palettes = stepper.extract(state, 0.0, np.zeros(3, np.float32))
ivp = jnp.asarray(cam.inv_view_proj(W, H))
vp = jnp.asarray(np.linalg.inv(np.asarray(cam.inv_view_proj(W, H))))
cpos = jnp.asarray(cam.position)


@jax.jit
def frame(tr, pa):
    fg = flatten_frame(geo, tr, pa)
    return RT.render_frame(geo, fg, IBL.build(), lights, ivp, cpos, W, H,
                           max_layers=3, shadow_layers=4, view_proj=vp)


t0 = time.time()
img = jax.block_until_ready(frame(transforms, palettes))
print(f"compile+first: {time.time()-t0:.1f}s  mean={float(np.asarray(img).mean()):.6f}")
t0 = time.time()
n = 5
for i in range(n):
    # vary the input per rep: identical dispatches get deduped in the tunnel
    img = jax.block_until_ready(frame(transforms + np.float32(1e-6 * i),
                                      palettes))
print(f"{mode}: {(time.time()-t0)/n*1000:.1f} ms/frame (n={n}, incl ~27ms dispatch)")
