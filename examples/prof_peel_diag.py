"""Diagnose the integrated peels-mode frame: time lowering, compile, and
first execution separately, at a configurable resolution.

Usage: python examples/prof_peel_diag.py [WxH] [mode]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from swift_game_engine_tpu.scene.demo_scene import DemoScene
from swift_game_engine_tpu.render import rt as RT
from swift_game_engine_tpu.render.scene_geometry import flatten_frame
from swift_game_engine_tpu.render.camera import Camera
from swift_game_engine_tpu.render.ibl import IBL


def main():
    wh = sys.argv[1] if len(sys.argv) > 1 else "480x270"
    W, H = map(int, wh.split("x"))
    mode = sys.argv[2] if len(sys.argv) > 2 else "peels"

    t0 = time.perf_counter()
    scene = DemoScene().build()
    geo = scene["geometry"]
    stepper, state = scene["stepper"], scene["state"]
    ibl = IBL.build()
    lights = scene["lights"]
    cam = Camera()
    cam.position = np.array([0.0, 4.0, 14.0], np.float32)
    cam.target = np.array([0.0, 0.0, 0.0], np.float32)
    transforms, palettes = stepper.extract(state, 0.0, np.zeros(3, np.float32))
    fg = jax.jit(lambda tr, pa: flatten_frame(geo, tr, pa))(transforms,
                                                            palettes)
    jax.block_until_ready(fg.pos)
    print(f"build: {time.perf_counter()-t0:.1f}s", flush=True)

    ivp = jnp.asarray(cam.inv_view_proj(W, H))
    cpos = jnp.asarray(cam.position)
    RT._RT_PRIMARY = mode

    def frame(cp):
        return jnp.mean(RT.render_frame(geo, fg, ibl, lights, ivp, cp,
                                        W, H, max_layers=3, shadow_layers=4))

    t0 = time.perf_counter()
    lowered = jax.jit(frame).lower(cpos)
    print(f"lower: {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    compiled = lowered.compile()
    print(f"compile: {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    v = jax.block_until_ready(compiled(cpos))
    print(f"exec1: {time.perf_counter()-t0:.2f}s acc={float(v):.6f}",
          flush=True)
    t0 = time.perf_counter()
    v = jax.block_until_ready(compiled(cpos + 1e-5))
    print(f"exec2: {time.perf_counter()-t0:.2f}s acc={float(v):.6f}",
          flush=True)


if __name__ == "__main__":
    main()
