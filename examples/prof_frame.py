"""Scan-fused full-frame timing under the CURRENT env config.

The axon tunnel costs ~27 ms per jit dispatch, so per-pass timings from
repeated dispatches overstate small passes; this probe times REPS whole
frames inside ONE jit (threading the loop index through cam_pos so XLA
cannot hoist the body) and reports device ms/frame.

Usage: [env knobs] python examples/prof_frame.py [WxH] [reps]
  e.g. SGE_RT_PRIMARY=peels python examples/prof_frame.py 960x540
"""
import os
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
    wh = sys.argv[1] if len(sys.argv) > 1 else "960x540"
    W, H = map(int, wh.split("x"))
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    scene = DemoScene().build()
    geo = scene["geometry"]
    stepper, state = scene["stepper"], scene["state"]
    ibl = IBL.build()
    lights = scene["lights"]

    cam = Camera()
    cam.position = np.array([0.0, 4.0, 14.0], np.float32)
    cam.target = np.array([0.0, 0.0, 0.0], np.float32)
    cam_env = os.environ.get("SGE_PROF_CAM")
    if cam_env:
        vals = [float(x) for x in cam_env.split(",")]
        cam.position = np.array(vals[:3], np.float32)
        if len(vals) >= 6:
            cam.target = np.array(vals[3:6], np.float32)
    transforms, palettes = stepper.extract(state, 0.0,
                                           np.zeros(3, np.float32))
    fg = jax.jit(lambda tr, pa: flatten_frame(geo, tr, pa))(transforms,
                                                            palettes)
    jax.block_until_ready(fg.pos)

    ivp = jnp.asarray(cam.inv_view_proj(W, H))
    cpos = jnp.asarray(cam.position)

    knobs = {k: v for k, v in os.environ.items() if k.startswith("SGE_")}
    print(f"config: {knobs}", flush=True)

    BL = int(os.environ.get("BL", "3"))
    BS = int(os.environ.get("BS", "4"))
    BM = os.environ.get("BM", "1") == "1"
    BR = os.environ.get("BR", "1") == "1"

    @jax.jit
    def frames(cp):
        def body(i, acc):
            img = RT.render_frame(geo, fg, ibl, lights, ivp,
                                  cp + 0.0 * i, W, H, max_layers=BL,
                                  shadow_layers=BS, enable_mirror=BM,
                                  enable_refraction=BR)
            return acc + jnp.mean(img)
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    t0 = time.time()
    acc = jax.block_until_ready(frames(cpos))
    print(f"compile+first: {time.time()-t0:.1f}s", flush=True)
    # Two timed passes, DIFFERENT inputs each (the tunnel backend serves a
    # repeated identical execution from a result cache -> reads ~0 ms);
    # report the min of the two for a variance check.
    ds = []
    for r in range(2):
        t0 = time.perf_counter()
        acc = jax.block_until_ready(frames(cpos + 1e-5 * (r + 1)))
        ds.append((time.perf_counter() - t0 - 0.027) / reps)
    print(f"passes: {ds[0]*1e3:.1f} / {ds[1]*1e3:.1f} ms", flush=True)
    dt = min(ds)
    # one single frame for the image-mean checksum
    img = RT.render_frame(geo, fg, ibl, lights, ivp, cpos, W, H,
                          max_layers=3, shadow_layers=4)
    print(f"frame: {dt*1e3:.1f} ms/frame ({1.0/dt:.2f} fps)  "
          f"mean={float(jnp.mean(img)):.6f}", flush=True)


if __name__ == "__main__":
    main()
