"""Round-3 sweep #2: tap-chunk size, shadow candidate lists, in one
process (monkeypatched knobs, scan-fused timing).

Usage: python examples/prof_config_sweep2.py [WxH]
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

REPS = 5


def main():
    wh = sys.argv[1] if len(sys.argv) > 1 else "960x540"
    W, H = map(int, wh.split("x"))

    scene = DemoScene().build()
    geo = scene["geometry"]
    stepper, state = scene["stepper"], scene["state"]
    ibl = IBL.build()
    lights = scene["lights"]

    cam = Camera()
    cam.position = np.array([0.0, 4.0, 14.0], np.float32)
    cam.target = np.array([0.0, 0.0, 0.0], np.float32)
    transforms, palettes = stepper.extract(state, 0.0,
                                           np.zeros(3, np.float32))
    fg = jax.jit(lambda tr, pa: flatten_frame(geo, tr, pa))(transforms,
                                                            palettes)
    jax.block_until_ready(fg.pos)
    ivp = jnp.asarray(cam.inv_view_proj(W, H))
    cpos = jnp.asarray(cam.position)

    def run(name, knobs):
        saved = {}
        for k, v in knobs.items():
            saved[k] = getattr(RT, k)
            setattr(RT, k, v)
        try:
            @jax.jit
            def frames(cp):
                def body(i, acc):
                    img = RT.render_frame(geo, fg, ibl, lights, ivp,
                                          cp + 0.0 * i, W, H, max_layers=3,
                                          shadow_layers=4)
                    return acc + jnp.mean(img)
                return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

            jax.block_until_ready(frames(cpos))
            t0 = time.perf_counter()
            acc = jax.block_until_ready(frames(cpos))
            dt = (time.perf_counter() - t0 - 0.027) / REPS
            print(f"{name}: {dt*1e3:.1f} ms/frame ({1.0/dt:.2f} fps) "
                  f"acc={float(acc):.6f}", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
        finally:
            for k, v in saved.items():
                setattr(RT, k, v)

    run("baseline", {})
    run("tapchunk 32k", {"_CHUNK_SMALL": 32768})
    run("tapchunk 64k", {"_CHUNK_SMALL": 65536})
    run("shadow lists", {"_SHADOW_LISTS": True})
    run("lists+tap64k", {"_SHADOW_LISTS": True, "_CHUNK_SMALL": 65536})


if __name__ == "__main__":
    main()
