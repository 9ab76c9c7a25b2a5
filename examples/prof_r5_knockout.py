"""Round-5 knockout attribution of the current 148 ms full frame:
baseline vs shadow-off vs no-bounce vs layers1 vs combinations, one
process, warm-cache friendly.

Usage: python examples/prof_r5_knockout.py [WxH] [reps]
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
    wh = sys.argv[1] if len(sys.argv) > 1 else "960x540"
    W, H = map(int, wh.split("x"))
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4

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
    vp = jnp.asarray(cam.view_proj(W, H))
    cpos = jnp.asarray(cam.position)

    def run(name, rt_knobs, layers=3):
        saved_rt = {k: getattr(RT, k) for k in rt_knobs}
        for k, v in rt_knobs.items():
            setattr(RT, k, v)
        try:
            @jax.jit
            def frames(cp):
                def body(i, acc):
                    img = RT.render_frame(geo, fg, ibl, lights, ivp,
                                          cp + 0.0 * i, W, H,
                                          max_layers=layers,
                                          shadow_layers=4, view_proj=vp)
                    return acc + jnp.mean(img)
                return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

            jax.block_until_ready(frames(cpos))
            ds = []
            for r in range(2):
                t0 = time.perf_counter()
                acc = jax.block_until_ready(frames(cpos + 1e-5 * (r + 1)))
                ds.append((time.perf_counter() - t0 - 0.027) / reps)
            dt = min(ds)
            print(f"{name}: {min(ds)*1e3:.1f} ms/frame "
                  f"({1.0/dt:.2f} fps) acc={float(acc):.6f}", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
        finally:
            for k, v in saved_rt.items():
                setattr(RT, k, v)

    run("baseline", {})
    run("shadow off", {"_PROF_SHADOW_OFF": True})
    run("no bounce", {"_PROF_NO_BOUNCE": True})
    run("no bounce + shadow off", {"_PROF_NO_BOUNCE": True,
                                   "_PROF_SHADOW_OFF": True})
    run("layers=1 (+bounces)", {}, layers=1)
    run("brdf off", {"_PROF_BRDF_OFF": True})
    run("no spec ibl", {"_NO_SPEC_IBL": True})


if __name__ == "__main__":
    main()
