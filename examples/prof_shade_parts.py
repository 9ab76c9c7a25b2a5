"""Decompose the dense L1 shade + batched L2 shade cost: time the frame
with individual shade sub-parts disabled (timing-only knobs monkeypatched
into rt) to attribute ms between gathers, material sample, BRDF/ambient,
spec IBL, shadow records, and bounce machinery.

Scan-fused over reps, two varied-input passes (tunnel result cache).
Usage: python examples/prof_shade_parts.py [WxH] [reps] [section ...]
"""
import sys
import time

_OVERHEAD = [None]


def _overhead():
    if _OVERHEAD[0] is None:
        import jax
        import jax.numpy as jnp
        noop = jax.jit(lambda x: x + 1.0)
        jax.block_until_ready(noop(jnp.float32(0.0)))
        t0 = time.perf_counter()
        for _ in range(10):
            jax.block_until_ready(noop(jnp.float32(0.0)))
        _OVERHEAD[0] = (time.perf_counter() - t0) / 10
    return _OVERHEAD[0]

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
    want = set(sys.argv[3:])

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
    ivp = jnp.asarray(cam.inv_view_proj(W, H))
    cpos = jnp.asarray(cam.position)

    def run(name, mutate=None):
        if want and name not in want:
            return
        saved = {}
        if mutate:
            for k, v in mutate.items():
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
                return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

            jax.block_until_ready(frames(cpos))
            ds = []
            for r in range(2):
                t0 = time.perf_counter()
                acc = jax.block_until_ready(frames(cpos + 1e-5 * (r + 1)))
                # dispatch overhead measured, not assumed (ADVICE r3);
                # clamped at 0 so small configs can't go negative
                ds.append(max(time.perf_counter() - t0 - _overhead(), 0.0)
                          / reps)
            dt = min(ds)
            print(f"{name}: {ds[0]*1e3:.1f} / {ds[1]*1e3:.1f} ms/frame "
                  f"acc={float(acc):.6f}", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
        finally:
            for k, v in saved.items():
                setattr(RT, k, v)

    run("full")
    # shading feature knockouts (timing-only; output changes are expected)
    run("no_spec_ibl", {"_NO_SPEC_IBL": True})
    run("shadow_off0", {"_PROF_SHADOW_OFF": True})
    run("brdf_off", {"_PROF_BRDF_OFF": True})
    run("mirror_refr_off", {"_PROF_NO_BOUNCE": True})
    run("layers1", {"_PROF_LAYERS1": True})


if __name__ == "__main__":
    main()
