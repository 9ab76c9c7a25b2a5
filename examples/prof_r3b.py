"""Round-3b A/B probe: compaction-order + unlit-split + visibility/shadow
knob combinations, scan-fused over reps with varied inputs.

Usage: python examples/prof_r3b.py [WxH] [reps] [config ...]
  configs (default all): base, sortc, nosplit, peels, peels_tuned, cs_tuned
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
from swift_game_engine_tpu.ops import cluster_shadow as CS
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

    def run(name, rt_extra=None, cs_extra=None):
        if want and name not in want:
            return
        rt_knobs = rt_extra or {}
        cs_knobs = cs_extra or {}
        saved_rt = {k: getattr(RT, k) for k in rt_knobs}
        saved_cs = {k: getattr(CS, k) for k in cs_knobs}
        for k, v in rt_knobs.items():
            setattr(RT, k, v)
        for k, v in cs_knobs.items():
            setattr(CS, k, v)
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
                  f"({1.0/dt:.2f} fps best) acc={float(acc):.6f}",
                  flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
        finally:
            for k, v in saved_rt.items():
                setattr(RT, k, v)
            for k, v in saved_cs.items():
                setattr(CS, k, v)

    # round-3 A/B matrix; 'base' pins the knobs explicitly so the
    # configs differ regardless of the module defaults
    run("base", rt_extra={"_COMPACT_ORDER": "scan", "_UNLIT_SPLIT": True})
    run("sortc", rt_extra={"_COMPACT_ORDER": "sort", "_UNLIT_SPLIT": True})
    run("nosplit", rt_extra={"_COMPACT_ORDER": "scan",
                             "_UNLIT_SPLIT": False})
    run("peels", rt_extra={"_RT_PRIMARY": "peels"})
    run("peels_tuned", rt_extra={"_RT_PRIMARY": "peels",
                                 "_RASTER_LISTS": True,
                                 "_RASTER_TILE_H": 16,
                                 "_RASTER_CLUSTER": 64,
                                 "_SHADOW_SORT": True,
                                 "_SHADOW_LISTS": True},
        cs_extra={"SBLOCK": 512, "_SSUB": 4, "CLUSTER": 32})
    run("cs_tuned", cs_extra={"SBLOCK": 512, "_SSUB": 4, "CLUSTER": 32})


if __name__ == "__main__":
    main()
