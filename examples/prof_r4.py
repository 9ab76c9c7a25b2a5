"""Round-4 frame probe: ONE config per process (the axon backend degrades
after a failed/oversized remote compile, so in-process config sweeps are
unreliable — VERDICT r3 'two-program fault').

Usage: python examples/prof_r4.py [WxH] [KEY=VALUE ...]
  KEY=VALUE pairs are setattr'd onto render.rt before the jit (module
  knobs, e.g. _RT_PRIMARY=peels _CHUNK=262144). Values parse as int when
  possible, else bool-ish strings, else str.

Timing: scan-fused REPS frames (device throughput); the per-dispatch host
overhead is measured with a no-op compiled call instead of a magic
constant (ADVICE r3).
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


def parse_val(s):
    if s.lower() in ("true", "false"):
        return s.lower() == "true"
    try:
        return int(s)
    except ValueError:
        try:
            return float(s)
        except ValueError:
            return s


def main():
    args = sys.argv[1:]
    wh = "960x540"
    knobs = {}
    for a in args:
        if "=" in a:
            k, v = a.split("=", 1)
            knobs[k] = parse_val(v)
        else:
            wh = a
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

    for k, v in knobs.items():
        if not hasattr(RT, k):
            print(f"warning: rt has no knob {k}", flush=True)
        setattr(RT, k, v)

    @jax.jit
    def frames(cp):
        def body(i, acc):
            img = RT.render_frame(geo, fg, ibl, lights, ivp, cp + 0.0 * i,
                                  W, H, max_layers=3, shadow_layers=4)
            return acc + jnp.mean(img)
        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

    # dispatch overhead: a trivial compiled call, measured not assumed
    noop = jax.jit(lambda x: x + 1.0)
    jax.block_until_ready(noop(jnp.float32(0.0)))
    t0 = time.perf_counter()
    for _ in range(10):
        jax.block_until_ready(noop(jnp.float32(0.0)))
    overhead = (time.perf_counter() - t0) / 10

    t0 = time.perf_counter()
    jax.block_until_ready(frames(cpos))
    print(f"compile+first: {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    acc = jax.block_until_ready(frames(cpos))
    dt = max(time.perf_counter() - t0 - overhead, 1e-9) / REPS
    print(f"{knobs}: {dt*1e3:.1f} ms/frame ({1.0/dt:.2f} fps) "
          f"acc={float(acc):.6f} overhead={overhead*1e3:.1f}ms", flush=True)


if __name__ == "__main__":
    main()
