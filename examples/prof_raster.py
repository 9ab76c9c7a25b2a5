"""Standalone tile-raster kernel timing on the demo scene geometry.

Times (a) single-layer rasterize, (b) rasterize_peeled at 1/2/3 layers,
scan-fused so tunnel dispatch dedup can't fake the numbers
(see examples/prof_trace.py for the pattern).

Usage: python examples/prof_raster.py [WxH]
Env: SGE_RASTER_UNROLL to sweep the unroll factor.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from swift_game_engine_tpu.scene.demo_scene import DemoScene
from swift_game_engine_tpu.render.scene_geometry import flatten_frame
from swift_game_engine_tpu.render.camera import Camera
from swift_game_engine_tpu.render import tile_raster as TR


def fused_time(fn, *args, reps=8):
    """Scan-fused timing: `reps` dependent calls in one jit, subtract one
    dispatch (~27 ms). Large arrays ride as ARGUMENTS (a big jit closure
    constant stalls the axon compile >9 min)."""
    @jax.jit
    def many(seed, *a):
        def body(c, _):
            out = fn(c, *a)
            # thread a scalar through so iterations can't be deduped
            return c + 1e-6 * out, out
        c, _ = jax.lax.scan(body, seed, None, length=reps)
        return c

    jax.block_until_ready(many(jnp.float32(0.0), *args))
    t0 = time.perf_counter()
    jax.block_until_ready(many(jnp.float32(1.0), *args))
    wall = time.perf_counter() - t0
    return (wall - 0.027) / reps


def main():
    wh = sys.argv[1] if len(sys.argv) > 1 else "960x540"
    W, H = map(int, wh.split("x"))
    scene = DemoScene().build()
    geo = scene["geometry"]
    stepper, state = scene["stepper"], scene["state"]
    cam = Camera()
    cam.position = np.array([0.0, 4.0, 14.0], np.float32)
    cam.target = np.array([0.0, 0.0, 0.0], np.float32)
    transforms, palettes = stepper.extract(state, 0.0, np.zeros(3, np.float32))
    fg = jax.jit(lambda tr, pa: flatten_frame(geo, tr, pa))(transforms, palettes)
    jax.block_until_ready(fg.pos)
    v0, v1, v2 = fg.bvh.v0, fg.bvh.v1, fg.bvh.v2
    print(f"tris: {v0.shape[0]}  {W}x{H}  UNROLL={TR.UNROLL}")

    ivp = np.asarray(cam.inv_view_proj(W, H))
    vp = jnp.asarray(np.linalg.inv(ivp), jnp.float32)
    cpos = jnp.asarray(cam.position)

    def single(eps, a, b, c):
        h = TR.rasterize(a + eps, b, c, vp, cpos, W, H)
        return jnp.sum(h.t * (h.t < 1e9))

    t = fused_time(single, v0, v1, v2)
    print(f"rasterize single: {t*1e3:.1f} ms")

    for layers in (1, 2, 3):
        def peeled(eps, a, b, c, _l=layers):
            hs = TR.rasterize_peeled(a + eps, b, c, vp, cpos, W, H, _l)
            return sum(jnp.sum(h.t * (h.t < 1e9)) for h in hs)
        t = fused_time(peeled, v0, v1, v2)
        print(f"rasterize_peeled L{layers}: {t*1e3:.1f} ms")


if __name__ == "__main__":
    main()
