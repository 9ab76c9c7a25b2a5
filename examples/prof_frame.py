"""Full-frame RT configs, device time via scan-slope (tunnel cancels):

  trace   — BVH packet kernels for everything (round-2 default)
  peels   — cluster-raster visibility for all layers; BVH only for
            shadow / mirror / refraction
  peels+cs — peels + cluster shadow kernel (no BVH for shadows either)

Usage: python examples/prof_frame.py [WxH] [n_slope]
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
from swift_game_engine_tpu.render import rt as RT
from swift_game_engine_tpu.render.ibl import IBL


def slope(fn, *args, n=4):
    def chain(k):
        @jax.jit
        def run(args):
            def body(c, _):
                a0 = jax.tree.map(lambda a: a + c * 1e-38, args[0])
                out = fn(a0, *args[1:])
                s = sum(jnp.sum(x) * 1e-30 for x in jax.tree.leaves(out)
                        if jnp.issubdtype(x.dtype, jnp.floating))
                return c + s, None
            tot, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=k)
            return tot
        jax.block_until_ready(run(args))
        t0 = time.perf_counter()
        jax.block_until_ready(run(args))
        return time.perf_counter() - t0
    t1 = chain(1)
    tn = chain(1 + n)
    return (tn - t1) / n


def main():
    wh = sys.argv[1] if len(sys.argv) > 1 else "960x540"
    W, H = map(int, wh.split("x"))
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    scene = DemoScene().build()
    geo = scene["geometry"]
    lights = scene["lights"]
    stepper, state = scene["stepper"], scene["state"]
    ibl = IBL.build()
    cam = Camera()
    cam.position = np.array([0.0, 4.0, 14.0], np.float32)
    cam.target = np.array([0.0, 0.0, 0.0], np.float32)
    transforms, palettes = stepper.extract(state, 0.0, np.zeros(3, np.float32))
    ivp = jnp.asarray(cam.inv_view_proj(W, H))
    vp = jnp.asarray(cam.view_proj(W, H))
    cpos = jnp.asarray(cam.position)

    def frame(transforms, palettes):
        fg = flatten_frame(geo, transforms, palettes)
        return RT.render_frame(geo, fg, ibl, lights, ivp, cpos, W, H,
                               max_layers=3, shadow_layers=4,
                               enable_mirror=True, enable_refraction=True,
                               view_proj=vp)

    configs = [
        ("trace", "trace", False),
        ("peels", "peels", False),
        ("peels+cshadow", "peels", True),
    ]
    img_ref = None
    for name, prim, cshadow in configs:
        RT._RT_PRIMARY = prim
        RT._SHADOW_CLUSTERS = cshadow
        img = jax.block_until_ready(jax.jit(frame)(transforms, palettes))
        m = float(jnp.mean(img))
        if img_ref is None:
            img_ref = np.asarray(img)
            diff = 0.0
        else:
            d = np.abs(np.asarray(img) - img_ref).max(-1)
            diff = float((d > 1e-3).mean())
        t = slope(frame, transforms, palettes, n=n)
        print(f"{name}: {t*1e3:.1f} ms device  mean={m:.6f} "
              f"diff_frac={diff:.4f}", flush=True)


if __name__ == "__main__":
    main()
