"""Isolate the peels-mode frame regression: scan-fused timings of
(a) rasterize_clusters (3 layers, opaque early-exit),
(b) _render_rays with PRECOMPUTED peel records,
(c) _render_rays layered-walk path (peels=None),
(d) the record permutation gathers.

Usage: python examples/prof_peels.py [WxH]
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
from swift_game_engine_tpu.render.camera import (Camera, generate_rays,
                                                 tile_permutation)
from swift_game_engine_tpu.render.ibl import IBL


def fused(fn, args, reps=5):
    """Scan-fused ms/iter: fn(i, *args) must depend on i."""
    @jax.jit
    def loop(*a):
        def body(i, acc):
            return acc + fn(i, *a)
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))
    jax.block_until_ready(loop(*args))
    t0 = time.perf_counter()
    jax.block_until_ready(loop(*args))
    return ((time.perf_counter() - t0) - 0.027) / reps * 1e3


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
    vp = jnp.asarray(np.linalg.inv(np.asarray(cam.inv_view_proj(W, H))))
    cpos = jnp.asarray(cam.position)
    ray_o, ray_d = generate_rays(ivp, cpos, W, H)
    perm, _ = tile_permutation(W, H)
    ray_o = ray_o[jnp.asarray(perm)]
    ray_d = ray_d[jnp.asarray(perm)]

    from swift_game_engine_tpu.render.tile_raster import rasterize_clusters
    opq = RT._opaque_tris(geo)

    def rast(i, v0):
        hs = rasterize_clusters(v0 + 0.0 * i, fg.bvh.v1, fg.bvh.v2, vp,
                                cpos, W, H, layers=3, opaque=opq)
        return sum(jnp.sum(jnp.where(h.found, h.t, 0.0)) for h in hs)
    print(f"rasterize_clusters l3+opq: {fused(rast, (fg.bvh.v0,)):.1f} ms",
          flush=True)

    # precompute peel records once
    raw = jax.jit(lambda v0: rasterize_clusters(
        v0, fg.bvh.v1, fg.bvh.v2, vp, cpos, W, H, layers=3,
        opaque=opq))(fg.bvh.v0)
    pj = jnp.asarray(perm)
    peels = [(h.t[pj], h.tri[pj], h.u[pj], h.v[pj], h.found[pj])
             for h in raw]
    peels = jax.block_until_ready(jax.tree.map(jnp.asarray, peels))

    def perm_cost(i, t):
        return jnp.sum(sum((f[pj + 0 * i]).astype(jnp.float32).sum()
                           for lay in [raw] for h in lay
                           for f in (h.t, h.tri, h.u, h.v)) * 0.0 + t)
    # (skip: permutation measured as part of full frame)

    def rr_peels(i, o, d):
        return jnp.mean(RT._render_rays(
            geo, fg, ibl, lights, cpos + 0.0 * i, o, d, 3, 4, True, True,
            peels=[tuple(x for x in lay) for lay in peels]))
    print(f"_render_rays peels-precomputed: "
          f"{fused(rr_peels, (ray_o, ray_d)):.1f} ms", flush=True)

    def rr_layered(i, o, d):
        return jnp.mean(RT._render_rays(
            geo, fg, ibl, lights, cpos + 0.0 * i, o, d, 3, 4, True, True))
    print(f"_render_rays layered (peels=None): "
          f"{fused(rr_layered, (ray_o, ray_d)):.1f} ms", flush=True)


if __name__ == "__main__":
    main()
