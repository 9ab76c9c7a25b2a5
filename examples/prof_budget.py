"""Frame-budget attribution under CURRENT defaults (SO kernel, shadow
kernel, chunked layers): times each pass and several full-frame configs so
optimization work targets the real cost centers.

Usage: python examples/prof_budget.py [WxH] [pass_filter ...]
  pass_filter: optional subset of
    {prim_so, prim_raster, shadow, shade, l1, l2, l3, full, nobounce, raster}
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
from swift_game_engine_tpu.render.scene_geometry import (flatten_frame,
                                                         texture_usage)
from swift_game_engine_tpu.render.camera import (Camera, generate_rays,
                                                 tile_permutation)
from swift_game_engine_tpu.ops import rt_kernel as K


def timeit(fn, *args, n=5, warmup=1):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / n


def main():
    wh = sys.argv[1] if len(sys.argv) > 1 else "960x540"
    W, H = map(int, wh.split("x"))
    want = set(sys.argv[2:])

    def sel(name):
        return not want or name in want

    t0 = time.time()
    scene = DemoScene().build()
    print(f"build: {time.time()-t0:.1f}s", flush=True)
    geo = scene["geometry"]
    stepper, state = scene["stepper"], scene["state"]
    from swift_game_engine_tpu.render.ibl import IBL
    ibl = IBL.build()
    lights = scene["lights"]

    cam = Camera()
    cam.position = np.array([0.0, 4.0, 14.0], np.float32)
    cam.target = np.array([0.0, 0.0, 0.0], np.float32)
    transforms, palettes = stepper.extract(state, 0.0, np.zeros(3, np.float32))
    fg = jax.jit(lambda tr, pa: flatten_frame(geo, tr, pa))(transforms, palettes)
    jax.block_until_ready(fg.pos)
    print(f"nodes={fg.bvh.bmin.shape[0]} tris={geo.tri.shape[0]} rays={W*H}",
          flush=True)

    ivp = jnp.asarray(cam.inv_view_proj(W, H))
    vp = jnp.asarray(np.linalg.inv(np.asarray(cam.inv_view_proj(W, H))))
    cpos = jnp.asarray(cam.position)
    ray_o, ray_d = generate_rays(ivp, cpos, W, H)
    perm, _ = tile_permutation(W, H)
    ray_o = ray_o[jnp.asarray(perm)]
    ray_d = ray_d[jnp.asarray(perm)]
    p = W * H
    usage = texture_usage(geo)

    # --- primary visibility: SO kernel
    if sel("prim_so") and K.so_available(fg.bvh.rows):
        so_rows = jax.jit(lambda r: K.build_origin_rows(r, cpos))(fg.bvh.rows)
        jax.block_until_ready(so_rows[0])

        def prim_so(d):
            t, tri = K.trace_rays_so(so_rows, cpos, d,
                                     jnp.full(p, K.BIG, jnp.float32))
            return t, tri
        t = timeit(jax.jit(prim_so), ray_d)
        print(f"primary SO trace: {t*1e3:.1f} ms ({p/t/1e6:.1f} Mrays/s)",
              flush=True)

    # --- primary visibility: tile raster
    if sel("prim_raster"):
        from swift_game_engine_tpu.render.tile_raster import rasterize

        def prim_r(v0, v1, v2):
            h = rasterize(v0, v1, v2, vp, cpos, W, H)
            return h.t, h.tri
        t = timeit(jax.jit(prim_r), fg.bvh.v0, fg.bvh.v1, fg.bvh.v2)
        print(f"primary raster: {t*1e3:.1f} ms", flush=True)

    # primary hits for the shade probes
    tr = jax.jit(lambda o, d, a: RT._trace_batch(fg.bvh, o, d, a))
    tt, tri, u, v, found = jax.block_until_ready(
        tr(ray_o, ray_d, jnp.ones(p, bool)))
    print(f"primary hit rate: {float(jnp.mean(found.astype(jnp.float32))):.2f}",
          flush=True)

    # --- dense shadow-factor kernel
    if sel("shadow"):
        l0 = RT.normalize(-lights.direction[0])
        srows = jax.jit(lambda r: K.build_shadow_rows(r, l0))(fg.bvh.rows)
        jax.block_until_ready(srows[0])
        hp = ray_o + ray_d * jnp.where(found, tt, 1.0)[..., None]

        def shad(hp):
            return K.trace_shadow_factor(srows, l0, hp,
                                         jnp.where(found, 200.0, 0.0))
        t = timeit(jax.jit(shad), hp)
        print(f"dense shadow-factor kernel: {t*1e3:.1f} ms", flush=True)

    # --- L1 shade (with shadow kernel, as _render_rays does)
    if sel("shade"):
        l0 = RT.normalize(-lights.direction[0])
        srows = jax.jit(lambda r: K.build_shadow_rows(r, l0))(fg.bvh.rows)
        jax.block_until_ready(srows[0])

        def shade(o, d, t_, tri_, u_, v_, f_):
            return RT._shade_hit(geo, fg, ibl, lights, cpos, o, d, t_, tri_,
                                 u_, v_, f_, True, 4, usage=usage,
                                 shadow_rows=srows)[0]
        t = timeit(jax.jit(shade), ray_o, ray_d, tt, tri, u, v, found)
        print(f"L1 shade (shadow kernel): {t*1e3:.1f} ms", flush=True)

        def shade_ns(o, d, t_, tri_, u_, v_, f_):
            return RT._shade_hit(geo, fg, ibl, lights, cpos, o, d, t_, tri_,
                                 u_, v_, f_, True, 0, usage=usage)[0]
        t = timeit(jax.jit(shade_ns), ray_o, ray_d, tt, tri, u, v, found)
        print(f"L1 shade (no shadow): {t*1e3:.1f} ms", flush=True)

    # --- full-frame configs
    def full(ml, mirror, refr):
        def f(o, d):
            return RT._render_rays(geo, fg, ibl, lights, cpos, o, d, ml, 4,
                                   mirror, refr)
        return f

    for name, ml, mi, re in [("l1", 1, False, False),
                             ("l2", 2, False, False),
                             ("l3", 3, False, False),
                             ("nobounce", 3, False, False),
                             ("mirror_only", 3, True, False),
                             ("full", 3, True, True)]:
        if not sel(name):
            continue
        t = timeit(jax.jit(full(ml, mi, re)), ray_o, ray_d, n=3)
        print(f"_render_rays {name} (ml={ml} mirror={mi} refr={re}): "
              f"{t*1e3:.1f} ms", flush=True)

    # --- raster path full frame
    if sel("raster"):
        from swift_game_engine_tpu.render import raster as RA

        def rfull(tr_, pa_):
            fg2 = flatten_frame(geo, tr_, pa_)
            return RA.render_frame_raster(geo, fg2, ivp, cpos, W, H,
                                          view_proj=vp)
        try:
            t = timeit(jax.jit(rfull), transforms, palettes, n=3)
            print(f"raster path full frame (incl flatten): {t*1e3:.1f} ms",
                  flush=True)
        except Exception as e:
            print(f"raster probe failed: {e}", flush=True)


if __name__ == "__main__":
    main()
