"""Round-3 pass attribution: time every frame component in isolation so
optimization targets the real cost centers, plus a cluster-size sweep for
the cluster rasterizer.

Usage: python examples/prof_attrib.py [WxH] [section ...]
  sections: layered, prim, raster, shadow, shade (default all)
SGE_PROF_CAM="x,y,z[,tx,ty,tz]" overrides the camera.
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
from swift_game_engine_tpu.render.scene_geometry import (flatten_frame,
                                                         texture_usage,
                                                         TextureUsage)
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

    scene = DemoScene().build()
    geo = scene["geometry"]
    stepper, state = scene["stepper"], scene["state"]
    from swift_game_engine_tpu.render.ibl import IBL
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
    transforms, palettes = stepper.extract(state, 0.0, np.zeros(3, np.float32))
    fg = jax.jit(lambda tr, pa: flatten_frame(geo, tr, pa))(transforms,
                                                            palettes)
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
    so_rows = jax.jit(lambda r: K.build_origin_rows(r, cpos))(fg.bvh.rows)
    jax.block_until_ready(so_rows[0])

    if sel("layered"):
        def lay(d):
            return K.trace_layers_so(so_rows, cpos, d,
                                     jnp.full(p, K.BIG, jnp.float32),
                                     n_slots=3)
        t = timeit(jax.jit(lay), ray_d)
        print(f"layered walk (3 slots): {t*1e3:.1f} ms", flush=True)

    if sel("prim"):
        def prim(d):
            return K.trace_rays_so(so_rows, cpos, d,
                                   jnp.full(p, K.BIG, jnp.float32))
        t = timeit(jax.jit(prim), ray_d)
        print(f"plain SO primary: {t*1e3:.1f} ms", flush=True)

    if sel("raster"):
        from swift_game_engine_tpu.render.tile_raster import rasterize_clusters
        opq = RT._opaque_tris(geo)
        for cl in (128, 64, 32, 16):
            for layers in (1, 3):
                def rc(v0, v1, v2, _cl=cl, _ly=layers):
                    hs = rasterize_clusters(v0, v1, v2, vp, cpos, W, H,
                                            layers=_ly, opaque=opq,
                                            cluster=_cl)
                    return [h.t for h in hs]
                try:
                    t = timeit(jax.jit(rc), fg.bvh.v0, fg.bvh.v1, fg.bvh.v2,
                               n=3)
                    print(f"cluster raster cl={cl} layers={layers}: "
                          f"{t*1e3:.1f} ms", flush=True)
                except Exception as e:
                    print(f"cluster raster cl={cl} layers={layers}: FAILED "
                          f"{type(e).__name__}", flush=True)

    # primary hit records for shadow/shade probes
    tt, tri = jax.block_until_ready(jax.jit(
        lambda d: K.trace_rays_so(so_rows, cpos, d,
                                  jnp.full(p, K.BIG, jnp.float32)))(ray_d))
    found = tri >= 0
    u, v, _ = K.barycentrics(fg.bvh, ray_o, ray_d, jnp.where(found, tt, 1.0),
                             tri)
    hp = ray_o + ray_d * jnp.where(found, tt, 1.0)[..., None]

    if sel("shadow"):
        l0 = RT.normalize(-lights.direction[0])
        # cluster shadow kernel (the in-frame default)
        from swift_game_engine_tpu.ops.cluster_shadow import (
            build_shadow_clusters, trace_shadow_clusters)
        translucent = None
        mid = jnp.maximum(geo.tri_material, 0)
        translucent = geo.materials.alpha[mid] < 0.99
        sc = jax.jit(lambda v0, v1, v2: build_shadow_clusters(
            v0, v1, v2, l0, translucent))(fg.bvh.v0, fg.bvh.v1, fg.bvh.v2)
        jax.block_until_ready(sc.rows)

        def shc(o):
            return trace_shadow_clusters(sc, o,
                                         jnp.where(found, 200.0, 0.0),
                                         n_slots=4)
        t = timeit(jax.jit(shc), hp)
        print(f"cluster shadow kernel: {t*1e3:.1f} ms", flush=True)

        srows = jax.jit(lambda r: K.build_shadow_rows(r, l0))(fg.bvh.rows)
        jax.block_until_ready(srows[0])

        def sht(o):
            return K.trace_shadow_factor(srows, l0, o,
                                         jnp.where(found, 200.0, 0.0))
        t = timeit(jax.jit(sht), hp)
        print(f"tree shadow kernel: {t*1e3:.1f} ms", flush=True)

    if sel("shade"):
        variants = [
            ("full (ibl, taps)", True, usage),
            ("no ibl spec", False, usage),
            ("no taps", True, TextureUsage(False, False, False, False,
                                           False, False)),
            ("no taps no ibl", False, TextureUsage(False, False, False,
                                                   False, False, False)),
        ]
        for name, ibl_spec, us in variants:
            def sh(o, d, t_, tri_, u_, v_, f_, _i=ibl_spec, _u=us):
                return RT._shade_hit(geo, fg, ibl, lights, cpos, o, d, t_,
                                     tri_, u_, v_, f_, _i, 0, usage=_u)[0]
            t = timeit(jax.jit(sh), ray_o, ray_d, tt, tri, u, v, found)
            print(f"L1 shade [{name}]: {t*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
