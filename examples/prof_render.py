"""RT frame breakdown on TPU: per-pass traversal / shade / shadow timing.

Usage: python examples/prof_render.py [WxH]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from swift_game_engine_tpu.scene.demo_scene import DemoScene
from swift_game_engine_tpu.scene.engine import Engine
from swift_game_engine_tpu.scene.input import InputFrame
from swift_game_engine_tpu.render import rt as RT
from swift_game_engine_tpu.render.scene_geometry import flatten_frame, texture_usage
from swift_game_engine_tpu.render.camera import generate_rays, tile_permutation
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
    scene = DemoScene().build()
    eng = Engine(scene, width=W, height=H, path="rt")
    eng.frame(1.0 / 60.0, InputFrame(ly=1.0), with_overlay=False)  # compile+state

    geo = eng.geometry
    ibl = eng.ibl
    lights = eng.lights

    # Rebuild the frame inputs the way Engine.render does.
    cam_world = eng.camera.world_position.astype(np.float32)
    transforms, palettes = eng.stepper.extract(eng.state, 0.0, cam_world)
    fg = jax.jit(lambda tr, pa: flatten_frame(geo, tr, pa))(transforms, palettes)
    jax.block_until_ready(fg.pos)
    print(f"nodes: {fg.bvh.bmin.shape[0]}  tris: {geo.tri.shape[0]}  rays: {W*H}")

    ivp = jnp.asarray(eng.camera.inv_view_proj(W, H))
    cam = jnp.asarray(eng.camera.position)

    ray_o, ray_d = generate_rays(jnp.asarray(ivp), cam, W, H)
    perm, _ = tile_permutation(W, H)
    ray_o, ray_d = ray_o[jnp.asarray(perm)], ray_d[jnp.asarray(perm)]
    live = jnp.ones(W * H, bool)

    t = timeit(jax.jit(lambda o, d, a: RT._trace_batch(fg.bvh, o, d, a)),
               ray_o, ray_d, live)
    print(f"primary trace pass: {t*1e3:.1f} ms ({W*H/t/1e6:.1f} Mrays/s)")

    usage = texture_usage(geo)
    tr = jax.jit(lambda o, d, a: RT._trace_batch(fg.bvh, o, d, a))
    tt, tri, u, v, found = jax.block_until_ready(tr(ray_o, ray_d, live))
    print(f"primary hit rate: {float(jnp.mean(found.astype(jnp.float32))):.2f}")

    def shade(o, d, t_, tri_, u_, v_, f_):
        return RT._shade_hit(geo, fg, ibl, lights, cam, o, d, t_, tri_, u_, v_,
                             f_, True, 4, usage=usage)
    t = timeit(jax.jit(shade), ray_o, ray_d, tt, tri, u, v, found)
    print(f"shade (incl shadow loop): {t*1e3:.1f} ms")

    def shade_nosh(o, d, t_, tri_, u_, v_, f_):
        return RT._shade_hit(geo, fg, ibl, lights, cam, o, d, t_, tri_, u_, v_,
                             f_, True, 0, usage=usage)
    t = timeit(jax.jit(shade_nosh), ray_o, ray_d, tt, tri, u, v, found)
    print(f"shade (no shadow): {t*1e3:.1f} ms")

    def full(o, d):
        return RT._render_rays(geo, fg, ibl, lights, cam, o, d, 3, 4, True, True)
    t = timeit(jax.jit(full), ray_o, ray_d, n=3)
    print(f"_render_rays full: {t*1e3:.1f} ms")

    def full_l1(o, d):
        return RT._render_rays(geo, fg, ibl, lights, cam, o, d, 1, 4, False, False)
    t = timeit(jax.jit(full_l1), ray_o, ray_d, n=3)
    print(f"_render_rays L1 no-bounce: {t*1e3:.1f} ms")


if __name__ == "__main__":
    main()
