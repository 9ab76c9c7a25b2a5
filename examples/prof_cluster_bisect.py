"""Bisect cluster-raster cost: kernel-only vs resolve-only vs end-to-end,
both wall-clock per dispatch and scan-slope device time.

Usage: python examples/prof_cluster_bisect.py [WxH]
"""
import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from swift_game_engine_tpu.scene.demo_scene import DemoScene
from swift_game_engine_tpu.render.scene_geometry import flatten_frame
from swift_game_engine_tpu.render.camera import Camera
from swift_game_engine_tpu.render import tile_raster as TR


def wall(fn, *args, n=10, warmup=2):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / n


def slope(fn, *args, n=8):
    def chain(k):
        @jax.jit
        def run(args):
            def body(c, _):
                a0 = args[0] + c * 1e-38
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

    scene = DemoScene().build()
    geo = scene["geometry"]
    stepper, state = scene["stepper"], scene["state"]
    cam = Camera()
    cam.position = np.array([0.0, 4.0, 14.0], np.float32)
    cam.target = np.array([0.0, 0.0, 0.0], np.float32)
    transforms, palettes = stepper.extract(state, 0.0, np.zeros(3, np.float32))
    fg = jax.jit(lambda tr, pa: flatten_frame(geo, tr, pa))(transforms,
                                                            palettes)
    jax.block_until_ready(fg.pos)
    v0, v1, v2 = fg.bvh.v0, fg.bvh.v1, fg.bvh.v2
    vp = jnp.asarray(np.linalg.inv(np.asarray(cam.inv_view_proj(W, H))))
    cpos = jnp.asarray(cam.position)

    tiles_x = -(-W // TR.TILE_W)
    tiles_y = -(-H // TR.TILE_H)
    tiles = tiles_x * tiles_y

    rows, meta, n_clusters = jax.block_until_ready(jax.jit(
        lambda a, b, c: TR._setup_clusters(a, b, c, vp, W, H))(v0, v1, v2))
    n_clusters = int(rows.shape[0] // TR.CLUSTER)

    kernel = partial(TR._cluster_kernel, width=W, height=H, tiles_x=tiles_x,
                     layers=1, n_clusters=n_clusters)
    tile_spec = pl.BlockSpec((1, 1, TR.TILE_H, TR.TILE_W),
                             lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    osh = jax.ShapeDtypeStruct((tiles, 1, TR.TILE_H, TR.TILE_W), jnp.float32)

    def kern_only(rows, meta):
        return pl.pallas_call(
            kernel,
            grid=(tiles,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=(tile_spec,) * 4,
            out_shape=(
                jax.ShapeDtypeStruct((tiles, 1, TR.TILE_H, TR.TILE_W),
                                     jnp.int32), osh, osh, osh),
        )(meta, rows)

    # NOTE args order: perturb ROWS (first arg) in slope
    print(f"kernel wall: {wall(jax.jit(kern_only), rows, meta)*1e3:.1f} ms",
          flush=True)
    print(f"kernel slope: {slope(kern_only, rows, meta)*1e3:.1f} ms",
          flush=True)

    def e2e(v0, v1, v2):
        h = TR.rasterize_clusters(v0, v1, v2, vp, cpos, W, H, layers=1)[0]
        return h.t, h.tri
    print(f"e2e wall: {wall(jax.jit(e2e), v0, v1, v2)*1e3:.1f} ms",
          flush=True)
    print(f"e2e slope: {slope(e2e, v0, v1, v2)*1e3:.1f} ms", flush=True)

    # resolve-only: untile + world-pos + norm from kernel outputs
    tid, b1, b2, w = jax.block_until_ready(jax.jit(kern_only)(rows, meta))

    def resolve(b1, tid, b2):
        def untile(a):
            img = a[:, 0].reshape(tiles_y, tiles_x, TR.TILE_H, TR.TILE_W)
            img = img.transpose(0, 2, 1, 3).reshape(tiles_y * TR.TILE_H,
                                                    tiles_x * TR.TILE_W)
            return img[:H, :W].reshape(-1)
        tid_l = untile(tid.astype(jnp.float32)).astype(jnp.int32)
        b1_l = untile(b1)
        b2_l = untile(b2)
        found = tid_l >= 0
        safe = jnp.maximum(tid_l, 0)
        b0 = 1.0 - b1_l - b2_l
        p_world = (b0[:, None] * v0[safe] + b1_l[:, None] * v1[safe] +
                   b2_l[:, None] * v2[safe])
        t = jnp.linalg.norm(p_world - cpos, axis=-1)
        return jnp.where(found, t, TR.BIG)
    print(f"resolve wall: {wall(jax.jit(resolve), b1, tid, b2)*1e3:.1f} ms",
          flush=True)
    print(f"resolve slope: {slope(resolve, b1, tid, b2)*1e3:.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
