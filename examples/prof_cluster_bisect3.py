"""Isolate WHICH part of the cluster-meta chain breaks fusion with the
pallas_call: argsort? gather-by-order? stack? any varying SMEM producer?"""
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


def slope(fn, *args, n=4):
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
    W, H = 960, 540
    scene = DemoScene().build()
    stepper, state = scene["stepper"], scene["state"]
    geo = scene["geometry"]
    cam = Camera()
    cam.position = np.array([0.0, 4.0, 14.0], np.float32)
    cam.target = np.array([0.0, 0.0, 0.0], np.float32)
    transforms, palettes = stepper.extract(state, 0.0, np.zeros(3, np.float32))
    fg = jax.jit(lambda tr, pa: flatten_frame(geo, tr, pa))(transforms,
                                                            palettes)
    jax.block_until_ready(fg.pos)
    v0, v1, v2 = fg.bvh.v0, fg.bvh.v1, fg.bvh.v2
    vp = jnp.asarray(np.linalg.inv(np.asarray(cam.inv_view_proj(W, H))))

    tiles_x = -(-W // TR.TILE_W)
    tiles_y = -(-H // TR.TILE_H)
    tiles = tiles_x * tiles_y
    rows0, meta0, _ = jax.block_until_ready(jax.jit(
        lambda a, b, c: TR._setup_clusters(a, b, c, vp, W, H))(v0, v1, v2))
    n_clusters = int(rows0.shape[0] * 8 // TR.CLUSTER)
    C = n_clusters

    kernel = partial(TR._cluster_kernel, width=W, height=H, tiles_x=tiles_x,
                     layers=1, n_clusters=n_clusters)
    tile_spec = pl.BlockSpec((1, 1, TR.TILE_H, TR.TILE_W),
                             lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    osh = jax.ShapeDtypeStruct((tiles, 1, TR.TILE_H, TR.TILE_W), jnp.float32)

    def kern(meta, rows):
        return pl.pallas_call(
            kernel, grid=(tiles,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=(tile_spec,) * 4,
            out_shape=(jax.ShapeDtypeStruct(
                (tiles, 1, TR.TILE_H, TR.TILE_W), jnp.int32),
                osh, osh, osh),
        )(meta, rows)

    # A: trivially-varying meta (elementwise)
    def a(v0x):
        meta = meta0 + jnp.sum(v0x[0]) * 1e-38
        return kern(meta, rows0)
    print(f"A meta=elementwise-varying: {slope(a, v0)*1e3:.1f} ms",
          flush=True)

    # B: full meta chain, order = identity iota (no argsort)
    def meta_chain(v0x, use_sort):
        rows, _, _ = TR._setup_clusters(v0x, v1, v2, vp, W, H)
        # recompute cluster aabb/depth columns from the packed rows? no —
        # rebuild the same way setup does, inline (subset):
        def tfc(p):
            x, y, z = p[:, 0], p[:, 1], p[:, 2]
            cw = vp[3, 0] * x + vp[3, 1] * y + vp[3, 2] * z + vp[3, 3]
            return cw
        w0 = tfc(v0x)
        wmin = jnp.maximum(w0, 0.0)
        padl = (-wmin.shape[0]) % TR.CLUSTER
        if padl:
            wmin = jnp.concatenate([wmin, jnp.full(padl, TR.BIG)])
        cw = jnp.min(wmin.reshape(C, TR.CLUSTER), axis=1)
        if use_sort:
            order = jnp.argsort(cw)
        else:
            order = jnp.arange(C)
        base = (order * (TR.CLUSTER // 8)).astype(jnp.float32)
        m0 = meta0.reshape(C, 8)
        meta = jnp.stack([m0[:, 0], m0[:, 1], m0[:, 2], m0[:, 3],
                          cw[order], base, base * 0, base * 0], axis=-1)
        return meta.reshape(-1), rows

    def b(v0x):
        meta, rows = meta_chain(v0x, False)
        return kern(meta, rows)
    print(f"B chain-no-argsort: {slope(b, v0)*1e3:.1f} ms", flush=True)

    def c(v0x):
        meta, rows = meta_chain(v0x, True)
        return kern(meta, rows)
    print(f"C chain+argsort: {slope(c, v0)*1e3:.1f} ms", flush=True)

    # D: meta chain computed but NOT fed to kernel (kernel gets constant)
    def d(v0x):
        meta, rows = meta_chain(v0x, True)
        outs = kern(meta0, rows)
        return outs + (jnp.sum(meta),)
    print(f"D chain-beside-kernel: {slope(d, v0)*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
