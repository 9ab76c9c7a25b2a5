"""Second-stage bisect: which fusion boundary makes the cluster raster
slow inside one program? setup+kernel vs kernel+resolve vs full.
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


def slope(fn, *args, n=6):
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
    cpos = jnp.asarray(cam.position)

    tiles_x = -(-W // TR.TILE_W)
    tiles_y = -(-H // TR.TILE_H)
    tiles = tiles_x * tiles_y
    rows0, meta0, _ = jax.block_until_ready(jax.jit(
        lambda a, b, c: TR._setup_clusters(a, b, c, vp, W, H))(v0, v1, v2))
    n_clusters = int(rows0.shape[0] // TR.CLUSTER)

    kernel = partial(TR._cluster_kernel, width=W, height=H, tiles_x=tiles_x,
                     layers=1, n_clusters=n_clusters)
    tile_spec = pl.BlockSpec((1, 1, TR.TILE_H, TR.TILE_W),
                             lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    osh = jax.ShapeDtypeStruct((tiles, 1, TR.TILE_H, TR.TILE_W), jnp.float32)

    def kern(rows, meta):
        return pl.pallas_call(
            kernel, grid=(tiles,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=(tile_spec,) * 4,
            out_shape=(jax.ShapeDtypeStruct(
                (tiles, 1, TR.TILE_H, TR.TILE_W), jnp.int32),
                osh, osh, osh),
        )(meta, rows)

    def setup_kern(v0, v1, v2):
        rows, meta, _ = TR._setup_clusters(v0, v1, v2, vp, W, H)
        return kern(rows, meta)

    print(f"setup+kernel slope: {slope(setup_kern, v0, v1, v2)*1e3:.1f} ms",
          flush=True)

    # setup WITHOUT sort feeding kernel (is it argsort/gather?)
    def setup_kern_nosort(v0, v1, v2):
        rows, meta, _ = TR._setup_clusters(v0, v1, v2, vp, W, H)
        meta = meta0  # external sorted meta
        return kern(rows, meta)
    print(f"setup(rows-only)+kernel slope: "
          f"{slope(setup_kern_nosort, v0, v1, v2)*1e3:.1f} ms", flush=True)

    def meta_kern(v0, v1, v2):
        _, meta, _ = TR._setup_clusters(v0, v1, v2, vp, W, H)
        return kern(rows0, meta)
    print(f"setup(meta-only)+kernel slope: "
          f"{slope(meta_kern, v0, v1, v2)*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
