"""Split tile-raster cost: XLA setup (binning) vs Pallas raster kernel.

Usage: python examples/prof_raster_split.py [WxH]
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

    tiles_x = -(-W // TR.TILE_W)
    tiles_y = -(-H // TR.TILE_H)
    tiles = tiles_x * tiles_y

    setup = jax.jit(lambda a, b, c: TR._setup(a, b, c, vp, W, H,
                                              tiles_x, tiles_y))
    t = timeit(setup, v0, v1, v2)
    print(f"setup (binning): {t*1e3:.1f} ms", flush=True)

    cand_rows, counts, _ = jax.block_until_ready(setup(v0, v1, v2))

    kernel = partial(TR._raster_kernel, width=W, height=H, tiles_x=tiles_x)
    tile_spec = pl.BlockSpec((1, TR.TILE_H, TR.TILE_W), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)

    def run_kernel(counts, cand_rows, prev_tiles):
        return pl.pallas_call(
            kernel,
            grid=(tiles,),
            in_specs=[
                pl.BlockSpec((tiles,), lambda i: (0,),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, TR.RASTER_K, 16), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                tile_spec,
            ],
            out_specs=(tile_spec, tile_spec, tile_spec, tile_spec),
            out_shape=(
                jax.ShapeDtypeStruct((tiles, TR.TILE_H, TR.TILE_W), jnp.int32),
                jax.ShapeDtypeStruct((tiles, TR.TILE_H, TR.TILE_W), jnp.float32),
                jax.ShapeDtypeStruct((tiles, TR.TILE_H, TR.TILE_W), jnp.float32),
                jax.ShapeDtypeStruct((tiles, TR.TILE_H, TR.TILE_W), jnp.float32),
            ),
        )(counts, cand_rows, prev_tiles)

    prev = jnp.zeros((tiles, TR.TILE_H, TR.TILE_W), jnp.float32)
    t = timeit(jax.jit(run_kernel), counts, cand_rows, prev)
    print(f"raster kernel: {t*1e3:.1f} ms "
          f"(pairs={int(np.asarray(counts).sum())})", flush=True)

    # full path for reference
    def full(v0, v1, v2):
        h = TR.rasterize(v0, v1, v2, vp, cam.position, W, H)
        return h.t, h.tri
    t = timeit(jax.jit(full), v0, v1, v2, n=3)
    print(f"rasterize() end-to-end: {t*1e3:.1f} ms", flush=True)

    # setup sub-pieces
    def overlap_only(v0, v1, v2):
        # replicate _setup up to the overlap mask
        vpj = vp

        def tf(p):
            return p @ vpj[:, :3].T + vpj[:, 3]
        c0, c1, c2 = tf(v0), tf(v1), tf(v2)
        eps_w = 1e-6
        w_all = jnp.stack([c0[:, 3], c1[:, 3], c2[:, 3]], axis=-1)
        in_front = jnp.all(w_all > eps_w, axis=-1)
        safe_w = jnp.maximum(w_all, eps_w)
        xs = jnp.stack([c0[:, 0], c1[:, 0], c2[:, 0]], axis=-1) / safe_w
        ys = jnp.stack([c0[:, 1], c1[:, 1], c2[:, 1]], axis=-1) / safe_w
        px = (xs * 0.5 + 0.5) * W
        py = (1.0 - (ys * 0.5 + 0.5)) * H
        x_min = jnp.where(in_front, jnp.min(px, axis=-1), 0.0)
        x_max = jnp.where(in_front, jnp.max(px, axis=-1), jnp.float32(W))
        y_min = jnp.where(in_front, jnp.min(py, axis=-1), 0.0)
        y_max = jnp.where(in_front, jnp.max(py, axis=-1), jnp.float32(H))
        tx0 = jnp.clip(jnp.floor(x_min / TR.TILE_W), 0, tiles_x - 1).astype(jnp.int32)
        tx1 = jnp.clip(jnp.floor(x_max / TR.TILE_W), 0, tiles_x - 1).astype(jnp.int32)
        ty0 = jnp.clip(jnp.floor(y_min / TR.TILE_H), 0, tiles_y - 1).astype(jnp.int32)
        ty1 = jnp.clip(jnp.floor(y_max / TR.TILE_H), 0, tiles_y - 1).astype(jnp.int32)
        t_ids = jnp.arange(tiles, dtype=jnp.int32)
        tyi = t_ids // tiles_x
        txi = t_ids % tiles_x
        overlap = ((txi[:, None] >= tx0[None, :]) & (txi[:, None] <= tx1[None, :]) &
                   (tyi[:, None] >= ty0[None, :]) & (tyi[:, None] <= ty1[None, :]))
        return overlap

    ov = jax.jit(overlap_only)
    t = timeit(ov, v0, v1, v2)
    print(f"  setup/overlap mask: {t*1e3:.1f} ms", flush=True)
    overlap = jax.block_until_ready(ov(v0, v1, v2))

    def cands_only(overlap):
        return jax.vmap(lambda row: jnp.nonzero(
            row, size=TR.RASTER_K, fill_value=overlap.shape[1])[0])(overlap)
    t = timeit(jax.jit(cands_only), overlap)
    print(f"  setup/per-tile nonzero: {t*1e3:.1f} ms", flush=True)
    cands = jax.block_until_ready(jax.jit(cands_only)(overlap))

    rows_pad = jnp.zeros((v0.shape[0] + 1, 16), jnp.float32)

    def gather_only(rows_pad, cands):
        return rows_pad[cands]
    t = timeit(jax.jit(gather_only), rows_pad, cands)
    print(f"  setup/candidate gather: {t*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
