"""Attribute cluster-raster setup cost + kernel visit counts.

Usage: python examples/prof_cluster_parts.py [WxH]
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


def timeit(fn, *args, n=10, warmup=2):
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

    # --- setup sub-pieces
    def piece_tf(v0, v1, v2):
        def tf(p):
            return p @ vp[:, :3].T + vp[:, 3]
        c0, c1, c2 = tf(v0), tf(v1), tf(v2)
        r0 = jnp.stack([c0[:, 0], c0[:, 1], c0[:, 3]], axis=-1)
        r1 = jnp.stack([c1[:, 0], c1[:, 1], c1[:, 3]], axis=-1)
        r2 = jnp.stack([c2[:, 0], c2[:, 1], c2[:, 3]], axis=-1)
        cof0 = jnp.cross(r1, r2)
        cof1 = jnp.cross(r2, r0)
        cof2 = jnp.cross(r0, r1)
        return cof0, cof1, cof2
    print(f"tf+cross: {timeit(jax.jit(piece_tf), v0, v1, v2)*1e3:.2f} ms",
          flush=True)

    full = jax.jit(lambda a, b, c: TR._setup_clusters(a, b, c, vp, W, H))
    print(f"full setup: {timeit(full, v0, v1, v2)*1e3:.2f} ms", flush=True)
    rows, meta, n_clusters = jax.block_until_ready(full(v0, v1, v2))
    n_clusters = int(n_clusters)
    print(f"n_clusters={n_clusters}", flush=True)

    # cluster AABB areas (tile coverage estimate)
    m = np.asarray(meta).reshape(-1, 8)
    tiles_x = -(-W // TR.TILE_W)
    tiles_y = -(-H // TR.TILE_H)
    tx0 = np.clip(np.floor(m[:, 0] / TR.TILE_W), 0, tiles_x - 1)
    tx1 = np.clip(np.floor(m[:, 2] / TR.TILE_W), 0, tiles_x - 1)
    ty0 = np.clip(np.floor(m[:, 1] / TR.TILE_H), 0, tiles_y - 1)
    ty1 = np.clip(np.floor(m[:, 3] / TR.TILE_H), 0, tiles_y - 1)
    onscreen = (m[:, 0] <= m[:, 2])
    spans = np.where(onscreen, (tx1 - tx0 + 1) * (ty1 - ty0 + 1), 0)
    print(f"cluster-tile pairs (no exit): {int(spans.sum())} "
          f"(mean span {spans[onscreen].mean():.1f} tiles, "
          f"onscreen {int(onscreen.sum())}/{len(m)})", flush=True)

    # --- instrumented kernel: scanned + accepted per tile
    tiles = tiles_x * tiles_y

    def stats_kernel(meta_ref, rows_ref, sc_out, ac_out, *, layers=1):
        tile = pl.program_id(0)
        ty = tile // tiles_x
        tx = tile % tiles_x
        pxi = (tx * TR.TILE_W +
               jax.lax.broadcasted_iota(jnp.int32, (TR.TILE_H, TR.TILE_W), 1))
        pyi = (ty * TR.TILE_H +
               jax.lax.broadcasted_iota(jnp.int32, (TR.TILE_H, TR.TILE_W), 0))
        x = (pxi.astype(jnp.float32) + 0.5) * (2.0 / W) - 1.0
        y = 1.0 - (pyi.astype(jnp.float32) + 0.5) * (2.0 / H)
        pixel_ok = (pxi < W) & (pyi < H)
        tile_x0 = tx.astype(jnp.float32) * TR.TILE_W
        tile_y0 = ty.astype(jnp.float32) * TR.TILE_H
        tile_x1 = tile_x0 + TR.TILE_W
        tile_y1 = tile_y0 + TR.TILE_H

        def empty():
            return (jnp.full((TR.TILE_H, TR.TILE_W), TR.BIG, jnp.float32),
                    jnp.ones((TR.TILE_H, TR.TILE_W), jnp.float32),
                    jnp.full((TR.TILE_H, TR.TILE_W), -1.0, jnp.float32))

        def do_cluster(base_i, slots):
            def group(g, slots):
                zn, zd, tid = slots
                rws = rows_ref[pl.ds(base_i + g * TR.UNROLL, TR.UNROLL), :]
                for j in range(TR.UNROLL):
                    def s(i):
                        return rws[j, i]
                    lam0 = s(0) * x + s(1) * y + s(2)
                    lam1 = s(3) * x + s(4) * y + s(5)
                    lam2 = s(6) * x + s(7) * y + s(8)
                    sig = lam0 + lam1 + lam2
                    flip = jnp.where(sig < 0, -1.0, 1.0)
                    lam0 = lam0 * flip
                    lam1 = lam1 * flip
                    lam2 = lam2 * flip
                    sig = sig * flip
                    detp = lam0 * s(9) + lam1 * s(10) + lam2 * s(11)
                    inside = (jnp.minimum(jnp.minimum(lam0, lam1), lam2)
                              >= 0.0) & (sig > 1e-20) & (s(12) >= 0.0) & \
                        (detp > 0.0)
                    win = inside & (detp * zd < zn * sig)
                    zn = jnp.where(win, detp, zn)
                    zd = jnp.where(win, sig, zd)
                    tid = jnp.where(win, s(12), tid)
                return zn, zd, tid
            return jax.lax.fori_loop(0, TR.CLUSTER // TR.UNROLL, group, slots)

        def cond(c):
            return (c[0] < n_clusters) & (c[1] < 0.5)

        def body(c):
            ci, _, bound, n_acc, slots = c[0], c[1], c[2], c[3], c[4:]
            cx0 = meta_ref[ci * 8 + 0]
            cy0 = meta_ref[ci * 8 + 1]
            cx1 = meta_ref[ci * 8 + 2]
            cy1 = meta_ref[ci * 8 + 3]
            cw = meta_ref[ci * 8 + 4]
            base_i = meta_ref[ci * 8 + 5].astype(jnp.int32)
            stop = jnp.where(cw >= bound, 1.0, 0.0)
            overlap = (cx0 <= tile_x1) & (cx1 >= tile_x0) & \
                (cy0 <= tile_y1) & (cy1 >= tile_y0)
            process = overlap & (stop < 0.5)
            slots = jax.lax.cond(process, lambda s: do_cluster(base_i, s),
                                 lambda s: s, slots)

            def nb(s):
                zn, zd, tid = s
                depth = jnp.where(tid >= 0.0, zn / zd, TR.BIG)
                depth = jnp.where(pixel_ok, depth, 0.0)
                return jnp.max(depth)
            bound = jax.lax.cond(process, nb, lambda s: bound, slots)
            n_acc = n_acc + process.astype(jnp.int32)
            return (ci + 1, stop, bound, n_acc) + slots

        init = (jnp.int32(0), jnp.float32(0.0), TR.BIG * jnp.float32(1.0),
                jnp.int32(0)) + empty()
        out = jax.lax.while_loop(cond, body, init)
        sc_out[0] = jnp.full((8, 128), out[0], jnp.int32)
        ac_out[0] = jnp.full((8, 128), out[3], jnp.int32)

    spec = pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)

    def run(meta, rows):
        return pl.pallas_call(
            stats_kernel,
            grid=(tiles,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=(spec, spec),
            out_shape=(jax.ShapeDtypeStruct((tiles, 8, 128), jnp.int32),
                       jax.ShapeDtypeStruct((tiles, 8, 128), jnp.int32)),
        )(meta, rows)

    sc, ac = jax.block_until_ready(jax.jit(run)(meta, rows))
    sc = np.asarray(sc)[:, 0, 0]
    ac = np.asarray(ac)[:, 0, 0]
    print(f"scanned/tile: mean={sc.mean():.0f} max={sc.max()} "
          f"(of {n_clusters})", flush=True)
    print(f"accepted/tile: mean={ac.mean():.0f} max={ac.max()} "
          f"total={ac.sum()} -> tri-tests={ac.sum()*TR.CLUSTER}", flush=True)
    t = timeit(jax.jit(run), meta, rows, n=5)
    print(f"L1 stats-kernel time: {t*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
