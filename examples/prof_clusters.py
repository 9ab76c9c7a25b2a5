"""Cluster rasterizer on the DemoScene: setup + kernel timing vs the
list-based rasterizer, single-layer and peeled.

Usage: python examples/prof_clusters.py [WxH] [layers]
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
from swift_game_engine_tpu.render import tile_raster as TR


def timeit(fn, *args, n=5, warmup=1):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / n


def timeit_device(fn, *args, n=8):
    """Per-iteration DEVICE time via the scan-slope method: time a fused
    scan of n iterations vs 1, so per-dispatch tunnel latency (~27 ms on
    axon) cancels. fn's outputs are reduced to scalars to keep the carry
    small; scan trips can't be CSE'd."""
    def chain(k):
        @jax.jit
        def run(args):
            def body(c, _):
                # perturb the first arg by the carry so the computation is
                # NOT loop-invariant (XLA would hoist it out of the scan)
                a0 = args[0] + c * 1e-38
                out = fn(a0, *args[1:])
                s = sum(jnp.sum(x) * 1e-30 for x in jax.tree.leaves(out)
                        if jnp.issubdtype(x.dtype, jnp.floating))
                return c + s, None
            tot, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=k)
            return tot
        jax.block_until_ready(run(args))  # compile
        t0 = time.perf_counter()
        jax.block_until_ready(run(args))
        return time.perf_counter() - t0
    t1 = chain(1)
    tn = chain(1 + n)
    return (tn - t1) / n


def main():
    wh = sys.argv[1] if len(sys.argv) > 1 else "960x540"
    W, H = map(int, wh.split("x"))
    layers = int(sys.argv[2]) if len(sys.argv) > 2 else 3

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

    t = timeit_device(lambda a, b, c: TR._setup_clusters(a, b, c, vp, W, H)[:2],
                      v0, v1, v2)
    print(f"cluster setup: {t*1e3:.2f} ms device "
          f"({(v0.shape[0]+TR.CLUSTER-1)//TR.CLUSTER} clusters of "
          f"{TR.CLUSTER})", flush=True)

    opaque = None
    try:
        from swift_game_engine_tpu.render.rt import _opaque_tris
        opaque = _opaque_tris(geo)
    except Exception:
        pass

    def one(v0, v1, v2):
        h = TR.rasterize_clusters(v0, v1, v2, vp, cpos, W, H, layers=1)[0]
        return h.t, h.tri
    t = timeit_device(one, v0, v1, v2)
    print(f"cluster raster L1: {t*1e3:.1f} ms device", flush=True)

    def peel(v0, v1, v2):
        hs = TR.rasterize_clusters(v0, v1, v2, vp, cpos, W, H, layers=layers,
                                   opaque=opaque)
        return tuple(h.t for h in hs)
    t = timeit_device(peel, v0, v1, v2)
    print(f"cluster raster L{layers} peeled (opaque-term): {t*1e3:.1f} ms "
          f"device", flush=True)

    # parity vs list rasterizer on the real scene
    h_new = jax.jit(lambda a, b, c: TR.rasterize_clusters(
        a, b, c, vp, cpos, W, H, layers=1)[0])(v0, v1, v2)
    h_old = jax.jit(lambda a, b, c: TR.rasterize(
        a, b, c, vp, cpos, W, H))(v0, v1, v2)
    tri_match = float(np.mean(np.asarray(h_old.tri) == np.asarray(h_new.tri)))
    tm = np.asarray(h_old.t)
    tn = np.asarray(h_new.t)
    both = (tm < 1e30) & (tn < 1e30)
    t_close = float(np.mean(np.abs(tm[both] - tn[both]) <
                            2e-3 * np.maximum(tm[both], 1.0)))
    print(f"parity vs list raster: tri match {tri_match:.5f}, "
          f"t close {t_close:.5f}", flush=True)


if __name__ == "__main__":
    main()
