"""Binning statistics for the tile rasterizer on the DemoScene: candidate
counts per tile, total tri-tile pairs, and depth-complexity estimates —
sizes the front-to-back early-exit optimization before building it.

Usage: python examples/prof_bins.py [WxH]
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
    T = v0.shape[0]
    vp = jnp.asarray(np.linalg.inv(np.asarray(cam.inv_view_proj(W, H))))

    tiles_x = -(-W // TR.TILE_W)
    tiles_y = -(-H // TR.TILE_H)
    print(f"tris={T} tiles={tiles_x}x{tiles_y}={tiles_x*tiles_y} "
          f"tile={TR.TILE_H}x{TR.TILE_W}")

    cand_rows, counts, overflowed = jax.jit(
        lambda a, b, c: TR._setup(a, b, c, vp, W, H, tiles_x, tiles_y)
    )(v0, v1, v2)
    counts = np.asarray(counts)
    print(f"candidates/tile: min={counts.min()} mean={counts.mean():.0f} "
          f"p50={np.percentile(counts,50):.0f} p90={np.percentile(counts,90):.0f} "
          f"max={counts.max()} total_pairs={counts.sum()} "
          f"overflow_tiles={int(overflowed)}")

    # how many candidates are in-front (exact projection) vs full-screen
    # fallback (w<=eps crossers)
    def w_stats(v0, v1, v2):
        def tf(p):
            return p @ vp[:, :3].T + vp[:, 3]
        w = jnp.stack([tf(v0)[:, 3], tf(v1)[:, 3], tf(v2)[:, 3]], -1)
        return jnp.sum(jnp.any(w <= 1e-6, -1))
    n_cross = int(jax.jit(w_stats)(v0, v1, v2))
    print(f"near-plane crossers (full-screen binned): {n_cross}")


if __name__ == "__main__":
    main()
