"""Candidate-pair statistics (CPU): how many (packet, cluster) pairs does
the shadow kernel face, and how many (tile, cluster) pairs the rasterizer,
for a demo frame at the prof camera. Decides batching vs binning levers.

Usage: JAX_PLATFORMS=cpu python examples/prof_pairs.py [WxH]
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("SGE_JAX_TRAVERSAL", "1")

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
jax.config.update("jax_platforms", "cpu")

from swift_game_engine_tpu.scene.demo_scene import DemoScene
from swift_game_engine_tpu.render.scene_geometry import flatten_frame
from swift_game_engine_tpu.render.camera import (Camera, generate_rays,
                                                 tile_permutation)
from swift_game_engine_tpu.math3d import normalize


def stats(name, counts, unit_tris):
    c = np.asarray(counts)
    print(f"{name}: n={len(c)} cand-clusters min/med/mean/max = "
          f"{c.min()}/{int(np.median(c))}/{c.mean():.1f}/{c.max()}  "
          f"total pairs = {int(c.sum()) * unit_tris / 1e6:.2f}M tris")


def main():
    wh = sys.argv[1] if len(sys.argv) > 1 else "960x540"
    W, H = map(int, wh.split("x"))
    scene = DemoScene().build()
    geo = scene["geometry"]
    stepper, state = scene["stepper"], scene["state"]
    lights = scene["lights"]
    cam = Camera()
    cam.position = np.array([0.0, 4.0, 14.0], np.float32)
    cam.target = np.array([0.0, 0.0, 0.0], np.float32)
    transforms, palettes = stepper.extract(state, 0.0, np.zeros(3, np.float32))
    fg = jax.jit(lambda tr, pa: flatten_frame(geo, tr, pa))(transforms,
                                                            palettes)
    v0, v1, v2 = fg.bvh.v0, fg.bvh.v1, fg.bvh.v2
    print(f"tris={v0.shape[0]} translucent={int(np.asarray(geo.tri_translucent).sum())}")

    # raster tiles
    from swift_game_engine_tpu.render.tile_raster import (_setup_clusters,
                                                          _tile_cluster_lists,
                                                          TILE_W)
    vp = jnp.asarray(cam.view_proj(W, H))
    for cl, th in ((128, 32), (64, 16), (32, 16)):
        rows, meta, n_cl = _setup_clusters(v0, v1, v2, vp, W, H, cluster=cl)
        tiles_x = -(-W // TILE_W)
        tiles_y = -(-H // th)
        tl = _tile_cluster_lists(meta, tiles_x, tiles_y, th)
        stats(f"raster cl={cl} th={th}", tl[:, 0], cl)

    # shadow packets: origins = layer-1 hit points (pure-JAX traversal on CPU
    # is slow; approximate origins by rasterizer L1 hits instead)
    from swift_game_engine_tpu.render.tile_raster import rasterize_clusters
    hits = rasterize_clusters(v0, v1, v2, vp, jnp.asarray(cam.position),
                              W, H, layers=1, interpret=True)[0]
    ray_o, ray_d = generate_rays(jnp.asarray(cam.inv_view_proj(W, H)),
                                 jnp.asarray(cam.position), W, H)
    perm, _ = tile_permutation(W, H)
    perm = jnp.asarray(perm)
    t = hits.t[perm]
    found = hits.found[perm]
    o_sh = jnp.where(found[:, None], ray_o[perm] + ray_d[perm] * t[:, None],
                     1.0e9)
    t_lim = jnp.where(found, 1e6, 0.0)

    from swift_game_engine_tpu.ops.cluster_shadow import (
        build_shadow_clusters, _packet_cluster_lists)
    from swift_game_engine_tpu.ops.rt_kernel import BLOCK
    l0 = normalize(-lights.direction[0])
    from swift_game_engine_tpu.render.rt import (_light_morton_order,
                                                 _morton_spread16)
    e1b = np.cross(np.asarray(l0), [1.0, 0.0, 0.0])
    e1b /= np.linalg.norm(e1b)
    e2b = np.cross(np.asarray(l0), e1b)
    cen = (np.asarray(v0) + np.asarray(v1) + np.asarray(v2)) / 3.0
    ca, cb = cen @ e1b, cen @ e2b
    def q16(v):
        return jnp.asarray(np.clip((v - v.min()) / max(float(np.ptp(v)), 1e-6)
                                   * 65535, 0, 65535).astype(np.uint32))
    tkey = (_morton_spread16(q16(cb)) << 1) | _morton_spread16(q16(ca))
    torder = np.argsort(np.asarray(tkey))
    import swift_game_engine_tpu.ops.cluster_shadow as CS
    for blk in (4096, 1024, 512):
      CS.BLOCK = blk
      for cl in (128, 64, 32):
        for tsort in (False,):
          tv0, tv1, tv2, ttr = (v0, v1, v2, geo.tri_translucent)
          sc = build_shadow_clusters(tv0, tv1, tv2, l0, ttr, cluster=cl)
          for sort in (False, True):
            o_s, tl_s = o_sh, t_lim
            if sort:
                order = _light_morton_order(sc.basis, o_sh, t_lim)
                o_s, tl_s = o_sh[order], t_lim[order]
            n = o_s.shape[0]
            nb = -(-n // blk)
            pad = nb * blk - n
            o_p = jnp.concatenate([o_s, jnp.full((pad, 3), 1e9)]) if pad else o_s
            tl_p = jnp.concatenate([tl_s, jnp.zeros(pad)]) if pad else tl_s
            lists = _packet_cluster_lists(sc, o_p, tl_p, nb)
            c = np.asarray(lists[:, 0])
            print(f"shadow blk={blk} cl={cl} sort={int(sort)}: "
                  f"iters/packet mean={c.mean():.1f} max={c.max()}  "
                  f"work = {c.sum() * cl * blk / 1e9:.2f}G lane-tests")


if __name__ == "__main__":
    main()
