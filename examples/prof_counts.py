"""Count continuation-shading record volumes for the hybrid frame: how
many L2/L3 records are chain-open (shaded), how many are unlit-simple,
how many lanes tap textures / need normal maps / bounce. Decides chunk
caps and split strategy with facts instead of guesses."""
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from swift_game_engine_tpu.scene.demo_scene import DemoScene
from swift_game_engine_tpu.render import rt as RT
from swift_game_engine_tpu.render.scene_geometry import (flatten_frame,
                                                         texture_usage)
from swift_game_engine_tpu.render.camera import (Camera, generate_rays_tiled)
from swift_game_engine_tpu.render.ibl import IBL


def main():
    W, H = 960, 540
    scene = DemoScene().build()
    geo = scene["geometry"]
    stepper, state = scene["stepper"], scene["state"]
    transforms, palettes = stepper.extract(state, 0.0, np.zeros(3, np.float32))
    fg = jax.jit(lambda tr, pa: flatten_frame(geo, tr, pa))(transforms,
                                                            palettes)
    jax.block_until_ready(fg.pos)
    cam = Camera()
    cam.position = np.array([0.0, 4.0, 14.0], np.float32)
    cam.target = np.array([0.0, 0.0, 0.0], np.float32)
    ivp = jnp.asarray(cam.inv_view_proj(W, H))
    vp = jnp.asarray(cam.view_proj(W, H))
    cpos = jnp.asarray(cam.position)

    from swift_game_engine_tpu.render.tile_raster import rasterize_clusters
    tr_flag = np.asarray(geo.tri_translucent)
    opq_idx = np.nonzero(~tr_flag)[0]
    tr_idx = np.nonzero(tr_flag)[0]
    print(f"tris: opaque={len(opq_idx)} translucent={len(tr_idx)}")

    oi = jnp.asarray(opq_idx, jnp.int32)
    ti = jnp.asarray(tr_idx, jnp.int32)

    @jax.jit
    def recs_fn():
        h_o = rasterize_clusters(fg.bvh.v0[oi], fg.bvh.v1[oi], fg.bvh.v2[oi],
                                 vp, cpos, W, H, layers=1,
                                 opaque=jnp.ones(len(opq_idx), bool),
                                 flat_tiles=True)[0]
        h_ts = rasterize_clusters(fg.bvh.v0[ti], fg.bvh.v1[ti], fg.bvh.v2[ti],
                                  vp, cpos, W, H, layers=3, cluster=64,
                                  flat_tiles=True)
        return ((h_o.t, jnp.where(h_o.found, oi[jnp.maximum(h_o.tri, 0)], -1),
                 h_o.found),
                [(h.t, jnp.where(h.found, ti[jnp.maximum(h.tri, 0)], -1),
                  h.found) for h in h_ts])

    (t_o, tri_o, f_o), trs = jax.block_until_ready(recs_fn())
    t_o = np.asarray(t_o); tri_o = np.asarray(tri_o); f_o = np.asarray(f_o)
    BIG = 3.0e38
    t_opq = np.where(f_o, t_o, BIG)
    p = t_o.shape[0]
    print(f"lanes={p} opaque_found={f_o.sum()}")
    from swift_game_engine_tpu.render.shading import shadow_bias
    alpha = np.asarray(geo.materials.alpha)
    mid_of = np.asarray(geo.tri_material)
    unlit = np.asarray(geo.materials.unlit)

    floor = np.zeros(p, np.float32)
    accum_alpha = np.zeros(p, np.float32)
    live = None
    for layer in range(3):
        tn = np.full(p, BIG, np.float32)
        idn = np.full(p, -1, np.int64)
        for k in reversed(range(3)):
            tk, trik, fk = [np.asarray(x) for x in trs[k]]
            ok = fk & (tk > floor) & (tk < t_opq)
            tn = np.where(ok, tk, tn)
            idn = np.where(ok, trik, idn)
        use_opq = f_o & (t_opq > floor) & (tn >= BIG)
        t_l = np.where(use_opq, t_opq, tn)
        tri_l = np.where(use_opq, tri_o, idn)
        found_l = use_opq | (tn < BIG)
        mids = mid_of[np.maximum(tri_l, 0)]
        a_l = np.where(found_l, alpha[np.maximum(mids, 0)], 0.0)
        un_l = unlit[np.maximum(mids, 0)] & found_l
        if layer == 0:
            live = found_l.copy()
            contrib = np.where(found_l, a_l, 0.0)
            accum_alpha = contrib
            print(f"L1: found={found_l.sum()} unlit={un_l.sum()} "
                  f"alpha<0.99={(found_l & (a_l < 0.99)).sum()}")
        else:
            open_ = live & (accum_alpha < 0.99)
            shaded = found_l & open_
            print(f"L{layer+1}: found={found_l.sum()} chain_open={open_.sum()} "
                  f"shaded={shaded.sum()} of which unlit={(un_l & open_).sum()}")
            live = live & found_l & (accum_alpha < 0.99)
            contrib = np.where(live, a_l * (1 - accum_alpha), 0.0)
            accum_alpha = accum_alpha + contrib
        # bias floor
        bias = np.asarray(shadow_bias(jnp.asarray(t_l)))
        floor = np.where(found_l, t_l + 2 * bias, floor)

    # L1 texture-tap / normal-map / mirror gates
    us = texture_usage(geo)
    base_tex = np.asarray(geo.materials.base_tex)
    normal_tex = np.asarray(geo.materials.normal_tex)
    rough = np.asarray(geo.materials.roughness)
    metal = np.asarray(geo.materials.metallic)
    trans = np.asarray(geo.materials.transmission)
    m1 = mid_of[np.maximum(np.where(f_o, tri_o, 0), 0)]
    print(f"L1 taps: base={(f_o & (base_tex[m1] >= 0)).sum()} "
          f"normal={(f_o & (normal_tex[m1] >= 0)).sum()}")
    mir = f_o & (np.clip(rough[m1], 0.05, 1) <= 0.08) & \
        (np.clip(metal[m1], 0, 1) >= 0.8)
    print(f"L1 mirror lanes={mir.sum()} refr lanes={(f_o & (trans[m1] > 0.001)).sum()}")
    print(f"usage: {us}")


if __name__ == "__main__":
    main()
