"""Per-frame geometry-prep attribution: the fused engine frame pays
substeps + extract + flatten_frame (skinning, transforms, BVH refit) +
per-frame cluster builds EVERY frame, while prof_frame's fori-fused
timing loop lets XLA hoist everything derived from the constant fg —
measured 210 ms fused vs 149.5 ms render-only (round 5).

Times each prep stage scan-fused with a threaded loop index.

Usage: python examples/prof_prep.py [reps]
"""
import sys
import time

import numpy as np
import jax

sys.path.insert(0, ".")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import jax.numpy as jnp

from swift_game_engine_tpu.scene.demo_scene import DemoScene
from swift_game_engine_tpu.render.scene_geometry import flatten_frame
from swift_game_engine_tpu.render import rt as RT
from swift_game_engine_tpu.ops.cluster_shadow import build_shadow_split
from swift_game_engine_tpu.math3d import normalize


def timed(tag, fn, reps):
    @jax.jit
    def loop(seed):
        def body(i, acc):
            return acc + fn(seed + 0.0 * i, i)
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    jax.block_until_ready(loop(jnp.float32(0.0)))
    ds = []
    for r in range(2):
        t0 = time.perf_counter()
        jax.block_until_ready(loop(jnp.float32(1e-5 * (r + 1))))
        ds.append((time.perf_counter() - t0 - 0.027) / reps)
    print(f"{tag:28s} {min(ds)*1e3:8.2f} ms", flush=True)


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    scene = DemoScene().build()
    geo = scene["geometry"]
    stepper, state = scene["stepper"], scene["state"]
    lights = scene["lights"]
    cam_world = np.zeros(3, np.float32)

    timed("substep x1",
          lambda s, i: stepper._substep_impl(
              state._replace(osc_time=state.osc_time + s),
              jnp.float32(1 / 60)).body_pos.sum(), reps)

    tr0, pa0 = stepper.extract(state, 0.0, cam_world)

    timed("extract",
          lambda s, i: stepper._extract(state._replace(
              osc_time=state.osc_time + s), jnp.float32(1.0),
              jnp.zeros(3))[0].sum(), reps)

    def flat(s, i):
        fg = flatten_frame(geo, tr0 + s * 1e-9, pa0)
        return fg.bvh.bmin.sum() + fg.pos.sum()
    timed("flatten_frame (incl refit)", flat, reps)

    l0 = normalize(-jnp.asarray(lights.direction[0]))
    tr_idx = np.nonzero(np.asarray(geo.tri_translucent))[0]
    mid_t = jnp.maximum(geo.tri_material, 0)
    alpha_tri = jnp.clip(geo.materials.alpha[mid_t], 0.0, 1.0)

    def shadow_build(s, i):
        fg = flatten_frame(geo, tr0 + s * 1e-9, pa0)
        sc = build_shadow_split(fg.bvh.v0, fg.bvh.v1, fg.bvh.v2, l0,
                                geo.tri_translucent, alpha=alpha_tri,
                                trans_idx=tr_idx)
        return sc.full.rows.sum() + sc.full.meta.sum()
    timed("flatten + shadow build", shadow_build, reps)


if __name__ == "__main__":
    main()
