"""Traversal-kernel probe: time ONE trace pass over primary rays on TPU.

Kernel selection comes from SGE_RT_* env vars (read at import), so run one
config per process:
  SGE_RT_INTERVAL=1 python examples/prof_trace.py 960x540
  SGE_RT_INTERVAL=0 SGE_RT_ORDERED=1 python examples/prof_trace.py 960x540

SGE_PROF_KERNEL=so times the shared-origin kernel (trace_rays_so) instead
of the general packet kernel. SGE_PROF_CAM="x,y,z[,tx,ty,tz]" overrides the
camera so kernels compare at identical views.

Prints trace time, Mrays/s, and a hit checksum (sum of t at hits + hit
count) for cross-kernel parity.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")


def main():
    wh = sys.argv[1] if len(sys.argv) > 1 else "960x540"
    W, H = map(int, wh.split("x"))
    print(f"block={os.environ.get('SGE_RT_BLOCK', '4096')} "
          f"interval={os.environ.get('SGE_RT_INTERVAL', '1')} "
          f"ordered={os.environ.get('SGE_RT_ORDERED', '1')} "
          f"leaf={os.environ.get('SGE_RT_LEAF', '12')}", flush=True)

    from swift_game_engine_tpu.scene.demo_scene import DemoScene
    from swift_game_engine_tpu.render.scene_geometry import flatten_frame
    from swift_game_engine_tpu.render.camera import (Camera, generate_rays,
                                                     tile_permutation)
    from swift_game_engine_tpu.ops import rt_kernel as K

    t0 = time.time()
    scene = DemoScene().build()
    print(f"build: {time.time()-t0:.1f}s", flush=True)
    geo = scene["geometry"]
    stepper = scene["stepper"]
    state = scene["state"]

    cam = Camera()
    cam.position = np.array([0.0, 2.0, 18.0], np.float32)
    cam_env = os.environ.get("SGE_PROF_CAM")
    if cam_env:
        vals = [float(x) for x in cam_env.split(",")]
        cam.position = np.array(vals[:3], np.float32)
        if len(vals) >= 6:
            cam.target = np.array(vals[3:6], np.float32)
    transforms, palettes = stepper.extract(state, 0.0,
                                           cam.world_position.astype(np.float32))
    t0 = time.time()
    fg = jax.jit(lambda tr, pa: flatten_frame(geo, tr, pa))(transforms, palettes)
    jax.block_until_ready(fg.pos)
    print(f"flatten+refit: {time.time()-t0:.1f}s  nodes={fg.bvh.bmin.shape[0]} "
          f"tris={geo.tri.shape[0]}", flush=True)

    ivp = jnp.asarray(cam.inv_view_proj(W, H))
    ray_o, ray_d = generate_rays(ivp, jnp.asarray(cam.position), W, H)
    perm, _ = tile_permutation(W, H)
    ray_o = ray_o[jnp.asarray(perm)]
    ray_d = ray_d[jnp.asarray(perm)]
    n = W * H
    t_max = jnp.full((n,), 3.0e38, jnp.float32)

    n_nodes = fg.bvh.bmin.shape[0]
    rows = fg.bvh.rows

    # rows passes as an ARGUMENT (a closure capture would embed an 8 MB
    # constant into the program — pathological compile on the tunnel).
    use_so = os.environ.get("SGE_PROF_KERNEL", "plain") == "so"
    cam_pos = jnp.asarray(cam.position)
    if use_so:
        so_rows = jax.jit(lambda r: K.build_origin_rows(r, cam_pos))(rows)
        jax.block_until_ready(so_rows[0])

        def fn(rws, o, d, tm):
            return K.trace_rays_so(rws, cam_pos, d, tm)
        trace_args = (so_rows, ray_o, ray_d, t_max)
    else:
        def fn(rws, o, d, tm):
            return K.trace_rays_pallas(
                K.KernelBVH(rows=rws, n_nodes=n_nodes), o, d, tm)
        trace_args = (rows, ray_o, ray_d, t_max)
    jfn = jax.jit(fn)
    t0 = time.time()
    t, tri = jax.block_until_ready(jfn(*trace_args))
    print(f"compile+first: {time.time()-t0:.1f}s", flush=True)
    hits = np.asarray(tri) >= 0
    tsum = float(np.asarray(t)[hits].sum())

    # Scan-fused timing (verify doc): K reps inside ONE jit, loop index
    # threaded into the inputs so XLA can't hoist, one dispatch subtracted.
    REPS = 8

    @jax.jit
    def multi(rws, o, d, tm):
        def body(i, acc):
            t, tri = fn(rws, o, d, tm + 0.0 * i)
            return acc + jnp.sum(jnp.where(tri >= 0, t, 0.0))
        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

    acc = jax.block_until_ready(multi(*trace_args))  # compile
    t0 = time.time()
    acc = jax.block_until_ready(multi(*trace_args))
    dt = (time.time() - t0 - 0.027) / REPS
    print(f"trace: {dt*1e3:.1f} ms  {n/dt/1e6:.2f} Mrays/s  "
          f"hits={int(hits.sum())} tsum={tsum:.3f} acc={float(acc):.1f}",
          flush=True)

    if os.environ.get("SGE_RT_COUNTS") == "1":
        # t/tri carry per-packet (interior, leaf) visit counts in every lane.
        blk = K.BLOCK
        nb = (n + blk - 1) // blk
        ints = np.asarray(t).reshape(-1)[np.arange(nb) * blk]
        leafs = np.asarray(tri).reshape(-1)[np.arange(nb) * blk]
        print(f"visits: packets={nb} interior total={int(ints.sum())} "
              f"mean={ints.mean():.0f} max={int(ints.max())} | leaf "
              f"total={int(leafs.sum())} mean={leafs.mean():.0f} "
              f"max={int(leafs.max())}", flush=True)


if __name__ == "__main__":
    main()
