"""Profile the physics substep on the current backend (TPU by default).

Usage: python examples/prof_physics.py [n_substeps_per_dispatch]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from swift_game_engine_tpu.scene.demo_scene import DemoScene


def timeit(fn, *args, n=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
        jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n, out


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    scene = DemoScene().build()
    stepper = scene["stepper"]
    state = scene["state"]
    soupT = scene["collision"].p0.shape[0]
    n_agents = int(np.sum(scene["spec"].has_controller))
    print(f"soup triangles: {soupT}, agents: {n_agents}, "
          f"entities: {scene['spec'].n_entities}")

    dt = jnp.float32(1.0 / 60.0)

    @jax.jit
    def multi(state):
        def body(i, s):
            return stepper._substep_impl(s, dt)
        return jax.lax.fori_loop(0, k, body, state)

    t, out = timeit(multi, state, n=5)
    print(f"{k} substeps: {t*1e3:.1f} ms -> {t/k*1e3:.2f} ms/substep "
          f"({k/t:.1f} substeps/s)")

    # Component breakdown: run the sub-stages standalone.
    from swift_game_engine_tpu.physics.collision_world import transform_soup
    from swift_game_engine_tpu.physics.character import PlatformSet
    from swift_game_engine_tpu.physics import queries as Q

    spec = stepper.spec
    import swift_game_engine_tpu.math3d as m3
    from swift_game_engine_tpu.scene.step import _trs_matrices

    @jax.jit
    def mk_soup(state):
        ent_t = jnp.where(stepper.m["has_body"][:, None], state.body_pos, state.trs_t)
        ent_r = jnp.where(stepper.m["has_body"][:, None], state.body_rot, state.trs_r)
        transforms = _trs_matrices(ent_t, ent_r, state.trs_s)
        return transform_soup(stepper.collision, transforms)

    soup = jax.block_until_ready(mk_soup(state))
    t, _ = timeit(mk_soup, state, n=20)
    print(f"soup retransform: {t*1e3:.2f} ms")

    platforms = PlatformSet(
        aabb_min=state.body_pos + jnp.asarray(spec.platform["aabb_min"]),
        aabb_max=state.body_pos + jnp.asarray(spec.platform["aabb_max"]),
        delta=jnp.zeros_like(state.body_pos),
        valid=jnp.asarray(spec.has_platform))

    @jax.jit
    def mover(state, soup):
        def body(i, c):
            pos, vel, ctrl = c
            return stepper.pipeline.step(soup, pos, vel, ctrl,
                                         spec.controller_params, platforms, dt)
        return jax.lax.fori_loop(0, k, body,
                                 (state.body_pos, state.body_vel, state.ctrl))

    t, _ = timeit(mover, state, soup, n=5)
    print(f"mover (KinematicMoveStop) x{k}: {t*1e3:.1f} ms -> {t/k*1e3:.2f} ms/substep")

    # individual queries
    n = state.body_pos.shape[0]
    pos1 = state.body_pos[4]

    @jax.jit
    def one_cast(soup, p):
        return Q.capsule_cast(soup, p, jnp.array([0.2, -0.3, 0.1]), 1.5, 1.0)

    t, hit = timeit(one_cast, soup, pos1, n=20)
    print(f"single capsule_cast: {t*1e3:.2f} ms (iters {int(hit.iterations)})")

    @jax.jit
    def vm_cast(soup, ps):
        return jax.vmap(lambda p: Q.capsule_cast(
            soup, p, jnp.array([0.2, -0.3, 0.1]), 1.5, 1.0))(ps)

    t, hits = timeit(vm_cast, soup, state.body_pos, n=20)
    print(f"vmapped capsule_cast x{n}: {t*1e3:.2f} ms")

    @jax.jit
    def vm_overlap(soup, ps):
        return jax.vmap(lambda p: Q.capsule_overlap_all(soup, p, 1.5, 1.0))(ps)

    t, _ = timeit(vm_overlap, soup, state.body_pos, n=20)
    print(f"vmapped capsule_overlap x{n}: {t*1e3:.2f} ms")

    # pose engine
    if stepper.pose_engine is not None:
        @jax.jit
        def pose_only(state):
            def body(i, s):
                # isolate: run the substep with physics outputs frozen? just
                # time the full substep minus mover via difference instead.
                return s
            return state
        pass


if __name__ == "__main__":
    main()
