"""Bisect the character-mover substep cost by stage on the TPU."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from swift_game_engine_tpu.scene.demo_scene import DemoScene
from swift_game_engine_tpu.scene.step import _trs_matrices
from swift_game_engine_tpu.physics.collision_world import transform_soup
from swift_game_engine_tpu.physics.character import (CharacterPipeline,
                                                     PlatformSet)
from swift_game_engine_tpu.physics import queries as Q

K = 16


def timeit(fn, *args, n=5, warmup=2):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / n


def main():
    scene = DemoScene().build()
    stepper = scene["stepper"]
    spec = stepper.spec
    state = scene["state"]
    dt = jnp.float32(1 / 60)

    ent_t = np.where(np.asarray(spec.has_body)[:, None], state.body_pos, state.trs_t)
    transforms = _trs_matrices(jnp.asarray(ent_t), state.trs_r, state.trs_s)
    soup = jax.block_until_ready(transform_soup(stepper.collision, transforms))
    platforms = PlatformSet(
        aabb_min=state.body_pos + jnp.asarray(spec.platform["aabb_min"]),
        aabb_max=state.body_pos + jnp.asarray(spec.platform["aabb_max"]),
        delta=jnp.zeros_like(state.body_pos),
        valid=jnp.asarray(spec.has_platform))

    def bench(name, slide_iters, depen_iters, note=""):
        pipe = CharacterPipeline(gravity=spec.gravity,
                                 max_slide_iterations=slide_iters,
                                 depen_iterations=depen_iters)

        @jax.jit
        def run(pos, vel, ctrl):
            def body(i, c):
                p, v, s = c
                return pipe.step(soup, p, v, s, spec.controller_params,
                                 platforms, dt)
            return jax.lax.fori_loop(0, K, body, (pos, vel, ctrl))

        t = timeit(run, state.body_pos, state.body_vel, state.ctrl)
        print(f"{name:28s}: {t/K*1e3:7.2f} ms/substep {note}")
        return t / K

    full = bench("full (slide4, depen4)", 4, 4)
    bench("slide1, depen4", 1, 4)
    bench("slide4, depen1", 4, 1)
    bench("slide0? (1) depen0? (1)", 1, 1)

    # ground contact only: hack — monkeypatch to skip stages
    import swift_game_engine_tpu.physics.character as C

    orig_ground = C._ground_contact
    orig_depen = C._depenetrate

    def no_ground(soup, position, velocity, params_i, *a, **k):
        return dict(position=position, velocity=velocity,
                    grounded=jnp.asarray(False), grounded_near=jnp.asarray(False),
                    normal=jnp.array([0.0, 1.0, 0.0]), tri=jnp.int32(-1),
                    distance=jnp.float32(0.0), sliding=jnp.asarray(False),
                    transition_frames=jnp.int32(0),
                    mu_s=jnp.float32(0.0), mu_k=jnp.float32(0.0))

    def no_depen(soup, position, velocity, params_i, state_i, iterations=4):
        return (position, velocity, state_i["m_tri"], state_i["m_normal"],
                state_i["m_frames"], state_i["side_normal"],
                state_i["side_frames"], jnp.zeros(3), jnp.asarray(False))

    C._ground_contact = no_ground
    bench("no ground contact", 4, 4)
    C._depenetrate = no_depen
    bench("no ground, no depen", 4, 4)
    C._ground_contact = orig_ground
    bench("no depen", 4, 4)
    C._depenetrate = orig_depen

    # queries-only lower bound: 1 blocking cast + 1 sixprobe cast + 1 overlap
    @jax.jit
    def qlb(pos):
        def body(i, acc):
            def per_agent(p):
                h1 = Q.capsule_cast(soup, p, jnp.array([0.1, -0.2, 0.1]) * (i + 1.0),
                                    1.5, 1.0, blocking=True)
                offs = jnp.array([[0., 0, 0], [0, 0, 0], [1, 0, 0], [-1, 0, 0],
                                  [0, 0, 1], [0, 0, -1]])
                probes = jax.vmap(lambda o: Q.capsule_cast(
                    soup, p + o, jnp.array([0.0, -0.8, 0.0]), 1.5, 1.0,
                    min_normal_y=0.5))(offs)
                ov = Q.capsule_overlap_all(soup, p, 1.5, 1.0)
                return h1.toi + probes.toi.sum() + ov.depth.sum()
            return acc + jax.vmap(per_agent)(pos)
        return jax.lax.fori_loop(0, K, body, jnp.zeros(pos.shape[0]))

    t = timeit(qlb, state.body_pos)
    print(f"{'query lower bound (1+6 cast+ov)':28s}: {t/K*1e3:7.2f} ms/substep")


if __name__ == "__main__":
    main()
