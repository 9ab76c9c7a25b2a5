"""Isolate _ground_contact cost: which probe / which loop dominates."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from swift_game_engine_tpu.scene.demo_scene import DemoScene
from swift_game_engine_tpu.scene.step import _trs_matrices
from swift_game_engine_tpu.physics.collision_world import transform_soup
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
    ent_t = np.where(np.asarray(spec.has_body)[:, None], state.body_pos, state.trs_t)
    soup = jax.block_until_ready(transform_soup(
        stepper.collision, _trs_matrices(jnp.asarray(ent_t), state.trs_r, state.trs_s)))
    A = 5
    pos = state.body_pos[np.nonzero(np.asarray(spec.has_controller))[0]]
    print("agents:", pos.shape, "soup:", soup.v0.shape)

    def bench(name, fall_dist, probes, iters=48):
        @jax.jit
        def run(ps):
            def body(i, acc):
                def per_agent(p):
                    offs = jnp.array([[0., 0, 0], [0, 0, 0], [1, 0, 0],
                                      [-1, 0, 0], [0, 0, 1], [0, 0, -1]])[:probes]
                    deltas = jnp.concatenate([
                        jnp.array([[0.0, -0.8, 0.0]]),
                        jnp.array([[0.0, -fall_dist, 0.0]]),
                        jnp.tile(jnp.array([[0.0, -0.8, 0.0]]), (4, 1))])[:probes]
                    res = jax.vmap(lambda o, d: Q.capsule_cast(
                        soup, p + o, d, 1.5, 1.0, min_normal_y=0.5))(offs * 0.9, deltas)
                    return res.toi.sum() + res.iterations.sum()
                return acc + jax.vmap(per_agent)(ps + acc[:, None] * 0.0)
            return jax.lax.fori_loop(0, K, body, jnp.zeros((A,)))
        t = timeit(run, pos)
        print(f"{name:36s}: {t/K*1e3:7.2f} ms/substep")

    bench("6 probes, fall=200, iters=48", 200.0, 6)
    bench("6 probes, fall=0.8, iters=48", 0.8, 6)
    bench("2 probes (snap+fall200)", 200.0, 2)
    bench("1 probe (snap only)", 0.8, 1)
    bench("6 probes, fall=200, iters=12", 200.0, 6, iters=12)

    # how many CA iterations does the fall probe actually burn?
    @jax.jit
    def iters_used(p):
        h = Q.capsule_cast(soup, p, jnp.array([0.0, -200.0, 0.0]), 1.5, 1.0,
                           min_normal_y=0.5)
        return h.iterations, h.toi, h.hit
    for i in range(A):
        it, toi, hit = jax.block_until_ready(iters_used(pos[i]))
        print(f"agent {i}: fall-probe CA iter-sum {int(it)}, toi {float(toi):.2f}, hit {bool(hit)}")


if __name__ == "__main__":
    main()
