"""Crowd substep stage attribution at N agents (scan-fused device time).

Times, each as a K-rep fori-fused program on the bench_crowd scene:
  full    — the whole production substep
  mover   — pipeline.step only (depenetrate + slide + ground probe)
  sep     — separate_agents only (grid pairs + post slide/snap)
and derives rest = full - mover - sep.

Usage: python examples/prof_crowd_stage.py [N] [K]
"""
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "examples")

import numpy as np
import jax

if __import__("os").environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from bench_crowd import build   # examples/ on sys.path when run from repo root
from swift_game_engine_tpu.physics.separation import separate_agents


def timed(tag, fn, arg, K):
    run = jax.jit(lambda a: jax.lax.fori_loop(
        0, K, lambda i, s: fn(s, i), arg))

    out = jax.block_until_ready(run(arg))
    t0 = time.perf_counter()
    out = jax.block_until_ready(run(arg))
    dt = (time.perf_counter() - t0) / K
    print(f"{tag:8s} {dt*1e3:8.2f} ms/iter", flush=True)
    return dt


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    stepper, state = build(n)
    spec = stepper.spec
    dt = jnp.float32(1 / 60)

    # warm state: run a few substeps so agents land/settle realistically
    state = jax.jit(lambda s: jax.lax.fori_loop(
        0, 8, lambda i, st: stepper._substep_impl(st, dt), s))(state)
    jax.block_until_ready(state.body_pos)

    t_full = timed("full", lambda s, i: stepper._substep_impl(s, dt), state, K)

    # mover only: freeze the soup/ctrl inputs from the warm state
    from swift_game_engine_tpu.physics.collision_world import transform_soup
    from swift_game_engine_tpu.scene.step import _trs_matrices
    alive = state.alive
    m = {k: v & alive for k, v in stepper.m.items()}
    ent_t = jnp.where(m["has_body"][:, None], state.body_pos, state.trs_t)
    ent_r = jnp.where(m["has_body"][:, None], state.body_rot, state.trs_r)
    soup = transform_soup(stepper.collision,
                          _trs_matrices(ent_t, ent_r, state.trs_s),
                          entity_alive=alive)
    from swift_game_engine_tpu.physics.character import PlatformSet
    platforms = PlatformSet(
        aabb_min=state.body_pos, aabb_max=state.body_pos,
        delta=jnp.zeros_like(state.body_pos),
        valid=jnp.zeros(state.body_pos.shape[0], bool))
    cp = spec.controller_params._replace(
        active=spec.controller_params.active & alive)

    def mover(s, i):
        pos, vel, ctrl = stepper.pipeline.step(
            soup, s.body_pos + 0.0 * i, s.body_vel, s.ctrl, cp, platforms, dt)
        return s._replace(body_pos=pos, body_vel=vel, ctrl=ctrl)

    t_mover = timed("mover", mover, state, K)

    def sep(s, i):
        pos, vel, ctrl = separate_agents(soup, s.body_pos + 0.0 * i,
                                         s.body_vel, s.ctrl, cp)
        return s._replace(body_pos=pos, body_vel=vel, ctrl=ctrl)

    t_sep = timed("sep", sep, state, K)
    print(f"rest     {max(t_full-t_mover-t_sep,0)*1e3:8.2f} ms/iter "
          f"(N={n})", flush=True)


if __name__ == "__main__":
    main()
