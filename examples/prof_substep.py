"""Physics substep breakdown: device-time per stage, scan-fused (no
per-dispatch tunnel overhead)."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
from swift_game_engine_tpu.scene.demo_scene import DemoScene
from swift_game_engine_tpu.scene.step import _trs_matrices
from swift_game_engine_tpu.physics.collision_world import transform_soup
from swift_game_engine_tpu.physics.separation import separate_agents

K = 16


def timeit(fn, *args, n=3, warmup=1):
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
    dt = jnp.float32(1.0 / 60.0)

    def scan_of(fn):
        @jax.jit
        def run(st):
            def body(st, _):
                return fn(st), 0
            st, _ = jax.lax.scan(body, st, None, length=K)
            return st
        return run

    # full substep
    t = timeit(scan_of(lambda st: stepper._substep_impl(st, dt)), state)
    print(f"full substep        : {t/K*1e3:7.2f} ms")

    # stage isolates: rebuild the same inputs the substep makes
    ent_t = jnp.where(jnp.asarray(spec.has_body)[:, None], state.body_pos, state.trs_t)
    transforms = _trs_matrices(ent_t, state.trs_r, state.trs_s)
    soup = jax.block_until_ready(transform_soup(stepper.collision, transforms))

    from swift_game_engine_tpu.physics.character import PlatformSet
    platforms = PlatformSet(
        aabb_min=state.body_pos + jnp.asarray(spec.platform["aabb_min"]),
        aabb_max=state.body_pos + jnp.asarray(spec.platform["aabb_max"]),
        delta=jnp.zeros_like(state.body_pos),
        valid=jnp.asarray(spec.has_platform))

    def mover_only(st):
        pos, vel, ctrl = stepper.pipeline.step(
            soup, st.body_pos, st.body_vel, st.ctrl, spec.controller_params,
            platforms, dt)
        return st._replace(body_pos=pos, body_vel=vel, ctrl=ctrl)
    t = timeit(scan_of(mover_only), state)
    print(f"KinematicMoveStop   : {t/K*1e3:7.2f} ms")

    def sep_only(st):
        pos, vel, ctrl = separate_agents(soup, st.body_pos, st.body_vel,
                                         st.ctrl, spec.controller_params)
        return st._replace(body_pos=pos, body_vel=vel, ctrl=ctrl)
    t = timeit(scan_of(sep_only), state)
    print(f"AgentSeparation     : {t/K*1e3:7.2f} ms")

    def soup_only(st):
        ent_t = jnp.where(jnp.asarray(spec.has_body)[:, None], st.body_pos, st.trs_t)
        tr = _trs_matrices(ent_t, st.trs_r, st.trs_s)
        s2 = transform_soup(stepper.collision, tr)
        return st._replace(body_pos=st.body_pos + 0.0 * s2.v0[0])
    t = timeit(scan_of(soup_only), state)
    print(f"soup retransform    : {t/K*1e3:7.2f} ms")

    if stepper.pose_engine is not None:
        from swift_game_engine_tpu.anim.pose import PoseInputs, ActionState
        from swift_game_engine_tpu import math3d as m3
        ce = jnp.asarray(stepper.char_entities)

        def pose_only(st):
            fwd = m3.quat_act(st.body_rot[ce], jnp.array([0.0, 0.0, -1.0]))
            inputs = PoseInputs(forward=fwd, ground_normal=st.ctrl.ground_normal[ce],
                                grounded_near=st.ctrl.grounded_near[ce])
            loco_c = jax.tree.map(lambda x: x[ce], st.loco)
            params_c = jax.tree.map(lambda x: x[ce], spec.loco_params)
            astate_c = ActionState(time=st.action.time[ce], weight=st.action.weight[ce],
                                   active=st.action.active[ce])
            step = jax.vmap(lambda lo, pa, a, i: stepper.pose_engine.step_character(
                stepper.bank, stepper.action_profile, lo, pa, a, i, dt))
            res = step(loco_c, params_c, astate_c, inputs)
            loco = jax.tree.map(lambda full, upd: full.at[ce].set(upd), st.loco, res.loco)
            return st._replace(loco=loco,
                               palettes=st.palettes.at[stepper.character_slot[ce]].set(res.palette))
        t = timeit(scan_of(pose_only), state)
        print(f"PoseStack           : {t/K*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
