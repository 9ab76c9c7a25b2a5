"""Integration: world builder + stepper on a minimal scene (CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from swift_game_engine_tpu.assets import procedural_meshes as pm
from swift_game_engine_tpu.ecs.world import (WorldBuilder, BODY_STATIC,
                                             BODY_DYNAMIC, BODY_KINEMATIC)
from swift_game_engine_tpu.physics.collision_world import CollisionWorldBuilder
from swift_game_engine_tpu.scene.step import Stepper

pytestmark = pytest.mark.fast

DT = 1.0 / 60.0


@pytest.fixture(scope="module")
def tiny():
    wb = WorldBuilder()
    cb = CollisionWorldBuilder()

    ground = wb.create_entity("ground")
    gm = pm.plane(80.0)
    wb.add(ground, "transform", translation=[0, -3, 0])
    wb.add(ground, "world_position")
    wb.add(ground, "body", body_type=BODY_STATIC, position=[0, -3, 0])
    cb.add_mesh(gm.positions, gm.indices, entity=ground, mu_s=0.9, mu_k=0.8)

    player = wb.create_entity("player")
    start = [0.0, 2.0, 0.0]
    wb.add(player, "transform", translation=start)
    wb.add(player, "world_position")
    wb.add(player, "player")
    wb.add(player, "body", body_type=BODY_DYNAMIC, position=start)
    wb.add(player, "intent")
    wb.add(player, "movement")
    wb.add(player, "controller", radius=1.5, half_height=1.0)
    wb.add(player, "agent", mass_weight=3.0)

    plat = wb.create_entity("platform")
    box = pm.box(4.0)
    wb.add(plat, "transform", translation=[16, -1, 0], scale=[1.5, 0.2, 1.5])
    wb.add(plat, "world_position")
    wb.add(plat, "body", body_type=BODY_KINEMATIC, position=[16, -1, 0])
    aabb = box.positions * np.array([1.5, 0.2, 1.5], np.float32)
    wb.add(plat, "platform", origin=[16, -1, 0], axis=[0, 1, 0], amplitude=2.0,
           speed=1.1, aabb_min=aabb.min(0), aabb_max=aabb.max(0))
    cb.add_mesh(box.positions, box.indices, entity=plat, mu_s=0.9, mu_k=0.7)

    spec, state = wb.build()
    stepper = Stepper(spec, cb.build())
    return spec, state, stepper, player, plat


def test_player_falls_and_lands(tiny):
    spec, state, stepper, player, plat = tiny
    for _ in range(90):
        state = stepper.substep(state, DT)
    # rests on ground: capsule bottom at -3 => center -0.5
    assert float(state.body_pos[player][1]) == pytest.approx(-0.5, abs=0.15)
    assert bool(state.ctrl.grounded[player])
    # transform written back + world position synced
    assert float(state.trs_t[player][1]) == pytest.approx(
        float(state.body_pos[player][1]), abs=1e-5)
    np.testing.assert_allclose(np.asarray(state.wp_local[player]),
                               np.asarray(state.body_pos[player]), atol=1e-3)


def test_intent_moves_player(tiny):
    spec, state, stepper, player, plat = tiny
    for _ in range(60):
        state = stepper.substep(state, DT)
    state = state._replace(
        intent_vel=state.intent_vel.at[player].set(jnp.array([4.5, 0.0, 0.0])),
        intent_has_yaw=state.intent_has_yaw.at[player].set(True),
        intent_yaw=state.intent_yaw.at[player].set(jnp.float32(np.pi / 2)))
    for _ in range(60):
        state = stepper.substep(state, DT)
    assert float(state.body_pos[player][0]) > 3.0   # moved +x
    assert bool(state.ctrl.grounded[player])        # stayed on ground
    # facing yaw applied to body rotation (quat about +y)
    q = np.asarray(state.body_rot[player])
    assert abs(q[1]) > 0.6  # sin(pi/4) component


def test_platform_oscillates(tiny):
    spec, state, stepper, player, plat = tiny
    y0 = float(state.body_pos[plat][1])
    ys = []
    for _ in range(120):
        state = stepper.substep(state, DT)
        ys.append(float(state.body_pos[plat][1]))
    ys = np.asarray(ys)
    assert ys.max() > y0 + 1.0 and ys.min() < y0 + 1.9  # sinusoid around origin
    # prev latched for interpolation
    assert float(state.body_prev_pos[plat][1]) != float(state.body_pos[plat][1])


def test_jump(tiny):
    spec, state, stepper, player, plat = tiny
    for _ in range(90):
        state = stepper.substep(state, DT)
    assert bool(state.ctrl.grounded[player])
    state = state._replace(intent_jump=state.intent_jump.at[player].set(True))
    state = stepper.substep(state, DT)
    assert float(state.body_vel[player][1]) > 20.0  # jumpSpeed 34 minus a step
    for _ in range(10):
        state = stepper.substep(state, DT)
    assert float(state.body_pos[player][1]) > 0.0   # airborne


def test_checkpoint_roundtrip(tiny, tmp_path):
    """save_world_state/load_world_state restore an exact, deterministic sim."""
    from swift_game_engine_tpu.scene.engine import (save_world_state,
                                                    load_world_state)
    spec, state, stepper, player, plat = tiny
    for _ in range(30):
        state = stepper.substep(state, DT)
    p = str(tmp_path / "ckpt.npz")
    save_world_state(p, state, time=0.5)

    cont = state
    for _ in range(30):
        cont = stepper.substep(cont, DT)

    restored, data = load_world_state(p, state)
    assert float(data["time"]) == 0.5
    for _ in range(30):
        restored = stepper.substep(restored, DT)

    # bit-identical continuation: same jitted program, same inputs
    a = jax.tree.flatten(cont)[0]
    b = jax.tree.flatten(restored)[0]
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_collision_stats_threaded(tiny):
    """Per-substep CollisionQueryStats analog: counters reset per refresh
    (reference: CollisionQuery.swift:280-318, Systems.swift:176)."""
    spec, state, stepper, player, plat = tiny
    s1 = stepper.substep(state, DT)
    casts = int(s1.ctrl.query_casts[player])
    cands = int(s1.ctrl.query_candidates[player])
    # at least: 6 ground probes + 1 slide cast + 1 depen overlap
    assert casts >= 8, casts
    assert cands > 0
    # reset per substep, not accumulated across substeps
    s2 = stepper.substep(s1, DT)
    assert int(s2.ctrl.query_casts[player]) < 2 * casts + 8
