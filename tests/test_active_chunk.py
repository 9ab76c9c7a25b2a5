"""ActiveChunk culling + PhysicsLocalize float rebase
(reference: Game/Systems.swift:2310-2411)."""

import numpy as np
import jax.numpy as jnp
import pytest

from swift_game_engine_tpu.assets import procedural_meshes as pm
from swift_game_engine_tpu.ecs.world import (WorldBuilder, BODY_STATIC,
                                             BODY_DYNAMIC, CHUNK_SIZE,
                                             chunk_local_to_world)
from swift_game_engine_tpu.physics.collision_world import CollisionWorldBuilder
from swift_game_engine_tpu.scene.step import Stepper

DT = 1.0 / 60.0


@pytest.fixture(scope="module")
def world():
    wb = WorldBuilder()
    cb = CollisionWorldBuilder()

    # ground big enough to walk across a chunk boundary (at x = 256)
    ground = wb.create_entity("ground")
    gm = pm.plane(1600.0)
    wb.add(ground, "transform", translation=[0, -3, 0])
    wb.add(ground, "world_position")
    wb.add(ground, "body", body_type=BODY_STATIC, position=[0, -3, 0])
    cb.add_mesh(gm.positions, gm.indices, entity=ground, mu_s=0.9, mu_k=0.8)

    player = wb.create_entity("player")
    start = [240.0, -0.5, 0.0]   # just before the chunk boundary
    wb.add(player, "transform", translation=start)
    wb.add(player, "world_position")
    wb.add(player, "player")
    wb.add(player, "body", body_type=BODY_DYNAMIC, position=start)
    wb.add(player, "intent")
    wb.add(player, "movement")
    wb.add(player, "controller", radius=1.5, half_height=1.0)
    wb.add(player, "agent", mass_weight=3.0)

    # an NPC far outside the active radius (chunk Chebyshev distance 4)
    far = wb.create_entity("far_npc")
    far_pos = [4 * CHUNK_SIZE, 10.0, 0.0]
    wb.add(far, "transform", translation=far_pos)
    wb.add(far, "world_position")
    wb.add(far, "body", body_type=BODY_DYNAMIC, position=far_pos)
    wb.add(far, "controller", radius=1.5, half_height=1.0)
    wb.add(far, "agent", mass_weight=1.0)

    spec, state = wb.build()
    stepper = Stepper(spec, cb.build())
    return spec, state, stepper, player, far


def test_chunk_crossing_continuity(world):
    spec, state, stepper, player, far = world
    # walk +x across the boundary; the mover runs in active-origin space
    ys, vys = [], []
    crossed = False
    for i in range(420):
        state = state._replace(
            intent_vel=state.intent_vel.at[player].set(jnp.array([8.0, 0.0, 0.0])))
        state = stepper.substep(state, DT)
        w = chunk_local_to_world(state.wp_chunk, state.wp_local)[player]
        ys.append(float(w[1]))
        vys.append(float(state.body_vel[player][1]))
        if int(state.wp_chunk[player][0]) == 1:
            crossed = True
    assert crossed, "player never crossed the chunk boundary"
    # after crossing, physics runs relative to chunk (1,0,0): local x < 256
    assert abs(float(state.body_pos[player][0])) <= CHUNK_SIZE / 2 + 1.0
    # height stays continuous on flat ground through the crossing
    ys = np.asarray(ys[30:])
    assert ys.max() - ys.min() < 0.05
    assert np.abs(np.asarray(vys[30:])).max() < 1.0


def test_far_entity_deactivated(world):
    spec, state, stepper, player, far = world
    p0 = np.asarray(state.body_pos[far])
    for _ in range(30):
        state = stepper.substep(state, DT)
    # outside radius 2: no gravity, no mover — frozen mid-air
    np.testing.assert_allclose(np.asarray(state.body_pos[far]), p0, atol=1e-5)
    # player (active) falls/stays grounded normally
    assert bool(state.ctrl.grounded[player])


def test_radius_reactivation(world):
    spec, state, stepper, player, far = world
    # teleport the player near the far NPC: it re-enters the active set
    new_p = jnp.array([4 * CHUNK_SIZE - 30.0, -0.5, 0.0])
    chunk = jnp.asarray(np.array([4, 0, 0], np.int32) * 0 + np.array(
        np.floor((np.asarray(new_p) + CHUNK_SIZE / 2) / CHUNK_SIZE), np.int32))
    local = new_p - chunk.astype(jnp.float32) * CHUNK_SIZE
    state = state._replace(
        body_pos=state.body_pos.at[player].set(new_p),
        wp_chunk=state.wp_chunk.at[player].set(chunk),
        wp_local=state.wp_local.at[player].set(local))
    y0 = float(state.body_pos[far][1])
    for _ in range(60):
        state = stepper.substep(state, DT)
    w_far = chunk_local_to_world(state.wp_chunk, state.wp_local)[far]
    assert float(w_far[1]) < y0 - 1.0  # falling again under gravity
