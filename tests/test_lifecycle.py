"""Runtime entity lifecycle: fixed-capacity alive-mask spawn/despawn
(reference: Game/World.swift:44-57 createEntity/destroyEntity)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from swift_game_engine_tpu.assets import procedural_meshes as pm
from swift_game_engine_tpu.ecs.world import (WorldBuilder, BODY_STATIC,
                                             BODY_DYNAMIC, spawn_entity,
                                             despawn_entity)
from swift_game_engine_tpu.physics.collision_world import (CollisionWorldBuilder,
                                                           transform_soup)
from swift_game_engine_tpu.physics import queries as Q
from swift_game_engine_tpu.scene.step import Stepper, _trs_matrices

pytestmark = pytest.mark.fast

DT = 1.0 / 60.0


@pytest.fixture(scope="module")
def scene():
    wb = WorldBuilder()
    cb = CollisionWorldBuilder()

    ground = wb.create_entity("ground")
    gm = pm.plane(80.0)
    wb.add(ground, "transform", translation=[0, -3, 0])
    wb.add(ground, "world_position")
    wb.add(ground, "body", body_type=BODY_STATIC, position=[0, -3, 0])
    cb.add_mesh(gm.positions, gm.indices, entity=ground)

    # a collidable box that will be despawned mid-run
    blocker = wb.create_entity("blocker")
    box = pm.box(4.0)
    wb.add(blocker, "transform", translation=[0, -1, 0])
    wb.add(blocker, "world_position")
    wb.add(blocker, "body", body_type=BODY_STATIC, position=[0, -1, 0])
    cb.add_mesh(box.positions, box.indices, entity=blocker)

    # an NPC agent that will be despawned
    npc = wb.create_entity("npc")
    wb.add(npc, "transform", translation=[10, 0, 0])
    wb.add(npc, "world_position")
    wb.add(npc, "body", body_type=BODY_DYNAMIC, position=[10, 0, 0])
    wb.add(npc, "controller", radius=1.5, half_height=1.0)
    wb.add(npc, "agent", mass_weight=1.0)

    # a dormant slot reserved for runtime spawn (never alive at build)
    dormant = wb.create_entity("spawnling", alive=False)
    wb.add(dormant, "transform", translation=[0, 0, 0])
    wb.add(dormant, "world_position")
    wb.add(dormant, "body", body_type=BODY_DYNAMIC, position=[0, 0, 0])
    wb.add(dormant, "controller", radius=1.5, half_height=1.0)
    wb.add(dormant, "agent", mass_weight=1.0)

    spec, state = wb.build()
    stepper = Stepper(spec, cb.build())
    return spec, state, stepper, dict(ground=ground, blocker=blocker,
                                      npc=npc, dormant=dormant)


def _soup_of(stepper, state):
    spec = stepper.spec
    ent_t = jnp.where(jnp.asarray(spec.has_body)[:, None], state.body_pos,
                      state.trs_t)
    tr = _trs_matrices(ent_t, state.trs_r, state.trs_s)
    return transform_soup(stepper.collision, tr, entity_alive=state.alive)


def test_despawn_stops_collision(scene):
    spec, state, stepper, e = scene
    # cast down over the blocker box: hits its top (y=1), not the ground
    hit = Q.capsule_cast(_soup_of(stepper, state), jnp.array([0.0, 6.0, 0.0]),
                         jnp.array([0.0, -20.0, 0.0]), 0.5, 0.5)
    assert bool(hit.hit) and float(hit.toi) < 5.0

    state2 = despawn_entity(state, e["blocker"])
    hit2 = Q.capsule_cast(_soup_of(stepper, state2), jnp.array([0.0, 6.0, 0.0]),
                          jnp.array([0.0, -20.0, 0.0]), 0.5, 0.5)
    # now falls through to the ground plane at y=-3
    assert bool(hit2.hit) and float(hit2.toi) > float(hit.toi) + 2.0


def test_despawned_agent_inert_and_hidden(scene):
    spec, state, stepper, e = scene
    npc = e["npc"]
    state = despawn_entity(state, npc)
    p0 = np.asarray(state.body_pos[npc])
    for _ in range(30):
        state = stepper.substep(state, DT)
    # no gravity, no mover: position frozen
    np.testing.assert_allclose(np.asarray(state.body_pos[npc]), p0, atol=1e-5)
    # extraction parks the instance with zero scale
    tf, _ = stepper.extract(state, 0.0, np.zeros(3, np.float32))
    scale = np.linalg.norm(np.asarray(tf[npc][:3, :3]), axis=0)
    np.testing.assert_allclose(scale, 0.0, atol=1e-6)


def test_spawn_into_dormant_slot(scene):
    spec, state, stepper, e = scene
    d = e["dormant"]
    # dormant from build: never simulated
    for _ in range(10):
        state = stepper.substep(state, DT)
    np.testing.assert_allclose(np.asarray(state.body_pos[d]),
                               [0, 0, 0], atol=1e-5)
    # spawn at a new position inside jit; it falls and lands on the blocker
    state = jax.jit(lambda s: spawn_entity(s, d, position=jnp.array([0.0, 6.0, 0.0])))(state)
    for _ in range(120):
        state = stepper.substep(state, DT)
    # blocker top at y=1 -> capsule center rests ~1.0 + hh + r = 3.5
    y = float(state.body_pos[d][1])
    assert y == pytest.approx(3.5, abs=0.2)
    # despawn again: slot reusable, stops simulating
    state = despawn_entity(state, d)
    y1 = float(state.body_pos[d][1])
    for _ in range(10):
        state = stepper.substep(state, DT)
    assert float(state.body_pos[d][1]) == pytest.approx(y1, abs=1e-5)
