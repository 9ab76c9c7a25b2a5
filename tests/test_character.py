"""Behavioral tests for the kinematic character controller.

These assert the tuned behaviors the reference's DemoScene fixtures exercise
(Systems.swift:1402-1903): settle-on-ground, wall stop + slide, slope
stick/slide friction, flattenGround, agent-agent blocking, platform carry.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from swift_game_engine_tpu.assets import procedural_meshes as pm
from swift_game_engine_tpu.physics.collision_world import CollisionWorldBuilder, transform_soup
from swift_game_engine_tpu.physics import character as C

pytestmark = pytest.mark.fast

DT = 1.0 / 60.0
GRAVITY = jnp.array([0.0, -98.0, 0.0])


def make_soup(meshes):
    b = CollisionWorldBuilder()
    transforms = []
    for i, (mesh, tf, kw) in enumerate(meshes):
        b.add_mesh(mesh.positions, mesh.indices, entity=i, **kw)
        transforms.append(tf)
    local = b.build()
    return transform_soup(local, jnp.asarray(np.stack(transforms)))


def translate(x, y, z):
    m = np.eye(4, dtype=np.float32)
    m[:3, 3] = [x, y, z]
    return m


def rot_z(deg):
    m = np.eye(4, dtype=np.float32)
    c, s = np.cos(np.deg2rad(deg)), np.sin(np.deg2rad(deg))
    m[0, 0], m[0, 1], m[1, 0], m[1, 1] = c, -s, s, c
    return m


@pytest.fixture(scope="module")
def pipeline():
    return C.CharacterPipeline()


def run_steps(pipeline, soup, pos, vel, n_steps, params=None, platforms=None,
              apply_gravity=True):
    n = pos.shape[0]
    params = params or C.ControllerParams.default(n)
    platforms = platforms or C.PlatformSet.empty()
    state = C.ControllerState.initial(n)

    @jax.jit
    def one(pos, vel, state):
        # GravitySystem semantics: skip when grounded && groundedNear.
        if apply_gravity:
            g_skip = state.grounded & state.grounded_near
            vel = jnp.where(g_skip[:, None], vel, vel + GRAVITY * DT)
        return pipeline.step(soup, pos, vel, state, params, platforms, DT)

    for _ in range(n_steps):
        pos, vel, state = one(pos, vel, state)
    return np.asarray(pos), np.asarray(vel), state


def test_settle_on_ground(pipeline):
    soup = make_soup([(pm.plane(80.0), translate(0, 0, 0), {})])
    pos = jnp.array([[0.0, 10.0, 0.0]])
    vel = jnp.zeros((1, 3))
    p, v, st = run_steps(pipeline, soup, pos, vel, 60)
    assert bool(st.grounded[0])
    assert bool(st.grounded_near[0])
    # capsule bottom (r=1.5, hh=1.0) rests near the plane within snap skin
    assert p[0, 1] == pytest.approx(2.5, abs=0.15)
    assert abs(v[0, 1]) < 1e-3
    assert float(st.ground_normal[0, 1]) == pytest.approx(1.0, abs=1e-3)


def test_wall_stop_and_slide(pipeline):
    # Tall wall at x = 6 (box centered (8,4,0) size 4 -> faces at x=6,10).
    soup = make_soup([
        (pm.plane(80.0), translate(0, 0, 0), {}),
        (pm.box(8.0), translate(10, 4, 0), {}),
    ])
    pos = jnp.array([[0.0, 2.5, 0.0]])
    vel = jnp.array([[8.0, 0.0, 0.0]])
    p = pos
    state = C.ControllerState.initial(1)
    params = C.ControllerParams.default(1)
    step = jax.jit(lambda p, v, s: pipeline.step(soup, p, v, s, params,
                                                 C.PlatformSet.empty(), DT))
    v = vel
    for _ in range(90):
        gs = state.grounded & state.grounded_near
        v = jnp.where(gs[:, None], v, v + GRAVITY * DT)
        v = v.at[:, 0].set(8.0)  # keep pushing into the wall
        p, v, state = step(p, v, state)
    p = np.asarray(p)
    # stopped in front of the wall: capsule surface at most ~skin+eps from x=6
    assert p[0, 0] < 6.0 - 1.5 + 0.05
    assert p[0, 0] > 6.0 - 1.5 - 0.5
    # sliding: diagonal velocity should keep moving in z while blocked in x
    vz = jnp.array([[8.0, 0.0, 4.0]])
    p2, _, st2 = run_steps(pipeline, soup, jnp.asarray(p), vz, 30,
                           apply_gravity=True)
    assert p2[0, 2] > 1.0  # slid along the wall


def test_slope_stick_and_slide(pipeline):
    # 20-degree slope: below default friction angle (muS=0.8 -> ~38.7deg): stick.
    soup_shallow = make_soup([(pm.plane(80.0), rot_z(20.0), {})])
    pos = jnp.array([[0.0, 10.0, 0.0]])
    p1, v1, st1 = run_steps(pipeline, soup_shallow, pos, jnp.zeros((1, 3)), 120)
    assert bool(st1.grounded[0])
    assert np.linalg.norm(v1[0]) < 0.2  # stuck
    drift1 = abs(p1[0, 0])

    # 60-degree slope: above friction angle: slides downhill.
    soup_steep = make_soup([(pm.plane(160.0), rot_z(60.0), {})])
    p2, v2, st2 = run_steps(pipeline, soup_steep, pos, jnp.zeros((1, 3)), 120)
    speed2 = np.linalg.norm(v2[0])
    assert speed2 > 1.0  # sliding
    # rot_z(60) tilts the +y normal to (-sin60, cos60, 0): downhill is -x.
    assert v2[0, 0] < 0.0


def test_flatten_ground_normal(pipeline):
    soup = make_soup([(pm.plane(80.0), rot_z(25.0), dict(flatten=True))])
    pos = jnp.array([[0.0, 10.0, 0.0]])
    p, v, st = run_steps(pipeline, soup, pos, jnp.zeros((1, 3)), 90)
    assert bool(st.grounded[0])
    np.testing.assert_allclose(np.asarray(st.ground_normal[0]), [0, 1, 0], atol=1e-5)


def test_agent_agent_blocking(pipeline):
    soup = make_soup([(pm.plane(80.0), translate(0, 0, 0), {})])
    pos = jnp.array([[-4.0, 2.5, 0.0], [4.0, 2.5, 0.0]])
    params = C.ControllerParams.default(2)
    state = C.ControllerState.initial(2)
    step = jax.jit(lambda p, v, s: pipeline.step(soup, p, v, s, params,
                                                 C.PlatformSet.empty(), DT))
    p = pos
    for _ in range(90):
        v = jnp.array([[6.0, 0.0, 0.0], [-6.0, 0.0, 0.0]])
        p, v, state = step(p, v, state)
    p = np.asarray(p)
    gap = p[1, 0] - p[0, 0]
    # capsule radii 1.5 + 1.5 -> centers can't pass closer than ~3
    assert gap >= 2.9, gap


def test_platform_carry(pipeline):
    soup = make_soup([(pm.plane(80.0), translate(0, 0, 0), {})])
    pos = jnp.array([[0.0, 2.5, 0.0]])
    # Platform top at y=0..0.2 under the agent, moving +x by 0.05/step.
    platforms = C.PlatformSet(
        aabb_min=jnp.array([[-3.0, -0.5, -3.0]]),
        aabb_max=jnp.array([[3.0, 0.05, 3.0]]),
        delta=jnp.array([[0.05, 0.0, 0.0]]),
        valid=jnp.array([True]))
    p, v, st = run_steps(pipeline, soup, pos, jnp.zeros((1, 3)), 30,
                         platforms=platforms)
    assert p[0, 0] == pytest.approx(30 * 0.05, abs=0.2)
