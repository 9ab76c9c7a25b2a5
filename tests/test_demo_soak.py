"""DemoScene physics soak: the reference's manual-QA fixtures, asserted.

The reference 'tests' its physics by eyeballing DemoScene (SURVEY §4) —
separation NPC trio, oscillating kinematic capsule, platforms, the player
controller. Here the same scene runs headless for 3 simulated seconds and
the expected behaviors are asserted (reference: Game/DemoScene.swift:379-552).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from swift_game_engine_tpu.scene.demo_scene import DemoScene

DT = 1.0 / 60.0


@pytest.fixture(scope="module")
def demo():
    scene = DemoScene(include_imported_assets=False).build()
    return scene


def _names(spec):
    return list(spec.names)


def test_demo_soak(demo):
    scene = demo
    st = scene["stepper"]
    state = scene["state"]
    spec = scene["spec"]
    player = scene["player"]
    names = _names(spec)

    # forward walk intent for the player the whole time
    state = state._replace(
        intent_vel=state.intent_vel.at[player].set(jnp.array([0.0, 0.0, -4.5])))

    y_platform = []
    x_osc = []
    plat = names.index("elevator")
    osc = names.index("osc_npc")
    for i in range(180):
        state = st.substep(state, DT)
        if i % 10 == 0:
            y_platform.append(float(state.body_pos[plat][1]))
            x_osc.append(float(state.body_pos[osc][0]))

    flat = jax.tree.flatten(state)[0]
    for leaf in flat:
        assert np.isfinite(np.asarray(leaf, dtype=np.float64)).all() \
            if np.asarray(leaf).dtype.kind == "f" else True

    # player: landed on the ground and walked forward (-z)
    p = np.asarray(state.body_pos[player])
    assert bool(state.ctrl.grounded[player])
    assert p[2] < -2.0
    assert abs(p[1] - (-3.0 + 0.5 * 5.0)) < 3.0  # plausible capsule height band

    # elevator oscillated vertically; NPC oscillator moved in x
    assert max(y_platform) - min(y_platform) > 1.0
    assert max(x_osc) - min(x_osc) > 0.5

    # separation trio: no two agents interpenetrate in XZ
    radius = np.asarray(spec.controller_params.radius)
    pos = np.asarray(state.body_pos)
    dyn = np.asarray(spec.body_type) == 2  # BODY_DYNAMIC
    solid = np.asarray(spec.controller_params.agent_solid) & dyn
    idx = np.where(solid)[0]
    for a in range(len(idx)):
        for b in range(a + 1, len(idx)):
            i, j = idx[a], idx[b]
            d = np.linalg.norm((pos[i] - pos[j])[[0, 2]])
            min_d = (radius[i] + radius[j]) * 0.75  # allow shallow overlap
            assert d > min_d, f"{names[i]} vs {names[j]}: {d:.2f} < {min_d:.2f}"
