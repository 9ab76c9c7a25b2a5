"""TimeComponent.timeScale / unscaledTime semantics on the Engine.

reference: Game/Components.swift:512-534 (TimeComponent fields) and
Game/Systems.swift:24-49 (TimeSystem: deltaTime = dt * timeScale,
unscaledTime += dt) + Systems.swift:65-93 (FixedStepRunner consumes the
SCALED accumulator). timeScale = 0 must freeze simulation substeps while
the input-driven camera — fed unscaled dt — keeps animating.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.fast


@pytest.fixture(scope="module")
def engine():
    from swift_game_engine_tpu.scene.demo_scene import DemoScene
    from swift_game_engine_tpu.scene.engine import Engine
    scene = DemoScene(include_imported_assets=False).build()
    return Engine(scene, width=48, height=32, path="raster")


def test_time_scale_freezes_substeps_camera_animates(engine):
    from swift_game_engine_tpu.scene.input import InputFrame
    eng = engine
    eng.time_scale = 0.0
    t0, ut0 = eng.time, eng.unscaled_time
    acc0 = eng.accumulator
    pos0 = np.asarray(eng.state.wp_local)
    yaw0 = eng.input.yaw
    for _ in range(5):
        eng.update(1.0 / 30.0, InputFrame(lx=1.0, ly=1.0, rx=1.0))
    # scaled clock frozen; unscaled advanced by the raw dt sum
    assert eng.time == t0
    np.testing.assert_allclose(eng.unscaled_time - ut0, 5 / 30.0, atol=1e-6)
    assert eng.accumulator == acc0  # no scaled time accumulated
    assert eng.delta_time == 0.0
    np.testing.assert_allclose(eng.unscaled_delta_time, 1 / 30.0, atol=1e-6)
    # zero substeps ran: nothing moved, even under a full movement intent
    np.testing.assert_array_equal(np.asarray(eng.state.wp_local), pos0)
    # the right-stick camera still turned (unscaled dt drives input)
    assert abs(eng.input.yaw - yaw0) > 0.1


def test_time_scale_half_speed(engine):
    from swift_game_engine_tpu.scene.input import InputFrame
    eng = engine
    eng.time_scale = 0.5
    t0 = eng.time
    ut0 = eng.unscaled_time
    for _ in range(4):
        eng.update(1.0 / 60.0, InputFrame())
    np.testing.assert_allclose(eng.time - t0, 0.5 * 4 / 60.0, atol=1e-6)
    np.testing.assert_allclose(eng.unscaled_time - ut0, 4 / 60.0, atol=1e-6)
    eng.time_scale = 1.0


def test_exposure_input_integrates_and_clamps(engine):
    """DemoScene.swift:700-703: exposure += exposureDelta * dt in [0.1, 2]."""
    from swift_game_engine_tpu.scene.input import InputFrame
    eng = engine
    eng.time_scale = 1.0
    eng.tone_mapping_exposure = 1.0
    eng.update(0.1, InputFrame(exposure_delta=1.0))
    np.testing.assert_allclose(eng.tone_mapping_exposure, 1.1, atol=1e-6)
    # integrates against UNSCALED dt even when simulation is frozen
    eng.time_scale = 0.0
    eng.update(0.1, InputFrame(exposure_delta=-1.0))
    np.testing.assert_allclose(eng.tone_mapping_exposure, 1.0, atol=1e-6)
    eng.time_scale = 1.0
    for _ in range(30):
        eng.update(0.1, InputFrame(exposure_delta=1.0))
    np.testing.assert_allclose(eng.tone_mapping_exposure, 2.0, atol=1e-6)
    for _ in range(60):
        eng.update(0.1, InputFrame(exposure_delta=-1.0))
    np.testing.assert_allclose(eng.tone_mapping_exposure, 0.1, atol=1e-6)
