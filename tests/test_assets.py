"""Golden-asset tests against the checked-in reference JSON files."""

import os

import numpy as np
import pytest

from swift_game_engine_tpu.assets import nputil
from swift_game_engine_tpu.assets.skeleton import load_skeleton, build_skeleton
from swift_game_engine_tpu.assets.motion_profile import (

    load_motion_profile, pack_profile, evaluate_fourier, fourier_basis_np,
)

pytestmark = pytest.mark.fast

REF = "/root/reference/Game"
YBOT = os.path.join(REF, "YBot.skeleton.json")
IDLE = os.path.join(REF, "Idle.motionProfile.json")
WALK = os.path.join(REF, "Walking.motionProfile.json")


@pytest.fixture(scope="module")
def ybot():
    return load_skeleton(YBOT)


def test_ybot_basic_shape(ybot):
    assert ybot.bone_count == 65
    assert ybot.parent[0] == -1
    assert ybot.unit_scale == pytest.approx(0.026)
    assert ybot.names[0] == "mixamorig:Hips"
    # mixamo rig -> auto root rule -> zero_root: root rest translation is 0
    np.testing.assert_allclose(ybot.rest_translation[0], 0.0)
    # but the raw rest keeps the file's value
    assert abs(ybot.raw_rest_translation[0][1] - 99.791939) < 1e-4


def test_ybot_semantics(ybot):
    assert ybot.semantic["pelvis"] == 0
    for key in ("head", "thighL", "calfR", "footL", "chest" if "chest" in ybot.semantic else "spine3"):
        assert key in ybot.semantic or key == "chest"


def test_ybot_root_fix_is_y180(ybot):
    expected = nputil.rotation_xyz_degrees(np.array([0.0, 180.0, 0.0]))
    np.testing.assert_allclose(ybot.root_rotation_fix, expected, atol=1e-6)


def test_bind_pose_structure(ybot):
    # bind_local = T(rest) @ pre_rot
    recon = nputil.translation_mat(ybot.rest_translation) @ ybot.pre_rot
    np.testing.assert_allclose(ybot.bind_local, recon, atol=1e-6)
    # inv_bind_model inverts the FK of bind locals
    model = nputil.fk_model_transforms(ybot.parent, ybot.bind_local)
    prod = model @ ybot.inv_bind_model
    np.testing.assert_allclose(prod, np.broadcast_to(np.eye(4), prod.shape), atol=1e-4)


def test_levels_partition(ybot):
    flat = np.concatenate(ybot.levels)
    assert sorted(flat.tolist()) == list(range(65))
    # every bone's parent is in a strictly earlier level
    level_of = {}
    for li, idxs in enumerate(ybot.levels):
        for i in idxs:
            level_of[int(i)] = li
    for i in range(65):
        p = int(ybot.parent[i])
        if p >= 0:
            assert level_of[p] < level_of[i]


def test_zero_root_rule_explicit():
    sk = build_skeleton(
        names=["a", "b"], parent=[-1, 0],
        raw_translations=[[1, 2, 3], [4, 5, 6]],
        pre_rotation_degrees=[[0, 0, 0], [0, 0, 0]],
        unit_scale=2.0, root_rule="keep",
    )
    np.testing.assert_allclose(sk.rest_translation, [[2, 4, 6], [8, 10, 12]])


def test_motion_profile_load():
    p = load_motion_profile(IDLE)
    assert p.name == "Idle"
    assert p.order == 4
    assert p.sample_fps == 60
    assert p.cycle == pytest.approx(p.duration)
    assert "mixamorig:Hips" in p.bones


def test_fourier_oracle_simple():
    # f(p) = 1 + 2cos(2pi p) + 3sin(2pi p)
    coeffs = [1.0, 2.0, 3.0]
    for p in (0.0, 0.25, 0.5, 0.77):
        ang = 2 * np.pi * p
        assert evaluate_fourier(coeffs, p, 4) == pytest.approx(1 + 2 * np.cos(ang) + 3 * np.sin(ang), abs=1e-5)
    # phase clamped to [0, 1]
    assert evaluate_fourier(coeffs, -1.0, 4) == pytest.approx(evaluate_fourier(coeffs, 0.0, 4))
    assert evaluate_fourier(coeffs, 2.0, 4) == pytest.approx(evaluate_fourier(coeffs, 1.0, 4))


def test_fourier_dangling_coeff_rule():
    # Even-length list: trailing a_k with no b_k must be ignored.
    coeffs = [1.0, 2.0, 3.0, 99.0]
    assert evaluate_fourier(coeffs, 0.3, 4) == pytest.approx(evaluate_fourier([1.0, 2.0, 3.0], 0.3, 4))


def test_packed_matches_oracle(ybot):
    prof = load_motion_profile(WALK)
    packed = pack_profile(prof, ybot)
    rng = np.random.default_rng(0)
    for phase in rng.uniform(0, 1, 4):
        basis = fourier_basis_np(np.float32(phase), packed.order)
        vals = packed.coeffs @ basis  # (B, 6)
        for b, name in enumerate(ybot.names):
            bone = prof.bones.get(name)
            if bone is None:
                assert not packed.has_channel[b].any()
                continue
            for ch, (group, axis) in enumerate(
                [("translation", "x"), ("translation", "y"), ("translation", "z"),
                 ("rotation", "x"), ("rotation", "y"), ("rotation", "z")]
            ):
                coeffs = (bone.get(group) or {}).get(axis)
                if coeffs is None:
                    assert not packed.has_channel[b, ch]
                else:
                    assert packed.has_channel[b, ch]
                    expected = evaluate_fourier(coeffs, phase, prof.order)
                    assert vals[b, ch] == pytest.approx(expected, abs=2e-3), (name, group, axis)


def test_packed_dangling_zeroed(ybot):
    prof = load_motion_profile(IDLE)
    packed = pack_profile(prof, ybot)
    basis = fourier_basis_np(np.float32(0.37), packed.order)
    vals = packed.coeffs @ basis
    hips = ybot.index_by_name["mixamorig:Hips"]
    expected = evaluate_fourier(prof.bones["mixamorig:Hips"]["rotation"]["y"], 0.37, prof.order)
    assert vals[hips, 4] == pytest.approx(expected, abs=2e-3)
