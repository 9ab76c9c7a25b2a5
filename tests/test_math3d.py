import numpy as np
import jax.numpy as jnp
import pytest

from swift_game_engine_tpu import math3d as m3

pytestmark = pytest.mark.fast


def rand_rotation(rng):
    axis = rng.standard_normal(3)
    axis /= np.linalg.norm(axis)
    angle = rng.uniform(-np.pi, np.pi)
    return angle, axis


def test_mat4_rotation_orthonormal():
    rng = np.random.default_rng(0)
    for _ in range(10):
        angle, axis = rand_rotation(rng)
        m = np.asarray(m3.mat4_rotation(angle, axis))
        r = m[:3, :3]
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(r), 1.0, atol=1e-5)
        # Axis is invariant.
        np.testing.assert_allclose(r @ axis, axis, atol=1e-5)


def test_mat4_rotation_matches_rodrigues():
    rng = np.random.default_rng(1)
    for _ in range(5):
        angle, axis = rand_rotation(rng)
        m = np.asarray(m3.mat4_rotation(angle, axis))[:3, :3]
        k = np.array([[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]], [-axis[1], axis[0], 0]])
        expected = np.eye(3) + np.sin(angle) * k + (1 - np.cos(angle)) * (k @ k)
        np.testing.assert_allclose(m, expected, atol=1e-5)


def test_rotation_xyz_degrees_composition():
    rng = np.random.default_rng(2)
    for _ in range(5):
        deg = rng.uniform(-180, 180, 3).astype(np.float32)
        rx = np.asarray(m3.mat4_rotation(np.deg2rad(deg[0]), np.array([1.0, 0, 0])))
        ry = np.asarray(m3.mat4_rotation(np.deg2rad(deg[1]), np.array([0, 1.0, 0])))
        rz = np.asarray(m3.mat4_rotation(np.deg2rad(deg[2]), np.array([0, 0, 1.0])))
        expected = rz @ ry @ rx
        got = np.asarray(m3.rotation_xyz_degrees(deg))
        np.testing.assert_allclose(got, expected, atol=1e-5)


def test_translation_and_transform_point():
    t = np.array([1.0, -2.0, 3.0], np.float32)
    m = np.asarray(m3.mat4_translation(t))
    p = np.array([5.0, 6.0, 7.0], np.float32)
    np.testing.assert_allclose(np.asarray(m3.transform_point(jnp.asarray(m), jnp.asarray(p))), p + t, atol=1e-6)


def test_quat_roundtrip_mat():
    rng = np.random.default_rng(3)
    for _ in range(20):
        angle, axis = rand_rotation(rng)
        q = np.asarray(m3.quat_from_axis_angle(angle, axis))
        m = np.asarray(m3.mat4_from_quat(jnp.asarray(q)))
        q2 = np.asarray(m3.quat_from_mat4(jnp.asarray(m)))
        # q and -q are the same rotation
        if np.dot(q, q2) < 0:
            q2 = -q2
        np.testing.assert_allclose(q2, q, atol=1e-4)


def test_quat_mul_matches_matmul():
    rng = np.random.default_rng(4)
    a_angle, a_axis = rand_rotation(rng)
    b_angle, b_axis = rand_rotation(rng)
    qa = m3.quat_from_axis_angle(a_angle, a_axis)
    qb = m3.quat_from_axis_angle(b_angle, b_axis)
    q_ab = m3.quat_mul(qa, qb)
    m_ab = np.asarray(m3.mat4_from_quat(qa)) @ np.asarray(m3.mat4_from_quat(qb))
    np.testing.assert_allclose(np.asarray(m3.mat4_from_quat(q_ab)), m_ab, atol=1e-5)


def test_quat_act_matches_matrix():
    rng = np.random.default_rng(5)
    angle, axis = rand_rotation(rng)
    q = m3.quat_from_axis_angle(angle, axis)
    v = rng.standard_normal(3).astype(np.float32)
    got = np.asarray(m3.quat_act(q, jnp.asarray(v)))
    expected = np.asarray(m3.mat4_from_quat(q))[:3, :3] @ v
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_slerp_endpoints_and_shortest_arc():
    rng = np.random.default_rng(6)
    angle, axis = rand_rotation(rng)
    q0 = m3.quat_from_axis_angle(0.3, axis)
    q1 = m3.quat_from_axis_angle(angle, axis)
    np.testing.assert_allclose(np.asarray(m3.quat_slerp(q0, q1, 0.0)), np.asarray(q0), atol=1e-5)
    s1 = np.asarray(m3.quat_slerp(q0, q1, 1.0))
    q1n = np.asarray(q1)
    if np.dot(s1, q1n) < 0:
        s1 = -s1
    np.testing.assert_allclose(s1, q1n, atol=1e-5)
    # Shortest arc: slerp(q, -q1_equiv) must equal slerp(q, q1_equiv)
    a = np.asarray(m3.quat_slerp(q0, q1, 0.25))
    b = np.asarray(m3.quat_slerp(q0, -jnp.asarray(q1), 0.25))
    if np.dot(a, b) < 0:
        b = -b
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_slerp_halfway_angle():
    axis = np.array([0.0, 1.0, 0.0])
    q0 = m3.quat_from_axis_angle(0.0, axis)
    q1 = m3.quat_from_axis_angle(1.0, axis)
    qh = np.asarray(m3.quat_slerp(q0, q1, 0.5))
    expected = np.asarray(m3.quat_from_axis_angle(0.5, axis))
    if np.dot(qh, expected) < 0:
        expected = -expected
    np.testing.assert_allclose(qh, expected, atol=1e-5)


def test_rigid_inverse():
    rng = np.random.default_rng(7)
    angle, axis = rand_rotation(rng)
    m = np.array(m3.mat4_rotation(angle, axis))
    m[:3, 3] = rng.standard_normal(3)
    inv = np.asarray(m3.mat4_inverse_rigid(jnp.asarray(m)))
    np.testing.assert_allclose(inv @ m, np.eye(4), atol=1e-5)


def test_perspective_matches_reference_formula():
    fov, aspect, near, far = np.deg2rad(65.0), 16 / 9, 0.1, 1000.0
    m = np.asarray(m3.mat4_perspective_rh(fov, aspect, near, far))
    ys = 1 / np.tan(fov * 0.5)
    zs = far / (near - far)
    assert m[0, 0] == pytest.approx(ys / aspect)
    assert m[1, 1] == pytest.approx(ys)
    assert m[2, 2] == pytest.approx(zs)
    assert m[2, 3] == pytest.approx(zs * near)
    assert m[3, 2] == -1.0


def test_look_at_rh():
    eye = np.array([0.0, 0.0, 5.0], np.float32)
    center = np.zeros(3, np.float32)
    up = np.array([0.0, 1.0, 0.0], np.float32)
    v = np.asarray(m3.mat4_look_at_rh(eye, center, up))
    # Eye maps to origin.
    p = v @ np.array([0, 0, 5, 1.0])
    np.testing.assert_allclose(p[:3], 0.0, atol=1e-6)
    # Center maps to -z axis (distance 5).
    c = v @ np.array([0, 0, 0, 1.0])
    np.testing.assert_allclose(c[:3], [0, 0, -5], atol=1e-6)


def test_batched_rotation_xyz():
    rng = np.random.default_rng(8)
    degs = rng.uniform(-180, 180, (7, 3)).astype(np.float32)
    batched = np.asarray(m3.rotation_xyz_degrees(degs))
    for i in range(7):
        single = np.asarray(m3.rotation_xyz_degrees(degs[i]))
        np.testing.assert_allclose(batched[i], single, atol=1e-6)
