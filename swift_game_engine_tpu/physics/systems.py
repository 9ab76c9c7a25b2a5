"""Per-substep batched systems: intent, gravity, jump, dodge, action clock,
platform motion, oscillation, spin, plain-body integration.

Array forms of the reference's fixed-step systems (reference file:line cited
per function). All functions are pure: (state arrays, dt) -> state arrays,
batched over entities; selection masks replace the reference's per-entity
component queries.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .. import math3d as m3


def approach_vec(current, target, max_delta):
    """Move current toward target by at most max_delta
    (reference: Systems.swift:410-426)."""
    delta = target - current
    ln = jnp.linalg.norm(delta, axis=-1, keepdims=True)
    snap = (ln <= max_delta[..., None]) | (ln < 1e-5)
    step = current + delta / jnp.maximum(ln, 1e-20) * max_delta[..., None]
    return jnp.where(snap, target, step)


def physics_intent(velocity, rotation, desired_velocity, desired_yaw, has_yaw,
                   dodge_active, is_controller, max_accel, max_decel, dt,
                   enabled):
    """PhysicsIntentSystem (reference: Systems.swift:205-250).

    Returns (velocity, rotation). Controllers clamp only the XZ components;
    dodges write velocity through directly; facing yaw snaps the rotation.
    """
    dt = jnp.float32(dt)
    target_xz = desired_velocity * jnp.array([1.0, 0.0, 1.0])
    current_xz = velocity * jnp.array([1.0, 0.0, 1.0])
    speeding_up = jnp.linalg.norm(target_xz, axis=-1) >= jnp.linalg.norm(current_xz, axis=-1)
    accel = jnp.where(speeding_up, max_accel, max_decel)
    next_xz = approach_vec(current_xz, target_xz, accel * dt)
    v_ctrl = next_xz + velocity * jnp.array([0.0, 1.0, 0.0])
    v_dodge = desired_velocity * jnp.array([1.0, 0.0, 1.0]) + velocity * jnp.array([0.0, 1.0, 0.0])

    # Non-controller path approaches the full 3D target.
    target3 = desired_velocity
    speeding3 = jnp.linalg.norm(target3, axis=-1) >= jnp.linalg.norm(velocity, axis=-1)
    accel3 = jnp.where(speeding3, max_accel, max_decel)
    v_plain = approach_vec(velocity, target3, accel3 * dt)

    new_v = jnp.where(dodge_active[..., None], v_dodge,
                      jnp.where(is_controller[..., None], v_ctrl, v_plain))
    new_v = jnp.where(enabled[..., None], new_v, velocity)

    yaw_q = m3.quat_from_axis_angle(desired_yaw, jnp.array([0.0, 1.0, 0.0]))
    new_rot = jnp.where((enabled & has_yaw)[..., None], yaw_q, rotation)
    return new_v, new_rot


def gravity_step(velocity, grounded, grounded_near, is_dynamic, dt,
                 gravity=(0.0, -98.0, 0.0), enabled=True):
    """GravitySystem (reference: Systems.swift:596-620): skipped while
    grounded && groundedNear."""
    g = jnp.asarray(gravity, jnp.float32)
    apply = is_dynamic & ~(grounded & grounded_near) & enabled
    return jnp.where(apply[..., None], velocity + g * jnp.float32(dt), velocity)


def jump_step(velocity, grounded, jump_requested, jump_speed=34.0, enabled=True):
    """JumpSystem (reference: Systems.swift:437-469). Returns
    (velocity, grounded, jump_requested_cleared)."""
    do = jump_requested & grounded & enabled
    velocity = jnp.where(do[..., None],
                         velocity * jnp.array([1.0, 0.0, 1.0]) +
                         jnp.array([0.0, 1.0, 0.0]) * jump_speed, velocity)
    grounded = jnp.where(do, False, grounded)
    return velocity, grounded, jnp.zeros_like(jump_requested)


class DodgeState(NamedTuple):
    """reference: Components.swift:655-682."""

    active: jnp.ndarray
    time: jnp.ndarray
    duration: jnp.ndarray
    distance: jnp.ndarray
    start_time: jnp.ndarray
    end_time: jnp.ndarray
    direction: jnp.ndarray   # (...,3)
    facing_yaw: jnp.ndarray

    @staticmethod
    def default(batch_shape=(), duration=0.35, distance=3.0,
                start_time=0.0, end_time=0.0):
        z = jnp.zeros(batch_shape, jnp.float32)
        return DodgeState(
            active=jnp.zeros(batch_shape, bool), time=z,
            duration=z + duration, distance=z + distance,
            start_time=z + start_time, end_time=z + end_time,
            direction=jnp.zeros((*batch_shape, 3), jnp.float32),
            facing_yaw=z)


def dodge_step(dodge: DodgeState, rotation, dodge_requested, dt, enabled=True):
    """DodgeSystem (reference: Systems.swift:521-592).

    Returns (dodge, intent_overrides) where intent_overrides is a dict with
    desired_velocity/facing updates + action_trigger (bool: restart the
    action clip this substep).
    """
    dt = jnp.float32(dt)
    forward = m3.quat_act(rotation, jnp.array([0.0, 0.0, -1.0]))
    back = m3.normalize(forward * jnp.array([-1.0, 0.0, -1.0]))
    yaw = jnp.arctan2(-forward[..., 0], -forward[..., 2])

    start = dodge_requested & ~dodge.active & enabled
    active = dodge.active | start
    time = jnp.where(start, 0.0, dodge.time)
    direction = jnp.where(start[..., None], back, dodge.direction)
    facing = jnp.where(start, yaw, dodge.facing_yaw)

    time = jnp.where(active, time + dt, time)
    duration = jnp.maximum(dodge.duration, 0.001)
    w_start = jnp.clip(dodge.start_time, 0.0, duration)
    w_end = jnp.clip(dodge.end_time, w_start, duration)
    w_len = jnp.maximum(w_end - w_start, 0.001)
    in_window = (time >= w_start) & (time <= w_end)
    t = (time - w_start) / w_len
    t2 = t * t
    vel_frac = 30.0 * t2 * (1.0 - 2.0 * t + t2)  # smootherstep derivative
    speed = jnp.where(active & in_window, (dodge.distance / w_len) * vel_frac, 0.0)
    desired_velocity = direction * speed[..., None]

    still_active = active & (time < duration)
    new_dodge = DodgeState(active=still_active, time=time, duration=dodge.duration,
                           distance=dodge.distance, start_time=dodge.start_time,
                           end_time=dodge.end_time, direction=direction,
                           facing_yaw=facing)
    overrides = dict(
        apply=active,
        desired_velocity=desired_velocity * jnp.array([1.0, 0.0, 1.0]),
        facing_yaw=facing,
        action_trigger=start,
    )
    return new_dodge, overrides


class ActionClock(NamedTuple):
    """ActionAnimationComponent dynamic fields (Components.swift:620-653)."""

    active: jnp.ndarray
    time: jnp.ndarray
    weight: jnp.ndarray
    exiting: jnp.ndarray

    @staticmethod
    def default(batch_shape=()):
        z = jnp.zeros(batch_shape, jnp.float32)
        return ActionClock(active=jnp.zeros(batch_shape, bool), time=z,
                           weight=z, exiting=jnp.zeros(batch_shape, bool))


def action_animation_step(clock: ActionClock, cycle, dodge_end_time, has_dodge,
                          dt, playback_rate=1.0, loop=False,
                          blend_in_time=0.08, blend_out_half_life=0.12,
                          trigger=None):
    """ActionAnimationSystem (reference: Systems.swift:472-518).

    ``trigger`` restarts the clip (weight ramp from 0) — DodgeSystem's
    action restart (:551-557).
    """
    dt = jnp.float32(dt)
    loop = jnp.asarray(loop, bool)
    if trigger is not None:
        clock = ActionClock(
            active=clock.active | trigger,
            time=jnp.where(trigger, 0.0, clock.time),
            weight=jnp.where(trigger, 0.0, clock.weight),
            exiting=jnp.where(trigger, False, clock.exiting))

    cycle = jnp.maximum(cycle, 0.001)
    end = jnp.where(dodge_end_time > 0, dodge_end_time, cycle)
    cap = jnp.where(has_dodge, jnp.maximum(jnp.minimum(end, cycle), 0.001), cycle)

    adv = clock.active & ~clock.exiting
    time = jnp.where(adv, clock.time + dt * playback_rate, clock.time)
    time_loop = jnp.mod(time, cap)
    hit_end = time >= cap
    time = jnp.where(adv, jnp.where(loop, time_loop,
                                    jnp.where(hit_end, cap, time)), time)
    exiting = jnp.where(adv & ~loop & hit_end, True, clock.exiting)

    # blend params may be scalars or per-entity arrays (spec.action_cfg).
    half = jnp.maximum(jnp.asarray(blend_out_half_life, jnp.float32), 0.001)
    decayed = clock.weight * jnp.power(0.5, dt / half)
    w_out = jnp.where(decayed <= 0.001, 0.0, decayed)
    done = clock.active & exiting & (decayed <= 0.001)
    blend_in = jnp.maximum(jnp.asarray(blend_in_time, jnp.float32), 0.001)
    w_in = jnp.minimum(clock.weight + dt / blend_in, 1.0)

    weight = jnp.where(clock.active, jnp.where(exiting, w_out, w_in), clock.weight)
    active = clock.active & ~done
    exiting = jnp.where(done, False, exiting)
    return ActionClock(active=active, time=time, weight=weight, exiting=exiting)


def kinematic_platform_motion(origin, axis, amplitude, speed, phase, time,
                              dt, enabled=True):
    """KinematicPlatformMotionSystem (reference: Systems.swift:122-154).

    Returns (new_time, new_position)."""
    dt = jnp.float32(dt)
    axis_len = jnp.linalg.norm(axis, axis=-1, keepdims=True)
    axis_n = jnp.where(axis_len > 1e-4, axis / jnp.maximum(axis_len, 1e-20),
                       jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0]), axis.shape))
    time = jnp.where(enabled, time + dt, time)
    offset = jnp.sin(time * speed + phase) * amplitude
    return time, origin + axis_n * offset[..., None]


def oscillate_move(origin, axis, amplitude, speed, time, dt, enabled=True):
    """OscillateMoveSystem (reference: Systems.swift:253-273).

    Returns (new_time, desired_velocity)."""
    dt = jnp.float32(dt)
    axis_len = jnp.linalg.norm(axis, axis=-1, keepdims=True)
    axis_n = jnp.where(axis_len > 1e-5, axis / jnp.maximum(axis_len, 1e-20),
                       jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), axis.shape))
    time = jnp.where(enabled, time + dt, time)
    ph = time * speed
    vel = axis_n * (jnp.cos(ph) * amplitude * speed)[..., None]
    return time, vel * jnp.array([1.0, 0.0, 1.0])


def spin_step(rotation, speed, axis, dt, enabled=True):
    """SpinSystem quaternion integration (reference: Systems.swift:97-119)."""
    dq = m3.quat_from_axis_angle(speed * jnp.float32(dt), m3.normalize(axis))
    out = m3.quat_normalize(m3.quat_mul(dq, rotation))
    return jnp.where(jnp.asarray(enabled)[..., None], out, rotation)


def integrate_bodies(position, rotation, linear_velocity, angular_velocity,
                     is_dynamic_or_kinematic, skip, dt):
    """PhysicsIntegrateSystem (reference: Systems.swift:2213-2246): Euler for
    plain bodies; controllers/platforms are skipped."""
    dt = jnp.float32(dt)
    do = is_dynamic_or_kinematic & ~skip
    position = jnp.where(do[..., None], position + linear_velocity * dt, position)
    w_len = jnp.linalg.norm(angular_velocity, axis=-1)
    spin = do & (w_len > 1e-4)
    axis = angular_velocity / jnp.maximum(w_len[..., None], 1e-20)
    dq = m3.quat_from_axis_angle(w_len * dt, axis)
    rotation = jnp.where(spin[..., None],
                         m3.quat_normalize(m3.quat_mul(dq, rotation)), rotation)
    return position, rotation
