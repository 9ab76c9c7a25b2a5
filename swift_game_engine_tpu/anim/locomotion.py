"""Locomotion state machine: idle/walk/run/falling with phase alignment.

Branchless array form of the reference FSM
(reference: Game/Systems.swift:276-408 LocomotionProfileSystem):
  * grounded transitions with enter/exit hysteresis speeds
  * airborne -> falling only from a high enough drop (fallMinDropHeight) or
    when already falling
  * on ANY state change: phase-align the new clip clock
    (toTime = fromPhase * toCycle), start a blend (blendT=0), and arm the
    idle-inertia blend when entering idle
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .pose import IDLE, WALK, RUN, FALLING, LocoState, ProfileBank


class LocomotionTuning(NamedTuple):
    """Per-character FSM thresholds (reference: Components.swift:230-293)."""

    idle_enter_speed: jnp.ndarray   # default 0.15
    idle_exit_speed: jnp.ndarray    # default 0.25
    run_enter_speed: jnp.ndarray    # default 6.0
    run_exit_speed: jnp.ndarray     # default 5.0
    fall_min_drop_height: jnp.ndarray  # default 10.0

    @staticmethod
    def default(batch_shape=()):
        f = lambda v: jnp.full(batch_shape, v, jnp.float32)
        return LocomotionTuning(
            idle_enter_speed=f(0.15), idle_exit_speed=f(0.25),
            run_enter_speed=f(6.0), run_exit_speed=f(5.0),
            fall_min_drop_height=f(10.0))


def _grounded_next_state(current, speed, tune: LocomotionTuning):
    """Systems.swift:297-324. ``current``: int32 state array."""
    grounded_state = jnp.where(current == FALLING, IDLE, current)

    from_idle = jnp.where(speed >= tune.run_enter_speed, RUN,
                          jnp.where(speed >= tune.idle_exit_speed, WALK, IDLE))
    from_walk = jnp.where(speed >= tune.run_enter_speed, RUN,
                          jnp.where(speed < tune.idle_enter_speed, IDLE, WALK))
    from_run = jnp.where(speed < tune.run_exit_speed,
                         jnp.where(speed < tune.idle_enter_speed, IDLE, WALK),
                         RUN)

    out = jnp.where(grounded_state == IDLE, from_idle,
                    jnp.where(grounded_state == WALK, from_walk, from_run))
    return out.astype(jnp.int32)


def locomotion_fsm_step(state: LocoState, bank: ProfileBank,
                        tune: LocomotionTuning, velocity,
                        grounded_near, ground_distance) -> LocoState:
    """One FSM update (runs each fixed substep, before the pose stack).

    Args:
      velocity: (..., 3) body linear velocity.
      grounded_near: (...,) bool from the controller.
      ground_distance: (...,) fall-probe distance.
    """
    speed = jnp.linalg.norm(velocity * jnp.array([1.0, 0.0, 1.0]), axis=-1)
    grounded_next = _grounded_next_state(state.state, speed, tune)

    airborne = ~grounded_near
    high_fall = ground_distance >= tune.fall_min_drop_height
    falling_next = jnp.where((state.state == FALLING) | high_fall,
                             jnp.int32(FALLING), grounded_next)
    next_state = jnp.where(airborne, falling_next, grounded_next)

    changed = next_state != state.state

    # Phase alignment: carry normalized phase from the old clip to the new
    # clip's clock (Systems.swift:350-383).
    cycles = jnp.maximum(bank.cycles, 0.001)                 # (4,)
    from_cycle = cycles[state.state]
    from_time = jnp.take_along_axis(state.times, state.state[..., None], axis=-1)[..., 0]
    from_phase = jnp.clip(from_time / from_cycle, 0.0, 1.0)
    to_cycle = cycles[next_state]
    new_time = from_phase * to_cycle
    times = jnp.where(
        changed[..., None] & (jnp.arange(4) == next_state[..., None]),
        new_time[..., None], state.times)

    return LocoState(
        state=next_state,
        from_state=jnp.where(changed, state.state, state.from_state),
        times=times,
        blend_t=jnp.where(changed, 0.0, state.blend_t),
        idle_inertia=jnp.where(changed & (next_state == IDLE), 1.0,
                               state.idle_inertia),
        is_blending=state.is_blending | changed,
    )
