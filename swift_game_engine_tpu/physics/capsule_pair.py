"""Analytic moving capsule-vs-capsule sweep (agent-agent CCD).

Vectorized form of the reference's quadratic-root solver
(reference: Game/Systems.swift:1417-1590): in the relative frame the moving
capsule hits the other when the XZ distance to the (Y-clamped) core reaches
the radius sum — solved piecewise over three Y-bands (above both caps, below,
and the overlapping cylinder band), taking the earliest root. All functions
broadcast; use with (agent x agent) matrices.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

_EPS = 1e-6
BIG = np.float32(3.0e38)


def _earliest_root(A, B, C, t_min, t_max):
    """Earliest t in [t_min, t_max] with A t^2 + B t + C <= 0 crossing.

    Mirrors Systems.swift:1450-1472. Returns (t, valid)."""
    lin = jnp.abs(A) < _EPS
    const = lin & (jnp.abs(B) < _EPS)
    # constant case: already inside iff C <= 0 -> t_min
    t_const = t_min
    v_const = C <= 0
    # linear case
    B_safe = jnp.where(jnp.abs(B) < _EPS, 1.0, B)
    t_lin = -C / B_safe
    v_lin = (t_lin >= t_min) & (t_lin <= t_max)
    # quadratic
    disc = B * B - 4 * A * C
    v_quad = disc >= 0
    sqrt_d = jnp.sqrt(jnp.maximum(disc, 0.0))
    inv2a = 1.0 / jnp.where(jnp.abs(A) < _EPS, 1.0, 2.0 * A)
    r0 = (-B - sqrt_d) * inv2a
    r1 = (-B + sqrt_d) * inv2a
    enter = jnp.minimum(r0, r1)
    exit_ = jnp.maximum(r0, r1)
    s = jnp.maximum(enter, t_min)
    e = jnp.minimum(exit_, t_max)
    t_quad = s
    v_quad = v_quad & (e >= s)

    t = jnp.where(const, t_const, jnp.where(lin, t_lin, t_quad))
    v = jnp.where(const, v_const, jnp.where(lin, v_lin, v_quad)) & (t_max >= t_min)
    return t, v


def _interval_ge(y0, vy, threshold):
    """t-interval within [0,1] where y0 + vy t >= threshold. Returns (lo, hi, valid)."""
    still = jnp.abs(vy) < _EPS
    t = (threshold - y0) / jnp.where(still, 1.0, vy)
    lo = jnp.where(still, 0.0, jnp.where(vy > 0, jnp.maximum(t, 0.0), 0.0))
    hi = jnp.where(still, 1.0, jnp.where(vy > 0, 1.0, jnp.minimum(t, 1.0)))
    valid = jnp.where(still, y0 >= threshold, hi >= lo)
    return lo, hi, valid


def _interval_le(y0, vy, threshold):
    still = jnp.abs(vy) < _EPS
    t = (threshold - y0) / jnp.where(still, 1.0, vy)
    lo = jnp.where(still, 0.0, jnp.where(vy > 0, 0.0, jnp.maximum(t, 0.0)))
    hi = jnp.where(still, 1.0, jnp.where(vy > 0, jnp.minimum(t, 1.0), 1.0))
    valid = jnp.where(still, y0 <= threshold, hi >= lo)
    return lo, hi, valid


def _sep_y(y_rel, h_sum):
    return jnp.where(y_rel > h_sum, y_rel - h_sum,
                     jnp.where(y_rel < -h_sum, y_rel + h_sum, 0.0))


def capsule_pair_normal(rel, h_sum):
    """Contact normal from the relative offset (Systems.swift:1484-1497)."""
    sep = jnp.stack([rel[..., 0], _sep_y(rel[..., 1], h_sum), rel[..., 2]], axis=-1)
    len_sq = jnp.sum(sep * sep, axis=-1, keepdims=True)
    lateral = sep.at[..., 1].set(0.0)
    lat_sq = jnp.sum(lateral * lateral, axis=-1, keepdims=True)
    fallback = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), sep.shape)
    n = jnp.where(len_sq > 1e-8, sep / jnp.sqrt(jnp.maximum(len_sq, 1e-20)),
                  jnp.where(lat_sq > 1e-8,
                            lateral / jnp.sqrt(jnp.maximum(lat_sq, 1e-20)), fallback))
    return n


def capsule_capsule_sweep(from_pos, delta, radius, half_height,
                          other_pos, other_delta, other_radius, other_half_height):
    """Sweep TOI between two moving Y-capsules. Broadcasting.

    Returns (toi, normal, hit) with toi measured in *distance along delta*
    (toi = t_hit * |delta|), matching Systems.swift:1505-1590.
    """
    rel_start = from_pos - other_pos
    rel_delta = delta - other_delta
    r_sum = radius + other_radius
    h_sum = half_height + other_half_height
    rel_len = jnp.linalg.norm(rel_delta, axis=-1)
    move_len = jnp.linalg.norm(delta, axis=-1)

    y0 = rel_start[..., 1]
    vy = rel_delta[..., 1]
    vx = rel_delta[..., 0]
    vz = rel_delta[..., 2]
    r0x = rel_start[..., 0]
    r0z = rel_start[..., 2]

    # Stationary relative motion: overlap test only.
    static_rel = rel_len < _EPS
    sep_y0 = _sep_y(y0, h_sum)
    overlap0 = (r0x * r0x + r0z * r0z + sep_y0 * sep_y0) <= r_sum * r_sum

    best_t = jnp.full(jnp.broadcast_shapes(y0.shape), BIG)

    # Upper cap band (y_rel >= h_sum): sphere at y-offset -h_sum.
    lo, hi, v = _interval_ge(y0, vy, h_sum)
    A = vx * vx + vz * vz + vy * vy
    B = 2 * (r0x * vx + r0z * vz + (y0 - h_sum) * vy)
    C = r0x * r0x + r0z * r0z + (y0 - h_sum) ** 2 - r_sum * r_sum
    t, tv = _earliest_root(A, B, C, lo, hi)
    best_t = jnp.where(v & tv & (t < best_t), t, best_t)

    # Lower cap band.
    lo, hi, v = _interval_le(y0, vy, -h_sum)
    B2 = 2 * (r0x * vx + r0z * vz + (y0 + h_sum) * vy)
    C2 = r0x * r0x + r0z * r0z + (y0 + h_sum) ** 2 - r_sum * r_sum
    t, tv = _earliest_root(A, B2, C2, lo, hi)
    best_t = jnp.where(v & tv & (t < best_t), t, best_t)

    # Cylinder band (|y_rel| <= h_sum): XZ circle.
    A3 = vx * vx + vz * vz
    B3 = 2 * (r0x * vx + r0z * vz)
    C3 = r0x * r0x + r0z * r0z - r_sum * r_sum
    still = jnp.abs(vy) < _EPS
    in_band0 = jnp.abs(y0) <= h_sum
    t1 = (h_sum - y0) / jnp.where(still, 1.0, vy)
    t2 = (-h_sum - y0) / jnp.where(still, 1.0, vy)
    blo = jnp.maximum(jnp.minimum(t1, t2), 0.0)
    bhi = jnp.minimum(jnp.maximum(t1, t2), 1.0)
    lo3 = jnp.where(still, 0.0, blo)
    hi3 = jnp.where(still, 1.0, bhi)
    v3 = jnp.where(still, in_band0, bhi >= blo)
    t, tv = _earliest_root(A3, B3, C3, lo3, hi3)
    best_t = jnp.where(v3 & tv & (t < best_t), t, best_t)

    hit_moving = best_t < BIG
    t_hit = jnp.where(hit_moving, best_t, 0.0)
    rel_at_hit = rel_start + rel_delta * t_hit[..., None]
    n_moving = capsule_pair_normal(rel_at_hit, h_sum)
    n_static = capsule_pair_normal(rel_start, h_sum)

    hit = jnp.where(static_rel, overlap0, hit_moving)
    toi = jnp.where(static_rel, 0.0, t_hit * move_len)
    normal = jnp.where(static_rel[..., None], n_static, n_moving)
    return jnp.where(hit, toi, BIG), normal, hit
