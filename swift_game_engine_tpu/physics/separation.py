"""Agent-agent separation after move-and-slide.

TPU reformulation of the reference's XZ hash-grid Gauss-Seidel pass
(reference: Game/Systems.swift:1906-2210): all pairs are evaluated as an
(N x N) masked matrix with Jacobi accumulation per iteration instead of
sequential in-place pair updates — with the same per-pair position/impulse
math (inverse-mass-weighted XZ push + approach-velocity cancellation).
Demo-scale agent counts make brute-force all-pairs cheaper than any grid.

The reference's per-pair "static blocked" redistribution (casting each pair
move against the world, Systems.swift:2002-2037) is folded into the
post-process: every agent's accumulated correction is re-run through the
move-and-slide resolver against the static world and re-snapped to ground
(Systems.swift:2048-2123), which is the mechanism that actually prevents
tunneling.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import math3d as m3
from . import queries as Q
from .collision_world import TriangleSoup
from .character import (_resolve_hit, AGENT_SEPARATION, ControllerParams,
                        ControllerState, BIG, DOWN)


def separate_agents(soup: TriangleSoup, position, velocity,
                    state: ControllerState, params: ControllerParams,
                    iterations: int = 2, separation_margin: float = 0.2,
                    height_margin: float = 0.1, slide_iterations: int = 2):
    """Resolve agent-agent overlaps. Returns (position, velocity, state).

    position/velocity: (N,3).
    """
    n = position.shape[0]
    eye = jnp.eye(n, dtype=bool)
    solid = params.agent_solid & params.active
    pair_ok = solid[:, None] & solid[None, :] & ~eye
    inv_w = jnp.where(params.agent_mass_weight > 0,
                      1.0 / jnp.maximum(params.agent_mass_weight, 1e-20), 0.0)

    start_position = position
    velocity0 = velocity

    for _ in range(iterations):
        dx = position[:, 0][:, None] - position[:, 0][None, :]
        dz = position[:, 2][:, None] - position[:, 2][None, :]
        dist_sq = dx * dx + dz * dz
        skin_allow = jnp.minimum(params.skin_width[:, None], params.skin_width[None, :])
        margin = jnp.minimum(separation_margin, skin_allow)
        min_dist = params.agent_radius[:, None] + params.agent_radius[None, :] + margin

        a_min = position[:, 1] - params.half_height
        a_max = position[:, 1] + params.half_height
        height_sep = (a_max[:, None] < a_min[None, :] - height_margin) | \
                     (a_min[:, None] > a_max[None, :] + height_margin)

        w_sum = inv_w[:, None] + inv_w[None, :]
        overlap = pair_ok & ~height_sep & (dist_sq < min_dist * min_dist) & (w_sum > 0)

        dist = jnp.sqrt(jnp.maximum(dist_sq, 1e-8))
        nx = dx / dist
        nz = dz / dist
        pen = min_dist - dist
        corr = jnp.where(overlap, pen / jnp.maximum(w_sum, 1e-20), 0.0)

        # Jacobi position accumulation (each pair contributes to both agents).
        move_x = jnp.sum(nx * corr, axis=1) * inv_w
        move_z = jnp.sum(nz * corr, axis=1) * inv_w
        position = position + jnp.stack(
            [move_x, jnp.zeros_like(move_x), move_z], axis=-1)

        # Approach-velocity impulse (Systems.swift:1991-2001).
        rvx = velocity[:, 0][:, None] - velocity[:, 0][None, :]
        rvz = velocity[:, 2][:, None] - velocity[:, 2][None, :]
        vn = rvx * nx + rvz * nz
        approaching = overlap & (vn < 0)
        impulse = jnp.where(approaching, -vn, 0.0)
        scale = inv_w[:, None] / jnp.maximum(w_sum, 1e-20)
        dvx = jnp.sum(nx * impulse * scale, axis=1)
        dvz = jnp.sum(nz * impulse * scale, axis=1)
        velocity = velocity + jnp.stack([dvx, jnp.zeros_like(dvx), dvz], axis=-1)

    # Post-process: re-run the accumulated delta through move-and-slide vs the
    # static world, then re-snap to ground (Systems.swift:2048-2123).
    def post(idx, start, target, vel, st_gr, st_gn, st_n, st_tri):
        pr_r = params.agent_radius[idx]
        pr_hh = params.half_height[idx]
        mask = params.collision_mask[idx]
        mgd = params.min_ground_dot[idx]
        delta = target - start
        moved = jnp.linalg.norm(delta) > 1e-6
        pos = jnp.where(moved, start, target)
        remaining = jnp.where(moved, delta, jnp.zeros(3))
        vel_dummy = vel
        done = ~moved
        q_cand = jnp.int32(0)
        q_casts = jnp.int32(0)
        for _ in range(slide_iterations):
            seg = jnp.linalg.norm(remaining)
            act = ~done & (seg >= 1e-6)
            hit = Q.capsule_cast(soup, pos, remaining, pr_r, pr_hh,
                                 mask=mask, blocking=True)
            q_cand = q_cand + jnp.where(act, hit.iterations, 0)
            q_casts = q_casts + act.astype(jnp.int32)
            new_pos, new_rem, _, hdone, _ = _resolve_hit(
                remaining, seg, pos, vel_dummy,
                hit.toi, hit.normal, hit.tri_normal, jnp.asarray(True),
                mgd, params.skin_width[idx], params.ground_snap_skin[idx],
                params.ground_sweep_max_step[idx],
                jnp.asarray(False), jnp.asarray(False),
                jnp.int32(0), jnp.zeros(3), jnp.asarray(False), jnp.zeros(3),
                AGENT_SEPARATION)
            pos_nohit = pos + remaining
            pos = jnp.where(act, jnp.where(hit.hit, new_pos, pos_nohit), pos)
            remaining = jnp.where(act & hit.hit, new_rem, jnp.zeros(3))
            done = done | (act & (~hit.hit | hdone))

        # Re-snap (only if we moved and aren't moving upward).
        do_snap = moved & (vel[1] <= 0) & (params.snap_distance[idx] > 0)
        snap = Q.capsule_cast(soup, pos, DOWN * params.snap_distance[idx],
                              pr_r, pr_hh, mask=mask, min_normal_y=mgd)
        q_cand = q_cand + jnp.where(do_snap, snap.iterations, 0)
        q_casts = q_casts + do_snap.astype(jnp.int32)
        snap_ok = do_snap & snap.hit & (snap.toi <= params.snap_distance[idx])
        raw = jnp.maximum(snap.toi - params.ground_snap_skin[idx], 0.0)
        move = jnp.minimum(raw, params.ground_snap_max_step[idx])
        pos = jnp.where(snap_ok, pos + DOWN * move, pos)
        gr = jnp.where(snap_ok, True, st_gr)
        gn = jnp.where(snap_ok,
                       snap.toi <= jnp.maximum(params.ground_snap_skin[idx],
                                               params.skin_width[idx]), st_gn)
        nrm = jnp.where(snap_ok, jnp.where(snap.flatten, jnp.array([0.0, 1, 0]),
                                           snap.tri_normal), st_n)
        tri = jnp.where(snap_ok, snap.tri_index, st_tri)
        active = params.active[idx] & params.agent_solid[idx]
        return (jnp.where(active, pos, start),
                jnp.where(active, gr, st_gr),
                jnp.where(active, gn, st_gn),
                jnp.where(active, nrm, st_n),
                jnp.where(active, tri, st_tri),
                jnp.where(active, q_cand, 0),
                jnp.where(active, q_casts, 0))

    new_pos, gr, gn, nrm, tri, q_cand, q_casts = jax.vmap(post)(
        jnp.arange(n), start_position, position, velocity,
        state.grounded, state.grounded_near, state.ground_normal, state.ground_tri)

    new_state = state._replace(grounded=gr, grounded_near=gn,
                               ground_normal=nrm, ground_tri=tri,
                               query_candidates=state.query_candidates + q_cand,
                               query_casts=state.query_casts + q_casts)
    active3 = (params.active & params.agent_solid)[:, None]
    velocity = jnp.where(active3, velocity, velocity0)
    return new_pos, velocity, new_state
