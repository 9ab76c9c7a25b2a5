"""Batched collision queries: capsule CCD cast, overlap, raycast.

TPU reformulation of the reference's per-query BVH traversal + scalar
conservative advancement (reference: Game/CollisionQuery.swift:768-1394):
each query evaluates against *all* triangles at once with an AABB prefilter
mask; the conservative-advancement loop runs a fixed number of masked
iterations (converged lanes idle), followed by a fixed 10-step bisection
refine — identical math, lockstep schedule. Queries are single-capsule
functions; vmap them over the agent batch.

Semantics parity notes:
  * advance step = max(dist - radius, max(0.02 r, 1e-4)), contact at
    dist <= r + 1e-5 (CollisionQuery.swift:1295-1355)
  * the "over max distance" check happens BEFORE the distance test each
    iteration, and lastSafe is only advanced on non-contact iterations
  * refine returns hi when the bracket is already < 1e-5 wide (:1361-1394)
  * contact normal = seg-tri closest-point axis, or the (dir-opposed)
    triangle normal when penetrating (:1331-1340)
  * blockingOnly rejects hits whose normal or triangle normal does not
    oppose the motion (:1087-1094); ground casts reject triangle normals
    below minNormalY (:1095-1097)
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .primitives import (segment_triangle_distance, ray_triangle, aabb_overlap)
from .collision_world import TriangleSoup

CONTACT_EPS = 1e-5
# Conservative-advancement iteration budget. The reference caps at 256 with
# min advance max(0.02 r, 1e-4) (CollisionQuery.swift:1295-1296); character
# sweeps move <= ~1.2 units/substep so ~40 iterations suffice even for
# grazing contacts — 48 keeps headroom while every iteration costs a fixed
# lockstep kernel launch.
DEFAULT_CA_ITERS = 48
REFINE_ITERS = 10
BIG = jnp.float32(3.0e38)


class CapsuleCastHit(NamedTuple):
    hit: jnp.ndarray           # () bool
    toi: jnp.ndarray           # ()
    normal: jnp.ndarray        # (3,)
    tri_normal: jnp.ndarray    # (3,)
    position: jnp.ndarray      # (3,) contact point on triangle
    tri_index: jnp.ndarray     # () int32
    mu_s: jnp.ndarray
    mu_k: jnp.ndarray
    flatten: jnp.ndarray       # () bool
    iterations: jnp.ndarray    # () int32 — CA iteration count (stats)


class CapsuleOverlapHits(NamedTuple):
    """Top-K deepest overlaps (K static)."""

    depth: jnp.ndarray        # (K,) 0 where no hit
    normal: jnp.ndarray       # (K,3)
    tri_normal: jnp.ndarray   # (K,3)
    position: jnp.ndarray     # (K,3)
    tri_index: jnp.ndarray    # (K,) int32, -1 where no hit
    valid: jnp.ndarray        # (K,) bool


class RaycastHit(NamedTuple):
    hit: jnp.ndarray
    distance: jnp.ndarray
    position: jnp.ndarray
    normal: jnp.ndarray
    tri_index: jnp.ndarray
    mu_s: jnp.ndarray
    mu_k: jnp.ndarray


def _layer_mask(soup: TriangleSoup, mask):
    return soup.valid & ((soup.layer & jnp.uint32(mask)) != 0)


@partial(jax.jit, static_argnames=("max_iters", "blocking"))
def capsule_cast(soup: TriangleSoup, from_pos, delta, radius, half_height,
                 mask=jnp.uint32(0xFFFFFFFF), blocking=False,
                 min_normal_y=None, max_iters: int = DEFAULT_CA_ITERS) -> CapsuleCastHit:
    """Sweep a Y-axis capsule along ``delta`` against all triangles.

    ``min_normal_y``: None for plain/blocking casts, or a scalar for
    ground-filtered casts (traced; pass -2.0 to disable dynamically).
    """
    from_pos = jnp.asarray(from_pos, jnp.float32)
    delta = jnp.asarray(delta, jnp.float32)
    length = jnp.linalg.norm(delta)
    nonzero = length >= 1e-6
    dir = delta / jnp.where(nonzero, length, 1.0)

    # Swept-AABB prefilter (reference CollisionQuery.swift:1025-1065).
    up = jnp.array([0.0, 1.0, 0.0]) * half_height
    ends = jnp.stack([from_pos + up, from_pos - up,
                      from_pos + up + delta, from_pos - up + delta])
    qmin = ends.min(axis=0) - radius
    qmax = ends.max(axis=0) + radius
    tmin, tmax = soup.aabb
    cand = _layer_mask(soup, mask) & aabb_overlap(qmin, qmax, tmin, tmax) & nonzero

    min_adv = jnp.maximum(radius * 0.02, 1e-4)

    # Conservative advancement, all candidate triangles in lockstep.
    # status: 0 advancing, 1 contact, 2 missed.
    t0 = jnp.zeros(soup.valid.shape, jnp.float32)
    status0 = jnp.where(cand, 0, 2)
    iters0 = jnp.zeros(soup.valid.shape, jnp.int32)

    # Early-exit while_loop: most casts resolve in a handful of iterations
    # (the advance step is dist - radius, so far triangles terminate fast);
    # the fixed budget is only the worst-case cap. Under the caller's vmap
    # the predicate lifts to an all-lanes any(), so the batch runs exactly
    # as long as its slowest lane needs.
    def cond(carry):
        _, _, status, _, i = carry
        return jnp.any(status == 0) & (i < max_iters)

    def body(carry):
        t, last_safe, status, iters, i = carry
        advancing = status == 0
        iters = iters + advancing.astype(jnp.int32)
        over = t > length
        center = from_pos + dir * t[..., None]
        dist, _, _ = segment_triangle_distance(center, half_height,
                                               soup.v0, soup.v1, soup.v2)
        contact = dist <= radius + CONTACT_EPS
        new_status = jnp.where(advancing,
                               jnp.where(over, 2, jnp.where(contact, 1, 0)),
                               status)
        still = new_status == 0
        adv = jnp.maximum(dist - radius, min_adv)
        last_safe = jnp.where(still, t, last_safe)
        t = jnp.where(still, t + adv, t)
        return t, last_safe, new_status, iters, i + 1

    t, last_safe, status, iters, _ = jax.lax.while_loop(
        cond, body, (t0, t0, status0, iters0, jnp.int32(0)))
    contact = status == 1

    # Bisection refine on contact lanes (CollisionQuery.swift:1361-1394).
    lo = jnp.minimum(jnp.clip(last_safe, 0.0, length), jnp.clip(t, 0.0, length))
    hi = jnp.maximum(jnp.clip(last_safe, 0.0, length), jnp.clip(t, 0.0, length))
    tiny = (hi - lo) < 1e-5

    # Refine only runs while some contact lane still has a wide bracket —
    # a cast with no contacts skips bisection entirely.
    def refine_cond(carry):
        lo, hi, i = carry
        return jnp.any(contact & ((hi - lo) >= 1e-5)) & (i < REFINE_ITERS)

    def refine(carry):
        lo, hi, i = carry
        mid = 0.5 * (lo + hi)
        center = from_pos + dir * mid[..., None]
        dist, _, _ = segment_triangle_distance(center, half_height,
                                               soup.v0, soup.v1, soup.v2)
        inside = dist <= radius
        return jnp.where(inside, lo, mid), jnp.where(inside, mid, hi), i + 1

    lo_r, hi_r, _ = jax.lax.while_loop(refine_cond, refine, (lo, hi, jnp.int32(0)))
    toi = jnp.where(tiny, hi, hi_r)

    # Hit attributes at the refined TOI.
    center = from_pos + dir * toi[..., None]
    dist, seg_p, tri_p = segment_triangle_distance(center, half_height,
                                                   soup.v0, soup.v1, soup.v2)
    tn = soup.normal
    axis = seg_p - tri_p
    axis_n = axis / jnp.maximum(jnp.linalg.norm(axis, axis=-1, keepdims=True), 1e-20)
    pen_n = jnp.where(jnp.sum(tn * dir, axis=-1, keepdims=True) > 0, -tn, tn)
    normal = jnp.where((dist < 1e-6)[..., None], pen_n, axis_n)
    tri_n = jnp.where(jnp.sum(tn * normal, axis=-1, keepdims=True) < 0, -tn, tn)

    ok = contact
    if blocking:
        ok = ok & (jnp.sum(delta * normal, axis=-1) < 0) \
                & (jnp.sum(delta * tri_n, axis=-1) < 0)
    if min_normal_y is not None:
        ok = ok & (tri_n[..., 1] >= min_normal_y)

    toi_masked = jnp.where(ok, toi, BIG)
    best = jnp.argmin(toi_masked)
    best_ok = toi_masked[best] < BIG

    return CapsuleCastHit(
        hit=best_ok,
        toi=jnp.where(best_ok, toi[best], BIG),
        normal=normal[best],
        tri_normal=tri_n[best],
        position=tri_p[best],
        tri_index=jnp.where(best_ok, best.astype(jnp.int32), -1),
        mu_s=soup.mu_s[best],
        mu_k=soup.mu_k[best],
        flatten=soup.flatten[best] & best_ok,
        iterations=jnp.sum(iters),
    )


@partial(jax.jit, static_argnames=("k",))
def capsule_overlap_all(soup: TriangleSoup, center, radius, half_height,
                        mask=jnp.uint32(0xFFFFFFFF), k: int = 8) -> CapsuleOverlapHits:
    """All penetrating triangles, deepest-K.

    The reference returns the first up-to-8 hits in traversal order and its
    caller sorts by depth (Systems.swift:759); returning the deepest K
    directly is a strict refinement of that selection.
    """
    center = jnp.asarray(center, jnp.float32)
    dist, seg_p, tri_p = segment_triangle_distance(center, half_height,
                                                   soup.v0, soup.v1, soup.v2)
    ok = _layer_mask(soup, mask) & (dist < radius)
    depth = jnp.where(ok, radius - dist, 0.0)

    tn = soup.normal
    axis = seg_p - tri_p
    axis_n = axis / jnp.maximum(jnp.linalg.norm(axis, axis=-1, keepdims=True), 1e-20)
    normal = jnp.where((dist < 1e-6)[..., None], tn, axis_n)
    tri_n = jnp.where(jnp.sum(tn * normal, axis=-1, keepdims=True) < 0, -tn, tn)

    top_depth, top_idx = jax.lax.top_k(depth, k)
    valid = top_depth > 0
    return CapsuleOverlapHits(
        depth=top_depth,
        normal=normal[top_idx],
        tri_normal=tri_n[top_idx],
        position=tri_p[top_idx],
        tri_index=jnp.where(valid, top_idx.astype(jnp.int32), -1),
        valid=valid,
    )


@jax.jit
def raycast(soup: TriangleSoup, origin, direction, max_distance,
            mask=jnp.uint32(0xFFFFFFFF)) -> RaycastHit:
    origin = jnp.asarray(origin, jnp.float32)
    direction = jnp.asarray(direction, jnp.float32)
    hit, t = ray_triangle(origin, direction, soup.v0, soup.v1, soup.v2)
    ok = hit & _layer_mask(soup, mask) & (t < max_distance)
    t_masked = jnp.where(ok, t, BIG)
    best = jnp.argmin(t_masked)
    best_ok = t_masked[best] < BIG
    tn = soup.normal[best]
    n = jnp.where(jnp.sum(tn * direction) > 0, -tn, tn)
    return RaycastHit(
        hit=best_ok,
        distance=jnp.where(best_ok, t[best], BIG),
        position=origin + direction * t[best],
        normal=n,
        tri_index=jnp.where(best_ok, best.astype(jnp.int32), -1),
        mu_s=soup.mu_s[best],
        mu_k=soup.mu_k[best],
    )
