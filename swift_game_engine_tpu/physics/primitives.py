"""Vectorized collision geometry primitives.

Branchless jnp re-derivations of the reference's scalar routines
(reference: Game/CollisionQuery.swift:1396-1631): Ericson-style
point-triangle closest point, segment-segment closest points,
Moller-Trumbore segment/ray-triangle intersection, and the capsule-core
segment-triangle distance that drives the CCD sweep. Every function
broadcasts over arbitrary leading batch dims so (agents x triangles) pairs
evaluate as one fused elementwise program on the VPU.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..math3d import cross, dot

_EPS = 1e-6


def closest_point_on_triangle(p, a, b, c):
    """Closest point on triangle abc to point p (broadcasting).

    Returns (dist_sq, point). Branch structure follows the Voronoi-region
    method (reference: Game/CollisionQuery.swift:1464-1517), expressed as a
    priority chain of masks.
    """
    ab = b - a
    ac = c - a
    ap = p - a
    d1 = dot(ab, ap)
    d2 = dot(ac, ap)

    bp = p - b
    d3 = dot(ab, bp)
    d4 = dot(ac, bp)

    cp = p - c
    d5 = dot(ab, cp)
    d6 = dot(ac, cp)

    vc = d1 * d4 - d3 * d2
    vb = d5 * d2 - d1 * d6
    va = d3 * d6 - d5 * d4

    # Region tests in the reference's order; first true wins.
    m_a = (d1 <= 0) & (d2 <= 0)
    m_b = (d3 >= 0) & (d4 <= d3)
    m_ab = (vc <= 0) & (d1 >= 0) & (d3 <= 0)
    m_c = (d6 >= 0) & (d5 <= d6)
    m_ac = (vb <= 0) & (d2 >= 0) & (d6 <= 0)
    m_bc = (va <= 0) & ((d4 - d3) >= 0) & ((d5 - d6) >= 0)

    def safe_div(num, den):
        return num / jnp.where(jnp.abs(den) < 1e-20, 1e-20, den)

    p_ab = a + ab * safe_div(d1, d1 - d3)[..., None]
    p_ac = a + ac * safe_div(d2, d2 - d6)[..., None]
    w_bc = safe_div(d4 - d3, (d4 - d3) + (d5 - d6))
    p_bc = b + (c - b) * w_bc[..., None]

    denom = safe_div(jnp.ones_like(va), va + vb + vc)
    p_in = a + ab * (vb * denom)[..., None] + ac * (vc * denom)[..., None]

    # Priority chain (later = lower priority).
    point = p_in
    point = jnp.where(m_bc[..., None], p_bc, point)
    point = jnp.where(m_ac[..., None], p_ac, point)
    point = jnp.where(m_c[..., None], jnp.broadcast_to(c, point.shape), point)
    point = jnp.where(m_ab[..., None], p_ab, point)
    point = jnp.where(m_b[..., None], jnp.broadcast_to(b, point.shape), point)
    point = jnp.where(m_a[..., None], jnp.broadcast_to(a, point.shape), point)

    diff = p - point
    return dot(diff, diff), point


def segment_segment_closest(p1, q1, p2, q2):
    """Closest points between segments [p1,q1] and [p2,q2] (broadcasting).

    Returns (dist_sq, point_on_1, point_on_2). Follows the clamped-quadratic
    method of the reference (Game/CollisionQuery.swift:1519-1569).
    """
    d1 = q1 - p1
    d2 = q2 - p2
    r = p1 - p2
    a = dot(d1, d1)
    e = dot(d2, d2)
    f = dot(d2, r)
    c = dot(d1, r)
    b = dot(d1, d2)

    denom = a * e - b * b
    s_general = jnp.clip(jnp.where(jnp.abs(denom) > 0, (b * f - c * e) /
                                   jnp.where(denom == 0, 1.0, denom), 0.0), 0.0, 1.0)

    t_nom = b * s_general + f
    e_safe = jnp.where(e < _EPS, 1.0, e)
    a_safe = jnp.where(a < _EPS, 1.0, a)

    s = s_general
    t = t_nom / e_safe
    s = jnp.where(t_nom < 0, jnp.clip(-c / a_safe, 0.0, 1.0), s)
    t = jnp.where(t_nom < 0, 0.0, t)
    s = jnp.where(t_nom > e, jnp.clip((b - c) / a_safe, 0.0, 1.0), s)
    t = jnp.where(t_nom > e, 1.0, t)

    # Degenerate segments.
    both_pts = (a <= _EPS) & (e <= _EPS)
    seg1_pt = (a <= _EPS) & ~both_pts
    seg2_pt = (e <= _EPS) & ~both_pts
    s = jnp.where(both_pts | seg1_pt, 0.0, s)
    t = jnp.where(both_pts, 0.0, jnp.where(seg1_pt, jnp.clip(f / e_safe, 0.0, 1.0), t))
    s = jnp.where(seg2_pt, jnp.clip(-c / a_safe, 0.0, 1.0), s)
    t = jnp.where(seg2_pt, 0.0, t)

    c1 = p1 + d1 * s[..., None]
    c2 = p2 + d2 * t[..., None]
    diff = c1 - c2
    return dot(diff, diff), c1, c2


def segment_triangle_intersect(a, b, v0, v1, v2):
    """Segment [a,b] vs triangle: (hit bool, point). Moller-Trumbore with
    t in [0,1] (reference: Game/CollisionQuery.swift:1440-1462)."""
    d = b - a
    e1 = v1 - v0
    e2 = v2 - v0
    pvec = cross(d, e2)
    det = dot(e1, pvec)
    ok = jnp.abs(det) >= _EPS
    inv = 1.0 / jnp.where(ok, det, 1.0)
    tvec = a - v0
    u = dot(tvec, pvec) * inv
    qvec = cross(tvec, e1)
    v = dot(d, qvec) * inv
    t = dot(e2, qvec) * inv
    hit = ok & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1) & (t >= 0) & (t <= 1)
    point = a + d * t[..., None]
    return hit, point


def segment_triangle_distance(center, half_height, v0, v1, v2):
    """Distance from a Y-axis capsule core segment to a triangle.

    The segment is [center + (0,h,0), center - (0,h,0)]. Returns
    (dist, seg_point, tri_point); dist == 0 with coincident points when the
    segment pierces the triangle (reference: Game/CollisionQuery.swift:1396-1438).
    """
    up = jnp.zeros_like(center).at[..., 1].set(half_height)
    a = center + up
    b = center - up

    hit, pierce = segment_triangle_intersect(a, b, v0, v1, v2)

    d0, p0 = closest_point_on_triangle(a, v0, v1, v2)
    d1, p1 = closest_point_on_triangle(b, v0, v1, v2)
    de0, s0, t0 = segment_segment_closest(a, b, v0, v1)
    de1, s1, t1 = segment_segment_closest(a, b, v1, v2)
    de2, s2, t2 = segment_segment_closest(a, b, v2, v0)

    # Nearest of the 5 feature candidates by a select chain: the
    # argmin + take_along_axis form lowered to per-element gathers costing
    # 74 ms/substep at 1024 agents (63% of the whole crowd substep);
    # strict-< keeps the first minimum on ties exactly like argmin.
    bd, bs, bt = d0, jnp.broadcast_to(a, p0.shape), p0
    for dk, sk, tk in ((d1, jnp.broadcast_to(b, p1.shape), p1),
                       (de0, s0, t0), (de1, s1, t1), (de2, s2, t2)):
        win = dk < bd
        bd = jnp.where(win, dk, bd)
        bs = jnp.where(win[..., None], sk, bs)
        bt = jnp.where(win[..., None], tk, bt)

    dist = jnp.sqrt(jnp.maximum(bd, 0.0))
    dist = jnp.where(hit, 0.0, dist)
    seg_point = jnp.where(hit[..., None], pierce, bs)
    tri_point = jnp.where(hit[..., None], pierce, bt)
    return dist, seg_point, tri_point


def ray_triangle(origin, direction, v0, v1, v2):
    """Ray-triangle: (hit bool, t). reference: Game/CollisionQuery.swift:1575-1601."""
    e1 = v1 - v0
    e2 = v2 - v0
    pvec = cross(direction, e2)
    det = dot(e1, pvec)
    ok = jnp.abs(det) >= _EPS
    inv = 1.0 / jnp.where(ok, det, 1.0)
    tvec = origin - v0
    u = dot(tvec, pvec) * inv
    qvec = cross(tvec, e1)
    v = dot(direction, qvec) * inv
    t = dot(e2, qvec) * inv
    hit = ok & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1) & (t >= 0)
    return hit, t


def ray_aabb(origin, inv_dir, bmin, bmax):
    """Slab test: (tmin, tmax, hit). reference: Game/CollisionQuery.swift:1603-1631."""
    t0 = (bmin - origin) * inv_dir
    t1 = (bmax - origin) * inv_dir
    tsm = jnp.minimum(t0, t1)
    tbg = jnp.maximum(t0, t1)
    tmin = jnp.max(tsm, axis=-1)
    tmax = jnp.min(tbg, axis=-1)
    return tmin, tmax, tmax >= tmin


def triangle_normal(v0, v1, v2, eps=1e-12):
    n = cross(v1 - v0, v2 - v0)
    ln = jnp.linalg.norm(n, axis=-1, keepdims=True)
    return n / jnp.maximum(ln, eps)


def aabb_overlap(amin, amax, bmin, bmax):
    return jnp.all((amax >= bmin) & (amin <= bmax), axis=-1)
