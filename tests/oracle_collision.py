"""Scalar NumPy oracle for capsule CCD queries (reference semantics).

Direct, loop-based implementation of the behavior of
Game/CollisionQuery.swift's sweepCapsuleTriangle / refineTOI /
segmentTriangleDistance, used to validate the vectorized jnp queries.
"""

import numpy as np


def closest_point_tri(p, a, b, c):
    ab, ac, ap = b - a, c - a, p - a
    d1, d2 = ab @ ap, ac @ ap
    if d1 <= 0 and d2 <= 0:
        return a
    bp = p - b
    d3, d4 = ab @ bp, ac @ bp
    if d3 >= 0 and d4 <= d3:
        return b
    vc = d1 * d4 - d3 * d2
    if vc <= 0 and d1 >= 0 and d3 <= 0:
        return a + ab * (d1 / (d1 - d3))
    cp = p - c
    d5, d6 = ab @ cp, ac @ cp
    if d6 >= 0 and d5 <= d6:
        return c
    vb = d5 * d2 - d1 * d6
    if vb <= 0 and d2 >= 0 and d6 <= 0:
        return a + ac * (d2 / (d2 - d6))
    va = d3 * d6 - d5 * d4
    if va <= 0 and (d4 - d3) >= 0 and (d5 - d6) >= 0:
        w = (d4 - d3) / ((d4 - d3) + (d5 - d6))
        return b + (c - b) * w
    denom = 1.0 / (va + vb + vc)
    return a + ab * (vb * denom) + ac * (vc * denom)


def seg_seg_closest(p1, q1, p2, q2):
    d1, d2, r = q1 - p1, q2 - p2, p1 - p2
    a, e, f = d1 @ d1, d2 @ d2, d2 @ r
    eps = 1e-6
    if a <= eps and e <= eps:
        return p1, p2
    if a <= eps:
        t = np.clip(f / e, 0, 1)
        return p1, p2 + d2 * t
    c = d1 @ r
    if e <= eps:
        s = np.clip(-c / a, 0, 1)
        return p1 + d1 * s, p2
    b = d1 @ d2
    denom = a * e - b * b
    s = np.clip((b * f - c * e) / denom, 0, 1) if denom != 0 else 0.0
    tn = b * s + f
    if tn < 0:
        t, s = 0.0, np.clip(-c / a, 0, 1)
    elif tn > e:
        t, s = 1.0, np.clip((b - c) / a, 0, 1)
    else:
        t = tn / e
    return p1 + d1 * s, p2 + d2 * t


def seg_tri_intersect(a, b, v0, v1, v2):
    d = b - a
    e1, e2 = v1 - v0, v2 - v0
    pvec = np.cross(d, e2)
    det = e1 @ pvec
    if abs(det) < 1e-6:
        return None
    inv = 1.0 / det
    tvec = a - v0
    u = (tvec @ pvec) * inv
    if u < 0 or u > 1:
        return None
    qvec = np.cross(tvec, e1)
    v = (d @ qvec) * inv
    if v < 0 or u + v > 1:
        return None
    t = (e2 @ qvec) * inv
    if t < 0 or t > 1:
        return None
    return a + d * t


def seg_tri_distance(center, hh, v0, v1, v2):
    up = np.array([0.0, 1, 0])
    a = center + up * hh
    b = center - up * hh
    hit = seg_tri_intersect(a, b, v0, v1, v2)
    if hit is not None:
        return 0.0, hit, hit
    best = (np.inf, a, v0)
    for p, sp in ((a, a), (b, b)):
        tp = closest_point_tri(p, v0, v1, v2)
        d = np.sum((p - tp) ** 2)
        if d < best[0]:
            best = (d, sp, tp)
    for e0, e1 in ((v0, v1), (v1, v2), (v2, v0)):
        s, t = seg_seg_closest(a, b, e0, e1)
        d = np.sum((s - t) ** 2)
        if d < best[0]:
            best = (d, s, t)
    return np.sqrt(max(best[0], 0)), best[1], best[2]


def sweep_capsule_tri(from_pos, dirv, max_dist, radius, hh, v0, v1, v2,
                      max_iter_cap=256):
    min_adv = max(radius * 0.02, 1e-4)
    max_iter = min(max_iter_cap, int(np.ceil(max_dist / min_adv)) + 1)
    t, last_safe = 0.0, 0.0
    for _ in range(max_iter):
        if t > max_dist:
            return None
        center = from_pos + dirv * t
        dist, _, _ = seg_tri_distance(center, hh, v0, v1, v2)
        if dist <= radius + 1e-5:
            lo, hi = min(last_safe, t), max(min(t, max_dist), 0)
            lo = max(lo, 0.0)
            if hi - lo >= 1e-5:
                for _ in range(10):
                    mid = 0.5 * (lo + hi)
                    d, _, _ = seg_tri_distance(from_pos + dirv * mid, hh, v0, v1, v2)
                    if d <= radius:
                        hi = mid
                    else:
                        lo = mid
            t_hit = hi
            hc = from_pos + dirv * t_hit
            hd, hs, ht = seg_tri_distance(hc, hh, v0, v1, v2)
            tn = np.cross(v1 - v0, v2 - v0)
            tn = tn / np.linalg.norm(tn)
            if hd < 1e-6:
                n = -tn if tn @ dirv > 0 else tn
            else:
                n = (hs - ht) / np.linalg.norm(hs - ht)
            tri_n = -tn if tn @ n < 0 else tn
            return dict(toi=t_hit, normal=n, tri_normal=tri_n, position=ht)
        last_safe = t
        t += max(dist - radius, min_adv)
    return None


def capsule_cast_soup(tris, from_pos, delta, radius, hh,
                      blocking=False, min_normal_y=None):
    """tris: list of (v0, v1, v2). Returns best hit dict or None."""
    length = np.linalg.norm(delta)
    if length < 1e-6:
        return None
    dirv = delta / length
    best = None
    for i, (v0, v1, v2) in enumerate(tris):
        hit = sweep_capsule_tri(from_pos, dirv, length, radius, hh, v0, v1, v2)
        if hit is None:
            continue
        if best is not None and hit["toi"] >= best["toi"]:
            continue
        if blocking:
            if delta @ hit["normal"] >= 0 or delta @ hit["tri_normal"] >= 0:
                continue
        if min_normal_y is not None and hit["tri_normal"][1] < min_normal_y:
            continue
        hit["tri_index"] = i
        best = hit
    return best
