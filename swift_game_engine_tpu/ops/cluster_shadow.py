"""Cluster shadow kernel: shared-direction occlusion as sorted dense work.

Every shadow ray in a frame points at the same directional light (the
reference shades shadows for light 0 only, RayTracing.metalinc:332-372).
The BVH-walk shadow kernel (ops.rt_kernel.trace_shadow_factor) already
exploits the shared direction for 3-dot-product leaf tests, but still pays
a serial packet walk: one scalar cursor, a vector->scalar sync per step.
This kernel replaces the tree with the same cluster structure the tile
rasterizer uses (render.tile_raster), transported to LIGHT space:

  * Per frame, XLA bakes per-triangle constants for the fixed direction L:
      u = P.g1 - c1,  v = P.g2 - c2,  t = P.g3 - c3
    — each slot test is three dot products of the ray ORIGIN against
    constants (~25 vector ops), linear in P.
  * Triangles keep their original mesh order (spatially coherent) in
    clusters of CLUSTER; per cluster: a light-plane AABB (projection onto
    an orthonormal basis (e1, e2) with L) plus a depth range along L,
    sorted by min depth.
  * The kernel runs one program per 4096-origin packet (origins arrive in
    screen-tile order, so their light-space footprint is tight). It
    computes the packet's light-plane AABB over live lanes once, walks
    clusters in depth order with a scalar AABB reject, and STOPS when the
    next cluster's min depth exceeds every lane's settlement bound
    (nearest opaque hit / filled translucent slots / t limit).

Output contract matches trace_shadow_factor: per lane the nearest opaque
t plus the n_slots nearest translucent (t, id) pairs — the caller applies
the reference's exact alpha-layer semantics elementwise.
"""

from __future__ import annotations

import os
from ..config import knob
from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .rt_kernel import BLOCK, BIG, EPS

CLUSTER = knob("SGE_SHADOW_CLUSTER")
UNROLL = 8
assert CLUSTER % UNROLL == 0
# Shadow packet size (origins per kernel program). Smaller packets have a
# tighter light-space footprint (fewer candidate clusters per packet) at
# the cost of more programs; sweepable independently of the traversal
# kernels' BLOCK (examples/prof_shadow_sweep.py).
SBLOCK = knob("SGE_SHADOW_BLOCK")
_SSUB = SBLOCK // 128
assert SBLOCK % 128 == 0
# Row tables beyond this many bytes stream from HBM via a VMEM window
# (shared policy with tile_raster; see its _ROWS_VMEM_MAX).
_ROWS_VMEM_MAX = knob("SGE_RASTER_ROWS_VMEM")


class ShadowClusters(NamedTuple):
    """The cluster count is meta.shape[0] // 8 — derived from shape, NOT a
    stored int leaf: this tuple crosses inner-jit boundaries (_shade_hit),
    which would trace an int field and break the pallas kernel's static
    grid."""
    rows: jnp.ndarray   # (Tp//8, 128) lane-packed per-tri constants
    meta: jnp.ndarray   # (C*8,) flat cluster metadata, depth-sorted
    basis: jnp.ndarray  # (3, 3): rows e1, e2, l


# Light-space Morton re-clustering at build time: re-order triangles by
# the 2D Morton code of their light-plane centroid before forming
# clusters. ANY permutation yields identical records (per-lane mins /
# insertions over all triangles), but Morton order makes cluster
# light-plane AABBs compact and square-ish instead of following mesh
# stripes — fewer clusters overlap each packet footprint, which is what
# the sweep's cost scales with (round-5 measurement: the sweep is
# overlap-work-bound; depth early-exit changes are flat). Measured on one
# v5e @960x540 full scene: 147.5 -> 145.8 ms/frame, identical image mean.
MORTON_BUILD = bool(knob("SGE_SHADOW_MORTON_BUILD", 1))


def _part1by1(x):
    x = x & 0xFFFF
    x = (x | (x << 8)) & 0x00FF00FF
    x = (x | (x << 4)) & 0x0F0F0F0F
    x = (x | (x << 2)) & 0x33333333
    x = (x | (x << 1)) & 0x55555555
    return x


def _ortho_basis(l):
    """Orthonormal (e1, e2) spanning the plane perpendicular to unit l."""
    ax = jnp.abs(l)
    up = jnp.where(ax[0] < 0.9, jnp.array([1.0, 0.0, 0.0]),
                   jnp.array([0.0, 1.0, 0.0]))
    e1 = jnp.cross(l, up)
    e1 = e1 / jnp.maximum(jnp.linalg.norm(e1), 1e-12)
    e2 = jnp.cross(l, e1)
    return e1, e2


def build_shadow_clusters(v0, v1, v2, l, translucent,
                          cluster: int = 0, alpha=None,
                          ids=None) -> ShadowClusters:
    """Per-frame XLA precompute (column-form math — see
    tile_raster._setup_clusters for why (T,3)-shaped ops are avoided).

    ``l``: unit direction toward the light. ``translucent``: (T,) bool —
    translucent ids are encoded as id + 0.5 exactly like
    rt_kernel.pack_bvh so downstream alpha handling is shared.

    ``alpha``: optional (T,) material alpha per triangle. When given, row
    slot 13 carries ``2 + alpha`` for translucent triangles (-1 otherwise)
    so a kernel run with ``alpha_payload=True`` returns the shadow-filter
    alpha directly in the id slot — the caller then needs no barycentrics
    or material gathers to apply the layer semantics (exact whenever no
    base texture carries alpha, i.e. the factor alone decides)."""
    lv = jnp.asarray(l, jnp.float32)
    e1b, e2b = _ortho_basis(lv)

    cols = []
    for p in (v0, v1, v2):
        cols.append((p[:, 0], p[:, 1], p[:, 2]))
    (x0, y0, z0), (x1, y1, z1), (x2, y2, z2) = cols

    # triangle edges (columns)
    e1x, e1y, e1z = x1 - x0, y1 - y0, z1 - z0
    e2x, e2y, e2z = x2 - x0, y2 - y0, z2 - z0

    # h = cross(L, e2); det = e1 . h
    hx = lv[1] * e2z - lv[2] * e2y
    hy = lv[2] * e2x - lv[0] * e2z
    hz = lv[0] * e2y - lv[1] * e2x
    det = e1x * hx + e1y * hy + e1z * hz
    ok = jnp.abs(det) >= EPS
    f = 1.0 / jnp.where(ok, det, 1.0)

    g1x, g1y, g1z = hx * f, hy * f, hz * f
    # q = cross(e1, L)
    qx = e1y * lv[2] - e1z * lv[1]
    qy = e1z * lv[0] - e1x * lv[2]
    qz = e1x * lv[1] - e1y * lv[0]
    g2x, g2y, g2z = qx * f, qy * f, qz * f
    # r = cross(e1, e2)  (t = (o - a) . r / det along +L toward light)
    rx = e1y * e2z - e1z * e2y
    ry = e1z * e2x - e1x * e2z
    rz = e1x * e2y - e1y * e2x
    g3x, g3y, g3z = rx * f, ry * f, rz * f

    c1 = x0 * g1x + y0 * g1y + z0 * g1z
    c2 = x0 * g2x + y0 * g2y + z0 * g2z
    c3 = x0 * g3x + y0 * g3y + z0 * g3z

    tcount = v0.shape[0]
    if ids is None:
        ids = jnp.arange(tcount, dtype=jnp.float32)
    else:
        # caller-supplied ORIGINAL triangle ids (compacted subsets keep
        # their global ids so record consumers can gather geometry/material)
        ids = jnp.asarray(ids, jnp.float32)
    ids = ids + 0.5 * jnp.asarray(translucent, jnp.float32)
    ids = jnp.where(ok, ids, -1.0)

    zero = jnp.zeros(tcount, jnp.float32)
    if alpha is not None:
        pay = jnp.where(jnp.asarray(translucent) & ok,
                        2.0 + jnp.asarray(alpha, jnp.float32), -1.0)
    else:
        pay = zero - 1.0
    rows = jnp.stack([
        g1x, g1y, g1z, g2x, g2y, g2z, g3x, g3y, g3z,
        c1, c2, c3, ids, pay, zero, zero,
    ], axis=-1)

    # light-space footprint per triangle: projection interval on (e1, e2)
    # and depth range along l
    def proj(ex, ey, ez):
        a0 = x0 * ex + y0 * ey + z0 * ez
        a1 = x1 * ex + y1 * ey + z1 * ez
        a2 = x2 * ex + y2 * ey + z2 * ez
        return (jnp.minimum(jnp.minimum(a0, a1), a2),
                jnp.maximum(jnp.maximum(a0, a1), a2))

    a_lo, a_hi = proj(e1b[0], e1b[1], e1b[2])
    b_lo, b_hi = proj(e2b[0], e2b[1], e2b[2])
    d_lo, d_hi = proj(lv[0], lv[1], lv[2])
    a_lo = jnp.where(ok, a_lo, BIG)
    a_hi = jnp.where(ok, a_hi, -BIG)
    b_lo = jnp.where(ok, b_lo, BIG)
    b_hi = jnp.where(ok, b_hi, -BIG)
    d_lo = jnp.where(ok, d_lo, BIG)
    d_hi = jnp.where(ok, d_hi, -BIG)

    if MORTON_BUILD:
        # light-plane Morton order of valid-triangle centroids; invalid
        # triangles (empty footprints) park at the end
        valid = a_lo <= a_hi
        ca = jnp.where(valid, (a_lo + a_hi) * 0.5, 0.0)
        cb = jnp.where(valid, (b_lo + b_hi) * 0.5, 0.0)
        big = jnp.float32(BIG)
        qa0 = jnp.min(jnp.where(valid, ca, big))
        qa1 = jnp.max(jnp.where(valid, ca, -big))
        qb0 = jnp.min(jnp.where(valid, cb, big))
        qb1 = jnp.max(jnp.where(valid, cb, -big))
        qa = jnp.clip((ca - qa0) / jnp.maximum(qa1 - qa0, 1e-6) * 1023.0,
                      0.0, 1023.0).astype(jnp.int32)
        qb = jnp.clip((cb - qb0) / jnp.maximum(qb1 - qb0, 1e-6) * 1023.0,
                      0.0, 1023.0).astype(jnp.int32)
        code = (_part1by1(qb) << 1) | _part1by1(qa)
        code = jnp.where(valid, code, jnp.int32(1) << 30)
        order_m = jnp.argsort(code)
        rows = rows[order_m]
        a_lo, a_hi = a_lo[order_m], a_hi[order_m]
        b_lo, b_hi = b_lo[order_m], b_hi[order_m]
        d_lo, d_hi = d_lo[order_m], d_hi[order_m]

    cl = cluster or CLUSTER
    pad = (-tcount) % cl
    if pad:
        rows = jnp.concatenate(
            [rows, jnp.full((pad, 16), -1.0, jnp.float32)], axis=0)
        fill = jnp.full(pad, BIG)
        a_lo = jnp.concatenate([a_lo, fill])
        a_hi = jnp.concatenate([a_hi, -fill])
        b_lo = jnp.concatenate([b_lo, fill])
        b_hi = jnp.concatenate([b_hi, -fill])
        d_lo = jnp.concatenate([d_lo, fill])
        d_hi = jnp.concatenate([d_hi, -fill])
    tp = rows.shape[0]
    n_clusters = tp // cl
    # Lane-packed: 8 triangles (16 lanes each) per (1, 128) row — a
    # (Tp, 16) VMEM operand would lane-pad 16 -> 128 (8x scoped VMEM).
    rows = rows.reshape(tp // 8, 128)

    def cmin(a):
        return jnp.min(a.reshape(n_clusters, cl), axis=1)

    def cmax(a):
        return jnp.max(a.reshape(n_clusters, cl), axis=1)

    ca0, ca1 = cmin(a_lo), cmax(a_hi)
    cb0, cb1 = cmin(b_lo), cmax(b_hi)
    cd0, cd1 = cmin(d_lo), cmax(d_hi)
    order = jnp.argsort(cd0)
    base = (order * (cl // 8)).astype(jnp.float32)  # packed-row index
    meta = jnp.stack([ca0[order], cb0[order], ca1[order], cb1[order],
                      cd0[order], cd1[order], base,
                      jnp.zeros_like(base)], axis=-1)
    basis = jnp.stack([e1b, e2b, lv], axis=0)
    return ShadowClusters(rows=rows, meta=meta.reshape(-1), basis=basis)


def _kernel(*refs, n_slots: int, n_clusters: int,
            use_lists: bool = False, cluster: int = 0,
            alpha_payload: bool = False, stream: bool = False):
    if stream:
        # rows stay in HBM; a processed cluster's rows are DMA'd into the
        # VMEM scratch window (see tile_raster._cluster_kernel ``stream``).
        buf_ref, sem = refs[-2], refs[-1]
        refs = refs[:-2]
    if use_lists:
        (lists_ref, meta_ref, basis_ref, rows_ref, ox_ref, oy_ref, oz_ref,
         tlim_ref, topq_out, ts_out, ids_out) = refs
    else:
        lists_ref = None
        (meta_ref, basis_ref, rows_ref, ox_ref, oy_ref, oz_ref, tlim_ref,
         topq_out, ts_out, ids_out) = refs
    px = ox_ref[0]
    py = oy_ref[0]
    pz = oz_ref[0]
    t_lim = tlim_ref[0]
    live = t_lim > 0.0

    # packet light-space footprint over live lanes (dead lanes park at 1e9)
    a = px * basis_ref[0] + py * basis_ref[1] + pz * basis_ref[2]
    b = px * basis_ref[3] + py * basis_ref[4] + pz * basis_ref[5]
    dep = px * basis_ref[6] + py * basis_ref[7] + pz * basis_ref[8]
    big = jnp.float32(BIG)
    pa0 = jnp.min(jnp.where(live, a, big))
    pa1 = jnp.max(jnp.where(live, a, -big))
    pb0 = jnp.min(jnp.where(live, b, big))
    pb1 = jnp.max(jnp.where(live, b, -big))
    pd0 = jnp.min(jnp.where(live, dep, big))

    bigv = jnp.full(px.shape, BIG, jnp.float32)
    topq0 = jnp.where(live, bigv, 0.0)
    # settlement bound: beyond it no record can change. Refreshed after
    # each accepted cluster.
    dep_live = jnp.where(live, dep, -big)

    def bound_of(t_opq, ts_last):
        lane_t = jnp.minimum(jnp.minimum(t_lim, t_opq), ts_last)
        return jnp.max(dep_live + jnp.where(live, lane_t, 0.0))

    init = (jnp.int32(0), jnp.float32(0.0), bound_of(topq0, bigv), topq0) + \
        tuple(bigv for _ in range(n_slots)) + \
        tuple(jnp.full(px.shape, -1.0, jnp.float32) for _ in range(n_slots))

    def do_cluster(base_i, recs):
        # base_i indexes PACKED rows (8 triangles of 16 lanes per row)
        if stream:
            cl8 = (cluster or CLUSTER) // 8
            copy = pltpu.make_async_copy(
                rows_ref.at[pl.ds(base_i, cl8), :], buf_ref, sem)
            copy.start()
            copy.wait()

        def group(g, recs):
            t_opq = recs[0]
            ts = list(recs[1:1 + n_slots])
            ids = list(recs[1 + n_slots:])
            if stream:
                rows = buf_ref[pl.ds(g, 1), :]
            else:
                rows = rows_ref[pl.ds(base_i + g, 1), :]
            for j in range(8):
                def s(i):
                    return rows[0, j * 16 + i]

                tri_id = s(12)  # noqa: B023 — j is static (unrolled)
                u = px * s(0) + py * s(1) + pz * s(2) - s(9)
                v = px * s(3) + py * s(4) + pz * s(5) - s(10)
                t = px * s(6) + py * s(7) + pz * s(8) - s(11)
                hit = (tri_id >= 0) & (u >= 0) & (u <= 1) & (v >= 0) & \
                    (u + v <= 1) & (t > 1e-4) & (t < t_lim)
                opaque = tri_id == jnp.floor(tri_id)
                t_opq = jnp.where(hit & opaque, jnp.minimum(t_opq, t), t_opq)
                ct = jnp.where(hit & ~opaque, t, BIG)
                payload = s(13) if alpha_payload else tri_id
                cid = jnp.where(hit & ~opaque, payload, -1.0)
                for k in range(n_slots):
                    win = ct < ts[k]
                    nt = jnp.where(win, ct, ts[k])
                    nid = jnp.where(win, cid, ids[k])
                    ct, cid = (jnp.where(win, ts[k], ct),
                               jnp.where(win, ids[k], cid))
                    ts[k], ids[k] = nt, nid
            return (t_opq,) + tuple(ts) + tuple(ids)

        return jax.lax.fori_loop(0, (cluster or CLUSTER) // 8, group,
                                 recs)

    if use_lists:
        count = lists_ref[0, 0, 0]

        def cond(c):
            return (c[0] < count) & (c[1] < 0.5)
    else:
        def cond(c):
            return (c[0] < n_clusters) & (c[1] < 0.5)

    def body(c):
        j, _, bound = c[0], c[1], c[2]
        recs = c[3:]
        ci = lists_ref[0, 0, 1 + j] if use_lists else j
        ca0 = meta_ref[ci * 8 + 0]
        cb0 = meta_ref[ci * 8 + 1]
        ca1 = meta_ref[ci * 8 + 2]
        cb1 = meta_ref[ci * 8 + 3]
        cd0 = meta_ref[ci * 8 + 4]
        cd1 = meta_ref[ci * 8 + 5]
        base_i = meta_ref[ci * 8 + 6].astype(jnp.int32)
        # sorted ascending by cd0: all later clusters are at least this deep
        stop = jnp.where(cd0 >= bound, 1.0, 0.0)
        if use_lists:
            process = stop < 0.5   # overlap pretested in XLA
        else:
            overlap = (ca0 <= pa1) & (ca1 >= pa0) & (cb0 <= pb1) & \
                (cb1 >= pb0) & (cd1 > pd0)
            process = overlap & (stop < 0.5)

        recs = jax.lax.cond(process, lambda r: do_cluster(base_i, r),
                            lambda r: r, recs)
        bound = jax.lax.cond(
            process, lambda r: bound_of(r[0], r[n_slots]),
            lambda r: bound, recs)
        return (j + 1, stop, bound) + recs

    out = jax.lax.while_loop(cond, body, init)
    topq_out[0] = out[3]
    for k in range(n_slots):
        ts_out[0, k] = out[4 + k]
        ids_out[0, k] = out[4 + n_slots + k]


def _packet_cluster_lists(sc: ShadowClusters, o, t_limit, nb: int):
    """Per-packet candidate cluster lists, built in XLA: project origins
    to light space, take live-lane min/max rects per packet (segment
    reductions over the packet axis), overlap-test against the depth-sorted
    cluster footprints, and emit [count, ci...] rows in the SAME global
    depth order (stable argsort of the inverted mask)."""
    e1, e2, lv = sc.basis[0], sc.basis[1], sc.basis[2]
    x, y, z = o[:, 0], o[:, 1], o[:, 2]
    a = x * e1[0] + y * e1[1] + z * e1[2]
    b = x * e2[0] + y * e2[1] + z * e2[2]
    dep = x * lv[0] + y * lv[1] + z * lv[2]
    live = t_limit > 0.0
    big = jnp.float32(BIG)

    def seg(v, fill, fn):
        return fn(jnp.where(live, v, fill).reshape(nb, -1), axis=1)

    pa0 = seg(a, big, jnp.min)
    pa1 = seg(a, -big, jnp.max)
    pb0 = seg(b, big, jnp.min)
    pb1 = seg(b, -big, jnp.max)
    pd0 = seg(dep, big, jnp.min)

    m = sc.meta.reshape(-1, 8)
    overlap = ((m[None, :, 0] <= pa1[:, None]) &
               (m[None, :, 2] >= pa0[:, None]) &
               (m[None, :, 1] <= pb1[:, None]) &
               (m[None, :, 3] >= pb0[:, None]) &
               (m[None, :, 5] > pd0[:, None]))
    order = jnp.argsort(~overlap, axis=1, stable=True).astype(jnp.int32)
    count = jnp.sum(overlap, axis=1).astype(jnp.int32)
    return jnp.concatenate([count[:, None], order], axis=1)


def trace_shadow_clusters(sc: ShadowClusters, o, t_limit, n_slots: int = 4,
                          interpret: bool = False, lists: bool = False,
                          cluster: int = 0, alpha_payload: bool = False,
                          stream=None):
    # NOTE: ``cluster`` must match the build_shadow_clusters call.
    """Shadow records for a flat origin batch (packet-ordered).

    Returns (t_opq (N,), ts (N, n_slots), ids (N, n_slots)) — identical
    contract to rt_kernel.trace_shadow_factor. Inactive lanes must carry
    t_limit <= 0 AND parked origins (1e9) so they never widen a packet's
    light-space footprint.

    ``alpha_payload``: return ``2 + alpha`` instead of the triangle id in
    the translucent record slots (requires build_shadow_clusters(alpha=...);
    -1 still marks empty slots).

    ``stream``: keep rows in HBM, DMA processed clusters into a VMEM
    window (None = auto by table size — the un-decimated path)."""
    n_clusters = sc.meta.shape[0] // 8
    if stream is None:
        stream = sc.rows.shape[0] * 128 * 4 > _ROWS_VMEM_MAX
    n = o.shape[0]
    sblock, ssub = SBLOCK, _SSUB
    pad = (-n) % sblock
    if pad:
        o = jnp.concatenate([o, jnp.full((pad, 3), 1.0e9, o.dtype)])
        t_limit = jnp.concatenate([t_limit, jnp.zeros(pad)])
    nb = o.shape[0] // sblock

    def comp(x):
        return x.reshape(nb, ssub, 128)

    rays = [comp(o[:, 0]), comp(o[:, 1]), comp(o[:, 2]),
            comp(jnp.asarray(t_limit, jnp.float32))]
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    rows_spec = pl.BlockSpec(memory_space=pltpu.ANY) if stream \
        else pl.BlockSpec(memory_space=pltpu.VMEM)
    ray_spec = pl.BlockSpec((1, ssub, 128), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    slot_spec = pl.BlockSpec((1, n_slots, ssub, 128), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    in_specs = [smem_spec, smem_spec, rows_spec] + [ray_spec] * 4
    operands = [sc.meta, sc.basis.reshape(-1), sc.rows]
    if lists:
        tl = _packet_cluster_lists(sc, o, jnp.asarray(t_limit, jnp.float32),
                                   nb)
        # (nb, 1, C+1): see tile_raster — block dims must EQUAL array dims.
        tl = tl[:, None, :]
        in_specs.insert(0, pl.BlockSpec((1, 1, tl.shape[2]),
                                        lambda i: (i, 0, 0),
                                        memory_space=pltpu.SMEM))
        operands.insert(0, tl)
    scratch = []
    if stream:
        scratch = [pltpu.VMEM(((cluster or CLUSTER) // 8, 128), jnp.float32),
                   pltpu.SemaphoreType.DMA]
    topq, ts, ids = pl.pallas_call(
        partial(_kernel, n_slots=n_slots, n_clusters=n_clusters,
                use_lists=lists, cluster=cluster,
                alpha_payload=alpha_payload, stream=stream),
        grid=(nb,),
        in_specs=in_specs,
        out_specs=(ray_spec, slot_spec, slot_spec),
        out_shape=(
            jax.ShapeDtypeStruct((nb, ssub, 128), jnp.float32),
            jax.ShapeDtypeStruct((nb, n_slots, ssub, 128), jnp.float32),
            jax.ShapeDtypeStruct((nb, n_slots, ssub, 128), jnp.float32),
        ),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*operands, *rays)
    topq = topq.reshape(-1)[:n]
    ts = ts.transpose(0, 2, 3, 1).reshape(-1, n_slots)[:n]
    ids = ids.transpose(0, 2, 3, 1).reshape(-1, n_slots)[:n]
    return topq, ts, ids


# ---------------------------------------------------------------------------
# Split shadow kernels (round 4).
#
# The slotted kernel above pays a 4-deep insertion network per TRIANGLE over
# the whole 4096-lane packet — ~2/3 of its per-triangle vector work — to
# collect translucent records, though translucent triangles are a tiny,
# static subset of the scene (the demo's collision-hull viz entities). The
# exact same records come from two cheaper sweeps:
#   * an OCCLUSION sweep over all triangles tracking only the nearest
#     opaque t per lane (~20 vector ops/triangle, no insertion, and a
#     tighter early-exit bound: min(t_lim, t_opq) has no open translucent
#     slots holding it at BIG), and
#   * the slotted kernel over the COMPACTED translucent subset (hundreds
#     of triangles -> a handful of clusters).
# _apply_shadow_records already filters translucent records by t < t_opq,
# so composing (t_opq from sweep 1, slots from sweep 2) is bit-identical
# to the single-kernel records.
# ---------------------------------------------------------------------------


class ShadowSplit(NamedTuple):
    full: ShadowClusters                 # all triangles (occlusion sweep)
    trans: object                        # ShadowClusters | None (slots)


def build_shadow_split(v0, v1, v2, l, translucent, alpha=None,
                       cluster: int = 0, trans_idx=None) -> ShadowSplit:
    """``trans_idx``: STATIC (numpy) indices of translucent triangles —
    derived from the scene's material table, so callers compute it once at
    trace time (geo is concrete there)."""
    full = build_shadow_clusters(v0, v1, v2, l, translucent,
                                 cluster=cluster, alpha=alpha)
    trans = None
    if trans_idx is not None and len(trans_idx) > 0:
        ti = jnp.asarray(trans_idx, jnp.int32)
        al = None if alpha is None else jnp.asarray(alpha)[ti]
        trans = build_shadow_clusters(
            v0[ti], v1[ti], v2[ti], l,
            jnp.ones(ti.shape[0], bool), cluster=min(cluster or CLUSTER, 64),
            alpha=al, ids=ti.astype(jnp.float32))
    return ShadowSplit(full=full, trans=trans)


def _kernel_occl(*refs, n_clusters: int, cluster: int = 0,
                 stream: bool = False):
    """Occlusion sweep: nearest OPAQUE t per lane, no record slots.

    ``tt`` (settle threshold, per lane): once t_opq drops below tt the
    lane is SETTLED and stops contributing to the packet's early-exit
    bound entirely. tt = 0 -> never settles (exact nearest-t contract);
    tt = nearest translucent record t (BIG if none) -> any-hit mode: the
    shadow FACTOR is already decided (0) for a lane whose nearest opaque
    hit precedes every translucent record, so refining t_opq further is
    pure waste (see trace_shadow_split anyhit=True for the exactness
    argument)."""
    if stream:
        buf_ref, sem = refs[-2], refs[-1]
        refs = refs[:-2]
    (meta_ref, basis_ref, rows_ref, ox_ref, oy_ref, oz_ref, tlim_ref,
     tt_ref, topq_out) = refs
    px = ox_ref[0]
    py = oy_ref[0]
    pz = oz_ref[0]
    t_lim = tlim_ref[0]
    tt = tt_ref[0]
    live = t_lim > 0.0

    a = px * basis_ref[0] + py * basis_ref[1] + pz * basis_ref[2]
    b = px * basis_ref[3] + py * basis_ref[4] + pz * basis_ref[5]
    dep = px * basis_ref[6] + py * basis_ref[7] + pz * basis_ref[8]
    big = jnp.float32(BIG)
    pa0 = jnp.min(jnp.where(live, a, big))
    pa1 = jnp.max(jnp.where(live, a, -big))
    pb0 = jnp.min(jnp.where(live, b, big))
    pb1 = jnp.max(jnp.where(live, b, -big))
    pd0 = jnp.min(jnp.where(live, dep, big))

    bigv = jnp.full(px.shape, BIG, jnp.float32)
    topq0 = jnp.where(live, bigv, 0.0)
    dep_live = jnp.where(live, dep, -big)

    def bound_of(t_opq):
        need = live & (t_opq >= tt)
        lane_t = jnp.minimum(t_lim, t_opq)
        return jnp.max(jnp.where(need, dep_live + lane_t, -big))

    def do_cluster(base_i, t_opq):
        if stream:
            cl8 = (cluster or CLUSTER) // 8
            copy = pltpu.make_async_copy(
                rows_ref.at[pl.ds(base_i, cl8), :], buf_ref, sem)
            copy.start()
            copy.wait()

        def group(g, t_opq):
            if stream:
                rows = buf_ref[pl.ds(g, 1), :]
            else:
                rows = rows_ref[pl.ds(base_i + g, 1), :]
            for j in range(8):
                def s(i):
                    return rows[0, j * 16 + i]

                tri_id = s(12)  # noqa: B023 — j is static (unrolled)
                opaque = (tri_id >= 0) & (tri_id == jnp.floor(tri_id))
                u = px * s(0) + py * s(1) + pz * s(2) - s(9)
                v = px * s(3) + py * s(4) + pz * s(5) - s(10)
                t = px * s(6) + py * s(7) + pz * s(8) - s(11)
                hit = opaque & (u >= 0) & (u <= 1) & (v >= 0) & \
                    (u + v <= 1) & (t > 1e-4) & (t < t_lim)
                t_opq = jnp.where(hit, jnp.minimum(t_opq, t), t_opq)
            return t_opq

        return jax.lax.fori_loop(0, (cluster or CLUSTER) // 8, group, t_opq)

    def cond(c):
        return (c[0] < n_clusters) & (c[1] < 0.5)

    def body(c):
        j, _, bound, t_opq = c
        ca0 = meta_ref[j * 8 + 0]
        cb0 = meta_ref[j * 8 + 1]
        ca1 = meta_ref[j * 8 + 2]
        cb1 = meta_ref[j * 8 + 3]
        cd0 = meta_ref[j * 8 + 4]
        cd1 = meta_ref[j * 8 + 5]
        base_i = meta_ref[j * 8 + 6].astype(jnp.int32)
        stop = jnp.where(cd0 >= bound, 1.0, 0.0)
        overlap = (ca0 <= pa1) & (ca1 >= pa0) & (cb0 <= pb1) & \
            (cb1 >= pb0) & (cd1 > pd0)
        process = overlap & (stop < 0.5)
        t_opq = jax.lax.cond(process, lambda t: do_cluster(base_i, t),
                             lambda t: t, t_opq)
        bound = jax.lax.cond(process, bound_of, lambda t: bound, t_opq)
        return j + 1, stop, bound, t_opq

    init = (jnp.int32(0), jnp.float32(0.0), bound_of(topq0), topq0)
    out = jax.lax.while_loop(cond, body, init)
    topq_out[0] = out[3]


def trace_shadow_occl(sc: ShadowClusters, o, t_limit,
                      interpret: bool = False, cluster: int = 0,
                      stream=None, tt=None):
    """Occlusion sweep -> (N,) nearest opaque t (BIG when unblocked).

    ``tt``: optional (N,) per-lane settle threshold (see _kernel_occl).
    None -> exact nearest-t records. With tt, a lane whose t_opq has
    dropped below its tt stops driving the packet bound; its returned
    t_opq is SOME opaque hit t < tt (factor-equivalent, not nearest)."""
    n_clusters = sc.meta.shape[0] // 8
    if stream is None:
        stream = sc.rows.shape[0] * 128 * 4 > _ROWS_VMEM_MAX
    n = o.shape[0]
    sblock, ssub = SBLOCK, _SSUB
    pad = (-n) % sblock
    if tt is None:
        tt = jnp.zeros(n, jnp.float32)
    else:
        tt = jnp.asarray(tt, jnp.float32)
    if pad:
        o = jnp.concatenate([o, jnp.full((pad, 3), 1.0e9, o.dtype)])
        t_limit = jnp.concatenate([t_limit, jnp.zeros(pad)])
        tt = jnp.concatenate([tt, jnp.zeros(pad)])
    nb = o.shape[0] // sblock

    def comp(x):
        return x.reshape(nb, ssub, 128)

    rays = [comp(o[:, 0]), comp(o[:, 1]), comp(o[:, 2]),
            comp(jnp.asarray(t_limit, jnp.float32)), comp(tt)]
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    rows_spec = pl.BlockSpec(memory_space=pltpu.ANY) if stream \
        else pl.BlockSpec(memory_space=pltpu.VMEM)
    ray_spec = pl.BlockSpec((1, ssub, 128), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    scratch = []
    if stream:
        scratch = [pltpu.VMEM(((cluster or CLUSTER) // 8, 128), jnp.float32),
                   pltpu.SemaphoreType.DMA]
    topq = pl.pallas_call(
        partial(_kernel_occl, n_clusters=n_clusters, cluster=cluster,
                stream=stream),
        grid=(nb,),
        in_specs=[smem_spec, smem_spec, rows_spec] + [ray_spec] * 5,
        out_specs=ray_spec,
        out_shape=jax.ShapeDtypeStruct((nb, ssub, 128), jnp.float32),
        scratch_shapes=scratch,
        interpret=interpret,
    )(sc.meta, sc.basis.reshape(-1), sc.rows, *rays)
    return topq.reshape(-1)[:n]


def trace_shadow_split(split: ShadowSplit, o, t_limit, n_slots: int = 4,
                       interpret: bool = False, alpha_payload: bool = False,
                       anyhit: bool = False):
    """Composed split records — same contract as trace_shadow_clusters.

    ``anyhit``: run the translucent sweep FIRST and feed each lane's
    nearest translucent t into the occlusion sweep as its settle
    threshold. A lane whose nearest opaque hit precedes every translucent
    record has shadow factor exactly 0 no matter what the precise t is
    (_apply_shadow_records: no translucent record passes t_k < t_opq, so
    applied = 0 < shadow_layers and the opaque zeroing fires), so the
    occlusion sweep may stop refining it — in this demo the vast majority
    of lanes carry no translucent records at all (tt = BIG), making the
    sweep effectively any-hit: one found occluder settles the lane.
    Returned t_opq is factor-equivalent but NOT the nearest t for settled
    lanes; use anyhit=False where the record-level contract matters."""
    n = o.shape[0]
    if split.trans is None:
        ts = jnp.full((n, n_slots), BIG, jnp.float32)
        ids = jnp.full((n, n_slots), -1.0, jnp.float32)
        tt = jnp.full(n, BIG, jnp.float32) if anyhit else None
        t_opq = trace_shadow_occl(split.full, o, t_limit,
                                  interpret=interpret, tt=tt)
        return t_opq, ts, ids
    # recover the trans build's cluster size from shapes (8 tris per row)
    tr_cl = split.trans.rows.shape[0] * 8 // (split.trans.meta.shape[0] // 8)
    _, ts, ids = trace_shadow_clusters(
        split.trans, o, t_limit, n_slots=n_slots, interpret=interpret,
        cluster=tr_cl, alpha_payload=alpha_payload)
    # slots are maintained ascending: ts[:, 0] is the nearest record
    # (BIG when the lane has none).
    tt = ts[:, 0] if anyhit else None
    t_opq = trace_shadow_occl(split.full, o, t_limit, interpret=interpret,
                              tt=tt)
    return t_opq, ts, ids
