"""Pallas tile rasterizer: binned, depth-tested primary visibility.

The reference's raster path is a hardware vertex/fragment pipeline
(reference: Game/ShadersRaster.metalinc:38-54 MVP transform,
Game/RenderPasses.swift:56-77 MainPass draw; depth test less/write,
Game/PipelineBuilder.swift:47-55). The TPU build owns rasterization:

  * **Setup (XLA, vectorized over T triangles):** clip-space transform,
    2D-homogeneous edge matrices, conservative screen AABBs, per-tile
    binning (AABB/tile overlap mask -> fixed-width candidate index lists).
    2D homogeneous rasterization (Olano & Greer 1997) needs NO near-plane
    clipping: the cofactor matrix of the (x, y, w) vertex rows gives
    per-pixel values lambda_i proportional to the perspective-correct
    world barycentrics, valid for triangles crossing w = 0.
  * **Raster kernel (Pallas, grid over screen tiles):** each program owns a
    (TILE_H x TILE_W) pixel block and loops over its tile's candidate list
    (count-bounded), evaluating the three edge forms over the whole pixel
    block on the VPU and keeping the nearest fragment by a division-free
    cross-multiplied depth test. Triangles are double-sided (the RT path
    flips normals toward the ray; parity).
  * **Resolve (XLA):** winner barycentrics -> world hit point -> ray t, so
    the output is a drop-in (t, tri, u, v, found) hit record identical in
    meaning to ops.rt_kernel.trace_batch_pallas — the deferred shading
    path is shared with the RT pipeline.

Depth peeling: pass ``prev_w`` (per-pixel view depth of the previous
layer) to rasterize the nearest fragment strictly BEHIND it — the raster
path's front-to-back alpha layering (the reference gets translucency from
fixed-function blending, PipelineBuilder.swift:37-45).
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

TILE_H = 32
_TILE_H_DEFAULT = 32
TILE_W = 128
# Max candidate triangles per tile. Overflowing tiles drop the excess for
# that frame (counted in the returned stats) — raise SGE_RASTER_K for
# pathological all-triangles-in-one-tile viewpoints.
RASTER_K = knob("SGE_RASTER_K")
# Cluster rasterizer (the round-3 default, see rasterize_clusters):
# triangles per cluster. Mesh-order clusters stay spatially tight; smaller
# clusters reject tighter but add per-cluster scalar overhead.
CLUSTER = knob("SGE_RASTER_CLUSTER")
assert CLUSTER % 8 == 0
# Candidate rows processed per loop iteration. The per-candidate vector
# work (3 edge dots + compares on a 32x128 block) is far below the VPU's
# issue width, so the loop is overhead-bound; unrolling amortizes it.
UNROLL = knob("SGE_RASTER_UNROLL")
assert RASTER_K % UNROLL == 0
BIG = np.float32(3.0e38)


class RasterHits(NamedTuple):
    t: jnp.ndarray        # (H*W,) ray t (BIG at misses)
    tri: jnp.ndarray      # (H*W,) int32 (-1 at misses)
    u: jnp.ndarray        # (H*W,)
    v: jnp.ndarray        # (H*W,)
    found: jnp.ndarray    # (H*W,) bool
    w_depth: jnp.ndarray  # (H*W,) view depth (for peeling)
    overflow: jnp.ndarray  # () int32 — tiles whose candidates exceeded K


def _setup(v0, v1, v2, view_proj, width, height, tiles_x, tiles_y):
    """Per-triangle edge matrices + tile bins (all vectorized XLA)."""
    vp = jnp.asarray(view_proj, jnp.float32)

    # clip_i = vp @ [p, 1]
    def tf(p):
        return p @ vp[:, :3].T + vp[:, 3]

    c0 = tf(v0)   # (T,4) rows of (x,y,z,w) clip coords
    c1 = tf(v1)
    c2 = tf(v2)

    # 2D homogeneous rows m_i = (x_i, y_i, w_i)
    r0 = jnp.stack([c0[:, 0], c0[:, 1], c0[:, 3]], axis=-1)
    r1 = jnp.stack([c1[:, 0], c1[:, 1], c1[:, 3]], axis=-1)
    r2 = jnp.stack([c2[:, 0], c2[:, 1], c2[:, 3]], axis=-1)
    # cofactor rows: lambda_i(p) = cof_i . (x_ndc, y_ndc, 1)
    cof0 = jnp.cross(r1, r2)
    cof1 = jnp.cross(r2, r0)
    cof2 = jnp.cross(r0, r1)
    det = jnp.sum(r0 * cof0, axis=-1)

    # Conservative screen AABB -> tile span. Fully-in-front triangles
    # project exactly; any triangle touching w <= eps spans the full screen.
    eps_w = 1e-6
    w_all = jnp.stack([c0[:, 3], c1[:, 3], c2[:, 3]], axis=-1)
    in_front = jnp.all(w_all > eps_w, axis=-1)
    safe_w = jnp.maximum(w_all, eps_w)
    xs = jnp.stack([c0[:, 0], c1[:, 0], c2[:, 0]], axis=-1) / safe_w
    ys = jnp.stack([c0[:, 1], c1[:, 1], c2[:, 1]], axis=-1) / safe_w
    # ndc -> pixel
    px = (xs * 0.5 + 0.5) * width
    py = (1.0 - (ys * 0.5 + 0.5)) * height
    x_min = jnp.where(in_front, jnp.min(px, axis=-1), 0.0)
    x_max = jnp.where(in_front, jnp.max(px, axis=-1), jnp.float32(width))
    y_min = jnp.where(in_front, jnp.min(py, axis=-1), 0.0)
    y_max = jnp.where(in_front, jnp.max(py, axis=-1), jnp.float32(height))

    degenerate = jnp.abs(det) < 1e-18
    tx0 = jnp.clip(jnp.floor(x_min / TILE_W), 0, tiles_x - 1).astype(jnp.int32)
    tx1 = jnp.clip(jnp.floor(x_max / TILE_W), 0, tiles_x - 1).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor(y_min / TILE_H), 0, tiles_y - 1).astype(jnp.int32)
    ty1 = jnp.clip(jnp.floor(y_max / TILE_H), 0, tiles_y - 1).astype(jnp.int32)
    offscreen = (x_max < 0) | (x_min > width) | (y_max < 0) | (y_min > height)
    cull = degenerate | offscreen

    # rows (T,16): cof (9), w (3), id (1), pad
    tcount = v0.shape[0]
    rows = jnp.concatenate([
        cof0, cof1, cof2,
        w_all,
        jnp.arange(tcount, dtype=jnp.float32)[:, None],
        jnp.zeros((tcount, 3), jnp.float32),
    ], axis=-1)

    # tile overlap mask (tiles, T)
    tiles = tiles_x * tiles_y
    t_ids = jnp.arange(tiles, dtype=jnp.int32)
    tyi = t_ids // tiles_x
    txi = t_ids % tiles_x
    overlap = ((txi[:, None] >= tx0[None, :]) & (txi[:, None] <= tx1[None, :]) &
               (tyi[:, None] >= ty0[None, :]) & (tyi[:, None] <= ty1[None, :]) &
               ~cull[None, :])

    counts_full = jnp.sum(overlap, axis=1).astype(jnp.int32)

    def tile_cands(row):
        return jnp.nonzero(row, size=RASTER_K, fill_value=tcount)[0]

    cands = jax.vmap(tile_cands)(overlap).astype(jnp.int32)     # (tiles, K)
    counts = jnp.minimum(counts_full, RASTER_K)
    overflowed = jnp.sum((counts_full > RASTER_K).astype(jnp.int32))
    # gather candidate rows; fill rows (idx == tcount) get id -1
    rows_pad = jnp.concatenate(
        [rows, jnp.full((1, 16), -1.0, jnp.float32)], axis=0)
    cand_rows = rows_pad[cands]                                 # (tiles, K, 16)
    return cand_rows, counts, overflowed


def _raster_kernel(count_ref, cand_ref, prevw_ref, id_out, b1_out, b2_out,
                   w_out, *, width, height, tiles_x):
    tile = pl.program_id(0)
    ty = tile // tiles_x
    tx = tile % tiles_x
    px = (tx * TILE_W +
          jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1)).astype(jnp.float32)
    py = (ty * TILE_H +
          jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)).astype(jnp.float32)
    x = (px + 0.5) * (2.0 / width) - 1.0
    y = 1.0 - (py + 0.5) * (2.0 / height)

    prev_w = prevw_ref[0]
    count = count_ref[tile]

    zn0 = jnp.full((TILE_H, TILE_W), BIG, jnp.float32)     # depth numerator
    zd0 = jnp.ones((TILE_H, TILE_W), jnp.float32)          # depth denominator
    id0 = jnp.full((TILE_H, TILE_W), -1.0, jnp.float32)
    l10 = jnp.zeros((TILE_H, TILE_W), jnp.float32)
    l20 = jnp.zeros((TILE_H, TILE_W), jnp.float32)

    def body(k, carry):
        # one dynamic sublane load of UNROLL candidate rows, then static
        # extracts per row; fill rows past ``count`` carry id -1 and fail
        # the s(12) >= 0 test, so a ragged final group needs no extra mask.
        rows = cand_ref[0, pl.ds(k * UNROLL, UNROLL), :]
        for j in range(UNROLL):
            zn, zd, tid, l1, l2 = carry

            def s(i):
                return rows[j, i]

            lam0 = s(0) * x + s(1) * y + s(2)
            lam1 = s(3) * x + s(4) * y + s(5)
            lam2 = s(6) * x + s(7) * y + s(8)
            sig = lam0 + lam1 + lam2
            flip = jnp.where(sig < 0, -1.0, 1.0)
            lam0 = lam0 * flip
            lam1 = lam1 * flip
            lam2 = lam2 * flip
            sig = sig * flip
            # sum_i lambda_i w_i == det(m) identically; evaluating it from
            # the per-pixel FLIPPED lambdas folds the orientation flip in,
            # so the fragment view depth is detp / sig and detp > 0 <=> in
            # front.
            detp = lam0 * s(9) + lam1 * s(10) + lam2 * s(11)

            inside = (jnp.minimum(jnp.minimum(lam0, lam1), lam2) >= 0.0) & \
                (sig > 1e-20) & (s(12) >= 0.0)
            front = detp > 0.0
            # depth = detp/sig; nearest wins: detp*zd < zn*sig (positive)
            nearer = detp * zd < zn * sig
            # depth peel: strictly behind the previous layer's view depth
            behind_prev = detp > prev_w * sig
            win = inside & front & nearer & behind_prev
            zn = jnp.where(win, detp, zn)
            zd = jnp.where(win, sig, zd)
            tid = jnp.where(win, s(12), tid)
            l1 = jnp.where(win, lam1, l1)
            l2 = jnp.where(win, lam2, l2)
            carry = (zn, zd, tid, l1, l2)
        return carry

    zn, zd, tid, l1, l2 = jax.lax.fori_loop(
        0, (count + UNROLL - 1) // UNROLL, body, (zn0, zd0, id0, l10, l20))

    inv = 1.0 / zd
    id_out[0] = tid.astype(jnp.int32)
    b1_out[0] = l1 * inv
    b2_out[0] = l2 * inv
    w_out[0] = jnp.where(tid >= 0, zn * inv, BIG)


def _raster_kernel_peeled(count_ref, cand_ref, id_out, b1_out, b2_out,
                          w_out, *, width, height, tiles_x, layers):
    """One pass over the tile's candidates keeping the ``layers`` nearest
    fragments per pixel (insertion network).

    Equivalent to ``layers`` sequential depth-peel passes but reads every
    candidate row once: each triangle is evaluated once per pixel, so the
    sequential version's re-win margin is unnecessary — a triangle can
    occupy at most one slot by construction. Distinct coplanar triangles
    each get a slot (the traced path's bias-offset continuation rays skip
    surfaces closer than ~2*bias; no such pair exists in practice — the
    peel parity test adjudicates)."""
    tile = pl.program_id(0)
    ty = tile // tiles_x
    tx = tile % tiles_x
    px = (tx * TILE_W +
          jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1)).astype(jnp.float32)
    py = (ty * TILE_H +
          jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)).astype(jnp.float32)
    x = (px + 0.5) * (2.0 / width) - 1.0
    y = 1.0 - (py + 0.5) * (2.0 / height)

    count = count_ref[tile]

    def empty():
        return (jnp.full((TILE_H, TILE_W), BIG, jnp.float32),
                jnp.ones((TILE_H, TILE_W), jnp.float32),
                jnp.full((TILE_H, TILE_W), -1.0, jnp.float32),
                jnp.zeros((TILE_H, TILE_W), jnp.float32),
                jnp.zeros((TILE_H, TILE_W), jnp.float32))

    init = sum((empty() for _ in range(layers)), ())

    def body(k, carry):
        slots = [list(carry[5 * l:5 * l + 5]) for l in range(layers)]
        rows = cand_ref[0, pl.ds(k * UNROLL, UNROLL), :]
        for j in range(UNROLL):
            def s(i):
                return rows[j, i]

            lam0 = s(0) * x + s(1) * y + s(2)
            lam1 = s(3) * x + s(4) * y + s(5)
            lam2 = s(6) * x + s(7) * y + s(8)
            sig = lam0 + lam1 + lam2
            flip = jnp.where(sig < 0, -1.0, 1.0)
            lam0 = lam0 * flip
            lam1 = lam1 * flip
            lam2 = lam2 * flip
            sig = sig * flip
            detp = lam0 * s(9) + lam1 * s(10) + lam2 * s(11)
            inside = (jnp.minimum(jnp.minimum(lam0, lam1), lam2) >= 0.0) & \
                (sig > 1e-20) & (s(12) >= 0.0) & (detp > 0.0)

            # candidate fragment; invalid lanes carry tid -1
            czn = detp
            czd = sig
            ctid = jnp.where(inside, s(12), -1.0)
            cl1, cl2 = lam1, lam2
            for l in range(layers):
                zn, zd, tid, l1, l2 = slots[l]
                win = (ctid >= 0.0) & ((tid < 0.0) | (czn * zd < zn * czd))
                nzn = jnp.where(win, czn, zn)
                nzd = jnp.where(win, czd, zd)
                ntid = jnp.where(win, ctid, tid)
                nl1 = jnp.where(win, cl1, l1)
                nl2 = jnp.where(win, cl2, l2)
                # displaced incumbent becomes the candidate for slot l+1
                czn, czd, ctid, cl1, cl2 = (
                    jnp.where(win, zn, czn), jnp.where(win, zd, czd),
                    jnp.where(win, tid, ctid), jnp.where(win, l1, cl1),
                    jnp.where(win, l2, cl2))
                slots[l] = [nzn, nzd, ntid, nl1, nl2]
        return sum((tuple(sl) for sl in slots), ())

    out = jax.lax.fori_loop(0, (count + UNROLL - 1) // UNROLL, body, init)
    for l in range(layers):
        zn, zd, tid, l1, l2 = out[5 * l:5 * l + 5]
        inv = 1.0 / zd
        id_out[0, l] = tid.astype(jnp.int32)
        b1_out[0, l] = l1 * inv
        b2_out[0, l] = l2 * inv
        w_out[0, l] = jnp.where(tid >= 0, zn * inv, BIG)


def rasterize_peeled(v0, v1, v2, view_proj, cam_pos, width: int, height: int,
                     layers: int, interpret: bool = False):
    """One-pass depth-peeled rasterization -> list of ``layers`` RasterHits
    (nearest fragment, second-nearest, ...). Shares all setup/binning work
    across layers; see _raster_kernel_peeled for the in-kernel insertion."""
    tiles_x = -(-width // TILE_W)
    tiles_y = -(-height // TILE_H)
    tiles = tiles_x * tiles_y

    cand_rows, counts, overflowed = _setup(v0, v1, v2, view_proj,
                                           width, height, tiles_x, tiles_y)

    kernel = partial(_raster_kernel_peeled, width=width, height=height,
                     tiles_x=tiles_x, layers=layers)
    tile_spec = pl.BlockSpec((1, layers, TILE_H, TILE_W),
                             lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    oshape = jax.ShapeDtypeStruct((tiles, layers, TILE_H, TILE_W),
                                  jnp.float32)
    tid, b1, b2, w = pl.pallas_call(
        kernel,
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec((tiles,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, RASTER_K, 16), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(tile_spec, tile_spec, tile_spec, tile_spec),
        out_shape=(
            jax.ShapeDtypeStruct((tiles, layers, TILE_H, TILE_W), jnp.int32),
            oshape, oshape, oshape,
        ),
        interpret=interpret,
    )(counts, cand_rows)

    def untile(a, l):
        img = a[:, l].reshape(tiles_y, tiles_x, TILE_H, TILE_W)
        img = img.transpose(0, 2, 1, 3).reshape(tiles_y * TILE_H,
                                                tiles_x * TILE_W)
        return img[:height, :width].reshape(-1)

    cam = jnp.asarray(cam_pos, jnp.float32)
    outs = []
    for l in range(layers):
        tid_l = untile(tid, l)
        b1_l = untile(b1, l)
        b2_l = untile(b2, l)
        w_l = untile(w, l)
        found = tid_l >= 0
        safe = jnp.maximum(tid_l, 0)
        b0 = 1.0 - b1_l - b2_l
        p_world = (b0[:, None] * v0[safe] + b1_l[:, None] * v1[safe] +
                   b2_l[:, None] * v2[safe])
        t = jnp.linalg.norm(p_world - cam, axis=-1)
        t = jnp.where(found, t, BIG)
        outs.append(RasterHits(t=t, tri=jnp.where(found, tid_l, -1),
                               u=b1_l, v=b2_l, found=found, w_depth=w_l,
                               overflow=overflowed))
    return outs


def rasterize(v0, v1, v2, view_proj, cam_pos, width: int, height: int,
              prev_w=None, interpret: bool = False) -> RasterHits:
    """Rasterize world-space triangles -> per-pixel hit records.

    Args:
      v0/v1/v2: (T,3) world-space triangle vertices (original tri order —
        returned ``tri`` ids index these directly).
      view_proj: (4,4) P @ V.
      cam_pos: (3,) camera position (for ray-t resolve).
      prev_w: optional (H*W,) view depth from a previous layer — rasterizes
        the nearest fragment strictly behind it (depth peeling).

    Returns RasterHits with flat scanline-ordered (H*W,) arrays.
    """
    tiles_x = -(-width // TILE_W)
    tiles_y = -(-height // TILE_H)
    tiles = tiles_x * tiles_y

    cand_rows, counts, overflowed = _setup(v0, v1, v2, view_proj,
                                           width, height, tiles_x, tiles_y)

    if prev_w is None:
        prev_tiles = jnp.zeros((tiles, TILE_H, TILE_W), jnp.float32)
    else:
        img = jnp.asarray(prev_w, jnp.float32).reshape(height, width)
        img = jnp.pad(img, ((0, tiles_y * TILE_H - height),
                            (0, tiles_x * TILE_W - width)),
                      constant_values=BIG)
        prev_tiles = img.reshape(tiles_y, TILE_H, tiles_x, TILE_W)
        prev_tiles = prev_tiles.transpose(0, 2, 1, 3).reshape(
            tiles, TILE_H, TILE_W)

    kernel = partial(_raster_kernel, width=width, height=height,
                     tiles_x=tiles_x)
    tile_spec = pl.BlockSpec((1, TILE_H, TILE_W), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    tid, b1, b2, w = pl.pallas_call(
        kernel,
        grid=(tiles,),
        in_specs=[
            # whole counts array in SMEM, indexed by program id (Mosaic
            # requires rank-1 blocks to cover the array or tile by 128)
            pl.BlockSpec((tiles,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, RASTER_K, 16), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            tile_spec,
        ],
        out_specs=(tile_spec, tile_spec, tile_spec, tile_spec),
        out_shape=(
            jax.ShapeDtypeStruct((tiles, TILE_H, TILE_W), jnp.int32),
            jax.ShapeDtypeStruct((tiles, TILE_H, TILE_W), jnp.float32),
            jax.ShapeDtypeStruct((tiles, TILE_H, TILE_W), jnp.float32),
            jax.ShapeDtypeStruct((tiles, TILE_H, TILE_W), jnp.float32),
        ),
        interpret=interpret,
    )(counts, cand_rows, prev_tiles)

    def untile(a):
        img = a.reshape(tiles_y, tiles_x, TILE_H, TILE_W)
        img = img.transpose(0, 2, 1, 3).reshape(tiles_y * TILE_H,
                                                tiles_x * TILE_W)
        return img[:height, :width].reshape(-1)

    tid = untile(tid)
    b1 = untile(b1)
    b2 = untile(b2)
    w = untile(w)

    found = tid >= 0
    safe = jnp.maximum(tid, 0)
    b0 = 1.0 - b1 - b2
    p_world = (b0[:, None] * v0[safe] + b1[:, None] * v1[safe] +
               b2[:, None] * v2[safe])
    t = jnp.linalg.norm(p_world - jnp.asarray(cam_pos, jnp.float32), axis=-1)
    t = jnp.where(found, t, BIG)
    return RasterHits(t=t, tri=jnp.where(found, tid, -1), u=b1, v=b2,
                      found=found, w_depth=w, overflow=overflowed)


# ---------------------------------------------------------------------------
# Cluster rasterizer — the round-3 redesign of binned visibility.
#
# The list-based path above pays for EXACT per-tile candidate lists: a
# (tiles, T) overlap mask, a per-tile jnp.nonzero (sort-based: measured
# 111 ms of a 120 ms rasterize at 960x540/67k tris), and a (tiles, K, 16)
# candidate gather (30 ms). The cluster path removes all three:
#
#   * Triangles stay in their ORIGINAL mesh order (spatially coherent by
#     construction — flatten_frame emits meshes contiguously) and are
#     grouped into fixed runs of CLUSTER. No per-triangle reordering, no
#     gathers: the kernel indexes the shared (T, 16) row table directly.
#   * Per frame, XLA computes one conservative screen AABB + min view
#     depth per CLUSTER (cheap segment reductions), sorts the ~T/CLUSTER
#     cluster METADATA front-to-back (hundreds of keys, not millions of
#     pairs), and hands the kernel a flat SMEM table.
#   * The kernel walks clusters in depth order: a scalar AABB test rejects
#     clusters that miss the tile before any vector work, and the walk
#     STOPS once every pixel's last peel slot is nearer than the next
#     cluster's min depth (front-to-back occlusion culling — the
#     reference's raster path gets this from the hardware early-Z unit,
#     Game/PipelineBuilder.swift:47-55 depth test less/write).
#
# Completeness by construction (every triangle is in exactly one cluster,
# every cluster is tested against every tile it can touch), so there is no
# RASTER_K overflow mode — un-decimated scenes just add clusters.
# ---------------------------------------------------------------------------


def _setup_clusters(v0, v1, v2, view_proj, width, height, opaque=None,
                    cluster: int = 0, ids=None):
    """Per-triangle edge rows + front-to-back sorted cluster metadata.

    Returns (rows (Tp, 16), meta (C*8,) flat f32, n_clusters). Row layout
    matches _setup 0:13: cof0 cof1 cof2 (9), w (3), id (1); lane 13 carries
    the per-triangle opaque flag (0/1). Meta layout per cluster:
    [x0, y0, x1, y1, w_min, base_row, 0, 0] sorted by w_min.

    ``opaque``: optional (T,) bool — fragments of opaque triangles
    TERMINATE their pixel for the early-exit bound (layers behind an
    opaque fragment are never shaded: front-to-back alpha accumulation
    saturates). Omitting it is always correct, just exits later when
    layers > 1 over open geometry.

    All math runs on (T,) COLUMN arrays: ops on (T, 3)-shaped arrays put
    the 3-wide minor dim on the 128-lane axis (97% lane waste + relayouts
    between every op — measured 25 ms for the transform+cofactor step
    alone at 67k triangles; the column form is < 2 ms).
    """
    vp = np.asarray(view_proj, np.float32) if not isinstance(
        view_proj, jnp.ndarray) else view_proj
    vp = jnp.asarray(vp, jnp.float32)

    def tfc(p):
        """Clip-space columns (x, y, w), each (T,)."""
        x, y, z = p[:, 0], p[:, 1], p[:, 2]
        cx = vp[0, 0] * x + vp[0, 1] * y + vp[0, 2] * z + vp[0, 3]
        cy = vp[1, 0] * x + vp[1, 1] * y + vp[1, 2] * z + vp[1, 3]
        cw = vp[3, 0] * x + vp[3, 1] * y + vp[3, 2] * z + vp[3, 3]
        return cx, cy, cw

    x0c, y0c, w0c = tfc(v0)
    x1c, y1c, w1c = tfc(v1)
    x2c, y2c, w2c = tfc(v2)

    def cross_cols(ax, ay, az, bx, by, bz):
        return (ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx)

    cof0x, cof0y, cof0z = cross_cols(x1c, y1c, w1c, x2c, y2c, w2c)
    cof1x, cof1y, cof1z = cross_cols(x2c, y2c, w2c, x0c, y0c, w0c)
    cof2x, cof2y, cof2z = cross_cols(x0c, y0c, w0c, x1c, y1c, w1c)
    det = x0c * cof0x + y0c * cof0y + w0c * cof0z

    eps_w = 1e-6
    in_front = (w0c > eps_w) & (w1c > eps_w) & (w2c > eps_w)

    def pix(xc, wc, extent, flip_y):
        ndc = xc / jnp.maximum(wc, eps_w)
        v = ndc * 0.5 + 0.5
        if flip_y:
            v = 1.0 - v
        return v * extent

    px0 = pix(x0c, w0c, width, False)
    px1 = pix(x1c, w1c, width, False)
    px2 = pix(x2c, w2c, width, False)
    py0 = pix(y0c, w0c, height, True)
    py1 = pix(y1c, w1c, height, True)
    py2 = pix(y2c, w2c, height, True)
    x_min = jnp.where(in_front, jnp.minimum(jnp.minimum(px0, px1), px2), 0.0)
    x_max = jnp.where(in_front, jnp.maximum(jnp.maximum(px0, px1), px2),
                      jnp.float32(width))
    y_min = jnp.where(in_front, jnp.minimum(jnp.minimum(py0, py1), py2), 0.0)
    y_max = jnp.where(in_front, jnp.maximum(jnp.maximum(py0, py1), py2),
                      jnp.float32(height))

    degenerate = jnp.abs(det) < 1e-18
    offscreen = (x_max < 0) | (x_min > width) | (y_max < 0) | (y_min > height)
    cull = degenerate | offscreen
    # Culled triangles keep an EMPTY aabb (never fatten their cluster) and
    # a BIG depth key; degenerate ones additionally drop their id so the
    # in-kernel inside test can never accept them. Off-screen triangles
    # keep their id — any pixel they could win is off-screen by definition.
    x_min = jnp.where(cull, BIG, x_min)
    x_max = jnp.where(cull, -BIG, x_max)
    y_min = jnp.where(cull, BIG, y_min)
    y_max = jnp.where(cull, -BIG, y_max)
    # Fragment view depth detp/sig is a convex combination of vertex w's
    # over the positive-barycentric region intersected with detp > 0, so
    # max(min_i w_i, 0) is a valid per-triangle lower bound (exact for
    # fully-in-front triangles, conservative for near-plane crossers).
    w_min = jnp.where(cull, BIG,
                      jnp.maximum(jnp.minimum(jnp.minimum(w0c, w1c), w2c),
                                  0.0))

    tcount = v0.shape[0]
    if ids is None:
        ids = jnp.arange(tcount, dtype=jnp.float32)
    else:
        # caller-supplied ORIGINAL triangle ids: subset rasters then emit
        # global ids directly — a post-hoc (P,) id remap gather costs
        # ~4.8 ms per image-sized array on v5e (scalar 1-D gathers lower
        # at ~1.4 GB/s, unlike fast row gathers)
        ids = jnp.asarray(ids, jnp.float32)
    ids = jnp.where(degenerate, -1.0, ids)
    if opaque is None:
        opq = jnp.zeros(tcount, jnp.float32)
    else:
        opq = jnp.asarray(opaque, jnp.float32)
    zero = jnp.zeros(tcount, jnp.float32)
    rows = jnp.stack([
        cof0x, cof0y, cof0z, cof1x, cof1y, cof1z, cof2x, cof2y, cof2z,
        w0c, w1c, w2c, ids, opq, zero, zero,
    ], axis=-1)

    cl = cluster or CLUSTER
    pad = (-tcount) % cl
    if pad:
        fill = jnp.full((pad, 16), -1.0, jnp.float32)
        rows = jnp.concatenate([rows, fill], axis=0)
        x_min = jnp.concatenate([x_min, jnp.full(pad, BIG)])
        x_max = jnp.concatenate([x_max, jnp.full(pad, -BIG)])
        y_min = jnp.concatenate([y_min, jnp.full(pad, BIG)])
        y_max = jnp.concatenate([y_max, jnp.full(pad, -BIG)])
        w_min = jnp.concatenate([w_min, jnp.full(pad, BIG)])
    tp = rows.shape[0]
    n_clusters = tp // cl
    # Lane-packed layout: 8 triangles (16 lanes each) per (1, 128) row —
    # a (Tp, 16) f32 VMEM operand would lane-pad 16 -> 128 (8x memory: the
    # demo scene's 4.3 MB of rows became a 34 MB scoped-VMEM request).
    rows = rows.reshape(tp // 8, 128)

    def creduce(a, fn):
        return fn(a.reshape(n_clusters, cl), axis=1)

    cx0 = creduce(x_min, jnp.min)
    cx1 = creduce(x_max, jnp.max)
    cy0 = creduce(y_min, jnp.min)
    cy1 = creduce(y_max, jnp.max)
    cw = creduce(w_min, jnp.min)

    order = jnp.argsort(cw)
    base = (order * (cl // 8)).astype(jnp.float32)  # packed-row index
    meta = jnp.stack([cx0[order], cy0[order], cx1[order], cy1[order],
                      cw[order], base,
                      jnp.zeros_like(base), jnp.zeros_like(base)], axis=-1)
    return rows, meta.reshape(-1), n_clusters


def _cluster_kernel(*refs,
                    width, height, tiles_x, layers, n_clusters,
                    cluster: int = 0, tile_h: int = 0,
                    use_lists: bool = False, stream: bool = False,
                    prior: bool = False):
    """Front-to-back cluster walk with per-tile scalar AABB reject and
    occlusion early-exit; keeps the ``layers`` nearest fragments per pixel
    (insertion network, as _raster_kernel_peeled).

    ``use_lists``: the walk reads this tile's PRECOMPUTED candidate
    clusters (depth-ordered, XLA-built overlap lists — see
    _tile_cluster_lists) instead of scalar-scanning every cluster.

    ``stream``: the row table stays in HBM (beyond-VMEM triangle counts —
    the un-decimated path); each PROCESSED cluster's rows are DMA'd into a
    VMEM scratch window before its group loop. Rejected clusters cost no
    DMA, so traffic is (processed clusters x cluster rows), not T."""
    if stream:
        buf_ref, sem = refs[-2], refs[-1]
        refs = refs[:-2]
    prior_ref = None
    if use_lists:
        (lists_ref, meta_ref, rows_ref, id_out, b1_out, b2_out,
         w_out) = refs
    elif prior:
        (meta_ref, rows_ref, prior_ref, id_out, b1_out, b2_out,
         w_out) = refs
    else:
        lists_ref = None
        meta_ref, rows_ref, id_out, b1_out, b2_out, w_out = refs
    TILE_H = tile_h or _TILE_H_DEFAULT
    tile = pl.program_id(0)
    ty = tile // tiles_x
    tx = tile % tiles_x
    pxi = (tx * TILE_W +
           jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1))
    pyi = (ty * TILE_H +
           jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0))
    px = pxi.astype(jnp.float32)
    py = pyi.astype(jnp.float32)
    x = (px + 0.5) * (2.0 / width) - 1.0
    y = 1.0 - (py + 0.5) * (2.0 / height)
    # Pixels beyond the image (tile padding) count as covered at depth 0 so
    # they never hold the early exit open.
    pixel_ok = (pxi < width) & (pyi < height)
    # Prior per-pixel view-depth bound (round 4): the hybrid mode's
    # translucent raster passes the OPAQUE raster's depth — fragments at or
    # behind it can never be shaded (the record merge keeps only
    # translucent hits strictly in front of the opaque hit), so they are
    # rejected inline AND the front-to-back early-exit bound starts at the
    # opaque depth instead of BIG.
    pb = prior_ref[0] if prior else None

    tile_x0 = jnp.float32(1.0) * tx.astype(jnp.float32) * TILE_W
    tile_y0 = jnp.float32(1.0) * ty.astype(jnp.float32) * TILE_H
    tile_x1 = tile_x0 + TILE_W
    tile_y1 = tile_y0 + TILE_H

    def empty():
        return (jnp.full((TILE_H, TILE_W), BIG, jnp.float32),
                jnp.ones((TILE_H, TILE_W), jnp.float32),
                jnp.full((TILE_H, TILE_W), -1.0, jnp.float32),
                jnp.zeros((TILE_H, TILE_W), jnp.float32),
                jnp.zeros((TILE_H, TILE_W), jnp.float32))

    init_slots = sum((empty() for _ in range(layers)), ())
    # Opaque-termination track (layers > 1): nearest OPAQUE fragment depth
    # per pixel as a division-free (numerator, denominator) pair. Slots
    # behind it can never be shaded (alpha accumulation saturates at the
    # opaque layer), so the early-exit bound is min(opaque, last slot).
    track_opq = layers > 1
    if track_opq:
        init_slots = init_slots + (
            jnp.full((TILE_H, TILE_W), BIG, jnp.float32),
            jnp.ones((TILE_H, TILE_W), jnp.float32))

    def do_cluster(base_i, slots_flat):
        # base_i indexes PACKED rows (8 triangles of 16 lanes per row)
        if stream:
            cl8 = (cluster or CLUSTER) // 8
            copy = pltpu.make_async_copy(
                rows_ref.at[pl.ds(base_i, cl8), :], buf_ref, sem)
            copy.start()
            copy.wait()

        def group(g, slots_flat):
            slots = [list(slots_flat[5 * l:5 * l + 5]) for l in range(layers)]
            if track_opq:
                on, od = slots_flat[5 * layers], slots_flat[5 * layers + 1]
            if stream:
                rows = buf_ref[pl.ds(g, 1), :]
            else:
                rows = rows_ref[pl.ds(base_i + g, 1), :]
            for j in range(8):
                def s(i):
                    return rows[0, j * 16 + i]

                lam0 = s(0) * x + s(1) * y + s(2)
                lam1 = s(3) * x + s(4) * y + s(5)
                lam2 = s(6) * x + s(7) * y + s(8)
                sig = lam0 + lam1 + lam2
                flip = jnp.where(sig < 0, -1.0, 1.0)
                lam0 = lam0 * flip
                lam1 = lam1 * flip
                lam2 = lam2 * flip
                sig = sig * flip
                detp = lam0 * s(9) + lam1 * s(10) + lam2 * s(11)
                inside = (jnp.minimum(jnp.minimum(lam0, lam1), lam2) >= 0.0) \
                    & (sig > 1e-20) & (s(12) >= 0.0) & (detp > 0.0)
                if prior:
                    inside = inside & (detp < pb * sig)

                czn = detp
                czd = sig
                ctid = jnp.where(inside, s(12), -1.0)
                cl1, cl2 = lam1, lam2
                for l in range(layers):
                    zn, zd, tid, l1, l2 = slots[l]
                    win = (ctid >= 0.0) & ((tid < 0.0) | (czn * zd < zn * czd))
                    nzn = jnp.where(win, czn, zn)
                    nzd = jnp.where(win, czd, zd)
                    ntid = jnp.where(win, ctid, tid)
                    nl1 = jnp.where(win, cl1, l1)
                    nl2 = jnp.where(win, cl2, l2)
                    czn, czd, ctid, cl1, cl2 = (
                        jnp.where(win, zn, czn), jnp.where(win, zd, czd),
                        jnp.where(win, tid, ctid), jnp.where(win, l1, cl1),
                        jnp.where(win, l2, cl2))
                    slots[l] = [nzn, nzd, ntid, nl1, nl2]
                if track_opq:
                    owin = inside & (s(13) > 0.5) & (detp * od < on * sig)
                    on = jnp.where(owin, detp, on)
                    od = jnp.where(owin, sig, od)
            out = sum((tuple(sl) for sl in slots), ())
            if track_opq:
                out = out + (on, od)
            return out

        return jax.lax.fori_loop(0, (cluster or CLUSTER) // 8, group,
                                 slots_flat)

    if use_lists:
        count = lists_ref[0, 0, 0]

        def cond(c):
            return (c[0] < count) & (c[1] < 0.5)
    else:
        def cond(c):
            return (c[0] < n_clusters) & (c[1] < 0.5)

    def body(c):
        j = c[0]
        bound = c[2]
        slots_flat = c[3:]
        if use_lists:
            ci = lists_ref[0, 0, 1 + j]
        else:
            ci = j
        cx0 = meta_ref[ci * 8 + 0]
        cy0 = meta_ref[ci * 8 + 1]
        cx1 = meta_ref[ci * 8 + 2]
        cy1 = meta_ref[ci * 8 + 3]
        cw = meta_ref[ci * 8 + 4]
        base_i = meta_ref[ci * 8 + 5].astype(jnp.int32)
        # Sorted ascending by w_min: once the farthest last-slot fragment
        # is nearer than this cluster's min depth, no later cluster can
        # displace anything (strictly-nearer wins).
        stop = jnp.where(cw >= bound, 1.0, 0.0)
        if use_lists:
            process = stop < 0.5   # overlap pretested in XLA
        else:
            overlap = (cx0 <= tile_x1) & (cx1 >= tile_x0) & \
                (cy0 <= tile_y1) & (cy1 >= tile_y0)
            process = overlap & (stop < 0.5)

        slots_flat = jax.lax.cond(
            process, lambda sf: do_cluster(base_i, sf), lambda sf: sf,
            slots_flat)

        def new_bound(sf):
            zn, zd, tid = sf[5 * (layers - 1)], sf[5 * (layers - 1) + 1], \
                sf[5 * (layers - 1) + 2]
            depth = jnp.where(tid >= 0.0, zn / zd, BIG)
            if track_opq:
                depth = jnp.minimum(depth, sf[5 * layers] /
                                    sf[5 * layers + 1])
            if prior:
                depth = jnp.minimum(depth, pb)
            depth = jnp.where(pixel_ok, depth, 0.0)
            return jnp.max(depth)

        bound = jax.lax.cond(process, new_bound, lambda sf: bound, slots_flat)
        return (j + 1, stop, bound) + slots_flat

    if prior:
        bound0 = jnp.max(jnp.where(pixel_ok, pb, 0.0))
    else:
        bound0 = BIG * jnp.float32(1.0)
    init = (jnp.int32(0), jnp.float32(0.0), bound0) + \
        init_slots
    out = jax.lax.while_loop(cond, body, init)
    slots_flat = out[3:]
    for l in range(layers):
        zn, zd, tid, l1, l2 = slots_flat[5 * l:5 * l + 5]
        inv = 1.0 / zd
        id_out[0, l] = tid.astype(jnp.int32)
        b1_out[0, l] = l1 * inv
        b2_out[0, l] = l2 * inv
        w_out[0, l] = jnp.where(tid >= 0, zn * inv, BIG)


def _tile_cluster_lists(meta, tiles_x: int, tiles_y: int, tile_h: int):
    """Per-tile candidate cluster lists, built in XLA (massively parallel)
    so the kernel never scalar-scans non-overlapping clusters.

    ``meta``: depth-sorted flat (C*8,) cluster metadata from
    _setup_clusters. Returns (tiles, 1 + C) int32: [count, ci0, ci1, ...]
    with candidate cluster indices in the SAME global depth order (argsort
    of the inverted overlap mask is stable, so set bits keep their order —
    the kernel's early-exit bound logic is unchanged)."""
    m = meta.reshape(-1, 8)
    c = m.shape[0]
    t_ids = jnp.arange(tiles_x * tiles_y, dtype=jnp.int32)
    tx0 = (t_ids % tiles_x).astype(jnp.float32) * TILE_W
    ty0 = (t_ids // tiles_x).astype(jnp.float32) * tile_h
    overlap = ((m[None, :, 0] <= tx0[:, None] + TILE_W) &
               (m[None, :, 2] >= tx0[:, None]) &
               (m[None, :, 1] <= ty0[:, None] + tile_h) &
               (m[None, :, 3] >= ty0[:, None]))
    order = jnp.argsort(~overlap, axis=1, stable=True).astype(jnp.int32)
    count = jnp.sum(overlap, axis=1).astype(jnp.int32)
    return jnp.concatenate([count[:, None], order], axis=1)


# Row tables beyond this many bytes stream from HBM (see _cluster_kernel
# ``stream``): the scoped-VMEM budget is ~16 MB shared with the tile
# outputs, so un-decimated triangle counts cannot hold the whole table.
_ROWS_VMEM_MAX = knob("SGE_RASTER_ROWS_VMEM")


def rasterize_clusters(v0, v1, v2, view_proj, cam_pos, width: int,
                       height: int, layers: int = 1,
                       interpret: bool = False, opaque=None,
                       cluster: int = 0, tile_h: int = 0,
                       lists: bool = False, stream=None,
                       flat_tiles: bool = False, ids=None, resolve_v=None,
                       prior_w=None, resolve_t=True):
    """Cluster-binned depth-peeled rasterization -> list of ``layers``
    RasterHits (nearest fragment first). See the cluster section docstring;
    no candidate-count overflow mode exists (complete by construction).
    ``opaque``: optional (T,) bool enabling opaque pixel termination for
    the early-exit bound (see _setup_clusters).
    ``stream``: keep the row table in HBM and DMA processed clusters into
    a VMEM window (None = auto by table size) — removes the VMEM triangle
    cliff for un-decimated scenes.
    ``flat_tiles``: return arrays in PADDED TILE-MAJOR lane order (the
    kernel's native output order, matching camera.generate_rays_tiled) —
    a pure reshape, no untile transpose and no crop. Out-of-image tile
    padding lanes carry whatever fragments project there.
    ``ids``: optional (T,) ORIGINAL triangle ids baked into the rows (for
    subset rasters — returned ``tri`` then indexes the global scene);
    ``resolve_v`` must then supply the (gv0, gv1, gv2) GLOBAL vertex
    arrays for the hit-point resolve.
    ``prior_w``: optional per-pixel view-depth upper bound in FLAT
    TILE-MAJOR lane order (requires flat_tiles + matching tile_h), e.g.
    the opaque raster's w_depth — fragments at or behind it are rejected
    and the early-exit bound starts there (see _cluster_kernel).
    ``resolve_t=False`` skips the gather-based world-hit-point ray-t
    resolve (three (P,3) vertex gathers per layer — ~16 ms/frame at
    960x540); ``t`` is then returned as the raw view depth ``w`` and the
    caller converts with the exact algebraic t = (w - w(cam)) /
    (vp[3,:3]@d) per lane."""
    th = tile_h or _TILE_H_DEFAULT
    tiles_x = -(-width // TILE_W)
    tiles_y = -(-height // th)
    tiles = tiles_x * tiles_y

    rows, meta, n_clusters = _setup_clusters(v0, v1, v2, view_proj,
                                             width, height, opaque=opaque,
                                             cluster=cluster, ids=ids)
    rv0, rv1, rv2 = (v0, v1, v2) if resolve_v is None else resolve_v
    if stream is None:
        stream = rows.shape[0] * 128 * 4 > _ROWS_VMEM_MAX

    assert prior_w is None or (flat_tiles and not lists), \
        "prior_w needs flat_tiles lane order (and is unsupported with lists)"
    kernel = partial(_cluster_kernel, width=width, height=height,
                     tiles_x=tiles_x, layers=layers, n_clusters=n_clusters,
                     cluster=cluster, tile_h=th, use_lists=lists,
                     stream=stream, prior=prior_w is not None)
    tile_spec = pl.BlockSpec((1, layers, th, TILE_W),
                             lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    oshape = jax.ShapeDtypeStruct((tiles, layers, th, TILE_W),
                                  jnp.float32)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.ANY) if stream
        else pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    operands = [meta, rows]
    if lists:
        tl = _tile_cluster_lists(meta, tiles_x, tiles_y, th)
        # (tiles, 1, C+1) with block (1, 1, C+1): the last two block dims
        # EQUAL the array dims (the TPU lowering rejects a (1, C+1) block
        # of a 2D array — 1 is neither divisible by 8 nor == tiles).
        tl = tl[:, None, :]
        in_specs.insert(0, pl.BlockSpec((1, 1, tl.shape[2]),
                                        lambda i: (i, 0, 0),
                                        memory_space=pltpu.SMEM))
        operands.insert(0, tl)
    if prior_w is not None:
        pw = jnp.asarray(prior_w, jnp.float32).reshape(tiles, th, TILE_W)
        in_specs.append(pl.BlockSpec((1, th, TILE_W), lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(pw)
    scratch = []
    if stream:
        scratch = [pltpu.VMEM(((cluster or CLUSTER) // 8, 128), jnp.float32),
                   pltpu.SemaphoreType.DMA]
    tid, b1, b2, w = pl.pallas_call(
        kernel,
        grid=(tiles,),
        in_specs=in_specs,
        out_specs=(tile_spec, tile_spec, tile_spec, tile_spec),
        out_shape=(
            jax.ShapeDtypeStruct((tiles, layers, th, TILE_W), jnp.int32),
            oshape, oshape, oshape,
        ),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*operands)

    if flat_tiles:
        def untile(a, l):
            return a[:, l].reshape(-1)
    else:
        def untile(a, l):
            img = a[:, l].reshape(tiles_y, tiles_x, th, TILE_W)
            img = img.transpose(0, 2, 1, 3).reshape(tiles_y * th,
                                                    tiles_x * TILE_W)
            return img[:height, :width].reshape(-1)

    cam = jnp.asarray(cam_pos, jnp.float32)
    overflow = jnp.int32(0)
    outs = []
    for l in range(layers):
        tid_l = untile(tid, l)
        b1_l = untile(b1, l)
        b2_l = untile(b2, l)
        w_l = untile(w, l)
        found = tid_l >= 0
        if resolve_t:
            safe = jnp.maximum(tid_l, 0)
            b0 = 1.0 - b1_l - b2_l
            p_world = (b0[:, None] * rv0[safe] + b1_l[:, None] * rv1[safe] +
                       b2_l[:, None] * rv2[safe])
            t = jnp.linalg.norm(p_world - cam, axis=-1)
            t = jnp.where(found, t, BIG)
        else:
            t = jnp.where(found, w_l, BIG)
        outs.append(RasterHits(t=t, tri=jnp.where(found, tid_l, -1),
                               u=b1_l, v=b2_l, found=found, w_depth=w_l,
                               overflow=overflow))
    return outs
