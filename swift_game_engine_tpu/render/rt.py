"""Ray-traced render path: the TPU equivalent of the reference's RT kernel.

Faithful restructuring of Game/RayTracing.metalinc:197-730 raytraceKernel as
batched array ops over all pixels in lockstep:

  * up to 3 front-to-back transparency layers with alpha accumulation
  * per-hit PBR direct lighting (GGX) per directional light, with
    alpha-filtered shadow rays (<= 4 layers) for light 0
  * SH-L1 ambient x occlusion; split-sum specular IBL x occlusion
  * one deterministic mirror bounce for roughness <= 0.08 & metallic >= 0.8
    (bounce shading = direct + ambient + emissive, incl. its own shadows)
  * one refraction bounce for transmission > 0 with IOR eta flip and a
    Fresnel mix
  * 0.02/0.02/0.03 background + screen-space hash dither

Divergence control: every branch is a lane mask; masked rays enter traversal
with node=-1 and idle until the lockstep loop drains.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import numpy as np
import jax.numpy as jnp

from ..math3d import normalize
from . import bvh as B
from .ibl import IBL, eval_env_sh, eval_spec_ibl, sample_env
from .scene_geometry import (SceneGeometry, FrameGeometry,
                             texture_usage, TextureUsage)
from .shading import (eval_brdf, fresnel_schlick, fresnel_schlick3,
                      shadow_bias, hash12, apply_normal_map, reflect, refract)
from .textures import sample_bilinear

BG_COLOR = np.array([0.02, 0.02, 0.03], np.float32)
AMBIENT_INTENSITY = 0.25  # RayTracingRenderer.swift:82
BIG = np.float32(3.0e38)
# No-specialization fallback: sample every slot (used when callers pass
# usage=None, e.g. direct API use outside render_frame).
FULL_USAGE = TextureUsage(True, True, True, True, True, True)


class DirectionalLights(NamedTuple):
    """reference: Game/Lights.swift:10-28 / RTDirectionalLight."""

    direction: jnp.ndarray     # (L,3)
    intensity: jnp.ndarray     # (L,)
    color: jnp.ndarray         # (L,3)
    enabled: jnp.ndarray       # (L,) bool
    max_distance: jnp.ndarray  # (L,)

    @staticmethod
    def default_sun():
        """RayTracingRenderer.swift:163-168 fallback sun."""
        return DirectionalLights(
            direction=jnp.array([[-0.2, -1.0, -0.4]]),
            intensity=jnp.array([2.6]),
            color=jnp.array([[1.0, 0.95, 0.85]]),
            enabled=jnp.array([True]),
            max_distance=jnp.array([200.0]))

    @staticmethod
    def from_list(lights):
        if not lights:
            return DirectionalLights.default_sun()
        return DirectionalLights(
            direction=jnp.asarray([l["direction"] for l in lights], jnp.float32),
            intensity=jnp.asarray([l["intensity"] for l in lights], jnp.float32),
            color=jnp.asarray([l["color"] for l in lights], jnp.float32),
            enabled=jnp.asarray([l.get("enabled", True) for l in lights]),
            max_distance=jnp.asarray([l.get("max_distance", 200.0) for l in lights],
                                     jnp.float32))


import os
from ..config import knob

# The Pallas packet kernel is the production traversal; the pure-JAX
# stackless path remains as the reference implementation (and for backends
# where Mosaic is unavailable, via interpret mode on tiny scenes).
_FORCE_JAX_TRAVERSAL = bool(knob("SGE_JAX_TRAVERSAL"))
# Opt-in any-hit opaque shadow prepass (ops/rt_kernel.trace_shadow_any):
# wins when shadow loops run many layers (L1S4: 224 -> 205 ms) but adds a
# fixed pass per shade call that loses at the default L3S4+bounces config
# (399 -> 426 ms), and it resolves opaque blockers hidden behind
# shadow_layers translucent hits, which the reference's layer cap misses —
# off by default for exact reference semantics.
_SHADOW_PREPASS = bool(knob("SGE_SHADOW_PREPASS"))
# Shared-direction shadow-factor kernel (ops/rt_kernel.trace_shadow_factor):
# one walk yields the nearest opaque t + the <=shadow_layers nearest
# translucent hits per lane; the exact reference layer semantics (alpha
# product, 0.02 early-out, layer cap) are applied as elementwise XLA on
# those records. Measured on one v5e @960x540 demo frame under an identical
# probe (examples/prof_isolate.py): 555.7 ms vs 596.9 ms full frame with the
# per-layer loop.
_SHADOW_KERNEL = bool(knob("SGE_SHADOW_KERNEL"))
# Shared-origin closest-hit kernel for primary + transparency-layer traces
# (ops/rt_kernel shared-origin section): leaf tests become 3 dot products
# against per-frame constants; layers 2+ re-trace the camera ray with a t
# floor instead of an offset origin. Measured on one v5e @960x540 heavy
# view (prof_isolate shadow_kernel): 560.3 vs 564.9 ms/frame — ~neutral,
# because interior traversal steps + shadow + shade dominate, not leaf
# tests. Kept default-on: never slower, and the t-floor continuation
# avoids rebuilding offset-origin ray state for layers 2+.
_SO_KERNEL = bool(knob("SGE_RT_SO"))
# Profiling knob: drop the split-sum specular IBL term.
_NO_SPEC_IBL = bool(knob("SGE_NO_SPEC_IBL"))
# Cluster shadow kernel (ops.cluster_shadow): shared-direction shadow
# records from depth-sorted light-space clusters instead of a BVH walk.
# Takes precedence over the shadow-factor walk when enabled. Default ON:
# measured on one v5e @960x540 DemoScene bench (steady-state pipelined,
# identical records): 3.60 fps vs 3.50 fps with the BVH-walk shadow kernel
# — the depth-sorted cluster sweep with per-packet light-space AABB reject
# replaces the serial packet walk; modest on the full frame because
# visibility traces, not shadows, dominate at the current defaults.
_SHADOW_CLUSTERS = bool(knob("SGE_SHADOW_CLUSTERS"))
# Per-packet candidate cluster lists for the shadow kernel (XLA-built
# light-space overlap lists; the kernel then never scalar-scans
# non-overlapping clusters). See ops.cluster_shadow._packet_cluster_lists.
_SHADOW_LISTS = bool(knob("SGE_SHADOW_LISTS"))
# Split shadow kernels (round 4, ops.cluster_shadow.ShadowSplit): a cheap
# occlusion-only sweep over all triangles (nearest opaque t, no insertion
# network) + the slotted kernel over ONLY the compacted translucent subset.
# Identical records to the single slotted sweep (measured on one v5e
# @960x540 demo frame: shadow records pass 64.4 -> ~24 ms).
_SHADOW_SPLIT = bool(knob("SGE_SHADOW_SPLIT"))
# Any-hit occlusion sweep (round 5): the split path runs the translucent
# sweep FIRST and settles an occlusion lane as soon as SOME opaque hit
# precedes the lane's nearest translucent record — the factor is 0 either
# way (see trace_shadow_split anyhit=). Factor-exact, record-approximate.
_SHADOW_ANYHIT = bool(knob("SGE_SHADOW_ANYHIT", 1))
# Scene-AABB exit bound on shadow-ray t (exact; A/B knob)
_SHADOW_TEXIT = bool(knob("SGE_SHADOW_TEXIT", 1))
# Axon-backend workaround (round 4): the cluster-shadow kernels inside the
# fused frame program CRASH the TPU worker at small resolutions (observed:
# 320x180 with max_layers=3 — 3+ cluster-sweep dispatch sites; the same
# program is fine at >= 640x360, and the BVH-walk shadow kernel is fine at
# every size). Below this lane count the frame uses the walk kernel; the
# records and image are bit-identical either way.
_SHADOW_CLUSTER_MIN_LANES = int(
    os.environ.get("SGE_SHADOW_CLUSTER_MIN_LANES", "100000"))
# Honor Material.unlit in the RT path: unlit hits shade as albedo+emissive
# (the reference raster fragment shader's unlit branch,
# ShadersRaster.metalinc:73-75) and cast NO shadow rays. The reference's
# raytraceKernel does not consult unlit (RTInstanceInfo carries no such
# field) and runs full PBR on everything — but the scene's translucent
# collision-hull viz entities are authored unlit (DemoScene.swift:164,243),
# so honoring the material model is the intended look AND removes the
# dominant transparency-layer cost (hull layers need no GGX/shadow work).
# SGE_RT_UNLIT=0 restores the reference kernel's shade-everything behavior.
_UNLIT_FAST = bool(knob("SGE_RT_UNLIT"))
# Consolidated per-hit gathers: read uv corners + material id + unlit from
# the static (T,8) tri_shade row and the face normal from the per-frame
# (T,3) table instead of 7 separate vertex-indirection gathers. Measured
# on one v5e @960x540 DemoScene bench: 3.64 -> 4.14 fps (the largest of
# the three round-3 shade-path levers; full stack 3.50 -> 4.14 fps).
_SROW = bool(knob("SGE_RT_SROW"))


# Chunked compaction: work that touches a small, scattered subset of lanes
# (texture taps, normal mapping, transparency layers 2+, mirror/refraction
# bounces) is gathered (jnp.nonzero keeps tile order, so chunks stay
# spatially coherent) into fixed-size chunks processed until the set is
# drained — EXACT for any live count, while the common case (a few percent
# of lanes) costs one small chunk instead of a dense full-batch pass.
# Two chunk sizes: layer continuations can cover a large screen fraction
# (translucent hulls), so their cap is large to avoid loop iterations;
# bounce/tap sets are typically small, so their cap is small — fill lanes
# in an oversized chunk still pay dense elementwise shade cost.
_CHUNK = knob("SGE_RT_CHUNK")
# Measured @960x540 demo frame (round 4, with the cond-guarded machinery):
# 8192 -> 191.3 ms, 32768 -> 211.2, 65536 -> 253.4 — fill-lane waste in the
# oversized chunk bodies beats the saved per-iteration overhead, so the
# small cap stays.
_CHUNK_SMALL = knob("SGE_RT_CHUNK_SMALL")
# Bounce (mirror/refraction) chunk cap, separate from the tap cap: bounce
# chunk bodies carry a full trace + shade + shadow sweep per iteration, so
# their per-iteration fixed cost is far higher than a tap chunk's.
_CHUNK_BOUNCE = knob("SGE_RT_CHUNK_BOUNCE")
# Packet-granular compaction for work that re-TRACES (layers 2+, mirror,
# refraction): gather whole live packets instead of scattered lanes so the
# retrace stays tile-coherent (see _chunked_packets). 0 = lane compaction.
# With the layered walk + continuation-batched shading (_LBATCH=2) no
# transparency retraces exist, and lane compaction measures 336.6 vs
# 339.6 ms for the remaining bounce traces — default OFF since round 3.
_PACKET_COMPACT = bool(knob("SGE_RT_PACKET_COMPACT"))
# Layered shared-origin trace (ops.rt_kernel.trace_layers_so): ONE ordered
# walk yields the nearest opaque hit + the (max_layers-1 .. max_layers)
# nearest translucent hits per lane, so the primary trace AND every
# transparency continuation re-trace collapse into a single kernel; layer
# semantics (alpha accumulation, saturation, 2*bias skip) run elementwise
# on the records. Shading still runs per layer (dense L1, chunked L2+).
_LAYERED = bool(knob("SGE_RT_LAYERED"))
# Translucent record slots for the layered walk. The walk's per-lane prune
# bound is min(t_max, t_opq, ts[slots-1]), so FEWER slots = tighter bound =
# fewer visited nodes. slots = max_layers reproduces the continuation loop
# for every input; slots = max_layers-1 still covers the common worst case
# (a ray crosses one convex hull shell: 2 translucent + 1 opaque layer) and
# only diverges when >= max_layers translucent surfaces stack in front of
# the opaque hit (then the last layer shades the opaque early). 0 = auto
# (max_layers).
_LAYER_SLOTS = knob("SGE_RT_LAYER_SLOTS")
# Light-space Morton sort of shadow-ray origins before the cluster shadow
# kernel (see _light_morton_order): per-lane records are independent of
# packet grouping, so sorted-trace + inverse scatter is bit-identical while
# every packet gets a tight light-space footprint (fewer candidate
# clusters). Costs one argsort + two permutation gathers per shade call.
_SHADOW_SORT = bool(knob("SGE_SHADOW_SORT"))
# Alpha-payload shadow records: the cluster build bakes 2 + material alpha
# into the record payload, so applying the reference layer semantics needs
# NO barycentrics or material gathers per record. Exact whenever no bound
# base texture carries alpha (the payload IS the shadow-filter alpha);
# automatically disabled when alpha textures are in use.
_SHADOW_ALPHA = bool(knob("SGE_SHADOW_ALPHA"))
# Sort-based compaction: _chunked's per-iteration nonzero scan + mask
# scatter is replaced by ONE stable sort of the mask upfront; chunk
# contents and order are identical (live lanes ascending). Measured on one
# v5e @960x540 DemoScene frame: 357.8 -> 339.8 ms. Default ON.
_SORT_COMPACT = bool(knob("SGE_RT_SORT_COMPACT"))
# Compaction-schedule builder: "scan" = cumsum + drop-scatter (O(n), one
# prefix sum and one unique-index scatter), "sort" = stable argsort of the
# mask (O(n log n)). Both produce the SAME schedule — live lanes ascending
# — so chunk contents are identical; only the cost of building the
# permutation differs. Measured @960x540 demo frame (trace mode, reps=4):
# 276.4 (scan) vs 274.3 ms (sort) — a wash; the sort is not a hot spot.
_COMPACT_ORDER = knob("SGE_RT_COMPACT_ORDER")
# Batched layer shading: with per-layer hit records known upfront (peels,
# or the layered shared-origin walk), layers' found records shade in ONE
# compacted chunk loop (colors + alphas scattered per record) and the
# alpha accumulation chain runs elementwise afterwards.
#   0 = off (sequential chunk-compacted layer loop)
#   1 = batch EVERY layer — measured LOSS (424.6 vs 357.7 ms @960x540):
#       fragmenting the dense L1 shade into chunk programs costs more than
#       the merged loop saves
#   2 = batch CONTINUATION layers only (L2..): L1 keeps its efficient
#       dense monolithic shade; the per-layer chunk loops (each with its
#       own shadow dispatch + nested bounce chunking) merge into one.
#       Measured (with sort-compaction + lane compaction) 336.6 -> 311.1
#       ms @960x540 — the round-3 default.
#   3 = DENSE continuation layers (round 4): each layer L2.. shades the
#       full lane batch gated by its found & chain-open mask — no
#       compaction machinery at all. Measured 239.6 vs 211.6 ms @960x540
#       (the two extra dense shadow sweeps outweigh the chunk machinery)
#       — kept as an option; 2 stays the default.
_LBATCH = knob("SGE_RT_LBATCH")
# Merged deferred shading (round 5, render.deferred): the hybrid path's
# per-layer records + ALL bounce records shade through ONE G-buffer pass,
# ONE merged bounce-trace loop, ONE shadow sweep and ONE light pass —
# the round-4 frame instantiated that machinery ~5x (VERDICT r4 next #1).
# MEASURED A LOSS on one v5e @960x540 full scene and kept OFF: the merged
# record streams are (layers+bounces)*p lanes and majority-dead, and on
# TPU any stream-sized gather/scatter pass costs ~4 ms per 550k lanes —
# chunk-compacted G-buffers pay ~20 scatter passes (674 ms with a Morton
# sweep sort, 333 without), dense G-buffers pay the gather passes
# (449 ms; 242 with bounces knocked out) vs 153 ms sequential. The win
# it chased (fewer sweep instantiations, ~35 ms) cannot pay for stream-
# scale index traffic; parity tests keep the path honest (test_deferred).
_DEFERRED = bool(knob("SGE_RT_DEFERRED"))
# Simple-unlit record split for batched layer shading: records whose
# material is unlit with NO bound textures, no transmission and no mirror
# eligibility (all static per material) shade as packed-row gathers —
# color = base_factor + emissive_factor, alpha = alpha factor — exactly
# the full path's unlit branch output, with no barycentrics, shadow
# dispatch, BRDF/IBL math or bounce machinery. Measured LOSS @960x540
# demo frame (274.3 vs 252.9 ms, bit-identical output): the (L*P,)-lane
# mask build + second compacted pass cost more than the batched chunk
# loop saves — the unlit fast path inside the chunk body (dead shadow
# packets, gated BRDF) already absorbs most of the win. Default OFF.
# Gated on _UNLIT_FAST (ADVICE r3): the split's cheap path equals the full
# shade only when unlit materials take the unlit branch there.
_UNLIT_SPLIT = bool(knob("SGE_RT_UNLIT_SPLIT")) and _UNLIT_FAST
# Round 5: the DENSE reformulation of the same split. The r3 loss came
# from the _compacted scatter machinery; here simple-unlit records
# (demo: the translucent hull overlays — the MAJORITY of continuation
# records) resolve with ONE (L*p,) gather from a per-triangle (T,4)
# color/alpha row table (color = base+emissive factors, alpha = factor —
# all static per triangle), purely elementwise, and the chunk loop then
# compacts over the HEAVY records only (typically the lit opaque hits
# behind the hulls) — fewer chunk iterations, each mostly-live.
# MEASURED LOSS @960x540 full scene (177.2 vs 149.5 ms, identical image):
# the (L*p,)-lane 5-wide row gather costs more than the chunk iterations
# it saves at this scene's hull coverage. Default OFF; knob kept for
# hull-heavy scenes.
_UNLIT_DENSE = bool(knob("SGE_RT_UNLIT_DENSE", 0)) and _UNLIT_FAST
# Timing-only attribution knobs (examples/prof_shade_parts.py): knock out
# one shade sub-part each. WRONG output — never enabled in production.
_PROF_SHADOW_OFF = bool(knob("SGE_PROF_SHADOW_OFF"))
_PROF_BRDF_OFF = bool(knob("SGE_PROF_BRDF_OFF"))
_PROF_NO_BOUNCE = bool(knob("SGE_PROF_NO_BOUNCE"))
_PROF_LAYERS1 = bool(knob("SGE_PROF_LAYERS1"))
# Cluster-rasterizer knobs threaded into rasterize_clusters (0 = module
# defaults; see render.tile_raster).
_RASTER_LISTS = bool(knob("SGE_RASTER_LISTS"))
_RASTER_TILE_H = knob("SGE_RASTER_TILE_H")
_RASTER_CLUSTER = knob("SGE_RASTER_CLUSTER_RT")
# Cluster size for the hybrid mode's translucent-subset raster: the demo's
# translucent set is a few thousand hull triangles with LARGE screen
# footprints, so small clusters (tight AABBs) dominate the raster's cost.
_RASTER_TRANS_CLUSTER = knob("SGE_RASTER_TRANS_CLUSTER")
# Midpoint-subdivision depth for the translucent-subset raster (round 5,
# VERDICT r4 next #3): hull triangles are world-HUGE, so their (cluster)
# AABBs bin into nearly every tile and 4.2k triangles cost ~16 ms. Each
# level splits every triangle into 4 coplanar children (same winding,
# parent ids), bounding per-tile candidate work by triangle area. EXACT
# whenever the translucent set's materials bind no textures (see
# _trans_subdiv_ok): sub-triangle barycentrics feed only texture taps, and
# t/normal/material derive from the shared plane + parent id.
# MEASURED LOSSES at every shape tried @960x540 full scene (baseline
# 149.5 ms): depth2/cluster128 = 324, depth1/cluster16 = 191.6 — the
# translucent raster's cost is the per-tile insertion-network work over
# COVERED PIXELS x layers, which subdivision cannot reduce (it only adds
# cluster meta scans). Default 0; the knob and the exactness gate stay.
_TRANS_SUBDIV = knob("SGE_RASTER_TRANS_SUBDIV")


def _chunked_trace(mask, body, carry, cap_lanes):
    """Compaction for chunk bodies that re-trace rays: packet-granular when
    enabled (coherent retraces), lane-granular otherwise."""
    if _PACKET_COMPACT:
        from ..ops.rt_kernel import BLOCK
        return _chunked_packets(mask, body, carry,
                                cap_packets=max(cap_lanes // BLOCK, 1))
    return _chunked(mask, body, carry, cap=cap_lanes)


def _chunked(mask, body, carry, cap=None):
    """Run ``body(idx, valid, carry) -> carry`` over <=cap-lane chunks of
    the set lanes of ``mask`` until drained. ``idx`` is (cap,) int32 into
    the flat lane space with out-of-range fill (scatters at fill indices
    drop; gathers must clamp). Skips entirely when ``mask`` is empty."""
    p = mask.shape[0]
    cap = min(p, _CHUNK if cap is None else cap)
    if _SORT_COMPACT:
        return _chunked_sorted(mask, body, carry, cap)

    def cond(c):
        m, _ = c
        return jnp.any(m)

    def step(c):
        m, carry = c
        idx = jnp.nonzero(m, size=cap, fill_value=p)[0]
        valid = idx < p
        carry = body(idx, valid, carry)
        m = m.at[idx].set(False)
        return m, carry

    _, carry = jax.lax.while_loop(cond, step, (mask, carry))
    return carry


def _chunked_sorted(mask, body, carry, cap):
    """Same contract (and identical chunk contents) as ``_chunked``, but
    the chunk schedule comes from ONE stable sort — live lanes first in
    ascending lane order — instead of a full nonzero scan + mask scatter
    per iteration.

    The whole machinery (schedule build + loop) is cond-guarded on the
    live count: compaction sites whose set is empty this frame (bounce
    passes on hull-only records, taps on untextured chunks, ...) cost one
    mask reduction instead of an argsort + big-carry loop setup — measured
    ~14 ms of near-empty nested machinery inside one continuation chunk."""
    p = mask.shape[0]
    count = jnp.sum(mask.astype(jnp.int32))

    def run(carry):
        if _COMPACT_ORDER == "scan":
            # cumsum + drop-scatter: live lane i lands at slot (#live < i).
            # Slots >= count stay 0 — never read live (idx is masked by
            # ``valid`` before use), so any in-range filler is fine.
            pos = jnp.cumsum(mask.astype(jnp.int32)) - 1
            lane = jnp.arange(p, dtype=jnp.int32)
            order = jnp.zeros(p, jnp.int32).at[
                jnp.where(mask, pos, p)].set(lane, mode="drop")
        else:
            order = jnp.argsort(jnp.where(mask, 0, 1).astype(jnp.int8),
                                stable=True).astype(jnp.int32)
        # pad to a cap multiple so every chunk's dynamic_slice is exact
        # (a clamped slice would re-offer earlier lanes as later ones)
        pad = (-p) % cap
        if pad:
            order = jnp.concatenate([order, jnp.full(pad, p, jnp.int32)])
        return _chunked_sorted_loop(order, count, body, carry, cap, p)

    return jax.lax.cond(count > 0, run, lambda c: c, carry)


def _chunked_sorted_loop(order, count, body, carry, cap, p):

    def cond(c):
        i = c[0]
        return i * cap < count

    def step(c):
        i, carry = c
        idx = jax.lax.dynamic_slice(order, (i * cap,), (cap,))
        valid = (i * cap + jnp.arange(cap, dtype=jnp.int32)) < count
        idx = jnp.where(valid, idx, p)
        carry = body(idx, valid, carry)
        return i + 1, carry

    _, carry = jax.lax.while_loop(cond, step, (jnp.int32(0), carry))
    return carry


def _compacted(mask, body, defaults, cap=None):
    """Sort-based compaction for pure gather->compute->scatter bodies:
    ``body(idx, valid) -> tuple`` of (cap, ...) chunk results, scattered to
    the set lanes of ``mask``; unset lanes keep ``defaults`` (a tuple of
    (p, ...) arrays). Zero iterations on an empty mask."""
    p = mask.shape[0]
    cap = min(p, _CHUNK if cap is None else cap)

    def wrapped(idx, valid, outs):
        res = body(idx, valid)
        return tuple(o.at[idx].set(r) for o, r in zip(outs, res))

    return _chunked_sorted(mask, wrapped, tuple(defaults), cap)


def _part1by1(x):
    """Spread the low 16 bits of x to even bit positions."""
    x = (x | (x << 8)) & 0x00FF00FF
    x = (x | (x << 4)) & 0x0F0F0F0F
    x = (x | (x << 2)) & 0x33333333
    x = (x | (x << 1)) & 0x55555555
    return x


def _light_morton_order(basis, o, t_lim):
    """Permutation grouping shadow-ray origins by light-space locality:
    Morton codes over the (e1, e2) light-plane coordinates (basis rows 0-1
    of ShadowClusters.basis), 10 bits per axis over the live-lane bounding
    rect; dead lanes (t_lim <= 0) sort last (into fully-dead packets that
    exit immediately). Per-lane shadow records are independent of packet
    grouping, so trace(o[order]) scattered back through the inverse
    permutation is bit-identical to the unsorted trace."""
    a = o @ basis[0]
    b = o @ basis[1]
    live = t_lim > 0.0
    big = jnp.float32(BIG)
    a0 = jnp.min(jnp.where(live, a, big))
    a1 = jnp.max(jnp.where(live, a, -big))
    b0 = jnp.min(jnp.where(live, b, big))
    b1 = jnp.max(jnp.where(live, b, -big))
    qa = jnp.clip((a - a0) / jnp.maximum(a1 - a0, 1e-6) * 1023.0,
                  0.0, 1023.0).astype(jnp.int32)
    qb = jnp.clip((b - b0) / jnp.maximum(b1 - b0, 1e-6) * 1023.0,
                  0.0, 1023.0).astype(jnp.int32)
    code = (_part1by1(qb) << 1) | _part1by1(qa)
    code = jnp.where(live, code, jnp.int32(1) << 22)
    return jnp.argsort(code, stable=True)


# Ordering mode for the sorted shadow sweep (see _shadow_factor sort=):
#   "morton"    — light-space Morton argsort (tight packet footprints;
#                 costs an argsort over the full lane stream)
#   "partition" — O(n) stable live-first partition (cumsum + drop-scatter,
#                 no argsort). Live lanes keep their RECORD order, which is
#                 tile-major for layer records — already spatially coherent
#                 — and dead lanes park into instantly-exiting packets.
_SHADOW_SORT_MODE = knob("SGE_SHADOW_SORT_MODE", "partition")


def _live_first_order(live):
    """Stable permutation putting live lanes first in original order:
    cumsum + ONE int32 scatter. Returns (order, inv): ``inv`` IS the
    cumsum-derived destination slot of each lane, so scattering results
    back becomes a GATHER by inv — scatters are per-element slow on TPU
    and the record arrays are wide, so the gather-based inverse is the
    difference between a cheap reorder and a 100-ms-class one."""
    n = live.shape[0]
    lane = jnp.arange(n, dtype=jnp.int32)
    n_live = jnp.sum(live.astype(jnp.int32))
    pos_live = jnp.cumsum(live.astype(jnp.int32)) - 1
    pos_dead = n_live + jnp.cumsum((~live).astype(jnp.int32)) - 1
    inv = jnp.where(live, pos_live, pos_dead)
    order = jnp.zeros(n, jnp.int32).at[inv].set(lane, mode="drop")
    return order, inv


def _shadow_order(basis, o, t_lim):
    """(order, inv | None): inv present means 'results[inv] un-sorts'
    (gathers); None falls back to .at[order].set scatters (morton)."""
    if _SHADOW_SORT_MODE == "partition":
        return _live_first_order(t_lim > 0.0)
    return _light_morton_order(basis, o, t_lim), None


def _chunked_packets(mask, body, carry, cap_packets: int):
    """Packet-granular compaction: like ``_chunked`` but gathers whole
    traversal packets (runs of rt_kernel.BLOCK consecutive lanes) that
    contain at least one set lane.

    Lane-level compaction destroys the spatial coherence the packet
    traversal kernel depends on — a gathered chunk of scattered lanes
    spans many screen tiles, so each packet walks a near-full-scene
    subtree union (measured: transparency layer 2 cost 84% of a full-frame
    pass for 4.7x fewer rays). Packet-granular gathering keeps chunks
    dense AND tile-coherent: selected packets stay bit-identical to their
    primary-pass packets, dead lanes inside them are masked by ``valid``.

    ``body`` keeps the exact _chunked contract: (idx (cap,), valid (cap,),
    carry) with cap = cap_packets * BLOCK.
    """
    from ..ops.rt_kernel import BLOCK
    p = mask.shape[0]
    if p <= BLOCK or p % BLOCK != 0:
        return _chunked(mask, body, carry, cap=min(p, cap_packets * BLOCK))
    nb = p // BLOCK
    cap_packets = min(nb, cap_packets)
    pk = mask.reshape(nb, BLOCK)

    def cond(c):
        pk_live, _ = c
        return jnp.any(pk_live)

    def step(c):
        pk_live, carry = c
        pids = jnp.nonzero(jnp.any(pk_live, axis=1), size=cap_packets,
                           fill_value=nb)[0]
        pid_ok = pids < nb
        safe_pid = jnp.minimum(pids, nb - 1)
        idx = (safe_pid[:, None] * BLOCK +
               jnp.arange(BLOCK)[None, :]).reshape(-1)
        valid = (pk_live[safe_pid].reshape(-1) &
                 jnp.repeat(pid_ok, BLOCK))
        # out-of-range fill mirrors _chunked exactly: invalid lanes (dead
        # lanes inside live packets + fill packets) scatter at p (dropped);
        # bodies clamp gathers. Live lanes keep their packet-aligned slots,
        # so kernel packets match primary-pass packets bit for bit.
        idx = jnp.where(valid, idx, p)
        carry = body(idx, valid, carry)
        pk_live = pk_live.at[safe_pid].set(
            jnp.where(pid_ok[:, None], False, pk_live[safe_pid]))
        return pk_live, carry

    _, carry = jax.lax.while_loop(cond, step, (pk, carry))
    return carry


# Batches at or below this STATIC lane count run their inner taps /
# normal-map work dense-masked instead of chunk-compacted. Measured a
# LOSS at 32768 on the demo frame (185.6 vs 172.2 ms with it off — the
# dense masked work in every small body beats the machinery it saves
# only on paper); default off, kept as an experiment knob.
_DENSE_SMALL = knob("SGE_RT_DENSE_SMALL", 0)


def _sparse_tap(textures, tex_ids, uv, default, active=None):
    """Bilinear texture taps only for lanes that bind a texture
    (tex_id >= 0), chunk-compacted; other lanes get ``default``. Each
    bilinear sample is 4 HBM gathers per lane, so dense taps dominate shade
    cost when only a few lanes are textured. Small static batches tap
    densely (see _DENSE_SMALL). ``active``: optional lane mask — INACTIVE
    lanes never tap (dead records gather tri 0's material id, which may
    bind textures; the deferred pipeline's dense record buffers are
    majority-dead, so gating on liveness is load-bearing there)."""
    p = tex_ids.shape[0]
    bound = tex_ids >= 0
    if active is not None:
        bound = bound & active
    if p <= _DENSE_SMALL:
        s = sample_bilinear(textures, jnp.maximum(tex_ids, 0), uv, default)
        return jnp.where(bound[:, None], s, default)
    out = jnp.broadcast_to(default, (p, 4))

    def body(idx, valid, out):
        safe = jnp.minimum(idx, p - 1)
        s = sample_bilinear(textures, tex_ids[safe], uv[safe], default)
        return out.at[idx].set(s)

    return _chunked(bound, body, out, cap=_CHUNK_SMALL)


@partial(jax.jit, static_argnames=())
def _trace_batch(bvh, o, d, active):
    """Nearest-hit traversal over a ray batch; inactive lanes exit instantly."""
    if not _FORCE_JAX_TRAVERSAL:
        from ..ops.rt_kernel import trace_rays_pallas, barycentrics, KernelBVH, BIG as KBIG
        interpret = jax.default_backend() != "tpu"
        kb = KernelBVH(rows=bvh.rows, n_nodes=bvh.bmin.shape[0])
        t_max = jnp.where(active, KBIG, jnp.float32(0.0))
        # Park inactive rays far outside the root AABB: fully-masked packets
        # then fail the root test and exit after one traversal step.
        o = jnp.where(active[..., None], o, jnp.float32(1.0e9))
        t, tri = trace_rays_pallas(kb, o, d, t_max, interpret=interpret)
        u, v, found = barycentrics(bvh, o, d, t, tri)
        found = found & active & (t < KBIG)
        return jnp.where(found, t, BIG), jnp.where(found, tri, -1), u, v, found

    def one(o_i, d_i, a_i):
        t, tri, u, v, found = B.traverse(bvh, o_i, d_i, jnp.float32(1e6))
        return t, tri, u, v, found & a_i

    t, tri, u, v, found = jax.vmap(one)(o, d, active)
    found = found & active
    return t, jnp.where(found, tri, -1), u, v, found


def _interp(attr, tri_v, u, v):
    """Barycentric vertex-attribute interp: attr (V,C), tri_v (P,3)."""
    w = (1.0 - u - v)[..., None]
    return attr[tri_v[:, 0]] * w + attr[tri_v[:, 1]] * u[..., None] \
        + attr[tri_v[:, 2]] * v[..., None]


def _sample_material(geo: SceneGeometry, mid, uv, usage, unlit=None,
                     active=None):
    """PBR material sample per hit (RayTracing.metalinc:132-176).

    ``mid`` is the per-lane material id (callers read it from the
    tri_shade row — see SceneGeometry.tri_shade). ``usage`` (static
    TextureUsage) prunes texture taps for slots no scene material binds —
    each bilinear sample is 4 HBM gathers per lane."""
    mats = geo.materials
    row = mats.packed[mid]                      # (P,16): ONE gather per hit
    base = row[..., 0:3]
    alpha = jnp.clip(row[..., 3], 0.0, 1.0)
    metallic = jnp.clip(row[..., 4], 0.0, 1.0)
    roughness = jnp.clip(row[..., 5], 0.05, 1.0)
    emissive = row[..., 6:9]
    occlusion = jnp.clip(row[..., 9], 0.0, 1.0)
    transmission = jnp.clip(row[..., 10], 0.0, 1.0)
    ior = jnp.maximum(row[..., 11], 1.0)
    normal_scale = row[..., 12]
    base_tex = row[..., 13].astype(jnp.int32)
    normal_tex = row[..., 14].astype(jnp.int32)
    mr_tex = row[..., 15].astype(jnp.int32)

    white = jnp.ones(4)

    # Sparse taps: only the lanes whose material binds the slot sample it
    # (chunk-compacted); dense taps measured ~46 ms/shade while typically a
    # few percent of lanes are textured.
    if usage.base:
        base_t = _sparse_tap(geo.textures, base_tex, uv, white, active)
        base = base * base_t[..., :3]
        alpha = alpha * base_t[..., 3]
    if usage.mr:
        mr_t = _sparse_tap(geo.textures, mr_tex, uv, white, active)
        roughness = roughness * mr_t[..., 1]
        metallic = metallic * mr_t[..., 2]
    if usage.emissive:
        em_t = _sparse_tap(geo.textures, mats.emissive_tex[mid], uv, white,
                           active)
        emissive = emissive * em_t[..., :3]
    if usage.occlusion:
        oc_t = _sparse_tap(geo.textures, mats.occlusion_tex[mid], uv, white,
                           active)
        occlusion = occlusion * oc_t[..., 0]

    return dict(base=base, alpha=alpha, metallic=metallic, roughness=roughness,
                emissive=emissive, occlusion=occlusion,
                transmission=transmission, ior=ior,
                normal_tex=normal_tex,
                normal_scale=normal_scale, mid=mid,
                unlit=mats.unlit[mid] if unlit is None else unlit)


def _simple_unlit_tri(geo: SceneGeometry, usage, enable_mirror,
                      enable_refraction):
    """(T,) bool: triangles whose shade is fully determined by material
    factors — unlit, no taps that could alter base/alpha/emissive or the
    (static) mirror gate, no transmission. For these, the full _shade_hit
    unlit branch reduces to base_factor + emissive_factor with the factor
    alpha (see _UNLIT_SPLIT)."""
    mats = geo.materials
    simple = jnp.asarray(mats.unlit, bool)
    if usage.base:
        simple = simple & (mats.base_tex < 0)
    if usage.emissive:
        simple = simple & (mats.emissive_tex < 0)
    if usage.mr:
        # a bound MR texture could push the material into the mirror gate
        simple = simple & (mats.mr_tex < 0)
    if enable_refraction:
        simple = simple & (jnp.clip(mats.transmission, 0.0, 1.0) <= 0.0)
    if enable_mirror:
        mirror = (jnp.clip(mats.metallic, 0.0, 1.0) >= 0.8) & \
            (jnp.clip(mats.roughness, 0.05, 1.0) <= 0.08)
        simple = simple & jnp.logical_not(mirror)
    return simple[jnp.maximum(geo.tri_material, 0)]


def _sample_alpha(geo: SceneGeometry, tri, u, v, usage, active=None):
    """Shadow-filter alpha (RayTracing.metalinc:178-195). When no bound
    base texture carries alpha < 1 the material factor alone is exact and
    the 4-tap texture gather is skipped (static specialization)."""
    mats = geo.materials
    if _SROW:
        srow = geo.tri_shade[jnp.maximum(tri, 0)]   # one gather: uvs + mid
        mid = srow[:, 6].astype(jnp.int32)
    else:
        mid = jnp.maximum(geo.tri_material[jnp.maximum(tri, 0)], 0)
    alpha = jnp.clip(mats.alpha[mid], 0.0, 1.0)
    if not (usage.base and usage.alpha_tex):
        return alpha
    if _SROW:
        w = (1.0 - u - v)[..., None]
        uv = srow[:, 0:2] * w + srow[:, 2:4] * u[..., None] \
            + srow[:, 4:6] * v[..., None]
    else:
        tri_v = geo.tri[jnp.maximum(tri, 0)]
        uv = _interp(geo.uv, tri_v, u, v)
    base_t = _sparse_tap(geo.textures, mats.base_tex[mid], uv, jnp.ones(4),
                         active)
    return alpha * base_t[..., 3]


def _apply_shadow_records(geo, fg, o_sh, l, t_opq, ts, ids, active,
                          max_dist, shadow_layers: int, usage,
                          alpha_payload: bool = False):
    """The reference's exact shadow layer semantics, elementwise over
    single-walk records: hits are processed nearest-first; each translucent
    layer multiplies by (1 - alpha); the walk stops at shadow <= 0.02 or
    after shadow_layers layers; an opaque hit inside the remaining layer
    budget zeroes the factor.

    ``alpha_payload``: ``ids`` carries ``2 + alpha`` per record instead of
    a triangle id (cluster build with alpha=...), so no barycentrics or
    material gathers run at all."""
    from ..ops.rt_kernel import barycentrics
    p = o_sh.shape[0]
    shadow = jnp.ones(p)
    applied = jnp.zeros(p, jnp.int32)
    for k in range(shadow_layers):
        t_k = ts[:, k]
        if alpha_payload:
            exist = ids[:, k] >= 0
            a_k = ids[:, k] - 2.0
        else:
            tri_k = jnp.floor(ids[:, k]).astype(jnp.int32)
            exist = tri_k >= 0
            if usage.base and usage.alpha_tex:
                t_safe = jnp.where(exist, t_k, 0.0)
                u_k, v_k, _ = barycentrics(fg.bvh, o_sh,
                                           jnp.broadcast_to(l, o_sh.shape),
                                           t_safe, tri_k)
            else:
                u_k = v_k = jnp.zeros_like(t_k)
            a_k = _sample_alpha(geo, tri_k, u_k, v_k, usage)
        can = active & exist & (t_k < t_opq) & (t_k < max_dist) \
            & (shadow > 0.02)
        shadow = jnp.where(can, shadow * (1.0 - a_k), shadow)
        applied = applied + can.astype(jnp.int32)
    opq_can = active & (t_opq < max_dist) & (shadow > 0.02) & \
        (applied < shadow_layers)
    shadow = jnp.where(opq_can, 0.0, shadow)
    return jnp.where(active, shadow, 1.0)


def _shadow_factor(geo, fg: FrameGeometry, hit_pos, n, light_dir, max_dist,
                   bias, active, shadow_layers: int, usage=None,
                   shadow_rows=None, shadow_clusters=None, sort=None):
    """Alpha-filtered shadow ray toward a directional light
    (RayTracing.metalinc:332-372).

    ``sort``: override the _SHADOW_SORT knob (the deferred pipeline's
    merged origin stream is mostly-dead + scattered, where the light-space
    Morton order is load-bearing: live lanes pack into tight packets and
    dead lanes park into instantly-exiting dead packets)."""
    l = normalize(-light_dir)
    if usage is None:
        usage = FULL_USAGE
    use_sort = _SHADOW_SORT if sort is None else sort

    o0 = hit_pos + n * bias[..., None]

    if shadow_clusters is not None:
        # Cluster shadow kernel (ops.cluster_shadow): depth-sorted dense
        # light-space clusters instead of a BVH walk; identical records.
        from ..ops.cluster_shadow import (trace_shadow_clusters,
                                          trace_shadow_split, ShadowSplit)
        o_sh = jnp.where(active[..., None], o0, jnp.float32(1.0e9))
        # Exact per-lane t limit: no triangle exists outside the scene's
        # root AABB, so the shadow ray needs no consideration beyond its
        # AABB exit distance. This tightens the cluster sweep's early-exit
        # bound enormously (most origins exit the AABB after a few units
        # along the sun direction) without changing any record the layer
        # semantics can see.
        if _SHADOW_TEXIT:
            bmin = fg.bvh.bmin[0]
            bmax = fg.bvh.bmax[0]
            safe_l = jnp.where(jnp.abs(l) < 1e-12, 1e-12, l)
            tx0 = (bmin[None, :] - o0) / safe_l[None, :]
            tx1 = (bmax[None, :] - o0) / safe_l[None, :]
            t_exit = jnp.min(jnp.maximum(tx0, tx1), axis=-1) + 1e-2
            t_lim = jnp.where(active,
                              jnp.minimum(jnp.minimum(max_dist, BIG),
                                          jnp.maximum(t_exit, 0.0)),
                              jnp.float32(0.0))
        else:
            t_lim = jnp.where(active, jnp.minimum(max_dist, BIG),
                              jnp.float32(0.0))
        # alpha_payload must mirror the build condition in _render_rays
        # (both derive it from the static usage tuple).
        ap = _SHADOW_ALPHA and not (usage.base and usage.alpha_tex)
        if isinstance(shadow_clusters, ShadowSplit):
            if use_sort:
                # light-space Morton order: tightens packet footprints for
                # scattered origin sets (chunk-compacted continuation
                # records span the whole screen); records are per-lane, so
                # sorted-trace + inverse scatter is bit-identical.
                order, inv = _shadow_order(shadow_clusters.full.basis,
                                           o_sh, t_lim)
                t_s, ts_s, ids_s = trace_shadow_split(
                    shadow_clusters, o_sh[order], t_lim[order],
                    n_slots=shadow_layers,
                    interpret=jax.default_backend() != "tpu",
                    alpha_payload=ap, anyhit=_SHADOW_ANYHIT)
                p_sh = o_sh.shape[0]
                if inv is not None:
                    t_opq, ts, ids = t_s[inv], ts_s[inv], ids_s[inv]
                else:
                    t_opq = jnp.zeros(p_sh).at[order].set(t_s)
                    ts = jnp.zeros((p_sh, shadow_layers)).at[order].set(ts_s)
                    ids = jnp.zeros((p_sh, shadow_layers)).at[order].set(ids_s)
            else:
                t_opq, ts, ids = trace_shadow_split(
                    shadow_clusters, o_sh, t_lim, n_slots=shadow_layers,
                    interpret=jax.default_backend() != "tpu",
                    alpha_payload=ap, anyhit=_SHADOW_ANYHIT)
            return _apply_shadow_records(geo, fg, o_sh, l, t_opq, ts, ids,
                                         active, max_dist, shadow_layers,
                                         usage, alpha_payload=ap)
        if use_sort:
            order, inv = _shadow_order(shadow_clusters.basis, o_sh, t_lim)
            t_opq_s, ts_s, ids_s = trace_shadow_clusters(
                shadow_clusters, o_sh[order], t_lim[order],
                n_slots=shadow_layers,
                interpret=jax.default_backend() != "tpu",
                lists=_SHADOW_LISTS, alpha_payload=ap)
            p = o_sh.shape[0]
            if inv is not None:
                t_opq, ts, ids = t_opq_s[inv], ts_s[inv], ids_s[inv]
            else:
                t_opq = jnp.zeros(p).at[order].set(t_opq_s)
                ts = jnp.zeros((p, shadow_layers)).at[order].set(ts_s)
                ids = jnp.zeros((p, shadow_layers)).at[order].set(ids_s)
        else:
            t_opq, ts, ids = trace_shadow_clusters(
                shadow_clusters, o_sh, t_lim, n_slots=shadow_layers,
                interpret=jax.default_backend() != "tpu",
                lists=_SHADOW_LISTS, alpha_payload=ap)
        return _apply_shadow_records(geo, fg, o_sh, l, t_opq, ts, ids,
                                     active, max_dist, shadow_layers, usage,
                                     alpha_payload=ap)

    if shadow_rows is not None:
        # Single-walk shadow records (see ops/rt_kernel shadow-factor
        # section) + the exact layer semantics elementwise.
        from ..ops.rt_kernel import trace_shadow_factor
        o_sh = jnp.where(active[..., None], o0, jnp.float32(1.0e9))
        t_lim = jnp.where(active, jnp.minimum(max_dist, BIG),
                          jnp.float32(0.0))
        t_opq, ts, ids = trace_shadow_factor(
            shadow_rows, l, o_sh, t_lim, n_slots=shadow_layers,
            interpret=jax.default_backend() != "tpu")
        return _apply_shadow_records(geo, fg, o_sh, l, t_opq, ts, ids,
                                     active, max_dist, shadow_layers, usage)
    act0 = active
    shadow0 = jnp.ones(hit_pos.shape[0])
    if _SHADOW_PREPASS and not _FORCE_JAX_TRAVERSAL:
        from ..ops.rt_kernel import (trace_shadow_any,
                                     shadow_prepass_available,
                                     KernelBVH as KB)
        if shadow_prepass_available(fg.bvh.rows):
            # Any-hit prepass over opaque triangles: a lane with ANY opaque
            # blocker has shadow 0 regardless of hit order, so the exact
            # alpha-filter loop below only runs for lanes whose occluders
            # are all translucent (usually none -> the loop exits at once).
            t_lim = jnp.where(active, jnp.minimum(max_dist, BIG),
                              jnp.float32(0.0))
            d_sh = jnp.broadcast_to(l, o0.shape)
            o_sh = jnp.where(active[..., None], o0, jnp.float32(1.0e9))
            blocked = trace_shadow_any(
                KB(rows=fg.bvh.rows, n_nodes=fg.bvh.bmin.shape[0]),
                o_sh, d_sh, t_lim,
                interpret=jax.default_backend() != "tpu")
            blocked = blocked & active
            shadow0 = jnp.where(blocked, 0.0, shadow0)
            act0 = active & jnp.logical_not(blocked)

    # NOTE (measured): compacting shadow continuation lanes is a LOSS here —
    # translucent-blocked lanes are scattered, so the dense continuation
    # iterations already cost little (packets with no live lanes exit the
    # traversal immediately) and the gather/scatter machinery exceeded the
    # savings (277 -> 304 ms full frame). Dense lockstep loop kept.
    def cond(carry):
        _, shadow, act, layer = carry
        return jnp.any(act & (shadow > 0.02)) & (layer < shadow_layers)

    def body(carry):
        o, shadow, act, layer = carry
        live = act & (shadow > 0.02)
        t, tri, u, v, found = _trace_batch(fg.bvh, o, jnp.broadcast_to(l, o.shape), live)
        found = found & (t < max_dist)
        a = _sample_alpha(geo, tri, u, v, usage)
        shadow = jnp.where(found, shadow * (1.0 - a), shadow)
        sh_pos = o + l * t[..., None]
        o = jnp.where(found[..., None], sh_pos + l * (bias * 2.0)[..., None], o)
        return o, shadow, live & found, layer + 1

    init = (o0, shadow0, act0, jnp.int32(0))
    _, shadow, _, _ = jax.lax.while_loop(cond, body, init)
    return shadow


def _gbuffer(geo, fg: FrameGeometry, ray_o, ray_d, t_hit, tri, u, v,
             active, usage):
    """Geometry + material stage of the shade: per-record shading normal
    (incl. chunk-compacted normal mapping), hit position, shadow bias and
    the sampled material dict — NO lighting, NO shadow rays. Split out of
    the monolithic shade (round 5) so the deferred pipeline can compute
    bounce rays and shadow origins for EVERY record in the frame before a
    single merged shadow sweep + light pass run (VERDICT r4 next #1)."""
    t_hit = jnp.where(active, t_hit, 1.0)
    safe_tri = jnp.maximum(tri, 0)
    if _SROW:
        # Two dense gathers per hit replace seven: the per-frame face normal
        # (fg.tri_nrm) and the static shade row (uv corners + material id +
        # unlit; SceneGeometry.tri_shade).
        srow = geo.tri_shade[safe_tri]
        n_geom = fg.tri_nrm[safe_tri]
        wbar = (1.0 - u - v)[..., None]
        uv = srow[:, 0:2] * wbar + srow[:, 2:4] * u[..., None] \
            + srow[:, 4:6] * v[..., None]
        mid = srow[:, 6].astype(jnp.int32)
        unlit = srow[:, 7] > 0.5
    else:
        tri_v = geo.tri[safe_tri]
        w0 = fg.pos[tri_v[:, 0]]
        w1 = fg.pos[tri_v[:, 1]]
        w2 = fg.pos[tri_v[:, 2]]
        n_geom = normalize(jnp.cross(w1 - w0, w2 - w0))
        uv = _interp(geo.uv, tri_v, u, v)
        mid = jnp.maximum(geo.tri_material[safe_tri], 0)
        unlit = None
    n_geom = jnp.where(jnp.sum(n_geom * ray_d, axis=-1, keepdims=True) > 0,
                       -n_geom, n_geom)
    view = normalize(-ray_d)
    m = _sample_material(geo, mid, uv, usage, unlit=unlit, active=active)

    # Tangent-space normal mapping (RayTracing.metalinc:283-316),
    # chunk-compacted to the lanes whose material binds a normal map — the
    # vertex-normal/tangent interpolation gathers and the 4-tap texture
    # sample only run for those lanes.
    if usage.normal:
        pshape = n_geom.shape[0]

        def nm_body(idx, valid, n_out):
            safe = jnp.minimum(idx, pshape - 1)
            tv = geo.tri[safe_tri[safe]]   # vertex gathers only on the chunk
            uc, vc = u[safe], v[safe]
            n_vert = normalize(_interp(fg.nrm, tv, uc, vc))
            tan4 = _interp(fg.tan, tv, uc, vc)
            tan = normalize(tan4[..., :3])
            n_tex = sample_bilinear(geo.textures, m["normal_tex"][safe],
                                    uv[safe],
                                    jnp.array([0.5, 0.5, 1.0, 1.0]))[..., :3]
            n_mapped = apply_normal_map(n_geom[safe], n_vert, tan,
                                        jnp.sign(tan4[..., 3]),
                                        n_tex, m["normal_scale"][safe],
                                        view[safe])
            n_mapped = jnp.where(
                jnp.sum(n_mapped * ray_d[safe], axis=-1, keepdims=True) > 0,
                -n_mapped, n_mapped)
            return n_out.at[idx].set(n_mapped)

        if pshape <= _DENSE_SMALL:
            # dense-masked normal mapping for small batches (_DENSE_SMALL)
            has_nm = m["normal_tex"] >= 0
            tv = geo.tri[safe_tri]
            n_vert = normalize(_interp(fg.nrm, tv, u, v))
            tan4 = _interp(fg.tan, tv, u, v)
            tan = normalize(tan4[..., :3])
            n_tex = sample_bilinear(geo.textures,
                                    jnp.maximum(m["normal_tex"], 0), uv,
                                    jnp.array([0.5, 0.5, 1.0, 1.0]))[..., :3]
            n_mapped = apply_normal_map(n_geom, n_vert, tan,
                                        jnp.sign(tan4[..., 3]), n_tex,
                                        m["normal_scale"], view)
            n_mapped = jnp.where(
                jnp.sum(n_mapped * ray_d, axis=-1, keepdims=True) > 0,
                -n_mapped, n_mapped)
            n = jnp.where(has_nm[..., None], n_mapped, n_geom)
        else:
            n = _chunked((m["normal_tex"] >= 0) & active, nm_body, n_geom,
                         cap=_CHUNK_SMALL)
    else:
        n = n_geom

    hit_pos = ray_o + ray_d * t_hit[..., None]
    bias = shadow_bias(t_hit)
    return m, n, hit_pos, bias


def _light_gate(lights: DirectionalLights, i: int, m, n, hit_pos, cam_pos,
                active):
    """Per-record gate for directional light i (the shade loop's gate
    condition, RayTracing.metalinc:320-330 + the unlit fast path) and its
    max shadow distance. Returns (gate, ndotl, max_dist, l)."""
    max_dist = jnp.where(lights.max_distance[i] > 0,
                         lights.max_distance[i], 1e6)
    l = normalize(-lights.direction[i])
    ndotl = jnp.maximum(jnp.sum(n * l, axis=-1), 0.0)
    cam_dist = jnp.linalg.norm(hit_pos - cam_pos, axis=-1)
    # Unlit fast path (see _UNLIT_FAST): unlit lanes leave every light's
    # gate, so a chunk of pure-hull hits (transparency layers 2+) runs NO
    # shadow walk at all — its shadow packets enter fully dead and exit on
    # the first traversal step.
    lit = jnp.logical_not(m["unlit"]) if _UNLIT_FAST else \
        jnp.ones_like(active)
    gate = active & lit & lights.enabled[i] & (cam_dist <= max_dist) \
        & (ndotl > 0)
    return gate, ndotl, max_dist, l


def _light_records(ibl: IBL, lights: DirectionalLights, cam_pos, ray_d,
                   m, n, hit_pos, active, with_ibl_spec: bool,
                   shadow0=None, gates=None):
    """Lighting stage over pre-computed G-buffer records: GGX direct per
    light + SH ambient + split-sum IBL + unlit override — all elementwise.
    ``shadow0``: light-0 shadow factor per record (1 everywhere if None).
    ``gates``: optional per-light gate list (recomputed here if None)."""
    view = normalize(-ray_d)
    direct = jnp.zeros_like(hit_pos)
    for i in range(lights.direction.shape[0]):
        if gates is not None:
            gate, ndotl, _, l = gates[i]
        else:
            gate, ndotl, _, l = _light_gate(lights, i, m, n, hit_pos,
                                            cam_pos, active)
        if i == 0 and shadow0 is not None and not _PROF_SHADOW_OFF:
            shadow = shadow0
        else:
            shadow = jnp.ones_like(ndotl)
        if _PROF_BRDF_OFF:
            brdf = m["base"]
        else:
            brdf = eval_brdf(n, view, jnp.broadcast_to(l, n.shape),
                             m["base"], m["metallic"], m["roughness"])
        li = lights.color[i] * lights.intensity[i]
        direct = direct + jnp.where(gate[..., None],
                                    brdf * li * (ndotl * shadow)[..., None], 0.0)

    ambient = m["base"] * eval_env_sh(n, ibl.sh0, ibl.sh1) * AMBIENT_INTENSITY \
        * m["occlusion"][..., None]
    color = direct + ambient + m["emissive"]
    if with_ibl_spec and not _NO_SPEC_IBL:
        spec = eval_spec_ibl(n, view, m["roughness"], m["metallic"], m["base"],
                             ibl.brdf_lut)
        color = color + spec * m["occlusion"][..., None]
    if _UNLIT_FAST:
        # albedo + emissive, exactly the raster unlit branch
        # (ShadersRaster.metalinc:73-75).
        color = jnp.where(m["unlit"][..., None],
                          m["base"] + m["emissive"], color)
    return jnp.where(active[..., None], color, 0.0)


@partial(jax.jit, static_argnames=("with_ibl_spec", "shadow_layers", "usage",
                                   "shadow_sort"))
def _shade_hit(geo, fg: FrameGeometry, ibl: IBL, lights: DirectionalLights,
               cam_pos, ray_o, ray_d, t_hit, tri, u, v, active,
               with_ibl_spec: bool, shadow_layers: int, usage=None,
               shadow_rows=None, shadow_clusters=None, shadow_sort=None):
    """Shade one hit batch. Returns (color, m, n_shade, hit_pos, bias).

    Inactive/missed lanes are sanitized (t := 1) and their color forced to 0
    so downstream arithmetic can't propagate inf/NaN through `x * 0`.
    Composition of _gbuffer + per-light shadow + _light_records; the
    deferred pipeline (render.deferred) calls the stages directly instead
    so the whole frame shares ONE shadow sweep and ONE light pass.
    """
    if usage is None:
        usage = FULL_USAGE
    m, n, hit_pos, bias = _gbuffer(geo, fg, ray_o, ray_d, t_hit, tri, u, v,
                                   active, usage)
    gates = [_light_gate(lights, i, m, n, hit_pos, cam_pos, active)
             for i in range(lights.direction.shape[0])]
    shadow0 = None
    if not _PROF_SHADOW_OFF:
        gate0, _, max_dist0, _ = gates[0]
        shadow0 = _shadow_factor(geo, fg, hit_pos, n, lights.direction[0],
                                 max_dist0, bias, gate0, shadow_layers,
                                 usage, shadow_rows=shadow_rows,
                                 shadow_clusters=shadow_clusters,
                                 sort=shadow_sort)
    color = _light_records(ibl, lights, cam_pos, ray_d, m, n, hit_pos,
                           active, with_ibl_spec, shadow0=shadow0,
                           gates=gates)
    return color, m, n, hit_pos, bias


# Primary visibility source for the RT path:
#   "auto"   — "hybrid" on TPU (round-4 measured winner; no tree-size
#              cliff either: cluster rows stream from HBM), "trace" when
#              the Pallas kernels are unavailable (pure-JAX fallback).
#   "trace"  — BVH packet kernel (the reference's intersector semantics)
#   "raster" — binned tile rasterizer (render.tile_raster) for LAYER 1 only;
#              transparency layers 2+ still trace chunk-compacted
#              continuation rays (their cost scales with covered pixels)
#   "peels"  — depth-peeled rasterizer supplies EVERY layer's hit records
#              (no visibility traces at all; dense per-layer cost)
#   "hybrid" — round 4: opaque-only cluster raster (1 layer, strong
#              occlusion early-exit, no insertion network) + depth-peeled
#              raster of ONLY the translucent subset (a tiny static
#              partition), composed elementwise into the same per-layer
#              records the layered walk yields (incl. the 2*bias
#              continuation skip — closer to the traced semantics than
#              "peels"). Visibility cost collapses to the opaque raster.
_RT_PRIMARY = knob("SGE_RT_PRIMARY")


def _trans_subdiv_ok(geo: SceneGeometry, tr_flag) -> bool:
    """STATIC gate for translucent-triangle subdivision: every material in
    the translucent set must bind NO texture slot. Sub-triangle
    barycentrics differ from the parent's, but then feed only texture taps
    (uv interp) — factor-driven shading (base/alpha/emissive/MR factors,
    face normal from the parent id, t from the shared plane) is identical
    for any point on the parent triangle."""
    tr = np.asarray(tr_flag)
    if not tr.any():
        return False
    mids = np.unique(np.maximum(np.asarray(geo.tri_material), 0)[tr])
    mats = geo.materials
    for f in ("base_tex", "normal_tex", "mr_tex", "emissive_tex",
              "occlusion_tex"):
        if (np.asarray(getattr(mats, f))[mids] >= 0).any():
            return False
    return True


def _opaque_tris(geo: SceneGeometry):
    """Per-triangle 'fragment fully occludes' flag for raster early exit:
    material alpha factor >= 0.99 (the shading loop's accumulation cutoff)
    and no alpha-carrying base texture bound."""
    mid = jnp.maximum(geo.tri_material, 0)
    opaque = geo.materials.alpha[mid] >= 0.99
    us = texture_usage(geo)
    if us.base and us.alpha_tex:
        opaque = opaque & (geo.materials.base_tex[mid] < 0)
    return opaque


def _opaque_tris_np(geo: SceneGeometry):
    """Numpy twin of _opaque_tris: geo's leaves are concrete closure
    constants even inside a jit trace, so the STATIC opaque/translucent
    partition must be computed with numpy ops (jnp ops would yield
    tracers)."""
    mid = np.maximum(np.asarray(geo.tri_material), 0)
    opaque = np.asarray(geo.materials.alpha)[mid] >= 0.99
    us = texture_usage(geo)
    if us.base and us.alpha_tex:
        opaque = opaque & (np.asarray(geo.materials.base_tex)[mid] < 0)
    return opaque


def render_frame(geo: SceneGeometry, fg: FrameGeometry, ibl: IBL,
                 lights: DirectionalLights, inv_view_proj, cam_pos,
                 width: int, height: int, max_layers: int = 3,
                 shadow_layers: int = 4, enable_mirror: bool = True,
                 enable_refraction: bool = True, view_proj=None):
    """Full RT frame -> (H, W, 3) linear color (rgba16f-equivalent range).

    Round 4: the whole frame lives in PADDED TILE-MAJOR lane order — rays
    are generated directly in the (tile_h x 128) tile layout the cluster
    rasterizer and the traversal packets natively use, raster outputs are
    pure reshapes, and the final image is one reshape+transpose+crop. No
    permutation gathers exist anywhere (each scanline<->tile (H*W,) gather
    measured ~3.9 ms on one v5e; raster modes paid up to 20 of them)."""
    from .camera import generate_rays_tiled, untile_image
    from .tile_raster import TILE_W, _TILE_H_DEFAULT
    th = _RASTER_TILE_H or _TILE_H_DEFAULT
    ray_o, ray_d, pxl, pyl = generate_rays_tiled(inv_view_proj, cam_pos,
                                                 width, height, tile_h=th,
                                                 tile_w=TILE_W)

    primary = None
    peels = None
    hybrid = None
    mode = _RT_PRIMARY
    if mode == "auto":
        mode = "trace" if _FORCE_JAX_TRAVERSAL else "hybrid"
    if mode in ("raster", "peels", "hybrid"):
        if view_proj is None:
            view_proj = jnp.linalg.inv(jnp.asarray(inv_view_proj, jnp.float32))
        interp = jax.default_backend() != "tpu"

    if mode == "hybrid":
        # Exact algebraic w->t conversion shared by every record: for a
        # pinhole ray p = cam + d*t, the clip w (the rasterizer's
        # interpolated view depth) is w = w(cam) + t * (vp[3,:3] . d), so
        # t = (w - w(cam)) / (vp[3,:3] . d) — elementwise, replacing the
        # resolve's three (P,3) vertex gathers PER LAYER (~16 ms/frame).
        vp3 = jnp.asarray(view_proj, jnp.float32)[3]
        w_cam = jnp.sum(vp3[:3] * jnp.asarray(cam_pos, jnp.float32)) + vp3[3]
        wd = ray_d @ vp3[:3]
        inv_wd = 1.0 / jnp.where(jnp.abs(wd) < 1e-12, 1e-12, wd)

        def rec_of(h):
            t = jnp.where(h.found, (h.w_depth - w_cam) * inv_wd, BIG)
            return (t, h.tri, h.u, h.v, h.found)
    else:
        def rec_of(h):
            return (h.t, h.tri, h.u, h.v, h.found)

    if mode == "hybrid":
        from .tile_raster import rasterize_clusters
        # Partition by the FACTOR-only translucency marker — the exact
        # semantics the layered walk bakes into its records
        # (scene_geometry tri_translucent; texture alpha is handled
        # downstream by the shading chain, not by visibility layering).
        tr_flag = np.asarray(geo.tri_translucent)
        opq_idx = np.nonzero(~tr_flag)[0]
        tr_idx = np.nonzero(tr_flag)[0]

        oi = jnp.asarray(opq_idx, jnp.int32)
        h_o = rasterize_clusters(
            fg.bvh.v0[oi], fg.bvh.v1[oi], fg.bvh.v2[oi], view_proj, cam_pos,
            width, height, layers=1, interpret=interp,
            opaque=jnp.ones(len(opq_idx), bool), cluster=_RASTER_CLUSTER,
            tile_h=th, lists=_RASTER_LISTS, flat_tiles=True,
            ids=oi.astype(jnp.float32), resolve_t=False)[0]
        trans_recs = []
        if len(tr_idx):
            ti = jnp.asarray(tr_idx, jnp.int32)
            v0t, v1t, v2t = fg.bvh.v0[ti], fg.bvh.v1[ti], fg.bvh.v2[ti]
            ids_t = ti.astype(jnp.float32)
            depth = _TRANS_SUBDIV if _trans_subdiv_ok(geo, tr_flag) else 0
            for _ in range(depth):
                m01 = (v0t + v1t) * 0.5
                m12 = (v1t + v2t) * 0.5
                m20 = (v2t + v0t) * 0.5
                # children (A,M01,M20) (M01,B,M12) (M20,M12,C)
                # (M01,M12,M20), interleaved so a parent's children stay
                # adjacent (cluster AABB locality)
                v0t, v1t, v2t = (
                    jnp.stack([v0t, m01, m20, m01], 1).reshape(-1, 3),
                    jnp.stack([m01, v1t, m12, m12], 1).reshape(-1, 3),
                    jnp.stack([m20, m12, v2t, m20], 1).reshape(-1, 3))
                ids_t = jnp.repeat(ids_t, 4)
            h_ts = rasterize_clusters(
                v0t, v1t, v2t, view_proj,
                cam_pos, width, height, layers=max_layers, interpret=interp,
                cluster=_RASTER_TRANS_CLUSTER,
                tile_h=th, flat_tiles=True,
                ids=ids_t, resolve_t=False,
                prior_w=h_o.w_depth)
            trans_recs = [rec_of(h) for h in h_ts]
        hybrid = (rec_of(h_o), trans_recs)
    if mode == "peels":
        # Rasterized visibility for layer 1 AND the transparency layers:
        # layer L's hit record is the depth-peel strictly behind layer L-1
        # (same surface sequence the traced continuation rays walk — rays
        # go through pixel centers, so "next hit along the ray" == "next
        # depth behind the previous fragment"). The BVH only serves shadow
        # / mirror / refraction rays in this mode.
        from .tile_raster import rasterize_clusters
        raw_peels = rasterize_clusters(
            fg.bvh.v0, fg.bvh.v1, fg.bvh.v2, view_proj, cam_pos,
            width, height, layers=max_layers, interpret=interp,
            opaque=_opaque_tris(geo), cluster=_RASTER_CLUSTER,
            tile_h=th, lists=_RASTER_LISTS, flat_tiles=True)
        peels = [rec_of(h) for h in raw_peels]
    elif mode == "raster":
        from .tile_raster import rasterize_clusters
        h = rasterize_clusters(fg.bvh.v0, fg.bvh.v1, fg.bvh.v2,
                               view_proj, cam_pos, width, height,
                               layers=1, interpret=interp,
                               cluster=_RASTER_CLUSTER,
                               tile_h=th, lists=_RASTER_LISTS,
                               flat_tiles=True)[0]
        primary = rec_of(h)

    out = _render_rays(geo, fg, ibl, lights, cam_pos, ray_o, ray_d,
                       max_layers, shadow_layers, enable_mirror,
                       enable_refraction, primary=primary, peels=peels,
                       hybrid=hybrid)
    # Per-pixel hash dither in lane order (identical per-pixel values to
    # the reference's screen-space hash), then one reshape to the image.
    noise = hash12(jnp.stack([pxl.astype(jnp.float32),
                              pyl.astype(jnp.float32)], axis=-1))
    dither = (noise - 0.5) * (1.0 / 255.0)
    out = jnp.maximum(out + dither[..., None], 0.0)
    return untile_image(out, width, height, tile_h=th, tile_w=TILE_W)


def _mirror_pass(geo, fg, ibl, lights, cam, d, n, hit_pos, bias, metallic,
                 base, mask, color, shadow_layers, usage, shadow_rows=None,
                 shadow_clusters=None):
    """One deterministic mirror bounce for the set lanes of ``mask``
    (RayTracing.metalinc:382-542), chunk-compacted. The color carry rides
    as channel-split 1-D arrays (see shade_layers_batched's chunk note)."""
    p = mask.shape[0]

    def body(idx, valid, carry):
        cr, cg, cb = carry
        safe = jnp.minimum(idx, p - 1)
        n_c = n[safe]
        d_c = d[safe]
        r_dir = normalize(reflect(d_c, n_c))
        r_o = jnp.where(valid[:, None],
                        hit_pos[safe] + n_c * bias[safe][..., None], 1.0e9)
        rt, rtri, ru, rv, rfound = _trace_batch(fg.bvh, r_o, r_dir, valid)
        r_color, r_m, _, _, _ = _shade_hit(
            geo, fg, ibl, lights, cam, r_o, r_dir, rt, rtri, ru, rv,
            rfound, False, shadow_layers, usage=usage,
            shadow_rows=shadow_rows, shadow_clusters=shadow_clusters,
            shadow_sort=True)
        refl_alpha = jnp.where(rfound, r_m["alpha"], 0.0)
        refl = jnp.where(rfound[..., None], r_color * refl_alpha[..., None], 0.0) \
            + BG_COLOR * (1.0 - refl_alpha)[..., None]
        nov = jnp.clip(jnp.sum(n_c * normalize(-d_c), axis=-1), 0.0, 1.0)
        met = metallic[safe]
        f0 = 0.04 * (1.0 - met[..., None]) + base[safe] * met[..., None]
        f = fresnel_schlick3(nov, f0)
        old_c = jnp.stack([cr[safe], cg[safe], cb[safe]], axis=-1)
        new_c = old_c * (1.0 - f) + refl * f
        return (cr.at[idx].set(new_c[:, 0]), cg.at[idx].set(new_c[:, 1]),
                cb.at[idx].set(new_c[:, 2]))

    cr, cg, cb = _chunked_trace(mask, body,
                                (color[:, 0], color[:, 1], color[:, 2]),
                                cap_lanes=_CHUNK_BOUNCE)
    return jnp.stack([cr, cg, cb], axis=-1)


def refraction_setup(d, n, ior):
    """Dense refraction precompute (RayTracing.metalinc:546-556): Fresnel
    eta flip for rays hitting a back-facing shading normal (cosi < 0 ->
    medium exit, eta = ior), Snell refract, TIR gate via |T|. Returns
    (t_dir (unnormalized; zero on TIR), t_len, eta)."""
    view = normalize(-d)
    cosi = jnp.sum(n * view, axis=-1)
    flip = cosi < 0
    n_r = jnp.where(flip[..., None], -n, n)
    eta = jnp.where(flip, ior, 1.0 / ior)
    t_dir = refract(-view, n_r, eta)
    t_len = jnp.linalg.norm(t_dir, axis=-1)
    return t_dir, t_len, eta


def _refraction_pass(geo, fg, ibl, lights, cam, d, n, hit_pos, bias, base,
                     transmission, ior, found, color, shadow_layers, usage,
                     shadow_rows=None, shadow_clusters=None):
    """One refraction bounce with IOR eta flip + Fresnel mix for
    transmissive hits (RayTracing.metalinc:544-713), chunk-compacted. The
    refracted direction is computed densely (cheap vector math); only the
    bounce trace + shade are chunked."""
    p = found.shape[0]
    view = normalize(-d)
    t_dir, t_len, _eta = refraction_setup(d, n, ior)
    has_t = found & (transmission > 0.001) & (t_len > 0)

    def body(idx, valid, carry):
        cr, cg, cb = carry
        safe = jnp.minimum(idx, p - 1)
        t_dir_c = t_dir[safe]
        t_dir_n = t_dir_c / jnp.maximum(t_len[safe][..., None], 1e-20)
        t_o = jnp.where(valid[:, None],
                        hit_pos[safe] + t_dir_c * bias[safe][..., None], 1.0e9)
        ft, ftri, fu, fv, ffound = _trace_batch(fg.bvh, t_o, t_dir_n, valid)
        f_color, f_m, _, _, _ = _shade_hit(
            geo, fg, ibl, lights, cam, t_o, t_dir_n, ft, ftri, fu, fv,
            ffound, False, shadow_layers, usage=usage,
            shadow_rows=shadow_rows, shadow_clusters=shadow_clusters,
            shadow_sort=True)
        refr_alpha = jnp.where(ffound, f_m["alpha"], 0.0)
        refr_bg = eval_env_sh(t_dir_n, ibl.sh0, ibl.sh1) * AMBIENT_INTENSITY
        refr = jnp.where(ffound[..., None], f_color * refr_alpha[..., None], 0.0) \
            + refr_bg * (1.0 - refr_alpha)[..., None]
        f_s = fresnel_schlick(jnp.clip(jnp.sum(n[safe] * view[safe], axis=-1),
                                       0.0, 1.0), jnp.float32(0.04))[..., None]
        trans_color = refr * base[safe]
        old_c = jnp.stack([cr[safe], cg[safe], cb[safe]], axis=-1)
        mix_color = trans_color * (1.0 - f_s) + old_c * f_s
        new_c = old_c + (mix_color - old_c) * transmission[safe][..., None]
        return (cr.at[idx].set(new_c[:, 0]), cg.at[idx].set(new_c[:, 1]),
                cb.at[idx].set(new_c[:, 2]))

    cr, cg, cb = _chunked_trace(has_t, body,
                                (color[:, 0], color[:, 1], color[:, 2]),
                                cap_lanes=_CHUNK_BOUNCE)
    return jnp.stack([cr, cg, cb], axis=-1)


def _render_rays(geo: SceneGeometry, fg: FrameGeometry, ibl: IBL,
                 lights: DirectionalLights, cam_pos, ray_o, ray_d,
                 max_layers: int = 3, shadow_layers: int = 4,
                 enable_mirror: bool = True, enable_refraction: bool = True,
                 primary=None, peels=None, hybrid=None):
    """Trace + shade a flat ray batch -> (P,3) colors (no dither/reshape).

    Layer 1 is a dense full-batch trace + shade (every pixel needs it);
    mirror/refraction bounces and transparency layers 2+ run chunk-compacted
    (see _chunked) so their cost scales with the lanes that need them.
    With ``peels`` (pre-rasterized per-layer hit records, see render_frame)
    no layer traces the BVH: layer L shades peel L's records, compacted to
    the lanes still accumulating.

    The shardable core: embarrassingly parallel over rays (parallel.sharding
    partitions this over the device mesh)."""
    if _PROF_LAYERS1:   # timing-only: primary layer + bounces, no L2+
        max_layers = 1
    p = ray_o.shape[0]
    cam = jnp.asarray(cam_pos, jnp.float32)
    usage = texture_usage(geo)  # static: geo is concrete at trace time

    d = ray_d

    # Per-frame shadow constants for the shared sun direction (light 0 is
    # the only shadow-casting light, as in the reference). One XLA
    # precompute shared by every shade call in the frame.
    shadow_rows = None
    shadow_clusters = None
    use_shadow_clusters = _SHADOW_CLUSTERS and \
        ray_o.shape[0] >= _SHADOW_CLUSTER_MIN_LANES
    if use_shadow_clusters and not _FORCE_JAX_TRAVERSAL and \
            1 <= shadow_layers <= 4:
        from ..ops.cluster_shadow import (build_shadow_clusters,
                                          build_shadow_split)
        l0 = normalize(-lights.direction[0])
        # Always bake the alpha payload (slot 13 was spare); whether the
        # kernel READS it is decided per shade call from the static usage
        # (see _shadow_factor).
        mid_t = jnp.maximum(geo.tri_material, 0)
        alpha_tri = jnp.clip(geo.materials.alpha[mid_t], 0.0, 1.0)
        if _SHADOW_SPLIT:
            # geo is concrete at trace time: the translucent subset indices
            # are a STATIC partition (material-driven).
            tr_idx = np.nonzero(np.asarray(geo.tri_translucent))[0]
            shadow_clusters = build_shadow_split(
                fg.bvh.v0, fg.bvh.v1, fg.bvh.v2, l0, geo.tri_translucent,
                alpha=alpha_tri, trans_idx=tr_idx)
        else:
            shadow_clusters = build_shadow_clusters(
                fg.bvh.v0, fg.bvh.v1, fg.bvh.v2, l0, geo.tri_translucent,
                alpha=alpha_tri)
    elif _SHADOW_KERNEL and not _FORCE_JAX_TRAVERSAL and \
            1 <= shadow_layers <= 4:
        from ..ops.rt_kernel import (shadow_prepass_available,
                                     build_shadow_rows)
        if shadow_prepass_available(fg.bvh.rows):
            l0 = normalize(-lights.direction[0])
            shadow_rows = build_shadow_rows(fg.bvh.rows, l0)

    # Shared-origin trace constants (ops/rt_kernel shared-origin section):
    # primary rays all start at the camera, and transparency continuations
    # are the SAME lines with a t floor, so one per-frame precompute serves
    # layer 1 AND layers 2+ with 3-dot-product leaf tests.
    so_rows = None
    if _SO_KERNEL and not _FORCE_JAX_TRAVERSAL and primary is None \
            and peels is None and hybrid is None:
        from ..ops.rt_kernel import so_available, build_origin_rows
        if so_available(fg.bvh.rows):
            so_rows = build_origin_rows(fg.bvh.rows, cam)

    def shade_layer(o_l, d_l, t, tri, u, v, found, alpha_in,
                    compacted=False):
        """Shade one layer's hits incl. bounces -> (color, contrib, next_o).

        ``compacted`` (static): the batch is a chunk-compacted record set —
        its shadow lanes are scattered AND majority-dead (unlit hulls leave
        the light gate), so the sweep runs live-first partitioned (see
        _shadow_factor sort=)."""
        color, m, n, hit_pos, bias = _shade_hit(
            geo, fg, ibl, lights, cam, o_l, d_l, t, tri, u, v, found,
            True, shadow_layers, usage=usage, shadow_rows=shadow_rows,
            shadow_clusters=shadow_clusters, shadow_sort=compacted or None)
        if _PROF_NO_BOUNCE:
            contrib = jnp.where(found, m["alpha"] * (1.0 - alpha_in), 0.0)
            next_o = hit_pos + d_l * (bias * 2.0)[..., None]
            return color, contrib, next_o
        if enable_mirror:
            mirror = found & (m["roughness"] <= 0.08) & (m["metallic"] >= 0.8)
            color = _mirror_pass(geo, fg, ibl, lights, cam, d_l, n, hit_pos,
                                 bias, m["metallic"], m["base"], mirror,
                                 color, shadow_layers, usage,
                                 shadow_rows=shadow_rows,
                                 shadow_clusters=shadow_clusters)
        if enable_refraction:
            color = _refraction_pass(geo, fg, ibl, lights, cam, d_l, n,
                                     hit_pos, bias, m["base"],
                                     m["transmission"], m["ior"], found,
                                     color, shadow_layers, usage,
                                     shadow_rows=shadow_rows,
                                     shadow_clusters=shadow_clusters)
        contrib = jnp.where(found, m["alpha"] * (1.0 - alpha_in), 0.0)
        next_o = hit_pos + d_l * (bias * 2.0)[..., None]
        return color, contrib, next_o

    def shade_layers_batched(recs, accum=None, accum_alpha=None, live=None):
        """Batched layer shading (see _LBATCH): shade the given layers'
        found records in one compacted chunk loop (per-record color + alpha
        scattered to (L*p,) buffers), then run the alpha accumulation chain
        elementwise. ``recs``: [(t, tri, u, v, found)] per layer; u/v None
        -> barycentrics computed inside the chunk. ``accum``/``accum_alpha``
        /``live``: chain state from layers already shaded (mode 2 shades
        L1 densely first). Per-record color is independent of the alpha
        chain, so this is math-identical to the sequential layer loop."""
        from ..ops.rt_kernel import barycentrics
        nl = len(recs)
        t_s = jnp.stack([r[0] for r in recs]).reshape(-1)
        tri_s = jnp.stack([r[1] for r in recs]).reshape(-1)
        f_s = [r[4] for r in recs]
        have_uv = recs[0][2] is not None
        if have_uv:
            u_s = jnp.stack([r[2] for r in recs]).reshape(-1)
            v_s = jnp.stack([r[3] for r in recs]).reshape(-1)
        if accum is None:
            accum = jnp.zeros((p, 3))
            accum_alpha = jnp.zeros(p)
            live = jnp.ones(p, bool)

        def chunk(idx, valid, carry):
            # carry is channel-split 1-D arrays: a (nl*p, 3) while carry
            # gets a dim0-minor layout whose row scatter rewrites the
            # whole padded buffer at ~3 GB/s (measured 10.7 ms/iteration);
            # 1-D scatters into T(1024) arrays are cheap.
            cr, cg, cb, alphas = carry
            safe = jnp.minimum(idx, nl * p - 1)
            lane = safe % p
            oc = ray_o[lane]
            dc = d[lane]
            tc = jnp.where(valid, t_s[safe], 1.0)
            tric = jnp.where(valid, tri_s[safe], -1)
            if have_uv:
                uc, vc = u_s[safe], v_s[safe]
            else:
                uc, vc, _ = barycentrics(fg.bvh, oc, dc, tc, tric)
            # alpha_in=0 -> shade_layer's contrib IS the record's alpha
            color, alpha, _ = shade_layer(oc, dc, tc, tric, uc, vc, valid,
                                          jnp.zeros_like(tc),
                                          compacted=True)
            cr = cr.at[idx].set(color[:, 0])
            cg = cg.at[idx].set(color[:, 1])
            cb = cb.at[idx].set(color[:, 2])
            alphas = alphas.at[idx].set(alpha)
            return cr, cg, cb, alphas

        # Records already settled by the incoming chain (saturated or
        # chain-dead lanes) need no shading at all.
        chain_open = live & (accum_alpha < 0.99)
        flat = jnp.concatenate([f & chain_open for f in f_s])
        heavy = flat
        rec_simple = None
        z = jnp.zeros(nl * p)
        init = (z, z, z, z)
        if _UNLIT_DENSE:
            # Dense simple-unlit resolve (see _UNLIT_DENSE): one row-table
            # gather replaces every chunk iteration those records would
            # occupy. The (T,5) table is a traced constant (geo concrete).
            simple_tri = _simple_unlit_tri(geo, usage, enable_mirror,
                                           enable_refraction)
            mid_t = jnp.maximum(geo.tri_material, 0)
            rowt = geo.materials.packed[mid_t]
            tab = jnp.concatenate([
                rowt[:, 0:3] + rowt[:, 6:9],
                jnp.clip(rowt[:, 3:4], 0.0, 1.0),
                jnp.asarray(simple_tri, jnp.float32)[:, None]], axis=1)
            rec = tab[jnp.maximum(tri_s, 0)]          # ONE (nl*p, 5) gather
            simple_d = flat & (rec[:, 4] > 0.5)
            heavy = flat & jnp.logical_not(simple_d)
            sd = simple_d.astype(jnp.float32)
            init = (rec[:, 0] * sd, rec[:, 1] * sd, rec[:, 2] * sd,
                    rec[:, 3] * sd)
        elif _UNLIT_SPLIT:
            simple_tri = _simple_unlit_tri(geo, usage, enable_mirror,
                                           enable_refraction)
            rec_simple = flat & simple_tri[jnp.maximum(tri_s, 0)]
            heavy = flat & jnp.logical_not(rec_simple)
        cr, cg, cb, alphas = _chunked(heavy, chunk, init, cap=_CHUNK)
        if rec_simple is not None:
            def cheap(idx, valid):
                tri_c = jnp.maximum(tri_s[jnp.minimum(idx, nl * p - 1)], 0)
                mid = jnp.maximum(geo.tri_material[tri_c], 0)
                row = geo.materials.packed[mid]
                color = jnp.where(valid[:, None],
                                  row[..., 0:3] + row[..., 6:9], 0.0)
                alpha = jnp.where(valid, jnp.clip(row[..., 3], 0.0, 1.0),
                                  0.0)
                return color[:, 0], color[:, 1], color[:, 2], alpha

            cr, cg, cb, alphas = _compacted(rec_simple, cheap,
                                            (cr, cg, cb, alphas), cap=_CHUNK)
        colors = jnp.stack([cr.reshape(nl, p), cg.reshape(nl, p),
                            cb.reshape(nl, p)], axis=-1)
        alphas = alphas.reshape(nl, p)
        for li in range(nl):
            live = live & f_s[li] & (accum_alpha < 0.99)
            contrib = jnp.where(live, alphas[li] * (1.0 - accum_alpha), 0.0)
            accum = accum + colors[li] * contrib[..., None]
            accum_alpha = accum_alpha + contrib
        return accum + BG_COLOR * (1.0 - accum_alpha)[..., None]

    # ---- hybrid visibility (round 4): per-layer records composed from the
    # opaque raster + translucent peels (see render_frame "hybrid"), with
    # the SAME floor-chain semantics as the layered walk (incl. the 2*bias
    # continuation skip). Shading shares the layered flow: dense L1 +
    # batched/chunked continuations.
    if hybrid is not None:
        (t_o, tri_o, u_o, v_o, f_o), trs = hybrid
        t_opq = jnp.where(f_o, t_o, BIG)
        recs = []
        floor = jnp.zeros(p)
        for _layer in range(max_layers):
            tn = jnp.full(p, BIG)
            idn = jnp.full(p, -1, jnp.int32)
            un = jnp.zeros(p)
            vn = jnp.zeros(p)
            # nearest translucent record past the floor and in front of the
            # opaque hit (peels are depth-sorted; scan far-to-near so the
            # nearest eligible record wins).
            for k in reversed(range(len(trs))):
                tk, trik, uk, vk, fk = trs[k]
                ok = fk & (tk > floor) & (tk < t_opq)
                tn = jnp.where(ok, tk, tn)
                idn = jnp.where(ok, trik, idn)
                un = jnp.where(ok, uk, un)
                vn = jnp.where(ok, vk, vn)
            use_opq = f_o & (t_opq > floor) & (tn >= BIG)
            t_l = jnp.where(use_opq, t_opq, tn)
            tri_l = jnp.where(use_opq, tri_o, idn)
            u_l = jnp.where(use_opq, u_o, un)
            v_l = jnp.where(use_opq, v_o, vn)
            found_l = use_opq | (tn < BIG)
            t_l = jnp.where(found_l, t_l, BIG)
            tri_l = jnp.where(found_l, tri_l, -1)
            floor = jnp.where(found_l, t_l + 2.0 * shadow_bias(t_l), floor)
            recs.append((t_l, tri_l, u_l, v_l, found_l))

        if _DEFERRED:
            from .deferred import shade_deferred
            return shade_deferred(geo, fg, ibl, lights, cam, ray_o, d, recs,
                                  shadow_layers, enable_mirror,
                                  enable_refraction, usage,
                                  shadow_rows=shadow_rows,
                                  shadow_clusters=shadow_clusters)
        if _LBATCH == 1:
            return shade_layers_batched(recs)
        t_1, tri_1, u_1, v_1, f_1 = recs[0]
        color, contrib, _ = shade_layer(ray_o, d, t_1, tri_1, u_1, v_1, f_1,
                                        jnp.zeros(p))
        accum = color * contrib[..., None]
        accum_alpha = contrib
        if max_layers > 1 and _LBATCH == 2:
            return shade_layers_batched(recs[1:], accum, accum_alpha, f_1)
        if max_layers > 1 and _LBATCH == 3:
            # Dense continuation shading (see the _LBATCH=3 note): the
            # chain gate IS the shade mask; records behind a saturated
            # chain shade as dead lanes.
            live = f_1
            for layer in range(1, max_layers):
                t_l, tri_l, u_l, v_l, f_l = recs[layer]
                live = live & f_l & (accum_alpha < 0.99)
                color, contrib, _ = shade_layer(ray_o, d, t_l, tri_l, u_l,
                                                v_l, live, accum_alpha)
                accum = accum + color * contrib[..., None]
                accum_alpha = accum_alpha + contrib
            return accum + BG_COLOR * (1.0 - accum_alpha)[..., None]
        for layer in range(1, max_layers):
            t_l, tri_l, u_l, v_l, f_l = recs[layer]

            def chunk(idx, valid, carry, _t=t_l, _tri=tri_l, _u=u_l, _v=v_l):
                accum, accum_alpha = carry
                safe = jnp.minimum(idx, p - 1)
                color, contrib, _ = shade_layer(
                    ray_o[safe], d[safe], _t[safe], _tri[safe], _u[safe],
                    _v[safe], valid, accum_alpha[safe], compacted=True)
                accum = accum.at[idx].add(color * contrib[..., None])
                accum_alpha = accum_alpha.at[idx].add(contrib)
                return accum, accum_alpha

            accum, accum_alpha = _chunked(
                f_l & (accum_alpha < 0.99), chunk, (accum, accum_alpha),
                cap=_CHUNK)
        return accum + BG_COLOR * (1.0 - accum_alpha)[..., None]

    # ---- layered shared-origin path: ONE walk yields every layer's hit
    # records; no continuation re-traces exist at all (see _LAYERED).
    if so_rows is not None and _LAYERED and peels is None and primary is None:
        from ..ops.rt_kernel import (trace_layers_so, barycentrics,
                                     BIG as KBIG)
        interp = jax.default_backend() != "tpu"
        n_slots = _LAYER_SLOTS if _LAYER_SLOTS > 0 else max_layers
        t_opq, otri, lts, lids = trace_layers_so(
            so_rows, cam, d, jnp.full(p, KBIG, jnp.float32),
            n_slots=n_slots, interpret=interp)
        opq_ok = t_opq < KBIG

        # Per-layer records from the walk's slots (elementwise floor
        # chain — independent of shading).
        recs = []
        floor = jnp.zeros(p)
        for layer in range(max_layers):
            # next record past the floor: smallest translucent t in
            # (floor, t_opq), else the opaque hit if it clears the floor.
            tn = jnp.full(p, KBIG)
            idn = jnp.full(p, -1.0)
            for k in reversed(range(n_slots)):
                ok = (lids[:, k] >= 0) & (lts[:, k] > floor) & \
                    (lts[:, k] < t_opq)
                tn = jnp.where(ok, lts[:, k], tn)
                idn = jnp.where(ok, lids[:, k], idn)
            use_opq = opq_ok & (t_opq > floor) & (tn >= KBIG)
            t_l = jnp.where(use_opq, t_opq, tn)
            tri_l = jnp.where(use_opq, otri,
                              jnp.floor(idn).astype(jnp.int32))
            found_l = use_opq | (tn < KBIG)
            t_l = jnp.where(found_l, t_l, BIG)
            tri_l = jnp.where(found_l, tri_l, -1)
            floor = jnp.where(found_l, t_l + 2.0 * shadow_bias(t_l), floor)
            recs.append((t_l, tri_l, None, None, found_l))

        if _LBATCH == 1:
            return shade_layers_batched(recs)

        accum = jnp.zeros((p, 3))
        accum_alpha = jnp.zeros(p)
        for layer, (t_l, tri_l, _, _, found_l) in enumerate(recs):
            if layer == 0:
                u_l, v_l, _ = barycentrics(fg.bvh, ray_o, d, t_l, tri_l)
                color, contrib, _ = shade_layer(ray_o, d, t_l, tri_l,
                                                u_l, v_l, found_l,
                                                accum_alpha)
                accum = color * contrib[..., None]
                accum_alpha = contrib
                if _LBATCH == 2 and max_layers > 1:
                    return shade_layers_batched(recs[1:], accum,
                                                accum_alpha, found_l)
                continue

            def chunk(idx, valid, carry, _t=t_l, _tri=tri_l):
                accum, accum_alpha = carry
                safe = jnp.minimum(idx, p - 1)
                oc = ray_o[safe]
                dc = d[safe]
                tc = jnp.where(valid, _t[safe], 1.0)
                tric = jnp.where(valid, _tri[safe], -1)
                uc, vc, _ = barycentrics(fg.bvh, oc, dc, tc, tric)
                color, contrib, _ = shade_layer(oc, dc, tc, tric, uc, vc,
                                                valid, accum_alpha[safe],
                                                compacted=True)
                accum = accum.at[idx].add(color * contrib[..., None])
                accum_alpha = accum_alpha.at[idx].add(contrib)
                return accum, accum_alpha

            accum, accum_alpha = _chunked(
                found_l & (accum_alpha < 0.99), chunk,
                (accum, accum_alpha), cap=_CHUNK)

        return accum + BG_COLOR * (1.0 - accum_alpha)[..., None]

    # ---- layer 1: dense over every ray (or pre-rasterized hit records).
    if peels is not None and _LBATCH == 1:
        return shade_layers_batched(peels)
    if peels is not None:
        t, tri, u, v, found = peels[0]
    elif primary is not None:
        t, tri, u, v, found = primary
    elif so_rows is not None:
        from ..ops.rt_kernel import (trace_rays_so, barycentrics,
                                     BIG as KBIG)
        interp = jax.default_backend() != "tpu"
        t, tri = trace_rays_so(so_rows, cam, d,
                               jnp.full(p, KBIG, jnp.float32),
                               interpret=interp)
        u, v, found = barycentrics(fg.bvh, ray_o, d, t, tri)
        found = found & (t < KBIG)
        t = jnp.where(found, t, BIG)
        tri = jnp.where(found, tri, -1)
    else:
        t, tri, u, v, found = _trace_batch(fg.bvh, ray_o, d, jnp.ones(p, bool))
    color, contrib, next_o = shade_layer(ray_o, d, t, tri, u, v, found,
                                         jnp.zeros(p))
    accum = color * contrib[..., None]
    accum_alpha = contrib
    o = jnp.where(found[..., None], next_o, ray_o)
    live = found

    # ---- layers 2..max_layers, pre-rasterized: shade peel L's records,
    # chunk-compacted to lanes still accumulating. Static unroll over the
    # (small) layer count; an empty layer's chunk loop exits immediately.
    if peels is not None and _LBATCH == 2 and max_layers > 1:
        return shade_layers_batched(peels[1:], accum, accum_alpha, live)
    if peels is not None:
        for layer in range(1, max_layers):
            t_l, tri_l, u_l, v_l, f_l = peels[layer]
            live = live & f_l & (accum_alpha < 0.99)

            def chunk(idx, valid, carry, _t=t_l, _tri=tri_l, _u=u_l,
                      _v=v_l):
                accum, accum_alpha = carry
                safe = jnp.minimum(idx, p - 1)
                oc = ray_o[safe]
                dc = d[safe]
                color, contrib, _ = shade_layer(
                    oc, dc, _t[safe], _tri[safe], _u[safe], _v[safe],
                    valid, accum_alpha[safe], compacted=True)
                accum = accum.at[idx].add(color * contrib[..., None])
                accum_alpha = accum_alpha.at[idx].add(contrib)
                return accum, accum_alpha

            accum, accum_alpha = _chunked(live, chunk, (accum, accum_alpha),
                                          cap=_CHUNK)
        return accum + BG_COLOR * (1.0 - accum_alpha)[..., None]

    # ---- layers 2..max_layers: chunk-compacted re-traces.
    if max_layers > 1 and so_rows is not None:
        # Shared-origin continuation: re-trace the ORIGINAL camera ray with
        # a per-lane t floor (t_hit + 2*bias — the same surface-skip margin
        # as the biased continuation origin in the general path; bias here
        # is distance-from-camera-based on deeper layers, an epsilon-level
        # difference).
        from ..ops.rt_kernel import (trace_rays_so, barycentrics,
                                     BIG as KBIG)
        interp = jax.default_backend() != "tpu"
        floor = jnp.where(found, t + 2.0 * shadow_bias(t), 0.0)

        def layer_cond(carry):
            _, live, _, accum_alpha, layer = carry
            return jnp.any(live & (accum_alpha < 0.99)) & (layer < max_layers)

        def layer_body(carry):
            floor, live, accum, accum_alpha, layer = carry
            live = live & (accum_alpha < 0.99)

            def chunk(idx, valid, carry):
                floor, live_next, accum, accum_alpha = carry
                safe = jnp.minimum(idx, p - 1)
                dc = d[safe]
                t, tri = trace_rays_so(
                    so_rows, cam, dc,
                    jnp.where(valid, KBIG, jnp.float32(0.0)),
                    t_floor=floor[safe], interpret=interp)
                u, v, found = barycentrics(fg.bvh, ray_o[safe], dc, t, tri)
                found = found & valid & (t < KBIG)
                t = jnp.where(found, t, BIG)
                tri = jnp.where(found, tri, -1)
                color, contrib, _ = shade_layer(
                    ray_o[safe], dc, t, tri, u, v, found, accum_alpha[safe],
                    compacted=True)
                accum = accum.at[idx].add(color * contrib[..., None])
                accum_alpha = accum_alpha.at[idx].add(contrib)
                new_floor = jnp.where(found, t + 2.0 * shadow_bias(t),
                                      floor[safe])
                floor = floor.at[idx].set(new_floor)
                live_next = live_next.at[idx].set(found & valid)
                return floor, live_next, accum, accum_alpha

            floor, live_next, accum, accum_alpha = _chunked_trace(
                live, chunk,
                (floor, jnp.zeros_like(live), accum, accum_alpha),
                cap_lanes=_CHUNK)
            return floor, live_next, accum, accum_alpha, layer + 1

        _, live, accum, accum_alpha, _ = jax.lax.while_loop(
            layer_cond, layer_body,
            (floor, live, accum, accum_alpha, jnp.int32(1)))
    elif max_layers > 1:
        def layer_cond(carry):
            _, live, _, accum_alpha, layer = carry
            return jnp.any(live & (accum_alpha < 0.99)) & (layer < max_layers)

        def layer_body(carry):
            o, live, accum, accum_alpha, layer = carry
            live = live & (accum_alpha < 0.99)

            def chunk(idx, valid, carry):
                o, live_next, accum, accum_alpha = carry
                safe = jnp.minimum(idx, p - 1)
                oc = jnp.where(valid[:, None], o[safe], 1.0e9)
                dc = d[safe]
                t, tri, u, v, found = _trace_batch(fg.bvh, oc, dc, valid)
                color, contrib, next_o = shade_layer(
                    oc, dc, t, tri, u, v, found, accum_alpha[safe],
                    compacted=True)
                accum = accum.at[idx].add(color * contrib[..., None])
                accum_alpha = accum_alpha.at[idx].add(contrib)
                o = o.at[idx].set(jnp.where(found[:, None], next_o, o[safe]))
                live_next = live_next.at[idx].set(found & valid)
                return o, live_next, accum, accum_alpha

            o, live_next, accum, accum_alpha = _chunked_trace(
                live, chunk, (o, jnp.zeros_like(live), accum, accum_alpha),
                cap_lanes=_CHUNK)
            return o, live_next, accum, accum_alpha, layer + 1

        o, live, accum, accum_alpha, _ = jax.lax.while_loop(
            layer_cond, layer_body, (o, live, accum, accum_alpha, jnp.int32(1)))

    return accum + BG_COLOR * (1.0 - accum_alpha)[..., None]
