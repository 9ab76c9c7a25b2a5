"""Engine configuration: every tuned knob in ONE dataclass (SURVEY §5's
config directive — the reference's configuration surface is constructor
defaults + RendererConstants; ours is this tree). Environment variables
named after each field remain overrides for experiments, read once at
import through :func:`knob`.

The values here are the measured round-4 production defaults; the module
docstrings at each point of use carry the measurement provenance.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


@dataclass(frozen=True)
class RenderConfig:
    """RT/raster pipeline knobs (render.rt, render.tile_raster, ops.*)."""

    # --- primary visibility -------------------------------------------------
    # auto -> "hybrid" on TPU, "trace" for the pure-JAX fallback
    SGE_RT_PRIMARY: str = "auto"
    # traversal rays per Pallas packet (multiple of 1024)
    SGE_RT_BLOCK: int = 4096
    # triangles inlined per BVH leaf row (1..12)
    SGE_RT_LEAF: int = 12
    # cluster rasterizer: triangles per cluster / candidate-list mode
    SGE_RASTER_CLUSTER: int = 128
    SGE_RASTER_CLUSTER_RT: int = 0       # 0 = module default
    SGE_RASTER_TRANS_CLUSTER: int = 16   # translucent subset (big hulls)
    SGE_RASTER_TRANS_SUBDIV: int = 0     # hull midpoint-subdiv levels (r5: depth2+cluster128 measured 2x LOSS @960x540 full scene - 324 vs 152 ms; needs per-parent clusters, see STATUS)
    SGE_RASTER_TILE_H: int = 0           # 0 = 32 (the lane-order tile height)
    SGE_RASTER_LISTS: int = 0
    SGE_RASTER_UNROLL: int = 8
    SGE_RASTER_K: int = 8192             # legacy list-mode candidate cap
    SGE_RASTER_ROWS_VMEM: int = 6 << 20  # stream rows from HBM beyond this

    # --- shadows ------------------------------------------------------------
    SGE_SHADOW_CLUSTERS: int = 1
    SGE_SHADOW_SPLIT: int = 1            # occlusion sweep + translucent slots
    SGE_SHADOW_ANYHIT: int = 1           # settle occl lanes at first hit
    SGE_SHADOW_MORTON_BUILD: int = 1     # light-space Morton re-clustering
    SGE_SHADOW_CLUSTER: int = 128
    SGE_SHADOW_BLOCK: int = 4096
    SGE_SHADOW_ALPHA: int = 1            # alpha-payload records
    SGE_SHADOW_KERNEL: int = 1           # BVH-walk fallback kernel
    SGE_SHADOW_LISTS: int = 0
    SGE_SHADOW_SORT: int = 0
    SGE_SHADOW_PREPASS: int = 0
    # axon workaround: cluster-shadow kernels crash the TPU worker in small
    # fused frames; below this lane count the walk kernel serves instead
    SGE_SHADOW_CLUSTER_MIN_LANES: int = 100000

    # --- shading / compaction ----------------------------------------------
    SGE_RT_DEFERRED: int = 0             # merged deferred shade (r5 experiment: LOSES on TPU - N-sized gather cost; see STATUS)
    SGE_RT_LBATCH: int = 2               # batched continuation layers
    SGE_RT_CHUNK: int = 131072
    SGE_RT_CHUNK_SMALL: int = 8192
    SGE_RT_CHUNK_BOUNCE: int = 16384
    SGE_RT_SORT_COMPACT: int = 1
    SGE_RT_COMPACT_ORDER: str = "sort"
    SGE_RT_UNLIT: int = 1
    SGE_RT_UNLIT_SPLIT: int = 0
    SGE_RT_SROW: int = 1
    SGE_RT_PACKET_COMPACT: int = 0
    SGE_RT_LAYER_SLOTS: int = 0          # 0 = max_layers

    # --- traversal kernel variants (trace/layered modes + bounces) ----------
    SGE_RT_SMEM: int = 1
    SGE_RT_ORDERED: int = 1
    SGE_RT_EXACT_KEY: int = 1
    SGE_RT_SO: int = 1
    SGE_RT_LAYERED: int = 1
    SGE_RT_INTERVAL: int = 0
    SGE_RT_DUAL: int = 0
    SGE_RT_STREAM: int = 0
    SGE_RT_STREAM_CHUNK: int = 4096

    # --- scene --------------------------------------------------------------
    # 0 disables import decimation (the bench/honest default); the engine
    # ships full fidelity and decimation is the opt-in knob.
    SGE_IMPORT_TRI_BUDGET: int = 20000
    SGE_TEX_SIZE: int = 512


@dataclass(frozen=True)
class PhysicsConfig:
    """Physics/separation knobs (physics.separation, physics.queries)."""

    SGE_SEP_GRID_MIN_N: int = 64         # dense all-pairs below this
    SGE_SEP_CELL_CAP: int = 12           # sorted-window entries per cell
    SGE_SEP_FORCE_GRID: int = 0


@dataclass(frozen=True)
class EngineDefaults:
    render: RenderConfig = field(default_factory=RenderConfig)
    physics: PhysicsConfig = field(default_factory=PhysicsConfig)


DEFAULTS = EngineDefaults()

_FLAT = {}
for _section in (DEFAULTS.render, DEFAULTS.physics):
    for _k, _v in vars(_section).items():
        _FLAT[_k] = _v


def knob(name: str, default=None):
    """Read config value ``name``: environment override if set, else the
    dataclass default (``default`` overrides the dataclass when given —
    for call sites that predate a field)."""
    base = _FLAT.get(name, default)
    raw = os.environ.get(name)
    if raw is None:
        return base
    if isinstance(base, bool):
        return raw == "1"
    if isinstance(base, int):
        return int(raw)
    if isinstance(base, float):
        return float(raw)
    if base is None:
        # knob not in the dataclass (debug/profiling-only): numeric strings
        # parse as ints so `bool(knob("X"))` honors X=0
        try:
            return int(raw)
        except ValueError:
            return raw
    return raw
