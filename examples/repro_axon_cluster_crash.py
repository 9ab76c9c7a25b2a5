#!/usr/bin/env python
"""Minimal repro: cluster-shadow Pallas kernels crash the axon TPU worker
at SMALL lane counts when a fused program has several sweep dispatch sites.

Observed (round 4, STATUS.md "Axon backend notes"): the DemoScene fused
frame at 320x180 (57,600 lanes) with max_layers=3 — i.e. 3+ cluster-sweep
dispatch sites — kills the TPU worker ("TPU device error"); the SAME
program structure at >= 640x360 (230,400 lanes) runs clean, and the
BVH-walk shadow kernel is fine at every size. The production workaround is
SGE_SHADOW_CLUSTER_MIN_LANES=100000 (render/rt.py), which selects the walk
kernel below that lane count.

Usage (DANGER — the failing case kills the tunnel's TPU worker; run only
when nothing else needs the device):
    python examples/repro_axon_cluster_crash.py 57600    # expected: crash
    python examples/repro_axon_cluster_crash.py 230400   # expected: OK

On CPU (JAX_PLATFORMS=cpu, interpret mode) both sizes pass, isolating the
fault to the axon backend, not the kernel logic.
"""
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from swift_game_engine_tpu.ops.cluster_shadow import (build_shadow_split,
                                                      trace_shadow_split)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 57600
rng = np.random.default_rng(0)
T = int(os.environ.get("REPRO_TRIS", "20000"))
v0 = jnp.asarray(rng.uniform(-50, 50, (T, 3)), jnp.float32)
v1 = v0 + jnp.asarray(rng.uniform(-1, 1, (T, 3)), jnp.float32)
v2 = v0 + jnp.asarray(rng.uniform(-1, 1, (T, 3)), jnp.float32)
l = jnp.asarray([0.2, 0.9, 0.37]) / np.linalg.norm([0.2, 0.9, 0.37])
trans = np.zeros(T, bool)
trans[: T // 8] = True
split = build_shadow_split(v0, v1, v2, l, jnp.asarray(trans),
                          alpha=jnp.full(T, 0.3),
                          trans_idx=np.nonzero(trans)[0])

interp = jax.default_backend() != "tpu"


@jax.jit
def fused(seed):
    acc = jnp.float32(0.0)
    # three sweep dispatch sites in ONE program, like the r4 frame's
    # L1 + continuation + bounce shadow calls
    for k in range(3):
        o = jnp.stack([jnp.sin(seed + jnp.arange(N) * (0.1 + k)),
                       jnp.cos(seed + jnp.arange(N) * 0.2) + 2.0,
                       jnp.sin(seed + jnp.arange(N) * 0.3)], axis=-1) * 30.0
    # noqa: the loop binds o per site; each call is a distinct dispatch
        t_opq, ts, ids = trace_shadow_split(split, o, jnp.full(N, 200.0),
                                            n_slots=2, interpret=interp)
        acc = acc + jnp.sum(t_opq * 1e-6) + jnp.sum(ts[:, 0] * 1e-9)
    return acc


print(f"lanes={N} backend={jax.default_backend()}", flush=True)
out = jax.block_until_ready(fused(jnp.float32(0.5)))
print("OK", float(out), flush=True)
out = jax.block_until_ready(fused(jnp.float32(1.5)))
print("OK (2nd exec)", float(out), flush=True)
