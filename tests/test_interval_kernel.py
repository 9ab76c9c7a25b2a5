"""Interval-walk traversal kernel: interpret-mode parity vs brute force.

The interval kernel (ops.rt_kernel._kernel_smem_interval) replaces vector
slab tests on interior nodes with conservative scalar interval arithmetic —
false box positives allowed, never false negatives — so its final hits must
be bit-identical to the exact brute-force nearest hit. Config knobs are read
at module import, so the check runs in a fresh subprocess.

Covers: divergent ray directions (worst case for the packet interval),
dead lanes (t_max = 0), mixed live/dead packets, and a shadow-style batch
(common direction, varying origins).
"""

import os
import subprocess
import sys

REPO = os.path.join(os.path.dirname(__file__), "..")

CODE = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["SGE_RT_INTERVAL"] = os.environ.get("TEST_INTERVAL", "1")
os.environ["SGE_RT_BLOCK"] = "1024"
import numpy as np
import jax.numpy as jnp
from swift_game_engine_tpu.render import bvh as B
from swift_game_engine_tpu.ops import rt_kernel as K

rng = np.random.default_rng(11)
T = 400
base = rng.uniform(-10, 10, (T, 3)).astype(np.float32)
v0 = base
v1 = base + rng.uniform(-1.5, 1.5, (T, 3)).astype(np.float32)
v2 = base + rng.uniform(-1.5, 1.5, (T, 3)).astype(np.float32)
topo = B.build_bvh(np.minimum(np.minimum(v0, v1), v2),
                   np.maximum(np.maximum(v0, v1), v2))
bvh = B.refit(topo, jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2))
kb = K.pack_bvh(bvh)

N = 160   # > one packet after padding; forces a mixed live/dead tail packet
o = rng.uniform(-14, 14, (N, 3)).astype(np.float32)
d = rng.normal(size=(N, 3)).astype(np.float32)
d /= np.linalg.norm(d, axis=1, keepdims=True)
# shadow-style coherent span: common direction, varying origins
d[32:64] = np.array([0.3, -0.9, 0.1], np.float32) / np.linalg.norm([0.3, -0.9, 0.1])
t_max = np.full(N, 3.0e38, np.float32)
t_max[10:20] = 0.0           # dead lanes inside a live packet
o[10:20] = 1.0e9             # parked like _trace_batch does
t, tri = K.trace_rays_pallas(kb, jnp.asarray(o), jnp.asarray(d),
                             jnp.asarray(t_max), interpret=True)
t, tri = np.asarray(t), np.asarray(tri)

def mt(o, d, a, b, c):
    e1, e2 = b - a, c - a
    p = np.cross(d[None], e2); det = (e1 * p).sum(-1)
    ok = np.abs(det) >= 1e-6
    inv = np.where(ok, 1.0 / np.where(ok, det, 1), 0)
    tv = o[None] - a
    u = (tv * p).sum(-1) * inv
    q = np.cross(tv, e1)
    v = (d[None] * q).sum(-1) * inv
    tt = (e2 * q).sum(-1) * inv
    hit = ok & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1) & (tt > 1e-4)
    return np.where(hit, tt, 3.0e38)

bad = 0
for i in range(N):
    if t_max[i] <= 0.0:
        if tri[i] != -1:
            bad += 1
        continue
    ts = mt(o[i], d[i], v0, v1, v2)
    j = ts.argmin()
    if ts[j] < 3e38:
        if tri[i] != j and not np.isclose(ts[j], t[i], atol=1e-4):
            bad += 1
    elif tri[i] != -1:
        bad += 1
assert bad == 0, f"{bad} mismatches"
print("OK")
"""


def _run(interval: str):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["TEST_INTERVAL"] = interval
    proc = subprocess.run([sys.executable, "-c", CODE], cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr + proc.stdout
    assert "OK" in proc.stdout


def test_interval_kernel_parity():
    _run("1")


def test_ordered_kernel_parity():
    """The default production kernel (_kernel_smem_ordered: keyed stack,
    lazy stale skip, leaf any-hit gate) against the same brute force."""
    _run("0")
