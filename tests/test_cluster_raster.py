"""Cluster rasterizer (render.tile_raster.rasterize_clusters) parity.

Layer 1 must match the list-based rasterizer exactly (same binning math,
different traversal order — ties at shared edges may differ); deeper peels
must match rasterize_peeled; opaque-termination must not change any
shadeable record. Kernels run in interpret mode (subprocess per config).
"""

import os
import subprocess
import sys

REPO = os.path.join(os.path.dirname(__file__), "..")

CODE = r"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["SGE_RASTER_K"] = "512"
import numpy as np
import jax.numpy as jnp
from swift_game_engine_tpu.render.tile_raster import (
    rasterize, rasterize_peeled, rasterize_clusters)
from swift_game_engine_tpu.render.camera import Camera

rng = np.random.default_rng(21)
T = 300
base = rng.uniform(-8, 8, (T, 3)).astype(np.float32)
v0 = base
v1 = base + rng.uniform(-2, 2, (T, 3)).astype(np.float32)
v2 = base + rng.uniform(-2, 2, (T, 3)).astype(np.float32)
# one triangle crossing the near plane / behind the camera
v0[0] = [-50, -2, 30]; v1[0] = [50, -2, 30]; v2[0] = [0, -2, -50]
opaque = rng.random(T) < 0.5

cam = Camera()
cam.position = np.array([0.0, 3.0, 16.0], np.float32)
cam.target = np.array([0.0, 0.0, 0.0], np.float32)
W, H = 192, 96
vp = jnp.asarray(cam.view_proj(W, H))
cp = jnp.asarray(cam.position)
v0, v1, v2 = jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2)

ref = rasterize(v0, v1, v2, vp, cp, W, H, interpret=True)
peel_ref = rasterize_peeled(v0, v1, v2, vp, cp, W, H, 2, interpret=True)
outs = rasterize_clusters(v0, v1, v2, vp, cp, W, H, layers=2,
                          interpret=True)

m1 = float(np.mean(np.asarray(ref.tri) == np.asarray(outs[0].tri)))
assert m1 > 0.999, m1
assert np.allclose(np.asarray(ref.t), np.asarray(outs[0].t),
                   rtol=1e-4, atol=1e-4)
m2 = float(np.mean(np.asarray(peel_ref[1].tri) == np.asarray(outs[1].tri)))
assert m2 > 0.999, m2

# XLA-precomputed per-tile candidate lists + non-default tile_h: lists
# skip only clusters the kernel's own AABB test would reject, so records
# are bit-identical to the default walk.
outs_l = rasterize_clusters(v0, v1, v2, vp, cp, W, H, layers=2,
                            interpret=True, lists=True, tile_h=16)
for l in range(2):
    assert np.array_equal(np.asarray(outs[l].tri), np.asarray(outs_l[l].tri))
    assert np.allclose(np.asarray(outs[l].t), np.asarray(outs_l[l].t),
                       rtol=1e-5, atol=1e-5)

# opaque termination: layer-1 records identical; layer-2 records identical
# wherever layer 1 was NOT opaque (behind an opaque fragment the records
# are unconstrained — they are never shaded).
# HBM-streamed rows (the un-decimated path): the walk is unchanged, only
# each processed cluster's rows arrive via a DMA'd VMEM window — records
# bit-identical.
outs_s = rasterize_clusters(v0, v1, v2, vp, cp, W, H, layers=2,
                            interpret=True, stream=True)
for l in range(2):
    assert np.array_equal(np.asarray(outs[l].tri), np.asarray(outs_s[l].tri))
    assert np.array_equal(np.asarray(outs[l].u), np.asarray(outs_s[l].u))

outs_o = rasterize_clusters(v0, v1, v2, vp, cp, W, H, layers=2,
                            interpret=True, opaque=jnp.asarray(opaque))
assert np.array_equal(np.asarray(outs[0].tri), np.asarray(outs_o[0].tri))
t1 = np.asarray(outs_o[0].tri)
shadeable = (t1 < 0) | ~opaque[np.maximum(t1, 0)]
l2a = np.asarray(outs[1].tri)[shadeable]
l2b = np.asarray(outs_o[1].tri)[shadeable]
mo = float(np.mean(l2a == l2b))
assert mo > 0.999, mo
print("OK")
"""


def test_cluster_raster_parity():
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    proc = subprocess.run([sys.executable, "-c", CODE], cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr + proc.stdout
    assert "OK" in proc.stdout
