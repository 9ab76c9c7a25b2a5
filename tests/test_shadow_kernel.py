"""Shared-direction shadow-factor kernel: parity vs brute force + vs the
exact per-layer re-trace loop.

Two checks (subprocess: kernel/env config is read at module import):
  1. Unit: trace_shadow_factor's (nearest opaque t, n_slots nearest
     translucent hits) against a dense numpy Moller-Trumbore sweep.
  2. End-to-end: a demo-scene RT frame with SGE_SHADOW_KERNEL=1 equals the
     SGE_SHADOW_KERNEL=0 per-layer loop frame (shadows are the only term
     that changes).
"""

import os
import subprocess
import sys

REPO = os.path.join(os.path.dirname(__file__), "..")

UNIT_CODE = r"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["SGE_RT_BLOCK"] = "1024"
import numpy as np
import jax.numpy as jnp
from swift_game_engine_tpu.render import bvh as B
from swift_game_engine_tpu.ops import rt_kernel as K

rng = np.random.default_rng(7)
T = 400
base = rng.uniform(-10, 10, (T, 3)).astype(np.float32)
v0 = base
v1 = base + rng.uniform(-2, 2, (T, 3)).astype(np.float32)
v2 = base + rng.uniform(-2, 2, (T, 3)).astype(np.float32)
translucent = rng.random(T) < 0.5
topo = B.build_bvh(np.minimum(np.minimum(v0, v1), v2),
                   np.maximum(np.maximum(v0, v1), v2))
bvh = B.refit(topo, jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2))
kb = K.pack_bvh(bvh, translucent=jnp.asarray(translucent))

l = np.array([0.3, 0.8, -0.2], np.float32)
l /= np.linalg.norm(l)
srows = K.build_shadow_rows(kb.rows, jnp.asarray(l))

N = 256
o = rng.uniform(-12, 12, (N, 3)).astype(np.float32)
t_lim = np.full(N, 60.0, np.float32)
t_lim[: N // 8] = 0.0   # inactive lanes
n_slots = 4
topq, ts, ids = K.trace_shadow_factor(srows, jnp.asarray(l),
                                      jnp.asarray(o), jnp.asarray(t_lim),
                                      n_slots=n_slots, interpret=True)
topq, ts, ids = np.asarray(topq), np.asarray(ts), np.asarray(ids)

def mt_all(o, d, a, b, c):
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
    return hit, tt

bad = 0
for i in range(N):
    if t_lim[i] <= 0:
        assert topq[i] == 0.0, (i, topq[i])
        assert (ids[i] < 0).all(), (i, ids[i])
        continue
    hit, tt = mt_all(o[i], l, v0, v1, v2)
    hit = hit & (tt < t_lim[i])
    opq = hit & ~translucent
    ref_opq = tt[opq].min() if opq.any() else 3.0e38
    tr = hit & translucent
    tr_t = np.sort(tt[tr])[:n_slots]
    got_t = ts[i][ids[i] >= 0]
    ok_opq = (ref_opq > 1e37 and topq[i] > 1e37) or \
        abs(ref_opq - topq[i]) < 1e-3 * max(ref_opq, 1.0)
    # translucent slots beyond the nearest-opaque bound may be pruned by
    # the kernel's traversal bound; compare only hits nearer than opaque.
    ref_near = tr_t[tr_t < min(ref_opq, t_lim[i])]
    got_near = got_t[got_t < min(ref_opq, t_lim[i])]
    ok_tr = len(ref_near) == len(got_near) and \
        np.allclose(ref_near, got_near, rtol=1e-3, atol=1e-3)
    if not (ok_opq and ok_tr):
        bad += 1
        if bad < 4:
            print("MISMATCH", i, ref_opq, topq[i], ref_near, got_near)
assert bad == 0, f"{bad}/{N} mismatching lanes"
print("UNIT_OK")
"""

FRAME_CODE = r"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["SGE_RT_BLOCK"] = "1024"
os.environ["SGE_SHADOW_KERNEL"] = os.environ["TEST_SHADOW_KERNEL"]
# default-on cluster shadows would otherwise shadow both variants with the
# same kernel, making the comparison vacuous
os.environ["SGE_SHADOW_CLUSTERS"] = os.environ.get("TEST_SHADOW_CLUSTERS", "0")
import numpy as np
import jax.numpy as jnp
from swift_game_engine_tpu.scene.demo_scene import DemoScene
from swift_game_engine_tpu.render.scene_geometry import flatten_frame
from swift_game_engine_tpu.render import rt as RT
from swift_game_engine_tpu.render.ibl import IBL
from swift_game_engine_tpu.render.camera import Camera

scene = DemoScene(include_imported_assets=False).build()
geo, lights = scene["geometry"], scene["lights"]
stepper, state = scene["stepper"], scene["state"]
cam = Camera()
cam.position = np.array([0.0, 4.0, 14.0], np.float32)
cam.target = np.array([0.0, 0.0, 0.0], np.float32)
W, H = 96, 54
transforms, palettes = stepper.extract(state, 0.0, np.zeros(3, np.float32))
fg = flatten_frame(geo, transforms, palettes)
img = RT.render_frame(geo, fg, IBL.build(), lights,
                      jnp.asarray(cam.inv_view_proj(W, H)),
                      jnp.asarray(cam.position), W, H, max_layers=2,
                      shadow_layers=2)
np.save(os.environ["TEST_OUT"], np.asarray(img))
print("DONE")
"""


def _run(code, env_extra):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env.update(env_extra)
    proc = subprocess.run([sys.executable, "-c", code], cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=1800)
    assert proc.returncode == 0, proc.stderr + proc.stdout
    return proc.stdout


def test_shadow_factor_kernel_vs_bruteforce():
    out = _run(UNIT_CODE, {})
    assert "UNIT_OK" in out


def test_shadow_kernel_frame_matches_loop(tmp_path):
    import numpy as np
    a = str(tmp_path / "loop.npy")
    b = str(tmp_path / "kernel.npy")
    _run(FRAME_CODE, {"TEST_SHADOW_KERNEL": "0", "TEST_OUT": a})
    _run(FRAME_CODE, {"TEST_SHADOW_KERNEL": "1", "TEST_OUT": b})
    ia = np.load(a)
    ib = np.load(b)
    diff = np.abs(ia - ib).max(axis=-1)
    frac_same = float((diff < 1e-4).mean())
    assert frac_same > 0.99, frac_same
    assert abs(ia.mean() - ib.mean()) < 0.005 * max(ia.mean(), 1e-3)


def test_shadow_clusters_frame_matches_loop(tmp_path):
    """Split cluster shadows (round-4 default: occlusion sweep + compact
    translucent sweep + scene-AABB t limit) vs the per-layer shadow loop:
    the records feed identical layer semantics, so the frames must agree."""
    import numpy as np
    a = str(tmp_path / "loop2.npy")
    b = str(tmp_path / "clusters.npy")
    _run(FRAME_CODE, {"TEST_SHADOW_KERNEL": "0", "TEST_OUT": a})
    _run(FRAME_CODE, {"TEST_SHADOW_KERNEL": "0",
                      "TEST_SHADOW_CLUSTERS": "1", "TEST_OUT": b})
    ia = np.load(a)
    ib = np.load(b)
    diff = np.abs(ia - ib).max(axis=-1)
    frac_same = float((diff < 1e-4).mean())
    assert frac_same > 0.99, frac_same
    assert abs(ia.mean() - ib.mean()) < 0.005 * max(ia.mean(), 1e-3)
