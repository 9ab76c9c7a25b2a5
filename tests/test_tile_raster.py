"""Tile rasterizer vs ray-traced visibility: same nearest triangle per pixel.

The rasterizer (render.tile_raster) must produce the identical hit records
the BVH primary trace produces — same winning triangle, same ray t, same
barycentrics — modulo sub-pixel edge decisions where point-in-triangle and
ray-triangle arithmetic legitimately disagree. The kernel runs in interpret
mode (env read at import -> subprocess).
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
import jax
import jax.numpy as jnp
from swift_game_engine_tpu.render.tile_raster import rasterize
from swift_game_engine_tpu.render.camera import Camera, generate_rays

rng = np.random.default_rng(21)
T = 300
base = rng.uniform(-8, 8, (T, 3)).astype(np.float32)
v0 = base
v1 = base + rng.uniform(-2, 2, (T, 3)).astype(np.float32)
v2 = base + rng.uniform(-2, 2, (T, 3)).astype(np.float32)
# one triangle crossing the near plane / behind the camera
v0[0] = [-50, -2, 30]; v1[0] = [50, -2, 30]; v2[0] = [0, -2, -50]

cam = Camera()
cam.position = np.array([0.0, 3.0, 16.0], np.float32)
cam.target = np.array([0.0, 0.0, 0.0], np.float32)
W, H = 192, 96
vp = cam.view_proj(W, H)
ivp = cam.inv_view_proj(W, H)

hits = rasterize(jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2),
                 jnp.asarray(vp), jnp.asarray(cam.position), W, H,
                 interpret=True)
assert int(hits.overflow) == 0

o, d = generate_rays(jnp.asarray(ivp), jnp.asarray(cam.position), W, H)
o = np.asarray(o); d = np.asarray(d)

def mt_all(o1, d1):
    e1, e2 = v1 - v0, v2 - v0
    p = np.cross(d1[None], e2); det = (e1 * p).sum(-1)
    ok = np.abs(det) >= 1e-9
    inv = np.where(ok, 1.0 / np.where(ok, det, 1), 0)
    tv = o1[None] - v0
    u = (tv * p).sum(-1) * inv
    q = np.cross(tv, e1)
    v = (d1[None] * q).sum(-1) * inv
    tt = (e2 * q).sum(-1) * inv
    hit = ok & (u >= -1e-6) & (u <= 1+1e-6) & (v >= -1e-6) & (u + v <= 1+1e-6) & (tt > 1e-4)
    return np.where(hit, tt, 3.0e38), u, v

tri_r = np.asarray(hits.tri)
t_r = np.asarray(hits.t)
u_r = np.asarray(hits.u)
v_r = np.asarray(hits.v)

n = W * H
match = 0
checked = 0
for i in range(0, n, 7):   # sample pixels
    ts, us, vs = mt_all(o[i], d[i])
    j = int(ts.argmin())
    checked += 1
    if ts[j] >= 3e38:
        match += (tri_r[i] == -1)
        continue
    if tri_r[i] == j:
        assert abs(ts[j] - t_r[i]) < 2e-3 * max(ts[j], 1.0), (i, ts[j], t_r[i])
        assert abs(us[j] - u_r[i]) < 2e-3, (i, us[j], u_r[i])
        assert abs(vs[j] - v_r[i]) < 2e-3, (i, vs[j], v_r[i])
        match += 1
    elif tri_r[i] >= 0 and abs(ts.min() - t_r[i]) < 2e-3 * max(ts.min(), 1.0):
        match += 1    # different tri, same depth (shared edge) — fine
agree = match / checked
print(f"agree={agree:.4f} checked={checked}")
assert agree > 0.995, agree
print("OK")
"""


def test_tile_raster_matches_ray_visibility():
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    proc = subprocess.run([sys.executable, "-c", CODE], cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr + proc.stdout
    assert "OK" in proc.stdout
