"""Shared-origin closest-hit kernel: parity vs the general packet kernel +
end-to-end frame parity of the t-floor transparency continuation.

Subprocess-isolated (kernel/env config is read at module import)."""

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

rng = np.random.default_rng(11)
T = 600
base = rng.uniform(-8, 8, (T, 3)).astype(np.float32)
v0 = base
v1 = base + rng.uniform(-2, 2, (T, 3)).astype(np.float32)
v2 = base + rng.uniform(-2, 2, (T, 3)).astype(np.float32)
topo = B.build_bvh(np.minimum(np.minimum(v0, v1), v2),
                   np.maximum(np.maximum(v0, v1), v2))
bvh = B.refit(topo, jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2))
kb = K.pack_bvh(bvh)

o = np.array([0.0, 1.0, 20.0], np.float32)
N = 2048
# aim at the cloud so most rays hit
targets = rng.uniform(-8, 8, (N, 3)).astype(np.float32)
d = targets - o
d /= np.linalg.norm(d, axis=1, keepdims=True)
tm = jnp.full((N,), K.BIG, jnp.float32)
oo = jnp.broadcast_to(jnp.asarray(o), (N, 3))
t_ref, tri_ref = K.trace_rays_pallas(kb, oo, jnp.asarray(d), tm,
                                     interpret=True)
so = K.build_origin_rows(kb.rows, o)
t_so, tri_so = K.trace_rays_so(so, o, jnp.asarray(d), tm, interpret=True)
t_ref, tri_ref, t_so, tri_so = map(np.asarray,
                                   (t_ref, tri_ref, t_so, tri_so))
hit_r = tri_ref >= 0
hit_s = tri_so >= 0
assert hit_r.sum() > N // 2, hit_r.sum()  # the check must exercise hits
# found-set and winning-triangle agreement: identical up to float rounding
# at shared edges — allow a tiny disagreement budget.
assert (hit_r == hit_s).mean() > 0.999, (hit_r.sum(), hit_s.sum())
both = hit_r & hit_s
agree = tri_ref[both] == tri_so[both]
assert agree.mean() > 0.999, agree.mean()
assert np.allclose(t_ref[both][agree], t_so[both][agree],
                   rtol=1e-4, atol=1e-4)

# t_floor continuation: the second hit must be strictly past the first,
# and must equal a brute-force second-nearest computation.
fl = jnp.asarray(np.where(hit_s, t_so + 1e-3, 1e-4), jnp.float32)
t2, tri2 = K.trace_rays_so(so, o, jnp.asarray(d), tm, t_floor=fl,
                           interpret=True)
t2, tri2 = np.asarray(t2), np.asarray(tri2)
assert (t2[both] > t_so[both]).all()

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
    hit = ok & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1)
    return hit, tt

chk = rng.choice(np.nonzero(hit_s)[0], size=64, replace=False)
bad = 0
for i in chk:
    hit, tt = mt_all(o, d[i], v0, v1, v2)
    hit = hit & (tt > float(fl[i]))
    ref2 = tt[hit].min() if hit.any() else None
    if ref2 is None:
        ok = tri2[i] < 0
    else:
        ok = tri2[i] >= 0 and abs(t2[i] - ref2) < 1e-3
    bad += 0 if ok else 1
assert bad == 0, bad
print("UNIT_OK")
"""

FRAME_CODE = r"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["SGE_RT_BLOCK"] = "1024"
os.environ["SGE_JAX_TRAVERSAL"] = "0"
os.environ["SGE_RT_SO"] = os.environ["TEST_SO"]
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
                      jnp.asarray(cam.position), W, H, max_layers=3,
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


def test_so_kernel_vs_general_kernel():
    out = _run(UNIT_CODE, {})
    assert "UNIT_OK" in out


def test_so_frame_matches_offset_origin_path(tmp_path):
    """A demo frame with the shared-origin layer pipeline equals the
    offset-origin general path (both on the Pallas interpret kernels) up to
    boundary-pixel rounding."""
    import numpy as np
    a = str(tmp_path / "general.npy")
    b = str(tmp_path / "so.npy")
    _run(FRAME_CODE, {"TEST_SO": "0", "TEST_OUT": a})
    _run(FRAME_CODE, {"TEST_SO": "1", "TEST_OUT": b})
    ia = np.load(a)
    ib = np.load(b)
    diff = np.abs(ia - ib).max(axis=-1)
    frac_same = float((diff < 1e-4).mean())
    assert frac_same > 0.99, frac_same
    assert abs(ia.mean() - ib.mean()) < 0.005 * max(ia.mean(), 1e-3)
