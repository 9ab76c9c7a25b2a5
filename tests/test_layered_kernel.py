"""Layered shared-origin kernel (ops.rt_kernel.trace_layers_so): record
parity vs brute force + end-to-end frame parity vs the continuation-trace
layer loop.

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

rng = np.random.default_rng(7)
T = 250
base = rng.uniform(-8, 8, (T, 3)).astype(np.float32)
v0 = base
v1 = base + rng.uniform(-2, 2, (T, 3)).astype(np.float32)
v2 = base + rng.uniform(-2, 2, (T, 3)).astype(np.float32)
translucent = rng.random(T) < 0.4
topo = B.build_bvh(np.minimum(np.minimum(v0, v1), v2),
                   np.maximum(np.maximum(v0, v1), v2))
bvh = B.refit(topo, jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2),
              translucent=jnp.asarray(translucent))
kb = K.pack_bvh(bvh, translucent=jnp.asarray(translucent))

o = np.array([0.0, 1.0, 20.0], np.float32)
N = 512
targets = rng.uniform(-8, 8, (N, 3)).astype(np.float32)
d = targets - o
d /= np.linalg.norm(d, axis=1, keepdims=True)
tm = jnp.full((N,), K.BIG, jnp.float32)
so = K.build_origin_rows(kb.rows, o)
topq, otri, ts, ids = K.trace_layers_so(so, o, jnp.asarray(d), tm,
                                        n_slots=3, interpret=True)
topq, otri, ts, ids = map(np.asarray, (topq, otri, ts, ids))


def mt_all(o, dd, a, b, c):
    e1, e2 = b - a, c - a
    p = np.cross(dd[None], e2); det = (e1 * p).sum(-1)
    ok = np.abs(det) >= 1e-6
    inv = np.where(ok, 1.0 / np.where(ok, det, 1), 0)
    tv = o[None] - a
    u = (tv * p).sum(-1) * inv
    q = np.cross(tv, e1)
    v = (dd[None] * q).sum(-1) * inv
    tt = (e2 * q).sum(-1) * inv
    hit = ok & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1) & (tt > 1e-4)
    return hit, tt


bad = 0
for i in range(0, N, 3):
    hit, tt = mt_all(o, d[i], v0, v1, v2)
    oh = hit & ~translucent
    ref_opq = tt[oh].min() if oh.any() else None
    if ref_opq is None:
        ok1 = topq[i] >= K.BIG * 0.9
    else:
        ok1 = abs(topq[i] - ref_opq) < 1e-3
    th = hit & translucent
    lim = ref_opq if ref_opq is not None else np.inf
    tref = np.sort(tt[th])
    tref = tref[tref < lim][:3]
    # final records may keep translucent hits beyond the final t_opq (they
    # were inserted before the opaque was found) — callers filter < t_opq.
    got = ts[i][ids[i] >= 0]
    got = got[got < topq[i]]
    ok2 = len(got) >= len(tref) and np.allclose(got[:len(tref)], tref,
                                                atol=1e-3)
    if not (ok1 and ok2):
        bad += 1
assert bad == 0, bad
print("UNIT_OK")
"""

FRAME_CODE = r"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["SGE_RT_BLOCK"] = "1024"
os.environ["SGE_JAX_TRAVERSAL"] = "0"
os.environ["SGE_RT_SO"] = "1"
os.environ["SGE_RT_LAYERED"] = os.environ["TEST_LAYERED"]
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


def test_layered_records_vs_brute_force():
    out = _run(UNIT_CODE, {})
    assert "UNIT_OK" in out


def test_layered_frame_batched_sorted_knobs(tmp_path):
    """SGE_RT_LBATCH + SGE_SHADOW_SORT + SGE_RT_SORT_COMPACT reshape the
    shading/record schedule, not the math: batched layer shading computes
    the same per-record colors and alpha chain, the Morton shadow sort is
    a permutation of exact records, and sort-compaction produces identical
    chunks — the layered frame must be unchanged to fp noise."""
    import numpy as np
    a = str(tmp_path / "base.npy")
    b = str(tmp_path / "knobs.npy")
    c = str(tmp_path / "cont.npy")
    _run(FRAME_CODE, {"TEST_LAYERED": "1", "TEST_OUT": a})
    _run(FRAME_CODE, {"TEST_LAYERED": "1", "TEST_OUT": b,
                      "SGE_RT_LBATCH": "1", "SGE_SHADOW_SORT": "1",
                      "SGE_RT_SORT_COMPACT": "1"})
    _run(FRAME_CODE, {"TEST_LAYERED": "1", "TEST_OUT": c,
                      "SGE_RT_LBATCH": "2"})
    ia = np.load(a)
    ib = np.load(b)
    ic = np.load(c)
    assert np.allclose(ia, ib, rtol=1e-5, atol=1e-5), \
        float(np.abs(ia - ib).max())
    assert np.allclose(ia, ic, rtol=1e-5, atol=1e-5), \
        float(np.abs(ia - ic).max())


def test_layered_frame_matches_continuation_path(tmp_path):
    """A demo frame whose layers come from the single layered walk equals
    the t-floor continuation loop (both on the Pallas interpret kernels) up
    to boundary-pixel rounding."""
    import numpy as np
    a = str(tmp_path / "loop.npy")
    b = str(tmp_path / "layered.npy")
    _run(FRAME_CODE, {"TEST_LAYERED": "0", "TEST_OUT": a})
    _run(FRAME_CODE, {"TEST_LAYERED": "1", "TEST_OUT": b})
    ia = np.load(a)
    ib = np.load(b)
    diff = np.abs(ia - ib).max(axis=-1)
    frac_same = float((diff < 1e-4).mean())
    assert frac_same > 0.99, frac_same
    assert abs(ia.mean() - ib.mean()) < 0.005 * max(ia.mean(), 1e-3)
