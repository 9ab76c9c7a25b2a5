"""RT path with rasterized primary visibility == traced primaries.

SGE_RT_PRIMARY=raster swaps layer-1 visibility from the BVH packet kernel
to the tile rasterizer; every downstream term (shading, shadows, layers,
bounces) is shared, so the images must agree except at sub-pixel triangle
edges. Env is read at import -> subprocess per config.
"""

import os
import subprocess
import sys

REPO = os.path.join(os.path.dirname(__file__), "..")

CODE = r"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["SGE_JAX_TRAVERSAL"] = "1"   # fast CPU traversal for secondaries
os.environ["SGE_RT_PRIMARY"] = os.environ["TEST_PRIMARY"]
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
                      shadow_layers=1, view_proj=jnp.asarray(cam.view_proj(W, H)))
np.save(os.environ["TEST_OUT"], np.asarray(img))
print("DONE")
"""


def _render(primary, out, extra_env=None):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["TEST_PRIMARY"] = primary
    env["TEST_OUT"] = out
    if extra_env:
        env.update(extra_env)
    proc = subprocess.run([sys.executable, "-c", CODE], cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr + proc.stdout


def test_raster_primary_matches_traced(tmp_path):
    import numpy as np
    a = str(tmp_path / "trace.npy")
    b = str(tmp_path / "raster.npy")
    _render("trace", a)
    _render("raster", b)
    ia = np.load(a)
    ib = np.load(b)
    assert ia.shape == ib.shape
    diff = np.abs(ia - ib).max(axis=-1)
    # identical except a sparse set of edge pixels
    frac_same = float((diff < 1e-4).mean())
    assert frac_same > 0.97, frac_same
    assert abs(ia.mean() - ib.mean()) < 0.01 * max(ia.mean(), 1e-3)


def test_hybrid_matches_traced(tmp_path):
    """Round-4 hybrid visibility (opaque cluster raster + translucent
    peels composed through the layered floor chain) vs fully traced: the
    record semantics are the traced path's (incl. the 2*bias skip), so
    images agree except at sub-pixel raster/trace edge disagreements."""
    import numpy as np
    a = str(tmp_path / "trace2.npy")
    b = str(tmp_path / "hybrid.npy")
    _render("trace", a)
    _render("hybrid", b)
    ia = np.load(a)
    ib = np.load(b)
    assert ia.shape == ib.shape
    diff = np.abs(ia - ib).max(axis=-1)
    frac_same = float((diff < 1e-4).mean())
    assert frac_same > 0.97, frac_same
    assert abs(ia.mean() - ib.mean()) < 0.01 * max(ia.mean(), 1e-3)


def test_peels_batched_layers_match_sequential(tmp_path):
    """SGE_RT_LBATCH concatenates every peel layer into one shade call;
    the per-lane math (alpha chain, shadows, bounces) is unchanged, so the
    image must match the sequential peel loop to fp-accumulation noise."""
    import numpy as np
    a = str(tmp_path / "seq.npy")
    b = str(tmp_path / "batch.npy")
    _render("peels", a)
    _render("peels", b, {"SGE_RT_LBATCH": "1"})
    ia = np.load(a)
    ib = np.load(b)
    assert np.allclose(ia, ib, rtol=1e-5, atol=1e-5), \
        float(np.abs(ia - ib).max())
