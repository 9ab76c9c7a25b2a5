"""Multi-chip sharding correctness (VERDICT r1 item #1).

Runs on the virtual 8-device CPU mesh that conftest.py provisions. Asserts
the image-plane-sharded render path (parallel.sharding.sharded_render)
produces the same image as a single-device render, and that the driver's
`dryrun_multichip` entry point succeeds in a fresh process (pinning the
env-setup fix: JAX_PLATFORMS=cpu + host device count forced before jax
import).
"""

import os
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from swift_game_engine_tpu.parallel.sharding import make_mesh, sharded_render
from swift_game_engine_tpu.render.ibl import IBL
from swift_game_engine_tpu.render.camera import Camera

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def tiny_scene():
    from swift_game_engine_tpu.scene.demo_scene import DemoScene
    return DemoScene(include_imported_assets=False).build()


def _frame_inputs(tiny_scene, w, h):
    stepper = tiny_scene["stepper"]
    cam = Camera()
    cam.position = np.array([0.0, 4.0, 14.0], np.float32)
    cam.target = np.array([0.0, 0.0, 0.0], np.float32)
    ivp = cam.inv_view_proj(w, h)
    state = stepper.substep(tiny_scene["state"], 1.0 / 60.0)
    transforms, palettes = stepper.extract(state, 1.0, np.zeros(3, np.float32))
    return transforms, palettes, ivp, jnp.asarray(cam.position)


def test_sharded_render_matches_single_device(tiny_scene):
    assert len(jax.devices()) >= 8, "conftest must provision 8 CPU devices"
    w, h = 64, 32
    ibl = IBL.build()
    geo, lights = tiny_scene["geometry"], tiny_scene["lights"]
    transforms, palettes, ivp, cam_pos = _frame_inputs(tiny_scene, w, h)

    mesh8 = make_mesh(jax.devices()[:8])
    mesh1 = make_mesh(jax.devices()[:1])
    r8 = sharded_render(mesh8, geo, ibl, lights, w, h,
                        max_layers=2, shadow_layers=1)
    r1 = sharded_render(mesh1, geo, ibl, lights, w, h,
                        max_layers=2, shadow_layers=1)
    img8 = np.asarray(r8(transforms, palettes, ivp, cam_pos))
    img1 = np.asarray(r1(transforms, palettes, ivp, cam_pos))
    assert img8.shape == (h, w, 3)
    assert np.isfinite(img8).all()
    assert np.isfinite(img1).all()
    np.testing.assert_allclose(img8, img1, rtol=1e-5, atol=1e-5)
    # something was actually rendered (not all background)
    assert img8.std() > 1e-3


def test_sharded_output_is_sharded_input_consistent(tiny_scene):
    """Non-multiple-of-8 image width exercises the ray-padding path."""
    w, h = 60, 28
    ibl = IBL.build()
    geo, lights = tiny_scene["geometry"], tiny_scene["lights"]
    transforms, palettes, ivp, cam_pos = _frame_inputs(tiny_scene, w, h)
    mesh8 = make_mesh(jax.devices()[:8])
    img = np.asarray(sharded_render(mesh8, geo, ibl, lights, w, h,
                                    max_layers=1, shadow_layers=1)(
        transforms, palettes, ivp, cam_pos))
    assert img.shape == (h, w, 3)
    assert np.isfinite(img).all()


_PALLAS_SHARD_CODE = r"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("SGE_JAX_TRAVERSAL", None)   # REAL traversal path
os.environ["SGE_RT_BLOCK"] = "1024"          # keep interpret mode fast
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import numpy as np
import jax
import jax.numpy as jnp
from swift_game_engine_tpu.scene.demo_scene import DemoScene
from swift_game_engine_tpu.parallel.sharding import make_mesh, sharded_render
from swift_game_engine_tpu.render.ibl import IBL
from swift_game_engine_tpu.render.camera import Camera
from swift_game_engine_tpu.render import rt as RT
assert not RT._FORCE_JAX_TRAVERSAL, "must exercise the Pallas kernel"

scene = DemoScene(include_imported_assets=False).build()
stepper = scene["stepper"]
cam = Camera()
cam.position = np.array([0.0, 4.0, 14.0], np.float32)
cam.target = np.array([0.0, 0.0, 0.0], np.float32)
w, h = 64, 32
ivp = cam.inv_view_proj(w, h)
state = stepper.substep(scene["state"], 1.0 / 60.0)
transforms, palettes = stepper.extract(state, 1.0, np.zeros(3, np.float32))
ibl = IBL.build()
geo, lights = scene["geometry"], scene["lights"]
img8 = np.asarray(sharded_render(make_mesh(jax.devices()[:8]), geo, ibl,
                                 lights, w, h, max_layers=1, shadow_layers=1)(
    transforms, palettes, ivp, jnp.asarray(cam.position)))
img1 = np.asarray(sharded_render(make_mesh(jax.devices()[:1]), geo, ibl,
                                 lights, w, h, max_layers=1, shadow_layers=1)(
    transforms, palettes, ivp, jnp.asarray(cam.position)))
assert np.isfinite(img8).all() and img8.std() > 1e-3
np.testing.assert_allclose(img8, img1, rtol=1e-5, atol=1e-5)
print("PALLAS_SHARD_OK")
"""


def test_pallas_kernel_under_shard_map():
    """8-device parity on the REAL code path: the production Pallas
    traversal (interpret mode on CPU) executes inside jax.shard_map — not
    the pure-JAX fallback the rest of the suite uses (VERDICT r2 #4)."""
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    proc = subprocess.run([sys.executable, "-c", _PALLAS_SHARD_CODE],
                          cwd=REPO, env=env, capture_output=True, text=True,
                          timeout=900)
    assert proc.returncode == 0, (
        f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}")
    assert "PALLAS_SHARD_OK" in proc.stdout


def test_dryrun_multichip_fresh_process():
    """Pin the driver-visible entry: must self-provision its CPU mesh."""
    code = ("import __graft_entry__ as g; g.dryrun_multichip(8)")
    env = dict(os.environ)
    # Simulate the driver's environment: no CPU forcing, no device count.
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    env.pop("SGE_JAX_TRAVERSAL", None)
    # ...but keep it off the real TPU tunnel if one is configured: the point
    # here is the entry point must not NEED any external env to pass.
    proc = subprocess.run([sys.executable, "-c", code], cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, (
        f"dryrun_multichip failed\nstdout:\n{proc.stdout}\nstderr:\n{proc.stderr}")
    assert "dryrun_multichip(8): fused substeps+extract+render OK" in proc.stdout


def test_entity_sharded_substep_matches_replicated():
    """Round 4 (SURVEY §5 entity axis): the physics substep on an
    entity-sharded WorldState must produce the same state as the
    replicated run — GSPMD partitioning cannot change the math."""
    from swift_game_engine_tpu.scene.demo_scene import DemoScene
    from swift_game_engine_tpu.parallel.sharding import (make_mesh,
                                                         shard_world_state)
    scene = DemoScene(include_imported_assets=False,
                      pad_entities_to=8).build()
    stepper = scene["stepper"]
    mesh = make_mesh(jax.devices()[:8])

    @jax.jit
    def steps(st):
        for _ in range(4):
            st = stepper._substep_impl(st, jnp.float32(1.0 / 60.0))
        return st

    ref = steps(scene["state"])
    sharded = steps(shard_world_state(mesh, scene["state"]))
    for a, b, path in zip(jax.tree.leaves(ref), jax.tree.leaves(sharded),
                          jax.tree.flatten(ref)[0]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_fused_sharded_step_matches_unsharded():
    """The fused substeps+extract+render program (the shipped frame
    structure) sharded over the mesh == the unsharded computation."""
    from swift_game_engine_tpu.scene.demo_scene import DemoScene
    from swift_game_engine_tpu.parallel.sharding import (
        make_mesh, shard_world_state, sharded_fused_step)
    from swift_game_engine_tpu.render.scene_geometry import flatten_frame
    from swift_game_engine_tpu.render import rt as RT

    scene = DemoScene(include_imported_assets=False,
                      pad_entities_to=8).build()
    stepper = scene["stepper"]
    ibl = IBL.build()
    w, h = 64, 32
    cam = Camera()
    cam.position = np.array([0.0, 4.0, 14.0], np.float32)
    cam.target = np.array([0.0, 0.0, 0.0], np.float32)
    ivp = jnp.asarray(cam.inv_view_proj(w, h))
    cpos = jnp.asarray(cam.position)

    mesh = make_mesh(jax.devices()[:8])
    step = sharded_fused_step(mesh, scene, ibl, w, h, n_substeps=2,
                              max_layers=1, shadow_layers=1)
    st2, img2 = step(shard_world_state(mesh, scene["state"]), ivp, cpos,
                     jnp.zeros(3))

    # unsharded reference of the same structure
    st_ref = scene["state"]
    for _ in range(2):
        st_ref = stepper.substep(st_ref, 1.0 / 60.0)
    transforms, palettes = stepper.extract(st_ref, 1.0,
                                           np.zeros(3, np.float32))
    geo = scene["geometry"]
    fg = flatten_frame(geo, transforms, palettes)
    img_ref = RT.render_frame(geo, fg, ibl, scene["lights"], ivp, cpos,
                              w, h, max_layers=1, shadow_layers=1)
    np.testing.assert_allclose(np.asarray(st2.body_pos),
                               np.asarray(st_ref.body_pos),
                               rtol=1e-5, atol=1e-5)
    a = np.asarray(img2)
    b = np.asarray(img_ref)
    # sharded path renders without the final dither; compare through the
    # same post-processing the unsharded frame applies? render_frame adds
    # dither — compare with generous tolerance on means and per-pixel.
    diff = np.abs(a - b).max()
    assert diff < 1.0 / 128.0, diff
