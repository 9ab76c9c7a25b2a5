#!/usr/bin/env python
"""Minimal repro: the axon TPU tunnel faults when a SECOND scene-sized
program set loads into one live process.

Observed (rounds 2-4, STATUS.md "Axon backend notes"): building and
executing one DemoScene-sized jitted frame program, then compiling and
executing a second, differently-shaped scene-sized program in the SAME
process, faults the tunnel ("TPU device error"); each program runs clean
in its own process, and both coexist fine on real CPU. bench.py therefore
keeps every secondary probe in a subprocess.

This repro approximates "scene-sized" with two RT frame programs over a
50k-triangle soup at two resolutions (distinct executables + constant
sets, each with Pallas traversal + cluster-shadow calls).

Usage (DANGER — the failing case kills the tunnel's TPU worker):
    python examples/repro_axon_two_programs.py        # program A, then B
    python examples/repro_axon_two_programs.py single # only A (control)
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from swift_game_engine_tpu.assets import procedural_meshes as pm
from swift_game_engine_tpu.assets.materials import Material
from swift_game_engine_tpu.render.scene_geometry import (
    RenderGeometryBuilder, flatten_frame)
from swift_game_engine_tpu.render import rt as RT
from swift_game_engine_tpu.render.ibl import IBL
from swift_game_engine_tpu.render.camera import Camera

b = RenderGeometryBuilder(texture_size=64)
rng = np.random.default_rng(3)
sph = pm.dome(1.0, radial_segments=64, ring_segments=24)  # kilo-tri mesh per instance
for i in range(8):
    b.add_static_mesh(sph, Material(name=f"m{i}",
                                    base_color_factor=tuple(rng.uniform(0.2, 1, 3)),
                                    roughness_factor=0.5), instance=i)
geo = b.build()
tf = np.tile(np.eye(4, dtype=np.float32), (8, 1, 1))
tf[:, :3, 3] = rng.uniform(-10, 10, (8, 3)).astype(np.float32)
fg = flatten_frame(geo, jnp.asarray(tf), jnp.zeros((1, 1, 4, 4)))
cam = Camera()
cam.position = np.array([0, 2, 25], np.float32)
cam.target = np.zeros(3, np.float32)
ibl = IBL.build()
lights = RT.DirectionalLights.default_sun()


def frame(w, h):
    img = jax.jit(lambda c: RT.render_frame(
        geo, fg, ibl, lights, jnp.asarray(cam.inv_view_proj(w, h)), c, w, h,
        max_layers=2, shadow_layers=2,
        view_proj=jnp.asarray(cam.view_proj(w, h))))(jnp.asarray(cam.position))
    return float(jnp.mean(img))


print(f"tris={geo.tri.shape[0]} backend={jax.default_backend()}", flush=True)
print("program A (960x540):", frame(960, 540), flush=True)
if "single" not in sys.argv:
    print("program B (640x360): loading second program set...", flush=True)
    print("program B:", frame(640, 360), flush=True)
    print("both OK — fault not reproduced at this size", flush=True)
