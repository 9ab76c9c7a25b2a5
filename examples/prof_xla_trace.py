"""Capture a jax.profiler device trace of one frame program and print the
top device ops by total time (reads the trace.json.gz ourselves — no
tensorboard needed).

Usage: python examples/prof_xla_trace.py [WxH] [KEY=VALUE ...]
"""
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from swift_game_engine_tpu.scene.demo_scene import DemoScene
from swift_game_engine_tpu.render import rt as RT
from swift_game_engine_tpu.render.scene_geometry import flatten_frame
from swift_game_engine_tpu.render.camera import Camera
from swift_game_engine_tpu.render.ibl import IBL
from examples.prof_r4 import parse_val


def main():
    args = sys.argv[1:]
    wh = "960x540"
    knobs = {}
    for a in args:
        if "=" in a:
            k, v = a.split("=", 1)
            knobs[k] = parse_val(v)
        else:
            wh = a
    W, H = map(int, wh.split("x"))

    scene = DemoScene().build()
    geo = scene["geometry"]
    stepper, state = scene["stepper"], scene["state"]
    ibl = IBL.build()
    lights = scene["lights"]
    cam = Camera()
    cam.position = np.array([0.0, 4.0, 14.0], np.float32)
    cam.target = np.array([0.0, 0.0, 0.0], np.float32)
    transforms, palettes = stepper.extract(state, 0.0, np.zeros(3, np.float32))
    fg = jax.jit(lambda tr, pa: flatten_frame(geo, tr, pa))(transforms,
                                                            palettes)
    jax.block_until_ready(fg.pos)
    ivp = jnp.asarray(cam.inv_view_proj(W, H))
    cpos = jnp.asarray(cam.position)
    for k, v in knobs.items():
        setattr(RT, k, v)

    @jax.jit
    def frame(cp):
        return jnp.mean(RT.render_frame(geo, fg, ibl, lights, ivp, cp,
                                        W, H, max_layers=3, shadow_layers=4))

    jax.block_until_ready(frame(cpos))

    tdir = "/tmp/jax_trace"
    os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        jax.block_until_ready(frame(cpos))

    # parse the trace: sum durations per op name on device tracks
    files = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)
    if not files:
        print("no trace files found under", tdir)
        return
    with gzip.open(files[0], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # find device-side process ids (names containing TPU/device)
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "Device" in n or "/device" in n.lower()}
    agg = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            dur = e.get("dur", 0) / 1e3  # us -> ms
            name = e.get("name", "?")
            agg[name] += dur
            total += dur
    print(f"device total: {total:.1f} ms  (procs: "
          f"{[pid_names[p] for p in dev_pids][:4]})")
    for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:40]:
        print(f"  {ms:8.2f} ms  {name[:110]}")


if __name__ == "__main__":
    main()
