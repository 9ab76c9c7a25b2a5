"""A/B the render-path configs under the BENCH camera on the real TPU.

Monkeypatches render.rt module knobs between Engine constructions so one
scene build serves all configs. Each config: warmup (compile) + pipeline
fill + timed steady-state frames — the same measurement bench.py makes.

Usage: python examples/prof_ab.py [config ...]
  configs: trace0 trace1 raster0 raster1 peels0 peels1 (default: all four
  non-peel combos). The digit = SGE_SHADOW_KERNEL.
"""
import sys
import time

import numpy as np
import jax

sys.path.insert(0, ".")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from swift_game_engine_tpu.scene.demo_scene import DemoScene
from swift_game_engine_tpu.scene.engine import Engine
from swift_game_engine_tpu.scene.input import InputFrame
from swift_game_engine_tpu.render import rt as RT

W, H, FRAMES, PIPE = 960, 540, 8, 3

configs = sys.argv[1:] or ["trace0", "trace1", "raster0", "raster1"]

t0 = time.time()
scene = DemoScene().build()
print(f"scene build: {time.time()-t0:.1f}s", flush=True)

for cfg in configs:
    primary, sk = cfg[:-1], cfg[-1] == "1"
    RT._RT_PRIMARY = primary
    RT._SHADOW_KERNEL = sk
    try:
        eng = Engine(scene, width=W, height=H, path="rt", max_layers=3,
                     shadow_layers=4, pipeline_depth=PIPE)
        t0 = time.time()
        eng.frame(1.0 / 60.0, InputFrame(ly=1.0), with_overlay=False)
        compile_s = time.time() - t0
        for _ in range(PIPE):
            eng.frame(1.0 / 60.0, InputFrame(ly=1.0), with_overlay=False)
        t0 = time.time()
        for _ in range(FRAMES):
            u8 = eng.frame(1.0 / 60.0, InputFrame(ly=1.0),
                           with_overlay=False)
        wall = time.time() - t0
        print(f"{cfg}: {FRAMES/wall:.3f} fps ({wall/FRAMES*1000:.0f} ms/frame) "
              f"compile {compile_s:.0f}s mean={np.asarray(u8).mean():.4f}",
              flush=True)
    except Exception as e:
        print(f"{cfg}: FAILED {type(e).__name__}: {e}", flush=True)
