"""Microbenchmarks of the XLA primitives the shade path leans on: random
row gathers, compaction schedule builds (argsort/cumsum), scatters, and
_shade_hit with gathers knocked out — to find where the dense 59 ms L1
shade and the ~90 ms continuation shading actually go.

Usage: python examples/prof_micro.py
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")


def timeit(fn, *args, n=10, warmup=2):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / n


def main():
    P = 518400          # 960x540 lanes
    T = 67664           # demo triangle count
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, T, P).astype(np.int32))
    # coherent idx (sorted) to compare locality effects
    idx_sorted = jnp.sort(idx)
    rows8 = jnp.asarray(rng.random((T, 8), np.float32))
    rows32 = jnp.asarray(rng.random((T, 32), np.float32))
    mask = jnp.asarray(rng.random(P) < 0.2)
    vals3 = jnp.asarray(rng.random((131072, 3), np.float32))
    sidx = jnp.asarray(rng.integers(0, P, 131072).astype(np.int32))

    def bench(name, fn, *args, n=10):
        t = timeit(jax.jit(fn), *args, n=n)
        print(f"{name}: {t*1e3:.2f} ms", flush=True)

    bench("gather (P,8) random", lambda r, i: r[i].sum(), rows8, idx)
    bench("gather (P,8) sorted", lambda r, i: r[i].sum(), rows8, idx_sorted)
    bench("gather (P,32) random", lambda r, i: r[i].sum(), rows32, idx)
    bench("gather (P,) scalar random", lambda r, i: r[:, 0][i].sum(),
          rows32, idx)
    bench("argsort int8 (P,)",
          lambda m: jnp.argsort(jnp.where(m, 0, 1).astype(jnp.int8),
                                stable=True).sum(), mask)
    bench("argsort f32 (P,)",
          lambda m: jnp.argsort(m.astype(jnp.float32), stable=True).sum(),
          mask)
    bench("cumsum int32 (P,)",
          lambda m: jnp.cumsum(m.astype(jnp.int32)).sum(), mask)
    bench("scatter set (131k,3)->(P,3)",
          lambda v, i: jnp.zeros((P, 3)).at[i].set(v).sum(), vals3, sidx)
    bench("scatter add (131k,3)->(P,3)",
          lambda v, i: jnp.zeros((P, 3)).at[i].add(v).sum(), vals3, sidx)
    bench("nonzero size=131k (P,)",
          lambda m: jnp.nonzero(m, size=131072, fill_value=P)[0].sum(), mask)
    # bilinear tap: 4 gathers from a texture bank
    tex = jnp.asarray(rng.random((8, 256, 256, 4), np.float32))
    uv = jnp.asarray(rng.random((P, 2), np.float32))
    tid = jnp.asarray(rng.integers(0, 8, P).astype(np.int32))

    def tap(tex, tid, uv):
        from swift_game_engine_tpu.render.textures import sample_bilinear
        return sample_bilinear(tex, tid, uv, jnp.ones(4)).sum()
    try:
        from swift_game_engine_tpu.render.textures import TextureBank
        bench("bilinear tap dense (P,)",
              lambda t_, i_, u_: tap(t_, i_, u_), tex, tid, uv, n=5)
    except Exception as e:
        print("tap bench skipped:", e)


if __name__ == "__main__":
    main()
