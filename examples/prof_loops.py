"""Microbench: what does one while_loop iteration cost on this TPU?"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")


def timeit(fn, *args, n=10, warmup=2):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / n


def main():
    from swift_game_engine_tpu.physics.primitives import segment_triangle_distance
    from swift_game_engine_tpu.scene.demo_scene import DemoScene
    scene = DemoScene().build()
    soup0 = scene["collision"]
    import numpy as np
    v0 = jnp.asarray(soup0.p0)
    v1 = jnp.asarray(soup0.p1)
    v2 = jnp.asarray(soup0.p2)
    A = 5

    key = jax.random.PRNGKey(0)
    centers = jax.random.normal(key, (A, 3)) * 5

    def seg_tri_all(c):
        # one CA-iteration equivalent: A x T segment-tri distances
        return jax.vmap(lambda ci: segment_triangle_distance(ci, 1.0, v0, v1, v2)[0])(c)

    for iters in (1, 8, 48, 192):
        @jax.jit
        def loop(c, iters=iters):
            def body(carry):
                c, acc, i = carry
                d = seg_tri_all(c + acc[..., None] * 0.001)
                return c, acc + d.min(axis=-1), i + 1

            def cond(carry):
                return carry[2] < iters

            _, acc, _ = jax.lax.while_loop(cond, body, (c, jnp.zeros(A), 0))
            return acc

        t = timeit(loop, centers, n=10)
        print(f"while x{iters:4d} seg-tri (A={A},T={v0.shape[0]}): "
              f"{t*1e3:7.2f} ms  ({t/iters*1e6:7.1f} us/iter)")

    # same but fori_loop
    for iters in (48, 192):
        @jax.jit
        def loopf(c, iters=iters):
            def body(i, carry):
                c, acc = carry
                d = seg_tri_all(c + acc[..., None] * 0.001)
                return c, acc + d.min(axis=-1)
            _, acc = jax.lax.fori_loop(0, iters, body, (c, jnp.zeros(A)))
            return acc
        t = timeit(loopf, centers, n=10)
        print(f"fori  x{iters:4d}: {t*1e3:7.2f} ms ({t/iters*1e6:7.1f} us/iter)")

    # nested while (slide x CA) like the mover
    @jax.jit
    def nested(c):
        def outer_body(carry):
            c, acc, j = carry

            def body(inner):
                acc2, i = inner
                d = seg_tri_all(c + acc2[..., None] * 0.001)
                return acc2 + d.min(axis=-1), i + 1

            acc2, _ = jax.lax.while_loop(lambda x: x[1] < 48, body,
                                         (acc, 0))
            return c, acc2, j + 1

        _, acc, _ = jax.lax.while_loop(lambda x: x[2] < 4, outer_body,
                                       (c, jnp.zeros(A), 0))
        return acc

    t = timeit(nested, centers, n=10)
    print(f"nested 4x48: {t*1e3:7.2f} ms ({t/192*1e6:7.1f} us/iter)")

    # big batched one-shot: all iterations as parallel lanes
    @jax.jit
    def oneshot(c):
        cc = jnp.repeat(c, 64, axis=0)  # 320 queries
        return seg_tri_all(cc)

    t = timeit(oneshot, centers, n=10)
    print(f"one-shot 320xT seg-tri: {t*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
