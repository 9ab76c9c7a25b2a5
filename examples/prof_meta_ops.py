"""Which op in the cluster-meta chain is slow inside a fused loop?"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")


def slope(fn, *args, n=6):
    def chain(k):
        @jax.jit
        def run(args):
            def body(c, _):
                a0 = args[0] + c * 1e-38
                out = fn(a0, *args[1:])
                s = sum(jnp.sum(x) * 1e-30 for x in jax.tree.leaves(out)
                        if jnp.issubdtype(x.dtype, jnp.floating))
                return c + s, None
            tot, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=k)
            return tot
        jax.block_until_ready(run(args))
        t0 = time.perf_counter()
        jax.block_until_ready(run(args))
        return time.perf_counter() - t0
    t1 = chain(1)
    tn = chain(1 + n)
    return (tn - t1) / n


def main():
    C = 529
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.random((C,)).astype(np.float32))
    cols = jnp.asarray(rng.random((6, C)).astype(np.float32))

    print(f"argsort({C}): {slope(lambda w: jnp.argsort(w).astype(jnp.float32), w)*1e3:.2f} ms",
          flush=True)

    def meta_chain(w, cols):
        order = jnp.argsort(w)
        base = (order * 128).astype(jnp.float32)
        meta = jnp.stack([cols[0][order], cols[1][order], cols[2][order],
                          cols[3][order], w[order], base,
                          jnp.zeros_like(base), jnp.zeros_like(base)],
                         axis=-1)
        return meta.reshape(-1)
    print(f"full meta chain: {slope(meta_chain, w, cols)*1e3:.2f} ms",
          flush=True)

    T = 67712
    big = jnp.asarray(rng.random((T,)).astype(np.float32))

    def creduce(big):
        r = big.reshape(C, 128)
        return jnp.min(r, axis=1), jnp.max(r, axis=1)
    print(f"cluster reduce: {slope(creduce, big)*1e3:.2f} ms", flush=True)

    def stack16(big):
        return jnp.stack([big] * 16, axis=-1)
    print(f"stack16 (rows build): {slope(stack16, big)*1e3:.2f} ms",
          flush=True)

    print(f"argsort(67712): "
          f"{slope(lambda b: jnp.argsort(b).astype(jnp.float32), big)*1e3:.2f}"
          f" ms", flush=True)


if __name__ == "__main__":
    main()
