#!/usr/bin/env python
"""Does XLA TPU gather rate depend on operand size?

Times a scan of 64 chained [4, B, N] gathers (each iteration's indices depend
on the previous values, so nothing can be hoisted or elided) against flat
tables of several sizes.  Inputs are re-randomized per repetition to defeat
any (program, args) result caching in the tunnel.
"""
import sys
import time

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    B, N, iters = 64, 128, 64
    rng = np.random.default_rng(0)

    @jax.jit
    def chained(table, idx0, salt):
        n = table.shape[0]

        def body(carry, _):
            idx, acc = carry
            v = jnp.take(table, idx)                      # [4, B, N]
            # next indices depend on gathered values -> true serial chain
            nxt = (idx + (v.sum(0) * salt).astype(jnp.int32)[None]
                   + jnp.int32(12345)) % (n - 512)
            return (nxt, acc + v.sum()), None
        (idx, acc), _ = jax.lax.scan(body, (idx0, jnp.float32(0)), None,
                                     length=iters)
        return acc

    print(f"device: {jax.devices()[0]}  B={B} N={N} iters={iters}")
    for mb in (2.5, 10, 54, 215):
        n = int(mb * 1e6 / 4)
        table = jnp.asarray(rng.normal(0, 1, n), jnp.float32)
        best = 1e9
        for rep in range(5):
            idx0 = jnp.asarray(
                rng.integers(0, n - 512, (4, B, N)), jnp.int32)
            salt = jnp.float32(rng.uniform(0.5, 1.5))
            out = chained(table, idx0, salt)
            jax.block_until_ready(out)
            t0 = time.time()
            out = chained(table, idx0, salt)
            jax.block_until_ready(out)
            best = min(best, time.time() - t0)
        per_iter = best / iters
        rate = 4 * B * N / per_iter / 1e6
        print(f"table {mb:6.1f} MB: {per_iter * 1e6:8.1f} us/iter "
              f"({rate:7.1f} M elem/s)")


if __name__ == "__main__":
    main()
