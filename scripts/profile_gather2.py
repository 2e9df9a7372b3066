"""Microbench: row-width scaling of TPU scattered gathers.

If gather cost is per-row (DMA descriptor) rather than per-element, packing
per-photon payload into one wide row collapses the merge stage's gather
bill. Also checks scatter-add row widths and take_along_axis variants.
"""

import time

import jax
import jax.numpy as jnp


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.time() - t0) / reps


def main():
    key = jax.random.PRNGKey(0)
    n_idx = 4 * 1024 * 1024
    tbl = 512 * 1024
    idx = jax.random.randint(key, (n_idx,), 0, tbl, dtype=jnp.int32)

    for w in [1, 2, 4, 8, 16, 32]:
        table = jnp.ones((tbl, w), jnp.float32)
        f = jax.jit(lambda i, t: t[i])
        t = timeit(f, idx, table)
        print(f"gather rows w={w:2d}: {t*1e3:8.1f} ms  "
              f"({t/n_idx*1e9:.2f} ns/row, {t/(n_idx*w)*1e9:.2f} ns/el)")

    # scatter-add row widths
    for w in [1, 2, 4]:
        vals = jnp.ones((n_idx, w), jnp.float32)
        g = jax.jit(
            lambda i, v: jnp.zeros((tbl, v.shape[1]), jnp.float32)
            .at[i].add(v)
        )
        t = timeit(g, idx, vals)
        print(f"scat-add rows w={w:2d}: {t*1e3:8.1f} ms ({t/n_idx*1e9:.2f} ns/row)")

    # small table (VMEM-sized) vs big
    for tbl2 in [4096, 65536, 1024 * 1024, 8 * 1024 * 1024]:
        idx2 = jax.random.randint(key, (n_idx,), 0, tbl2, dtype=jnp.int32)
        table = jnp.ones((tbl2,), jnp.float32)
        f = jax.jit(lambda i, t: t[i])
        t = timeit(f, idx2, table)
        print(f"gather 4.2M from tbl={tbl2/1024:7.0f}K: {t*1e3:8.1f} ms ({t/n_idx*1e9:.2f} ns/el)")

    # int32 vs f32 rows, and one wide int32 row read as bits
    table = jnp.ones((tbl, 8), jnp.int32)
    f = jax.jit(lambda i, t: t[i])
    t = timeit(f, idx, table)
    print(f"gather int32 rows w=8: {t*1e3:8.1f} ms ({t/n_idx*1e9:.2f} ns/row)")


if __name__ == "__main__":
    main()
