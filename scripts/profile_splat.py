"""Scatter-add (framebuffer splat) strategy bench for the lt fix.

Usage: python scripts/profile_splat.py
"""

import os
import sys
import time

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
)

import jax
import jax.numpy as jnp
import numpy as np


def bench(label, make_step, x0, k=6):
    def run(nn):
        @jax.jit
        def f(x):
            def body(c, _):
                return make_step(c), None
            c, _ = jax.lax.scan(body, x, None, length=nn)
            return jax.tree.map(
                lambda a: jnp.sum(a.astype(jnp.float32)), c
            )

        r = f(x0)
        jax.block_until_ready(jax.tree.map(lambda a: float(a), r))
        t0 = time.time()
        for _ in range(3):
            r = f(x0)
            jax.tree.map(lambda a: float(a), r)
        return (time.time() - t0) / 3

    t1 = run(k)
    t2 = run(2 * k)
    dt = (t2 - t1) / k
    print(f"{label:64s} {dt*1e3:8.2f} ms/op", flush=True)
    return dt


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    m = 2359296          # 9 bounces x 512^2
    p = 512 * 512
    fbshape = (p,)

    idx_rand = jnp.asarray(rng.integers(0, p, size=m, dtype=np.int32))
    idx_sorted = jnp.sort(idx_rand)
    vals = jnp.asarray(rng.standard_normal(m).astype(np.float32))
    v3 = jnp.asarray(rng.standard_normal((m, 3)).astype(np.float32))

    def sc(i_, **kw):
        def step(c):
            return c.at[i_].add(vals, mode="drop", **kw)
        return step
    z = jnp.zeros(fbshape, jnp.float32)

    bench("[2.36M] scatter-add random", sc(idx_rand), z)
    bench("[2.36M] scatter-add sorted (no hint)", sc(idx_sorted), z)
    bench("[2.36M] scatter-add sorted + indices_are_sorted",
          sc(idx_sorted, indices_are_sorted=True), z)

    z2 = jnp.zeros((p, 3), jnp.float32)

    def sc3w(c):
        return c.at[idx_sorted].add(v3, mode="drop",
                                    indices_are_sorted=True)
    bench("[2.36M] 3-wide scatter-add sorted+hint", sc3w, z2)

    def sc3n(c):
        return c.at[idx_rand].add(v3, mode="drop")
    bench("[2.36M] 3-wide scatter-add random", sc3n, z2)

    # 5-op sort at 2.36M (key + pix + rgb payloads).
    keys = jnp.asarray(rng.integers(0, p + 1, size=m, dtype=np.uint32))

    def s5(c):
        k_, pix, r, g, b = c
        out = jax.lax.sort((k_, pix, r, g, b), num_keys=1, is_stable=True)
        return (out[0] ^ jnp.uint32(1),) + out[1:]
    bench("[2.36M] 5-op stable sort", s5,
          (keys, idx_rand, vals, vals, vals))

    # smaller scatter at the compacted cap
    cap = 1 << 20
    idx_c = idx_sorted[:cap]
    vals_c = vals[:cap]

    def scc(c):
        return c.at[idx_c].add(vals_c, mode="drop",
                               indices_are_sorted=True)
    bench("[1M] scatter-add sorted+hint", scc, z)


if __name__ == "__main__":
    main()
