"""Splat fix feasibility: [N,3] interleave + plane split costs.

Usage: python scripts/profile_splat2.py
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
    m = 2359296
    p = 512 * 512

    r = jnp.asarray(rng.standard_normal(m).astype(np.float32))
    g = jnp.asarray(rng.standard_normal(m).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(m).astype(np.float32))
    idx_sorted = jnp.sort(
        jnp.asarray(rng.integers(0, p, size=m, dtype=np.int32))
    )
    buf3 = jnp.asarray(rng.standard_normal((p, 3)).astype(np.float32))

    bench("[2.36M] stack 3 planes -> [N,3] (interleave)",
          lambda x: jnp.stack([x, g, b], axis=1).sum(axis=1), r)

    def full(x):
        v3 = jnp.stack([x, g, b], axis=1)
        out = jnp.zeros((p, 3), jnp.float32).at[idx_sorted].add(
            v3, mode="drop", indices_are_sorted=True
        )
        return x + out[0, 0] * 1e-30
    bench("[2.36M] stack + 3-wide sorted scatter", full, r)

    bench("[P,3] split back to 3 planes",
          lambda x: x[:, 0].reshape(512, 512)[0, 0] * 1e-30 + x
          if False else
          jnp.stack([x[:, 0], x[:, 1], x[:, 2]], axis=0).sum(axis=1)[:1]
          * 1e-30 + x,
          buf3)

    # per-bounce variant at 262k
    mm = 262144
    rr = r[:mm]
    ii = idx_sorted[:mm]

    def per_bounce(x):
        v3 = jnp.stack([x, g[:mm], b[:mm]], axis=1)
        out = jnp.zeros((p, 3), jnp.float32).at[ii].add(
            v3, mode="drop"
        )
        return x + out[0, 0] * 1e-30
    bench("[262k] stack + 3-wide random scatter (per bounce)",
          per_bounce, rr)


if __name__ == "__main__":
    main()
