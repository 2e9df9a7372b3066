"""Microbench: jnp.sort / gather / scatter / radix-argsort costs on the TPU.

Establishes the round-5 baseline for replacing the merge-prep argsorts.
Usage: python scripts/profile_sort_primitives.py
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

from smallvcm_tpu.ops import hashgrid as grid_ops


def timeit(label, fn, *args, reps=10):
    float(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        float(fn(*args))
    dt = (time.time() - t0) / reps
    print(f"{label:52s} {dt*1e3:8.2f} ms", flush=True)
    return dt


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)

    for m in (1 << 19, 786432, 1 << 20, 3 << 20):
        keys = jnp.asarray(
            rng.integers(0, 1 << 20, size=m, dtype=np.uint32)
        )
        idx = jnp.asarray(rng.permutation(m).astype(np.int32))
        vals = jnp.asarray(rng.standard_normal(m).astype(np.float32))
        planes = jnp.asarray(
            rng.standard_normal((16, m)).astype(np.float32)
        )

        sort1 = jax.jit(lambda k: jnp.sum(jnp.sort(k)))
        timeit(f"[{m:>8}] jnp.sort u32", sort1, keys)

        gath = jax.jit(lambda v, i: jnp.sum(v[i]))
        timeit(f"[{m:>8}] gather 1-wide [m]", gath, vals, idx)

        gathw = jax.jit(lambda p, i: jnp.sum(p[:, i]))
        timeit(f"[{m:>8}] gather 16-plane [16,m]", gathw, planes, idx)

        scat = jax.jit(
            lambda v, i: jnp.sum(
                jnp.zeros((m,), jnp.float32).at[i].set(v, mode="drop")
            )
        )
        timeit(f"[{m:>8}] scatter-set 1-wide [m]", scat, vals, idx)

        scata = jax.jit(
            lambda v, i: jnp.sum(
                jnp.zeros((m,), jnp.float32).at[i].add(v, mode="drop")
            )
        )
        timeit(f"[{m:>8}] scatter-add 1-wide [m]", scata, vals, idx)

        rsort = jax.jit(
            lambda k: jnp.sum(grid_ops.stable_radix_argsort(k, 20))
        )
        timeit(f"[{m:>8}] stable_radix_argsort 20b", rsort, keys)

        print(flush=True)


if __name__ == "__main__":
    main()
