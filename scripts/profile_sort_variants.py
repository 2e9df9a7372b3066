"""Device-time microbench of sort variants via in-jit repetition.

Each op is chained k times inside one jitted scan (carry perturbs the
input so nothing folds away); device time = (t(2k) - t(k)) / k, which
cancels the ~26 ms tunnel dispatch overhead exactly.

Usage: python scripts/profile_sort_variants.py
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


def bench(label, make_step, x0, k=8):
    """make_step() -> step(carry) chained; report per-step device ms."""

    def run(n):
        @jax.jit
        def f(x):
            def body(c, _):
                return make_step(c), None
            c, _ = jax.lax.scan(body, x, None, length=n)
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
    print(f"{label:56s} {dt*1e3:8.2f} ms/op", flush=True)
    return dt


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    m = 1 << 20

    keys = jnp.asarray(rng.integers(0, 1 << 20, size=m, dtype=np.uint32))
    idx = jnp.asarray(rng.permutation(m).astype(np.int32))
    vals = jnp.asarray(rng.standard_normal(m).astype(np.float32))
    planes = jnp.asarray(rng.standard_normal((16, m)).astype(np.float32))

    # Perturbation keeps each rep's input distinct (xor with a rolling
    # constant derived from the previous result — forces sequential deps).
    bench("sort u32 [1M]",
          lambda k_: jnp.sort(k_) ^ jnp.uint32(1), keys)

    keys64 = keys.astype(jnp.uint64) << jnp.uint64(32) | jnp.arange(
        m, dtype=jnp.uint64
    )
    bench("sort u64 [1M] (key<<32|idx)",
          lambda k_: jnp.sort(k_) ^ jnp.uint64(1), keys64)

    def kv2(c):
        k_, v_ = c
        sk, sv = jax.lax.sort((k_, v_), num_keys=1)
        return sk ^ jnp.uint32(1), sv
    bench("lax.sort 2-op (u32 key + i32 payload) [1M]", kv2, (keys, idx))

    def kv4(c):
        k_, a, b, d = c
        sk, sa, sb, sd = jax.lax.sort((k_, a, b, d), num_keys=1)
        return sk ^ jnp.uint32(1), sa, sb, sd
    bench("lax.sort 4-op [1M]", kv4, (keys, idx, vals, vals))

    def kv17(c):
        k_, pl = c
        ops = (k_,) + tuple(pl[i] for i in range(16))
        out = jax.lax.sort(ops, num_keys=1)
        return out[0] ^ jnp.uint32(1), jnp.stack(out[1:], axis=0)
    bench("lax.sort 17-op (key + 16 planes) [1M]", kv17, (keys, planes))

    bench("gather 1-wide [1M]",
          lambda i_: idx[i_] ^ jnp.int32(1), idx)

    def permplanes(i_):
        return planes[:, i_].astype(jnp.int32)[0] ^ jnp.int32(1)
    bench("gather 16-plane (permute only, recompute idx)",
          lambda i_: jnp.sum(planes[:, i_], axis=0).astype(jnp.int32)
          ^ jnp.int32(1), idx)

    bench("scatter-set 1-wide [1M]",
          lambda i_: jnp.zeros((m,), jnp.int32).at[i_].set(
              jnp.arange(m, dtype=jnp.int32), mode="drop") ^ jnp.int32(1),
          idx)

    bench("radix argsort 20b [1M] (current)",
          lambda k_: grid_ops.stable_radix_argsort(k_, 20).astype(
              jnp.uint32) ^ jnp.uint32(1), keys)


if __name__ == "__main__":
    main()
