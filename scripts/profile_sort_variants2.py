"""Round-5 follow-up: multi-operand sort at production widths.

Usage: python scripts/profile_sort_variants2.py
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
    print(f"{label:64s} {dt*1e3:8.2f} ms/op", flush=True)
    return dt


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)

    for m, cap in ((1 << 20, 786432), (2621440, 786432)):
        keys = jnp.asarray(
            rng.integers(0, 1 << 20, size=m, dtype=np.uint32)
        )
        planes = jnp.asarray(
            rng.standard_normal((16, m)).astype(np.float32)
        )
        iota = jnp.arange(m, dtype=jnp.int32)

        def s17(c):
            k_, pl = c
            ops = (k_,) + tuple(pl[i] for i in range(16))
            out = jax.lax.sort(ops, num_keys=1)
            return out[0] ^ jnp.uint32(1), jnp.stack(out[1:], axis=0)
        bench(f"[{m:>8}] 17-op sort num_keys=1", s17, (keys, planes))

        def s18(c):
            k_, pl = c
            ops = (k_, iota) + tuple(pl[i] for i in range(16))
            out = jax.lax.sort(ops, num_keys=2)
            return out[0] ^ jnp.uint32(1), jnp.stack(out[2:], axis=0)
        bench(f"[{m:>8}] 18-op sort num_keys=2 (key,iota)", s18,
              (keys, planes))

        def s17s(c):
            k_, pl = c
            ops = (k_,) + tuple(pl[i] for i in range(16))
            out = jax.lax.sort(ops, num_keys=1, is_stable=True)
            return out[0] ^ jnp.uint32(1), jnp.stack(out[1:], axis=0)
        bench(f"[{m:>8}] 17-op sort stable", s17s, (keys, planes))

        def s2cap(c):
            k_, pl = c
            sk, si = jax.lax.sort((k_, iota), num_keys=1, is_stable=True)
            src = si[:cap]
            return sk ^ jnp.uint32(1), pl[:, src].astype(jnp.float32)
        # note: carry shape changes -> wrap to keep shapes fixed
        def s2cap_fixed(c):
            k_, pl = c
            sk, si = jax.lax.sort((k_, iota), num_keys=1, is_stable=True)
            src = si[:cap]
            g = pl[:, src]
            # fold g back into pl so carry keeps shape
            pl2 = pl.at[:, :cap].set(g)
            return sk ^ jnp.uint32(1), pl2
        bench(f"[{m:>8}] 2-op stable sort + 16-plane gather[{cap}]",
              s2cap_fixed, (keys, planes))

        print(flush=True)


if __name__ == "__main__":
    main()
