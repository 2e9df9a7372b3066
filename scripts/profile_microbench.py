"""Micro-benchmarks of the TPU primitive costs that dominate merge prep.

Informs the prep redesign: wide-row stacks, gathers by layout, cumsum
shapes, 1-D sorts. Usage: python scripts/profile_microbench.py
"""

import os
import sys
import time
from functools import partial

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
)

import jax
import jax.numpy as jnp


def timeit(label, fn, *args, reps=8):
    fn(*args)
    t0 = time.time()
    for _ in range(reps):
        float(fn(*args))
    dt = (time.time() - t0) / reps
    print(f"{label:52s} {dt*1e3:8.1f} ms", flush=True)
    return dt


def main():
    M = 3_145_728          # 12 * 512^2 (query source slots)
    CAP = 786_432          # 3 * 512^2
    CAPS = 393_216
    print("backend:", jax.default_backend(), flush=True)
    key = jax.random.PRNGKey(0)
    fields = [jax.random.uniform(jax.random.fold_in(key, i), (M,))
              for i in range(16)]
    idx = jax.random.randint(jax.random.fold_in(key, 99), (CAP,), 0, M)
    idx_s = idx[:CAPS]
    keys_m = jax.random.randint(jax.random.fold_in(key, 7), (M,), 0,
                                1 << 19, dtype=jnp.int32).astype(jnp.uint32)

    @jax.jit
    def stack_axis1(*fs):
        return jnp.sum(jnp.stack(fs, axis=1)[0])

    timeit("stack 16x[3.1M] axis=1 ([M,16] rows)", stack_axis1, *fields)

    @jax.jit
    def stack_axis0(*fs):
        return jnp.sum(jnp.stack(fs, axis=0)[:, 0])

    timeit("stack 16x[3.1M] axis=0 ([16,M] planes)", stack_axis0, *fields)

    rows = jnp.stack(fields, axis=1)
    planes = jnp.stack(fields, axis=0)
    jax.block_until_ready((rows, planes))

    @jax.jit
    def rowgather(rows, idx):
        return jnp.sum(rows[idx][:, 0])

    timeit("row gather [M,16] -> [786K,16]", rowgather, rows, idx)

    @jax.jit
    def colgather(planes, idx):
        return jnp.sum(planes[:, idx][0])

    timeit("col gather [16,M] -> [16,786K]", colgather, planes, idx)

    @jax.jit
    def fieldgather(idx, *fs):
        return sum(jnp.sum(f[idx]) for f in fs)

    timeit("16 separate 1-D gathers [786K]", fieldgather, idx, *fields)

    @jax.jit
    def cumsum1d(x):
        return jnp.cumsum((x > 0.5).astype(jnp.int32))[-1].astype(
            jnp.float32)

    timeit("cumsum 1-D [3.1M]", cumsum1d, fields[0])

    @jax.jit
    def cumsum2d(x):
        v = (x > 0.5).astype(jnp.int32).reshape(-1, 512)
        row = jnp.cumsum(v, axis=1)
        base = jnp.cumsum(row[:, -1])
        out_last = row[-1, -1] + base[-2]
        return out_last.astype(jnp.float32)

    timeit("cumsum hierarchical [6144,512]", cumsum2d, fields[0])

    @jax.jit
    def sort1d(k):
        return jnp.sort(k)[0].astype(jnp.float32)

    timeit("jnp.sort 1-D [3.1M] u32", sort1d, keys_m)
    timeit("jnp.sort 1-D [786K] u32", sort1d, keys_m[:CAP])
    timeit("jnp.sort 1-D [393K] u32", sort1d, keys_m[:CAPS])

    @jax.jit
    def scatteradd(h):
        z = jnp.zeros((1 << 19,), jnp.int32)
        return z.at[h.astype(jnp.int32)].add(1)[0].astype(jnp.float32)

    timeit("scatter-add hist [3.1M] -> [524K]", scatteradd, keys_m)
    timeit("scatter-add hist [786K]", scatteradd, keys_m[:CAP])

    from smallvcm_tpu.ops import hashgrid as grid_ops

    @jax.jit
    def radix(k):
        return grid_ops.stable_radix_argsort(k, 20)[0].astype(jnp.float32)

    timeit("packed radix argsort [3.1M] 20b", radix, keys_m)
    timeit("packed radix argsort [786K] 20b", radix, keys_m[:CAP])
    timeit("packed radix argsort [393K] 20b", radix, keys_m[:CAPS])


def transpose_bench():
    print("backend:", jax.default_backend(), flush=True)
    key = jax.random.PRNGKey(0)
    for cap, f in ((786_432, 32), (1_048_576, 16)):
        x = jax.random.uniform(key, (f, cap))

        @jax.jit
        def tr(x):
            return jnp.sum(x.T[:, 0])

        timeit(f"transpose [{f},{cap}] -> [{cap},{f}]", tr, x)

        @jax.jit
        def tr_pad(x):
            # Transpose into a 128-lane padded row layout (kernel tile
            # friendly): reshape trick via [f, cap//128, 128]
            y = x.reshape(f, cap // 128, 128).transpose(1, 2, 0)
            return jnp.sum(y[0])

        timeit(f"tiled transpose [{f},{cap}]", tr_pad, x)


if __name__ == "__main__":
    if "transpose" in sys.argv:
        transpose_bench()
    else:
        main()
