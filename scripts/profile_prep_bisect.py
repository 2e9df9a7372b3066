"""Fine-grained bisect of Pallas-merge prep: cumulative prefixes, one
dispatch each; successive differences isolate each sub-stage with the
~40 ms tunnel dispatch overhead cancelled.

Usage: python scripts/profile_prep_bisect.py [res]
"""

import os
import sys
import time

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
)

import jax
import jax.numpy as jnp

from smallvcm_tpu.scene.scene import SCENE_CONFIGS, load_cornell_box
from smallvcm_tpu.algorithms import vcm
from smallvcm_tpu.ops import hashgrid as grid_ops
from smallvcm_tpu.ops import pallas_merge as PM


def timeit(label, fn, *args, reps=8, prev=[0.0]):
    fn(*args)
    t0 = time.time()
    for _ in range(reps):
        float(fn(*args))
    dt = (time.time() - t0) / reps
    print(f"{label:46s} {dt*1e3:8.1f} ms  (+{(dt - prev[0])*1e3:6.1f})",
          flush=True)
    prev[0] = dt
    return dt


def main():
    res = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    n = res * res
    scene = load_cornell_box((res, res), SCENE_CONFIGS[0])
    misc = vcm.compute_misc(scene, 1, n, 0.003, 0.75, True, True)
    print("backend:", jax.default_backend(), " res:", res, flush=True)

    traced = vcm.trace_iteration(scene, 1, res, res)
    jax.block_until_ready(traced)
    fb, color, queries, verts, sx, sy, rays = traced
    photon_cap = -(-3 * n // (2 * 128)) * 128   # 1.5n (production-like)
    query_cap = -(-3 * n // 128) * 128          # 3n

    inv_cell = 1.0 / (misc.radius * 2.0)

    def q_planes(queries):
        return PM._source_planes(queries)

    def q_key(qs):
        qv = qs[15] > 0.0
        (cx, cy, cz), _ = PM._cells_of(
            qs[0], qs[1], qs[2], (0.0, 0.0, 0.0), inv_cell, qv)
        return jnp.where(qv, cz * PM.GRID_XY + cy, PM._KEY_SENT), qv

    @jax.jit
    def s0(queries):
        qs = q_planes(queries)
        return jnp.sum(qs[0]) + jnp.sum(qs[15])

    timeit("q: planes", s0, queries)

    @jax.jit
    def s1(queries):
        qs = q_planes(queries)
        key, qv = q_key(qs)
        return jnp.sum(key)

    timeit("q: planes+key", s1, queries)

    @jax.jit
    def s2(queries):
        qs = q_planes(queries)
        key, qv = q_key(qs)
        idx, count, ovf = grid_ops.compact_indices(qv, query_cap)
        return jnp.sum(key) + jnp.sum(idx) + count

    timeit("q: planes+key+compact", s2, queries)

    @jax.jit
    def s3(queries):
        qs = q_planes(queries)
        key, qv = q_key(qs)
        idx, count, ovf = grid_ops.compact_indices(qv, query_cap)
        keys_c = jnp.where(
            jnp.arange(query_cap, dtype=jnp.int32) < count,
            key[idx], PM._KEY_SENT)
        return jnp.sum(keys_c)

    timeit("q: ... + key gather [cap]", s3, queries)

    @jax.jit
    def s4(queries):
        qs = q_planes(queries)
        key, qv = q_key(qs)
        idx, count, ovf = grid_ops.compact_indices(qv, query_cap)
        keys_c = jnp.where(
            jnp.arange(query_cap, dtype=jnp.int32) < count,
            key[idx], PM._KEY_SENT)
        order = grid_ops.stable_radix_argsort(keys_c.astype(jnp.uint32), 20)
        return order[0].astype(jnp.float32) + order[-1].astype(jnp.float32)

    timeit("q: ... + radix argsort", s4, queries)

    @jax.jit
    def s5(queries):
        qs = q_planes(queries)
        key, qv = q_key(qs)
        idx, count, ovf = grid_ops.compact_indices(qv, query_cap)
        keys_c = jnp.where(
            jnp.arange(query_cap, dtype=jnp.int32) < count,
            key[idx], PM._KEY_SENT)
        order = grid_ops.stable_radix_argsort(keys_c.astype(jnp.uint32), 20)
        src = idx[order.astype(jnp.int32)]
        pos = qs[:3][:, src]
        return jnp.sum(pos)

    timeit("q: ... + 3-plane permute", s5, queries)

    @jax.jit
    def s6(queries):
        qs = q_planes(queries)
        key, qv = q_key(qs)
        idx, count, ovf = grid_ops.compact_indices(qv, query_cap)
        keys_c = jnp.where(
            jnp.arange(query_cap, dtype=jnp.int32) < count,
            key[idx], PM._KEY_SENT)
        order = grid_ops.stable_radix_argsort(keys_c.astype(jnp.uint32), 20)
        src = idx[order.astype(jnp.int32)]
        rows = qs[:, src]
        return jnp.sum(rows[:, 0]) + jnp.sum(rows[:, -1]) + jnp.sum(rows)

    timeit("q: ... + 16-plane permute", s6, queries)

    # Photon-side hist on the UNsorted planes (independent).
    @jax.jit
    def hist_only(verts):
        ps = PM._source_planes(verts)
        pv = ps[15] > 0.0
        (cx, cy, cz), _ = PM._cells_of(
            ps[0], ps[1], ps[2], (0.0, 0.0, 0.0), inv_cell, pv)
        row = cz * PM.GRID_XY + cy
        hist = jnp.zeros((PM.ROWS + 1,), jnp.int32).at[
            jnp.where(pv, row, PM.ROWS)].add(1)
        rs = jnp.cumsum(hist)
        return rs[-1] + rs[1000]

    timeit("p: planes+hist+cumsum (indep)", hist_only, verts,
           prev=[0.0])

    # Full query bake (prep with photon side minimized is hard to slice;
    # compare full_prep vs measure_only from profile_prep.py instead).


if __name__ == "__main__":
    main()
