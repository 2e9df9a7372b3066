"""Bisect the Pallas-merge cost into sub-stages (planar-table API).

Each timed unit is one jit returning a single scalar so the measurement is
one dispatch + one tiny fetch (the tunneled backend adds ~10-25 ms per
round-trip; see profile_round3.py).

Usage: python scripts/profile_prep.py [res]
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

from smallvcm_tpu.scene.scene import SCENE_CONFIGS, load_cornell_box
from smallvcm_tpu.algorithms import vcm
from smallvcm_tpu.ops import hashgrid as grid_ops
from smallvcm_tpu.ops import pallas_merge as PM


def timeit(label, fn, *args, reps=8):
    fn(*args)
    t0 = time.time()
    for _ in range(reps):
        float(fn(*args))
    dt = (time.time() - t0) / reps
    print(f"{label:44s} {dt*1e3:8.1f} ms", flush=True)
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
    photon_cap = -(-2 * n // 128) * 128
    query_cap = -(-3 * n // 128) * 128

    @jax.jit
    def planes_compact(queries, verts):
        ps = PM._source_planes(verts)
        qs = PM._source_planes(queries)
        ip, np_, op = grid_ops.compact_indices(ps[15] > 0, photon_cap)
        iq, nq_, oq = grid_ops.compact_indices(qs[15] > 0, query_cap)
        return (jnp.sum(ps[0]) + jnp.sum(qs[0])
                + (ip[0] + iq[0] + np_ + nq_).astype(jnp.float32))

    timeit("source planes + compact idx", planes_compact, queries, verts)

    @jax.jit
    def photon_side(verts):
        ps = PM._source_planes(verts)
        pv = ps[15] > 0.0
        big = jnp.float32(1e36)
        mins = tuple(jnp.min(jnp.where(pv, ps[c], big)) for c in range(3))
        inv_cell = 1.0 / (misc.radius * 2.0)
        (cx, cy, cz), _ = PM._cells_of(
            ps[0], ps[1], ps[2], mins, inv_cell, pv)
        row = cz * PM.GRID_XY + cy
        key = jnp.where(pv, row, PM._KEY_SENT)
        prows, pidx, n_p, ovf = PM._compact_sorted(ps, key, photon_cap)
        return jnp.sum(prows[0]) + n_p.astype(jnp.float32)

    timeit("photon key+sort+permute", photon_side, verts)

    @jax.jit
    def query_side(queries, verts):
        ps = PM._source_planes(verts)
        pv = ps[15] > 0.0
        big = jnp.float32(1e36)
        mins = tuple(jnp.min(jnp.where(pv, ps[c], big)) for c in range(3))
        inv_cell = 1.0 / (misc.radius * 2.0)
        qs = PM._source_planes(queries)
        qv = qs[15] > 0.0
        (cx, cy, cz), _ = PM._cells_of(
            qs[0], qs[1], qs[2], mins, inv_cell, qv)
        key = jnp.where(qv, cz * PM.GRID_XY + cy, PM._KEY_SENT)
        qrows, qidx, n_q, ovf = PM._compact_sorted(qs, key, query_cap)
        return jnp.sum(qrows[0]) + n_q.astype(jnp.float32)

    timeit("query key+sort+permute", query_side, queries, verts)

    @jax.jit
    def sort_only(verts):
        ps = PM._source_planes(verts)
        m = ps.shape[1]
        key = (jnp.arange(m) % 1999).astype(jnp.uint32)
        order = grid_ops.stable_radix_argsort(key, 20)
        return order[0].astype(jnp.float32) + order[-1].astype(jnp.float32)

    timeit(f"radix argsort alone ({verts.valid.size} keys)",
           sort_only, verts)

    @jax.jit
    def row_hist_fn(verts):
        ps = PM._source_planes(verts)
        pv = ps[15] > 0.0
        big = jnp.float32(1e36)
        mins = tuple(jnp.min(jnp.where(pv, ps[c], big)) for c in range(3))
        inv_cell = 1.0 / (misc.radius * 2.0)
        (cx, cy, cz), _ = PM._cells_of(
            ps[0], ps[1], ps[2], mins, inv_cell, pv)
        row = cz * PM.GRID_XY + cy
        hist = jnp.zeros((PM.ROWS + 1,), jnp.int32).at[
            jnp.where(pv, row, PM.ROWS)].add(1)
        rs = jnp.cumsum(hist)
        return rs[-1].astype(jnp.float32) + rs[1000].astype(jnp.float32)

    timeit("row hist + 524K cumsum", row_hist_fn, verts)

    @jax.jit
    def full_prep(queries, verts):
        prep, q_path, n_q, ovf, stats = PM.merge_prep(
            scene, misc, queries, verts, photon_cap, query_cap, n,
        )
        s = sum(jnp.sum(t.astype(jnp.float32).ravel()[:2]) for t in prep)
        return s + stats[0].astype(jnp.float32)

    timeit("full prep (tables baked)", full_prep, queries, verts)

    @jax.jit
    def measure_prep(queries, verts):
        _, _, n_q, ovf, stats = PM.merge_prep(
            scene, misc, queries, verts, photon_cap, query_cap, n,
            measure_only=True,
        )
        return stats[0].astype(jnp.float32) + ovf.astype(jnp.float32)

    timeit("measure-only prep (bakes DCEd)", measure_prep, queries, verts)

    prep, q_path, n_q, ovf, stats = jax.jit(
        PM.merge_prep, static_argnames=("photon_cap", "query_cap",
                                        "n_paths", "measure_only")
    )(scene, misc, queries, verts, photon_cap=photon_cap,
      query_cap=query_cap, n_paths=n)
    jax.block_until_ready(prep)
    print("  stats (work, n_p, n_q):",
          [int(v) for v in jax.device_get(stats)], flush=True)
    scal = PM.make_scal(float(misc.radius_sqr), float(misc.mis_vc_weight))

    @jax.jit
    def kern_sum(scal, qtab, runs, ptab):
        out = PM.run_tile_kernel(
            scal, qtab, runs, ptab, max_path_length=10, min_path_length=0,
            ppm=False)
        return jnp.sum(out[:3])

    timeit("tile kernel (incl sum)", kern_sum, scal, *prep)

    @jax.jit
    def post_sum(out_like, qtab):
        color = PM.merge_post(
            out_like, qtab, q_path, n_q, misc.vm_normalization, n)
        return jnp.sum(color.x)

    out = jnp.ones((8, query_cap), jnp.float32)
    timeit("merge post (scatter-add)", post_sum, out, prep[0])


if __name__ == "__main__":
    main()
