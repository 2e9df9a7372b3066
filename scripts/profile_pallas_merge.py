"""Time the Pallas merge backend's internal phases on the real chip.

Each timed jit returns one scalar (summed on device) so the host fetch is a
single tiny transfer — the tunneled backend's block_until_ready returns
early, so timing must include a fetch.
"""

import os, sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp

from smallvcm_tpu.scene.scene import SCENE_CONFIGS, load_cornell_box
from smallvcm_tpu.algorithms import vcm
from smallvcm_tpu.io.framebuffer import new_fb_planes
from smallvcm_tpu.ops import hashgrid as grid_ops
import smallvcm_tpu.ops.pallas_merge as pm


def timeit(fn, *args, reps=5):
    float(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        float(fn(*args))
    return (time.time() - t0) / reps


def main():
    res = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    n = res * res
    scene = load_cornell_box((res, res), SCENE_CONFIGS[0])
    misc = vcm.compute_misc(scene, 1, n, 0.003, 0.75, True, True)
    pix = jnp.arange(n, dtype=jnp.uint32)

    @jax.jit
    def light(it):
        fb = new_fb_planes(res, res)
        return vcm.trace_light_paths(
            scene, misc, pix, it, fb, 1234, 10, 0, True, True, False
        )[0]

    verts = jax.block_until_ready(light(1))
    queries = verts
    photon_cap = -(-3 * n // 128) * 128
    query_cap = photon_cap
    work_cap = (40 * n) // 128

    print("dispatch-floor:",
          round(timeit(jax.jit(lambda x: jnp.sum(x)),
                       jnp.ones((8,), jnp.float32)) * 1e3, 1), "ms")

    @jax.jit
    def full(q, lv):
        c, o, s = pm.merge_stage_pallas(
            scene, misc, q, lv, work_cap, False, 10, 0,
            photon_cap, query_cap, n)
        return jnp.sum(c.x) + jnp.sum(c.y) + jnp.sum(c.z) + o + s[0]

    print(f"full pallas merge      : {timeit(full, queries, verts)*1e3:8.1f} ms")

    @jax.jit
    def p_src(lv):
        return jnp.sum(pm._source_payload(lv))

    print(f"  source payload build : {timeit(p_src, verts)*1e3:8.1f} ms")

    @jax.jit
    def p_compact_sort(lv):
        psrc = pm._source_payload(lv)
        pv = psrc[:, 15] > 0.0
        big = jnp.float32(1e36)
        mins = tuple(jnp.min(jnp.where(pv, psrc[:, c], big)) for c in range(3))
        inv_cell = 1.0 / (misc.radius * 2.0)
        (pcx, pcy, pcz), _ = pm._cells_of(
            psrc[:, 0], psrc[:, 1], psrc[:, 2], mins, inv_cell, pv)
        prow_id = pcz * pm.GRID_XY + pcy
        pkey = jnp.where(pv, prow_id, pm._KEY_SENT)
        prows, src, n_p, ovf = pm._compact_sorted(psrc, pkey, photon_cap)
        return jnp.sum(prows) + n_p

    t_cs = timeit(p_compact_sort, verts)
    print(f"  payload+compact+sort : {t_cs*1e3:8.1f} ms (x2 entities)")

    @jax.jit
    def p_sort_only(keys):
        return jnp.sum(grid_ops.stable_radix_argsort(keys, 20))

    keys = jax.random.randint(
        jax.random.PRNGKey(0), (photon_cap,), 0, pm.ROWS, dtype=jnp.int32
    ).astype(jnp.uint32)
    print(f"  radix argsort alone  : {timeit(p_sort_only, keys)*1e3:8.1f} ms")

    @jax.jit
    def p_gather(rows, idx):
        return jnp.sum(rows[idx])

    rows16 = jnp.ones((10 * n, 16), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (photon_cap,), 0, 10 * n,
                             dtype=jnp.int32)
    print(f"  [cap,16] row gather  : {timeit(p_gather, rows16, idx)*1e3:8.1f} ms")

    @jax.jit
    def p_hist(rid):
        h = jnp.zeros((pm.ROWS + 1,), jnp.int32).at[rid].add(1)
        return jnp.sum(jnp.cumsum(h))

    rid = jax.random.randint(jax.random.PRNGKey(2), (10 * n,), 0, pm.ROWS,
                             dtype=jnp.int32)
    print(f"  row hist + cumsum    : {timeit(p_hist, rid)*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
