"""Stage-level VCM profiling + TPU gather/scatter microbenchmarks.

Times (on the real chip) the light stage, camera stage, and merge stage
separately, plus primitive costs (scattered gather, scatter-add, cumsum,
keys-only sort) that bound any merge design. Run: python scripts/profile_merge.py
"""

import time

import jax
import jax.numpy as jnp

from smallvcm_tpu.scene.scene import SCENE_CONFIGS, load_cornell_box
from smallvcm_tpu.algorithms import vcm
from smallvcm_tpu.core.vec3 import V3


def sync(x):
    return float(jnp.sum(jax.tree.leaves(x)[0]))


def timeit(fn, *args, reps=3, **kw):
    out = fn(*args, **kw)
    sync(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args, **kw)
        sync(out)
    return (time.time() - t0) / reps, out


def main():
    res = 512
    n = res * res
    scene = load_cornell_box((res, res), SCENE_CONFIGS[0])

    # End-to-end variants.
    for name, kw in [
        ("bpt (no merge)", dict(use_vm=False)),
        ("bpm (no connect)", dict(use_vc=False)),
        ("vcm (full)", dict()),
    ]:
        f = jax.jit(
            lambda it, kw=kw: vcm.render_iteration_with_stats(
                scene, it, res, res, pair_factor=32, **kw
            )
        )
        t, out = timeit(f, 1)
        print(f"{name:24s} {t*1e3:9.1f} ms  (pairs={int(out[3][0])})")

    # Isolated stages.
    misc = vcm.compute_misc(scene, 1, n, 0.003, 0.75, True, True)
    pix = jnp.arange(n, dtype=jnp.uint32)

    from smallvcm_tpu.io.framebuffer import new_fb_planes

    @jax.jit
    def light_stage(it):
        fb = new_fb_planes(res, res)
        verts, fb, rays = vcm.trace_light_paths(
            scene, misc, pix, it, fb, 1234, 10, 0, True, True, False
        )
        return verts, fb

    t, (verts, _) = timeit(light_stage, 1)
    print(f"{'light stage':24s} {t*1e3:9.1f} ms")
    n_valid_ph = int(jnp.sum(verts.valid))
    print(f"  valid photons: {n_valid_ph} / {verts.valid.size}")

    @jax.jit
    def merge_only(verts):
        queries = verts  # camera queries have identical structure/scale
        return vcm.merge_stage(
            scene, misc, queries, verts, 2 * n, 32 * n, False, 10, 0,
            3 * n, 3 * n, n,
        )

    t, out = timeit(merge_only, verts)
    print(f"{'merge stage (isolated)':24s} {t*1e3:9.1f} ms  (pairs={int(out[2][0])}, ovf={int(out[1])})")

    # ---- Microbenchmarks ----
    key = jax.random.PRNGKey(0)
    for size, tbl in [(8 * n, 2 * n), (32 * n, 2 * n)]:
        idx = jax.random.randint(key, (size,), 0, tbl, dtype=jnp.int32)
        table = jnp.arange(tbl, dtype=jnp.float32)

        f = jax.jit(lambda i: table[i])
        t, _ = timeit(f, idx, reps=5)
        print(f"gather   {size/1e6:5.1f}M from {tbl/1e6:4.1f}M: {t*1e3:8.1f} ms  ({t/size*1e9:.2f} ns/el)")

        vals = jnp.ones((size,), jnp.float32)
        g = jax.jit(lambda i, v: jnp.zeros((tbl,), jnp.float32).at[i].add(v))
        t, _ = timeit(g, idx, vals, reps=5)
        print(f"scat-add {size/1e6:5.1f}M into {tbl/1e6:4.1f}M: {t*1e3:8.1f} ms  ({t/size*1e9:.2f} ns/el)")

        h = jax.jit(lambda v: jnp.cumsum(v.astype(jnp.int32)))
        t, _ = timeit(h, vals, reps=5)
        print(f"cumsum   {size/1e6:5.1f}M: {t*1e3:8.1f} ms")

        s = jax.jit(jnp.sort)
        u = jax.random.bits(key, (size,), jnp.uint32)
        t, _ = timeit(s, u, reps=3)
        print(f"sort     {size/1e6:5.1f}M: {t*1e3:8.1f} ms")

    # Sequential-ish gather (monotone idx)
    size = 32 * n
    idx = jnp.sort(jax.random.randint(key, (size,), 0, 2 * n, jnp.int32))
    table = jnp.arange(2 * n, dtype=jnp.float32)
    f = jax.jit(lambda i: table[i])
    t, _ = timeit(f, idx, reps=5)
    print(f"gather monotone {size/1e6:.1f}M: {t*1e3:8.1f} ms  ({t/size*1e9:.2f} ns/el)")


if __name__ == "__main__":
    main()
