"""Time VCM stages + both merge backends on the real chip.

Times are wall-clock around a host fetch of a tiny reduction of the result
(the tunneled backend's block_until_ready can return before remote
execution finishes, so sums are pulled to host each rep).
"""

import os, sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp

from smallvcm_tpu.scene.scene import SCENE_CONFIGS, load_cornell_box
from smallvcm_tpu.algorithms import vcm
from smallvcm_tpu.io.framebuffer import new_fb_planes
from smallvcm_tpu.ops.pallas_merge import merge_stage_pallas


def timeit(fn, *args, reps=3):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
        # force full execution: fetch a scalar derived from every output
        leaves = jax.tree.leaves(out)
        float(sum(jnp.sum(x.astype(jnp.float32)) for x in leaves))
    return (time.time() - t0) / reps, out


def main():
    res = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    n = res * res
    scene = load_cornell_box((res, res), SCENE_CONFIGS[0])
    misc = vcm.compute_misc(scene, 1, n, 0.003, 0.75, True, True)
    pix = jnp.arange(n, dtype=jnp.uint32)
    print("backend:", jax.default_backend())

    @jax.jit
    def light(it):
        fb = new_fb_planes(res, res)
        return vcm.trace_light_paths(
            scene, misc, pix, it, fb, 1234, 10, 0, True, True, False
        )

    t, (verts, fbl, rays) = timeit(light, 1)
    print(f"light stage          : {t*1e3:8.1f} ms")

    # camera stage with merging disabled but queries recorded: approximate
    # by running bpt (vc only, no vm) — the camera walk + NEE + connections.
    @jax.jit
    def bpt_iter(it):
        return vcm.render_iteration_core(
            scene, it, pix, res, res, n, 1234, 10, 0, 0.003, 0.75,
            True, False, False, False, 24.0, 3.0, 3.0, "allgather",
            "threefry", 1, "xla", axis_name=None,
        )[0]

    t, _ = timeit(bpt_iter, 1)
    print(f"bpt full iteration   : {t*1e3:8.1f} ms")

    queries = verts  # same scale/shape as camera queries

    pf = -(-3 * n // 128) * 128
    qf = -(-3 * n // 128) * 128

    @jax.jit
    def m_xla(q, lv):
        return vcm.merge_stage(
            scene, misc, q, lv, 2 * n, 40 * n, False, 10, 0,
            -(-3 * n // 8) * 8, -(-3 * n // 8) * 8, n,
            max(1, (40 * n) // (8 << 20)),
        )

    t, (cx, ox, sx) = timeit(m_xla, queries, verts)
    print(f"merge XLA            : {t*1e3:8.1f} ms  ovf={int(ox)} "
          f"stats={[int(v) for v in sx]}")

    @jax.jit
    def m_pal(q, lv):
        return merge_stage_pallas(
            scene, misc, q, lv, (40 * n) // 128, False, 10, 0, pf, qf, n
        )

    t, (cp, op, sp) = timeit(m_pal, queries, verts)
    print(f"merge Pallas         : {t*1e3:8.1f} ms  ovf={int(op)} "
          f"stats={[int(v) for v in sp]}")

    for name, backend in (("vcm XLA", "xla"), ("vcm Pallas", "pallas")):
        @jax.jit
        def vcm_iter(it, backend=backend):
            return vcm.render_iteration_core(
                scene, it, pix, res, res, n, 1234, 10, 0, 0.003, 0.75,
                True, True, False, False, 30.0, 3.0, 3.0, "allgather",
                "threefry", 1, backend, axis_name=None,
            )
        t, (fb, rays, ovf, st) = timeit(vcm_iter, 1)
        print(f"{name:21}: {t*1e3:8.1f} ms  ovf={int(ovf)} "
              f"rays={int(rays)} stats={[int(v) for v in st]} "
              f"lum={float(jnp.sum(fb)):.1f}")


if __name__ == "__main__":
    main()
