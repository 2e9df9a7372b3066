"""Round-3 stage profile: one dispatch per timed unit, single scalar out.

Each timed function is jitted to return ONE scalar so the measurement is
exactly one executable dispatch + one tiny transfer (the tunneled backend
adds ~10-25 ms per dispatch; summing many leaves separately poisons naive
timings by hundreds of ms).

Usage: python scripts/profile_round3.py [res]
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
from smallvcm_tpu.io.framebuffer import new_fb_planes


def timeit(label, fn, *args, reps=5):
    fn(*args)  # compile
    t0 = time.time()
    for _ in range(reps):
        out = float(fn(*args))
    dt = (time.time() - t0) / reps
    print(f"{label:32s} {dt*1e3:8.1f} ms", flush=True)
    return dt


def main():
    res = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    n = res * res
    scene = load_cornell_box((res, res), SCENE_CONFIGS[0])
    misc = vcm.compute_misc(scene, 1, n, 0.003, 0.75, True, True)
    pix = jnp.arange(n, dtype=jnp.uint32)
    print("backend:", jax.default_backend(), " res:", res, flush=True)

    @jax.jit
    def empty(x):
        return x * 2.0

    timeit("empty dispatch", empty, jnp.float32(1.0), reps=20)

    @jax.jit
    def light_only(it):
        fb = new_fb_planes(res, res)
        verts, fb, rays = vcm.trace_light_paths(
            scene, misc, pix, it, fb, 1234, 10, 0, True, True, False
        )
        return jnp.sum(fb.to_array()) + jnp.sum(verts.d_vcm)

    timeit("light stage", light_only, 1)

    @jax.jit
    def light_nostore(it):
        """Light stage without vertex storage/camera splat (pure walk)."""
        fb = new_fb_planes(res, res)
        verts, fb, rays = vcm.trace_light_paths(
            scene, misc, pix, it, fb, 1234, 10, 0, False, False, False
        )
        return jnp.sum(fb.to_array()) + rays.astype(jnp.float32)

    timeit("light walk (no store/splat)", light_nostore, 1)

    def cam(it, use_vc, use_vm):
        fb = new_fb_planes(res, res)
        verts, fb, rays = vcm.trace_light_paths(
            scene, misc, pix, it, fb, 1234, 10, 0, use_vc, use_vm, False
        )
        color, queries, _lv, sx, sy, cr = vcm._camera_stage(
            scene, misc, verts, pix, it, res, 1234, 10, 0,
            use_vc, use_vm, False, "threefry", "allgather", None,
        )
        s = jnp.sum(color.x)
        if use_vm:
            s = s + jnp.sum(queries.d_vcm)
        return s

    timeit("light+camera (vc, no vm)",
           jax.jit(partial(cam, use_vc=True, use_vm=False)), 1)
    timeit("light+camera (vc+vm queries)",
           jax.jit(partial(cam, use_vc=True, use_vm=True)), 1)
    timeit("light+camera (vm only, bpm)",
           jax.jit(partial(cam, use_vc=False, use_vm=True)), 1)

    if os.environ.get("SMALLVCM_PROFILE_STAGES_ONLY"):
        return

    # Merge backends over a real traced iteration.
    traced = vcm.trace_iteration(scene, 1, res, res)
    jax.block_until_ready(traced)
    ovf, stats = vcm.merge_measure_iteration(
        scene, 1, traced, res, res, photon_factor=4.0, query_factor=4.0
    )
    work, n_ph, n_q = (int(v) for v in stats)
    print(f"  merge demand: work={work} photons={n_ph} queries={n_q}")
    pf = max(4.0, -(-work * 1.3 // n))

    @partial(jax.jit, static_argnames=("backend", "chunks"))
    def merge_only(traced, backend="xla", chunks=1):
        img, rays, ovf, st = vcm.merge_finish_iteration(
            scene, 1, traced, res, res, pair_factor=pf,
            photon_factor=4.0, query_factor=4.0, merge_chunks=chunks,
            merge_backend=backend,
        )
        return jnp.sum(img) + ovf.astype(jnp.float32)

    timeit("merge-finish XLA", partial(merge_only, traced, backend="xla"))
    timeit("merge-finish Pallas",
           partial(merge_only, traced, backend="pallas"))

    @jax.jit
    def vcm_full(it):
        img, rays, ovf, st = vcm.render_iteration_with_stats(
            scene, it, res, res, pair_factor=pf, photon_factor=4.0,
            query_factor=4.0,
        )
        return jnp.sum(img)

    timeit("vcm full XLA (1 dispatch)", vcm_full, 1)

    from smallvcm_tpu.algorithms import pathtracer

    @jax.jit
    def pt(it):
        return jnp.sum(
            pathtracer.render_iteration(scene, it, res, res, 1234, 10, 0)
        )

    timeit("pt iteration", pt, 1)


if __name__ == "__main__":
    main()
