"""Ablate the vc+vm camera-stage cost anomaly (round-3 profiling).

Measured round 3 at 512^2: light+camera with VC only = 174 ms, with VC+VM
query recording = 365 ms, with VM only = 122 ms. The +190 ms interaction
term is the single largest trace-stage anomaly; this script bisects it.

Usage: python scripts/profile_vcvm_ablation.py [res]
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
    pix = jnp.arange(n, dtype=jnp.uint32)
    print("backend:", jax.default_backend(), " res:", res, flush=True)

    def cam(it, use_vc, use_vm, read_queries="one"):
        fb = new_fb_planes(res, res)
        verts, fb, rays = vcm.trace_light_paths(
            scene, misc, pix, it, fb, 1234, 10, 0, use_vc, use_vm, False
        )
        color, queries, _lv, sx, sy, cr = vcm._camera_stage(
            scene, misc, verts, pix, it, res, 1234, 10, 0,
            use_vc, use_vm, False, "threefry", "allgather", None,
        )
        s = jnp.sum(color.x)
        if use_vm and read_queries == "one":
            s = s + jnp.sum(queries.d_vcm)
        elif use_vm and read_queries == "all":
            for leaf in jax.tree.leaves(queries):
                s = s + jnp.sum(leaf.astype(jnp.float32))
        return s

    timeit("vc only", jax.jit(partial(cam, use_vc=True, use_vm=False)), 1)
    timeit("vc+vm, queries unread",
           jax.jit(partial(cam, use_vc=True, use_vm=True,
                           read_queries="none")), 1)
    timeit("vc+vm, one query field read",
           jax.jit(partial(cam, use_vc=True, use_vm=True)), 1)
    timeit("vc+vm, all query fields read",
           jax.jit(partial(cam, use_vc=True, use_vm=True,
                           read_queries="all")), 1)

    # Same through the production trace_iteration (returns everything).
    @jax.jit
    def trace_full(it):
        traced = vcm.trace_iteration(scene, it, res, res)
        s = jnp.float32(0.0)
        for leaf in jax.tree.leaves(traced):
            s = s + jnp.sum(leaf.astype(jnp.float32).ravel()[:1])
        return s

    timeit("trace_iteration (production)", trace_full, 1)

    # Pallas merge prep alone (measure_only skips the Mosaic kernel).
    traced = vcm.trace_iteration(scene, 1, res, res)
    jax.block_until_ready(traced)

    @jax.jit
    def prep_only(traced):
        ovf, stats = vcm.merge_measure_iteration(
            scene, 1, traced, res, res, photon_factor=4.0,
            query_factor=4.0,
        )
        return ovf.astype(jnp.float32) + stats[0].astype(jnp.float32)

    timeit("pallas merge prep (measure_only)", prep_only, traced)


if __name__ == "__main__":
    main()
