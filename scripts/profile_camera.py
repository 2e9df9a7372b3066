"""Attribute the camera-stage cost: walk vs NEE vs connections vs query
stores (the vc+vm combination measured ~100 ms more than vc alone —
scripts/profile_round3.py). Each timed unit is one dispatch returning one
scalar; subtract the empty-dispatch line.

Usage: python scripts/profile_camera.py [res]
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


def timeit(label, fn, *args, reps=6):
    fn(*args)
    t0 = time.time()
    for _ in range(reps):
        out = float(fn(*args))
    dt = (time.time() - t0) / reps
    print(f"{label:40s} {dt*1e3:8.1f} ms", flush=True)
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

    # Light stage once; the camera variants all consume the same verts.
    @jax.jit
    def light(it):
        fb = new_fb_planes(res, res)
        return vcm.trace_light_paths(
            scene, misc, pix, it, fb, 1234, 10, 0, True, True, False
        )

    verts, fbl, lrays = jax.block_until_ready(light(1))

    def cam_sum(verts, it, use_vc, use_vm):
        color, queries, _lv, sx, sy, cr = vcm._camera_stage(
            scene, misc, verts, pix, it, res, 1234, 10, 0,
            use_vc, use_vm, False, "threefry", "allgather", None,
        )
        s = jnp.sum(color.x) + jnp.sum(color.y)
        if use_vm:
            s = s + jnp.sum(queries.d_vcm) + jnp.sum(queries.position.x)
        return s

    timeit("camera walk only (no vc/vm)",
           jax.jit(partial(cam_sum, use_vc=False, use_vm=False)), verts, 1)
    timeit("camera + vm stores (bpm-style)",
           jax.jit(partial(cam_sum, use_vc=False, use_vm=True)), verts, 1)
    timeit("camera + vc (NEE+connections)",
           jax.jit(partial(cam_sum, use_vc=True, use_vm=False)), verts, 1)
    timeit("camera + vc + vm (production vcm)",
           jax.jit(partial(cam_sum, use_vc=True, use_vm=True)), verts, 1)

    # Stores stubbed out: isolates the cost of _store_slot traffic from
    # the walk itself (queries still "returned" as the empty buffers).
    real_store = vcm._store_slot
    try:
        vcm._store_slot = lambda v, i, **kw: v

        timeit("camera + vc + vm, stores STUBBED",
               jax.jit(partial(cam_sum, use_vc=True, use_vm=True)),
               verts, 1)
        timeit("camera + vm only, stores STUBBED",
               jax.jit(partial(cam_sum, use_vc=False, use_vm=True)),
               verts, 1)
    finally:
        vcm._store_slot = real_store


if __name__ == "__main__":
    main()
