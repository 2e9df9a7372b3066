"""Round-5 lt breakdown: walk vs store vs camera-connect vs occlusion vs
splat (VERDICT item 4 — lt was 56 ms/iter vs pt's 16 ms).

Methodology: chain k light stages inside ONE jitted scan (iteration index
as xs so nothing folds), device time = (t(2k) - t(k)) / k — cancels the
~26-40 ms tunnel dispatch overhead. Pieces are isolated by monkeypatching
vcm.occluded / framebuffer splat inside alternate jitted programs.

Usage: python scripts/profile_lt.py [res]
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
from smallvcm_tpu.core.vec3 import V3
from smallvcm_tpu.io.framebuffer import new_fb_planes


def bench(label, step, k=6):
    def run(n):
        @jax.jit
        def f(_):
            def body(c, it):
                return step(c, it), None
            c, _ = jax.lax.scan(
                body, new_fb_planes(RES, RES),
                jnp.arange(n, dtype=jnp.int32),
            )
            return jnp.sum(c.x) + jnp.sum(c.y) + jnp.sum(c.z)

        float(f(0))
        t0 = time.time()
        for _ in range(3):
            float(f(0))
        return (time.time() - t0) / 3

    t1 = run(k)
    t2 = run(2 * k)
    dt = (t2 - t1) / k
    print(f"{label:56s} {dt*1e3:8.1f} ms/iter", flush=True)
    return dt


def main():
    global RES
    RES = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    n = RES * RES
    scene = load_cornell_box((RES, RES), SCENE_CONFIGS[0])
    misc = vcm.compute_misc(scene, 1, n, 0.003, 0.75, False, False)
    pix = jnp.arange(n, dtype=jnp.uint32)
    print("backend:", jax.default_backend(), " res:", RES, flush=True)

    def lt_step(fb, it, use_vc=False, use_vm=False, lt_only=True):
        _verts, fb, _rays = vcm.trace_light_paths(
            scene, misc, pix, it, fb, 1234, 10, 0, use_vc, use_vm, lt_only,
        )
        return fb

    # Full lt (walk + connect + splat + occlusion).
    bench("lt full (walk+connect)", lt_step)

    # Walk only: no store, no connect.
    def walk_only(fb, it):
        verts, fb2, _ = vcm.trace_light_paths(
            scene, misc, pix, it, fb, 1234, 10, 0, False, False, False,
        )
        # fb2 is untouched; fold a cheap function of the walk so it runs.
        return V3(fb.x + jnp.sum(verts.d_vcm) * 0.0 + 0.0,
                  fb.y, fb.z)

    # walk-only folds nothing into fb -> guard against DCE by adding a
    # reduction of the final state (d_vcm sum above).
    bench("walk only (no store/connect)", walk_only)

    # Walk + store (ppm-style light stage), no connect.
    def walk_store(fb, it):
        verts, fb2, _ = vcm.trace_light_paths(
            scene, misc, pix, it, fb, 1234, 10, 0, False, True, False,
        )
        return V3(fb.x + jnp.sum(verts.throughput.x) * 0.0,
                  fb.y, fb.z)

    bench("walk + store (no connect)", walk_store)

    # lt with occlusion forced off (shadow ray removed).
    real_occluded = vcm.occluded
    vcm.occluded = lambda s, p, d, dist: jnp.zeros(
        p.x.shape, bool
    )
    try:
        bench("lt, occlusion stubbed", lt_step)
    finally:
        vcm.occluded = real_occluded

    # lt with the framebuffer splat stubbed (keeps connect math + shadow).
    real_add = vcm.add_color

    def fake_add(fb, sx, sy, color):
        return V3(
            fb.x + jnp.sum(color.x) * 1e-30, fb.y, fb.z
        )

    vcm.add_color = fake_add
    try:
        bench("lt, splat stubbed (sum instead of scatter)", lt_step)
    finally:
        vcm.add_color = real_add

    # Both stubbed: pure connect math cost.
    vcm.occluded = lambda s, p, d, dist: jnp.zeros(p.x.shape, bool)
    vcm.add_color = fake_add
    try:
        bench("lt, occlusion+splat stubbed", lt_step)
    finally:
        vcm.occluded = real_occluded
        vcm.add_color = real_add


if __name__ == "__main__":
    main()
