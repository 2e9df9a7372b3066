"""Round-5 VCM phase breakdown with the scan-delta method (cancels the
tunnel dispatch overhead exactly; all phases run at production caps).

Usage: python scripts/profile_vcm_r5.py [res]
"""

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import jax
import jax.numpy as jnp

from smallvcm_tpu.scene.scene import SCENE_CONFIGS, load_cornell_box
from smallvcm_tpu.algorithms import vcm
from smallvcm_tpu.ops import pallas_merge as pm


def bench(label, step, k=4):
    def run(n):
        @jax.jit
        def f(_):
            def body(c, it):
                return step(c, it), None
            c, _ = jax.lax.scan(
                body, jnp.zeros((), jnp.float32),
                jnp.arange(n, dtype=jnp.int32),
            )
            return c

        float(f(0))
        t0 = time.time()
        for _ in range(3):
            float(f(0))
        return (time.time() - t0) / 3

    t1 = run(k)
    t2 = run(2 * k)
    dt = (t2 - t1) / k
    print(f"{label:44s} {dt*1e3:8.1f} ms/iter", flush=True)
    return dt


def main():
    res = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    n = res * res
    scene = load_cornell_box((res, res), SCENE_CONFIGS[0])
    print("backend:", jax.default_backend(), " res:", res, flush=True)

    caps_file = os.path.expanduser("~/.cache/smallvcm_tpu/caps.json")
    pf, phf, qf = 24.0, 1.25, 1.25
    try:
        caps = json.load(open(caps_file))
        for k_, v in caps.items():
            if k_.startswith("vcm|pallas|512x512|"):
                pf, phf, qf = (v["pair_factor"], v["photon_factor"],
                               v["query_factor"])
                break
    except OSError:
        pass
    print("caps:", pf, phf, qf, flush=True)
    photon_cap = -(-int(phf * n) // pm.SLAB) * pm.SLAB
    query_cap = -(-int(qf * n) // pm.QTILE) * pm.QTILE

    def folded(x):
        ls = jax.tree.leaves(x)
        return sum(jnp.sum(l.astype(jnp.float32)) * 1e-30 for l in ls)

    def misc_of(it):
        return vcm.compute_misc(scene, it + 1, n, 0.003, 0.75, True, True)

    def traced_of(it):
        pix = jnp.arange(n, dtype=jnp.uint32)
        misc = misc_of(it)
        fb = vcm.new_fb_planes(res, res)
        verts, fb, rays = vcm.trace_light_paths(
            scene, misc, pix, it + 1, fb, 1234, 10, 0, True, True, False,
        )
        color, queries, lv, sx, sy, cr = vcm._camera_stage(
            scene, misc, verts, pix, it + 1, res, 1234, 10, 0,
            True, True, False, "threefry", "allgather", None, True,
        )
        return misc, fb, color, queries, verts

    def full(c, it):
        img, rays, ovf, stats, lum = vcm.render_block_with_stats(
            scene, it + 1, res, res, 1, pair_factor=pf,
            photon_factor=phf, query_factor=qf, merge_backend="pallas",
        )
        return c + lum * 1e-30

    sel = sys.argv[2] if len(sys.argv) > 2 else "all"
    if sel in ("all", "full"):
        bench("full iteration (pallas merge)", full)

    def light_only(c, it):
        pix = jnp.arange(n, dtype=jnp.uint32)
        misc = misc_of(it)
        fb = vcm.new_fb_planes(res, res)
        verts, fb, rays = vcm.trace_light_paths(
            scene, misc, pix, it + 1, fb, 1234, 10, 0, True, True, False,
        )
        return c + folded((verts.d_vcm, fb.x))

    if sel in ("all", "light"):
        bench("light stage (walk+store+splat)", light_only)

    def both_stages(c, it):
        misc, fb, color, queries, verts = traced_of(it)
        return c + folded((fb.x, color.x, queries.d_vcm, queries.valid))

    if sel in ("all", "stages"):
        bench("light + camera stages", both_stages)

    def with_prep(c, it):
        misc, fb, color, queries, verts = traced_of(it)
        prep, q_path, n_q, ovf, stats = pm.merge_prep(
            scene, misc, queries, verts, photon_cap, query_cap, n,
        )
        return c + folded((prep[0], prep[1], prep[2])) + jnp.sum(
            q_path
        ) * 1e-30

    if sel in ("all", "prep"):
        bench("... + merge prep", with_prep)

    def with_kernel(c, it):
        misc, fb, color, queries, verts = traced_of(it)
        prep, q_path, n_q, ovf, stats = pm.merge_prep(
            scene, misc, queries, verts, photon_cap, query_cap, n,
        )
        scal = jnp.stack([
            misc.radius_sqr.astype(jnp.float32),
            jnp.asarray(misc.mis_vc_weight, jnp.float32),
            jnp.float32(0.0), jnp.float32(0.0),
        ]).reshape(1, 4)
        out = pm.run_tile_kernel(
            scal, *prep, max_path_length=10, min_path_length=0, ppm=False,
        )
        return c + jnp.sum(out) * 1e-30

    if sel in ("all", "kernel"):
        bench("... + kernel", with_kernel)

    def with_post(c, it):
        misc, fb, color, queries, verts = traced_of(it)
        prep, q_path, n_q, ovf, stats = pm.merge_prep(
            scene, misc, queries, verts, photon_cap, query_cap, n,
        )
        scal = jnp.stack([
            misc.radius_sqr.astype(jnp.float32),
            jnp.asarray(misc.mis_vc_weight, jnp.float32),
            jnp.float32(0.0), jnp.float32(0.0),
        ]).reshape(1, 4)
        out = pm.run_tile_kernel(
            scal, *prep, max_path_length=10, min_path_length=0, ppm=False,
        )
        mc = pm.merge_post(
            out, prep[0], q_path, n_q, misc.vm_normalization, n
        )
        return c + folded((mc.x, mc.y, mc.z))

    if sel in ("all", "post"):
        bench("... + post", with_post)


if __name__ == "__main__":
    main()
