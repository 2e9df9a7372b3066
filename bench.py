"""Benchmark: VCM, scene 0, 512x512 — rays/sec/chip vs the reference CPU.

Prints one JSON line:
  {"metric": "rays/sec/chip (VCM, scene 0, 512x512)", "value": N,
   "unit": "rays/s", "vs_baseline": N}

Ray count = path segments + shadow/occlusion rays actually enabled (the same
work the reference performs per iteration; lanes masked off are not counted,
so this is conservative for the wavefront design). The baseline divides the
identical ray count by the reference's measured per-iteration time on this
container's CPU (BASELINE.md: vcm scene 0, 1 iter = 1.6 s core-seconds).
"""

import json
import time

import jax

REFERENCE_VCM_SCENE0_SECONDS = 1.6  # BASELINE.md, measured in this container


def main():
    from smallvcm_tpu.scene.scene import SCENE_CONFIGS, load_cornell_box
    from smallvcm_tpu.algorithms import vcm

    res = 512
    scene = load_cornell_box((res, res), SCENE_CONFIGS[0])

    run = lambda it: vcm.render_iteration_with_stats(
        scene, it, res, res, pair_factor=32
    )

    import jax.numpy as jnp

    # Warmup / compile (block via a tiny transfer: block_until_ready is not
    # reliable through this container's tunneled backend).
    fb, rays, overflow, _stats = run(0)
    float(jnp.sum(fb))
    assert int(overflow) == 0, "merge pair cap overflow; raise pair_factor"

    iters = 5
    t0 = time.time()
    for it in range(1, iters + 1):
        fb, rays, overflow, _stats = run(it)
        float(jnp.sum(fb))
    elapsed = time.time() - t0
    total_rays = int(rays) * iters  # per-iteration count is ~constant

    rays_per_sec = total_rays / elapsed
    baseline_rays_per_sec = int(rays) / REFERENCE_VCM_SCENE0_SECONDS
    print(
        json.dumps(
            {
                "metric": "rays/sec/chip (VCM, scene 0, 512x512)",
                "value": round(rays_per_sec),
                "unit": "rays/s",
                "vs_baseline": round(rays_per_sec / baseline_rays_per_sec, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
