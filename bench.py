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
    from smallvcm_tpu.render import _bucket

    res = 512
    n = res * res
    scene = load_cornell_box((res, res), SCENE_CONFIGS[0])

    import jax.numpy as jnp

    # Size the merge caps from a measured dry run (the same right-sizing the
    # render driver's cap ladder performs): every op downstream of the merge
    # compaction runs at CAP width, not live width, so oversized caps cost
    # real per-iteration time (~100 ms at 2x).
    # Stats (candidate pairs / live photons / live queries) are measured
    # exactly even when a cap overflows, so one undersized probe suffices.
    # Probe at iteration 1: iteration 0's merge radius is the largest
    # (vertexcm.hxx:294-299) and transient — its pair count is ~1.7x the
    # steady state, and the render driver right-sizes the caps down after
    # it anyway (render.py cap ladder), so steady-state iterations are
    # what this measures.
    # Pair counts are exact only when the photon/query caps did not
    # themselves overflow (a truncated photon set builds a smaller cell
    # table), so re-probe with grown caps until the probe is overflow-free
    # — the same ladder the render driver runs.
    probe = dict(pair_factor=24.0, photon_factor=3.0, query_factor=3.0)
    while True:
        fb, rays, overflow, stats = vcm.render_iteration_with_stats(
            scene, 1, res, res, **probe
        )
        pairs, n_ph, n_q = (int(v) for v in stats)
        grown = dict(
            pair_factor=max(probe["pair_factor"], _bucket(pairs * 1.1, n)),
            photon_factor=max(probe["photon_factor"], _bucket(n_ph * 1.1, n)),
            query_factor=max(probe["query_factor"], _bucket(n_q * 1.1, n)),
        )
        if int(overflow) == 0:
            break
        probe = grown
    caps = dict(
        pair_factor=_bucket(pairs * 1.1, n),
        photon_factor=_bucket(n_ph * 1.1, n),
        query_factor=_bucket(n_q * 1.1, n),
    )

    run = lambda it: vcm.render_iteration_with_stats(scene, it, res, res,
                                                     **caps)

    # Warmup / compile (block via a tiny transfer: block_until_ready is not
    # reliable through this container's tunneled backend).
    fb, rays, overflow, _stats = run(1)
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
