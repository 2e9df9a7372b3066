"""Stage-level timing of a VCM iteration on the real TPU.

Splits the iteration into the trace (light+camera stages) and merge
executables that the pallas driver already uses, times each, and prints the
measured merge workload (candidate pairs / live photons / live queries) so
cap factors and bench.py settings can be chosen from data.

Usage: python scripts/profile_vcm.py [res] [pair_factor] [iters]
"""

import sys
import time

import jax
import jax.numpy as jnp

from smallvcm_tpu.scene.scene import SCENE_CONFIGS, load_cornell_box
from smallvcm_tpu.algorithms import vcm


def sync(x):
    jax.tree.map(
        lambda a: a.block_until_ready() if hasattr(a, "block_until_ready")
        else a, x)
    # block_until_ready is unreliable through the tunneled backend; force a
    # tiny device->host transfer off the first leaf.
    leaves = [a for a in jax.tree.leaves(x) if hasattr(a, "shape")]
    if leaves:
        float(jnp.sum(leaves[0].ravel()[:1]))


def bench(label, fn, iters=4):
    sync(fn(0))  # compile
    t0 = time.time()
    for it in range(1, iters + 1):
        out = fn(it)
    sync(out)
    dt = (time.time() - t0) / iters
    print(f"{label:34s} {dt * 1e3:8.1f} ms/iter")
    return out, dt


def main():
    res = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    pair_factor = float(sys.argv[2]) if len(sys.argv) > 2 else 32.0
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    scene = load_cornell_box((res, res), SCENE_CONFIGS[0])
    print(f"backend={jax.default_backend()} res={res} "
          f"pair_factor={pair_factor}")

    # Whole iteration (the bench.py configuration).
    _, t_full = bench(
        "full vcm iteration",
        lambda it: vcm.render_iteration_with_stats(
            scene, it, res, res, pair_factor=pair_factor),
        iters,
    )

    # Trace-only executable (light + camera stages, no merge).
    traced, t_trace = bench(
        "trace (light+camera stages)",
        lambda it: vcm.trace_iteration(scene, it, res, res),
        iters,
    )

    # Merge-only executable over a fixed traced result.
    (_, _, overflow, stats), t_merge = bench(
        "merge stage (xla)",
        lambda it: vcm.merge_finish_iteration(
            scene, it, traced, res, res, pair_factor=pair_factor,
            merge_backend="xla"),
        iters,
    )
    pairs, n_ph, n_q = (int(v) for v in stats)
    n = res * res
    print(f"\nmerge stats: candidate_pairs={pairs} ({pairs / n:.1f}/path)  "
          f"photons={n_ph} ({n_ph / n:.2f}/path)  "
          f"queries={n_q} ({n_q / n:.2f}/path)  overflow={int(overflow)}")
    print(f"pair cap in use: {int(pair_factor * n)} "
          f"({pair_factor:.0f}/path) -> occupancy "
          f"{pairs / (pair_factor * n):.2f}")
    print(f"\nsplit: trace {t_trace * 1e3:.0f} ms + merge {t_merge * 1e3:.0f}"
          f" ms = {(t_trace + t_merge) * 1e3:.0f} ms "
          f"(full single-exe: {t_full * 1e3:.0f} ms)")

    # bpt for reference: the no-merge family member.
    bench(
        "bpt iteration (no merge)",
        lambda it: vcm.render_iteration(
            scene, it, res, res, use_vm=False),
        iters,
    )


if __name__ == "__main__":
    main()
