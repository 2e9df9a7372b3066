"""Scaling-efficiency benchmark: 1 -> N devices on the 'paths' mesh axis.

On real multi-chip hardware this measures wall-clock per iteration at each
device count (the north-star metric is >=85% efficiency 1 chip -> N).
This container exposes one physical TPU, so by default the script runs on a
virtual CPU mesh — which validates the sharded program end-to-end and the
per-device work split, but NOT real ICI bandwidth. Run on a pod slice for
real numbers.

Usage:
  python scripts/scaling_bench.py [--res 256] [--devices 1 2 4 8] [--cpu]
"""

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--devices", type=int, nargs="*", default=[1, 2, 4, 8])
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--cpu", action="store_true",
                    help="force the virtual CPU mesh")
    args = ap.parse_args()

    if args.cpu:
        os.environ.setdefault(
            "XLA_FLAGS", "--xla_force_host_platform_device_count=8"
        )
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        import jax

        if len(jax.devices()) < max(args.devices):
            print(f"only {len(jax.devices())} real device(s); pass --cpu "
                  "for the virtual mesh or run on a pod slice")

    import jax.numpy as jnp

    from smallvcm_tpu.parallel.sharding import make_mesh, sharded_render_iteration
    from smallvcm_tpu.scene.scene import SCENE_CONFIGS, load_cornell_box

    n_avail = len(jax.devices())
    res = args.res
    scene = load_cornell_box((res, res), SCENE_CONFIGS[0])

    results = {}
    for nd in args.devices:
        if nd > n_avail:
            print(f"skip {nd} devices (only {n_avail} available)")
            continue
        mesh = make_mesh(nd)
        run = lambda it: sharded_render_iteration(
            mesh, scene, it, res, res, max_path_length=6
        )
        fb = run(0)
        float(jnp.sum(fb))  # compile + settle
        t0 = time.time()
        for it in range(1, args.iters + 1):
            float(jnp.sum(run(it)))
        dt = (time.time() - t0) / args.iters
        results[nd] = dt
        base = results.get(1, dt)
        eff = base / (dt * nd) if 1 in results else float("nan")
        print(f"{nd} device(s): {dt * 1000:.0f} ms/iter  "
              f"efficiency vs 1: {eff * 100:.0f}%", flush=True)


if __name__ == "__main__":
    main()
