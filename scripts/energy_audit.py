"""Energy audit: high-precision image-mean comparison vs the reference.

Round-3 verdict: pooling PARITY.md's 24 stochastic mean-z values gives
pooled z ~ -3.6 — our images are consistently ~0.05-0.15% darker than the
reference. This harness hunts that deficit:

* ours: one long run per algorithm (iterations are i.i.d. samples, and
  ``iteration`` is a traced arg, so any count costs zero extra compiles);
  per-block image means give both the grand mean and its standard error.
* reference: N seeds x 128-iteration runs of a /tmp copy patched to read
  SVCM_SEED (the binary has no seed flag, smallvcm.cxx:66-71); each run's
  image mean is one i.i.d. sample.
* compare with a two-sample z: (mean_ours - mean_ref) / sqrt(se^2+se^2).

Algorithm choice localizes the term: lt exercises ONLY the light-subpath
stage + connect-to-camera; pt ONLY the camera stage + NEE; bpm adds
merging, bpt adds vertex connections, vcm everything.

Usage:
  python scripts/energy_audit.py --scene 2 --algs lt pt --iters 1024
  python scripts/energy_audit.py --ref-dir /tmp/energy/ref  # analyze refs
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def run_ours(scene_id, alg, iters, res, block, seed, max_path_length=10):
    import jax.numpy as jnp

    from smallvcm_tpu.io.framebuffer import load_hdr, save_hdr
    from smallvcm_tpu.render import (RenderConfig, _make_block_runner,
                                     resolve_algorithm)
    from smallvcm_tpu.scene.scene import SCENE_CONFIGS, load_cornell_box

    scene = load_cornell_box((res, res), SCENE_CONFIGS[scene_id])
    cfg = RenderConfig(algorithm=alg, resolution=(res, res), base_seed=seed,
                       max_path_length=max_path_length)
    runner = _make_block_runner(scene, cfg, resolve_algorithm(scene, alg))

    means = []
    t0 = time.time()
    done = 0
    acc = None
    while done < iters:
        k = min(block, iters - done)
        img = runner(done, k)
        acc = img if acc is None else acc + img
        means.append(float(jnp.mean(img)) / k)
        done += k
    dt = time.time() - t0
    m = np.array(means)
    # mean_rgbe: the accumulated image passed through the SAME RGBE
    # encode/decode as the reference HDRs. The +0.5-quantum decode is
    # unbiased only for noisy pixels; near-constant bright pixels (a
    # directly-viewed light panel) decode up to +0.12% high, so raw-vs-
    # decoded comparisons manufacture a fake deficit (the round-3 verdict's
    # pooled -3.6 sigma). Compare mean_rgbe against reference HDR means.
    import tempfile
    with tempfile.NamedTemporaryFile(suffix=".hdr") as tf:
        save_hdr(np.asarray(acc) / iters, tf.name)
        mean_rgbe = float(load_hdr(tf.name).mean())
    return dict(
        alg=alg, scene=scene_id, iters=iters, block=block,
        mean=float(m.mean()), mean_rgbe=mean_rgbe,
        se=float(m.std(ddof=1) / np.sqrt(len(m))),
        sigma_block=float(m.std(ddof=1)), n_blocks=len(m), wall_s=dt,
    )


def analyze_ref(ref_dir, scene_id):
    from smallvcm_tpu.io.framebuffer import load_hdr

    out = {}
    for f in sorted(Path(ref_dir).glob(f"s{scene_id}_*.hdr")):
        alg = f.stem.split("_")[1]
        img = load_hdr(str(f))
        out.setdefault(alg, []).append(float(np.mean(img)))
    res = {}
    for alg, ms in out.items():
        m = np.array(ms)
        res[alg] = dict(
            alg=alg, n_runs=len(m), mean=float(m.mean()),
            se=float(m.std(ddof=1) / np.sqrt(len(m))) if len(m) > 1 else None,
        )
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", type=int, default=2)
    ap.add_argument("--algs", nargs="*",
                    default=["lt", "pt", "bpm", "bpt", "vcm"])
    ap.add_argument("--iters", type=int, default=1024)
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--block", type=int, default=8)
    ap.add_argument("--seed", type=int, default=1234)
    ap.add_argument("--max-path-length", type=int, default=10)
    ap.add_argument("--ref-dir", type=str, default=None,
                    help="only analyze reference HDRs in this dir")
    ap.add_argument("--out", type=str, default="/tmp/energy/ours.json")
    args = ap.parse_args()

    if args.ref_dir:
        res = analyze_ref(args.ref_dir, args.scene)
        print(json.dumps(res, indent=1))
        return

    results = []
    for alg in args.algs:
        r = run_ours(args.scene, alg, args.iters, args.res, args.block,
                     args.seed, args.max_path_length)
        results.append(r)
        print(json.dumps(r), flush=True)
        Path(args.out).parent.mkdir(parents=True, exist_ok=True)
        Path(args.out).write_text(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
