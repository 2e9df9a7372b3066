"""Quick on-chip equivalence check: fused pallas merge vs XLA merge.

Renders a few VCM/ppm/bpm iterations at a small resolution on the real
TPU through render_block_with_stats with both merge backends and
compares images (the two backends differ only by float association in
the pair accumulation, so agreement must be ~1e-5 relative).

Usage: python scripts/check_pallas_tpu.py [res] [iters]
"""

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np
import jax

from smallvcm_tpu.scene.scene import SCENE_CONFIGS, load_cornell_box
from smallvcm_tpu.algorithms import vcm


def main():
    res = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    print("backend:", jax.default_backend(), flush=True)
    worst = 0.0
    for scene_id in (0, 1):
        scene = load_cornell_box((res, res), SCENE_CONFIGS[scene_id])
        for alg_kw in (
            dict(use_vc=True, use_vm=True, ppm=False),   # vcm
            dict(use_vc=False, use_vm=True, ppm=True),   # ppm
            dict(use_vc=False, use_vm=True, ppm=False),  # bpm
        ):
            imgs = {}
            for backend in ("xla", "pallas"):
                img, _, ovf, _, _ = vcm.render_block_with_stats(
                    scene, 1, res, res, iters,
                    pair_factor=24.0, photon_factor=3.0, query_factor=3.0,
                    merge_backend=backend, **alg_kw,
                )
                assert int(ovf) == 0, (backend, alg_kw)
                imgs[backend] = np.asarray(img)
            a, b = imgs["xla"], imgs["pallas"]
            denom = np.maximum(np.abs(a), 1e-3)
            rel = float(np.max(np.abs(a - b) / denom))
            worst = max(worst, rel)
            name = ("ppm" if alg_kw["ppm"] else
                    ("vcm" if alg_kw["use_vc"] else "bpm"))
            print(f"scene {scene_id} {name}: max rel diff {rel:.2e}",
                  flush=True)
    if worst > 2e-4:
        print("FAIL", worst)
        sys.exit(1)
    print("OK", worst)


if __name__ == "__main__":
    main()
