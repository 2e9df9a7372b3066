"""Multi-host execution: 2 jax.distributed processes == 1 process.

The reference is single-process shared-memory only (smallvcm.cxx:61-142);
our multi-host path (parallel/multihost.py) must produce the bit-identical
image when the same global mesh is split across 2 coordinated processes.
This runs entirely on CPU: each subprocess exposes 4 virtual devices, the
2-process global mesh has 8, and the coordinator compares against the
single-process 8-device render.
"""

import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow

_WORKER = Path(__file__).with_name("_multihost_worker.py")
_PORT = 12765


@pytest.mark.skipif(sys.platform != "linux", reason="linux-only harness")
def test_two_process_render_matches_single(tmp_path):
    """Launch 2 jax.distributed processes rendering one sharded iteration;
    process 0 writes the psum'd image. Compare to the in-process 8-device
    render (the suite's own virtual mesh)."""
    procs = []
    env_base = {
        k: v for k, v in os.environ.items()
        if not k.startswith(("JAX_", "XLA_"))
    }
    for pid in range(2):
        env = dict(
            env_base,
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=4",
            # share the suite's persistent compile cache across reruns
            JAX_COMPILATION_CACHE_DIR=os.environ.get(
                "JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"),
            JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES="-1",
            JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="0",
            SMALLVCM_MH_COORD=f"localhost:{_PORT}",
            SMALLVCM_MH_NPROC="2",
            SMALLVCM_MH_PID=str(pid),
            SMALLVCM_MH_OUT=str(tmp_path / "mh.npy"),
            PYTHONPATH=str(Path(__file__).resolve().parent.parent),
        )
        procs.append(subprocess.Popen(
            [sys.executable, str(_WORKER)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        ))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}"

    img_mh = np.load(tmp_path / "mh.npy")

    from smallvcm_tpu.algorithms import vcm
    from smallvcm_tpu.parallel.sharding import (
        make_mesh, sharded_render_iteration,
    )
    from smallvcm_tpu.scene.scene import SCENE_CONFIGS, load_cornell_box

    res = 16
    scene = load_cornell_box((res, res), SCENE_CONFIGS[1])
    img8 = np.asarray(sharded_render_iteration(
        mesh=make_mesh(8), scene=scene, iteration=0, res_x=res, res_y=res,
        max_path_length=3,
    ))
    img1 = np.asarray(vcm.render_iteration(
        scene, 0, res, res, max_path_length=3
    ))
    # 2-process mesh == in-process 8-device mesh == single device.
    np.testing.assert_allclose(img_mh, img8, atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(img_mh, img1, atol=1e-4, rtol=1e-4)
