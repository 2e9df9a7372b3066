"""Worker process for tests/test_multihost.py: one of N coordinated
jax.distributed processes rendering a sharded VCM iteration on the global
CPU mesh. Process 0 saves the (psum-replicated) image to SMALLVCM_MH_OUT.
"""

import os
import sys

import numpy as np


def main() -> int:
    coord = os.environ["SMALLVCM_MH_COORD"]
    nproc = int(os.environ["SMALLVCM_MH_NPROC"])
    pid = int(os.environ["SMALLVCM_MH_PID"])
    out = os.environ["SMALLVCM_MH_OUT"]

    import jax

    jax.config.update("jax_platforms", "cpu")

    from smallvcm_tpu.parallel import multihost

    multihost.initialize(
        coordinator_address=coord, num_processes=nproc, process_id=pid
    )
    assert jax.process_count() == nproc, jax.process_count()

    from smallvcm_tpu.parallel.sharding import sharded_render_iteration
    from smallvcm_tpu.scene.scene import SCENE_CONFIGS, load_cornell_box

    res = 16
    scene = load_cornell_box((res, res), SCENE_CONFIGS[1])
    mesh = multihost.global_mesh()
    img = sharded_render_iteration(
        mesh=mesh, scene=scene, iteration=0, res_x=res, res_y=res,
        max_path_length=3,
    )
    # The output is replicated; materialize the full array on this host.
    img = np.asarray(jax.device_get(img))
    if multihost.is_coordinator():
        np.save(out, img)
    return 0


if __name__ == "__main__":
    sys.exit(main())
