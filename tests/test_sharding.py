"""Multi-device sharding: N-device render equals single-device render.

Strictly stronger than the reference, whose per-thread seeds change results
with thread count (smallvcm.cxx:61-72): our counter-based RNG keys off
global path ids, so any sharding reproduces the same estimate (up to psum
reduction order).
"""

import numpy as np
import jax
import pytest

from smallvcm_tpu.algorithms import vcm
from smallvcm_tpu.parallel.sharding import make_mesh, sharded_render_iteration
from smallvcm_tpu.scene.scene import SCENE_CONFIGS, load_cornell_box

RES = 32


@pytest.fixture(scope="module")
def scene():
    return load_cornell_box((RES, RES), SCENE_CONFIGS[1])


needs_8_devices = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@needs_8_devices
class TestShardingInvariance:
    def test_vcm_8dev_matches_1dev(self, scene):
        mesh = make_mesh(8)
        img8 = np.asarray(
            sharded_render_iteration(mesh, scene, 0, RES, RES)
        )
        img1 = np.asarray(vcm.render_iteration(scene, 0, RES, RES))
        # psum reduction order may differ; estimates are identical otherwise
        np.testing.assert_allclose(img8, img1, atol=1e-4, rtol=1e-4)

    def test_2dev_matches_1dev(self, scene):
        mesh = make_mesh(2)
        img2 = np.asarray(
            sharded_render_iteration(mesh, scene, 0, RES, RES)
        )
        img1 = np.asarray(vcm.render_iteration(scene, 0, RES, RES))
        np.testing.assert_allclose(img2, img1, atol=1e-4, rtol=1e-4)

    def test_ring_exchange_matches_allgather(self, scene):
        """Ring ppermute photon exchange is exact: merging is additive over
        photons, so visiting shards one at a time equals the all-gather."""
        mesh = make_mesh(8)
        ring = np.asarray(
            sharded_render_iteration(mesh, scene, 0, RES, RES,
                                     vm_exchange="ring")
        )
        img1 = np.asarray(vcm.render_iteration(scene, 0, RES, RES))
        np.testing.assert_allclose(ring, img1, atol=1e-4, rtol=1e-4)

    def test_lt_sharded(self, scene):
        mesh = make_mesh(8)
        img8 = np.asarray(
            sharded_render_iteration(
                mesh, scene, 0, RES, RES,
                use_vc=False, use_vm=False, light_trace_only=True,
            )
        )
        img1 = np.asarray(
            vcm.render_iteration(
                scene, 0, RES, RES,
                use_vc=False, use_vm=False, light_trace_only=True,
            )
        )
        np.testing.assert_allclose(img8, img1, atol=1e-4, rtol=1e-4)


@needs_8_devices
def test_gradient_through_sharded_render(scene):
    """Parameter gradients flow through shard_map (all-gather + psum have
    transpose rules): 8-device grad == single-device grad."""
    import jax.numpy as jnp

    from smallvcm_tpu import diff

    params = diff.extract_params(scene)
    mesh = make_mesh(8)

    def loss_sharded(p):
        s = diff.apply_params(scene, p)
        img = sharded_render_iteration(
            mesh, s, 0, RES, RES, max_path_length=4,
            use_vc=True, use_vm=False,
        )
        return jnp.mean(img)

    def loss_single(p):
        s = diff.apply_params(scene, p)
        img = vcm.render_iteration(
            s, 0, RES, RES, max_path_length=4, use_vc=True, use_vm=False
        )
        return jnp.mean(img)

    g8 = jax.grad(loss_sharded)(params)
    g1 = jax.grad(loss_single)(params)
    for a, b in zip(jax.tree_util.tree_leaves(g8),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5
        )


@needs_8_devices
class TestMeshDriver:
    """The --devices CLI path: RenderConfig.mesh routes every algorithm
    through the sharded implementations and must reproduce the
    single-device images."""

    @pytest.mark.parametrize("alg", ["el", "pt", "bpt", "vcm"])
    def test_mesh_config_matches_single_device(self, scene, alg):
        from smallvcm_tpu.render import RenderConfig, render_single_iteration

        base = dict(
            algorithm=alg, resolution=(RES, RES), max_path_length=4,
        )
        img1 = np.asarray(
            render_single_iteration(scene, RenderConfig(**base), 0)
        )
        img8 = np.asarray(
            render_single_iteration(
                scene, RenderConfig(**base, mesh=make_mesh(8)), 0
            )
        )
        np.testing.assert_allclose(img8, img1, atol=1e-4, rtol=1e-4)

    def test_cli_devices_flag(self, tmp_path, monkeypatch):
        from smallvcm_tpu.cli import main

        monkeypatch.chdir(tmp_path)
        rc = main([
            "-s", "1", "-a", "pt", "-i", "2", "--resolution", "32", "32",
            "--devices", "8", "-o", "mesh_pt.bmp",
        ])
        assert rc == 0
        assert (tmp_path / "mesh_pt.bmp").exists()


def test_graft_dryrun_multichip():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    n = min(len(jax.devices()), 8)
    if n < 2:
        pytest.skip("needs >=2 devices")
    ge.dryrun_multichip(n)
