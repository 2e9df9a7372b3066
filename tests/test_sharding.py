"""Multi-device sharding: N-device render equals single-device render.

Strictly stronger than the reference, whose per-thread seeds change results
with thread count (smallvcm.cxx:61-72): our counter-based RNG keys off
global path ids, so any sharding reproduces the same estimate (up to psum
reduction order).

Compile cost dominates these tests on the virtual CPU mesh, so every VCM
assertion shares ONE 8-device program and ONE single-device program, both
routed through the production driver path (render_single_iteration), and
path lengths are kept short. 2-process (multi-controller) execution is
covered separately by test_multihost.py.
"""

import numpy as np
import jax
import pytest

from smallvcm_tpu.parallel.sharding import make_mesh, sharded_render_iteration
from smallvcm_tpu.render import RenderConfig, render_single_iteration
from smallvcm_tpu.scene.scene import SCENE_CONFIGS, load_cornell_box

pytestmark = pytest.mark.slow

RES = 32
MAXLEN = 4


@pytest.fixture(scope="module")
def scene():
    return load_cornell_box((RES, RES), SCENE_CONFIGS[1])


needs_8_devices = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _cfg(scene, alg, mesh=None):
    return RenderConfig(
        algorithm=alg, resolution=(RES, RES), max_path_length=MAXLEN,
        mesh=mesh,
    )


@pytest.fixture(scope="module")
def vcm_single(scene):
    return np.asarray(
        render_single_iteration(scene, _cfg(scene, "vcm"), 0)
    )


@pytest.fixture(scope="module")
def vcm_8dev(scene):
    return np.asarray(
        render_single_iteration(scene, _cfg(scene, "vcm", make_mesh(8)), 0)
    )


@needs_8_devices
class TestShardingInvariance:
    def test_vcm_8dev_matches_1dev(self, vcm_8dev, vcm_single):
        """One assertion covers both the invariance claim and the
        --devices driver path (the 8-dev render goes through
        RenderConfig.mesh like the CLI does)."""
        np.testing.assert_allclose(
            vcm_8dev, vcm_single, atol=1e-4, rtol=1e-4
        )

    def test_ring_exchange_matches_allgather(self, scene, vcm_single):
        """Ring ppermute photon exchange is exact: merging is additive over
        photons, so visiting shards one at a time equals the all-gather."""
        ring = np.asarray(sharded_render_iteration(
            make_mesh(8), scene, 0, RES, RES, max_path_length=MAXLEN,
            vm_exchange="ring",
        ))
        np.testing.assert_allclose(ring, vcm_single, atol=1e-4, rtol=1e-4)

    def test_lt_sharded(self, scene):
        img8 = np.asarray(render_single_iteration(
            scene, _cfg(scene, "lt", make_mesh(8)), 0
        ))
        img1 = np.asarray(render_single_iteration(
            scene, _cfg(scene, "lt"), 0
        ))
        np.testing.assert_allclose(img8, img1, atol=1e-4, rtol=1e-4)

    def test_el_sharded(self, scene):
        img8 = np.asarray(render_single_iteration(
            scene, _cfg(scene, "el", make_mesh(8)), 0
        ))
        img1 = np.asarray(render_single_iteration(
            scene, _cfg(scene, "el"), 0
        ))
        np.testing.assert_allclose(img8, img1, atol=1e-4, rtol=1e-4)


@needs_8_devices
def test_gradient_through_sharded_render(scene):
    """Parameter gradients flow through shard_map (psum has a transpose
    rule): 8-device grad == single-device grad. Uses the path-traced
    program — the smallest one that still spans the scene-parameter
    pytree, the sharded wavefront, and the framebuffer psum."""
    import jax.numpy as jnp

    from smallvcm_tpu import diff
    from smallvcm_tpu.parallel.sharding import sharded_simple_iteration

    from smallvcm_tpu.algorithms import pathtracer

    params = diff.extract_params(scene)
    mesh = make_mesh(8)

    def loss_sharded(p):
        s = diff.apply_params(scene, p)
        img = sharded_simple_iteration(
            mesh, "pt", s, 0, RES, RES, max_path_length=3,
        )
        return jnp.mean(img)

    def loss_single(p):
        s = diff.apply_params(scene, p)
        img = pathtracer.render_iteration(
            s, 0, RES, RES, 1234, 3, 0
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
@pytest.mark.parametrize("exchange", ["allgather", "ring"])
def test_gradient_through_sharded_vcm_merge(scene, exchange):
    """8-device grad == 1-device grad through the FULL sharded VCM
    pipeline with merging on (use_vm=True): the backward pass crosses the
    light-vertex all-gather (or ring ppermute) and the framebuffer psum —
    the 'psum (framebuffer, grads)' half of SURVEY §2's comm design that
    test_gradient_through_sharded_render (pt) does not reach."""
    import jax.numpy as jnp

    from smallvcm_tpu import diff
    from smallvcm_tpu.algorithms import vcm

    params = diff.extract_params(scene)
    mesh = make_mesh(8)
    target = jnp.zeros((RES, RES, 3), jnp.float32)

    _, g8 = diff.sharded_loss_and_grad(
        mesh, scene, params, target, 0, "vcm", RES, RES,
        vm_exchange=exchange, max_path_length=3,
    )

    def loss_single(p):
        s = diff.apply_params(scene, p)
        img = vcm.render_iteration(
            s, 0, RES, RES, max_path_length=3,
            use_vc=True, use_vm=True,
        )
        return jnp.mean(img ** 2)

    g1 = jax.grad(loss_single)(params)
    for a, b in zip(jax.tree_util.tree_leaves(g8),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-5
        )


@needs_8_devices
def test_cli_devices_flag(tmp_path, monkeypatch):
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
