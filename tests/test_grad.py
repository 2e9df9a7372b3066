"""Gradient correctness: AD vs finite differences through pt / bpt / vcm."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from smallvcm_tpu import diff
from smallvcm_tpu.scene.scene import SCENE_CONFIGS, load_cornell_box

RES = 32


@pytest.fixture(scope="module")
def scene():
    return load_cornell_box((RES, RES), SCENE_CONFIGS[1])


@pytest.fixture(scope="module")
def params(scene):
    return diff.extract_params(scene)


def _mean_image(scene, params, alg, iters=2, **kw):
    img = jnp.zeros((RES, RES, 3), jnp.float32)
    for i in range(iters):
        img = img + diff.render_params(
            scene, params, i, alg, RES, RES, max_path_length=6, merge_k=8,
            **kw,
        )
    return img / iters


class TestLightIntensityGradient:
    """The image is LINEAR in light intensity and intensity never affects
    sampling decisions => AD must equal FD essentially exactly (same seed)."""

    @pytest.mark.parametrize("alg", ["pt", "bpt", "vcm"])
    def test_ad_equals_fd(self, scene, params, alg):
        def loss(p):
            return jnp.mean(_mean_image(scene, p, alg))

        g = jax.grad(loss)(params)
        g_int = np.asarray(g.light_intensity)
        assert np.isfinite(g_int).all()
        assert np.abs(g_int).max() > 0

        eps = 1e-2
        li = np.asarray(params.light_intensity)
        bump = np.zeros_like(li)
        bump[0, 0] = eps
        lp = params._replace(light_intensity=jnp.asarray(li + bump))
        lm = params._replace(light_intensity=jnp.asarray(li - bump))
        fd = (float(loss(lp)) - float(loss(lm))) / (2 * eps)
        np.testing.assert_allclose(g_int[0, 0], fd, rtol=2e-2, atol=1e-7)


class TestReflectanceGradient:
    @pytest.mark.parametrize("alg", ["pt", "vcm"])
    def test_diffuse_wall_gradient_vs_fd(self, scene, params, alg):
        """Back-wall diffuse reflectance: AD vs central FD with common random
        numbers. Both are unbiased estimators of the same derivative; with
        matched seeds the FD noise comes only from decision flips, so a
        moderate tolerance suffices."""

        def loss(p):
            return jnp.mean(_mean_image(scene, p, alg, iters=3))

        g = jax.grad(loss)(params)
        g_d = float(np.asarray(g.diffuse)[5, 0])
        assert np.isfinite(g_d)
        assert g_d > 0  # brighter wall => brighter image

        eps = 5e-3
        d = np.asarray(params.diffuse)
        bump = np.zeros_like(d)
        bump[5, 0] = eps
        pp = params._replace(diffuse=jnp.asarray(d + bump))
        pm = params._replace(diffuse=jnp.asarray(d - bump))
        fd = (float(loss(pp)) - float(loss(pm))) / (2 * eps)
        assert abs(g_d - fd) / max(abs(fd), 1e-6) < 0.25, (g_d, fd)

    def test_gradient_through_merging_nonzero(self, scene, params):
        """BPM = pure merging: gradients must flow through the photon map."""

        def loss(p):
            img = diff.render_params(
                scene, p, 0, "bpm", RES, RES, max_path_length=6, merge_k=8
            )
            return jnp.mean(img)

        g = jax.grad(loss)(params)
        assert np.abs(np.asarray(g.diffuse)).max() > 0
        assert np.abs(np.asarray(g.light_intensity)).max() > 0
        for leaf in jax.tree_util.tree_leaves(g):
            assert np.isfinite(np.asarray(leaf)).all()

    def test_phong_exponent_gradient_finite(self, scene, params):
        def loss(p):
            return jnp.mean(_mean_image(scene, p, "pt"))

        g = jax.grad(loss)(params)
        assert np.isfinite(np.asarray(g.exponent)).all()


class TestInverseRenderingStep:
    def test_gradient_descent_reduces_loss(self, scene, params):
        """One SGD step on a perturbed diffuse color moves toward target."""
        target = _mean_image(scene, params, "pt", iters=4)

        d = np.asarray(params.diffuse).copy()
        d[5] = [0.4, 0.4, 0.4]  # perturb back wall
        p0 = params._replace(diffuse=jnp.asarray(d))

        loss0, g = diff.loss_and_grad(
            scene, p0, target, 0, "pt", RES, RES, n_iterations=2,
            max_path_length=6,
        )
        lr = 0.5 / (np.abs(np.asarray(g.diffuse)).max() + 1e-9)
        p1 = p0._replace(diffuse=p0.diffuse - lr * g.diffuse)
        loss1, _ = diff.loss_and_grad(
            scene, p1, target, 0, "pt", RES, RES, n_iterations=2,
            max_path_length=6,
        )
        assert float(loss1) < float(loss0)
