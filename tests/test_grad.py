"""Gradient correctness: AD vs finite differences through pt / bpt / vcm."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from smallvcm_tpu import diff
from smallvcm_tpu.core.vec3 import V3
from smallvcm_tpu.scene.scene import SCENE_CONFIGS, load_cornell_box

RES = 32


@pytest.fixture(scope="module")
def scene():
    return load_cornell_box((RES, RES), SCENE_CONFIGS[1])


@pytest.fixture(scope="module")
def params(scene):
    return diff.extract_params(scene)


def _bump_x(v: V3, idx: int, eps: float) -> V3:
    x = np.asarray(v.x).copy()
    x[idx] += eps
    return V3(jnp.asarray(x), v.y, v.z)


def _mean_image(scene, params, alg, iters=2, **kw):
    img = jnp.zeros((RES, RES, 3), jnp.float32)
    for i in range(iters):
        img = img + diff.render_params(
            scene, params, i, alg, RES, RES, max_path_length=6, **kw
        )
    return img / iters


def _grad_finite(g):
    return all(
        np.isfinite(np.asarray(l)).all() for l in jax.tree_util.tree_leaves(g)
    )


class TestLightIntensityGradient:
    """The image is LINEAR in light intensity and intensity never affects
    sampling decisions => AD must equal FD essentially exactly (same seed)."""

    @pytest.mark.parametrize("alg", ["pt", "bpt", "vcm"])
    def test_ad_equals_fd(self, scene, params, alg):
        def loss(p):
            return jnp.mean(_mean_image(scene, p, alg))

        g = jax.grad(loss)(params)
        assert _grad_finite(g)
        g_int = float(np.asarray(g.light_intensity.x)[0])
        assert abs(g_int) > 0

        eps = 1e-2
        lp = params._replace(
            light_intensity=_bump_x(params.light_intensity, 0, eps)
        )
        lm = params._replace(
            light_intensity=_bump_x(params.light_intensity, 0, -eps)
        )
        fd = (float(loss(lp)) - float(loss(lm))) / (2 * eps)
        np.testing.assert_allclose(g_int, fd, rtol=2e-2, atol=1e-7)


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
        g_d = float(np.asarray(g.diffuse.x)[5])
        assert np.isfinite(g_d)
        assert g_d > 0  # brighter wall => brighter image

        eps = 5e-3
        pp = params._replace(diffuse=_bump_x(params.diffuse, 5, eps))
        pm = params._replace(diffuse=_bump_x(params.diffuse, 5, -eps))
        fd = (float(loss(pp)) - float(loss(pm))) / (2 * eps)
        assert abs(g_d - fd) / max(abs(fd), 1e-6) < 0.25, (g_d, fd)

    def test_gradient_through_merging_nonzero(self, scene, params):
        """BPM = pure merging: gradients must flow through the photon map."""

        def loss(p):
            img = diff.render_params(
                scene, p, 0, "bpm", RES, RES, max_path_length=6
            )
            return jnp.mean(img)

        g = jax.grad(loss)(params)
        assert abs(np.asarray(g.diffuse.x)).max() > 0
        assert abs(np.asarray(g.light_intensity.x)).max() > 0
        assert _grad_finite(g)

    def test_phong_exponent_gradient_finite(self, scene, params):
        def loss(p):
            return jnp.mean(_mean_image(scene, p, "pt"))

        g = jax.grad(loss)(params)
        assert np.isfinite(np.asarray(g.exponent)).all()


class TestInverseRenderingStep:
    def test_gradient_points_toward_target(self, scene, params):
        """The loss gradient at perturbed params points away from the true
        params (<grad, p0 - p_true> > 0) — the property an inverse-rendering
        optimizer needs, robust to the stochastic loss surface."""
        target = _mean_image(scene, params, "pt", iters=4)

        d = jax.tree_util.tree_map(
            lambda a: np.asarray(a).copy(), params.diffuse
        )
        for comp in (d.x, d.y, d.z):
            comp[5] = 0.4  # perturb back wall (true value ~0.804)
        p0 = params._replace(
            diffuse=V3(jnp.asarray(d.x), jnp.asarray(d.y), jnp.asarray(d.z))
        )

        _, g = diff.loss_and_grad(
            scene, p0, target, 0, "pt", RES, RES, n_iterations=3,
            max_path_length=6,
        )
        delta = jax.tree_util.tree_map(
            lambda a, b: np.asarray(a) - np.asarray(b), p0.diffuse,
            params.diffuse,
        )
        inner = sum(
            float((np.asarray(gc) * dc).sum())
            for gc, dc in zip(
                (g.diffuse.x, g.diffuse.y, g.diffuse.z),
                (delta.x, delta.y, delta.z),
            )
        )
        assert inner > 0
