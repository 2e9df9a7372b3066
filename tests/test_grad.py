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

    @pytest.mark.parametrize("alg", [
        "pt",
        pytest.param("bpt", marks=pytest.mark.slow),
        pytest.param("vcm", marks=pytest.mark.slow),
    ])
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


class TestFurnaceGradientOracle:
    def test_furnace_gradient_unbiased(self, scene):
        """Rigorous estimator-gradient oracle with a known true derivative.

        One-bounce 'white furnace' estimator w = f_x * cos / pdf / cont on
        the glossy-floor material with Russian roulette: E[w] is the
        upper-hemisphere x-albedo, whose derivative w.r.t. the diffuse
        x-reflectance is exactly 1. The detached-probability construction
        must reproduce it; keeping probabilities live under AD measures
        ~0.62 here (missing decision-boundary compensation)."""
        import jax.numpy as jnp
        from smallvcm_tpu.core import rng
        from smallvcm_tpu.ops import bsdf as bsdf_ops
        from smallvcm_tpu.scene.scene import Materials

        n = 1 << 17
        ids = jnp.arange(n, dtype=jnp.uint32)
        u = rng.uniform_slots(4242, 0, ids, 4)
        zeros = jnp.zeros((n,), jnp.float32)
        normal = V3(zeros, zeros, jnp.ones((n,), jnp.float32))
        g = np.random.default_rng(0)
        d = g.normal(size=(n, 3))
        d[:, 2] = -np.abs(d[:, 2]) - 0.05
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        ray_dir = V3(*(jnp.asarray(d[:, i].astype(np.float32))
                       for i in range(3)))
        mat = jnp.full((n,), 2, jnp.int32)
        hit = jnp.ones((n,), bool)

        def furnace(dx):
            mats = scene.materials
            diffuse = V3(mats.diffuse.x.at[2].set(dx), mats.diffuse.y,
                         mats.diffuse.z)
            m2 = Materials(diffuse=diffuse, phong=mats.phong,
                           exponent=mats.exponent, mirror=mats.mirror,
                           ior=mats.ior)
            b = bsdf_ops.setup(m2, ray_dir, normal, mat, hit)
            value, _, pdf, cosg, _, keep = bsdf_ops.sample(
                m2, b, u[:, 0], u[:, 1], u[:, 2], fix_is_light=False
            )
            cont = b.cont_prob
            surv = (u[:, 3] <= cont) & keep
            w = jnp.where(
                surv,
                value.x * cosg / jnp.where(pdf == 0, 1, pdf)
                / jnp.where(cont == 0, 1, cont),
                0.0,
            )
            return jnp.mean(w)

        grad = float(jax.grad(furnace)(0.1))
        assert abs(grad - 1.0) < 0.03, grad


class TestInverseRenderingStep:
    def test_gradient_points_toward_target(self, scene, params):
        """The loss gradient at perturbed params points away from the true
        params (<grad, p0 - p_true> > 0) — the property an inverse-rendering
        optimizer needs, robust to the stochastic loss surface."""
        target = _mean_image(scene, params, "pt", iters=4)

        d = jax.tree_util.tree_map(
            lambda a: np.asarray(a).copy(), params.diffuse
        )
        # Perturb the directly visible red right wall (mat 4, large screen
        # area -> strong, low-variance loss signal).
        for comp in (d.x, d.y, d.z):
            comp[4] = 0.4
        p0 = params._replace(
            diffuse=V3(jnp.asarray(d.x), jnp.asarray(d.y), jnp.asarray(d.z))
        )

        _, g = diff.loss_and_grad(
            scene, p0, target, 0, "pt", RES, RES, n_iterations=8,
            max_path_length=6,
        )
        delta = jax.tree_util.tree_map(
            lambda a, b: np.asarray(a) - np.asarray(b), p0.diffuse,
            params.diffuse,
        )  # nonzero only at material 4
        inner = sum(
            float((np.asarray(gc) * dc).sum())
            for gc, dc in zip(
                (g.diffuse.x, g.diffuse.y, g.diffuse.z),
                (delta.x, delta.y, delta.z),
            )
        )
        assert inner > 0
