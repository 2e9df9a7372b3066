"""Light sampling oracles: pdf reciprocity and energy checks."""

import numpy as np
import jax.numpy as jnp
import pytest

from smallvcm_tpu.core.vec3 import V3, from_array
from smallvcm_tpu.core.vecmath import INV_PI_F
from smallvcm_tpu.ops import lights as light_ops
from smallvcm_tpu.scene.scene import (
    SCENE_CONFIGS,
    LIGHT_AREA,
    load_cornell_box,
)


@pytest.fixture(scope="module")
def scenes():
    return {i: load_cornell_box((16, 16), c) for i, c in
            enumerate(SCENE_CONFIGS)}


def _rand2(n, seed):
    a = np.random.default_rng(seed).uniform(size=(2, n)).astype(np.float32)
    return jnp.asarray(a[0]), jnp.asarray(a[1])


class TestAreaLight:
    def test_illuminate_pdf_matches_area(self, scenes):
        scene = scenes[1]  # ceiling area lights
        n = 4096
        zeros = jnp.zeros((n,), jnp.float32)
        recv = V3(zeros, zeros, zeros)
        idx = jnp.zeros((n,), jnp.int32)
        u1, u2 = _rand2(n, 0)
        r = light_ops.illuminate(
            scene.lights, idx, scene.scene_sphere, recv, u1, u2
        )
        # directPdfW * cos / dist^2 == invArea (pdf conversion identity)
        inv_area = float(scene.lights.inv_area[0])
        pdf_a = np.asarray(
            r.direct_pdf_w * r.cos_at_light / (r.distance ** 2)
        )
        np.testing.assert_allclose(pdf_a, inv_area, rtol=1e-4)

    def test_emit_cosine_distribution(self, scenes):
        scene = scenes[1]
        n = 1 << 15
        idx = jnp.zeros((n,), jnp.int32)
        d1, d2 = _rand2(n, 1)
        p1, p2 = _rand2(n, 2)
        e = light_ops.emit(
            scene.lights, idx, scene.scene_sphere, d1, d2, p1, p2
        )
        # Energy = intensity * cos; E[cos] for cosine-sampled hemisphere = 2/3
        intensity = float(scene.lights.intensity.x[0])
        mean_cos = np.asarray(e.cos_theta_light).mean()
        assert abs(mean_cos - 2.0 / 3.0) < 0.01
        np.testing.assert_allclose(
            np.asarray(e.energy.x),
            intensity * np.asarray(e.cos_theta_light), rtol=1e-5,
        )
        # Positions on the light triangle plane (z = 1.26002)
        np.testing.assert_allclose(np.asarray(e.position.z), 1.26002,
                                   atol=1e-5)

    def test_get_radiance_one_sided(self, scenes):
        scene = scenes[1]
        n = 4
        idx = jnp.zeros((n,), jnp.int32)
        fz = scene.lights.frame_z
        normal = np.array([float(fz.x[0]), float(fz.y[0]), float(fz.z[0])])
        mk = lambda v: from_array(jnp.asarray(
            np.broadcast_to(v, (n, 3)).astype(np.float32)
        ))
        # The ceiling light emits along its normal; from the opposite side
        # radiance is zero.
        r_from_below = light_ops.get_radiance(
            scene.lights, idx, scene.scene_sphere, mk(-normal)
        )
        r_from_above = light_ops.get_radiance(
            scene.lights, idx, scene.scene_sphere, mk(normal)
        )
        assert np.asarray(r_from_below.radiance.to_array()).max() > 0
        assert np.asarray(r_from_above.radiance.to_array()).max() == 0


class TestDeltaLights:
    def test_point_light_energy_conservation(self, scenes):
        scene = scenes[2]  # point light (index 0 is the point light)
        # find the point light index
        kinds = np.asarray(scene.lights.kind)
        pt = int(np.nonzero(kinds == 2)[0][0])
        n = 1024
        idx = jnp.full((n,), pt, jnp.int32)
        d1, d2 = _rand2(n, 3)
        p1, p2 = _rand2(n, 4)
        e = light_ops.emit(
            scene.lights, idx, scene.scene_sphere, d1, d2, p1, p2
        )
        np.testing.assert_allclose(
            np.asarray(e.emission_pdf_w), INV_PI_F * 0.25, rtol=1e-6
        )
        assert bool(e.is_delta[0]) and bool(e.is_finite[0])

    def test_directional_emit_covers_scene_disc(self, scenes):
        scene = scenes[0]  # sun
        kinds = np.asarray(scene.lights.kind)
        d = int(np.nonzero(kinds == 1)[0][0])
        n = 4096
        idx = jnp.full((n,), d, jnp.int32)
        d1, d2 = _rand2(n, 5)
        p1, p2 = _rand2(n, 6)
        e = light_ops.emit(
            scene.lights, idx, scene.scene_sphere, d1, d2, p1, p2
        )
        center = np.asarray(scene.scene_sphere.center.to_array())
        radius = float(scene.scene_sphere.radius)
        dist = np.linalg.norm(
            np.asarray(e.position.to_array()) - center, axis=-1
        )
        assert (dist <= radius * np.sqrt(2.0) + 1e-4).all()
        # all directions identical (delta)
        assert np.asarray(e.direction.to_array()).std(axis=0).max() < 1e-4


class TestBackground:
    def test_background_radiance_constant(self, scenes):
        scene = scenes[3]
        bg = scene.background_idx
        assert bg >= 0
        n = 128
        idx = jnp.full((n,), bg, jnp.int32)
        g = np.random.default_rng(7).normal(size=(n, 3))
        dirs = from_array(jnp.asarray(
            g / np.linalg.norm(g, axis=-1, keepdims=True), jnp.float32
        ))
        r = light_ops.get_radiance(scene.lights, idx, scene.scene_sphere, dirs)
        expect = np.array([135, 206, 250]) / 255.0
        np.testing.assert_allclose(
            np.asarray(r.radiance.to_array()), expect[None].repeat(n, 0),
            rtol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(r.direct_pdf_a), INV_PI_F * 0.25, rtol=1e-6
        )
