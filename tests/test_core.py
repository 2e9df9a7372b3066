"""Unit tests for core math, samplers, and the counter-based RNG."""

import numpy as np
import jax.numpy as jnp
import pytest

from smallvcm_tpu.core import rng
from smallvcm_tpu.core import vecmath as vm
from smallvcm_tpu.core.vec3 import V3, cross, dot, from_array, len_sqr, normalize


def _rand_v3(n, seed):
    a = np.random.default_rng(seed).normal(size=(n, 3)).astype(np.float32)
    return from_array(jnp.asarray(a))


def _u(n, seed, cols=2):
    a = np.random.default_rng(seed).uniform(size=(cols, n)).astype(np.float32)
    return [jnp.asarray(a[i]) for i in range(cols)]


class TestVec3:
    def test_ops(self):
        a = _rand_v3(64, 0)
        b = _rand_v3(64, 1)
        np.testing.assert_allclose(
            np.asarray(dot(a, b)),
            np.sum(np.asarray(a.to_array()) * np.asarray(b.to_array()), -1),
            rtol=1e-5, atol=1e-6,
        )
        c = cross(a, b)
        np.testing.assert_allclose(
            np.asarray(c.to_array()),
            np.cross(np.asarray(a.to_array()), np.asarray(b.to_array())),
            atol=1e-5,
        )

    def test_normalize(self):
        a = _rand_v3(64, 2)
        n = normalize(a)
        np.testing.assert_allclose(np.asarray(len_sqr(n)), 1.0, atol=1e-5)


class TestFrame:
    def test_orthonormal(self):
        z = _rand_v3(128, 0)
        fx, fy, fz = vm.frame_set_from_z(z)
        np.testing.assert_allclose(np.asarray(dot(fx, fy)), 0.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(dot(fy, fz)), 0.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(dot(fx, fx)), 1.0, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(cross(fx, fy).to_array()), np.asarray(fz.to_array()),
            atol=1e-5,
        )

    def test_roundtrip(self):
        z = _rand_v3(64, 1)
        v = _rand_v3(64, 2)
        fx, fy, fz = vm.frame_set_from_z(z)
        local = vm.frame_to_local(fx, fy, fz, v)
        world = vm.frame_to_world(fx, fy, fz, local)
        np.testing.assert_allclose(
            np.asarray(world.to_array()), np.asarray(v.to_array()), atol=1e-4
        )

    def test_degenerate_x_axis(self):
        # |z.x| > 0.99 branch (frame.hxx:56)
        fx, fy, fz = vm.frame_set_from_z(
            from_array(jnp.asarray([[1.0, 0.0, 0.0]]))
        )
        assert np.isfinite(np.asarray(fx.to_array())).all()
        np.testing.assert_allclose(np.asarray(dot(fx, fz)), 0.0, atol=1e-6)


class TestSamplers:
    def test_cos_hemisphere_pdf_consistency(self):
        u1, u2 = _u(4096, 2)
        d, pdf = vm.sample_cos_hemisphere_w(u1, u2)
        np.testing.assert_allclose(np.asarray(len_sqr(d)), 1.0, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(pdf), np.asarray(d.z) / np.pi, atol=1e-5
        )

    def test_power_cos_matches_pdf_fn(self):
        u1, u2 = _u(4096, 3)
        d, pdf = vm.sample_power_cos_hemisphere_w(u1, u2, 90.0)
        z = from_array(jnp.asarray([[0.0, 0.0, 1.0]]))
        pdf2 = vm.power_cos_hemisphere_pdf_w(z, d, 90.0)
        np.testing.assert_allclose(
            np.asarray(pdf), np.asarray(pdf2), rtol=2e-2, atol=1e-4
        )

    def test_uniform_sphere_mean_zero(self):
        u1, u2 = _u(200000, 4)
        d, pdf = vm.sample_uniform_sphere_w(u1, u2)
        assert abs(np.asarray(d.to_array()).mean(axis=0)).max() < 0.01
        np.testing.assert_allclose(np.asarray(pdf), 1.0 / (4 * np.pi),
                                   atol=1e-6)

    def test_concentric_disc_in_unit_disc(self):
        u1, u2 = _u(65536, 5)
        dx, dy = vm.sample_concentric_disc(u1, u2)
        r2 = np.asarray(dx) ** 2 + np.asarray(dy) ** 2
        assert r2.max() <= 1.0 + 1e-5
        assert abs(r2.mean() - 0.5) < 0.01  # area-uniform

    def test_triangle_barycentric(self):
        u1, u2 = _u(65536, 6)
        a, b = vm.sample_uniform_triangle(u1, u2)
        s = np.asarray(a) + np.asarray(b)
        assert (s <= 1.0 + 1e-5).all()
        assert (np.asarray(a) >= 0).all() and (np.asarray(b) >= 0).all()

    def test_fresnel_limits(self):
        # ior < 0 => always 1 (utils.hxx:47-48)
        f = vm.fresnel_dielectric(jnp.asarray([0.5]), jnp.asarray([-1.0]))
        np.testing.assert_allclose(np.asarray(f), 1.0)
        # normal incidence on glass 1.6: ((1.6-1)/(1.6+1))^2
        f = vm.fresnel_dielectric(jnp.asarray([1.0]), jnp.asarray([1.6]))
        np.testing.assert_allclose(np.asarray(f), ((0.6 / 2.6) ** 2),
                                   atol=1e-5)
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

    def test_counter_prf(self):
        ours = rng.threefry2x32(
            jnp.uint32(1), jnp.uint32(2), jnp.uint32(0), jnp.uint32(1)
        )
        other = rng.threefry2x32(
            jnp.uint32(1), jnp.uint32(2), jnp.uint32(1), jnp.uint32(1)
        )
        assert int(ours[0]) != int(other[0])

    def test_tea_generator_uniforms(self):
        """The TEA alternative (the reference's LEGACY_RNG mixing function,
        rng.hxx:90-122) produces well-distributed, stream-keyed uniforms."""
        ids = jnp.arange(100000, dtype=jnp.uint32)
        a = np.asarray(rng.uniform_slots(1234, 1, ids, 2, "tea"))
        b = np.asarray(rng.uniform_slots(1234, 2, ids, 2, "tea"))
        t = np.asarray(rng.uniform_slots(1234, 1, ids, 2, "threefry"))
        assert (a >= 0).all() and (a < 1).all()
        assert abs(a.mean() - 0.5) < 0.005
        assert abs(np.corrcoef(a[:, 0], b[:, 0])[0, 1]) < 0.01
        assert not np.array_equal(a, t)  # distinct generators

    def test_tea_matches_reference_algorithm(self):
        """Bit-exact check against a compiled C harness of the 6-round TEA
        mixing the reference uses (rng.hxx:102-115): seeding the harness with
        our folded initial state must give our output words."""
        import shutil
        import subprocess
        import tempfile
        from pathlib import Path

        if shutil.which("gcc") is None and shutil.which("g++") is None:
            pytest.skip("no C compiler")

        src = r"""
        #include <stdint.h>
        #include <stdio.h>
        int main(int argc, char** argv) {
            uint32_t v0, v1; sscanf(argv[1], "%u", &v0); sscanf(argv[2], "%u", &v1);
            uint32_t sum = 0, delta = 0x9e3779b9U;
            for (int i = 0; i < 6; i++) {
                sum += delta;
                v0 += ((v1<<4)+0xa341316cU) ^ (v1+sum) ^ ((v1>>5)+0xc8013ea4U);
                v1 += ((v0<<4)+0xad90777dU) ^ (v0+sum) ^ ((v0>>5)+0x7e95761eU);
            }
            printf("%u %u\n", v0, v1);
            return 0;
        }
        """
        with tempfile.TemporaryDirectory() as d:
            cpath = Path(d) / "tea.c"
            cpath.write_text(src)
            binp = Path(d) / "tea"
            cc = shutil.which("gcc") or shutil.which("g++")
            subprocess.run([cc, "-O2", "-o", str(binp), str(cpath)],
                           check=True)
            cases = [(1234, 7, 42, 0), (0, 0, 0, 0),
                     (0xFFFFFFFF, 0x12345678, 99, 3)]
            for k0, k1, c0, c1 in cases:
                v0 = (k0 + c0) & 0xFFFFFFFF
                v1 = k1 ^ c1
                out = subprocess.run(
                    [str(binp), str(v0), str(v1)],
                    capture_output=True, text=True, check=True,
                ).stdout.split()
                got0, got1 = rng.tea6(
                    jnp.uint32(k0), jnp.uint32(k1),
                    jnp.uint32(c0), jnp.uint32(c1),
                )
                assert int(got0) == int(out[0])
                assert int(got1) == int(out[1])

    def test_tea_render_smoke(self):
        """A pt render with --rng tea converges to the same estimate as
        threefry (different streams, same estimator)."""
        from smallvcm_tpu.algorithms import pathtracer
        from smallvcm_tpu.scene.scene import SCENE_CONFIGS, load_cornell_box

        res = 32
        scene = load_cornell_box((res, res), SCENE_CONFIGS[2])
        acc = {k: np.zeros((res, res, 3), np.float32)
               for k in ("threefry", "tea")}
        iters = 24
        for k in acc:
            for it in range(iters):
                acc[k] += np.asarray(pathtracer.render_iteration(
                    scene, it, res, res, rng_kind=k))
            acc[k] /= iters
        assert np.isfinite(acc["tea"]).all()
        # Same estimator, independent streams: means agree to MC noise.
        ma, mb = acc["tea"].mean(), acc["threefry"].mean()
        assert abs(ma - mb) / mb < 0.05
