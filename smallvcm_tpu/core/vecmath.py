"""Batched sampling/shading math over planar (SoA) vectors.

The reference keeps scalar Vec3f/Mat4f classes (``/root/reference/src/math.hxx``,
``frame.hxx``, ``utils.hxx``). Here vectors are :class:`~smallvcm_tpu.core.vec3.V3`
component-planar batches (see vec3.py for why), random inputs are separate
``[...]`` uniform arrays, and everything vectorizes at full VPU lane width.

NaN hygiene: masked-off wavefront lanes evaluate everything; every sqrt/pow/
division that can hit a non-differentiable point (sqrt(0), pow(0,p), x/0) is
clamped so neither the forward value nor the VJP can mint NaN — clamps are
placed where they cannot move real data (see each comment).
"""

from __future__ import annotations

import jax.numpy as jnp

from .vec3 import V3, cross, dot, normalize, v3_where

PI_F = 3.14159265358979
INV_PI_F = 1.0 / PI_F

# Epsilons, identical to the reference (utils.hxx:32-33, bsdf.hxx:59).
EPS_COSINE = 1e-6
EPS_RAY = 1e-3
EPS_PHONG = 1e-3


def sqr(x):
    return x * x


def pdf_w_to_a(pdf_w, dist, cos_there):
    """Solid-angle pdf -> area pdf (utils.hxx:245-251)."""
    return pdf_w * jnp.abs(cos_there) / sqr(dist)


def pdf_a_to_w(pdf_a, dist, cos_there):
    """Area pdf -> solid-angle pdf (utils.hxx:253-259). |cos| clamped away
    from exact zero (division VJP would be 0/0 NaN)."""
    return pdf_a * sqr(dist) / jnp.maximum(jnp.abs(cos_there), 1e-35)


# ---------------------------------------------------------------------------
# Orthonormal shading frame (frame.hxx)
# ---------------------------------------------------------------------------


def frame_set_from_z(z: V3):
    """ONB from a (possibly unnormalized) z axis (frame.hxx:53-59)."""
    nz = normalize(z)
    use_y = jnp.abs(nz.x) > 0.99
    zero = jnp.zeros_like(nz.x)
    one = jnp.ones_like(nz.x)
    tmp_x = V3(jnp.where(use_y, zero, one), jnp.where(use_y, one, zero), zero)
    y = normalize(cross(nz, tmp_x))
    x = cross(y, nz)
    return x, y, nz


def frame_to_world(fx: V3, fy: V3, fz: V3, a: V3) -> V3:
    return fx * a.x + fy * a.y + fz * a.z


def frame_to_local(fx: V3, fy: V3, fz: V3, a: V3) -> V3:
    return V3(dot(a, fx), dot(a, fy), dot(a, fz))


# ---------------------------------------------------------------------------
# Samplers (utils.hxx:85-237) — uniforms passed as separate [...] arrays
# ---------------------------------------------------------------------------


def sample_cos_hemisphere_w(u1, u2):
    """Cosine hemisphere; returns (V3 dir, pdfW). sqrt args clamped (VJP)."""
    term1 = 2.0 * PI_F * u1
    term2 = jnp.sqrt(jnp.maximum(1.0 - u2, 1e-12))
    z = jnp.sqrt(jnp.maximum(u2, 1e-12))
    d = V3(jnp.cos(term1) * term2, jnp.sin(term1) * term2, z)
    return d, z * INV_PI_F


def cos_hemisphere_pdf_w(normal: V3, direction: V3):
    return jnp.maximum(0.0, dot(normal, direction)) * INV_PI_F


def sample_power_cos_hemisphere_w(u1, u2, power):
    """Power-cosine lobe around +Z (utils.hxx:85-103).

    pow's random base is clamped below (u is a multiple of 2^-24 so only
    exact zeros move): d(u^x)/dx = ln(u) u^x is NaN at u = 0.
    """
    term1 = 2.0 * PI_F * u1
    u = jnp.maximum(u2, 1e-12)
    term2 = jnp.power(u, 1.0 / (power + 1.0))
    term3 = jnp.sqrt(jnp.maximum(1.0 - term2 * term2, 1e-12))
    d = V3(jnp.cos(term1) * term3, jnp.sin(term1) * term3, term2)
    pdf = (power + 1.0) * jnp.power(term2, power) * (0.5 * INV_PI_F)
    return d, pdf


def power_cos_hemisphere_pdf_w(normal: V3, direction: V3, power):
    """pow base clamped + masked: exponent gradient would be NaN at the
    (common) exactly-zero clamped cosine."""
    cos_theta = jnp.maximum(0.0, dot(normal, direction))
    safe = jnp.maximum(cos_theta, 1e-20)
    val = (power + 1.0) * jnp.power(safe, power) * (INV_PI_F * 0.5)
    return jnp.where(cos_theta > 0.0, val, 0.0)


def sample_concentric_disc(u1, u2):
    """Shirley-Chiu concentric disc (utils.hxx:119-162), branch-free.
    Returns (x, y)."""
    a = 2.0 * u1 - 1.0
    b = 2.0 * u2 - 1.0

    safe = lambda x: jnp.where(x == 0.0, 1.0, x)
    quarter = PI_F / 4.0
    r1, phi1 = a, quarter * (b / safe(a))
    r2, phi2 = b, quarter * (2.0 - a / safe(b))
    r3, phi3 = -a, quarter * (4.0 + b / safe(a))
    r4 = -b
    phi4 = jnp.where(b != 0.0, quarter * (6.0 - a / safe(b)), 0.0)

    reg12 = a > -b
    reg1 = reg12 & (a > b)
    reg2 = reg12 & ~(a > b)
    reg3 = ~reg12 & (a < b)

    r = jnp.where(reg1, r1, jnp.where(reg2, r2, jnp.where(reg3, r3, r4)))
    phi = jnp.where(
        reg1, phi1, jnp.where(reg2, phi2, jnp.where(reg3, phi3, phi4))
    )
    return r * jnp.cos(phi), r * jnp.sin(phi)


def concentric_disc_pdf_a():
    return INV_PI_F


def sample_uniform_triangle(u1, u2):
    """Barycentric sample (utils.hxx:202-207). Returns (a, b)."""
    term = jnp.sqrt(jnp.maximum(u1, 1e-12))
    return 1.0 - term, u2 * term


def sample_uniform_sphere_w(u1, u2):
    """Uniform sphere direction (utils.hxx:212-231); returns (V3, pdfSA)."""
    term1 = 2.0 * PI_F * u1
    term2 = 2.0 * jnp.sqrt(jnp.maximum(u2 - u2 * u2, 1e-12))
    d = V3(jnp.cos(term1) * term2, jnp.sin(term1) * term2, 1.0 - 2.0 * u2)
    return d, jnp.full(u1.shape, INV_PI_F * 0.25, dtype=u1.dtype)


def uniform_sphere_pdf_w():
    return INV_PI_F * 0.25


def fresnel_dielectric(cos_inc, ior):
    """Dielectric Fresnel (utils.hxx:43-74). ior < 0 => 1 (no refraction).

    For ior <= 0 lanes the result is overridden to 1; their eta is sanitized
    to a benign positive value so intermediates stay finite (negative eta
    drives the r_perp denominator through zero -> inf -> backward NaN).
    """
    hit_inside = cos_inc < 0.0
    abs_cos = jnp.abs(cos_inc)
    safe_ior = jnp.where(ior <= 0.0, 1.5, ior)
    eta = jnp.where(hit_inside, safe_ior, 1.0 / safe_ior)

    sin_trans2 = sqr(eta) * (1.0 - sqr(abs_cos))
    cos_trans = jnp.sqrt(jnp.maximum(1.0 - sin_trans2, 1e-12))

    term1 = eta * cos_trans
    r_par = (abs_cos - term1) / jnp.maximum(abs_cos + term1, 1e-35)
    term2 = eta * abs_cos
    r_perp = (term2 - cos_trans) / jnp.maximum(term2 + cos_trans, 1e-35)
    fres = 0.5 * (sqr(r_par) + sqr(r_perp))
    return jnp.where(ior < 0.0, jnp.ones_like(fres), fres)
