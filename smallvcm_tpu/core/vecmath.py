"""Batched vector math for the wavefront renderer.

The reference keeps scalar Vec3f/Mat4f classes (``/root/reference/src/math.hxx``).
Here every "vector" is the trailing axis of a ``[..., 3]`` jnp array so all ops
vectorize over path batches on the TPU VPU. Host-side 4x4 camera matrices live
in :mod:`smallvcm_tpu.scene.camera` (numpy, built once per scene).
"""

from __future__ import annotations

import jax.numpy as jnp

PI_F = 3.14159265358979
INV_PI_F = 1.0 / PI_F

# Epsilons, identical to the reference (utils.hxx:32-33, bsdf.hxx:59).
EPS_COSINE = 1e-6
EPS_RAY = 1e-3
EPS_PHONG = 1e-3


def dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched dot product over the trailing axis: [..., 3] x [..., 3] -> [...]."""
    return jnp.sum(a * b, axis=-1)


def cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.cross(a, b)


def len_sqr(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(a * a, axis=-1)


def length(a: jnp.ndarray) -> jnp.ndarray:
    # Strictly positive clamp: sqrt's VJP at exactly 0 is NaN, and
    # masked wavefront lanes do hold zero vectors.
    return jnp.sqrt(jnp.maximum(len_sqr(a), 1e-35))


def normalize(a: jnp.ndarray) -> jnp.ndarray:
    # The tiny clamp never fires on real unit-scale data; it keeps masked-off
    # wavefront lanes (zero/huge vectors) from minting NaNs that would poison
    # reverse-mode gradients through shared subexpressions.
    return a * (1.0 / jnp.maximum(length(a), 1e-35))[..., None]


def luminance(rgb: jnp.ndarray) -> jnp.ndarray:
    """sRGB luminance (utils.hxx:36-41)."""
    return (
        0.212671 * rgb[..., 0] + 0.715160 * rgb[..., 1] + 0.072169 * rgb[..., 2]
    )


def reflect_local(v: jnp.ndarray) -> jnp.ndarray:
    """Reflect through the local +Z axis (utils.hxx:77-80)."""
    return jnp.stack([-v[..., 0], -v[..., 1], v[..., 2]], axis=-1)


def sqr(x):
    return x * x


def pdf_w_to_a(pdf_w, dist, cos_there):
    """Solid-angle pdf -> area pdf (utils.hxx:245-251)."""
    return pdf_w * jnp.abs(cos_there) / sqr(dist)


def pdf_a_to_w(pdf_a, dist, cos_there):
    """Area pdf -> solid-angle pdf (utils.hxx:253-259).

    |cos| is clamped away from exact zero: division by 0 itself yields the
    reference's inf, but its VJP (0 cotangent / 0) would be NaN.
    """
    return pdf_a * sqr(dist) / jnp.maximum(jnp.abs(cos_there), 1e-35)


# ---------------------------------------------------------------------------
# Orthonormal shading frame (frame.hxx)
# ---------------------------------------------------------------------------


def frame_set_from_z(z: jnp.ndarray):
    """Build an ONB from a (possibly unnormalized) z axis; frame.hxx:53-59.

    Returns (x, y, z) each [..., 3]. Branch on |z.x| > 0.99 is a select.
    """
    nz = normalize(z)
    use_y = jnp.abs(nz[..., 0]) > 0.99
    tmp_x = jnp.where(
        use_y[..., None],
        jnp.array([0.0, 1.0, 0.0], dtype=nz.dtype),
        jnp.array([1.0, 0.0, 0.0], dtype=nz.dtype),
    )
    y = normalize(cross(nz, tmp_x))
    x = cross(y, nz)
    return x, y, nz


def frame_to_world(fx, fy, fz, a):
    return fx * a[..., 0:1] + fy * a[..., 1:2] + fz * a[..., 2:3]


def frame_to_local(fx, fy, fz, a):
    return jnp.stack([dot(a, fx), dot(a, fy), dot(a, fz)], axis=-1)


# ---------------------------------------------------------------------------
# Samplers (utils.hxx:85-237) — batched, random inputs shaped [..., 2]
# ---------------------------------------------------------------------------


def sample_cos_hemisphere_w(rnd2):
    """Cosine-weighted hemisphere; returns (dir [...,3], pdfW [...])."""
    term1 = 2.0 * PI_F * rnd2[..., 0]
    term2 = jnp.sqrt(jnp.maximum(1.0 - rnd2[..., 1], 1e-12))
    z = jnp.sqrt(jnp.maximum(rnd2[..., 1], 1e-12))
    d = jnp.stack([jnp.cos(term1) * term2, jnp.sin(term1) * term2, z], axis=-1)
    return d, z * INV_PI_F


def cos_hemisphere_pdf_w(normal, direction):
    return jnp.maximum(0.0, dot(normal, direction)) * INV_PI_F


def sample_power_cos_hemisphere_w(rnd2, power):
    """Power-cosine lobe around +Z; returns (dir, pdfW) (utils.hxx:85-103).

    The random base of the pow is clamped below (u is a multiple of 2^-24,
    so only exact zeros move): d(u^x)/dx = ln(u) u^x is NaN at u = 0.
    """
    term1 = 2.0 * PI_F * rnd2[..., 0]
    u = jnp.maximum(rnd2[..., 1], 1e-12)
    term2 = jnp.power(u, 1.0 / (power + 1.0))
    term3 = jnp.sqrt(jnp.maximum(1.0 - term2 * term2, 1e-12))
    d = jnp.stack(
        [jnp.cos(term1) * term3, jnp.sin(term1) * term3, term2], axis=-1
    )
    pdf = (power + 1.0) * jnp.power(term2, power) * (0.5 * INV_PI_F)
    return d, pdf


def power_cos_hemisphere_pdf_w(normal, direction, power):
    """pow's base is clamped + masked so the exponent gradient is NaN-free
    at grazing/backfacing directions (cos exactly 0 is common after the
    max(0, .) clamp)."""
    cos_theta = jnp.maximum(0.0, dot(normal, direction))
    safe = jnp.maximum(cos_theta, 1e-20)
    val = (power + 1.0) * jnp.power(safe, power) * (INV_PI_F * 0.5)
    return jnp.where(cos_theta > 0.0, val, 0.0)


def sample_concentric_disc(rnd2):
    """Shirley-Chiu concentric disc map (utils.hxx:119-162), branch-free."""
    a = 2.0 * rnd2[..., 0] - 1.0
    b = 2.0 * rnd2[..., 1] - 1.0

    # Guard divisions; selects below pick the valid lane.
    safe = lambda x: jnp.where(x == 0.0, 1.0, x)
    quarter = PI_F / 4.0
    r1, phi1 = a, quarter * (b / safe(a))
    r2, phi2 = b, quarter * (2.0 - a / safe(b))
    r3, phi3 = -a, quarter * (4.0 + b / safe(a))
    r4 = -b
    phi4 = jnp.where(b != 0.0, quarter * (6.0 - a / safe(b)), 0.0)

    reg12 = a > -b
    reg1 = jnp.logical_and(reg12, a > b)
    reg2 = jnp.logical_and(reg12, jnp.logical_not(a > b))
    reg3 = jnp.logical_and(jnp.logical_not(reg12), a < b)

    r = jnp.where(reg1, r1, jnp.where(reg2, r2, jnp.where(reg3, r3, r4)))
    phi = jnp.where(
        reg1, phi1, jnp.where(reg2, phi2, jnp.where(reg3, phi3, phi4))
    )
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi)], axis=-1)


def concentric_disc_pdf_a():
    return INV_PI_F


def sample_uniform_triangle(rnd2):
    """Barycentric sample (utils.hxx:202-207)."""
    term = jnp.sqrt(jnp.maximum(rnd2[..., 0], 1e-12))
    return jnp.stack([1.0 - term, rnd2[..., 1] * term], axis=-1)


def sample_uniform_sphere_w(rnd2):
    """Uniform sphere direction; returns (dir, pdfSA) (utils.hxx:212-231)."""
    term1 = 2.0 * PI_F * rnd2[..., 0]
    term2 = 2.0 * jnp.sqrt(
        jnp.maximum(rnd2[..., 1] - rnd2[..., 1] * rnd2[..., 1], 1e-12)
    )
    d = jnp.stack(
        [
            jnp.cos(term1) * term2,
            jnp.sin(term1) * term2,
            1.0 - 2.0 * rnd2[..., 1],
        ],
        axis=-1,
    )
    return d, jnp.full(rnd2.shape[:-1], INV_PI_F * 0.25, dtype=rnd2.dtype)


def uniform_sphere_pdf_w():
    return INV_PI_F * 0.25


def fresnel_dielectric(cos_inc, ior):
    """Dielectric Fresnel (utils.hxx:43-74). ior < 0 => 1 (no refraction).

    For ior < 0 lanes the result is overridden to 1; their eta is sanitized
    to a benign positive value first so the intermediate math stays finite
    (negative eta drives the r_perp denominator through zero, and the
    resulting inf would NaN the backward pass via zero cotangents).
    """
    hit_inside = cos_inc < 0.0
    abs_cos = jnp.abs(cos_inc)
    safe_ior = jnp.where(ior <= 0.0, 1.5, ior)
    eta = jnp.where(hit_inside, safe_ior, 1.0 / safe_ior)

    sin_trans2 = sqr(eta) * (1.0 - sqr(abs_cos))
    cos_trans = jnp.sqrt(jnp.maximum(1.0 - sin_trans2, 1e-12))

    # Denominators hit exact 0 only at perfectly grazing incidence, where the
    # reference never evaluates Fresnel (BSDF::Setup rejects |cos| < eps
    # first, bsdf.hxx:104-107); masked wavefront lanes do, so guard the 0/0.
    term1 = eta * cos_trans
    r_par = (abs_cos - term1) / jnp.maximum(abs_cos + term1, 1e-35)
    term2 = eta * abs_cos
    r_perp = (term2 - cos_trans) / jnp.maximum(term2 + cos_trans, 1e-35)
    fres = 0.5 * (sqr(r_par) + sqr(r_perp))
    return jnp.where(ior < 0.0, jnp.ones_like(fres), fres)
