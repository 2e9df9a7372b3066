"""Batched light sampling/evaluation for the four light types.

Replaces the reference's virtual ``AbstractLight`` dispatch (lights.hxx:42-109)
with branch-free evaluation: every lane gathers its picked light's unified
parameter record and all four type formulas are computed then selected by the
type code. With <= 3 lights per scene this costs a handful of VPU ops and
keeps the wavefront fully vectorized.

All formulas replicate lights.hxx:112-514 including the background light's
"pdf lies in area measure" convention (lights.hxx:469-471).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..core.vecmath import (
    EPS_COSINE,
    INV_PI_F,
    concentric_disc_pdf_a,
    cos_hemisphere_pdf_w,
    dot,
    frame_set_from_z,
    len_sqr,
    sample_concentric_disc,
    sample_cos_hemisphere_w,
    sample_uniform_sphere_w,
    sample_uniform_triangle,
    uniform_sphere_pdf_w,
)
from ..scene.scene import (
    LIGHT_AREA,
    LIGHT_BACKGROUND,
    LIGHT_DIRECTIONAL,
    LIGHT_POINT,
    Lights,
    SceneSphere,
)


class IlluminateResult(NamedTuple):
    radiance: jnp.ndarray         # [N,3] — zero => sample invalid
    dir_to_light: jnp.ndarray     # [N,3]
    distance: jnp.ndarray         # [N]
    direct_pdf_w: jnp.ndarray     # [N]
    emission_pdf_w: jnp.ndarray   # [N]
    cos_at_light: jnp.ndarray     # [N]


class EmitResult(NamedTuple):
    energy: jnp.ndarray          # [N,3]
    position: jnp.ndarray        # [N,3]
    direction: jnp.ndarray       # [N,3]
    emission_pdf_w: jnp.ndarray  # [N]
    direct_pdf_a: jnp.ndarray    # [N]
    cos_theta_light: jnp.ndarray # [N]
    is_finite: jnp.ndarray       # [N] bool
    is_delta: jnp.ndarray        # [N] bool


class RadianceResult(NamedTuple):
    radiance: jnp.ndarray        # [N,3]
    direct_pdf_a: jnp.ndarray    # [N]
    emission_pdf_w: jnp.ndarray  # [N]


def _gather(lights: Lights, idx):
    safe = jnp.clip(idx, 0, lights.kind.shape[0] - 1)
    g = lambda a: a[safe]
    return (
        g(lights.kind), g(lights.p0), g(lights.e1), g(lights.e2),
        g(lights.frame_x), g(lights.frame_y), g(lights.frame_z),
        g(lights.intensity), g(lights.inv_area),
        g(lights.is_finite), g(lights.is_delta),
    )


def _safe(x, eps=0.0):
    return jnp.where(x == eps, 1.0, x)


def illuminate(
    lights: Lights, idx, sphere: SceneSphere, recv_pos, rnd2
) -> IlluminateResult:
    """AbstractLight::Illuminate for every lane's picked light."""
    kind, p0, e1, e2, fx, fy, fz, intensity, inv_area, _, _ = _gather(
        lights, idx
    )

    # --- Area light (lights.hxx:131-166).
    uv = sample_uniform_triangle(rnd2)
    lp = p0 + e1 * uv[..., 0:1] + e2 * uv[..., 1:2]
    to_l = lp - recv_pos
    dist_sqr = jnp.maximum(len_sqr(to_l), 1e-30)
    a_dist = jnp.sqrt(dist_sqr)
    a_dir = to_l / a_dist[..., None]
    cos_normal_dir = dot(fz, -a_dir)
    a_ok = cos_normal_dir >= EPS_COSINE
    safe_cos = _safe(jnp.where(a_ok, cos_normal_dir, 0.0))
    a_direct_pdf = inv_area * dist_sqr / safe_cos
    a_emission_pdf = inv_area * cos_normal_dir * INV_PI_F
    a_radiance = jnp.where(a_ok[..., None], intensity, 0.0)

    # --- Directional (lights.hxx:244-265).
    d_dir = -fz
    d_direct_pdf = jnp.ones_like(inv_area)
    d_emission_pdf = concentric_disc_pdf_a() * sphere.inv_radius_sqr

    # --- Point (lights.hxx:329-352).
    p_to_l = p0 - recv_pos
    p_dist_sqr = jnp.maximum(len_sqr(p_to_l), 1e-30)
    p_dist = jnp.sqrt(p_dist_sqr)
    p_dir = p_to_l / p_dist[..., None]
    p_direct_pdf = p_dist_sqr
    p_emission_pdf = jnp.full_like(inv_area, uniform_sphere_pdf_w())

    # --- Background (lights.hxx:410-436).
    b_dir, b_direct_pdf = sample_uniform_sphere_w(rnd2)
    b_emission_pdf = (
        b_direct_pdf * concentric_disc_pdf_a() * sphere.inv_radius_sqr
    )

    is_area = kind == LIGHT_AREA
    is_dir = kind == LIGHT_DIRECTIONAL
    is_point = kind == LIGHT_POINT

    def pick(a, d, p, b):
        if a.ndim > kind.ndim:
            m = lambda c: c[..., None]
        else:
            m = lambda c: c
        return jnp.where(
            m(is_area), a, jnp.where(m(is_dir), d, jnp.where(m(is_point), p, b))
        )

    big = jnp.full_like(inv_area, 1e36)
    one = jnp.ones_like(inv_area)
    return IlluminateResult(
        radiance=pick(a_radiance, intensity, intensity, intensity),
        dir_to_light=pick(a_dir, d_dir, p_dir, b_dir),
        distance=pick(a_dist, big, p_dist, big),
        direct_pdf_w=pick(a_direct_pdf, d_direct_pdf, p_direct_pdf, b_direct_pdf),
        emission_pdf_w=pick(
            a_emission_pdf, d_emission_pdf, p_emission_pdf, b_emission_pdf
        ),
        cos_at_light=pick(jnp.where(a_ok, cos_normal_dir, 1.0), one, one, one),
    )


def emit(
    lights: Lights, idx, sphere: SceneSphere, rnd_dir, rnd_pos
) -> EmitResult:
    """AbstractLight::Emit for every lane's picked light."""
    kind, p0, e1, e2, fx, fy, fz, intensity, inv_area, is_finite, is_delta = (
        _gather(lights, idx)
    )

    # --- Area (lights.hxx:168-196).
    uv = sample_uniform_triangle(rnd_pos)
    a_pos = p0 + e1 * uv[..., 0:1] + e2 * uv[..., 1:2]
    local_dir, cos_pdf = sample_cos_hemisphere_w(rnd_dir)
    a_emission_pdf = cos_pdf * inv_area
    local_z = jnp.maximum(local_dir[..., 2], EPS_COSINE)
    local_dir = jnp.concatenate(
        [local_dir[..., :2], local_z[..., None]], axis=-1
    )
    a_dir = (
        fx * local_dir[..., 0:1]
        + fy * local_dir[..., 1:2]
        + fz * local_dir[..., 2:3]
    )
    a_energy = intensity * local_z[..., None]

    # --- Directional (lights.hxx:267-294).
    disc_xy = sample_concentric_disc(rnd_pos)
    d_pos = sphere.center + sphere.radius * (
        -fz + fx * disc_xy[..., 0:1] + fy * disc_xy[..., 1:2]
    )
    d_dir = fz
    d_emission_pdf = concentric_disc_pdf_a() * sphere.inv_radius_sqr

    # --- Point (lights.hxx:354-375).
    p_dir, p_emission_pdf = sample_uniform_sphere_w(rnd_dir)

    # --- Background (lights.hxx:438-478).
    b_dir, b_direct_pdf = sample_uniform_sphere_w(rnd_dir)
    bfx, bfy, _ = frame_set_from_z(b_dir)
    b_pos = sphere.center + sphere.radius * (
        -b_dir + bfx * disc_xy[..., 0:1] + bfy * disc_xy[..., 1:2]
    )
    b_emission_pdf = (
        b_direct_pdf * concentric_disc_pdf_a() * sphere.inv_radius_sqr
    )

    is_area = kind == LIGHT_AREA
    is_dir = kind == LIGHT_DIRECTIONAL
    is_point = kind == LIGHT_POINT

    def pick(a, d, p, b):
        if a.ndim > kind.ndim:
            m = lambda c: c[..., None]
        else:
            m = lambda c: c
        return jnp.where(
            m(is_area), a, jnp.where(m(is_dir), d, jnp.where(m(is_point), p, b))
        )

    one = jnp.ones_like(inv_area)
    return EmitResult(
        energy=pick(a_energy, intensity, intensity, intensity),
        position=pick(a_pos, d_pos, p0, b_pos),
        direction=pick(a_dir, d_dir, p_dir, b_dir),
        emission_pdf_w=pick(
            a_emission_pdf, d_emission_pdf, p_emission_pdf, b_emission_pdf
        ),
        direct_pdf_a=pick(inv_area, one, one, b_direct_pdf),
        cos_theta_light=pick(local_z, one, one, one),
        is_finite=is_finite,
        is_delta=is_delta,
    )


def get_radiance(
    lights: Lights, idx, sphere: SceneSphere, ray_dir
) -> RadianceResult:
    """AbstractLight::GetRadiance for lights hit by a random ray."""
    kind, _, _, _, _, _, fz, intensity, inv_area, _, _ = _gather(lights, idx)

    # --- Area (lights.hxx:198-220).
    cos_out = jnp.maximum(0.0, dot(fz, -ray_dir))
    a_ok = cos_out > 0.0
    a_radiance = jnp.where(a_ok[..., None], intensity, 0.0)
    a_emission_pdf = cos_hemisphere_pdf_w(fz, -ray_dir) * inv_area

    # --- Background (lights.hxx:480-502).
    b_direct_pdf = uniform_sphere_pdf_w()
    b_emission_pdf = (
        b_direct_pdf * concentric_disc_pdf_a() * sphere.inv_radius_sqr
    )

    is_area = kind == LIGHT_AREA
    is_bg = kind == LIGHT_BACKGROUND
    zero3 = jnp.zeros_like(intensity)
    zero = jnp.zeros_like(inv_area)

    radiance = jnp.where(
        is_area[..., None], a_radiance, jnp.where(is_bg[..., None], intensity, zero3)
    )
    direct_pdf = jnp.where(
        is_area, inv_area, jnp.where(is_bg, b_direct_pdf, zero)
    )
    emission_pdf = jnp.where(
        is_area, a_emission_pdf, jnp.where(is_bg, b_emission_pdf, zero)
    )
    return RadianceResult(
        radiance=radiance, direct_pdf_a=direct_pdf, emission_pdf_w=emission_pdf
    )
