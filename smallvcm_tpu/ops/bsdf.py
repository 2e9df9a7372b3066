"""Batched four-lobe BSDF engine (diffuse + Phong + mirror + glass).

Re-design of the reference's ``BSDF<FixIsLight>`` object (bsdf.hxx:61-576) as
pure functions over SoA state. One ``BsdfState`` holds, per wavefront lane,
everything ``BSDF::Setup`` computed: the shading frame, the fixed incoming
direction in local coords, Fresnel-weighted component probabilities, the
Russian-roulette continuation probability, and validity/delta flags.

The camera/light transport asymmetry (Veach adjoint BSDF) only changes the
eta^2 factor in refraction (bsdf.hxx:375-381) and is passed as the static
``fix_is_light`` python bool, so both variants jit to separate branch-free
programs.

MIS correctness depends on pdfs being computed *identically* everywhere
(bsdf.hxx:298-299); all pdf math here matches Evaluate/Pdf/Sample paths
bit-for-bit with the reference formulas.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.vecmath import (
    EPS_COSINE,
    EPS_PHONG,
    INV_PI_F,
    dot,
    fresnel_dielectric,
    frame_set_from_z,
    frame_to_local,
    frame_to_world,
    luminance,
    reflect_local,
    sample_cos_hemisphere_w,
    sample_power_cos_hemisphere_w,
    power_cos_hemisphere_pdf_w,
    sqr,
)
from ..scene.scene import Materials

# Event codes (bsdf.hxx:72-82).
EV_NONE = 0
EV_DIFFUSE = 1
EV_PHONG = 2
EV_REFLECT = 4
EV_REFRACT = 8
EV_SPECULAR = EV_REFLECT | EV_REFRACT


class BsdfState(NamedTuple):
    valid: jnp.ndarray          # [N] bool (materialID >= 0 in the reference)
    mat_id: jnp.ndarray         # [N] int32 (clamped >= 0 for safe gathers)
    frame_x: jnp.ndarray        # [N,3]
    frame_y: jnp.ndarray        # [N,3]
    frame_z: jnp.ndarray        # [N,3]
    local_dir_fix: jnp.ndarray  # [N,3]
    is_delta: jnp.ndarray       # [N] bool
    prob_diff: jnp.ndarray      # [N]
    prob_phong: jnp.ndarray     # [N]
    prob_refl: jnp.ndarray      # [N]
    prob_refr: jnp.ndarray      # [N]
    cont_prob: jnp.ndarray      # [N]
    reflect_coeff: jnp.ndarray  # [N]

    def cos_theta_fix(self):
        return self.local_dir_fix[..., 2]

    def world_dir_fix(self):
        return frame_to_world(
            self.frame_x, self.frame_y, self.frame_z, self.local_dir_fix
        )


def _gather_material(materials: Materials, mat_id):
    safe = jnp.maximum(mat_id, 0)
    return (
        materials.diffuse[safe],
        materials.phong[safe],
        materials.exponent[safe],
        materials.mirror[safe],
        materials.ior[safe],
    )


def setup(materials: Materials, ray_dir, normal, mat_id, hit_mask) -> BsdfState:
    """BSDF::Setup (bsdf.hxx:95-117) over a wavefront."""
    fx, fy, fz = frame_set_from_z(normal)
    local_fix = frame_to_local(fx, fy, fz, -ray_dir)

    valid = hit_mask & (mat_id >= 0) & (
        jnp.abs(local_fix[..., 2]) >= EPS_COSINE
    )

    diffuse, phong, _, mirror, ior = _gather_material(materials, mat_id)

    # GetComponentProbabilities (bsdf.hxx:528-566).
    reflect_coeff = fresnel_dielectric(local_fix[..., 2], ior)
    albedo_diff = luminance(diffuse)
    albedo_phong = luminance(phong)
    albedo_refl = reflect_coeff * luminance(mirror)
    albedo_refr = (1.0 - reflect_coeff) * jnp.where(ior > 0.0, 1.0, 0.0)

    total = albedo_diff + albedo_phong + albedo_refl + albedo_refr
    degenerate = total < 1e-9
    safe_total = jnp.where(degenerate, 1.0, total)

    p_diff = jnp.where(degenerate, 0.0, albedo_diff / safe_total)
    p_phong = jnp.where(degenerate, 0.0, albedo_phong / safe_total)
    p_refl = jnp.where(degenerate, 0.0, albedo_refl / safe_total)
    p_refr = jnp.where(degenerate, 0.0, albedo_refr / safe_total)

    cont = jnp.max(
        diffuse + phong + reflect_coeff[..., None] * mirror, axis=-1
    ) + (1.0 - reflect_coeff)
    cont = jnp.where(degenerate, 0.0, jnp.clip(cont, 0.0, 1.0))

    # Differentiability: component probabilities and the RR continuation
    # probability gate *discrete* sampling decisions. Detaching them here
    # freezes the sampling distribution w.r.t. scene parameters, making the
    # whole estimator a reparameterized (pathwise) gradient — unbiased for
    # material/light parameters — while the BSDF *values* (and continuous
    # sampling transforms like the Phong-exponent lobe) keep full gradients.
    sg = jax.lax.stop_gradient
    p_diff, p_phong, p_refl, p_refr = (
        sg(p_diff), sg(p_phong), sg(p_refl), sg(p_refr)
    )
    cont = sg(cont)

    return BsdfState(
        valid=valid,
        mat_id=jnp.maximum(mat_id, 0),
        frame_x=fx, frame_y=fy, frame_z=fz,
        local_dir_fix=local_fix,
        is_delta=(p_diff == 0.0) & (p_phong == 0.0),
        prob_diff=p_diff, prob_phong=p_phong,
        prob_refl=p_refl, prob_refr=p_refr,
        cont_prob=cont,
        reflect_coeff=reflect_coeff,
    )


def _phong_rho(phong_refl, exponent):
    return phong_refl * ((exponent + 2.0) * 0.5 * INV_PI_F)[..., None]


def _eval_diffuse(state, diffuse, local_gen):
    """EvaluateDiffuse (bsdf.hxx:393-412): (value, direct_pdf, rev_pdf)."""
    ok = (
        (state.prob_diff > 0.0)
        & (state.local_dir_fix[..., 2] >= EPS_COSINE)
        & (local_gen[..., 2] >= EPS_COSINE)
    )
    value = jnp.where(ok[..., None], diffuse * INV_PI_F, 0.0)
    direct = jnp.where(
        ok, state.prob_diff * jnp.maximum(0.0, local_gen[..., 2] * INV_PI_F), 0.0
    )
    rev = jnp.where(
        ok,
        state.prob_diff
        * jnp.maximum(0.0, state.local_dir_fix[..., 2] * INV_PI_F),
        0.0,
    )
    return value, direct, rev


def _eval_phong(state, phong_refl, exponent, local_gen):
    """EvaluatePhong (bsdf.hxx:414-450): (value, direct_pdf, rev_pdf)."""
    refl_fix = reflect_local(state.local_dir_fix)
    dot_r_wi = dot(refl_fix, local_gen)
    ok = (
        (state.prob_phong > 0.0)
        & (state.local_dir_fix[..., 2] >= EPS_COSINE)
        & (local_gen[..., 2] >= EPS_COSINE)
        & (dot_r_wi > EPS_PHONG)
    )
    pdf_w = state.prob_phong * power_cos_hemisphere_pdf_w(
        refl_fix, local_gen, exponent
    )
    rho = _phong_rho(phong_refl, exponent)
    value = rho * jnp.power(jnp.maximum(dot_r_wi, EPS_PHONG), exponent)[..., None]
    value = jnp.where(ok[..., None], value, 0.0)
    pdf_w = jnp.where(ok, pdf_w, 0.0)
    return value, pdf_w, pdf_w  # phong sampling is symmetric


def _pdf_diffuse(state, local_gen):
    """PdfDiffuse (bsdf.hxx:456-472) — NOTE: no EPS_COSINE gating."""
    ok = state.prob_diff > 0.0
    direct = jnp.where(
        ok, state.prob_diff * jnp.maximum(0.0, local_gen[..., 2] * INV_PI_F), 0.0
    )
    rev = jnp.where(
        ok,
        state.prob_diff
        * jnp.maximum(0.0, state.local_dir_fix[..., 2] * INV_PI_F),
        0.0,
    )
    return direct, rev


def _pdf_phong(state, exponent, local_gen):
    """PdfPhong (bsdf.hxx:474-502)."""
    refl_fix = reflect_local(state.local_dir_fix)
    dot_r_wi = dot(refl_fix, local_gen)
    ok = (state.prob_phong > 0.0) & (dot_r_wi > EPS_PHONG)
    pdf_w = power_cos_hemisphere_pdf_w(refl_fix, local_gen, exponent) * \
        state.prob_phong
    pdf_w = jnp.where(ok, pdf_w, 0.0)
    return pdf_w, pdf_w


def evaluate(materials: Materials, state: BsdfState, world_dir_gen):
    """BSDF::Evaluate (bsdf.hxx:128-153).

    Returns (value [N,3], cos_theta_gen [N], direct_pdf_w [N], rev_pdf_w [N]).
    Zero everywhere when the directions are in opposite hemispheres or the
    state is invalid.
    """
    diffuse, phong, exponent, _, _ = _gather_material(materials, state.mat_id)
    local_gen = frame_to_local(
        state.frame_x, state.frame_y, state.frame_z, world_dir_gen
    )
    same_side = (
        local_gen[..., 2] * state.local_dir_fix[..., 2] >= 0.0
    ) & state.valid
    cos_gen = jnp.abs(local_gen[..., 2])

    vd, dd, rd = _eval_diffuse(state, diffuse, local_gen)
    vp, dp, rp = _eval_phong(state, phong, exponent, local_gen)

    m = same_side
    value = jnp.where(m[..., None], vd + vp, 0.0)
    direct = jnp.where(m, dd + dp, 0.0)
    rev = jnp.where(m, rd + rp, 0.0)
    return value, cos_gen, direct, rev


def pdf(materials: Materials, state: BsdfState, world_dir_gen):
    """BSDF::Pdf (bsdf.hxx:161-180): returns (direct_pdf_w, rev_pdf_w)."""
    _, _, exponent, _, _ = _gather_material(materials, state.mat_id)
    local_gen = frame_to_local(
        state.frame_x, state.frame_y, state.frame_z, world_dir_gen
    )
    same_side = (
        local_gen[..., 2] * state.local_dir_fix[..., 2] >= 0.0
    ) & state.valid
    dd, rd = _pdf_diffuse(state, local_gen)
    dp, rp = _pdf_phong(state, exponent, local_gen)
    return jnp.where(same_side, dd + dp, 0.0), jnp.where(same_side, rd + rp, 0.0)


def sample(materials: Materials, state: BsdfState, rnd3, fix_is_light: bool):
    """BSDF::Sample (bsdf.hxx:191-257) over a wavefront.

    Returns (factor [N,3], world_dir_gen [N,3], pdf_w [N], cos_theta_gen [N],
    event [N] int32, keep [N] bool). ``keep=False`` corresponds to the
    reference returning a zero factor (sample discarded).
    """
    diffuse, phong, exponent, mirror, ior = _gather_material(
        materials, state.mat_id
    )
    z = rnd3[..., 2]
    thr_d = state.prob_diff
    thr_p = thr_d + state.prob_phong
    thr_r = thr_p + state.prob_refl
    event = jnp.where(
        z < thr_d,
        EV_DIFFUSE,
        jnp.where(z < thr_p, EV_PHONG, jnp.where(z < thr_r, EV_REFLECT, EV_REFRACT)),
    ).astype(jnp.int32)

    rnd2 = rnd3[..., :2]
    local_fix = state.local_dir_fix

    # --- Diffuse candidate (SampleDiffuse + EvaluatePhong; bsdf.hxx:219-227).
    d_dir, d_unweighted_pdf = sample_cos_hemisphere_w(rnd2)
    d_ok = local_fix[..., 2] >= EPS_COSINE
    d_pdf = d_unweighted_pdf * state.prob_diff
    d_value = diffuse * INV_PI_F
    pv, pd, _ = _eval_phong(state, phong, exponent, d_dir)
    d_value = d_value + pv
    d_pdf = d_pdf + pd

    # --- Phong candidate (SamplePhong + EvaluateDiffuse; bsdf.hxx:228-236,
    # 290-318). Direction sampled around the reflected fix direction.
    lobe_dir, _ = sample_power_cos_hemisphere_w(rnd2, exponent)
    refl_fix = reflect_local(local_fix)
    rfx, rfy, rfz = frame_set_from_z(refl_fix)
    p_dir = frame_to_world(rfx, rfy, rfz, lobe_dir)
    dot_r_wi = dot(refl_fix, p_dir)
    p_ok = dot_r_wi > EPS_PHONG
    p_pdf_d, _ = _pdf_phong(state, exponent, p_dir)
    p_value = _phong_rho(phong, exponent) * jnp.power(
        jnp.maximum(dot_r_wi, EPS_PHONG), exponent
    )[..., None]
    dv, dd_pdf, _ = _eval_diffuse(state, diffuse, p_dir)
    p_value = p_value + dv
    p_pdf = p_pdf_d + dd_pdf

    # --- Reflect candidate (bsdf.hxx:320-333).
    r_dir = refl_fix
    r_pdf = state.prob_refl
    r_cos = jnp.abs(r_dir[..., 2])
    r_value = (
        state.reflect_coeff[..., None]
        * mirror
        / jnp.maximum(r_cos, 1e-30)[..., None]
    )
    r_ok = jnp.ones_like(d_ok)

    # --- Refract candidate (bsdf.hxx:335-387).
    cos_i_raw = local_fix[..., 2]
    inside = cos_i_raw < 0.0
    safe_ior = jnp.where(ior == 0.0, 1.0, ior)
    eta = jnp.where(inside, ior, 1.0 / safe_ior)
    cos_i = jnp.abs(cos_i_raw)
    cos_t_sign = jnp.where(inside, 1.0, -1.0)
    sin_i2 = 1.0 - cos_i * cos_i
    sin_t2 = sqr(eta) * sin_i2
    no_tir = sin_t2 < 1.0
    cos_t = cos_t_sign * jnp.sqrt(jnp.maximum(1.0 - sin_t2, 1e-12))
    f_dir = jnp.stack(
        [
            -eta * local_fix[..., 0],
            -eta * local_fix[..., 1],
            cos_t,
        ],
        axis=-1,
    )
    f_pdf = state.prob_refr
    refract_coeff = 1.0 - state.reflect_coeff
    abs_cos_t = jnp.maximum(jnp.abs(cos_t), 1e-30)
    if not fix_is_light:  # camera paths carry the eta^2 factor
        f_scalar = refract_coeff * sqr(eta) / abs_cos_t
    else:
        f_scalar = refract_coeff / abs_cos_t
    f_value = jnp.broadcast_to(f_scalar[..., None], f_dir.shape)
    f_ok = (ior >= 0.0) & no_tir

    # --- Select by event.
    is_d = event == EV_DIFFUSE
    is_p = event == EV_PHONG
    is_r = event == EV_REFLECT

    def pick(d, p, r, f):
        shape_mask = is_d
        if d.ndim > shape_mask.ndim:
            m = lambda c: c[..., None]
        else:
            m = lambda c: c
        return jnp.where(
            m(is_d), d, jnp.where(m(is_p), p, jnp.where(m(is_r), r, f))
        )

    local_gen = pick(d_dir, p_dir, r_dir, f_dir)
    pdf_w = pick(d_pdf, p_pdf, r_pdf, f_pdf)
    value = pick(d_value, p_value, r_value, f_value)
    ok = pick(d_ok, p_ok, r_ok, f_ok)

    cos_gen = jnp.abs(local_gen[..., 2])
    keep = ok & (cos_gen >= EPS_COSINE) & state.valid
    # Reference also discards when the selected factor is exactly zero
    # (e.g. zero-reflectance lobes); component probs > 0 imply nonzero
    # luminance so this only triggers via the ok-masks above.

    world_dir = frame_to_world(
        state.frame_x, state.frame_y, state.frame_z, local_gen
    )
    return value, world_dir, pdf_w, cos_gen, event, keep
