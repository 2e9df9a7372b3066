"""Wavefront unidirectional path tracer with NEE and 2-pdf balance MIS.

Re-architecture of the reference's per-pixel recursive loop
(pathtracer.hxx:45-215) as fixed-depth masked iteration: the whole image's
paths advance one bounce per ``lax.fori_loop`` step; early ``break``s become
``alive``-mask updates and contributions are accumulated where-masked.
All vectors are component-planar (core/vec3.py) for full VPU lane width.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import rng
from ..core.vec3 import V3, dot, max_gt_zero, v3_where
from ..core.vecmath import EPS_RAY, pdf_a_to_w
from ..ops import bsdf as bsdf_ops
from ..ops import lights as light_ops
from ..ops.intersect import intersect, occluded
from ..scene.camera import generate_ray
from ..scene.scene import SceneData
from ..io.framebuffer import add_color_at_pix, new_fb_planes


def _safe_div(a, b):
    return a / jnp.where(b == 0.0, 1.0, b)


def _mis2(sample_pdf, other_pdf):
    """Balance heuristic for 2 pdfs (pathtracer.hxx:226-231)."""
    return _safe_div(sample_pdf, sample_pdf + other_pdf)


class _PtState(NamedTuple):
    org: V3
    direction: V3
    weight: V3
    color: V3
    last_specular: jnp.ndarray  # [N] bool
    last_pdf_w: jnp.ndarray     # [N]
    alive: jnp.ndarray          # [N] bool


def render_core(
    scene: SceneData,
    iteration,
    pix,
    res_x: int,
    res_y: int,
    base_seed: int = 1234,
    max_path_length: int = 10,
    min_path_length: int = 0,
    rng_kind: str = "threefry",
) -> jnp.ndarray:
    """One PT pass over the given (possibly sharded) global pixel ids ->
    accumulation image [resY,resX,3] holding only those pixels. RNG streams
    key off global pixel ids, so any partition of ``arange(n)`` reproduces
    the single-device image (strictly stronger than the reference's
    thread-seeded scheme, smallvcm.cxx:61-72)."""
    n = pix.shape[0]
    x = (pix % res_x).astype(jnp.float32)
    y = (pix // res_x).astype(jnp.float32)

    light_count = scene.lights.kind.shape[0]
    light_pick_prob = 1.0 / light_count
    has_background = scene.background_idx >= 0

    jitter = rng.uniform_slots(
        base_seed, rng.make_stream(iteration, rng.STAGE_CAMERA_JITTER), pix, 2,
        rng_kind,
    )
    sx = x + jitter[:, 0]
    sy = y + jitter[:, 1]
    org, direction = generate_ray(scene.camera, sx, sy)

    ones = jnp.ones((n,), jnp.float32)
    zeros = jnp.zeros((n,), jnp.float32)
    state = _PtState(
        org=org,
        direction=direction,
        weight=V3(ones, ones, ones),
        color=V3(zeros, zeros, zeros),
        last_specular=jnp.ones((n,), bool),
        last_pdf_w=ones,
        alive=jnp.ones((n,), bool),
    )

    def bounce(i, state: _PtState):
        path_length = i + 1  # reference pathLength counter
        hit = intersect(scene, state.org, state.direction)
        # Clamp miss-lane distances (1e36): masked lanes must not mint
        # inf/NaN (would poison reverse-mode gradients via 0*inf).
        dist_safe = jnp.where(hit.hit, hit.dist, 1.0)
        hit_point = state.org + state.direction * dist_safe
        isect_dist = dist_safe + EPS_RAY

        color = state.color

        # --- Miss: background radiance (pathtracer.hxx:73-97).
        if has_background:
            bg = light_ops.get_radiance(
                scene.lights,
                jnp.full((n,), scene.background_idx, jnp.int32),
                scene.scene_sphere,
                state.direction,
            )
            # For the background GetRadiance "cheats": directPdfA is W.
            mis = jnp.where(
                (path_length > 1) & ~state.last_specular,
                _mis2(state.last_pdf_w, bg.direct_pdf_a * light_pick_prob),
                1.0,
            )
            take_bg = (
                state.alive
                & ~hit.hit
                & (path_length >= min_path_length)
                & max_gt_zero(bg.radiance)
            )
            color = color + v3_where(
                take_bg, state.weight * bg.radiance * mis, 0.0
            )

        alive = state.alive & hit.hit

        b = bsdf_ops.setup(
            scene.materials, state.direction, hit.normal, hit.mat_id, hit.hit
        )
        alive = alive & b.valid

        # --- Direct light hit (pathtracer.hxx:107-129).
        hit_light = alive & (hit.light_id >= 0)
        lr = light_ops.get_radiance(
            scene.lights, hit.light_id, scene.scene_sphere, state.direction
        )
        direct_pdf_w = pdf_a_to_w(
            lr.direct_pdf_a, isect_dist, b.cos_theta_fix()
        )
        mis_l = jnp.where(
            (path_length > 1) & ~state.last_specular,
            _mis2(state.last_pdf_w, direct_pdf_w * light_pick_prob),
            1.0,
        )
        take_l = (
            hit_light
            & (path_length >= min_path_length)
            & max_gt_zero(lr.radiance)
        )
        color = color + v3_where(take_l, state.weight * lr.radiance * mis_l, 0.0)
        alive = alive & ~hit_light  # lights do not reflect

        alive = alive & (path_length < max_path_length) & (b.cont_prob > 0.0)

        # --- Next event estimation (pathtracer.hxx:138-173).
        u = rng.uniform_slots(
            base_seed,
            rng.make_stream(iteration, rng.STAGE_CAMERA_NEE, i),
            pix,
            3,
            rng_kind,
        )
        light_id = jnp.minimum(
            (u[:, 0] * light_count).astype(jnp.int32), light_count - 1
        )
        ill = light_ops.illuminate(
            scene.lights, light_id, scene.scene_sphere, hit_point,
            u[:, 1], u[:, 2],
        )
        factor, cos_out, bsdf_pdf_w, _ = bsdf_ops.evaluate(
            scene.materials, b, ill.dir_to_light
        )
        light_is_delta = scene.lights.is_delta[
            jnp.clip(light_id, 0, light_count - 1)
        ]
        nee_weight = jnp.where(
            light_is_delta,
            1.0,
            _mis2(ill.direct_pdf_w * light_pick_prob, bsdf_pdf_w * b.cont_prob),
        )
        contrib = (ill.radiance * factor) * (
            nee_weight * cos_out * _safe_div(
                1.0, light_pick_prob * ill.direct_pdf_w
            )
        )
        nee_ok = (
            alive
            & ~b.is_delta
            & (path_length + 1 >= min_path_length)
            & max_gt_zero(ill.radiance)
            & max_gt_zero(factor)
            & max_gt_zero(contrib)
        )
        shadowed = occluded(scene, hit_point, ill.dir_to_light, ill.distance)
        color = color + v3_where(nee_ok & ~shadowed, state.weight * contrib, 0.0)

        # --- Continue random walk (pathtracer.hxx:176-209).
        w = rng.uniform_slots(
            base_seed,
            rng.make_stream(iteration, rng.STAGE_CAMERA_WALK, i),
            pix,
            4,
            rng_kind,
        )
        s_factor, s_dir, s_pdf, s_cos, s_event, s_keep = bsdf_ops.sample(
            scene.materials, b, w[:, 0], w[:, 1], w[:, 2], fix_is_light=False
        )
        alive = alive & s_keep

        cont_prob = b.cont_prob
        last_specular = (s_event & bsdf_ops.EV_SPECULAR) != 0
        last_pdf_w = s_pdf * cont_prob

        rr_kill = (cont_prob < 1.0) & (w[:, 3] > cont_prob)
        alive = alive & ~rr_kill
        s_pdf = jnp.where(cont_prob < 1.0, s_pdf * cont_prob, s_pdf)

        new_weight = state.weight * s_factor * _safe_div(s_cos, s_pdf)
        new_org = hit_point + s_dir * EPS_RAY

        return _PtState(
            org=v3_where(alive, new_org, state.org),
            direction=v3_where(alive, s_dir, state.direction),
            weight=v3_where(alive, new_weight, state.weight),
            color=color,
            last_specular=jnp.where(alive, last_specular, state.last_specular),
            last_pdf_w=jnp.where(alive, last_pdf_w, state.last_pdf_w),
            alive=alive,
        )

    state = jax.lax.fori_loop(0, max_path_length, bounce, state)

    # Own-pixel accumulate: floor(sx) == pix % res_x (jitter in [0,1)).
    fb = add_color_at_pix(new_fb_planes(res_x, res_y), pix, state.color)
    return fb.to_array()


@partial(
    jax.jit,
    static_argnames=("res_x", "res_y", "base_seed", "max_path_length",
                     "rng_kind",
                     "min_path_length"),
)
def render_iteration(
    scene: SceneData,
    iteration,
    res_x: int,
    res_y: int,
    base_seed: int = 1234,
    max_path_length: int = 10,
    min_path_length: int = 0,
    rng_kind: str = "threefry",
) -> jnp.ndarray:
    """Single-device PT pass -> accumulation image [resY,resX,3]."""
    pix = jnp.arange(res_x * res_y, dtype=jnp.uint32)
    return render_core(scene, iteration, pix, res_x, res_y, base_seed,
                       max_path_length, min_path_length, rng_kind)
