"""Wavefront Vertex Connection and Merging (lt / ppm / bpm / bpt / vcm).

Re-architecture of the reference's ``VertexCM`` (vertexcm.hxx:61-1031), the
five-algorithm family switched by (use_vc, use_vm, light_trace_only, ppm)
static flags, as a three-stage wavefront pipeline:

  1. *Light stage*: all ``N = resX*resY`` light sub-paths advance one bounce
     per ``lax.fori_loop`` step; non-delta vertices are written to fixed
     per-path slots ``[maxL, N, ...]`` (replacing the reference's ragged
     ``mPathEnds`` CSR pairing, vertexcm.hxx:311-312) and splat onto the
     framebuffer via differentiable scatter-add (ConnectToCamera).
  2. *Grid stage* (merging only): sorted-cell gather hashgrid over all stored
     light vertices (see ops/hashgrid.py).
  3. *Camera stage*: camera sub-paths advance bounce-by-bounce doing the four
     contribution techniques per vertex (hit-light radiance, connect-to-light
     NEE, connect to the same-index light path's vertices, merge against the
     grid), with the dVCM/dVC/dVM MIS recursion carried per lane.

The per-lane MIS recursion implements the tech-report equations exactly as
the reference does; equation references [tech. rep. (NN)] use the same
numbering as vertexcm.hxx comments.

Because camera path *i* connects only to light path *i* (vertexcm.hxx:
498-526), sharding both stages by path index makes vertex connection
shard-local; only the merging grid needs cross-shard light vertices.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import rng
from ..core.vecmath import EPS_RAY, PI_F, dot, len_sqr, pdf_w_to_a, sqr
from ..ops import bsdf as bsdf_ops
from ..ops import hashgrid as grid_ops
from ..ops import lights as light_ops
from ..ops.intersect import intersect, occluded
from ..scene.camera import check_raster, generate_ray, world_to_raster
from ..scene.scene import SceneData
from ..io.framebuffer import add_color


def _safe_div(a, b):
    return a / jnp.where(b == 0.0, 1.0, b)


def _mis(pdf):
    """Balance heuristic power (vertexcm.hxx:552-557)."""
    return pdf


class SubPathState(NamedTuple):
    """vertexcm.hxx:64-76 as SoA."""

    origin: jnp.ndarray        # [N,3]
    direction: jnp.ndarray     # [N,3]
    throughput: jnp.ndarray    # [N,3]
    is_finite_light: jnp.ndarray  # [N] bool
    specular_path: jnp.ndarray    # [N] bool
    d_vcm: jnp.ndarray         # [N]
    d_vc: jnp.ndarray          # [N]
    d_vm: jnp.ndarray          # [N]
    alive: jnp.ndarray         # [N] bool


class LightVertices(NamedTuple):
    """Fixed-slot light vertex storage [maxL, N, ...] (PathVertex<true>).

    The vertex BSDF is reconstructed from (in_dir, normal, mat_id) at use
    time — cheaper than storing frames/probabilities, and bitwise identical
    because Setup is deterministic.
    """

    position: jnp.ndarray    # [L,N,3]
    throughput: jnp.ndarray  # [L,N,3]
    in_dir: jnp.ndarray      # [L,N,3] ray direction arriving at the vertex
    normal: jnp.ndarray      # [L,N,3] geometric normal at the vertex
    mat_id: jnp.ndarray      # [L,N]
    d_vcm: jnp.ndarray       # [L,N]
    d_vc: jnp.ndarray        # [L,N]
    d_vm: jnp.ndarray        # [L,N]
    valid: jnp.ndarray       # [L,N] bool; slot i holds pathLength == i+1


class VcmMisc(NamedTuple):
    """Per-iteration constants (vertexcm.hxx:294-308)."""

    radius: jnp.ndarray
    radius_sqr: jnp.ndarray
    vm_normalization: jnp.ndarray
    mis_vm_weight: jnp.ndarray
    mis_vc_weight: jnp.ndarray
    light_sub_path_count: jnp.ndarray


def compute_misc(
    scene: SceneData, iteration, n_light_paths, radius_factor, radius_alpha,
    use_vc: bool, use_vm: bool,
) -> VcmMisc:
    base_radius = radius_factor * scene.scene_sphere.radius
    radius = base_radius / jnp.power(
        jnp.asarray(iteration, jnp.float32) + 1.0,
        0.5 * (1.0 - radius_alpha),
    )
    radius = jnp.maximum(radius, 1e-7)
    radius_sqr = sqr(radius)
    count = jnp.asarray(n_light_paths, jnp.float32)
    eta_vcm = PI_F * radius_sqr * count
    return VcmMisc(
        radius=radius,
        radius_sqr=radius_sqr,
        vm_normalization=1.0 / (radius_sqr * PI_F * count),
        mis_vm_weight=_mis(eta_vcm) if use_vm else jnp.float32(0.0),
        mis_vc_weight=_mis(1.0 / eta_vcm) if use_vc else jnp.float32(0.0),
        light_sub_path_count=count,
    )


# ---------------------------------------------------------------------------
# Light stage
# ---------------------------------------------------------------------------


def generate_light_sample(
    scene: SceneData, misc: VcmMisc, pix, iteration, base_seed: int
) -> SubPathState:
    """GenerateLightSample (vertexcm.hxx:816-858)."""
    n = pix.shape[0]
    light_count = scene.lights.kind.shape[0]
    pick_prob = 1.0 / light_count

    u = rng.uniform_slots(
        base_seed, rng.make_stream(iteration, rng.STAGE_LIGHT_EMIT), pix, 5
    )
    light_id = jnp.minimum(
        (u[:, 0] * light_count).astype(jnp.int32), light_count - 1
    )
    em = light_ops.emit(
        scene.lights, light_id, scene.scene_sphere, u[:, 1:3], u[:, 3:5]
    )
    emission_pdf = em.emission_pdf_w * pick_prob
    direct_pdf = em.direct_pdf_a * pick_prob

    throughput = em.energy * _safe_div(1.0, emission_pdf)[:, None]

    d_vcm = _mis(_safe_div(direct_pdf, emission_pdf))
    used_cos = jnp.where(em.is_finite, em.cos_theta_light, 1.0)
    d_vc = jnp.where(
        em.is_delta, 0.0, _mis(_safe_div(used_cos, emission_pdf))
    )
    d_vm = d_vc * misc.mis_vc_weight

    return SubPathState(
        origin=em.position,
        direction=em.direction,
        throughput=throughput,
        is_finite_light=em.is_finite,
        specular_path=jnp.ones((n,), bool),
        d_vcm=d_vcm,
        d_vc=d_vc,
        d_vm=d_vm,
        alive=emission_pdf > 0.0,
    )


def connect_to_camera(
    scene: SceneData, misc: VcmMisc, state: SubPathState, hit_point,
    b: bsdf_ops.BsdfState, enabled_mask, light_trace_only: bool,
):
    """ConnectToCamera (vertexcm.hxx:862-933) — returns (raster_xy, contrib)."""
    cam = scene.camera
    dir_to_cam_raw = cam.position - hit_point
    in_front = dot(cam.forward, -dir_to_cam_raw) > 0.0

    image_pos = world_to_raster(cam, hit_point)
    on_screen = check_raster(cam, image_pos)

    dist_eye2 = jnp.maximum(len_sqr(dir_to_cam_raw), 1e-30)
    distance = jnp.sqrt(dist_eye2)
    dir_to_cam = dir_to_cam_raw / distance[:, None]

    factor, cos_to_cam, _, rev_pdf_w = bsdf_ops.evaluate(
        scene.materials, b, dir_to_cam
    )
    nonzero = jnp.max(factor, axis=-1) > 0.0
    rev_pdf_w = rev_pdf_w * b.cont_prob

    cos_at_cam = dot(cam.forward, -dir_to_cam)
    img_to_cam_dist = _safe_div(cam.image_plane_dist, cos_at_cam)
    img_to_solid_angle = _safe_div(sqr(img_to_cam_dist), cos_at_cam)
    img_to_surface = img_to_solid_angle * jnp.abs(cos_to_cam) / dist_eye2
    camera_pdf_a = img_to_surface

    # [tech. rep. (46)]
    w_light = _mis(camera_pdf_a / misc.light_sub_path_count) * (
        misc.mis_vm_weight + state.d_vcm + state.d_vc * _mis(rev_pdf_w)
    )
    mis_weight = (
        jnp.ones_like(w_light) if light_trace_only else 1.0 / (w_light + 1.0)
    )

    surface_to_img = _safe_div(1.0, img_to_surface)
    contrib = (
        mis_weight[:, None]
        * state.throughput
        * factor
        / (misc.light_sub_path_count * surface_to_img)[:, None]
    )

    ok = enabled_mask & in_front & on_screen & nonzero
    ok = ok & (jnp.max(contrib, axis=-1) > 0.0)
    shadowed = occluded(scene, hit_point, dir_to_cam, distance)
    ok = ok & ~shadowed
    return image_pos, jnp.where(ok[:, None], contrib, 0.0)


def sample_scattering(
    scene: SceneData, misc: VcmMisc, state: SubPathState, hit_point,
    b: bsdf_ops.BsdfState, u4, fix_is_light: bool,
) -> SubPathState:
    """SampleScattering (vertexcm.hxx:937-1006) — masked wavefront version."""
    factor, new_dir, dir_pdf_w, cos_out, event, keep = bsdf_ops.sample(
        scene.materials, b, u4[:, 0:3], fix_is_light=fix_is_light
    )
    alive = state.alive & keep

    specular = (event & bsdf_ops.EV_SPECULAR) != 0
    rev_direct, rev_reverse = bsdf_ops.pdf(scene.materials, b, new_dir)
    rev_pdf_w = jnp.where(specular, dir_pdf_w, rev_reverse)

    cont = b.cont_prob
    alive = alive & (u4[:, 3] <= cont)
    dir_pdf_w = dir_pdf_w * cont
    rev_pdf_w = rev_pdf_w * cont

    inv_dir_pdf = _safe_div(1.0, dir_pdf_w)
    cos_over_pdf = cos_out * inv_dir_pdf

    # Specular [tech. rep. (53)-(55)] / non-specular [(34)-(36)].
    d_vcm = jnp.where(specular, 0.0, _mis(inv_dir_pdf))
    d_vc = jnp.where(
        specular,
        state.d_vc * _mis(cos_out),
        _mis(cos_over_pdf)
        * (state.d_vc * _mis(rev_pdf_w) + state.d_vcm + misc.mis_vm_weight),
    )
    d_vm = jnp.where(
        specular,
        state.d_vm * _mis(cos_out),
        _mis(cos_over_pdf)
        * (state.d_vm * _mis(rev_pdf_w) + state.d_vcm * misc.mis_vc_weight + 1.0),
    )
    specular_path = state.specular_path & specular

    throughput = state.throughput * factor * cos_over_pdf[:, None]

    sel = lambda new, old: jnp.where(alive[:, None] if new.ndim == 2 else alive, new, old)
    return SubPathState(
        origin=sel(hit_point, state.origin),
        direction=sel(new_dir, state.direction),
        throughput=sel(throughput, state.throughput),
        is_finite_light=state.is_finite_light,
        specular_path=sel(specular_path, state.specular_path),
        d_vcm=sel(d_vcm, state.d_vcm),
        d_vc=sel(d_vc, state.d_vc),
        d_vm=sel(d_vm, state.d_vm),
        alive=alive,
    )


def trace_light_paths(
    scene: SceneData, misc: VcmMisc, pix, iteration, fb,
    base_seed: int, max_path_length: int, min_path_length: int,
    use_vc: bool, use_vm: bool, light_trace_only: bool,
):
    """Light stage (vertexcm.hxx:321-396). Returns (vertices, fb)."""
    n = pix.shape[0]
    max_l = max(1, max_path_length - 1)
    store_vertices = use_vc or use_vm
    connect_cam = use_vc or light_trace_only

    state = generate_light_sample(scene, misc, pix, iteration, base_seed)

    verts = LightVertices(
        position=jnp.zeros((max_l, n, 3), jnp.float32),
        throughput=jnp.zeros((max_l, n, 3), jnp.float32),
        in_dir=jnp.zeros((max_l, n, 3), jnp.float32),
        normal=jnp.zeros((max_l, n, 3), jnp.float32),
        mat_id=jnp.zeros((max_l, n), jnp.int32),
        d_vcm=jnp.zeros((max_l, n), jnp.float32),
        d_vc=jnp.zeros((max_l, n), jnp.float32),
        d_vm=jnp.zeros((max_l, n), jnp.float32),
        valid=jnp.zeros((max_l, n), bool),
    )

    def bounce(i, carry):
        state, verts, fb, rays = carry
        path_length = i + 1

        rays = rays + jnp.sum(state.alive.astype(jnp.int32))
        org = state.origin + state.direction * EPS_RAY
        hit = intersect(scene, org, state.direction)
        alive = state.alive & hit.hit
        # Miss lanes carry dist = 1e36; clamp before any arithmetic so inf/
        # NaN can never be minted in masked-off computations.
        dist_safe = jnp.where(hit.hit, hit.dist, 1.0)
        hit_point = org + state.direction * dist_safe[:, None]
        isect_dist = dist_safe + EPS_RAY

        b = bsdf_ops.setup(
            scene.materials, state.direction, hit.normal, hit.mat_id, hit.hit
        )
        alive = alive & b.valid

        # MIS completion after tracing (vertexcm.hxx:351-360). Masked by
        # `alive`: dead lanes carry dist = 1e36 whose square overflows to inf
        # and would mint 0*inf NaNs downstream.
        infinite_first = (path_length == 1) & ~state.is_finite_light
        d_vcm = jnp.where(
            infinite_first, state.d_vcm, state.d_vcm * _mis(sqr(isect_dist))
        )
        abs_cos = jnp.abs(b.cos_theta_fix())
        inv_cos = _safe_div(1.0, _mis(abs_cos))
        d_vcm = jnp.where(alive, d_vcm * inv_cos, state.d_vcm)
        d_vc = jnp.where(alive, state.d_vc * inv_cos, state.d_vc)
        d_vm = jnp.where(alive, state.d_vm * inv_cos, state.d_vm)
        state = state._replace(d_vcm=d_vcm, d_vc=d_vc, d_vm=d_vm, alive=alive)

        # Store vertex (vertexcm.hxx:364-377).
        if store_vertices:
            can_store = alive & ~b.is_delta
            upd = lambda arr, val: jax.lax.dynamic_update_index_in_dim(
                arr, val, i, axis=0
            )
            verts = LightVertices(
                position=upd(verts.position, hit_point),
                throughput=upd(verts.throughput, state.throughput),
                in_dir=upd(verts.in_dir, state.direction),
                normal=upd(verts.normal, hit.normal),
                mat_id=upd(verts.mat_id, hit.mat_id),
                d_vcm=upd(verts.d_vcm, state.d_vcm),
                d_vc=upd(verts.d_vc, state.d_vc),
                d_vm=upd(verts.d_vm, state.d_vm),
                valid=upd(verts.valid, can_store),
            )

        # Connect to camera (vertexcm.hxx:380-384).
        if connect_cam:
            enabled = (
                alive & ~b.is_delta & (path_length + 1 >= min_path_length)
            )
            raster, contrib = connect_to_camera(
                scene, misc, state, hit_point, b, enabled, light_trace_only
            )
            fb = add_color(fb, raster, contrib)
            rays = rays + jnp.sum(enabled.astype(jnp.int32))  # shadow rays

        # Path-too-long termination (vertexcm.hxx:387).
        state = state._replace(
            alive=alive & (path_length + 2 <= max_path_length)
        )

        u4 = rng.uniform_slots(
            base_seed,
            rng.make_stream(iteration, rng.STAGE_LIGHT_WALK, i),
            pix,
            4,
        )
        state = sample_scattering(
            scene, misc, state, hit_point, b, u4, fix_is_light=True
        )
        return state, verts, fb, rays

    state, verts, fb, rays = jax.lax.fori_loop(
        0, max_l, bounce, (state, verts, fb, jnp.zeros((), jnp.int32))
    )
    return verts, fb, rays


# ---------------------------------------------------------------------------
# Camera stage helpers
# ---------------------------------------------------------------------------


def generate_camera_sample(
    scene: SceneData, misc: VcmMisc, pix, res_x: int, iteration, base_seed: int
):
    """GenerateCameraSample (vertexcm.hxx:564-606)."""
    n = pix.shape[0]
    cam = scene.camera
    x = (pix % res_x).astype(jnp.float32)
    y = (pix // res_x).astype(jnp.float32)
    jitter = rng.uniform_slots(
        base_seed, rng.make_stream(iteration, rng.STAGE_CAMERA_JITTER), pix, 2
    )
    sample = jnp.stack([x, y], axis=-1) + jitter

    org, direction = generate_ray(cam, sample)
    cos_at_cam = dot(cam.forward, direction)
    img_to_cam_dist = cam.image_plane_dist / cos_at_cam
    camera_pdf_w = sqr(img_to_cam_dist) / cos_at_cam

    state = SubPathState(
        origin=org,
        direction=direction,
        throughput=jnp.ones((n, 3), jnp.float32),
        is_finite_light=jnp.zeros((n,), bool),
        specular_path=jnp.ones((n,), bool),
        d_vcm=_mis(misc.light_sub_path_count / camera_pdf_w),
        d_vc=jnp.zeros((n,), jnp.float32),
        d_vm=jnp.zeros((n,), jnp.float32),
        alive=jnp.ones((n,), bool),
    )
    return sample, state


def get_light_radiance_weighted(
    scene: SceneData, state: SubPathState, light_id, ray_dir, path_length,
    use_vc: bool, use_vm: bool,
):
    """GetLightRadiance (vertexcm.hxx:617-658): radiance * MIS weight [N,3]."""
    light_count = scene.lights.kind.shape[0]
    pick_prob = 1.0 / light_count

    lr = light_ops.get_radiance(
        scene.lights, light_id, scene.scene_sphere, ray_dir
    )
    nonzero = jnp.max(lr.radiance, axis=-1) > 0.0

    direct_pdf = lr.direct_pdf_a * pick_prob
    emission_pdf = lr.emission_pdf_w * pick_prob

    # [tech. rep. (42)-(43)]
    w_camera = _mis(direct_pdf) * state.d_vcm + _mis(emission_pdf) * state.d_vc
    mis_weight = 1.0 / (1.0 + w_camera)

    if use_vm and not use_vc:  # merging-only: purely specular paths give light
        weighted = jnp.where(
            state.specular_path[:, None], lr.radiance, 0.0
        )
    else:
        weighted = mis_weight[:, None] * lr.radiance
    weighted = jnp.where((path_length == 1)[..., None], lr.radiance, weighted)
    return jnp.where(nonzero[:, None], weighted, 0.0)


def direct_illumination(
    scene: SceneData, misc: VcmMisc, state: SubPathState, hit_point,
    b: bsdf_ops.BsdfState, u3,
):
    """DirectIllumination (vertexcm.hxx:663-738): NEE contribution [N,3]."""
    light_count = scene.lights.kind.shape[0]
    pick_prob = 1.0 / light_count

    light_id = jnp.minimum(
        (u3[:, 0] * light_count).astype(jnp.int32), light_count - 1
    )
    ill = light_ops.illuminate(
        scene.lights, light_id, scene.scene_sphere, hit_point, u3[:, 1:3]
    )
    ok = jnp.max(ill.radiance, axis=-1) > 0.0

    factor, cos_to_light, dir_pdf_w, rev_pdf_w = bsdf_ops.evaluate(
        scene.materials, b, ill.dir_to_light
    )
    ok = ok & (jnp.max(factor, axis=-1) > 0.0)

    cont = b.cont_prob
    light_is_delta = scene.lights.is_delta[
        jnp.clip(light_id, 0, light_count - 1)
    ]
    dir_pdf_w = jnp.where(light_is_delta, 0.0, dir_pdf_w * cont)
    rev_pdf_w = rev_pdf_w * cont

    # [tech. rep. (44)]
    w_light = _mis(_safe_div(dir_pdf_w, pick_prob * ill.direct_pdf_w))
    # [tech. rep. (45)]
    ratio = _safe_div(
        ill.emission_pdf_w * cos_to_light,
        ill.direct_pdf_w * ill.cos_at_light,
    )
    w_camera = _mis(ratio) * (
        misc.mis_vm_weight + state.d_vcm + state.d_vc * _mis(rev_pdf_w)
    )
    mis_weight = 1.0 / (w_light + 1.0 + w_camera)

    contrib = (
        mis_weight * cos_to_light * _safe_div(1.0, pick_prob * ill.direct_pdf_w)
    )[:, None] * (ill.radiance * factor)

    ok = ok & (jnp.max(contrib, axis=-1) > 0.0)
    shadowed = occluded(scene, hit_point, ill.dir_to_light, ill.distance)
    return jnp.where((ok & ~shadowed)[:, None], contrib, 0.0)


def connect_vertices(
    scene: SceneData, misc: VcmMisc, cam_state: SubPathState, cam_hit_point,
    cam_b: bsdf_ops.BsdfState, lv_pos, lv_in_dir, lv_normal, lv_mat,
    lv_d_vcm, lv_d_vc, lv_valid,
):
    """ConnectVertices (vertexcm.hxx:743-809): contribution [N,3] (no
    throughputs; caller multiplies by camera+light throughputs)."""
    direction_raw = lv_pos - cam_hit_point
    dist2 = jnp.maximum(len_sqr(direction_raw), 1e-30)
    distance = jnp.sqrt(dist2)
    direction = direction_raw / distance[:, None]

    cam_factor, cos_camera, cam_dir_pdf_w, cam_rev_pdf_w = bsdf_ops.evaluate(
        scene.materials, cam_b, direction
    )
    ok = jnp.max(cam_factor, axis=-1) > 0.0

    cam_cont = cam_b.cont_prob
    cam_dir_pdf_w = cam_dir_pdf_w * cam_cont
    cam_rev_pdf_w = cam_rev_pdf_w * cam_cont

    # Reconstruct the light vertex BSDF (deterministic Setup re-run).
    lb = bsdf_ops.setup(
        scene.materials, lv_in_dir, lv_normal, lv_mat, lv_valid
    )
    light_factor, cos_light, light_dir_pdf_w, light_rev_pdf_w = (
        bsdf_ops.evaluate(scene.materials, lb, -direction)
    )
    ok = ok & (jnp.max(light_factor, axis=-1) > 0.0)

    light_cont = lb.cont_prob
    light_dir_pdf_w = light_dir_pdf_w * light_cont
    light_rev_pdf_w = light_rev_pdf_w * light_cont

    geometry_term = cos_light * cos_camera / dist2
    ok = ok & (geometry_term >= 0.0)

    cam_dir_pdf_a = pdf_w_to_a(cam_dir_pdf_w, distance, cos_light)
    light_dir_pdf_a = pdf_w_to_a(light_dir_pdf_w, distance, cos_camera)

    # [tech. rep. (40)-(41)]
    w_light = _mis(cam_dir_pdf_a) * (
        misc.mis_vm_weight + lv_d_vcm + lv_d_vc * _mis(light_rev_pdf_w)
    )
    w_camera = _mis(light_dir_pdf_a) * (
        misc.mis_vm_weight + cam_state.d_vcm + cam_state.d_vc * _mis(cam_rev_pdf_w)
    )
    mis_weight = 1.0 / (w_light + 1.0 + w_camera)

    contrib = (mis_weight * geometry_term)[:, None] * cam_factor * light_factor
    ok = ok & (jnp.max(contrib, axis=-1) > 0.0) & lv_valid
    shadowed = occluded(scene, cam_hit_point, direction, distance)
    return jnp.where((ok & ~shadowed)[:, None], contrib, 0.0)


def merge_vertices(
    scene: SceneData, misc: VcmMisc, cam_state: SubPathState, cam_hit_point,
    cam_b: bsdf_ops.BsdfState, flat_verts, grid, num_cells: int, k: int,
    cam_path_length, max_path_length: int, min_path_length: int, ppm: bool,
):
    """Vertex merging via hashgrid range query (RangeQuery::Process,
    vertexcm.hxx:130-169). Returns summed contribution [N,3]."""
    (fv_pos, fv_thr, fv_wfix, fv_dvcm, fv_dvm, fv_cont, fv_len, fv_valid) = (
        flat_verts
    )
    idx_all, mask_all = grid_ops.query_candidates(
        grid, num_cells, cam_hit_point, k
    )
    nq, nc = idx_all.shape

    # Process candidates in chunks along the candidate axis: the HBM cost of
    # a full [N, 8k, ...] gather at 512x512 is tens of GB, while per-chunk
    # temporaries stay ~100 MB and XLA pipelines the sequential chunks.
    chunk = 16
    n_chunks = (nc + chunk - 1) // chunk
    pad = n_chunks * chunk - nc
    if pad:
        idx_all = jnp.pad(idx_all, ((0, 0), (0, pad)))
        mask_all = jnp.pad(mask_all, ((0, 0), (0, pad)))

    cam_bc = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(
            a[:, None] if a.ndim == 1 else a[:, None, :],
            (nq, chunk) + a.shape[1:],
        ),
        cam_b,
    )

    def do_chunk(c, acc):
        idx = jax.lax.dynamic_slice_in_dim(idx_all, c * chunk, chunk, axis=1)
        mask = jax.lax.dynamic_slice_in_dim(mask_all, c * chunk, chunk, axis=1)

        p = fv_pos[idx]          # [N, chunk, 3]
        within = len_sqr(p - cam_hit_point[:, None, :]) <= misc.radius_sqr
        mask = mask & within & fv_valid[idx]

        total_len = fv_len[idx] + cam_path_length
        mask = (
            mask & (total_len <= max_path_length)
            & (total_len >= min_path_length)
        )

        light_dir = fv_wfix[idx]
        factor, _, dir_pdf_w, rev_pdf_w = bsdf_ops.evaluate(
            scene.materials, cam_bc, light_dir
        )
        mask = mask & (jnp.max(factor, axis=-1) > 0.0)

        dir_pdf_w = dir_pdf_w * cam_b.cont_prob[:, None]
        rev_pdf_w = rev_pdf_w * fv_cont[idx]

        # [tech. rep. (38)-(39)]
        w_light = (
            fv_dvcm[idx] * misc.mis_vc_weight + fv_dvm[idx] * _mis(dir_pdf_w)
        )
        w_camera = (
            cam_state.d_vcm[:, None] * misc.mis_vc_weight
            + cam_state.d_vm[:, None] * _mis(rev_pdf_w)
        )
        if ppm:
            mis_weight = jnp.ones_like(w_light)
        else:
            mis_weight = 1.0 / (w_light + 1.0 + w_camera)

        contrib = mis_weight[..., None] * factor * fv_thr[idx]
        contrib = jnp.where(mask[..., None], contrib, 0.0)
        return acc + jnp.sum(contrib, axis=1)

    acc = jnp.zeros((nq, 3), jnp.float32)
    return jax.lax.fori_loop(0, n_chunks, do_chunk, acc)


# ---------------------------------------------------------------------------
# Full iteration
# ---------------------------------------------------------------------------


def render_iteration_core(
    scene: SceneData,
    iteration,
    pix,
    res_x: int,
    res_y: int,
    n_paths_global: int,
    base_seed: int = 1234,
    max_path_length: int = 10,
    min_path_length: int = 0,
    radius_factor: float = 0.003,
    radius_alpha: float = 0.75,
    use_vc: bool = True,
    use_vm: bool = True,
    light_trace_only: bool = False,
    ppm: bool = False,
    merge_k: int = 32,
    axis_name: str | None = None,
) -> jnp.ndarray:
    """One VCM-family iteration over the given (possibly sharded) path ids.

    ``pix`` holds *global* path/pixel indices — the RNG streams and the
    camera-pixel mapping depend only on them, so any partition of
    ``arange(n_paths_global)`` over devices reproduces the single-device
    image exactly. With ``axis_name`` set (inside shard_map), light vertices
    are all-gathered for merging (the only cross-shard data dependency:
    camera path i connects only to light path i, which lives on the same
    shard, but merging needs every photon). MIS constants always use the
    *global* light path count (vertexcm.hxx:303-308).
    """
    n = pix.shape[0]
    misc = compute_misc(
        scene, iteration, n_paths_global, radius_factor, radius_alpha,
        use_vc, use_vm,
    )

    fb = jnp.zeros((res_y, res_x, 3), jnp.float32)

    # ---- Stage 1: light sub-paths.
    verts, fb, light_rays = trace_light_paths(
        scene, misc, pix, iteration, fb, base_seed, max_path_length,
        min_path_length, use_vc, use_vm, light_trace_only,
    )
    ray_count = light_rays

    if light_trace_only:
        if axis_name is not None:
            fb = jax.lax.psum(fb, axis_name)
            ray_count = jax.lax.psum(ray_count, axis_name)
        return fb, ray_count

    # ---- Stage 2: hashgrid over light vertices (merging only).
    max_l = verts.valid.shape[0]
    num_cells = n_paths_global  # vertexcm.hxx:405-407
    if use_vm:
        flat = lambda a: a.reshape((max_l * n,) + a.shape[2:])
        fv_pos = flat(verts.position)
        fv_valid = flat(verts.valid)
        fv_thr = flat(verts.throughput)
        fv_wfix = -flat(verts.in_dir)
        fv_dvcm = flat(verts.d_vcm)
        fv_dvm = flat(verts.d_vm)
        # Per-vertex continuation prob for the merge MIS (reconstructed
        # deterministically from the stored incoming dir / normal / mat).
        lb = bsdf_ops.setup(
            scene.materials, flat(verts.in_dir), flat(verts.normal),
            flat(verts.mat_id), fv_valid,
        )
        fv_cont = lb.cont_prob
        fv_len = (
            jnp.broadcast_to(
                jnp.arange(1, max_l + 1, dtype=jnp.int32)[:, None], (max_l, n)
            ).reshape(-1)
        )
        if axis_name is not None:
            # Cross-shard photon exchange: gather every shard's vertices so
            # local camera vertices can merge against the global photon map
            # (the reference reads them from shared memory,
            # vertexcm.hxx:530-538).
            ag = lambda a: jax.lax.all_gather(a, axis_name, tiled=True)
            fv_pos, fv_thr, fv_wfix = ag(fv_pos), ag(fv_thr), ag(fv_wfix)
            fv_dvcm, fv_dvm, fv_cont = ag(fv_dvcm), ag(fv_dvm), ag(fv_cont)
            fv_len, fv_valid = ag(fv_len), ag(fv_valid)
        grid = grid_ops.build(fv_pos, fv_valid, misc.radius, num_cells)
        flat_verts = (
            fv_pos, fv_thr, fv_wfix, fv_dvcm, fv_dvm, fv_cont, fv_len,
            fv_valid,
        )
    else:
        grid = None
        flat_verts = None

    # ---- Stage 3: camera sub-paths.
    sample, state = generate_camera_sample(
        scene, misc, pix, res_x, iteration, base_seed
    )
    color = jnp.zeros((n, 3), jnp.float32)
    has_background = scene.background_idx >= 0

    def bounce(i, carry):
        state, color, rays = carry
        path_length = i + 1

        rays = rays + jnp.sum(state.alive.astype(jnp.int32))
        org = state.origin + state.direction * EPS_RAY
        hit = intersect(scene, org, state.direction)
        dist_safe = jnp.where(hit.hit, hit.dist, 1.0)
        hit_point = org + state.direction * dist_safe[:, None]
        isect_dist = dist_safe + EPS_RAY

        # Miss -> background radiance, using PRE-update MIS quantities
        # (vertexcm.hxx:434-447).
        if has_background:
            bg_contrib = get_light_radiance_weighted(
                scene, state,
                jnp.full((n,), scene.background_idx, jnp.int32),
                state.direction,
                jnp.full((n,), path_length, jnp.int32),
                use_vc, use_vm,
            )
            take_bg = (
                state.alive & ~hit.hit & (path_length >= min_path_length)
            )
            color = color + jnp.where(
                take_bg[:, None], state.throughput * bg_contrib, 0.0
            )

        alive = state.alive & hit.hit
        b = bsdf_ops.setup(
            scene.materials, state.direction, hit.normal, hit.mat_id, hit.hit
        )
        alive = alive & b.valid

        # MIS update (vertexcm.hxx:459-464), masked by alive (see light
        # stage: dead-lane dist^2 overflows).
        abs_cos = jnp.abs(b.cos_theta_fix())
        inv_cos = _safe_div(1.0, _mis(abs_cos))
        state = state._replace(
            d_vcm=jnp.where(
                alive, state.d_vcm * _mis(sqr(isect_dist)) * inv_cos,
                state.d_vcm,
            ),
            d_vc=jnp.where(alive, state.d_vc * inv_cos, state.d_vc),
            d_vm=jnp.where(alive, state.d_vm * inv_cos, state.d_vm),
        )

        # Hit a light source (vertexcm.hxx:468-479).
        hit_light = alive & (hit.light_id >= 0)
        light_contrib = get_light_radiance_weighted(
            scene, state, hit.light_id, state.direction,
            jnp.full((n,), path_length, jnp.int32), use_vc, use_vm,
        )
        take_light = hit_light & (path_length >= min_path_length)
        color = color + jnp.where(
            take_light[:, None], state.throughput * light_contrib, 0.0
        )
        alive = alive & ~hit_light

        # Too long for connections/merging (vertexcm.hxx:482-483).
        alive = alive & (path_length < max_path_length)
        state = state._replace(alive=alive)

        # VC: connect to a light source — NEE (vertexcm.hxx:487-494).
        if use_vc:
            u3 = rng.uniform_slots(
                base_seed,
                rng.make_stream(iteration, rng.STAGE_CAMERA_NEE, i),
                pix, 3,
            )
            nee = direct_illumination(scene, misc, state, hit_point, b, u3)
            nee_on = alive & ~b.is_delta & (path_length + 1 >= min_path_length)
            color = color + jnp.where(
                nee_on[:, None], state.throughput * nee, 0.0
            )
            rays = rays + jnp.sum(nee_on.astype(jnp.int32))  # shadow rays

        # VC: connect to this path's light vertices (vertexcm.hxx:498-526).
        if use_vc:
            def connect_slot(j, carry):
                color, rays = carry
                lv_len = j + 1
                full_len = lv_len + 1 + path_length
                in_range = (full_len >= min_path_length) & (
                    full_len <= max_path_length
                )
                lv_valid = verts.valid[j] & alive & ~b.is_delta & in_range
                c = connect_vertices(
                    scene, misc, state, hit_point, b,
                    verts.position[j], verts.in_dir[j], verts.normal[j],
                    verts.mat_id[j], verts.d_vcm[j], verts.d_vc[j], lv_valid,
                )
                color = color + jnp.where(
                    lv_valid[:, None],
                    state.throughput * verts.throughput[j] * c,
                    0.0,
                )
                rays = rays + jnp.sum(lv_valid.astype(jnp.int32))
                return color, rays

            color, rays = jax.lax.fori_loop(
                0, max_l, connect_slot, (color, rays)
            )

        # VM: merge with light vertices (vertexcm.hxx:530-538).
        if use_vm:
            merge_on = alive & ~b.is_delta
            mc = merge_vertices(
                scene, misc, state, hit_point, b, flat_verts, grid, num_cells,
                merge_k, path_length, max_path_length, min_path_length, ppm,
            )
            color = color + jnp.where(
                merge_on[:, None],
                state.throughput * misc.vm_normalization * mc,
                0.0,
            )
            if ppm:  # PPM ends the camera path at the first non-delta hit
                state = state._replace(alive=alive & b.is_delta)

        u4 = rng.uniform_slots(
            base_seed,
            rng.make_stream(iteration, rng.STAGE_CAMERA_WALK, i),
            pix, 4,
        )
        state = sample_scattering(
            scene, misc, state, hit_point, b, u4, fix_is_light=False
        )
        return state, color, rays

    state, color, cam_rays = jax.lax.fori_loop(
        0, max_path_length, bounce, (state, color, jnp.zeros((), jnp.int32))
    )
    ray_count = ray_count + cam_rays
    fb = add_color(fb, sample, color)
    if axis_name is not None:
        fb = jax.lax.psum(fb, axis_name)
        ray_count = jax.lax.psum(ray_count, axis_name)
    return fb, ray_count


@partial(
    jax.jit,
    static_argnames=(
        "res_x", "res_y", "base_seed", "max_path_length", "min_path_length",
        "use_vc", "use_vm", "light_trace_only", "ppm", "merge_k",
    ),
)
def render_iteration(
    scene: SceneData,
    iteration,
    res_x: int,
    res_y: int,
    base_seed: int = 1234,
    max_path_length: int = 10,
    min_path_length: int = 0,
    radius_factor: float = 0.003,
    radius_alpha: float = 0.75,
    use_vc: bool = True,
    use_vm: bool = True,
    light_trace_only: bool = False,
    ppm: bool = False,
    merge_k: int = 32,
) -> jnp.ndarray:
    """Single-device iteration -> accumulation image [resY,resX,3]."""
    n = res_x * res_y
    pix = jnp.arange(n, dtype=jnp.uint32)
    fb, _ = render_iteration_core(
        scene, iteration, pix, res_x, res_y, n, base_seed,
        max_path_length, min_path_length, radius_factor, radius_alpha,
        use_vc, use_vm, light_trace_only, ppm, merge_k, axis_name=None,
    )
    return fb


@partial(
    jax.jit,
    static_argnames=(
        "res_x", "res_y", "base_seed", "max_path_length", "min_path_length",
        "use_vc", "use_vm", "light_trace_only", "ppm", "merge_k",
    ),
)
def render_iteration_with_stats(
    scene: SceneData,
    iteration,
    res_x: int,
    res_y: int,
    base_seed: int = 1234,
    max_path_length: int = 10,
    min_path_length: int = 0,
    radius_factor: float = 0.003,
    radius_alpha: float = 0.75,
    use_vc: bool = True,
    use_vm: bool = True,
    light_trace_only: bool = False,
    ppm: bool = False,
    merge_k: int = 32,
):
    """Like render_iteration but also returns the traced-ray count (path
    segments + shadow/occlusion rays, the reference-comparable work metric)."""
    n = res_x * res_y
    pix = jnp.arange(n, dtype=jnp.uint32)
    return render_iteration_core(
        scene, iteration, pix, res_x, res_y, n, base_seed,
        max_path_length, min_path_length, radius_factor, radius_alpha,
        use_vc, use_vm, light_trace_only, ppm, merge_k, axis_name=None,
    )
