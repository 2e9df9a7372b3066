"""Wavefront Vertex Connection and Merging (lt / ppm / bpm / bpt / vcm).

Re-architecture of the reference's ``VertexCM`` (vertexcm.hxx:61-1031) — the
five-algorithm family switched by (use_vc, use_vm, light_trace_only, ppm)
static flags — as a TPU-native four-stage wavefront pipeline over
component-planar (SoA) vectors:

  1. *Light stage*: all N light sub-paths advance one bounce per
     ``lax.fori_loop`` step; non-delta vertices land in fixed per-path slots
     ``[maxL, N]`` (replacing the ragged ``mPathEnds`` CSR pairing,
     vertexcm.hxx:311-312) and splat onto the framebuffer via differentiable
     scatter-add (ConnectToCamera).
  2. *Grid stage* (merging only): photons cell-sorted with a keys-only
     packed radix sort (see ops/hashgrid.py — TPU argsort is pathological).
  3. *Camera stage*: camera sub-paths advance bounce-by-bounce doing
     hit-light radiance, NEE, and same-index light-path connections, with
     the dVCM/dVC/dVM MIS recursion carried per lane. Merge *queries*
     (the camera vertex + its MIS state) are recorded per bounce instead of
     merging inline.
  4. *Merge stage* (merging only): all recorded queries are processed in
     one pass — exact (query, photon) candidate pairs are expanded from the
     grid's CSR ranges (work scales with actual candidates, not padded cell
     capacity), distance-filtered, evaluated, and scatter-added back to the
     owning pixel. Merging is additive and independent of the walk, so
     deferring it is exactly equivalent to the reference's inline loop.

The per-lane MIS recursion implements the tech-report equations exactly as
the reference does; [tech. rep. (NN)] refs use vertexcm.hxx's numbering.

Because camera path i connects only to light path i (vertexcm.hxx:498-526),
sharding both stages by path index makes vertex connection shard-local; only
the photon map needs cross-shard exchange (all-gather).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import rng
from ..core.vec3 import V3, dot, len_sqr, max_gt_zero, v3_where
from ..core.vecmath import EPS_RAY, PI_F, pdf_w_to_a, sqr
from ..ops import bsdf as bsdf_ops
from ..ops import hashgrid as grid_ops
from ..ops import lights as light_ops
from ..ops.intersect import intersect, occluded
from ..scene.camera import check_raster, generate_ray, world_to_raster
from ..scene.scene import SceneData
from ..io.framebuffer import add_color, new_fb_planes


def _safe_div(a, b):
    return a / jnp.where(b == 0.0, 1.0, b)


def _mis(pdf):
    """Balance heuristic power (vertexcm.hxx:552-557)."""
    return pdf


class SubPathState(NamedTuple):
    """vertexcm.hxx:64-76 as SoA."""

    origin: V3
    direction: V3
    throughput: V3
    is_finite_light: jnp.ndarray  # [N] bool
    specular_path: jnp.ndarray    # [N] bool
    d_vcm: jnp.ndarray            # [N]
    d_vc: jnp.ndarray             # [N]
    d_vm: jnp.ndarray             # [N]
    alive: jnp.ndarray            # [N] bool


class StoredVertices(NamedTuple):
    """Fixed-slot vertex storage [L, N] (PathVertex, vertexcm.hxx:79-98).

    The vertex BSDF is reconstructed from (in_dir, normal, mat_id) at use
    time — Setup is deterministic, so this is exact and cheaper than
    storing frames/probabilities.
    """

    position: V3             # V3 of [L,N]
    throughput: V3
    in_dir: V3               # ray direction arriving at the vertex
    normal: V3
    mat_id: jnp.ndarray      # [L,N]
    d_vcm: jnp.ndarray
    d_vc: jnp.ndarray        # light: dVC; camera queries: unused
    d_vm: jnp.ndarray
    valid: jnp.ndarray       # [L,N] bool; slot i holds pathLength == i+1


class VcmMisc(NamedTuple):
    """Per-iteration constants (vertexcm.hxx:294-308)."""

    radius: jnp.ndarray
    radius_sqr: jnp.ndarray
    vm_normalization: jnp.ndarray
    mis_vm_weight: jnp.ndarray
    mis_vc_weight: jnp.ndarray
    light_sub_path_count: jnp.ndarray


def _empty_vertices(max_l: int, n: int) -> StoredVertices:
    zf = jnp.zeros((max_l, n), jnp.float32)
    zv = V3(zf, zf, zf)
    return StoredVertices(
        position=zv, throughput=zv, in_dir=zv, normal=zv,
        mat_id=jnp.zeros((max_l, n), jnp.int32),
        d_vcm=zf, d_vc=zf, d_vm=zf,
        valid=jnp.zeros((max_l, n), bool),
    )


def _store_slot(verts: StoredVertices, i, **fields) -> StoredVertices:
    upd = lambda arr, val: jax.lax.dynamic_update_index_in_dim(
        arr, val, i, axis=0
    )
    updv = lambda arr, val: V3(
        upd(arr.x, val.x), upd(arr.y, val.y), upd(arr.z, val.z)
    )
    return StoredVertices(
        position=updv(verts.position, fields["position"]),
        throughput=updv(verts.throughput, fields["throughput"]),
        in_dir=updv(verts.in_dir, fields["in_dir"]),
        normal=updv(verts.normal, fields["normal"]),
        mat_id=upd(verts.mat_id, fields["mat_id"]),
        d_vcm=upd(verts.d_vcm, fields["d_vcm"]),
        d_vc=upd(verts.d_vc, fields["d_vc"]),
        d_vm=upd(verts.d_vm, fields["d_vm"]),
        valid=upd(verts.valid, fields["valid"]),
    )


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
        scene.lights, light_id, scene.scene_sphere,
        u[:, 1], u[:, 2], u[:, 3], u[:, 4],
    )
    emission_pdf = em.emission_pdf_w * pick_prob
    direct_pdf = em.direct_pdf_a * pick_prob

    throughput = em.energy * _safe_div(1.0, emission_pdf)

    d_vcm = _mis(_safe_div(direct_pdf, emission_pdf))
    used_cos = jnp.where(em.is_finite, em.cos_theta_light, 1.0)
    d_vc = jnp.where(em.is_delta, 0.0, _mis(_safe_div(used_cos, emission_pdf)))
    d_vm = d_vc * misc.mis_vc_weight

    return SubPathState(
        origin=em.position,
        direction=em.direction,
        throughput=throughput,
        is_finite_light=em.is_finite,
        specular_path=jnp.ones((n,), bool),
        d_vcm=d_vcm, d_vc=d_vc, d_vm=d_vm,
        alive=emission_pdf > 0.0,
    )


def connect_to_camera(
    scene: SceneData, misc: VcmMisc, state: SubPathState, hit_point: V3,
    b: bsdf_ops.BsdfState, enabled_mask, light_trace_only: bool,
):
    """ConnectToCamera (vertexcm.hxx:862-933) -> (raster_x, raster_y,
    contrib V3)."""
    cam = scene.camera
    dir_to_cam_raw = cam.position - hit_point
    in_front = dot(cam.forward, -dir_to_cam_raw) > 0.0

    rx, ry = world_to_raster(cam, hit_point)
    on_screen = check_raster(cam, rx, ry)

    dist_eye2 = jnp.maximum(len_sqr(dir_to_cam_raw), 1e-30)
    distance = jnp.sqrt(dist_eye2)
    dir_to_cam = dir_to_cam_raw * (1.0 / distance)

    factor, cos_to_cam, _, rev_pdf_w = bsdf_ops.evaluate(
        scene.materials, b, dir_to_cam
    )
    nonzero = max_gt_zero(factor)
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
    scale = mis_weight * _safe_div(
        1.0, misc.light_sub_path_count * surface_to_img
    )
    contrib = state.throughput * factor * scale

    ok = enabled_mask & in_front & on_screen & nonzero & max_gt_zero(contrib)
    shadowed = occluded(scene, hit_point, dir_to_cam, distance)
    ok = ok & ~shadowed
    return rx, ry, v3_where(ok, contrib, 0.0), ok


def sample_scattering(
    scene: SceneData, misc: VcmMisc, state: SubPathState, hit_point: V3,
    b: bsdf_ops.BsdfState, u, fix_is_light: bool,
) -> SubPathState:
    """SampleScattering (vertexcm.hxx:937-1006) — masked wavefront version."""
    factor, new_dir, dir_pdf_w, cos_out, event, keep = bsdf_ops.sample(
        scene.materials, b, u[:, 0], u[:, 1], u[:, 2],
        fix_is_light=fix_is_light,
    )
    alive = state.alive & keep

    specular = (event & bsdf_ops.EV_SPECULAR) != 0
    _, rev_reverse = bsdf_ops.pdf(scene.materials, b, new_dir)
    rev_pdf_w = jnp.where(specular, dir_pdf_w, rev_reverse)

    cont = b.cont_prob
    alive = alive & (u[:, 3] <= cont)
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

    throughput = state.throughput * factor * cos_over_pdf

    sel = lambda new, old: jnp.where(alive, new, old)
    selv = lambda new, old: v3_where(alive, new, old)
    return SubPathState(
        origin=selv(hit_point, state.origin),
        direction=selv(new_dir, state.direction),
        throughput=selv(throughput, state.throughput),
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
    """Light stage (vertexcm.hxx:321-396) -> (vertices, fb, ray_count)."""
    n = pix.shape[0]
    max_l = max(1, max_path_length - 1)
    store_vertices = use_vc or use_vm
    connect_cam = use_vc or light_trace_only

    state = generate_light_sample(scene, misc, pix, iteration, base_seed)
    verts = _empty_vertices(max_l, n)

    def bounce(i, carry):
        state, verts, fb, rays = carry
        path_length = i + 1

        rays = rays + jnp.sum(state.alive.astype(jnp.int32))
        org = state.origin + state.direction * EPS_RAY
        hit = intersect(scene, org, state.direction)
        alive = state.alive & hit.hit
        dist_safe = jnp.where(hit.hit, hit.dist, 1.0)
        hit_point = org + state.direction * dist_safe
        isect_dist = dist_safe + EPS_RAY

        b = bsdf_ops.setup(
            scene.materials, state.direction, hit.normal, hit.mat_id, hit.hit
        )
        alive = alive & b.valid

        # MIS completion after tracing (vertexcm.hxx:351-360), masked by
        # alive so dead lanes can't overflow/NaN.
        infinite_first = (path_length == 1) & ~state.is_finite_light
        d_vcm = jnp.where(
            infinite_first, state.d_vcm, state.d_vcm * _mis(sqr(isect_dist))
        )
        abs_cos = jnp.abs(b.cos_theta_fix())
        inv_cos = _safe_div(1.0, _mis(abs_cos))
        state = state._replace(
            d_vcm=jnp.where(alive, d_vcm * inv_cos, state.d_vcm),
            d_vc=jnp.where(alive, state.d_vc * inv_cos, state.d_vc),
            d_vm=jnp.where(alive, state.d_vm * inv_cos, state.d_vm),
            alive=alive,
        )

        # Store vertex (vertexcm.hxx:364-377).
        if store_vertices:
            can_store = alive & ~b.is_delta
            verts = _store_slot(
                verts, i,
                position=hit_point, throughput=state.throughput,
                in_dir=state.direction, normal=hit.normal,
                mat_id=hit.mat_id, d_vcm=state.d_vcm, d_vc=state.d_vc,
                d_vm=state.d_vm, valid=can_store,
            )

        # Connect to camera (vertexcm.hxx:380-384).
        if connect_cam:
            enabled = (
                alive & ~b.is_delta & (path_length + 1 >= min_path_length)
            )
            rx, ry, contrib, cast = connect_to_camera(
                scene, misc, state, hit_point, b, enabled, light_trace_only
            )
            fb = add_color(fb, rx, ry, contrib)
            rays = rays + jnp.sum(enabled.astype(jnp.int32))  # shadow rays

        # Path-too-long termination (vertexcm.hxx:387).
        state = state._replace(
            alive=alive & (path_length + 2 <= max_path_length)
        )

        u = rng.uniform_slots(
            base_seed,
            rng.make_stream(iteration, rng.STAGE_LIGHT_WALK, i),
            pix, 4,
        )
        state = sample_scattering(
            scene, misc, state, hit_point, b, u, fix_is_light=True
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
    sx = x + jitter[:, 0]
    sy = y + jitter[:, 1]

    org, direction = generate_ray(cam, sx, sy)
    cos_at_cam = dot(cam.forward, direction)
    img_to_cam_dist = cam.image_plane_dist / cos_at_cam
    camera_pdf_w = sqr(img_to_cam_dist) / cos_at_cam

    ones = jnp.ones((n,), jnp.float32)
    zeros = jnp.zeros((n,), jnp.float32)
    state = SubPathState(
        origin=org,
        direction=direction,
        throughput=V3(ones, ones, ones),
        is_finite_light=jnp.zeros((n,), bool),
        specular_path=jnp.ones((n,), bool),
        d_vcm=_mis(misc.light_sub_path_count / camera_pdf_w),
        d_vc=zeros,
        d_vm=zeros,
        alive=jnp.ones((n,), bool),
    )
    return sx, sy, state


def get_light_radiance_weighted(
    scene: SceneData, state: SubPathState, light_id, ray_dir: V3, path_length,
    use_vc: bool, use_vm: bool,
) -> V3:
    """GetLightRadiance (vertexcm.hxx:617-658): radiance * MIS weight."""
    light_count = scene.lights.kind.shape[0]
    pick_prob = 1.0 / light_count

    lr = light_ops.get_radiance(
        scene.lights, light_id, scene.scene_sphere, ray_dir
    )
    nonzero = max_gt_zero(lr.radiance)

    direct_pdf = lr.direct_pdf_a * pick_prob
    emission_pdf = lr.emission_pdf_w * pick_prob

    # [tech. rep. (42)-(43)]
    w_camera = _mis(direct_pdf) * state.d_vcm + _mis(emission_pdf) * state.d_vc
    mis_weight = 1.0 / (1.0 + w_camera)

    if use_vm and not use_vc:  # merging-only: purely specular paths only
        weighted = v3_where(state.specular_path, lr.radiance, 0.0)
    else:
        weighted = lr.radiance * mis_weight
    weighted = v3_where(path_length == 1, lr.radiance, weighted)
    return v3_where(nonzero, weighted, 0.0)


def direct_illumination(
    scene: SceneData, misc: VcmMisc, state: SubPathState, hit_point: V3,
    b: bsdf_ops.BsdfState, u3,
) -> V3:
    """DirectIllumination (vertexcm.hxx:663-738): NEE contribution."""
    light_count = scene.lights.kind.shape[0]
    pick_prob = 1.0 / light_count

    light_id = jnp.minimum(
        (u3[:, 0] * light_count).astype(jnp.int32), light_count - 1
    )
    ill = light_ops.illuminate(
        scene.lights, light_id, scene.scene_sphere, hit_point,
        u3[:, 1], u3[:, 2],
    )
    ok = max_gt_zero(ill.radiance)

    factor, cos_to_light, dir_pdf_w, rev_pdf_w = bsdf_ops.evaluate(
        scene.materials, b, ill.dir_to_light
    )
    ok = ok & max_gt_zero(factor)

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

    contrib = (ill.radiance * factor) * (
        mis_weight * cos_to_light * _safe_div(
            1.0, pick_prob * ill.direct_pdf_w
        )
    )

    ok = ok & max_gt_zero(contrib)
    shadowed = occluded(scene, hit_point, ill.dir_to_light, ill.distance)
    return v3_where(ok & ~shadowed, contrib, 0.0)


def connect_vertices(
    scene: SceneData, misc: VcmMisc, cam_state: SubPathState, cam_hit: V3,
    cam_b: bsdf_ops.BsdfState, lv_pos: V3, lv_in_dir: V3, lv_normal: V3,
    lv_mat, lv_d_vcm, lv_d_vc, lv_valid,
) -> V3:
    """ConnectVertices (vertexcm.hxx:743-809): contribution (without the
    camera/light throughputs, which the caller multiplies)."""
    direction_raw = lv_pos - cam_hit
    dist2 = jnp.maximum(len_sqr(direction_raw), 1e-30)
    distance = jnp.sqrt(dist2)
    direction = direction_raw * (1.0 / distance)

    cam_factor, cos_camera, cam_dir_pdf_w, cam_rev_pdf_w = bsdf_ops.evaluate(
        scene.materials, cam_b, direction
    )
    ok = max_gt_zero(cam_factor)

    cam_cont = cam_b.cont_prob
    cam_dir_pdf_w = cam_dir_pdf_w * cam_cont
    cam_rev_pdf_w = cam_rev_pdf_w * cam_cont

    # Reconstruct the light vertex BSDF (deterministic Setup re-run).
    lb = bsdf_ops.setup(scene.materials, lv_in_dir, lv_normal, lv_mat, lv_valid)
    light_factor, cos_light, light_dir_pdf_w, light_rev_pdf_w = (
        bsdf_ops.evaluate(scene.materials, lb, -direction)
    )
    ok = ok & max_gt_zero(light_factor)

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
        misc.mis_vm_weight + cam_state.d_vcm
        + cam_state.d_vc * _mis(cam_rev_pdf_w)
    )
    mis_weight = 1.0 / (w_light + 1.0 + w_camera)

    contrib = cam_factor * light_factor * (mis_weight * geometry_term)
    ok = ok & max_gt_zero(contrib) & lv_valid
    shadowed = occluded(scene, cam_hit, direction, distance)
    return v3_where(ok & ~shadowed, contrib, 0.0)


# ---------------------------------------------------------------------------
# Deferred merge stage
# ---------------------------------------------------------------------------


def merge_stage(
    scene: SceneData, misc: VcmMisc, queries: StoredVertices,
    light_verts: StoredVertices, num_cells: int, pair_cap: int, ppm: bool,
    max_path_length: int, min_path_length: int,
):
    """Vertex merging over all recorded camera queries in one pass.

    Implements RangeQuery::Process (vertexcm.hxx:130-169): for every camera
    vertex, every light vertex within the merge radius contributes
    mis * f_s(camera, photon_dir) * photon_throughput, summed and scaled by
    vm_normalization * camera_throughput.

    Returns ([Lq*N] V3 contributions (already x camera throughput and
    normalization), overflow_pairs scalar).
    """
    lq, n = queries.valid.shape
    ll, n_ph = light_verts.valid.shape  # n_ph may exceed n (all-gathered)
    q = lq * n
    m = ll * n_ph

    flat = lambda a: a.reshape((-1,))
    flatv = lambda v: V3(flat(v.x), flat(v.y), flat(v.z))

    ph_pos = flatv(light_verts.position)
    ph_valid = flat(light_verts.valid)

    grid = grid_ops.build(ph_pos, ph_valid, misc.radius, num_cells)
    # Cells beyond the packed-count capacity would silently truncate; the
    # observed max is ~20 so this only guards pathological inputs.
    cell_overflow = jnp.maximum(
        grid.max_occupancy - ((1 << grid_ops._COUNT_BITS) - 1), 0
    )

    q_pos = flatv(queries.position)
    q_valid = flat(queries.valid)
    starts, counts = grid_ops.query_cell_ranges(
        grid, num_cells, q_pos, packed=grid_ops.packed_ranges(grid)
    )
    counts = counts * q_valid[:, None].astype(counts.dtype)

    qc_idx, photon_pos, pair_ok, total_pairs, overflow = grid_ops.expand_pairs(
        starts, counts, pair_cap
    )
    overflow = overflow + cell_overflow
    q_idx = qc_idx // 8  # flattened query id per pair

    ph_sorted = grid.sorted_idx[jnp.minimum(photon_pos, m - 1)]
    pair_ok = pair_ok & (photon_pos < m)

    # ---- Phase 1: cheap prefilter. Scattered-gather cost scales with
    # elements touched, so positions are packed as 16-bit fixed point
    # (2 int32 per point instead of 3 f32): a conservative distance test
    # with one-quantum slack (span/65535 ~ 4e-5 scene units << radius)
    # rejects ~85% of candidates; survivors get the exact test in phase 3.
    # (No validity gather needed: invalid photons sort into the sentinel
    # cell, which no CSR range covers.)
    span_x = jnp.maximum(grid.bbox_max_x - grid.bbox_min_x, 1e-30)
    span_y = jnp.maximum(grid.bbox_max_y - grid.bbox_min_y, 1e-30)
    span_z = jnp.maximum(grid.bbox_max_z - grid.bbox_min_z, 1e-30)

    def quant(a, mn, span):
        q16 = jnp.clip((a - mn) * (65535.0 / span), 0.0, 65535.0)
        return q16.astype(jnp.int32)

    def pack(pos):
        qx = quant(pos.x, grid.bbox_min_x, span_x)
        qy = quant(pos.y, grid.bbox_min_y, span_y)
        qz = quant(pos.z, grid.bbox_min_z, span_z)
        return (qx << 16) | qy, qz

    ph_xy, ph_z = pack(ph_pos)
    q_xy, q_z = pack(q_pos)

    pxy = ph_xy[ph_sorted]
    pz = ph_z[ph_sorted]
    qxy = q_xy[q_idx]
    qz = q_z[q_idx]

    step_x = span_x * (1.0 / 65535.0)
    step_y = span_y * (1.0 / 65535.0)
    step_z = span_z * (1.0 / 65535.0)
    dxf = jnp.maximum(
        jnp.abs((pxy >> 16) - (qxy >> 16)).astype(jnp.float32) * step_x
        - step_x, 0.0,
    )
    dyf = jnp.maximum(
        jnp.abs((pxy & 0xFFFF) - (qxy & 0xFFFF)).astype(jnp.float32) * step_y
        - step_y, 0.0,
    )
    dzf = jnp.maximum(
        jnp.abs(pz - qz).astype(jnp.float32) * step_z - step_z, 0.0
    )
    pair_ok = pair_ok & (dxf * dxf + dyf * dyf + dzf * dzf <= misc.radius_sqr)

    # Path length window (vertexcm.hxx:132-135) — slot index is the flat
    # index's leading axis, so lengths need no gathers.
    ph_len = ph_sorted // n_ph + 1
    q_len = q_idx // n + 1
    total_len = ph_len + q_len
    pair_ok = pair_ok & (total_len <= max_path_length) & \
        (total_len >= min_path_length)

    # ---- Phase 2: compact surviving pairs.
    surv_cap = max(pair_cap // 4, 1024)
    pos2 = jnp.cumsum(pair_ok.astype(jnp.int32)) - 1
    n_surv = jnp.sum(pair_ok.astype(jnp.int32))
    overflow = overflow + jnp.maximum(n_surv - surv_cap, 0)
    dst = jnp.where(pair_ok, pos2, surv_cap)  # dropped -> OOB
    zi = jnp.zeros((surv_cap,), jnp.int32)
    q2 = zi.at[dst].set(q_idx, mode="drop")
    p2 = zi.at[dst].set(ph_sorted, mode="drop")
    ok2 = jnp.arange(surv_cap, dtype=jnp.int32) < n_surv

    # ---- Phase 3: full payload for survivors only.
    gv = lambda v, i: V3(v.x[i], v.y[i], v.z[i])

    # Exact distance recheck (phase 1 was conservative by one quantum).
    pp3 = gv(ph_pos, p2)
    qp3 = gv(q_pos, q2)
    ok2 = ok2 & (len_sqr(pp3 - qp3) <= misc.radius_sqr)

    cam_in = gv(flatv(queries.in_dir), q2)
    cam_nrm = gv(flatv(queries.normal), q2)
    cam_mat = flat(queries.mat_id)[q2]
    cam_b = bsdf_ops.setup(scene.materials, cam_in, cam_nrm, cam_mat, ok2)

    ph_in = gv(flatv(light_verts.in_dir), p2)
    ph_nrm = gv(flatv(light_verts.normal), p2)
    ph_mat = flat(light_verts.mat_id)[p2]
    # Light-vertex continuation probability: reconstruct its BSDF setup.
    ph_b = bsdf_ops.setup(scene.materials, ph_in, ph_nrm, ph_mat, ok2)

    light_dir = -ph_in  # the photon's WorldDirFix
    factor, _, dir_pdf_w, rev_pdf_w = bsdf_ops.evaluate(
        scene.materials, cam_b, light_dir
    )
    ok2 = ok2 & max_gt_zero(factor)

    dir_pdf_w = dir_pdf_w * cam_b.cont_prob
    rev_pdf_w = rev_pdf_w * ph_b.cont_prob

    # [tech. rep. (38)-(39)]
    w_light = flat(light_verts.d_vcm)[p2] * misc.mis_vc_weight + \
        flat(light_verts.d_vm)[p2] * _mis(dir_pdf_w)
    w_camera = flat(queries.d_vcm)[q2] * misc.mis_vc_weight + \
        flat(queries.d_vm)[q2] * _mis(rev_pdf_w)
    if ppm:
        mis_weight = jnp.ones_like(w_light)
    else:
        mis_weight = 1.0 / (w_light + 1.0 + w_camera)

    ph_thr = gv(flatv(light_verts.throughput), p2)
    contrib = factor * ph_thr * mis_weight
    contrib = v3_where(ok2, contrib, 0.0)

    # Scatter-add back to the owning query, then scale by the camera
    # throughput and the vm normalization.
    zeros = jnp.zeros((q,), jnp.float32)
    q2s = jnp.where(ok2, q2, q)  # dropped -> OOB
    acc = V3(
        zeros.at[q2s].add(contrib.x, mode="drop"),
        zeros.at[q2s].add(contrib.y, mode="drop"),
        zeros.at[q2s].add(contrib.z, mode="drop"),
    )
    q_thr = flatv(queries.throughput)
    return q_thr * acc * misc.vm_normalization, overflow, total_pairs


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
    pair_factor: int = 24,
    axis_name: str | None = None,
):
    """One VCM-family iteration over the given (possibly sharded) path ids.

    ``pix`` holds *global* path/pixel indices — RNG streams and the camera
    pixel mapping depend only on them, so any partition of
    ``arange(n_paths_global)`` over devices reproduces the single-device
    image exactly. With ``axis_name`` set (inside shard_map), light vertices
    are all-gathered for merging (the only cross-shard data dependency).
    MIS constants always use the *global* light path count
    (vertexcm.hxx:303-308). Returns (fb V3 planes -> array, ray_count).
    """
    n = pix.shape[0]
    misc = compute_misc(
        scene, iteration, n_paths_global, radius_factor, radius_alpha,
        use_vc, use_vm,
    )

    fb = new_fb_planes(res_x, res_y)

    # ---- Stage 1: light sub-paths.
    verts, fb, ray_count = trace_light_paths(
        scene, misc, pix, iteration, fb, base_seed, max_path_length,
        min_path_length, use_vc, use_vm, light_trace_only,
    )

    if light_trace_only:
        out = fb.to_array()
        if axis_name is not None:
            out = jax.lax.psum(out, axis_name)
            ray_count = jax.lax.psum(ray_count, axis_name)
        return out, ray_count, jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32)

    if use_vm and axis_name is not None:
        # Cross-shard photon exchange: gather every shard's vertices so local
        # camera vertices merge against the global photon map (the reference
        # reads them from shared memory, vertexcm.hxx:530-538).
        ag = lambda a: jax.lax.all_gather(a, axis_name, axis=1, tiled=True)
        agv = lambda v: V3(ag(v.x), ag(v.y), ag(v.z))
        light_verts_global = StoredVertices(
            position=agv(verts.position), throughput=agv(verts.throughput),
            in_dir=agv(verts.in_dir), normal=agv(verts.normal),
            mat_id=ag(verts.mat_id), d_vcm=ag(verts.d_vcm),
            d_vc=ag(verts.d_vc), d_vm=ag(verts.d_vm), valid=ag(verts.valid),
        )
    else:
        light_verts_global = verts

    # ---- Stage 2: camera sub-paths (+ query recording for merging).
    sx, sy, state = generate_camera_sample(
        scene, misc, pix, res_x, iteration, base_seed
    )
    zerov = V3(*(jnp.zeros((n,), jnp.float32),) * 3)
    color = zerov
    has_background = scene.background_idx >= 0
    max_l = verts.valid.shape[0]
    queries = _empty_vertices(max_path_length, n) if use_vm else None

    def bounce(i, carry):
        state, color, queries, rays = carry
        path_length = i + 1

        rays = rays + jnp.sum(state.alive.astype(jnp.int32))
        org = state.origin + state.direction * EPS_RAY
        hit = intersect(scene, org, state.direction)
        dist_safe = jnp.where(hit.hit, hit.dist, 1.0)
        hit_point = org + state.direction * dist_safe
        isect_dist = dist_safe + EPS_RAY

        # Miss -> background radiance, PRE-update MIS (vertexcm.hxx:434-447).
        if has_background:
            bg_contrib = get_light_radiance_weighted(
                scene, state,
                jnp.full((n,), scene.background_idx, jnp.int32),
                state.direction,
                jnp.full((n,), path_length, jnp.int32),
                use_vc, use_vm,
            )
            take_bg = state.alive & ~hit.hit & (path_length >= min_path_length)
            color = color + v3_where(take_bg, state.throughput * bg_contrib, 0.0)

        alive = state.alive & hit.hit
        b = bsdf_ops.setup(
            scene.materials, state.direction, hit.normal, hit.mat_id, hit.hit
        )
        alive = alive & b.valid

        # MIS update (vertexcm.hxx:459-464), masked by alive.
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
        color = color + v3_where(
            take_light, state.throughput * light_contrib, 0.0
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
            color = color + v3_where(nee_on, state.throughput * nee, 0.0)
            rays = rays + jnp.sum(nee_on.astype(jnp.int32))

        # VC: connect to this path's light vertices (vertexcm.hxx:498-526).
        if use_vc:
            def connect_slot(j, cc):
                color, rays = cc
                lv_len = j + 1
                full_len = lv_len + 1 + path_length
                in_range = (full_len >= min_path_length) & (
                    full_len <= max_path_length
                )
                getv = lambda v: V3(v.x[j], v.y[j], v.z[j])
                lv_valid = verts.valid[j] & alive & ~b.is_delta & in_range
                c = connect_vertices(
                    scene, misc, state, hit_point, b,
                    getv(verts.position), getv(verts.in_dir),
                    getv(verts.normal), verts.mat_id[j],
                    verts.d_vcm[j], verts.d_vc[j], lv_valid,
                )
                color = color + v3_where(
                    lv_valid,
                    state.throughput * getv(verts.throughput) * c,
                    0.0,
                )
                rays = rays + jnp.sum(lv_valid.astype(jnp.int32))
                return color, rays

            color, rays = jax.lax.fori_loop(
                0, max_l, connect_slot, (color, rays)
            )

        # VM: record a merge query at this vertex (processed in the deferred
        # merge stage — merging is additive and walk-independent).
        if use_vm:
            merge_on = alive & ~b.is_delta
            queries = _store_slot(
                queries, i,
                position=hit_point, throughput=state.throughput,
                in_dir=state.direction, normal=hit.normal,
                mat_id=hit.mat_id, d_vcm=state.d_vcm, d_vc=state.d_vc,
                d_vm=state.d_vm, valid=merge_on,
            )
            if ppm:  # PPM ends the camera path at the first non-delta hit
                state = state._replace(alive=alive & b.is_delta)

        u = rng.uniform_slots(
            base_seed,
            rng.make_stream(iteration, rng.STAGE_CAMERA_WALK, i),
            pix, 4,
        )
        state = sample_scattering(
            scene, misc, state, hit_point, b, u, fix_is_light=False
        )
        return state, color, queries, rays

    state, color, queries, cam_rays = jax.lax.fori_loop(
        0, max_path_length, bounce,
        (state, color, queries, jnp.zeros((), jnp.int32)),
    )
    ray_count = ray_count + cam_rays

    # ---- Stage 3: deferred merging.
    merge_overflow = jnp.zeros((), jnp.int32)
    merge_pairs = jnp.zeros((), jnp.int32)
    if use_vm:
        num_cells = 2 * n_paths_global  # perf knob only; results exact
        pair_cap = pair_factor * n
        mc, merge_overflow, merge_pairs = merge_stage(
            scene, misc, queries, light_verts_global, num_cells, pair_cap,
            ppm, max_path_length, min_path_length,
        )
        # Sum each path's per-bounce merge contributions into its color.
        mc2 = mc.reshape((max_path_length, n))
        color = color + V3(
            jnp.sum(mc2.x, axis=0), jnp.sum(mc2.y, axis=0),
            jnp.sum(mc2.z, axis=0),
        )

    fb = add_color(fb, sx, sy, color)
    out = fb.to_array()
    if axis_name is not None:
        out = jax.lax.psum(out, axis_name)
        ray_count = jax.lax.psum(ray_count, axis_name)
        merge_overflow = jax.lax.psum(merge_overflow, axis_name)
        merge_pairs = jax.lax.psum(merge_pairs, axis_name)
    return out, ray_count, merge_overflow, merge_pairs


_STATIC = (
    "res_x", "res_y", "base_seed", "max_path_length", "min_path_length",
    "use_vc", "use_vm", "light_trace_only", "ppm", "pair_factor",
)


@partial(jax.jit, static_argnames=_STATIC)
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
    pair_factor: int = 24,
) -> jnp.ndarray:
    """Single-device iteration -> accumulation image [resY,resX,3]."""
    n = res_x * res_y
    pix = jnp.arange(n, dtype=jnp.uint32)
    fb, _, _, _ = render_iteration_core(
        scene, iteration, pix, res_x, res_y, n, base_seed,
        max_path_length, min_path_length, radius_factor, radius_alpha,
        use_vc, use_vm, light_trace_only, ppm, pair_factor, axis_name=None,
    )
    return fb


@partial(jax.jit, static_argnames=_STATIC)
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
    pair_factor: int = 24,
):
    """Like render_iteration but also returns (ray_count, merge_overflow,
    merge_pairs): traced rays (path segments + shadow/occlusion rays — the
    reference-comparable work metric), merge candidate pairs dropped by the
    static pair cap (0 means the merge was exact), and the total candidate
    pair count (lets drivers right-size the cap: phase-1 gather cost scales
    with the cap, not actual pairs)."""
    n = res_x * res_y
    pix = jnp.arange(n, dtype=jnp.uint32)
    return render_iteration_core(
        scene, iteration, pix, res_x, res_y, n, base_seed,
        max_path_length, min_path_length, radius_factor, radius_alpha,
        use_vc, use_vm, light_trace_only, ppm, pair_factor, axis_name=None,
    )
