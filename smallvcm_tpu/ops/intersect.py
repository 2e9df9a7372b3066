"""Batched ray-scene intersection.

The reference does a per-ray virtual-dispatch linear scan over primitives
(geometry.hxx:55-104) — no acceleration structure (README:209). Here every ray
in the wavefront tests every primitive as one dense [N_rays, N_prims]
computation that XLA tiles onto the VPU; closest hit is an argmin over the
primitive axis. At SmallVCM's primitive counts (<= ~22 triangles + 2 spheres)
this is bandwidth-trivial and keeps the hot loop branch-free.

Numerics follow geometry.hxx: two-sided triangle test via three cross-product
sign agreements (:125-156) and the stable quadratic for spheres (:198-237).
The reference promotes the sphere discriminant to double; TPUs have no fast
f64, so we use the numerically-stable q-formulation in f32 — the renderer's
EPS_RAY = 1e-3 origin offsets (scene.hxx:72-85) dominate any residual error
at Cornell-box scales.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..core.vecmath import dot, normalize
from ..scene.scene import SceneData

BIG_DIST = 1e36


class Hit(NamedTuple):
    hit: jnp.ndarray       # [N] bool
    dist: jnp.ndarray      # [N]
    mat_id: jnp.ndarray    # [N] int32
    light_id: jnp.ndarray  # [N] int32, -1 when the hit is not emissive
    normal: jnp.ndarray    # [N,3]


def _tri_distances(scene: SceneData, org, direction, tmin):
    """Per-(ray, triangle) hit distance, +inf when missed. [N,T]."""
    # ao/bo/co: [N,T,3]
    ao = scene.tri_p0[None, :, :] - org[:, None, :]
    bo = scene.tri_p1[None, :, :] - org[:, None, :]
    co = scene.tri_p2[None, :, :] - org[:, None, :]

    v0 = jnp.cross(co, bo)
    v1 = jnp.cross(bo, ao)
    v2 = jnp.cross(ao, co)

    d = direction[:, None, :]
    v0d = dot(v0, d)
    v1d = dot(v1, d)
    v2d = dot(v2, d)

    inside = ((v0d < 0.0) & (v1d < 0.0) & (v2d < 0.0)) | (
        (v0d >= 0.0) & (v1d >= 0.0) & (v2d >= 0.0)
    )

    n = scene.tri_normal[None, :, :]
    denom = dot(n, d)
    # denom == 0 (ray parallel to plane) is a miss in the reference too
    # (inf/NaN distance fails its range checks); guard the division so the
    # 0/0 case can't mint NaNs into the VJP.
    distance = dot(n, ao) / jnp.where(denom == 0.0, 1.0, denom)
    ok = inside & (denom != 0.0) & (distance > tmin[:, None])
    return jnp.where(ok, distance, BIG_DIST)


def _sphere_distances(scene: SceneData, org, direction, tmin):
    """Per-(ray, sphere) hit distance, +inf when missed. [N,S]."""
    oc = org[:, None, :] - scene.sph_center[None, :, :]  # [N,S,3]
    d = direction[:, None, :]
    a = dot(d, d)
    bq = 2.0 * dot(d, oc)
    c = dot(oc, oc) - scene.sph_radius[None, :] ** 2

    disc = bq * bq - 4.0 * a * c
    valid = disc >= 0.0
    # Clamp strictly above zero: sqrt's VJP at 0 is 0/0 = NaN for every
    # sphere-missing lane otherwise.
    sqrt_disc = jnp.sqrt(jnp.maximum(disc, 1e-30))
    q = jnp.where(bq < 0.0, (-bq - sqrt_disc) * 0.5, (-bq + sqrt_disc) * 0.5)

    safe_q = jnp.where(q == 0.0, 1.0, q)
    t_a = q / a
    t_b = c / safe_q
    t0 = jnp.minimum(t_a, t_b)
    t1 = jnp.maximum(t_a, t_b)

    t0_ok = valid & (t0 > tmin[:, None])
    t1_ok = valid & (t1 > tmin[:, None])
    t = jnp.where(t0_ok, t0, jnp.where(t1_ok, t1, BIG_DIST))
    return t


def intersect(scene: SceneData, org, direction, tmin=None, tmax=None) -> Hit:
    """Closest-hit over all primitives. org/direction [N,3]."""
    n = org.shape[0]
    if tmin is None:
        tmin = jnp.zeros((n,), org.dtype)
    if tmax is None:
        tmax = jnp.full((n,), BIG_DIST, org.dtype)

    tri_t = _tri_distances(scene, org, direction, tmin)   # [N,T]
    sph_t = _sphere_distances(scene, org, direction, tmin)  # [N,S]
    all_t = jnp.concatenate([tri_t, sph_t], axis=1)

    best = jnp.argmin(all_t, axis=1)
    best_t = jnp.take_along_axis(all_t, best[:, None], axis=1)[:, 0]
    hit = best_t < tmax

    num_tris = scene.tri_p0.shape[0]
    is_tri = best < num_tris
    sph_idx = jnp.clip(best - num_tris, 0, max(scene.sph_center.shape[0] - 1, 0))
    tri_idx = jnp.clip(best, 0, num_tris - 1)

    mat_tri = scene.tri_mat[tri_idx]
    normal_tri = scene.tri_normal[tri_idx]

    if scene.sph_center.shape[0] > 0:
        mat_sph = scene.sph_mat[sph_idx]
        # Clamp miss-lane distances (1e36) before forming the sphere normal:
        # squaring them overflows to inf and normalize(0-ish) would NaN.
        t_safe = jnp.where(hit, best_t, 1.0)
        hit_p = org + direction * t_safe[:, None]
        normal_sph = normalize(hit_p - scene.sph_center[sph_idx])
        mat_id = jnp.where(is_tri, mat_tri, mat_sph)
        normal = jnp.where(is_tri[:, None], normal_tri, normal_sph)
    else:
        mat_id = mat_tri
        normal = normal_tri

    light_id = jnp.where(hit, scene.mat_to_light[mat_id], -1)
    mat_id = jnp.where(hit, mat_id, -1)
    return Hit(hit=hit, dist=best_t, mat_id=mat_id, light_id=light_id,
               normal=normal)


def occluded(scene: SceneData, point, direction, dist) -> jnp.ndarray:
    """Shadow-ray test replicating scene.hxx:72-85 exactly.

    Ray origin offset by EPS_RAY along direction, max distance shortened by
    2*EPS_RAY; returns True when something blocks.
    """
    from ..core.vecmath import EPS_RAY

    org = point + direction * EPS_RAY
    tmin = jnp.zeros(point.shape[:-1], point.dtype)
    tmax = dist - 2.0 * EPS_RAY

    tri_t = _tri_distances(scene, org, direction, tmin)
    sph_t = _sphere_distances(scene, org, direction, tmin)
    all_t = jnp.concatenate([tri_t, sph_t], axis=1)
    return jnp.any(all_t < tmax[:, None], axis=1)
