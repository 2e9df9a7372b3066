"""Eye-light debug integrator (eyelight.hxx:47-78), wavefront form.

One jitted pass renders the whole image: generate all primary rays, one
batched intersection, shade |dot(N, -d)| (red on backface), scatter into the
framebuffer.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core import rng
from ..core.vec3 import V3, dot
from ..ops.intersect import intersect
from ..scene.camera import generate_ray
from ..scene.scene import SceneData
from ..io.framebuffer import add_color_at_pix, new_fb_planes


def render_core(
    scene: SceneData, iteration, pix, res_x: int, res_y: int,
    base_seed: int = 1234, rng_kind: str = "threefry",
) -> jnp.ndarray:
    """One eye-light pass over the given (possibly sharded) global pixel
    ids -> accumulation image [resY,resX,3] (holding only those pixels).

    Reference quirk preserved: iteration 1 (second pass; smallvcm.cxx:100
    starts at 0) samples pixel centers, every other iteration jitters
    (eyelight.hxx:59-60). RNG streams key off global pixel ids, so any
    partition of ``arange(n)`` reproduces the single-device image.
    """
    x = (pix % res_x).astype(jnp.float32)
    y = (pix // res_x).astype(jnp.float32)

    jitter = rng.uniform_slots(
        base_seed, rng.make_stream(iteration, rng.STAGE_CAMERA_JITTER), pix, 2,
        rng_kind,
    )
    centered = jnp.asarray(iteration, jnp.int32) == 1
    jx = jnp.where(centered, 0.5, jitter[:, 0])
    jy = jnp.where(centered, 0.5, jitter[:, 1])

    sx = x + jx
    sy = y + jy
    org, d = generate_ray(scene.camera, sx, sy)
    hit = intersect(scene, org, d)

    dot_ln = dot(hit.normal, -d)
    zero = jnp.zeros_like(dot_ln)
    color = V3(
        jnp.where(dot_ln > 0, dot_ln, -dot_ln),
        jnp.where(dot_ln > 0, dot_ln, zero),
        jnp.where(dot_ln > 0, dot_ln, zero),
    )
    color = color * hit.hit.astype(jnp.float32)

    # Own-pixel accumulate: floor(sx) == pix % res_x (jitter in [0,1)).
    fb = add_color_at_pix(new_fb_planes(res_x, res_y), pix, color)
    return fb.to_array()


@partial(jax.jit,
         static_argnames=("res_x", "res_y", "base_seed", "rng_kind"))
def render_iteration(
    scene: SceneData, iteration, res_x: int, res_y: int,
    base_seed: int = 1234, rng_kind: str = "threefry",
) -> jnp.ndarray:
    """Single-device eye-light pass -> accumulation image [resY,resX,3]."""
    pix = jnp.arange(res_x * res_y, dtype=jnp.uint32)
    return render_core(scene, iteration, pix, res_x, res_y, base_seed,
                       rng_kind)
