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
from ..core.vecmath import dot
from ..ops.intersect import intersect
from ..scene.camera import generate_ray
from ..scene.scene import SceneData
from ..io.framebuffer import add_color


@partial(jax.jit, static_argnames=("res_x", "res_y", "base_seed"))
def render_iteration(
    scene: SceneData, iteration, res_x: int, res_y: int, base_seed: int = 1234
) -> jnp.ndarray:
    """Render one eye-light sample pass -> accumulation image [resY,resX,3].

    Reference quirk preserved: iteration 1 (second pass; smallvcm.cxx:100
    starts at 0) samples pixel centers, every other iteration jitters
    (eyelight.hxx:59-60).
    """
    n = res_x * res_y
    pix = jnp.arange(n, dtype=jnp.uint32)
    x = (pix % res_x).astype(jnp.float32)
    y = (pix // res_x).astype(jnp.float32)

    jitter = rng.uniform_slots(
        base_seed, rng.make_stream(iteration, rng.STAGE_CAMERA_JITTER), pix, 2
    )
    centered = jnp.asarray(iteration, jnp.int32) == 1
    jitter = jnp.where(centered, 0.5, jitter)

    sample = jnp.stack([x, y], axis=-1) + jitter
    org, d = generate_ray(scene.camera, sample)
    hit = intersect(scene, org, d)

    dot_ln = dot(hit.normal, -d)
    color = jnp.where(
        dot_ln[:, None] > 0,
        jnp.stack([dot_ln, dot_ln, dot_ln], axis=-1),
        jnp.stack([-dot_ln, jnp.zeros_like(dot_ln), jnp.zeros_like(dot_ln)], axis=-1),
    )
    color = jnp.where(hit.hit[:, None], color, 0.0)

    fb = jnp.zeros((res_y, res_x, 3), jnp.float32)
    return add_color(fb, sample, color)
