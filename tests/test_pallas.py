"""Pallas intersection kernel vs the XLA reference implementation.

The kernel is wired as an opt-in trace backend since round 4
(trace_backend="pallas", fused inside the block executable like the merge
kernel); the default stays XLA, which measures equal at SmallVCM's ~32
primitives (render.py::_resolve_trace_backend). These tests lock the
kernel numerics to the XLA sweep and the wired path to the XLA-traced
image, in interpreter mode off-TPU.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from smallvcm_tpu.core.vec3 import from_array
from smallvcm_tpu.ops.intersect import intersect
from smallvcm_tpu.scene.scene import SCENE_CONFIGS, load_cornell_box

pallas_tpu_only = pytest.mark.skipif(
    jax.devices()[0].platform not in ("tpu", "axon"),
    reason="pallas TPU kernel needs TPU (interpret mode is exercised below)",
)


def _rays(n, seed=0):
    g = np.random.default_rng(seed)
    o = np.tile([[0.0, -3.0, 0.0]], (n, 1)).astype(np.float32)
    d = g.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return from_array(jnp.asarray(o)), from_array(
        jnp.asarray(d.astype(np.float32))
    )


def test_pallas_kernel_matches_xla_interpret():
    """Run the kernel in interpreter mode and compare all hit distances."""
    from smallvcm_tpu.ops import pallas_intersect as pk

    n = 4096
    scene = load_cornell_box((64, 64), SCENE_CONFIGS[0])
    org, dire = _rays(n)

    hit = intersect(scene, org, dire)
    dist, prim = pk.intersect_pallas(scene, org, dire, interpret=True)

    xla_t = np.asarray(hit.dist)
    pal_t = np.asarray(dist)
    both_miss = (xla_t >= 1e35) & (pal_t >= 1e35)
    close = np.isclose(xla_t, pal_t, rtol=1e-5, atol=1e-4)
    assert (both_miss | close).all()
    # primitive ids agree where hit
    hit_mask = ~both_miss
    assert (np.asarray(prim)[hit_mask] >= 0).all()


def test_wired_trace_backend_matches_xla_interpret():
    """Full VCM iteration with the pallas sweep (interpret mode) wired
    through trace_backend must reproduce the XLA-traced image: the sweep
    only decides hits, so images agree wherever no borderline hit flips
    (same guards, same f32 math; tiny fp differences can flip an
    epsilon-grazing ray, so compare statistically, not bitwise)."""
    from smallvcm_tpu.algorithms import vcm

    res = 16
    scene = load_cornell_box((res, res), SCENE_CONFIGS[1])
    a = np.asarray(vcm.render_iteration(
        scene, 0, res, res, max_path_length=4, trace_backend="xla"))
    b = np.asarray(vcm.render_iteration(
        scene, 0, res, res, max_path_length=4,
        trace_backend="pallas_interpret"))
    assert np.isfinite(b).all()
    # identical sampling decisions => near-identical images
    denom = np.abs(a) + 1e-3
    assert np.median(np.abs(a - b) / denom) < 1e-5
    assert np.mean(np.abs(a - b) / denom) < 1e-2
