"""Pallas intersection kernel vs the XLA reference implementation.

The kernel is an alternative backend (ops/pallas_intersect.py): on current
v5e measurements XLA fuses the dense sweep equally well, so the default stays
XLA; this test keeps the kernel numerics locked to the reference
implementation. Runs in interpreter mode off-TPU.
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


def test_pallas_kernel_matches_xla_interpret(monkeypatch):
    """Run the kernel in interpreter mode and compare all hit distances."""
    from smallvcm_tpu.ops import pallas_intersect as pk

    # interpret=True works on any backend
    orig = pk.pl.pallas_call
    monkeypatch.setattr(
        pk.pl, "pallas_call",
        lambda *a, **kw: orig(*a, interpret=True, **kw),
    )
    pk._sweep.clear_cache()

    n = 4096
    scene = load_cornell_box((64, 64), SCENE_CONFIGS[0])
    org, dire = _rays(n)

    hit = intersect(scene, org, dire)
    dist, prim = pk.intersect_pallas(scene, org, dire)

    xla_t = np.asarray(hit.dist)
    pal_t = np.asarray(dist)
    both_miss = (xla_t >= 1e35) & (pal_t >= 1e35)
    close = np.isclose(xla_t, pal_t, rtol=1e-5, atol=1e-4)
    assert (both_miss | close).all()
    # primitive ids agree where hit
    hit_mask = ~both_miss
    assert (np.asarray(prim)[hit_mask] >= 0).all()
    pk._sweep.clear_cache()
