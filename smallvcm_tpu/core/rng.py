"""Counter-based RNG for sharding-invariant wavefront rendering.

The reference uses one ``std::mt19937_64`` per OpenMP thread seeded with
``baseSeed + threadId`` (rng.hxx:41-86, smallvcm.cxx:68), which makes results
depend on the thread count. Its ``LEGACY_RNG`` fallback is already a
counter-based Tiny-Encryption-Algorithm hash (rng.hxx:90-122) — precedent for
the design here: every random number is a pure function of

    (base_seed, iteration, stream, global_path_id, slot)

so any sharding of paths over chips/hosts produces bit-identical streams.

We implement Threefry-2x32 (20 rounds, the same core as jax.random) directly
in jnp so we can lay counters out per-path and generate exactly the slots each
pipeline stage needs without materializing whole key arrays.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

_ROTATIONS = np.array([13, 15, 26, 6, 17, 29, 16, 24], dtype=np.uint32)


def _rotl(x, r):
    return (x << jnp.uint32(r)) | (x >> jnp.uint32(32 - r))


def threefry2x32(k0, k1, c0, c1):
    """Threefry-2x32, 20 rounds. All args uint32 arrays (broadcastable).

    Returns two uint32 arrays of the broadcast shape.
    """
    k0 = jnp.asarray(k0, jnp.uint32)
    k1 = jnp.asarray(k1, jnp.uint32)
    x0 = jnp.asarray(c0, jnp.uint32) + k0
    x1 = jnp.asarray(c1, jnp.uint32) + k1

    ks2 = k0 ^ k1 ^ jnp.uint32(0x1BD11BDA)
    keys = (k0, k1, ks2)

    for block in range(5):
        rots = _ROTATIONS[(block % 2) * 4 : (block % 2) * 4 + 4]
        for r in rots:
            x0 = x0 + x1
            x1 = _rotl(x1, int(r))
            x1 = x1 ^ x0
        # Key injection after each 4-round block.
        inj = block + 1
        x0 = x0 + keys[inj % 3]
        x1 = x1 + keys[(inj + 1) % 3] + jnp.uint32(inj)
    return x0, x1


def tea6(k0, k1, c0, c1):
    """Six-round Tiny Encryption Algorithm hash in counter mode.

    The reference's LEGACY_RNG generator is this exact mixing function run
    statefully (rng.hxx:90-122: state += TEA round pair, 6 rounds per draw);
    a wavefront renderer needs counter mode instead, so the two key words
    and two counter words are folded into the initial state and mixed with
    the same rounds. Matches the reference's GetImpl bit-for-bit when
    seeded with the same two state words (tests/test_core.py cross-checks
    against a compiled harness of the algorithm).
    """
    v0 = jnp.asarray(k0, jnp.uint32) + jnp.asarray(c0, jnp.uint32)
    v1 = jnp.asarray(k1, jnp.uint32) ^ jnp.asarray(c1, jnp.uint32)
    s = jnp.uint32(0)
    delta = jnp.uint32(0x9E3779B9)
    for _ in range(6):
        s = s + delta
        v0 = v0 + (
            ((v1 << jnp.uint32(4)) + jnp.uint32(0xA341316C))
            ^ (v1 + s)
            ^ ((v1 >> jnp.uint32(5)) + jnp.uint32(0xC8013EA4))
        )
        v1 = v1 + (
            ((v0 << jnp.uint32(4)) + jnp.uint32(0xAD90777D))
            ^ (v0 + s)
            ^ ((v0 >> jnp.uint32(5)) + jnp.uint32(0x7E95761E))
        )
    return v0, v1


_GENERATORS = {"threefry": threefry2x32, "tea": tea6}


def _to_unit_float(bits):
    """uint32 -> float32 in [0, 1) using the top 24 bits."""
    return (bits >> jnp.uint32(8)).astype(jnp.float32) * jnp.float32(2.0 ** -24)


def uniform_slots(seed: int, stream, path_ids, n_slots: int,
                  generator: str = "threefry"):
    """Generate ``[..., n_slots]`` uniforms in [0,1) for each path.

    seed:      python int (base seed, reference default 1234)
    stream:    python int or scalar — identifies (iteration, stage, bounce)
    path_ids:  int32/uint32 array [...] of *global* path indices
    n_slots:   static number of random values per path
    generator: "threefry" (default) or "tea" — the reference's LEGACY_RNG
               mixing function in counter mode (its `old_rng` build flavor)
    """
    bits2x32 = _GENERATORS[generator]
    path_ids = jnp.asarray(path_ids, jnp.uint32)
    k0 = jnp.uint32(seed & 0xFFFFFFFF)
    k1 = jnp.asarray(stream, jnp.uint32)
    out = []
    for pair in range((n_slots + 1) // 2):
        b0, b1 = bits2x32(k0, k1, path_ids, jnp.uint32(pair))
        out.append(_to_unit_float(b0))
        out.append(_to_unit_float(b1))
    return jnp.stack(out[:n_slots], axis=-1)


def make_stream(iteration, stage: int, bounce: int = 0):
    """Pack (iteration, stage, bounce) into one 32-bit stream id.

    stage < 8, bounce < 64 — plenty for max path length and pipeline stages.
    """
    return (
        jnp.asarray(iteration, jnp.uint32) * jnp.uint32(512)
        + jnp.uint32(stage * 64 + bounce)
    )


# Stage codes (documentation + uniqueness).
STAGE_CAMERA_JITTER = 0
STAGE_LIGHT_EMIT = 1
STAGE_LIGHT_WALK = 2  # + bounce
STAGE_CAMERA_WALK = 3  # + bounce
STAGE_CAMERA_NEE = 4  # + bounce
