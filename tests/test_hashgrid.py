"""Hashgrid correctness: query results equal brute-force range search."""

import numpy as np
import jax.numpy as jnp

from smallvcm_tpu.ops import hashgrid


def _brute_force(positions, valid, queries, radius):
    out = []
    for q in queries:
        d2 = ((positions - q) ** 2).sum(-1)
        out.append(set(np.nonzero((d2 <= radius * radius) & valid)[0]))
    return out


def test_query_matches_brute_force():
    g = np.random.default_rng(0)
    m, nq = 4000, 256
    radius = 0.05
    positions = g.uniform(size=(m, 3)).astype(np.float32)
    valid = g.uniform(size=m) < 0.9
    queries = g.uniform(0.1, 0.9, size=(nq, 3)).astype(np.float32)

    num_cells = 1024
    grid = hashgrid.build(
        jnp.asarray(positions), jnp.asarray(valid), jnp.float32(radius),
        num_cells,
    )
    k = int(grid.max_occupancy)
    idx, mask = hashgrid.query_candidates(
        grid, num_cells, jnp.asarray(queries), k
    )
    idx, mask = np.asarray(idx), np.asarray(mask)

    expected = _brute_force(positions, valid, queries, radius)
    for qi in range(nq):
        cand = set(idx[qi][mask[qi]])
        # distance filter (the caller's job)
        within = {
            c for c in cand
            if ((positions[c] - queries[qi]) ** 2).sum() <= radius * radius
            and valid[c]
        }
        assert within == expected[qi], qi


def test_invalid_particles_never_returned():
    g = np.random.default_rng(1)
    m = 1000
    positions = g.uniform(size=(m, 3)).astype(np.float32)
    valid = np.zeros(m, bool)
    valid[: m // 2] = True
    grid = hashgrid.build(
        jnp.asarray(positions), jnp.asarray(valid), jnp.float32(0.2), 256
    )
    idx, mask = hashgrid.query_candidates(
        grid, 256, jnp.asarray(positions[:64]), int(grid.max_occupancy)
    )
    returned = set(np.asarray(idx)[np.asarray(mask)])
    assert all(valid[i] for i in returned)


def test_out_of_bbox_query_returns_nothing():
    g = np.random.default_rng(2)
    positions = g.uniform(size=(100, 3)).astype(np.float32)
    grid = hashgrid.build(
        jnp.asarray(positions), jnp.ones(100, bool), jnp.float32(0.1), 64
    )
    far = jnp.asarray([[10.0, 10.0, 10.0]])
    idx, mask = hashgrid.query_candidates(grid, 64, far, 4)
    assert not bool(np.asarray(mask).any())


def test_max_occupancy_bounds_cells():
    g = np.random.default_rng(3)
    positions = g.uniform(size=(500, 3)).astype(np.float32)
    grid = hashgrid.build(
        jnp.asarray(positions), jnp.ones(500, bool), jnp.float32(0.05), 128
    )
    starts = np.asarray(grid.cell_start)
    ends = np.asarray(grid.cell_end)
    assert (ends - starts).max() == int(grid.max_occupancy)
    assert (ends >= starts).all()
