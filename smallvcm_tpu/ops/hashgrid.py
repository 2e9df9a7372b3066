"""Fixed-radius neighbor search as a sorted-cell gather (photon merging).

The reference HashGrid (hashgrid.hxx:32-214) counting-sorts particle indices
into per-cell CSR ranges, then probes the 2x2x2 cell neighborhood nearest the
query point. The TPU re-design keeps the exact same spatial hashing and
8-cell probe but builds the CSR with a device sort + searchsorted, and the
query becomes a fixed-K padded gather per cell so the whole range query is
one dense, branch-free computation.

K (max particles visited per cell) must be >= the maximum cell occupancy for
exact parity with the reference (which visits *all* in-radius photons);
``build`` returns the actual max occupancy so callers can size K (rounded to
a power of two to bound recompilation).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class HashGrid(NamedTuple):
    bbox_min: jnp.ndarray      # [3]
    bbox_max: jnp.ndarray      # [3]
    inv_cell_size: jnp.ndarray  # scalar
    sorted_idx: jnp.ndarray    # [M] particle index ordered by cell hash
    cell_start: jnp.ndarray    # [C]
    cell_end: jnp.ndarray      # [C]
    max_occupancy: jnp.ndarray  # scalar int32 (diagnostic / K sizing)


def _hash_cell(cx, cy, cz, num_cells: int):
    """Spatial hash, identical constants to hashgrid.hxx:179-187."""
    ux = cx.astype(jnp.uint32) * jnp.uint32(73856093)
    uy = cy.astype(jnp.uint32) * jnp.uint32(19349663)
    uz = cz.astype(jnp.uint32) * jnp.uint32(83492791)
    return ((ux ^ uy ^ uz) % jnp.uint32(num_cells)).astype(jnp.int32)


def build(positions, valid, radius, num_cells: int) -> HashGrid:
    """Build the grid over [M,3] positions with validity mask.

    Invalid particles sort to a sentinel cell past the end and are never
    returned by queries. Cell size is 2*radius (hashgrid.hxx:64).
    """
    m = positions.shape[0]
    # bbox over valid particles (hashgrid.hxx:50-61)
    big = jnp.float32(1e36)
    pmin = jnp.min(jnp.where(valid[:, None], positions, big), axis=0)
    pmax = jnp.max(jnp.where(valid[:, None], positions, -big), axis=0)

    cell_size = radius * 2.0
    inv_cell = 1.0 / cell_size

    rel = (positions - pmin) * inv_cell
    c = jnp.floor(rel).astype(jnp.int32)
    h = _hash_cell(c[:, 0], c[:, 1], c[:, 2], num_cells)
    h = jnp.where(valid, h, jnp.int32(num_cells))  # sentinel cell

    order = jnp.argsort(h)
    sorted_h = h[order]

    cells = jnp.arange(num_cells, dtype=jnp.int32)
    start = jnp.searchsorted(sorted_h, cells, side="left").astype(jnp.int32)
    end = jnp.searchsorted(sorted_h, cells, side="right").astype(jnp.int32)
    max_occ = jnp.max(end - start)

    return HashGrid(
        bbox_min=pmin,
        bbox_max=pmax,
        inv_cell_size=jnp.asarray(inv_cell, jnp.float32),
        sorted_idx=order.astype(jnp.int32),
        cell_start=start,
        cell_end=end,
        max_occupancy=max_occ.astype(jnp.int32),
    )


def query_candidates(grid: HashGrid, num_cells: int, query_pos, k: int):
    """Return candidate particle indices near each query point.

    query_pos [Nq,3] -> (idx [Nq, 8*k] int32, mask [Nq, 8*k] bool).
    Visits the 2x2x2 neighborhood picked by the fractional cell position
    (hashgrid.hxx:124-138). Distance filtering is left to the caller (it has
    the particle positions).
    """
    # Reject queries outside the particle bbox (hashgrid.hxx:116-122).
    in_bbox = jnp.all(
        (query_pos >= grid.bbox_min) & (query_pos <= grid.bbox_max), axis=-1
    )

    rel = (query_pos - grid.bbox_min) * grid.inv_cell_size
    base = jnp.floor(rel).astype(jnp.int32)
    frac = rel - jnp.floor(rel)
    step = jnp.where(frac < 0.5, -1, 1).astype(jnp.int32)  # [Nq,3]

    idx_chunks = []
    mask_chunks = []
    ks = jnp.arange(k, dtype=jnp.int32)
    for bit in range(8):
        dx = (bit & 1) != 0
        dy = (bit & 2) != 0
        dz = (bit & 4) != 0
        cx = base[:, 0] + jnp.where(dx, step[:, 0], 0)
        cy = base[:, 1] + jnp.where(dy, step[:, 1], 0)
        cz = base[:, 2] + jnp.where(dz, step[:, 2], 0)
        h = _hash_cell(cx, cy, cz, num_cells)
        start = grid.cell_start[h]        # [Nq]
        end = grid.cell_end[h]
        pos = start[:, None] + ks[None, :]  # [Nq,k]
        ok = (pos < end[:, None]) & in_bbox[:, None]
        safe_pos = jnp.minimum(pos, grid.sorted_idx.shape[0] - 1)
        idx_chunks.append(grid.sorted_idx[safe_pos])
        mask_chunks.append(ok)
    return (
        jnp.concatenate(idx_chunks, axis=1),
        jnp.concatenate(mask_chunks, axis=1),
    )
