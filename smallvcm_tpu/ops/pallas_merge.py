"""Pallas TPU kernel for the photon-merge stage (dense slab evaluation).

The XLA merge (algorithms/vcm.py::merge_stage) is bound by two scattered
row gathers per candidate pair (~10 ns/row each on a v5e — ~90 ms each at
8.4M pairs). This backend removes per-pair gathers entirely:

* XLA prep: photons AND queries are compacted, then sorted by a
  lexicographic linear cell key ``(cz, cy, cx)`` over the photon-bbox grid
  (cell = 2r, coords clamped to a static 1024x1024x512 grid; the clamp only
  merges boundary cells — the exact r^2 test keeps results identical,
  hashgrid.hxx:40-107). A row table ``row_start[(cz, cy)]`` maps any
  contiguous run of grid rows to a contiguous range of sorted photons.

* Slab lists: for each tile of 128 cell-sorted queries, the 2x2x2 probe
  neighborhoods (hashgrid.hxx:124-138) of all its queries are covered by 9
  canonical row classes (dy, dz in {-1,0,1}; a query contributes a class
  only when its frac-sign picks that row, so coverage matches the exact
  per-query 4-row probe). Because queries in a tile are key-sorted, each
  class maps to ONE contiguous photon interval via tile-level masked
  min/max + two row_start lookups. The <=9 intervals are rounded to
  128-photon slabs, sorted, and merged into disjoint slab runs — every
  candidate photon appears in exactly one slab of its tile's list.

* Kernel: grid = one step per 128-query tile. Each step DMAs the tile's
  packed slab-run table (<=9 (lo, cum) pairs, 128 bytes) from HBM into
  SMEM, then streams the tile's photon slabs [16, 128] from HBM through a
  double-buffered VMEM scratch with explicit async copies; each slab is
  evaluated as a dense 128x128 pair block on the VPU (exact r^2 +
  path-length window + the camera-BSDF evaluate and MIS weight
  [tech. rep. (38)-(39)], mirroring ops/bsdf.py::evaluate) and accumulated
  into the tile's output block. Per-tile work is data-dependent (a
  fori_loop bound read from SMEM), so there is NO work-list cap to size
  and the kernel's SMEM/VMEM footprint is a small constant — the round-2
  design kept the whole flattened work list as scalar-prefetch arrays in
  SMEM (3 x work_cap int32), which scaled with scene photon density and
  is the prime suspect for the scene-1 scoped-allocation fault on the
  real chip.

Superset slabs are safe (dense pairs are masked by the same r^2 the
reference applies, hashgrid.hxx:157-167); duplicates would not be — the
slab-run merge guarantees uniqueness. Not differentiable (render path
only); AD uses the XLA merge.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.vec3 import V3
from ..core.vecmath import EPS_COSINE, EPS_PHONG, INV_PI_F
from ..ops import bsdf as bsdf_ops
from ..ops import hashgrid as grid_ops

GRID_XY = 1024            # static cells along x and y (clamped)
GRID_Z = 512              # static cells along z
ROWS = GRID_Z * GRID_XY   # 2^19 (row = cz * GRID_XY + cy)
# Sort key = row id only (19 bits + sentinel -> 2 radix passes): photon
# intervals are whole-row granular, so x-order within a row changes
# nothing while a full (cz,cy,cx) key would cost a third radix pass.
_KEY_SENT = jnp.int32(1 << 19)   # > any live row id
SLAB = 128                # photons per kernel slab
# 256 queries per kernel tile (round 5; was 128): per-step fixed costs
# (runs DMA, acc zero, epilogue reduce, grid overhead) measured ~10 us
# against ~2.5 us of pair math, so halving the step count wins even
# though a wider tile spans more photon slabs. 512 was measured WORSE
# (wasted pair work grows faster than the step count shrinks:
# 17.3 M rays/s vs 18.7 M at 256, BENCH_HISTORY).
QTILE = 256               # queries per kernel tile
NBUF = 4                  # photon slabs in flight (DMA pipeline depth)
QF = 32                   # f32 fields per baked query row
PF = 16                   # f32 fields per baked photon row
_QSENT = jnp.float32(3e18)   # out-of-world sentinel for dead queries
_PSENT = jnp.float32(-3e18)  # distinct sentinel for dead photons


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------


def _dense_block(
    r2, vc_w, q, p, *, max_path_length: int, min_path_length: int,
    ppm: bool,
):
    """Evaluate the dense [QTILE, SLAB] pair block -> [QTILE, 3] RGB sums.

    q: [QTILE, QF] baked query rows; p: [PF, SLAB] baked photon slab.
    """
    qc = lambda j: q[:, j:j + 1]      # [128, 1] query column
    pc = lambda j: p[j:j + 1, :]      # [1, 128] photon row

    # Exact r^2 prefilter (hashgrid.hxx:157-167) + path-length window
    # (vertexcm.hxx:132-135).
    dx = qc(0) - pc(0)
    dy = qc(1) - pc(1)
    dz = qc(2) - pc(2)
    dist2 = dx * dx + dy * dy + dz * dz
    tlen = qc(28) + pc(12)
    ok = (
        (dist2 <= r2)
        & (tlen <= jnp.float32(max_path_length))
        & (tlen >= jnp.float32(min_path_length))
    )

    # Camera-BSDF evaluate toward the photon's incoming direction
    # (mirrors ops/bsdf.py::evaluate == bsdf.hxx:128-153).
    ldx, ldy, ldz = -pc(3), -pc(4), -pc(5)   # light_dir = -photon.in_dir
    lg_x = qc(3) * ldx + qc(4) * ldy + qc(5) * ldz
    lg_y = qc(6) * ldx + qc(7) * ldy + qc(8) * ldz
    lg_z = qc(9) * ldx + qc(10) * ldy + qc(11) * ldz

    ldf_z = qc(12)
    same_f = (lg_z * ldf_z >= 0.0).astype(jnp.float32)
    p_diff = qc(16)
    p_phong = qc(17)

    # Diffuse lobe (bsdf.hxx:393-412).
    ok_d = (p_diff > 0.0) & (ldf_z >= EPS_COSINE) & (lg_z >= EPS_COSINE)
    okd_f = ok_d.astype(jnp.float32) * same_f
    dd = p_diff * jnp.maximum(0.0, lg_z * INV_PI_F) * okd_f
    rd = p_diff * jnp.maximum(0.0, ldf_z * INV_PI_F) * okd_f

    # Phong lobe (bsdf.hxx:414-450). One pow serves value and pdf: both
    # are gated on dot_r_wi > EPS_PHONG, where their clamped bases agree.
    dotr = qc(13) * lg_x + qc(14) * lg_y + qc(15) * lg_z
    expo = qc(27)
    ok_p = (
        (p_phong > 0.0) & (ldf_z >= EPS_COSINE) & (lg_z >= EPS_COSINE)
        & (dotr > EPS_PHONG)
    )
    okp_f = ok_p.astype(jnp.float32) * same_f
    lobe = jnp.exp(expo * jnp.log(jnp.maximum(dotr, EPS_PHONG))) * okp_f
    pp = p_phong * (expo + 1.0) * lobe * (0.5 * INV_PI_F)

    dir_pdf = (dd + pp) * qc(18)       # * camera continuation prob
    rev_pdf = (rd + pp) * pc(11)       # * photon continuation prob

    # [tech. rep. (38)-(39)]
    if ppm:
        mis = jnp.ones_like(dir_pdf)
    else:
        w_light = pc(9) * vc_w + pc(10) * dir_pdf
        w_camera = qc(19) * vc_w + qc(20) * rev_pdf
        mis = 1.0 / (w_light + 1.0 + w_camera)

    mis = mis * ok.astype(jnp.float32)
    blocks = []
    for c in range(3):
        # factor_c = diffuse_c/pi [diffuse ok] + rho_c * lobe [phong ok]
        fac = qc(21 + c) * okd_f + qc(24 + c) * lobe
        blocks.append(fac * pc(6 + c) * mis)
    # Full [QTILE, SLAB] blocks, NOT per-slab lane reductions: the caller
    # accumulates blocks across slabs and reduces ONCE per tile — the
    # cross-lane reduction is the slab loop's most expensive op.
    return blocks


# Runs-table layout (one [RUNCOLS] int32 row per query tile, DMA'd to SMEM):
# col 0 = total slab count; col 1+2j = run j's first slab; col 2+2j = the
# cumulative slab count through run j (j = 0..8); rest zero padding
# (Mosaic requires DMA slices 128-aligned along the minor dimension).
RUNCOLS = 128


def _tile_kernel(
    scal_ref,                    # [1, 4] SMEM: r^2, mis_vc_weight, -, -
    q_ref,                       # [1, QTILE, QF] resident query tile (VMEM)
    runs_ref,                    # [n_tiles, RUNCOLS] int32 (HBM)
    ptab_ref,                    # [PF, photon_cap] f32 (HBM)
    out_ref,                     # [8, QTILE] this tile's RGB output
    runs_smem,                   # SMEM scratch [2, RUNCOLS] (double-buffered)
    pbuf,                        # VMEM scratch [NBUF, PF, SLAB]
    acc,                         # VMEM scratch [3, QTILE, SLAB] accumulator
    sem_runs, sem_p,             # DMA semaphores (2,), (NBUF,)
    *, max_path_length: int, min_path_length: int, ppm: bool,
):
    # Cross-step software pipeline (round 5b): the runs table for tile
    # t+1 is fetched DURING tile t's compute, and tile t+1's first
    # NBUF-1 slab DMAs are started in tile t's epilogue — so a steady
    # step never sits in a serial DMA round-trip. Scratch persists
    # across grid steps on one TPU core, which is what makes the
    # hand-off legal. Step 0 pays the one blocking fetch.
    t = pl.program_id(0)
    n_tiles = pl.num_programs(0)
    cur = jax.lax.rem(t, 2)
    nxt = jax.lax.rem(t + 1, 2)

    def runs_fetch(tile, slot):
        return pltpu.make_async_copy(
            runs_ref.at[tile], runs_smem.at[slot], sem_runs.at[slot]
        )

    def slab_of(k, buf):
        """Map flat slab index k -> photon slab id via the <=9 runs."""
        slab = jnp.int32(0)
        prev = jnp.int32(0)
        for j in range(9):
            lo = runs_smem[buf, 1 + 2 * j]
            cum = runs_smem[buf, 2 + 2 * j]
            sel = (k >= prev) & (k < cum)
            slab = jnp.where(sel, lo + (k - prev), slab)
            prev = cum
        return slab

    def slab_dma(k, slot, buf):
        s = slab_of(k, buf)
        return pltpu.make_async_copy(
            ptab_ref.at[:, pl.ds(s * SLAB, SLAB)],
            pbuf.at[slot], sem_p.at[slot],
        )

    def prefill(buf):
        # Fill the slab pipeline for the tile whose runs sit in ``buf``:
        # NBUF-1 fetches started; the body starts one more per iteration,
        # so steady state keeps NBUF-1 in flight plus the one being
        # consumed. The slabs are small (PF*SLAB*4 bytes); per-DMA
        # latency, not HBM bandwidth, bounds the stream, so depth
        # matters more than size.
        tot = runs_smem[buf, 0]
        for j in range(NBUF - 1):
            @pl.when(j < tot)
            def _(j=j):
                slab_dma(j, j % NBUF, buf).start()

    @pl.when(t == 0)
    def _first():
        f = runs_fetch(0, 0)
        f.start()
        f.wait()
        prefill(0)

    # Overlap the NEXT tile's runs fetch with this tile's compute.
    @pl.when(t + 1 < n_tiles)
    def _():
        runs_fetch(t + 1, nxt).start()

    total = runs_smem[cur, 0]

    @pl.when(total > 0)
    def _():
        def compute(k, slot):
            return _dense_block(
                scal_ref[0, 0], scal_ref[0, 1], q_ref[0], pbuf[slot],
                max_path_length=max_path_length,
                min_path_length=min_path_length, ppm=ppm,
            )

        # Peeled slab 0 WRITES the accumulator (bitwise 0+x == x up to
        # zero signs), so no [3, QTILE, SLAB] zero pass is needed.
        @pl.when(jnp.int32(NBUF - 1) < total)
        def _():
            slab_dma(NBUF - 1, NBUF - 1, cur).start()
        slab_dma(0, 0, cur).wait()
        r, g, b = compute(0, 0)
        acc[0] = r
        acc[1] = g
        acc[2] = b

        def body(k, _):
            slot = jax.lax.rem(k, NBUF)

            @pl.when(k + (NBUF - 1) < total)
            def _():
                slab_dma(k + (NBUF - 1),
                         jax.lax.rem(k + (NBUF - 1), NBUF), cur).start()

            slab_dma(k, slot, cur).wait()
            r, g, b = compute(k, slot)
            # Accumulate full blocks; the cross-lane reduction happens
            # ONCE per tile below, not once per slab (the lane reduce was
            # the most expensive op in the slab loop).
            acc[0] += r
            acc[1] += g
            acc[2] += b
            return 0

        jax.lax.fori_loop(1, total, body, 0)

    # Per-tile epilogue: reduce [3, QTILE, SLAB] -> [3, QTILE] lanes and
    # write channel-major. The channel-major output is the layout Mosaic
    # produces natively, so the kernel's logical output layout matches its
    # physical one — downstream XLA programs then consume a DEFAULT-layout
    # buffer (permuted-layout Mosaic outputs poison the tunneled runtime;
    # see merge_prep).
    @pl.when(total > 0)
    def _reduce():
        red = jnp.sum(acc[:], axis=2)                # [3, QTILE]
        out_ref[:] = jnp.concatenate(
            [red, jnp.zeros((5, QTILE), jnp.float32)], axis=0
        )

    @pl.when(total == 0)
    def _zero():
        out_ref[:] = jnp.zeros((8, QTILE), jnp.float32)

    # Hand off to tile t+1: its runs fetch has been in flight since the
    # top of this step; absorb it and start its slab pipeline so step
    # t+1 begins with data already moving.
    @pl.when(t + 1 < n_tiles)
    def _handoff():
        runs_fetch(t + 1, nxt).wait()
        prefill(nxt)


# ---------------------------------------------------------------------------
# XLA-side preparation
# ---------------------------------------------------------------------------


def _f2i(a):
    return jax.lax.bitcast_convert_type(a, jnp.int32)


def _i2f(a):
    return jax.lax.bitcast_convert_type(a, jnp.float32)


def _source_planes(verts):
    """Planar [16, L*N] f32 field planes: pos3 | in_dir3 | normal3 | thr3 |
    d_vcm | d_vm | mat_bits | valid.

    Planar (axis=0) stacking is ~free (pure concatenation); the round-2
    wide-row [L*N, 16] layout cost SECONDS to build on the v5e — a
    16-way lane-interleave the compiler lowers catastrophically
    (measured 3.4 s at [3.1M, 16] vs 30 ms planar;
    scripts/profile_microbench.py). Column gathers on the planar table
    cost the same as row gathers on the wide table, so nothing is lost.
    """
    flat = lambda a: jax.lax.stop_gradient(a).reshape((-1,))
    return jnp.stack([
        flat(verts.position.x), flat(verts.position.y),
        flat(verts.position.z),
        flat(verts.in_dir.x), flat(verts.in_dir.y), flat(verts.in_dir.z),
        flat(verts.normal.x), flat(verts.normal.y), flat(verts.normal.z),
        flat(verts.throughput.x), flat(verts.throughput.y),
        flat(verts.throughput.z),
        flat(verts.d_vcm), flat(verts.d_vm),
        _i2f(verts.mat_id.reshape((-1,))),
        verts.valid.reshape((-1,)).astype(jnp.float32),
    ], axis=0)


def _cells_of(x, y, z, mins, inv_cell, live):
    """Clamped integer cell coords (cell = 2r, hashgrid.hxx:64)."""
    rel = lambda a, mn: jnp.where(live, (a - mn) * inv_cell, 0.0)
    rx, ry, rz = rel(x, mins[0]), rel(y, mins[1]), rel(z, mins[2])
    cl = lambda r, hi: jnp.clip(jnp.floor(r).astype(jnp.int32), 0, hi - 1)
    sgn = lambda r: jnp.where(r - jnp.floor(r) < 0.5, -1, 1).astype(jnp.int32)
    return (
        (cl(rx, GRID_XY), cl(ry, GRID_XY), cl(rz, GRID_Z)),
        (sgn(rx), sgn(ry), sgn(rz)),
    )


def _compact_sorted(planes, keys, cap: int):
    """Compact live columns (valid in plane 15) to ``cap`` slots sorted
    by key. Returns (planes [16, cap], src index [cap], count, overflow).

    One full-width stable key sort subsumes the old cumsum+scatter
    compaction: dead slots carry the key sentinel (strictly above any
    live key) so they sort last, and slicing the first ``cap`` sorted
    positions IS the compaction (sorted position < count <=> live; live
    relative order matches compact-then-sort exactly because the sort is
    stable). Round 5 moved the sort itself to
    :func:`hashgrid.sort_compact_planes` — one (key, iota) lax.sort plus
    a single [16, cap] payload gather, ~4x cheaper than the packed-radix
    argsort it replaces (scripts/profile_sort_variants.py). Dead slots
    beyond ``count`` gather real (invalid) source columns; every
    downstream consumer masks by the live count."""
    valid = planes[15] > 0.0
    count = jnp.sum(valid.astype(jnp.int32))
    sorted_planes, src = grid_ops.sort_compact_planes(
        keys.astype(jnp.uint32), planes, cap
    )
    return sorted_planes, src, count, jnp.maximum(count - cap, 0)


def merge_prep(
    scene, misc, queries, light_verts,
    photon_cap: int, query_cap: int, n_paths: int,
    measure_only: bool = False,
):
    """XLA half of the Pallas merge: compaction, cell sort, table bake.

    Returns ((scal, qtab, runs_tbl, ptab), q_path, n_q, overflow, stats)
    — the first tuple is exactly the kernel's operand list, so a driver
    can run prep / kernel / post as THREE separate executables: on the
    tunneled TPU runtime, an executable that mixes this (large) XLA
    program with the Mosaic kernel faults on RE-execution
    (INVALID_ARGUMENT; reproduced in scripts/repro_mosaic_fault.py:
    kernel-only and XLA-only programs re-execute fine, the combined one
    faults on its second execution), so production keeps the kernel in
    its own tiny executable.

    With ``measure_only`` the tables are not baked: returns
    (None, None, n_q, overflow, stats) after the sizing math only.
    """
    assert photon_cap % SLAB == 0 and query_cap % QTILE == 0
    lq, n = queries.valid.shape
    ll, n_ph = light_verts.valid.shape
    assert n == n_paths
    n_tiles = query_cap // QTILE
    n_slabs = photon_cap // SLAB
    sg = jax.lax.stop_gradient

    # ---- Photons: bbox, keys, compact + sort, bake, row table. -----------
    psrc = _source_planes(light_verts)
    pv = psrc[15] > 0.0
    big = jnp.float32(1e36)
    vmin = lambda c: jnp.min(jnp.where(pv, psrc[c], big))
    vmax = lambda c: jnp.max(jnp.where(pv, psrc[c], -big))
    mins = (vmin(0), vmin(1), vmin(2))
    maxs = (vmax(0), vmax(1), vmax(2))
    inv_cell = sg(1.0 / (misc.radius * 2.0))

    (pcx, pcy, pcz), _ = _cells_of(
        psrc[0], psrc[1], psrc[2], mins, inv_cell, pv
    )
    prow_id = pcz * GRID_XY + pcy
    pkey = jnp.where(pv, prow_id, _KEY_SENT)
    prows, psrc_idx, n_p, ovf_p = _compact_sorted(psrc, pkey, photon_cap)
    plive = jnp.arange(photon_cap, dtype=jnp.int32) < n_p

    # row_start[r] = index of the first sorted photon with row >= r (the
    # exclusive prefix of the row histogram — identical because photons
    # are row-sorted). Derived from the SORTED slots: one boundary
    # scatter-min at [photon_cap] + one reverse cummin at [ROWS] replaces
    # the full-width [ll*n] scatter-add histogram. On photon-cap overflow
    # rows of dropped photons may resolve to a later row's start; the
    # interval code below clamps to photon_cap either way and the driver
    # discards the attempt.
    (scx, scy, scz), _ = _cells_of(
        prows[0], prows[1], prows[2], mins, inv_cell, plive
    )
    srow = jnp.where(plive, scz * GRID_XY + scy, ROWS)  # [cap] sorted rows
    first = jnp.concatenate(
        [jnp.ones((1,), bool), srow[1:] != srow[:-1]]
    )
    # Non-first slots scatter out of bounds (dropped): only each row's
    # FIRST slot may contribute, and the first dead slot (srow == ROWS,
    # position n_p) is itself a boundary, giving row_start[ROWS] = n_p.
    firstpos = jnp.full((ROWS + 1,), jnp.int32(1 << 30)).at[
        jnp.where(first, srow, ROWS + 1)
    ].min(jnp.arange(photon_cap, dtype=jnp.int32), mode="drop")
    row_start = jnp.minimum(
        jax.lax.cummin(firstpos[::-1])[::-1], n_p
    ).astype(jnp.int32)  # [ROWS + 1]; row_start[ROWS] == live count

    # Bake the kernel photon table [PF, photon_cap]:
    # 0-2 pos | 3-5 in_dir | 6-8 throughput | 9 d_vcm | 10 d_vm |
    # 11 continuation prob | 12 path length | 13-15 pad.
    p_in = V3(prows[3], prows[4], prows[5])
    p_nrm = V3(prows[6], prows[7], prows[8])
    p_mat = _f2i(prows[14])
    p_cont = bsdf_ops.setup(scene.materials, p_in, p_nrm, p_mat,
                            plive).cont_prob
    p_len = (psrc_idx // n_ph + 1).astype(jnp.float32)
    pm = lambda a: jnp.where(plive, a, 0.0)
    zp = jnp.zeros((photon_cap,), jnp.float32)
    ptab = jnp.stack([
        jnp.where(plive, prows[0], _PSENT),
        jnp.where(plive, prows[1], _PSENT),
        jnp.where(plive, prows[2], _PSENT),
        pm(prows[3]), pm(prows[4]), pm(prows[5]),
        pm(prows[9]), pm(prows[10]), pm(prows[11]),
        pm(prows[12]), pm(prows[13]),
        pm(p_cont), pm(p_len), zp, zp, zp,
    ], axis=0)  # [PF, photon_cap]

    # ---- Queries: keys, compact + sort, bake. ----------------------------
    qsrc = _source_planes(queries)
    qv0 = qsrc[15] > 0.0
    (qcx0, qcy0, qcz0), (qsx0, qsy0, qsz0) = _cells_of(
        qsrc[0], qsrc[1], qsrc[2], mins, inv_cell, qv0
    )
    qkey_all = jnp.where(qv0, qcz0 * GRID_XY + qcy0, _KEY_SENT)
    qrows, qsrc_idx, n_q, ovf_q = _compact_sorted(qsrc, qkey_all, query_cap)
    qlive = jnp.arange(query_cap, dtype=jnp.int32) < n_q

    qx, qy, qz = qrows[0], qrows[1], qrows[2]
    # Bbox rejection (hashgrid.hxx:116-122) padded by the merge radius:
    # same-plane camera hits can sit f32-ULPs outside the tight photon
    # bbox and would silently lose ~2% of in-radius pairs (see the note in
    # vcm.py::merge_stage). The clamped cell coords + +/-1 row probe cover
    # padded queries geometrically, so this stays exact.
    pad = sg(misc.radius)
    in_bbox = (
        (qx >= mins[0] - pad) & (qx <= maxs[0] + pad)
        & (qy >= mins[1] - pad) & (qy <= maxs[1] + pad)
        & (qz >= mins[2] - pad) & (qz <= maxs[2] + pad)
    )
    (qcx, qcy, qcz), (_, qsy, qsz) = _cells_of(
        qx, qy, qz, mins, inv_cell, qlive
    )

    q_in = V3(qrows[3], qrows[4], qrows[5])
    q_nrm = V3(qrows[6], qrows[7], qrows[8])
    q_mat = _f2i(qrows[14])
    b = bsdf_ops.setup(scene.materials, q_in, q_nrm, q_mat, qlive)
    diffuse = sg(scene.materials.diffuse[b.mat_id])
    phong = sg(scene.materials.phong[b.mat_id])
    expo = sg(scene.materials.exponent[b.mat_id])
    rho_s = (expo + 2.0) * (0.5 * INV_PI_F)
    q_len = (qsrc_idx // n + 1).astype(jnp.float32)
    q_path = (qsrc_idx % n).astype(jnp.int32)

    qm = lambda a: jnp.where(qlive, a, 0.0)
    zq = jnp.zeros((query_cap,), jnp.float32)
    # Baked query fields (planar, then tiled-transposed — see below):
    # 0-2 pos | 3-11 frame x/y/z | 12 local_dir_fix.z | 13-15 refl_fix |
    # 16 prob_diff | 17 prob_phong | 18 cont | 19 d_vcm | 20 d_vm |
    # 21-23 diffuse/pi | 24-26 phong rho | 27 exponent | 28 path length |
    # 29-31 throughput.
    # Out-of-bbox queries get the sentinel too: the reference skips them
    # before probing (hashgrid.hxx:116-122), but the dense tile evaluates
    # every resident query against slabs its tile-mates requested — the
    # sentinel keeps those lanes out of radius, matching the reference.
    q_on = qlive & in_bbox
    qtab_planar = jnp.stack([
        jnp.where(q_on, qx, _QSENT),
        jnp.where(q_on, qy, _QSENT),
        jnp.where(q_on, qz, _QSENT),
        qm(b.frame_x.x), qm(b.frame_x.y), qm(b.frame_x.z),
        qm(b.frame_y.x), qm(b.frame_y.y), qm(b.frame_y.z),
        qm(b.frame_z.x), qm(b.frame_z.y), qm(b.frame_z.z),
        qm(b.local_dir_fix.z),
        qm(-b.local_dir_fix.x), qm(-b.local_dir_fix.y),
        qm(b.local_dir_fix.z),
        # evaluate() gates every lobe on state.valid (|ldf.z| >= eps,
        # mat >= 0); zeroed probabilities reproduce that gate exactly.
        jnp.where(qlive & b.valid, b.prob_diff, 0.0),
        jnp.where(qlive & b.valid, b.prob_phong, 0.0),
        qm(b.cont_prob),
        qm(qrows[12]), qm(qrows[13]),
        qm(diffuse.x * INV_PI_F), qm(diffuse.y * INV_PI_F),
        qm(diffuse.z * INV_PI_F),
        qm(phong.x * rho_s), qm(phong.y * rho_s), qm(phong.z * rho_s),
        qm(expo), qm(q_len),
        qm(qrows[9]), qm(qrows[10]), qm(qrows[11]),
    ], axis=0)  # [QF, query_cap]; axis=0 stack is ~free (planar)
    # Kernel tile layout [n_tiles, QTILE, QF]: a direct [QF, cap] ->
    # [cap, QF] transpose costs SECONDS on the v5e, but the tiled
    # reshape-transpose is free (~0 ms measured) — same data, laid out so
    # each grid step reads one (QTILE, QF) VMEM block.
    qtab = qtab_planar.reshape(QF, n_tiles, QTILE).transpose(1, 2, 0)

    # ---- Per-tile photon intervals: 9 canonical row classes. -------------
    t = lambda a: a.reshape((n_tiles, QTILE))
    cy_t, cz_t = t(qcy), t(qcz)
    sy_t, sz_t = t(qsy), t(qsz)
    probe_t = t(qlive & in_bbox)

    los, his = [], []
    for dz_c in (-1, 0, 1):
        for dy_c in (-1, 0, 1):
            m = probe_t
            if dy_c != 0:
                m = m & (sy_t == dy_c)
            if dz_c != 0:
                m = m & (sz_t == dz_c)
            tr = (
                jnp.clip(cz_t + dz_c, 0, GRID_Z - 1) * GRID_XY
                + jnp.clip(cy_t + dy_c, 0, GRID_XY - 1)
            )
            tr_min = jnp.min(jnp.where(m, tr, ROWS), axis=1)
            tr_max = jnp.max(jnp.where(m, tr, -1), axis=1)
            empty = tr_max < 0
            # row_start indexes LIVE photons (uncapped); when the photon
            # compaction cap overflowed, values beyond photon_cap exist —
            # clamp so slab ids stay in-bounds (an unclamped interval sent
            # the kernel an out-of-bounds DMA on scene 1's photon-heavy
            # distribution; overflow is still reported and the driver
            # re-renders at grown caps, so clamping only affects the
            # discarded attempt).
            lo = jnp.minimum(row_start[jnp.where(empty, 0, tr_min)],
                             photon_cap)
            hi = jnp.minimum(row_start[jnp.where(empty, 0, tr_max + 1)],
                             photon_cap)
            bad = empty | (hi <= lo)
            los.append(jnp.where(bad, jnp.int32(1 << 30), lo // SLAB))
            his.append(jnp.where(bad, 0, (hi + SLAB - 1) // SLAB))
    s_lo = jnp.stack(los, axis=1)                      # [n_tiles, 9]
    s_hi = jnp.stack(his, axis=1)
    s_lo, s_hi = jax.lax.sort((s_lo, s_hi), dimension=1, num_keys=1)

    # Merge overlapping/adjacent slab ranges (each slab must appear once).
    cummax_hi = jax.lax.cummax(s_hi, axis=1)
    prev_hi = jnp.concatenate(
        [jnp.full((n_tiles, 1), -1, jnp.int32), cummax_hi[:, :-1]], axis=1
    )
    group_id = jnp.cumsum((s_lo > prev_hi).astype(jnp.int32), axis=1) - 1
    glo_l, ghi_l = [], []
    for g in range(9):
        member = group_id == g
        glo_l.append(
            jnp.min(jnp.where(member, s_lo, jnp.int32(1 << 30)), axis=1)
        )
        ghi_l.append(jnp.max(jnp.where(member, s_hi, 0), axis=1))
    glo = jnp.stack(glo_l, axis=1)
    ghi = jnp.stack(ghi_l, axis=1)
    glen = jnp.where(glo >= (1 << 30), 0, jnp.maximum(ghi - glo, 0))

    # ---- Per-tile runs table (col layout: see RUNCOLS note above). -------
    total_work = jnp.minimum(jnp.sum(glen), jnp.int32(1 << 24))
    stats = jnp.stack([total_work * SLAB, n_p, n_q])
    overflow = ovf_p + ovf_q
    if measure_only:
        return None, None, n_q, overflow, stats

    glo_c = jnp.clip(jnp.where(glen > 0, glo, 0), 0, n_slabs - 1)
    cums = jnp.cumsum(glen, axis=1).astype(jnp.int32)   # [n_tiles, 9]
    cols = [cums[:, 8:9]]                               # col 0 = total
    for j in range(9):
        cols.append(glo_c[:, j:j + 1])
        cols.append(cums[:, j:j + 1])
    cols.append(jnp.zeros((n_tiles, RUNCOLS - 19), jnp.int32))
    runs_tbl = jnp.concatenate(cols, axis=1)            # [n_tiles, RUNCOLS]

    # NOTE: the (r^2, mis_vc_weight) scalar operand is NOT built here.
    # As a (1, 4) jit output XLA gives it a nonstandard ((1,128)) tile
    # layout, and the kernel executable (compiled for standard tiling)
    # faults with INVALID_ARGUMENT when fed that buffer on the tunneled
    # runtime. Drivers build scal host-side (make_scal) so it always has
    # the default tiling of a fresh device array.
    return (qtab, runs_tbl, ptab), q_path, n_q, overflow, stats


def run_tile_kernel(
    scal, qtab, runs_tbl, ptab, *,
    max_path_length: int, min_path_length: int, ppm: bool,
    interpret: bool = False, name_salt: str = "",
):
    """The bare Mosaic kernel over pre-baked tables -> channel-major
    [8, n_tiles*QTILE] result planes.

    Kept free of surrounding XLA work on purpose: this exact program
    re-executes reliably on the tunneled runtime (see merge_prep's note).
    """
    n_tiles = qtab.shape[0]
    query_cap = n_tiles * QTILE
    photon_cap = ptab.shape[1]
    return pl.pallas_call(
        functools.partial(
            _tile_kernel, max_path_length=max_path_length,
            min_path_length=min_path_length, ppm=ppm,
        ),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 4), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, QTILE, QF), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),       # runs table (HBM)
            pl.BlockSpec(memory_space=pl.ANY),       # photon tab (HBM)
        ],
        out_specs=pl.BlockSpec((8, QTILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, n_tiles * QTILE), jnp.float32),
        scratch_shapes=[
            pltpu.SMEM((2, RUNCOLS), jnp.int32),
            pltpu.VMEM((NBUF, PF, SLAB), jnp.float32),
            pltpu.VMEM((3, QTILE, SLAB), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((NBUF,)),
        ],
        # Shape- AND caller-qualified name: the tunneled backend's
        # program cache confuses same-named Mosaic kernels compiled in
        # DIFFERENT surrounding programs (identical shapes included) —
        # round 5 reproduced it as the block=8 program poisoning the
        # block=1 program's kernel, the old 'block=1 faults persistently'
        # bug. Callers pass a name_salt that identifies the enclosing
        # program (e.g. the block size).
        name=f"merge_tiles_{photon_cap}_{query_cap}_{int(ppm)}"
             f"{name_salt}",
        interpret=interpret,
    )(scal, qtab, runs_tbl, ptab)


# Jitted flavor for the split-executable production path: the kernel is
# the ENTIRE program.
run_tile_kernel_jit = jax.jit(
    run_tile_kernel,
    static_argnames=("max_path_length", "min_path_length", "ppm",
                     "interpret"),
)

def merge_post(out, qtab, q_path, n_q, vm_normalization, n_paths: int):
    """Scale kernel output by camera throughput + vm normalization and
    scatter-add to the owning path -> color_add V3 [n_paths].

    ``out`` is channel-major [8, query_cap]; ``qtab`` is tile-shaped
    [n_tiles, QTILE, QF]."""
    # Tiles with no work write zeros, so no visited mask is needed; dead
    # query rows carry the position sentinel and can never pass the r^2
    # test, so their lanes are zero too. Queries arrive CELL-sorted, so
    # the path destinations are effectively random — the same sorted
    # 3-wide scatter as io/framebuffer.py::splat_colors beats the direct
    # shared-index column scatter (~13 -> ~10 ms at 786k rows): one
    # (pdst, iota, r, g, b) stable sort, then an ascending-index [M, 3]
    # row scatter. The iota tiebreak keeps the add order deterministic
    # (it matches ascending query order within a path, the same order
    # the unsorted scatter applied).
    query_cap = out.shape[1]
    qlive = jnp.arange(query_cap, dtype=jnp.int32) < n_q
    pdst = jnp.where(qlive, q_path, n_paths).astype(jnp.uint32)
    thr = qtab[:, :, 29:32].transpose(2, 0, 1).reshape(3, query_cap)
    scaled = out[:3] * thr * vm_normalization
    iota = jnp.arange(query_cap, dtype=jnp.int32)
    sk, _si, sr, sg, sb = jax.lax.sort(
        (pdst, iota, scaled[0], scaled[1], scaled[2]), num_keys=2
    )
    v3 = jnp.stack([sr, sg, sb], axis=1)            # [M, 3]
    z = jnp.zeros((n_paths, 3), jnp.float32).at[sk.astype(jnp.int32)].add(
        v3, mode="drop", indices_are_sorted=True
    )
    return V3(z[:, 0], z[:, 1], z[:, 2])


def make_scal(radius_sqr, mis_vc_weight):
    """The kernel's [1, 4] SMEM scalar operand, as a FRESH device array
    (default tiling — see merge_prep's note). Host floats in, device out."""
    return jnp.asarray(
        [[radius_sqr, mis_vc_weight, 0.0, 0.0]], jnp.float32
    )


def merge_stage_pallas(
    scene, misc, queries, light_verts, work_cap: int, ppm: bool,
    max_path_length: int, min_path_length: int,
    photon_cap: int, query_cap: int, n_paths: int,
    interpret: bool = False, measure_only: bool = False,
    name_salt: str = "",
):
    """Single-trace wrapper (prep + kernel + post in one program) with the
    historical contract: (color_add V3 [n_paths], overflow, stats[3]).

    ``work_cap`` is accepted for driver compatibility but UNUSED: per-tile
    slab work is data-dependent inside the kernel, so only the
    photon/query compaction caps can overflow. This single-trace form IS
    the production configuration (fused inside the block executable —
    render.py::_resolve_backend): splitting prep/kernel/post into
    separate executables destabilizes the tunneled TPU runtime (see
    merge_prep's fault note), while the fused program re-executes
    reliably.
    """
    prep, q_path, n_q, overflow, stats = merge_prep(
        scene, misc, queries, light_verts, photon_cap, query_cap,
        n_paths, measure_only=measure_only,
    )
    if measure_only:
        return None, overflow, stats
    scal = jnp.stack([
        misc.radius_sqr.astype(jnp.float32),
        jnp.asarray(misc.mis_vc_weight, jnp.float32),
        jnp.float32(0.0), jnp.float32(0.0),
    ]).reshape(1, 4)
    out = run_tile_kernel(
        scal, *prep, max_path_length=max_path_length,
        min_path_length=min_path_length, ppm=ppm, interpret=interpret,
        name_salt=name_salt,
    )
    color_add = merge_post(
        out, prep[0], q_path, n_q, misc.vm_normalization, n_paths
    )
    return color_add, overflow, stats
