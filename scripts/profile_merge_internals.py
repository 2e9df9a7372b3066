"""Time the merge stage's internal phases on the real chip.

Replicates merge_stage's four phases as separate jits (each timing includes
~24 ms tunneled-dispatch overhead; compare deltas, not absolutes):
  P1 photon compact + cell hash + radix sort + payload permute
  P2 query compact + 8-cell probe + qrow pack
  P3 pair expansion: seg-head scatter + cummax + qr/pr row gathers + r^2
  P4 survivor sort + payload gathers + BSDF/MIS + scatter-add
"""

import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp

from smallvcm_tpu.scene.scene import SCENE_CONFIGS, load_cornell_box
from smallvcm_tpu.algorithms import vcm
from smallvcm_tpu.ops import hashgrid as grid_ops


def timeit(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.time() - t0) / reps, out


def main():
    res = 512
    n = res * res
    scene = load_cornell_box((res, res), SCENE_CONFIGS[0])
    misc = vcm.compute_misc(scene, 1, n, 0.003, 0.75, True, True)
    pix = jnp.arange(n, dtype=jnp.uint32)

    from smallvcm_tpu.io.framebuffer import new_fb_planes

    @jax.jit
    def light_stage(it):
        fb = new_fb_planes(res, res)
        verts, fb, rays = vcm.trace_light_paths(
            scene, misc, pix, it, fb, 1234, 10, 0, True, True, False
        )
        return verts

    verts = light_stage(1)
    jax.block_until_ready(verts)
    queries = verts  # same structure/scale as camera queries

    num_cells = 2 * n
    photon_cap = 3 * n
    query_cap = 3 * n
    pair_cap = 32 * n

    flat = lambda a: a.reshape((-1,))
    sg = jax.lax.stop_gradient
    f2i = lambda a: jax.lax.bitcast_convert_type(sg(a), jnp.int32)
    i2f = lambda a: jax.lax.bitcast_convert_type(a, jnp.float32)

    def payload_rows(v):
        cols = [
            flat(v.position.x), flat(v.position.y), flat(v.position.z),
            flat(v.in_dir.x), flat(v.in_dir.y), flat(v.in_dir.z),
            flat(v.normal.x), flat(v.normal.y), flat(v.normal.z),
            flat(v.throughput.x), flat(v.throughput.y), flat(v.throughput.z),
            flat(v.d_vcm), flat(v.d_vm),
        ]
        return jnp.stack(cols, axis=1)

    ll, n_ph = verts.valid.shape

    @jax.jit
    def p1_photons(light_verts):
        idx_p, n_p, ovf_p = grid_ops.compact_indices(
            flat(light_verts.valid), photon_cap)
        pvalid_c = jnp.arange(photon_cap, dtype=jnp.int32) < n_p
        pf_c = payload_rows(light_verts)[idx_p]
        p_mat_c = flat(light_verts.mat_id)[idx_p]
        p_len_c = idx_p // n_ph + 1

        px, py, pz = sg(pf_c[:, 0]), sg(pf_c[:, 1]), sg(pf_c[:, 2])
        big = jnp.float32(1e36)
        vmin = lambda a: jnp.min(jnp.where(pvalid_c, a, big))
        vmax = lambda a: jnp.max(jnp.where(pvalid_c, a, -big))
        mnx, mny, mnz = vmin(px), vmin(py), vmin(pz)
        inv_cell = sg(1.0 / (misc.radius * 2.0))

        def cell_of(x, y, z):
            return (
                jnp.floor((x - mnx) * inv_cell).astype(jnp.int32),
                jnp.floor((y - mny) * inv_cell).astype(jnp.int32),
                jnp.floor((z - mnz) * inv_cell).astype(jnp.int32),
            )

        h = grid_ops._hash_cell(*cell_of(px, py, pz), num_cells)
        h = jnp.where(pvalid_c, h, jnp.int32(num_cells))
        order = grid_ops.stable_radix_argsort(
            h.astype(jnp.uint32), grid_ops._ceil_log2(num_cells + 1)
        ).astype(jnp.int32)
        cell_count = jnp.zeros((num_cells,), jnp.int32).at[h].add(
            1, mode="drop")
        cell_start = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32),
             jnp.cumsum(cell_count)[:-1].astype(jnp.int32)]
        )
        cell_tbl = jnp.stack([cell_start, cell_count], axis=1)
        pf_s = pf_c[order]
        p_mat_s = p_mat_c[order]
        p_len_s = p_len_c[order]
        p1 = jnp.stack(
            [f2i(pf_s[:, 0]), f2i(pf_s[:, 1]), f2i(pf_s[:, 2]), p_len_s],
            axis=1)
        return p1, pf_s, p_mat_s, cell_tbl, (mnx, mny, mnz), inv_cell

    t, p1_out = timeit(p1_photons, verts)
    print(f"P1 photon compact+sort+permute : {t*1e3:8.1f} ms")
    p1, pf_s, p_mat_s, cell_tbl, mins, inv_cell = p1_out

    # sub-split of P1
    @jax.jit
    def p1a_compact(light_verts):
        idx_p, n_p, ovf_p = grid_ops.compact_indices(
            flat(light_verts.valid), photon_cap)
        return payload_rows(light_verts)[idx_p], idx_p, n_p

    t, _ = timeit(p1a_compact, verts)
    print(f"  P1a compact_indices + payload gather : {t*1e3:8.1f} ms")

    @jax.jit
    def p1b_sort(h):
        return grid_ops.stable_radix_argsort(
            h.astype(jnp.uint32), grid_ops._ceil_log2(num_cells + 1))

    hkey = jax.random.randint(jax.random.PRNGKey(0), (photon_cap,), 0,
                              num_cells, dtype=jnp.int32)
    t, _ = timeit(p1b_sort, hkey)
    print(f"  P1b radix argsort {photon_cap/1e6:.1f}M keys, "
          f"{grid_ops._ceil_log2(num_cells + 1)} bits : {t*1e3:8.1f} ms")

    mnx, mny, mnz = mins

    @jax.jit
    def p2_queries(queries):
        idx_q, n_q, ovf_q = grid_ops.compact_indices(
            flat(queries.valid), query_cap)
        qvalid_c = jnp.arange(query_cap, dtype=jnp.int32) < n_q
        qf_c = payload_rows(queries)[idx_q]
        q_mat_c = flat(queries.mat_id)[idx_q]
        q_len_c = idx_q // n_ph + 1
        q_path_c = (idx_q % n_ph).astype(jnp.int32)

        qx, qy, qz = sg(qf_c[:, 0]), sg(qf_c[:, 1]), sg(qf_c[:, 2])
        in_bbox = (qx >= mnx) & (qy >= mny) & (qz >= mnz)

        def cell_of(x, y, z):
            return (
                jnp.floor((x - mnx) * inv_cell).astype(jnp.int32),
                jnp.floor((y - mny) * inv_cell).astype(jnp.int32),
                jnp.floor((z - mnz) * inv_cell).astype(jnp.int32),
            )

        bx, by, bz = cell_of(qx, qy, qz)
        frac = lambda a, mn: (a - mn) * inv_cell
        pick = lambda r: jnp.where(
            r - jnp.floor(r) < 0.5, -1, 1).astype(jnp.int32)
        sx = pick(frac(qx, mnx))
        sy = pick(frac(qy, mny))
        sz = pick(frac(qz, mnz))

        starts8, counts8 = [], []
        live = qvalid_c & in_bbox
        for bit in range(8):
            hc = grid_ops._hash_cell(
                bx + (sx if bit & 1 else 0),
                by + (sy if bit & 2 else 0),
                bz + (sz if bit & 4 else 0),
                num_cells,
            )
            rc = cell_tbl[hc]
            starts8.append(rc[:, 0])
            counts8.append(jnp.where(live, rc[:, 1], 0))
        starts8 = jnp.stack(starts8, axis=1)
        counts8 = jnp.stack(counts8, axis=1)
        per_q = jnp.sum(counts8, axis=1)
        incl = jnp.cumsum(counts8, axis=1)
        excl = incl - counts8
        adj = starts8 - excl
        qrow20 = jnp.concatenate(
            [f2i(qx)[:, None], f2i(qy)[:, None], f2i(qz)[:, None],
             q_len_c[:, None], incl, adj], axis=1)
        return qrow20, per_q, qf_c, q_mat_c, q_path_c

    t, p2_out = timeit(p2_queries, queries)
    print(f"P2 query compact+probe+pack    : {t*1e3:8.1f} ms")
    qrow20, per_q, qf_c, q_mat_c, q_path_c = p2_out

    @jax.jit
    def p3_pairs(qrow20, per_q, p1):
        offs = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32),
             jnp.cumsum(per_q)[:-1].astype(jnp.int32)])
        total = offs[-1] + per_q[-1]
        qrow = jnp.concatenate([offs[:, None], qrow20], axis=1)
        seg_head = jnp.zeros((pair_cap,), jnp.int32).at[offs].max(
            jnp.where(per_q > 0, jnp.arange(query_cap, dtype=jnp.int32), 0),
            mode="drop")
        qseg = jax.lax.cummax(seg_head)
        qr = qrow[qseg]
        p_iota = jnp.arange(pair_cap, dtype=jnp.int32)
        rank = p_iota - qr[:, 0]
        pair_ok = (p_iota < total) & (rank >= 0) & (rank < qr[:, 12])
        php = qr[:, 20]
        for j in range(6, -1, -1):
            php = jnp.where(rank < qr[:, 5 + j], qr[:, 13 + j], php)
        php = php + rank
        php_safe = jnp.clip(php, 0, photon_cap - 1)
        pr = p1[php_safe]
        dx = i2f(pr[:, 0]) - i2f(qr[:, 1])
        dy = i2f(pr[:, 1]) - i2f(qr[:, 2])
        dz = i2f(pr[:, 2]) - i2f(qr[:, 3])
        pair_ok = pair_ok & (dx * dx + dy * dy + dz * dz <= misc.radius_sqr)
        total_len = pr[:, 3] + qr[:, 4]
        pair_ok = pair_ok & (total_len <= 10)
        return pair_ok, qseg, php_safe, total

    t, p3_out = timeit(p3_pairs, qrow20, per_q, p1)
    pair_ok, qseg, php_safe, total = p3_out
    n_surv = int(jnp.sum(pair_ok))
    print(f"P3 pair expansion (cap {pair_cap/1e6:.1f}M)  : {t*1e3:8.1f} ms"
          f"  pairs={int(total)} survivors={n_surv}")

    # P3 sub-splits
    @jax.jit
    def p3a_seg(per_q):
        offs = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32),
             jnp.cumsum(per_q)[:-1].astype(jnp.int32)])
        seg_head = jnp.zeros((pair_cap,), jnp.int32).at[offs].max(
            jnp.where(per_q > 0, jnp.arange(query_cap, dtype=jnp.int32), 0),
            mode="drop")
        return jax.lax.cummax(seg_head)

    t, _ = timeit(p3a_seg, per_q)
    print(f"  P3a offs+scatter+cummax : {t*1e3:8.1f} ms")

    @jax.jit
    def p3b_qr(qseg, qrow20):
        qrow = jnp.concatenate(
            [jnp.zeros((query_cap, 1), jnp.int32), qrow20], axis=1)
        return qrow[qseg]

    t, _ = timeit(p3b_qr, qseg, qrow20)
    print(f"  P3b qr gather 21-col    : {t*1e3:8.1f} ms")

    @jax.jit
    def p3c_pr(php_safe, p1):
        return p1[php_safe]

    t, _ = timeit(p3c_pr, php_safe, p1)
    print(f"  P3c pr gather 4-col     : {t*1e3:8.1f} ms")

    surv_cap = pair_cap // 4

    @jax.jit
    def p4_eval(pair_ok, qseg, php_safe, pf_s, qf_c, p_mat_s, q_mat_c):
        from smallvcm_tpu.ops import bsdf as bsdf_ops
        from smallvcm_tpu.core.vec3 import V3, max_gt_zero, v3_where
        p_iota = jnp.arange(pair_cap, dtype=jnp.int32)
        key = jnp.where(pair_ok, p_iota, p_iota | (1 << 30)).astype(jnp.uint32)
        p_c = (jnp.sort(key)[:surv_cap] & jnp.uint32((1 << 30) - 1)).astype(
            jnp.int32)
        n_s = jnp.sum(pair_ok.astype(jnp.int32))
        ok2 = jnp.arange(surv_cap, dtype=jnp.int32) < n_s
        meta = jnp.stack([qseg, php_safe], axis=1)
        meta_c = meta[p_c]
        qs_g = meta_c[:, 0]
        pp_c = meta_c[:, 1]
        prow = pf_s[pp_c]
        qrow_f = qf_c[qs_g]
        rv3 = lambda r, i: V3(r[:, i], r[:, i + 1], r[:, i + 2])
        cam_b = bsdf_ops.setup(
            scene.materials, rv3(qrow_f, 3), rv3(qrow_f, 6), q_mat_c[qs_g],
            ok2)
        ph_in = rv3(prow, 3)
        ph_b = bsdf_ops.setup(
            scene.materials, ph_in, rv3(prow, 6), p_mat_s[pp_c], ok2)
        factor, _, dir_pdf_w, rev_pdf_w = bsdf_ops.evaluate(
            scene.materials, cam_b, -ph_in)
        ok2 = ok2 & max_gt_zero(factor)
        w_light = prow[:, 12] * misc.mis_vc_weight + prow[:, 13] * dir_pdf_w
        w_camera = qrow_f[:, 12] * misc.mis_vc_weight + qrow_f[:, 13] * \
            rev_pdf_w
        mis_weight = 1.0 / (w_light + 1.0 + w_camera)
        contrib = factor * rv3(prow, 9) * mis_weight
        contrib = v3_where(ok2, contrib, 0.0)
        qdst = jnp.where(ok2, qs_g, query_cap)
        z = jnp.zeros((query_cap,), jnp.float32)
        return (z.at[qdst].add(contrib.x, mode="drop"),
                z.at[qdst].add(contrib.y, mode="drop"),
                z.at[qdst].add(contrib.z, mode="drop"))

    t, _ = timeit(p4_eval, pair_ok, qseg, php_safe, pf_s, qf_c, p_mat_s,
                  q_mat_c)
    print(f"P4 survivor sort+gather+eval   : {t*1e3:8.1f} ms "
          f"(surv_cap {surv_cap/1e6:.1f}M)")

    @jax.jit
    def p4a_sort(pair_ok):
        p_iota = jnp.arange(pair_cap, dtype=jnp.int32)
        key = jnp.where(pair_ok, p_iota, p_iota | (1 << 30)).astype(jnp.uint32)
        return jnp.sort(key)[:surv_cap]

    t, _ = timeit(p4a_sort, pair_ok)
    print(f"  P4a survivor sort {pair_cap/1e6:.1f}M : {t*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
