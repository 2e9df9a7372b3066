"""Repro harness for the tunneled-runtime Mosaic faults (round 3).

Experiment ladder + CONCLUSIONS (all run on the axon-tunneled v5e):

  trivial / shapes / smem     : tiny kernels re-execute clean in every
                                variant — re-execution per se is fine.
  kernel_only [--fresh|--interleave|--two|--heavy]
                              : the real merge kernel over synthetic
                                tables re-executes clean at production
                                scale, with fresh buffers, and
                                interleaved with other programs.
  prep_kernel [--chain]       : chaining REAL prep outputs into the
                                kernel exposed the buffer-boundary bugs:
                                (1) lazy XLA transposes hand the kernel
                                PERMUTED physical layouts, (2) small jit
                                outputs carry nonstandard TILE layouts
                                (the (1,4) scal had tiling (1,128)) —
                                both fault the consumer on execution.
  merge                       : the full split prep/kernel/post pipeline
                                still faulted NONDETERMINISTICALLY after
                                fixing (1)+(2) (fault site varied across
                                runs: prep#2, kernel#1, post).

RESOLUTION (render.py::_resolve_backend): run the kernel FUSED inside
the block executable — no buffers cross executable boundaries, and that
configuration re-executes reliably (4-scene sweeps, 48-iteration soak).
A residual flake remains on the FIRST execution of freshly-compiled
programs, with probability growing with programs accumulated in the
process (bench.py runs one subprocess per algorithm for this reason).

Usage: python scripts/repro_mosaic_fault.py <mode>
"""

import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def trivial_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:] * 2.0


def run_trivial(n, reps=30):
    x = jnp.ones((n, 128), jnp.float32)

    @jax.jit
    def f(x):
        return pl.pallas_call(
            trivial_kernel,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    for i in range(reps):
        v = float(jnp.sum(f(x)))
        print(f"  exec {i}: {v}", flush=True)


def run_shapes(reps=30):
    for i in range(reps):
        n = 128 if i % 2 == 0 else 256
        run_trivial(n, reps=1)
        print(f"  alternate {i} (n={n}) ok", flush=True)


def smem_kernel(wt_ref, x_ref, o_ref):
    w = pl.program_id(0)
    o_ref[:] = x_ref[:] + wt_ref[w].astype(jnp.float32)


def run_smem(work_cap, reps=5):
    """Scalar-prefetch array of [work_cap] int32 like the merge work list."""
    wt = jnp.arange(work_cap, dtype=jnp.int32) % 7
    x = jnp.ones((8, 128), jnp.float32)

    @jax.jit
    def f(wt, x):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(work_cap,),
            in_specs=[pl.BlockSpec((8, 128), lambda w, wt: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, 128), lambda w, wt: (0, 0),
                                   memory_space=pltpu.VMEM),
        )
        return pl.pallas_call(
            smem_kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        )(wt, x)

    for i in range(reps):
        t0 = time.time()
        v = float(jnp.sum(f(wt, x)))
        print(f"  work_cap={work_cap} exec {i}: {v} "
              f"({time.time()-t0:.2f}s)", flush=True)



def _prep_jit():
    """Local split-phase prep jit (the production driver now runs the
    merge FUSED inside one executable; this harness keeps the historical
    split configuration alive for runtime-fault experiments)."""
    import functools
    import jax
    from smallvcm_tpu.algorithms import vcm
    from smallvcm_tpu.ops import pallas_merge as PM

    @functools.partial(jax.jit, static_argnames=(
        "res_x", "res_y", "photon_factor", "query_factor"))
    def prep(scene, iteration, traced, res_x, res_y,
             photon_factor=2.0, query_factor=4.0):
        fb, color, queries, verts, sx, sy, rays = traced
        n = res_x * res_y
        misc = vcm.compute_misc(scene, iteration, n, 0.003, 0.75, True,
                                True)
        out = PM.merge_prep(
            scene, misc, queries, verts,
            ((int(photon_factor * n) + 127) // 128) * 128,
            ((int(query_factor * n) + 127) // 128) * 128, n)
        return out + (misc.radius_sqr, misc.mis_vc_weight,
                      misc.vm_normalization)
    return prep


def run_merge(reps=30):
    sys.path.insert(0, ".")
    from smallvcm_tpu.scene.scene import SCENE_CONFIGS, load_cornell_box
    from smallvcm_tpu.algorithms import vcm

    res = 512
    n = res * res
    for sid in (0, 1):
        scene = load_cornell_box((res, res), SCENE_CONFIGS[sid])
        traced = vcm.trace_iteration(scene, 0, res, res)
        jax.block_until_ready(traced)
        print(f"scene {sid}: traced", flush=True)
        ovf, stats = vcm.merge_measure_iteration(
            scene, 0, traced, res, res, photon_factor=4.0, query_factor=4.0)
        work, n_ph, n_q = (int(v) for v in stats)
        print(f"scene {sid}: work={work} photons={n_ph} queries={n_q} "
              f"ovf={int(ovf)}", flush=True)
        pf = float(-(-work * 1.3 // n)) or 1.0
        import numpy as np
        import jax.numpy as jnp
        from smallvcm_tpu.ops.pallas_merge import (
            make_scal, run_tile_kernel_jit,
        )
        _PREP = _prep_jit()

        # HISTORICAL split path: prep / kernel / post as separate
        # executables (production now fuses the kernel into the block
        # program; this mode preserved for runtime-fault experiments).
        for i in range(reps):
            t0 = time.time()
            acc = jnp.zeros((res, res, 3), jnp.float32)
            ovf0 = jnp.zeros((), jnp.int32)
            prep, q_path, n_q, p_ovf, stats, r2, vcw, vmn = _PREP(
                scene, 0, traced, res, res,
                photon_factor=2.0, query_factor=4.0)
            print(f"    prep ok: stats={list(np.asarray(stats))}",
                  flush=True)
            kout = run_tile_kernel_jit(
                make_scal(float(np.asarray(r2)), float(np.asarray(vcw))),
                *prep, max_path_length=10, min_path_length=0, ppm=False)
            print(f"    kernel ok: {float(np.asarray(kout[0, 0]))}",
                  flush=True)
            from smallvcm_tpu.ops.pallas_merge import merge_post
            mc = merge_post(kout, prep[0], q_path, n_q, vmn, res * res)
            s = float(np.asarray(mc.x).sum())
            print(f"  scene {sid} exec {i}: merge_x={s:.2f} "
                  f"ovf={int(np.asarray(p_ovf))} "
                  f"({time.time()-t0:.2f}s)", flush=True)


def run_prep_kernel(reps=10):
    """Real prep + kernel over SYNTHETIC tables (kernel inputs decoupled
    from prep outputs): bisects whether the fault needs the prep->kernel
    buffer handoff or just both programs executing."""
    sys.path.insert(0, ".")
    import numpy as np
    from smallvcm_tpu.scene.scene import SCENE_CONFIGS, load_cornell_box
    from smallvcm_tpu.algorithms import vcm
    from smallvcm_tpu.ops import pallas_merge as PM

    res = 512
    scene = load_cornell_box((res, res), SCENE_CONFIGS[0])
    traced = vcm.trace_iteration(scene, 0, res, res)
    jax.block_until_ready(traced)
    print("traced ok", flush=True)

    use_prep_out = "--chain" in sys.argv
    from smallvcm_tpu.ops.pallas_merge import make_scal, run_tile_kernel_jit
    n = res * res
    _PREP = _prep_jit()
    prep, q_path, n_q, p_ovf, stats, r2, vcw, vmn = _PREP(
        scene, 0, traced, res, res, photon_factor=2.0, query_factor=4.0)
    scal0 = make_scal(float(np.asarray(r2)), float(np.asarray(vcw)))
    jax.block_until_ready(prep)
    if use_prep_out:
        qtab0, runs0, ptab0 = prep
    else:
        key = jax.random.PRNGKey(0)
        qtab0 = jax.random.uniform(key, prep[0].shape, jnp.float32)
        ptab0 = jax.random.uniform(key, prep[2].shape, jnp.float32)
        runs0 = jnp.zeros(prep[1].shape, jnp.int32)

    for i in range(reps):
        t0 = time.time()
        prep, q_path, n_q, p_ovf, stats, r2, vcw, vmn = _PREP(
            scene, 0, traced, res, res, photon_factor=2.0,
            query_factor=4.0)
        print(f"    prep {i} ok: {list(np.asarray(stats))}", flush=True)
        if use_prep_out:
            qtab0, runs0, ptab0 = prep
        kout = run_tile_kernel_jit(
            scal0, qtab0, runs0, ptab0, max_path_length=10,
            min_path_length=0, ppm=False)
        print(f"    kernel {i} ok: {np.asarray(kout)[0, 0]} "
              f"({time.time()-t0:.2f}s)", flush=True)


def run_kernel_after_trace(reps=10):
    """Dispatch the big trace/measure XLA programs first, then loop the
    bare kernel — isolates co-resident-program interaction."""
    sys.path.insert(0, ".")
    from smallvcm_tpu.scene.scene import SCENE_CONFIGS, load_cornell_box
    from smallvcm_tpu.algorithms import vcm

    res = 512
    scene = load_cornell_box((res, res), SCENE_CONFIGS[0])
    traced = vcm.trace_iteration(scene, 0, res, res)
    jax.block_until_ready(traced)
    print("traced ok", flush=True)
    ovf, stats = vcm.merge_measure_iteration(
        scene, 0, traced, res, res, photon_factor=4.0, query_factor=4.0)
    print("measured ok", flush=True)
    run_kernel_only(reps)


def run_kernel_only(reps=10, pad_flops=0):
    """The real merge kernel over synthetic pre-baked tables, with an
    optional chunk of surrounding XLA work (pad_flops) to probe whether the
    fault needs a big embedding program."""
    sys.path.insert(0, ".")
    import functools
    from jax.experimental import pallas as pl2
    from smallvcm_tpu.ops import pallas_merge as PM

    photon_cap, query_cap = 128 * 4096, 128 * 8192  # failing prod shapes
    n_tiles = query_cap // PM.QTILE
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    qtab = jax.random.uniform(k1, (n_tiles, PM.QTILE, PM.QF), jnp.float32)
    ptab = jax.random.uniform(k2, (PM.PF, photon_cap), jnp.float32)
    # Realistic runs table: random valid (lo, len) runs spanning the whole
    # slab range with production-like lengths (content-dependent faults!).
    import numpy as np
    n_slabs = photon_cap // PM.SLAB
    rng = np.random.default_rng(0)
    lens = rng.integers(0, 12, size=(n_tiles, 9)).astype(np.int32)
    lens[:, 0] = rng.integers(1, 40, size=n_tiles)
    lens[::37, 0] = 490                       # deep tiles like production
    los = rng.integers(0, n_slabs, size=(n_tiles, 9)).astype(np.int32)
    los = np.minimum(los, n_slabs - lens)
    cums = np.cumsum(lens, axis=1).astype(np.int32)
    cols = [cums[:, 8:9]]
    for j in range(9):
        cols.append(los[:, j:j + 1])
        cols.append(cums[:, j:j + 1])
    cols.append(np.zeros((n_tiles, PM.RUNCOLS - 19), np.int32))
    runs = jnp.asarray(np.concatenate(cols, axis=1))
    scal = jnp.array([[1e10, 0.5, 0.0, 0.0]], jnp.float32)

    @jax.jit
    def f(scal, qtab, runs, ptab):
        out = PM.run_tile_kernel(
            scal, qtab, runs, ptab, max_path_length=10,
            min_path_length=0, ppm=False,
        )
        s = jnp.sum(out)
        if pad_flops:
            x = qtab
            for _ in range(pad_flops):
                x = jnp.tanh(x @ x.T[: PM.QF, : PM.QF].T @ jnp.ones(
                    (PM.QF, PM.QF)) * 1e-3)
            s = s + jnp.sum(x) * 0.0
        return s

    interleave = "--interleave" in sys.argv
    fresh = "--fresh" in sys.argv

    heavy = "--heavy" in sys.argv
    if heavy:
        from smallvcm_tpu.ops import hashgrid as grid_ops

        @jax.jit
        def other(x):
            # Prep-scale program: sort + scatter + gather over ~1M keys.
            base = x[:, 0, 0] if x.ndim == 3 else x[0]
            keys = (base * 524288.0).astype(jnp.uint32) % jnp.uint32(1 << 19)
            keys = jnp.tile(keys, 200)[:1048576]
            order = grid_ops.stable_radix_argsort(keys, 20)
            hist = jnp.zeros((1 << 19,), jnp.int32).at[
                (keys & jnp.uint32((1 << 19) - 1)).astype(jnp.int32)
            ].add(1)
            return (jnp.cumsum(hist)[-1].astype(jnp.float32)
                    + order[0].astype(jnp.float32))
    else:
        @jax.jit
        def other(x):
            return jnp.sum(jnp.tanh(x) * 2.0)

    @jax.jit
    def renew(qtab, ptab, runs):
        # New device buffers with identical contents each call.
        return qtab + 0.0, ptab + 0.0, runs + 0

    two = "--two" in sys.argv

    @jax.jit
    def other2(x):
        return jnp.sum(jnp.abs(x)) * 0.5

    for i in range(reps):
        t0 = time.time()
        if fresh:
            qtab, ptab, runs = renew(qtab, ptab, runs)
        v = float(f(scal, qtab, runs, ptab))
        if interleave:
            float(other(qtab))
        if two:
            float(other2(ptab))
        print(f"  kernel-only exec {i}: {v:.3f} ({time.time()-t0:.2f}s)",
              flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "trivial"
    print("backend:", jax.default_backend(), flush=True)
    if mode == "trivial":
        run_trivial(128)
    elif mode == "shapes":
        run_shapes()
    elif mode == "smem":
        for cap in (1024, 16384, 49152, 98304, 196608):
            run_smem(cap)
    elif mode == "merge":
        run_merge()
    elif mode == "kernel_only":
        run_kernel_only()
    elif mode == "kernel_after_trace":
        run_kernel_after_trace()
    elif mode == "prep_kernel":
        run_prep_kernel()
    elif mode == "kernel_padded":
        run_kernel_only(pad_flops=40)
