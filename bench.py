"""Benchmark: rays/sec/chip vs the reference CPU (+ full-suite mode).

Default: times VCM on scene 0 at 512x512 and prints ONE JSON line:
  {"metric": "rays/sec/chip (VCM, scene 0, 512x512)", "value": N,
   "unit": "rays/s", "vs_baseline": N}

``--full`` also times all 7 algorithms (steady-state ms/iteration with the
compile/iteration-0 cost reported separately), prints an analytic
flops/bytes roofline estimate for the hot stages, and appends one record
per run to BENCH_HISTORY.jsonl — the perf-regression trail. All extra
output goes to stderr; stdout stays exactly one JSON line for the driver.

Measured through the production block driver (render.py): 8 iterations per
dispatch, measure-first merge caps — the same machinery the CLI runs.

Ray count = path segments + shadow/occlusion rays actually enabled (the same
work the reference performs per iteration; lanes masked off are not counted,
so this is conservative for the wavefront design). The baseline divides the
identical ray count by the reference's measured per-iteration time on this
container's CPU (BASELINE.md: vcm scene 0, 1 iter = 1.6 s core-seconds).
"""

import argparse
import json
import os
import sys
import time

# The persistent compilation cache makes the remote-compile service a
# one-time cost across all processes (see render.py module docs).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import jax

REFERENCE_VCM_SCENE0_SECONDS = 1.6  # BASELINE.md, measured in this container

# Reference CPU seconds/iteration on this container (BASELINE.md table),
# scene 0, 512x512, for the per-algorithm vs_baseline columns.
REFERENCE_SECONDS = {
    "el": 0.07, "pt": 0.60, "lt": 0.32, "ppm": 0.52, "bpm": 1.17,
    "bpt": 1.11, "vcm": 1.60,
}

# v5e peaks for the roofline denominators: VPU f32 ~= (8,128) vector unit
# x 4 ALUs x ~1 GHz ~= 4 TFLOP/s (the renderer is VPU-bound — no matmuls,
# so the 197-TFLOP bf16 MXU is idle); HBM ~819 GB/s (public spec).
PEAK_F32_TFLOPS = 4.0
PEAK_HBM_GBS = 819.0

BLOCK = 8


def _eprint(*a):
    print(*a, file=sys.stderr, flush=True)


def _steady_blocks(runner, warm_blocks=1, timed_blocks=3, block=BLOCK):
    """Time ``timed_blocks`` blocks after the runner has SETTLED.

    Warm-up runs until two consecutive blocks agree within 30% (up to 6
    blocks): through the tunneled runtime, compiles AND persistent-cache
    LOADS can take minutes and can land on any early call, not just the
    first — one cold bench run recorded 965 ms/iter for a 332 ms/iter
    program because a load stalled a "timed" block.

    Returns (seconds_per_iteration, iterations_timed)."""
    start = 0
    prev = None
    for i in range(max(warm_blocks, 6)):
        t0 = time.time()
        runner(start, block)
        dt = time.time() - t0
        start += block
        if i + 1 >= warm_blocks and prev is not None and \
                abs(dt - prev) <= 0.3 * max(dt, prev):
            break
        prev = dt
    t0 = time.time()
    for _ in range(timed_blocks):
        runner(start, block)
        start += block
    dt = time.time() - t0
    return dt / (timed_blocks * block), timed_blocks * block


def bench_vcm(scene, res, n):
    import jax.numpy as jnp
    import numpy as np

    from smallvcm_tpu import render as R
    from smallvcm_tpu.algorithms import vcm

    cfg = R.RenderConfig(algorithm="vcm", resolution=(res, res))
    backend = R._resolve_backend(cfg, True)
    runner = R._make_block_runner(scene, cfg, "vcm")
    dt, _ = _steady_blocks(runner)

    # Per-iteration ray count + pair stats from one instrumented call.
    # Always the XLA merge: ray counts are backend-independent and the
    # pair stat is the XLA merge's exact candidate count.
    chunks = max(1, int(-(-int(cfg.pair_factor * n) // (16 << 20))))
    _acc, rays, _ovf, stats, lum = vcm.render_block_with_stats(
        scene, 1, res, res, 1,
        pair_factor=cfg.pair_factor, photon_factor=cfg.photon_factor,
        query_factor=cfg.query_factor, merge_chunks=chunks,
        merge_backend="xla",
    )
    float(lum)
    return dt, int(rays), int(np.asarray(stats)[0])


def bench_algorithm(alg, scene, res, n):
    """Steady-state seconds/iteration + block-0 (compile-inclusive)
    seconds for one algorithm through the production driver.

    Also returns the RESOLVED execution config (merge caps, backend,
    block size): BENCH_HISTORY records carry it so a steady-state swing
    between rounds can be attributed to a caps-bucket / backend change
    instead of staying a mystery (round 4's ppm 155->201 ms drift was
    unattributable because records lacked the caps)."""
    from smallvcm_tpu import render as R

    cfg = R.RenderConfig(algorithm=alg, resolution=(res, res))
    # Same block size the production driver auto-picks (el/pt batch more
    # iterations per dispatch; larger resolutions shrink the block).
    block = R.auto_block_size(cfg, alg)
    t0 = time.time()
    runner = R._make_block_runner(scene, cfg, alg)
    runner(0, block)
    cold = time.time() - t0
    dt, _ = _steady_blocks(runner, warm_blocks=0, block=block)
    use_vm = alg in ("ppm", "bpm", "vcm")
    resolved = {
        "block": block,
        "merge_backend": (R._resolve_backend(cfg, use_vm)
                          if alg not in ("el", "pt") else None),
        "pair_factor": cfg.pair_factor,
        "photon_factor": cfg.photon_factor,
        "query_factor": cfg.query_factor,
    }
    return dt, cold, resolved


def roofline(res, n, rays_per_iter, pairs, dt_vcm):
    """Analytic flops/bytes for the hot stages of one VCM iteration."""
    # Scene 0 primitive count: ~30 triangles + 2 spheres (dense sweep).
    prims = 32
    # Trace: every ray tests every primitive; ~55 flops per ray-prim test.
    trace_flops = rays_per_iter * prims * 55
    trace_bytes = rays_per_iter * 64 * 2  # ray in + hit out, ~wide rows
    # Merge: per candidate pair ~2 row gathers (64B) + ~40 flops prefilter;
    # survivors (~pairs/10) run the ~200-flop BSDF/MIS evaluate.
    merge_flops = pairs * 40 + (pairs // 10) * 200
    merge_bytes = pairs * 2 * 64
    lines = []
    for name, fl, by in (("trace", trace_flops, trace_bytes),
                         ("merge", merge_flops, merge_bytes)):
        t_flops = fl / (PEAK_F32_TFLOPS * 1e12)
        t_bytes = by / (PEAK_HBM_GBS * 1e9)
        bound = "hbm" if t_bytes > t_flops else "vpu"
        lines.append(
            f"  {name}: {fl/1e9:.2f} GFLOP, {by/1e9:.2f} GB -> "
            f"speed-of-light {max(t_flops, t_bytes)*1e3:.1f} ms ({bound}-"
            f"bound)"
        )
    lines.append(
        f"  measured VCM iteration: {dt_vcm*1e3:.0f} ms "
        f"(~{(sum((rays_per_iter * prims * 55, pairs * 40)) / dt_vcm) / (PEAK_F32_TFLOPS * 1e12) * 100:.1f}% "
        "of VPU f32 peak on the modeled flops)"
    )
    return "\n".join(lines)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true",
                    help="also bench all 7 algorithms + roofline + history")
    ap.add_argument("--alg", default=None,
                    help="bench ONE algorithm and print its record "
                         "(used by --full's per-algorithm subprocesses)")
    args = ap.parse_args()

    from smallvcm_tpu.scene.scene import SCENE_CONFIGS, load_cornell_box

    res = 512
    n = res * res
    scene = load_cornell_box((res, res), SCENE_CONFIGS[0])

    if args.alg:
        steady, cold, resolved = bench_algorithm(args.alg, scene, res, n)
        print(json.dumps({"alg": args.alg,
                          "steady_ms": round(steady * 1e3, 1),
                          "block0_s": round(cold, 1),
                          "resolved": resolved}))
        return

    record = {"ts": time.time(), "backend": jax.default_backend(),
              "res": res, "block": BLOCK, "algorithms": {}}

    if args.full:
        # One subprocess per algorithm: the tunneled runtime's
        # fresh-compile flake probability grows with the number of
        # programs accumulated in a process (bpm reproducibly faulted
        # as the 5th algorithm in-process but is clean solo), and a
        # fault poisons the whole session. Each child retries once —
        # the persistent compile cache makes the retry cheap and clean.
        import subprocess

        from smallvcm_tpu.render import ALGORITHMS

        for alg in ALGORITHMS:
            rec = None
            for attempt in range(2):
                proc = subprocess.run(
                    [sys.executable, __file__, "--alg", alg],
                    capture_output=True, text=True,
                )
                if proc.returncode == 0 and proc.stdout.strip():
                    rec = json.loads(proc.stdout.strip().splitlines()[-1])
                    break
                _eprint(f"{alg}: attempt {attempt} failed "
                        f"(runtime flake); retrying via compile cache")
            if rec is None:
                _eprint(f"{alg}: FAILED twice; skipping")
                continue
            steady = rec["steady_ms"] / 1e3
            ref = REFERENCE_SECONDS[alg]
            record["algorithms"][alg] = {
                "steady_ms": rec["steady_ms"],
                "block0_s": rec["block0_s"],
                "vs_ref_cpu": round(ref / steady, 2),
                "resolved": rec.get("resolved"),
            }
            _eprint(f"{alg}: {rec['steady_ms']:.0f} ms/iter steady "
                    f"(block0 {rec['block0_s']:.1f} s incl. compile/load)"
                    f" — {ref/steady:.1f}x reference CPU")

    dt, rays, pairs = bench_vcm(scene, res, n)
    rays_per_sec = rays / dt
    baseline = rays / REFERENCE_VCM_SCENE0_SECONDS
    record["vcm_rays_per_sec"] = round(rays_per_sec)
    record["vcm_ms_per_iter"] = round(dt * 1e3, 1)

    # On-chip utilization vs the v5e roofline constants above, on the
    # MODELED traffic/flops of the two hot stages (trace sweeps + merge).
    # This answers "is it actually fast on this chip", not just
    # "vs the 2012-class reference CPU" (VERDICT r4 missing #3).
    prims = 32
    model_flops = rays * prims * 55 + pairs * 40 + (pairs // 10) * 200
    model_bytes = rays * 128 + pairs * 2 * 64
    vpu_pct = model_flops / dt / (PEAK_F32_TFLOPS * 1e12) * 100
    hbm_pct = model_bytes / dt / (PEAK_HBM_GBS * 1e9) * 100
    record["roofline"] = {
        "modeled_gflop": round(model_flops / 1e9, 2),
        "modeled_gb": round(model_bytes / 1e9, 2),
        "vpu_f32_pct": round(vpu_pct, 1),
        "hbm_pct": round(hbm_pct, 1),
    }
    _eprint(
        f"roofline: modeled {model_flops/1e9:.1f} GFLOP + "
        f"{model_bytes/1e9:.2f} GB/iter -> achieved "
        f"{model_flops/dt/1e12:.2f} TFLOP/s f32 ({vpu_pct:.1f}% of "
        f"{PEAK_F32_TFLOPS:.0f}T VPU peak), "
        f"{model_bytes/dt/1e9:.0f} GB/s ({hbm_pct:.1f}% of "
        f"{PEAK_HBM_GBS:.0f} GB/s HBM peak)"
    )

    if args.full:
        _eprint("roofline (modeled):")
        _eprint(roofline(res, n, rays, pairs, dt))
        try:
            with open("BENCH_HISTORY.jsonl", "a") as f:
                f.write(json.dumps(record) + "\n")
        except OSError:
            pass

    print(
        json.dumps(
            {
                "metric": "rays/sec/chip (VCM, scene 0, 512x512)",
                "value": round(rays_per_sec),
                "unit": "rays/s",
                "vs_baseline": round(rays_per_sec / baseline, 2),
                "vpu_f32_pct": round(vpu_pct, 1),
                "hbm_pct": round(hbm_pct, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
