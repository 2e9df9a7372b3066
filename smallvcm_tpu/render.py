"""Renderer driver: algorithm registry, block loop, cap sizing, time budget.

Replaces the reference's ``CreateRenderer`` factory (config.hxx:112-143) and
``render()`` execution loop (smallvcm.cxx:52-151). The reference
parallelizes by cloning one renderer per OpenMP thread and averaging their
framebuffers; here one jitted wavefront iteration already saturates the
chip, so the progressive loop accumulates iterations — batched ``block``
iterations per executable, because the tunneled TPU backend costs ~40 ms
per dispatch round-trip and a per-iteration host sync would dominate.

Round-3 driver design (all measured on the axon-tunneled v5e):

* Iteration batching: merging/simple algorithms run ``block`` (default 8)
  iterations per dispatch via vcm.render_block_with_stats / _simple_block;
  the only host sync is one scalar fetch per block.
* Measure-first cap sizing: merging algorithms size the photon/query
  (+XLA pair) caps from a cheap measurement program at iteration 0 (the
  largest merge radius bounds later demand), instead of discovering caps
  by render-retry (which double-compiled iteration 0 through a
  minutes-long remote-compile service). Sized caps persist in a JSON
  sidecar so later processes skip even the measurement.
* Fused Pallas merge: the Mosaic dense-slab kernel runs INSIDE the block
  executable (merge_backend 'auto' -> pallas on a single TPU). Split
  multi-executable designs are what destabilize this tunneled runtime
  (large buffers crossing executable boundaries around Mosaic — see
  _resolve_backend and scripts/repro_mosaic_fault.py); the fused form
  re-executes reliably and is ~1.5x faster than the XLA pair-expansion
  merge at 512^2.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass
from functools import partial
from pathlib import Path
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from .algorithms import eyelight, pathtracer, vcm
from .scene.scene import SceneData

ALGORITHMS = ("el", "pt", "lt", "ppm", "bpm", "bpt", "vcm")

ALGORITHM_NAMES = {
    "el": "eye light",
    "pt": "path tracing",
    "lt": "light tracing",
    "ppm": "progressive photon mapping",
    "bpm": "bidirectional photon mapping",
    "bpt": "bidirectional path tracing",
    "vcm": "vertex connection and merging",
}

# VertexCM family flags: (use_vc, use_vm, light_trace_only, ppm)
# (vertexcm.hxx:222-244).
_VCM_FLAGS = {
    "lt": (False, False, True, False),
    "ppm": (False, True, False, True),
    "bpm": (False, True, False, False),
    "bpt": (True, False, False, False),
    "vcm": (True, True, False, False),
}

DEFAULT_BLOCK = 8
# el/pt carry no merge caps/overflow state, so the only cost of a bigger
# block is checkpoint granularity; 64 iterations/dispatch cuts the ~40 ms
# tunnel round-trip to <1 ms/iter (pt compute is ~14 ms/iter at 512^2).
DEFAULT_BLOCK_SIMPLE = 64


@dataclass
class RenderConfig:
    """Mirror of the reference Config (config.hxx:52-109) + TPU knobs."""

    algorithm: str = "vcm"
    iterations: int = 1
    max_time: float = -1.0
    radius_factor: float = 0.003
    radius_alpha: float = 0.75
    base_seed: int = 1234
    max_path_length: int = 10
    min_path_length: int = 0
    resolution: tuple = (512, 512)
    rng_kind: str = "threefry"  # or "tea" (the reference's old_rng flavor)
    pair_factor: float = 24.0
    photon_factor: float = 3.0
    query_factor: float = 3.0
    # photon-merge backend: "pallas" = dense-slab Mosaic kernel (TPU only,
    # split executables), "xla" = pair expansion (portable,
    # differentiable), "auto" = pallas on single-device TPU, xla
    # otherwise. "pallas_interpret" runs the kernel in interpreter mode
    # (tests).
    merge_backend: str = "auto"
    # ray-sweep backend: "pallas" = VMEM-resident Mosaic kernel fused in
    # the block executable (single TPU), "xla" = dense broadcast sweep
    # (portable, differentiable), "auto" = pallas on single-device TPU.
    trace_backend: str = "auto"
    # Caps frozen = sized by measurement/cache; the block loop still grows
    # them (and re-renders the block) on the rare overflow.
    merge_caps_frozen: bool = False
    # iterations per executable dispatch (0 = auto: 8, or 1 when the run
    # is shorter). Any block partition is bit-exact vs per-iteration.
    block_size: int = 0
    # multi-device execution (None => single device)
    mesh: Optional[object] = None


def ppm_downgrade_needed(scene: SceneData) -> bool:
    """PPM cannot handle mixed specular+non-specular materials; the reference
    self-downgrades to BPM after scanning the scene (vertexcm.hxx:246-278)."""
    mats = scene.materials
    diffuse = np.asarray(mats.diffuse.max_component())
    phong = np.asarray(mats.phong.max_component())
    mirror = np.asarray(mats.mirror.max_component())
    ior = np.asarray(mats.ior)
    has_non_specular = (diffuse > 0) | (phong > 0)
    has_specular = (mirror > 0) | (ior > 0)
    return bool((has_non_specular & has_specular).any())


def resolve_algorithm(scene: SceneData, algorithm: str) -> str:
    if algorithm == "ppm" and ppm_downgrade_needed(scene):
        return "bpm"
    return algorithm


def _bucket(needed: float, n: int) -> float:
    """Smallest m*2^e >= needed with mantissa m in {4,5,6,7}, as a factor
    of n (so the jit static cap args repeat exactly). The ~1.25x ladder
    keeps padding waste under ~25% (every op downstream of compaction runs
    at cap width, not live width)."""
    needed = max(needed, 1024)
    e = max(0, int(needed).bit_length() - 3)
    for m in (4, 5, 6, 7, 8):
        if m << e >= needed:
            return float(m << e) / n
    return float(8 << e) / n


def _resolve_backend(cfg: RenderConfig, use_vm: bool) -> str:
    """Resolve merge_backend 'auto' (vm algorithms only).

    'auto' resolves to the Pallas dense-slab kernel FUSED inside the
    block executable on a single TPU device, XLA elsewhere. The fused
    form is the one Mosaic configuration this environment's tunneled
    runtime executes reliably (scene sweeps re-execute clean); what
    corrupts the runtime is LARGE BUFFERS CROSSING EXECUTABLE BOUNDARIES
    around a Mosaic kernel — the round-2/3 split-executable designs hit
    permuted physical layouts, nonstandard tile layouts, and a residual
    nondeterministic fault (experiment ladder:
    scripts/repro_mosaic_fault.py). Inside one program XLA materializes
    the kernel operands itself and none of those hazards exist.
    """
    backend = cfg.merge_backend
    if not use_vm:
        return "xla"
    if backend == "auto":
        n = cfg.resolution[0] * cfg.resolution[1]
        backend = (
            "pallas"
            if jax.default_backend() == "tpu" and cfg.mesh is None
            and n >= 256 * 256
            else "xla"
        )
    if backend.startswith("pallas") and cfg.mesh is not None:
        backend = "xla"  # kernel is single-device only
    return backend


def _resolve_trace_backend(cfg: RenderConfig) -> str:
    """Resolve trace_backend 'auto' -> xla.

    Measured head-to-head on the v5e (round 4): one 262k-ray closest-hit
    sweep costs 1.47 ms under XLA vs 1.52 ms under the Mosaic kernel, and
    a full 512^2 VCM iteration is 332 ms/iter under either — at SmallVCM's
    ~32 primitives XLA fuses the dense sweep to the same speed, and ALL
    sweeps together are only ~20 ms of the iteration, so there is no
    headroom for a kernel win. The kernel stays available ('pallas',
    fused in the block executable; images match XLA to ~1e-8) for scenes
    with enough primitives that a VMEM-resident sweep could matter."""
    backend = cfg.trace_backend
    if backend == "auto":
        backend = "xla"
    if backend == "pallas" and (cfg.mesh is not None
                                or jax.default_backend() != "tpu"):
        backend = "xla"
    return backend


# ---------------------------------------------------------------------------
# Merge-cap sizing: measure once, persist, reuse.
# ---------------------------------------------------------------------------


def _caps_cache_file() -> Path:
    root = os.environ.get("SMALLVCM_TPU_CACHE",
                          os.path.expanduser("~/.cache/smallvcm_tpu"))
    return Path(root) / "caps.json"


def _caps_key(scene: SceneData, cfg: RenderConfig, alg: str,
              backend: str) -> str:
    res_x, res_y = cfg.resolution
    n_tri = int(scene.tri_mat.shape[0])
    n_sph = int(scene.sph_mat.shape[0])
    n_lights = int(scene.lights.kind.shape[0])
    # base_seed/rng_kind are part of the key: caps are measured at
    # iteration 0 under ONE rng stream, and a cap sized under one seed
    # can (rarely) overflow under another (advisor round 3).
    return (
        f"{alg}|{backend}|{res_x}x{res_y}|tri{n_tri}sph{n_sph}"
        f"l{n_lights}|pl{cfg.max_path_length}-{cfg.min_path_length}"
        f"|r{cfg.radius_factor}a{cfg.radius_alpha}"
        f"|s{cfg.base_seed}|{cfg.rng_kind}"
    )


def _load_cached_caps(key: str):
    try:
        data = json.loads(_caps_cache_file().read_text())
        return data.get(key)
    except (OSError, ValueError):
        return None


def _save_cached_caps(key: str, caps: dict) -> None:
    path = _caps_cache_file()
    try:
        data = json.loads(path.read_text())
    except (OSError, ValueError):
        data = {}
    data[key] = caps
    try:
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_text(json.dumps(data, indent=1, sort_keys=True))
    except OSError:
        pass


def _ensure_merge_caps(scene: SceneData, cfg: RenderConfig, alg: str,
                       backend: str, use_vc: bool, ppm: bool,
                       trace_backend: str = "xla") -> None:
    """Freeze photon/query (+pair) caps before compiling merge programs.

    Sizes from a persisted cache when available, else traces iteration 0
    (largest merge radius, vertexcm.hxx:294-299 — its demand bounds every
    later iteration) and measures demand exactly. Correctness never
    depends on this: the block loop grows caps and re-renders on any
    overflow; sizing here only avoids recompiles and padding waste.
    """
    if cfg.merge_caps_frozen:
        return
    key = _caps_key(scene, cfg, alg, backend)
    cached = _load_cached_caps(key)
    if cached:
        cfg.pair_factor = cached["pair_factor"]
        cfg.photon_factor = cached["photon_factor"]
        cfg.query_factor = cached["query_factor"]
        cfg.merge_caps_frozen = True
        return

    res_x, res_y = cfg.resolution
    n = res_x * res_y
    traced = vcm.trace_iteration(
        scene, 0, res_x, res_y, cfg.base_seed, cfg.max_path_length,
        cfg.min_path_length, cfg.radius_factor, cfg.radius_alpha,
        use_vc, ppm, cfg.rng_kind, trace_backend=trace_backend,
    )
    if backend.startswith("pallas"):
        # The pallas measure depends on the compaction caps; ladder them.
        while True:
            ovf, stats = vcm.merge_measure_iteration(
                scene, 0, traced, res_x, res_y,
                cfg.radius_factor, cfg.radius_alpha,
                cfg.max_path_length, cfg.min_path_length,
                photon_factor=cfg.photon_factor,
                query_factor=cfg.query_factor, ppm=ppm,
            )
            ovf_v = int(ovf)
            _work, n_ph, n_q = (int(v) for v in np.asarray(stats))
            if ovf_v == 0:
                break
            cfg.photon_factor = max(
                cfg.photon_factor, _bucket(n_ph * 1.2, n))
            cfg.query_factor = max(
                cfg.query_factor, _bucket(n_q * 1.2, n))
        # Vertex counts are radius-independent, so across iterations they
        # vary only by MC noise (~0.2% at 262k paths); a 3% margin is
        # ample and every downstream permute/bake scales with the cap.
        # The block loop still grows caps and re-renders on overflow.
        cfg.photon_factor = _bucket(n_ph * 1.03, n)
        cfg.query_factor = _bucket(n_q * 1.03, n)
        # Size pair_factor too: if a run ever falls back to the XLA
        # merge (--merge-backend xla, or AD paths) it should start from a
        # fitted pair cap instead of burning an overflow-grow round.
        demand = vcm.merge_demand_iteration(
            scene, 0, traced, res_x, res_y, cfg.radius_factor,
            cfg.radius_alpha,
        )
        pairs = int(np.asarray(demand)[0])
        cfg.pair_factor = max(cfg.pair_factor, _bucket(pairs * 1.15, n))
    else:
        demand = vcm.merge_demand_iteration(
            scene, 0, traced, res_x, res_y, cfg.radius_factor,
            cfg.radius_alpha,
        )
        pairs, n_ph, n_q = (int(v) for v in np.asarray(demand))
        cfg.pair_factor = _bucket(pairs * 1.15, n)
        cfg.photon_factor = _bucket(n_ph * 1.03, n)
        cfg.query_factor = _bucket(n_q * 1.03, n)
    cfg.merge_caps_frozen = True
    _save_cached_caps(key, dict(
        pair_factor=cfg.pair_factor, photon_factor=cfg.photon_factor,
        query_factor=cfg.query_factor,
    ))


# ---------------------------------------------------------------------------
# Block runners. Each returns (image_sum, iterations_rendered).
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=(
    "alg", "res_x", "res_y", "base_seed", "max_path_length",
    "min_path_length", "rng_kind", "block",
))
def _simple_block(
    scene, start_iteration, alg: str, res_x: int, res_y: int,
    base_seed: int, max_path_length: int, min_path_length: int,
    rng_kind: str, block: int,
):
    """``block`` el/pt iterations in one executable -> (sum image, lum)."""

    def body(j, acc):
        it = start_iteration + j
        if alg == "el":
            img = eyelight.render_iteration(
                scene, it, res_x, res_y, base_seed, rng_kind=rng_kind
            )
        else:
            img = pathtracer.render_iteration(
                scene, it, res_x, res_y, base_seed, max_path_length,
                min_path_length, rng_kind=rng_kind,
            )
        return acc + img

    acc = jax.lax.fori_loop(
        0, block, body, jnp.zeros((res_y, res_x, 3), jnp.float32)
    )
    return acc, jnp.sum(acc)


def _make_block_runner(scene: SceneData, cfg: RenderConfig, alg: str):
    """Build run(start, k) -> image_sum for the resolved algorithm/backend.

    The runner handles overflow-grow-retry internally (merging only) and
    performs exactly one host sync per call.
    """
    res_x, res_y = cfg.resolution
    n = res_x * res_y

    if alg in ("el", "pt"):
        if cfg.mesh is not None:
            from .parallel.sharding import sharded_simple_iteration

            def run_sharded_simple(start, k):
                acc = jnp.zeros((res_y, res_x, 3), jnp.float32)
                for j in range(k):
                    acc = acc + sharded_simple_iteration(
                        cfg.mesh, alg, scene, start + j, res_x, res_y,
                        cfg.base_seed, cfg.max_path_length,
                        cfg.min_path_length, cfg.rng_kind,
                    )
                jax.device_get(acc[0, 0])
                return acc

            return run_sharded_simple

        def run_simple(start, k):
            acc, lum = _simple_block(
                scene, start, alg, res_x, res_y, cfg.base_seed,
                cfg.max_path_length, cfg.min_path_length, cfg.rng_kind, k,
            )
            jax.device_get(lum)
            return acc

        return run_simple

    use_vc, use_vm, lt_only, ppm = _VCM_FLAGS[alg]
    backend = _resolve_backend(cfg, use_vm)
    trace_be = _resolve_trace_backend(cfg)
    if use_vm and cfg.mesh is None:
        # Cap sizing always uses the XLA sweep: its standalone trace
        # executable hands large buffers across an executable boundary,
        # exactly the configuration that destabilizes Mosaic on this
        # runtime (counts are backend-independent, so sized caps carry).
        _ensure_merge_caps(scene, cfg, alg, backend, use_vc, ppm, "xla")

    caps_key = _caps_key(scene, cfg, alg, backend)
    is_pallas = backend.startswith("pallas") and use_vm

    def run_xla(start, k):
        # One merge backend for EVERY iteration count (smallvcm.cxx:96-109
        # has one code path; so do we, since round 5). The round-4 block=1
        # fused-Mosaic program faulted persistently on this runtime; the
        # round-5 merge-prep rewrite (one multi-operand lax.sort instead
        # of the packed-radix sort/gather chain) changed the program
        # shape and the fault no longer reproduces (4+ consecutive
        # block=1 executions clean at 512^2 — scripts/repro_mosaic_fault.py
        # retains the old repro ladder if it ever returns).
        use_pallas_now = is_pallas
        while True:
            # Chunk the merge only when pair arrays would exceed ~16M
            # rows (~1.4 GB @ ~21 int32/row) — chunking costs a little
            # and its uneven pair split needs slack (vcm.merge_stage).
            # The pallas kernel streams photon slabs and never chunks.
            chunks = 1 if (not use_vm or use_pallas_now) else max(
                1, int(-(-int(cfg.pair_factor * n) // (16 << 20))))
            if cfg.mesh is not None:
                from .parallel.sharding import (
                    sharded_render_iteration_with_stats,
                )

                acc = jnp.zeros((res_y, res_x, 3), jnp.float32)
                ovf = jnp.zeros((), jnp.int32)
                stats = jnp.zeros((3,), jnp.int32)
                for j in range(k):
                    fb, _r, o, st = sharded_render_iteration_with_stats(
                        cfg.mesh, scene, start + j, res_x, res_y,
                        cfg.base_seed, cfg.max_path_length,
                        cfg.min_path_length, cfg.radius_factor,
                        cfg.radius_alpha, use_vc=use_vc, use_vm=use_vm,
                        light_trace_only=lt_only, ppm=ppm,
                        pair_factor=cfg.pair_factor,
                        photon_factor=cfg.photon_factor,
                        query_factor=cfg.query_factor,
                        rng_kind=cfg.rng_kind, merge_chunks=chunks,
                        merge_backend="xla",
                    )
                    acc = acc + fb
                    ovf = ovf + o
                    stats = jnp.maximum(stats, st)
            else:
                acc, _rays, ovf, stats, _lum = vcm.render_block_with_stats(
                    scene, start, res_x, res_y, k, cfg.base_seed,
                    cfg.max_path_length, cfg.min_path_length,
                    cfg.radius_factor, cfg.radius_alpha,
                    use_vc=use_vc, use_vm=use_vm, light_trace_only=lt_only,
                    ppm=ppm, pair_factor=cfg.pair_factor,
                    photon_factor=cfg.photon_factor,
                    query_factor=cfg.query_factor, rng_kind=cfg.rng_kind,
                    merge_chunks=chunks,
                    merge_backend=backend if use_pallas_now else "xla",
                    trace_backend=trace_be,
                )
            if not use_vm:
                jax.device_get(ovf)
                return acc
            ovf_v, stats_v = jax.device_get((ovf, stats))
            if int(ovf_v) == 0:
                return acc
            pairs, n_ph, n_q = (int(v) for v in stats_v)
            n_shard = n if cfg.mesh is None else \
                n // cfg.mesh.devices.size
            # Grow every cap to measured need (monotonic: a photon/query
            # overflow can hide pairs) and re-render the SAME block —
            # exact, because the RNG is counter-based.
            cfg.pair_factor = max(
                _bucket(pairs * 1.1, n_shard),
                _bucket(cfg.pair_factor * n_shard * 1.26, n_shard))
            cfg.photon_factor = max(
                cfg.photon_factor, _bucket(n_ph * 1.1, n_shard))
            cfg.query_factor = max(
                cfg.query_factor, _bucket(n_q * 1.1, n_shard))
            if cfg.mesh is None:
                _save_cached_caps(caps_key, dict(
                    pair_factor=cfg.pair_factor,
                    photon_factor=cfg.photon_factor,
                    query_factor=cfg.query_factor,
                ))
            print(f"[smallvcm_tpu] merge cap overflow; re-rendering block "
                  f"at iteration {start} with "
                  f"pair_factor={cfg.pair_factor} "
                  f"photon_factor={cfg.photon_factor} "
                  f"query_factor={cfg.query_factor}", flush=True)

    return run_xla


def _maybe_inject_test_fault(done: int) -> None:
    """Test hook for the isolate.py supervisor (tests/test_isolate.py).

    With SMALLVCM_TEST_FAULT_AT=k set, raises a runtime-fault-shaped
    error once ``done`` reaches k — at most SMALLVCM_TEST_FAULT_TIMES
    times across processes, counted in the SMALLVCM_TEST_FAULT_COUNTER
    file — so a supervised run faults, respawns from its checkpoint, and
    must still produce the byte-identical image.
    """
    at = os.environ.get("SMALLVCM_TEST_FAULT_AT")
    if not at or done < int(at):
        return
    times = int(os.environ.get("SMALLVCM_TEST_FAULT_TIMES", "1"))
    path = os.environ.get("SMALLVCM_TEST_FAULT_COUNTER")
    count = 0
    if path and os.path.exists(path):
        count = int(Path(path).read_text() or 0)
    if count >= times:
        return
    if path:
        Path(path).write_text(str(count + 1))
    raise RuntimeError(
        "injected INVALID_ARGUMENT: TPU backend error (test fault)"
    )


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


def auto_block_size(cfg: RenderConfig, alg: str) -> int:
    """Iterations per dispatch. Scales inversely with resolution: one
    dispatch should stay ~seconds of device time (the tunneled runtime
    kills workers on very long single executions — observed with
    8-iteration blocks at 1024^2), and per-iteration work grows
    ~quadratically (paths x photon density at a fixed merge radius).
    bench.py reuses this so its timings match production dispatch shapes.
    """
    n_pix = cfg.resolution[0] * cfg.resolution[1]
    base_block = (DEFAULT_BLOCK_SIMPLE if alg in ("el", "pt")
                  else DEFAULT_BLOCK)
    return cfg.block_size or max(
        1, min(base_block, (base_block * 512 * 512) // max(n_pix, 1))
    )


def render_single_iteration(
    scene: SceneData, cfg: RenderConfig, iteration: int
) -> jnp.ndarray:
    """One iteration through the production block machinery (block = 1).

    Kept for tests/benches and the sharded path; production rendering goes
    through :func:`render`, which batches iterations.
    """
    alg = resolve_algorithm(scene, cfg.algorithm)
    runner = _make_block_runner(scene, cfg, alg)
    return runner(iteration, 1)


def render(scene: SceneData, cfg: RenderConfig, verbose: bool = False,
           accum=None, start_iter: int = 0, block_cb=None):
    """Progressive render. Returns (image [resY,resX,3], seconds, iters).

    Like smallvcm.cxx:52-151: -t (max_time) takes precedence over -i; the
    returned image is the average over completed iterations. ``accum`` /
    ``start_iter`` resume a previous accumulation (checkpoint.py);
    ``block_cb(accum, iterations_done)`` fires after every completed
    block (the checkpoint hook). With ``verbose``, prints per-block
    metrics (mean luminance + wall time — the observability surface the
    reference defines but never calls, framebuffer.hxx:89-102).
    """
    from .io.framebuffer import total_luminance

    res_x, res_y = cfg.resolution
    alg = resolve_algorithm(scene, cfg.algorithm)
    runner = _make_block_runner(scene, cfg, alg)

    accum = (jnp.zeros((res_y, res_x, 3), jnp.float32)
             if accum is None else accum)
    done = start_iter
    auto_block = auto_block_size(cfg, alg)

    # Test-only fault injection (tests/test_isolate.py) is resolved ONCE
    # here so the production block loop carries no per-block env checks.
    fault_hook = (_maybe_inject_test_fault
                  if os.environ.get("SMALLVCM_TEST_FAULT_AT") else None)

    def step(k):
        nonlocal accum, done
        t0 = time.time()
        accum = accum + runner(done, k)
        done += k
        if verbose:
            lum = float(total_luminance(accum)) / max(done, 1)
            print(f"  iter {done - k}..{done - 1}: luminance={lum:.1f} "
                  f"dt={time.time() - t0:.3f}s", flush=True)
        if block_cb is not None:
            block_cb(accum, done)
        if fault_hook is not None:
            fault_hook(done)

    start = time.time()
    if cfg.max_time > 0:
        # First two iterations run singly: they settle caps and give a
        # per-iteration time estimate before committing to full blocks.
        # Block sizes are restricted to {1, auto_block}: every distinct
        # block size is a separate compiled program, and a fresh
        # program's FIRST execution is the runtime's residual flake
        # window — two shapes per run is the maximum worth risking.
        while time.time() - start < cfg.max_time:
            rendered = done - start_iter
            if rendered < 2:
                step(1)
                continue
            dt_iter = (time.time() - start) / rendered
            left = cfg.max_time - (time.time() - start)
            k = auto_block if left >= dt_iter * auto_block else 1
            step(k)
    else:
        # Full blocks then singles. The schedule is a pure function of
        # ``done``, so a resumed run reproduces the original partition
        # and the accumulation association — resume stays bit-exact
        # (tests/test_cli_checkpoint.py).
        target = cfg.iterations
        while done < target:
            k = auto_block if target - done >= auto_block else 1
            step(k)
    elapsed = time.time() - start

    # ``done`` counts ALL accumulated iterations (including a resumed
    # prefix), which is also the averaging divisor; with start_iter == 0
    # it equals the iterations rendered by this call.
    img = accum / done if done > 0 else accum
    return img, elapsed, done
