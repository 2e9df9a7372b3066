"""Renderer driver: algorithm registry, iteration loop, time budget.

Replaces the reference's ``CreateRenderer`` factory (config.hxx:112-143) and
``render()`` execution loop (smallvcm.cxx:52-151). The reference parallelizes
by cloning one renderer per OpenMP thread and averaging their framebuffers;
here one jitted wavefront iteration already saturates the chip, so the
progressive loop just accumulates iterations (optionally sharded across a
device mesh — see parallel/sharding.py).
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Optional

import numpy as np
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
    # photon-merge backend: "pallas" = dense-slab kernel (TPU only),
    # "xla" = pair expansion (portable, differentiable), "auto" = pallas
    # on single-device TPU, xla otherwise. Default stays "xla": the
    # tunneled TPU runtime still faults re-executing the Mosaic kernel in
    # byte-pattern-dependent ways (see _render_iteration_pallas).
    merge_backend: str = "xla"
    # One Mosaic kernel shape per process: the tunneled TPU runtime has
    # been observed to fault re-executing a Mosaic-bearing executable once
    # a second shape variant of the kernel exists in the process, so the
    # pallas driver measures the merge workload with an XLA-only dry run,
    # freezes all caps, compiles the kernel once, and never re-buckets.
    merge_caps_frozen: bool = False
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


def render_single_iteration(
    scene: SceneData, cfg: RenderConfig, iteration: int
) -> jnp.ndarray:
    """Dispatch one iteration of the configured algorithm.

    Merging algorithms auto-size the pair capacity: if the static cap
    overflows (scene-dependent photon concentration), the iteration is
    re-rendered with a doubled cap — exact because the counter-based RNG
    makes iterations deterministic. The grown cap sticks on the config
    (the merge radius only shrinks with iteration, so it stays sufficient).
    """
    res_x, res_y = cfg.resolution
    alg = resolve_algorithm(scene, cfg.algorithm)
    if alg in ("el", "pt"):
        if cfg.mesh is not None:
            from .parallel.sharding import sharded_simple_iteration

            return sharded_simple_iteration(
                cfg.mesh, alg, scene, iteration, res_x, res_y,
                cfg.base_seed, cfg.max_path_length, cfg.min_path_length,
                cfg.rng_kind,
            )
        if alg == "el":
            return eyelight.render_iteration(
                scene, iteration, res_x, res_y, cfg.base_seed,
                rng_kind=cfg.rng_kind,
            )
        return pathtracer.render_iteration(
            scene, iteration, res_x, res_y, cfg.base_seed,
            cfg.max_path_length, cfg.min_path_length,
            rng_kind=cfg.rng_kind,
        )
    use_vc, use_vm, lt_only, ppm = _VCM_FLAGS[alg]
    n = res_x * res_y
    backend = cfg.merge_backend
    if backend == "auto":
        import jax
        # The dense-slab kernel wins from ~512^2 up (439 vs 646 ms/iter at
        # 512^2, and the gap grows with resolution); below that the XLA
        # pair expansion is already cheap and not worth a Mosaic program.
        backend = (
            "pallas"
            if jax.default_backend() == "tpu" and cfg.mesh is None
            and n >= 512 * 512
            else "xla"
        )
    if backend.startswith("pallas") and use_vm:
        if cfg.mesh is None:
            return _render_iteration_pallas(
                scene, cfg, iteration, use_vc, ppm, backend
            )
        # The dense-slab kernel is single-device only (one Mosaic shape per
        # process, see _render_iteration_pallas); sharded runs use the
        # portable XLA merge.
        backend = "xla"
    return _render_iteration_xla(
        scene, cfg, iteration, use_vc, use_vm, lt_only, ppm, backend
    )


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


def _render_iteration_pallas(
    scene: SceneData, cfg: RenderConfig, iteration: int,
    use_vc: bool, ppm: bool, backend: str,
):
    """Merging iteration via the Pallas dense-slab kernel.

    The iteration runs as two executables (vcm.trace_iteration +
    vcm.merge_finish_iteration). The tunneled TPU runtime has been observed
    to fault when RE-executing a Mosaic-bearing executable once a second
    shape variant of the kernel exists in the process (deterministically,
    but dependent on program bytes — byte-identical-semantics variants
    differ), so this driver holds ONE kernel shape per process: before the
    first merge compile it measures the exact work-list demand with an
    XLA-only dry run (the prep half of the kernel), freezes all caps with
    margin, and never re-buckets. Iteration 0 has the largest merge radius
    (vertexcm.hxx:294-299), so its measured demand bounds every later
    iteration; if a cap still overflows, that iteration falls back to the
    XLA merge over the same traced sub-paths — exact, no new kernel shape.
    """
    res_x, res_y = cfg.resolution
    n = res_x * res_y
    traced = vcm.trace_iteration(
        scene, iteration, res_x, res_y, cfg.base_seed,
        cfg.max_path_length, cfg.min_path_length, cfg.radius_factor,
        cfg.radius_alpha, use_vc, ppm, cfg.rng_kind,
    )

    if not cfg.merge_caps_frozen:
        # Dry-run measurement, growing the compaction caps on the (rare)
        # overflow — these recompiles are XLA-only and safe.
        while True:
            ovf, stats = vcm.merge_measure_iteration(
                scene, iteration, traced, res_x, res_y,
                cfg.radius_factor, cfg.radius_alpha,
                cfg.max_path_length, cfg.min_path_length,
                photon_factor=cfg.photon_factor,
                query_factor=cfg.query_factor, ppm=ppm,
            )
            work, n_ph, n_q = (int(v) for v in stats)
            if int(ovf) == 0:
                break
            cfg.photon_factor = max(
                cfg.photon_factor, _bucket(n_ph * 1.2, n))
            cfg.query_factor = max(cfg.query_factor, _bucket(n_q * 1.2, n))
        # Right-size the compaction caps; the work demand depends on the
        # query tiling (= query cap), so re-measure at the final caps.
        want_ph = _bucket(n_ph * 1.15, n)
        want_q = _bucket(n_q * 1.15, n)
        if (want_ph, want_q) != (cfg.photon_factor, cfg.query_factor):
            cfg.photon_factor, cfg.query_factor = want_ph, want_q
            _, stats = vcm.merge_measure_iteration(
                scene, iteration, traced, res_x, res_y,
                cfg.radius_factor, cfg.radius_alpha,
                cfg.max_path_length, cfg.min_path_length,
                photon_factor=cfg.photon_factor,
                query_factor=cfg.query_factor, ppm=ppm,
            )
            work = int(stats[0])
        cfg.pair_factor = _bucket(work * 1.25, n)
        cfg.merge_caps_frozen = True

    fb, _rays, overflow, _stats = vcm.merge_finish_iteration(
        scene, iteration, traced, res_x, res_y,
        cfg.radius_factor, cfg.radius_alpha,
        cfg.max_path_length, cfg.min_path_length,
        use_vc=use_vc, ppm=ppm,
        pair_factor=cfg.pair_factor, photon_factor=cfg.photon_factor,
        query_factor=cfg.query_factor,
        merge_chunks=1, merge_backend=backend,
    )
    if int(overflow) == 0:
        return fb

    # Frozen-cap overflow (possible only through unusual Monte Carlo
    # wiggle): redo this iteration's merge with the XLA backend over the
    # SAME traced sub-paths, growing local caps as needed. The frozen
    # pallas caps are left untouched — no new kernel shape.
    print(f"[smallvcm_tpu] pallas merge cap overflow at iteration "
          f"{iteration}; falling back to the XLA merge for it", flush=True)
    pf, phf, qf = cfg.pair_factor, cfg.photon_factor, cfg.query_factor
    while True:
        chunks = max(1, -(-int(pf * n) // (8 << 20)))
        fb, _rays, overflow, stats = vcm.merge_finish_iteration(
            scene, iteration, traced, res_x, res_y,
            cfg.radius_factor, cfg.radius_alpha,
            cfg.max_path_length, cfg.min_path_length,
            use_vc=use_vc, ppm=ppm,
            pair_factor=pf, photon_factor=phf, query_factor=qf,
            merge_chunks=chunks, merge_backend="xla",
        )
        if int(overflow) == 0:
            return fb
        pairs, n_ph, n_q = (int(v) for v in stats)
        pf = max(_bucket(pairs * 1.1, n), _bucket(pf * n * 1.26, n))
        phf = max(phf, _bucket(n_ph * 1.1, n))
        qf = max(qf, _bucket(n_q * 1.1, n))


def _render_iteration_xla(
    scene: SceneData, cfg: RenderConfig, iteration: int,
    use_vc: bool, use_vm: bool, lt_only: bool, ppm: bool, backend: str,
):
    """One iteration via the single-executable (XLA-merge) path, with the
    self-sizing cap ladder. With ``cfg.mesh`` set, paths are sharded over
    the mesh (parallel/sharding.py) — the same ladder applies because the
    stats come back psum-reduced."""
    res_x, res_y = cfg.resolution
    n = res_x * res_y
    n_shard = n if cfg.mesh is None else n // cfg.mesh.devices.size
    while True:
        # Bound pair-level memory: split the merge into query chunks so the
        # per-chunk candidate-pair cap stays near 8M rows regardless of the
        # total (candidate pairs grow with photon density — quadratically in
        # resolution at a fixed merge radius). Merge caps are per shard.
        chunks = 1 if backend != "xla" else max(
            1, int(-(-int(cfg.pair_factor * n_shard) // (8 << 20))))
        if cfg.mesh is not None:
            from .parallel.sharding import (
                sharded_render_iteration_with_stats,
            )

            fb, _rays, overflow, stats = sharded_render_iteration_with_stats(
                cfg.mesh, scene, iteration, res_x, res_y, cfg.base_seed,
                cfg.max_path_length, cfg.min_path_length,
                cfg.radius_factor, cfg.radius_alpha,
                use_vc=use_vc, use_vm=use_vm, light_trace_only=lt_only,
                ppm=ppm,
                pair_factor=cfg.pair_factor,
                photon_factor=cfg.photon_factor,
                query_factor=cfg.query_factor, rng_kind=cfg.rng_kind,
                merge_chunks=chunks, merge_backend=backend,
            )
        else:
            fb, _rays, overflow, stats = vcm.render_iteration_with_stats(
                scene, iteration, res_x, res_y, cfg.base_seed,
                cfg.max_path_length, cfg.min_path_length,
                cfg.radius_factor, cfg.radius_alpha,
                use_vc=use_vc, use_vm=use_vm, light_trace_only=lt_only,
                ppm=ppm,
                pair_factor=cfg.pair_factor, photon_factor=cfg.photon_factor,
                query_factor=cfg.query_factor, rng_kind=cfg.rng_kind,
                merge_chunks=chunks, merge_backend=backend,
            )
        if not use_vm:
            return fb
        pairs, n_ph, n_q = (int(v) for v in stats)

        # Right-size every cap from the measured counts (pair counts are
        # exact unless the photon/query caps overflowed, in which case the
        # ladder below grows monotonically anyway); a 10% margin covers
        # per-iteration Monte Carlo wiggle. Shrinking a cap recompiles
        # (~30-60 s on the tunneled backend) to save ~100 ms/iteration, so
        # it amortizes only over long runs: the radius schedule shrinks
        # pair counts like (i+1)^-0.25, so with a 2x-hysteresis shrink
        # there are only ~log2 shrink recompiles over a whole run.
        # Exception: shrink on any bucket drop after iterations 0 and 1
        # (the 0->1 radius step drops pairs ~1.7x, measured) — but only
        # when the run is long enough for the ~30-60 s recompile to pay
        # back at ~100 ms/iteration (several hundred iterations).
        long_run = cfg.iterations >= 300 or cfg.max_time >= 120
        def want(needed: float, current: float) -> float:
            b = _bucket(needed, n)
            if b >= current:
                return b          # growth is always applied (exactness)
            hysteresis = 1.0 if (iteration <= 1 and long_run) else 2.0
            return b if b * hysteresis <= current else current

        want_pair = want(pairs * 1.1, cfg.pair_factor)
        want_photon = want(n_ph * 1.1, cfg.photon_factor)
        want_query = want(n_q * 1.1, cfg.query_factor)
        if int(overflow) == 0:
            cfg.pair_factor = want_pair
            cfg.photon_factor = want_photon
            cfg.query_factor = want_query
            return fb
        # Some photons/queries/pairs were dropped: grow each cap to its
        # measured need (guaranteeing progress) and re-render this iteration
        # exactly (the RNG is counter-based). A query/photon overflow can
        # hide pairs, so pair growth must also be monotonic.
        cfg.pair_factor = max(
            want_pair, _bucket(cfg.pair_factor * n * 1.26, n))
        cfg.photon_factor = max(cfg.photon_factor, want_photon)
        cfg.query_factor = max(cfg.query_factor, want_query)
        print(f"[smallvcm_tpu] merge cap overflow; retrying iteration "
              f"{iteration} with pair_factor={cfg.pair_factor} "
              f"photon_factor={cfg.photon_factor} "
              f"query_factor={cfg.query_factor}", flush=True)


def render(scene: SceneData, cfg: RenderConfig, verbose: bool = False):
    """Progressive render. Returns (image [resY,resX,3], seconds, iterations).

    Like smallvcm.cxx:52-151: -t (max_time) takes precedence over -i; the
    returned image is the average over completed iterations. With
    ``verbose``, prints per-iteration metrics (total luminance and
    iteration wall time — the observability surface the reference defines
    but never calls, framebuffer.hxx:89-102).
    """
    from .io.framebuffer import total_luminance

    res_x, res_y = cfg.resolution
    accum = jnp.zeros((res_y, res_x, 3), jnp.float32)

    def step(it, accum):
        t0 = time.time()
        accum = accum + render_single_iteration(scene, cfg, it)
        if verbose:
            lum = float(total_luminance(accum)) / (it + 1)
            print(f"  iter {it}: luminance={lum:.1f} "
                  f"dt={time.time() - t0:.3f}s", flush=True)
        return accum

    start = time.time()
    iters_done = 0
    if cfg.max_time > 0:
        while time.time() - start < cfg.max_time:
            accum = step(iters_done, accum)
            accum.block_until_ready()
            iters_done += 1
    else:
        for it in range(cfg.iterations):
            accum = step(it, accum)
            iters_done += 1
        accum.block_until_ready()
    elapsed = time.time() - start

    if iters_done > 0:
        accum = accum / iters_done
    return accum, elapsed, iters_done
