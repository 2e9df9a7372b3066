"""Checkpoint/resume for progressive rendering.

The reference has no checkpointing, but its architecture makes state tiny:
the entire inter-iteration state is (accumulated framebuffer, iteration
count, base seed) — renderer.hxx:49-55, vertexcm.hxx:294-299. Resume is
exact: iteration i only reads its index (radius schedule + RNG streams),
so a resumed run produces bit-identical results to an uninterrupted one.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import jax.numpy as jnp


def save_checkpoint(path: str, accum_fb, iterations_done: int,
                    base_seed: int, meta: dict | None = None) -> None:
    p = Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(
        p,
        accum_fb=np.asarray(accum_fb),
        iterations_done=iterations_done,
        base_seed=base_seed,
        meta=json.dumps(meta or {}),
    )


def load_checkpoint(path: str):
    """Returns (accum_fb, iterations_done, base_seed, meta)."""
    with np.load(path, allow_pickle=False) as z:
        return (
            jnp.asarray(z["accum_fb"]),
            int(z["iterations_done"]),
            int(z["base_seed"]),
            json.loads(str(z["meta"])),
        )


def render_resumable(scene, cfg, checkpoint_path: str | None = None,
                     checkpoint_every: int = 0, verbose: bool = False):
    """Progressive render with optional periodic checkpointing.

    Returns (mean image, seconds, iterations). If checkpoint_path exists,
    resumes from it; iterations continue at the saved index so the result
    equals an uninterrupted run. With ``cfg.max_time > 0`` the time budget
    takes precedence over ``cfg.iterations`` (smallvcm.cxx semantics) and
    applies to THIS invocation (a supervisor resuming a crashed run passes
    the remaining budget).
    """
    import time

    from .io.framebuffer import total_luminance
    from .render import render_single_iteration

    res_x, res_y = cfg.resolution
    accum = jnp.zeros((res_y, res_x, 3), jnp.float32)
    start_iter = 0

    if checkpoint_path and Path(checkpoint_path).exists():
        accum, start_iter, seed, _ = load_checkpoint(checkpoint_path)
        assert seed == cfg.base_seed, "checkpoint seed mismatch"

    t0 = time.time()
    it = start_iter
    done = start_iter

    def step(it, accum):
        ts = time.time()
        accum = accum + render_single_iteration(scene, cfg, it)
        if checkpoint_every and (it + 1) % checkpoint_every == 0:
            accum.block_until_ready()
            save_checkpoint(
                checkpoint_path, accum, it + 1, cfg.base_seed,
                dict(algorithm=cfg.algorithm),
            )
        if verbose:
            lum = float(total_luminance(accum)) / (it + 1)
            print(f"  iter {it}: luminance={lum:.1f} "
                  f"dt={time.time() - ts:.3f}s", flush=True)
        return accum

    if cfg.max_time > 0:
        while time.time() - t0 < cfg.max_time:
            accum = step(done, accum)
            accum.block_until_ready()
            done += 1
    else:
        for it in range(start_iter, cfg.iterations):
            accum = step(it, accum)
            done = it + 1
    accum.block_until_ready()
    elapsed = time.time() - t0

    img = accum / max(done, 1)
    return img, elapsed, done
