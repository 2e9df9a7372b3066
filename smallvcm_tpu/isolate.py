"""Fault-isolated rendering: supervise the render in a child process.

The tunneled single-TPU runtime in this environment can fault
(INVALID_ARGUMENT) in ways user code cannot repair — once it faults, every
later dispatch in the process fails. Round 3 removed the known trigger:
what corrupts the runtime is LARGE BUFFERS CROSSING EXECUTABLE BOUNDARIES
around a Mosaic kernel, so the production merge kernel now runs FUSED
inside the block executable (render.py::_resolve_backend documents the
experiment ladder). The residual flake is the FIRST execution of a
freshly-compiled program through the remote compile service; reruns load
from the persistent cache and are clean. Supervision is therefore OFF by
default and available via ``--isolate on`` as a belt-and-braces harness
(it automates exactly that retry):

* the parent re-invokes the CLI as a child with periodic checkpointing
  (checkpoint.py — resume is bit-exact because inter-iteration state is
  only (framebuffer, iteration, seed));
* if the child dies with a runtime-fault signature, the parent respawns
  it resuming from the checkpoint;
* after ``max_faults`` faults the parent forces ``--merge-backend xla``
  (no Mosaic kernel at all); if the child keeps faulting WITHOUT making
  checkpoint progress, the supervisor gives up instead of spinning
  (advisor round 2: a dead tunnel emitting UNAVAILABLE must not respawn
  forever).

The parent never initializes the TPU backend — the child owns the chip.
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile
import time

_FAULT_MARKERS = (
    "INVALID_ARGUMENT",
    "TPU backend error",
    "JaxRuntimeError",
    "UNAVAILABLE",
)

MAX_FAULTS = 2
# Consecutive faults with no checkpoint progress before giving up
# entirely (prevents unbounded respawn loops on a dead backend).
MAX_STALLED_FAULTS = 3


def _strip_flag(argv, flag, has_value=True):
    out = []
    i = 0
    while i < len(argv):
        if argv[i] == flag:
            i += 2 if has_value else 1
            continue
        out.append(argv[i])
        i += 1
    return out


def _checkpoint_iteration(path: str) -> int:
    """Saved iteration count, or -1 if no checkpoint exists yet."""
    try:
        import numpy as np

        with np.load(path, allow_pickle=False) as z:
            return int(z["iterations_done"])
    except (OSError, KeyError, ValueError):
        return -1


def run_supervised(argv, max_faults: int = MAX_FAULTS) -> int:
    """Run ``python -m smallvcm_tpu.cli <argv>`` in a supervised child.

    Returns the final exit code. ``argv`` is the parent's CLI argv
    (without the program name)."""
    from .cli import make_parser

    args = make_parser().parse_args(list(argv))

    # Reuse a user-supplied checkpoint so their resumable file is written
    # (advisor round 2); fall back to a temp path only when absent.
    ckpt = args.checkpoint or os.path.join(
        tempfile.mkdtemp(prefix="smallvcm_isolate_"), "ckpt.npz"
    )
    every = min(args.checkpoint_every or 8, 8)

    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

    base = _strip_flag(list(argv), "--checkpoint")
    base = _strip_flag(base, "--checkpoint-every")
    base = _strip_flag(base, "--isolate")

    # Time budget across respawns, parsed robustly via the real parser
    # (handles -t5 / -t=5 spellings the old token scan missed).
    t_budget = args.max_time if args.max_time > 0 else None
    t0 = time.time()

    faults = 0
    stalled = 0
    force_xla = False
    last_iter = _checkpoint_iteration(ckpt)
    while True:
        cmd = base[:]
        if force_xla:
            cmd = _strip_flag(cmd, "--merge-backend") + [
                "--merge-backend", "xla"
            ]
        if t_budget is not None:
            remaining = max(1.0, t_budget - (time.time() - t0))
            cmd = _strip_flag(cmd, "-t") + ["-t", str(remaining)]
        cmd += ["--isolate", "off", "--checkpoint", ckpt,
                "--checkpoint-every", str(every)]
        proc = subprocess.run(
            [sys.executable, "-m", "smallvcm_tpu.cli", *cmd],
            env=env, stderr=subprocess.PIPE, text=True,
        )
        sys.stderr.write(proc.stderr[-2000:] if proc.returncode else "")
        if proc.returncode == 0:
            return 0
        is_fault = any(m in proc.stderr for m in _FAULT_MARKERS)
        if not is_fault:
            return proc.returncode
        faults += 1
        now_iter = _checkpoint_iteration(ckpt)
        stalled = 0 if now_iter > last_iter else stalled + 1
        last_iter = now_iter
        if stalled >= MAX_STALLED_FAULTS:
            print("[smallvcm_tpu] runtime faulted "
                  f"{stalled}x with no checkpoint progress; giving up",
                  flush=True)
            return proc.returncode
        if faults >= max_faults and not force_xla:
            print("[smallvcm_tpu] runtime faulted "
                  f"{faults}x; falling back to --merge-backend xla",
                  flush=True)
            force_xla = True
        else:
            print(f"[smallvcm_tpu] runtime fault (#{faults}); respawning "
                  "from checkpoint", flush=True)
