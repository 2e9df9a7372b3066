"""Fault-isolated rendering: supervise the render in a child process.

The tunneled single-TPU runtime in this environment can fault
(INVALID_ARGUMENT) when re-executing Mosaic (Pallas) executables, in ways
that depend on the program bytes rather than semantics; once it faults,
every later dispatch in the process fails (the session is poisoned). The
fault is not fixable from user code, so the production Pallas merge runs
under a supervisor:

* the parent re-invokes the CLI as a child with per-iteration
  checkpointing (checkpoint.py — resume is bit-exact because inter-
  iteration state is only (framebuffer, iteration, seed));
* if the child dies with a runtime-fault signature, the parent respawns it
  resuming from the checkpoint. The persistent JAX compilation cache makes
  the respawn recompile cheap;
* after ``max_faults`` faults the parent forces ``--merge-backend xla``
  (no Mosaic kernel at all) and lets the run finish.

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


def run_supervised(argv, max_faults: int = MAX_FAULTS) -> int:
    """Run ``python -m smallvcm_tpu.cli <argv>`` in a supervised child.

    Returns the final exit code. ``argv`` is the parent's CLI argv (without
    the program name)."""
    ckpt = os.path.join(
        tempfile.mkdtemp(prefix="smallvcm_isolate_"), "ckpt.npz"
    )
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

    base = _strip_flag(list(argv), "--checkpoint")
    base = _strip_flag(base, "--checkpoint-every")
    base = _strip_flag(base, "--isolate")

    # Time budget: track wall clock across respawns and hand the child the
    # remainder (render_resumable applies -t to its own invocation).
    t_budget = None
    if "-t" in base:
        t_budget = float(base[base.index("-t") + 1])
    t0 = time.time()

    faults = 0
    force_xla = False
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
                "--checkpoint-every", "1"]
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
        if faults >= max_faults and not force_xla:
            print("[smallvcm_tpu] runtime faulted "
                  f"{faults}x; falling back to --merge-backend xla",
                  flush=True)
            force_xla = True
        else:
            print(f"[smallvcm_tpu] runtime fault (#{faults}); respawning "
                  "from checkpoint", flush=True)
