"""Supervisor (isolate.py) fault-injection tests.

The supervisor respawns a child CLI from its checkpoint when the child
dies with a runtime-fault signature, and forces --merge-backend xla after
max_faults. These tests inject synthetic faults via the
SMALLVCM_TEST_FAULT_* hooks (render.py::_maybe_inject_test_fault) and
assert exact recovery — all on CPU, no TPU needed.
"""

import os
import subprocess
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.slow

REPO = Path(__file__).resolve().parent.parent


def _run_cli(argv, extra_env=None, cwd=None):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_cache_cpu"
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
    env["SMALLVCM_TPU_CACHE"] = "/tmp/smallvcm_test_caps"
    env["PYTHONPATH"] = f"{REPO}:{env.get('PYTHONPATH', '')}"
    if extra_env:
        env.update(extra_env)
    return subprocess.run(
        [sys.executable, "-m", "smallvcm_tpu.cli", *argv],
        env=env, capture_output=True, text=True, cwd=cwd or str(REPO),
    )


BASE = ["-s", "0", "-a", "vcm", "-i", "4", "--resolution", "16", "16",
        "--merge-backend", "xla", "--block", "1", "--devices", "1"]


def test_supervised_fault_recovers_bit_exact(tmp_path):
    """One injected fault at iteration 2: the supervisor respawns from
    the checkpoint and the final image is byte-identical to an
    uninterrupted run."""
    ref = tmp_path / "ref.bmp"
    out = tmp_path / "out.bmp"
    ckpt = tmp_path / "ckpt.npz"
    counter = tmp_path / "faults"

    r = _run_cli(BASE + ["--isolate", "off", "-o", str(ref)])
    assert r.returncode == 0, r.stderr[-2000:]

    r = _run_cli(
        BASE + ["--isolate", "on", "--checkpoint", str(ckpt),
                "--checkpoint-every", "1", "-o", str(out)],
        extra_env={
            "SMALLVCM_TEST_FAULT_AT": "2",
            "SMALLVCM_TEST_FAULT_TIMES": "1",
            "SMALLVCM_TEST_FAULT_COUNTER": str(counter),
        },
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert counter.read_text() == "1"          # the fault really fired
    assert "respawning from checkpoint" in r.stdout
    assert out.read_bytes() == ref.read_bytes()


def test_supervised_forces_xla_after_max_faults(tmp_path):
    """Two injected faults: the supervisor flips to --merge-backend xla
    and still finishes with the exact image (the merge is exact on both
    backends)."""
    ref = tmp_path / "ref.bmp"
    out = tmp_path / "out.bmp"
    ckpt = tmp_path / "ckpt.npz"
    counter = tmp_path / "faults"

    r = _run_cli(BASE + ["--isolate", "off", "-o", str(ref)])
    assert r.returncode == 0, r.stderr[-2000:]

    r = _run_cli(
        BASE + ["--isolate", "on", "--checkpoint", str(ckpt),
                "--checkpoint-every", "1", "-o", str(out)],
        extra_env={
            "SMALLVCM_TEST_FAULT_AT": "2",
            "SMALLVCM_TEST_FAULT_TIMES": "2",
            "SMALLVCM_TEST_FAULT_COUNTER": str(counter),
        },
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert counter.read_text() == "2"
    assert "falling back to --merge-backend xla" in r.stdout
    assert out.read_bytes() == ref.read_bytes()


def test_supervisor_gives_up_without_progress(tmp_path):
    """Faults at iteration 0 with no checkpoint ever written: the
    supervisor must stop respawning and return nonzero (advisor round 2:
    no unbounded respawn loops)."""
    out = tmp_path / "out.bmp"
    ckpt = tmp_path / "ckpt.npz"
    counter = tmp_path / "faults"

    r = _run_cli(
        BASE + ["--isolate", "on", "--checkpoint", str(ckpt),
                "--checkpoint-every", "0", "-o", str(out)],
        extra_env={
            "SMALLVCM_TEST_FAULT_AT": "1",
            "SMALLVCM_TEST_FAULT_TIMES": "99",
            "SMALLVCM_TEST_FAULT_COUNTER": str(counter),
            # fault BEFORE any checkpoint: checkpoint-every 0 disables
            # saves, so iteration count never advances
        },
    )
    assert r.returncode != 0
    assert "giving up" in r.stdout
    assert int(counter.read_text()) <= 6       # bounded respawns
