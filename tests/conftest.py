"""Test configuration: force a virtual 8-device CPU mesh.

Real TPU hardware in CI is a single chip; multi-chip sharding is validated on
a host-platform virtual mesh, and numerics tests don't need the TPU at all.
Must run before jax initializes a backend.
"""

import os
import subprocess
import sys
from pathlib import Path

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Persistent compilation cache: re-runs of the suite skip XLA compiles.
# MUST be a CPU-only cache dir: the tunneled TPU runtime's remote compile
# service writes CPU AOT entries built for the SERVICE host's microarch
# into its cache dir, and loading them locally trips
# "machine feature +prefer-no-gather is not supported" dispatch errors
# (observed to break the multihost test's Gloo rendezvous).
os.environ["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_cache_cpu"
# Merge-cap sizing sidecar: keep tests away from the user's cache (and
# from each other's stale entries — the key spans alg/res/radius).
os.environ["SMALLVCM_TPU_CACHE"] = "/tmp/smallvcm_test_caps"
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

# This container's sitecustomize force-registers a tunneled single-TPU
# backend and overrides JAX_PLATFORMS; pin the test suite to the virtual
# 8-device CPU mesh in-process instead (env vars alone are not honored).
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

REFERENCE_SRC = Path("/root/reference/src/smallvcm.cxx")
REFERENCE_BIN = Path("/tmp/refbin/smallvcm")


@pytest.fixture(scope="session")
def reference_binary():
    """Compile the reference renderer (the test oracle) once per session."""
    if not REFERENCE_BIN.exists():
        if not REFERENCE_SRC.exists():
            pytest.skip("reference source not available")
        REFERENCE_BIN.parent.mkdir(parents=True, exist_ok=True)
        subprocess.run(
            [
                "g++", "-O3", "-std=c++11", "-fopenmp",
                "-o", str(REFERENCE_BIN), str(REFERENCE_SRC),
            ],
            check=True,
        )
    return REFERENCE_BIN


def run_reference(reference_bin, workdir, *args):
    """Run the reference renderer in workdir; returns stdout."""
    out = subprocess.run(
        [str(reference_bin), *args],
        cwd=str(workdir),
        check=True,
        capture_output=True,
        text=True,
    )
    return out.stdout
