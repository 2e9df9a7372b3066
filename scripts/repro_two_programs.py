"""Minimal repro: two Mosaic-containing executables in one process on the
tunneled (axon) TPU runtime -> the SECOND one faults on RE-execution.

Round-5 distillation of the round-4 "block=1 pallas program faults
persistently" bug (scripts/repro_mosaic_fault.py is the full ladder).
Narrowed behavior, each line verified against the production renderer:

  * one Mosaic program per process: re-executes clean indefinitely;
  * program A (Mosaic) executed, then program B (Mosaic, any different
    shape — distinct kernel names included): B's FIRST execution is
    clean, B's SECOND execution raises INVALID_ARGUMENT.

The production fix is architectural: the block driver traces the
iteration count as a dynamic fori_loop bound so ONE executable serves
every block size (algorithms/vcm.py::render_block_with_stats).

Usage: python scripts/repro_two_programs.py   (prints PASS/FAULT lines)
"""

import functools
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def make_program(n: int, name: str):
    def kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 2.0

    @jax.jit
    def prog(x):
        y = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n, 128), jnp.float32),
            name=name,
        )(x * 1.5)
        return jnp.sum(y)

    return prog, jnp.ones((n, 128), jnp.float32)


def main():
    a, xa = make_program(256, "kernel_a")
    b, xb = make_program(512, "kernel_b")
    for label, fn, x in (("A#1", a, xa), ("A#2", a, xa), ("B#1", b, xb),
                         ("B#2", b, xb), ("B#3", b, xb), ("A#3", a, xa)):
        try:
            v = float(fn(x))
            print(f"{label}: ok ({v})", flush=True)
        except Exception as e:  # noqa: BLE001 - repro prints everything
            print(f"{label}: FAULT {type(e).__name__}: {e}", flush=True)
            sys.exit(1)
    print("no fault reproduced (runtime fixed, or hazard needs "
          "larger programs — see scripts/repro_mosaic_fault.py)")


if __name__ == "__main__":
    main()
