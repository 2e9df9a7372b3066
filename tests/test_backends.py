"""Backend resolution: merge/trace 'auto' policies and their guards."""

import jax
import pytest

from smallvcm_tpu.render import (RenderConfig, _resolve_backend,
                                 _resolve_trace_backend)


def _cfg(**kw):
    return RenderConfig(algorithm="vcm", **kw)


class TestMergeBackend:
    def test_auto_is_xla_off_tpu(self):
        # The test session pins JAX to CPU, so auto must resolve to xla.
        assert jax.default_backend() == "cpu"
        assert _resolve_backend(_cfg(), True) == "xla"

    def test_non_vm_algorithms_never_use_pallas(self):
        assert _resolve_backend(_cfg(merge_backend="pallas"), False) == "xla"

    def test_mesh_forces_xla(self):
        cfg = _cfg(merge_backend="pallas", mesh=object())
        assert _resolve_backend(cfg, True) == "xla"

    def test_explicit_xla_respected(self):
        assert _resolve_backend(_cfg(merge_backend="xla"), True) == "xla"


class TestTraceBackend:
    def test_auto_is_xla(self):
        # Measured on the v5e: XLA fuses the ~32-primitive sweep to the
        # kernel's speed, so auto = xla everywhere.
        assert _resolve_trace_backend(_cfg()) == "xla"

    def test_pallas_requires_single_tpu(self):
        assert _resolve_trace_backend(_cfg(trace_backend="pallas")) == "xla"
        cfg = _cfg(trace_backend="pallas", mesh=object())
        assert _resolve_trace_backend(cfg) == "xla"
