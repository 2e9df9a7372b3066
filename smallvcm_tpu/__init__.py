"""smallvcm_tpu: TPU-native differentiable SmallVCM.

Enables the JAX persistent compilation cache by default — the wavefront VCM
graphs are large and this container's tunneled TPU compiles are slow, so
caching compiled executables across processes matters.
"""

import os as _os

_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
