"""kanzi_tpu: TPU-native lossless block compressor (kanzi bitstream v7)."""

import os as _os

# Persistent XLA compilation cache: device-gate kernels (ANS/Huffman/LZ) pay
# their compile cost once per shape bucket per machine, not once per process.
# jax reads these env vars at import, so setting them here covers every lazy
# `import jax` in the package without importing jax eagerly.
_os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), _os.pardir,
                  ".jax_cache"))
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
