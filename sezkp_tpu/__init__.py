"""sezkp-tpu: TPU-native streaming zero-knowledge proofs.

Enables JAX's persistent compilation cache (kernel compiles through the TPU
tunnel take tens of seconds; the cache makes them one-time per machine).
Opt out with SEZKP_NO_COMPILE_CACHE=1.
"""

import os

if not os.environ.get("SEZKP_NO_COMPILE_CACHE"):
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/sezkp_tpu_jax")
    )
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
