"""Configuration plumbing (reference aux subsystem, SURVEY.md section 5.6).

Three mechanisms, mirroring the reference:
  (a) CLI flags (sezkp_tpu/cli.py)
  (b) env vars: SEZKP_FOLD_MODE, SEZKP_FOLD_CACHE, SEZKP_WRAP_CADENCE,
      SEZKP_PROOF_STREAM_PATH (fold/backend.py)
  (c) TOML profiles for the bench harness (benchmarks/profiles/*.toml)

This module centralizes the env keys and TOML profile loading.
"""

from __future__ import annotations

import os
import tomllib
from dataclasses import dataclass

ENV_KEYS = {
    "FOLD_MODE": "SEZKP_FOLD_MODE",
    "FOLD_CACHE": "SEZKP_FOLD_CACHE",
    "WRAP_CADENCE": "SEZKP_WRAP_CADENCE",
    "PROOF_STREAM_PATH": "SEZKP_PROOF_STREAM_PATH",
    "LOG": "SEZKP_LOG",
}


@dataclass
class BenchProfile:
    t: int
    b: int
    tau: int
    repeats: int


def load_profile(path: str) -> BenchProfile:
    with open(path, "rb") as f:
        d = tomllib.load(f)
    return BenchProfile(t=d["t"], b=d["b"], tau=d["tau"], repeats=d["repeats"])


def env(key: str, default: str | None = None) -> str | None:
    return os.environ.get(ENV_KEYS.get(key, key), default)


def enable_compile_cache(path: str | None = None) -> None:
    """Enable JAX's persistent compilation cache (idempotent).

    TPU compiles of the production prover are minutes through the tunnel;
    the cache turns every later process's compile into a disk load. Called
    by the CLI and bench entry points; SEZKP_COMPILE_CACHE=0 disables,
    SEZKP_COMPILE_CACHE=<dir> overrides the location."""
    env = os.environ.get("SEZKP_COMPILE_CACHE", "")
    if env == "0":
        return
    if path is None:
        path = env or os.path.expanduser("~/.cache/sezkp-jax")
    try:
        import jax

        if jax.config.jax_compilation_cache_dir:
            return
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
