"""Device dispatch for the fold line's batched MAC hashing.

The fold prover/verifier hash large batches of equal-length transcript
messages (fold/batch.py, fold/verify.py). Above a batch threshold on TPU,
route them through the fused Pallas BLAKE3 chain kernel
(ops/blake3_pallas.hash_many_words) instead of the host C++ `hash_many` —
same digests, same wire bytes (VERDICT round-2 item 8; the reference's
flagship streaming path, driver.rs:524-855, deserves the flagship kernel).

SEZKP_FOLD_DEVICE_HASH_MIN: batch-size threshold (messages); 0 disables.

Default OFF, and measured to be the right default (scripts/bench_devhash.py,
benchmarks/reports/devhash_r04.json, real v5e, L = 320 B MAC messages):

    n       host C++   tunnel e2e   PCIe-regime estimate*
    4096     2.7 ms      82 ms        3.9 ms
    16384   10.8 ms     175 ms       10.5 ms
    65536   42.6 ms     813 ms       42.9 ms

*prep + bytes/10 GB/s + 8x-amortized measured kernel dispatch. Through
this image's tunnel the device path loses by ~20-30x at every size. Even
co-located (PCIe DMA), it only reaches break-even around n ~ 2^14-2^16
because the host-side packing (pad + u32 view + transpose, prep_s in the
report) grows linearly and the host C++ hash is already ~0.65 us/msg —
so there is no regime where enabling this wins materially for fold MAC
batches. The earlier "deployments set SEZKP_FOLD_DEVICE_HASH_MIN=4096"
guidance was a projection and is withdrawn. The dispatch remains for
deployments whose messages are already device-resident (the STARK line's
in-pipeline hashing uses the Pallas kernel directly and never pays the
pack/transfer). Digests are bit-identical either way
(tests/test_blake3_jax.py, tests/test_fold.py, and the end-to-end TPU
dispatch test in tests/test_fold_devhash_tpu.py).
"""

from __future__ import annotations

import os

import numpy as np

from ..crypto import blake3


def _threshold() -> int:
    return int(os.environ.get("SEZKP_FOLD_DEVICE_HASH_MIN", "0"))


def _on_tpu() -> bool:
    try:
        import jax

        return jax.default_backend() == "tpu"
    except Exception:
        return False


def hash_many_auto(messages: np.ndarray) -> np.ndarray:
    """Batched BLAKE3 of uint8 [N, L] messages -> uint8 [N, 32].

    Device (Pallas chain kernel) when N >= threshold, L <= 1024 (single
    chunk) and a TPU backend is live; host C++ otherwise. Bit-identical
    either way (cross-tested in tests/test_fold.py)."""
    msgs = np.ascontiguousarray(messages, dtype=np.uint8)
    n = msgs.shape[0]
    t = _threshold()
    if t and n >= t and 0 < msgs.shape[1] <= 1024 and _on_tpu():
        from ..ops import blake3_jax as BJ

        return BJ.hash_many_device(msgs)
    return blake3.hash_many(msgs)
