"""Differential fuzz smoke of the twin CBOR decoders (pure-Python oracle vs
the C extension). The long-running harness lives in scripts/fuzz_cbor.py;
this pins a deterministic slice of it in CI (reference analogue:
crates/sezkp-core/fuzz/fuzz_targets/block_decode.rs)."""

import os
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")
)

from fuzz_cbor import run  # noqa: E402


@pytest.mark.parametrize("seed", [0, 1])
def test_cbor_differential_fuzz(seed):
    stats = run(4000, seed)
    # the harness asserts agreement internally; sanity-check coverage:
    assert stats["roundtrip"] > 500
    assert stats["both_reject"] > 200
    assert stats["both_ok"] > 200
