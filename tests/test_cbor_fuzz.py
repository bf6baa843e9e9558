"""Differential fuzz smoke of the twin CBOR decoders (pure-Python oracle vs
the C extension). The long-running harness lives in scripts/fuzz_cbor.py;
this pins a deterministic slice of it in CI (reference analogue:
crates/sezkp-core/fuzz/fuzz_targets/block_decode.rs)."""

import os
import shutil
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")
)

from fuzz_cbor import run, run_coverage_guided  # noqa: E402


@pytest.mark.parametrize("seed", [0, 1])
def test_cbor_differential_fuzz(seed):
    stats = run(4000, seed)
    # the harness asserts agreement internally; sanity-check coverage:
    assert stats["roundtrip"] > 500
    assert stats["both_reject"] > 200
    assert stats["both_ok"] > 200


def test_coverage_guided_slice(tmp_path):
    """Short coverage-guided greybox run (sys.monitoring line coverage of
    the Python oracle, havoc mutations, corpus growth) — the CI slice of
    scripts/fuzz_cbor.py --coverage-guided; the committed corpus in
    tests/corpus_cbor seeds it when present."""
    # Seed from the committed corpus but persist any new-coverage inputs to
    # tmp_path so a test run never dirties the checkout (ADVICE r3).
    committed = os.path.join(os.path.dirname(__file__), "corpus_cbor")
    corpus = str(tmp_path / "corpus")
    os.makedirs(corpus)
    if os.path.isdir(committed):
        for name in os.listdir(committed):
            shutil.copy(os.path.join(committed, name), corpus)
    stats = run_coverage_guided(3000, seed=7, corpus_dir=corpus)
    assert stats["execs"] == 3000
    assert stats["lines_covered"] > 100  # decoder meaningfully exercised
