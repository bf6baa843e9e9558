"""Self-golden regression anchors: pinned digests of proof artifacts.

These digests pin the COMPLETE wire output of each backend on fixed inputs
(generator seed 42, fixed configs). Any accidental change to field math,
hashing, transcripts, serialization, or scheduling breaks them. All engine
variants (host / device / streaming) must reproduce the same bytes — the
cross-engine equality tests cover that; this file pins the absolute bytes.
"""

import sys

import pytest

sys.path.append("tests")

from sezkp_tpu.commit.merkle import commit_blocks
from sezkp_tpu.crypto import blake3
from sezkp_tpu.fold.backend import FoldBackend
from sezkp_tpu.stark.backends import StarkIOP, StarkV1
from sezkp_tpu.trace.generator import generate_trace
from sezkp_tpu.trace.partition import partition_trace

from test_stark_v1 import MANIFEST, demo_blocks

MANIFEST_ROOT_HEX = "72b47de22994a1bf607942202ce67ce21a41bb563c37d484de8912b3c7de990b"
V0_DIGEST = "5429a1186f37fc9600f2633f687dbe54322d066edc22c6318c31af49a922d884"
FOLD_DIGEST = "fd9fc3949c4e95c171bfd3a0c1877c626411c9a6781e139fbe503285b03000b0"
V1_DIGEST = "61d043b5b9cba1c4db893d179508ae60a8f585d38c05d0ddceae9a25f5db5936"


@pytest.fixture(scope="module")
def pipeline():
    blocks = partition_trace(generate_trace(1024, 4), 64)
    return blocks, commit_blocks(blocks)


def test_manifest_root_pinned(pipeline):
    _, man = pipeline
    assert man.root.hex() == MANIFEST_ROOT_HEX


def test_v0_proof_pinned(pipeline):
    blocks, man = pipeline
    art = StarkIOP.prove(blocks, man.root)
    assert blake3.hash_bytes(art.proof_bytes).hex() == V0_DIGEST


def test_fold_proof_pinned(pipeline):
    blocks, man = pipeline
    art = FoldBackend.prove(blocks, man.root)
    assert blake3.hash_bytes(art.proof_bytes).hex() == FOLD_DIGEST


def test_v1_proof_pinned():
    blocks = demo_blocks(4, 256, tau=2)
    art = StarkV1.prove(blocks, MANIFEST)
    assert blake3.hash_bytes(art.proof_bytes).hex() == V1_DIGEST
