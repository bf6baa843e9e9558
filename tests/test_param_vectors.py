"""Transcript parameter-vector stability (reference:
crates/sezkp-stark/tests/param_vectors.rs:39-90).

Binds the pinned public inputs from specs/stark-v1/transcript_inputs.json
into a v1 transcript exactly as the protocol does and checks the derived
alphas/queries. Beyond the reference's size/range invariants, the exact
derived values are pinned: the transcript is bit-exact with the reference
implementation (validated against its golden proof artifacts), so these
vectors are stable cross-implementation checkpoints."""

import json
import os

import pytest

from sezkp_tpu.crypto.transcript import Blake3Transcript
from sezkp_tpu.ops import goldilocks as G
from sezkp_tpu.stark.v1 import params

VECTORS = os.environ.get(
    "SEZKP_TRANSCRIPT_VECTORS",
    os.path.join(os.path.dirname(__file__), "..", "specs", "stark-v1", "transcript_inputs.json"),
)

GOLDEN_ALPHAS = [
    8820786361645394874, 10568407485172754638, 1603834204217358979,
    3769768625702055810, 1690671017423931556, 17844344029384224630,
    2177048517719173926, 16808598988148686972,
]
GOLDEN_QUERIES = [
    50, 843, 84, 332, 799, 405, 45, 621, 39, 290, 688, 370, 217, 674, 594,
    22, 106, 709, 586, 667, 566, 259, 574, 994, 64, 820, 637, 915, 173, 744,
]


def _transcript(v):
    tr = Blake3Transcript(params.DS_V1_DOMAIN)
    tr.absorb("manifest_root", bytes.fromhex(v["manifest_root_hex"]))
    tr.absorb_u64("n", v["n"])
    tr.absorb_u64("tau", v["tau"])
    tr.absorb_u64(params.DS_N_COLS, len(v["col_roots_hex"]))
    for rhex in v["col_roots_hex"]:
        tr.absorb(params.DS_COL_ROOT, bytes.fromhex(rhex))
    return tr


@pytest.fixture(scope="module")
def vectors():
    if not os.path.exists(VECTORS):
        pytest.skip(f"vectors file not found at {VECTORS}")
    return json.load(open(VECTORS))


def test_vectors_transcript_challenges_stable(vectors):
    tr = _transcript(vectors)
    alphas = params.derive_alphas(tr)
    assert len(alphas) == params.NUM_ALPHAS
    assert any(a != 0 for a in alphas)
    assert all(0 <= a < int(G.P) for a in alphas)

    queries = params.derive_queries(tr, vectors["n"], params.NUM_QUERIES)
    assert len(queries) == params.NUM_QUERIES
    assert all(q < vectors["n"] for q in queries)

    assert alphas == GOLDEN_ALPHAS
    assert queries == GOLDEN_QUERIES


def test_vectors_rederivation_deterministic(vectors):
    a1 = params.derive_alphas(_transcript(vectors))
    a2 = params.derive_alphas(_transcript(vectors))
    assert a1 == a2
