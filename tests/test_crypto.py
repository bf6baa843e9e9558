"""BLAKE3 + transcript unit tests (mirrors crates/sezkp-crypto tests)."""

import numpy as np
import pytest

from sezkp_tpu.crypto import blake3, blake3_py
from sezkp_tpu.crypto.transcript import Blake3Transcript


def test_blake3_known_vectors():
    # Public BLAKE3 test vectors (empty and "hello world").
    assert (
        blake3.hash_bytes(b"").hex()
        == "af1349b9f5f9a1a6a0404dea36dcc9499bcb25c9adc112b7cc9a93cae41f3262"
    )
    assert (
        blake3.hash_bytes(b"hello world").hex()
        == "d74981efa70a0c880b8d8c1985d075dbcbf679b99a5f9914e5aaf96b831a9e24"
    )


@pytest.mark.parametrize("n", [0, 1, 63, 64, 65, 1023, 1024, 1025, 3072, 5000])
def test_native_matches_python(n):
    data = bytes((i * 7 + 13) & 0xFF for i in range(n))
    assert blake3.hash_bytes(data, 64) == blake3_py.blake3_hash(data, 64)


def test_hash_many_matches_single():
    rng = np.random.default_rng(0)
    msgs = rng.integers(0, 256, (37, 122), dtype=np.uint8)
    out = blake3.hash_many(msgs)
    for i in range(msgs.shape[0]):
        assert out[i].tobytes() == blake3.hash_bytes(msgs[i].tobytes())


def test_transcript_determinism_and_label_sep():
    t1 = Blake3Transcript("dom")
    t2 = Blake3Transcript("dom")
    t1.absorb("a", b"hello")
    t2.absorb("a", b"hello")
    assert t1.challenge_bytes("c", 32) == t2.challenge_bytes("c", 32)

    t3 = Blake3Transcript("dom")
    t3.absorb("a", b"hello")
    assert t1.challenge_bytes("c", 32) != t3.challenge_bytes("d", 32)


def test_transcript_domain_separation():
    t1 = Blake3Transcript("dom1")
    t2 = Blake3Transcript("dom2")
    t1.absorb("x", b"payload")
    t2.absorb("x", b"payload")
    assert t1.challenge_bytes("c", 16) != t2.challenge_bytes("c", 16)


def test_transcript_ratchets_after_challenge():
    t = Blake3Transcript("dom")
    t.absorb("x", b"p")
    c1 = t.challenge_bytes("c", 16)
    c2 = t.challenge_bytes("c", 16)
    assert c1 != c2


def test_merkle_root_odd_promotion():
    a, b, c = (bytes([i]) * 32 for i in (1, 2, 3))
    import numpy as np

    leaves = np.frombuffer(a + b + c, dtype=np.uint8).reshape(3, 32)
    r1 = blake3.hash_bytes(a + b)
    expect = blake3.hash_bytes(r1 + c)
    assert blake3.merkle_root_leaves(leaves) == expect
    # empty -> zero root
    assert blake3.merkle_root_leaves(np.zeros((0, 32), np.uint8)) == b"\x00" * 32
