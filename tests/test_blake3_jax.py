"""On-device (JAX) batched BLAKE3 vs host implementation."""

import struct

import numpy as np
import pytest

from sezkp_tpu.crypto import blake3 as B3
from sezkp_tpu.crypto.blake3 import merkle_root_leaves
from sezkp_tpu.commit.merkle import Frontier
from sezkp_tpu.ops import blake3_jax as BJ
from sezkp_tpu.ops import goldilocks as G
from sezkp_tpu.stark.v1.merkle import hash_field_leaves_labeled


@pytest.fixture(scope="module")
def vals():
    rng = np.random.default_rng(0)
    return rng.integers(0, int(G.P), 256, dtype=np.uint64)


def test_device_fri_leaf_hashing_matches_host(vals):
    dev = BJ.hash_field_leaves_device(vals)
    host = B3.hash_many(G.to_le_bytes(vals))
    assert np.array_equal(dev, host)


@pytest.mark.parametrize("label", ["mv_0", "input_mv", "winlen_13", "x"])
def test_device_labeled_leaf_hashing_matches_host(vals, label):
    prefix = b"col_leaf" + struct.pack("<I", len(label)) + label.encode()
    dev = BJ.hash_field_leaves_device(vals[:64], prefix)
    host = hash_field_leaves_labeled(G.to_le_bytes(vals[:64]), label)
    assert np.array_equal(dev, host)


@pytest.mark.parametrize("n", [1, 2, 3, 5, 7, 8, 13, 16, 31, 100])
def test_device_merkle_root_matches_host_batch(vals, n):
    leaves = B3.hash_many(G.to_le_bytes(vals[:n]))
    assert BJ.merkle_root_device(leaves) == merkle_root_leaves(leaves)


@pytest.mark.parametrize("n", [1, 2, 3, 4, 5, 7, 8, 9, 13, 16, 17, 31, 32, 33])
def test_frontier_matches_batch_at_all_sizes(vals, n):
    """The reference's own documented intent (merkle/lib.rs:474-497); see the
    finalize_root docstring for the deliberate fix vs the reference code."""
    leaves = B3.hash_many(G.to_le_bytes(vals[:n]))
    fr = Frontier()
    for i in range(n):
        fr.push_leaf(leaves[i].tobytes())
    assert fr.finalize_root() == merkle_root_leaves(leaves)
    fr2 = Frontier()
    fr2.push_leaves(leaves)
    assert fr2.finalize_root() == merkle_root_leaves(leaves)


@pytest.mark.parametrize("n,blen,out_words", [
    (1, 64, 8), (5, 33, 8), (128, 64, 16), (1000, 48, 8), (4096, 64, 8),
])
def test_pallas_compress_matches_xla(n, blen, out_words):
    """The Pallas VMEM-resident compression (TPU hot path) must be
    bit-identical to the staged XLA kernel (and hence the host oracle).
    Runs in interpret mode off-TPU."""
    import jax
    import jax.numpy as jnp

    from sezkp_tpu.ops import blake3_pallas as BP

    rng = np.random.default_rng(7)
    m = rng.integers(0, 2**32, (n, 16), dtype=np.uint32)
    flags = int(BJ.CHUNK_START | BJ.CHUNK_END | BJ.ROOT)
    a = np.asarray(BJ.compress_batch(jnp.asarray(m), blen, flags, out_words))
    interp = jax.default_backend() != "tpu"
    b = np.asarray(
        BP.compress_rows(jnp.asarray(m), blen, flags, out_words, interpret=interp or None)
    )
    assert np.array_equal(a, b)


def test_hash_many_device_matches_host():
    """The chained multi-block device hasher (ops/blake3_pallas
    hash_many_words via blake3_jax.hash_many_device) is bit-identical to
    the host hash_many across message lengths spanning 1..16 blocks."""
    import numpy as np

    from sezkp_tpu.crypto import blake3
    from sezkp_tpu.ops import blake3_jax as BJ

    rng = np.random.default_rng(5)
    for L in (1, 63, 64, 65, 129, 320, 1024):
        msgs = rng.integers(0, 256, (29, L), dtype=np.uint8)
        assert np.array_equal(BJ.hash_many_device(msgs), blake3.hash_many(msgs))
