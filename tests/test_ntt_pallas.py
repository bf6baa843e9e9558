"""Pallas four-step NTT vs host oracle (interpret mode on CPU)."""

import numpy as np
import pytest

from sezkp_tpu.ops import goldilocks as G
from sezkp_tpu.ops import ntt as N
from sezkp_tpu.ops import ntt_pallas as NP


@pytest.mark.parametrize("k", [2, 4, 8, 11])
def test_pallas_forward_matches_host(k):
    rng = np.random.default_rng(k)
    a = rng.integers(0, int(G.P), 1 << k, dtype=np.uint64)
    assert np.array_equal(NP.forward_ntt_u64(a), N.forward_ntt(a))


@pytest.mark.parametrize("k", [2, 4, 8, 11])
def test_pallas_inverse_matches_host(k):
    rng = np.random.default_rng(k)
    a = rng.integers(0, int(G.P), 1 << k, dtype=np.uint64)
    assert np.array_equal(NP.inverse_ntt_u64(a), N.inverse_ntt(a))


def test_pallas_roundtrip():
    rng = np.random.default_rng(0)
    a = rng.integers(0, int(G.P), 1 << 10, dtype=np.uint64)
    assert np.array_equal(NP.inverse_ntt_u64(NP.forward_ntt_u64(a)), a)


@pytest.mark.parametrize("split", [2, 4, 6])
def test_pallas_split_invariance(split):
    """Any n1/n2 factorization yields the same transform."""
    rng = np.random.default_rng(split)
    a = rng.integers(0, int(G.P), 1 << 8, dtype=np.uint64)
    from sezkp_tpu.ops import goldilocks_jax as FJ

    got = FJ.unpack(NP.forward_ntt(FJ.pack(a), n1_log2=split))
    assert np.array_equal(got, N.forward_ntt(a))
