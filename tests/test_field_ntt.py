"""Goldilocks field + NTT: numpy oracle vs bigint, JAX vs numpy, roundtrips."""

import numpy as np
import pytest

from sezkp_tpu.ops import goldilocks as G
from sezkp_tpu.ops import goldilocks_jax as FJ
from sezkp_tpu.ops import ntt as N
from sezkp_tpu.ops import ntt_jax as NJ

P = int(G.P)


@pytest.fixture(scope="module")
def rand_pairs():
    rng = np.random.default_rng(7)
    edge = np.array(
        [0, 1, 2, P - 1, P - 2, 0xFFFFFFFF, 0x100000000, P // 2, 2**63], dtype=np.uint64
    )
    a = np.concatenate([edge, rng.integers(0, P, 5000, dtype=np.uint64)])
    b = np.concatenate([edge[::-1], rng.integers(0, P, 5000, dtype=np.uint64)])
    return a, b


def test_numpy_field_vs_bigint(rand_pairs):
    a, b = rand_pairs
    ai, bi = a.astype(object), b.astype(object)
    assert np.all(G.add(a, b).astype(object) == (ai + bi) % P)
    assert np.all(G.sub(a, b).astype(object) == (ai - bi) % P)
    assert np.all(G.mul(a, b).astype(object) == (ai * bi) % P)
    assert np.all(G.neg(a).astype(object) == (-ai) % P)


def test_jax_field_vs_numpy(rand_pairs):
    import jax

    a, b = rand_pairs
    pa, pb = FJ.pack(a), FJ.pack(b)

    @jax.jit
    def all_ops(pa, pb):
        return (FJ.add(pa, pb), FJ.sub(pa, pb), FJ.mul(pa, pb), FJ.neg(pa))

    radd, rsub, rmul, rneg = all_ops(pa, pb)
    assert np.array_equal(FJ.unpack(radd), G.add(a, b))
    assert np.array_equal(FJ.unpack(rsub), G.sub(a, b))
    assert np.array_equal(FJ.unpack(rmul), G.mul(a, b))
    assert np.array_equal(FJ.unpack(rneg), G.neg(a))


def test_from_i64():
    x = np.array([-5, -1, 0, 1, 5, -(2**63), 2**63 - 1], dtype=np.int64)
    want = np.array([v % P for v in x.tolist()], dtype=object)
    assert np.all(G.from_i64(x).astype(object) == want)


def test_inv_array():
    rng = np.random.default_rng(3)
    a = rng.integers(1, P, 257, dtype=np.uint64)
    assert np.all(G.mul(a, G.inv_array(a)) == 1)


def test_goldilocks_roots():
    for k in range(1, 9):
        w = G.primitive_root_2exp(k)
        assert pow(w, 1 << k, P) == 1
        if k > 0:
            assert pow(w, 1 << (k - 1), P) != 1


@pytest.mark.parametrize("k", [0, 1, 2, 5, 10, 12])
def test_ntt_roundtrip(k):
    rng = np.random.default_rng(k)
    a = rng.integers(0, P, 1 << k, dtype=np.uint64)
    assert np.array_equal(N.inverse_ntt(N.forward_ntt(a)), a)


@pytest.mark.parametrize("k", [1, 3, 5])
def test_ntt_matches_naive_dft(k):
    rng = np.random.default_rng(k)
    n = 1 << k
    a = rng.integers(0, P, n, dtype=np.uint64)
    assert np.array_equal(N.forward_ntt(a), N.naive_dft(a, G.primitive_root_2exp(k)))


@pytest.mark.parametrize("k", [1, 6, 12])
def test_jax_ntt_matches_host(k):
    rng = np.random.default_rng(k + 100)
    a = rng.integers(0, P, 1 << k, dtype=np.uint64)
    assert np.array_equal(NJ.forward_ntt_u64(a), N.forward_ntt(a))
    assert np.array_equal(NJ.inverse_ntt_u64(a), N.inverse_ntt(a))


def test_coset_eval_point():
    rng = np.random.default_rng(0)
    a = rng.integers(0, P, 8, dtype=np.uint64)
    ev = N.evaluate_on_coset_pow2(a, 5, 3)
    w = G.primitive_root_2exp(5)
    for i in [0, 5, 31]:
        x = 3 * pow(w, i, P) % P
        want = sum(int(a[j]) * pow(x, j, P) for j in range(8)) % P
        assert int(ev[i]) == want


def test_deep_lde_fused_matches_host_pipeline():
    rng = np.random.default_rng(0)
    base = rng.integers(0, P, 1 << 6, dtype=np.uint64)
    z = 987654321987654321 % P
    coeffs = N.interpolate_from_evals(base)
    y = N.evaluate_on_coset_pow2(coeffs, 9, 3)
    xs = G.mul(np.uint64(3), N.powers(G.primitive_root_2exp(9), 1 << 9))
    want = G.mul(y, G.inv_array(G.sub(xs, np.uint64(z))))
    got = NJ.deep_coset_lde_u64(base, 3, 3, z)
    assert np.array_equal(got, want)
