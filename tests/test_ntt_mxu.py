"""MXU int8-matmul NTT vs host oracle (interpret mode on CPU).

The DFT-as-limb-matmul kernel must be bit-identical to ops/ntt (and hence
to the reference transform, crates/sezkp-ffts/src/ntt.rs:79-177) at every
size and factorization."""

import numpy as np
import pytest

from sezkp_tpu.ops import goldilocks as G
from sezkp_tpu.ops import ntt as N
from sezkp_tpu.ops import ntt_mxu as M


@pytest.mark.parametrize("k", [14, 15])
def test_mxu_forward_matches_host(k):
    rng = np.random.default_rng(k)
    a = rng.integers(0, int(G.P), 1 << k, dtype=np.uint64)
    assert np.array_equal(M.forward_ntt_u64(a), N.forward_ntt(a))


@pytest.mark.parametrize("k", [14, 15])
def test_mxu_inverse_matches_host(k):
    rng = np.random.default_rng(k)
    a = rng.integers(0, int(G.P), 1 << k, dtype=np.uint64)
    assert np.array_equal(M.inverse_ntt_u64(a), N.inverse_ntt(a))


def test_mxu_three_factor_matches_host():
    """2^18 uses the three-phase path (two twiddle stages)."""
    rng = np.random.default_rng(18)
    a = rng.integers(0, int(G.P), 1 << 18, dtype=np.uint64)
    assert np.array_equal(M.forward_ntt_u64(a), N.forward_ntt(a))


def test_mxu_roundtrip():
    rng = np.random.default_rng(0)
    a = rng.integers(0, int(G.P), 1 << 14, dtype=np.uint64)
    assert np.array_equal(M.inverse_ntt_u64(M.forward_ntt_u64(a)), a)


def test_mxu_small_sizes_delegate():
    """Below MIN_LOG2 the roll-based kernel serves the same API."""
    rng = np.random.default_rng(1)
    a = rng.integers(0, int(G.P), 1 << 8, dtype=np.uint64)
    assert np.array_equal(M.forward_ntt_u64(a), N.forward_ntt(a))


def test_recombine_edge_values():
    """Recombination handles extreme digit products (all-max operands):
    signed balanced base-256 digits, m = 1024 (largest factor emitted)."""
    import jax.numpy as jnp

    m = 1024
    x = np.full(1, int(G.P) - 1, dtype=np.uint64)
    dig = [int(d[0]) for d in M._balanced_digits_host(x)]
    assert len(dig) == M.NDIG
    # signed representative: digits rebuild x - p = -1 (congruent mod p)
    assert sum(d * (256**k) for k, d in enumerate(dig)) % int(G.P) == int(
        x[0]
    ) % int(G.P)
    diags = []
    for d in range(M.DIAGS):
        s = sum(
            dig[i] * dig[d - i] for i in range(M.NDIG) if 0 <= d - i < M.NDIG
        )
        diags.append(jnp.full((4, 4), np.int32(s * m)))
        assert abs(s * m) < M.OFF
    lo, hi = M._recombine(diags)
    want = (int(x[0]) * int(x[0]) % int(G.P)) * m % int(G.P)
    got = int(np.asarray(lo)[0, 0]) | (int(np.asarray(hi)[0, 0]) << 32)
    assert got == want


def test_balanced_digits_host_roundtrip():
    rng = np.random.default_rng(7)
    vals = np.concatenate(
        [
            rng.integers(0, 2**64 - 1, 64, dtype=np.uint64),
            np.array([0, 1, 127, 128, 255, 256, int(G.P) - 1, 2**64 - 1], np.uint64),
        ]
    )
    digs = M._balanced_digits_host(vals)
    acc = sum(d.astype(object) * (256**k) for k, d in enumerate(digs))
    assert all(int(a) % int(G.P) == int(v) % int(G.P) for a, v in zip(acc, vals))
    assert all(-128 <= int(d.min()) and int(d.max()) <= 127 for d in digs)
    assert len(digs) == M.NDIG == 8


def test_kernel_digits_match_host():
    """In-kernel signed-representative digitization == host oracle on
    random values plus the MAX_BAL / p boundary neighbourhood."""
    import jax.numpy as jnp

    from sezkp_tpu.ops import goldilocks_jax as FJ

    rng = np.random.default_rng(11)
    edge = np.array(
        [0, 1, M.MAX_BAL - 1, M.MAX_BAL, M.MAX_BAL + 1, M.MAX_BAL + 2,
         int(G.P) - 2, int(G.P) - 1],
        dtype=np.uint64,
    )
    vals = np.concatenate(
        [rng.integers(0, int(G.P), 120, dtype=np.uint64), edge]
    )
    lo, hi = FJ.pack(vals)
    got = M._digits(lo, hi)
    want = M._balanced_digits_host(vals)
    for g, w in zip(got, want):
        assert np.array_equal(np.asarray(g), w)


def test_mxu_transposed_write_path(monkeypatch):
    """The m3 >= 128 path (batched wx + _last_call_t fused natural-order
    write) is bit-equal to the host oracle. Production sizes only select
    it at n >= 2^20; force the factorization [4, 7, 7] at 2^18 so the CPU
    (interpret-mode) suite covers the same kernels."""
    monkeypatch.setattr(M, "_factor_logs", lambda k: [4, 7, 7])
    M._build.cache_clear()
    try:
        rng = np.random.default_rng(3)
        a = rng.integers(0, int(G.P), 1 << 18, dtype=np.uint64)
        assert np.array_equal(M.forward_ntt_u64(a), N.forward_ntt(a))
        assert np.array_equal(M.inverse_ntt_u64(a), N.inverse_ntt(a))
    finally:
        M._build.cache_clear()
