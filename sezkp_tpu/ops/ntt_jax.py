"""TPU-native radix-2 NTT over Goldilocks (u32-limb JAX kernels).

The stage loop is unrolled at trace time (static shapes, log2(n) stages);
each stage is one gather-free reshape + vectorized butterfly, which XLA fuses
into a handful of elementwise VPU passes over the array. Twiddle tables are
baked in as constants per size.

Outputs are bit-identical to :mod:`sezkp_tpu.ops.ntt` (cross-tested).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from . import goldilocks as G
from . import goldilocks_jax as FJ
from . import ntt as ntt_host

__all__ = [
    "forward_ntt",
    "inverse_ntt",
    "forward_ntt_u64",
    "inverse_ntt_u64",
    "evaluate_on_coset_pow2_u64",
    "deep_coset_lde_u64",
]


def _ntt_stages(a: FJ.F2, tables, n_log2: int) -> FJ.F2:
    """Radix-2 DIT stages over the LAST axis; leading axes are batch dims."""
    n = 1 << n_log2
    perm = jnp.asarray(ntt_host.bitrev_permutation(n))
    lo, hi = a[0][..., perm], a[1][..., perm]
    batch = lo.shape[:-1]
    for s in range(1, n_log2 + 1):
        half = 1 << (s - 1)
        shape = batch + (n >> s, 2, half)
        lo_b = lo.reshape(shape)
        hi_b = hi.reshape(shape)
        u = (lo_b[..., 0, :], hi_b[..., 0, :])
        w = tables[s - 1]
        v = FJ.mul((lo_b[..., 1, :], hi_b[..., 1, :]), (w[0], w[1]))
        s0 = FJ.add(u, v)
        s1 = FJ.sub(u, v)
        lo = jnp.stack([s0[0], s1[0]], axis=-2).reshape(batch + (n,))
        hi = jnp.stack([s0[1], s1[1]], axis=-2).reshape(batch + (n,))
    return lo, hi


@lru_cache(maxsize=32)
def _tables_packed(n_log2: int, inverse: bool):
    return tuple(FJ.pack(t) for t in ntt_host.twiddle_tables(n_log2, inverse))


@lru_cache(maxsize=64)
def _jit_ntt(n_log2: int, inverse: bool):
    tables = _tables_packed(n_log2, inverse)
    inv_n = FJ.pack(np.uint64(G.inv(1 << n_log2)))

    def f(lo, hi):
        out = _ntt_stages((lo, hi), tables, n_log2)
        if inverse:
            out = FJ.mul(out, (inv_n[0], inv_n[1]))
        return out

    return jax.jit(f)


def forward_ntt(a: FJ.F2) -> FJ.F2:
    n = int(a[0].shape[0])
    if n <= 1:
        return a
    return _jit_ntt(n.bit_length() - 1, False)(a[0], a[1])


def inverse_ntt(a: FJ.F2) -> FJ.F2:
    n = int(a[0].shape[0])
    if n <= 1:
        return a
    return _jit_ntt(n.bit_length() - 1, True)(a[0], a[1])


# ------------------- u64 numpy in / numpy out conveniences ------------------


def forward_ntt_u64(a: np.ndarray) -> np.ndarray:
    return FJ.unpack(forward_ntt(FJ.pack(a)))


def inverse_ntt_u64(a: np.ndarray) -> np.ndarray:
    return FJ.unpack(inverse_ntt(FJ.pack(a)))


@lru_cache(maxsize=32)
def _jit_coset_eval(k_log2: int, m: int, shift: int):
    """coeffs[m] -> evals on coset shift*<w> of size 2^k (zero-padded)."""
    n = 1 << k_log2
    shift_pows = FJ.pack(ntt_host.powers(shift, m))
    tables = _tables_packed(k_log2, False)

    def f(clo, chi):
        slo = jnp.zeros(n, FJ.U32).at[:m].set(
            FJ.mul((clo, chi), shift_pows)[0]
        )
        shi = jnp.zeros(n, FJ.U32).at[:m].set(
            FJ.mul((clo, chi), shift_pows)[1]
        )
        return _ntt_stages((slo, shi), tables, k_log2)

    return jax.jit(f)


def evaluate_on_coset_pow2_u64(coeffs: np.ndarray, k_log2: int, shift: int) -> np.ndarray:
    m = len(coeffs)
    c = FJ.pack(np.asarray(coeffs, dtype=np.uint64))
    return FJ.unpack(_jit_coset_eval(k_log2, m, shift)(c[0], c[1]))


@lru_cache(maxsize=32)
def _jit_deep_lde(base_log2: int, lde_log2: int, shift: int):
    """Fused DEEP coset LDE: base evals -> INTT -> coset NTT -> /(x_i - z).

    Single compiled program; the division is a batched-inverse-free multiply
    by precomputed 1/(x_i - z)? No: z is a runtime input, so we compute
    (x_i - z) on device and invert via Fermat (pow p-2, 64 squarings) — still
    fully vectorized.
    """
    n_base = 1 << base_log2
    lde_n = 1 << lde_log2
    inv_n = FJ.pack(np.uint64(G.inv(n_base)))
    tabs_inv = _tables_packed(base_log2, True)
    tabs_fwd = _tables_packed(lde_log2, False)
    shift_pows = FJ.pack(ntt_host.powers(shift, n_base))
    xs = FJ.pack(G.mul(np.uint64(shift), ntt_host.powers(G.primitive_root_2exp(lde_log2), lde_n)))

    def f(base_lo, base_hi, z_lo, z_hi):
        coeffs = _ntt_stages((base_lo, base_hi), tabs_inv, base_log2)
        coeffs = FJ.mul(coeffs, (inv_n[0], inv_n[1]))
        scaled = FJ.mul(coeffs, shift_pows)
        slo = jnp.zeros(lde_n, FJ.U32).at[:n_base].set(scaled[0])
        shi = jnp.zeros(lde_n, FJ.U32).at[:n_base].set(scaled[1])
        y = _ntt_stages((slo, shi), tabs_fwd, lde_log2)
        denom = FJ.sub(xs, (jnp.broadcast_to(z_lo, (lde_n,)), jnp.broadcast_to(z_hi, (lde_n,))))
        inv_denom = _pow_p_minus_2(denom)
        return FJ.mul(y, inv_denom)

    return jax.jit(f)


def _pow_p_minus_2(x: FJ.F2) -> FJ.F2:
    """x^(p-2) elementwise (Fermat inverse).

    Runs the 64-bit square-and-multiply under lax.fori_loop: fully unrolled,
    the ~6000-op dependency chain trips an exponential-time XLA:CPU compile
    pathology (see ops/blake3_jax.py compress_batch for the same issue)."""
    e = 0xFFFFFFFF00000001 - 2
    bits = jnp.asarray(
        np.array([(e >> i) & 1 for i in range(64)], dtype=np.uint32)
    )
    acc = FJ.scalar(1, x[0].shape)
    acc = (jnp.broadcast_to(acc[0], x[0].shape), jnp.broadcast_to(acc[1], x[0].shape))

    def body(i, carry):
        acc, base = carry
        mul_acc = FJ.mul(acc, base)
        take = bits[i] > 0
        acc = (
            jnp.where(take, mul_acc[0], acc[0]),
            jnp.where(take, mul_acc[1], acc[1]),
        )
        base = FJ.mul(base, base)
        return acc, base

    acc, _ = jax.lax.fori_loop(0, 64, body, (acc, x))
    return acc


def deep_coset_lde_u64(
    base_evals: np.ndarray, blow_log2: int, shift: int, z: int
) -> np.ndarray:
    """y[i] = LDE(base)(x_i) / (x_i - z) over the coset of size n*2^blow.

    Matches the reference pipeline deep_coset_lde_stream
    (crates/sezkp-stark/src/v1/lde.rs:42-97) as one fused device program.
    """
    n_base = len(base_evals)
    base_log2 = n_base.bit_length() - 1
    assert 1 << base_log2 == n_base
    lde_log2 = base_log2 + blow_log2
    b = FJ.pack(np.asarray(base_evals, dtype=np.uint64))
    zp = FJ.pack(np.uint64(z))
    out = _jit_deep_lde(base_log2, lde_log2, shift)(b[0], b[1], zp[0], zp[1])
    return FJ.unpack(out)
