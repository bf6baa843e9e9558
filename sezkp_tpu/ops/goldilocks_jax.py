"""Goldilocks arithmetic in JAX with 2 x uint32 limbs.

TPU-native design: the TPU VPU has no 64-bit integer multiply, so field
elements are kept as (lo, hi) uint32 pairs and all arithmetic is expressed in
32-bit ops (16-bit splits for multiplies). This lowers to plain vector ops on
the VPU with no u64 emulation.

All functions operate elementwise over arbitrary (broadcastable) shapes and
are cross-tested against :mod:`sezkp_tpu.ops.goldilocks` (numpy/u64 oracle).

A field array is a tuple ``(lo, hi)`` of equal-shape uint32 arrays.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

U32 = jnp.uint32
_M16 = np.uint32(0xFFFF)

# p = 2^64 - 2^32 + 1 -> limbs
P_LO = np.uint32(0x00000001)
P_HI = np.uint32(0xFFFFFFFF)
EPS = np.uint32(0xFFFFFFFF)  # 2^64 mod p = 2^32 - 1 (fits in the lo limb)

F2 = Tuple[jnp.ndarray, jnp.ndarray]


def pack(x: np.ndarray) -> F2:
    """numpy uint64 -> (lo, hi) uint32 jnp arrays."""
    x = np.asarray(x, dtype=np.uint64)
    return (
        jnp.asarray((x & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
        jnp.asarray((x >> np.uint64(32)).astype(np.uint32)),
    )


def unpack(a: F2) -> np.ndarray:
    lo = np.asarray(a[0], dtype=np.uint64)
    hi = np.asarray(a[1], dtype=np.uint64)
    return lo | (hi << np.uint64(32))


def _mul32(x, y):
    """32x32 -> (hi32, lo32) using 16-bit splits (all uint32 ops)."""
    x0 = x & _M16
    x1 = x >> 16
    y0 = y & _M16
    y1 = y >> 16
    ll = x0 * y0
    lh = x0 * y1
    hl = x1 * y0
    hh = x1 * y1
    mid1 = lh + (ll >> 16)
    mid2 = hl + (mid1 & _M16)
    lo = (ll & _M16) | (mid2 << 16)
    hi = hh + (mid1 >> 16) + (mid2 >> 16)
    return hi, lo


def _addc(a, b):
    """32-bit add -> (sum, carry)."""
    s = a + b
    return s, (s < a).astype(U32)


def _add64(alo, ahi, blo, bhi):
    """64-bit add -> (lo, hi, carry_out)."""
    lo, c0 = _addc(alo, blo)
    hi1, c1 = _addc(ahi, bhi)
    hi, c2 = _addc(hi1, c0)
    return lo, hi, c1 + c2


def _sub64(alo, ahi, blo, bhi):
    """64-bit subtract -> (lo, hi, borrow_out)."""
    lo = alo - blo
    b0 = (alo < blo).astype(U32)
    hi1 = ahi - bhi
    b1 = (ahi < bhi).astype(U32)
    hi = hi1 - b0
    b2 = (hi1 < b0).astype(U32)
    return lo, hi, b1 + b2


def _geq_p(lo, hi):
    return (hi > P_HI) | ((hi == P_HI) & (lo >= P_LO))


def _cond_sub_p(lo, hi):
    ge = _geq_p(lo, hi)
    slo, shi, _ = _sub64(lo, hi, P_LO, P_HI)
    return jnp.where(ge, slo, lo), jnp.where(ge, shi, hi)


def add(a: F2, b: F2) -> F2:
    lo, hi, carry = _add64(a[0], a[1], b[0], b[1])
    # overflow by 2^64 -> add EPS (cannot re-carry: wrapped value < p)
    lo2, hi2, _ = _add64(lo, hi, EPS, jnp.zeros_like(hi))
    lo = jnp.where(carry > 0, lo2, lo)
    hi = jnp.where(carry > 0, hi2, hi)
    return _cond_sub_p(lo, hi)


def sub(a: F2, b: F2) -> F2:
    lo, hi, borrow = _sub64(a[0], a[1], b[0], b[1])
    # borrowed 2^64 -> subtract EPS (adds p back mod 2^64)
    lo2, hi2, _ = _sub64(lo, hi, EPS, jnp.zeros_like(hi))
    lo = jnp.where(borrow > 0, lo2, lo)
    hi = jnp.where(borrow > 0, hi2, hi)
    return _cond_sub_p(lo, hi)


def neg(a: F2) -> F2:
    is_zero = (a[0] == 0) & (a[1] == 0)
    lo, hi, _ = _sub64(
        jnp.broadcast_to(P_LO, a[0].shape).astype(U32),
        jnp.broadcast_to(P_HI, a[1].shape).astype(U32),
        a[0],
        a[1],
    )
    return jnp.where(is_zero, a[0], lo), jnp.where(is_zero, a[1], hi)


def mul(a: F2, b: F2) -> F2:
    """Modular multiply: 64x64 -> 128 via 32-bit limbs, Goldilocks fold."""
    a0, a1 = a
    b0, b1 = b

    h00, l00 = _mul32(a0, b0)
    h01, l01 = _mul32(a0, b1)
    h10, l10 = _mul32(a1, b0)
    h11, l11 = _mul32(a1, b1)

    # 128-bit product limbs n0..n3
    n0 = l00
    # n1 = h00 + l01 + l10 (collect carries into n2)
    t1, c1 = _addc(h00, l01)
    n1, c2 = _addc(t1, l10)
    carry1 = c1 + c2
    # n2 = h01 + h10 + l11 + carry1 (collect carries into n3)
    t2, c3 = _addc(h01, h10)
    t3, c4 = _addc(t2, l11)
    n2, c5 = _addc(t3, carry1)
    carry2 = c3 + c4 + c5
    n3 = h11 + carry2

    # reduce: x = (n0,n1) + n2*2^64 + n3*2^96; 2^64 === EPS, 2^96 === -1
    # t = lo64 - n3
    tlo, thi, borrow = _sub64(n0, n1, n3, jnp.zeros_like(n3))
    tlo2, thi2, _ = _sub64(tlo, thi, EPS, jnp.zeros_like(thi))
    tlo = jnp.where(borrow > 0, tlo2, tlo)
    thi = jnp.where(borrow > 0, thi2, thi)

    # t += n2 * EPS ; n2*(2^32-1) = (n2 << 32) - n2
    mlo = jnp.zeros_like(n2) - n2
    mhi = n2 - (n2 != 0).astype(U32)
    rlo, rhi, carry = _add64(tlo, thi, mlo, mhi)
    rlo2, rhi2, _ = _add64(rlo, rhi, EPS, jnp.zeros_like(rhi))
    rlo = jnp.where(carry > 0, rlo2, rlo)
    rhi = jnp.where(carry > 0, rhi2, rhi)

    return _cond_sub_p(rlo, rhi)


def from_u32(x: jnp.ndarray) -> F2:
    return x.astype(U32), jnp.zeros_like(x, dtype=U32)


def zeros(shape) -> F2:
    return jnp.zeros(shape, U32), jnp.zeros(shape, U32)


def scalar(x: int, shape=()) -> F2:
    x = int(x) % 0xFFFFFFFF00000001
    return (
        jnp.full(shape, np.uint32(x & 0xFFFFFFFF), U32),
        jnp.full(shape, np.uint32(x >> 32), U32),
    )
