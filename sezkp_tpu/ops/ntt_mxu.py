"""MXU (int8 systolic-array) NTT for Goldilocks on TPU.

The four-step kernel in :mod:`ntt_pallas` is VPU-multiply bound: each
butterfly costs ~10 16-bit multiplies plus carries in the (lo, hi) u32
representation, times log2(m) stages per phase. This module moves the
multiply work onto the MXU instead: each four-step phase is a *dense DFT
matmul* ``Y = W @ X`` with ``W[k, j] = w^(kj)``, evaluated exactly over the
integers via a 7-bit limb decomposition and int8 matmuls with i32
accumulation, then reduced mod p once per output element in VMEM.

Exactness bounds (all static):
  * operands split into NDIG = 10 digits of 7 bits (base 128, 0..127 each,
    exact in int8);
  * one digit-pair product plane accumulates m terms of <= 127^2, so a
    plane element is <= m * 16129 (< 2^31 for m <= 2^17);
  * a recombination diagonal sums <= 10 planes: s_d < 10 * m * 16129
    (< 2^31 for m <= 2^13; phases here use m <= 2^10);
  * the full value  sum_d s_d * 2^(7d)  (< 2^160) is reassembled into five
    u32 limbs with carry chains and folded mod p with the Goldilocks
    identities 2^64 = 2^32 - 1, 2^96 = -1, 2^128 = -2^32, 2^160 = -(2^32-1).

The DFT-as-matmul formulation also removes the bit-reverse permutations and
per-stage twiddle tables; only the standard four-step inter-phase twiddles
T[k1, b] = w_n^(k1*b) remain, applied in-kernel after recombination
(reference transform semantics: crates/sezkp-ffts/src/ntt.rs:79-177; this
kernel is bit-identical to ops/ntt.forward_ntt / inverse_ntt).

Sizes: n = m1 * m2 (two phases) or m1 * m2 * m3 (three phases), every factor
<= 2^10 so each W digit table ([10*m, m] int8) stays VMEM-resident. For
n < 2^14 the roll-based :mod:`ntt_pallas` kernel is used instead (matmul
setup overhead dominates below that).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import goldilocks as G
from . import goldilocks_jax as FJ
from . import ntt as ntt_host
from . import ntt_pallas

NDIG = 10  # 7-bit digits per u64
DIAGS = 2 * NDIG - 1
MIN_LOG2 = 14  # below this, delegate to ntt_pallas
_MASK7 = np.uint32(127)

# VMEM working-set cap per tile plane: 19 diagonal planes of i32 plus the
# int8 stacks must fit comfortably; tile_elems <= 2^17 keeps that ~12 MB.
_TILE_ELEMS_LOG2 = 17

_params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _factor_logs(n_log2: int) -> list[int]:
    """Balanced factor logs, each <= 10, largest first (smallest last so the
    middle-phase twiddle table [m_last, m_mid] stays small).

    MXU work scales with sum(m_i), so three balanced factors beat two from
    n = 2^18 up (measured: 0.74 ms vs 1.6 ms at 2^20 on v5e); below that the
    extra phase's recombination + HBM pass dominates."""
    k = 2 if n_log2 <= 17 else 3
    q, r = divmod(n_log2, k)
    return [q + 1] * r + [q] * (k - r)


def _digit(lo, hi, k: int):
    """k-th 7-bit digit of the u64 value (lo, hi); returns u32 in [0, 127]."""
    sh = 7 * k
    if sh + 7 <= 32:
        return (lo >> sh) & _MASK7 if sh else lo & _MASK7
    if sh < 32:  # straddles the limb boundary (k == 4: bits 28..34)
        return ((lo >> sh) | (hi << (32 - sh))) & _MASK7
    return (hi >> (sh - 32)) & _MASK7


def _acc_add64(acc, x):
    """64-bit accumulator (lo, hi u32) += u32 x."""
    lo, c = FJ._addc(acc[0], x)
    return lo, acc[1] + c


def _recombine(diags):
    """[s_0..s_18] u32 diagonal sums -> canonical (lo, hi) of
    sum_d s_d * 2^(7d) mod p."""
    shape = diags[0].shape
    z = jnp.zeros(shape, jnp.uint32)
    acc = [(z, z) for _ in range(5)]
    for d, s in enumerate(diags):
        q, sh = divmod(7 * d, 32)
        acc[q] = _acc_add64(acc[q], (s << sh) if sh else s)
        if sh:
            acc[q + 1] = _acc_add64(acc[q + 1], s >> (32 - sh))
    # carry-normalize into u32 limbs v0..v5 (v = sum_q v_q 2^(32 q))
    v = []
    carry = z
    for q in range(5):
        lo, c = FJ._addc(acc[q][0], carry)
        v.append(lo)
        carry = acc[q][1] + c  # acc hi < 2^35/2^32 + 1, no overflow
    v.append(carry)
    # fold mod p: 2^64=EPS, 2^96=-1, 2^128=-2^32, 2^160=-EPS (EPS=2^32-1)
    nz2 = (v[2] != 0).astype(jnp.uint32)
    nz5 = (v[5] != 0).astype(jnp.uint32)
    a = FJ._cond_sub_p(v[0], v[1])
    b = FJ._cond_sub_p(z - v[2], v[2] - nz2)  # v2 * EPS
    c_ = FJ._cond_sub_p(v[3], v[4])
    d_ = FJ._cond_sub_p(z - v[5], v[5] - nz5)  # v5 * EPS
    r = FJ.add(a, b)
    r = FJ.sub(r, c_)
    return FJ.sub(r, d_)


@lru_cache(maxsize=32)
def _w_digits(m_log2: int, inverse: bool, scale: int = 1):
    """DFT matrix W[k, j] = scale * w^(kj) as int8 digit planes [NDIG*m, m].

    W is symmetric, so the same table serves axis-0 (W @ X) and axis-1
    (X @ W) phases."""
    m = 1 << m_log2
    w = G.primitive_root_2exp(m_log2)
    if inverse:
        w = G.inv(w)
    wp = ntt_host.powers(w, m)
    k = np.arange(m, dtype=np.uint64)
    idx = (k[:, None] * k[None, :]) % np.uint64(m)
    W = wp[idx]
    if scale != 1:
        W = G.mul(W, np.uint64(scale))
    digs = [
        ((W >> np.uint64(7 * kd)) & np.uint64(127)).astype(np.int8)
        for kd in range(NDIG)
    ]
    return jnp.asarray(np.concatenate(digs, axis=0))


@lru_cache(maxsize=32)
def _t_mid(m_mid_log2: int, m_last_log2: int, rows: int, inverse: bool):
    """Middle-phase twiddle T[b3, k2] = w_r^(b3*k2) (r = m_mid*m_last),
    host-tiled to `rows` rows when rows >= m_last."""
    m_mid, m_last = 1 << m_mid_log2, 1 << m_last_log2
    w = G.primitive_root_2exp(m_mid_log2 + m_last_log2)
    if inverse:
        w = G.inv(w)
    wp = ntt_host.powers(w, m_mid * m_last)
    b3 = np.arange(m_last, dtype=np.uint64)[:, None]
    k2 = np.arange(m_mid, dtype=np.uint64)[None, :]
    t = wp[b3 * k2]  # max index (m_last-1)(m_mid-1) < r
    if rows >= m_last:
        t = np.tile(t, (rows // m_last, 1))
    return FJ.pack(t)


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _dft_kernel(m_log2: int, tile: int, axis: int, twiddle: bool, interp: bool):
    """Pallas kernel body: exact DFT matmul along `axis` + optional twiddle.

    axis=0: X is [m, tile],  Y = W @ X  (digits stacked along columns).
    axis=1: X is [tile, m],  Y = X @ W  (digits stacked along rows)."""
    m = 1 << m_log2

    def kernel(alo_ref, ahi_ref, w_ref, *rest):
        if twiddle:
            tlo_ref, thi_ref, olo_ref, ohi_ref = rest
        else:
            olo_ref, ohi_ref = rest
        alo = alo_ref[:, :]
        ahi = ahi_ref[:, :]
        digs = [
            _digit(alo, ahi, k).astype(jnp.int32).astype(jnp.int8)
            for k in range(NDIG)
        ]
        x = jnp.concatenate(digs, axis=1 - axis)
        w = w_ref[:, :]
        diags = [None] * DIAGS
        for j in range(NDIG):
            wj = w[j * m : (j + 1) * m, :]
            if axis == 0:
                p = jax.lax.dot_general(
                    wj, x, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
            else:
                p = jax.lax.dot_general(
                    x, wj, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
            for i in range(NDIG):
                blk = (
                    p[:, i * tile : (i + 1) * tile]
                    if axis == 0
                    else p[i * tile : (i + 1) * tile, :]
                )
                d = i + j
                diags[d] = blk if diags[d] is None else diags[d] + blk
        lo, hi = _recombine([s.astype(jnp.uint32) for s in diags])
        if twiddle:
            lo, hi = FJ.mul((lo, hi), (tlo_ref[:, :], thi_ref[:, :]))
        olo_ref[:, :] = lo
        ohi_ref[:, :] = hi

    return kernel


def _default_tile(m_log2: int, other: int) -> int:
    return min(other, max(128, 1 << max(_TILE_ELEMS_LOG2 - m_log2, 0)))


def _dft_call(m_log2: int, other: int, axis: int, w, t=None, tile=None):
    """pallas_call wrapper: DFT along `axis` of a 2-D u32-plane pair.

    axis=0: array [m, other], grid over column tiles; t full-size [m, other].
    axis=1: array [other, m], grid over row tiles; t periodic in rows —
    either host-tiled to exactly `tile` rows (constant map) or with a period
    that is a multiple of `tile` (modular map)."""
    m = 1 << m_log2
    interp = _interpret()
    if tile is None:
        tile = _default_tile(m_log2, other)
    grid = other // tile
    kernel = _dft_kernel(m_log2, tile, axis, t is not None, interp)

    if axis == 0:
        data_spec = pl.BlockSpec((m, tile), lambda i: (0, i))
        shape = (m, other)
    else:
        data_spec = pl.BlockSpec((tile, m), lambda i: (i, 0))
        shape = (other, m)
    w_spec = pl.BlockSpec(tuple(w.shape), lambda i: (0, 0))
    in_specs = [data_spec, data_spec, w_spec]
    operands = [w]
    if t is not None:
        if axis == 0:
            t_spec = data_spec
        elif int(t[0].shape[0]) == tile:  # host-tiled to one tile
            t_spec = pl.BlockSpec((tile, m), lambda i: (0, 0))
        else:  # period (rows of t) is a multiple of tile
            period_blocks = int(t[0].shape[0]) // tile
            t_spec = pl.BlockSpec((tile, m), lambda i: (i % period_blocks, 0))
        in_specs += [t_spec, t_spec]
        operands += [t[0], t[1]]

    f = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=[data_spec, data_spec],
        out_shape=[
            jax.ShapeDtypeStruct(shape, jnp.uint32),
            jax.ShapeDtypeStruct(shape, jnp.uint32),
        ],
        interpret=interp,
        compiler_params=None if interp else _params,
    )

    def apply(lo, hi):
        return f(lo, hi, *operands)

    return apply


@lru_cache(maxsize=16)
def _build(n_log2: int, inverse: bool):
    logs = _factor_logs(n_log2)
    n = 1 << n_log2
    inv_n = G.inv(n) if inverse else 1

    if len(logs) == 2:
        l1, l2 = logs
        m1, m2 = 1 << l1, 1 << l2
        t1 = ntt_pallas._twiddle_matrix(l1, l2, inverse)
        phase_a = _dft_call(l1, m2, 0, _w_digits(l1, inverse), t=t1)
        phase_b = _dft_call(l2, m1, 1, _w_digits(l2, inverse, inv_n))

        def f(lo_flat, hi_flat):
            lo = lo_flat.reshape(m1, m2)
            hi = hi_flat.reshape(m1, m2)
            lo, hi = phase_a(lo, hi)
            lo, hi = phase_b(lo, hi)
            return lo.T.reshape(n), hi.T.reshape(n)

        return jax.jit(f)

    assert len(logs) == 3, "n_log2 > 30 not supported"
    l1, l2, l3 = logs
    m1, m2, m3 = 1 << l1, 1 << l2, 1 << l3
    t1 = ntt_pallas._twiddle_matrix(l1, l2 + l3, inverse)
    phase_a = _dft_call(l1, m2 * m3, 0, _w_digits(l1, inverse), t=t1)

    rows_b = m1 * m3
    tile_b = _default_tile(l2, rows_b)
    # powers of two: tile_b >= m3 -> host-tile T2 to tile_b rows (constant
    # block map); tile_b < m3 -> T2 stays [m3, m2], modular block map.
    t2 = _t_mid(l2, l3, tile_b if tile_b >= m3 else 0, inverse)
    phase_b = _dft_call(l2, rows_b, 1, _w_digits(l2, inverse), t=t2, tile=tile_b)
    phase_c = _dft_call(l3, m1 * m2, 1, _w_digits(l3, inverse, inv_n))

    def f(lo_flat, hi_flat):
        lo = lo_flat.reshape(m1, m2 * m3)
        hi = hi_flat.reshape(m1, m2 * m3)
        lo, hi = phase_a(lo, hi)
        # [k1, (a2, b3)] -> [(k1, b3), a2]
        lo = lo.reshape(m1, m2, m3).transpose(0, 2, 1).reshape(rows_b, m2)
        hi = hi.reshape(m1, m2, m3).transpose(0, 2, 1).reshape(rows_b, m2)
        lo, hi = phase_b(lo, hi)
        # [(k1, b3), k2] -> [(k1, k2), b3]
        lo = lo.reshape(m1, m3, m2).transpose(0, 2, 1).reshape(m1 * m2, m3)
        hi = hi.reshape(m1, m3, m2).transpose(0, 2, 1).reshape(m1 * m2, m3)
        lo, hi = phase_c(lo, hi)
        # y[k1 + m1*k2 + m1*m2*k3] = Y[k1, k2, k3]
        lo = lo.reshape(m1, m2, m3).transpose(2, 1, 0).reshape(n)
        hi = hi.reshape(m1, m2, m3).transpose(2, 1, 0).reshape(n)
        return lo, hi

    return jax.jit(f)


def forward_ntt(a: FJ.F2) -> FJ.F2:
    n = int(a[0].shape[0])
    n_log2 = n.bit_length() - 1
    assert 1 << n_log2 == n
    if n_log2 < MIN_LOG2:
        return ntt_pallas.forward_ntt(a)
    return _build(n_log2, False)(a[0], a[1])


def inverse_ntt(a: FJ.F2) -> FJ.F2:
    n = int(a[0].shape[0])
    n_log2 = n.bit_length() - 1
    assert 1 << n_log2 == n
    if n_log2 < MIN_LOG2:
        return ntt_pallas.inverse_ntt(a)
    return _build(n_log2, True)(a[0], a[1])


def forward_ntt_u64(a: np.ndarray) -> np.ndarray:
    return FJ.unpack(forward_ntt(FJ.pack(np.asarray(a, dtype=np.uint64))))


def inverse_ntt_u64(a: np.ndarray) -> np.ndarray:
    return FJ.unpack(inverse_ntt(FJ.pack(np.asarray(a, dtype=np.uint64))))
