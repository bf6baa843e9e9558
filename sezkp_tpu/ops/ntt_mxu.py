"""MXU (int8 systolic-array) NTT for Goldilocks on TPU.

The four-step kernel in :mod:`ntt_pallas` is VPU-multiply bound: each
butterfly costs ~10 16-bit multiplies plus carries in the (lo, hi) u32
representation, times log2(m) stages per phase. This module moves the
multiply work onto the MXU instead: each four-step phase is a *dense DFT
matmul* ``Y = W @ X`` with ``W[k, j] = w^(kj)``, evaluated exactly over the
integers via a signed base-256 digit decomposition and int8 matmuls with
i32 accumulation, then reduced mod p once per output element in VMEM.

Digit scheme (all bounds static):
  * every operand v (canonical, < p) is replaced by the *signed
    representative* r = v - p when v > MAX_BAL, giving r in
    [MIN_BAL, MAX_BAL] with MAX_BAL = 127*(2^64-1)/255 and
    MIN_BAL = -128*(2^64-1)/255 (worst case r = MAX_BAL + 1 - p =
    -9259542118978846849 > MIN_BAL = -9259542123273814144, margin ~2^32);
    the matmul computes W @ X exactly over Z in any mod-p representatives
    because the result is reduced mod p once at the end;
  * r is written as sum_k d_k 256^k with NDIG = 8 *balanced* digits
    d_k in [-128, 127] — exactly representable in int8, so 64 digit-pair
    matmuls per phase (vs 81 for the 9-digit split of unreduced values,
    vs 100 for an unsigned 7-bit split);
  * a digit-pair product plane accumulates m terms of |.| <= 128^2, so a
    plane element is |.| <= m * 16384 (exact in i32 for m <= 2^17);
  * a recombination diagonal sums <= 8 planes: |s_d| <= 8 * m * 16384
    (<= 2^27 for m <= 2^10, the largest factor _factor_logs emits);
  * the 15 diagonals are folded to 8 mod p first (2^(8d) for d >= 8 is a
    +-1 combination of byte positions < 8 by 2^64 = 2^32 - 1, 2^96 = -1),
    made non-negative by adding OFF = 2^29 (u_rho = sigma_rho + OFF
    < 2^30), recombined as  sum_rho u_rho * 2^(8 rho)  (total < 2^90)
    into three u32 limbs with carry chains, folded mod p with
    2^64 = 2^32 - 1, and the constant OFF * sum_rho 2^(8 rho) mod p is
    subtracted once at the end.

The DFT-as-matmul formulation also removes the bit-reverse permutations and
per-stage twiddle tables. For three-phase sizes the middle phase runs as a
*batched* per-k1 matmul over the natural [m1, m2, m3] layout, so no
inter-phase HBM transposes are needed: phase A contracts axis 0, phase B
contracts axis 1 (grid over k1), phase C contracts axis 2 — gridded over
the *middle* axis with each output block transposed in VMEM and written to
its natural-order position, so the order-restoring permutation costs no
separate HBM pass (reference transform semantics:
crates/sezkp-ffts/src/ntt.rs:79-177; this kernel is bit-identical to
ops/ntt.forward_ntt / inverse_ntt).

Sizes: n = m1 * m2 (two phases) or m1 * m2 * m3 (three phases), every factor
<= 2^10 so each W digit table ([9*m, m] int8) stays VMEM-resident. For
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

NDIG = 8  # balanced base-256 digits per signed representative
DIAGS = 2 * NDIG - 1
MIN_LOG2 = 14  # below this, delegate to ntt_pallas
# folded-diagonal offset: |sigma_rho| <= 3 * (8 * 2^10 * 128^2) <= 3 * 2^27 < 2^29
OFF = 1 << 29
# signed-representative threshold: values v > MAX_BAL are replaced by v - p
MAX_BAL = 127 * ((1 << 64) - 1) // 255  # 0x7F7F7F7F7F7F7F7F
_MB32 = np.uint32(0x7F7F7F7F)

# correction constant: OFF * sum_{rho=0..7} 2^(8 rho) mod p, subtracted after
# the folded recombine
_CORR = (OFF * sum(1 << (8 * d) for d in range(NDIG))) % int(G.P)
_CORR_LO = np.uint32(_CORR & 0xFFFFFFFF)
_CORR_HI = np.uint32(_CORR >> 32)

# VMEM working-set cap per tile plane: 17 diagonal planes of i32 plus the
# int8 stacks must fit comfortably; tile_elems <= 2^17 keeps that ~12 MB.
_TILE_ELEMS_LOG2 = 17

_params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _factor_logs(n_log2: int) -> list[int]:
    """Balanced factor logs, each <= 10, *smallest first* so the last factor
    m3 is as large as possible (m3 >= 128 selects the aligned-lane batched
    kernels, which avoid transposed int8 matmuls).

    MXU work scales with sum(m_i), so three balanced factors beat two from
    n = 2^18 up (measured: 0.74 ms vs 1.6 ms at 2^20 on v5e); below that the
    extra phase's recombination + HBM pass dominates."""
    k = 2 if n_log2 <= 17 else 3
    q, r = divmod(n_log2, k)
    return [q] * (k - r) + [q + 1] * r


def _balanced_digits_host(W: np.ndarray) -> list[np.ndarray]:
    """Canonical u64 array (< p) -> 8 int8 planes of the signed
    representative: r = W - p if W > MAX_BAL else W; r = sum_k d_k 256^k
    with d_k in [-128, 127] (uniqueness of the balanced rep makes the
    greedy byte+carry algorithm on the two's-complement bytes exact; the
    final carry-out encodes the sign wrap and is dropped)."""
    with np.errstate(over="ignore"):
        t = np.where(W > np.uint64(MAX_BAL), W - np.uint64(G.P), W)
    r_signed = t.astype(np.uint64).view(np.int64).copy()
    digs = []
    for _ in range(8):
        b = (t & np.uint64(255)).astype(np.int64)
        ge = b >= 128
        digs.append(np.where(ge, b - 256, b).astype(np.int8))
        t = (t >> np.uint64(8)) + ge.astype(np.uint64)
    # exactness check: sum_k d_k 256^k == signed representative
    acc = np.zeros_like(r_signed)
    for k in range(7, -1, -1):
        acc = acc * 256 + digs[k].astype(np.int64)
    assert np.array_equal(acc, r_signed), "balanced digitization not exact"
    return digs


def _digits(lo, hi):
    """In-kernel balanced base-256 digits of the signed representative of
    the canonical u64 planes (lo, hi): 8 int8 planes, d_k in [-128, 127].
    The final carry-out of the byte chain encodes the two's-complement
    sign wrap and is dropped (see _balanced_digits_host)."""
    big = (hi > _MB32) | ((hi == _MB32) & (lo > _MB32))
    slo = lo - FJ.P_LO
    borrow = (lo < FJ.P_LO).astype(jnp.uint32)
    shi = hi - FJ.P_HI - borrow
    lo = jnp.where(big, slo, lo)
    hi = jnp.where(big, shi, hi)
    bs = [((lo >> (8 * k)) & jnp.uint32(255)).astype(jnp.int32) for k in range(4)]
    bs += [((hi >> (8 * k)) & jnp.uint32(255)).astype(jnp.int32) for k in range(4)]
    digs = []
    c = jnp.zeros_like(bs[0])
    for k in range(8):
        t = bs[k] + c
        ge = (t >= 128).astype(jnp.int32)
        digs.append((t - (ge << 8)).astype(jnp.int8))
        c = ge
    return digs


def _acc_add64(acc, x):
    """64-bit accumulator (lo, hi u32) += u32 x."""
    lo, c = FJ._addc(acc[0], x)
    return lo, acc[1] + c


def _recombine(diags):
    """[s_0..s_14] i32 diagonal sums (|s_d| <= 8 m 128^2 <= 2^27 for
    m <= 2^10) -> canonical (lo, hi) of  sum_d s_d 2^(8d)  mod p.

    The 15 diagonals are first folded to 8 with the Goldilocks identities
    2^64 = 2^32 - 1 and 2^96 = -1 (so 2^(8d) for d >= 8 is +-1 times a
    byte position < 8):  2^(8(8+k)) = 2^(8(k+4)) - 2^(8k) for k = 0..3 and
    2^(8(12+k)) = -2^(8k) for k = 0..2, giving the +-1 combination below
    (round-4 change: the previous 15-diagonal path accumulated five u32
    limbs; eight folded diagonals need only three, measured ~0.7 ms less
    VPU time per phase at n = 2^24 on v5e)."""
    s = diags
    sig = [
        s[0] - s[8] - s[12],
        s[1] - s[9] - s[13],
        s[2] - s[10] - s[14],
        s[3] - s[11],
        s[4] + s[8],
        s[5] + s[9],
        s[6] + s[10],
        s[7] + s[11],
    ]
    u = [(x + jnp.int32(OFF)).astype(jnp.uint32) for x in sig]  # < 2^30
    shape = u[0].shape
    z = jnp.zeros(shape, jnp.uint32)
    # sum_rho u_rho 2^(8 rho) < 8 * 2^30 * 2^56 < 2^90: three u32 limbs
    acc = [(z, z) for _ in range(3)]
    for d, x in enumerate(u):
        q, sh = divmod(8 * d, 32)
        acc[q] = _acc_add64(acc[q], (x << sh) if sh else x)
        if sh:
            acc[q + 1] = _acc_add64(acc[q + 1], x >> (32 - sh))
    v = []
    carry = z
    for q in range(3):
        lo, c = FJ._addc(acc[q][0], carry)
        v.append(lo)
        carry = acc[q][1] + c  # acc hi small, no overflow
    # fold mod p: value = (v0, v1) + 2^64 v2 with v2 < 2^26; 2^64 = EPS
    nz2 = (v[2] != 0).astype(jnp.uint32)
    a = FJ._cond_sub_p(v[0], v[1])
    b = FJ._cond_sub_p(z - v[2], v[2] - nz2)  # v2 * EPS
    r = FJ.add(a, b)
    corr = (jnp.full(shape, _CORR_LO, jnp.uint32), jnp.full(shape, _CORR_HI, jnp.uint32))
    return FJ.sub(r, corr)


@lru_cache(maxsize=32)
def _w_digits(m_log2: int, inverse: bool, scale: int = 1):
    """DFT matrix W[k, j] = scale * w^(kj) as int8 balanced digit planes
    [NDIG*m, m].

    W is symmetric, so the same table serves axis-0 (W @ X) and axis-1
    (X @ W) phases."""
    assert m_log2 <= 10, "factor too large for the diagonal bound"
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
    return jnp.asarray(np.concatenate(_balanced_digits_host(W), axis=0))


@lru_cache(maxsize=32)
def _t_outer(l1: int, l2: int, l3: int, inverse: bool):
    """Factored phase-A twiddle for three-factor sizes.

    The monolithic table T1[k1, a2*m3+a3] = w_n^(k1*(a2*m3+a3)) is O(n) and
    gets baked into the jitted program as a constant (a 256 MB compile
    payload at n = 2^25 — over the remote-compile size limit). It factors
    exactly: T1 = TA[k1, a2] * TB[k1, a3] with TA[k1, a2] = w_n^(m3*k1*a2)
    and TB[k1, a3] = w_n^(k1*a3) — two tables of m1*m2 and m1*m3 elements.
    TB rides phase A as a periodic column twiddle ([m1, m3], the a3 pattern
    repeats every m3 columns); TA rides phase B as a per-k1 broadcast
    ([m1, m2, 1] for legal Pallas blocks)."""
    m1, m2, m3 = 1 << l1, 1 << l2, 1 << l3
    n_log2 = l1 + l2 + l3
    w = G.primitive_root_2exp(n_log2)
    if inverse:
        w = G.inv(w)
    k1 = np.arange(m1, dtype=np.int64)
    a2 = np.arange(m2, dtype=np.int64)
    a3 = np.arange(m3, dtype=np.int64)
    n_mask = (1 << n_log2) - 1  # exponents mod n (root has order n = 2^n_log2)
    wp = ntt_host.powers(w, 1 << n_log2)
    ta = wp[((m3 * k1[:, None] * a2[None, :]) & n_mask).astype(np.uint64)]
    tb = wp[((k1[:, None] * a3[None, :]) & n_mask).astype(np.uint64)]
    ta = FJ.pack(ta.reshape(m1, m2, 1))
    tb = FJ.pack(tb)  # [m1, m3]
    return ta, tb


@lru_cache(maxsize=32)
def _t_mid(m_mid_log2: int, m_last_log2: int, inverse: bool, transposed: bool):
    """Middle-phase twiddle w_r^(k2*b3) (r = m_mid*m_last), shared across
    every k1 batch. Layout [k2, b3] for the natural ("wx") middle phase, or
    [b3, k2] when transposed=True (the "xw_t" pair)."""
    m_mid, m_last = 1 << m_mid_log2, 1 << m_last_log2
    w = G.primitive_root_2exp(m_mid_log2 + m_last_log2)
    if inverse:
        w = G.inv(w)
    wp = ntt_host.powers(w, m_mid * m_last)
    k2 = np.arange(m_mid, dtype=np.uint64)
    b3 = np.arange(m_last, dtype=np.uint64)
    idx = b3[:, None] * k2[None, :] if transposed else k2[:, None] * b3[None, :]
    return FJ.pack(wp[idx])  # max index (m_mid-1)(m_last-1) < r


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _dot_digits(digs, w, m: int, axis: int):
    """All 64 digit-pair products, summed into 15 diagonal planes (i32).

    digs is the list of NDIG int8 digit planes (same shape as the value
    block) — kept separate rather than concatenated: lane-axis int8
    concatenation + i32 output slicing costs more VPU/relayout time than
    the matmuls themselves (measured 1.9 ms vs 1.5 ms of MXU per phase at
    2^24 on v5e). The j-outer loop keeps each weight slice resident across
    its NDIG products.

    mode "w_x":  planes [m, span], products W_j @ x_i        -> [m, span]
    mode "x_w":  planes [span, m], products x_i @ W_j        -> [span, m]
    mode "xT_w": planes [m, span], products x_i^T @ W_j      -> [span, m]"""
    dims = {
        "w_x": (((1,), (0,)), ((), ())),
        "x_w": (((1,), (0,)), ((), ())),
        "xT_w": (((0,), (0,)), ((), ())),
    }[axis]
    diags = [None] * DIAGS
    for j in range(NDIG):
        wj = w[j * m : (j + 1) * m, :]
        for i, xi in enumerate(digs):
            lhs, rhs = (wj, xi) if axis == "w_x" else (xi, wj)
            p = jax.lax.dot_general(
                lhs, rhs, dims, preferred_element_type=jnp.int32
            )
            d = i + j
            diags[d] = p if diags[d] is None else diags[d] + p
    return diags


def _dft_kernel(m_log2: int, tile: int, axis: int, twiddle: bool):
    """Pallas kernel body: exact DFT matmul along `axis` + optional twiddle.

    axis=0: X is [m, tile],  Y = W @ X  (digits stacked along columns).
    axis=1: X is [tile, m],  Y = X @ W  (digits stacked along rows)."""
    m = 1 << m_log2

    def kernel(alo_ref, ahi_ref, w_ref, *rest):
        if twiddle:
            tlo_ref, thi_ref, olo_ref, ohi_ref = rest
        else:
            olo_ref, ohi_ref = rest
        digs = _digits(alo_ref[:, :], ahi_ref[:, :])
        diags = _dot_digits(digs, w_ref[:, :], m, "w_x" if axis == 0 else "x_w")
        lo, hi = _recombine(diags)
        if twiddle:
            lo, hi = FJ.mul((lo, hi), (tlo_ref[:, :], thi_ref[:, :]))
        olo_ref[:, :] = lo
        ohi_ref[:, :] = hi

    return kernel


def _default_tile(m_log2: int, other: int) -> int:
    return min(other, max(128, 1 << max(_TILE_ELEMS_LOG2 - m_log2, 0)))


def _dft_call(m_log2: int, other: int, axis: int, w, t=None, tile=None, t_period=None):
    """pallas_call wrapper: DFT along `axis` of a 2-D u32-plane pair.

    axis=0: array [m, other], grid over column tiles; t full-size [m, other]
            unless t_period is given — then t is [m, t_period] and the
            twiddle pattern repeats every t_period columns (host-tiled to
            one tile when tile >= t_period, else a modular block map).
    axis=1: array [other, m], grid over row tiles."""
    m = 1 << m_log2
    interp = _interpret()
    if tile is None:
        tile = _default_tile(m_log2, other)
    grid = other // tile
    kernel = _dft_kernel(m_log2, tile, axis, t is not None)

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
        if t_period is not None:
            assert axis == 0
            if tile >= t_period:
                assert tile % t_period == 0
                reps = tile // t_period
                t = (jnp.tile(t[0], (1, reps)), jnp.tile(t[1], (1, reps)))
                t_spec = pl.BlockSpec((m, tile), lambda i: (0, 0))
            else:
                assert t_period % tile == 0
                period_blocks = t_period // tile
                t_spec = pl.BlockSpec((m, tile), lambda i: (0, i % period_blocks))
            in_specs += [t_spec, t_spec]
        else:
            in_specs += [data_spec, data_spec]
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


def _batched_kernel(mc_log2: int, cols: int, twiddle: bool, mode: str, pre: bool = False):
    """Batched-phase body: one k1 batch of a 3-D layout, no HBM transposes.

    mode="wx": contract the block's *leading* axis via Y = W @ X with X
      digits stacked along lanes ([mc, NDIG*cols]); natural [mc, cols]
      output. Digit-block slices land on the lane axis at multiples of
      `cols` — requires cols >= 128 (Mosaic mis-lowers sub-tile lane
      slices, observed on v5e).
    mode="xw_t": contract the leading axis via dot_general(((0,), (0,)))
      (x^T @ W) — digit slices land on the sublane axis, output block
      transposed to [cols, mc]. Works at any size; ~1.3x slower (the
      transposed int8 operand costs an in-VMEM shuffle). Chaining two of
      these cancels the transposition.
    mode="xw_last": contract the block's *last* axis via X @ W with digits
      stacked along sublanes ([NDIG*rows, mc]); natural output, any size."""
    mc = 1 << mc_log2

    def kernel(alo_ref, ahi_ref, w_ref, *rest):
        rest = list(rest)
        if pre:
            talo_ref, tahi_ref = rest[:2]
            rest = rest[2:]
        if twiddle:
            tlo_ref, thi_ref = rest[:2]
            rest = rest[2:]
        olo_ref, ohi_ref = rest
        a_lo = alo_ref[0, :, :]
        a_hi = ahi_ref[0, :, :]
        if pre:
            # TA half of the factored phase-A twiddle: x *= TA[k1, a2]
            # (broadcast [mc, 1] over the [mc, cols] block; the TB half is
            # a periodic column twiddle inside phase A itself)
            a_lo, a_hi = FJ.mul(
                (a_lo, a_hi), (talo_ref[0, :, :], tahi_ref[0, :, :])
            )
        digs = _digits(a_lo, a_hi)
        dotmode = {"wx": "w_x", "xw_t": "xT_w", "xw_last": "x_w"}[mode]
        diags = _dot_digits(digs, w_ref[:, :], mc, dotmode)
        lo, hi = _recombine(diags)
        if twiddle:
            lo, hi = FJ.mul((lo, hi), (tlo_ref[:, :], thi_ref[:, :]))
        olo_ref[0, :, :] = lo
        ohi_ref[0, :, :] = hi

    return kernel


def _batched_call(
    m1: int, mc_log2: int, cols: int, w, t=None, mode: str = "xw_t", pre=None
):
    """Batched DFT on a [m1, ., .] 3-D layout: grid over k1.

    mode="wx":      [m1, mc, cols] -> [m1, mc, cols] (contract leading axis)
    mode="xw_t":    [m1, mc, cols] -> [m1, cols, mc] (contract leading axis,
                    blocks transposed)
    mode="xw_last": [m1, rows=cols, mc] -> same shape (contract last axis)

    pre: optional factored input twiddle ta from _t_outer ([m1, mc, 1]);
    each k1 block of the input is multiplied by TA[k1, :, None] before the
    DFT."""
    mc = 1 << mc_log2
    interp = _interpret()
    if mode == "xw_last":
        in_shape = out_shape = (cols, mc)
    elif mode == "wx":
        in_shape = out_shape = (mc, cols)
    else:
        in_shape, out_shape = (mc, cols), (cols, mc)
    in_spec = pl.BlockSpec((1,) + in_shape, lambda i: (i, 0, 0))
    out_spec = pl.BlockSpec((1,) + out_shape, lambda i: (i, 0, 0))
    w_spec = pl.BlockSpec(tuple(w.shape), lambda i: (0, 0))
    in_specs = [in_spec, in_spec, w_spec]
    operands = [w]
    if pre is not None:
        talo, tahi = pre
        ta_spec = pl.BlockSpec((1, in_shape[0], 1), lambda i: (i, 0, 0))
        in_specs += [ta_spec, ta_spec]
        operands += [talo, tahi]
    if t is not None:
        t_spec = pl.BlockSpec(out_shape, lambda i: (0, 0))
        in_specs += [t_spec, t_spec]
        operands += [t[0], t[1]]
    f = pl.pallas_call(
        _batched_kernel(mc_log2, cols, t is not None, mode, pre is not None),
        grid=(m1,),
        in_specs=in_specs,
        out_specs=[out_spec, out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((m1,) + out_shape, jnp.uint32),
            jax.ShapeDtypeStruct((m1,) + out_shape, jnp.uint32),
        ],
        interpret=interp,
        compiler_params=None if interp else _params,
    )

    def apply(lo, hi):
        return f(lo, hi, *operands)

    return apply


def _last_call_t(m2: int, mc_log2: int, cols: int, w, bk2: int | None = None):
    """Final DFT phase with a fused natural-order write.

    Input (2-D view) [cols, m2*mc] = X[k1, (k2, b3)], gridded over groups
    of bk2 middle indices k2; each k2 slice contracts the last axis
    (X @ W, digits stacked along sublanes) and its [mc, cols] VMEM
    transpose lands in the output [mc, m2*cols] = Y[k3, (k2, k1)] — whose
    flat order is exactly the natural y[k1 + m1*k2 + m1*m2*k3], so the
    order-restoring permutation costs no separate HBM pass. Both block
    shapes slice the lane axis at multiples of mc/cols >= 128 (Mosaic's
    lane-tile requirement)."""
    mc = 1 << mc_log2
    interp = _interpret()
    if bk2 is None:
        # group size bounded by VMEM: the in/out blocks are
        # [cols, bk2*mc] / [mc, bk2*cols] u32 pairs and the per-slice
        # diagonal planes are 15 x [cols, mc] i32 — at m=512 (n=2^27)
        # bk2=16 exceeds the 128 MB VMEM budget (measured compile OOM)
        bk2 = min(16, max(1, (1 << 20) // (cols * mc)))
    bk2 = min(bk2, m2)
    grid = m2 // bk2

    def kernel(alo_ref, ahi_ref, w_ref, olo_ref, ohi_ref):
        w = w_ref[:, :]
        parts = []
        for j2 in range(bk2):
            a_lo = alo_ref[:, j2 * mc : (j2 + 1) * mc]
            a_hi = ahi_ref[:, j2 * mc : (j2 + 1) * mc]
            digs = _digits(a_lo, a_hi)
            diags = _dot_digits(digs, w, mc, "x_w")
            lo, hi = _recombine(diags)
            if cols >= 128:
                # lane-aligned per-slice writes
                olo_ref[:, j2 * cols : (j2 + 1) * cols] = lo.T
                ohi_ref[:, j2 * cols : (j2 + 1) * cols] = hi.T
            else:
                # cols < 128: sub-lane-tile stores mis-lower on v5e; buffer
                # the slices and store the concatenated full block once
                parts.append((lo.T, hi.T))
        if parts:
            olo_ref[:, :] = jnp.concatenate([p[0] for p in parts], axis=1)
            ohi_ref[:, :] = jnp.concatenate([p[1] for p in parts], axis=1)

    in_spec = pl.BlockSpec((cols, bk2 * mc), lambda i: (0, i))
    out_spec = pl.BlockSpec((mc, bk2 * cols), lambda i: (0, i))
    w_spec = pl.BlockSpec(tuple(w.shape), lambda i: (0, 0))
    f = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[in_spec, in_spec, w_spec],
        out_specs=[out_spec, out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((mc, m2 * cols), jnp.uint32),
            jax.ShapeDtypeStruct((mc, m2 * cols), jnp.uint32),
        ],
        interpret=interp,
        compiler_params=None if interp else _params,
    )

    def apply(lo, hi):
        return f(lo.reshape(cols, m2 * mc), hi.reshape(cols, m2 * mc), w)

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
    # phase-A twiddle in factored form: the monolithic O(n) table would be
    # a program constant that blows the remote-compile payload past its
    # size limit at n >= 2^25. TB ([m1, m3], periodic in columns) rides
    # phase A; TA ([m1, m2, 1]) rides phase B as a per-k1 broadcast.
    ta, tb = _t_outer(l1, l2, l3, inverse)
    phase_a = _dft_call(l1, m2 * m3, 0, _w_digits(l1, inverse), t=tb, t_period=m3)
    w2, w3 = _w_digits(l2, inverse), _w_digits(l3, inverse, inv_n)
    if m3 >= 128:
        # fast aligned pair: natural layouts throughout
        # [k1, a2, b3] -> [k1, k2, b3] (contract middle axis, W @ X)
        phase_b = _batched_call(
            m1, l2, m3, w2, _t_mid(l2, l3, inverse, False), mode="wx", pre=ta
        )
        # [k1, k2, b3] -> [k3, k2, k1] (contract last axis, X @ W, output
        # blocks transposed in VMEM to natural order — no HBM transpose)
        phase_c = _last_call_t(m2, l3, m1, w3)

        def f(lo_flat, hi_flat):
            lo = lo_flat.reshape(m1, m2 * m3)
            hi = hi_flat.reshape(m1, m2 * m3)
            lo, hi = phase_a(lo, hi)
            lo, hi = phase_b(lo.reshape(m1, m2, m3), hi.reshape(m1, m2, m3))
            lo, hi = phase_c(lo, hi)
            # output [m3, m2, m1] = Y[k3, k2, k1]; flat IS natural order
            return lo.reshape(n), hi.reshape(n)

        return jax.jit(f)

    # small-m3 pair: transposed contractions (sublane-only slicing)
    # [k1, a2, b3] -> [k1, b3, k2] -> [k1, k2, k3] (transposition cancels)
    phase_b = _batched_call(
        m1, l2, m3, w2, _t_mid(l2, l3, inverse, True), mode="xw_t", pre=ta
    )
    phase_c = _batched_call(m1, l3, m2, w3, mode="xw_t")

    def f(lo_flat, hi_flat):
        lo = lo_flat.reshape(m1, m2 * m3)
        hi = hi_flat.reshape(m1, m2 * m3)
        lo, hi = phase_a(lo, hi)
        lo, hi = phase_b(lo.reshape(m1, m2, m3), hi.reshape(m1, m2, m3))
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
