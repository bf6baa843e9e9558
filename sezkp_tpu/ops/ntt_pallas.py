"""Pallas four-step NTT for Goldilocks on TPU.

The stage-by-stage XLA NTT (ops/ntt_jax.py) makes ~2 full HBM passes per
butterfly stage (log n passes total). This kernel restructures the transform
as the classic four-step decomposition n = n1 * n2:

  phase A (one pallas_call, grid over column tiles):
      load A[:, tile] into VMEM -> all log2(n1) butterfly stages in VMEM ->
      multiply by the inter-phase twiddles w^(j2*k1) -> write back
  phase B (one pallas_call, grid over row tiles):
      load [tile, n2] -> all log2(n2) stages in VMEM -> write back

Total HBM traffic: a handful of passes, independent of log n. Outputs are
bit-identical to ops/ntt.forward_ntt / inverse_ntt (cross-tested).

Mosaic constraints shape the kernel body: no multi-dim reshapes, no strided
slices, no gathers. Each butterfly stage is therefore expressed with
`pltpu.roll` (partner exchange), an iota mask (block halves), and
per-position twiddle ROWS precomputed on host (row s holds
w_m^((i & (2^(s-1)-1)) * 2^(L-s)) for every position i). The bit-reverse
permutation runs as an XLA gather outside the kernels.
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

# Tile sizes (lanes = 128 wide; sublanes sized to fit VMEM comfortably).
TILE_COLS = 128
TILE_ROWS = 64


def _roll(x, shift: int, axis: int, interpret: bool):
    if interpret:
        return jnp.roll(x, shift, axis=axis)
    # pltpu.roll requires a non-negative shift; rolling by -s == rolling by m-s.
    m = x.shape[axis]
    return pltpu.roll(x, shift % m, axis=axis)


def _stages_roll(lo, hi, wlo, whi, n_log2: int, axis: int, interpret: bool):
    """All butterfly stages along `axis` of a 2-D tile (bit-reversed input).

    wlo/whi: per-position twiddle tables shaped [n_log2, m] for axis=1 or
    [m, n_log2] for axis=0 (m = transform length)."""
    m = lo.shape[axis]
    assert m == 1 << n_log2
    pos = jax.lax.broadcasted_iota(jnp.uint32, lo.shape, axis)
    for s in range(1, n_log2 + 1):
        half = 1 << (s - 1)
        mask = (pos & np.uint32(half)) == 0
        xl_lo = _roll(lo, half, axis, interpret)
        xl_hi = _roll(hi, half, axis, interpret)
        xr_lo = _roll(lo, -half, axis, interpret)
        xr_hi = _roll(hi, -half, axis, interpret)
        u = (jnp.where(mask, lo, xl_lo), jnp.where(mask, hi, xl_hi))
        v = (jnp.where(mask, xr_lo, lo), jnp.where(mask, xr_hi, hi))
        if axis == 1:
            wl = wlo[s - 1 : s, :]  # [1, m] broadcasts over rows
            wh = whi[s - 1 : s, :]
        else:
            wl = wlo[:, s - 1 : s]  # [m, 1] broadcasts over cols
            wh = whi[:, s - 1 : s]
        wv = FJ.mul(v, (wl, wh))
        add = FJ.add(u, wv)
        sub = FJ.sub(u, wv)
        lo = jnp.where(mask, add[0], sub[0])
        hi = jnp.where(mask, add[1], sub[1])
    return lo, hi


def _position_tables(m_log2: int, inverse: bool) -> np.ndarray:
    """u64 [m_log2, m]: row s-1 holds w_m^((i & (half-1)) * 2^(L-s))."""
    m = 1 << m_log2
    w = G.primitive_root_2exp(m_log2)
    if inverse:
        w = G.inv(w)
    wp = ntt_host.powers(w, max(m // 2, 1))
    out = np.zeros((max(m_log2, 1), m), dtype=np.uint64)
    i = np.arange(m)
    for s in range(1, m_log2 + 1):
        half = 1 << (s - 1)
        step = 1 << (m_log2 - s)
        out[s - 1] = wp[(i & (half - 1)) * step]
    return out


@lru_cache(maxsize=16)
def _twiddle_matrix(n1_log2: int, n2_log2: int, inverse: bool):
    """T[k1, j2] = w_n^(k1*j2) as packed u32 planes [n1, n2]."""
    n1, n2 = 1 << n1_log2, 1 << n2_log2
    n_log2 = n1_log2 + n2_log2
    w = G.primitive_root_2exp(n_log2)
    if inverse:
        w = G.inv(w)
    wp = ntt_host.powers(w, 1 << n_log2)
    k1 = np.arange(n1, dtype=np.uint64)[:, None]
    j2 = np.arange(n2, dtype=np.uint64)[None, :]
    idx = (k1 * j2) & np.uint64((1 << n_log2) - 1)
    return FJ.pack(wp[idx])


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


@lru_cache(maxsize=16)
def _build(n1_log2: int, n2_log2: int, inverse: bool):
    n1, n2 = 1 << n1_log2, 1 << n2_log2
    n = n1 * n2
    tc = min(TILE_COLS, n2)
    # Keep each tile plane <= ~2^17 elements so the kernel working set
    # (inputs + outputs + butterfly temporaries, double-buffered) fits VMEM.
    tr = max(8, min(TILE_ROWS, (1 << 17) // n2)) if n2 > 0 else TILE_ROWS
    tr = min(tr, n1)
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    # phase A transforms along axis 0 -> [m, L] column tables
    w1 = FJ.pack(np.ascontiguousarray(_position_tables(n1_log2, inverse).T))
    # phase B transforms along axis 1 -> [L, m] row tables
    w2 = FJ.pack(_position_tables(n2_log2, inverse))
    tmat = _twiddle_matrix(n1_log2, n2_log2, inverse)
    inv_n = FJ.pack(np.uint64(G.inv(n))) if inverse else None
    interp = _interpret()

    def phase_a_kernel(alo, ahi, wlo, whi, tlo, thi, olo, ohi):
        lo, hi = _stages_roll(
            alo[:, :], ahi[:, :], wlo[:, :], whi[:, :], n1_log2, 0, interp
        )
        lo, hi = FJ.mul((lo, hi), (tlo[:, :], thi[:, :]))
        olo[:, :] = lo
        ohi[:, :] = hi

    def phase_b_kernel(alo, ahi, wlo, whi, olo, ohi):
        lo, hi = _stages_roll(
            alo[:, :], ahi[:, :], wlo[:, :], whi[:, :], n2_log2, 1, interp
        )
        olo[:, :] = lo
        ohi[:, :] = hi

    col_spec = pl.BlockSpec((n1, tc), lambda i: (0, i))
    row_spec = pl.BlockSpec((tr, n2), lambda i: (i, 0))
    w1_spec = pl.BlockSpec((n1, max(n1_log2, 1)), lambda i: (0, 0))
    w2_spec = pl.BlockSpec((max(n2_log2, 1), n2), lambda i: (0, 0))

    perm1 = jnp.asarray(ntt_host.bitrev_permutation(n1))
    perm2 = jnp.asarray(ntt_host.bitrev_permutation(n2))

    def f(lo_flat, hi_flat):
        # bit-reverse permutations run as XLA gathers outside the kernels
        alo = lo_flat.reshape(n1, n2)[perm1, :]
        ahi = hi_flat.reshape(n1, n2)[perm1, :]
        blo, bhi = pl.pallas_call(
            phase_a_kernel,
            grid=(n2 // tc,),
            in_specs=[col_spec, col_spec, w1_spec, w1_spec, col_spec, col_spec],
            out_specs=[col_spec, col_spec],
            out_shape=[
                jax.ShapeDtypeStruct((n1, n2), jnp.uint32),
                jax.ShapeDtypeStruct((n1, n2), jnp.uint32),
            ],
            interpret=interp,
            compiler_params=None if interp else params,
        )(alo, ahi, w1[0], w1[1], tmat[0], tmat[1])

        blo = blo[:, perm2]
        bhi = bhi[:, perm2]
        ylo, yhi = pl.pallas_call(
            phase_b_kernel,
            grid=(n1 // tr,),
            in_specs=[row_spec, row_spec, w2_spec, w2_spec],
            out_specs=[row_spec, row_spec],
            out_shape=[
                jax.ShapeDtypeStruct((n1, n2), jnp.uint32),
                jax.ShapeDtypeStruct((n1, n2), jnp.uint32),
            ],
            interpret=interp,
            compiler_params=None if interp else params,
        )(blo, bhi, w2[0], w2[1])

        # natural order: y[k1 + n1*k2] = Y[k1, k2]
        out_lo = ylo.T.reshape(n)
        out_hi = yhi.T.reshape(n)
        if inverse:
            out_lo, out_hi = FJ.mul((out_lo, out_hi), (inv_n[0], inv_n[1]))
        return out_lo, out_hi

    return jax.jit(f)


def forward_ntt(a: FJ.F2, n1_log2: int | None = None) -> FJ.F2:
    n = int(a[0].shape[0])
    n_log2 = n.bit_length() - 1
    assert 1 << n_log2 == n
    if n1_log2 is None:
        n1_log2 = min(10, n_log2 // 2)
    return _build(n1_log2, n_log2 - n1_log2, False)(a[0], a[1])


def inverse_ntt(a: FJ.F2, n1_log2: int | None = None) -> FJ.F2:
    n = int(a[0].shape[0])
    n_log2 = n.bit_length() - 1
    assert 1 << n_log2 == n
    if n1_log2 is None:
        n1_log2 = min(10, n_log2 // 2)
    return _build(n1_log2, n_log2 - n1_log2, True)(a[0], a[1])


def forward_ntt_u64(a: np.ndarray) -> np.ndarray:
    return FJ.unpack(forward_ntt(FJ.pack(np.asarray(a, dtype=np.uint64))))


def inverse_ntt_u64(a: np.ndarray) -> np.ndarray:
    return FJ.unpack(inverse_ntt(FJ.pack(np.asarray(a, dtype=np.uint64))))


# ---------------------- fused DEEP coset LDE (Pallas NTTs) ------------------


def _fwd(a: FJ.F2) -> FJ.F2:
    """Size-dispatched forward NTT: MXU int8-matmul kernel for large n
    (bit-identical outputs), roll-based four-step otherwise."""
    from . import ntt_mxu

    n = int(a[0].shape[0])
    if n >= (1 << ntt_mxu.MIN_LOG2):
        return ntt_mxu.forward_ntt(a)
    return forward_ntt(a)


def _inv(a: FJ.F2) -> FJ.F2:
    from . import ntt_mxu

    n = int(a[0].shape[0])
    if n >= (1 << ntt_mxu.MIN_LOG2):
        return ntt_mxu.inverse_ntt(a)
    return inverse_ntt(a)


@lru_cache(maxsize=8)
def _deep_lde_tables(base_log2: int, lde_log2: int, shift: int):
    """Device tables for the DEEP-LDE glue (shift powers and coset points).

    Kept OUT of the jitted programs' closures: a closed-over device array is
    baked into the compile payload as a constant, and the [lde_n] coset
    table alone is 256 MB at lde_n = 2^25 — past the remote-compile size
    limit. As jit *arguments* they cost nothing."""
    n_base = 1 << base_log2
    lde_n = 1 << lde_log2
    shift_pows = FJ.pack(ntt_host.powers(shift, n_base))
    xs = FJ.pack(
        G.mul(np.uint64(shift), ntt_host.powers(G.primitive_root_2exp(lde_log2), lde_n))
    )
    return (
        (jnp.asarray(shift_pows[0]), jnp.asarray(shift_pows[1])),
        (jnp.asarray(xs[0]), jnp.asarray(xs[1])),
    )


@lru_cache(maxsize=8)
def _deep_lde_glue(base_log2: int, lde_log2: int, shift: int):
    """Coset scale + zero-pad + DEEP divide around the two Pallas NTTs."""
    n_base = 1 << base_log2
    lde_n = 1 << lde_log2
    shift_pows, xs = _deep_lde_tables(base_log2, lde_log2, shift)

    @jax.jit
    def scale_pad_(clo, chi, splo, sphi):
        s = FJ.mul((clo, chi), (splo, sphi))
        return (
            jnp.zeros(lde_n, jnp.uint32).at[:n_base].set(s[0]),
            jnp.zeros(lde_n, jnp.uint32).at[:n_base].set(s[1]),
        )

    @jax.jit
    def deep_divide_(ylo, yhi, z_lo, z_hi, xslo, xshi):
        from . import ntt_jax

        denom = FJ.sub(
            (xslo, xshi),
            (jnp.broadcast_to(z_lo, (lde_n,)), jnp.broadcast_to(z_hi, (lde_n,))),
        )
        return FJ.mul((ylo, yhi), ntt_jax._pow_p_minus_2(denom))

    def scale_pad(clo, chi):
        return scale_pad_(clo, chi, shift_pows[0], shift_pows[1])

    def deep_divide(ylo, yhi, z_lo, z_hi):
        return deep_divide_(ylo, yhi, z_lo, z_hi, xs[0], xs[1])

    return scale_pad, deep_divide


def deep_coset_lde_u64(
    base_evals: np.ndarray, blow_log2: int, shift: int, z: int
) -> np.ndarray:
    """DEEP coset LDE with Pallas NTT phases; bit-identical to
    ops/ntt_jax.deep_coset_lde_u64 (reference pipeline lde.rs:42-97)."""
    n_base = len(base_evals)
    base_log2 = n_base.bit_length() - 1
    assert 1 << base_log2 == n_base
    lde_log2 = base_log2 + blow_log2
    b = FJ.pack(np.asarray(base_evals, dtype=np.uint64))
    coeffs = _inv((jnp.asarray(b[0]), jnp.asarray(b[1])))
    scale_pad, deep_divide = _deep_lde_glue(base_log2, lde_log2, shift)
    padded = scale_pad(coeffs[0], coeffs[1])
    y = _fwd(padded)
    zp = FJ.pack(np.uint64(z))
    out = deep_divide(y[0], y[1], zp[0], zp[1])
    return FJ.unpack((np.asarray(out[0]), np.asarray(out[1])))


def deep_coset_lde_planes(base_planes, blow_log2: int, shift: int, z: int):
    """DEEP coset LDE on device-resident (lo, hi) planes; returns device
    planes (no host round-trip). Bit-identical to deep_coset_lde_u64."""
    lo, hi = base_planes
    n_base = int(lo.shape[0])
    base_log2 = n_base.bit_length() - 1
    assert 1 << base_log2 == n_base
    lde_log2 = base_log2 + blow_log2
    coeffs = _inv((lo, hi))
    scale_pad, deep_divide = _deep_lde_glue(base_log2, lde_log2, shift)
    padded = scale_pad(coeffs[0], coeffs[1])
    y = _fwd(padded)
    zp = FJ.pack(np.uint64(z))
    return deep_divide(y[0], y[1], zp[0], zp[1])
