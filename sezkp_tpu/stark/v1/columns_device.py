"""Device-side column derivation + AIR composition.

Pushes only the raw movement logs (~(2+2*tau) bytes/row) and per-block
constants to the TPU and derives every committed column there (heads are
per-block cumsums, offsets are gathered block constants), then evaluates the
full AIR composition vectorized — eliminating the 8*n*n_cols bytes of
host->device column traffic. Bit-identical to columns.TraceColumns.build +
air.compose_all_rows (cross-tested).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Sequence, Tuple

import numpy as np

from ...ops import goldilocks as G
from .air import Alphas
from .columns import TraceColumns, all_labels


def _host_inputs(blocks) -> dict:
    """Pack movement logs + block structure into small host arrays."""
    n = sum(b.n_steps for b in blocks)
    tau = blocks[0].tau if blocks else 0
    nb = len(blocks)
    input_mv = np.concatenate([b.movement_log.input_mv for b in blocks])
    tape_mv = np.concatenate([b.movement_log.tape_mv for b in blocks])  # [n, tau]
    wflag = np.concatenate([b.movement_log.write_flag for b in blocks])
    wsym = np.concatenate([b.movement_log.write_sym for b in blocks])

    block_of = np.empty(n, dtype=np.int32)
    is_first = np.zeros(n, dtype=np.uint8)
    is_last = np.zeros(n, dtype=np.uint8)
    block_start = np.empty(nb, dtype=np.int32)
    row = 0
    for i, b in enumerate(blocks):
        ln = b.n_steps
        block_of[row : row + ln] = i
        block_start[i] = row
        if ln:
            is_first[row] = 1
            is_last[row + ln - 1] = 1
        row += ln

    # one stacked conversion instead of three per-block astype loops
    # (the per-block form was ~0.5 s of measured host-serial time at 2^22)
    wins = np.stack([b.windows for b in blocks])  # [nb, tau, 2] int64
    win_len = (np.abs(wins[:, :, 1] - wins[:, :, 0]) + 1).astype(np.uint64)
    in_off = np.stack([b.head_in_offsets for b in blocks]).astype(np.uint64)
    out_off = np.stack([b.head_out_offsets for b in blocks]).astype(np.uint64)
    return dict(
        n=n,
        tau=tau,
        input_mv=input_mv,
        tape_mv=tape_mv,
        wflag=wflag,
        wsym=wsym,
        block_of=block_of,
        block_start=block_start,
        is_first=is_first,
        is_last=is_last,
        win_len=win_len,
        in_off=in_off,
        out_off=out_off,
    )


_P_HI = np.uint32(0xFFFFFFFF)


def _from_i64_small(x32_signed):
    """int32 values in (-2^31, 2^31) -> field (rem_euclid semantics).

    Negative x maps to p - |x| with p = (lo=1, hi=0xFFFFFFFF):
    lo = 1 - |x| (wrapping), hi = 0xFFFFFFFF - borrow."""
    import jax.numpy as jnp

    x = x32_signed
    neg = x < 0
    mag = jnp.where(neg, -x, x).astype(jnp.uint32)
    lo_neg = np.uint32(1) - mag  # wraps when mag > 1
    hi_neg = jnp.where(mag > 1, _P_HI - 1, _P_HI)
    return (
        jnp.where(neg, lo_neg, mag),
        jnp.where(neg, hi_neg, np.uint32(0)),
    )


def _unpack_logs(pk):
    """Packed u8 movement-log plane -> (tape_mv i8, wflag u8, wsym u16).

    Layout: bits 0-1 = tape_mv + 1, bit 2 = write_flag, bits 3-6 =
    write_sym. Packing at the host->device boundary quarters the raw-log
    upload (2+2*tau B/row -> 2+tau B/row at tau=8); the unpack runs once
    on device and feeds the unchanged traced derivations."""
    import jax.numpy as jnp

    tmv = ((pk & np.uint8(3)).astype(jnp.int32) - 1).astype(jnp.int8)
    wfl = (pk >> 2) & np.uint8(1)
    wsy = ((pk >> 3) & np.uint8(15)).astype(jnp.uint16)
    return tmv, wfl, wsy


def pack_logs(tape_mv_t: np.ndarray, wflag_t: np.ndarray,
              wsym_t: np.ndarray) -> np.ndarray:
    """[tau, n] host arrays -> packed u8 [tau, n] (see _unpack_logs)."""
    return (
        (tape_mv_t.astype(np.int16) + 1).astype(np.uint8)
        | (wflag_t.astype(np.uint8) << 2)
        | (wsym_t.astype(np.uint8) << 3)
    )


@lru_cache(maxsize=8)
def _jit_columns_packed(n: int, tau: int, nb: int):
    import jax

    inner = _jit_columns(n, tau, nb)

    def f(input_mv, pk, block_of, block_start, is_first, is_last,
          win_len, in_off, out_off):
        tmv, wfl, wsy = _unpack_logs(pk)
        return inner(input_mv, tmv, wfl, wsy, block_of, block_start,
                     is_first, is_last, win_len, in_off, out_off)

    return jax.jit(f)


@lru_cache(maxsize=8)
def _jit_columns(n: int, tau: int, nb: int):
    import jax
    import jax.numpy as jnp

    from ...ops import goldilocks_jax as FJ

    from_i64_small = _from_i64_small

    def f(input_mv, tape_mv, wflag, wsym, block_of, block_start, is_first, is_last,
          win_len, in_off, out_off):
        # shapes: input_mv i8 [n]; tape_mv i8 [tau, n]; wflag u8; wsym u16
        # block_of i32 [n]; block_start i32 [nb]; win/in/out u32 [tau, nb]
        # (lo only). Per-tape arrays are [tau, n] — tau in the *sublane*
        # axis, n in lanes — so every elementwise/cumsum op runs at full
        # lane width (a [n, tau=8] layout wastes 120/128 lanes and made
        # this program ~10x slower).
        cols_lo = []
        cols_hi = []

        imv = from_i64_small(input_mv.astype(jnp.int32))
        cols_lo.append(imv[0]); cols_hi.append(imv[1])
        cols_lo.append(is_first.astype(jnp.uint32)); cols_hi.append(jnp.zeros(n, jnp.uint32))
        cols_lo.append(is_last.astype(jnp.uint32)); cols_hi.append(jnp.zeros(n, jnp.uint32))

        tmv32 = tape_mv.astype(jnp.int32)  # [tau, n]
        # heads: global cumsum minus cumsum at block entry, anchored at
        # window-left (entry = off_in; see columns.py for the deliberate
        # deviation from the reference's entry-anchored heads).
        # The cumsum runs on the [tau, n] slab (full lane width); everything
        # downstream is a per-tape 1-D [n] op — 2-D [tau, n] gathers/selects
        # trip XLA into transposed {0,1} layouts with 16-128x tile padding
        # (observed OOM at n = 2^22).
        csum = jnp.cumsum(tmv32, axis=1)  # [tau, n] (n < 2^31 safe)

        zero_hi = jnp.zeros(n, jnp.uint32)
        per_tape = {"mv": [], "wflag": [], "wsym": [], "head": [], "winlen": [],
                    "in_off": [], "out_off": []}
        for r in range(tau):
            csum_r = csum[r]
            start_csum_r = (
                jnp.concatenate(
                    [jnp.zeros((1,), jnp.int32), csum_r[block_start[1:] - 1]]
                )
                if nb > 1
                else jnp.zeros((1,), jnp.int32)
            )  # [nb]
            head_rel_r = (
                csum_r - start_csum_r[block_of]
                + in_off[r].astype(jnp.int32)[block_of]
            )  # [n]
            per_tape["mv"].append(from_i64_small(tmv32[r]))
            per_tape["wflag"].append((wflag[r].astype(jnp.uint32), zero_hi))
            per_tape["wsym"].append((wsym[r].astype(jnp.uint32), zero_hi))
            per_tape["head"].append(from_i64_small(head_rel_r))
            per_tape["winlen"].append((win_len[r][block_of], zero_hi))
            per_tape["in_off"].append((in_off[r][block_of], zero_hi))
            per_tape["out_off"].append((out_off[r][block_of], zero_hi))
        for name in ("mv", "wflag", "wsym", "head", "winlen", "in_off", "out_off"):
            for r in range(tau):
                cols_lo.append(per_tape[name][r][0])
                cols_hi.append(per_tape[name][r][1])
        return jnp.stack(cols_lo), jnp.stack(cols_hi)

    return jax.jit(f)


# Granularity of the precomputed cumsum carries: derive_ranges() starts must
# be multiples of this (== params.COL_CHUNK_LOG2, the opening chunk size).
CARRY_GRAN_LOG2 = 10
from . import params as _params  # noqa: E402

assert CARRY_GRAN_LOG2 == _params.COL_CHUNK_LOG2, (
    "carry granularity must match the opening chunk size"
)


def derive_cols_core(imv, tmv, wfl, wsy, bo, isf, isl,
                     win_len, in_off, out_off, anchor, carry_start):
    """Traced core: derive the [C, L] column limb planes for one contiguous
    row range directly from raw movement logs.

    imv i8 [L]; tmv i8 [tau, L]; wfl u8 [tau, L]; wsy u16 [tau, L];
    bo i32 [L] global block index per row; isf/isl u8 [L];
    win_len/in_off/out_off u32 [tau, nb] (global, replicated);
    anchor i32 [tau, nb] exclusive tape-mv csum at each block start;
    carry_start i32 [tau] exclusive csum at the range start.

    Shared by the openings range-derivation (`_jit_derive_ranges`) and the
    mesh-sharded prover (parallel/prove_sharded.py), so the column
    semantics cannot drift between them. Bit-identical to slices of
    `_jit_columns` output (cross-tested)."""
    import jax.numpy as jnp

    tau = tmv.shape[0]
    L = tmv.shape[1]
    tmv32 = tmv.astype(jnp.int32)
    g = jnp.cumsum(tmv32, axis=1) + carry_start[:, None]

    cols_lo = []
    cols_hi = []
    zero_hi = jnp.zeros(L, jnp.uint32)
    e = _from_i64_small(imv.astype(jnp.int32))
    cols_lo.append(e[0]); cols_hi.append(e[1])
    cols_lo.append(isf.astype(jnp.uint32)); cols_hi.append(zero_hi)
    cols_lo.append(isl.astype(jnp.uint32)); cols_hi.append(zero_hi)

    per_tape = {k: [] for k in
                ("mv", "wflag", "wsym", "head", "winlen", "in_off", "out_off")}
    for r in range(tau):
        head_rel_r = (
            g[r] - anchor[r, bo] + in_off[r, bo].astype(jnp.int32)
        )
        per_tape["mv"].append(_from_i64_small(tmv32[r]))
        per_tape["wflag"].append((wfl[r].astype(jnp.uint32), zero_hi))
        per_tape["wsym"].append((wsy[r].astype(jnp.uint32), zero_hi))
        per_tape["head"].append(_from_i64_small(head_rel_r))
        per_tape["winlen"].append((win_len[r, bo], zero_hi))
        per_tape["in_off"].append((in_off[r, bo], zero_hi))
        per_tape["out_off"].append((out_off[r, bo], zero_hi))
    for name in ("mv", "wflag", "wsym", "head", "winlen", "in_off", "out_off"):
        for r in range(tau):
            cols_lo.append(per_tape[name][r][0])
            cols_hi.append(per_tape[name][r][1])
    return jnp.stack(cols_lo), jnp.stack(cols_hi)


@lru_cache(maxsize=8)
def _jit_derive_ranges(L: int, tau: int, nb: int, n_ranges: int,
                       packed: bool = False):
    """[S] range starts -> [S, C, L] column limb planes, derived directly
    from the resident raw inputs + precomputed per-block/per-chunk cumsum
    anchors. Bit-identical to slices of the full _jit_columns planes
    (cross-tested) — this is what lets the openings phase avoid
    rematerializing the ~8 GB planes at T >= 2^24."""
    import jax
    import jax.numpy as jnp

    from_i64_small = _from_i64_small

    def f(starts, input_mv, tape_mv, wflag, wsym, block_of, is_first, is_last,
          win_len, in_off, out_off, anchor, carry):
        # starts i32 [S] (multiples of 2^CARRY_GRAN_LOG2); anchor i32
        # [tau, nb] = global csum at each block start (exclusive); carry i32
        # [tau, n >> CARRY_GRAN_LOG2] = global csum at each granule start
        # (exclusive).
        def one(s):
            bo = jax.lax.dynamic_slice(block_of, (s,), (L,))
            imv = jax.lax.dynamic_slice(input_mv, (s,), (L,))
            isf = jax.lax.dynamic_slice(is_first, (s,), (L,))
            isl = jax.lax.dynamic_slice(is_last, (s,), (L,))
            if packed:
                # tape_mv carries the packed u8 plane; wflag/wsym unused
                pk = jax.lax.dynamic_slice(tape_mv, (0, s), (tau, L))
                tmv, wfl, wsy = _unpack_logs(pk)
            else:
                tmv = jax.lax.dynamic_slice(tape_mv, (0, s), (tau, L))
                wfl = jax.lax.dynamic_slice(wflag, (0, s), (tau, L))
                wsy = jax.lax.dynamic_slice(wsym, (0, s), (tau, L))
            ci = s >> CARRY_GRAN_LOG2
            return derive_cols_core(
                imv, tmv, wfl, wsy, bo, isf, isl,
                win_len, in_off, out_off, anchor, carry[:, ci],
            )

        return jax.vmap(one)(starts)

    return jax.jit(f)


class DeviceColumns:
    """Column matrix [C, n] as device-resident u32 limb planes.

    The planes are derived lazily from the device-resident raw inputs (~38
    bytes/row vs the planes' 472 bytes/row at tau=8) and can be dropped with
    :meth:`release_planes` between the composition and the openings phase —
    at T=2^24 the [59, n] x 2 planes are ~8 GB and cannot coexist with the
    2^27-point LDE/FRI transients in 16 GB HBM. Re-deriving is one jit
    replay over the resident raw inputs (no host re-upload)."""

    def __init__(self, blocks: Sequence):
        import jax.numpy as jnp

        h = _host_inputs(blocks)
        self.n = h["n"]
        self.tau = h["tau"]
        self.labels = all_labels(self.tau)
        self._nb = len(blocks)
        # pack (tape_mv, write_flag, write_sym) into one u8 plane when the
        # symbol fits 4 bits (always for the reference generator; larger
        # alphabets fall back to the unpacked upload) — quarters the
        # host->device raw-log traffic
        self._packed = (
            self.n > 0
            and int(h["wsym"].max(initial=0)) <= 15
            and int(h["tape_mv"].min(initial=0)) >= -1
            and int(h["tape_mv"].max(initial=0)) <= 1
        )
        if self._packed:
            pk = jnp.asarray(
                np.ascontiguousarray(
                    pack_logs(
                        h["tape_mv"].T, h["wflag"].T, h["wsym"].T
                    )
                )
            )
            log_args = (pk, pk, pk)  # tape/wflag/wsym slots share the plane
        else:
            log_args = (
                jnp.asarray(np.ascontiguousarray(h["tape_mv"].T)),
                jnp.asarray(np.ascontiguousarray(h["wflag"].astype(np.uint8).T)),
                jnp.asarray(np.ascontiguousarray(h["wsym"].astype(np.uint16).T)),
            )
        self._args = (
            jnp.asarray(h["input_mv"]),
            *log_args,
            jnp.asarray(h["block_of"]),
            jnp.asarray(h["block_start"]),
            jnp.asarray(h["is_first"]),
            jnp.asarray(h["is_last"]),
            jnp.asarray(np.ascontiguousarray((h["win_len"] & 0xFFFFFFFF).astype(np.uint32).T)),
            jnp.asarray(np.ascontiguousarray((h["in_off"] & 0xFFFFFFFF).astype(np.uint32).T)),
            jnp.asarray(np.ascontiguousarray((h["out_off"] & 0xFFFFFFFF).astype(np.uint32).T)),
        )
        # cumsum anchors for derive_ranges: global tape-mv csum (exclusive)
        # at each block start and at each 2^CARRY_GRAN_LOG2 granule start.
        # Only anchor rows are needed, so when every anchor position is a
        # multiple of a common power-of-two segment size, sum per segment
        # and cumsum the [n/g0, tau] segment totals instead of running a
        # strided axis-0 cumsum over the full [n, tau] slab (the full
        # cumsum was ~3 s of the measured host-serial time at T=2^22;
        # the segment path is ~100x less memory traffic).
        bs = h["block_start"]
        gran = 1 << CARRY_GRAN_LOG2
        gs = np.arange(0, self.n, gran, dtype=np.int64)
        tau = h["tau"]
        g0 = gran
        sizes = np.diff(np.append(bs, self.n))
        if sizes.size and (sizes == sizes[0]).all() and sizes[0] > 0 \
                and (int(sizes[0]) & (int(sizes[0]) - 1)) == 0:
            g0 = min(g0, int(sizes[0]))
        if self.n % g0 == 0 and (bs % g0 == 0).all() and gran % g0 == 0:
            seg = np.add.reduce(
                h["tape_mv"].reshape(self.n // g0, g0, tau),
                axis=1, dtype=np.int32,
            )
            gcs = np.cumsum(seg, axis=0, dtype=np.int32)  # [n/g0, tau]

            def _excl(idx):
                j = np.maximum(idx // g0 - 1, 0)
                return np.where(
                    (idx == 0)[None, :], np.int32(0), gcs[j].T
                ).astype(np.int32)

            anchor = _excl(bs)       # [tau, nb]
            carry = _excl(gs)        # [tau, n >> CARRY_GRAN_LOG2]
        else:
            csum = np.cumsum(h["tape_mv"].astype(np.int32), axis=0)  # [n, tau]
            anchor = np.where(
                (bs == 0)[None, :], np.int32(0), csum[np.maximum(bs - 1, 0)].T
            ).astype(np.int32)
            carry = np.where(
                (gs == 0)[None, :], np.int32(0), csum[np.maximum(gs - 1, 0)].T
            ).astype(np.int32)
            del csum
        self._anchor = jnp.asarray(anchor)
        self._carry = jnp.asarray(carry)

        self._lo = self._hi = None
        self._materialize()

    def _materialize(self):
        if self._lo is None:
            (imv, tmv, wfl, wsy, *rest) = self._args
            if self._packed:
                f = _jit_columns_packed(self.n, self.tau, self._nb)
                self._lo, self._hi = f(imv, tmv, *rest)
            else:
                f = _jit_columns(self.n, self.tau, self._nb)
                self._lo, self._hi = f(*self._args)

    @property
    def lo(self):
        self._materialize()
        return self._lo

    @property
    def hi(self):
        self._materialize()
        return self._hi

    def release_planes(self) -> None:
        """Drop the derived planes (freed once in-flight consumers finish);
        the next `.lo`/`.hi` access re-derives them from the raw inputs."""
        self._lo = self._hi = None

    @property
    def planes_resident(self) -> bool:
        return self._lo is not None

    def derive_ranges(self, starts, length: int):
        """Derive [S, C, length] column limb planes for `starts` (each a
        multiple of 2^CARRY_GRAN_LOG2) without materializing the full
        planes. Returns device (lo, hi).

        The request count is padded to a power-of-two bucket so the jit
        cache is not keyed on the Fiat-Shamir-dependent distinct-chunk
        count (ADVICE r2); outputs are sliced back to S."""
        import jax.numpy as jnp

        assert length >= (1 << CARRY_GRAN_LOG2), (
            "range length below the carry granularity"
        )
        starts = np.asarray(starts, dtype=np.int32)
        assert np.all(starts % (1 << CARRY_GRAN_LOG2) == 0)
        assert np.all(starts + length <= self.n)
        s_n = len(starts)
        bucket = max(8, 1 << (s_n - 1).bit_length())
        padded = np.zeros(bucket, dtype=np.int32)
        padded[:s_n] = starts
        (input_mv, tape_mv, wflag, wsym, block_of, _block_start, is_first,
         is_last, win_len, in_off, out_off) = self._args
        f = _jit_derive_ranges(length, self.tau, self._nb, bucket,
                               packed=self._packed)
        lo, hi = f(
            jnp.asarray(padded), input_mv, tape_mv, wflag, wsym, block_of,
            is_first, is_last, win_len, in_off, out_off,
            self._anchor, self._carry,
        )
        return lo[:s_n], hi[:s_n]

    def to_host(self) -> np.ndarray:
        """u64 [C, n] (for parity tests)."""
        import jax

        lo, hi = jax.device_get((self.lo, self.hi))
        return lo.astype(np.uint64) | (hi.astype(np.uint64) << np.uint64(32))


# ----------------------- device AIR composition -----------------------------


@lru_cache(maxsize=8)
def _w_base_pows_device(n_log2: int):
    import jax.numpy as jnp

    from ...ops import goldilocks_jax as FJ
    from ...ops import ntt as ntt_host

    t = FJ.pack(ntt_host.powers(G.primitive_root_2exp(n_log2), 1 << n_log2))
    return jnp.asarray(t[0]), jnp.asarray(t[1])


def compose_rows_core(
    lo, hi, tau: int, a_lo, a_hi, mc_lo, mc_hi, xs_lo, xs_hi,
    head_next, mv_next,
):
    """Base composition + ZK masks over [C, m] column slabs (traced body).

    lo/hi: [C, m] column limbs in all_labels order; a: [11] alphas;
    mc: [n_masks, mask_deg] mask coefficients; xs: [m] base-domain points;
    head_next/mv_next: [tau, m] next-row slabs (caller supplies the wrap or
    cross-shard halo). Shared by the single-chip device pipeline and the
    mesh-sharded prover so the AIR math cannot drift between them.

    Every term is a 1-D [m] op on an input row; the final sum is
    tree-reduced. The earlier [tau, m]-slab formulation extracted rows of a
    deeply fused 2-D graph for the tau reduction, which trips an
    exponential-recompute fusion pathology in XLA:CPU (~2300x slowdown at
    m=512; TPU compiles either form fine). Per-tape rows keep every slice on
    a materialized input buffer, and [m] ops already fill the vector lanes
    at production sizes.
    """
    import jax.numpy as jnp

    from ...ops import goldilocks_jax as FJ

    M16 = np.uint32(0xFFFF)
    M4 = np.uint32(0xF)
    m = lo.shape[1]
    n_masks, mask_deg = mc_lo.shape

    def row(i):
        return lo[i], hi[i]

    def alpha(i):
        return (
            jnp.broadcast_to(a_lo[i], (m,)),
            jnp.broadcast_to(a_hi[i], (m,)),
        )

    one = (jnp.ones(m, jnp.uint32), jnp.zeros(m, jnp.uint32))
    is_first = row(1)
    is_last = row(2)
    one_minus_last = FJ.sub(one, is_last)

    terms = []
    for r in range(tau):
        mv = row(3 + r)
        flg = row(3 + tau + r)
        sym = row(3 + 2 * tau + r)
        head = row(3 + 3 * tau + r)
        wlen = row(3 + 4 * tau + r)
        ioff = row(3 + 5 * tau + r)
        ooff = row(3 + 6 * tau + r)
        hn = (head_next[0][r], head_next[1][r])
        mn = (mv_next[0][r], mv_next[1][r])

        terms.append(FJ.mul(alpha(0), FJ.mul(flg, FJ.sub(flg, one))))
        terms.append(
            FJ.mul(alpha(1), FJ.mul(mv, FJ.mul(FJ.sub(mv, one), FJ.add(mv, one))))
        )
        hu = FJ.sub(FJ.sub(hn, head), mn)
        terms.append(FJ.mul(alpha(2), FJ.mul(one_minus_last, hu)))

        head_low = (head[0] & M16, jnp.zeros(m, jnp.uint32))
        terms.append(FJ.mul(alpha(4), FJ.mul(flg, FJ.sub(head, head_low))))
        slack = FJ.sub(FJ.sub(wlen, one), head)
        slack_low = (slack[0] & M16, jnp.zeros(m, jnp.uint32))
        terms.append(FJ.mul(alpha(6), FJ.mul(flg, FJ.sub(slack, slack_low))))
        sym_low = (sym[0] & M4, jnp.zeros(m, jnp.uint32))
        terms.append(FJ.mul(alpha(8), FJ.mul(flg, FJ.sub(sym, sym_low))))

        terms.append(
            FJ.mul(alpha(9), FJ.mul(is_first, FJ.sub(FJ.sub(head, mv), ioff)))
        )
        terms.append(FJ.mul(alpha(10), FJ.mul(is_last, FJ.sub(head, ooff))))

    # ZK masks on [m]
    xs = (xs_lo, xs_hi)
    for k in range(n_masks):
        mk = (jnp.zeros(m, jnp.uint32), jnp.zeros(m, jnp.uint32))
        for d in range(mask_deg - 1, -1, -1):
            c = (
                jnp.broadcast_to(mc_lo[k, d], (m,)),
                jnp.broadcast_to(mc_hi[k, d], (m,)),
            )
            mk = FJ.add(FJ.mul(mk, xs), c)
        terms.append(mk)

    while len(terms) > 1:
        nxt = [FJ.add(terms[i], terms[i + 1]) for i in range(0, len(terms) - 1, 2)]
        if len(terms) & 1:
            nxt.append(terms[-1])
        terms = nxt
    return terms[0]


@lru_cache(maxsize=8)
def _jit_compose(n: int, tau: int, n_masks: int, mask_deg: int):
    import jax
    import jax.numpy as jnp

    from ...ops import goldilocks_jax as FJ

    M16 = np.uint32(0xFFFF)

    def f(lo, hi, a_lo, a_hi, mc_lo, mc_hi, xs_lo, xs_hi):
        # lo/hi: [C, n]; a: [11] alphas; mc: [n_masks, mask_deg]; xs: [n]
        def slab(base):
            return lo[base : base + tau], hi[base : base + tau]

        head = slab(3 + 3 * tau)
        mv = slab(3)
        head_next = (jnp.roll(head[0], -1, axis=1), jnp.roll(head[1], -1, axis=1))
        mv_next = (jnp.roll(mv[0], -1, axis=1), jnp.roll(mv[1], -1, axis=1))
        return compose_rows_core(
            lo, hi, tau, a_lo, a_hi, mc_lo, mc_hi, xs_lo, xs_hi,
            head_next, mv_next,
        )

    return jax.jit(f)


@lru_cache(maxsize=8)
def _jit_compose_scan(n: int, tau: int, n_masks: int, mask_deg: int,
                      seg_log2: int):
    """Segment-scanned composition for large n: the monolithic graph's
    [n]-sized term temporaries OOM alongside the ~8 GB column planes at
    n = 2^24; scanning 2^seg_log2-row slabs bounds the transient set while
    producing bit-identical output."""
    import jax
    import jax.numpy as jnp

    seg = 1 << seg_log2
    assert n % seg == 0 and seg >= 2
    n_seg = n // seg
    h0 = 3 + 3 * tau  # head rows base in all_labels order
    m0 = 3  # mv rows base

    def f(lo, hi, a_lo, a_hi, mc_lo, mc_hi, xs_lo, xs_hi):
        c = lo.shape[0]

        def body(_, i):
            s = i * seg
            slo = jax.lax.dynamic_slice(lo, (0, s), (c, seg))
            shi = jax.lax.dynamic_slice(hi, (0, s), (c, seg))
            xs_l = jax.lax.dynamic_slice_in_dim(xs_lo, s, seg)
            xs_h = jax.lax.dynamic_slice_in_dim(xs_hi, s, seg)
            nstart = (s + seg) % n  # wrap column (row 0) for the last slab

            def next_slab(base):
                cl = slo[base : base + tau]
                ch = shi[base : base + tau]
                nl = jax.lax.dynamic_slice(lo, (base, nstart), (tau, 1))
                nh = jax.lax.dynamic_slice(hi, (base, nstart), (tau, 1))
                return (
                    jnp.concatenate([cl[:, 1:], nl], axis=1),
                    jnp.concatenate([ch[:, 1:], nh], axis=1),
                )

            out = compose_rows_core(
                slo, shi, tau, a_lo, a_hi, mc_lo, mc_hi, xs_l, xs_h,
                next_slab(h0), next_slab(m0),
            )
            return None, out

        _, (olo, ohi) = jax.lax.scan(body, None, jnp.arange(n_seg, dtype=jnp.int32))
        return olo.reshape(n), ohi.reshape(n)

    return jax.jit(f)


# Above this row count the composition runs as a segment scan (the
# monolithic graph OOMs next to the resident column planes).
COMPOSE_SCAN_MIN_LOG2 = 23
COMPOSE_SEG_LOG2 = 19


def compose_device(dc: DeviceColumns, alphas: Alphas, mask_coeffs) -> Tuple:
    """Base composition + ZK masks for all rows, on device.

    Returns (lo, hi) jnp [n]. Bit-identical to
    air.compose_all_rows + masking.eval_masks_sum_at_points."""
    import os

    import jax.numpy as jnp

    a_list = [
        alphas.bool_flag, alphas.mv_domain, alphas.head_update,
        alphas.head_bits_bool, alphas.head_reconstruct, alphas.slack_bits_bool,
        alphas.slack_reconstruct, alphas.sym_bits_bool, alphas.sym_reconstruct,
        alphas.boundary_first, alphas.boundary_last,
    ]
    a = np.array(a_list, dtype=np.uint64)
    mc = np.array(mask_coeffs, dtype=np.uint64)
    n_log2 = dc.n.bit_length() - 1
    xs = _w_base_pows_device(n_log2)
    scan_min = int(
        os.environ.get("SEZKP_COMPOSE_SCAN_MIN_LOG2", COMPOSE_SCAN_MIN_LOG2)
    )
    if n_log2 >= scan_min:
        f = _jit_compose_scan(
            dc.n, dc.tau, mc.shape[0], mc.shape[1],
            min(COMPOSE_SEG_LOG2, n_log2 - 1),
        )
    else:
        f = _jit_compose(dc.n, dc.tau, mc.shape[0], mc.shape[1])
    return f(
        dc.lo,
        dc.hi,
        jnp.asarray((a & 0xFFFFFFFF).astype(np.uint32)),
        jnp.asarray((a >> 32).astype(np.uint32)),
        jnp.asarray((mc & 0xFFFFFFFF).astype(np.uint32)),
        jnp.asarray((mc >> 32).astype(np.uint32)),
        xs[0],
        xs[1],
    )
