"""Mesh-sharded STARK v1 hot path: composition, DEEP coset LDE, FRI.

New TPU-native subsystem (SURVEY.md §2.10/§7.8 — the Rust reference is
single-process; crates/sezkp-stark/src/v1/lde.rs:42-97 and fri.rs:40-94 run
on one CPU). Here the entire post-commitment prover pipeline executes as two
SPMD programs over a 1-D `jax.sharding.Mesh`:

phase 1 (one shard_map program):
  - AIR composition of the row-sharded trace columns (next-row values cross
    shard boundaries via one ppermute halo exchange)
  - ZK mask evaluation on the base domain (outer-product power tables)
  - distributed INTT and blown-up coset NTT via the four-step algorithm
    (one lax.all_to_all each — the only O(n) ICI traffic)
  - DEEP division by (x - z) with vectorized Fermat inverses
  - natural-order relayout + FRI layer-0 leaf hashing and full local
    Merkle subtrees (plane-major batched BLAKE3)

phase 2 (one shard_map program, after the Fiat-Shamir betas are known):
  - every device-scale FRI fold (the halves exchange is four ppermutes of
    half-shards per layer; traffic halves per layer, O(lde_n/D) total)
  - leaf hashing of ALL folded layers in one batched call, and Merkle
    levels batched ACROSS layers (one kernel per level, not per layer,
    which keeps XLA:CPU compile time linear)

Only 32-byte subtree roots and the small fold tail cross the host link; the
host then assembles the per-layer root (D-leaf top trees), extends the
sequential transcript in the reference's exact absorb order, and answers
queries with batched device gathers. Proof bytes are bit-identical to the
single-chip prover (cross-tested in tests/test_parallel.py at mesh sizes
{1, 2, 4, 8}).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Dict, List, Tuple

import numpy as np

from ..ops import goldilocks as G
from ..ops import ntt as ntt_host
from ..stark.v1.proof import FriQuery
from .mesh import AXIS, make_global

# Device FRI layers stop when the layer drops below this size; the remaining
# tail folds on host (mirrors stark/v1/fri_device.MIN_DEVICE_LAYER_LOG2).
MIN_DEVICE_LAYER_LOG2 = 11

# Tops-only (chunked) Merkle storage: per-device subtree levels below this
# are not kept across phases — queried in-chunk path nodes are recomputed
# from 2^CHUNK_LOG2 gathered leaf values at opening time (mirrors
# stark/v1/fri_device.py's chunked mode for the single-chip prover).
CHUNK_LOG2 = 11


def _tops_threshold_log2() -> int:
    """LDE size (log2) at which the sharded prover switches to tops-only
    tree storage; full local subtrees at 2^26 LDE are ~0.5 GB/device."""
    import os

    return int(os.environ.get("SEZKP_SHARDED_TOPS_MIN_LOG2", "20"))


def _jax():
    import jax

    return jax


def _jnp():
    import jax.numpy as jnp

    return jnp


def _cv_bytes(cv_rows: np.ndarray) -> np.ndarray:
    out = np.ascontiguousarray(cv_rows, dtype="<u4")
    return out.view(np.uint8).reshape(out.shape[0], 32)


def _gin(mesh, spec, arr):
    """Program input: plain device array single-process, global jax.Array
    (built from each process's replicated host copy) under jax.distributed."""
    jax = _jax()
    if jax.process_count() == 1:
        return _jnp().asarray(arr)
    return make_global(mesh, spec, np.asarray(arr))


@lru_cache(maxsize=8)
def _gather_fns(mesh):
    """Jitted gathers with fully-replicated outputs — multi-process-safe
    pulls from sharded global arrays (eager indexing of a global array
    whose shards live on other processes is not allowed)."""
    jax = _jax()
    from jax.sharding import NamedSharding, PartitionSpec as P

    rep = NamedSharding(mesh, P())
    g_val = jax.jit(lambda a, i: a[i], out_shardings=rep)
    g_plane = jax.jit(lambda a, i: a[:, i].T, out_shardings=rep)
    return g_val, g_plane


# ---------------------------------------------------------------------------
# host-side table building (per (base_log2, blow_log2, D); passed as args so
# multi-hundred-MB twiddle tables are never baked into the executable)
# ---------------------------------------------------------------------------


def _pack_j(x) -> Tuple:
    jnp = _jnp()
    from ..ops import goldilocks_jax as FJ

    p = FJ.pack(np.asarray(x, dtype=np.uint64))
    return (jnp.asarray(p[0]), jnp.asarray(p[1]))


@lru_cache(maxsize=4)
def _tables(base_log2: int, blow_log2: int, d: int, shift: int):
    from ..ops import ntt_jax

    n = 1 << base_log2
    ln_log2 = base_log2 + blow_log2
    ln = 1 << ln_log2
    b1 = base_log2 // 2
    b2 = base_log2 - b1
    l1 = ln_log2 // 2
    l2 = ln_log2 - l1
    p = int(G.P)
    w_base = int(G.primitive_root_2exp(base_log2))
    w_lde = int(G.primitive_root_2exp(ln_log2))
    nloc = n // d

    return dict(
        b1=b1, b2=b2, l1=l1, l2=l2,
        t_inv1=ntt_jax._tables_packed(b1, True),
        t_inv2=ntt_jax._tables_packed(b2, True),
        t_f1=ntt_jax._tables_packed(l1, False),
        t_f2=ntt_jax._tables_packed(l2, False),
        w_inv=_pack_j(ntt_host.powers(G.inv(np.uint64(w_base)), n)),
        w_fwd=_pack_j(ntt_host.powers(np.uint64(w_lde), ln)),
        inv_n=_pack_j(np.uint64(G.inv(np.uint64(n)))),
        # coset scale shift^k = s1[k1] * s2[k2], k = k1 + n1*k2
        s1=_pack_j(ntt_host.powers(np.uint64(shift), 1 << b1)),
        s2=_pack_j(ntt_host.powers(np.uint64(pow(shift, 1 << b1, p)), 1 << b2)),
        # DEEP points x_k = shift*w^k = x1[k1'] * x2[k2'], k = k1' + ln1*k2'
        x1=_pack_j(
            G.mul(np.uint64(shift), ntt_host.powers(np.uint64(w_lde), 1 << l1))
        ),
        x2=_pack_j(ntt_host.powers(np.uint64(pow(w_lde, 1 << l1, p)), 1 << l2)),
        # base-domain points for masks: w^i = xs_loc[i % nloc] * xs_dev[i // nloc]
        xs_loc=_pack_j(ntt_host.powers(np.uint64(w_base), nloc)),
        xs_dev=_pack_j(ntt_host.powers(np.uint64(pow(w_base, nloc, p)), d)),
    )


# ---------------------------------------------------------------------------
# traced helpers (run inside shard_map; local views, explicit collectives)
# ---------------------------------------------------------------------------


def _four_step(lohi, n1_log2: int, n2_log2: int, tabs1, tabs2, wtab, d: int):
    """Local body of the distributed four-step NTT (see ntt_sharded.py).

    Input: [n1, n2/D] shard of A[j1, j2] (j = j1*n2 + j2).
    Output: [n1/D, n2] shard of Y[k1, k2] (y index k = k1 + n1*k2)."""
    jax = _jax()
    jnp = _jnp()
    from ..ops import goldilocks_jax as FJ
    from ..ops import ntt_jax

    lo, hi = lohi
    n1, n2 = 1 << n1_log2, 1 << n2_log2
    n2l = n2 // d
    mask = np.uint32((n1 * n2) - 1)
    di = jax.lax.axis_index(AXIS)
    lo_t, hi_t = ntt_jax._ntt_stages((lo.T, hi.T), tabs1, n1_log2)
    lo, hi = lo_t.T, hi_t.T
    k1 = jax.lax.broadcasted_iota(jnp.uint32, (n1, n2l), 0)
    j2 = jax.lax.broadcasted_iota(jnp.uint32, (n1, n2l), 1) + (
        di.astype(jnp.uint32) * np.uint32(n2l)
    )
    idx = (k1 * j2) & mask
    lo, hi = FJ.mul((lo, hi), (wtab[0][idx], wtab[1][idx]))
    lo = jax.lax.all_to_all(lo, AXIS, split_axis=0, concat_axis=1, tiled=True)
    hi = jax.lax.all_to_all(hi, AXIS, split_axis=0, concat_axis=1, tiled=True)
    return ntt_jax._ntt_stages((lo, hi), tabs2, n2_log2)


def _local_tree(lo, hi, tops: bool = False):
    """Leaf-hash a local value shard and build the full local subtree.

    Returns (flat plane buffer, root [8, 1]). Full mode keeps every level
    (level 0 first, [8, 2m-1]); tops mode keeps only levels >= CHUNK_LOG2
    ([8, 2*(m>>c)-1]) — the below-chunk levels are computed transiently
    for the upper nodes and recomputed per queried chunk at opening."""
    jnp = _jnp()
    from ..ops import blake3_jax as BJ

    cv = BJ.hash_leaves_u64_planes(
        lo, hi, jnp.asarray(BJ._prefix_words(b"")), 0
    )
    levels = [cv]
    while levels[-1].shape[1] > 1:
        levels.append(BJ.parent_level_planes(levels[-1]))
    keep = levels[CHUNK_LOG2:] if tops else levels
    return jnp.concatenate(keep, axis=1), levels[-1]


# ---------------------------------------------------------------------------
# compiled phases
# ---------------------------------------------------------------------------


@lru_cache(maxsize=4)
def _build_phase1(d: int, base_log2: int, blow_log2: int, tau: int,
                  n_masks: int, mask_deg: int, shift: int,
                  nb: int = 0, raw: bool = False, tops: bool = False):
    """Compile phase 1 -> (lde natural [ln] P(AXIS), layer-0 tree planes
    P(None, AXIS) (full local subtrees, or levels >= CHUNK_LOG2 when
    tops=True), layer-0 subtree roots [D, 8] replicated).

    raw=False: input is the host-built cols [C, n], row-sharded.
    raw=True: inputs are the raw movement logs / block tables (sharded
    over rows; per-block tables replicated) and every device derives its
    own [C, n/D] column slab in-kernel via derive_cols_core — no [C, n]
    materialization anywhere (columns_device.py's schedule, composed with
    the mesh; VERDICT round-2 item 3a)."""
    jax = _jax()
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ..ops import goldilocks_jax as FJ
    from ..ops import ntt_jax
    from ..stark.v1.columns_device import compose_rows_core
    from .mesh import make_mesh

    mesh = make_mesh(d)
    n = 1 << base_log2
    ln_log2 = base_log2 + blow_log2
    ln = 1 << ln_log2
    nloc = n // d
    lnloc = ln // d
    t = _tables(base_log2, blow_log2, d, shift)
    b1, b2, l1, l2 = t["b1"], t["b2"], t["l1"], t["l2"]
    n1, n2 = 1 << b1, 1 << b2
    ln1, ln2 = 1 << l1, 1 << l2
    assert n1 % d == 0 and n2 % d == 0 and ln1 % d == 0 and ln2 % d == 0, (
        f"four-step factors must divide the mesh: n1={n1} n2={n2} "
        f"ln1={ln1} ln2={ln2} D={d}"
    )

    if tops:
        assert lnloc > (1 << CHUNK_LOG2), (
            f"tops-only mode needs local LDE shards > 2^{CHUNK_LOG2}"
        )

    def pipeline(cols_lo, cols_hi, a_lo, a_hi, mc_lo, mc_hi, z_lo, z_hi, tabs):
        di = jax.lax.axis_index(AXIS)
        perm_next = [(i, (i - 1) % d) for i in range(d)]

        def next_slab(base):
            sl_lo = cols_lo[base : base + tau]  # [tau, nloc]
            sl_hi = cols_hi[base : base + tau]
            if d == 1:
                first_lo = sl_lo[:, :1]
                first_hi = sl_hi[:, :1]
            else:
                first_lo = jax.lax.ppermute(sl_lo[:, :1], AXIS, perm_next)
                first_hi = jax.lax.ppermute(sl_hi[:, :1], AXIS, perm_next)
            return (
                jnp.concatenate([sl_lo[:, 1:], first_lo], axis=1),
                jnp.concatenate([sl_hi[:, 1:], first_hi], axis=1),
            )

        mv_next = next_slab(3)
        head_next = next_slab(3 + 3 * tau)

        # base-domain points for the mask polynomials
        xs = FJ.mul(
            tabs["xs_loc"],
            (
                jnp.broadcast_to(tabs["xs_dev"][0][di], (nloc,)),
                jnp.broadcast_to(tabs["xs_dev"][1][di], (nloc,)),
            ),
        )
        comp = compose_rows_core(
            cols_lo, cols_hi, tau, a_lo, a_hi, mc_lo, mc_hi, xs[0], xs[1],
            head_next, mv_next,
        )

        # ---- distributed INTT (natural-contiguous rows -> four-step) ----
        A = (comp[0].reshape(n1 // d, n2), comp[1].reshape(n1 // d, n2))
        if d > 1:
            A = tuple(
                jax.lax.all_to_all(x, AXIS, split_axis=1, concat_axis=0, tiled=True)
                for x in A
            )
        Y = _four_step(A, b1, b2, t["t_inv1"], t["t_inv2"], tabs["w_inv"], d)
        inv_n = tabs["inv_n"]
        Y = FJ.mul(Y, (
            jnp.broadcast_to(inv_n[0], Y[0].shape),
            jnp.broadcast_to(inv_n[1], Y[0].shape),
        ))

        # coset scale shift^k, coefficient index k = k1 + n1*k2
        n1loc = n1 // d
        k1 = jax.lax.broadcasted_iota(jnp.uint32, Y[0].shape, 0) + (
            di.astype(jnp.uint32) * np.uint32(n1loc)
        )
        k2 = jax.lax.broadcasted_iota(jnp.uint32, Y[0].shape, 1)
        sc = FJ.mul(
            (tabs["s1"][0][k1], tabs["s1"][1][k1]),
            (tabs["s2"][0][k2], tabs["s2"][1][k2]),
        )
        Y = FJ.mul(Y, sc)

        # ---- redistribute coefficients into the LDE four-step input ----
        # Y[k1, k2] is k1-row-sharded; the forward four-step wants
        # A[j1, j2] = c[j1*ln2 + j2] (zero for j >= n), j2-column-sharded.
        # Round 2 all_gathered the full coefficient vector to every device
        # (O(n) memory + O(n) per-device traffic); instead:
        #   1. all_to_all to k2-sharding -> each device holds a CONTIGUOUS
        #      natural-order coefficient range (k = k1 + n1*k2 is contiguous
        #      when k2 is the sharded axis and k1 local-free);
        #   2. view the contiguous range as [G, ln2] rows j1 = di*G + g
        #      (exact because D * ln2 divides n), and all_to_all the j2
        #      columns to their owners.
        # Both steps move O(n/D) per device.
        if d > 1:
            t_lo = jax.lax.all_to_all(
                Y[0], AXIS, split_axis=1, concat_axis=0, tiled=True
            )  # [n1, n2/D]: all k1, local k2 slice
            t_hi = jax.lax.all_to_all(
                Y[1], AXIS, split_axis=1, concat_axis=0, tiled=True
            )
        else:
            t_lo, t_hi = Y
        # contiguous natural order: k = k1 + n1*k2 -> column-major flatten
        c_lo = t_lo.T.reshape(-1)  # [n/D], k in [di*n/D, (di+1)*n/D)
        c_hi = t_hi.T.reshape(-1)
        assert n % (d * ln2) == 0, (
            f"coefficient relayout needs D*ln2 | n (n={n} ln2={ln2} D={d})"
        )
        g_rows = n // (d * ln2)
        A2_lo = c_lo.reshape(g_rows, ln2)  # rows j1 = di*g_rows + g
        A2_hi = c_hi.reshape(g_rows, ln2)
        if d > 1:
            A2_lo = jax.lax.all_to_all(
                A2_lo, AXIS, split_axis=1, concat_axis=0, tiled=True
            )  # [g_rows*D = n/ln2, ln2/D]: all j1 < n/ln2, local j2 slice
            A2_hi = jax.lax.all_to_all(
                A2_hi, AXIS, split_axis=1, concat_axis=0, tiled=True
            )
        ln2loc = ln2 // d
        # zero-pad rows j1 in [n/ln2, ln1)
        pad = ln1 - n // ln2
        Al = (
            jnp.concatenate(
                [A2_lo, jnp.zeros((pad, ln2loc), jnp.uint32)], axis=0
            ),
            jnp.concatenate(
                [A2_hi, jnp.zeros((pad, ln2loc), jnp.uint32)], axis=0
            ),
        )

        # ---- distributed forward NTT on the blown-up domain ----
        Yl = _four_step(Al, l1, l2, t["t_f1"], t["t_f2"], tabs["w_fwd"], d)

        # ---- DEEP divide by (x_k - z), k = k1' + ln1*k2' ----
        ln1loc = ln1 // d
        yk1 = jax.lax.broadcasted_iota(jnp.uint32, Yl[0].shape, 0) + (
            di.astype(jnp.uint32) * np.uint32(ln1loc)
        )
        yk2 = jax.lax.broadcasted_iota(jnp.uint32, Yl[0].shape, 1)
        xk = FJ.mul(
            (tabs["x1"][0][yk1], tabs["x1"][1][yk1]),
            (tabs["x2"][0][yk2], tabs["x2"][1][yk2]),
        )
        zb = (
            jnp.broadcast_to(z_lo, Yl[0].shape),
            jnp.broadcast_to(z_hi, Yl[0].shape),
        )
        denom = FJ.sub(xk, zb)
        y = FJ.mul(Yl, ntt_jax._pow_p_minus_2(denom))

        # ---- natural-order relayout (k2'-major rows = natural flat) ----
        if d > 1:
            nat = tuple(
                jax.lax.all_to_all(
                    x.T, AXIS, split_axis=0, concat_axis=1, tiled=True
                ).reshape(lnloc)
                for x in y
            )
        else:
            nat = tuple(x.T.reshape(lnloc) for x in y)

        tree0, root0 = _local_tree(nat[0], nat[1], tops)
        # replicate the [D, 8] subtree roots so the host pull is local on
        # every process of a multi-process mesh
        roots_rep = jax.lax.all_gather(root0.T, AXIS, axis=0, tiled=True)
        return nat[0], nat[1], tree0, roots_rep

    if raw:
        from ..stark.v1.columns_device import derive_cols_core

        def local(imv, tmv, wfl, wsy, bo, isf, isl, winl, inof, outof,
                  anchor, carry_shard,
                  a_lo, a_hi, mc_lo, mc_hi, z_lo, z_hi, tabs):
            di = jax.lax.axis_index(AXIS)
            cols_lo, cols_hi = derive_cols_core(
                imv, tmv, wfl, wsy, bo, isf, isl,
                winl, inof, outof, anchor, carry_shard[:, di],
            )
            return pipeline(
                cols_lo, cols_hi, a_lo, a_hi, mc_lo, mc_hi, z_lo, z_hi, tabs
            )

        in_specs = (
            P(AXIS),                             # input_mv [n]
            P(None, AXIS), P(None, AXIS), P(None, AXIS),  # tmv/wfl/wsy [tau, n]
            P(AXIS), P(AXIS), P(AXIS),           # block_of, is_first, is_last
            P(), P(), P(),                       # win_len, in_off, out_off
            P(), P(),                            # anchor, carry_shard
            P(), P(), P(), P(), P(), P(),        # alphas, masks, z
            P(),                                 # tables
        )
    else:

        def local(cols_lo, cols_hi, a_lo, a_hi, mc_lo, mc_hi, z_lo, z_hi,
                  tabs):
            return pipeline(
                cols_lo, cols_hi, a_lo, a_hi, mc_lo, mc_hi, z_lo, z_hi, tabs
            )

        in_specs = (
            P(None, AXIS), P(None, AXIS),  # cols
            P(), P(), P(), P(), P(), P(),  # alphas, masks, z
            P(),                           # tables (replicated pytree)
        )

    f = shard_map(
        local,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=(P(AXIS), P(AXIS), P(None, AXIS), P()),
        check_vma=False,
    )
    return jax.jit(f), mesh, t


@lru_cache(maxsize=4)
def _build_phase2(d: int, ln_log2: int, dev_layers: int, tops: bool = False):
    """lde natural [ln] P(AXIS) + betas -> folded layer values (device-major
    concat), per-level cross-layer node buffers (levels >= CHUNK_LOG2 only
    when tops=True; lower levels are transient and recomputed per queried
    chunk at opening), per-layer subtree roots, and the replicated tail."""
    jax = _jax()
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ..ops import blake3_jax as BJ
    from ..ops import goldilocks_jax as FJ
    from .mesh import make_mesh

    mesh = make_mesh(d)
    ln = 1 << ln_log2
    lnloc = ln // d

    # static geometry: folded layer l (1-based) has m_l = ln >> l values,
    # local segment seg_l = m_l // d
    segs = [ (ln >> l) // d for l in range(1, dev_layers + 1) ]
    assert all(s >= 1 for s in segs)

    def local(lde_lo, lde_hi, betas_lo, betas_hi):
        cur = (lde_lo, lde_hi)
        folded_parts = []
        for l in range(1, dev_layers + 1):
            mloc = cur[0].shape[0]
            beta = (
                jnp.broadcast_to(betas_lo[l - 1], (mloc // 2,)),
                jnp.broadcast_to(betas_hi[l - 1], (mloc // 2,)),
            )
            if d == 1:
                low = (cur[0][: mloc // 2], cur[1][: mloc // 2])
                high = (cur[0][mloc // 2 :], cur[1][mloc // 2 :])
            else:
                h = mloc // 2
                h0 = jnp.stack([cur[0][:h], cur[1][:h]])   # [2, h]
                h1 = jnp.stack([cur[0][h:], cur[1][h:]])
                half_d = d // 2
                lowA = jax.lax.ppermute(
                    h0, AXIS, [(j, 2 * j) for j in range(half_d)]
                )
                lowB = jax.lax.ppermute(
                    h1, AXIS, [(j, 2 * j + 1) for j in range(half_d)]
                )
                highA = jax.lax.ppermute(
                    h0, AXIS, [(half_d + j, 2 * j) for j in range(half_d)]
                )
                highB = jax.lax.ppermute(
                    h1, AXIS, [(half_d + j, 2 * j + 1) for j in range(half_d)]
                )
                lowS = lowA + lowB    # disjoint destinations; other is zero
                highS = highA + highB
                low = (lowS[0], lowS[1])
                high = (highS[0], highS[1])
            cur = FJ.add(low, FJ.mul(beta, high))
            folded_parts.append(cur)

        vals_lo = jnp.concatenate([p[0] for p in folded_parts])
        vals_hi = jnp.concatenate([p[1] for p in folded_parts])

        # leaf-hash ALL layers at once, then parent levels batched across
        # layers (adjacent-pair hashing respects per-layer segment
        # boundaries because every segment is a power of two)
        cv = BJ.hash_leaves_u64_planes(
            vals_lo, vals_hi, jnp.asarray(BJ._prefix_words(b"")), 0
        )
        level_bufs = [cv]
        sizes = list(segs)  # current per-layer node counts in the buffer
        roots = [None] * dev_layers
        while True:
            # peel trailing size-1 segments (local roots)
            while sizes and sizes[-1] == 1:
                li = len(sizes) - 1
                off = sum(sizes[:-1])
                roots[li] = level_bufs[-1][:, off : off + 1]
                sizes = sizes[:-1]
            if not sizes:
                break
            width = sum(sizes)
            nxt = BJ.parent_level_planes(level_bufs[-1][:, :width])
            level_bufs.append(nxt)
            sizes = [s // 2 for s in sizes]

        # [L, 8] local roots -> [L, D, 8] replicated (local host pull on
        # every process of a multi-process mesh)
        rs = jnp.concatenate([r.T for r in roots], axis=0)
        roots_rep = jax.lax.all_gather(rs, AXIS, axis=1)

        # replicated tail (last folded layer) for the host fold
        tail = folded_parts[-1]
        if d > 1:
            tail_lo = jax.lax.all_gather(tail[0], AXIS).reshape(-1)
            tail_hi = jax.lax.all_gather(tail[1], AXIS).reshape(-1)
        else:
            tail_lo, tail_hi = tail[0], tail[1]

        keep_from = CHUNK_LOG2 if tops else 0
        return (
            vals_lo, vals_hi, tuple(level_bufs[keep_from:]), roots_rep,
            tail_lo, tail_hi,
        )

    n_levels = 0
    sizes = list(segs)
    while any(s > 1 for s in sizes):
        while sizes and sizes[-1] == 1:
            sizes = sizes[:-1]
        sizes = [s // 2 for s in sizes]
        n_levels += 1

    n_bufs = n_levels + 1 - (CHUNK_LOG2 if tops else 0)
    n_bufs = max(n_bufs, 0)
    f = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(AXIS), P(AXIS), P(), P()),
        out_specs=(
            P(AXIS), P(AXIS),
            tuple(P(None, AXIS) for _ in range(n_bufs)),
            P(),
            P(), P(),
        ),
        check_vma=False,
    )
    return jax.jit(f), mesh


# ---------------------------------------------------------------------------
# host orchestration
# ---------------------------------------------------------------------------


def raw_shard_args(mesh, d: int, blocks):
    """Build the 12 raw-input program arguments for the in-kernel column
    derivation: per-row arrays sharded over the mesh, per-block tables and
    cumsum anchors replicated. The per-shard carry handles shard
    boundaries that fall inside a block (partial within-block sums)."""
    from jax.sharding import PartitionSpec as P

    from ..stark.v1.columns_device import _host_inputs

    h = _host_inputs(blocks)
    n = h["n"]
    # exclusive tape-mv cumsum at each block start, via per-block sums
    # (no O(n*tau) i32 cumsum materialization)
    bs = h["block_start"]
    block_sums = np.add.reduceat(
        h["tape_mv"].astype(np.int64), bs, axis=0
    )  # [nb, tau]
    anchor = ((np.cumsum(block_sums, axis=0) - block_sums).T).astype(
        np.int32
    )  # [tau, nb]
    nloc = n // d
    starts = np.arange(d, dtype=np.int64) * nloc
    sb = np.searchsorted(bs, starts, side="right") - 1
    parts = np.stack(
        [
            h["tape_mv"][bs[sb[i]] : starts[i]].astype(np.int64).sum(axis=0)
            for i in range(d)
        ],
        axis=1,
    )  # [tau, D]
    carry_shard = (anchor[:, sb].astype(np.int64) + parts).astype(np.int32)
    return (
        _gin(mesh, P(AXIS), h["input_mv"]),
        _gin(mesh, P(None, AXIS), np.ascontiguousarray(h["tape_mv"].T)),
        _gin(mesh, P(None, AXIS),
             np.ascontiguousarray(h["wflag"].astype(np.uint8).T)),
        _gin(mesh, P(None, AXIS),
             np.ascontiguousarray(h["wsym"].astype(np.uint16).T)),
        _gin(mesh, P(AXIS), h["block_of"]),
        _gin(mesh, P(AXIS), h["is_first"]),
        _gin(mesh, P(AXIS), h["is_last"]),
        _gin(mesh, P(), np.ascontiguousarray(
            (h["win_len"] & 0xFFFFFFFF).astype(np.uint32).T)),
        _gin(mesh, P(), np.ascontiguousarray(
            (h["in_off"] & 0xFFFFFFFF).astype(np.uint32).T)),
        _gin(mesh, P(), np.ascontiguousarray(
            (h["out_off"] & 0xFFFFFFFF).astype(np.uint32).T)),
        _gin(mesh, P(), anchor),
        _gin(mesh, P(), carry_shard),
    )


class ShardedFri:
    """FRI engine whose folds, layer hashing, and trees run on the mesh.

    Same interface as stark/v1/fri_device.DeviceFri (commit_layer0 /
    commit_rest / final_value_le / open_queries); proof output is
    bit-identical to the host fri.py path."""

    def __init__(self, d: int, ln_log2: int, lde_lo, lde_hi, tree0, roots0,
                 mesh=None, tops: bool = False):
        from .mesh import make_mesh

        self.d = d
        self.mesh = mesh if mesh is not None else make_mesh(d)
        self.ln_log2 = ln_log2
        self.n = 1 << ln_log2
        self.lnloc = self.n // d
        self._tops = tops                   # tops-only tree storage
        self._lde = (lde_lo, lde_hi)        # [ln] natural, P(AXIS)
        self._tree0 = tree0                 # [8, D*W0] planes, P(None, AXIS)
        self._roots0 = roots0               # [D, 8]
        self._top_trees: Dict[int, "MerkleTree"] = {}
        self._roots: List[bytes] = []
        self._dev_layers = 0
        self._vals = None                   # folded values, device-major
        self._level_bufs: List = []
        self._level_off = 0
        self._host_layers: Dict[int, np.ndarray] = {}
        self._host_trees: Dict[int, object] = {}
        self._final_value: int | None = None
        # level widths of phase-2 buffers (per-layer segment bookkeeping)
        self._p2_segs: List[List[Tuple[int, int]]] = []  # per level: [(layer, off)]

    # ---- geometry helpers ----

    def _seg(self, layer: int) -> int:
        """Local leaf count of device layer `layer` (0 = LDE)."""
        return (self.n >> layer) // self.d

    def commit_layer0(self) -> bytes:
        jax = _jax()
        from ..stark.v1.merkle import MerkleTree

        roots = np.asarray(jax.device_get(self._roots0))  # [D, 8]
        leaves = _cv_bytes(roots)
        self._top_trees[0] = MerkleTree.from_leaves(leaves)
        return self._top_trees[0].root()

    def commit_rest(self, betas: List[int]) -> List[bytes]:
        jax = _jax()
        jnp = _jnp()
        from ..stark.v1 import fri as host_fri
        from ..stark.v1.merkle import MerkleTree

        self._dev_layers = max(1, self.ln_log2 - MIN_DEVICE_LAYER_LOG2)
        L = self._dev_layers
        f, _mesh = _build_phase2(self.d, self.ln_log2, L, self._tops)
        from jax.sharding import PartitionSpec as P

        bl = np.array([b & 0xFFFFFFFF for b in betas[:L]], dtype=np.uint32)
        bh = np.array([b >> 32 for b in betas[:L]], dtype=np.uint32)
        from .distributed import sync_execute

        vals_lo, vals_hi, level_bufs, roots_stacked, tail_lo, tail_hi = (
            sync_execute(
                f,
                self._lde[0], self._lde[1],
                _gin(self.mesh, P(), bl), _gin(self.mesh, P(), bh),
                tag="phase2",
            )
        )
        self._vals = (vals_lo, vals_hi)
        self._level_bufs = list(level_bufs)
        # in tops mode the stored buffers start at simulation level
        # CHUNK_LOG2 (lower levels are recomputed per queried chunk)
        self._level_off = CHUNK_LOG2 if self._tops else 0

        # per-level segment offsets: level j holds layers whose local seg
        # count is still > 1 after j-1 parentings, plus trailing roots at
        # the level where each layer collapses (peeled before parenting)
        self._p2_segs = []
        sizes = [self._seg(l) for l in range(1, L + 1)]
        cur = list(sizes)
        for _ in range(len(self._level_bufs) + self._level_off):
            offs = []
            o = 0
            for li, s in enumerate(cur):
                offs.append((li + 1, o, s))
                o += s
            self._p2_segs.append(offs)
            cur = [s // 2 for s in cur if s > 1]

        # one pull: all layer subtree roots + tail values
        roots_np, t_lo, t_hi = jax.device_get((roots_stacked, tail_lo, tail_hi))
        roots_np = np.asarray(roots_np)  # [L, D, 8]
        self._roots = []
        for l in range(L):
            leaves = _cv_bytes(roots_np[l])
            tree = MerkleTree.from_leaves(leaves)
            self._top_trees[l + 1] = tree
            self._roots.append(tree.root())

        # host tail: fold the remaining small layers
        tail = np.asarray(t_lo).astype(np.uint64) | (
            np.asarray(t_hi).astype(np.uint64) << np.uint64(32)
        )
        cur_vals = tail
        layer_idx = L
        while cur_vals.shape[0] > 1:
            cur_vals = host_fri.fold(cur_vals, betas[layer_idx])
            layer_idx += 1
            tree = host_fri.layer_tree(cur_vals)
            self._host_layers[layer_idx] = cur_vals
            self._host_trees[layer_idx] = tree
            self._roots.append(tree.root())
        self._final_value = int(cur_vals[0])
        return list(self._roots)

    def final_value_le(self) -> bytes:
        return int(self._final_value).to_bytes(8, "little")

    # ---- openings ----

    def _vals_flat_index(self, layer: int, idx: int) -> int:
        """Global index into the device-major phase-2 values buffer."""
        seg = self._seg(layer)
        dev = idx // seg
        local_off = sum(self._seg(l) for l in range(1, layer)) + (idx % seg)
        local_total = sum(self._seg(l) for l in range(1, self._dev_layers + 1))
        return dev * local_total + local_off

    def _node_ref(self, layer: int, level: int, pos: int):
        """(buffer_id, flat_col) of node (level, pos) in device layer trees.

        buffer_id: ("t0", j) for layer 0, ("p2", j) for folded layers.
        In tops mode only levels >= CHUNK_LOG2 are stored (plan_path never
        requests lower ones here)."""
        if layer == 0:
            seg = self.lnloc >> level
            dev = pos // seg
            base = self.lnloc >> CHUNK_LOG2 if self._tops else self.lnloc
            off0 = 2 * base - 2 * (self.lnloc >> level)
            return ("t0", 0), dev * (2 * base - 1) + off0 + (pos % seg)
        # phase-2 cross-layer level buffers
        seg = self._seg(layer) >> level
        dev = pos // seg
        offs = self._p2_segs[level]
        width = sum(s for (_l, _o, s) in offs)
        for (l, o, _s) in offs:
            if l == layer:
                return ("p2", level), dev * width + o + (pos % seg)
        raise KeyError((layer, level, pos))

    def open_queries(self, fri_rows: List[int]) -> List[FriQuery]:
        jax = _jax()
        jnp = _jnp()

        n_layers = self.ln_log2 + 1
        L = self._dev_layers

        # ---- planning pass: record every gather ----
        node_reqs: Dict[Tuple[str, int], List[int]] = {}
        node_seq: Dict[Tuple[str, int], Dict[int, int]] = {}
        val0_reqs: List[int] = []
        val0_seq: Dict[int, int] = {}
        val_reqs: List[int] = []
        val_seq: Dict[int, int] = {}

        def plan_value(layer: int, idx: int):
            if layer == 0:
                if idx not in val0_seq:
                    val0_seq[idx] = len(val0_reqs)
                    val0_reqs.append(idx)
                return ("val0", val0_seq[idx])
            if layer > L:
                return ("hostlayer", (layer, idx))
            flat = self._vals_flat_index(layer, idx)
            if flat not in val_seq:
                val_seq[flat] = len(val_reqs)
                val_reqs.append(flat)
            return ("val", val_seq[flat])

        chunk_reqs: Dict[Tuple[int, int], int] = {}  # (layer, chunk) -> order

        def plan_path(layer: int, layer_len: int, target: int):
            if layer > L:
                return ("hosttree", layer, target)
            s = (layer_len // self.d).bit_length() - 1  # local subtree height
            refs = []
            prefix = None
            lev0 = 0
            if self._tops:
                # levels below the chunk boundary are not stored: the whole
                # in-chunk path prefix is recomputed from the chunk's leaf
                # values (one Merkle rebuild per distinct (layer, chunk))
                c_eff = min(CHUNK_LOG2, s)
                if c_eff > 0:
                    cid = target >> c_eff
                    chunk_reqs.setdefault((layer, cid), len(chunk_reqs))
                    prefix = ("chunk", (layer, cid),
                              target & ((1 << c_eff) - 1))
                    lev0 = c_eff
            t = target >> lev0
            for lev in range(lev0, s):
                sib = t ^ 1
                buf, flat = self._node_ref(layer, lev, sib)
                lst = node_reqs.setdefault(buf, [])
                seq = node_seq.setdefault(buf, {})
                if flat not in seq:
                    seq[flat] = len(lst)
                    lst.append(flat)
                refs.append((buf, seq[flat]))
                t >>= 1
            return ("dev", refs, ("top", layer, target >> s), prefix)

        plans = []
        for idx0 in fri_rows:
            positions = []
            layer_plan = []
            idx = idx0
            layer_len = self.n
            for l in range(n_layers - 1):
                positions.append(idx)
                half = layer_len // 2
                j = idx ^ half
                layer_plan.append(
                    (
                        plan_value(l, idx), plan_path(l, layer_len, idx),
                        plan_value(l, j), plan_path(l, layer_len, j),
                    )
                )
                idx = idx % half
                layer_len = half
            positions.append(idx)
            plans.append((positions, layer_plan))

        # ---- one batched pull (replicated-output jitted gathers: safe on
        # multi-process meshes where the shards live on other hosts) ----
        g_val, g_plane = _gather_fns(self.mesh)
        pulls = {}
        if val0_reqs:
            i0 = np.array(val0_reqs, dtype=np.int32)
            pulls["v0lo"] = g_val(self._lde[0], i0)
            pulls["v0hi"] = g_val(self._lde[1], i0)
        if val_reqs:
            iv = np.array(val_reqs, dtype=np.int32)
            pulls["vlo"] = g_val(self._vals[0], iv)
            pulls["vhi"] = g_val(self._vals[1], iv)
        for buf, idxs in node_reqs.items():
            arr = (
                self._tree0
                if buf[0] == "t0"
                else self._level_bufs[buf[1] - self._level_off]
            )
            pulls[f"n:{buf[0]}:{buf[1]}"] = g_plane(
                arr, np.array(idxs, np.int32)
            )
        # chunk leaf values for tops-mode in-chunk path recomputes: each
        # chunk is a contiguous run of layer values (contiguous in the lde
        # for layer 0, contiguous in the device-major vals buffer otherwise)
        chunk_list = sorted(chunk_reqs, key=chunk_reqs.get)
        ch0_idx, chv_idx = [], []
        ch_slices = {}
        for (layer, cid) in chunk_list:
            s = (self._seg(layer)).bit_length() - 1
            c_eff = min(CHUNK_LOG2, s)
            sz = 1 << c_eff
            base = cid << c_eff
            if layer == 0:
                ch_slices[(layer, cid)] = ("c0", len(ch0_idx), sz)
                ch0_idx.extend(range(base, base + sz))
            else:
                flat = self._vals_flat_index(layer, base)
                ch_slices[(layer, cid)] = ("cv", len(chv_idx), sz)
                chv_idx.extend(range(flat, flat + sz))
        if ch0_idx:
            i0c = np.array(ch0_idx, dtype=np.int32)
            pulls["c0lo"] = g_val(self._lde[0], i0c)
            pulls["c0hi"] = g_val(self._lde[1], i0c)
        if chv_idx:
            ivc = np.array(chv_idx, dtype=np.int32)
            pulls["cvlo"] = g_val(self._vals[0], ivc)
            pulls["cvhi"] = g_val(self._vals[1], ivc)
        got = jax.device_get(pulls)

        chunk_trees = {}
        if chunk_list:
            from ..ops import goldilocks as G_
            from ..stark.v1 import fri as host_fri

            for key in chunk_list:
                kind, off, sz = ch_slices[key]
                lo = got["c0lo" if kind == "c0" else "cvlo"][off : off + sz]
                hi = got["c0hi" if kind == "c0" else "cvhi"][off : off + sz]
                vals = np.asarray(lo).astype(np.uint64) | (
                    np.asarray(hi).astype(np.uint64) << np.uint64(32)
                )
                chunk_trees[key] = host_fri.layer_tree(vals)
        node_bytes = {
            buf: _cv_bytes(np.asarray(got[f"n:{buf[0]}:{buf[1]}"]))
            for buf in node_reqs
        }
        v0lo = got.get("v0lo"); v0hi = got.get("v0hi")
        vlo = got.get("vlo"); vhi = got.get("vhi")

        def value_bytes(ref) -> bytes:
            kind, x = ref
            if kind == "val0":
                return (int(v0lo[x]) | (int(v0hi[x]) << 32)).to_bytes(8, "little")
            if kind == "hostlayer":
                layer, idx = x
                return int(self._host_layers[layer][idx]).to_bytes(8, "little")
            return (int(vlo[x]) | (int(vhi[x]) << 32)).to_bytes(8, "little")

        def path_bytes(p) -> List[bytes]:
            if p[0] == "hosttree":
                _, layer, target = p
                return self._host_trees[layer].open(target)
            _, refs, (_t, layer, top_idx), prefix = p
            out = []
            if prefix is not None:
                _c, key, in_chunk = prefix
                out += chunk_trees[key].open(in_chunk)
            out += [node_bytes[buf][i].tobytes() for buf, i in refs]
            out += self._top_trees[layer].open(top_idx)
            return out

        queries = []
        for positions, layer_plan in plans:
            pairs = [
                (value_bytes(vi), path_bytes(pi), value_bytes(vj), path_bytes(pj))
                for vi, pi, vj, pj in layer_plan
            ]
            queries.append(FriQuery(positions=positions, pairs=pairs))
        return queries


class ShardedPipeline:
    """Builds the composition + DEEP-LDE + FRI of a proof across the mesh.

    Entry point used by prove_v1 via ShardedProverEngine.deep_lde_fri."""

    def __init__(self, mesh, tc, shift: int = 3, blocks=None):
        self.mesh = mesh
        self.d = int(mesh.devices.size)
        self.tc = tc
        self.blocks = blocks  # raw block summaries: enables the in-kernel
        #                       per-shard column derivation (no [C, n] host
        #                       materialization)

    def deep_lde_fri(self, alphas, mask_coeffs, blow_log2: int, shift: int,
                     z: int) -> ShardedFri:
        jnp = _jnp()
        from ..stark.v1.columns import all_labels

        tc = self.tc
        n = tc.n
        base_log2 = n.bit_length() - 1
        tau = tc.tau
        labels = all_labels(tau)

        a_list = [
            alphas.bool_flag, alphas.mv_domain, alphas.head_update,
            alphas.head_bits_bool, alphas.head_reconstruct,
            alphas.slack_bits_bool, alphas.slack_reconstruct,
            alphas.sym_bits_bool, alphas.sym_reconstruct,
            alphas.boundary_first, alphas.boundary_last,
        ]
        a = np.array(a_list, dtype=np.uint64)
        mc = np.array(mask_coeffs, dtype=np.uint64)
        zp = np.uint64(z)

        from jax.sharding import PartitionSpec as P

        tops = (base_log2 + blow_log2) >= _tops_threshold_log2()
        raw = self.blocks is not None
        mesh = self.mesh
        import jax

        if raw:
            nb = len(self.blocks)
            f, _mesh, tabs = _build_phase1(
                self.d, base_log2, blow_log2, tau, mc.shape[0], mc.shape[1],
                shift, nb=nb, raw=True, tops=tops,
            )
            head_args = raw_shard_args(mesh, self.d, self.blocks)
        else:
            cols = np.empty((len(labels), n), dtype=np.uint64)
            for i, lb in enumerate(labels):
                cols[i] = tc.column_by_label(lb)
            cols_lo = (cols & np.uint64(0xFFFFFFFF)).astype(np.uint32)
            cols_hi = (cols >> np.uint64(32)).astype(np.uint32)
            f, _mesh, tabs = _build_phase1(
                self.d, base_log2, blow_log2, tau, mc.shape[0], mc.shape[1],
                shift, tops=tops,
            )
            head_args = (
                _gin(mesh, P(None, AXIS), cols_lo),
                _gin(mesh, P(None, AXIS), cols_hi),
            )

        tab_args = {
            k: tabs[k]
            for k in (
                "t_inv1", "t_inv2", "t_f1", "t_f2", "w_inv", "w_fwd",
                "inv_n", "s1", "s2", "x1", "x2", "xs_loc", "xs_dev",
            )
        }
        if jax.process_count() > 1:
            tab_args = jax.tree_util.tree_map(
                lambda x: make_global(mesh, P(), np.asarray(x)), tab_args
            )
        from .distributed import sync_execute

        lde_lo, lde_hi, tree0, roots0 = sync_execute(
            f,
            *head_args,
            _gin(mesh, P(), (a & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
            _gin(mesh, P(), (a >> np.uint64(32)).astype(np.uint32)),
            _gin(mesh, P(), (mc & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
            _gin(mesh, P(), (mc >> np.uint64(32)).astype(np.uint32)),
            _gin(mesh, P(), np.uint32(zp & np.uint64(0xFFFFFFFF))),
            _gin(mesh, P(), np.uint32(zp >> np.uint64(32))),
            tab_args,
            tag="phase1",
        )
        return ShardedFri(
            self.d, base_log2 + blow_log2, lde_lo, lde_hi, tree0, roots0,
            mesh=mesh, tops=tops,
        )
