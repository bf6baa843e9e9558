"""Sharded proving step: the multi-chip core of the STARK v1 prover.

One jitted SPMD program over a 1-D mesh that runs the heavy device-side
pipeline of a proof round with the evaluation domain sharded across chips:

  1. column leaf hashing for the sharded trace slice (batched BLAKE3),
     reduced to per-device subtree roots  (commitment phase)
  2. distributed DEEP coset LDE: INTT -> coset-scaled NTT via the four-step
     algorithm (the only cross-chip traffic is one all_to_all per transform)
  3. DEEP division by (x - z) with a vectorized Fermat inverse
  4. first FRI fold y' = y_lo + beta * y_hi (needs a halves exchange:
     expressed as an all_to_all pairing of shard halves)
  5. FRI layer leaf hashing + local subtree roots, all_gathered so host 0
     can extend the sequential Fiat-Shamir transcript deterministically

This is the "training step" equivalent for the dry-run harness; it compiles
and runs under pjit/shard_map on any mesh size that divides the shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import blake3_jax as BJ
from ..ops import goldilocks as G
from ..ops import goldilocks_jax as FJ
from ..ops import ntt as ntt_host
from ..ops import ntt_jax
from .mesh import AXIS


def build_prove_step(mesh: Mesh, base_log2: int, blow_log2: int = 3):
    """Compile the sharded proving step for a 2^base_log2 trace domain."""
    d = mesh.devices.size
    n = 1 << base_log2
    lde_log2 = base_log2 + blow_log2
    lde_n = 1 << lde_log2
    assert n % d == 0 and (n // d) & (n // d - 1) == 0

    # four-step split for both transforms
    b1 = base_log2 // 2
    b2 = base_log2 - b1
    l1 = lde_log2 // 2
    l2 = lde_log2 - l1
    assert (1 << b2) % d == 0 and (1 << b1) % d == 0
    assert (1 << l2) % d == 0 and (1 << l1) % d == 0

    t_inv1 = ntt_jax._tables_packed(b1, True)
    t_inv2 = ntt_jax._tables_packed(b2, True)
    t_f1 = ntt_jax._tables_packed(l1, False)
    t_f2 = ntt_jax._tables_packed(l2, False)
    w_inv = FJ.pack(ntt_host.powers(G.inv(G.primitive_root_2exp(base_log2)), n))
    w_fwd = FJ.pack(ntt_host.powers(G.primitive_root_2exp(lde_log2), lde_n))
    inv_n = FJ.pack(np.uint64(G.inv(n)))
    shift_pows = FJ.pack(ntt_host.powers(3, n))
    xs = FJ.pack(
        G.mul(np.uint64(3), ntt_host.powers(G.primitive_root_2exp(lde_log2), lde_n))
    )

    def four_step(lo, hi, n1_log2, n2_log2, tabs1, tabs2, wtab):
        """Local body of the four-step transform; input [n1, n2loc] shard of
        A[j1, j2], output [n1/D, n2] shard of Y[k1, k2]."""
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

    def step(col_lo, col_hi, prefs, base_lo, base_hi, z_lo, z_hi, beta_lo, beta_hi):
        """Local shards:
        col_lo/hi  [C, n/D]  committed column slices (row-sharded)
        prefs      [C, 16]   per-column leaf-hash prefix words (replicated)
        base_lo/hi [2^b1, 2^b2/D]  composition evals A[j1, j2] shard
        z, beta    scalars (replicated)
        """
        # (1) column commitments: hash every column's shard and reduce each to
        # a local subtree root (vmapped over columns), then all_gather so
        # host 0 can extend the sequential transcript in canonical order.
        def one_col(lo, hi, pw):
            cv = BJ.hash_leaves_u64_words(lo, hi, pw, plen=20)
            return BJ.merkle_root_pow2(cv)[0]

        col_root = jax.vmap(one_col)(col_lo, col_hi, prefs)  # [C, 8]
        col_roots = jax.lax.all_gather(col_root, AXIS)  # [D, C, 8]

        # (2) distributed INTT (evals -> coeffs, natural -> k-major order)
        clo, chi = four_step(base_lo, base_hi, b1, b2, t_inv1, t_inv2, w_inv)
        clo, chi = FJ.mul((clo, chi), (inv_n[0], inv_n[1]))
        # coefficient index of entry [k1, k2] is k1 + 2^b1 * k2
        n1 = 1 << b1
        n1loc = n1 // d
        k1 = jax.lax.broadcasted_iota(jnp.uint32, clo.shape, 0) + (
            jax.lax.axis_index(AXIS).astype(jnp.uint32) * np.uint32(n1loc)
        )
        k2 = jax.lax.broadcasted_iota(jnp.uint32, clo.shape, 1)
        coeff_idx = k1 + np.uint32(n1) * k2

        # coset scale by shift^j (gather shift powers by coefficient index)
        slo = shift_pows[0][coeff_idx]
        shi = shift_pows[1][coeff_idx]
        clo, chi = FJ.mul((clo, chi), (slo, shi))

        # (3) scatter coefficients into the zero-padded LDE four-step layout.
        # LDE input A'[j1', j2'] with j' = coeff_idx (zero padding above n).
        # We all_gather the coefficient shard and rebuild the local LDE slice;
        # on real meshes this is an all_gather of n elements (coeffs are small
        # relative to the blown-up domain).
        flat_lo = jax.lax.all_gather(clo, AXIS).reshape(-1)
        flat_hi = jax.lax.all_gather(chi, AXIS).reshape(-1)
        idx_all = jax.lax.all_gather(coeff_idx, AXIS).reshape(-1)
        coeffs_lo = jnp.zeros(n, jnp.uint32).at[idx_all].set(flat_lo)
        coeffs_hi = jnp.zeros(n, jnp.uint32).at[idx_all].set(flat_hi)

        ln1, ln2 = 1 << l1, 1 << l2
        ln2loc = ln2 // d
        di = jax.lax.axis_index(AXIS)
        # local LDE input slice: A'[j1, j2] for j2 in this shard
        j1 = jax.lax.broadcasted_iota(jnp.uint32, (ln1, ln2loc), 0)
        j2 = jax.lax.broadcasted_iota(jnp.uint32, (ln1, ln2loc), 1) + (
            di.astype(jnp.uint32) * np.uint32(ln2loc)
        )
        j = j1 * np.uint32(ln2) + j2
        in_range = j < np.uint32(n)
        j_clamped = jnp.where(in_range, j, 0)
        llo = jnp.where(in_range, coeffs_lo[j_clamped], 0)
        lhi = jnp.where(in_range, coeffs_hi[j_clamped], 0)

        ylo, yhi = four_step(llo, lhi, l1, l2, t_f1, t_f2, w_fwd)
        # Y[k1, k2] shard over k1; LDE point index k = k1 + ln1*k2
        ln1loc = ln1 // d
        yk1 = jax.lax.broadcasted_iota(jnp.uint32, ylo.shape, 0) + (
            di.astype(jnp.uint32) * np.uint32(ln1loc)
        )
        yk2 = jax.lax.broadcasted_iota(jnp.uint32, ylo.shape, 1)
        kidx = yk1 + np.uint32(ln1) * yk2

        # (4) DEEP divide by (x_k - z)
        xk = (xs[0][kidx], xs[1][kidx])
        zb = (jnp.broadcast_to(z_lo, ylo.shape), jnp.broadcast_to(z_hi, ylo.shape))
        denom = FJ.sub(xk, zb)
        y = FJ.mul((ylo, yhi), ntt_jax._pow_p_minus_2(denom))

        # (5) first FRI fold: y'[k] = y[k] + beta * y[k + lde_n/2]
        half = lde_n // 2
        is_low = kidx < np.uint32(half)
        partner = jnp.where(is_low, kidx + np.uint32(half), kidx - np.uint32(half))
        # exchange: with k1-major sharding the partner of k lives on shard
        # (partner's k1) — pair via all_gather of the shard (dry-run scale);
        # production kernels use a ppermute of the half-planes instead.
        full_lo = jax.lax.all_gather(y[0], AXIS).reshape(-1)
        full_hi = jax.lax.all_gather(y[1], AXIS).reshape(-1)
        # build LDE-ordered lookup: position kidx within gathered [D, n1loc, n2]
        # gathered flat order is (shard, k1_loc, k2) == k1-major: index k ->
        # flat = k1 * ln2 + k2 where k1 = k % ln1, k2 = k // ln1
        pk1 = partner % np.uint32(ln1)
        pk2 = partner // np.uint32(ln1)
        pflat = pk1 * np.uint32(ln2) + pk2
        plo = full_lo[pflat]
        phi = full_hi[pflat]
        beta = (jnp.broadcast_to(beta_lo, ylo.shape), jnp.broadcast_to(beta_hi, ylo.shape))
        low = (jnp.where(is_low, y[0], plo), jnp.where(is_low, y[1], phi))
        high = (jnp.where(is_low, plo, y[0]), jnp.where(is_low, phi, y[1]))
        folded = FJ.add(low, FJ.mul(beta, high))

        # (6) FRI layer-0 leaf hashing for this shard + subtree root gather
        fri_cv = BJ.hash_leaves_u64(y[0].reshape(-1), y[1].reshape(-1))
        fri_root = BJ.merkle_root_pow2(fri_cv)[0]
        fri_roots = jax.lax.all_gather(fri_root, AXIS)

        return col_roots, y, folded, fri_roots

    f = shard_map(
        step,
        mesh=mesh,
        in_specs=(
            P(None, AXIS),
            P(None, AXIS),
            P(None, None),
            P(None, AXIS),
            P(None, AXIS),
            P(),
            P(),
            P(),
            P(),
        ),
        out_specs=(
            P(None, None, None),
            (P(AXIS, None), P(AXIS, None)),
            (P(AXIS, None), P(AXIS, None)),
            P(None, None),
        ),
        check_vma=False,
    )
    return jax.jit(f)
