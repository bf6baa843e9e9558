"""Distributed four-step NTT over a 1-D device mesh.

Decompose n = n1 * n2 and view the coefficient vector as A[j1, j2]
(j = j1*n2 + j2). With k = k1 + n1*k2:

  step 1: column NTTs of size n1 (local; data sharded over j2)
  step 2: twiddle multiply by w^(j2*k1) (local)
  step 3: all_to_all reshard [n1, n2/D] -> [n1/D, n2] (the only ICI exchange)
  step 4: row NTTs of size n2 (local)

Output is Y[k1, k2] sharded over k1; the natural-order result vector is
transpose(Y).reshape(n). Bit-identical to the single-chip NTT (cross-tested).

The butterfly compute reuses ops/ntt_jax's batched stages; the exchange is a
single lax.all_to_all riding ICI, which is the bandwidth-optimal schedule for
a bandwidth-bound transpose (SURVEY.md section 7, hard part 6).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import goldilocks as G
from ..ops import goldilocks_jax as FJ
from ..ops import ntt as ntt_host
from ..ops import ntt_jax
from .mesh import AXIS


def _tables(n_log2: int, inverse: bool):
    return ntt_jax._tables_packed(n_log2, inverse)


@lru_cache(maxsize=16)
def _w_table_packed(n_log2: int, inverse: bool):
    w = G.primitive_root_2exp(n_log2)
    if inverse:
        w = G.inv(w)
    return FJ.pack(ntt_host.powers(w, 1 << n_log2))


def build_sharded_ntt(mesh: Mesh, n1_log2: int, n2_log2: int, inverse: bool = False):
    """Compile a sharded NTT of size n = 2^(n1_log2 + n2_log2).

    Returns f(lo, hi) mapping A[n1, n2] (sharded over axis 1) to Y[n1, n2]
    (sharded over axis 0) with Y[k1, k2] = y_{k1 + n1*k2}.
    """
    n1 = 1 << n1_log2
    n2 = 1 << n2_log2
    n_log2 = n1_log2 + n2_log2
    n = 1 << n_log2
    d = mesh.devices.size
    assert n2 % d == 0 and n1 % d == 0, "n1 and n2 must be divisible by mesh size"
    n2loc = n2 // d

    t1 = _tables(n1_log2, inverse)
    t2 = _tables(n2_log2, inverse)
    wtab = _w_table_packed(n_log2, inverse)
    mask = np.uint32(n - 1)

    inv_n = FJ.pack(np.uint64(G.inv(n))) if inverse else None

    def local(lo, hi):
        # lo/hi: [n1, n2loc]
        di = jax.lax.axis_index(AXIS)

        # step 1: NTT over j1 (axis 0): move to last axis
        lo_t, hi_t = lo.T, hi.T  # [n2loc, n1]
        lo_t, hi_t = ntt_jax._ntt_stages((lo_t, hi_t), t1, n1_log2)
        lo, hi = lo_t.T, hi_t.T  # [n1=k1, n2loc=j2]

        # step 2: twiddle w^(j2 * k1); exact in u32 since n is a power of two
        k1 = jax.lax.broadcasted_iota(jnp.uint32, (n1, n2loc), 0)
        j2 = jax.lax.broadcasted_iota(jnp.uint32, (n1, n2loc), 1) + (
            di.astype(jnp.uint32) * np.uint32(n2loc)
        )
        idx = (k1 * j2) & mask
        tw = (wtab[0][idx], wtab[1][idx])
        lo, hi = FJ.mul((lo, hi), tw)

        # step 3: reshard [n1, n2loc] -> [n1/D, n2] (single ICI all-to-all)
        lo = jax.lax.all_to_all(lo, AXIS, split_axis=0, concat_axis=1, tiled=True)
        hi = jax.lax.all_to_all(hi, AXIS, split_axis=0, concat_axis=1, tiled=True)

        # step 4: NTT over j2 (axis 1, full n2 now local)
        lo, hi = ntt_jax._ntt_stages((lo, hi), t2, n2_log2)

        if inverse:
            lo, hi = FJ.mul((lo, hi), (inv_n[0], inv_n[1]))
        return lo, hi

    f = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, AXIS), P(None, AXIS)),
        out_specs=(P(AXIS, None), P(AXIS, None)),
    )
    return jax.jit(f)


def sharded_ntt_u64(
    a: np.ndarray, mesh: Mesh, n1_log2: int | None = None, inverse: bool = False
) -> np.ndarray:
    """Host convenience: natural-order u64 in, natural-order u64 out."""
    n = a.shape[0]
    n_log2 = n.bit_length() - 1
    assert 1 << n_log2 == n
    if n1_log2 is None:
        n1_log2 = n_log2 // 2
    n2_log2 = n_log2 - n1_log2
    n1, n2 = 1 << n1_log2, 1 << n2_log2

    lo, hi = FJ.pack(np.asarray(a, dtype=np.uint64))
    A_lo = lo.reshape(n1, n2)
    A_hi = hi.reshape(n1, n2)
    f = build_sharded_ntt(mesh, n1_log2, n2_log2, inverse)
    y_lo, y_hi = f(A_lo, A_hi)
    y = FJ.unpack((jnp.asarray(y_lo), jnp.asarray(y_hi)))  # Y[k1, k2]
    return np.ascontiguousarray(y.T).reshape(n)  # k = k1 + n1*k2
