"""Decompose one MXU-NTT DFT phase into digits / dots / recombine costs.

Builds Pallas kernels that run only a subset of the phase pipeline
(same tiling as production `_dft_call`) and times each on the live backend:

  dots       : int8 digit stacks precomputed -> 81 digit dots -> write one diag
  dots+rec   : int8 stacks -> dots -> recombination/mod-p -> write (lo, hi)
  digits     : (lo, hi) -> 9 int8 digit planes -> write stack
  full       : production phase (digits + dots + recombine)
  full+tw    : production phase with a periodic twiddle (phase A config)
  transpose  : the final order-restoring [m1,m2,m3] -> [m3,m2,m1] HBM pass

Usage: python scripts/exp_ntt_breakdown.py [--k 24] [--tile N]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timeit(fn, *args, iters=10):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=24)
    ap.add_argument("--tile", type=int, default=None)
    args = ap.parse_args()

    from sezkp_tpu.utils.config import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl

    from sezkp_tpu.ops import goldilocks as G
    from sezkp_tpu.ops import goldilocks_jax as FJ
    from sezkp_tpu.ops import ntt_mxu as NM

    k = args.k
    n = 1 << k
    logs = NM._factor_logs(k)
    m_log2 = max(logs)
    m = 1 << m_log2
    other = n // m
    tile = args.tile or NM._default_tile(m_log2, other)
    grid = other // tile
    print(f"n=2^{k} m=2^{m_log2} other={other} tile={tile} grid={grid}")

    rng = np.random.default_rng(0)
    a = rng.integers(0, int(G.P), n, dtype=np.uint64)
    lo, hi = FJ.pack(a)
    lo = jax.device_put(lo.reshape(m, other))
    hi = jax.device_put(hi.reshape(m, other))
    w = NM._w_digits(m_log2, False)

    interp = NM._interpret()
    data_spec = pl.BlockSpec((m, tile), lambda i: (0, i))
    stack_spec = pl.BlockSpec((m, NM.NDIG * tile), lambda i: (0, i))
    w_spec = pl.BlockSpec(tuple(w.shape), lambda i: (0, 0))
    u32 = jnp.uint32

    x8 = jnp.asarray(
        rng.integers(-128, 128, (m, NM.NDIG * other), dtype=np.int8)
    )

    # --- dots only -------------------------------------------------------
    def k_dots(x_ref, w_ref, o_ref):
        diags = NM._dot_digits(x_ref[:, :], w_ref[:, :], m, tile, 0)
        acc = diags[0]
        for d in diags[1:]:
            acc = acc + d
        o_ref[:, :] = acc.astype(u32)

    f_dots = pl.pallas_call(
        k_dots,
        grid=(grid,),
        in_specs=[stack_spec, w_spec],
        out_specs=data_spec,
        out_shape=jax.ShapeDtypeStruct((m, other), u32),
        interpret=interp,
        compiler_params=None if interp else NM._params,
    )
    dt = _timeit(jax.jit(lambda x: f_dots(x, w)), x8)
    macs = NM.NDIG * NM.NDIG * m * n
    print(f"dots only       : {dt*1e3:7.3f} ms  ({2*macs/dt/1e12:6.1f} TOPS)")

    # --- dots + recombine ------------------------------------------------
    def k_dr(x_ref, w_ref, olo_ref, ohi_ref):
        diags = NM._dot_digits(x_ref[:, :], w_ref[:, :], m, tile, 0)
        l, h = NM._recombine(diags)
        olo_ref[:, :] = l
        ohi_ref[:, :] = h

    f_dr = pl.pallas_call(
        k_dr,
        grid=(grid,),
        in_specs=[stack_spec, w_spec],
        out_specs=[data_spec, data_spec],
        out_shape=[jax.ShapeDtypeStruct((m, other), u32)] * 2,
        interpret=interp,
        compiler_params=None if interp else NM._params,
    )
    dt = _timeit(jax.jit(lambda x: f_dr(x, w)), x8)
    print(f"dots + recombine: {dt*1e3:7.3f} ms")

    # --- digits only -----------------------------------------------------
    def k_dig(alo_ref, ahi_ref, o_ref):
        digs = NM._digits(alo_ref[:, :], ahi_ref[:, :])
        o_ref[:, :] = jnp.concatenate(digs, axis=1)

    f_dig = pl.pallas_call(
        k_dig,
        grid=(grid,),
        in_specs=[data_spec, data_spec],
        out_specs=stack_spec,
        out_shape=jax.ShapeDtypeStruct((m, NM.NDIG * other), jnp.int8),
        interpret=interp,
        compiler_params=None if interp else NM._params,
    )
    dt = _timeit(jax.jit(f_dig), lo, hi)
    print(f"digits only     : {dt*1e3:7.3f} ms")

    # --- full production phase ------------------------------------------
    phase = NM._dft_call(m_log2, other, 0, w, tile=tile)
    dt = _timeit(jax.jit(phase), lo, hi)
    print(f"full phase      : {dt*1e3:7.3f} ms")

    # --- full + periodic twiddle (phase-A config) ------------------------
    if len(logs) == 3:
        l1, l2, l3 = logs
        ta, tb = NM._t_outer(l1, l2, l3, False)
        pA = NM._dft_call(l1, (1 << l2) * (1 << l3), 0, NM._w_digits(l1, False),
                          t=tb, t_period=1 << l3, tile=tile)
        dt = _timeit(jax.jit(pA), lo.reshape(1 << l1, -1), hi.reshape(1 << l1, -1))
        print(f"phase A (+tw)   : {dt*1e3:7.3f} ms")

        m1, m2, m3 = 1 << l1, 1 << l2, 1 << l3
        w2 = NM._w_digits(l2, False)
        w3 = NM._w_digits(l3, False, 1)
        pB = NM._batched_call(m1, l2, m3, w2, NM._t_mid(l2, l3, False, False),
                              mode="wx", pre=ta)
        dt = _timeit(jax.jit(pB), lo.reshape(m1, m2, m3), hi.reshape(m1, m2, m3))
        print(f"phase B (batch) : {dt*1e3:7.3f} ms")
        pC = NM._batched_call(m1, l3, m2, w3, mode="xw_last")
        dt = _timeit(jax.jit(pC), lo.reshape(m1, m2, m3), hi.reshape(m1, m2, m3))
        print(f"phase C (batch) : {dt*1e3:7.3f} ms")

        @jax.jit
        def tr(lo, hi):
            l = lo.reshape(m1, m2, m3).transpose(2, 1, 0).reshape(n)
            h = hi.reshape(m1, m2, m3).transpose(2, 1, 0).reshape(n)
            return l, h

        dt = _timeit(tr, lo, hi)
        print(f"final transpose : {dt*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
