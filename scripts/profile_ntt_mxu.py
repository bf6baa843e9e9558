"""Phase-level timing breakdown of the MXU NTT at a given size.

Times (amortized over chained jits): the full forward transform, each DFT
phase in isolation, digit decomposition alone, and a bare int8 matmul of the
same shape as one phase's digit stack — to locate the gap between measured
throughput and the MXU roofline (ROOFLINE.md).

Usage: python scripts/profile_ntt_mxu.py [--k 24] [--trace DIR]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timeit(fn, *args, iters=5, chain=1):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / (iters * chain)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=24)
    ap.add_argument("--trace", default=None, help="jax.profiler trace dir")
    args = ap.parse_args()

    from sezkp_tpu.utils.config import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from sezkp_tpu.ops import goldilocks as G
    from sezkp_tpu.ops import goldilocks_jax as FJ
    from sezkp_tpu.ops import ntt_mxu as NM

    k = args.k
    n = 1 << k
    rng = np.random.default_rng(0)
    a = rng.integers(0, int(G.P), n, dtype=np.uint64)
    lo, hi = FJ.pack(a)
    lo = jax.device_put(lo)
    hi = jax.device_put(hi)

    logs = NM._factor_logs(k)
    print(f"n=2^{k} factors={logs}")

    CHAIN = 4
    full = NM._build(k, False)

    @jax.jit
    def chained(lo, hi):
        l, h = lo, hi
        for _ in range(CHAIN):
            l, h = full(l, h)
        return l, h

    dt = _timeit(chained, lo, hi, chain=CHAIN)
    print(f"full forward: {dt*1e3:.3f} ms  ({n/dt/1e9:.2f} Gpts/s)")

    # one isolated DFT phase of the largest factor (axis 0, no twiddle)
    m_log2 = max(logs)
    m = 1 << m_log2
    other = n // m
    w = NM._w_digits(m_log2, False)
    phase = NM._dft_call(m_log2, other, 0, w)

    @jax.jit
    def phase_chained(lo, hi):
        l, h = lo.reshape(m, other), hi.reshape(m, other)
        for _ in range(CHAIN):
            l, h = phase(l, h)
        return l, h

    dt_p = _timeit(phase_chained, lo, hi, chain=CHAIN)
    print(f"one phase (m=2^{m_log2}): {dt_p*1e3:.3f} ms "
          f"(x{len(logs)} phases = {len(logs)*dt_p*1e3:.3f} ms)")

    # bare int8 matmul with the same MXU work as one phase's 81 digit dots:
    # 9 dots of [m, m] @ [m, NDIG*tile] over the full grid
    tile = NM._default_tile(m_log2, other)
    grid = other // tile
    w8 = jnp.asarray(rng.integers(-128, 128, (NM.NDIG * m, m), dtype=np.int8))
    x8 = jnp.asarray(
        rng.integers(-128, 128, (m, NM.NDIG * other), dtype=np.int8)
    )

    @jax.jit
    def bare(x8):
        acc = None
        for j in range(NM.NDIG):
            p = jax.lax.dot_general(
                w8[j * m : (j + 1) * m, :], x8,
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32,
            )
            acc = p if acc is None else acc + p
        return acc

    dt_m = _timeit(bare, x8)
    macs = NM.NDIG * NM.NDIG * m * m * other
    print(f"bare 81-dot int8 matmul (XLA, same shapes): {dt_m*1e3:.3f} ms "
          f"({2*macs/dt_m/1e12:.1f} TOPS vs 394.7 peak)")

    # digit decomposition alone
    @jax.jit
    def digs(lo, hi):
        d = NM._digits(lo.reshape(m, other), hi.reshape(m, other))
        return jnp.concatenate(d, axis=1)

    dt_d = _timeit(digs, lo, hi)
    print(f"digit decomposition alone: {dt_d*1e3:.3f} ms")

    if args.trace:
        from sezkp_tpu.utils import tracing

        with jax.profiler.trace(args.trace):
            out = chained(lo, hi)
            jax.block_until_ready(out)
        print(f"trace written to {args.trace}")


if __name__ == "__main__":
    main()
