"""NTT microbenchmark (mirrors crates/sezkp-ffts/benches/ntt.rs):
forward/inverse NTT + coset LDE at n = 2^16 and 2^18 (plus larger sizes on
TPU), throughput in elements/sec, for host numpy / XLA / Pallas paths.

Usage: python benchmarks/ntt_bench.py [--sizes 16,18,20] [--iters 5]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench(label, fn, n, iters):
    fn()  # warm / compile
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:34s} {dt * 1e3:9.2f} ms   {n / dt / 1e6:8.1f} Melem/s")
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="16,18")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--host", action="store_true", help="include numpy host path")
    args = ap.parse_args()

    import jax

    from sezkp_tpu.ops import goldilocks as G
    from sezkp_tpu.ops import goldilocks_jax as FJ
    from sezkp_tpu.ops import ntt as N
    from sezkp_tpu.ops import ntt_jax as NJ
    from sezkp_tpu.ops import ntt_pallas as NP

    print(f"backend: {jax.default_backend()}")
    rng = np.random.default_rng(0)
    for k in [int(x) for x in args.sizes.split(",")]:
        n = 1 << k
        a = rng.integers(0, int(G.P), n, dtype=np.uint64)
        p = FJ.pack(a)
        lo = jax.device_put(p[0])
        hi = jax.device_put(p[1])

        if args.host:
            bench(f"host  forward_ntt 2^{k}", lambda: N.forward_ntt(a), n, 1)

        f_xla = NJ._jit_ntt(k, False)
        bench(
            f"xla   forward_ntt 2^{k}",
            lambda: jax.block_until_ready(f_xla(lo, hi)),
            n,
            args.iters,
        )
        n1 = min(10, k // 2)
        f_pal = NP._build(n1, k - n1, False)
        bench(
            f"pallas forward_ntt 2^{k}",
            lambda: jax.block_until_ready(f_pal(lo, hi)),
            n,
            args.iters,
        )
        f_pal_i = NP._build(n1, k - n1, True)
        bench(
            f"pallas inverse_ntt 2^{k}",
            lambda: jax.block_until_ready(f_pal_i(lo, hi)),
            n,
            args.iters,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
