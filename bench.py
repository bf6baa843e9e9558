"""Benchmark entry point: prints ONE JSON line for the driver.

Metric: forward NTT throughput on the flagship TPU kernel at n = 2^24
(the prime cost driver of STARK v1 proving; reference microbench:
crates/sezkp-ffts/benches/ntt.rs measures the same transform in
elements/sec).

Timing is amortized over a chain of CHAIN dependent transforms inside one
jit, so it measures the kernel itself rather than per-dispatch overhead
(~1.5 ms through this image's TPU tunnel) — the prover launches many NTTs
per dispatch, so the amortized number is the one that matters end-to-end.

vs_baseline: ratio against an estimated 2.0 Mpts/s for the reference's
single-core Rust NTT at this size. The reference publishes no absolute
numbers (BASELINE.md); its `mul_raw` reduces via `u128 %` (a ~25-40 ns div
per multiply, crates/sezkp-ffts/src/lib.rs:76-80) and rebuilds twiddle
tables per call (ntt.rs:43-75), which bounds it to roughly 1-3 Mpts/s on a
modern core; we take 2.0 Mpts/s as the comparison point.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_PTS_PER_SEC = 2.0e6
K = 24
CHAIN = 4


def main() -> None:
    import numpy as np
    import jax

    from sezkp_tpu.ops import goldilocks as G
    from sezkp_tpu.ops import goldilocks_jax as FJ
    from sezkp_tpu.ops import ntt_jax as NJ

    n = 1 << K
    rng = np.random.default_rng(0)
    a = rng.integers(0, int(G.P), n, dtype=np.uint64)
    lo, hi = FJ.pack(a)
    lo = jax.device_put(lo)
    hi = jax.device_put(hi)

    if jax.default_backend() == "tpu":
        from sezkp_tpu.ops import ntt_mxu as NM

        f = NM._build(K, False)
    else:
        f = NJ._jit_ntt(K, False)

    @jax.jit
    def chained(lo, hi):
        for _ in range(CHAIN):
            lo, hi = f(lo, hi)
        return lo, hi

    out = chained(lo, hi)
    jax.block_until_ready(out)  # compile + warm

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        out = chained(lo, hi)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / (iters * CHAIN)

    pts_per_sec = n / dt
    print(
        json.dumps(
            {
                "metric": f"ntt_forward_points_per_sec_2pow{K}",
                "value": round(pts_per_sec),
                "unit": "points/s",
                "vs_baseline": round(pts_per_sec / BASELINE_PTS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
