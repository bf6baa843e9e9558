#!/usr/bin/env python
"""Measure the fold device-hash crossover on the real chip (VERDICT r3 #7).

The fold line hashes batches of equal-length transcript messages
(L = 320 B MACs). This script measures, per batch size:

  host_s         — host C++ BLAKE3 hash_many (the default path)
  tunnel_s       — hash_many_device end-to-end through this image's
                   ~30 MB/s TPU tunnel (prep + transfer + kernel + fetch)
  prep_s         — host-side packing (pad, u32 view, transpose) that any
                   transport pays
  kernel_s       — the Pallas chain kernel alone on device-resident input
                   (block_until_ready on the device output, no fetch)

and derives pcie_regime_s = prep + bytes/PCIE_BPS + kernel + out-fetch
(PCIe gen4 x16 sustained ~10 GB/s) — the co-located-host estimate the
devhash.py docstring cites. Every term except the PCIe wire time is a
real measurement from this run.

Writes benchmarks/reports/devhash_<tag>.json.
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

PCIE_BPS = 10e9
L = 320


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sezkp_tpu.crypto import blake3
    from sezkp_tpu.ops import blake3_jax as BJ

    tag = sys.argv[1] if len(sys.argv) > 1 else "r04"
    assert jax.default_backend() == "tpu", "run on the TPU image"

    rng = np.random.default_rng(0)
    rows = []
    for n in (4096, 16384, 65536):
        msgs = rng.integers(0, 256, size=(n, L), dtype=np.uint16).astype(np.uint8)

        t0 = time.perf_counter()
        host = blake3.hash_many(msgs)
        host_s = time.perf_counter() - t0

        dev = BJ.hash_many_device(msgs)  # warm/compile
        assert np.array_equal(host, dev), "device digests must be bit-identical"
        t0 = time.perf_counter()
        BJ.hash_many_device(msgs)
        tunnel_s = time.perf_counter() - t0

        # host-side packing alone
        nblocks = max(1, -(-L // 64))
        n_pad = max(8, 1 << (n - 1).bit_length())
        t0 = time.perf_counter()
        padded = np.zeros((n_pad, nblocks * 64), dtype=np.uint8)
        padded[:n, :L] = msgs
        m16_np = np.ascontiguousarray(padded.view("<u4").T)
        prep_s = time.perf_counter() - t0

        # kernel alone on resident input; dispatch latency dominates a
        # single call through the tunnel, so amortize over a BATCH of 8
        # kernel applications inside one jit (a co-located host pays
        # ~0.1 ms dispatch, not the tunnel's ~25 ms round trip)
        m16 = jax.device_put(jnp.asarray(m16_np))
        kern = BJ._jit_hash_many(L)

        @jax.jit
        def chained8(m):
            outs = []
            for i in range(8):
                outs.append(kern(m + jnp.uint32(i)))
            return outs

        jax.block_until_ready(chained8(m16))  # warm
        ts1, ts8 = [], []
        for _ in range(5):
            t0 = time.perf_counter()
            kern(m16).block_until_ready()
            ts1.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            jax.block_until_ready(chained8(m16))
            ts8.append(time.perf_counter() - t0)
        kernel_s = sorted(ts1)[2]
        single8 = sorted(ts8)[2]
        # per-application device time with dispatch amortized 8x
        kernel_amort_s = single8 / 8

        up_bytes = m16_np.nbytes
        down_bytes = n_pad * 32
        pcie_s = (
            prep_s + up_bytes / PCIE_BPS + kernel_amort_s + down_bytes / PCIE_BPS
        )
        rows.append(
            {
                "n": n,
                "msg_bytes": L,
                "host_s": round(host_s, 5),
                "tunnel_s": round(tunnel_s, 5),
                "prep_s": round(prep_s, 5),
                "kernel_s": round(kernel_s, 5),
                "kernel_amortized_s": round(kernel_amort_s, 5),
                "pcie_regime_s": round(pcie_s, 5),
                "device_wins_on_tunnel": tunnel_s < host_s,
                "device_wins_on_pcie": pcie_s < host_s,
            }
        )
        print(json.dumps(rows[-1]))

    out = pathlib.Path(__file__).resolve().parent.parent / "benchmarks" / "reports"
    out.mkdir(parents=True, exist_ok=True)
    path = out / f"devhash_{tag}.json"
    path.write_text(json.dumps({"pcie_bps": PCIE_BPS, "rows": rows}, indent=1))
    print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
