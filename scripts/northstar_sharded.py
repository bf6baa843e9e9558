#!/usr/bin/env python
"""Execute the north-star sharded shape for real (VERDICT round-3 item 2).

Runs the FULL sharded v1 prover at T=2^23 (LDE 2^26 points), D=8 on the
virtual CPU mesh, asserts proof-byte parity against the single-chip prover,
and records MEASURED per-device peak live-buffer bytes (a background thread
samples jax.live_arrays() and buckets every addressable shard by device)
next to the process ru_maxrss. This converts SCALING.md's analytic
per-device memory table into an executed data point.

Usage:  python scripts/northstar_sharded.py [--t-log2 23] [--d 8] [--b 512]
        [--tau 8] [--sample-s 1.0] [--tag r04]

Writes benchmarks/reports/northstar_<tag>.json.
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import resource
import sys
import threading
import time

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

# the axon TPU plugin ignores JAX_PLATFORMS; pin through the config API
# before any backend initializes (same workaround as tests/conftest.py)
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


class DeviceMemSampler:
    """Peak per-device live-buffer bytes, sampled from jax.live_arrays()."""

    def __init__(self, interval_s: float):
        self.interval_s = interval_s
        self.peak_per_device: dict[str, int] = {}
        self.peak_total = 0
        self.samples = 0
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)

    def _sample(self):
        import jax

        per: dict[str, int] = {}
        for arr in jax.live_arrays():
            try:
                for sh in arr.addressable_shards:
                    d = str(sh.device)
                    per[d] = per.get(d, 0) + sh.data.nbytes
            except Exception:
                pass
        tot = sum(per.values())
        if tot > self.peak_total:
            self.peak_total = tot
        for d, v in per.items():
            if v > self.peak_per_device.get(d, 0):
                self.peak_per_device[d] = v
        self.samples += 1

    def _loop(self):
        while not self._stop.is_set():
            try:
                self._sample()
            except Exception:
                pass
            self._stop.wait(self.interval_s)

    def __enter__(self):
        self._thread.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        self._thread.join(timeout=10)
        self._sample()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--t-log2", type=int, default=23)
    ap.add_argument("--d", type=int, default=8)
    ap.add_argument("--b", type=int, default=512)
    ap.add_argument("--tau", type=int, default=8)
    ap.add_argument("--sample-s", type=float, default=1.0)
    ap.add_argument("--tag", default="r04")
    ap.add_argument("--skip-single", action="store_true",
                    help="skip the single-chip run (no parity check)")
    ap.add_argument("--single-sha", default=None,
                    help="sha256 of encode_proof from a single-chip run on "
                    "another backend (proof bytes are backend-invariant; "
                    "cross-checked TPU==CPU in tests) — enables the parity "
                    "check without re-proving single-chip on this backend")
    args = ap.parse_args()

    import hashlib

    import jax

    from sezkp_tpu.parallel.engine import prove_v1_sharded
    from sezkp_tpu.parallel.mesh import make_mesh
    from sezkp_tpu.stark.v1.proof import encode_proof
    from sezkp_tpu.stark.v1.prover import prove_v1
    from sezkp_tpu.trace.generator import generate_trace
    from sezkp_tpu.trace.partition import partition_trace
    from sezkp_tpu.utils.config import enable_compile_cache

    enable_compile_cache()
    t = 1 << args.t_log2
    print(f"devices: {jax.devices()}", flush=True)
    t0 = time.perf_counter()
    blocks = partition_trace(generate_trace(t, args.tau), args.b)
    print(f"trace+partition: {time.perf_counter()-t0:.1f}s "
          f"({len(blocks)} blocks)", flush=True)

    rec = {
        "t_log2": args.t_log2, "d": args.d, "b": args.b, "tau": args.tau,
        "lde_log2": args.t_log2 + 3,
    }

    single_sha = args.single_sha
    if single_sha:
        rec["single_chip_proof_sha256"] = single_sha
        rec["single_chip_source"] = "external (--single-sha)"
    elif not args.skip_single:
        t0 = time.perf_counter()
        host = prove_v1(blocks, bytes([7]) * 32)
        rec["single_chip_s"] = round(time.perf_counter() - t0, 1)
        single_sha = hashlib.sha256(encode_proof(host)).hexdigest()
        rec["single_chip_proof_sha256"] = single_sha
        del host
        print(f"single-chip prove: {rec['single_chip_s']}s", flush=True)

    mesh = make_mesh(args.d)
    with DeviceMemSampler(args.sample_s) as ms:
        t0 = time.perf_counter()
        shard = prove_v1_sharded(blocks, bytes([7]) * 32, mesh)
        rec["sharded_s"] = round(time.perf_counter() - t0, 1)
    shard_sha = hashlib.sha256(encode_proof(shard)).hexdigest()
    rec["sharded_proof_sha256"] = shard_sha
    rec["parity_ok"] = (single_sha == shard_sha) if single_sha else None
    rec["mem_samples"] = ms.samples
    rec["peak_device_bytes"] = dict(
        sorted(ms.peak_per_device.items())
    )
    rec["peak_device_gib_max"] = round(
        max(ms.peak_per_device.values(), default=0) / 2**30, 3
    )
    rec["peak_total_live_gib"] = round(ms.peak_total / 2**30, 3)
    rec["ru_maxrss_gib"] = round(
        resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 2**20, 3
    )

    out = pathlib.Path(__file__).resolve().parent.parent / "benchmarks" / "reports"
    out.mkdir(parents=True, exist_ok=True)
    path = out / f"northstar_{args.tag}.json"
    path.write_text(json.dumps(rec, indent=1))
    print(json.dumps(rec, indent=1), flush=True)
    if rec["parity_ok"] is False:
        print("PARITY MISMATCH", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
