#!/usr/bin/env python
"""Measure the host-serialized share of a warm v1 prove (VERDICT r3 item 6).

SCALING.md's efficiency model needs t_host: the host-side transcript work
(root pulls' deserialization, Fiat-Shamir, query planning, proof assembly,
upload packing) that does not shrink with mesh size D. This measures it
with cProfile on a warm prove on the current backend: host seconds = total
wall minus time blocked inside jax's execute/transfer frames (device work
+ sync), both read from the same profile. No code changes, one run, real
numbers.

Usage: python scripts/measure_host_transcript.py [--t-log2 22] [--tag r04]
Writes benchmarks/reports/host_transcript_<tag>.json.
"""

from __future__ import annotations

import argparse
import cProfile
import json
import pathlib
import pstats
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

# frames whose tottime is device execution / transfer / sync, not host work.
# On this image's backend the dominant wait frame is jax Array._value (the
# np.asarray sync+fetch path); dispatch/upload shows as batched_device_put.
DEVICE_FRAME_MARKERS = (
    "_value",
    "ExecuteSharded",
    "block_until_ready",
    "_copy_to_host_async",
    "device_get",
    "batched_device_put",
    "<built-in method jaxlib",
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--t-log2", type=int, default=22)
    ap.add_argument("--b", type=int, default=512)
    ap.add_argument("--tau", type=int, default=8)
    ap.add_argument("--tag", default="r04")
    args = ap.parse_args()

    import jax

    from sezkp_tpu.stark.v1.prover import prove_v1
    from sezkp_tpu.trace.generator import generate_trace
    from sezkp_tpu.trace.partition import partition_trace
    from sezkp_tpu.utils.config import enable_compile_cache

    enable_compile_cache()
    t = 1 << args.t_log2
    blocks = partition_trace(generate_trace(t, args.tau), args.b)
    root = bytes([7]) * 32
    prove_v1(blocks, root)  # warm: compiles cached

    pr = cProfile.Profile()
    t0 = time.perf_counter()
    pr.enable()
    prove_v1(blocks, root)
    pr.disable()
    total_s = time.perf_counter() - t0

    st = pstats.Stats(pr)
    device_s = 0.0
    top_device = []
    for (fn_file, _line, fn_name), (_cc, _nc, tt, _ct, _callers) in st.stats.items():
        key = f"{fn_file}:{fn_name}"
        if any(m in fn_name or m in fn_file for m in DEVICE_FRAME_MARKERS):
            device_s += tt
            if tt > 0.01:
                top_device.append((round(tt, 3), key))
    host_s = max(0.0, total_s - device_s)

    rec = {
        "backend": jax.default_backend(),
        "t_log2": args.t_log2,
        "b": args.b,
        "tau": args.tau,
        "total_warm_s": round(total_s, 3),
        "device_blocked_s": round(device_s, 3),
        "host_serial_s": round(host_s, 3),
        "host_fraction": round(host_s / total_s, 4),
        "top_device_frames": sorted(top_device, reverse=True)[:8],
    }
    out = pathlib.Path(__file__).resolve().parent.parent / "benchmarks" / "reports"
    out.mkdir(parents=True, exist_ok=True)
    (out / f"host_transcript_{args.tag}.json").write_text(json.dumps(rec, indent=1))
    print(json.dumps(rec, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
