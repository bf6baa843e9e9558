"""Large-T single-chip STARK v1 prove timing (the VERDICT round-1 item 7
artifact: T up to 2^24, tau=8, LDE 2^27 on one TPU chip).

Runs simulate -> commit -> prove (cold + warm) -> verify at the requested
trace length and appends one JSON record per run to
benchmarks/reports/prove_large.jsonl.

Usage: python scripts/scale_prove_large.py --t-log2 24 [--b 512] [--tau 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--t-log2", type=int, required=True)
    ap.add_argument("--b", type=int, default=512)
    ap.add_argument("--tau", type=int, default=8)
    ap.add_argument("--skip-warm", action="store_true")
    ap.add_argument("--skip-verify", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from sezkp_tpu.utils.config import enable_compile_cache

    enable_compile_cache()

    import jax

    from sezkp_tpu.commit.merkle import commit_blocks
    from sezkp_tpu.stark.v1.proof import encode_proof
    from sezkp_tpu.stark.v1.prover import prove_v1
    from sezkp_tpu.stark.v1.verify import verify_v1
    from sezkp_tpu.trace.generator import generate_trace
    from sezkp_tpu.trace.partition import partition_trace

    t = 1 << args.t_log2
    rec = {
        "t_log2": args.t_log2,
        "b": args.b,
        "tau": args.tau,
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
    }

    t0 = time.perf_counter()
    tf = generate_trace(t, args.tau)
    rec["simulate_s"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    blocks = partition_trace(tf, args.b)
    del tf
    rec["partition_s"] = round(time.perf_counter() - t0, 3)
    rec["n_blocks"] = len(blocks)

    t0 = time.perf_counter()
    root = commit_blocks(blocks).root
    rec["commit_s"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    proof = prove_v1(blocks, root)
    rec["prove_cold_s"] = round(time.perf_counter() - t0, 3)
    rec["proof_bytes"] = len(encode_proof(proof))

    if not args.skip_warm:
        t0 = time.perf_counter()
        proof = prove_v1(blocks, root)
        rec["prove_warm_s"] = round(time.perf_counter() - t0, 3)

    if not args.skip_verify:
        t0 = time.perf_counter()
        verify_v1(proof, blocks)
        rec["verify_s"] = round(time.perf_counter() - t0, 3)
        rec["verified"] = True

    out = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "benchmarks", "reports", "prove_large.jsonl",
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
