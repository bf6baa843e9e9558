"""Pipeline benchmark harness: gen -> partition -> commit -> prove -> verify.

Mirrors the reference bench harness (benchmarks/harness/src/main.rs): per-stage
wall-clock ms appended as CSV rows to benchmarks/reports/bench-<unix>.csv,
driven by TOML profiles (t, b, tau, repeats).

Usage:
  python benchmarks/harness.py --profile benchmarks/profiles/small.toml --backend stark
  python benchmarks/harness.py --profile benchmarks/profiles/medium.toml --backend fold
"""

from __future__ import annotations

import argparse
import os
import sys
import time
import tomllib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--profile", default="benchmarks/profiles/small.toml")
    ap.add_argument("--backend", default="stark", choices=["stark", "fold", "stark-v1"])
    args = ap.parse_args()

    with open(args.profile, "rb") as f:
        profile = tomllib.load(f)
    t, b, tau, repeats = profile["t"], profile["b"], profile["tau"], profile["repeats"]
    print(f"Profile: t={t}, b={b}, tau={tau}, repeats={repeats}, backend={args.backend}")

    from sezkp_tpu.commit.merkle import (
        commit_block_file,
        verify_block_file_against_manifest,
    )
    from sezkp_tpu.core.io import write_block_summaries_auto, write_proof_auto
    from sezkp_tpu.models import get_backend
    from sezkp_tpu.trace.generator import generate_trace
    from sezkp_tpu.trace.partition import partition_trace

    backend = get_backend({"stark": "stark-v0"}.get(args.backend, args.backend))

    os.makedirs("benchmarks/reports", exist_ok=True)
    ts = int(time.time())
    csv_path = f"benchmarks/reports/bench-{ts}.csv"
    csv = open(csv_path, "a")
    csv.write("timestamp,backend,t,b,tau,repeat,stage,ms,extra\n")

    def row(rep, stage, ms, extra=""):
        csv.write(f"{ts},{args.backend},{t},{b},{tau},{rep},{stage},{round(ms)},{extra}\n")

    for rep in range(repeats):
        blocks_path = f"benchmarks/tmp-blocks-{ts}-{rep}.cbor"
        manifest_path = f"benchmarks/tmp-manifest-{ts}-{rep}.cbor"
        proof_path = f"benchmarks/tmp-proof-{ts}-{rep}.cbor"

        t0 = time.perf_counter()
        tf = generate_trace(t, tau)
        row(rep, "gen", (time.perf_counter() - t0) * 1e3)

        t0 = time.perf_counter()
        blocks = partition_trace(tf, b)
        row(rep, "partition", (time.perf_counter() - t0) * 1e3, f"n_blocks={len(blocks)}")

        write_block_summaries_auto(blocks_path, blocks)
        t0 = time.perf_counter()
        manifest = commit_block_file(blocks_path, manifest_path)
        row(rep, "commit", (time.perf_counter() - t0) * 1e3, f"root={manifest.root.hex()}")

        t0 = time.perf_counter()
        art = backend.prove(blocks, manifest.root)
        prove_ms = (time.perf_counter() - t0) * 1e3
        write_proof_auto(proof_path, art)
        row(rep, "prove", prove_ms, f"proof_bytes={len(art.proof_bytes)}")

        t0 = time.perf_counter()
        verify_block_file_against_manifest(blocks_path, manifest_path)
        backend.verify(art, blocks, manifest.root)
        row(rep, "verify", (time.perf_counter() - t0) * 1e3)

        for p in (blocks_path, manifest_path, proof_path):
            try:
                os.remove(p)
            except OSError:
                pass

    csv.close()
    print(f"Wrote report -> {csv_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
