#!/usr/bin/env bash
# Slow-tier CI surface (VERDICT round-2 item 6): runs every test the
# default tier deselects — the sharded-prover byte-parity matrix
# (mesh {2,4,8} up to n=2^16), the device-pipeline/chunked-FRI parity
# legs, and the cross-process SPMD prove. Writes a transcript to
# benchmarks/reports/slowtier_<tag>.txt when TAG is set.
#
# Usage: scripts/test_slow.sh [extra pytest args...]
#        TAG=r03 scripts/test_slow.sh
set -euo pipefail
cd "$(dirname "$0")/.."

out=""
if [ -n "${TAG:-}" ]; then
    mkdir -p benchmarks/reports
    out="benchmarks/reports/slowtier_${TAG}.txt"
fi

if [ -n "$out" ]; then
    { date -u +"%Y-%m-%dT%H:%M:%SZ"; python -m pytest tests/ -q -m slow "$@"; } 2>&1 | tee "$out"
else
    python -m pytest tests/ -q -m slow "$@"
fi
