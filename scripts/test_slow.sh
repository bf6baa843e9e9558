#!/usr/bin/env bash
# Slow-tier CI surface (VERDICT round-2 item 6, hardened round 4): runs every
# test the default tier deselects — the sharded-prover byte-parity matrix
# (mesh {2,4,8} up to n=2^18), the device-pipeline/chunked-FRI parity legs,
# and the cross-process SPMD prove.
#
# Each test runs in its OWN pytest process. Rationale (VERDICT round-3 weak
# item 1b): test_sharded_prove_v1_full_n2_18_tops passes in isolation but
# hard-crashes the XLA:CPU compiler when run 8th in one long-lived process —
# an accumulated-arena problem, not a correctness bug. Process-per-test makes
# the tier's result independent of ordering. SEZKP_TEST_TIMEOUT=900 is the
# known-good watchdog setting for multi-minute XLA:CPU compiles under load
# (round-3 weak item 7); the per-test conftest watchdog still backstops hangs.
#
# Writes a transcript with a final "N passed / N failed" summary line to
# benchmarks/reports/slowtier_<tag>.txt when TAG is set.
#
# Usage: scripts/test_slow.sh [extra pytest args...]
#        TAG=r04 scripts/test_slow.sh
set -uo pipefail
cd "$(dirname "$0")/.."

export SEZKP_TEST_TIMEOUT="${SEZKP_TEST_TIMEOUT:-900}"

out=""
if [ -n "${TAG:-}" ]; then
    mkdir -p benchmarks/reports
    out="benchmarks/reports/slowtier_${TAG}.txt"
fi

run() {
    if [ -n "$out" ]; then
        "$@" 2>&1 | tee -a "$out"
    else
        "$@"
    fi
}

if [ -n "$out" ]; then : > "$out"; fi
run date -u +"%Y-%m-%dT%H:%M:%SZ"

# Collect the slow-tier node ids (pytest -q --collect-only prints one per line).
mapfile -t nodes < <(python -m pytest tests/ -m slow --collect-only -q 2>/dev/null \
                     | grep '::')
if [ "${#nodes[@]}" -eq 0 ]; then
    echo "no slow tests collected" >&2
    exit 1
fi

pass=0
fail=0
failed_nodes=()
t_start=$SECONDS
for node in "${nodes[@]}"; do
    t0=$SECONDS
    if run python -m pytest "$node" -q -m slow -p no:cacheprovider "$@"; then
        pass=$((pass + 1))
        status=PASS
    else
        fail=$((fail + 1))
        failed_nodes+=("$node")
        status=FAIL
    fi
    run echo "[slow-tier] ${status} ${node} ($((SECONDS - t0))s)"
done

run echo "=== slow tier: ${pass} passed / ${fail} failed of ${#nodes[@]} in $((SECONDS - t_start))s ==="
if [ "$fail" -gt 0 ]; then
    for n in "${failed_nodes[@]}"; do run echo "FAILED ${n}"; done
    exit 1
fi
