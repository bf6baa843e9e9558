#!/usr/bin/env bash
# End-to-end smoke suite, mirroring the reference's scripts/test_all.zsh:
# unit tests -> CLI simulate/commit/verify-commit -> stark prove+verify ->
# fold balanced -> fold minram+wraps. Prints "OK: proof verified" lines.
set -euo pipefail
cd "$(dirname "$0")/.."

export JAX_PLATFORMS=${JAX_PLATFORMS:-}
W=$(mktemp -d)
trap 'rm -rf "$W"' EXIT

echo "== unit tests =="
python -m pytest tests/ -q -x

echo "== CLI pipeline =="
python -m sezkp_tpu simulate --t 256 --b 16 --tau 4 --out-blocks "$W/blocks.jsonl"
python -m sezkp_tpu commit --blocks "$W/blocks.jsonl" --out "$W/manifest.cbor"
python -m sezkp_tpu verify-commit --blocks "$W/blocks.jsonl" --manifest "$W/manifest.cbor"
python -m sezkp_tpu export-jsonl --input "$W/blocks.jsonl" --output "$W/blocks2.jsonl"

echo "== stark v0 =="
python -m sezkp_tpu simulate --t 256 --b 16 --tau 4 --out-blocks "$W/blocks.cbor"
python -m sezkp_tpu prove --backend stark-v0 --blocks "$W/blocks.cbor" \
    --manifest "$W/manifest.cbor" --out "$W/proof_v0.cbor" --assume-committed
python -m sezkp_tpu verify --backend stark-v0 --blocks "$W/blocks.cbor" \
    --manifest "$W/manifest.cbor" --proof "$W/proof_v0.cbor" --assume-committed

echo "== stark v1 =="
python -m sezkp_tpu simulate --t 4096 --b 64 --tau 2 --out-blocks "$W/blocks_v1.cbor"
python -m sezkp_tpu commit --blocks "$W/blocks_v1.cbor" --out "$W/manifest_v1.cbor"
python -m sezkp_tpu prove --backend stark --blocks "$W/blocks_v1.cbor" \
    --manifest "$W/manifest_v1.cbor" --out "$W/proof_v1.cbor"
python -m sezkp_tpu verify --backend stark --blocks "$W/blocks_v1.cbor" \
    --manifest "$W/manifest_v1.cbor" --proof "$W/proof_v1.cbor"

echo "== fold balanced (in-memory path needs .cbor blocks, as in the reference) =="
python -m sezkp_tpu prove --backend fold --blocks "$W/blocks.cbor" \
    --manifest "$W/manifest.cbor" --out "$W/proof_fold.cbor" --assume-committed
python -m sezkp_tpu verify --backend fold --blocks "$W/blocks.jsonl" \
    --manifest "$W/manifest.cbor" --proof "$W/proof_fold.cbor"

echo "== fold minram + wraps + streaming =="
python -m sezkp_tpu prove --backend fold --blocks "$W/blocks.jsonl" \
    --manifest "$W/manifest.cbor" --out "$W/proof_fold2.cbor" \
    --fold-mode minram --fold-cache 8 --wrap-cadence 4 --stream
python -m sezkp_tpu verify --backend fold --blocks "$W/blocks.jsonl" \
    --manifest "$W/manifest.cbor" --proof "$W/proof_fold2.cbor"

echo "== vm-riscv e2e =="
python -c "from sezkp_tpu.models.vm_riscv import run_e2e; run_e2e(32, 4, '$W/riscv', 'v0')"
python -c "from sezkp_tpu.models.vm_riscv import run_e2e; run_e2e(32, 4, '$W/riscv', 'fold')"

echo "ALL OK"
