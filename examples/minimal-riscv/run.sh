#!/usr/bin/env bash
# Minimal end-to-end demo (mirrors the reference examples/minimal-riscv/run.sh):
# VM stub -> trace -> blocks -> manifest -> proof -> verify, for each backend.
set -euo pipefail
cd "$(dirname "$0")/../.."
python -c "from sezkp_tpu.models.vm_riscv import run_e2e; run_e2e(32, 4, 'examples/minimal-riscv', 'v0')"
python -c "from sezkp_tpu.models.vm_riscv import run_e2e; run_e2e(32, 4, 'examples/minimal-riscv', 'fold')"
