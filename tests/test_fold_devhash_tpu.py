"""End-to-end device-hash dispatch in a fold prove on the real backend.

The suite's conftest pins every in-process test to the CPU backend, so this
test drives the CLI in fresh subprocesses WITHOUT that pin: one fold prove
with SEZKP_FOLD_DEVICE_HASH_MIN=1 (every MAC batch routed through the
device BLAKE3 kernel when a TPU is live) and one with the default host C++
path, asserting the streaming proof bytes are identical and that the
device-hashed proof verifies (VERDICT round-3 item 7's missing e2e leg).
On a CPU-only machine the dispatch falls back to host hashing and the test
degenerates to a byte-equality smoke check — still a valid invariant.
"""

import os
import pathlib
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent


def _run(args, tmp, extra_env=None, timeout=600):
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS")
    }
    env["PYTHONPATH"] = str(REPO)
    if extra_env:
        env.update(extra_env)
    r = subprocess.run(
        [sys.executable, "-m", "sezkp_tpu"] + args,
        cwd=tmp, env=env, capture_output=True, text=True, timeout=timeout,
    )
    assert r.returncode == 0, f"{args}:\n{r.stdout}\n{r.stderr}"
    return r.stdout


@pytest.mark.slow
def test_fold_prove_device_hash_dispatch_bytes_match(tmp_path):
    tmp = str(tmp_path)
    _run(
        ["simulate", "--t", "8192", "--b", "256", "--tau", "8",
         "--out-blocks", "blocks.cbor"], tmp,
    )
    _run(["commit", "--blocks", "blocks.cbor", "--out", "manifest.cbor"], tmp)
    common = [
        "prove", "--backend", "fold", "--stream", "--fold-mode", "minram",
        "--fold-cache", "16", "--blocks", "blocks.cbor",
        "--manifest", "manifest.cbor",
    ]
    _run(common + ["--out", "proof_host.cbor"], tmp)
    _run(
        common + ["--out", "proof_dev.cbor"], tmp,
        extra_env={"SEZKP_FOLD_DEVICE_HASH_MIN": "1"},
    )

    def stream_bytes(stem):
        side = tmp_path / f"{stem}.cborseq"
        assert side.exists(), "fold --stream writes a .cborseq sidecar"
        return side.read_bytes()

    assert stream_bytes("proof_host") == stream_bytes("proof_dev")

    out = _run(
        ["verify", "--backend", "fold", "--blocks", "blocks.cbor",
         "--manifest", "manifest.cbor", "--proof", "proof_dev.cbor"], tmp,
        extra_env={"SEZKP_FOLD_DEVICE_HASH_MIN": "1"},
    )
    assert "OK" in out
