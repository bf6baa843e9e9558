"""Property-style invariant tests (reference: sezkp-core/tests/invariants.rs).

Randomized round-trips of interface compatibility + perturbation detection,
plus CBOR decode robustness (fuzz-ish corpus, reference: core/fuzz).
"""

import numpy as np
import pytest

from sezkp_tpu.core.combiner import ConstantCombiner
from sezkp_tpu.core.evaluator import Evaluator
from sezkp_tpu.core.replay import Replay, ReplayConfig, ReplayError
from sezkp_tpu.core.types import BlockSummary, MovementLog
from sezkp_tpu.sched.evaluator import DrivingEvaluator
from sezkp_tpu.trace.generator import generate_trace
from sezkp_tpu.trace.partition import partition_trace
from sezkp_tpu.utils import cbor


def chained_blocks(n_blocks: int, block_len: int, tau: int):
    return partition_trace(generate_trace(n_blocks * block_len, tau), block_len)


def test_interface_roundtrip_many_cases():
    """Adjacent partitioned blocks always satisfy the replay interface."""
    rng = np.random.default_rng(0)
    replay = Replay(ReplayConfig(check_writes=True))
    for case in range(16):
        nb = int(rng.integers(1, 6))
        bl = int(rng.integers(1, 9))
        tau = int(rng.integers(1, 5))
        blocks = chained_blocks(nb, bl, tau)
        states = [replay.replay_block(b) for b in blocks]
        for a, b in zip(states, states[1:]):
            assert replay.interface_ok(a, b)


def test_interface_perturbation_detected():
    """Perturbing input-head continuity is always caught."""
    rng = np.random.default_rng(1)
    replay = Replay()
    for case in range(16):
        blocks = chained_blocks(3, 4, 2)
        i = int(rng.integers(1, 3))
        delta = int(rng.integers(1, 100))
        blocks[i].in_head_in += delta
        states = [replay.replay_block(b) for b in blocks]
        assert not replay.interface_ok(states[i - 1], states[i])


def test_write_outside_window_raises():
    blocks = chained_blocks(1, 8, 1)
    b = blocks[0]
    # Force a write beyond the declared right edge.
    b.windows[0, 1] = b.windows[0, 0]  # collapse window
    b.head_out_offsets[0] = 0
    b.head_in_offsets[0] = 0
    b.movement_log.tape_mv[:] = 1
    b.movement_log.write_flag[-1, 0] = True
    with pytest.raises(ReplayError):
        Replay(ReplayConfig(check_writes=True)).replay_block(b)


def test_evaluators_agree():
    blocks = chained_blocks(7, 4, 2)
    a = Evaluator().evaluate_root(blocks)
    b = DrivingEvaluator().evaluate_root(blocks)
    assert a == b


def test_combiner_matches_whole_trace_endpoints():
    blocks = chained_blocks(8, 8, 3)
    root = Evaluator().evaluate_root(blocks)
    assert root.in_head_in == blocks[0].in_head_in
    assert root.in_head_out == blocks[-1].in_head_out


# ----------------------------- CBOR robustness ------------------------------


def test_cbor_decoder_rejects_garbage():
    """Decode must raise (never crash or hang) on malformed inputs."""
    rng = np.random.default_rng(2)
    blocks = chained_blocks(2, 4, 1)
    good = cbor.dumps([b.to_obj() for b in blocks])
    for _ in range(200):
        data = bytearray(good)
        n_flips = int(rng.integers(1, 8))
        for _ in range(n_flips):
            pos = int(rng.integers(0, len(data)))
            data[pos] ^= int(rng.integers(1, 256))
        try:
            obj = cbor.loads(bytes(data))
            # If it decoded, conversion may still fail; both outcomes are fine
            # as long as nothing crashes the interpreter.
            try:
                [BlockSummary.from_obj(o) for o in obj]
            except Exception:
                pass
        except Exception:
            pass


def test_cbor_truncation_rejected():
    blocks = chained_blocks(1, 4, 1)
    good = cbor.dumps([b.to_obj() for b in blocks])
    for cut in [1, len(good) // 2, len(good) - 1]:
        with pytest.raises(Exception):
            cbor.loads(good[:cut])


def test_mock_iop_deterministic():
    from sezkp_tpu.crypto.transcript import Blake3Transcript
    from sezkp_tpu.stark.iop import commit_block_fiat_shamir

    blocks = chained_blocks(2, 4, 1)
    a = commit_block_fiat_shamir(Blake3Transcript("iop-test"), blocks)
    b = commit_block_fiat_shamir(Blake3Transcript("iop-test"), blocks)
    c = commit_block_fiat_shamir(Blake3Transcript("iop-other"), blocks)
    assert a == b and a != c and len(a) == 96
