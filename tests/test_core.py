"""Core runtime tests: replay, combiner, evaluator (mirrors sezkp-core tests)."""

import numpy as np
import pytest

from sezkp_tpu.core.combiner import ConstantCombiner
from sezkp_tpu.core.evaluator import Evaluator
from sezkp_tpu.core.replay import Replay, ReplayConfig, ReplayError
from sezkp_tpu.core.types import BlockSummary, FiniteState, MovementLog


def minimal_block(tau: int, block_id: int = 1) -> BlockSummary:
    return BlockSummary(
        version=1,
        block_id=block_id,
        step_lo=1,
        step_hi=1,
        ctrl_in=0,
        ctrl_out=0,
        in_head_in=0,
        in_head_out=0,
        windows=np.zeros((tau, 2), dtype=np.int64),
        head_in_offsets=np.zeros(tau, dtype=np.uint32),
        head_out_offsets=np.zeros(tau, dtype=np.uint32),
        movement_log=MovementLog(
            input_mv=np.zeros(1, dtype=np.int8),
            tape_mv=np.zeros((1, tau), dtype=np.int8),
            write_flag=np.zeros((1, tau), dtype=bool),
            write_sym=np.zeros((1, tau), dtype=np.uint16),
        ),
    )


def test_replay_minimal_ok():
    fs = Replay().replay_block(minimal_block(2))
    assert fs.work_head_in.tolist() == [0, 0]
    assert fs.work_head_out.tolist() == [0, 0]


def test_interface_ok_checks_ctrl_and_input_head():
    r = Replay()
    a = r.replay_block(minimal_block(1))
    b = r.replay_block(minimal_block(1))
    a.ctrl_out = 7
    b.ctrl_in = 7
    a.in_head_out = 11
    b.in_head_in = 11
    assert r.interface_ok(a, b)
    b.in_head_in = 12
    assert not r.interface_ok(a, b)


def test_replay_rejects_write_outside_window():
    b = minimal_block(1)
    # one step: move +1 then write -> head=1 outside window [0,0]
    b.movement_log.tape_mv[0, 0] = 1
    b.movement_log.write_flag[0, 0] = True
    b.movement_log.write_sym[0, 0] = 3
    with pytest.raises(ReplayError):
        Replay(ReplayConfig(check_writes=True)).replay_block(b)
    # without check_writes it passes (reference default cfg)
    Replay(ReplayConfig(check_writes=False)).replay_block(b)


def test_replay_rejects_bad_offsets():
    b = minimal_block(1)
    b.head_out_offsets = np.array([5], dtype=np.uint32)  # window len 1 -> max 0
    with pytest.raises(ReplayError):
        Replay().replay_block(b)


def _fs(ci, co, ihi, iho, whi, who):
    return FiniteState(
        ctrl_in=ci,
        ctrl_out=co,
        in_head_in=ihi,
        in_head_out=iho,
        work_head_in=np.array(whi, dtype=np.int64),
        work_head_out=np.array(who, dtype=np.int64),
    )


def test_combiner_associativity():
    a = _fs(1, 2, 0, 10, [0, 0], [5, 6])
    b = _fs(2, 3, 10, 20, [5, 6], [7, 9])
    c = _fs(3, 4, 20, 25, [7, 9], [8, 11])
    comb = ConstantCombiner()
    assert comb.interface_ok(a, b) and comb.interface_ok(b, c)
    lhs = comb.combine(comb.combine(a, b), c)
    rhs = comb.combine(a, comb.combine(b, c))
    assert lhs == rhs


def test_combiner_rejects_mismatch():
    l = _fs(0, 1, 0, 3, [], [1, 2])
    r = _fs(2, 0, 3, 0, [1, 2], [])
    comb = ConstantCombiner()
    assert not comb.interface_ok(l, r)
    with pytest.raises(ValueError):
        comb.combine_checked(l, r)


def test_evaluator_roots_chain():
    # Three chained minimal blocks -> root state spans them.
    blocks = [minimal_block(2, i + 1) for i in range(5)]
    root = Evaluator().evaluate_root(blocks)
    assert root.ctrl_in == 0 and root.ctrl_out == 0
    assert root.work_head_in.tolist() == [0, 0]


def test_evaluator_detects_interface_break():
    blocks = [minimal_block(1, 1), minimal_block(1, 2)]
    blocks[1].in_head_in = 99  # breaks input-head continuity
    blocks[1].in_head_out = 99
    with pytest.raises(ValueError):
        Evaluator().evaluate_root(blocks)
