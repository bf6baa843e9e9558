"""Trace frontend: generator RNG parity, partition semantics, trace I/O."""

import os

import numpy as np
import pytest

from conftest import REFERENCE, reference_available

from sezkp_tpu.core.io import read_block_summaries_auto
from sezkp_tpu.trace.format import TraceFile
from sezkp_tpu.trace.generator import generate_trace
from sezkp_tpu.trace.partition import partition_trace
from sezkp_tpu.trace.rng import ChaChaRng, seed_from_u64
from sezkp_tpu.utils import cbor


def test_chacha_stdrng_is_deterministic():
    a = ChaChaRng.std_rng(42)
    b = ChaChaRng.std_rng(42)
    assert [a.next_u32() for _ in range(100)] == [b.next_u32() for _ in range(100)]
    assert seed_from_u64(42) == seed_from_u64(42)
    assert seed_from_u64(42) != seed_from_u64(43)


def test_generate_trace_shapes():
    tf = generate_trace(10, 3)
    assert len(tf) == 10 and tf.tau == 3
    assert tf.steps.tape_mv.shape == (10, 3)
    assert np.all(np.abs(tf.steps.input_mv) <= 1)
    assert np.all(np.abs(tf.steps.tape_mv) <= 1)
    assert np.all(tf.steps.write_sym <= 15)


def test_partition_basic_blocks():
    tf = generate_trace(10, 2)
    v = partition_trace(tf, 4)
    assert [(b.step_lo, b.step_hi) for b in v] == [(1, 4), (5, 8), (9, 10)]


def test_partition_empty():
    from sezkp_tpu.core.types import MovementLog

    tf = TraceFile(version=1, tau=2, steps=MovementLog.empty(2), meta=None)
    assert partition_trace(tf, 4) == []


def test_partition_windows_contain_postmove_heads():
    tf = generate_trace(64, 4)
    for b in partition_trace(tf, 16):
        heads = np.cumsum(b.movement_log.tape_mv.astype(np.int64), axis=0)
        assert np.all(heads.min(axis=0).clip(max=0) >= b.windows[:, 0])
        assert np.all(heads.max(axis=0).clip(min=0) <= b.windows[:, 1])
        assert np.all(b.head_in_offsets.astype(np.int64) == -b.windows[:, 0])


def test_input_head_is_global():
    tf = generate_trace(32, 1)
    blocks = partition_trace(tf, 8)
    for a, b in zip(blocks, blocks[1:]):
        assert a.in_head_out == b.in_head_in
    total = int(np.sum(tf.steps.input_mv.astype(np.int64)))
    assert blocks[-1].in_head_out == total


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_generator_rng_bit_parity_with_rust():
    golden = read_block_summaries_auto(os.path.join(REFERENCE, "blocks.cbor"))
    t = sum(b.n_steps for b in golden)
    tf = generate_trace(t, golden[0].tau)
    mine = partition_trace(tf, golden[0].n_steps)
    assert len(mine) == len(golden)
    for a, b in zip(mine, golden):
        assert a == b


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_trace_cbor_roundtrip_byte_exact():
    path = os.path.join(REFERENCE, "examples/minimal-riscv/trace.cbor")
    raw = open(path, "rb").read()
    tf = TraceFile.from_obj(cbor.loads(raw))
    assert cbor.dumps(tf.to_obj()) == raw


def test_native_generator_matches_python():
    from sezkp_tpu.trace.generator import generate_trace_python

    a = generate_trace(512, 3)
    b = generate_trace_python(512, 3)
    assert a.steps == b.steps


def test_simulate_stream_bytes_identical(tmp_path):
    """The streaming simulate path (chunked generate + partition + append
    write, trace/stream.py) produces byte-identical .cbor and .jsonl block
    files to the materialized path, including chunk boundaries that split
    the ChaCha12 buffer mid-draw (chunk_steps deliberately tiny)."""
    from sezkp_tpu.core.io import write_block_summaries_auto
    from sezkp_tpu.trace.generator import generate_trace
    from sezkp_tpu.trace.partition import partition_trace
    from sezkp_tpu.trace.stream import simulate_stream

    t, b, tau = 1000, 16, 3  # non-pow2, partial final block
    blocks = partition_trace(generate_trace(t, tau), b)
    for ext in ("cbor", "jsonl"):
        ref_path = str(tmp_path / f"ref.{ext}")
        write_block_summaries_auto(ref_path, blocks)
        got_path = str(tmp_path / f"got.{ext}")
        n = simulate_stream(t, b, tau, got_path, chunk_steps=48)
        assert n == len(blocks)
        assert open(got_path, "rb").read() == open(ref_path, "rb").read()


def test_trace_chunk_rng_state_carries():
    """Chunked generation equals one-shot generation for every chunk size
    (the resumable native state must round-trip exactly)."""
    import numpy as np

    from sezkp_tpu.trace.generator import generate_trace
    from sezkp_tpu.trace.stream import iter_trace_chunks

    t, tau = 513, 2
    ref = generate_trace(t, tau).steps
    for chunk in (1, 7, 64, 513, 1000):
        got = list(iter_trace_chunks(t, tau, chunk))
        input_mv = np.concatenate([g.input_mv for g in got])
        tape_mv = np.concatenate([g.tape_mv for g in got])
        wf = np.concatenate([g.write_flag for g in got])
        ws = np.concatenate([g.write_sym for g in got])
        assert np.array_equal(input_mv, ref.input_mv)
        assert np.array_equal(tape_mv, ref.tape_mv)
        assert np.array_equal(wf, ref.write_flag)
        assert np.array_equal(ws, ref.write_sym)


def test_simulate_stream_fast_and_fallback_encoders(tmp_path):
    """The vectorized fixed-width CBOR log encoder (stream._encode_log_rows)
    and the generic fallback must both be byte-identical to the resident
    writer. tau=24 exceeds the 1-byte array-head range the fast path
    requires, forcing the fallback; tau=8 takes the fast path."""
    from sezkp_tpu.core.io import write_block_summaries_auto
    from sezkp_tpu.trace.generator import generate_trace
    from sezkp_tpu.trace.partition import partition_trace
    from sezkp_tpu.trace import stream

    for tau, expect_fast in ((8, True), (24, False)):
        t, b = 512, 64
        ml = next(stream.iter_trace_chunks(t, tau, t))
        assert (stream._encode_log_rows(ml) is not None) == expect_fast
        ref_path = str(tmp_path / f"ref{tau}.cbor")
        write_block_summaries_auto(
            ref_path, partition_trace(generate_trace(t, tau), b)
        )
        got_path = str(tmp_path / f"got{tau}.cbor")
        stream.simulate_stream(t, b, tau, got_path, chunk_steps=128)
        assert open(got_path, "rb").read() == open(ref_path, "rb").read()


def test_stream_block_summaries_cbor_windowed(tmp_path):
    """The windowed streaming CBOR block reader yields the same blocks as
    the resident reader even when every block straddles a window refill."""
    from sezkp_tpu.core.io import (
        read_block_summaries_auto,
        stream_block_summaries_cbor,
    )
    from sezkp_tpu.trace.stream import simulate_stream

    p = str(tmp_path / "blocks.cbor")
    simulate_stream(3000, 128, 4, p, chunk_steps=512)
    ref = read_block_summaries_auto(p)
    got = list(stream_block_summaries_cbor(p, window_bytes=2048))
    assert len(got) == len(ref)
    for a, b in zip(ref, got):
        assert a.to_obj() == b.to_obj()
