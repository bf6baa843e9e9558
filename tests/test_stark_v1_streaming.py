"""Streaming == in-core equivalence for STARK v1 components.

Mirrors the reference tests stream_columns_equiv.rs, stream_openings.rs,
stream_fri_equiv.rs.
"""

import numpy as np
import pytest

from sezkp_tpu.ops import goldilocks as G
from sezkp_tpu.stark.backends import StarkV1
from sezkp_tpu.stark.v1 import proof as PM
from sezkp_tpu.stark.v1.columns import TraceColumns, all_labels
from sezkp_tpu.stark.v1.columns_stream import (
    block_column_matrix,
    rows_of_range,
    stream_column_chunks,
)
from sezkp_tpu.stark.v1.fri import StreamingLayerBuilder, layer_tree
from sezkp_tpu.stark.v1.merkle import verify_chunked_open
from sezkp_tpu.stark.v1.openings import ColumnEngine, StreamingColumnEngine

from test_stark_v1 import MANIFEST, demo_blocks


@pytest.fixture(scope="module")
def blocks():
    return demo_blocks(4, 16, tau=2)


def test_streamed_columns_match_in_core(blocks):
    tc = TraceColumns.build(blocks)
    labels = all_labels(tc.tau)
    chunks = list(stream_column_chunks(blocks, 16))
    streamed = np.concatenate(chunks, axis=1)
    for li, lb in enumerate(labels):
        assert np.array_equal(streamed[li], tc.column_by_label(lb)), lb


def test_streamed_roots_match_in_core(blocks):
    tc = TraceColumns.build(blocks)
    mem = ColumnEngine(tc, chunk_log2=4).build_roots()
    stream = StreamingColumnEngine(blocks, chunk_log2=4).build_roots()
    assert [(a.label, a.root) for a in mem] == [(b.label, b.root) for b in stream]


def test_streamed_openings_verify_and_match(blocks):
    tc = TraceColumns.build(blocks)
    mem = ColumnEngine(tc, chunk_log2=4)
    stream = StreamingColumnEngine(blocks, chunk_log2=4)
    roots = {c.label: c.root for c in stream.build_roots()}
    mem.build_roots()
    rng = np.random.default_rng(0)
    for _ in range(10):
        row = int(rng.integers(0, tc.n))
        label = all_labels(tc.tau)[int(rng.integers(0, len(all_labels(tc.tau))))]
        a = mem.open(label, row)
        b = stream.open(label, row)
        assert (a.value_le, a.chunk_root, a.path_in_chunk, a.path_to_chunk) == (
            b.value_le,
            b.chunk_root,
            b.path_in_chunk,
            b.path_to_chunk,
        )
        assert verify_chunked_open(
            roots[label],
            label,
            b.value_le,
            b.chunk_root,
            b.index_in_chunk,
            b.path_in_chunk,
            b.chunk_index,
            b.path_to_chunk,
        )


def test_rows_of_range_matches_full(blocks):
    tc = TraceColumns.build(blocks)
    m = rows_of_range(blocks, 5, 37)
    labels = all_labels(tc.tau)
    for li, lb in enumerate(labels):
        assert np.array_equal(m[li], tc.column_by_label(lb)[5:37]), lb


def test_streaming_layer_builder_matches_tree():
    rng = np.random.default_rng(1)
    for k in [0, 1, 4, 8]:
        vals = rng.integers(0, int(G.P), 1 << k, dtype=np.uint64)
        b = StreamingLayerBuilder(1 << k)
        # absorb in uneven chunks
        pos = 0
        for sz in [3, 5, 7, 1 << k]:
            take = min(sz, (1 << k) - pos)
            if take:
                b.absorb_leaves_u64(vals[pos : pos + take])
                pos += take
        assert b.finalize() == layer_tree(vals).root()


def test_prove_streaming_produces_identical_proof(blocks):
    a = StarkV1.prove(blocks, MANIFEST)
    b = StarkV1.prove_streaming(blocks, MANIFEST)
    assert a.proof_bytes == b.proof_bytes
    StarkV1.verify(b, blocks, MANIFEST)
