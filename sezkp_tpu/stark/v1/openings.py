"""Column commitment engine: streamed/chunked roots + openings.

Replaces the reference's OnDemandOpenings (crates/sezkp-stark/src/v1/
openings.rs) with a batch-first design: all columns are materialized as u64
vectors (TraceColumns), leaf hashing is one `hash_many` per column, and all
chunk trees are reduced simultaneously. Openings rebuild only the target
chunk's tree. Roots/paths are bit-identical to the reference.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from ...ops import goldilocks as G
from . import params
from .columns import TraceColumns, all_labels
from .merkle import ColumnCommit, MerkleTree, hash_field_leaves_labeled
from .proof import ColumnRoot, Opening


class ColumnEngine:
    def __init__(self, tc: TraceColumns, chunk_log2: int = params.COL_CHUNK_LOG2):
        self.tc = tc
        self.chunk_log2 = chunk_log2
        self.labels = all_labels(tc.tau)
        self._commits: Dict[str, ColumnCommit] = {}

    @property
    def n_rows(self) -> int:
        return self.tc.n

    def _commit(self, label: str) -> ColumnCommit:
        cc = self._commits.get(label)
        if cc is None:
            vals = self.tc.column_by_label(label)
            leaves = hash_field_leaves_labeled(G.to_le_bytes(vals), label)
            cc = ColumnCommit.from_hashed_leaves(leaves, self.chunk_log2)
            self._commits[label] = cc
        return cc

    def build_roots(self) -> List[ColumnRoot]:
        """Outer roots for every column in canonical label order."""
        return [ColumnRoot(lb, self._commit(lb).root()) for lb in self.labels]

    def open(self, label: str, row_idx: int) -> Opening:
        cc = self._commit(label)
        ci, ii, chunk_root, path_in, path_out = cc.open(row_idx)
        value_le = G.to_le_bytes(self.tc.column_by_label(label)[row_idx]).tobytes()
        return Opening(
            value_le=value_le,
            index=row_idx,
            chunk_index=ci,
            index_in_chunk=ii,
            chunk_root=chunk_root,
            path_in_chunk=path_in,
            path_to_chunk=path_out,
        )


class StreamingColumnEngine:
    """Sublinear-memory column commitments: O(chunk) pending state while
    building roots, recompute-the-chunk on open.

    Equivalent of the reference's OnDemandOpenings (openings.rs:278-498) with
    the per-row hashing replaced by per-chunk batched hashing. Roots, paths,
    and openings are bit-identical to :class:`ColumnEngine` (cross-tested).
    """

    def __init__(self, blocks, chunk_log2: int = params.COL_CHUNK_LOG2):
        from .columns_stream import rows_of_range, stream_column_chunks

        self._stream_column_chunks = stream_column_chunks
        self._rows_of_range = rows_of_range
        self.blocks = blocks
        self.chunk_log2 = chunk_log2
        self.chunk_size = 1 << chunk_log2
        self.tau = blocks[0].tau if blocks else 0
        self.labels = all_labels(self.tau)
        self.n_rows = sum(b.n_steps for b in blocks)
        self._chunk_roots: Dict[str, "np.ndarray"] = {}
        self._outer: Dict[str, MerkleTree] = {}

    def build_roots(self) -> List[ColumnRoot]:
        import numpy as np

        per_label_roots: List[List[bytes]] = [[] for _ in self.labels]
        for chunk in self._stream_column_chunks(self.blocks, self.chunk_size):
            for li, label in enumerate(self.labels):
                leaves = hash_field_leaves_labeled(G.to_le_bytes(chunk[li]), label)
                per_label_roots[li].append(MerkleTree.from_leaves(leaves).root())
        out = []
        for li, label in enumerate(self.labels):
            roots = np.frombuffer(
                b"".join(per_label_roots[li]), dtype=np.uint8
            ).reshape(len(per_label_roots[li]), 32)
            self._chunk_roots[label] = roots
            outer = MerkleTree.from_leaves(roots)
            self._outer[label] = outer
            out.append(ColumnRoot(label, outer.root()))
        return out

    def open(self, label: str, row_idx: int) -> Opening:
        assert row_idx < self.n_rows, "row index out of range"
        if label not in self._outer:
            self.build_roots()
        ci = row_idx // self.chunk_size
        ii = row_idx - ci * self.chunk_size
        start = ci * self.chunk_size
        end = min(start + self.chunk_size, self.n_rows)
        li = self.labels.index(label)
        vals = self._rows_of_range(self.blocks, start, end)[li]
        leaves = hash_field_leaves_labeled(G.to_le_bytes(vals), label)
        inner = MerkleTree.from_leaves(leaves)
        return Opening(
            value_le=G.to_le_bytes(vals[ii]).tobytes(),
            index=row_idx,
            chunk_index=ci,
            index_in_chunk=ii,
            chunk_root=inner.root(),
            path_in_chunk=inner.open(ii),
            path_to_chunk=self._outer[label].open(ci),
        )
