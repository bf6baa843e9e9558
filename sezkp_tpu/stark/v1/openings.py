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
from .merkle import ColumnCommit, hash_field_leaves_labeled
from .proof import ColumnRoot, Opening


class ColumnEngine:
    def __init__(self, tc: TraceColumns, chunk_log2: int = params.COL_CHUNK_LOG2):
        self.tc = tc
        self.chunk_log2 = chunk_log2
        self.labels = all_labels(tc.tau)
        self._commits: Dict[str, ColumnCommit] = {}

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
