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


def _label_prefix(lb: str) -> bytes:
    import struct

    return params.DS_COL_LEAF.encode() + struct.pack("<I", len(lb)) + lb.encode()


class ColumnEngine:
    """In-memory engine. On TPU, commitments run device-resident: leaf CVs
    stay in HBM, only chunk roots (KBs) and opening paths (KBs) cross the
    host link (the reference recomputes per-row on the CPU instead,
    openings.rs:278-498; same roots/paths, radically different schedule)."""

    def __init__(self, tc, chunk_log2: int = params.COL_CHUNK_LOG2, dc=None):
        """`tc`: host TraceColumns (may be None when `dc` is given).
        `dc`: DeviceColumns — enables the fully device-resident path (columns
        derived, hashed, and opened on device; values gathered per opening)."""
        self.tc = tc
        self._dc = dc
        self.chunk_log2 = chunk_log2
        tau = dc.tau if dc is not None else tc.tau
        self._n = dc.n if dc is not None else tc.n
        self.labels = all_labels(tau)
        self._commits: Dict[str, ColumnCommit] = {}
        # device mode state
        self._dev = False
        self._dev_cvs = None  # jnp [C, n, 8] leaf CVs (device-resident)
        self._dev_label_idx: Dict[str, int] = {}
        self._croots: Dict[str, np.ndarray] = {}
        self._outer: Dict[str, MerkleTree] = {}

    @property
    def n_rows(self) -> int:
        return self._n

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
        from .merkle import _device_ready

        if (
            not self._dev
            and not self._commits
            and _device_ready(self._n)
            and self._n % (1 << self.chunk_log2) == 0
        ):
            self._build_device()
        if self._dev:
            return [ColumnRoot(lb, self._outer[lb].root()) for lb in self.labels]
        return [ColumnRoot(lb, self._commit(lb).root()) for lb in self.labels]

    @staticmethod
    def _cv_budget_bytes() -> int:
        """Resident leaf-CV budget: above this the CVs would crowd out HBM
        ([C, n, 8] u32 is ~8 GB at n = 2^22 with 59 columns), so commitments
        switch to the segment-scanned roots-only kernel and openings
        recompute the queried chunks on device (reference recompute-on-open
        semantics, openings.rs:278-498)."""
        import os

        return int(os.environ.get("SEZKP_CV_BUDGET_BYTES", 4 << 30))

    def _build_device(self) -> None:
        import jax
        import jax.numpy as jnp

        from ...ops import blake3_jax

        groups: Dict[int, List[str]] = {}
        for lb in self.labels:
            groups.setdefault(len(_label_prefix(lb)), []).append(lb)
        resident = (
            self._dc is None
            or len(self.labels) * self._n * 32 <= self._cv_budget_bytes()
        )
        cv_parts = []
        order: List[str] = []
        dev_roots = []
        group_sizes = []
        for _plen, lbs in groups.items():
            prefixes = [_label_prefix(lb) for lb in lbs]
            if self._dc is not None:
                idx = np.array([self._dc.labels.index(lb) for lb in lbs], np.int32)
                if resident:
                    cvs, roots_dev = blake3_jax.columns_commit_from_planes(
                        self._dc.lo, self._dc.hi, prefixes, self.chunk_log2,
                        idx=idx, defer_pull=True,
                    )
                    cv_parts.append(cvs)
                else:
                    roots_dev = blake3_jax.columns_commit_roots_scan(
                        self._dc.lo, self._dc.hi, prefixes, self.chunk_log2,
                        idx=idx,
                    )
            else:
                vals = np.stack([self.tc.column_by_label(lb) for lb in lbs])
                cvs, roots_dev = blake3_jax.columns_commit_device(
                    vals, prefixes, self.chunk_log2, resident=True,
                    defer_pull=True,
                )
                cv_parts.append(cvs)
            dev_roots.append(roots_dev)
            group_sizes.append(len(lbs))
            order += lbs
        # one device->host pull for ALL groups' chunk roots (the tunnel
        # round-trip dominates; per-group pulls cost ~100 ms each)
        pulled = jax.device_get(dev_roots)
        for roots_np, lbs in zip(pulled, (order[sum(group_sizes[:i]):sum(group_sizes[:i + 1])] for i in range(len(group_sizes)))):
            croots = blake3_jax.croots_to_host(roots_np)
            for i, lb in enumerate(lbs):
                self._croots[lb] = croots[i]
                self._outer[lb] = MerkleTree.from_leaves(croots[i])
        self._dev_cvs = jnp.concatenate(cv_parts, axis=0) if cv_parts else None
        self._dev_label_idx = {lb: i for i, lb in enumerate(order)}
        self._dev = True

    def open(self, label: str, row_idx: int) -> Opening:
        if self._dev:
            return self.open_batch([(label, row_idx)])[0]
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

    def open_batch(self, requests) -> List[Opening]:
        """Answer many (label, row) openings; on TPU the inner-chunk paths for
        ALL requests are extracted in one device call."""
        if not self._dev:
            return [self.open(lb, r) for lb, r in requests]
        if self._dev_cvs is None:
            return self._open_batch_recompute(requests)

        import jax
        import jax.numpy as jnp

        from ...ops import blake3_jax

        n = self._n
        chunk = 1 << self.chunk_log2
        k = len(requests)
        starts = np.empty(k, dtype=np.int64)
        idxs = np.empty(k, dtype=np.int64)
        for i, (lb, row) in enumerate(requests):
            ci = row // chunk
            starts[i] = self._dev_label_idx[lb] * n + ci * chunk
            idxs[i] = row - ci * chunk
        flat = self._dev_cvs.reshape(-1, 8)
        paths_dev, roots_dev, finish = blake3_jax.chunk_paths_device(
            flat, starts, idxs, self.chunk_log2, defer_pull=True
        )

        if self._dc is not None:
            # batch the value gather with the path pull (one tunnel RTT)
            vidx = jnp.asarray(
                np.array(
                    [
                        self._dc.labels.index(lb) * n + row
                        for lb, row in requests
                    ],
                    dtype=np.int32,
                )
            )
            paths_np, roots_np, vlo, vhi = jax.device_get(
                (
                    paths_dev,
                    roots_dev,
                    self._dc.lo.reshape(-1)[vidx],
                    self._dc.hi.reshape(-1)[vidx],
                )
            )
            paths, _roots = finish(paths_np, roots_np)

            def value_le(i, lb, row):
                return (int(vlo[i]) | (int(vhi[i]) << 32)).to_bytes(8, "little")

        else:
            paths, _roots = finish(*jax.device_get((paths_dev, roots_dev)))

            def value_le(i, lb, row):
                return G.to_le_bytes(self.tc.column_by_label(lb)[row]).tobytes()

        out: List[Opening] = []
        for i, (lb, row) in enumerate(requests):
            ci = row // chunk
            ii = row - ci * chunk
            out.append(
                Opening(
                    value_le=value_le(i, lb, row),
                    index=row,
                    chunk_index=ci,
                    index_in_chunk=ii,
                    chunk_root=self._croots[lb][ci].tobytes(),
                    path_in_chunk=[paths[i, l].tobytes() for l in range(self.chunk_log2)],
                    path_to_chunk=self._outer[lb].open(ci),
                )
            )
        return out


    def _open_batch_recompute(self, requests) -> List[Opening]:
        """Openings without resident CVs: recompute each queried chunk's
        tree on device from the raw column planes (one jit per prefix-length
        group, ONE pull for everything). Paths/roots/values are identical to
        the resident path (cross-tested)."""
        import jax

        from ...ops import blake3_jax

        if not self._dc.planes_resident:
            return self._open_batch_ranges(requests)
        chunk = 1 << self.chunk_log2
        by_plen: Dict[int, List[int]] = {}
        for i, (lb, row) in enumerate(requests):
            by_plen.setdefault(len(_label_prefix(lb)), []).append(i)

        pending = []
        for _plen, req_idx in by_plen.items():
            col_indices = []
            starts = []
            idxs = []
            prefixes = []
            for i in req_idx:
                lb, row = requests[i]
                ci = row // chunk
                col_indices.append(self._dc.labels.index(lb))
                starts.append(ci * chunk)
                idxs.append(row - ci * chunk)
                prefixes.append(_label_prefix(lb))
            out, finish = blake3_jax.chunk_paths_from_planes(
                self._dc.lo, self._dc.hi, col_indices, starts, idxs,
                prefixes, self.chunk_log2,
            )
            pending.append((req_idx, out, finish))

        pulled = jax.device_get([p[1] for p in pending])
        results: List[Opening] = [None] * len(requests)
        for (req_idx, _out, finish), got in zip(pending, pulled):
            paths8, roots8, vlo, vhi = finish(*got)
            for j, i in enumerate(req_idx):
                lb, row = requests[i]
                ci = row // chunk
                ii = row - ci * chunk
                results[i] = Opening(
                    value_le=(int(vlo[j]) | (int(vhi[j]) << 32)).to_bytes(8, "little"),
                    index=row,
                    chunk_index=ci,
                    index_in_chunk=ii,
                    chunk_root=self._croots[lb][ci].tobytes(),
                    path_in_chunk=[
                        paths8[j, l].tobytes() for l in range(self.chunk_log2)
                    ],
                    path_to_chunk=self._outer[lb].open(ci),
                )
        return results

    def _open_batch_ranges(self, requests) -> List[Opening]:
        """Openings with the column planes released: derive ONLY the queried
        chunks' column values from the raw device inputs (derive_ranges),
        hash/path them on device, one pull for everything. At T=2^24 the 30
        query rows touch ~60 distinct chunks (~60 MB derived) vs ~8 GB for
        rematerialized full planes."""
        import jax

        from ...ops import blake3_jax

        chunk = 1 << self.chunk_log2
        start_ids: Dict[int, int] = {}
        starts: List[int] = []
        for _lb, row in requests:
            s = (row // chunk) * chunk
            if s not in start_ids:
                start_ids[s] = len(starts)
                starts.append(s)
        rlo, rhi = self._dc.derive_ranges(starts, chunk)

        by_plen: Dict[int, List[int]] = {}
        for i, (lb, _row) in enumerate(requests):
            by_plen.setdefault(len(_label_prefix(lb)), []).append(i)

        pending = []
        for _plen, req_idx in by_plen.items():
            sel_s = []
            col_idx = []
            idxs = []
            prefixes = []
            for i in req_idx:
                lb, row = requests[i]
                sel_s.append(start_ids[(row // chunk) * chunk])
                col_idx.append(self._dc.labels.index(lb))
                idxs.append(row % chunk)
                prefixes.append(_label_prefix(lb))
            out, finish = blake3_jax.chunk_paths_from_ranges(
                rlo, rhi, sel_s, col_idx, idxs, prefixes, self.chunk_log2
            )
            pending.append((req_idx, out, finish))

        pulled = jax.device_get([p[1] for p in pending])
        results: List[Opening] = [None] * len(requests)
        for (req_idx, _out, finish), got in zip(pending, pulled):
            paths8, _roots8, vlo, vhi = finish(*got)
            for j, i in enumerate(req_idx):
                lb, row = requests[i]
                ci = row // chunk
                ii = row - ci * chunk
                results[i] = Opening(
                    value_le=(int(vlo[j]) | (int(vhi[j]) << 32)).to_bytes(8, "little"),
                    index=row,
                    chunk_index=ci,
                    index_in_chunk=ii,
                    chunk_root=self._croots[lb][ci].tobytes(),
                    path_in_chunk=[
                        paths8[j, l].tobytes() for l in range(self.chunk_log2)
                    ],
                    path_to_chunk=self._outer[lb].open(ci),
                )
        return results


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

    def open_batch(self, requests) -> List[Opening]:
        return [self.open(lb, r) for lb, r in requests]

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
