"""Device-resident FRI: folds, layer hashing, and tree building on TPU.

All FRI layers (values + full Merkle tree levels) are computed in two jitted
device programs and stay resident in HBM as flat node arrays; only the layer
roots (a few hundred bytes) and, later, the queried values/paths (tens of KB)
cross the host link. Outputs are bit-identical to the host implementation in
fri.py (cross-tested).

Two phases are forced by the Fiat-Shamir schedule: betas depend on the
layer-0 root (fri.rs:51-68), so phase 1 commits layer 0 and phase 2 takes the
derived betas and produces everything else.
"""

from __future__ import annotations

import os
from functools import lru_cache
from typing import Dict, List, Tuple

import numpy as np

from ...ops import goldilocks as G
from .proof import FriQuery


def _jnp():
    import jax.numpy as jnp

    return jnp


def _hash_leaves_planes(lo, hi):
    """[n] value planes -> [8, n] CV planes (empty prefix)."""
    from ...ops import blake3_jax as BJ

    return BJ.hash_leaves_u64_planes(
        lo, hi, _jnp().asarray(BJ._prefix_words(b"")), 0
    )


@lru_cache(maxsize=4)
def _jit_phase1(n_log2: int):
    import jax

    from ...ops import blake3_jax as BJ

    def f(lo, hi):
        # plane-major CVs ([8, N]) throughout: row-major [N, 8] buffers pad
        # 16x under the (8, 128) tiling and OOM the 2^25-leaf tree
        cv = _hash_leaves_planes(lo, hi)
        levels = [cv]
        cur = cv
        while cur.shape[1] > 1:
            cur = BJ.parent_level_planes(cur)
            levels.append(cur)
        return _jnp().concatenate(levels, axis=1)  # [8, 2n-1]

    return jax.jit(f)


# Device handles layers down to this size; smaller tail layers fold on host
# (bounds the phase-2 graph so compile time doesn't scale with lde size).
MIN_DEVICE_LAYER_LOG2 = 11

# ------------------------- chunked ("big") tree mode -------------------------
# Fully-resident layer trees cost 64 bytes/leaf across all layers (~16 GiB at
# lde = 2^27), which cannot coexist with the column planes in 16 GB HBM. Above
# the threshold below, trees keep only the levels >= CHUNK_LOG2 (a few MB,
# pulled to host); query paths recompute the queried 2^CHUNK_LOG2-leaf chunk
# from the resident layer VALUES on device (the reference's recompute-on-open
# schedule, fri_stream.rs:170-312 / openings.rs:278-498 — same path bytes,
# batched across all queries).

CHUNK_LOG2 = MIN_DEVICE_LAYER_LOG2  # in-chunk path depth for chunked trees
SEG_LOG2 = 21  # leaves hashed per scan step building big trees (bounds peak)


def _big_threshold_log2() -> int:
    return int(os.environ.get("SEZKP_FRI_CHUNKED_MIN_LOG2", "26"))


def _level_c_nodes(lo, hi, seg_log2: int):
    """[m] leaf value planes -> [8, m >> CHUNK_LOG2] level-CHUNK_LOG2 nodes.

    Hashing runs in scan segments so the transient CV buffer is O(2^seg),
    not O(m) (a resident layer-0 CV buffer alone is 4 GiB at 2^27)."""
    import jax

    from ...ops import blake3_jax as BJ

    jnp = _jnp()
    m = lo.shape[0]
    c = CHUNK_LOG2

    def reduce_block(slo, shi):
        cv = _hash_leaves_planes(slo, shi)
        for _ in range(c):
            cv = BJ.parent_level_planes(cv)
        return cv

    seg = 1 << seg_log2
    if m <= seg:
        return reduce_block(lo, hi)
    n_seg = m // seg

    def body(_, i):
        slo = jax.lax.dynamic_slice_in_dim(lo, i * seg, seg)
        shi = jax.lax.dynamic_slice_in_dim(hi, i * seg, seg)
        return None, reduce_block(slo, shi)

    _, out = jax.lax.scan(body, None, jnp.arange(n_seg, dtype=jnp.int32))
    return out.transpose(1, 0, 2).reshape(8, m >> c)


def _top_from_level_c(cvc):
    """[8, K] level-CHUNK_LOG2 nodes -> concatenated upper levels [8, 2K-1]."""
    from ...ops import blake3_jax as BJ

    levels = [cvc]
    while levels[-1].shape[1] > 1:
        levels.append(BJ.parent_level_planes(levels[-1]))
    return _jnp().concatenate(levels, axis=1)


@lru_cache(maxsize=4)
def _jit_phase1_big(n_log2: int, seg_log2: int):
    import jax

    def f(lo, hi):
        return _top_from_level_c(_level_c_nodes(lo, hi, seg_log2))

    return jax.jit(f)


@lru_cache(maxsize=32)
def _jit_fold_commit_big(m_log2: int, seg_log2: int):
    """One FRI fold step on a 2^m layer + chunked commit of the folded layer.

    Keyed by layer size so compilations are shared across domains (a 2^27
    prove and a 2^25 prove reuse every common layer size)."""
    import jax

    from ...ops import goldilocks_jax as FJ

    half = 1 << (m_log2 - 1)

    def f(lo, hi, blo, bhi):
        jnp = _jnp()
        folded = FJ.add(
            (lo[:half], hi[:half]),
            FJ.mul(
                (jnp.broadcast_to(blo, (half,)), jnp.broadcast_to(bhi, (half,))),
                (lo[half:], hi[half:]),
            ),
        )
        tops = _top_from_level_c(_level_c_nodes(folded[0], folded[1], seg_log2))
        return folded[0], folded[1], tops

    return jax.jit(f)


@lru_cache(maxsize=8)
def _jit_fri_chunk_paths(chunk_bucket: int, req_bucket: int):
    """Recompute `chunk_bucket` DISTINCT queried chunks' trees from a
    layer's value planes, then answer `req_bucket` path requests against
    them; per request returns (in-chunk sibling path [CHUNK_LOG2, 8],
    value limbs). Each distinct chunk is gathered and hashed exactly once
    even when several queries land in it (ADVICE r2). FRI leaves hash
    with an empty prefix (merkle.rs:132-138)."""
    import jax

    from ...ops import blake3_jax as BJ

    chunk = 1 << CHUNK_LOG2

    def f(lo, hi, starts, req_chunk, idxs):
        jnp = _jnp()
        offs = starts[:, None] + jnp.arange(chunk, dtype=jnp.int32)[None, :]
        slo = lo[offs.reshape(-1)].reshape(chunk_bucket, chunk)
        shi = hi[offs.reshape(-1)].reshape(chunk_bucket, chunk)
        pref = jnp.asarray(BJ._prefix_words(b""))
        cur = jax.vmap(lambda l, h: BJ.hash_leaves_u64_words(l, h, pref, 0))(
            slo, shi
        )  # [chunk_bucket, chunk, 8]
        rc = req_chunk.astype(jnp.int32)
        ix = idxs.astype(jnp.int32)
        vlo = slo[rc, ix]
        vhi = shi[rc, ix]
        cur_idx = ix
        paths = []
        m = chunk
        while m > 1:
            sib = cur_idx ^ 1
            paths.append(cur[rc, sib, :])  # [req_bucket, 8]
            cur = jax.vmap(BJ.parent_level)(cur)
            cur_idx = cur_idx >> 1
            m >>= 1
        return jnp.stack(paths, axis=1), vlo, vhi

    return jax.jit(f)


@lru_cache(maxsize=4)
def _jit_phase2(n_log2: int, dev_layers: int):
    import jax

    from ...ops import blake3_jax as BJ
    from ...ops import goldilocks_jax as FJ

    n = 1 << n_log2

    def f(lo, hi, betas_lo, betas_hi):
        jnp = _jnp()
        vals_flat = []
        nodes_flat = []
        roots = []
        cur = (lo, hi)
        for l in range(dev_layers):
            half = (n >> l) // 2
            beta = (betas_lo[l], betas_hi[l])
            folded = FJ.add(
                (cur[0][:half], cur[1][:half]),
                FJ.mul(
                    (jnp.broadcast_to(beta[0], (half,)), jnp.broadcast_to(beta[1], (half,))),
                    (cur[0][half:], cur[1][half:]),
                ),
            )
            cur = folded
            vals_flat.append(folded[0])
            vals_flat.append(folded[1])
            cv = _hash_leaves_planes(folded[0], folded[1])
            node_levels = [cv]
            while node_levels[-1].shape[1] > 1:
                node_levels.append(BJ.parent_level_planes(node_levels[-1]))
            nodes_flat += node_levels
            roots.append(node_levels[-1][:, 0])
        return (
            jnp.concatenate(vals_flat[0::2]),
            jnp.concatenate(vals_flat[1::2]),
            jnp.concatenate(nodes_flat, axis=1),
            jnp.stack(roots),
            cur[0],
            cur[1],
        )

    return jax.jit(f)


def _cv_bytes(cv_rows: np.ndarray) -> np.ndarray:
    out = np.ascontiguousarray(cv_rows, dtype="<u4")
    return out.view(np.uint8).reshape(out.shape[0], 32)


class DeviceFri:
    """FRI engine with device-resident layers.

    Usage (mirrors the transcript schedule):
        fri = DeviceFri(lde_vals)
        root0 = fri.commit_layer0()          # absorb, then derive betas
        roots = fri.commit_rest(betas)       # absorb each
        q = fri.open_queries(fri_rows)       # after query derivation
    """

    def __init__(self, lde_vals_u64=None, planes=None):
        import jax.numpy as jnp

        from ...ops import goldilocks_jax as FJ

        if planes is not None:
            self._vals0_host = None
            self._lde = planes
            self.n = int(planes[0].shape[0])
        else:
            self.n = int(lde_vals_u64.shape[0])
            self._vals0_host = np.asarray(lde_vals_u64, dtype=np.uint64)
            p = FJ.pack(self._vals0_host)
            self._lde = (jnp.asarray(p[0]), jnp.asarray(p[1]))
        self.n_log2 = self.n.bit_length() - 1
        assert 1 << self.n_log2 == self.n
        # guard: the smallest device layer (MIN_DEVICE_LAYER_LOG2) must be
        # at least one full chunk, or _level_c_nodes degenerates and the
        # chunk-path gathers clamp out of bounds (ADVICE r2)
        self._big = self.n_log2 >= max(_big_threshold_log2(), CHUNK_LOG2 + 1)
        self._big_vals: Dict[int, Tuple] = {}  # layer -> (lo, hi) device planes
        self._tops_dev: Dict[int, object] = {}  # layer -> [8, 2K-1] top planes
        self._tops_host: Dict[int, List[np.ndarray]] = {}  # layer -> per-level [size, 32] u8
        self._nodes0 = None  # [8, 2n-1] layer-0 tree planes (leaf CVs first)
        self._vals_lo = None  # folded layer values (layers 1..) flat
        self._vals_hi = None
        self._nodes_rest = None
        self._roots: List[bytes] = []
        self._final_value: int | None = None
        self._dev_layers = 0
        self._host_layers = {}
        self._host_trees = {}

        # host-side offset tables
        self._level_sizes0 = self._tree_level_sizes(self.n)
        self._rest_layout = []  # per layer >=1: (val_off, node_offsets/list sizes)

    @staticmethod
    def _tree_level_sizes(m: int) -> List[int]:
        out = []
        while m >= 1:
            out.append(m)
            if m == 1:
                break
            m //= 2
        return out

    @staticmethod
    def _split_top_levels(tops_np: np.ndarray, m_log2: int) -> List[np.ndarray]:
        """[8, 2K-1] pulled top planes -> per-level [size, 32] u8 arrays for
        levels CHUNK_LOG2 .. m_log2 (sizes m>>c, m>>c/2, ..., 1)."""
        rows = _cv_bytes(np.ascontiguousarray(tops_np.T))  # [2K-1, 32]
        out = []
        off = 0
        size = 1 << max(m_log2 - CHUNK_LOG2, 0)
        while True:
            out.append(rows[off : off + size])
            off += size
            if size == 1:
                break
            size //= 2
        return out

    def commit_layer0(self) -> bytes:
        import jax

        if self._big:
            tops = _jit_phase1_big(self.n_log2, SEG_LOG2)(
                self._lde[0], self._lde[1]
            )
            self._tops_dev[0] = tops
            root = jax.device_get(tops[:, -1])
            return _cv_bytes(root.reshape(1, 8))[0].tobytes()
        self._nodes0 = _jit_phase1(self.n_log2)(self._lde[0], self._lde[1])
        root = jax.device_get(self._nodes0[:, -1])  # [8]
        return _cv_bytes(root.reshape(1, 8))[0].tobytes()

    def _commit_rest_big(self, betas: List[int]) -> List[bytes]:
        import jax

        from . import fri as host_fri

        self._dev_layers = max(1, self.n_log2 - MIN_DEVICE_LAYER_LOG2)
        dev_layers = self._dev_layers
        cur = self._lde
        for l in range(1, dev_layers + 1):
            m_log2 = self.n_log2 - (l - 1)
            b = betas[l - 1]
            flo, fhi, tops = _jit_fold_commit_big(m_log2, SEG_LOG2)(
                cur[0], cur[1],
                np.uint32(b & 0xFFFFFFFF), np.uint32(b >> 32),
            )
            cur = (flo, fhi)
            self._big_vals[l] = cur
            self._tops_dev[l] = tops

        # ONE pull: all layers' top nodes (a few MB) + the tail values
        order = sorted(self._tops_dev)
        pulled = jax.device_get(
            [self._tops_dev[l] for l in order] + [cur[0], cur[1]]
        )
        t_lo, t_hi = pulled[-2], pulled[-1]
        for l, tops_np in zip(order, pulled[:-2]):
            self._tops_host[l] = self._split_top_levels(
                tops_np, self.n_log2 - l
            )
        self._roots = [
            self._tops_host[l][-1][0].tobytes() for l in order if l >= 1
        ]

        # host tail: fold the remaining small layers from the last device layer
        tail = t_lo.astype(np.uint64) | (t_hi.astype(np.uint64) << np.uint64(32))
        self._host_layers = {}
        self._host_trees = {}
        curh = tail
        layer_idx = dev_layers
        while curh.shape[0] > 1:
            curh = host_fri.fold(curh, betas[layer_idx])
            layer_idx += 1
            tree = host_fri.layer_tree(curh)
            self._host_layers[layer_idx] = curh
            self._host_trees[layer_idx] = tree
            self._roots.append(tree.root())
        self._final_value = int(curh[0])
        return list(self._roots)

    def commit_rest(self, betas: List[int]) -> List[bytes]:
        import jax
        import jax.numpy as jnp

        from . import fri as host_fri

        if self._big:
            return self._commit_rest_big(betas)
        self._dev_layers = max(1, self.n_log2 - MIN_DEVICE_LAYER_LOG2)
        dev_layers = self._dev_layers
        bl = np.array([b & 0xFFFFFFFF for b in betas], dtype=np.uint32)
        bh = np.array([b >> 32 for b in betas], dtype=np.uint32)
        vl, vh, nodes, roots, tail_lo, tail_hi = _jit_phase2(
            self.n_log2, dev_layers
        )(self._lde[0], self._lde[1], jnp.asarray(bl), jnp.asarray(bh))
        self._vals_lo, self._vals_hi, self._nodes_rest = vl, vh, nodes

        # device layout (layers 1..dev_layers)
        val_off = 0
        node_off = 0
        self._rest_layout = []
        for l in range(1, dev_layers + 1):
            m = self.n >> l
            sizes = self._tree_level_sizes(m)
            self._rest_layout.append((val_off, node_off, sizes))
            val_off += m
            node_off += sum(sizes)

        # one pull for the layer roots AND the tail values (tunnel round
        # trips are ~100 ms each; batch them)
        roots_np, t_lo, t_hi = jax.device_get((roots, tail_lo, tail_hi))
        self._roots = [r.tobytes() for r in _cv_bytes(roots_np)]

        # host tail: fold the remaining small layers from the pulled last
        # device layer (a few thousand values)
        tail = t_lo.astype(np.uint64) | (t_hi.astype(np.uint64) << np.uint64(32))
        self._host_layers = {}
        self._host_trees = {}
        cur = tail
        layer_idx = dev_layers
        while cur.shape[0] > 1:
            cur = host_fri.fold(cur, betas[layer_idx])
            layer_idx += 1
            tree = host_fri.layer_tree(cur)
            self._host_layers[layer_idx] = cur
            self._host_trees[layer_idx] = tree
            self._roots.append(tree.root())
        self._final_value = int(cur[0])
        return list(self._roots)

    def final_value_le(self) -> bytes:
        return int(self._final_value).to_bytes(8, "little")

    # ------------------------------ openings --------------------------------

    def _node_flat_index(self, layer: int, level: int, pos: int) -> Tuple[int, int]:
        """Returns (which_buffer, flat_index): 0 = layer-0 nodes, 1 = rest."""
        if layer == 0:
            off = sum(self._level_sizes0[:level])
            return 0, off + pos
        voff, noff, sizes = self._rest_layout[layer - 1]
        return 1, noff + sum(sizes[:level]) + pos

    def _value_u64(self, layer: int, idx: int, gathered_vals) -> int:
        if layer == 0:
            return int(self._vals0_host[idx])
        return gathered_vals[(layer, idx)]

    def _open_queries_big(self, fri_rows: List[int]) -> List[FriQuery]:
        """Chunked-tree openings: in-chunk sibling paths recompute the
        queried 2^CHUNK_LOG2-leaf chunk from the resident layer values (one
        batched device program per layer, ONE pull for all layers); upper
        levels come from the host-side top nodes. Bit-identical to
        fri.fri_open_query (cross-tested)."""
        import jax

        jnp = _jnp()
        n_layers = self.n_log2 + 1
        mask = (1 << CHUNK_LOG2) - 1

        per_layer: Dict[int, List[int]] = {}
        seq: Dict[Tuple[int, int], int] = {}

        def plan_chunk(layer: int, t: int) -> int:
            key = (layer, t)
            if key not in seq:
                lst = per_layer.setdefault(layer, [])
                seq[key] = len(lst)
                lst.append(t)
            return seq[key]

        def plan_value(layer: int, idx: int):
            if layer == 0 and self._vals0_host is not None:
                return ("host", idx)
            if layer > self._dev_layers:
                return ("hostlayer", (layer, idx))
            return ("chunkval", layer, plan_chunk(layer, idx))

        def plan_path(layer: int, layer_len: int, target: int):
            if layer > self._dev_layers:
                return ("hosttree", layer, target)
            return ("chunkpath", layer, plan_chunk(layer, target), target, layer_len)

        plans = []
        for idx0 in fri_rows:
            positions = []
            layer_plan = []
            idx = idx0
            layer_len = self.n
            for l in range(n_layers - 1):
                positions.append(idx)
                half = layer_len // 2
                j = idx ^ half
                layer_plan.append(
                    (
                        plan_value(l, idx),
                        plan_path(l, layer_len, idx),
                        plan_value(l, j),
                        plan_path(l, layer_len, j),
                    )
                )
                idx = idx % half
                layer_len = half
            positions.append(idx)
            plans.append((positions, layer_plan))

        # one batched chunk-recompute program per layer, then ONE pull;
        # distinct chunks hashed once, requests answered by index
        calls = {}
        for layer, targets in per_layer.items():
            vals = self._lde if layer == 0 else self._big_vals[layer]
            k = len(targets)
            chunk_rows: Dict[int, int] = {}
            req_chunk = np.zeros(max(8, 1 << (k - 1).bit_length()), np.int32)
            idxs = np.zeros(req_chunk.shape[0], dtype=np.uint32)
            for i, t in enumerate(targets):
                c = t & ~mask
                req_chunk[i] = chunk_rows.setdefault(c, len(chunk_rows))
                idxs[i] = t & mask
            nc = len(chunk_rows)
            cb = max(8, 1 << (nc - 1).bit_length())
            starts = np.zeros(cb, dtype=np.int32)
            starts[:nc] = list(chunk_rows)
            calls[layer] = _jit_fri_chunk_paths(cb, req_chunk.shape[0])(
                vals[0], vals[1], jnp.asarray(starts),
                jnp.asarray(req_chunk), jnp.asarray(idxs)
            )
        got = jax.device_get(calls)
        paths8: Dict[int, np.ndarray] = {}
        vals_np: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}
        for layer, (p, vlo, vhi) in got.items():
            k = len(per_layer[layer])
            paths8[layer] = (
                np.ascontiguousarray(p, dtype="<u4")
                .view(np.uint8)
                .reshape(p.shape[0], CHUNK_LOG2, 32)[:k]
            )
            vals_np[layer] = (vlo, vhi)

        def value_bytes(ref) -> bytes:
            kind = ref[0]
            if kind == "host":
                return int(self._vals0_host[ref[1]]).to_bytes(8, "little")
            if kind == "hostlayer":
                layer, idx = ref[1]
                return int(self._host_layers[layer][idx]).to_bytes(8, "little")
            _, layer, i = ref
            vlo, vhi = vals_np[layer]
            return (int(vlo[i]) | (int(vhi[i]) << 32)).to_bytes(8, "little")

        def path_bytes(ref) -> List[bytes]:
            if ref[0] == "hosttree":
                _, layer, target = ref
                return self._host_trees[layer].open(target)
            _, layer, i, target, layer_len = ref
            m_log2 = layer_len.bit_length() - 1
            out = [paths8[layer][i, lev].tobytes() for lev in range(min(CHUNK_LOG2, m_log2))]
            tops = self._tops_host[layer]
            t_top = target >> CHUNK_LOG2
            for v in range(CHUNK_LOG2, m_log2):
                out.append(tops[v - CHUNK_LOG2][t_top ^ 1].tobytes())
                t_top >>= 1
            return out

        queries = []
        for positions, layer_plan in plans:
            pairs = [
                (value_bytes(vi), path_bytes(pi), value_bytes(vj), path_bytes(pj))
                for vi, pi, vj, pj in layer_plan
            ]
            queries.append(FriQuery(positions=positions, pairs=pairs))
        return queries

    def open_queries(self, fri_rows: List[int]) -> List[FriQuery]:
        """Assemble FriQuery objects for all query indices.

        One planning pass records every node/value gather with its sequence
        number; two device gathers fetch everything; assembly substitutes the
        gathered rows. Bit-identical to fri.fri_open_query."""
        import jax
        import jax.numpy as jnp

        if self._big:
            return self._open_queries_big(fri_rows)

        n_layers = self.n_log2 + 1
        node_reqs0: List[int] = []
        node_reqs1: List[int] = []
        val_reqs: List[Tuple[int, int]] = []
        val_seq = {}
        val0_reqs: List[int] = []
        val0_seq = {}

        def plan_value(layer: int, idx: int):
            if layer == 0:
                if self._vals0_host is not None:
                    return ("host", idx)
                if idx not in val0_seq:
                    val0_seq[idx] = len(val0_reqs)
                    val0_reqs.append(idx)
                return ("val0", val0_seq[idx])
            if layer > self._dev_layers:
                return ("hostlayer", (layer, idx))
            key = (layer, idx)
            if key not in val_seq:
                val_seq[key] = len(val_reqs)
                val_reqs.append(key)
            return ("val", val_seq[key])

        def plan_path(layer: int, layer_len: int, target: int):
            if layer > self._dev_layers:
                return ("hosttree", layer, target)
            refs = []
            m = layer_len
            t = target
            lev = 0
            while m > 1:
                sib = t ^ 1 if (t ^ 1) < m else t
                buf, flat = self._node_flat_index(layer, lev, sib)
                if buf == 0:
                    refs.append((0, len(node_reqs0)))
                    node_reqs0.append(flat)
                else:
                    refs.append((1, len(node_reqs1)))
                    node_reqs1.append(flat)
                t >>= 1
                m //= 2
                lev += 1
            return refs

        plans = []
        for idx0 in fri_rows:
            positions = []
            layer_plan = []
            idx = idx0
            layer_len = self.n
            for l in range(n_layers - 1):
                positions.append(idx)
                half = layer_len // 2
                j = idx ^ half
                layer_plan.append(
                    (
                        plan_value(l, idx),
                        plan_path(l, layer_len, idx),
                        plan_value(l, j),
                        plan_path(l, layer_len, j),
                    )
                )
                idx = idx % half
                layer_len = half
            positions.append(idx)
            plans.append((positions, layer_plan))

        # queue every device gather, then ONE pull for all of them (the
        # tunnel round-trip is ~100 ms; per-buffer pulls would pay it 4x)
        pulls = {}
        if node_reqs0:
            pulls["g0"] = self._nodes0[
                :, jnp.asarray(np.array(node_reqs0, dtype=np.int32))
            ].T
        if node_reqs1:
            pulls["g1"] = self._nodes_rest[
                :, jnp.asarray(np.array(node_reqs1, dtype=np.int32))
            ].T
        if val_reqs:
            vidx = jnp.asarray(
                np.array(
                    [self._rest_layout[l - 1][0] + i for l, i in val_reqs],
                    dtype=np.int32,
                )
            )
            pulls["vlo"] = self._vals_lo[vidx]
            pulls["vhi"] = self._vals_hi[vidx]
        if val0_reqs:
            v0idx = jnp.asarray(np.array(val0_reqs, dtype=np.int32))
            pulls["v0lo"] = self._lde[0][v0idx]
            pulls["v0hi"] = self._lde[1][v0idx]
        got = jax.device_get(pulls)
        g0 = _cv_bytes(got["g0"]) if node_reqs0 else np.zeros((0, 32), np.uint8)
        g1 = _cv_bytes(got["g1"]) if node_reqs1 else np.zeros((0, 32), np.uint8)
        vlo = got.get("vlo", np.zeros(0, np.uint32))
        vhi = got.get("vhi", np.zeros(0, np.uint32))
        v0lo = got.get("v0lo", np.zeros(0, np.uint32))
        v0hi = got.get("v0hi", np.zeros(0, np.uint32))

        def value_bytes(ref) -> bytes:
            kind, x = ref
            if kind == "host":
                return int(self._vals0_host[x]).to_bytes(8, "little")
            if kind == "val0":
                return (int(v0lo[x]) | (int(v0hi[x]) << 32)).to_bytes(8, "little")
            if kind == "hostlayer":
                layer, idx = x
                return int(self._host_layers[layer][idx]).to_bytes(8, "little")
            return (int(vlo[x]) | (int(vhi[x]) << 32)).to_bytes(8, "little")

        def path_bytes(refs) -> List[bytes]:
            if isinstance(refs, tuple) and refs and refs[0] == "hosttree":
                _, layer, target = refs
                return self._host_trees[layer].open(target)
            return [
                (g0[i] if buf == 0 else g1[i]).tobytes() for buf, i in refs
            ]

        queries = []
        for positions, layer_plan in plans:
            pairs = [
                (value_bytes(vi), path_bytes(pi), value_bytes(vj), path_bytes(pj))
                for vi, pi, vj, pj in layer_plan
            ]
            queries.append(FriQuery(positions=positions, pairs=pairs))
        return queries

    @staticmethod
    def _level_of(layer_len: int, m: int) -> int:
        return layer_len.bit_length() - m.bit_length()
