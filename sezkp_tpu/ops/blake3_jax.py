"""Batched BLAKE3 on TPU (JAX/VPU), for single-block messages.

Every hot hashing path in this framework hashes *short* messages:

- FRI layer leaves:      8-byte field encodings
- labeled column leaves: DS prefix + label + 8 bytes (< 64 bytes)
- Merkle parents:        left||right = exactly 64 bytes
- manifest block leaves: 50 + 24*tau + 16 bytes (single chunk; <=64 for tau<=?)

A message of <= 64 bytes is one BLAKE3 compression with flags
CHUNK_START|CHUNK_END|ROOT and counter 0 (see crypto/blake3_py.py for the
reference implementation). This module vectorizes that compression over N
messages as pure uint32 ops — an ideal VPU workload — and builds whole Merkle
levels/trees on device.

Cross-tested bit-exactly against the host implementation.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

U32 = jnp.uint32

IV = np.array(
    [0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
     0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19],
    dtype=np.uint32,
)

MSG_PERM = np.array([2, 6, 3, 10, 7, 0, 4, 13, 1, 11, 12, 5, 9, 14, 15, 8])

CHUNK_START = np.uint32(1)
CHUNK_END = np.uint32(2)
PARENT = np.uint32(4)
ROOT = np.uint32(8)


def _rotr(x, n):
    return (x >> n) | (x << (32 - n))


def _round(v, msg):
    """One BLAKE3 round. v, msg: uint32 [16, N]."""

    def g(v, a, b, c, d, mx, my):
        va = v[a] + v[b] + mx
        vd = _rotr(v[d] ^ va, 16)
        vc = v[c] + vd
        vb = _rotr(v[b] ^ vc, 12)
        va = va + vb + my
        vd = _rotr(vd ^ va, 8)
        vc = vc + vd
        vb = _rotr(vb ^ vc, 7)
        return v.at[a].set(va).at[b].set(vb).at[c].set(vc).at[d].set(vd)

    v = g(v, 0, 4, 8, 12, msg[0], msg[1])
    v = g(v, 1, 5, 9, 13, msg[2], msg[3])
    v = g(v, 2, 6, 10, 14, msg[4], msg[5])
    v = g(v, 3, 7, 11, 15, msg[6], msg[7])
    v = g(v, 0, 5, 10, 15, msg[8], msg[9])
    v = g(v, 1, 6, 11, 12, msg[10], msg[11])
    v = g(v, 2, 7, 8, 13, msg[12], msg[13])
    v = g(v, 3, 4, 9, 14, msg[14], msg[15])
    return v


def compress_batch(m, block_len: int, flags: int, out_words: int = 8):
    """Single-block BLAKE3 compression over a batch.

    m: uint32 [N, 16] message words (LE), zero-padded.
    Returns uint32 [N, out_words] (8 for CV/digest, 16 for XOF block 0).
    Counter is 0 (single-chunk / parent messages only).

    The 7 rounds run under lax.fori_loop with a gather-permutation of the
    message schedule — unrolling them trips an exponential-time XLA:CPU
    compile pathology (TPU compiles either form fine).

    On TPU, large batches dispatch to the Pallas kernel (blake3_pallas.py):
    fully unrolled rounds in VMEM, one HBM pass — ~50x this staged path.
    """
    n = m.shape[0]
    if n >= 1024 and jax.default_backend() == "tpu":
        from . import blake3_pallas

        return blake3_pallas.compress_rows(m, block_len, flags, out_words)
    iv_rows = jnp.broadcast_to(jnp.asarray(IV, U32)[:, None], (8, n))
    tail = jnp.stack(
        [
            jnp.broadcast_to(jnp.asarray(IV[0], U32), (n,)),
            jnp.broadcast_to(jnp.asarray(IV[1], U32), (n,)),
            jnp.broadcast_to(jnp.asarray(IV[2], U32), (n,)),
            jnp.broadcast_to(jnp.asarray(IV[3], U32), (n,)),
            jnp.zeros(n, U32),
            jnp.zeros(n, U32),
            jnp.full(n, np.uint32(block_len), U32),
            jnp.full(n, np.uint32(flags), U32),
        ]
    )
    v0 = jnp.concatenate([iv_rows, tail], axis=0)  # [16, N]
    msg0 = m.T  # [16, N]
    perm = jnp.asarray(MSG_PERM)

    def body(_r, carry):
        v, msg = carry
        return _round(v, msg), msg[perm]

    v, _ = jax.lax.fori_loop(0, 7, body, (v0, msg0))
    out = v[:8] ^ v[8:16]
    if out_words == 8:
        return out.T
    ext = v[8:16] ^ iv_rows
    return jnp.concatenate([out, ext], axis=0).T


def compress_planes_staged(m16, block_len: int, flags: int, out_words: int = 8):
    """Word-major staged compression: uint32 [16, N] planes -> [out_words, N].

    Same semantics as blake3_pallas.compress_planes, but the 7 rounds run
    under lax.fori_loop with a gather-permuted schedule — the only form that
    XLA:CPU compiles in sane time (the unrolled form trips an exponential
    compile pathology; see compress_batch). Used as the off-TPU fallback for
    the plane-major device paths (FRI trees, column commits)."""
    n = m16.shape[1]
    iv_rows = jnp.broadcast_to(jnp.asarray(IV, U32)[:, None], (8, n))
    tail = jnp.stack(
        [
            jnp.broadcast_to(jnp.asarray(IV[0], U32), (n,)),
            jnp.broadcast_to(jnp.asarray(IV[1], U32), (n,)),
            jnp.broadcast_to(jnp.asarray(IV[2], U32), (n,)),
            jnp.broadcast_to(jnp.asarray(IV[3], U32), (n,)),
            jnp.zeros(n, U32),
            jnp.zeros(n, U32),
            jnp.full(n, np.uint32(block_len), U32),
            jnp.full(n, np.uint32(flags), U32),
        ]
    )
    v0 = jnp.concatenate([iv_rows, tail], axis=0)  # [16, N]
    perm = jnp.asarray(MSG_PERM)

    def body(_r, carry):
        v, msg = carry
        return _round(v, msg), msg[perm]

    v, _ = jax.lax.fori_loop(0, 7, body, (v0, m16.astype(U32)))
    out = v[:8] ^ v[8:16]
    if out_words == 8:
        return out
    ext = v[8:16] ^ iv_rows
    return jnp.concatenate([out, ext], axis=0)


def _prefix_words(prefix: bytes) -> np.ndarray:
    pw = np.zeros(16 * 4, dtype=np.uint8)
    pw[: len(prefix)] = np.frombuffer(prefix, dtype=np.uint8)
    return pw.view("<u4").copy()  # [16]


def hash_leaves_u64_words(lo, hi, pref_words, plen: int):
    """Hash N messages of (prefix || 8-byte LE value) -> uint32 [N, 8] CVs.

    lo/hi: uint32 [N] field limbs; pref_words: uint32 [16] zero-padded prefix
    (traced, so one compile serves every prefix of the same length);
    plen: static prefix byte length, plen + 8 <= 64.
    """
    total = plen + 8
    assert total <= 64
    n = lo.shape[0]
    m = [jnp.broadcast_to(pref_words[i], (n,)) for i in range(16)]

    # splice the value bytes at offset plen
    word0 = plen // 4
    sh = (plen % 4) * 8
    vals = [lo.astype(U32), hi.astype(U32)]
    if sh == 0:
        m[word0] = vals[0]
        m[word0 + 1] = vals[1]
    else:
        m[word0] = m[word0] | (vals[0] << sh)
        m[word0 + 1] = (vals[0] >> (32 - sh)) | (vals[1] << sh)
        m[word0 + 2] = vals[1] >> (32 - sh)
    mm = jnp.stack(m, axis=1)
    return compress_batch(mm, total, int(CHUNK_START | CHUNK_END | ROOT))


def hash_leaves_u64(lo, hi, prefix: bytes = b""):
    """Convenience wrapper over hash_leaves_u64_words (prefix as bytes)."""
    return hash_leaves_u64_words(
        lo, hi, jnp.asarray(_prefix_words(prefix)), len(prefix)
    )


def parent_level(nodes):
    """One Merkle level: uint32 [N, 8] -> [N/2, 8] (N even).

    Parent = BLAKE3(left||right): 64-byte single-block message."""
    n = nodes.shape[0] // 2
    m = nodes.reshape(n, 16)
    return compress_batch(m, 64, int(CHUNK_START | CHUNK_END | ROOT))


# -------------------- plane-major (word-major) variants ---------------------
# Row-major [N, 8]/[N, 16] CV buffers tile as (8, 128) with only 8/16 lanes
# occupied — 8-16x HBM padding, which OOMs the FRI tree at 2^25 leaves.
# These variants keep CVs as [8, N] planes (full lane occupancy) end-to-end.


def hash_leaves_u64_planes(lo, hi, pref_words, plen: int):
    """Hash N messages of (prefix || 8-byte LE value) -> uint32 [8, N] CV
    planes. Same semantics as hash_leaves_u64_words, word-major layout."""
    total = plen + 8
    assert total <= 64
    n = lo.shape[0]
    m = [jnp.broadcast_to(pref_words[i], (n,)) for i in range(16)]
    word0 = plen // 4
    sh = (plen % 4) * 8
    vals = [lo.astype(U32), hi.astype(U32)]
    if sh == 0:
        m[word0] = vals[0]
        m[word0 + 1] = vals[1]
    else:
        m[word0] = m[word0] | (vals[0] << sh)
        m[word0 + 1] = (vals[0] >> (32 - sh)) | (vals[1] << sh)
        m[word0 + 2] = vals[1] >> (32 - sh)
    from . import blake3_pallas

    m16 = jnp.stack(m, axis=0)  # [16, N] — natural (8,128) tiling
    return blake3_pallas.compress_planes(
        m16, total, int(CHUNK_START | CHUNK_END | ROOT)
    )


def parent_level_planes(cv):
    """One Merkle level on [8, N] CV planes -> [8, N/2].

    Parent message words 0-7 = left child CV (even columns), 8-15 = right
    child CV (odd columns)."""
    from . import blake3_pallas

    m16 = jnp.concatenate([cv[:, 0::2], cv[:, 1::2]], axis=0)  # [16, N/2]
    return blake3_pallas.compress_planes(
        m16, 64, int(CHUNK_START | CHUNK_END | ROOT)
    )


def merkle_root_pow2(leaves):
    """Perfect-tree root over uint32 [2^k, 8] leaf CVs -> [1, 8]."""
    cur = leaves
    while cur.shape[0] > 1:
        cur = parent_level(cur)
    return cur


@lru_cache(maxsize=32)
def _jit_leaf_hash(plen: int):
    # Keyed on prefix LENGTH only: the prefix words are a traced input, so
    # e.g. all 59 column labels of one tau share a couple of compilations.
    return jax.jit(partial(hash_leaves_u64_words, plen=plen))


def hash_field_leaves_device(values_u64: np.ndarray, prefix: bytes = b"") -> np.ndarray:
    """Host-convenience: u64 values -> [N, 32] uint8 digests via the device."""
    v = np.asarray(values_u64, dtype=np.uint64)
    lo = jnp.asarray((v & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    hi = jnp.asarray((v >> np.uint64(32)).astype(np.uint32))
    cv = _jit_leaf_hash(len(prefix))(lo, hi, jnp.asarray(_prefix_words(prefix)))
    out = np.ascontiguousarray(np.asarray(cv), dtype="<u4")
    return out.view(np.uint8).reshape(v.shape[0], 32)


@lru_cache(maxsize=32)
def _jit_tree_root(k: int):
    def f(leaves):
        return merkle_root_pow2(leaves)

    return jax.jit(f)


def merkle_root_device(leaf_digests: np.ndarray) -> bytes:
    """Left-balanced odd-promotion root over [N, 32]-byte leaves on device.

    Decomposes N into power-of-two runs (binary representation); each run is
    a perfect subtree reduced on device, and the O(log N) run roots are folded
    on host exactly like the streaming Frontier."""
    lv = np.ascontiguousarray(leaf_digests, dtype=np.uint8)
    n = lv.shape[0]
    if n == 0:
        return b"\x00" * 32
    words = lv.reshape(n, 8, 4).view("<u4").reshape(n, 8)
    roots = []
    pos = 0
    for bit in range(n.bit_length() - 1, -1, -1):
        size = 1 << bit
        if n & size:
            sub = jnp.asarray(words[pos : pos + size])
            r = np.asarray(_jit_tree_root(bit)(sub))
            roots.append(r.astype("<u4").view(np.uint8).reshape(32))
            pos += size
    # Fold the run roots right-to-left (accumulator on the right); this
    # reproduces the batch left-balanced odd-promotion shape at every size.
    from ..crypto import blake3 as b3

    acc = roots[-1].tobytes()
    for r in reversed(roots[:-1]):
        acc = b3.hash_bytes(r.tobytes() + acc)
    return acc


# ---------------------- device tree building (bulk paths) -------------------


@lru_cache(maxsize=8)
def _jit_tree_levels(n_log2: int):
    """leaf CVs [2^k, 8] -> tuple of all levels above the leaves."""

    def f(leaves):
        levels = []
        cur = leaves
        while cur.shape[0] > 1:
            cur = parent_level(cur)
            levels.append(cur)
        return tuple(levels)

    return jax.jit(f)


def _cv_to_bytes(cv: np.ndarray) -> np.ndarray:
    out = np.ascontiguousarray(np.asarray(cv), dtype="<u4")
    return out.view(np.uint8).reshape(out.shape[0], 32)


def tree_levels_device(leaf_digests: np.ndarray):
    """All Merkle levels for a power-of-two leaf count, built on device.

    Returns [leaves, level1, ..., root] as uint8 [m, 32] arrays — the exact
    format of stark.v1.merkle.MerkleTree.levels."""
    n = leaf_digests.shape[0]
    assert n & (n - 1) == 0 and n > 0
    lv = np.ascontiguousarray(leaf_digests, dtype=np.uint8)
    if n == 1:
        return [lv]
    words = jnp.asarray(lv.reshape(n, 8, 4).view("<u4").reshape(n, 8))
    upper = _jit_tree_levels(n.bit_length() - 1)(words)
    return [lv] + [_cv_to_bytes(u) for u in upper]


@lru_cache(maxsize=8)
def _jit_chunk_roots(n_chunks: int, chunk_log2: int):
    def f(leaves):  # [n_chunks * chunk, 8]
        cur = leaves
        width = 1 << chunk_log2
        while width > 1:
            cur = parent_level(cur)
            width >>= 1
        return cur  # [n_chunks, 8]

    return jax.jit(f)


def chunk_roots_device(leaf_digests: np.ndarray, chunk_log2: int) -> np.ndarray:
    """Per-chunk tree roots for FULL chunks, all reduced simultaneously on
    device. leaf count must be a multiple of 2^chunk_log2. Returns [n_chunks, 32]."""
    chunk = 1 << chunk_log2
    n = leaf_digests.shape[0]
    assert n % chunk == 0
    lv = np.ascontiguousarray(leaf_digests, dtype=np.uint8)
    words = jnp.asarray(lv.reshape(n, 8, 4).view("<u4").reshape(n, 8))
    roots = _jit_chunk_roots(n // chunk, chunk_log2)(words)
    return _cv_to_bytes(roots)


# ------------- batched column commitment (one pull per prefix group) --------


@lru_cache(maxsize=8)
def _jit_tree_levels_flat(n_log2: int):
    """leaf CVs [2^k, 8] -> single [2^k - 1, 8] concat of all upper levels."""

    def f(leaves):
        levels = []
        cur = leaves
        while cur.shape[0] > 1:
            cur = parent_level(cur)
            levels.append(cur)
        return jnp.concatenate(levels, axis=0)

    return jax.jit(f)


def tree_levels_device_flat(leaf_digests: np.ndarray):
    """Like tree_levels_device but with ONE device->host transfer (the axon
    tunnel is latency-bound, so per-level pulls dominate otherwise)."""
    n = leaf_digests.shape[0]
    assert n & (n - 1) == 0 and n > 0
    lv = np.ascontiguousarray(leaf_digests, dtype=np.uint8)
    if n == 1:
        return [lv]
    words = jnp.asarray(lv.reshape(n, 8, 4).view("<u4").reshape(n, 8))
    flat = _cv_to_bytes(_jit_tree_levels_flat(n.bit_length() - 1)(words))
    levels = [lv]
    pos = 0
    m = n // 2
    while m >= 1:
        levels.append(flat[pos : pos + m])
        pos += m
        m //= 2
    return levels


@lru_cache(maxsize=8)
def _jit_columns_commit(plen: int, n_cols: int, chunk_log2: int):
    """values [C, n] (as lo/hi) + prefixes [C, 16] -> (leaves, chunk roots).

    vmapped over columns so the graph size is independent of C (an unrolled
    per-column loop makes the TPU compile take minutes)."""

    def one_column(lo, hi, pref):
        cv = hash_leaves_u64_words(lo, hi, pref, plen)
        cur = cv
        width = 1 << chunk_log2
        while width > 1:
            cur = parent_level(cur)
            width >>= 1
        return cv, cur

    return jax.jit(jax.vmap(one_column))


def columns_commit_device(
    values_u64: np.ndarray,
    prefixes,
    chunk_log2: int,
    resident: bool = False,
    defer_pull: bool = False,
):
    """Hash + chunk-commit many columns in one device round-trip.

    values_u64: [C, n] with n a multiple of 2^chunk_log2.
    prefixes: list of C byte strings (all the SAME length).

    resident=False: returns (leaves uint8 [C, n, 32], chunk_roots uint8
    [C, n_chunks, 32]) — both pulled to host.
    resident=True: the leaf CVs STAY on device (returned as jnp uint32
    [C, n, 8]); only the chunk roots cross the host link.
    """
    v = np.asarray(values_u64, dtype=np.uint64)
    c, n = v.shape
    assert n % (1 << chunk_log2) == 0
    plens = {len(p) for p in prefixes}
    assert len(plens) == 1, "group columns by prefix length first"
    plen = plens.pop()
    lo = jnp.asarray((v & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    hi = jnp.asarray((v >> np.uint64(32)).astype(np.uint32))
    prefs = jnp.asarray(np.stack([_prefix_words(p) for p in prefixes]))
    cvs, roots = _jit_columns_commit(plen, c, chunk_log2)(lo, hi, prefs)
    n_chunks = n >> chunk_log2
    if resident:
        roots = roots.reshape(c, n_chunks, 8)
        if defer_pull:
            return cvs, roots
        return cvs, croots_to_host(jax.device_get(roots))
    cvs_np, roots_np = jax.device_get((cvs, roots))  # one transfer
    leaves = (
        np.ascontiguousarray(cvs_np, dtype="<u4").view(np.uint8).reshape(c, n, 32)
    )
    croots = (
        np.ascontiguousarray(roots_np, dtype="<u4")
        .view(np.uint8)
        .reshape(c, n_chunks, 32)
    )
    return leaves, croots


# -------------- device path extraction (openings without leaf pulls) --------


@lru_cache(maxsize=8)
def _jit_chunk_paths(chunk_log2: int, bucket: int):
    """leaves [K, chunk, 8] + idx [K] -> (paths [K, chunk_log2, 8], root [K, 8]).

    Builds each chunk's tree level-by-level (vmapped) and gathers the sibling
    node along the way — only the paths travel back to the host."""

    def f(leaves_flat, starts, idx):
        chunk = 1 << chunk_log2
        offs = starts[:, None] + jnp.arange(chunk, dtype=jnp.int32)[None, :]
        cur = leaves_flat[offs.reshape(-1)].reshape(bucket, chunk, 8)  # [K, m, 8]
        cur_idx = idx
        paths = []
        m = 1 << chunk_log2
        while m > 1:
            sib = (cur_idx ^ 1).astype(jnp.int32)
            paths.append(
                jnp.take_along_axis(cur, sib[:, None, None], axis=1)[:, 0, :]
            )
            cur = jax.vmap(parent_level)(cur)
            cur_idx = cur_idx >> 1
            m >>= 1
        return jnp.stack(paths, axis=1), cur[:, 0, :]

    return jax.jit(f)


def chunk_paths_device(
    leaves_dev, chunk_starts, idx_in_chunk, chunk_log2: int, defer_pull: bool = False
):
    """Extract inner-chunk Merkle paths for K (chunk, index) requests.

    leaves_dev: jnp uint32 [n, 8] leaf CVs (resident on device).
    chunk_starts: np int array [K] (row offsets of each chunk).
    idx_in_chunk: np int array [K].
    Returns (paths uint8 [K, chunk_log2, 32], roots uint8 [K, 32]).

    defer_pull=True instead returns the DEVICE (paths, roots) arrays plus a
    decoder `finish(paths_np, roots_np)` so the caller can batch the
    device->host pull with other buffers."""
    chunk = 1 << chunk_log2
    k = len(chunk_starts)
    bucket = max(64, 1 << (k - 1).bit_length()) if k else 64
    starts = np.zeros(bucket, dtype=np.int32)
    starts[:k] = np.asarray(chunk_starts, dtype=np.int32)
    idxs = np.zeros(bucket, dtype=np.uint32)
    idxs[:k] = np.asarray(idx_in_chunk, dtype=np.uint32)

    # The K chunks' leaf gather happens inside the jit (fused with the tree).
    paths, roots = _jit_chunk_paths(chunk_log2, bucket)(
        leaves_dev, jnp.asarray(starts), jnp.asarray(idxs)
    )

    def finish(paths_np, roots_np):
        paths8 = (
            np.ascontiguousarray(paths_np, dtype="<u4")
            .view(np.uint8)
            .reshape(bucket, chunk_log2, 32)[:k]
        )
        roots8 = (
            np.ascontiguousarray(roots_np, dtype="<u4")
            .view(np.uint8)
            .reshape(bucket, 32)[:k]
        )
        return paths8, roots8

    if defer_pull:
        return paths, roots, finish
    return finish(*jax.device_get((paths, roots)))




@lru_cache(maxsize=8)
def _jit_columns_commit_gather(plen: int, n_cols: int, chunk_log2: int):
    """Like _jit_columns_commit but gathers the column rows from the full
    [C_all, n] planes inside the jit (idx int32 [n_cols]) so the row
    selection fuses into the hash producers instead of costing an eager
    HBM copy per prefix group."""
    inner = _jit_columns_commit(plen, n_cols, chunk_log2)

    def f(lo_all, hi_all, idx, prefs):
        return inner(lo_all[idx], hi_all[idx], prefs)

    return jax.jit(f)


def columns_commit_from_planes(
    lo, hi, prefixes, chunk_log2: int, idx=None, defer_pull: bool = False
):
    """columns_commit_device for DEVICE-RESIDENT [C, n] u32 planes.

    `idx` (optional int array [C']) selects rows of lo/hi on device inside
    the jitted program (fused gather); without it lo/hi are used as-is.
    Returns (leaf CVs jnp [C, n, 8] resident, chunk_roots uint8 [C, nc, 32]).

    defer_pull=True returns the chunk roots as a DEVICE array instead
    (uint32 [C, nc, 8]); decode later with croots_to_host. Callers batching
    several prefix groups use this to pay the device->host round-trip
    latency once instead of per group (the tunnel pull is ~100 ms)."""
    c = len(prefixes) if idx is not None else lo.shape[0]
    n = lo.shape[1]
    assert n % (1 << chunk_log2) == 0
    plens = {len(p) for p in prefixes}
    assert len(plens) == 1
    plen = plens.pop()
    prefs = jnp.asarray(np.stack([_prefix_words(p) for p in prefixes]))
    if idx is not None:
        idx = jnp.asarray(np.asarray(idx, dtype=np.int32))
        cvs, roots = _jit_columns_commit_gather(plen, c, chunk_log2)(
            lo, hi, idx, prefs
        )
    else:
        cvs, roots = _jit_columns_commit(plen, c, chunk_log2)(lo, hi, prefs)
    n_chunks = n >> chunk_log2
    roots = roots.reshape(c, n_chunks, 8)
    if defer_pull:
        return cvs, roots
    return cvs, croots_to_host(jax.device_get(roots))


def croots_to_host(roots_np) -> np.ndarray:
    """Device-pulled uint32 [C, nc, 8] chunk roots -> uint8 [C, nc, 32]."""
    c, n_chunks, _ = roots_np.shape
    return (
        np.ascontiguousarray(roots_np, dtype="<u4")
        .view(np.uint8)
        .reshape(c, n_chunks, 32)
    )


# ------- memory-bounded commit: segment scan, roots only (large n) ----------


@lru_cache(maxsize=8)
def _jit_columns_commit_roots_scan(
    plen: int, n_cols: int, chunk_log2: int, seg_log2: int
):
    """Chunk roots for [C, n] planes WITHOUT keeping leaf CVs resident.

    lax.scan over 2^seg_log2-row segments bounds the peak HLO temp to one
    segment's messages/CVs (the vmapped whole-trace kernel materializes a
    [C, n, 16] message temp — 16 GB at n = 2^22 — and an 8 GB CV buffer,
    which OOMs a single chip). Roots are bit-identical; openings recompute
    the queried chunks on device instead (chunk_paths_from_planes)."""

    def f(lo_all, hi_all, idx, prefs):
        lo = lo_all[idx]
        hi = hi_all[idx]
        n = lo.shape[1]
        seg = 1 << seg_log2
        n_seg = n // seg

        def one_column_seg(slo, shi, pref):
            cv = hash_leaves_u64_words(slo, shi, pref, plen)
            width = 1 << chunk_log2
            while width > 1:
                cv = parent_level(cv)
                width >>= 1
            return cv  # [seg/chunk, 8]

        def body(_, i):
            slo = jax.lax.dynamic_slice_in_dim(lo, i * seg, seg, axis=1)
            shi = jax.lax.dynamic_slice_in_dim(hi, i * seg, seg, axis=1)
            roots = jax.vmap(one_column_seg)(slo, shi, prefs)
            return None, roots  # [C, seg/chunk, 8]

        _, roots = jax.lax.scan(body, None, jnp.arange(n_seg, dtype=jnp.int32))
        # [n_seg, C, seg/chunk, 8] -> [C, n_chunks, 8]
        return roots.transpose(1, 0, 2, 3).reshape(n_cols, -1, 8)

    return jax.jit(f)


def columns_commit_roots_scan(
    lo, hi, prefixes, chunk_log2: int, idx, seg_log2: int = 16
):
    """Memory-bounded chunk roots for device-resident planes (no CV buffer).

    Returns DEVICE uint32 [C, n_chunks, 8] (pull + croots_to_host later)."""
    n = lo.shape[1]
    seg_log2 = min(seg_log2, n.bit_length() - 1)
    assert n % (1 << seg_log2) == 0 and (1 << seg_log2) >= (1 << chunk_log2)
    plens = {len(p) for p in prefixes}
    assert len(plens) == 1
    plen = plens.pop()
    prefs = jnp.asarray(np.stack([_prefix_words(p) for p in prefixes]))
    idx = jnp.asarray(np.asarray(idx, dtype=np.int32))
    return _jit_columns_commit_roots_scan(
        plen, len(prefixes), chunk_log2, seg_log2
    )(lo, hi, idx, prefs)


@lru_cache(maxsize=8)
def _jit_chunk_paths_from_planes(plen: int, chunk_log2: int, bucket: int):
    """Recompute K queried chunks' trees from raw column planes and extract
    (value, path, chunk root) per query — no resident CV buffer needed."""

    def f(lo_all, hi_all, col_idx, starts, idx, prefs):
        chunk = 1 << chunk_log2
        offs = starts[:, None] + jnp.arange(chunk, dtype=jnp.int32)[None, :]
        flat_lo = lo_all.reshape(-1)
        flat_hi = hi_all.reshape(-1)
        base = col_idx[:, None] * lo_all.shape[1] + offs
        slo = flat_lo[base.reshape(-1)].reshape(bucket, chunk)
        shi = flat_hi[base.reshape(-1)].reshape(bucket, chunk)
        cur = jax.vmap(lambda l, h, p: hash_leaves_u64_words(l, h, p, plen))(
            slo, shi, prefs
        )  # [K, chunk, 8]
        vlo = jnp.take_along_axis(slo, idx[:, None].astype(jnp.int32), axis=1)[:, 0]
        vhi = jnp.take_along_axis(shi, idx[:, None].astype(jnp.int32), axis=1)[:, 0]
        cur_idx = idx
        paths = []
        m = chunk
        while m > 1:
            sib = (cur_idx ^ 1).astype(jnp.int32)
            paths.append(
                jnp.take_along_axis(cur, sib[:, None, None], axis=1)[:, 0, :]
            )
            cur = jax.vmap(parent_level)(cur)
            cur_idx = cur_idx >> 1
            m >>= 1
        return jnp.stack(paths, axis=1), cur[:, 0, :], vlo, vhi

    return jax.jit(f)


def chunk_paths_from_planes(
    lo_all, hi_all, col_indices, chunk_starts, idx_in_chunk, prefixes, chunk_log2: int
):
    """Openings against scan-committed columns: recompute each queried
    chunk's tree on device from the raw planes (reference semantics:
    recompute-on-open, openings.rs:278-498 — same paths, batched).

    All prefixes must share one length (group by plen first). Returns
    DEVICE (paths [K, d, 8], roots [K, 8], vlo [K], vhi [K]) plus a decoder
    finish(...) -> (paths uint8 [K, d, 32], roots uint8 [K, 32], vlo, vhi)."""
    k = len(chunk_starts)
    bucket = max(8, 1 << (k - 1).bit_length()) if k else 8
    plens = {len(p) for p in prefixes}
    assert len(plens) == 1
    plen = plens.pop()
    col_idx = np.zeros(bucket, dtype=np.int32)
    col_idx[:k] = np.asarray(col_indices, dtype=np.int32)
    starts = np.zeros(bucket, dtype=np.int32)
    starts[:k] = np.asarray(chunk_starts, dtype=np.int32)
    idxs = np.zeros(bucket, dtype=np.uint32)
    idxs[:k] = np.asarray(idx_in_chunk, dtype=np.uint32)
    prefs = np.zeros((bucket, 16), dtype=np.uint32)
    prefs[:k] = np.stack([_prefix_words(p) for p in prefixes])
    prefs[k:] = prefs[:1] if k else 0
    out = _jit_chunk_paths_from_planes(plen, chunk_log2, bucket)(
        lo_all, hi_all, jnp.asarray(col_idx), jnp.asarray(starts),
        jnp.asarray(idxs), jnp.asarray(prefs),
    )

    def finish(paths_np, roots_np, vlo_np, vhi_np):
        d = paths_np.shape[1]
        paths8 = (
            np.ascontiguousarray(paths_np, dtype="<u4")
            .view(np.uint8)
            .reshape(bucket, d, 32)[:k]
        )
        roots8 = (
            np.ascontiguousarray(roots_np, dtype="<u4")
            .view(np.uint8)
            .reshape(bucket, 32)[:k]
        )
        return paths8, roots8, vlo_np[:k], vhi_np[:k]

    return out, finish


@lru_cache(maxsize=8)
def _jit_chunk_paths_from_ranges(plen: int, chunk_log2: int, bucket: int):
    """Like _jit_chunk_paths_from_planes but sourcing each request's chunk
    values from pre-derived [S, C, chunk] range planes (derive_ranges) —
    no resident [C, n] planes needed."""

    def f(rlo, rhi, sel_s, sel_col, idx, prefs):
        slo = rlo[sel_s, sel_col]  # [K, chunk]
        shi = rhi[sel_s, sel_col]
        cur = jax.vmap(lambda l, h, p: hash_leaves_u64_words(l, h, p, plen))(
            slo, shi, prefs
        )
        vlo = jnp.take_along_axis(slo, idx[:, None].astype(jnp.int32), axis=1)[:, 0]
        vhi = jnp.take_along_axis(shi, idx[:, None].astype(jnp.int32), axis=1)[:, 0]
        cur_idx = idx
        paths = []
        m = 1 << chunk_log2
        while m > 1:
            sib = (cur_idx ^ 1).astype(jnp.int32)
            paths.append(
                jnp.take_along_axis(cur, sib[:, None, None], axis=1)[:, 0, :]
            )
            cur = jax.vmap(parent_level)(cur)
            cur_idx = cur_idx >> 1
            m >>= 1
        return jnp.stack(paths, axis=1), cur[:, 0, :], vlo, vhi

    return jax.jit(f)


def chunk_paths_from_ranges(
    rlo, rhi, sel_s, col_indices, idx_in_chunk, prefixes, chunk_log2: int
):
    """Openings from derive_ranges output: `rlo`/`rhi` are [S, C, chunk]
    planes; request i reads chunk (sel_s[i], col_indices[i]). Same return
    contract as chunk_paths_from_planes."""
    k = len(sel_s)
    bucket = max(8, 1 << (k - 1).bit_length()) if k else 8
    plens = {len(p) for p in prefixes}
    assert len(plens) == 1
    plen = plens.pop()
    sels = np.zeros(bucket, dtype=np.int32)
    sels[:k] = np.asarray(sel_s, dtype=np.int32)
    cols = np.zeros(bucket, dtype=np.int32)
    cols[:k] = np.asarray(col_indices, dtype=np.int32)
    idxs = np.zeros(bucket, dtype=np.uint32)
    idxs[:k] = np.asarray(idx_in_chunk, dtype=np.uint32)
    prefs = np.zeros((bucket, 16), dtype=np.uint32)
    prefs[:k] = np.stack([_prefix_words(p) for p in prefixes])
    prefs[k:] = prefs[:1] if k else 0
    out = _jit_chunk_paths_from_ranges(plen, chunk_log2, bucket)(
        rlo, rhi, jnp.asarray(sels), jnp.asarray(cols),
        jnp.asarray(idxs), jnp.asarray(prefs),
    )

    def finish(paths_np, roots_np, vlo_np, vhi_np):
        d = paths_np.shape[1]
        paths8 = (
            np.ascontiguousarray(paths_np, dtype="<u4")
            .view(np.uint8)
            .reshape(bucket, d, 32)[:k]
        )
        roots8 = (
            np.ascontiguousarray(roots_np, dtype="<u4")
            .view(np.uint8)
            .reshape(bucket, 32)[:k]
        )
        return paths8, roots8, vlo_np[:k], vhi_np[:k]

    return out, finish


def hash_many_words_staged(m16, msg_len: int):
    """Staged (fori_loop) single-chunk multi-block hash: uint32
    [nblocks*16, N] LE words -> [8, N] digest words. Off-TPU fallback for
    blake3_pallas.hash_many_words; bit-identical."""
    nblocks = max(1, -(-msg_len // 64))
    last_len = msg_len - 64 * (nblocks - 1)
    n = m16.shape[1]
    perm = jnp.asarray(MSG_PERM)
    cv = jnp.broadcast_to(jnp.asarray(IV, U32)[:, None], (8, n))
    for b in range(nblocks):
        flags = 0
        if b == 0:
            flags |= int(CHUNK_START)
        if b == nblocks - 1:
            flags |= int(CHUNK_END) | int(ROOT)
        blen = 64 if b < nblocks - 1 else last_len
        tail = jnp.stack(
            [
                jnp.broadcast_to(jnp.asarray(IV[0], U32), (n,)),
                jnp.broadcast_to(jnp.asarray(IV[1], U32), (n,)),
                jnp.broadcast_to(jnp.asarray(IV[2], U32), (n,)),
                jnp.broadcast_to(jnp.asarray(IV[3], U32), (n,)),
                jnp.zeros(n, U32),
                jnp.zeros(n, U32),
                jnp.full(n, np.uint32(blen), U32),
                jnp.full(n, np.uint32(flags), U32),
            ]
        )
        v0 = jnp.concatenate([cv, tail], axis=0)

        def body(_r, carry):
            v, msg = carry
            return _round(v, msg), msg[perm]

        v, _ = jax.lax.fori_loop(
            0, 7, body, (v0, m16[b * 16 : (b + 1) * 16].astype(U32))
        )
        cv = v[:8] ^ v[8:16]
    return cv


@lru_cache(maxsize=16)
def _jit_hash_many(msg_len: int):
    from . import blake3_pallas

    return jax.jit(
        lambda m16: blake3_pallas.hash_many_words(m16, msg_len)
    )


def hash_many_device(messages: np.ndarray) -> np.ndarray:
    """Device analogue of crypto.blake3.hash_many for single-chunk message
    batches: uint8 [N, L] (L <= 1024) -> uint8 [N, 32]. One fused Pallas
    chain kernel on TPU; staged XLA path elsewhere. Bit-identical to the
    host implementation (cross-tested)."""
    msgs = np.ascontiguousarray(messages, dtype=np.uint8)
    n, L = msgs.shape
    assert 0 < L <= 1024, "single-chunk messages only"
    nblocks = max(1, -(-L // 64))
    # pad the batch to a power-of-two bucket so the jit cache is keyed on
    # (msg_len, bucket) rather than every distinct batch size
    n_pad = max(8, 1 << (n - 1).bit_length())
    padded = np.zeros((n_pad, nblocks * 64), dtype=np.uint8)
    padded[:n, :L] = msgs
    m16 = jnp.asarray(
        np.ascontiguousarray(padded.view("<u4").T)  # [nblocks*16, N]
    )
    out = np.asarray(jax.device_get(_jit_hash_many(L)(m16)))  # [8, n_pad]
    return (
        np.ascontiguousarray(out.T.astype("<u4"))
        .view(np.uint8)
        .reshape(n_pad, 32)[:n]
    )
