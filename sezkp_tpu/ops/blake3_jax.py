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
from typing import Tuple

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
    """
    n = m.shape[0]
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


def hash_leaves_u64(lo, hi, prefix: bytes = b""):
    """Hash N messages of (prefix || 8-byte LE value) -> uint32 [N, 8] CVs.

    lo/hi: uint32 [N] field limbs. len(prefix) + 8 must be <= 64.
    """
    plen = len(prefix)
    total = plen + 8
    assert total <= 64
    n = lo.shape[0]
    pw = np.zeros(16 * 4, dtype=np.uint8)
    pw[:plen] = np.frombuffer(prefix, dtype=np.uint8)
    pref_words = pw.view("<u4")  # [16]
    m = [jnp.broadcast_to(jnp.asarray(w, U32), (n,)) for w in pref_words]

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


def parent_level(nodes):
    """One Merkle level: uint32 [N, 8] -> [N/2, 8] (N even).

    Parent = BLAKE3(left||right): 64-byte single-block message."""
    n = nodes.shape[0] // 2
    m = nodes.reshape(n, 16)
    return compress_batch(m, 64, int(CHUNK_START | CHUNK_END | ROOT))


def merkle_root_pow2(leaves):
    """Perfect-tree root over uint32 [2^k, 8] leaf CVs -> [1, 8]."""
    cur = leaves
    while cur.shape[0] > 1:
        cur = parent_level(cur)
    return cur


@lru_cache(maxsize=32)
def _jit_leaf_hash(prefix: bytes, n: int):
    return jax.jit(partial(hash_leaves_u64, prefix=prefix))


def hash_field_leaves_device(values_u64: np.ndarray, prefix: bytes = b"") -> np.ndarray:
    """Host-convenience: u64 values -> [N, 32] uint8 digests via the device."""
    v = np.asarray(values_u64, dtype=np.uint64)
    lo = jnp.asarray((v & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    hi = jnp.asarray((v >> np.uint64(32)).astype(np.uint32))
    cv = _jit_leaf_hash(prefix, v.shape[0])(lo, hi)
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
