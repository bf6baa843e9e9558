"""Pallas BLAKE3 single-block compression for TPU.

The XLA kernel in :mod:`blake3_jax` runs the 7 rounds under `lax.fori_loop`
with a gather-permuted message schedule; each round materializes the 32
state/message planes through HBM, so at production batch sizes it is
bandwidth-bound ~40 ns/hash — two orders of magnitude off the VPU roofline
(~1.3k u32 ops/hash over a ~4 Tops/s vector unit).

This kernel keeps the whole compression in VMEM/vector registers:

- word-major layout: message words as uint32 [16, R, 128] planes, so every
  state variable is a full (tile_r, 128) vreg tile (lanes = batch);
- the 7 rounds and 8 G-functions are fully unrolled, and the per-round
  message schedule is applied by statically permuting a Python list — no
  gathers, no loop-carried layout changes;
- one HBM read of the 16 message planes and one write of the 8 (or 16)
  output planes per batch element: 64-96 B/hash vs ~1.8 kB/hash for the
  staged XLA path.

Used by blake3_jax.compress_batch on TPU backends (same [N, 16] -> [N, out]
row-major contract; transposes at the boundary fuse into the surrounding
producers). Semantics are identical to the reference hasher (single-block
messages, counter 0, CHUNK_START|CHUNK_END|ROOT — crypto/blake3_py.py is the
oracle; reference usage crates/sezkp-merkle/src/lib.rs:85-133,
crates/sezkp-stark/src/v1/merkle.rs:132-159). Bit-exactness is enforced by
tests/test_blake3_jax.py against the host implementation.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

U32 = jnp.uint32

IV = np.array(
    [0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
     0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19],
    dtype=np.uint32,
)

MSG_PERM = [2, 6, 3, 10, 7, 0, 4, 13, 1, 11, 12, 5, 9, 14, 15, 8]

# lanes per tile row is fixed at 128; tile_r rows => tile_r*128 hashes/tile.
TILE_R = 64

_params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _rotr(x, n: int):
    return (x >> n) | (x << (32 - n))


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


@lru_cache(maxsize=32)
def _build(block_len: int, flags: int, out_words: int, tile_r: int, interpret: bool):
    """pallas_call over [16, R, 128] message planes -> [out_words, R, 128]."""

    def kernel(m_ref, o_ref):
        msg = [m_ref[i] for i in range(16)]
        shape = msg[0].shape

        def c(x):
            return jnp.full(shape, np.uint32(x), U32)

        v = [c(IV[j]) for j in range(8)] + [
            c(IV[0]), c(IV[1]), c(IV[2]), c(IV[3]),
            c(0), c(0), c(block_len), c(flags),
        ]

        def g(a, b, cc, d, mx, my):
            v[a] = v[a] + v[b] + mx
            v[d] = _rotr(v[d] ^ v[a], 16)
            v[cc] = v[cc] + v[d]
            v[b] = _rotr(v[b] ^ v[cc], 12)
            v[a] = v[a] + v[b] + my
            v[d] = _rotr(v[d] ^ v[a], 8)
            v[cc] = v[cc] + v[d]
            v[b] = _rotr(v[b] ^ v[cc], 7)

        for _r in range(7):
            g(0, 4, 8, 12, msg[0], msg[1])
            g(1, 5, 9, 13, msg[2], msg[3])
            g(2, 6, 10, 14, msg[4], msg[5])
            g(3, 7, 11, 15, msg[6], msg[7])
            g(0, 5, 10, 15, msg[8], msg[9])
            g(1, 6, 11, 12, msg[10], msg[11])
            g(2, 7, 8, 13, msg[12], msg[13])
            g(3, 4, 9, 14, msg[14], msg[15])
            msg = [msg[p] for p in MSG_PERM]

        for i in range(8):
            o_ref[i] = v[i] ^ v[i + 8]
        if out_words == 16:
            for i in range(8):
                o_ref[8 + i] = v[8 + i] ^ c(IV[i])

    def f(m3):  # [16, R, 128]
        r = m3.shape[1]
        return pl.pallas_call(
            kernel,
            grid=(r // tile_r,),
            in_specs=[
                pl.BlockSpec((16, tile_r, 128), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM)
            ],
            out_specs=pl.BlockSpec((out_words, tile_r, 128), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((out_words, r, 128), U32),
            compiler_params=_params,
            interpret=interpret,
        )(m3)

    return f


def compress_planes(m16, block_len: int, flags: int, out_words: int = 8,
                    interpret: bool | None = None):
    """Word-major compression: uint32 [16, N] -> [out_words, N].

    N is padded internally to a tile multiple; block_len/flags are static.
    """
    n = m16.shape[1]
    if interpret is None:
        if _interpret():
            # Off-TPU: the unrolled interpret-mode kernel trips an
            # exponential XLA:CPU compile pathology when several levels are
            # fused into one jit (FRI trees). Use the staged fori_loop path —
            # bit-identical, fast to compile. Pass interpret=True explicitly
            # to exercise the Pallas kernel itself (tests do).
            from . import blake3_jax

            return blake3_jax.compress_planes_staged(
                m16, block_len, flags, out_words
            )
        interpret = False
    tile_r = min(TILE_R, max(1, -(-n // 128)))
    width = tile_r * 128
    n_pad = -(-n // width) * width
    if n_pad != n:
        m16 = jnp.pad(m16, ((0, 0), (0, n_pad - n)))
    m3 = m16.reshape(16, n_pad // 128, 128)
    out3 = _build(block_len, flags, out_words, tile_r, interpret)(m3)
    return out3.reshape(out_words, n_pad)[:, :n]


def compress_rows(m, block_len: int, flags: int, out_words: int = 8,
                  interpret: bool | None = None):
    """Row-major adapter matching blake3_jax.compress_batch: [N, 16] -> [N, out]."""
    return compress_planes(m.T, block_len, flags, out_words, interpret).T


CHUNK_START = np.uint32(1)
CHUNK_END = np.uint32(2)
ROOT = np.uint32(8)


@lru_cache(maxsize=32)
def _build_chain(nblocks: int, last_len: int, tile_r: int, interpret: bool):
    """Single-chunk multi-block BLAKE3 over [nblocks*16, R, 128] message
    planes -> [8, R, 128] digests. The chaining value threads through the
    blocks in VMEM, so an arbitrary-length (<= 1024 B) message batch costs
    one HBM read of the padded words and one 32 B/message write."""

    def kernel(m_ref, o_ref):
        shape = m_ref[0].shape

        def c(x):
            return jnp.full(shape, np.uint32(x), U32)

        cv = [c(IV[j]) for j in range(8)]
        for b in range(nblocks):
            msg = [m_ref[b * 16 + i] for i in range(16)]
            flags = 0
            if b == 0:
                flags |= int(CHUNK_START)
            if b == nblocks - 1:
                flags |= int(CHUNK_END) | int(ROOT)
            blen = 64 if b < nblocks - 1 else last_len
            v = list(cv) + [
                c(IV[0]), c(IV[1]), c(IV[2]), c(IV[3]),
                c(0), c(0), c(blen), c(flags),
            ]

            def g(a, bb, cc, d, mx, my):
                v[a] = v[a] + v[bb] + mx
                v[d] = _rotr(v[d] ^ v[a], 16)
                v[cc] = v[cc] + v[d]
                v[bb] = _rotr(v[bb] ^ v[cc], 12)
                v[a] = v[a] + v[bb] + my
                v[d] = _rotr(v[d] ^ v[a], 8)
                v[cc] = v[cc] + v[d]
                v[bb] = _rotr(v[bb] ^ v[cc], 7)

            for _r in range(7):
                g(0, 4, 8, 12, msg[0], msg[1])
                g(1, 5, 9, 13, msg[2], msg[3])
                g(2, 6, 10, 14, msg[4], msg[5])
                g(3, 7, 11, 15, msg[6], msg[7])
                g(0, 5, 10, 15, msg[8], msg[9])
                g(1, 6, 11, 12, msg[10], msg[11])
                g(2, 7, 8, 13, msg[12], msg[13])
                g(3, 4, 9, 14, msg[14], msg[15])
                msg = [msg[p] for p in MSG_PERM]
            cv = [v[i] ^ v[i + 8] for i in range(8)]
        for i in range(8):
            o_ref[i] = cv[i]

    def f(m3):  # [nblocks*16, R, 128]
        r = m3.shape[1]
        return pl.pallas_call(
            kernel,
            grid=(r // tile_r,),
            in_specs=[
                pl.BlockSpec((nblocks * 16, tile_r, 128), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM)
            ],
            out_specs=pl.BlockSpec((8, tile_r, 128), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, r, 128), U32),
            compiler_params=_params,
            interpret=interpret,
        )(m3)

    return f


def hash_many_words(m16: "jnp.ndarray", msg_len: int,
                    interpret: bool | None = None):
    """Word-major single-chunk hash: uint32 [nblocks*16, N] (LE words of the
    zero-padded messages) + true byte length -> [8, N] digest words.

    Single-chunk messages only (msg_len <= 1024). Off-TPU falls back to a
    staged per-block chain (bit-identical) unless interpret=True forces the
    Pallas kernel in interpret mode (tests)."""
    assert 0 < msg_len <= 1024, "single-chunk messages only"
    nblocks = max(1, -(-msg_len // 64))
    last_len = msg_len - 64 * (nblocks - 1)
    n = m16.shape[1]
    if interpret is None:
        if _interpret():
            from . import blake3_jax

            return blake3_jax.hash_many_words_staged(m16, msg_len)
        interpret = False
    tile_r = min(TILE_R, max(1, -(-n // 128)))
    width = tile_r * 128
    n_pad = -(-n // width) * width
    if n_pad != n:
        m16 = jnp.pad(m16, ((0, 0), (0, n_pad - n)))
    m3 = m16.reshape(nblocks * 16, n_pad // 128, 128)
    out3 = _build_chain(nblocks, last_len, tile_r, interpret)(m3)
    return out3.reshape(8, n_pad)[:, :n]
